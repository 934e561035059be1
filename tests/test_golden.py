"""Pinned golden vectors — the default-suite regression anchor for the
BASELINE parity configs (logN14/15/16).

Unlike the (gated) full-preset sweep in test_full_presets.py, these run in
EVERY pytest invocation: a silent semantic drift in prime generation, the
codec, the CSPRNG, or the encrypt path fails CI here.  The golden file is
generated once and checked in (tests/golden/presets.json); it must only
be regenerated for a deliberate, documented format change.
"""

import hashlib
import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "presets.json")


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN) as f:
        return json.load(f)


@pytest.mark.parametrize("preset", ["logN14", "logN15", "logN16"])
def test_prime_chains_pinned(golden, preset):
    """The generated prime chains match the checked-in chains exactly
    (reference parity depends on bit-for-bit identical moduli)."""
    from tiberate_tpu.config import CkksConfig

    cfg = CkksConfig.parse(preset)
    g = golden[preset]
    assert [int(x) for x in cfg.q] == g["q"]
    assert cfg.num_special_primes == g["num_special_primes"]
    assert cfg.scale_bits == g["scale_bits"]


def test_logN14_ciphertext_digest_pinned(golden):
    """Fixed (seed, nonce, message) -> bit-identical ciphertext across
    releases, pinned as a sha256 digest — catches any silent change in
    ChaCha20, the samplers, the codec, or the encrypt core at a REAL
    preset.  Also decrypt-checks the same ciphertext end-to-end."""
    from tiberate_tpu import CkksEngine

    eng = CkksEngine("logN14", seed=1234, nonce=1)
    m = np.linspace(-1, 1, eng.num_slots)
    ct = eng.encodecrypt(m)
    h = hashlib.sha256()
    for d in ct.data:
        h.update(np.ascontiguousarray(np.asarray(d)).tobytes())
    assert h.hexdigest() == golden["logN14"]["ct_sha256_seed1234_nonce1"]

    err = np.abs(eng.decryptcode(ct, is_real=True) - m).max()
    assert err < 1e-6


def test_logN14_e2e_mult_default_suite():
    """One real-preset homomorphic multiply in the DEFAULT suite (the
    BASELINE row the driver exercises; was previously gated and off)."""
    from tiberate_tpu import CkksEngine

    eng = CkksEngine("logN14", seed=7)
    rng = np.random.default_rng(0)
    m1 = rng.uniform(-1, 1, eng.num_slots)
    m2 = rng.uniform(-1, 1, eng.num_slots)
    out = eng.decryptcode(
        eng.cc_mult(eng.encodecrypt(m1), eng.encodecrypt(m2)), is_real=True
    )
    assert np.abs(out - m1 * m2).max() < 1e-5


@pytest.mark.skipif(
    os.environ.get("TIBERATE_FULL_TESTS") != "1",
    reason="logN15/16 digests are slow on CPU; set TIBERATE_FULL_TESTS=1",
)
@pytest.mark.parametrize("preset", ["logN15", "logN16"])
def test_large_preset_ciphertext_digest_pinned(golden, preset):
    """Pinned encrypt digests at the remaining BASELINE parity sizes."""
    from tiberate_tpu import CkksEngine

    eng = CkksEngine(preset, seed=1234, nonce=1)
    m = np.linspace(-1, 1, eng.num_slots)
    ct = eng.encodecrypt(m)
    h = hashlib.sha256()
    for d in ct.data:
        h.update(np.ascontiguousarray(np.asarray(d)).tobytes())
    assert h.hexdigest() == golden[preset]["ct_sha256_seed1234_nonce1"]

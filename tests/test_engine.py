"""End-to-end CkksEngine tests on a toy ring (fast on CPU).

Covers the reference test surface (``tests/test_engine_ops.py``) plus the
unit coverage the reference lacks: every public op decrypt-checked against
numpy, determinism, save/load, error paths.
"""

import numpy as np
import pytest

from tiberate_tpu import errors
from tiberate_tpu.config.toy import toy_config
from tiberate_tpu.engine import CkksEngine
from tiberate_tpu.typing import FLAGS, Ciphertext, CiphertextTriplet, Plaintext

SCALE_BITS = 30
TOL = 5e-5  # toy 30-bit scale primes have ~1e-6 relative deviation


@pytest.fixture(scope="module")
def eng():
    cfg = toy_config(
        logN=7, num_scales=4, num_special_primes=2, scale_bits=SCALE_BITS
    )
    return CkksEngine(cfg, seed=101, nonce=11)


@pytest.fixture(scope="module")
def msgs(eng):
    rng = np.random.default_rng(5)
    m1 = rng.uniform(-1, 1, eng.num_slots)
    m2 = rng.uniform(-1, 1, eng.num_slots)
    return m1, m2


def test_encrypt_decrypt_roundtrip(eng, msgs):
    m1, _ = msgs
    ct = eng.encodecrypt(m1)
    out = eng.decryptcode(ct, is_real=True)
    assert np.abs(out - m1).max() < TOL


def test_encrypt_complex(eng, msgs):
    m1, m2 = msgs
    mc = m1 + 1j * m2
    out = eng.decryptcode(eng.encodecrypt(mc))
    assert np.abs(out - mc).max() < TOL


def test_cc_add_sub(eng, msgs):
    m1, m2 = msgs
    ct1, ct2 = eng.encodecrypt(m1), eng.encodecrypt(m2)
    assert np.abs(
        eng.decryptcode(eng.cc_add(ct1, ct2), is_real=True) - (m1 + m2)
    ).max() < TOL
    assert np.abs(
        eng.decryptcode(eng.cc_sub(ct1, ct2), is_real=True) - (m1 - m2)
    ).max() < TOL


def test_cc_mult_and_chain(eng, msgs):
    m1, m2 = msgs
    ct1, ct2 = eng.encodecrypt(m1), eng.encodecrypt(m2)
    ctm = eng.cc_mult(ct1, ct2)
    assert ctm.level == 1
    assert np.abs(
        eng.decryptcode(ctm, is_real=True) - m1 * m2
    ).max() < TOL
    # chain to a deeper level
    ct2_up = eng.level_up(ct2, ctm.level)
    ctm2 = eng.cc_mult(ctm, ct2_up)
    assert np.abs(
        eng.decryptcode(ctm2, is_real=True) - m1 * m2 * m2
    ).max() < 10 * TOL


def test_cc_mult_no_relin_triplet(eng, msgs):
    m1, m2 = msgs
    ct1, ct2 = eng.encodecrypt(m1), eng.encodecrypt(m2)
    tri = eng.cc_mult(ct1, ct2, post_relin=False)
    assert isinstance(tri, CiphertextTriplet)
    # direct triplet decrypt
    out = eng.decryptcode(tri, is_real=True)
    assert np.abs(out - m1 * m2).max() < TOL
    # relinearize later
    ct = eng.relinearize(tri)
    out2 = eng.decryptcode(ct, is_real=True)
    assert np.abs(out2 - m1 * m2).max() < TOL


def test_triplet_add_sub(eng, msgs):
    m1, m2 = msgs
    ct1, ct2 = eng.encodecrypt(m1), eng.encodecrypt(m2)
    t1 = eng.cc_mult(ct1, ct2, post_relin=False)
    t2 = eng.cc_mult(ct2, ct2, post_relin=False)
    s = eng.cc_add_triplet(t1, t2)
    out = eng.decryptcode(s, is_real=True)
    assert np.abs(out - (m1 * m2 + m2 * m2)).max() < 2 * TOL


def test_level_exhaustion(eng, msgs):
    m1, _ = msgs
    ct = eng.encodecrypt(m1, level=eng.num_levels - 1)
    with pytest.raises(errors.MaximumLevelError):
        eng.rescale(ct)


def test_rotation(eng, msgs):
    m1, _ = msgs
    ct = eng.encodecrypt(m1)
    for delta in (1, 2, 5):
        out = eng.decryptcode(eng.rotate_offset(ct, delta), is_real=True)
        assert np.abs(out - np.roll(m1, delta)).max() < TOL, delta
    # operator sugar
    out = eng.decryptcode(ct >> 1, is_real=True)
    assert np.abs(out - np.roll(m1, 1)).max() < TOL


def test_conjugation(eng, msgs):
    m1, m2 = msgs
    mc = m1 + 1j * m2
    ct = eng.encodecrypt(mc)
    out = eng.decryptcode(eng.conjugate(ct))
    assert np.abs(out - np.conj(mc)).max() < TOL


def test_negate(eng, msgs):
    m1, _ = msgs
    ct = eng.encodecrypt(m1)
    out = eng.decryptcode(eng.negate(ct), is_real=True)
    assert np.abs(out + m1).max() < TOL


def test_pc_ops_and_cache(eng, msgs):
    m1, m2 = msgs
    ct = eng.encodecrypt(m1)
    pt = Plaintext(m2)
    out = eng.decryptcode(eng.pc_add(pt, ct), is_real=True)
    assert np.abs(out - (m1 + m2)).max() < 100 * TOL
    out = eng.decryptcode(eng.pc_mult(pt, ct), is_real=True)
    assert np.abs(out - m1 * m2).max() < TOL
    # per-level per-op cache populated
    assert "pc_add" in pt.cache[0] and "pc_mult" in pt.cache[0]


def test_scalar_ops(eng, msgs):
    m1, _ = msgs
    ct = eng.encodecrypt(m1)
    out = eng.decryptcode(eng.add_scalar(ct, 0.25), is_real=True)
    assert np.abs(out - (m1 + 0.25)).max() < TOL
    out = eng.decryptcode(eng.mult_scalar(ct, -1.5), is_real=True)
    assert np.abs(out - m1 * -1.5).max() < TOL
    out = eng.decryptcode(eng.mult_int_scalar(ct, 3), is_real=True)
    assert np.abs(out - m1 * 3).max() < TOL


def test_operator_sugar(eng, msgs):
    m1, m2 = msgs
    ct1, ct2 = eng.encodecrypt(m1), eng.encodecrypt(m2)
    assert np.abs((ct1 + ct2).plain - (m1 + m2)).max() < TOL
    assert np.abs((ct1 * ct2).plain - m1 * m2).max() < TOL
    assert np.abs((ct1 - ct2).plain - (m1 - m2)).max() < TOL
    assert np.abs((ct1 + 0.5).plain - (m1 + 0.5)).max() < TOL
    assert np.abs((ct1 * 2.0).plain - m1 * 2).max() < TOL
    assert np.abs((ct1**2).plain - m1**2).max() < TOL


def test_sum_mean(eng):
    m = np.full(eng.num_slots, 0.25)
    ct = eng.encodecrypt(m)
    out = eng.decryptcode(eng.sum(ct), is_real=True)
    assert np.abs(out - 0.25 * eng.num_slots).max() < 200 * TOL
    out = eng.decryptcode(eng.mean(ct), is_real=True)
    assert np.abs(out - 0.25).max() < TOL


def test_determinism():
    cfg = toy_config(
        logN=7, num_scales=3, num_special_primes=1, scale_bits=SCALE_BITS
    )
    a = CkksEngine(cfg, seed=77, nonce=9)
    b = CkksEngine(cfg, seed=77, nonce=9)
    m = np.linspace(-1, 1, a.num_slots)
    ca = a.encodecrypt(m)
    cb = b.encodecrypt(m)
    np.testing.assert_array_equal(np.asarray(ca.data[0]),
                                  np.asarray(cb.data[0]))
    np.testing.assert_array_equal(np.asarray(ca.data[1]),
                                  np.asarray(cb.data[1]))


def test_determinism_seed_only():
    """seed= without nonce= must still be fully deterministic (the nonce
    derives from the seeded stream, not os.urandom)."""
    cfg = toy_config(
        logN=7, num_scales=3, num_special_primes=1, scale_bits=SCALE_BITS
    )
    a = CkksEngine(cfg, seed=77)
    b = CkksEngine(cfg, seed=77)
    assert a.rng.nonce == b.rng.nonce
    m = np.linspace(-1, 1, a.num_slots)
    ca = a.encodecrypt(m)
    cb = b.encodecrypt(m)
    np.testing.assert_array_equal(np.asarray(ca.data[0]),
                                  np.asarray(cb.data[0]))
    # two engines with different seeds must differ
    c = CkksEngine(cfg, seed=78)
    assert not np.array_equal(
        np.asarray(ca.data[0]), np.asarray(c.encodecrypt(m).data[0])
    )


def test_save_load(tmp_path, eng, msgs):
    m1, _ = msgs
    ct = eng.encodecrypt(m1)
    path = str(tmp_path / "ct.npz")
    ct.save(path)
    ct2 = Ciphertext.load(path)
    assert ct2.level == ct.level
    assert ct2._flags == ct._flags
    out = eng.decryptcode(ct2, is_real=True)
    assert np.abs(out - m1).max() < TOL


def test_encrypt_at_level(eng, msgs):
    m1, _ = msgs
    ct = eng.encodecrypt(m1, level=1)
    assert ct.level == 1
    out = eng.decryptcode(ct, is_real=True)
    assert np.abs(out - m1).max() < TOL


def test_bias_guard_large_dc(eng):
    """bias_guard handles messages with a large DC component."""
    m = np.full(eng.num_slots, 17.37)
    ct = eng.encodecrypt(m)
    out = eng.decryptcode(ct, is_real=True)
    assert np.abs(out - m).max() < 100 * TOL


def test_state_flag_errors(eng, msgs):
    m1, m2 = msgs
    ct1, ct2 = eng.encodecrypt(m1), eng.encodecrypt(m2)
    tri = eng.cc_mult(ct1, ct2, post_relin=False)
    with pytest.raises(errors.NTTStateError):
        eng.cc_add_double(tri, tri)  # triplet is in NTT state
    with pytest.raises(errors.DifferentTypeError):
        eng.cc_add(ct1, tri)


def test_seed_expanded_ksk_compress_roundtrip(tmp_path):
    """Seed-expanded key-switching keys (beyond the reference): the
    uniform `a` halves regenerate from a stored seed, so compressed keys
    carry half the bytes, survive save/load, and expand to bit-identical
    keys."""
    import numpy as np

    from tiberate_tpu.config.toy import toy_config
    from tiberate_tpu.engine import CkksEngine
    from tiberate_tpu.typing import KeySwitchKey
    from tiberate_tpu.utils.massive import datastruct_size_bytes

    eng = CkksEngine(
        toy_config(logN=7, num_scales=3, num_special_primes=2,
                   scale_bits=30),
        seed=44, nonce=2,
    )
    sk2 = eng._create_secret_key()
    ksk = eng.create_key_switching_key(sk2, eng.sk, a_seed=12345)

    m = np.linspace(-1, 1, eng.num_slots)
    ct = eng.encodecrypt(m)
    out_ref = eng.switch_key(ct, ksk)

    ck = eng.compress_ksk(ksk)
    assert datastruct_size_bytes(ck) * 2 == datastruct_size_bytes(ksk)

    path = str(tmp_path / "ck.npz")
    ck.save(path)
    ck2 = KeySwitchKey.load(path)
    ksk2 = eng.expand_ksk(ck2)

    for (a0, a1), (b0, b1) in zip(ksk.data, ksk2.data):
        np.testing.assert_array_equal(np.asarray(a0), np.asarray(b0))
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(b1))
    out2 = eng.switch_key(ct, ksk2)
    for a, b in zip(out_ref.data, out2.data):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_seed_expanded_pk_compress_roundtrip(tmp_path):
    """Seed-expanded public keys: the a half regenerates from the seed;
    encrypting under the expanded key matches the original exactly."""
    import numpy as np

    from tiberate_tpu.config.toy import toy_config
    from tiberate_tpu.engine import CkksEngine
    from tiberate_tpu.typing import PublicKey

    eng = CkksEngine(
        toy_config(logN=7, num_scales=3, num_special_primes=2,
                   scale_bits=30),
        seed=45, nonce=2,
    )
    pk = eng.create_public_key(a_seed=777)
    cpk = eng.compress_pk(pk)
    path = str(tmp_path / "cpk.npz")
    cpk.save(path)
    pk2 = eng.expand_pk(PublicKey.load(path))
    for a, b in zip(pk.data, pk2.data):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # usable: encrypt under the expanded key, decrypt with sk
    m = np.linspace(-1, 1, eng.num_slots)
    ct = eng.encodecrypt(m, pk=pk2) if hasattr(eng, "encodecrypt") else None
    if ct is not None:
        out = eng.decryptcode(ct, is_real=True)
        assert np.abs(out - m).max() < 1e-3

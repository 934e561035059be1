"""Codec: encode/decode roundtrip, rotation/conjugation slot semantics."""

import numpy as np
import pytest

from tiberate_tpu.rng.csprng import Csprng
from tiberate_tpu.utils import encoding as codec


@pytest.fixture(scope="module")
def rng():
    return Csprng(num_coefs=256, num_channels=[4],
                  num_repeating_channels=2, seed=23)


def test_encode_decode_roundtrip(rng):
    N = 256
    slots = N // 2
    m = np.random.default_rng(0).uniform(-1, 1, slots) + 1j * \
        np.random.default_rng(1).uniform(-1, 1, slots)
    coeffs = codec.encode(m, rng=rng, scale=2**40, norm="forward")
    assert coeffs.shape == (N,)
    assert coeffs.dtype == np.int64
    back = codec.decode(coeffs, scale=2**40, norm="forward")[:slots]
    np.testing.assert_allclose(back, m, atol=1e-8)


def test_encode_real_message(rng):
    N = 256
    m = np.arange(N // 2, dtype=np.float64)
    coeffs = codec.encode(m, rng=rng, scale=2**40, norm="forward")
    back = codec.decode(coeffs, scale=2**40, norm="forward")[: N // 2]
    np.testing.assert_allclose(back.real, m, atol=1e-7)
    np.testing.assert_allclose(back.imag, 0, atol=1e-7)


def test_rotation_rotates_slots(rng):
    """codec.rotate on coefficients == cyclic rotation of decoded slots."""
    N = 256
    slots = N // 2
    m = np.random.default_rng(2).uniform(-1, 1, slots)
    coeffs = codec.encode(m, rng=rng, scale=2**40, norm="forward")
    for delta in (1, 3, -2, 17):
        rot = codec.rotate_np(coeffs, delta)
        back = codec.decode(rot, scale=2**40, norm="forward")[:slots]
        np.testing.assert_allclose(back.real, np.roll(m, delta), atol=1e-7)


def test_conjugate_conjugates_slots(rng):
    N = 256
    slots = N // 2
    m = (
        np.random.default_rng(3).uniform(-1, 1, slots)
        + 1j * np.random.default_rng(4).uniform(-1, 1, slots)
    )
    coeffs = codec.encode(m, rng=rng, scale=2**40, norm="forward")
    conj = codec.conjugate_np(coeffs)
    back = codec.decode(conj, scale=2**40, norm="forward")[:slots]
    np.testing.assert_allclose(back, np.conj(m), atol=1e-7)


def test_padding():
    p = codec.padding([1.0, 2.0], 8)
    assert p.shape == (8,)
    np.testing.assert_array_equal(p[:2], [1.0, 2.0])
    assert (p[2:] == 0).all()
    with pytest.raises(ValueError):
        codec.padding(np.zeros(9), 8)


def test_encode_batch_matches_sequential():
    """encode_batch = one vectorized FFT + one batched device rounding,
    bit-identical to sequential encode calls (randround_batch reproduces
    the sequential counter trajectory exactly)."""
    N = 256
    slots = N // 2
    mrng = np.random.default_rng(11)
    ms = mrng.uniform(-1, 1, (4, slots))

    r1 = Csprng(num_coefs=N, num_channels=[4], num_repeating_channels=2,
                seed=31)
    seq = np.stack([
        np.asarray(codec.encode(m, rng=r1, scale=2**40, norm="forward"))
        for m in ms
    ])
    r2 = Csprng(num_coefs=N, num_channels=[4], num_repeating_channels=2,
                seed=31)
    bat = np.asarray(codec.encode_batch(ms, rng=r2, scale=2**40,
                                        norm="forward"))
    np.testing.assert_array_equal(seq, bat)
    # states advanced identically -> subsequent draws stay in sync
    np.testing.assert_array_equal(np.asarray(r1.states),
                                  np.asarray(r2.states))

    # decode_batch matches per-message decode
    d_seq = np.stack([codec.decode(c, scale=2**40, norm="forward")
                      for c in seq])
    d_bat = codec.decode_batch(bat, scale=2**40, norm="forward")
    np.testing.assert_allclose(d_seq, d_bat, atol=1e-12)


def test_engine_encodecrypt_batch_matches_sequential():
    import jax

    from tiberate_tpu.config.toy import toy_config
    from tiberate_tpu.engine import CkksEngine

    cfg = toy_config(logN=7, num_scales=3, num_special_primes=1,
                     scale_bits=30)
    e_seq = CkksEngine(cfg, seed=9, nonce=5)
    e_bat = CkksEngine(cfg, seed=9, nonce=5)
    mrng = np.random.default_rng(2)
    ms = [mrng.uniform(-1, 1, e_seq.num_slots) for _ in range(3)]
    cts_seq = [e_seq.encodecrypt(m) for m in ms]
    cts_bat = e_bat.encodecrypt_batch(ms)
    for a, b in zip(cts_seq, cts_bat):
        for da, db in zip(a.data, b.data):
            np.testing.assert_array_equal(np.asarray(da), np.asarray(db))
    # and they decrypt
    out = e_bat.decryptcode(cts_bat[0], is_real=True)
    assert np.abs(out - ms[0]).max() < 1e-4


def test_engine_decryptcode_batch_matches_sequential():
    from tiberate_tpu.config.toy import toy_config
    from tiberate_tpu.engine import CkksEngine

    cfg = toy_config(logN=7, num_scales=3, num_special_primes=1,
                     scale_bits=30)
    eng = CkksEngine(cfg, seed=9, nonce=5)
    mrng = np.random.default_rng(3)
    ms = [mrng.uniform(-1, 1, eng.num_slots) for _ in range(3)]
    cts = eng.encodecrypt_batch(ms)
    seq = np.stack([eng.decryptcode(ct, is_real=True) for ct in cts])
    bat = eng.decryptcode_batch(cts, is_real=True)
    # same decrypt cores; decode float summation order may differ by ULPs
    np.testing.assert_allclose(seq, bat, atol=1e-9)
    assert np.abs(bat - np.stack(ms)).max() < 1e-4
    # bias_guard branch: a message with a large DC component
    ms2 = [mrng.uniform(-1, 1, eng.num_slots) + 3.0 for _ in range(2)]
    cts2 = eng.encodecrypt_batch(ms2)
    bat2 = eng.decryptcode_batch(cts2, is_real=True)
    seq2 = np.stack([eng.decryptcode(ct, is_real=True) for ct in cts2])
    np.testing.assert_allclose(seq2, bat2, atol=1e-9)

"""Bit-exactness of the Montgomery kernels against a python-int oracle."""

import numpy as np
import pytest

from tiberate_tpu.ops import mont
from tiberate_tpu.ops.mont import ModPack

Q_LIST = [
    1152921504606844513,  # ~2^60 message-prime-like
    1099510054913,  # ~2^40 scale-prime-like
    576460752303421441,
]

R = 1 << 62


def _pack(qs):
    return ModPack.from_q(qs)


def _rand_residues(qs, n, rng, lo_frac=0.0, hi_frac=2.0):
    """Random values in [lo_frac*q, hi_frac*q) per channel."""
    out = np.empty((len(qs), n), dtype=np.int64)
    for i, q in enumerate(qs):
        lo = int(lo_frac * q)
        hi = int(hi_frac * q)
        out[i] = rng.integers(lo, hi, size=n, dtype=np.int64)
    return out


def test_mont_mult_matches_oracle():
    rng = np.random.default_rng(0)
    pack = _pack(Q_LIST)
    a = _rand_residues(Q_LIST, 64, rng)
    b = _rand_residues(Q_LIST, 64, rng)
    got = np.asarray(mont.mont_mult(a, b, pack))
    for c, q in enumerate(Q_LIST):
        for j in range(a.shape[1]):
            exp = mont.mont_mult_oracle(int(a[c, j]), int(b[c, j]), q)
            assert got[c, j] == exp
            assert 0 <= got[c, j] < 2 * q


def test_mont_mult_signed_inputs():
    """Negative representatives (rescale / basis-extension paths) must give
    the same residue class and the same bits as signed C++ int64."""
    rng = np.random.default_rng(1)
    pack = _pack(Q_LIST)
    a = _rand_residues(Q_LIST, 64, rng) - np.array(Q_LIST)[:, None]
    b = _rand_residues(Q_LIST, 64, rng, hi_frac=1.0)
    got = np.asarray(mont.mont_mult(a, b, pack))
    for c, q in enumerate(Q_LIST):
        for j in range(a.shape[1]):
            exp = mont.mont_mult_oracle(int(a[c, j]), int(b[c, j]), q)
            assert got[c, j] == exp
            # residue class check
            assert (
                int(got[c, j])
                - int(a[c, j]) * int(b[c, j]) * pow(R, -1, q)
            ) % q == 0


def test_mont_enter_reduce_roundtrip():
    rng = np.random.default_rng(2)
    pack = _pack(Q_LIST)
    Rs = np.array(
        [[R * R % q] for q in Q_LIST], dtype=np.int64
    )
    a = _rand_residues(Q_LIST, 128, rng, hi_frac=1.0)
    am = np.asarray(mont.mont_enter(a, Rs, pack))
    for c, q in enumerate(Q_LIST):
        assert (
            (am[c].astype(object) - a[c].astype(object) * R) % q == 0
        ).all()
    back = np.asarray(
        mont.reduce_2q(mont.mont_reduce(am, pack), pack)
    )
    for c, q in enumerate(Q_LIST):
        np.testing.assert_array_equal(back[c] % q, a[c] % q)


def test_mont_add_sub_reduce():
    rng = np.random.default_rng(3)
    pack = _pack(Q_LIST)
    a = _rand_residues(Q_LIST, 128, rng)
    b = _rand_residues(Q_LIST, 128, rng)
    s = np.asarray(mont.mont_add(a, b, pack))
    d = np.asarray(mont.mont_sub(a, b, pack))
    for c, q in enumerate(Q_LIST):
        np.testing.assert_array_equal(s[c] % q, (a[c] + b[c]) % q)
        np.testing.assert_array_equal(d[c] % q, (a[c] - b[c]) % q)
        assert (s[c] < 2 * q).all() and (s[c] >= 0).all()
        assert (d[c] < 2 * q).all() and (d[c] >= 0).all()

    r = np.asarray(mont.reduce_2q(s, pack))
    for c, q in enumerate(Q_LIST):
        assert (r[c] < q).all()
        np.testing.assert_array_equal(r[c], s[c] % q)


def test_signed_unsigned_tile():
    rng = np.random.default_rng(4)
    pack = _pack(Q_LIST)
    a = _rand_residues(Q_LIST, 128, rng, hi_frac=1.0)
    s = np.asarray(mont.make_signed(a, pack))
    for c, q in enumerate(Q_LIST):
        assert (s[c] > -q // 2 - 1).all() and (s[c] <= q // 2).all()
        np.testing.assert_array_equal(s[c] % q, a[c])
    u = np.asarray(mont.make_unsigned(s, pack))
    np.testing.assert_array_equal(u, a)

    poly = rng.integers(-3, 4, size=64).astype(np.int64)
    t = np.asarray(mont.tile_unsigned(poly, pack))
    assert t.shape == (len(Q_LIST), 64)
    for c, q in enumerate(Q_LIST):
        np.testing.assert_array_equal(t[c] % q, poly % q)
        assert (t[c] >= 0).all()

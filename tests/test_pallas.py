"""Pallas kernel tests.

The pair-arithmetic layer is validated everywhere (pure jnp-on-uint32);
the fused NTT kernels need a real TPU (Mosaic) and are exercised when the
ambient backend is one — locally these are covered by the TPU-side runs
(see bench.py and /tmp scripts in CI notes); under the CPU test harness
they skip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiberate_tpu.ops import mont, pallas_mont as pm
from tiberate_tpu.ops.mont import ModPack

QS = [1152921504606830593, 1099510054913]


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    pack = ModPack.from_q(QS)
    a = np.stack([rng.integers(0, 2 * q, 2048) for q in QS]).astype(np.int64)
    b = np.stack([rng.integers(0, 2 * q, 2048) for q in QS]).astype(np.int64)
    return pack, a, b


def test_pair_roundtrip(data):
    _, a, _ = data
    lo, hi = pm.to_pair(jnp.asarray(a))
    back = np.asarray(pm.from_pair(lo, hi))
    np.testing.assert_array_equal(back, a)


def test_mont_mult_pair_bit_exact(data):
    pack, a, b = data
    exp = np.asarray(mont.mont_mult(a, b, pack))
    alo, ahi = pm.to_pair(jnp.asarray(a))
    blo, bhi = pm.to_pair(jnp.asarray(b))
    ql = np.asarray(pack.ql).astype(np.uint32)
    qh = np.asarray(pack.qh).astype(np.uint32)
    kl = np.asarray(pack.kl).astype(np.uint32)
    kh = np.asarray(pack.kh).astype(np.uint32)
    got = np.asarray(
        pm.from_pair(*pm.mont_mult_pair(alo, ahi, blo, bhi, ql, qh, kl, kh))
    )
    np.testing.assert_array_equal(got, exp)


def test_mont_reduce_add_sub_pair_bit_exact(data):
    pack, a, b = data
    alo, ahi = pm.to_pair(jnp.asarray(a))
    blo, bhi = pm.to_pair(jnp.asarray(b))
    ql = np.asarray(pack.ql).astype(np.uint32)
    qh = np.asarray(pack.qh).astype(np.uint32)
    kl = np.asarray(pack.kl).astype(np.uint32)
    kh = np.asarray(pack.kh).astype(np.uint32)
    q2 = pm.to_pair(pack._2q)
    q1 = pm.to_pair(pack._2q >> 1)

    np.testing.assert_array_equal(
        np.asarray(pm.from_pair(*pm.mont_reduce_pair(alo, ahi, ql, qh, kl,
                                                     kh))),
        np.asarray(mont.mont_reduce(a, pack)),
    )
    np.testing.assert_array_equal(
        np.asarray(pm.from_pair(*pm.mont_add_pair(alo, ahi, blo, bhi, *q2))),
        np.asarray(mont.mont_add(a, b, pack)),
    )
    np.testing.assert_array_equal(
        np.asarray(pm.from_pair(*pm.mont_sub_pair(alo, ahi, blo, bhi, *q2))),
        np.asarray(mont.mont_sub(a, b, pack)),
    )
    np.testing.assert_array_equal(
        np.asarray(pm.from_pair(*pm.reduce_2q_pair(alo, ahi, *q1))),
        np.asarray(mont.reduce_2q(a, pack)),
    )


def test_paint_indices_structure():
    from tiberate_tpu.ops.pallas_ntt import build_paint_indices

    logN = 14
    N = 1 << logN
    paint = build_paint_indices(logN)
    assert paint.shape == (logN, N // 2)
    for s in range(logN):
        m = 1 << s
        vals = np.unique(paint[s])
        # stage s uses twiddles psi[m .. 2m)
        assert vals.min() == m and vals.max() == 2 * m - 1
        assert len(vals) == m
        # every twiddle appears t = N/(2m) times
        counts = np.bincount(paint[s])[m:]
        assert (counts == N // (2 * m)).all()


@pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="fused Pallas NTT requires a TPU backend (Mosaic)",
)
def test_pallas_ntt_roundtrip_tpu():
    from tiberate_tpu.ops import ntt as jntt, pallas_ntt as pntt
    from tiberate_tpu.utils.primes import find_the_next_prime

    logN = 14
    N = 1 << logN
    qs = [find_the_next_prime(2**60 - 1, 2 * N, up=False)]
    psi, ipsi = jntt.make_psi_tables(qs, logN)
    R = 1 << 62
    psi_m = np.array([[p * R % qs[0] for p in psi[0]]], dtype=np.int64)
    ipsi_m = np.array([[p * R % qs[0] for p in ipsi[0]]], dtype=np.int64)
    Ninv = np.array([[pow(N, -1, qs[0]) * R % qs[0]]], dtype=np.int64)
    Rs = np.array([[R * R % qs[0]]], dtype=np.int64)
    tables = pntt.build_tables(qs, psi_m, ipsi_m, Ninv, Rs, logN)

    rng = np.random.default_rng(1)
    a = rng.integers(0, qs[0], (1, N)).astype(np.int64)
    A = pntt.ntt(jnp.asarray(a), tables, enter=True)
    back = np.asarray(pntt.intt(A, tables, epilogue="exit_reduce"))
    np.testing.assert_array_equal(back, a)

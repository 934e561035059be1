"""NTT correctness: roundtrip, linearity, negacyclic convolution."""

import numpy as np

from tiberate_tpu.ops import mont, ntt
from tiberate_tpu.ops.mont import ModPack
from tiberate_tpu.utils.primes import find_the_next_prime


def _setup(logN=6, qs=None):
    N = 1 << logN
    if qs is None:
        # NTT-friendly primes near 2^60 and 2^40 for this toy N.
        qs = (
            find_the_next_prime(2**60 - 1, 2 * N, up=False),
            find_the_next_prime(2**40 - 1, 2 * N, up=False),
        )
    pack = ModPack.from_q(qs)
    psi, ipsi = ntt.make_psi_tables(qs, logN)
    R = 1 << 62
    # Enter psi tables into Montgomery form (the reference does this on
    # device at startup, ntt_context.py:239-254).
    psi_m = np.array(
        [[p * R % q for p in row] for row, q in zip(psi, qs)], dtype=np.int64
    )
    ipsi_m = np.array(
        [[p * R % q for p in row] for row, q in zip(ipsi, qs)], dtype=np.int64
    )
    Ninv = np.array(
        [[pow(N, -1, q) * R % q] for q in qs], dtype=np.int64
    )
    Rs = np.array([[R * R % q] for q in qs], dtype=np.int64)
    return N, pack, psi_m, ipsi_m, Ninv, Rs, list(qs)


def test_ntt_intt_roundtrip():
    N, pack, psi_m, ipsi_m, Ninv, Rs, qs = _setup()
    rng = np.random.default_rng(0)
    x = np.stack([rng.integers(0, q, N) for q in qs]).astype(np.int64)

    y = ntt.enter_ntt(x, Rs, psi_m, pack)
    back = np.asarray(ntt.intt_exit_reduce(y, ipsi_m, Ninv, pack))
    np.testing.assert_array_equal(back, x)


def test_ntt_pointwise_is_negacyclic_convolution():
    N, pack, psi_m, ipsi_m, Ninv, Rs, qs = _setup()
    rng = np.random.default_rng(1)
    a = np.stack([rng.integers(0, q, N) for q in qs]).astype(np.int64)
    b = np.stack([rng.integers(0, q, N) for q in qs]).astype(np.int64)

    A = ntt.enter_ntt(a, Rs, psi_m, pack)
    B = ntt.enter_ntt(b, Rs, psi_m, pack)
    C = mont.mont_mult(A, B, pack)
    c = np.asarray(ntt.intt_exit_reduce(C, ipsi_m, Ninv, pack))

    # negacyclic schoolbook product
    for ci, q in enumerate(qs):
        ref = [0] * N
        for i in range(N):
            for j in range(N):
                k = i + j
                s = 1 if k < N else -1
                ref[k % N] = (
                    ref[k % N] + s * int(a[ci, i]) * int(b[ci, j])
                ) % q
        np.testing.assert_array_equal(c[ci] % q, np.array(ref) % q)


def test_ntt_batched_leading_dims():
    N, pack, psi_m, ipsi_m, Ninv, Rs, qs = _setup(logN=5)
    rng = np.random.default_rng(2)
    x = np.stack(
        [
            np.stack([rng.integers(0, q, N) for q in qs])
            for _ in range(3)
        ]
    ).astype(np.int64)
    y = ntt.enter_ntt(x, Rs, psi_m, pack)
    back = np.asarray(ntt.intt_exit_reduce(y, ipsi_m, Ninv, pack))
    np.testing.assert_array_equal(back, x)

"""Native oracle: build + cross-validation against python and jnp paths."""

import numpy as np
import pytest

from tiberate_tpu.ops import mont, ntt
from tiberate_tpu.ops.mont import ModPack
from tiberate_tpu.rng.chacha20 import chacha20_block_oracle
from tiberate_tpu.utils import native
from tiberate_tpu.utils.primes import find_the_next_prime, is_prime


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load()
    except native.NativeUnavailable as e:
        pytest.skip(f"native toolchain unavailable: {e}")


def test_native_prime(lib):
    for n in (2, 97, 2**31 - 1, 1152921504606830593):
        assert native.is_prime(n) == is_prime(n)
    for n in (1, 4, 2**62 - 1):
        assert native.is_prime(n) == is_prime(n)


def test_native_chacha_matches_python(lib):
    rng = np.random.default_rng(0)
    states = rng.integers(0, 2**32, (16, 16), dtype=np.uint32)
    out = native.chacha20_blocks(states)
    for r in range(states.shape[0]):
        exp = chacha20_block_oracle([int(x) for x in states[r]])
        assert [int(x) for x in out[r]] == exp


def test_native_negacyclic_matches_schoolbook(lib):
    logN, N = 5, 32
    q = find_the_next_prime(2**40 - 1, 2 * N, up=False)
    rng = np.random.default_rng(1)
    a = rng.integers(0, q, N).astype(np.int64)
    b = rng.integers(0, q, N).astype(np.int64)
    got = native.negacyclic_mul(a, b, q)
    ref = [0] * N
    for i in range(N):
        for j in range(N):
            k = i + j
            s = 1 if k < N else -1
            ref[k % N] = (ref[k % N] + s * int(a[i]) * int(b[j])) % q
    assert got.tolist() == ref


def test_native_validates_jnp_ntt_full_size(lib):
    """Full-size (N=2^13) cross-check: device pipeline == native oracle."""
    logN = 13
    N = 1 << logN
    qs = [
        find_the_next_prime(2**60 - 1, 2 * N, up=False),
        find_the_next_prime(2**40 - 1, 2 * N, up=False),
    ]
    pack = ModPack.from_q(qs)
    psi, ipsi = ntt.make_psi_tables(qs, logN)
    R = 1 << 62
    psi_m = np.array(
        [[p * R % q for p in row] for row, q in zip(psi, qs)], dtype=np.int64
    )
    ipsi_m = np.array(
        [[p * R % q for p in row] for row, q in zip(ipsi, qs)],
        dtype=np.int64,
    )
    Ninv = np.array([[pow(N, -1, q) * R % q] for q in qs], dtype=np.int64)
    Rs = np.array([[R * R % q] for q in qs], dtype=np.int64)

    rng = np.random.default_rng(2)
    a = np.stack([rng.integers(0, q, N) for q in qs]).astype(np.int64)
    b = np.stack([rng.integers(0, q, N) for q in qs]).astype(np.int64)

    A = ntt.enter_ntt(a, Rs, psi_m, pack)
    B = ntt.enter_ntt(b, Rs, psi_m, pack)
    C = mont.mont_mult(A, B, pack)
    got = np.asarray(ntt.intt_exit_reduce(C, ipsi_m, Ninv, pack))

    for c, q in enumerate(qs):
        exp = native.negacyclic_mul(a[c], b[c], q)
        np.testing.assert_array_equal(got[c], exp)


def test_native_mont_verify(lib):
    q = 1152921504606830593
    rng = np.random.default_rng(3)
    pack = ModPack.from_q([q])
    a = rng.integers(0, 2 * q, (1, 4096)).astype(np.int64)
    b = rng.integers(0, 2 * q, (1, 4096)).astype(np.int64)
    got = np.asarray(mont.mont_mult(a, b, pack))
    assert native.mont_mult_verify(a, b, got, q) == 0
    # corrupt one element -> one violation
    bad = got.copy()
    bad[0, 7] += 1
    assert native.mont_mult_verify(a, b, bad, q) == 1

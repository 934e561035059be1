"""Exact modular matrix multiplication on the MXU (int8 limb decomposition).

The building block of the matmul-form (4-step) NTT — the chartered
speed-of-light path (PERFORMANCE.md): column/row transforms of N = N1 x N2
become ``W @ X mod q`` with constant twiddle matrices, executed as int8 MXU
contractions instead of VPU butterflies.

Method (exact, q < 2^62):

* split both operands into L = 9 limbs of 7 bits (int8 lanes are signed;
  7-bit limbs keep every partial product positive and the 128-term int32
  accumulation at < 2^25),
* P_ij = A_i @ B_j for all limb pairs (81 int8 matmuls, int32 accumulate),
* diagonal sums S_k = sum_{i+j=k} P_ij  (k = 0..16, < 2^25),
* recombination in THREE int64 groups (no per-k modmul):
      low  = sum_{k=0..5}  S_k 2^{7k}   < 2^60
      mid  = sum_{k=6..11} S_k 2^{7(k-6)}
      high = sum_{k=12..16} S_k 2^{7(k-12)}
      C = low + mid*2^42 + high*2^84  (mod q)
  with the two shifted terms folded by one Montgomery multiply each
  (constants 2^42 R mod q, 2^84 R mod q), i.e. ~2 REDCs per output element
  instead of 17.

Output is the lazy representative in [0, 2q + 2^60) — callers running
chains should reduce_2q / fold into the next Montgomery step.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tiberate_tpu.ops import mont
from tiberate_tpu.ops.mont import ModPack

LIMB_BITS = 7
N_LIMBS = 9  # ceil(62 / 7)
LIMB_MASK = (1 << LIMB_BITS) - 1


def to_limbs(x) -> jax.Array:
    """int64 [..., R, C] -> int8 limbs [N_LIMBS, ..., R, C] (7-bit)."""
    x = jnp.asarray(x)
    return jnp.stack(
        [
            ((x >> (LIMB_BITS * i)) & LIMB_MASK).astype(jnp.int8)
            for i in range(N_LIMBS)
        ]
    )


def modmat_consts(q: int):
    """(W42, W84) Montgomery fold constants for one modulus ([1,1] arrays)."""
    R = 1 << 62
    return (
        jnp.array([[pow(2, 42, q) * R % q]], dtype=jnp.int64),
        jnp.array([[pow(2, 84, q) * R % q]], dtype=jnp.int64),
    )


@partial(jax.jit, static_argnames=())
def modmatmul(A_limbs, B_limbs, W42, W84, pack_row: ModPack):
    """Exact (A @ B) mod q (lazy representative).

    A_limbs: [L, K, Ka] int8; B_limbs: [L, Ka, M] int8; q via pack_row
    (single-channel ModPack, [1, 1] constants) and the W42/W84 folds.
    Returns int64 [K, M] with values ≡ A@B (mod q), < 2^62 (lazy).
    """
    L = N_LIMBS
    # limb-pair contractions, grouped by diagonal k = i + j
    S = [None] * (2 * L - 1)
    for i in range(L):
        for j in range(L):
            P = jax.lax.dot_general(
                A_limbs[i], B_limbs[j],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            k = i + j
            S[k] = P if S[k] is None else S[k] + P

    def group(ks):
        acc = None
        for idx, k in enumerate(ks):
            term = S[k].astype(jnp.int64) << (LIMB_BITS * idx)
            acc = term if acc is None else acc + term
        return acc

    low = group(range(0, 6))
    mid = group(range(6, 12))
    high = group(range(12, 17))

    t1 = mont.mont_mult(mid, W42, pack_row)
    t2 = mont.mont_mult(high, W84, pack_row)
    # keep the lazy representative under 2^62 (low < 2^60.1, folded < 2q)
    folded = mont.mont_add(t1, t2, pack_row)
    return low + folded


def modmatmul_ref(A, B, q):
    """Exact numpy/object-int reference for tests."""
    A = np.asarray(A, dtype=np.uint64).astype(object)
    B = np.asarray(B, dtype=np.uint64).astype(object)
    return (A @ B) % q

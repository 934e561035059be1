"""MXU modular matmul primitive: exactness on any backend."""

import numpy as np

import jax.numpy as jnp

from tiberate_tpu.ops import mxu_modmat as mm
from tiberate_tpu.ops.mont import ModPack

Q = 1152921504606830593


def test_limb_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(0, Q, (8, 16)).astype(np.int64)
    limbs = np.asarray(mm.to_limbs(jnp.asarray(x)))
    back = sum(
        limbs[i].astype(np.int64) << (mm.LIMB_BITS * i)
        for i in range(mm.N_LIMBS)
    )
    np.testing.assert_array_equal(back, x)
    assert limbs.min() >= 0 and limbs.max() <= mm.LIMB_MASK


def test_modmatmul_exact():
    rng = np.random.default_rng(1)
    K, M = 128, 256
    A = rng.integers(0, Q, (K, K)).astype(np.int64)
    B = rng.integers(0, 2 * Q, (K, M)).astype(np.int64)  # lazy operands ok

    pack = ModPack.from_q([Q])
    W42, W84 = mm.modmat_consts(Q)
    got = np.asarray(
        mm.modmatmul(
            mm.to_limbs(jnp.asarray(A)), mm.to_limbs(jnp.asarray(B)),
            W42, W84, pack,
        )
    )
    exp = mm.modmatmul_ref(A, B, Q)
    assert ((got.astype(object) - exp) % Q == 0).all()
    assert got.min() >= 0 and got.max() < 2**62  # lazy bound holds

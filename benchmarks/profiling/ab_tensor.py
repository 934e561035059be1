"""A/B: fused ntt_tensor vs unfused enter_ntt+mont chain, logN15 TPU."""
import os as _os
import sys as _sys

# Self-locate the repo root: PYTHONPATH must stay untouched (the axon
# TPU plugin is discovered via the session's PYTHONPATH).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))

import time
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tiberate")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tiberate_tpu.engine import CkksEngine
from tiberate_tpu.engine import ckks_engine as E
from tiberate_tpu.ops import mont, pallas_mxu

B = 8
eng = CkksEngine("logN15", seed=7)
lvl = 1
lp = eng._lp(lvl)
N = eng.params.N
C = lp.num_channels
rng = np.random.default_rng(3)
q = np.array(eng.params.q[lvl:eng.params.P], dtype=np.int64)


def rand():
    return jnp.stack([jnp.asarray(
        rng.integers(0, q[:, None], (C, N)), dtype=jnp.int64)] * B)


x0, x1, y0, y1 = rand(), rand(), rand(), rand()


def unfused(a0, a1, b0, b1):
    pk = lp.pack
    A0 = E._enter_ntt(a0, lp)
    A1 = E._enter_ntt(a1, lp)
    B0 = E._enter_ntt(b0, lp)
    B1 = E._enter_ntt(b1, lp)
    d0 = mont.mont_mult(A0, B0, pk)
    d1 = mont.mont_add(mont.mont_mult(A0, B1, pk),
                       mont.mont_mult(A1, B0, pk), pk)
    d2 = mont.mont_mult(A1, B1, pk)
    return d0, d1, d2


def fused(a0, a1, b0, b1):
    return pallas_mxu.ntt_tensor(a0, a1, b0, b1, lp.pmxu_fwd)


def timed(name, fn):
    f = jax.jit(jax.vmap(fn))
    out = f(x0, x1, y0, y1)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for iters in (3, 13):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(x0, x1, y0, y1)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    dt = (ts[1] - ts[0]) / 10
    print(f"{name:12s} {dt*1e3/B:7.3f} ms/ct ({dt*1e3:.2f} ms/batch)",
          flush=True)
    return out


u = timed("unfused", unfused)
f = timed("fused", fused)
u = timed("unfused", unfused)
f = timed("fused", fused)
for a, b in zip(u, f):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print("bit-identical", flush=True)

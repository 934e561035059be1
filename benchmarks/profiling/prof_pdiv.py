"""Break down the _pdiv_fused epilogue cost on TPU (logN15, B=8)."""
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
lp_ord = eng._lp(lvl)
lp_sp = eng._lp(lvl, special=True)
S = eng.params.S
C = lp_ord.num_channels
C_sp = lp_sp.num_channels
N = eng.params.N
PiRs = tuple(eng.params.PiRs[lvl])
rng = np.random.default_rng(3)
P1, P2 = lp_sp.pmxu_fwd.P1, lp_sp.pmxu_fwd.P2

q_sp = np.concatenate([np.array(eng.params.q[lvl:eng.params.P]),
                       np.array(eng.params.q[eng.params.P:])])
vals = rng.integers(0, q_sp[:, None], (B, C_sp, N)).astype(np.uint64)
acc_pair = (
    jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32)).reshape(B, C_sp, P1, P2),
    jnp.asarray((vals >> 32).astype(np.uint32)).reshape(B, C_sp, P1, P2),
)


def timed(name, fn, *a):
    f = jax.jit(fn)
    out = f(*a)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for iters in (3, 13):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    dt = (ts[1] - ts[0]) / 10
    print(f"{name:34s} {dt*1e3/B:7.3f} ms/ct", flush=True)


# whole epilogue (one accumulator)
timed("pdiv_fused (one acc)", lambda p: E._pdiv_fused(p, lp_sp, lp_ord, PiRs, S),
      acc_pair)

# phase 1: special rows only
def phase1(p):
    lp_spec = lp_sp[C:]
    sp = pallas_mxu.pair_to_poly(
        tuple(v[..., C:, :, :] for v in p), lp_sp.pmxu_fwd)
    cur = E._intt_exit_reduce(sp, lp_spec)
    rows = []
    for i in range(S):
        r = cur[..., S - 1 - i, :]
        rows.append(r)
        if i < S - 1:
            upd = mont.mont_sub(cur, r[..., None, :], lp_spec.pack)
            cur = mont.mont_mult(upd, PiRs[i][C:], lp_spec.pack)
    return rows
timed("phase1 special rows", phase1, acc_pair)

# phase 2 parts
def phase2(p):
    rows = [jnp.zeros((B, N), jnp.int64) + 3, jnp.zeros((B, N), jnp.int64) + 5]
    d_ord = pallas_mxu.pair_to_poly(
        tuple(v[..., :C, :, :] for v in p), lp_sp.pmxu_fwd)
    cols = jnp.concatenate([lp_ord.Rs] + [PiRs[i][:C] for i in range(S)],
                           axis=1).astype(jnp.uint64)
    pdc = jnp.stack(
        [(cols & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
         (cols >> jnp.uint64(32)).astype(jnp.uint32)], axis=-1).reshape(C, -1)
    p0 = tuple(pallas_mxu.coef_row_pairs(r, lp_ord.pmxu_inv) for r in rows)
    return pallas_mxu.intt_pdiv(d_ord, lp_ord.pmxu_inv, p0, pdc)
timed("phase2 intt_pdiv (fixed rows)", phase2, acc_pair)

# plain intt of the 16 ordinary rows for comparison
def plain_intt(p):
    d_ord = pallas_mxu.pair_to_poly(
        tuple(v[..., :C, :, :] for v in p), lp_sp.pmxu_fwd)
    return E._intt_exit_reduce(d_ord, lp_ord)
timed("plain intt_exit [16,N]", plain_intt, acc_pair)

# pair_to_poly alone
timed("pair_to_poly [18,N]", lambda p: pallas_mxu.pair_to_poly(p, lp_sp.pmxu_fwd),
      acc_pair)

# isolate: intt variants, with/without reduce, input form
x64 = pallas_mxu.pair_to_poly(acc_pair, lp_sp.pmxu_fwd)[..., :C, :]
x64 = jnp.asarray(np.asarray(x64))  # materialized int64 input
timed("intt exit (no reduce)", lambda v: pallas_mxu.intt(v, lp_ord.pmxu_inv, "exit"), x64)
timed("intt mont (no reduce)", lambda v: pallas_mxu.intt(v, lp_ord.pmxu_inv, "mont"), x64)
timed("reduce_2q only", lambda v: mont.reduce_2q(v, lp_ord.pack), x64)
timed("intt exit + reduce", lambda v: mont.reduce_2q(
    pallas_mxu.intt(v, lp_ord.pmxu_inv, "exit"), lp_ord.pack), x64)

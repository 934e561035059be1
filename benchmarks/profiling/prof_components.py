"""Component-level timing of the logN15 batched cc_mult on the TPU.

Times each jitted stage with host-fetch sync; reports per-ct ms using the
slope between iteration counts (cancels ~26ms tunnel overhead).
"""
import os as _os
import sys as _sys

# Self-locate the repo root: PYTHONPATH must stay untouched (the axon
# TPU plugin is discovered via the session's PYTHONPATH).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))

import time, json
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tiberate")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tiberate_tpu.engine import CkksEngine
from tiberate_tpu.engine import ckks_engine as E
from tiberate_tpu.parallel.sharded import make_mult_step, mult_step_params

B = 8
eng = CkksEngine("logN15", seed=7)
rng = np.random.default_rng(7)
m = rng.uniform(-1, 1, eng.num_slots)
ct = eng.encodecrypt(m)
lvl = 1
lp_ord = eng._lp(lvl)
lp_sp = eng._lp(lvl, special=True)
C = lp_ord.num_channels
C_sp = lp_sp.num_channels
N = eng.params.N

x = jnp.stack([jnp.asarray(np.asarray(ct.data[0])[lvl:], dtype=jnp.int64)] * B)
evk_parts, parts = eng._ksk_args(eng.evk, lvl)
print(f"C={C} C_sp={C_sp} N={N} n_parts={len(parts)} S={eng.params.S}", flush=True)

def timed(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda t: np.asarray(t.ravel()[0]) if hasattr(t, 'ravel') else t, out)
    ts = []
    for iters in (8, 24):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0])
        ts.append((time.perf_counter() - t0, iters))
    dt = (ts[1][0] - ts[0][0]) / (ts[1][1] - ts[0][1])
    print(f"{name:40s} {dt*1e3/B:8.3f} ms/ct  ({dt*1e3:.2f} ms/batch{B})", flush=True)
    return out

# forward NTT [B, C, N]
f_ntt = jax.jit(jax.vmap(lambda a: E._enter_ntt(a, lp_ord)))
timed("enter_ntt [C,N]", f_ntt, x)

# inverse NTT
f_intt = jax.jit(jax.vmap(lambda a: E._intt_exit_reduce(a, lp_ord)))
timed("intt_exit_reduce [C,N]", f_intt, x)

# tensor core (4 ntt + 4 mult + add)
f_tensor = jax.jit(jax.vmap(lambda a, b: E._ccmult_tensor_core(a, b, a, b, lp_ord)))
timed("ccmult_tensor (4 ntt + prods)", f_tensor, x, x)

# one part: pre_extend + extend + fused ntt_keymul
from tiberate_tpu.ops import pallas_mxu
part = parts[0]
k0, k1 = evk_parts[0]
def one_part(a):
    plp = lp_ord[part.lo:part.hi]
    state = E._pre_extend(a[part.lo:part.hi], part, plp)
    ext = E._extend(state, part, lp_sp, lvl)
    return pallas_mxu.ntt_keymul(
        ext, lp_sp.pmxu_fwd,
        ((k0[0][lvl:], k0[1][lvl:]), (k1[0][lvl:], k1[1][lvl:])),
        accum=None, pair_out=True)
f_part = jax.jit(jax.vmap(one_part))
timed("one ks part (ext+ntt_keymul)", f_part, x)

# just the part ntt [C_sp, N]
qs = np.array(eng.params.q, dtype=np.uint64)
q_sp = np.concatenate([qs[lvl:eng.params.P], qs[eng.params.P:]])
xsp_np = (rng.integers(0, 2**62, (C_sp, N), dtype=np.int64) % q_sp[:, None].astype(np.int64))
xsp = jnp.stack([jnp.asarray(xsp_np, dtype=jnp.int64)] * B)
f_nttsp = jax.jit(jax.vmap(lambda a: E._ntt_plain(a, lp_sp)))
timed("ntt_plain [C_sp,N]", f_nttsp, xsp)

# extension only
def ext_only(a):
    plp = lp_ord[part.lo:part.hi]
    state = E._pre_extend(a[part.lo:part.hi], part, plp)
    return E._extend(state, part, lp_sp, lvl)
timed("pre_extend+extend only", jax.jit(jax.vmap(ext_only)), x)

# full switcher (keys ride as ARGUMENTS: baked-in quad literals
# overflow the tunneled remote-compile transport with HTTP 413)
PiRs = eng.params.PiRs[lvl]
f_sw = jax.jit(jax.vmap(lambda a, kp: E._switcher_body(
    a, kp, parts, lp_sp, lp_ord, PiRs, lvl, eng.params.S, False),
    in_axes=(0, None)))
a_coef = jnp.stack([jnp.asarray(np.asarray(ct.data[1])[lvl:], dtype=jnp.int64)] * B)
timed("full switcher (9 parts + P-div)", f_sw, a_coef, evk_parts)

# rescale
rs = eng.params.rescale_scales[0]
lp_next = eng._lp(1)
f_rs = jax.jit(jax.vmap(lambda d: E._rescale_core(
    d, rs, lp_next, eng.params.q[0] // 2, True)))
x0 = jnp.stack([jnp.asarray(np.asarray(ct.data[0]), dtype=jnp.int64)] * B)
timed("rescale_core", f_rs, x0)

# whole step for reference
step = make_mult_step(eng, level=0, pre_rescale=True)
prm = mult_step_params(eng, level=0, pre_rescale=True)
batched = jax.jit(jax.vmap(step, in_axes=(0, 0, 0, 0, None, None)))
args = tuple(jnp.stack([ct.data[i]] * B) for i in (0, 1, 0, 1))
timed("FULL cc_mult step", batched, *args, evk_parts, prm)

# parts-fused switcher (the default path) + its pieces
pf = eng._ksk_parts_fused(eng.evk, lvl)
if pf is not None:
    f_swf = jax.jit(jax.vmap(lambda a, kp, pf_: E._switcher_body(
        a, kp, parts, lp_sp, lp_ord, PiRs, lvl, eng.params.S,
        False, parts_fused=pf_), in_axes=(0, None, None)))
    timed("parts-fused switcher (kernel+Pdiv)", f_swf, a_coef, evk_parts,
          pf)

    keys_st, ec = pf
    amax = max(pt.alpha for pt in parts)

    def digits_only(a):
        sts = []
        for part in parts:
            st = E._pre_extend(a[part.lo:part.hi], part,
                               lp_ord[part.lo:part.hi])
            if part.alpha < amax:
                st = jnp.concatenate(
                    [st, jnp.zeros((amax - part.alpha, N), st.dtype)], axis=0)
            sts.append(st)
        return jnp.stack(sts)
    timed("  pre_extend digits (9 parts)", jax.jit(jax.vmap(digits_only)),
          a_coef)

    wl_k = 1 if lp_sp.pmxu_fwd.lane == "single" else 2
    def kernel_only(a, ks, ec_):
        st_all = digits_only(a)
        return pallas_mxu.ntt_keymul_parts(st_all, ec_, lp_sp.pmxu_fwd,
                                           ks, shoup=len(ks[0]) > wl_k)
    timed("  digits + ntt_keymul_parts",
          jax.jit(jax.vmap(kernel_only, in_axes=(0, None, None))),
          a_coef, keys_st, ec)

    def pdiv_only(pair0):
        return E._pdiv_fused(pair0, lp_sp, lp_ord, PiRs, eng.params.S)
    # build a real acc pair shape [C_sp, P1, P2] x2 lanes
    P1, P2 = lp_sp.pmxu_fwd.P1, lp_sp.pmxu_fwd.P2
    accp = tuple(jnp.stack([jnp.asarray(
        rng.integers(0, 2**31, (C_sp, P1, P2), dtype=np.int64),
        dtype=jnp.uint32)] * B) for _ in range(2))
    timed("  pdiv_fused (1 of 2)", jax.jit(lambda p: jax.vmap(
        lambda q0_, q1_: pdiv_only((q0_, q1_)))(p[0], p[1])), accp)

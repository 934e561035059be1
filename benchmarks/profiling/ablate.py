"""Ablation timing of the logN15 batched cc_mult step on TPU.

Times step variants with stages removed; the deltas attribute time to
each stage as it runs IN CONTEXT (same fusion environment).
"""
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
from tiberate_tpu.ops import pallas_mxu
from tiberate_tpu.parallel.sharded import make_mult_step, mult_step_params

B = 8
eng = CkksEngine("logN15", seed=7)
rng = np.random.default_rng(7)
m = rng.uniform(-1, 1, eng.num_slots)
ct = eng.encodecrypt(m)
level = 0
S = eng.ckksCfg.num_special_primes
work_level = 1
round_at = eng.params.q[level] // 2
alloc = tuple(eng.params.parts_alloc[work_level])
prm = mult_step_params(eng, level=level, pre_rescale=True)
evk_parts = tuple(eng._ksk_device(eng.evk))
args = tuple(jnp.stack([ct.data[i]] * B) for i in (0, 1, 0, 1))


def timed(name, step):
    f = jax.jit(jax.vmap(step, in_axes=(0, 0, 0, 0, None, None)))
    out = f(*args, evk_parts, prm)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for iters in (3, 13):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args, evk_parts, prm)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    dt = (ts[1] - ts[0]) / 10
    print(f"{name:36s} {dt*1e3/B:7.3f} ms/ct", flush=True)
    return dt * 1e3 / B


def make_step(do_rescale=True, n_parts=None, do_pdiv=True, do_tensor=True):
    def step(a0, a1, b0, b1, ksk_parts, prm):
        if do_rescale:
            rs, lpn = prm["rescale_scale"], prm["lp_next"]
            a0 = E._rescale_core(a0, rs, lpn, round_at, True)
            a1 = E._rescale_core(a1, rs, lpn, round_at, True)
            b0 = E._rescale_core(b0, rs, lpn, round_at, True)
            b1 = E._rescale_core(b1, rs, lpn, round_at, True)
        else:
            a0, a1, b0, b1 = (v[1:] for v in (a0, a1, b0, b1))
        lp_ord, lp_sp = prm["lp_ord"], prm["lp_sp"]
        if do_tensor:
            d0, d1, d2 = E._ccmult_tensor_core(a0, a1, b0, b1, lp_ord)
        else:
            d0, d1, d2 = a0, a1, b0
        # relinearize body inline (mirror _relin_core) with a part limit
        d0 = E._intt_exit_reduce(d0, lp_ord) if do_tensor else d0
        d1i = E._intt_exit_reduce(d1, lp_ord) if do_tensor else d1
        a = E._intt_exit_reduce(d2, lp_ord) if do_tensor else d2
        parts = prm["parts"] if n_parts is None else prm["parts"][:n_parts]
        ksk_sel = tuple(ksk_parts[g] for g in alloc)
        acc = None
        for part, (k0, k1) in zip(parts, ksk_sel):
            plp = lp_ord[part.lo:part.hi]
            state = E._pre_extend(a[part.lo:part.hi], part, plp)
            ext = E._extend(state, part, lp_sp, work_level)
            acc = pallas_mxu.ntt_keymul(
                ext, lp_sp.pmxu_fwd,
                ((k0[0][work_level:], k0[1][work_level:]),
                 (k1[0][work_level:], k1[1][work_level:])),
                accum=acc, pair_out=True)
        if acc is None:
            return a[:16], d1i[..., :16, :] if do_tensor else d1i[:16]
        if do_pdiv:
            c0 = E._pdiv_fused(acc[0], lp_sp, lp_ord, prm["PiRs"], S)
            c1 = E._pdiv_fused(acc[1], lp_sp, lp_ord, prm["PiRs"], S)
        else:
            c0 = acc[0][0][..., 0, :, :].astype(jnp.int64)[:16]
            c1 = acc[1][0][..., 0, :, :].astype(jnp.int64)[:16]
            return c0, c1
        from tiberate_tpu.ops import mont
        pk = lp_ord.pack
        new0 = mont.reduce_2q(mont.mont_add(d0, c0, pk), pk)
        new1 = mont.reduce_2q(mont.mont_add(d1i, c1, pk), pk)
        return new0, new1
    return step


full = timed("FULL (inline mirror)", make_step())
ref = timed("reference make_mult_step", make_mult_step(eng, 0, True))
no_rs = timed("no rescale", make_step(do_rescale=False))
p0 = timed("0 parts (no keyswitch NTTs)", make_step(n_parts=0, do_pdiv=False))
p1 = timed("1 part", make_step(n_parts=1, do_pdiv=False))
p9 = timed("9 parts, no pdiv", make_step(n_parts=None, do_pdiv=False))
no_t = timed("no tensor (identity)", make_step(do_tensor=False))
print()
print(f"rescale x4        : {full - no_rs:7.3f}")
print(f"per ks part       : {(p9 - p0) / 9:7.3f}  (9 parts: {p9 - p0:.3f})")
print(f"pdiv epilogue x2  : {full - p9:7.3f}")
print(f"tensor+3intt      : {full - no_t:7.3f}")
print(f"base (0p, no pdiv): {p0:7.3f}")

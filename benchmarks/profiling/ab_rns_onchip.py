"""On-chip A/B: rns-sharded keyswitch (shard_map + fused Pallas kernels)
vs the unsharded fast path — SAME real TPU chip, mesh ('rns',)=1.

The multi-chip switcher (`parallel/rns_sharded.py`) had only interpret-mode
CPU parity before r5; this script runs it on the real chip with the fused
MXU kernels (use_pallas via the engine gate), checks bit-exactness against
`eng.create_switcher`, and times both.  With D=1 the all_gather degenerates
but every other piece — the shard_map partitioning, the head/tail force_L
table split, the per-part Pallas keymul, the distributed P-division
epilogue — is the code multi-chip mode executes per shard, so "within ~10%
of the unsharded path" here certifies the kernel x sharding composition
(VERDICT r4 #4).  Reference point: multi-GPU runs the same CUDA kernels
per device (`/root/reference/csrc/mont.cpp:17-24`).

Run from the repo root (do NOT override PYTHONPATH — the TPU plugin is
discovered through it):

    python benchmarks/profiling/ab_rns_onchip.py
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))

import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tiberate")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.sharding import Mesh

from tiberate_tpu.engine import CkksEngine
from tiberate_tpu.config.ckks_config import CkksConfig
from tiberate_tpu.parallel.rns_sharded import make_rns_sharded_switcher

ITERS = int(_os.environ.get("ITERS", "30"))
LEVEL = 0

print("device:", jax.devices()[0])
eng = CkksEngine(CkksConfig.parse("logN15"), seed=1234, nonce=1)
assert eng.use_pallas_mxu, "engine Pallas gate off — not on TPU?"
evk = eng.evk
C = eng.params.P
rng = np.random.default_rng(0)
a = jnp.asarray(np.stack([
    rng.integers(0, int(q), eng.params.N) for q in eng.params.q[:C]
]).astype(np.int64))

# Keys and twiddle tables ride as jit ARGUMENTS throughout: closed-over
# device arrays become HLO literals, and the evk (pairs, ~100 MB at
# logN15) overflows the tunnel's remote-compile transport (HTTP 413).
from tiberate_tpu.engine import ckks_engine as E

ksk_parts, parts = eng._ksk_args(evk, LEVEL)
lp_ord = eng._lp(LEVEL, False)
lp_sp = eng._lp(LEVEL, True)
PiRs = tuple(eng.params.PiRs[LEVEL])
S = eng.ckksCfg.num_special_primes

# --- unsharded fast path (pair keys — same key form the sharded path
# uses, so the A/B isolates the shard_map + table-split overhead) ---
un_fn = jax.jit(lambda x, kp: E._switcher_body(
    x, kp, parts, lp_sp, lp_ord, PiRs, LEVEL, S, False))
un = lambda x: un_fn(x, ksk_parts)
r0, r1 = jax.block_until_ready(un(a))

# --- sharded path, 1-device rns mesh on the real chip ---
mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("rns",))
sw = make_rns_sharded_switcher(eng, LEVEL, mesh, axis="rns")
ksk_prep = sw.prepare_ksk(tuple(evk.data))
sh_fn = jax.jit(lambda x, kp, tbl: sw(x, kp, tables=tbl))
sh = lambda x: sh_fn(x, ksk_prep, sw.tables)
s0, s1 = jax.block_until_ready(sh(a))

exact = (np.asarray(r0) == np.asarray(s0)).all() and \
        (np.asarray(r1) == np.asarray(s1)).all()
print("bit-exact on chip:", bool(exact))


def timeit(fn):
    jax.block_until_ready(fn(a))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


t_un = timeit(un)
t_sh = timeit(sh)
print(f"unsharded create_switcher: {t_un:.3f} ms")
print(f"rns-sharded (D=1, pallas): {t_sh:.3f} ms")
print(f"sharded/unsharded: {t_sh / t_un:.3f}  (target <= ~1.10)")

"""A/B: per-part keyswitch chain vs the all-parts-fused kernel
(TIBERATE_PARTS_KERNEL), full cc_mult step at logN15, real TPU.

Run twice from the repo root (fresh process per variant — the env gate
is read at prm build):

    python benchmarks/profiling/ab_parts.py
    TIBERATE_PARTS_KERNEL=1 python benchmarks/profiling/ab_parts.py

(Do NOT override PYTHONPATH — the TPU plugin is discovered through it;
the script self-locates the repo root below.)
"""
import os as _os
import sys as _sys

# Self-locate the repo root: PYTHONPATH must stay untouched (the axon
# TPU plugin is discovered via the session's PYTHONPATH).
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))

import os
import time

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tiberate")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from tiberate_tpu.engine import CkksEngine
from tiberate_tpu.parallel.sharded import make_mult_step, mult_step_params

B = 8
eng = CkksEngine("logN15", seed=7)
rng = np.random.default_rng(7)
ms = [rng.uniform(-1, 1, eng.num_slots) for _ in range(2 * B)]
cts = [eng.encodecrypt(m) for m in ms]
evk_parts = tuple(eng._ksk_device(eng.evk))
step = make_mult_step(eng, level=0, pre_rescale=True)
prm = mult_step_params(eng, level=0, pre_rescale=True)
batched = jax.jit(jax.vmap(step, in_axes=(0, 0, 0, 0, None, None)))
args = tuple(
    jnp.stack([cts[j].data[i] for j in range(B)])
    for i in (0, 1) for _ in (0,)
) + tuple(
    jnp.stack([cts[B + j].data[i] for j in range(B)])
    for i in (0, 1)
)

out = batched(*args, evk_parts, prm)
np.asarray(out[0][0, 0, :4])
ts = []
for iters in (3, 13):
    t0 = time.perf_counter()
    for _ in range(iters):
        out = batched(*args, evk_parts, prm)
    np.asarray(out[0][0, 0, :4])
    ts.append(time.perf_counter() - t0)
dt = (ts[1] - ts[0]) / 10 / B
mode = ("parts-fused" if os.environ.get("TIBERATE_PARTS_KERNEL") == "1"
        else "per-part chain")
print(f"{mode:16s} {dt*1e3:7.3f} ms/ct  ({1/dt:.1f} ct/s)")

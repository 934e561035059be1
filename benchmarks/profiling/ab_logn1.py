"""A/B: forward-table factorization logN1=7 (P1=128, P2=256, default)
vs logN1=8 (P1=256, P2=128) for the fused Pallas NTT at logN15.

Motivation (r5 prof_components): inverse rows run 6.7 us while forward
rows run 11.3 us — the inverse's swapped layout contracts the larger
axis first.  If the forward transform matches it by choosing P1=256,
the keyswitch part kernel (58% of the step) gets proportionally faster.

Run from the repo root; one process at a time on the tunnel.
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

from tiberate_tpu.engine import CkksEngine
from tiberate_tpu.ops import pallas_mxu
from tiberate_tpu.ops.pallas_mxu_tables import build_tables

B = 8
eng = CkksEngine("logN15", seed=7)
lvl = 1
q_sp = (list(eng.params.q[lvl:eng.params.P])
        + list(eng.params.q[eng.params.P:]))
C = len(q_sp)
N = eng.params.N
rng = np.random.default_rng(0)
x_np = np.stack([rng.integers(0, int(q), N) for q in q_sp]).astype(np.int64)
x = jnp.stack([jnp.asarray(x_np)] * B)

ref = None
for logN1 in (7, 8):
    t = build_tables(q_sp, 15, logN1=logN1)
    fn = jax.jit(lambda v, t=t: pallas_mxu.ntt(v, t))
    out = np.asarray(fn(x))
    if ref is None:
        ref = out % np.array(q_sp)[None, :, None]
    else:
        same = (out % np.array(q_sp)[None, :, None] == ref).all()
        print("logN1=8 residues match logN1=7:", bool(same))
    ts = []
    for iters in (8, 24):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(x)
        np.asarray(o.ravel()[0])
        ts.append(time.perf_counter() - t0)
    dt = (ts[1] - ts[0]) / 16
    print(f"logN1={logN1}: fwd ntt [C={C},N] {dt*1e3:.3f} ms/batch{B} "
          f"({dt*1e6/(C*B):.2f} us/row)")

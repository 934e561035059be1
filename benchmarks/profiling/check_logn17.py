"""On-chip parity + timing for the P1-blocked fused kernel at logN17
(VERDICT r2 #6).  Compares pallas_mxu against the XLA matmul form
(ops/mxu_ntt, itself oracle-tested) on real logN17 moduli, then times
both.  Run: python benchmarks/profiling/check_logn17.py
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

from tiberate_tpu.config.ckks_config import CkksConfig
from tiberate_tpu.utils import primes as primes_mod
from tiberate_tpu.ops import mxu_ntt, pallas_mxu

logN = 17
N = 1 << logN
cfg = CkksConfig.parse("logN17")
from tiberate_tpu.context.mont_context import MontgomeryContext
ctx = MontgomeryContext.from_ckks_config(cfg)
q = [int(x) for x in ctx.q[:6]]          # base + scales + ... 6 rows
print("moduli bits:", [x.bit_length() for x in q])

rng = np.random.default_rng(0)
x = jnp.array(np.stack([rng.integers(0, qi, N) for qi in q]), dtype=jnp.int64)
qcol = np.array(q)[:, None]

fwd_o = mxu_ntt.build_tables(q, logN)
fwd_k = pallas_mxu.build_tables(q, logN)
inv_k = pallas_mxu.build_tables(q, logN, inverse=True)
inv_o = mxu_ntt.build_tables(q, logN, inverse=True)
wl = 2
g = fwd_k.groups[0]
print("p1b fwd:", pallas_mxu._pick_p1b(g.L, g.sa, g.sb, fwd_k.P1,
                                       fwd_k.P2, wl, 0, 0))

f_o = jax.jit(lambda a: mxu_ntt.ntt(a, fwd_o, enter=True))
f_k = jax.jit(lambda a: pallas_mxu.ntt(a, fwd_k, enter=True))
i_k = jax.jit(lambda a: pallas_mxu.intt(a, inv_k, epilogue="exit"))
i_o = jax.jit(lambda a: mxu_ntt.intt(a, inv_o, epilogue="exit"))

a = np.asarray(f_o(x))
b = np.asarray(f_k(x))
ok_f = ((a % qcol) == (b % qcol)).all()
print("fwd parity:", bool(ok_f))
ai = np.asarray(i_o(jnp.asarray(a)))
bi = np.asarray(i_k(jnp.asarray(a)))
print("inv parity:", bool(((ai % qcol) == (bi % qcol)).all()))

def bench(f, x, iters=20):
    f(x).block_until_ready()
    ts = []
    for it in (iters, 3 * iters):
        t0 = time.perf_counter()
        for _ in range(it):
            out = f(x)
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (2 * iters)

print(f"fwd xla   : {bench(f_o, x)*1e3:8.3f} ms / {len(q)} rows")
print(f"fwd pallas: {bench(f_k, x)*1e3:8.3f} ms / {len(q)} rows")
print(f"inv pallas: {bench(i_k, jnp.asarray(a))*1e3:8.3f} ms")

"""VPU speed-of-light check for the fold primitives: a pallas kernel
applying K chained _shoup_mult (pair lane) / _shoup_mult32 (single lane)
to a resident block, timed per element-op.  If the achieved u32 op rate
is far below the nominal 3.85 T-op/s (integer multiplies are not 1-op on
the VPU), the compute-aware roofline's VPU bound is optimistic and the
kernel is closer to its true ceiling than vs_baseline suggests."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.dirname(_os.path.abspath(__file__)))))

import time

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tiberate")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiberate_tpu.ops import pallas_mxu as P

q = (1 << 41) - 143  # a 41-bit prime-ish modulus (value only matters for ranges)
w = q - 12345
sh = (w << 62) // q
import numpy as _np
w0, w1 = np.uint32(w & 0x7FFFFFFF), np.uint32(w >> 31)
s0, s1 = np.uint32(sh & 0x7FFFFFFF), np.uint32((sh >> 31) & 0xFFFFFFFF)
q0, q1 = np.uint32(q & 0x7FFFFFFF), np.uint32(q >> 31)
q2 = 2 * q
q2lo, q2hi = np.uint32(q2 & 0xFFFFFFFF), np.uint32(q2 >> 32)

K = 32
R, Cc = 256, 512   # block [256, 512] u32


def kern(xlo_ref, xhi_ref, olo_ref, ohi_ref):
    lo, hi = xlo_ref[...], xhi_ref[...]
    for _ in range(K):
        lo, hi = P._shoup_mult(lo, hi, w0, w1, s0, s1, q0, q1, q2lo, q2hi)
    olo_ref[...] = lo
    ohi_ref[...] = hi


B = 64
_z = np.int32(0)  # python 0 traces as i64 index under x64 mode
f = pl.pallas_call(
    kern,
    grid=(B,),
    in_specs=[pl.BlockSpec((1, R, Cc), lambda b: (b, _z, _z),
                           memory_space=pltpu.VMEM)] * 2,
    out_specs=[pl.BlockSpec((1, R, Cc), lambda b: (b, _z, _z),
                            memory_space=pltpu.VMEM)] * 2,
    out_shape=[jax.ShapeDtypeStruct((B, R, Cc), jnp.uint32)] * 2,
)
f = jax.jit(f)
rng = np.random.default_rng(0)
xlo = jnp.array(rng.integers(0, 2**32, (B, R, Cc), dtype=np.uint64)
                .astype(np.uint32))
xhi = jnp.array(rng.integers(0, 2**28, (B, R, Cc), dtype=np.uint64)
                .astype(np.uint32))
out = f(xlo, xhi)
np.asarray(out[0][0, 0, :4])
ts = []
for it in (10, 30):
    t0 = time.perf_counter()
    for _ in range(it):
        out = f(xlo, xhi)
    np.asarray(out[0][0, 0, :4])
    ts.append(time.perf_counter() - t0)
dt = (ts[1] - ts[0]) / 20
elems = B * R * Cc * K
# ~131 "ops" per _shoup_mult after the quotient-term drop (counted from
# the primitive bodies: 3x _mul31@12, 1x low64 pair mults etc.)
print(f"per shoup_mult per element: {dt / elems * 1e9:.3f} ns")
print(f"achieved fold rate: {elems / dt / 1e12:.3f} T-shoup/s")
for ops in (130, 190):
    print(f"  = {elems * ops / dt / 1e12:.2f} T-op/s at {ops} ops/fold")

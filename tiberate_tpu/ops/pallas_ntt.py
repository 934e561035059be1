"""Fused negacyclic NTT/iNTT Pallas kernels (uint32-pair arithmetic).

TPU-native replacement for the per-stage CUDA launches of the reference
(``csrc/cuda/ntt_cuda.cu:89-100``): ALL butterfly stages of one RNS channel
run in a single kernel with the polynomial resident in VMEM, in two phases:

* **phase 1** (strides >= 128): the ``[R, 128]`` (sublane x lane) view makes
  every butterfly a row operation — pure leading-dim reshapes, zero lane
  shuffles,
* **transpose** ``[R, 128] -> [128, R]`` (one XLA pass between the two
  kernels): the remaining strides t < 128 become row strides ``t*R >= 128``
  in the transposed view,
* **phase 2**: the same reshape-butterfly form on the transposed array.

Twiddles are host-painted per stage into the *position* order each phase
sees (the TPU analogue of the reference's painted index tables,
``ntt_context.py:81-134``) so kernels do zero index arithmetic.  The NTT
output order is therefore a fixed implementation-defined permutation — the
pointwise domain — and the iNTT kernels run the mirror schedule, giving
bit-identical coefficient-domain results to the int64 jnp path.

Requires N >= 2^14 (presets logN14..17); smaller rings use the jnp path.
"""

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiberate_tpu.ops import pallas_mont as pm

LANES = 128

# const vector layout per channel:
# 0:ql 1:qh 2:kl 3:kh 4:q2lo 5:q2hi 6:Rslo 7:Rshi 8:Ninvlo 9:Ninvhi
# 10:qlo 11:qhi
N_CONST = 12


def build_paint_indices(logN: int, lanes: int = LANES) -> np.ndarray:
    """[logN, N/2] twiddle indices (m + group) in per-phase position order."""
    N = 1 << logN
    R = N // lanes
    n1 = logN - 7
    half = N // 2
    ar = np.arange(half, dtype=np.int64)
    paints = []
    for s in range(logN):
        m = 1 << s
        t = N >> (s + 1)
        if s < n1:
            idx = m + ar // t
        else:
            tR = t * R
            b = ar // tR
            u = ar % tR
            p = b * (2 * tR) + tR + u  # V-element position (transposed)
            nat = (p % R) * lanes + (p // R)  # its natural coefficient idx
            idx = m + (nat >> int(np.log2(2 * t)))
        paints.append(idx)
    return np.stack(paints)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class NttTables:
    """Device tables for the Pallas NTT at one channel set."""

    cons: jax.Array      # [C, N_CONST] uint32
    f1lo: jax.Array      # [C, n1, N/2] forward phase-1 twiddles
    f1hi: jax.Array
    f2lo: jax.Array      # [C, n2, N/2] forward phase-2 twiddles
    f2hi: jax.Array
    i1lo: jax.Array      # [C, n1, N/2] inverse twiddles, phase-1 stages
    i1hi: jax.Array
    i2lo: jax.Array      # [C, n2, N/2] inverse twiddles, phase-2 stages
    i2hi: jax.Array
    logN: int

    def tree_flatten(self):
        return (
            (self.cons, self.f1lo, self.f1hi, self.f2lo, self.f2hi,
             self.i1lo, self.i1hi, self.i2lo, self.i2hi),
            self.logN,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, logN=aux)

    def __getitem__(self, sl):
        return NttTables(
            cons=self.cons[sl], f1lo=self.f1lo[sl], f1hi=self.f1hi[sl],
            f2lo=self.f2lo[sl], f2hi=self.f2hi[sl], i1lo=self.i1lo[sl],
            i1hi=self.i1hi[sl], i2lo=self.i2lo[sl], i2hi=self.i2hi[sl],
            logN=self.logN,
        )


def build_tables(q_list, psi_mont, ipsi_mont, Ninv, Rs, logN) -> NttTables:
    """Host-build the painted twiddle pairs + constant vectors.

    psi_mont/ipsi_mont: [C, N] int64 Montgomery-form bit-reversed series
    (the same arrays the jnp path uses); Ninv/Rs: [C, 1] int64.
    """
    N = 1 << logN
    n1 = logN - 7
    paint = build_paint_indices(logN)

    psi = np.asarray(psi_mont, dtype=np.uint64)
    ipsi = np.asarray(ipsi_mont, dtype=np.uint64)
    C = psi.shape[0]

    def pairs(v):
        return (
            (v & 0xFFFFFFFF).astype(np.uint32),
            (v >> 32).astype(np.uint32),
        )

    fwd = psi[:, paint]   # [C, logN, N/2]
    inv = ipsi[:, paint]
    f_lo, f_hi = pairs(fwd)
    i_lo, i_hi = pairs(inv)

    cons = np.zeros((C, N_CONST), dtype=np.uint32)
    R62 = 1 << 62
    for c, q in enumerate(q_list):
        q = int(q)
        k = (R62 * pow(R62, -1, q) - 1) // q
        cons[c, 0] = q & 0x7FFFFFFF
        cons[c, 1] = q >> 31
        cons[c, 2] = k & 0x7FFFFFFF
        cons[c, 3] = k >> 31
        q2 = 2 * q
        cons[c, 4] = q2 & 0xFFFFFFFF
        cons[c, 5] = q2 >> 32
        Rs_c = int(np.asarray(Rs)[c, 0])
        cons[c, 6] = Rs_c & 0xFFFFFFFF
        cons[c, 7] = Rs_c >> 32
        Ninv_c = int(np.asarray(Ninv)[c, 0])
        cons[c, 8] = Ninv_c & 0xFFFFFFFF
        cons[c, 9] = Ninv_c >> 32
        cons[c, 10] = q & 0xFFFFFFFF
        cons[c, 11] = q >> 32

    return NttTables(
        cons=jnp.array(cons).reshape(C, 1, N_CONST),
        f1lo=jnp.array(f_lo[:, :n1]), f1hi=jnp.array(f_hi[:, :n1]),
        f2lo=jnp.array(f_lo[:, n1:]), f2hi=jnp.array(f_hi[:, n1:]),
        i1lo=jnp.array(i_lo[:, :n1]), i1hi=jnp.array(i_hi[:, :n1]),
        i2lo=jnp.array(i_lo[:, n1:]), i2hi=jnp.array(i_hi[:, n1:]),
        logN=logN,
    )


# ----------------------------------------------------------------------
# Kernel bodies.
# ----------------------------------------------------------------------


def _consts(cref):
    g = lambda k: cref[0, 0, k]
    return dict(
        ql=g(0), qh=g(1), kl=g(2), kh=g(3),
        q2lo=g(4), q2hi=g(5), Rslo=g(6), Rshi=g(7),
        Nlo=g(8), Nhi=g(9), qlo=g(10), qhi=g(11),
    )


def _ct_stage(xlo, xhi, tlo, thi, groups, half, width, cs):
    """One Cooley-Tukey stage in reshape form on a 2D [rows, width] array."""
    rows = xlo.shape[0]
    vl = xlo.reshape(groups, 2, half, width)
    vh = xhi.reshape(groups, 2, half, width)
    Ul, Uh = vl[:, 0], vh[:, 0]
    Ol, Oh = vl[:, 1], vh[:, 1]
    Tl = tlo.reshape(groups, half, width)
    Th = thi.reshape(groups, half, width)
    Wl, Wh = pm.mont_mult_pair(
        Tl, Th, Ol, Oh, cs["ql"], cs["qh"], cs["kl"], cs["kh"]
    )
    el, eh = pm.mont_add_pair(Ul, Uh, Wl, Wh, cs["q2lo"], cs["q2hi"])
    ol, oh = pm.mont_sub_pair(Ul, Uh, Wl, Wh, cs["q2lo"], cs["q2hi"])
    xlo = jnp.stack([el, ol], axis=1).reshape(rows, width)
    xhi = jnp.stack([eh, oh], axis=1).reshape(rows, width)
    return xlo, xhi


def _gs_stage(xlo, xhi, tlo, thi, groups, half, width, cs):
    """One Gentleman-Sande stage (inverse butterfly)."""
    rows = xlo.shape[0]
    vl = xlo.reshape(groups, 2, half, width)
    vh = xhi.reshape(groups, 2, half, width)
    Ul, Uh = vl[:, 0], vh[:, 0]
    Vl, Vh = vl[:, 1], vh[:, 1]
    Tl = tlo.reshape(groups, half, width)
    Th = thi.reshape(groups, half, width)
    wl, wh = pm.mont_add_pair(Ul, Uh, Vl, Vh, cs["q2lo"], cs["q2hi"])
    dl, dh = pm.mont_sub_pair(Ul, Uh, Vl, Vh, cs["q2lo"], cs["q2hi"])
    nl, nh = pm.mont_mult_pair(
        Tl, Th, dl, dh, cs["ql"], cs["qh"], cs["kl"], cs["kh"]
    )
    xlo = jnp.stack([wl, nl], axis=1).reshape(rows, width)
    xhi = jnp.stack([wh, nh], axis=1).reshape(rows, width)
    return xlo, xhi


def _fwd1_kernel(cref, xlo_ref, xhi_ref, tlo_ref, thi_ref,
                 olo_ref, ohi_ref, *, logN, enter):
    cs = _consts(cref)
    xlo = xlo_ref[0]
    xhi = xhi_ref[0]
    R = xlo.shape[0]
    if enter:
        xlo, xhi = pm.mont_mult_pair(
            xlo, xhi, cs["Rslo"], cs["Rshi"],
            cs["ql"], cs["qh"], cs["kl"], cs["kh"],
        )
    n1 = logN - 7
    for s in range(n1):
        m = 1 << s
        tb = R >> (s + 1)  # t // LANES
        xlo, xhi = _ct_stage(
            xlo, xhi, tlo_ref[0, s], thi_ref[0, s], m, tb, LANES, cs
        )
    olo_ref[0] = xlo
    ohi_ref[0] = xhi


def _fwd2_kernel(cref, xlo_ref, xhi_ref, tlo_ref, thi_ref,
                 olo_ref, ohi_ref, *, logN):
    cs = _consts(cref)
    xlo = xlo_ref[0]  # [LANES, R]
    xhi = xhi_ref[0]
    N = 1 << logN
    R = N // LANES
    n1 = logN - 7
    for s in range(n1, logN):
        t = N >> (s + 1)  # 64 .. 1
        mb = LANES >> int(np.log2(2 * t))  # groups along rows
        xlo, xhi = _ct_stage(
            xlo, xhi, tlo_ref[0, s - n1], thi_ref[0, s - n1],
            mb, t, R, cs,
        )
    olo_ref[0] = xlo
    ohi_ref[0] = xhi


def _inv2_kernel(cref, xlo_ref, xhi_ref, tlo_ref, thi_ref,
                 olo_ref, ohi_ref, *, logN):
    cs = _consts(cref)
    xlo = xlo_ref[0]  # [LANES, R]
    xhi = xhi_ref[0]
    N = 1 << logN
    R = N // LANES
    n1 = logN - 7
    for s in range(logN - 1, n1 - 1, -1):
        t = N >> (s + 1)
        mb = LANES >> int(np.log2(2 * t))
        xlo, xhi = _gs_stage(
            xlo, xhi, tlo_ref[0, s - n1], thi_ref[0, s - n1],
            mb, t, R, cs,
        )
    olo_ref[0] = xlo
    ohi_ref[0] = xhi


def _inv1_kernel(cref, xlo_ref, xhi_ref, tlo_ref, thi_ref,
                 olo_ref, ohi_ref, *, logN, epilogue):
    cs = _consts(cref)
    xlo = xlo_ref[0]  # [R, LANES]
    xhi = xhi_ref[0]
    R = xlo.shape[0]
    n1 = logN - 7
    for s in range(n1 - 1, -1, -1):
        m = 1 << s
        tb = R >> (s + 1)
        xlo, xhi = _gs_stage(
            xlo, xhi, tlo_ref[0, s], thi_ref[0, s], m, tb, LANES, cs
        )
    # fold in N^-1 (stays Montgomery), like the reference intt epilogue
    xlo, xhi = pm.mont_mult_pair(
        xlo, xhi, cs["Nlo"], cs["Nhi"],
        cs["ql"], cs["qh"], cs["kl"], cs["kh"],
    )
    if epilogue in ("exit", "exit_reduce", "exit_reduce_signed"):
        xlo, xhi = pm.mont_reduce_pair(
            xlo, xhi, cs["ql"], cs["qh"], cs["kl"], cs["kh"]
        )
    if epilogue in ("exit_reduce", "exit_reduce_signed"):
        xlo, xhi = pm.reduce_2q_pair(xlo, xhi, cs["qlo"], cs["qhi"])
    if epilogue == "exit_reduce_signed":
        # centered representative: value > q/2 -> value - q (wraps mod 2^64,
        # i.e. the int64 two's complement the engine expects)
        hqlo = (cs["qlo"] >> pm.U32(1)) | (cs["qhi"] << pm.U32(31))
        hqhi = cs["qhi"] >> pm.U32(1)
        keep = pm.le64(xlo, xhi, hqlo, hqhi)
        dlo, dhi = pm.sub64(xlo, xhi, cs["qlo"], cs["qhi"])
        xlo = jnp.where(keep, xlo, dlo)
        xhi = jnp.where(keep, xhi, dhi)
    olo_ref[0] = xlo
    ohi_ref[0] = xhi


# ----------------------------------------------------------------------
# Host-callable wrappers.
# ----------------------------------------------------------------------


def _call(kernel, C, shapes_in, blocks_in, out_block, n_out=2, **kw):
    """pallas_call helper with a (C,) grid and per-channel blocks.

    The first input block (the per-channel constant vector) goes to SMEM;
    tensor blocks go to VMEM.
    """
    zero = np.int32(0)  # python 0 would trace as i64 under x64 mode

    def spec(b, space):
        return pl.BlockSpec(
            b, lambda c, _b=b: (c,) + (zero,) * (len(_b) - 1),
            memory_space=space,
        )

    return pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(C,),
        in_specs=[
            spec(b, pltpu.SMEM if i == 0 else pltpu.VMEM)
            for i, b in enumerate(blocks_in)
        ],
        out_specs=tuple(
            spec(out_block, pltpu.VMEM) for _ in range(n_out)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((C,) + out_block[1:], jnp.uint32)
            for _ in range(n_out)
        ),
    )


@functools.partial(jax.jit, static_argnames=("enter",))
def ntt(x, tables: NttTables, enter: bool = False):
    """Forward NTT of [..., C, N] int64; returns the pallas-domain array.

    With ``enter`` the Montgomery entry (x * R^2 -> REDC) is fused like the
    reference ``enter_ntt_cuda``.
    """
    logN = tables.logN
    N = 1 << logN
    R = N // LANES
    lead = x.shape[:-2]
    C = x.shape[-2]
    flat = x.reshape(-1, C, N)
    outs = []
    for b in range(flat.shape[0]):
        lo, hi = pm.to_pair(flat[b])
        lo = lo.reshape(C, R, LANES)
        hi = hi.reshape(C, R, LANES)
        n1 = logN - 7
        half = N // 2
        f1 = _call(
            _fwd1_kernel, C,
            None,
            [(1, 1, N_CONST), (1, R, LANES), (1, R, LANES),
             (1, n1, half), (1, n1, half)],
            (1, R, LANES), logN=logN, enter=enter,
        )
        lo, hi = f1(tables.cons, lo, hi, tables.f1lo, tables.f1hi)
        lo = jnp.swapaxes(lo, 1, 2)  # [C, LANES, R]
        hi = jnp.swapaxes(hi, 1, 2)
        n2 = 7
        f2 = _call(
            _fwd2_kernel, C,
            None,
            [(1, 1, N_CONST), (1, LANES, R), (1, LANES, R),
             (1, n2, half), (1, n2, half)],
            (1, LANES, R), logN=logN,
        )
        lo, hi = f2(tables.cons, lo, hi, tables.f2lo, tables.f2hi)
        outs.append(pm.from_pair(lo.reshape(C, N), hi.reshape(C, N)))
    return jnp.stack(outs).reshape(*lead, C, N)


@functools.partial(jax.jit, static_argnames=("epilogue",))
def intt(x, tables: NttTables, epilogue: str = "mont"):
    """Inverse NTT of a pallas-domain [..., C, N] array back to coefficients.

    epilogue: 'mont' (stay Montgomery, like reference ``intt``), 'exit',
    'exit_reduce', 'exit_reduce_signed'.
    """
    logN = tables.logN
    N = 1 << logN
    R = N // LANES
    lead = x.shape[:-2]
    C = x.shape[-2]
    flat = x.reshape(-1, C, N)
    outs = []
    n1 = logN - 7
    n2 = 7
    half = N // 2
    for b in range(flat.shape[0]):
        lo, hi = pm.to_pair(flat[b])
        lo = lo.reshape(C, LANES, R)
        hi = hi.reshape(C, LANES, R)
        i2 = _call(
            _inv2_kernel, C,
            None,
            [(1, 1, N_CONST), (1, LANES, R), (1, LANES, R),
             (1, n2, half), (1, n2, half)],
            (1, LANES, R), logN=logN,
        )
        lo, hi = i2(tables.cons, lo, hi, tables.i2lo, tables.i2hi)
        lo = jnp.swapaxes(lo, 1, 2)  # [C, R, LANES]
        hi = jnp.swapaxes(hi, 1, 2)
        i1 = _call(
            _inv1_kernel, C,
            None,
            [(1, 1, N_CONST), (1, R, LANES), (1, R, LANES),
             (1, n1, half), (1, n1, half)],
            (1, R, LANES), logN=logN, epilogue=epilogue,
        )
        lo, hi = i1(tables.cons, lo, hi, tables.i1lo, tables.i1hi)
        outs.append(pm.from_pair(lo.reshape(C, N), hi.reshape(C, N)))
    return jnp.stack(outs).reshape(*lead, C, N)

"""Fused matmul-form (4-step) NTT as a single Pallas TPU kernel.

``ops/mxu_ntt.py`` evaluates the two twiddle matmuls as XLA ``dot_general``
calls on a block-Toeplitz limb matrix.  That shape is MXU-friendly but pays
three structural taxes the compiler cannot remove:

* the Toeplitz operand is dense to XLA, so (2L-1)*L block products are
  multiplied where only L*L are nonzero — ~47% wasted MXU work at L=9,
* the [.., (2L-1)*P, ..] int32 diagonal tensor round-trips HBM between the
  matmul and the recombination pass,
* the matmul (MXU) and recombination (VPU) run as separate XLA fusions, so
  the two units serialize instead of overlapping.

This kernel runs BOTH matmul steps and BOTH recombinations for one
(channel, batch-instance) grid cell inside one ``pallas_call``: the limb
products are issued as L rectangular dots per step (exactly the L*L nonzero
block products, with a wide [P, L*P] rhs to keep the MXU pipelined), the
diagonal accumulator lives in VMEM scratch, and the recombination runs as
uint32-pair arithmetic (``ops/pallas_mont.py`` conventions) interleaved
with the dots.

Recombination folds multiply by *constants* (mid-twiddle planes, variant
scalars), so they use Shoup multiplication instead of Montgomery REDC:
with ``w`` fixed and ``w' = floor(w * 2^62 / q)`` precomputed,

    t = floor_approx(w' * x / 2^62)        (31-bit-half mulhi, slack <= 1)
    r = (w * x - t * q) mod 2^64           in [0, 2.25q) for x < 2^62
    r -= 2q if r >= 2q                     -> lazy [0, 2q)

which is ~1.7x fewer vector ops than the 31-bit-half REDC and needs no
Montgomery-domain bookkeeping: the fold constants are the *plain* residues
``T * 2^(42g) mod q`` (the jnp path's constants carry an extra R that its
REDC removes again).  Residues mod q are identical to ``ops/ntt.py``;
lazy representatives may differ (callers only rely on [0, 2q) + mod q,
see ``mxu_ntt`` module docstring).

Reference parity: this is the TPU replacement for the per-stage CUDA NTT
(``csrc/cuda/ntt_cuda.cu:89-100``); twiddle conventions match
``ops/ntt.py::make_psi_tables`` exactly, so decrypt-level results are
bit-identical to the reference math.

Requires P1, P2 >= 128 on real TPUs (logN >= 14); tests run any size via
``interpret=True``.  Signed inputs are not supported (engine routes signed
key-material transforms through the radix-2 path, like ``mxu_ntt``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tiberate_tpu.ops import pallas_mont
from tiberate_tpu.ops.mxu_ntt import GROUP_K, LIMB_BITS, LIMB_MASK
from tiberate_tpu.ops.pallas_mxu_tables import (  # noqa: F401 — re-exports
    KGroup,
    KTables,
    _step_params,
    build_tables,
)

U32 = jnp.uint32
M31 = np.uint32(0x7FFFFFFF)


# ----------------------------------------------------------------------
# In-kernel pair helpers (u32; see ops/pallas_mont.py conventions).
# ----------------------------------------------------------------------


def _sp16(x):
    """16-bit halves of a u32 (hoisted so repeated _mul31 operands split
    once)."""
    return x & np.uint32(0xFFFF), x >> U32(16)


def _mul31(x, y, xs=None, ys=None):
    """31-bit x 31-bit -> (lo, hi) u32 pair.  ``xs``/``ys``: optional
    pre-split 16-bit halves (from :func:`_sp16`).  The low lane is the
    native u32 multiply; the high lane folds the carry through
    mm + (ll >> 16), which cannot overflow for 31-bit operands
    (mm <= 2*(2^15-1)*(2^16-1), + 2^16 - 1 < 2^32)."""
    x0, x1 = xs if xs is not None else _sp16(x)
    y0, y1 = ys if ys is not None else _sp16(y)
    ll = x0 * y0
    mm = x1 * y0 + x0 * y1
    hi = x1 * y1 + ((mm + (ll >> U32(16))) >> U32(16))
    return x * y, hi


def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    return lo, ahi + bhi + (lo < alo).astype(U32)


def _sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    return lo, ahi - bhi - (alo < blo).astype(U32)


def _shr31(lo, hi):
    return (lo >> U32(31)) | (hi << U32(1)), hi >> U32(31)


def _split31(lo, hi):
    """value < 2^62 -> (low31, high31)."""
    return lo & M31, (hi << U32(1)) | (lo >> U32(31))


def _shl31(lo, hi):
    return lo << U32(31), (hi << U32(31)) | (lo >> U32(1))


def _low64_31(a0, a1, b0, b1, as0=None, as1=None, bs0=None, bs1=None):
    """low 64 bits of (a0 + a1*2^31) * (b0 + b1*2^31); a_i, b_i < 2^31.
    ``as*``/``bs*``: optional pre-split 16-bit halves of the operands."""
    as0 = as0 if as0 is not None else _sp16(a0)
    as1 = as1 if as1 is not None else _sp16(a1)
    bs0 = bs0 if bs0 is not None else _sp16(b0)
    bs1 = bs1 if bs1 is not None else _sp16(b1)
    lo, hi = _mul31(a0, b0, as0, bs0)
    mlo, mhi = _add64(*_mul31(a0, b1, as0, bs1), *_mul31(a1, b0, as1, bs0))
    mlo, mhi = _shl31(mlo, mhi)
    lo, hi = _add64(lo, hi, mlo, mhi)
    # only bits 62-63 of (a1*b1) << 62 survive mod 2^64: the native u32
    # low product's bottom 2 bits suffice — no wide multiply needed
    return lo, hi + ((a1 * b1) << U32(30))


def _shoup_mult(xlo, xhi, w0, w1, s0, s1, q0, q1, q2lo, q2hi):
    """w * x mod q, lazy [0, 2q); x < 2^61 base-2^32 pair (xlo, xhi).

    (w0, w1) / (s0, s1) / (q0, q1) are 31-bit splits of the constant w,
    its Shoup companion w' = floor(w * 2^62 / q), and q.  t is the
    31-bit-half mulhi floor_approx(w' x / 2^62); the x0*s0 cross term
    (< 2^62, i.e. < 1 after the >> 62) is DROPPED, widening the slack
    to <= 2, so r = w*x - t*q < q*(x/2^62 + 3) < 3.5q — still a single
    conditional subtract of 2q to land in [0, 2q) (3.5q < 2^64 for
    q < 2^62).  Saves one _mul31 + shift + add per fold (~10% of the
    fold mult) at zero accuracy cost on the lazy interface.
    """
    x0, x1 = _split31(xlo, xhi)
    xs0, xs1 = _sp16(x0), _sp16(x1)
    ss1 = _sp16(s1)
    # t = x1*s1 + ((x1*s0 + x0*s1) >> 31)     (x0*s0 term dropped)
    mlo, mhi = _add64(*_mul31(x1, s0, xs1), *_mul31(x0, s1, xs0, ss1))
    mlo, mhi = _shr31(mlo, mhi)
    tlo, thi = _add64(*_mul31(x1, s1, xs1, ss1), mlo, mhi)
    t0, t1 = _split31(tlo, thi)
    # r = (w*x - t*q) mod 2^64
    wxlo, wxhi = _low64_31(x0, x1, w0, w1, xs0, xs1)
    tqlo, tqhi = _low64_31(t0, t1, q0, q1)
    rlo, rhi = _sub64(wxlo, wxhi, tqlo, tqhi)
    big = (rhi > q2hi) | ((rhi == q2hi) & (rlo >= q2lo))
    dlo, dhi = _sub64(rlo, rhi, q2lo, q2hi)
    return jnp.where(big, dlo, rlo), jnp.where(big, dhi, rhi)


def _csub2q(lo, hi, q2lo, q2hi):
    big = (hi > q2hi) | ((hi == q2hi) & (lo >= q2lo))
    dlo, dhi = _sub64(lo, hi, q2lo, q2hi)
    return jnp.where(big, dlo, lo), jnp.where(big, dhi, hi)


# ----------------------------------------------------------------------
# Single-lane (30-bit mode) helpers: one u32 per value, 4q < 2^30.
# The reference's own 30-bit dtype dispatch (``csrc/mont.cpp:17-24``,
# ``config/ckks_config.py:93-96``) becomes a kernel lane mode here.
# ----------------------------------------------------------------------

M30 = np.uint32(0x3FFFFFFF)


def _mulhi32(a, b):
    """u32 x u32 -> high 32 bits of the 64-bit product.  All single-lane
    callers hold a, b < 2^31 (wp < 2^31, values < 2q < 2^29, m < 2^30),
    so the middle sum mm + (ll >> 16) cannot overflow (the mul31 carry
    trick) and the high lane costs 3 fewer ops than the general form."""
    M16 = np.uint32(0xFFFF)
    a0 = a & M16
    a1 = a >> U32(16)  # < 2^15
    b0 = b & M16
    b1 = b >> U32(16)
    ll = a0 * b0
    mm = a1 * b0 + a0 * b1
    return a1 * b1 + ((mm + (ll >> U32(16))) >> U32(16))


def _csub32(x, m):
    return jnp.where(x >= m, x - m, x)


def _shoup_mult32(x, w, wp, q):
    """w * x mod q, lazy [0, 2q); x < 2^31, w < q < 2^30,
    wp = floor(w * 2^31 / q).  r = w*x - floor(wp*x / 2^31)*q lands in
    [0, 2q) with no correction (Harvey's bound, q < 2^30)."""
    hi = _mulhi32(wp, x)
    lo = wp * x
    t = (hi << U32(1)) | (lo >> U32(31))
    return w * x - t * q


def _mulhi32g(a, b):
    """General u32 x u32 -> high 32 bits (no operand preconditions —
    the k32 fold's wp and packed sums both reach [2^31, 2^32))."""
    M16 = np.uint32(0xFFFF)
    a0 = a & M16
    a1 = a >> U32(16)
    b0 = b & M16
    b1 = b >> U32(16)
    ll = a0 * b0
    m1 = a1 * b0
    m2 = a0 * b1
    t = (ll >> U32(16)) + (m1 & M16) + (m2 & M16)   # < 2^18
    return a1 * b1 + (m1 >> U32(16)) + (m2 >> U32(16)) + (t >> U32(16))


def _shoup_mult32_k32(x, w, wp, q, q2):
    """w * x mod q, lazy [0, 2q); x < 2^32 (full u32), w < q < 2^30,
    wp = floor(w * 2^32 / q) < 2^32.  t = floor(wp*x / 2^32) >=
    floor(wx/q) - 2, so r = w*x - t*q < 3q — one conditional subtract
    of 2q lands in [0, 2q).  The wider pack lets W-side pre-reduction
    groups span 2 output limbs even at accumulation depth 512."""
    t = _mulhi32g(wp, x)
    return _csub32(w * x - t * q, q2)


def _redc30(a, b, k, q):
    """REDC_{2^30}(a*b), lazy [0, 2q); a, b < 2q, 4q < 2^30,
    k = (R*R^-1 - 1)/q."""
    p_lo = a * b
    p_hi = _mulhi32(a, b)
    m = (p_lo * k) & M30
    mq_lo = m * q
    mq_hi = _mulhi32(m, q)
    s_lo = p_lo + mq_lo
    carry = (s_lo < p_lo).astype(U32)
    s_hi = p_hi + mq_hi + carry
    return (s_hi << U32(2)) | (s_lo >> U32(30))


def _redc_reduce30(x, k, q):
    """REDC_{2^30}(x) — the Montgomery exit; x < 2q -> result < 2q."""
    m = (x * k) & M30
    mq_lo = m * q
    mq_hi = _mulhi32(m, q)
    s_lo = x + mq_lo
    carry = (s_lo < x).astype(U32)
    s_hi = mq_hi + carry
    return (s_hi << U32(2)) | (s_lo >> U32(30))


def _sub2q32(a, b, q2):
    """(a - b) mod 2q, lazy; a, b in [0, 2q)."""
    return _csub32(a + (q2 - b), q2)


# ----------------------------------------------------------------------
# The kernel.
# ----------------------------------------------------------------------


def _limb_planes(lo, hi, L, single=False):
    """In-kernel limb extraction: (lo, hi) u32 pair [Pa, Pb] (value
    < 2^62; single-lane: lo only, < 2^31) -> list of L int8 [Pa, Pb]
    plain 7-bit limb planes — the kernel-side equivalent of the
    XLA-side limb split, so operands enter the kernel as raw residues
    and the limb pass never touches HBM."""
    parts = []
    for j in range(L):
        sh = LIMB_BITS * j
        if single or sh + LIMB_BITS <= 32:
            limb = (lo >> U32(sh)) & U32(LIMB_MASK)
        elif sh >= 32:
            limb = (hi >> U32(sh - 32)) & U32(LIMB_MASK)
        else:
            limb = ((lo >> U32(sh)) | (hi << U32(32 - sh))) & U32(LIMB_MASK)
        parts.append(limb.astype(jnp.int8))
    return parts


def _recombine_diag(s_ref, nd, G, fold_w, q2, single=False, gk=GROUP_K,
                    k32=False):
    """VMEM diagonals (``nd`` planes: 2L-1 on the legacy scheme, Lw
    under W-side pre-reduction) -> folded pair [Pa, Pb] in [0, 2q).

    fold_w(g) -> (w0, w1, s0, s1) 31-split arrays/scalars;
    q2 = (q0, q1, q2lo, q2hi).  Packed group sums stay < 2^61
    (build-time plan), inside _shoup_mult's x precondition.

    Single-lane mode: q2 = (q, 0, 2q, 0) full u32 values, fold_w slots
    (0, 2) = (w, w'); group sums stay < 2^31 (Harvey form) or < 2^32
    (``k32``, 2^32-scaled companion + conditional subtract); the hi
    half returned is zero.
    """
    q0, q1, q2lo, q2hi = q2
    if single:
        out = None
        for g in range(G):
            k0 = g * gk
            k1 = min(k0 + gk, nd)
            a = s_ref[k0].astype(U32)
            for k in range(k0 + 1, k1):
                a = a + (s_ref[k].astype(U32) << U32(LIMB_BITS * (k - k0)))
            w = fold_w(g)
            if k32:
                v = _shoup_mult32_k32(a, w[0], w[2], q0, q2lo)
            else:
                v = _shoup_mult32(a, w[0], w[2], q0)
            out = v if out is None else _csub32(out + v, q2lo)
        return out, jnp.zeros_like(out)
    out = None
    for g in range(G):
        k0 = g * gk
        k1 = min(k0 + gk, nd)
        alo = ahi = None
        for k in range(k0, k1):
            s = s_ref[k].astype(U32)            # < 2^25
            sh = LIMB_BITS * (k - k0)
            if sh == 0:
                tlo, thi = s, jnp.zeros_like(s)
            elif sh < 32:
                tlo, thi = s << U32(sh), s >> U32(32 - sh)
            else:
                tlo = jnp.zeros_like(s)
                thi = s << U32(sh - 32)
            if alo is None:
                alo, ahi = tlo, thi
            else:
                alo, ahi = _add64(alo, ahi, tlo, thi)
        w0, w1, s0, s1 = fold_w(g)
        vlo, vhi = _shoup_mult(alo, ahi, w0, w1, s0, s1,
                               q0, q1, q2lo, q2hi)
        if out is None:
            out = (vlo, vhi)
        else:
            slo, shi = _add64(out[0], out[1], vlo, vhi)
            out = _csub2q(slo, shi, q2lo, q2hi)
    return out


def _diag_dots_a(xplanes, w1_ref, s_ref, L, P1, Lw=0):
    """Step-A diagonal dots.

    Legacy scheme (Lw=0): s_ref[d] = sum_{i+j=d} W1_i @ x_j as ONE
    contiguous dot per diagonal — lhs is a column slice of the
    [P1, L*P1] concatenated twiddle limbs, rhs a row slice of the
    limb planes stacked in REVERSED order ([L*P1, P2]).

    W-side pre-reduction (Lw>0): s_ref[i] = sum_j (W1*2^(7j) mod q)_i
    @ x_j — lhs is output-limb i's [P1, L*P1] column block of the
    [P1, Lw*L*P1] table, rhs the natural-order limb stack; only Lw
    diagonals, every dot full width.

    Either way the cross-limb accumulation rides the MXU contraction
    (no VPU read-add-stores), each diagonal is written to scratch
    exactly once, and every dot is issued before the first fold reads
    its diagonal, so the MXU queue drains under the VPU
    recombination."""
    if Lw:
        xcat = (jnp.concatenate(xplanes, axis=0)
                if L > 1 else xplanes[0])     # [L*P1, P2]
        blk = L * P1
        for i in range(Lw):
            s_ref[i] = jax.lax.dot_general(
                w1_ref[:, i * blk:(i + 1) * blk], xcat,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        return
    nd = 2 * L - 1
    xrev = (jnp.concatenate(xplanes[::-1], axis=0)
            if L > 1 else xplanes[0])         # [L*P1, P2]
    for d in range(nd):
        i0 = max(0, d - L + 1)
        i1 = min(d, L - 1)
        lhs = w1_ref[:, i0 * P1:(i1 + 1) * P1]
        rhs = xrev[(L - 1 - d + i0) * P1:(L - 1 - d + i1 + 1) * P1, :]
        s_ref[d] = jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )


def _diag_dots_b(uplanes, w2_ref, s_ref, L, P2, Lw=0):
    """Step-B diagonal dots.  Legacy (Lw=0): s_ref[d] = sum_{i+j=d}
    U_j @ W2_i — lhs a column slice of the concatenated U limbs
    [p1b, L*P2], rhs a row slice of the reversed-stacked [L*P2, P2]
    table.  W-side pre-reduction (Lw>0): s_ref[i] = U_cat @ W2[:, i] —
    rhs is output-limb i's [L*P2, P2] column block of the
    [L*P2, Lw*P2] pre-reduced table."""
    bcat = (jnp.concatenate(uplanes, axis=1)
            if L > 1 else uplanes[0])         # [p1b, L*P2]
    if Lw:
        for i in range(Lw):
            s_ref[i] = jax.lax.dot_general(
                bcat, w2_ref[:, i * P2:(i + 1) * P2],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
        return
    nd = 2 * L - 1
    for d in range(nd):
        j0 = max(0, d - L + 1)
        j1 = min(d, L - 1)
        lhs = bcat[:, j0 * P2:(j1 + 1) * P2]
        rhs = w2_ref[(L - 1 - d + j0) * P2:(L - 1 - d + j1 + 1) * P2, :]
        s_ref[d] = jax.lax.dot_general(
            lhs, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )


def _cell_transform(xpair, c, fold_ref, w1_ref, w2_ref, ta_ref, s_ref,
                    L, P1, P2, q2, single=False, sa=(0, GROUP_K, False),
                    sb=(0, GROUP_K, False)):
    """One channel-cell 4-step transform: limb extraction, both
    limb-matmul steps and both Shoup recombinations, diagonals in the
    s_ref VMEM scratch.  xpair: (lo, hi) u32 [P1, P2] raw residues
    (single-lane: hi is None) -> (olo, ohi) u32 pair in [0, 2q)."""
    lwA, gkA, k32A, ndA, GA = _step_params(L, sa)
    lwB, gkB, k32B, ndB, GB = _step_params(L, sb)
    xplanes = _limb_planes(xpair[0], xpair[1], L, single)
    _diag_dots_a(xplanes, w1_ref[0], s_ref, L, P1, lwA)

    def fold_a(g):
        return (ta_ref[0, g, 0], ta_ref[0, g, 1],
                ta_ref[0, g, 2], ta_ref[0, g, 3])

    ulo, uhi = _recombine_diag(s_ref, ndA, GA, fold_a, q2, single, gkA,
                               k32A)

    uplanes = _limb_planes(ulo, uhi, L, single)
    _diag_dots_b(uplanes, w2_ref[0], s_ref, L, P2, lwB)

    def fold_b(g):
        return (fold_ref[c, 4 * g + 0], fold_ref[c, 4 * g + 1],
                fold_ref[c, 4 * g + 2], fold_ref[c, 4 * g + 3])

    return _recombine_diag(s_ref, ndB, GB, fold_b, q2, single, gkB, k32B)


def _make_kernel(L, P1, P2, nkeys=0, acc=False, pdiv=0, single=False,
                 sa=(0, GROUP_K, False), sb=(0, GROUP_K, False), ub=1,
                 skq=False):
    lwA, gkA, k32A, ndA, GA = _step_params(L, sa)
    lwB, gkB, k32B, ndB, GB = _step_params(L, sb)
    w = 1 if single else 2   # lanes per value: single mode carries lo only
    kl_n = 2 * w if skq else w   # key lanes: Shoup form carries companions

    def kernel(cons_ref, fold_ref, *refs):
        xrefs = refs[:w]
        w1_ref, w2_ref, ta_ref = refs[w : w + 3]
        rest = refs[w + 3 :]
        if nkeys:
            krefs = rest[: kl_n * nkeys]       # key lanes (see skq)
            arefs = (rest[kl_n * nkeys : kl_n * nkeys + w * nkeys]
                     if acc else ())
            trefs = rest[-w * nkeys - 1 : -1]    # (tlo[, thi]) per key
            s_ref = rest[-1]
        elif pdiv:
            pdc_ref = rest[0]                  # SMEM [Cg, 2 + 2*pdiv]
            prefs = rest[1 : 1 + w * pdiv]     # (plo[, phi]) per division
            if ub > 1:
                out_refs = rest[-2 - w : -2]
                s_ref = rest[-2]
            else:
                out_refs = rest[-1 - w : -1]
                s_ref = rest[-1]
        else:
            out_refs = rest[:-2] if ub > 1 else rest[:-1]
            s_ref = rest[-2] if ub > 1 else rest[-1]
        c = pl.program_id(0)      # SMEM operands arrive unblocked
        q0 = cons_ref[c, 0]       # q 31-split (single: q, 0)
        q1 = cons_ref[c, 1]
        q2lo = cons_ref[c, 2]     # 2q base-2^32 pair (single: 2q, 0)
        q2hi = cons_ref[c, 3]
        q2 = (q0, q1, q2lo, q2hi)

        def pdiv_epilogue(olo, ohi, u):
            # Fused keyswitch P-division epilogue (reference successive
            # rescale by the special primes, ``ckks_engine.py:1068-1124``)
            # on the iNTT output while it is still in VMEM.  The chain
            # x_{i+1} = (x_i - p0_i) * P_i^-1 is affine in
            # (x, p0_0..p0_{S-1}), so it evaluates as
            #   out = x * c_x - sum_i p0_i * c_i
            # with each multiply a SHOUP constant multiplication against
            # the precomputed quads in ``pdc_ref`` (CkksParams.pdq):
            # c_x = (prod P)^-1 R^-1 also strips the Montgomery factor
            # the "mont" variant keeps, and the plain p0 rows need no
            # enter — ~2.5x fewer vector ops than the REDC
            # enter/divide/exit chain this replaces.  Bounds: x lazy
            # [0, 2q) < 2^61 (ordinary q <= 60 bits), p0 < q_special
            # < 2^61; every product lands lazy [0, 2q).
            if single:
                r = _shoup_mult32(olo, pdc_ref[c, 0], pdc_ref[c, 1], q0)
                for i in range(pdiv):
                    t = _shoup_mult32(
                        prefs[i][u], pdc_ref[c, 2 + 2 * i],
                        pdc_ref[c, 3 + 2 * i], q0)
                    r = _sub2q32(r, t, q2lo)
                return _csub32(r, q0), ohi
            rlo, rhi = _shoup_mult(
                olo, ohi, pdc_ref[c, 0], pdc_ref[c, 1],
                pdc_ref[c, 2], pdc_ref[c, 3], q0, q1, q2lo, q2hi)
            for i in range(pdiv):
                tlo, thi = _shoup_mult(
                    prefs[2 * i][u], prefs[2 * i + 1][u],
                    pdc_ref[c, 4 + 4 * i], pdc_ref[c, 5 + 4 * i],
                    pdc_ref[c, 6 + 4 * i], pdc_ref[c, 7 + 4 * i],
                    q0, q1, q2lo, q2hi)
                rlo, rhi = pallas_mont.mont_sub_pair(
                    rlo, rhi, tlo, thi, q2lo, q2hi)
            qlo = q0 | (q1 << U32(31))
            qhi = q1 >> U32(1)
            return pallas_mont.reduce_2q_pair(rlo, rhi, qlo, qhi)

        if ub > 1:
            # Software-pipelined cell over ``ub`` batch items: within
            # each phase, item u+1's diagonal dots are ISSUED before
            # item u's folds read their own diagonals, so the
            # (asynchronous) MXU drains under the VPU recombination
            # — the r3 sequential-chain unroll gave Mosaic no overlap to
            # find (PERFORMANCE.md "round-3 experiments"); this one
            # encodes the overlap in program order.  Transform-only and
            # pdiv paths (the pdiv chain is per-item VPU work that also
            # hides the tail dots).
            u_scr = rest[-1]     # (ub, w, P1, P2) u32 inter-phase values

            def fold_a(g):
                return (ta_ref[0, g, 0], ta_ref[0, g, 1],
                        ta_ref[0, g, 2], ta_ref[0, g, 3])

            def fold_b(g):
                return (fold_ref[c, 4 * g + 0], fold_ref[c, 4 * g + 1],
                        fold_ref[c, 4 * g + 2], fold_ref[c, 4 * g + 3])

            def dots_a(u):
                xpair_u = (xrefs[0][u, 0],
                           None if single else xrefs[1][u, 0])
                planes = _limb_planes(xpair_u[0], xpair_u[1], L, single)
                _diag_dots_a(planes, w1_ref[0], s_ref.at[u], L, P1, lwA)

            # ---- phase A ------------------------------------------
            dots_a(0)
            for u in range(ub):
                if u + 1 < ub:
                    dots_a(u + 1)
                ulo, uhi = _recombine_diag(s_ref.at[u], ndA, GA, fold_a,
                                           q2, single, gkA, k32A)
                u_scr[u, 0] = ulo
                if not single:
                    u_scr[u, 1] = uhi

            # ---- phase B ------------------------------------------
            def dots_b(u):
                up = (u_scr[u, 0], None if single else u_scr[u, 1])
                planes = _limb_planes(up[0], up[1], L, single)
                _diag_dots_b(planes, w2_ref[0], s_ref.at[u], L, P2, lwB)

            dots_b(0)
            for u in range(ub):
                if u + 1 < ub:
                    dots_b(u + 1)
                olo, ohi = _recombine_diag(s_ref.at[u], ndB, GB, fold_b,
                                           q2, single, gkB, k32B)
                if pdiv:
                    olo, ohi = pdiv_epilogue(olo, ohi, u)
                out_refs[0][u, 0] = olo
                if not single:
                    out_refs[1][u, 0] = ohi
            return

        xpair = (xrefs[0][0, 0], None if single else xrefs[1][0, 0])
        olo, ohi = _cell_transform(
            xpair, c, fold_ref, w1_ref, w2_ref, ta_ref, s_ref,
            L, P1, P2, q2, single, sa, sb,
        )
        if nkeys:
            # Fused keyswitch epilogue: t_i = REDC(out * k_i), the
            # reference's per-part evk multiply (``ckks_engine.py:
            # 1145-1161``) — the NTT result never leaves VMEM.  With
            # ``skq`` the keys arrive in Shoup form (plain-domain
            # k' = k * R^-1 with precomputed companions, see
            # :func:`key_quads`): t_i = out * k'_i mod q via constant
            # multiplication — same residues, ~40% fewer vector ops.
            kl = cons_ref[c, 4]
            kh = cons_ref[c, 5]
            if skq and not single:
                # [0, 2q) -> [0, q): the Shoup bound needs x < 2^62
                qplo = q0 | (q1 << U32(31))
                qphi = q1 >> U32(1)
                sxlo, sxhi = _csub2q(olo, ohi, qplo, qphi)
            for i in range(nkeys):
                if single:
                    if skq:
                        t = _shoup_mult32(olo, krefs[2 * i][0],
                                          krefs[2 * i + 1][0], q0)
                    else:
                        t = _redc30(olo, krefs[i][0], kl, q0)
                    if acc:
                        t = _csub32(arefs[i][0, 0] + t, q2lo)
                    trefs[i][0, 0] = t
                    continue
                if skq:
                    tlo, thi = _shoup_mult(
                        sxlo, sxhi, krefs[4 * i][0], krefs[4 * i + 1][0],
                        krefs[4 * i + 2][0], krefs[4 * i + 3][0],
                        q0, q1, q2lo, q2hi,
                    )
                else:
                    tlo, thi = pallas_mont.mont_mult_pair(
                        olo, ohi, krefs[2 * i][0], krefs[2 * i + 1][0],
                        q0, q1, kl, kh,
                    )
                if acc:
                    # Running part-sum in VMEM (the reference's d0/d1
                    # accumulation across keyswitch parts,
                    # ``ckks_engine.py:1048-1058``): lazy mod-2q add of
                    # the aliased accumulator block.
                    tlo, thi = pallas_mont.mont_add_pair(
                        arefs[2 * i][0, 0], arefs[2 * i + 1][0, 0],
                        tlo, thi, q2lo, q2hi,
                    )
                trefs[2 * i][0, 0] = tlo
                trefs[2 * i + 1][0, 0] = thi
        elif pdiv:
            xlo, xhi = pdiv_epilogue(olo, ohi, 0)
            out_refs[0][0, 0] = xlo
            if not single:
                out_refs[1][0, 0] = xhi
        else:
            out_refs[0][0, 0] = olo
            if not single:
                out_refs[1][0, 0] = ohi

    return kernel


def _signed_const_mult(lo, hi, clo, chi, q0, q1, kl, kh, q2lo, q2hi):
    """REDC(y * c) for a SIGNED two's-complement pair y (|y| < 2^63),
    c in [0, q): residue-exact vs ``mont.mont_mult_raw`` on signed int64
    (basis-extension digits are signed, ``ckks_engine.py:844-903``),
    lazy [0, 2q).  Uses y = u + R*t with u = y mod 2^62 and
    t = floor(y / 2^62) in {-2, -1, 0, 1}: REDC(u*c) = y*c*R^-1 - t*c
    (mod q), so add t*c back conditionally."""
    s2 = hi >> U32(30)                    # top 2 bits = t mod 4
    zlo, zhi = pallas_mont.mont_mult_pair(lo, hi & M30, clo, chi,
                                          q0, q1, kl, kh)
    alo, ahi = pallas_mont.mont_add_pair(zlo, zhi, clo, chi, q2lo, q2hi)
    slo, shi = pallas_mont.mont_sub_pair(zlo, zhi, clo, chi, q2lo, q2hi)
    # t: s2==1 -> +c, s2==3 -> -c, s2==2 -> -2c
    dlo, dhi = pallas_mont.mont_sub_pair(slo, shi, clo, chi, q2lo, q2hi)
    olo = jnp.where(s2 == U32(1), alo,
                    jnp.where(s2 == U32(3), slo,
                              jnp.where(s2 == U32(2), dlo, zlo)))
    ohi = jnp.where(s2 == U32(1), ahi,
                    jnp.where(s2 == U32(3), shi,
                              jnp.where(s2 == U32(2), dhi, zhi)))
    return olo, ohi


def _signed_const_mult30(y, c, kl, q0, q2lo):
    """Single-lane REDC(y * c) for signed u32 y (two's complement,
    R = 2^30), c in [0, q); lazy [0, 2q)."""
    s2 = y >> U32(30)
    z = _redc30(y & M30, c, kl, q0)
    a = _csub32(z + c, q2lo)
    s = _sub2q32(z, c, q2lo)
    d = _sub2q32(s, c, q2lo)
    return jnp.where(s2 == U32(1), a,
                     jnp.where(s2 == U32(3), s,
                               jnp.where(s2 == U32(2), d, z)))


def _make_parts_kernel(L, P1, P2, nkeys, n_parts, amax, single=False,
                       sa=(0, GROUP_K, False), sb=(0, GROUP_K, False),
                       up=1, pad_tail=False, skq=False):
    """All keyswitch parts in one kernel: grid (Cg, B, n_parts/up) with
    the part axis fastest; per (channel, batch) cell the basis extension
    (reference ``ckks_engine.py:906-951``: ext = st0*Rs + sum_i
    st_i*L_enter_i, all Montgomery constant multiplies), the limb split,
    the NTT, the evk multiplies AND the running d_i part-sum all run
    in-VMEM — the digits [amax, N] are the only per-part HBM input and
    the accumulator is written to HBM exactly once (reference part loop
    + accumulation, ``ckks_engine.py:1048-1058``).

    ``up`` > 1 processes that many parts per cell, software-pipelined:
    part j+1's extension (VPU) and diagonal dots (MXU) are issued before
    part j's folds read their own diagonals, so the MXU drains under the
    VPU recombination + key multiplies (the ub=2 trick of the transform
    kernel applied to the part axis; n_parts must be a multiple of up —
    callers zero-pad).  ``pad_tail`` marks the last slot of the last
    block as padding: its compute is SKIPPED at runtime (pl.when), so an
    odd real part count costs no extra transform — the pad exists only
    so the block fetches stay in bounds."""
    lwA, gkA, k32A, ndA, GA = _step_params(L, sa)
    lwB, gkB, k32B, ndB, GB = _step_params(L, sb)
    w = 1 if single else 2
    kl_n = 2 * w if skq else w   # key lanes (Shoup form: + companions)
    n_blk = n_parts // up
    assert n_blk * up == n_parts

    def kernel(cons_ref, fold_ref, ec_ref, *refs):
        strefs = refs[:w]                    # [1, up, amax, P1, P2]
        w1_ref, w2_ref, ta_ref = refs[w : w + 3]
        rest = refs[w + 3 :]
        krefs = rest[: kl_n * nkeys]         # [up, 1, P1, P2] at (p, c)
        trefs = rest[kl_n * nkeys : kl_n * nkeys + w * nkeys]  # (b, c)
        s_ref, u_scr, acc_ref = rest[-3:]
        c = pl.program_id(0)
        p = pl.program_id(2)
        q0 = cons_ref[c, 0]
        q1 = cons_ref[c, 1]
        q2lo = cons_ref[c, 2]
        q2hi = cons_ref[c, 3]
        kl = cons_ref[c, 4]
        kh = cons_ref[c, 5]
        q2 = (q0, q1, q2lo, q2hi)

        # ---- fused basis extension (part j of this cell) ----------
        def ext(j):
            if single:
                e = _signed_const_mult30(
                    strefs[0][0, j, 0], ec_ref[j, c, 0], kl, q0, q2lo)
                for i in range(1, amax):
                    y = _signed_const_mult30(
                        strefs[0][0, j, i], ec_ref[j, c, i], kl, q0,
                        q2lo)
                    e = _csub32(e + y, q2lo)
                return (e, None)
            elo, ehi = _signed_const_mult(
                strefs[0][0, j, 0], strefs[1][0, j, 0],
                ec_ref[j, c, 0], ec_ref[j, c, 1],
                q0, q1, kl, kh, q2lo, q2hi)
            for i in range(1, amax):
                ylo, yhi = _signed_const_mult(
                    strefs[0][0, j, i], strefs[1][0, j, i],
                    ec_ref[j, c, 2 * i], ec_ref[j, c, 2 * i + 1],
                    q0, q1, kl, kh, q2lo, q2hi)
                elo, ehi = pallas_mont.mont_add_pair(
                    elo, ehi, ylo, yhi, q2lo, q2hi)
            return (elo, ehi)

        def fold_a(g):
            return (ta_ref[0, g, 0], ta_ref[0, g, 1],
                    ta_ref[0, g, 2], ta_ref[0, g, 3])

        def fold_b(g):
            return (fold_ref[c, 4 * g + 0], fold_ref[c, 4 * g + 1],
                    fold_ref[c, 4 * g + 2], fold_ref[c, 4 * g + 3])

        def dots_a(j):
            xpair = ext(j)
            planes = _limb_planes(xpair[0], xpair[1], L, single)
            _diag_dots_a(planes, w1_ref[0], s_ref.at[j], L, P1, lwA)

        def dots_b(j):
            pair = (u_scr[j, 0], None if single else u_scr[j, 1])
            planes = _limb_planes(pair[0], pair[1], L, single)
            _diag_dots_b(planes, w2_ref[0], s_ref.at[j], L, P2, lwB)

        def maybe_tail(j, fn):
            # skip the padded slot's compute at runtime: only the LAST
            # slot of the LAST block can be padding
            if pad_tail and j == up - 1:
                @pl.when(p != n_blk - 1)
                def _():
                    fn()
            else:
                fn()

        def phase_a(j):
            ulo, uhi = _recombine_diag(s_ref.at[j], ndA, GA, fold_a, q2,
                                       single, gkA, k32A)
            u_scr[j, 0] = ulo
            if not single:
                u_scr[j, 1] = uhi

        # ---- phase A ----------------------------------------------
        maybe_tail(0, functools.partial(dots_a, 0))
        for j in range(up):
            if j + 1 < up:
                maybe_tail(j + 1, functools.partial(dots_a, j + 1))
            maybe_tail(j, functools.partial(phase_a, j))

        # ---- phase B + key multiplies + part-sum ------------------
        def phase_b(j):
            olo, ohi = _recombine_diag(s_ref.at[j], ndB, GB, fold_b, q2,
                                       single, gkB, k32B)
            first = p == 0 if j == 0 else None   # j>0 always accumulates
            if skq and not single:
                qplo = q0 | (q1 << U32(31))
                qphi = q1 >> U32(1)
                sxlo, sxhi = _csub2q(olo, ohi, qplo, qphi)
            for i in range(nkeys):
                if single:
                    if skq:
                        t = _shoup_mult32(olo, krefs[2 * i][j, 0],
                                          krefs[2 * i + 1][j, 0], q0)
                    else:
                        t = _redc30(olo, krefs[i][j, 0], kl, q0)
                    if first is None:
                        acc_ref[i] = _csub32(acc_ref[i] + t, q2lo)
                    else:
                        @pl.when(first)
                        def _(i=i, t=t):
                            acc_ref[i] = t

                        @pl.when(~first)
                        def _(i=i, t=t):
                            acc_ref[i] = _csub32(acc_ref[i] + t, q2lo)
                else:
                    if skq:
                        tlo, thi = _shoup_mult(
                            sxlo, sxhi, krefs[4 * i][j, 0],
                            krefs[4 * i + 1][j, 0], krefs[4 * i + 2][j, 0],
                            krefs[4 * i + 3][j, 0], q0, q1, q2lo, q2hi,
                        )
                    else:
                        tlo, thi = pallas_mont.mont_mult_pair(
                            olo, ohi, krefs[2 * i][j, 0],
                            krefs[2 * i + 1][j, 0], q0, q1, kl, kh,
                        )
                    if first is None:
                        alo, ahi = pallas_mont.mont_add_pair(
                            acc_ref[2 * i], acc_ref[2 * i + 1], tlo, thi,
                            q2lo, q2hi,
                        )
                        acc_ref[2 * i] = alo
                        acc_ref[2 * i + 1] = ahi
                    else:
                        @pl.when(first)
                        def _(i=i, tlo=tlo, thi=thi):
                            acc_ref[2 * i] = tlo
                            acc_ref[2 * i + 1] = thi

                        @pl.when(~first)
                        def _(i=i, tlo=tlo, thi=thi):
                            alo, ahi = pallas_mont.mont_add_pair(
                                acc_ref[2 * i], acc_ref[2 * i + 1],
                                tlo, thi, q2lo, q2hi,
                            )
                            acc_ref[2 * i] = alo
                            acc_ref[2 * i + 1] = ahi

        maybe_tail(0, functools.partial(dots_b, 0))
        for j in range(up):
            if j + 1 < up:
                maybe_tail(j + 1, functools.partial(dots_b, j + 1))
            maybe_tail(j, functools.partial(phase_b, j))

        @pl.when(p == n_blk - 1)
        def _():
            for j in range(w * nkeys):
                trefs[j][0, 0] = acc_ref[j]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("L", "P1", "P2", "n_parts", "amax", "interpret",
                     "single", "sa", "sb", "up", "pad_tail", "skq"),
)
def _run_parts_group(stlanes, ec, W1, W2, TA, consts, folds, keys, L,
                     P1, P2, n_parts, amax, interpret=False, single=False,
                     sa=(0, GROUP_K, False), sb=(0, GROUP_K, False),
                     up=1, pad_tail=False, skq=False):
    """stlanes: (lo[, hi]) u32 [B, n_parts, amax, P1, P2] signed digit
    lanes; ec: u32 [n_parts, Cg, wl*amax] extension constants; keys:
    flat per key/lane u32 [n_parts, Cg, P1, P2].
    -> w*nkeys arrays [B, Cg, P1, P2].  n_parts % up == 0."""
    B = stlanes[0].shape[0]
    Cg = ec.shape[1]
    lwA, gkA, k32A, ndA, GA = _step_params(L, sa)
    lwB, gkB, k32B, ndB, GB = _step_params(L, sb)
    nd = max(ndA, ndB)
    w1c = (lwA if lwA else 1) * L * P1    # W1 column count
    w2c = (lwB if lwB else 1) * P2        # W2 column count
    wl = 1 if single else 2
    kl_n = 2 * wl if skq else wl
    nkeys = len(keys) // kl_n
    kernel = _make_parts_kernel(L, P1, P2, nkeys, n_parts, amax,
                                single=single, sa=sa, sb=sb, up=up,
                                pad_tail=pad_tail, skq=skq)
    grid = (Cg, B, n_parts // up)
    z = np.int32(0)
    out_spec = pl.BlockSpec((1, 1, P1, P2), lambda c, b, p: (b, c, z, z),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, Cg, P1, P2), jnp.uint32)
    n_out = wl * nkeys
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Cg, 6), lambda c, b, p: (z, z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Cg, 4 * GB), lambda c, b, p: (z, z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((up, Cg, wl * amax), lambda c, b, p: (p, z, z),
                         memory_space=pltpu.SMEM),
        ] + [
            pl.BlockSpec((1, up, amax, P1, P2),
                         lambda c, b, p: (b, p, z, z, z),
                         memory_space=pltpu.VMEM)
            for _ in stlanes
        ] + [
            pl.BlockSpec((1, P1, w1c), lambda c, b, p: (c, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L * P2, w2c), lambda c, b, p: (c, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GA, 4, P1, P2),
                         lambda c, b, p: (c, z, z, z, z),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((up, 1, P1, P2), lambda c, b, p: (p, c, z, z),
                         memory_space=pltpu.VMEM)
            for _ in keys
        ],
        out_specs=[out_spec] * n_out,
        out_shape=[out_shape] * n_out,
        scratch_shapes=[
            pltpu.VMEM((up, nd, P1, P2), jnp.int32),
            pltpu.VMEM((up, wl, P1, P2), jnp.uint32),
            pltpu.VMEM((wl * nkeys, P1, P2), jnp.uint32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_parts * Cg * L * L * P1 * P2 * (P1 + P2),
            bytes_accessed=B * n_parts * P1 * P2 * (8 * amax
                                                    + Cg * 4 * nkeys),
            transcendentals=0,
        ),
        interpret=interpret,
    )(consts, folds.reshape(folds.shape[0], -1), ec, *stlanes,
      W1, W2, TA, *keys)


def _parts_up(L, sa, sb, P1, P2, wl, nkeys, amax,
              budget=int(13 * 2**20)) -> int:
    """Parts-per-cell for the all-parts kernel.  Default 1: the up=2
    software-pipelined cell measured SLOWER on v5e (179.7 vs 206.4 ct/s
    zero-padded, 168.4 with the pl.when tail mask, logN15 r4) — the
    composed kernels are VPU-throughput-bound, so cross-part MXU overlap
    buys nothing and the pad/predication overhead is pure loss (see
    PERFORMANCE.md "round-4 experiments").  TIBERATE_PARTS_UP=2 keeps
    the pipelined cell available for A/B on other hardware; the VMEM
    fits-check still gates it."""
    import os

    env = os.environ.get("TIBERATE_PARTS_UP")
    if env is None:
        return 1
    up = max(1, int(env))
    if up == 1:
        return 1
    lwA, gkA, k32A, ndA, GA = _step_params(L, sa)
    lwB, gkB, k32B, ndB, GB = _step_params(L, sb)
    nd = max(ndA, ndB)
    plane = P1 * P2 * 4
    est2 = (
        2 * 2 * wl * amax * plane      # digit lanes (double-buffered)
        + 2 * 2 * wl * nkeys * plane   # key planes (double-buffered)
        + 2 * nd * plane               # diagonal scratch
        + 2 * wl * plane               # inter-phase u_scr
        + 2 * wl * nkeys * plane       # accumulator + out blocks
        + GA * 4 * plane               # TA fold planes
        + (lwA if lwA else 1) * L * P1 * P1    # W1 int8
        + (lwB if lwB else 1) * L * P2 * P2    # W2 int8
    )
    return 2 if est2 <= budget else 1


def parts_pad_to(tables: KTables, amax: int, nkeys: int = 2) -> int:
    """Part-count multiple the all-parts kernel pads to (2 when any
    channel group runs the pipelined up=2 cell).  Engine caches pre-pad
    their key/ec tensors to this multiple so the big pads do not re-run
    inside every compiled step."""
    wl = 1 if tables.lane == "single" else 2
    return max(
        _parts_up(g.L, g.sa, g.sb, tables.P1, tables.P2, wl, nkeys, amax)
        for g in tables.groups
    )


def ntt_keymul_parts(st, ec, fwd: KTables, keys, interpret: bool = False,
                     shoup: bool = False):
    """The whole keyswitch part loop in one Pallas call — including the
    basis extension: ``st`` [..., n_parts, amax, N] SIGNED mixed-radix
    digits (int64/int32, from ``_pre_extend``; rows past a part's alpha
    zero-padded), ``ec`` u32 [n_parts, C, wl*amax] per-(part, channel)
    extension constants (Rs then L_enter values, (lo, hi) pairs on the
    62-bit lane), ``keys`` a tuple per evk component of (klo, khi) u32
    [n_parts, C, P1, P2] part-stacked key pairs.  Returns one (lo, hi)
    accumulator pair per key: sum_p REDC(NTT(extend(st_p)) * k_{p,i}),
    lazy mod 2q — residue-identical to the XLA extend +
    :func:`ntt_keymul` ``accum=`` chain over the parts, with the
    extension, part-sum and NTT all kept in VMEM."""
    interpret = interpret or INTERPRET
    tables = fwd
    assert not tables.swap
    P1, P2 = tables.P1, tables.P2
    lead = st.shape[:-3]
    n_parts, amax = st.shape[-3], st.shape[-2]
    N = P1 * P2
    B = int(np.prod(lead)) if lead else 1
    single = tables.lane == "single"
    wl = 1 if single else 2
    klanes = (2 if shoup else 1) * wl
    nkeys = len(keys)
    C = ec.shape[1]

    xm = st.reshape(B, n_parts, amax, P1, P2)
    if single:
        stlanes = (xm.astype(jnp.uint32),)
    else:
        xu = xm.astype(jnp.uint64)
        stlanes = (
            (xu & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (xu >> jnp.uint64(32)).astype(jnp.uint32),
        )
    ups = [
        _parts_up(g.L, g.sa, g.sb, P1, P2, wl, nkeys, amax)
        for g in tables.groups
    ]
    n_pp = n_parts
    if any(u > 1 for u in ups) and n_parts % 2:
        # zero-pad to an even part count: a zero part's extension, NTT
        # and key products are all exactly zero, so the accumulators are
        # unchanged (signed digits 0, REDC(0 * k) = 0).  ec/keys may
        # arrive pre-padded (engine cache) — only the data-dependent
        # digits must pad per call.
        n_pp = n_parts + 1
        stlanes = tuple(
            jnp.pad(l, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))
            for l in stlanes
        )
        if ec.shape[0] == n_parts:
            ec = jnp.pad(ec, ((0, 1), (0, 0), (0, 0)))
        keys = tuple(
            tuple(
                p if p.shape[0] == n_pp
                else jnp.pad(p, ((0, 1), (0, 0), (0, 0), (0, 0)))
                for p in pair[:klanes]
            )
            for pair in keys
        )
    outs = [[] for _ in range(nkeys)]
    for g, up in zip(tables.groups, ups):
        L = g.L
        folds = g.scalars["plain"]
        kflat = tuple(
            p[:, g.c0:g.c1] for pair in keys for p in pair[:klanes]
        )
        res = _run_parts_group(
            stlanes, ec[:, g.c0:g.c1], g.W1, g.W2, g.TA, g.consts,
            folds, kflat,
            L=L, P1=P1, P2=P2, n_parts=n_pp, amax=amax,
            interpret=interpret, single=single, sa=g.sa, sb=g.sb, up=up,
            pad_tail=n_pp != n_parts, skq=shoup,
        )
        for i in range(nkeys):
            outs[i].append(
                (res[i],) if single else (res[2 * i], res[2 * i + 1])
            )

    def cat(parts, j):
        segs = [p[j] for p in parts]
        return segs[0] if len(segs) == 1 else jnp.concatenate(segs,
                                                              axis=1)

    def finish(parts):
        shape = (*lead, C, P1, P2)
        lo = cat(parts, 0).reshape(shape)
        hi = (jnp.zeros_like(lo) if single
              else cat(parts, 1).reshape(shape))
        return lo, hi

    return tuple(finish(p) for p in outs)


def _make_tensor_kernel(L, P1, P2, single=False, sa=(0, GROUP_K, False),
                        sb=(0, GROUP_K, False)):
    """Four transforms + CKKS tensor product in one cell: inputs
    x0, x1, y0, y1 (ciphertext pairs), outputs d0 = x0*y0,
    d1 = x0*y1 + x1*y0, d2 = x1*y1 (all Montgomery products; (lo, hi)
    pairs, or lo-only in single-lane mode).

    The four transforms are software-pipelined (the ub=2 trick of the
    transform-only kernel, generalized): within each matmul phase,
    polynomial u+1's diagonal dots are ISSUED before polynomial u's
    folds read their own diagonals, so the asynchronous MXU drains
    under the VPU recombination.  Two alternating diagonal buffers
    carry the in-flight window; the phase-A outputs park in a u32
    scratch between phases."""
    lwA, gkA, k32A, ndA, GA = _step_params(L, sa)
    lwB, gkB, k32B, ndB, GB = _step_params(L, sb)
    wlane = 1 if single else 2

    def kernel(cons_ref, fold_ref, *refs):
        xrefs = refs[: 4 * wlane]
        w1_ref, w2_ref, ta_ref = refs[4 * wlane : 4 * wlane + 3]
        rest = refs[4 * wlane + 3 :]
        out_refs = rest[:-2]
        s_ref = rest[-2]          # (2, nd, p1b, P2) int32 — mod-2 window
        u_scr = rest[-1]          # (4, wlane, p1b, P2) u32 — phase-A outs
        c = pl.program_id(0)
        q0 = cons_ref[c, 0]
        q1 = cons_ref[c, 1]
        q2lo = cons_ref[c, 2]
        q2hi = cons_ref[c, 3]
        kl = cons_ref[c, 4]
        kh = cons_ref[c, 5]
        q2 = (q0, q1, q2lo, q2hi)

        def fold_a(g):
            return (ta_ref[0, g, 0], ta_ref[0, g, 1],
                    ta_ref[0, g, 2], ta_ref[0, g, 3])

        def fold_b(g):
            return (fold_ref[c, 4 * g + 0], fold_ref[c, 4 * g + 1],
                    fold_ref[c, 4 * g + 2], fold_ref[c, 4 * g + 3])

        def dots_a(u):
            pair = (
                xrefs[wlane * u][0, 0],
                None if single else xrefs[wlane * u + 1][0, 0],
            )
            planes = _limb_planes(pair[0], pair[1], L, single)
            _diag_dots_a(planes, w1_ref[0], s_ref.at[u % 2], L, P1, lwA)

        dots_a(0)
        for u in range(4):
            if u + 1 < 4:
                dots_a(u + 1)
            ulo, uhi = _recombine_diag(s_ref.at[u % 2], ndA, GA, fold_a,
                                       q2, single, gkA, k32A)
            u_scr[u, 0] = ulo
            if not single:
                u_scr[u, 1] = uhi

        def dots_b(u):
            up = (u_scr[u, 0], None if single else u_scr[u, 1])
            planes = _limb_planes(up[0], up[1], L, single)
            _diag_dots_b(planes, w2_ref[0], s_ref.at[u % 2], L, P2, lwB)

        if single:
            def mul(a, b):
                return _redc30(a[0], b[0], kl, q0), None

            def add(a, b):
                return _csub32(a[0] + b[0], q2lo), None

            def store(i, v):
                out_refs[i][0, 0] = v[0]
        else:
            def mul(a, b):
                return pallas_mont.mont_mult_pair(a[0], a[1], b[0], b[1],
                                                  q0, q1, kl, kh)

            def add(a, b):
                return pallas_mont.mont_add_pair(a[0], a[1], b[0], b[1],
                                                 q2lo, q2hi)

            def store(i, v):
                out_refs[2 * i][0, 0], out_refs[2 * i + 1][0, 0] = v

        F = [None] * 4
        t10 = None
        dots_b(0)
        for u in range(4):
            if u + 1 < 4:
                dots_b(u + 1)
            F[u] = _recombine_diag(s_ref.at[u % 2], ndB, GB, fold_b,
                                   q2, single, gkB, k32B)
            # products issue as soon as operands exist — more VPU work
            # for the tail dots to hide under
            if u == 2:
                store(0, mul(F[0], F[2]))
                t10 = mul(F[1], F[2])
        store(1, add(mul(F[0], F[3]), t10))
        store(2, mul(F[1], F[3]))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("L", "P1", "P2", "interpret", "single", "sa", "sb",
                     "p1b"),
)
def _run_tensor_group(xlanes, W1, W2, TA, consts, folds, L, P1, P2,
                      interpret=False, single=False,
                      sa=(0, GROUP_K, False), sb=(0, GROUP_K, False),
                      p1b=None):
    """xlanes: 4 * wl u32 [B, Cg, P1, P2] raw-residue lanes (lo[, hi]
    per input) -> six u32 [B, Cg, P1, P2] outputs (d0, d1, d2 as
    (lo, hi) pairs; lo only in single mode)."""
    B, Cg = xlanes[0].shape[:2]
    lwA, gkA, k32A, ndA, GA = _step_params(L, sa)
    lwB, gkB, k32B, ndB, GB = _step_params(L, sb)
    nd = max(ndA, ndB)
    w1c = (lwA if lwA else 1) * L * P1
    w2c = (lwB if lwB else 1) * P2
    wl = 1 if single else 2
    if p1b is None:
        p1b = _pick_p1b(L, sa, sb, P1, P2, wl, nkeys=0, npd=0,
                        x_lanes=4 * wl, out_rows=3 * wl,
                        budget=_TENSOR_BUDGET,
                        extra_rows=nd + 4 * wl)
    kernel = _make_tensor_kernel(L, P1, P2, single=single, sa=sa, sb=sb)
    grid = (Cg, B, P1 // p1b)
    z = np.int32(0)
    n_out = 3 if single else 6
    x_spec = pl.BlockSpec((1, 1, P1, P2), lambda c, b, p: (b, c, z, z),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, p1b, P2), lambda c, b, p: (b, c, p, z),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, Cg, P1, P2), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Cg, 6), lambda c, b, p: (z, z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Cg, 4 * GB), lambda c, b, p: (z, z),
                         memory_space=pltpu.SMEM),
        ] + [x_spec] * len(xlanes) + [
            pl.BlockSpec((1, p1b, w1c), lambda c, b, p: (c, p, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L * P2, w2c), lambda c, b, p: (c, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GA, 4, p1b, P2),
                         lambda c, b, p: (c, z, z, p, z),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec] * n_out,
        out_shape=[out_shape] * n_out,
        scratch_shapes=[pltpu.VMEM((2, nd, p1b, P2), jnp.int32),
                        pltpu.VMEM((4, wl, p1b, P2), jnp.uint32)],
        cost_estimate=pl.CostEstimate(
            flops=8 * B * Cg * L * L * P1 * P2 * (P1 + P2),
            bytes_accessed=B * Cg * P1 * P2 * (16 * len(xlanes) // 8 + 24),
            transcendentals=0,
        ),
        interpret=interpret,
    )(consts, folds.reshape(folds.shape[0], -1), *xlanes, W1, W2, TA)


def ntt_tensor(x0, x1, y0, y1, fwd: KTables, enter: bool = True,
               interpret: bool = False):
    """CKKS tensor product fused into one Pallas call per channel group:
    NTT of all four ciphertext polynomials plus the three Montgomery
    products (d0, d1, d2) = (x0y0, x0y1 + x1y0, x1y1) — bit-identical to
    enter_ntt -> mont_mult/mont_add (reference tensor product,
    ``ckks_engine.py:1328-1339``) with four fewer HBM round trips."""
    interpret = interpret or INTERPRET
    tables = fwd
    P1, P2 = tables.P1, tables.P2
    lead = x0.shape[:-2]
    C = x0.shape[-2]
    N = P1 * P2
    B = int(np.prod(lead)) if lead else 1
    variant = "enter" if enter else "plain"

    single = tables.lane == "single"
    wl = 1 if single else 2

    def lanes(x):
        assert not tables.swap
        xm = x.reshape(*lead, C, P1, P2).reshape(B, C, P1, P2)
        if single:
            return (xm.astype(jnp.uint32),)
        xu = xm.astype(jnp.uint64)
        return (
            (xu & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
            (xu >> jnp.uint64(32)).astype(jnp.uint32),
        )

    xs = [lanes(v) for v in (x0, x1, y0, y1)]
    outs = [[] for _ in range(3 * wl)]
    for g in tables.groups:
        L = g.L
        xlanes = tuple(
            l[:, g.c0:g.c1] for lane_set in xs for l in lane_set
        )
        folds = g.scalars[variant]
        res = _run_tensor_group(
            xlanes, g.W1, g.W2, g.TA, g.consts, folds,
            L=L, P1=P1, P2=P2, interpret=interpret,
            single=single, sa=g.sa, sb=g.sb,
            p1b=_pick_p1b(L, g.sa, g.sb, P1, P2, wl, nkeys=0, npd=0,
                          x_lanes=4 * wl, out_rows=3 * wl,
                          budget=_TENSOR_BUDGET,
                          extra_rows=g.nd + 4 * wl),
        )
        for i in range(3 * wl):
            outs[i].append(res[i])

    def cat(parts):
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts,
                                                                axis=1)

    def finish(i):
        lo = cat(outs[wl * i])
        if single:
            out = lo.astype(jnp.uint64)
        else:
            out = (lo.astype(jnp.uint64)
                   | (cat(outs[2 * i + 1]).astype(jnp.uint64)
                      << jnp.uint64(32)))
        out = out.reshape(*lead, C, N) if lead else out.reshape(C, N)
        return out.astype(x0.dtype)

    return finish(0), finish(1), finish(2)


def _pick_p1b(L, sa, sb, P1, P2, wl, nkeys, npd, x_lanes=None,
              out_rows=None, budget=int(11.5 * 2**20),
              extra_rows=0) -> int:
    """Row-block size for the P1 axis: the full P1 when the cell's VMEM
    working set fits (the logN <= 16 regime), else the largest power-of-
    two fraction that fits — streaming row blocks through VMEM is what
    lifts the logN >= 17 cap (VERDICT r2 #6).  Estimate counts the
    dominant per-cell buffers (x lanes + xcat stay FULL: step A contracts
    over all P1 rows); override with TIBERATE_PMXU_P1B."""
    import os

    env = os.environ.get("TIBERATE_PMXU_P1B")
    if env:
        return min(P1, int(env))
    lwA, gkA, k32A, ndA, GA = _step_params(L, sa)
    lwB, gkB, k32B, ndB, GB = _step_params(L, sb)
    nd = max(ndA, ndB)
    if x_lanes is None:
        x_lanes = wl
    if out_rows is None:
        # outputs + key planes + accumulators + pdiv rows, all [p1b, P2]
        out_rows = wl * (1 + 4 * nkeys + npd)
    p1b = P1
    while p1b > 8:
        est = (
            x_lanes * 4 * P1 * P2     # resident raw-residue lanes
            + L * P1 * P2             # xcat int8 (full rows, one live)
            + (lwA or 1) * L * p1b * P1   # W1 block int8 (wred: lwA x)
            + (lwB or 1) * P2 * L * P2    # W2 int8 (wred: lwB x)
            + GA * 4 * p1b * P2 * 4   # TA planes u32
            + nd * p1b * P2 * 4       # diagonal scratch int32
            + p1b * L * P2 * 4        # one dot output int32
            + 4 * p1b * P2 * out_rows
            + 4 * p1b * P2 * extra_rows   # pipeline window scratch
        )
        if est <= budget:
            break
        p1b //= 2
    return p1b


# The tensor kernel keeps 4 polynomials (8 u32 lanes) resident per cell,
# so its real scoped-VMEM use runs ~2x the _pick_p1b estimate (measured:
# 22.12M at logN17-fwd where the estimate said ~11M).  Budget it at half
# and require a non-degenerate row block; past that, the engine falls
# back to 4 single-poly blocked NTTs + XLA products (tensor_fits).
_TENSOR_BUDGET = int(5.75 * 2**20)
_TENSOR_MIN_P1B = 32

# Extra [p1b, P2] u32 rows charged to the per-part keymul-with-accum
# cell: its measured scoped VMEM runs ~1.8x the base estimate (see the
# _apply call site) — 112 rows closes the measured 7.3M gap at p1b=64.
_KEYMUL_ACC_ROWS = 112


def tensor_fits(tables: KTables) -> bool:
    """Whether the fused 4-transform tensor kernel's working set fits
    VMEM for every channel group of these tables (logN <= 16 presets:
    yes; logN17 forward: no — 8 resident lanes leave no headroom)."""
    wl = 1 if tables.lane == "single" else 2
    for g in tables.groups:
        p1b = _pick_p1b(g.L, g.sa, g.sb, tables.P1, tables.P2, wl,
                        nkeys=0, npd=0, x_lanes=4 * wl, out_rows=3 * wl,
                        budget=_TENSOR_BUDGET,
                        extra_rows=g.nd + 4 * wl)
        if p1b < _TENSOR_MIN_P1B and p1b < tables.P1:
            return False
    return True


@functools.partial(
    jax.jit,
    static_argnames=("L", "P1", "P2", "interpret", "single", "sa", "sb",
                     "ub", "p1b", "skq"),
)
def _run_group(xlanes, W1, W2, TA, consts, folds, L, P1, P2,
               interpret=False, keys=(), accum=(), pdiv=(),
               single=False, sa=(0, GROUP_K, False),
               sb=(0, GROUP_K, False), ub=1, p1b=None, skq=False):
    """xlanes: (lo[, hi]) u32 [B, Cg, P1, P2] raw-residue lanes ->
    u32 [B, Cg, P1, P2] outputs (limb split happens in-kernel).

    Without ``keys``: (lo, hi) of the transform.  With ``keys`` (flat
    (klo, khi) u32 [Cg, P1, P2] per key): (tlo, thi) per key, where
    t = REDC(out * k) — the fused keyswitch epilogue.  With ``accum``
    (flat (alo, ahi) u32 [B, Cg, P1, P2] per key, donated): t also adds
    the running part-sum, t = acc (+) REDC(out * k), lazy mod 2q.
    With ``pdiv`` = (pdc [Cg, 2+2S] u32, *flat (plo, phi) u32
    [B, P1, P2] per division): the P-division epilogue runs in-kernel
    and the output is canonical [0, q).

    When the per-cell VMEM working set exceeds the budget (logN >= 17),
    the P1 (row) axis is streamed in blocks through a third grid
    dimension — rows are independent everywhere past the step-A
    contraction, which reads the (resident) full x block.
    """
    B, Cg = xlanes[0].shape[:2]
    lwA, gkA, k32A, ndA, GA = _step_params(L, sa)
    lwB, gkB, k32B, ndB, GB = _step_params(L, sb)
    nd = max(ndA, ndB)
    wl = 1 if single else 2   # lanes per value
    kl_n = 2 * wl if skq else wl
    nkeys = len(keys) // kl_n
    npd = (len(pdiv) - 1) // wl if pdiv else 0
    if p1b is None:
        p1b = _pick_p1b(L, sa, sb, P1, P2, wl, nkeys, npd)
    if nkeys or B % ub or p1b != P1:
        ub = 1               # unroll: transform-only and pdiv paths
    kernel = _make_kernel(L, P1, P2, nkeys=nkeys, acc=bool(accum),
                          pdiv=npd, single=single, sa=sa, sb=sb, ub=ub,
                          skq=skq)
    w1c = (lwA if lwA else 1) * L * P1
    w2c = (lwB if lwB else 1) * P2
    grid = (Cg, B // ub, P1 // p1b)
    z = np.int32(0)  # python 0 would trace as i64 under x64 mode
    out_spec = pl.BlockSpec((ub, 1, p1b, P2), lambda c, b, p: (b, c, p, z),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, Cg, P1, P2), jnp.uint32)
    n_out = wl * nkeys if nkeys else wl
    pd_specs = []
    if pdiv:
        # Shoup P-division quads (CkksParams.pdq): (w, w') per constant
        # on the single lane, (w0, w1, s0, s1) 31-splits on the pair lane
        pd_specs.append(
            pl.BlockSpec((Cg, (2 * wl) * (1 + npd)), lambda c, b, p: (z, z),
                         memory_space=pltpu.SMEM))
        pd_specs.extend(
            pl.BlockSpec((ub, p1b, P2), lambda c, b, p: (b, p, z),
                         memory_space=pltpu.VMEM)
            for _ in range(wl * npd))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Cg, 6), lambda c, b, p: (z, z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((Cg, 4 * GB), lambda c, b, p: (z, z),
                         memory_space=pltpu.SMEM),
        ] + [
            # full rows: step A contracts over the whole P1 axis; the
            # index map is constant in p, so the block stays resident
            pl.BlockSpec((ub, 1, P1, P2), lambda c, b, p: (b, c, z, z),
                         memory_space=pltpu.VMEM)
            for _ in xlanes
        ] + [
            pl.BlockSpec((1, p1b, w1c), lambda c, b, p: (c, p, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L * P2, w2c), lambda c, b, p: (c, z, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GA, 4, p1b, P2),
                         lambda c, b, p: (c, z, z, p, z),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((1, p1b, P2), lambda c, b, p: (c, p, z),
                         memory_space=pltpu.VMEM)
            for _ in keys
        ] + [
            pl.BlockSpec((1, 1, p1b, P2), lambda c, b, p: (b, c, p, z),
                         memory_space=pltpu.VMEM)
            for _ in accum
        ] + pd_specs,
        out_specs=[out_spec] * n_out,
        out_shape=[out_shape] * n_out,
        scratch_shapes=(
            [pltpu.VMEM((ub, nd, p1b, P2), jnp.int32),
             pltpu.VMEM((ub, wl, p1b, P2), jnp.uint32)]
            if ub > 1 else [pltpu.VMEM((nd, p1b, P2), jnp.int32)]
        ),  # nd = lw (wred) or 2L-1 (legacy), set above
        input_output_aliases={
            5 + len(xlanes) + len(keys) + i: i for i in range(len(accum))
        },
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Cg * L * L * P1 * P2 * (P1 + P2),
            bytes_accessed=B * Cg * P1 * P2 * (4 * len(xlanes) + 8
                                               + 16 * nkeys),
            transcendentals=0,
        ),
        interpret=interpret,
    )(consts, folds.reshape(folds.shape[0], -1), *xlanes, W1, W2, TA,
      *keys, *accum, *pdiv)
    return outs


# Module-wide interpret override: lets the CPU test suite drive the
# ENGINE-level kernel paths (which call with interpret=False) without
# real TPU hardware.
INTERPRET = False


@functools.lru_cache(maxsize=1)
def _transform_unroll() -> int:
    """Batch-unroll factor for the transform-only and pdiv kernels
    (``ub`` in :func:`_run_group`): processes ``ub`` batch items per
    grid cell, software-pipelined so the MXU dots of item u+1 overlap
    the VPU recombination (and P-division chain) of item u.  Default 2
    (+13% on the standalone logN15 transform on chip, r4); override
    with TIBERATE_TRANSFORM_UNROLL=1/4 to A/B.  Fused-key variants and
    batches not divisible by ``ub`` always run ub=1 (see _run_group)."""
    import os

    return max(1, int(os.environ.get("TIBERATE_TRANSFORM_UNROLL", "2")))


def _apply(x, tables: KTables, variant: str, interpret=False, keys=None,
           accum=None, pair_out=False, pdiv=None, out_dtype=None,
           shoup=False):
    """x: [..., C, N] int64/int32 lazy [0, 2q) -> same, lazy [0, 2q).
    x may also be a (lo, hi) u32 pair in the kernel layout
    [..., C, P1, P2] (forward/unswapped only) — e.g. a keyswitch
    accumulator — in which case no XLA-side merge or split happens at
    all; ``out_dtype`` then selects the polynomial output dtype.

    With ``keys`` (tuple of (klo, khi) u32 [C, P1, P2] pairs, see
    :func:`key_pairs`): returns a tuple of len(keys) arrays, each
    REDC(ntt(x) * k_i) — the fused keyswitch epilogue.  ``accum``
    (tuple of (alo, ahi) u32 [..., C, P1, P2] pairs, donated) adds a
    running part-sum per key inside the kernel.  ``pair_out`` returns
    (lo, hi) u32 [..., C, P1, P2] pairs instead of merged [..., C, N]
    polynomials (for chaining accumulators without HBM merges).
    """
    interpret = interpret or INTERPRET
    P1, P2 = tables.P1, tables.P2
    single = tables.lane == "single"
    wl = 1 if single else 2   # lanes per value (single: lo only)
    N = P1 * P2
    pair_in = isinstance(x, tuple)
    if pair_in and (
        x[0].shape[-2:] != ((P2, P1) if tables.swap else (P1, P2))
    ):
        # Pair operands arrive in the FORWARD kernel layout; when the
        # forward grid does not transpose into this table's (both
        # directions put the larger factor first, see build_tables),
        # merge the lanes to polynomial rows and take the plain path —
        # one XLA round trip, far cheaper than running the transform in
        # its slow orientation.
        lead_p = x[0].shape[:-2]
        if single:
            x = x[0].reshape(*lead_p, N).astype(jnp.int32)
        else:
            merged = (x[0].astype(jnp.uint64)
                      | (x[1].astype(jnp.uint64) << jnp.uint64(32)))
            x = merged.reshape(*lead_p, N).astype(jnp.int64)
        pair_in = False
    if pair_in:
        # Pair operands arrive in the FORWARD kernel layout
        # [..., C, P1_fwd, P2_fwd]; swapped (inverse) tables read the
        # transpose.
        xin = (tuple(jnp.swapaxes(p, -1, -2) for p in x[:wl])
               if tables.swap else x[:wl])
        lead = xin[0].shape[:-3]
        C = xin[0].shape[-3]
        B = int(np.prod(lead)) if lead else 1
        xlanes_all = tuple(p.reshape(B, C, P1, P2) for p in xin)
        x_dtype = out_dtype if out_dtype is not None else jnp.int64
    else:
        lead = x.shape[:-2]
        C = x.shape[-2]
        B = int(np.prod(lead)) if lead else 1
        if tables.swap:
            xm = x.reshape(*lead, C, P2, P1)
            xm = jnp.swapaxes(xm, -1, -2)
        else:
            xm = x.reshape(*lead, C, P1, P2)
        xm = xm.reshape(B, C, P1, P2)
        if single:
            xlanes_all = (xm.astype(jnp.uint32),)
        else:
            xu = xm.astype(jnp.uint64)
            xlanes_all = (
                (xu & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
                (xu >> jnp.uint64(32)).astype(jnp.uint32),
            )
        x_dtype = x.dtype
    nkeys = len(keys) if keys else 0
    n_out = nkeys if nkeys else 1
    klanes = (2 if shoup else 1) * wl   # lanes per key operand
    accum = tuple(
        tuple(p.reshape(B, C, P1, P2) for p in pair[:wl])
        for pair in accum
    ) if accum is not None else None
    if pdiv is not None:
        pdc, p0_pairs = pdiv
        p0_flat = tuple(
            p.reshape(B, P1, P2) for pair in p0_pairs for p in pair[:wl]
        )
    outs = [[] for _ in range(n_out)]
    for g in tables.groups:
        L = g.L
        xlanes = tuple(l[:, g.c0:g.c1] for l in xlanes_all)
        folds = g.scalars[variant]
        kflat = tuple(
            p[g.c0:g.c1] for pair in (keys or ()) for p in pair[:klanes]
        )
        aflat = tuple(
            p[:, g.c0:g.c1] for pair in (accum or ()) for p in pair
        )
        pdflat = (
            (pdc[g.c0:g.c1],) + p0_flat if pdiv is not None else ()
        )
        # p1b picked HERE (not inside the jitted _run_group) so it is
        # part of the jit key — the env override then always takes
        nk = len(kflat) // klanes
        npd_g = (len(pdflat) - 1) // wl if pdflat else 0
        # Shoup keys carry companion planes beyond the wl the estimate
        # already counts per key — charge them so tight cells (e.g. the
        # vmap-batched per-part chain) drop to a smaller row block
        # instead of overflowing scoped VMEM.  The keymul-with-accum
        # cell additionally under-models by ~1.8x (measured: 16.25M
        # scoped at the p1b=64 the base estimate called 8.98M — logN15
        # L=9 group, nkeys=2, pair keys, vmapped B=8); charge the gap
        # as p1b-proportional rows like the tensor kernel's half-budget
        # (_TENSOR_BUDGET) handles the same phenomenon.
        p1b = _pick_p1b(L, g.sa, g.sb, P1, P2, wl, nk, npd_g,
                        extra_rows=(wl * nk if shoup else 0)
                        + (_KEYMUL_ACC_ROWS if (nk and aflat) else 0))
        ub = _transform_unroll()
        if ub > 1 and p1b == P1 and not nk:
            # the unrolled cell carries ub x lanes / diag buffers /
            # outputs / pdiv rows — only run it if THAT working set
            # still fits a full-P1 cell
            fits = _pick_p1b(
                L, g.sa, g.sb, P1, P2, wl, nk, npd_g,
                x_lanes=ub * wl,
                out_rows=ub * wl * (1 + npd_g),
                extra_rows=(ub - 1) * g.nd + ub * wl,
            )
            if fits != P1:
                ub = 1
        res = _run_group(
            xlanes, g.W1, g.W2, g.TA, g.consts, folds,
            L=L, P1=P1, P2=P2, interpret=interpret,
            keys=kflat, accum=aflat, pdiv=pdflat,
            single=single, sa=g.sa, sb=g.sb, ub=ub, p1b=p1b, skq=shoup,
        )
        for i in range(n_out):
            outs[i].append(
                (res[i],) if single else (res[2 * i], res[2 * i + 1])
            )

    def gather(parts, j, acc_pair=None):
        """Concatenate group outputs in channel order; channels not
        covered by any group (``skip_range`` views) pass through from
        the accumulator."""
        segs = []
        pos = 0
        for g, p in zip(tables.groups, parts):
            if g.c0 > pos:
                segs.append(acc_pair[j][:, pos:g.c0])
            segs.append(p[j])
            pos = g.c1
        if pos < C:
            segs.append(acc_pair[j][:, pos:C])
        return segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=1)

    covered = sum(g.c1 - g.c0 for g in tables.groups)
    if covered != C and accum is None:
        raise ValueError(
            "skip_range tables need an accumulator to fill skipped rows"
        )

    def finish(parts, acc_pair=None):
        lo = gather(parts, 0, acc_pair)
        # single-lane values fit the lo lane; the hi half exposed in the
        # pair interfaces is a constant zero XLA folds away
        hi = (jnp.zeros_like(lo) if single
              else gather(parts, 1, acc_pair))
        if pair_out:
            shape = (*lead, C, P1, P2)
            return lo.reshape(shape), hi.reshape(shape)
        if single:
            out = lo.astype(jnp.uint64)
        else:
            out = (lo.astype(jnp.uint64)
                   | (hi.astype(jnp.uint64) << jnp.uint64(32)))
        out = out.reshape(B, C, P1, P2)
        if tables.swap:
            out = jnp.swapaxes(out, -1, -2)
        out = out.reshape(*lead, C, N) if lead else out.reshape(C, N)
        return out.astype(x_dtype)

    if nkeys:
        return tuple(
            finish(p, accum[i] if accum else None)
            for i, p in enumerate(outs)
        )
    return finish(outs[0])


def ntt(x, fwd: KTables, enter: bool = False, interpret: bool = False):
    """Forward negacyclic NTT (domain-preserving, like ops/ntt.ntt)."""
    return _apply(x, fwd, "enter" if enter else "plain", interpret)


def intt(x, inv: KTables, epilogue: str = "mont", interpret: bool = False):
    """Inverse NTT; epilogue "mont" keeps R (like ops/ntt.intt), "exit"
    folds R^-1 (like intt_exit)."""
    return _apply(x, inv, epilogue, interpret)


def key_pairs(k, tables: KTables):
    """int64 key rows [C, N] -> (klo, khi) u32 [C, P1, P2] pair for
    :func:`ntt_keymul`.  One-time (cache per key); forward layout only."""
    assert not tables.swap, "key fusion is a forward-NTT epilogue"
    C = k.shape[-2]
    ku = k.astype(jnp.uint64).reshape(C, tables.P1, tables.P2)
    return (
        (ku & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
        (ku >> jnp.uint64(32)).astype(jnp.uint32),
    )


def key_quads(k, tables: KTables, q, mont_R_bits: int | None = None):
    """Shoup-form key lanes for ``ntt_keymul(..., shoup=True)``.

    ``k``: Montgomery NTT-domain key rows [C, N] (the same input as
    :func:`key_pairs`); ``q``: the C channel moduli.  Precomputes the
    plain-domain key ``w = k * R^-1 mod q`` and its Shoup companion so
    the kernel epilogue's REDC(ntt(x) * k) becomes the cheaper constant
    multiplication ``ntt(x) * w mod q`` (identical residues; the
    Harvey/NTL evk trick).  Returns u32 [C, P1, P2] planes:

    * pair lane — (w0, w1, s0, s1): 31-bit splits of w and of
      ``s = floor(w * 2^62 / q)``,
    * single lane — (w, wp) with ``wp = floor(w * 2^31 / q)``.

    One-time cost (cache per key): the 124-bit companion division runs
    in the native helper when available, else per-row Python ints.
    """
    assert not tables.swap, "key fusion is a forward-NTT epilogue"
    single = tables.lane == "single"
    if mont_R_bits is None:
        mont_R_bits = 30 if single else 62
    C = k.shape[-2]
    P1, P2 = tables.P1, tables.P2
    kn = np.asarray(k).astype(np.uint64)
    q = [int(x) for x in q]
    assert len(q) == C
    if single:
        qv = np.array(q, dtype=np.uint64)[:, None]
        rinv = np.array([pow(1 << mont_R_bits, -1, qi) for qi in q],
                        dtype=np.uint64)[:, None]
        w = (kn % qv) * rinv % qv          # < 2^60: exact in u64
        wp = (w << np.uint64(31)) // qv
        return tuple(
            jnp.array(a.astype(np.uint32).reshape(C, P1, P2))
            for a in (w, wp)
        )
    R = 1 << mont_R_bits
    w = np.empty_like(kn)
    s = np.empty_like(kn)
    try:
        from tiberate_tpu.utils import native

        for c, qi in enumerate(q):
            native.shoup_key_row(kn[c], qi, pow(R, -1, qi),
                                 mont_R_bits, w[c], s[c])
    except Exception:
        for c, qi in enumerate(q):
            rinv = pow(R, -1, qi)
            row = [int(v) * rinv % qi for v in kn[c].tolist()]
            w[c] = np.array(row, dtype=np.uint64)
            s[c] = np.array([(v << mont_R_bits) // qi for v in row],
                            dtype=np.uint64)
    m31 = np.uint64(0x7FFFFFFF)
    return tuple(
        jnp.array(a.astype(np.uint32).reshape(C, P1, P2))
        for a in (w & m31, w >> np.uint64(31), s & m31,
                  s >> np.uint64(31))
    )


def ntt_keymul(x, fwd: KTables, keys, enter: bool = False,
               interpret: bool = False, accum=None, pair_out: bool = False,
               shoup: bool = False):
    """Forward NTT fused with per-key Montgomery multiply.

    ``keys``: tuple of (klo, khi) pairs from :func:`key_pairs`.  Returns
    a tuple of len(keys) arrays, each ``mont_mult(ntt(x), k_i)`` in
    [0, 2q) — residues mod q identical to the unfused
    ``mont.mont_mult(ntt(x), k)`` chain (reference per-part evk multiply,
    ``ckks_engine.py:1145-1161``).  With ``enter`` the transform also
    folds the Montgomery entry (like :func:`ntt` with enter=True), which
    fuses the encrypt/decrypt pattern enter_ntt -> mont_mult(key).

    Keyswitch accumulation: ``accum`` (one (alo, ahi) pair per key, as
    returned with ``pair_out=True``; donated) makes each output
    acc (+) REDC(ntt(x) * k_i), the lazy mod-2q running part-sum — the
    whole reference part loop (``ckks_engine.py:1048-1058``) then never
    leaves the kernel between parts.  Convert the final accumulator with
    :func:`pair_to_poly`.

    ``shoup``: keys are :func:`key_quads` Shoup-form lanes instead of
    :func:`key_pairs` — each output is ``ntt(x) * k * R^-1 mod q`` with
    identical residues but constant-multiplication cost."""
    return _apply(x, fwd, "enter" if enter else "plain", interpret,
                  keys=keys, accum=accum, pair_out=pair_out, shoup=shoup)


def coef_row_pairs(row, tables: KTables):
    """Coefficient-domain row(s) [..., N] -> (lo, hi) u32 pair in the
    kernel's internal [..., P1, P2] layout for :func:`intt_pdiv`."""
    P1, P2 = tables.P1, tables.P2
    lead = row.shape[:-1]
    if tables.swap:
        m = row.reshape(*lead, P2, P1)
        m = jnp.swapaxes(m, -1, -2)
    else:
        m = row.reshape(*lead, P1, P2)
    mu = m.astype(jnp.uint64)
    return (
        (mu & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32),
        (mu >> jnp.uint64(32)).astype(jnp.uint32),
    )


def intt_pdiv(x, inv: KTables, p0_pairs, pdc, interpret: bool = False,
              out_dtype=None):
    """Inverse NTT fused with the keyswitch P-division epilogue.

    x: [..., C, N] ordinary-channel rows (Montgomery form kept through
    the transform, variant "mont"), or a (lo, hi) u32 pair in the
    forward kernel layout [..., C, P1_fwd, P2_fwd] (e.g. the keyswitch
    accumulator — no XLA-side merge).  ``p0_pairs``: per division i a
    (plo, phi) pair of the PLAIN special-row value (from
    :func:`coef_row_pairs`, batch dims matching x's lead dims).
    ``pdc``: u32 [C, (2|4) * (1 + S)] Shoup division quads
    (``CkksParams.pdq`` — the affine form of the successive rescale,
    see the kernel's ``pdiv_epilogue``).  Returns canonical [0, q) rows:
    residue-identical to the reference's successive rescale
    (``ckks_engine.py:1068-1124``) followed by mont_reduce + reduce_2q.
    """
    return _apply(x, inv, "mont", interpret, pdiv=(pdc, p0_pairs),
                  out_dtype=out_dtype)


def pair_to_poly(pair, tables: KTables, dtype=jnp.int64):
    """(lo, hi) u32 [..., C, P1, P2] pair (from ``pair_out=True``) ->
    [..., C, N] polynomial array, lazy [0, 2q)."""
    assert not tables.swap, "pair layout is forward (unswapped) only"
    lo, hi = pair
    out = lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))
    *lead, C, P1, P2 = out.shape
    return out.reshape(*lead, C, P1 * P2).astype(dtype)

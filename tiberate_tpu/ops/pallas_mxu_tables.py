"""Host-side table construction for the fused Pallas MXU NTT kernels.

Everything in this module runs in numpy at build time (engine context
construction); nothing here traces under jit.  The kernel bodies and
pallas_call runners live in ``ops/pallas_mxu.py``, which re-exports the
public names (``KGroup``, ``KTables``, ``build_tables``) so callers keep
one import surface.

Support matrix — (lane x scheme) per matmul step.  Each ``KGroup`` holds
one static step spec per matmul step (``sa`` for the W1 step, ``sb`` for
W2), chosen independently by :func:`build_tables`:

| lane   | scheme             | spec (lw, gk, k32)        | fold form |
|--------|--------------------|---------------------------|-----------|
| pair   | legacy diagonal    | (0, 6, False)             | 62-bit Shoup, packed groups < 2^61 |
| pair   | W-side pre-reduce  | (Lw, gk<=Lw, False)       | same, ceil(Lw/gk) folds |
| single | legacy diagonal    | (0, 2 or 1, False)        | Harvey 2^31 Shoup, packs < 2^31 |
| single | W-side pre-reduce  | (Lw, gk, False)           | Harvey form |
| single | W-side pre-reduce  | (Lw, gk, True)            | 2^32-companion Shoup (packs < 2^32, one extra csub) |

The W-side pre-reduction scheme is taken per step whenever its packing
plan exists and the step's table fits its VMEM budget (``_WRED_A_BUDGET``
row-blocked / ``_WRED_B_BUDGET`` resident); otherwise that step falls
back to the legacy diagonal scheme — mixed sa != sb groups (e.g. logN17
62-bit forward: wred-A + legacy-B) are fully supported by every kernel.
``TIBERATE_WRED=0/1`` forces legacy/pre-reduced everywhere (A/B knob).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tiberate_tpu.ops import ntt as ntt_ops
from tiberate_tpu.ops.mxu_ntt import (
    GROUP_K,
    LIMB_BITS,
    LIMB_MASK,
    _br_vec,
    _power_series,
    limbs_for_bits,
)

# ----------------------------------------------------------------------
# Tables.
# ----------------------------------------------------------------------


def _pair_cols(vals_u64: np.ndarray) -> np.ndarray:
    """uint64 [...] -> u32 [..., 2] (lo, hi) base-2^32 pair."""
    v = np.asarray(vals_u64, dtype=np.uint64)
    return np.stack(
        [(v & np.uint64(0xFFFFFFFF)).astype(np.uint32),
         (v >> np.uint64(32)).astype(np.uint32)],
        axis=-1,
    )


def _split31_cols(vals_u64: np.ndarray) -> np.ndarray:
    """uint64 [...] (< 2^62) -> u32 [..., 2] 31-bit split (w0, w1):
    value = w0 + w1 * 2^31, both halves < 2^31 (multiply-ready for
    ``_mul31``)."""
    v = np.asarray(vals_u64, dtype=np.uint64)
    return np.stack(
        [(v & np.uint64(0x7FFFFFFF)).astype(np.uint32),
         (v >> np.uint64(31)).astype(np.uint32)],
        axis=-1,
    )


def _limb_blocks(W_u64: np.ndarray, L: int) -> np.ndarray:
    """uint64 [K1, K2] -> int8 [L, K1, K2] plain limb planes."""
    return np.stack(
        [((W_u64 >> np.uint64(LIMB_BITS * i)) & np.uint64(LIMB_MASK))
         .astype(np.int8) for i in range(L)]
    )


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class KGroup:
    """One contiguous channel range sharing a limb structure.

    Two table schemes (static per group, ``Lw``):

    * ``Lw = 0`` — the legacy *diagonal* scheme: W1/W2 hold ONE limb
      decomposition of the twiddle matrix and the dots produce the
      2L-1 limb-product diagonals, recombined in ceil((2L-1)/gk) Shoup
      folds per step.
    * ``Lw > 0`` — the *W-side pre-reduction* scheme: the tables hold
      ``(W * 2^(7j)) mod q`` for every INPUT limb j, each decomposed
      into its own Lw OUTPUT limb planes, so the MXU contraction
      absorbs the cross-limb carries and produces only Lw diagonals
      s_i = sum_j (W*2^(7j) mod q)_i @ x_j — the per-step fold count
      drops to ceil(Lw/gk) (ONE Shoup fold at L=6) at identical MXU
      MAC count.  Residues mod q are unchanged (sum_i s_i 2^(7i) ≡
      W @ x mod q by construction); lazy representatives differ,
      which the [0, 2q) interface already allows.

    The scheme is chosen PER STEP (``sa`` for the W1 matmul, ``sb`` for
    the W2 matmul): step A's table is row-blocked with the output rows
    (p1b streaming), so its pre-reduced form costs only column width,
    while step B's table must stay fully VMEM-resident — at large
    rings the B side falls back to legacy while A keeps the 1-fold
    form.  Each step spec is a static tuple ``(lw, gk, k32)``:

    * ``lw`` — output limb count (0 = legacy diagonal scheme),
    * ``gk`` — recombination group width (diagonals per Shoup fold),
    * ``k32`` — single-lane 2^32-scaled Shoup companion (packed group
      sums in [2^31, 2^32), one extra conditional subtract) instead of
      Harvey's 2^31 form.

    ``scalars``: per-variant step-B fold scalars [Cg, GB, 4]
    (w pair + Shoup pair per group) — per-GROUP because the group
    scale 2^(7*gk*g) depends on this group's gk.
    """

    L: int          # static: value (input) limb count
    c0: int         # static
    c1: int         # static
    W1: jax.Array   # legacy: [Cg, P1, L*P1] int8; wred: [Cg, P1, lwA*L*P1]
    W2: jax.Array   # legacy: [Cg, L*P2, P2] int8 (REVERSED limb order);
                    # wred: [Cg, L*P2, lwB*P2] (natural order, i-major cols)
    TA: jax.Array   # [Cg, GA, 4, P1, P2] u32 31-splits: (w0, w1, s0, s1)
    consts: jax.Array  # [Cg, 6] u32: q 31-split, 2q pair, k 31-split
    scalars: dict   # variant -> [Cg, GB, 4] u32 step-B fold scalars
    sa: tuple = (0, GROUP_K, False)   # static: step-A (lw, gk, k32)
    sb: tuple = (0, GROUP_K, False)   # static: step-B (lw, gk, k32)

    def tree_flatten(self):
        names = tuple(sorted(self.scalars))
        return (
            (self.W1, self.W2, self.TA, self.consts,
             tuple(self.scalars[k] for k in names)),
            (self.L, self.c0, self.c1, self.sa, self.sb, names),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        L, c0, c1, sa, sb, names = aux
        W1, W2, TA, consts, svals = children
        return cls(L, c0, c1, W1, W2, TA, consts,
                   dict(zip(names, svals)), sa=sa, sb=sb)

    @property
    def nd(self):
        """Scratch diagonal-plane count (max over the two steps)."""
        return max(_step_nd(self.L, self.sa), _step_nd(self.L, self.sb))

    @property
    def ga(self):
        return -(-_step_nd(self.L, self.sa) // self.sa[1])

    @property
    def gb(self):
        return -(-_step_nd(self.L, self.sb) // self.sb[1])


def _step_nd(L: int, spec: tuple) -> int:
    """Diagonal count for one step spec: lw (wred) or 2L-1 (legacy)."""
    return spec[0] if spec[0] else 2 * L - 1


def _step_params(L: int, spec: tuple):
    """Unpack one step spec -> (lw, gk, k32, nd, G)."""
    lw, gk, k32 = spec
    nd = lw if lw else 2 * L - 1
    return lw, gk, k32, nd, -(-nd // gk)


def _gslice(g: KGroup, a: int, b: int, c0: int, c1: int) -> KGroup:
    """Channel-slice a KGroup ([a:b] of its arrays, new coords c0:c1)."""
    return KGroup(
        L=g.L, c0=c0, c1=c1, W1=g.W1[a:b], W2=g.W2[a:b], TA=g.TA[a:b],
        consts=g.consts[a:b],
        scalars={k: v[a:b] for k, v in g.scalars.items()},
        sa=g.sa, sb=g.sb,
    )


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class KTables:
    """One direction's kernel tables (see ``mxu_ntt.MxuNttTables``).

    Fold scalars live per-group (``KGroup.scalars``).  ``lane``:
    "pair" = u32-pair arithmetic (62-bit moduli), "single" = one u32
    lane per value (30-bit moduli, ~3x cheaper folds; requires
    4q < 2^30, the reference's own 30-bit REDC precondition,
    ``mont_cuda_kernel.cuh:11-60``).
    """

    groups: tuple
    P1: int
    P2: int
    swap: bool
    lane: str = "pair"

    def tree_flatten(self):
        return (self.groups,), (self.P1, self.P2, self.swap, self.lane)

    @classmethod
    def tree_unflatten(cls, aux, children):
        P1, P2, swap, lane = aux
        (groups,) = children
        return cls(groups, P1, P2, swap, lane)

    def __getitem__(self, sl: slice):
        """Static channel slice (level views), like MxuNttTables."""
        start = sl.start or 0
        stop = sl.stop
        groups = []
        for g in self.groups:
            lo = max(g.c0, start)
            hi = g.c1 if stop is None else min(g.c1, stop)
            if hi <= lo:
                continue
            groups.append(_gslice(g, lo - g.c0, hi - g.c0,
                                  lo - start, hi - start))
        return KTables(tuple(groups), self.P1, self.P2, self.swap,
                       self.lane)

    def skip_range(self, lo: int, hi: int):
        """View that EXCLUDES channels [lo, hi), keeping ORIGINAL channel
        coordinates: group (c0, c1) still index the full channel space, so
        ``_apply`` slices inputs/keys/accum of the full shape and the
        kernel transforms only the kept rows.  With an accumulator the
        skipped rows pass through from it unchanged (``_apply``'s
        gap fill) — the keyswitch in-part shortcut: a part's own rows of
        the extension equal the input polynomial, whose NTT the caller
        already has (reference basis extension, ``ckks_engine.py:906-951``,
        is the identity on the part's own channels)."""
        groups = []
        for g in self.groups:
            for a, b in ((g.c0, min(g.c1, lo)), (max(g.c0, hi), g.c1)):
                if b <= a:
                    continue
                groups.append(_gslice(g, a - g.c0, b - g.c0, a, b))
        return KTables(tuple(groups), self.P1, self.P2,
                       self.swap, self.lane)


def _shoup(w: int, q: int) -> int:
    """floor(w * 2^62 / q); fold constants satisfy w < q < 2^62."""
    return (w << 62) // q


def _shoup31(w: int, q: int) -> int:
    """floor(w * 2^31 / q) — the single-lane Shoup companion (valid for
    q < 2^30 and fold operands x < 2^31: r = w*x - floor(w'x/2^31)*q
    lands in [0, 2q) with no correction step)."""
    return (w << 31) // q


def _single_group_bound_ok(L: int, gk: int, P_max: int) -> bool:
    """Check the single-lane packing invariant: every recombination
    group's packed diagonal sum stays < 2^31.  Diagonal d of an L x L
    limb product has min(d+1, L, 2L-1-d) (i, j) pairs, each bounded by
    (2^LIMB_BITS - 1)^2 per product and P_max accumulation depth."""
    nd = 2 * L - 1
    per_pair = (2**LIMB_BITS - 1) ** 2 * P_max
    for g0 in range(0, nd, gk):
        total = 0
        for k in range(g0, min(g0 + gk, nd)):
            pairs = min(k + 1, L, nd - k)
            total += pairs * per_pair << (LIMB_BITS * (k - g0))
        if total >= 1 << 31:
            return False
    return True


def _limb_maxes(vmax: int, L: int) -> list:
    """Per-limb maxima of any value in [0, vmax]."""
    return [min(LIMB_MASK, vmax >> (LIMB_BITS * i)) for i in range(L)]


def _wred_plan(qmax: int, Lx: int, P_max: int, single: bool):
    """Packing plan for the W-side pre-reduction scheme: returns
    (Lw, gk, k32) or None when a diagonal overflows the int32 MXU
    accumulator.  Output-limb diagonal i is bounded by
    P_max * wl[i] * sum_j xl[j] (wl/xl the per-limb maxima of values
    < q and < 2q); packed group sums must stay < 2^61 on the pair lane
    (``_shoup_mult``'s x precondition) and < 2^31 (Harvey) or < 2^32
    (k32 variant, one extra conditional subtract) on the single lane."""
    Lw = limbs_for_bits(qmax.bit_length())
    xl = _limb_maxes(2 * qmax - 1, Lx)
    wl = _limb_maxes(qmax - 1, Lw)
    sx = P_max * sum(xl)
    smax = [wl[i] * sx for i in range(Lw)]
    if max(smax) >= 1 << 31:          # int32 MXU accumulator
        return None

    def max_gk(limit):
        for gk in range(Lw, 0, -1):
            if all(
                sum(smax[i] << (LIMB_BITS * (i - g0))
                    for i in range(g0, min(g0 + gk, Lw))) < limit
                for g0 in range(0, Lw, gk)
            ):
                return gk
        return 0

    if not single:
        gk = max_gk(1 << 61)
        return (Lw, gk, False) if gk else None
    gk31, gk32 = max_gk(1 << 31), max_gk(1 << 32)
    if not gk32:
        return None
    # prefer Harvey's no-subtract form unless the wider pack saves groups
    if gk31 and -(-Lw // gk31) == -(-Lw // gk32):
        return (Lw, gk31, False)
    return (Lw, gk32, True)


# W-side pre-reduction table budgets, per channel.  Step A's table
# ([P1, lw*Lx*P1]) is row-blocked with the p1b stream, so only its HBM
# footprint matters; step B's ([Lx*P2, lw*P2]) must stay fully
# VMEM-resident per cell.  Groups over budget fall back to the legacy
# diagonal scheme FOR THAT STEP ONLY (e.g. logN17 62-bit forward runs
# wred-A + legacy-B: 3 folds/transform instead of 4).  Override:
# TIBERATE_WRED=0 forces legacy everywhere, =1 forces wred wherever
# the packing plan holds.
_WRED_A_BUDGET = int(6 * 2**20)
_WRED_B_BUDGET = int(6 * 2**20)


def _wred_env():
    import os

    return os.environ.get("TIBERATE_WRED")


def _step_spec(plan, table_bytes: int, budget: int, legacy: tuple):
    """Choose one step's (lw, gk, k32): the pre-reduced form when its
    packing plan exists and its table fits the budget, else legacy."""
    env = _wred_env()
    if env == "0" or plan is None:
        return legacy
    if env != "1" and table_bytes > budget:
        return legacy
    return plan


def build_tables(q, logN: int, *, logN1: int | None = None,
                 mont_R_bits: int = 62, inverse: bool = False,
                 force_L: int | None = None) -> KTables:
    """Kernel tables; twiddle math identical to ``mxu_ntt.build_tables``.

    ``mont_R_bits <= 31`` selects the single-lane layout (30-bit mode):
    fold constants are (w, w') with the 2^31-scaled Shoup companion in
    one u32 each, groups pack 2 diagonals, and the kernel runs all value
    arithmetic in one u32 lane (~3x cheaper folds than the pair path).

    ``force_L`` pins every channel's limb count (must be >= each
    channel's natural L): limb planes past a value's width are zero, so
    residues are unchanged — used by the sharded switchers, whose SPMD
    row blocks must share one static group structure across shards even
    when the moduli mix widths (``parallel/rns_sharded.py``).
    """
    N = 1 << logN
    if logN1 is None:
        # Put the LARGER factor first in the kernel grid (P1 >= P2) in
        # both directions: on-chip A/B at logN15 (ab_logn1.py, r5) the
        # (256, 128) forward runs 6.8 us/row vs 11.3 for (128, 256) —
        # and the inverse (N2, N1) layout already had the fast shape.
        # Forward and inverse grids then no longer transpose-match, so
        # fwd-layout pair operands chaining into an inverse transform
        # are merged to polynomial rows first (see ``_apply``).
        # Single-lane (30-bit) kernels measured NO win from the flip and
        # lose ~4% to that merge round trip (bench r5: 839 -> 803 ct/s),
        # so they keep the transpose-matching layout.
        big_first = mont_R_bits > 31
        logN1 = (logN + 1) // 2 if (big_first and not inverse) \
            else logN // 2
    logN2 = logN - logN1
    N1, N2 = 1 << logN1, 1 << logN2
    R_mont = 1 << mont_R_bits
    _2N = 2 * N
    q = [int(x) for x in q]
    single = mont_R_bits <= 31
    if single:
        assert all(4 * qi < (1 << 30) for qi in q), (
            "single-lane kernels need 4q < 2^30 (the 30-bit REDC "
            "precondition)")
    br1 = _br_vec(N1, logN1)
    br2 = _br_vec(N2, logN2)
    n1v = np.arange(N1, dtype=np.int64)
    n2v = np.arange(N2, dtype=np.int64)
    eW1 = (N2 * np.outer(n1v, 2 * br1 + 1).T) % _2N        # [r1, n1]
    eT = (np.outer(2 * br1 + 1, n2v)) % _2N                # [r1, n2]
    eW2 = (2 * N1 * np.outer(n2v, br2)) % _2N              # [n2, r2]

    if inverse:
        P1, P2 = N2, N1
        # Unlike mxu_ntt's REDC folds (which carry an extra R that the
        # REDC cancels), Shoup folds apply the constant verbatim:
        # "mont" keeps the values' own R factor (plain N^-1 fold),
        # "exit" also strips it (N^-1 * R^-1).
        bases = {
            "mont": [pow(N, -1, qi) for qi in q],
            "exit": [pow(N, -1, qi) * pow(R_mont, -1, qi) % qi
                     for qi in q],
        }
    else:
        P1, P2 = N1, N2
        bases = {
            "plain": [1] * len(q),
            "enter": [R_mont % qi for qi in q],
        }

    P_max = max(N1, N2)
    if force_L is not None:
        nat = [limbs_for_bits(qi.bit_length() + 1) for qi in q]
        assert all(L <= force_L for L in nat), (
            f"force_L={force_L} below a channel's natural limb count")
        # SPMD shards must agree on the FULL static structure (Lx, Lw,
        # gk, k32, scheme) even though each shard sees different q —
        # plan from the worst modulus this limb count admits.
        q_plan = (1 << (LIMB_BITS * force_L - 1)) - 1
        keys = [(force_L, q_plan)] * len(q)
    else:
        keys = [(limbs_for_bits(qi.bit_length() + 1), None) for qi in q]
    bounds = [0]
    for c in range(1, len(q)):
        if keys[c] != keys[c - 1]:
            bounds.append(c)
    bounds.append(len(q))

    groups = []
    for c0, c1 in zip(bounds[:-1], bounds[1:]):
        L, q_plan = keys[c0]
        qmax = q_plan if q_plan is not None else max(q[c0:c1])
        plan = _wred_plan(qmax, L, P_max, single)
        if plan is not None and force_L is not None:
            plan = (force_L, plan[1], plan[2])  # zero planes; uniform shards
        if single:
            lgk = 2 if _single_group_bound_ok(L, 2, P_max) else 1
        else:
            lgk = GROUP_K
        legacy = (0, lgk, False)
        Lww = plan[0] if plan else 0
        sa = _step_spec(plan, P1 * (Lww * L * P1), _WRED_A_BUDGET, legacy)
        sb = _step_spec(plan, (L * P2) * (Lww * P2), _WRED_B_BUDGET,
                        legacy)
        lwA, gkA, k32A, ndA, GA = _step_params(L, sa)
        lwB, gkB, k32B, ndB, GB = _step_params(L, sb)

        def shoup_u32(w, qi, k32):
            return ((w << 32) // qi if k32
                    else _shoup31(w, qi)) & 0xFFFFFFFF

        W1_t, W2_t, TA_t, cons_t = [], [], [], []
        for qi in q[c0:c1]:
            psi = ntt_ops.primitive_root_2N(qi, N)
            if inverse:
                psi = pow(psi, -1, qi)
            eL, eR = (eW2, eW1) if inverse else (eW1, eW2)
            eTA = eT.T if inverse else eT
            if lwA or lwB:
                # W-side limb pre-reduction (per step): per input limb j
                # the table holds (W * 2^(7j)) mod q, itself decomposed
                # into lw output-limb planes — the dots then produce
                # output limbs directly and the cross-limb carries ride
                # the MXU contraction instead of the VPU fold.
                lbL, lbR = [], []
                for j in range(L):
                    sc = pow(2, LIMB_BITS * j, qi)
                    ps_j = _power_series(psi, qi, _2N, scale=sc)
                    if lwA:
                        lbL.append(_limb_blocks(ps_j[eL], lwA))
                    if lwB:
                        lbR.append(_limb_blocks(ps_j[eR], lwB))
            ps = (None if lwA and lwB
                  else _power_series(psi, qi, _2N))
            if lwA:
                # W1: [P1, lwA*L*P1], output-limb-major column blocks,
                # each [P1, L*P1] over input limbs in natural order
                W1_t.append(np.concatenate(
                    [lbL[j][i] for i in range(lwA) for j in range(L)],
                    axis=1))
            else:
                # legacy: left limbs concatenated along columns
                # [P1, L*P1] — diagonal d's lhs is then one contiguous
                # column slice
                W1_t.append(np.concatenate(
                    list(_limb_blocks(ps[eL], L)), axis=1))
            if lwB:
                # W2: [L*P2, lwB*P2] — rows input-limb-major (matching
                # the natural-order lhs concat), columns output-limb-
                # major
                W2_t.append(np.concatenate(
                    [np.concatenate([lbR[j][i] for j in range(L)],
                                    axis=0)
                     for i in range(lwB)], axis=1))
            else:
                # legacy: right limbs stacked along rows in REVERSED
                # limb order: [L*P2, P2] — diagonal d's rhs is one
                # contiguous row slice
                rl = _limb_blocks(ps[eR], L)         # [L, P2a, P2b]
                W2_t.append(np.concatenate(list(rl)[::-1], axis=0))
            # TA fold planes per STEP-A group: w = T * 2^(7*gkA*g) mod q
            # (+ Shoup companion)
            planes = []
            for g in range(GA):
                cg = pow(2, LIMB_BITS * gkA * g, qi)
                ps_g = _power_series(psi, qi, _2N, scale=cg)
                w = ps_g[eTA]
                if single:
                    wsh = np.array(
                        [[shoup_u32(int(v), qi, k32A) for v in row]
                         for row in w],
                        dtype=np.uint32,
                    )
                    z = np.zeros_like(wsh)
                    planes.append(np.stack(
                        [w.astype(np.uint32), z, wsh, z]))
                else:
                    wsh = np.array(
                        [[_shoup(int(v), qi) for v in row] for row in w],
                        dtype=np.uint64,
                    )
                    wp = _split31_cols(w.astype(np.uint64))
                    sp = _split31_cols(wsh)
                    planes.append(np.concatenate(
                        [np.moveaxis(wp, -1, 0), np.moveaxis(sp, -1, 0)]))
            TA_t.append(np.stack(planes))            # [G, 4, Pa, Pb]
            k_redc = (R_mont * pow(R_mont, -1, qi) - 1) // qi
            if single:
                cons_t.append(np.array(
                    [qi, 0, 2 * qi, 0, k_redc, 0], dtype=np.uint32))
            else:
                cons_t.append(np.concatenate([
                    _split31_cols(np.uint64(qi)).reshape(-1),
                    _pair_cols(np.uint64(2 * qi)).reshape(-1),
                    _split31_cols(np.uint64(k_redc)).reshape(-1),
                ]))

        scal = {}
        for name, blist in bases.items():
            out = np.zeros((c1 - c0, GB, 4), dtype=np.uint32)
            for ci, qi in enumerate(q[c0:c1]):
                base = blist[c0 + ci]
                for g in range(GB):
                    w = pow(2, LIMB_BITS * gkB * g, qi) * base % qi
                    if single:
                        out[ci, g, 0] = w
                        out[ci, g, 2] = shoup_u32(w, qi, k32B)
                    else:
                        out[ci, g, :2] = _split31_cols(np.uint64(w))
                        out[ci, g, 2:] = _split31_cols(
                            np.uint64(_shoup(w, qi)))
            scal[name] = jnp.array(out)

        groups.append(KGroup(
            L=L, c0=c0, c1=c1,
            W1=jnp.array(np.stack(W1_t)),
            W2=jnp.array(np.stack(W2_t)),
            TA=jnp.array(np.stack(TA_t)),
            consts=jnp.array(np.stack(cons_t)),
            scalars=scal,
            sa=sa, sb=sb,
        ))

    return KTables(tuple(groups), P1, P2, inverse,
                   "single" if single else "pair")

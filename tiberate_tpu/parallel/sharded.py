"""Sharded full-step builders: one jit over a complete homomorphic op.

``make_mult_step`` fuses the reference's hottest stack — rescale ->
tensor-product -> relinearize (incl. key switching, SURVEY.md §3.3) — into a
single compiled program.  Under a mesh, inputs carry NamedShardings and
GSPMD inserts the collectives: the part-sum "all-reduce realized as explicit
loops" of the reference (``ckks_engine.py:1048-1058``) becomes a psum over
the ``rns`` axis; the pinned-buffer rescaler broadcast
(``ckks_engine.py:1224-1236``) becomes an all-gather of one channel row.
"""

from tiberate_tpu.engine.ckks_engine import (
    _ccmult_tensor_core,
    _relin_core,
    _rescale_core,
)


def make_mult_step(eng, level: int = 0, pre_rescale: bool = True):
    """Returns (step_fn, example_args) computing a full cc_mult at `level`.

    step_fn(a0, a1, b0, b1, ksk_parts) -> (ct0, ct1) at level+1 (when
    pre_rescale) — a pure jittable function closing over engine params.
    """
    S = eng.ckksCfg.num_special_primes
    if pre_rescale:
        work_level = level + 1
        lp_next = eng._lp(work_level, False)
        rescale_scale = eng.params.rescale_scales[level]
        round_at = eng.params.q[level] // 2
    else:
        work_level = level
    lp_ord = eng._lp(work_level, False)
    lp_sp = eng._lp(work_level, True)
    parts = tuple(eng.params.parts[work_level])
    alloc = eng.params.parts_alloc[work_level]
    PiRs = tuple(eng.params.PiRs[work_level])

    def step(a0, a1, b0, b1, ksk_parts):
        if pre_rescale:
            a0 = _rescale_core(a0, rescale_scale, lp_next, round_at, True)
            a1 = _rescale_core(a1, rescale_scale, lp_next, round_at, True)
            b0 = _rescale_core(b0, rescale_scale, lp_next, round_at, True)
            b1 = _rescale_core(b1, rescale_scale, lp_next, round_at, True)
        d0, d1, d2 = _ccmult_tensor_core(a0, a1, b0, b1, lp_ord)
        ksk_sel = tuple(ksk_parts[g] for g in alloc)
        return _relin_core(
            d0, d1, d2, ksk_sel, parts, lp_sp, lp_ord, PiRs,
            work_level, S,
        )

    return step


def make_encdec_roundtrip(eng, level: int = 0):
    """Returns a jittable decrypt-side step for scaling tests."""
    from tiberate_tpu.engine.ckks_engine import _decrypt_double_core

    lp = eng._lp(level, False)
    C = lp.num_channels

    def step(ct0, ct1, sk):
        scaled, _ = _decrypt_double_core(
            ct0, ct1, sk, lp, eng.params.base_lp(),
            eng.params.final_scalar[level], eng._rounding_half,
            base_at=C - 1, final_round=True,
        )
        return scaled

    return step

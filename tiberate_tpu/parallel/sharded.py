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


def mult_step_params(eng, level: int = 0, pre_rescale: bool = True,
                     ksk=None):
    """The parameter pytree for :func:`make_mult_step`'s step function.

    Passed as a jit ARGUMENT (not a closure constant): closed-over arrays
    are baked into the HLO as literals, which at production ring sizes
    makes the program megabytes-to-gigabytes large (and overflows the
    remote-compile transport on tunneled TPUs).
    """
    work_level = level + 1 if pre_rescale else level
    return dict(
        rescale_scale=(
            eng.params.rescale_scales[level] if pre_rescale else None
        ),
        lp_next=eng._lp(work_level, False) if pre_rescale else None,
        lp_ord=eng._lp(work_level, False),
        lp_sp=eng._lp(work_level, True),
        parts=tuple(eng.params.parts[work_level]),
        PiRs=tuple(eng.params.PiRs[work_level]),
        inpart=eng._ksk_inpart(ksk or eng.evk, work_level),
        parts_fused=eng._ksk_parts_fused(ksk or eng.evk, work_level),
    )


def make_mult_step(eng, level: int = 0, pre_rescale: bool = True):
    """Returns step_fn(a0, a1, b0, b1, ksk_parts, prm) -> (ct0, ct1).

    ``prm`` is the :func:`mult_step_params` pytree; pass it per call so
    the tables ride as runtime buffers.  Fuses the reference's hottest
    stack: rescale -> tensor-product -> relinearize/keyswitch.
    """
    S = eng.ckksCfg.num_special_primes
    if pre_rescale:
        round_at = eng.params.q[level] // 2
    work_level = level + 1 if pre_rescale else level
    alloc = tuple(eng.params.parts_alloc[work_level])

    def step(a0, a1, b0, b1, ksk_parts, prm):
        if pre_rescale:
            rs, lpn = prm["rescale_scale"], prm["lp_next"]
            a0 = _rescale_core(a0, rs, lpn, round_at, True)
            a1 = _rescale_core(a1, rs, lpn, round_at, True)
            b0 = _rescale_core(b0, rs, lpn, round_at, True)
            b1 = _rescale_core(b1, rs, lpn, round_at, True)
        d0, d1, d2 = _ccmult_tensor_core(a0, a1, b0, b1, prm["lp_ord"])
        ksk_sel = tuple(ksk_parts[g] for g in alloc)
        return _relin_core(
            d0, d1, d2, ksk_sel, prm["parts"], prm["lp_sp"],
            prm["lp_ord"], prm["PiRs"], work_level, S,
            inpart=prm["inpart"], parts_fused=prm["parts_fused"],
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

"""RNS-channel-sharded key switching under ``shard_map``.

The explicit-collective realization of the reference's multi-GPU keyswitch
(SURVEY.md §2.2 / §3.3): where the reference stages per-part basis-extension
states through pinned host buffers to every GPU
(``ckks_engine.py:988-1046``) and sums part products with python loops
(``:1048-1058``), here the RNS-channel axis is sharded over a mesh axis and

* the state broadcast becomes ONE ``all_gather`` of the ordinary channels
  (the mixed-radix digits are computed replicated — they are tiny),
* each shard extends every part onto ITS OWN channel rows, NTTs them
  locally (the coefficient axis is unsharded, so butterflies never cross
  shards), multiplies with its shard of the ksk, and accumulates — the
  part-sum needs no collective at all,
* the successive P-division epilogue runs on a second ``all_gather``
  (it touches every channel against the special rows; it is O(S) passes
  and not worth distributing).

Collectives ride the ICI when the 'rns' axis is an intra-slice mesh axis.
Requires the ordinary and with-special channel counts to divide the axis
size (pad the prime chain or choose S accordingly).
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from tiberate_tpu.engine.ckks_engine import _pre_extend
from tiberate_tpu.ops import mont, ntt
from tiberate_tpu.ops.mont import ModPack


def _rows(arr, start, size):
    return lax.dynamic_slice_in_dim(arr, start, size, axis=0)


def _pack_rows(pack: ModPack, start, size):
    return ModPack(
        ql=_rows(pack.ql, start, size),
        qh=_rows(pack.qh, start, size),
        kl=_rows(pack.kl, start, size),
        kh=_rows(pack.kh, start, size),
        _2q=_rows(pack._2q, start, size),
    )


def make_rns_sharded_switcher(eng, level: int, mesh, axis: str = "rns"):
    """Builds ``switcher(a, ksk_parts) -> (c0, c1)`` with 'rns'-sharded
    channels; bit-identical to ``eng.create_switcher`` output.

    a: [C_ord, N] (coefficient domain, [0, q)); ksk_parts: the live parts'
    (pk0, pk1) arrays (full [P+S, N] each).  Returns ordinary [C_ord, N].
    """
    lp_ord = eng._lp(level, False)
    lp_sp = eng._lp(level, True)
    parts = tuple(eng.params.parts[level])
    alloc = eng.params.parts_alloc[level]
    PiRs = tuple(eng.params.PiRs[level])
    S = eng.params.S
    C_ord = lp_ord.num_channels
    C_sp = lp_sp.num_channels
    D = mesh.shape[axis]
    assert C_ord % D == 0 and C_sp % D == 0, (
        f"channel counts ({C_ord} ord, {C_sp} sp) must divide the "
        f"'{axis}' axis size {D}"
    )
    ro = C_ord // D
    rs = C_sp // D

    def shard_fn(a_blk, *ksk_flat):
        i = lax.axis_index(axis)
        ksk_parts = [
            (ksk_flat[2 * k], ksk_flat[2 * k + 1])
            for k in range(len(parts))
        ]

        # 1. state broadcast: gather the ordinary channels once.
        a = lax.all_gather(a_blk, axis, tiled=True)  # [C_ord, N]

        # own with-special rows of the level parameters
        sp_start = i * rs
        own_pack = _pack_rows(lp_sp.pack, sp_start, rs)
        own_psi = _rows(lp_sp.psi, sp_start, rs)
        own_Rs = _rows(lp_sp.Rs, sp_start, rs)

        d0 = None
        d1 = None
        for part, (k0_blk, k1_blk) in zip(parts, ksk_parts):
            plp = lp_ord[part.lo : part.hi]
            # 2. mixed-radix digits, replicated (alpha rows only)
            state = _pre_extend(a[part.lo : part.hi], part, plp)
            # 3. extend onto OWN channel rows, in Montgomery form
            N = state.shape[-1]
            ext = jnp.broadcast_to(state[0], (rs, N))
            ext = mont.mont_enter(ext, own_Rs, own_pack)
            for j in range(part.alpha - 1):
                Y = jnp.broadcast_to(state[j + 1], (rs, N))
                Lrow = _rows(part.L_enter[j][level:], sp_start, rs)
                Y = mont.mont_mult(Y, Lrow, own_pack)
                ext = mont.mont_add(ext, Y, own_pack)
            # 4. local NTT (coefficient axis unsharded -> no exchange)
            ext = ntt.ntt(ext, own_psi, own_pack)
            t0 = mont.mont_mult(ext, k0_blk, own_pack)
            t1 = mont.mont_mult(ext, k1_blk, own_pack)
            if d0 is None:
                d0, d1 = t0, t1
            else:
                d0 = mont.mont_add(d0, t0, own_pack)
                d1 = mont.mont_add(d1, t1, own_pack)

        # 5. epilogue on gathered rows (replicated compute, O(S) passes)
        d0 = lax.all_gather(d0, axis, tiled=True)  # [C_sp, N]
        d1 = lax.all_gather(d1, axis, tiled=True)
        d0 = ntt.intt_exit_reduce(d0, lp_sp.ipsi, lp_sp.Ninv, lp_sp.pack)
        d1 = ntt.intt_exit_reduce(d1, lp_sp.ipsi, lp_sp.Ninv, lp_sp.pack)

        N = d0.shape[-1]
        d0 = d0.at[:C_ord].set(
            mont.mont_enter(d0[:C_ord], lp_ord.Rs, lp_ord.pack)
        )
        d1 = d1.at[:C_ord].set(
            mont.mont_enter(d1[:C_ord], lp_ord.Rs, lp_ord.pack)
        )
        for P_ind in range(S):
            PiRi = PiRs[P_ind]
            for which in (0, 1):
                d = d0 if which == 0 else d1
                row = jnp.broadcast_to(d[C_sp - 1 - P_ind], (C_sp, N))
                row = row.at[:C_ord].set(
                    mont.mont_enter(row[:C_ord], lp_ord.Rs, lp_ord.pack)
                )
                d = mont.mont_sub(d, row, lp_sp.pack)
                d = mont.mont_mult(d, PiRi, lp_sp.pack)
                if which == 0:
                    d0 = d
                else:
                    d1 = d

        c0 = mont.reduce_2q(
            mont.mont_reduce(d0[:C_ord], lp_ord.pack), lp_ord.pack
        )
        c1 = mont.reduce_2q(
            mont.mont_reduce(d1[:C_ord], lp_ord.pack), lp_ord.pack
        )
        # return own ordinary rows (output sharded like the input)
        return (
            _rows(c0, i * ro, ro),
            _rows(c1, i * ro, ro),
        )

    n_parts = len(parts)
    in_specs = (P(axis, None),) + (P(axis, None),) * (2 * n_parts)
    out_specs = (P(axis, None), P(axis, None))

    sharded = shard_map(
        shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )

    def switcher(a, ksk_parts_full):
        """a: [C_ord, N]; ksk_parts_full: engine ksk .data tuple."""
        flat = []
        for g in alloc:
            k0, k1 = ksk_parts_full[g]
            flat += [k0[level:], k1[level:]]
        return sharded(a, *flat)

    return switcher

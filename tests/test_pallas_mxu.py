"""Fused Pallas MXU NTT (ops/pallas_mxu.py): residue parity vs the XLA
matmul-form path, run in interpret mode so the default (CPU) suite covers
the kernel logic.  Real-TPU numbers live in PERFORMANCE.md.

Residues mod q must match ops/mxu_ntt.py (itself oracle-tested against
ops/ntt.py) in every variant; lazy [0, 2q) representatives may differ.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiberate_tpu.ops import mxu_ntt, pallas_mxu
from tiberate_tpu.utils.primes import find_the_next_prime

pytestmark = pytest.mark.slow  # fast suite: pytest -m 'not slow'


@pytest.fixture(autouse=True)
def _fresh_compile_state():
    """Release compiled executables between tests: this module compiles
    dozens of interpret-mode pallas programs, and the accumulated XLA:CPU
    JIT state has segfaulted the process at late tests (reproduced at
    different tests across runs, always inside backend compile or the
    cache writer, r3).  Each test here compiles its own programs anyway,
    so clearing costs little."""
    jax.clear_caches()
    yield


def _primes(logN, qbits_list):
    N = 1 << logN
    q, start = [], {}
    for qb in qbits_list:
        s = start.get(qb, 2**qb - 1)
        p = find_the_next_prime(s, 2 * N, up=False)
        start[qb] = p - 2
        q.append(p)
    return q


@pytest.mark.parametrize("logN,qbits", [
    (6, [40, 40, 60]),          # mixed limb groups
    (7, [60]),
    (9, [40, 60, 60]),          # odd logN: N1 != N2
])
def test_pallas_mxu_matches_mxu_ntt(logN, qbits):
    q = _primes(logN, qbits)
    N = 1 << logN
    rng = np.random.default_rng(3)
    qcol = np.array(q, dtype=np.int64)[:, None]
    x = jnp.array(np.stack(
        [rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q]))

    fwd_o = mxu_ntt.build_tables(q, logN)
    inv_o = mxu_ntt.build_tables(q, logN, inverse=True)
    fwd_k = pallas_mxu.build_tables(q, logN)
    inv_k = pallas_mxu.build_tables(q, logN, inverse=True)

    cases = [
        (lambda a: mxu_ntt.ntt(a, fwd_o),
         lambda a: pallas_mxu.ntt(a, fwd_k, interpret=True)),
        (lambda a: mxu_ntt.ntt(a, fwd_o, enter=True),
         lambda a: pallas_mxu.ntt(a, fwd_k, enter=True, interpret=True)),
        (lambda a: mxu_ntt.intt(a, inv_o),
         lambda a: pallas_mxu.intt(a, inv_k, interpret=True)),
        (lambda a: mxu_ntt.intt(a, inv_o, epilogue="exit"),
         lambda a: pallas_mxu.intt(a, inv_k, epilogue="exit",
                                   interpret=True)),
    ]
    for fo, fk in cases:
        a = np.asarray(fo(x))
        b = np.asarray(fk(x))
        assert (b >= 0).all() and (b < 2 * qcol).all()
        np.testing.assert_array_equal(a % qcol, b % qcol)


def test_pallas_mxu_lead_dims_and_level_slice():
    logN = 6
    q = _primes(logN, [40, 40, 60, 60])
    N = 1 << logN
    qcol = np.array(q, dtype=np.int64)[:, None]
    rng = np.random.default_rng(5)
    x = jnp.array(np.stack(
        [rng.integers(0, qi, N, dtype=np.int64) for qi in q]))
    xb = jnp.stack([x, (x * 3) % jnp.asarray(qcol)])

    fwd_o = mxu_ntt.build_tables(q, logN)
    fwd_k = pallas_mxu.build_tables(q, logN)

    a = np.asarray(mxu_ntt.ntt(xb, fwd_o))
    b = np.asarray(pallas_mxu.ntt(xb, fwd_k, interpret=True))
    np.testing.assert_array_equal(a % qcol, b % qcol)

    # static channel slicing (the engine's per-level views), including a
    # slice that crosses the limb-group boundary
    for sl in (slice(0, 2), slice(1, 4), slice(2, None)):
        a = np.asarray(mxu_ntt.ntt(x[sl], fwd_o[sl]))
        b = np.asarray(pallas_mxu.ntt(x[sl], fwd_k[sl], interpret=True))
        np.testing.assert_array_equal(a % qcol[sl], b % qcol[sl])


def test_pallas_mxu_30bit_mode():
    """int32 storage / 30-bit moduli (buffer_bit_length=30)."""
    logN = 6
    N = 1 << logN
    q, start = [], 2**28 - 1
    for _ in range(3):
        p = find_the_next_prime(start, 2 * N, up=False)
        start = p - 2
        q.append(p)
    qcol = np.array(q, dtype=np.int64)[:, None]
    rng = np.random.default_rng(7)
    x = jnp.array(np.stack(
        [rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q]
    ).astype(np.int32))

    fwd_o = mxu_ntt.build_tables(q, logN, mont_R_bits=30)
    fwd_k = pallas_mxu.build_tables(q, logN, mont_R_bits=30)
    inv_o = mxu_ntt.build_tables(q, logN, mont_R_bits=30, inverse=True)
    inv_k = pallas_mxu.build_tables(q, logN, mont_R_bits=30, inverse=True)

    assert fwd_k.lane == "single" and inv_k.lane == "single"
    for fo, fk in (
        (lambda a: mxu_ntt.ntt(a, fwd_o, enter=True),
         lambda a: pallas_mxu.ntt(a, fwd_k, enter=True, interpret=True)),
        (lambda a: mxu_ntt.intt(a, inv_o, epilogue="exit"),
         lambda a: pallas_mxu.intt(a, inv_k, epilogue="exit",
                                   interpret=True)),
    ):
        a = np.asarray(fo(x))
        b = np.asarray(fk(x))
        assert b.dtype == np.int32
        np.testing.assert_array_equal(a % qcol, b % qcol)


def test_pallas_mxu_30bit_keymul_tensor():
    """Single-lane fused epilogues (keymul + accumulation, tensor
    product): bit-identical to the unfused 30-bit chains."""
    from tiberate_tpu.ops import mont

    logN = 6
    N = 1 << logN
    q, start = [], 2**28 - 1
    for _ in range(3):
        p = find_the_next_prime(start, 2 * N, up=False)
        start = p - 2
        q.append(p)
    rng = np.random.default_rng(9)

    def rand():
        return jnp.array(np.stack(
            [rng.integers(0, qi, N, dtype=np.int64) for qi in q]
        ).astype(np.int32))

    x, y0, y1 = rand(), rand(), rand()
    k0, k1 = rand(), rand()
    fwd_k = pallas_mxu.build_tables(q, logN, mont_R_bits=30)
    pack = mont.ModPack.from_q(q, R_bits=30)

    keys = tuple(pallas_mxu.key_pairs(k, fwd_k) for k in (k0, k1))
    X = pallas_mxu.ntt(x, fwd_k, enter=True, interpret=True)
    e0 = mont.mont_mult(X, k0, pack)
    e1 = mont.mont_mult(X, k1, pack)
    d0, d1 = pallas_mxu.ntt_keymul(x, fwd_k, keys, enter=True,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(d1))

    # accumulation across two "parts"
    acc = pallas_mxu.ntt_keymul(x, fwd_k, keys, enter=True,
                                interpret=True, pair_out=True)
    acc2 = pallas_mxu.ntt_keymul(y0, fwd_k, keys, enter=True,
                                 interpret=True, accum=acc, pair_out=True)
    Y = pallas_mxu.ntt(y0, fwd_k, enter=True, interpret=True)
    for i, ki in enumerate((k0, k1)):
        want = mont.mont_add(mont.mont_mult(X, ki, pack),
                             mont.mont_mult(Y, ki, pack), pack)
        got = pallas_mxu.pair_to_poly(acc2[i], fwd_k, dtype=jnp.int32)
        np.testing.assert_array_equal(
            np.asarray(want) % np.array(q)[:, None],
            np.asarray(got) % np.array(q)[:, None])

    # fused tensor product
    Y0 = pallas_mxu.ntt(y0, fwd_k, enter=True, interpret=True)
    Y1 = pallas_mxu.ntt(y1, fwd_k, enter=True, interpret=True)
    K0 = pallas_mxu.ntt(k0, fwd_k, enter=True, interpret=True)
    e0 = mont.mont_mult(X, Y0, pack)
    e1 = mont.mont_add(mont.mont_mult(X, Y1, pack),
                       mont.mont_mult(K0, Y0, pack), pack)
    e2 = mont.mont_mult(K0, Y1, pack)
    d0, d1, d2 = pallas_mxu.ntt_tensor(x, k0, y0, y1, fwd_k,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(e2), np.asarray(d2))


def test_pallas_mxu_keymul():
    """Fused forward-NTT + evk multiply: bit-identical to the unfused
    pallas ntt -> mont.mont_mult chain (same REDC on the same kernel
    output), and residue-identical to the XLA path."""
    from tiberate_tpu.ops import mont

    logN = 7
    q = _primes(logN, [40, 40, 60])
    N = 1 << logN
    qcol = np.array(q, dtype=np.int64)[:, None]
    rng = np.random.default_rng(11)
    x = jnp.array(np.stack(
        [rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q]))
    k0 = jnp.array(np.stack(
        [rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q]))
    k1 = jnp.array(np.stack(
        [rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q]))

    fwd_k = pallas_mxu.build_tables(q, logN)
    pack = mont.ModPack.from_q(q)

    kp = tuple(pallas_mxu.key_pairs(k, fwd_k) for k in (k0, k1))
    t0, t1 = pallas_mxu.ntt_keymul(x, fwd_k, kp, interpret=True)

    ref = pallas_mxu.ntt(x, fwd_k, interpret=True)
    e0 = np.asarray(mont.mont_mult(ref, k0, pack))
    e1 = np.asarray(mont.mont_mult(ref, k1, pack))
    np.testing.assert_array_equal(e0, np.asarray(t0))
    np.testing.assert_array_equal(e1, np.asarray(t1))

    # leading batch dim (the bench's vmap shape)
    xb = jnp.stack([x, (x + 1) % qcol])
    t0b, t1b = pallas_mxu.ntt_keymul(xb, fwd_k, kp, interpret=True)
    refb = pallas_mxu.ntt(xb, fwd_k, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(mont.mont_mult(refb, k0, pack)), np.asarray(t0b))

    # enter variant (encrypt/decrypt pattern: enter_ntt -> mont_mult(key))
    t0e, t1e = pallas_mxu.ntt_keymul(x, fwd_k, kp, enter=True,
                                     interpret=True)
    ref_e = pallas_mxu.ntt(x, fwd_k, enter=True, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(mont.mont_mult(ref_e, k0, pack)), np.asarray(t0e))
    np.testing.assert_array_equal(
        np.asarray(mont.mont_mult(ref_e, k1, pack)), np.asarray(t1e))

    # per-level channel slices (engine views)
    for sl in (slice(1, None), slice(2, None)):
        kps = tuple((lo[sl], hi[sl]) for lo, hi in kp)
        a0, a1 = pallas_mxu.ntt_keymul(x[sl], fwd_k[sl], kps,
                                       interpret=True)
        np.testing.assert_array_equal(e0[sl] % qcol[sl],
                                      np.asarray(a0) % qcol[sl])


def test_pallas_mxu_keymul_accum():
    """In-kernel part accumulation: chaining accum= across three 'parts'
    is bit-identical to the unfused ntt -> mont_mult -> mont_add chain."""
    from tiberate_tpu.ops import mont

    logN = 7
    q = _primes(logN, [40, 60])
    N = 1 << logN
    qcol = np.array(q, dtype=np.int64)[:, None]
    rng = np.random.default_rng(17)

    def rand():
        return jnp.array(np.stack(
            [rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q]))

    xs = [rand() for _ in range(3)]
    ks = [(rand(), rand()) for _ in range(3)]

    fwd_k = pallas_mxu.build_tables(q, logN)
    pack = mont.ModPack.from_q(q)

    # reference chain
    d0 = d1 = None
    for x, (k0, k1) in zip(xs, ks):
        ref = pallas_mxu.ntt(x, fwd_k, interpret=True)
        t0 = mont.mont_mult(ref, k0, pack)
        t1 = mont.mont_mult(ref, k1, pack)
        if d0 is None:
            d0, d1 = t0, t1
        else:
            d0 = mont.mont_add(d0, t0, pack)
            d1 = mont.mont_add(d1, t1, pack)

    # fused accumulation chain
    acc = None
    for x, (k0, k1) in zip(xs, ks):
        kp = tuple(pallas_mxu.key_pairs(k, fwd_k) for k in (k0, k1))
        acc = pallas_mxu.ntt_keymul(x, fwd_k, kp, accum=acc,
                                    pair_out=True, interpret=True)
    a0 = pallas_mxu.pair_to_poly(acc[0], fwd_k)
    a1 = pallas_mxu.pair_to_poly(acc[1], fwd_k)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(a1))

    # batched (leading dim), under jit
    xb = [jnp.stack([x, (x + 3) % qcol]) for x in xs]

    @jax.jit
    def chain(xb0, xb1, xb2):
        acc = None
        for x, (k0, k1) in zip((xb0, xb1, xb2), ks):
            kp = tuple(pallas_mxu.key_pairs(k, fwd_k) for k in (k0, k1))
            acc = pallas_mxu.ntt_keymul(x, fwd_k, kp, accum=acc,
                                        pair_out=True, interpret=True)
        return (pallas_mxu.pair_to_poly(acc[0], fwd_k),
                pallas_mxu.pair_to_poly(acc[1], fwd_k))

    b0, b1 = chain(*xb)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(b0[0]))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(b1[0]))


def test_pallas_mxu_ntt_tensor():
    """Fused tensor product: bit-identical to the unfused
    enter_ntt -> mont_mult / mont_add chain on the same kernel."""
    from tiberate_tpu.ops import mont

    logN = 7
    q = _primes(logN, [40, 60])
    N = 1 << logN
    rng = np.random.default_rng(23)

    def rand():
        return jnp.array(np.stack(
            [rng.integers(0, qi, N, dtype=np.int64) for qi in q]))

    x0, x1, y0, y1 = rand(), rand(), rand(), rand()
    fwd_k = pallas_mxu.build_tables(q, logN)
    pack = mont.ModPack.from_q(q)

    X0 = pallas_mxu.ntt(x0, fwd_k, enter=True, interpret=True)
    X1 = pallas_mxu.ntt(x1, fwd_k, enter=True, interpret=True)
    Y0 = pallas_mxu.ntt(y0, fwd_k, enter=True, interpret=True)
    Y1 = pallas_mxu.ntt(y1, fwd_k, enter=True, interpret=True)
    e0 = mont.mont_mult(X0, Y0, pack)
    e1 = mont.mont_add(mont.mont_mult(X0, Y1, pack),
                       mont.mont_mult(X1, Y0, pack), pack)
    e2 = mont.mont_mult(X1, Y1, pack)

    d0, d1, d2 = pallas_mxu.ntt_tensor(x0, x1, y0, y1, fwd_k,
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(e2), np.asarray(d2))

    # batched
    qcol = np.array(q, dtype=np.int64)[:, None]
    xb = tuple(jnp.stack([v, (v + 5) % qcol]) for v in (x0, x1, y0, y1))
    b0, b1, b2 = pallas_mxu.ntt_tensor(*xb, fwd_k, interpret=True)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(b0[0]))
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(b1[0]))
    np.testing.assert_array_equal(np.asarray(e2), np.asarray(b2[0]))


def test_engine_pmxu_parity(monkeypatch):
    """Engine with the Pallas MXU path on (incl. the fused keyswitch
    ntt_keymul) produces bit-identical ciphertexts to the radix-2 engine:
    every public op ends in a canonicalizing reduce_2q, so mod-q-identical
    math must yield equal arrays."""
    monkeypatch.setattr(pallas_mxu, "INTERPRET", True)
    from tiberate_tpu.config.toy import toy_config
    from tiberate_tpu.engine import CkksEngine

    cfg = toy_config(logN=7, num_scales=3, num_special_primes=2,
                     scale_bits=30)
    e_ref = CkksEngine(cfg, seed=31, nonce=7, use_pallas_mxu=False)
    e_pm = CkksEngine(cfg, seed=31, nonce=7, use_pallas_mxu=True)
    assert e_pm.use_pallas_mxu and not e_ref.use_pallas_mxu

    rng = np.random.default_rng(2)
    m = rng.uniform(-1, 1, e_ref.num_slots)

    ct_r = e_ref.encodecrypt(m)
    ct_p = e_pm.encodecrypt(m)
    for a, b in zip(ct_r.data, ct_p.data):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # cc_mult fast path: rescale -> tensor -> fused ntt_keymul keyswitch
    mr = e_ref.cc_mult(ct_r, ct_r)
    mp = e_pm.cc_mult(ct_p, ct_p)
    for a, b in zip(mr.data, mp.data):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    err = np.abs(e_pm.decryptcode(mp, is_real=True) - m * m).max()
    assert err < 5e-5

    # rotation: switch_key through the pair-form _ksk_args path
    rr = e_ref.rotate_single(mr, e_ref.rotk[1])
    rp = e_pm.rotate_single(mp, e_pm.rotk[1])
    for a, b in zip(rr.data, rp.data):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_pmxu_parity_30bit(monkeypatch):
    """Engine parity on the SINGLE-LANE kernel path (buffer_bit_length=30,
    int32 storage): bit-identical ciphertexts vs the radix-2 engine
    through encrypt, the fused cc_mult (tensor + keyswitch + P-division),
    and rotation."""
    monkeypatch.setattr(pallas_mxu, "INTERPRET", True)
    from tiberate_tpu.config.toy import toy_config
    from tiberate_tpu.engine import CkksEngine

    cfg = toy_config(logN=7, num_scales=3, num_special_primes=2,
                     scale_bits=21, buffer_bit_length=30)
    e_ref = CkksEngine(cfg, seed=13, nonce=3, use_pallas_mxu=False)
    e_pm = CkksEngine(cfg, seed=13, nonce=3, use_pallas_mxu=True)
    assert e_pm._lp(0, True).pmxu_fwd.lane == "single"

    rng = np.random.default_rng(6)
    m = rng.uniform(-1, 1, e_ref.num_slots)

    ct_r = e_ref.encodecrypt(m)
    ct_p = e_pm.encodecrypt(m)
    for a, b in zip(ct_r.data, ct_p.data):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    mr = e_ref.cc_mult(ct_r, ct_r)
    mp = e_pm.cc_mult(ct_p, ct_p)
    for a, b in zip(mr.data, mp.data):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    err = np.abs(e_pm.decryptcode(mp, is_real=True) - m * m).max()
    assert err < 5e-3

    rr = e_ref.rotate_single(mr, e_ref.rotk[1])
    rp = e_pm.rotate_single(mp, e_pm.rotk[1])
    for a, b in zip(rr.data, rp.data):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_mxu_skip_range_gap_fill():
    """skip_range table views transform only the kept channels; the
    skipped rows pass through from the accumulator unchanged (the
    keyswitch in-part shortcut's pallas-level contract)."""
    from tiberate_tpu.ops import mont

    logN = 6
    q = _primes(logN, [40, 40, 60, 60])
    N = 1 << logN
    C = len(q)
    rng = np.random.default_rng(17)

    def rand():
        return jnp.array(np.stack(
            [rng.integers(0, qi, N, dtype=np.int64) for qi in q]))

    x, y = rand(), rand()
    k0, k1 = rand(), rand()
    fwd = pallas_mxu.build_tables(q, logN)
    pack = mont.ModPack.from_q(q)
    keys = tuple(pallas_mxu.key_pairs(k, fwd) for k in (k0, k1))

    # seed accumulator from a full-table pass over y
    acc = pallas_mxu.ntt_keymul(y, fwd, keys, enter=True, interpret=True,
                                pair_out=True)
    ref = tuple(pallas_mxu.pair_to_poly(a, fwd) for a in acc)

    # skip channels [1, 3): those accumulator rows must pass through
    for lo, hi in ((1, 3), (0, 2), (2, 4)):
        acc_in = jax.tree_util.tree_map(lambda v: v, acc)
        out = pallas_mxu.ntt_keymul(
            x, fwd.skip_range(lo, hi), keys, enter=True, interpret=True,
            accum=acc_in, pair_out=True)
        X = pallas_mxu.ntt(x, fwd, enter=True, interpret=True)
        for i, ki in enumerate((k0, k1)):
            want = mont.mont_add(
                mont.mont_mult(X, ki, pack),
                ref[i].astype(jnp.int64), pack)
            got = pallas_mxu.pair_to_poly(out[i], fwd)
            kept = [c for c in range(C) if not lo <= c < hi]
            qcol = np.array(q, dtype=np.int64)[:, None]
            # kept rows: accumulated products; skipped rows: untouched
            np.testing.assert_array_equal(
                np.asarray(want)[kept] % qcol[kept],
                np.asarray(got)[kept] % qcol[kept])
            np.testing.assert_array_equal(
                np.asarray(ref[i])[lo:hi], np.asarray(got)[lo:hi])

    # without an accumulator, gaps must be rejected
    with pytest.raises(ValueError):
        pallas_mxu.ntt_keymul(x, fwd.skip_range(1, 3), keys, enter=True,
                              interpret=True)


def test_engine_parts_kernel_parity(monkeypatch):
    """TIBERATE_PARTS_KERNEL=1: the all-parts-in-one-kernel keyswitch
    (VMEM part-sum) is bit-identical to the radix-2 engine through the
    fused cc_mult."""
    monkeypatch.setattr(pallas_mxu, "INTERPRET", True)
    monkeypatch.setenv("TIBERATE_PARTS_KERNEL", "1")
    from tiberate_tpu.config.toy import toy_config
    from tiberate_tpu.engine import CkksEngine

    cfg = toy_config(logN=7, num_scales=3, num_special_primes=2,
                     scale_bits=30)
    e_ref = CkksEngine(cfg, seed=31, nonce=7, use_pallas_mxu=False)
    e_pm = CkksEngine(cfg, seed=31, nonce=7, use_pallas_mxu=True)

    rng = np.random.default_rng(2)
    m = rng.uniform(-1, 1, e_ref.num_slots)
    ct_r = e_ref.encodecrypt(m)
    ct_p = e_pm.encodecrypt(m)

    mr = e_ref.cc_mult(ct_r, ct_r)
    mp = e_pm.cc_mult(ct_p, ct_p)
    for a, b in zip(mr.data, mp.data):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    err = np.abs(e_pm.decryptcode(mp, is_real=True) - m * m).max()
    assert err < 5e-5

    # rotation: switch_key through the parts-fused kernel
    rr = e_ref.rotate_single(mr, e_ref.rotk[1])
    rp = e_pm.rotate_single(mp, e_pm.rotk[1])
    for a, b in zip(rr.data, rp.data):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_parts_kernel_parity_30bit(monkeypatch):
    """Parts-fused keyswitch on the single-lane (30-bit) path."""
    monkeypatch.setattr(pallas_mxu, "INTERPRET", True)
    monkeypatch.setenv("TIBERATE_PARTS_KERNEL", "1")
    from tiberate_tpu.config.toy import toy_config
    from tiberate_tpu.engine import CkksEngine

    cfg = toy_config(logN=7, num_scales=3, num_special_primes=2,
                     scale_bits=21, buffer_bit_length=30)
    e_ref = CkksEngine(cfg, seed=13, nonce=3, use_pallas_mxu=False)
    e_pm = CkksEngine(cfg, seed=13, nonce=3, use_pallas_mxu=True)

    rng = np.random.default_rng(6)
    m = rng.uniform(-1, 1, e_ref.num_slots)
    mr = e_ref.cc_mult(e_ref.encodecrypt(m), e_ref.encodecrypt(m))
    mp = e_pm.cc_mult(e_pm.encodecrypt(m), e_pm.encodecrypt(m))
    for a, b in zip(mr.data, mp.data):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("ub", [2, 4])
def test_pallas_mxu_batch_unroll(monkeypatch, ub):
    """TIBERATE_TRANSFORM_UNROLL=ub (batch-unrolled transform-only
    kernel, per-item scratch views): bit-exact vs ub=1 on both lane
    widths, including a batch not divisible by ub (falls back to ub=1)."""
    monkeypatch.setenv("TIBERATE_TRANSFORM_UNROLL", str(ub))

    def _with_unroll(fn):
        pallas_mxu._transform_unroll.cache_clear()
        try:
            return fn()
        finally:
            pallas_mxu._transform_unroll.cache_clear()

    logN = 6
    N = 1 << logN
    rng = np.random.default_rng(11)

    # 62-bit pair lane
    q = _primes(logN, [40, 60])
    qcol = np.array(q, dtype=np.int64)[:, None]
    xb = jnp.array(np.stack([
        np.stack([rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q])
        for _ in range(4)
    ]))
    fwd = pallas_mxu.build_tables(q, logN)
    inv = pallas_mxu.build_tables(q, logN, inverse=True)
    for f in (
        lambda a: pallas_mxu.ntt(a, fwd, enter=True, interpret=True),
        lambda a: pallas_mxu.intt(a, inv, epilogue="exit", interpret=True),
    ):
        base = np.asarray(f(xb))
        got = np.asarray(_with_unroll(lambda: f(xb)))
        np.testing.assert_array_equal(base, got)
        # batch % ub != 0: silently runs ub=1, still exact
        got3 = np.asarray(_with_unroll(lambda: f(xb[:3])))
        np.testing.assert_array_equal(base[:3], got3)

    # 30-bit single lane
    q30, start = [], 2**28 - 1
    for _ in range(2):
        p = find_the_next_prime(start, 2 * N, up=False)
        start = p - 2
        q30.append(p)
    x30 = jnp.array(np.stack([
        np.stack([rng.integers(0, 2 * qi, N, dtype=np.int64)
                  for qi in q30])
        for _ in range(4)
    ]).astype(np.int32))
    fwd30 = pallas_mxu.build_tables(q30, logN, mont_R_bits=30)
    base = np.asarray(pallas_mxu.ntt(x30, fwd30, enter=True,
                                     interpret=True))
    got = np.asarray(_with_unroll(
        lambda: pallas_mxu.ntt(x30, fwd30, enter=True, interpret=True)))
    np.testing.assert_array_equal(base, got)


def test_pallas_mxu_pdiv_unroll(monkeypatch):
    """TIBERATE_TRANSFORM_UNROLL=2 on the fused P-division path: the
    pdiv chain now runs inside the software-pipelined batch loop —
    bit-exact vs ub=1 on both lane widths."""
    monkeypatch.setenv("TIBERATE_TRANSFORM_UNROLL", "2")

    def _with_unroll(fn):
        pallas_mxu._transform_unroll.cache_clear()
        try:
            return fn()
        finally:
            pallas_mxu._transform_unroll.cache_clear()

    logN = 6
    N = 1 << logN
    S = 2
    B = 4
    rng = np.random.default_rng(23)

    def pdc_for(q):
        C = len(q)
        cols = np.array(
            [[int(rng.integers(1, qi)) for _ in range(1 + S)]
             for qi in q], dtype=np.uint64)
        return jnp.array(np.stack(
            [(cols & np.uint64(0xFFFFFFFF)).astype(np.uint32),
             (cols >> np.uint64(32)).astype(np.uint32)],
            axis=-1).reshape(C, -1))

    # 62-bit pair lane
    q = _primes(logN, [40, 60, 60])
    inv = pallas_mxu.build_tables(q, logN, inverse=True)
    x = jnp.array(np.stack([
        np.stack([rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q])
        for _ in range(B)
    ]))
    rows = [jnp.array(np.stack([
        rng.integers(0, q[0], N, dtype=np.int64) for _ in range(B)
    ])) for _ in range(S)]
    p0 = tuple(pallas_mxu.coef_row_pairs(r, inv) for r in rows)
    pdc = pdc_for(q)
    base = np.asarray(pallas_mxu.intt_pdiv(x, inv, p0, pdc,
                                           interpret=True))
    got = np.asarray(_with_unroll(
        lambda: pallas_mxu.intt_pdiv(x, inv, p0, pdc, interpret=True)))
    np.testing.assert_array_equal(base, got)

    # 30-bit single lane
    q30, start = [], 2**27 - 1
    for _ in range(3):
        p = find_the_next_prime(start, 2 * N, up=False)
        start = p - 2
        q30.append(p)
    inv30 = pallas_mxu.build_tables(q30, logN, mont_R_bits=30,
                                    inverse=True)
    x30 = jnp.array(np.stack([
        np.stack([rng.integers(0, 2 * qi, N, dtype=np.int64)
                  for qi in q30])
        for _ in range(B)
    ]).astype(np.int32))
    rows30 = [jnp.array(np.stack([
        rng.integers(0, q30[0], N, dtype=np.int64) for _ in range(B)
    ]).astype(np.int32)) for _ in range(S)]
    p030 = tuple(pallas_mxu.coef_row_pairs(r, inv30) for r in rows30)
    pdc30 = pdc_for(q30)
    base30 = np.asarray(pallas_mxu.intt_pdiv(x30, inv30, p030, pdc30,
                                             interpret=True))
    got30 = np.asarray(_with_unroll(
        lambda: pallas_mxu.intt_pdiv(x30, inv30, p030, pdc30,
                                     interpret=True)))
    np.testing.assert_array_equal(base30, got30)


def test_pallas_mxu_under_shard_map():
    """The kernel x sharding composition a real multi-chip TPU run hits
    first (VERDICT r2 #5): pallas_mxu running INSIDE shard_map, (a)
    batch-sharded — the data-parallel serving shape — and (b)
    RNS-channel-sharded with per-shard kernel tables rebuilt from
    sharded table blocks — the reference's primary multi-GPU axis
    (``ckks_engine.py:988-1058``).  Bit-exact vs the unsharded kernel."""
    from tiberate_tpu.parallel._compat import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tiberate_tpu.ops.pallas_mxu import KGroup, KTables

    logN = 6
    N = 1 << logN
    q = _primes(logN, [40, 40, 40, 40])   # uniform limb count: one group
    qcol = np.array(q, dtype=np.int64)[:, None]
    rng = np.random.default_rng(17)
    x = jnp.array(np.stack([
        np.stack([rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q])
        for _ in range(4)
    ]))                                    # [B=4, C=4, N]
    fwd = pallas_mxu.build_tables(q, logN)
    ref = np.asarray(pallas_mxu.ntt(x, fwd, enter=True, interpret=True))

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                axis_names=("dp", "rns"))

    # (a) batch-sharded: each shard transforms its own ciphertexts
    dp = shard_map(
        lambda blk: pallas_mxu.ntt(blk, fwd, enter=True, interpret=True),
        mesh=mesh, in_specs=P("dp"), out_specs=P("dp"),
    )
    xs = jax.device_put(x, NamedSharding(mesh, P("dp")))
    got = np.asarray(jax.jit(dp)(xs))
    np.testing.assert_array_equal(ref % qcol, got % qcol)

    # (b) channel-sharded: per-shard tables arrive as sharded blocks and
    # the body rebuilds a block-local KTables (uniform L, c0=0)
    g = fwd.groups[0]
    ro = len(q) // 2
    sc = g.scalars["enter"]

    def rns_fn(blk, W1, W2, TA, consts, scal):
        gb = KGroup(L=g.L, c0=0, c1=ro, W1=W1, W2=W2, TA=TA,
                    consts=consts, scalars={"enter": scal}, sa=g.sa,
                    sb=g.sb)
        tb = KTables((gb,), fwd.P1, fwd.P2, fwd.swap, fwd.lane)
        return pallas_mxu.ntt(blk, tb, enter=True, interpret=True)

    rns = shard_map(
        rns_fn, mesh=mesh,
        in_specs=(P(None, "rns"), P("rns"), P("rns"), P("rns"), P("rns"),
                  P("rns")),
        out_specs=P(None, "rns"),
    )
    got2 = np.asarray(jax.jit(rns)(
        x, g.W1, g.W2, g.TA, g.consts, sc))
    np.testing.assert_array_equal(ref % qcol, got2 % qcol)


def test_pallas_mxu_p1_blocking(monkeypatch):
    """TIBERATE_PMXU_P1B forces the streamed row-block path (the
    logN >= 17 VMEM regime, VERDICT r2 #6): bit-exact vs the unblocked
    kernel for the plain transform, the fused keymul epilogue and the
    inverse direction, on both lane widths."""
    logN = 6
    N = 1 << logN
    rng = np.random.default_rng(23)

    q = _primes(logN, [40, 60])
    qcol = np.array(q, dtype=np.int64)[:, None]
    x = jnp.array(np.stack(
        [rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q]))
    fwd = pallas_mxu.build_tables(q, logN)
    inv = pallas_mxu.build_tables(q, logN, inverse=True)
    k = jnp.array(np.stack(
        [rng.integers(0, qi, N, dtype=np.int64) for qi in q]))
    kp = pallas_mxu.key_pairs(k, fwd)

    base_f = np.asarray(pallas_mxu.ntt(x, fwd, enter=True, interpret=True))
    base_i = np.asarray(pallas_mxu.intt(x, inv, epilogue="exit",
                                        interpret=True))
    base_k = [np.asarray(t) for t in pallas_mxu.ntt_keymul(
        x, fwd, (kp,), interpret=True)]

    monkeypatch.setenv("TIBERATE_PMXU_P1B", "4")
    got_f = np.asarray(pallas_mxu.ntt(x, fwd, enter=True, interpret=True))
    got_i = np.asarray(pallas_mxu.intt(x, inv, epilogue="exit",
                                       interpret=True))
    got_k = [np.asarray(t) for t in pallas_mxu.ntt_keymul(
        x, fwd, (kp,), interpret=True)]
    np.testing.assert_array_equal(base_f, got_f)
    np.testing.assert_array_equal(base_i, got_i)
    for a, b in zip(base_k, got_k):
        np.testing.assert_array_equal(a, b)

    # single-lane (30-bit) blocked
    monkeypatch.delenv("TIBERATE_PMXU_P1B")
    q30, start = [], 2**28 - 1
    for _ in range(2):
        p = find_the_next_prime(start, 2 * N, up=False)
        start = p - 2
        q30.append(p)
    x30 = jnp.array(np.stack(
        [rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q30]
    ).astype(np.int32))
    fwd30 = pallas_mxu.build_tables(q30, logN, mont_R_bits=30)
    base30 = np.asarray(pallas_mxu.ntt(x30, fwd30, enter=True,
                                       interpret=True))
    monkeypatch.setenv("TIBERATE_PMXU_P1B", "4")
    got30 = np.asarray(pallas_mxu.ntt(x30, fwd30, enter=True,
                                      interpret=True))
    np.testing.assert_array_equal(base30, got30)


def test_pallas_mxu_single_lane_gk_fallback():
    """Large rings force 1-diagonal recombination groups on the single
    lane (2-diagonal packs overflow u32 at accumulation depth 512,
    logN17) — exercised here via a skewed logN1 split; bit-exact vs the
    int64 oracle path."""
    logN, logN1 = 10, 1              # N1=2, N2=512 -> P_max = 512
    N = 1 << logN
    q, start = [], 2**26 - 1
    for _ in range(2):
        p = find_the_next_prime(start, 2 * N, up=False)
        start = p - 2
        q.append(p)
    qcol = np.array(q, dtype=np.int64)[:, None]
    rng = np.random.default_rng(29)
    x = jnp.array(np.stack(
        [rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q]
    ).astype(np.int32))

    fwd_o = mxu_ntt.build_tables(q, logN, logN1=logN1, mont_R_bits=30)
    fwd_k = pallas_mxu.build_tables(q, logN, logN1=logN1, mont_R_bits=30)
    g = fwd_k.groups[0]
    for spec in (g.sa, g.sb):
        if spec[0]:
            # W-side pre-reduction: Harvey packs overflow 2^31 at depth
            # 512 but the 2^32-companion form still packs 2 output limbs
            assert spec[1] == 2 and spec[2]
        else:
            assert spec[1] == 1
    a = np.asarray(mxu_ntt.ntt(x, fwd_o, enter=True))
    b = np.asarray(pallas_mxu.ntt(x, fwd_k, enter=True, interpret=True))
    np.testing.assert_array_equal(a % qcol, b % qcol)


def test_pallas_mxu_wred_vs_legacy(monkeypatch):
    """The W-side pre-reduction scheme (TIBERATE_WRED=1) and the legacy
    diagonal scheme (=0) are residue-identical on both lane widths and
    both directions — the legacy path stays the fallback for groups
    whose pre-reduced tables exceed the VMEM budget (logN17 62-bit), so
    it must keep parity."""
    logN = 8
    N = 1 << logN
    rng = np.random.default_rng(31)
    for bits, qbits in ((62, [40, 40, 60]), (30, [26, 26])):
        q = _primes(logN, qbits)
        qcol = np.array(q, dtype=np.int64)[:, None]
        dt = np.int64 if bits == 62 else np.int32
        x = jnp.array(np.stack(
            [rng.integers(0, 2 * qi, N, dtype=np.int64) for qi in q]
        ).astype(dt))
        got = {}
        for env in ("0", "1"):
            monkeypatch.setenv("TIBERATE_WRED", env)
            fwd = pallas_mxu.build_tables(q, logN, mont_R_bits=bits)
            inv = pallas_mxu.build_tables(q, logN, mont_R_bits=bits,
                                          inverse=True)
            assert all((g.sa[0] > 0) == (env == "1")
                       and (g.sb[0] > 0) == (env == "1")
                       for g in fwd.groups)
            got[env] = (
                np.asarray(pallas_mxu.ntt(x, fwd, enter=True,
                                          interpret=True)),
                np.asarray(pallas_mxu.intt(x, inv, epilogue="exit",
                                           interpret=True)),
            )
        for a, b in zip(got["0"], got["1"]):
            np.testing.assert_array_equal(a % qcol, b % qcol)

"""Seconds-cheap smoke over EVERY public pallas_mxu entry point, on both
lane widths, in interpret mode — deliberately NOT marked ``slow`` so the
fast suite (`pytest -m 'not slow'`) fails loudly if a table-schema or
signature refactor leaves any call site stale (VERDICT r4 #1: the KGroup
sa/sb rename broke nine call sites and shipped because the only coverage
lived in the slow suite).

Checks are small cross-identities, not full oracle parity (that lives in
tests/test_pallas_mxu.py):

* ntt(enter) ∘ intt(exit) == identity mod q,
* ntt_keymul with the Montgomery-one key R mod q == ntt,
* ntt_tensor products match REDC(F(x)·F(y)) computed with Python ints,
* ntt_keymul_parts with a 1-part/1-digit extension by R² mod q (the
  Montgomery enter) and the R-key == ntt(enter),
* intt_pdiv runs end-to-end and is canonical [0, q).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tiberate_tpu.ops import pallas_mxu
from tiberate_tpu.utils.primes import find_the_next_prime

LOGN = 6
N = 1 << LOGN


def _primes(qbits_list):
    q, start = [], {}
    for qb in qbits_list:
        s = start.get(qb, 2**qb - 1)
        p = find_the_next_prime(s, 2 * N, up=False)
        start[qb] = p - 2
        q.append(p)
    return q


def _rand_x(rng, q, batch=None, dtype=np.int64):
    rows = np.stack([rng.integers(0, 2 * qi, N, dtype=np.int64)
                     for qi in q])
    if batch:
        rows = np.stack([rows] * batch)
    return jnp.array(rows.astype(dtype))


@pytest.mark.parametrize("rbits,qbits,dtype", [
    (62, [40, 60], np.int64),
    (30, [28, 28], np.int32),
])
def test_smoke_all_entry_points(rbits, qbits, dtype):
    q = (_primes(qbits) if rbits == 62 else _primes30())
    qcol = np.array(q, dtype=np.int64)[:, None]
    C = len(q)
    R = 1 << rbits
    rng = np.random.default_rng(7)
    kw = {} if rbits == 62 else {"mont_R_bits": 30}
    fwd = pallas_mxu.build_tables(q, LOGN, **kw)
    inv = pallas_mxu.build_tables(q, LOGN, inverse=True, **kw)
    x = _rand_x(rng, q, dtype=dtype)

    # static config helpers never raise on real groups
    assert pallas_mxu.tensor_fits(fwd) in (True, False)
    assert pallas_mxu.parts_pad_to(fwd, amax=1) >= 1

    # --- ntt/intt roundtrip: enter then exit is the identity mod q ----
    f = pallas_mxu.ntt(x, fwd, enter=True, interpret=True)
    back = np.asarray(pallas_mxu.intt(f, inv, epilogue="exit",
                                      interpret=True))
    np.testing.assert_array_equal(np.asarray(x) % qcol, back % qcol)

    # --- ntt_keymul with the Montgomery one (k = R mod q) == ntt ------
    one = jnp.array(np.stack([[R % qi] * N for qi in q]).astype(dtype))
    kp = pallas_mxu.key_pairs(one, fwd)
    (km,) = pallas_mxu.ntt_keymul(x, fwd, (kp,), enter=True,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(f) % qcol,
                                  np.asarray(km) % qcol)

    # --- ntt_tensor vs REDC(F(x) * F(y)) ------------------------------
    y0 = _rand_x(rng, q, dtype=dtype)
    y1 = _rand_x(rng, q, dtype=dtype)
    d0, d1, d2 = pallas_mxu.ntt_tensor(x, x, y0, y1, fwd, enter=True,
                                       interpret=True)
    fx = np.asarray(f).astype(object)
    fy0 = np.asarray(pallas_mxu.ntt(y0, fwd, enter=True,
                                    interpret=True)).astype(object)
    fy1 = np.asarray(pallas_mxu.ntt(y1, fwd, enter=True,
                                    interpret=True)).astype(object)
    rinv = np.array([[pow(R, -1, qi)] for qi in q], dtype=object)
    qo = qcol.astype(object)
    np.testing.assert_array_equal((fx * fy0 * rinv) % qo,
                                  np.asarray(d0).astype(object) % qo)
    np.testing.assert_array_equal((fx * (fy0 + fy1) * rinv) % qo,
                                  np.asarray(d1).astype(object) % qo)
    np.testing.assert_array_equal((fx * fy1 * rinv) % qo,
                                  np.asarray(d2).astype(object) % qo)

    # --- ntt_keymul_parts: 1 part, 1 digit, ext by R^2 (= enter) ------
    wl = 1 if rbits == 30 else 2
    st = np.asarray(x)[0].reshape(1, 1, N).astype(dtype)  # [p=1, a=1, N]
    r2 = np.array([pow(R, 2, qi) for qi in q], dtype=np.uint64)
    if wl == 1:
        ec = r2.astype(np.uint32).reshape(1, C, 1)
    else:
        ec = np.stack([(r2 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                       (r2 >> np.uint64(32)).astype(np.uint32)],
                      axis=-1).reshape(1, C, 2)
    # the single digit row feeds every channel; expected = ntt(enter) of
    # the row broadcast across channels
    xb = jnp.array(np.broadcast_to(np.asarray(x)[0], (C, N)).astype(dtype))
    fexp = np.asarray(pallas_mxu.ntt(xb, fwd, enter=True, interpret=True))
    kpp = tuple(p[None] for p in kp)          # part-stacked [1, C, P1, P2]
    (acc,) = pallas_mxu.ntt_keymul_parts(
        jnp.array(st), jnp.array(ec), fwd, ((kpp),), interpret=True)
    got = np.asarray(pallas_mxu.pair_to_poly(acc, fwd))
    np.testing.assert_array_equal(fexp % qcol, got % qcol)

    # --- intt_pdiv end-to-end, canonical output -----------------------
    S = 1
    rows = [jnp.array(rng.integers(0, q[0], N, dtype=np.int64)
                      .astype(dtype))]
    p0 = tuple(pallas_mxu.coef_row_pairs(r, inv) for r in rows)
    # Shoup-quad division constants (the CkksParams.pdq layout): each
    # constant as (w, w') on the single lane or 31-splits of
    # (w, floor(w * 2^62 / q)) on the pair lane
    M31 = (1 << 31) - 1
    pdc_rows = []
    for qi in q:
        row = []
        for _ in range(1 + S):
            w = int(rng.integers(1, qi))
            if rbits <= 31:
                row += [w, (w << 31) // qi]
            else:
                s = (w << 62) // qi
                row += [w & M31, w >> 31, s & M31, s >> 31]
        pdc_rows.append(row)
    pdc = jnp.array(np.array(pdc_rows, dtype=np.uint32))
    out = np.asarray(pallas_mxu.intt_pdiv(x, inv, p0, pdc,
                                          interpret=True))
    assert (out >= 0).all() and (out < qcol).all()


def _primes30():
    q, start = [], 2**28 - 1
    for _ in range(2):
        p = find_the_next_prime(start, 2 * N, up=False)
        start = p - 2
        q.append(p)
    return q

"""Headline benchmark: cc_mult (incl. rescale + relinearize/key-switch)
ciphertexts/second on one chip, logN=15 default preset.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured throughput over a single-chip compute-aware
roofline — max(HBM, MXU, VPU) lower bound for the implemented algorithm
(the reference publishes no numbers — BASELINE.md targets ">=90% of
roofline"), so 1.0 == speed-of-light for this algorithm on this chip.
"""

import json
import os
import sys
import time


def _roofline_ct_per_s(eng, work_level, hbm_gbps=819.0,
                       mxu_int8_macs=197e12, vpu_ops=3.85e12):
    """Compute-aware roofline for one fused cc_mult: the per-ct time is
    bounded below by max(HBM, MXU, VPU) over the work the implemented
    algorithm provably performs.

    * HBM: unavoidable traffic under perfect fusion (read + write of each
      [C, N] int64 operand once per pass).
    * MXU: the 4-step NTT's int8 limb matmuls — per transformed row with
      L limbs, L^2 * P1*P2*(P1+P2) MACs (v5e int8 peak ~197 T-MAC/s,
      measured 98% reachable by these shapes, see PERFORMANCE.md).
    * VPU: the modular recombination after each matmul step — per element
      and step, G Shoup constant-multiplies on u32 pairs (~190 vector ops
      each incl. diagonal packing) — plus limb extraction (v5e VPU
      ~3.85 T-op/s: 4 ALUs x (8,128) lanes x 0.94 GHz).

    Transform row counts mirror the fused step (in-part keyswitch
    shortcut included): 4C fwd (tensor) + 3C inv (relinearize) +
    sum_p (C_sp - alpha_p) fwd (keyswitch parts) + 2*C_sp inv (P-division
    epilogue).
    """
    from tiberate_tpu.ops.mxu_ntt import GROUP_K, limbs_for_bits

    prm = eng.params
    N = prm.N
    P = prm.P
    lvl = work_level
    q_ord = list(prm.q[lvl:P])
    q_sp = q_ord + list(prm.q[P:])
    parts = prm.parts[lvl]
    C, C_sp = len(q_ord), len(q_sp)
    P1 = 1 << ((N.bit_length() - 1) // 2)   # logN1 = logN // 2
    P2 = N // P1

    # single-lane (30-bit) kernels fold in one u32 lane: ~45 vector ops
    # per group Shoup vs ~190 on the u32-pair path, groups of 2 diagonals
    single = eng.ckksCfg.buffer_bit_length <= 31
    gk = 2 if single else GROUP_K
    ops_per_fold = 45 if single else 190

    def row_cost(qi):
        L = limbs_for_bits(qi.bit_length() + 1)
        G = -(-(2 * L - 1) // gk)
        mxu = L * L * P1 * P2 * (P1 + P2)          # int8 MACs
        vpu = N * (2 * G * ops_per_fold + 6 * L)   # u32 vector ops
        return mxu, vpu

    # per-pass row multiset: (q value, number of passes over that row)
    passes = [(qi, 4 + 3) for qi in q_ord]          # tensor fwd + relin inv
    for p in parts:
        skip = set(range(p.lo, p.hi))
        passes += [(qi, 1) for j, qi in enumerate(q_sp) if j not in skip]
    passes += [(qi, 2) for qi in q_sp]              # P-division epilogue inv

    mxu = vpu = 0
    for qi, n in passes:
        m, v = row_cost(qi)
        mxu += n * m
        vpu += n * v

    num_parts = len(parts)
    hbm_bytes = 8 * N * (
        4 * 2 * C                 # rescale x4
        + 7 * 2 * C               # tensor + relinearize transforms
        + num_parts * 6 * C_sp    # keyswitch parts
        + 6 * C_sp                # P-division + epilogue
    )
    t = max(hbm_bytes / (hbm_gbps * 1e9), mxu / mxu_int8_macs,
            vpu / vpu_ops)
    return 1.0 / t, {
        "hbm_ms": round(hbm_bytes / (hbm_gbps * 1e6), 3),
        "mxu_ms": round(mxu / mxu_int8_macs * 1e3, 3),
        "vpu_ms": round(vpu / vpu_ops * 1e3, 3),
    }


def _ntt_bench(eng, preset, iters, batch, emit=True):
    """Forward-NTT throughput (the BASELINE's dedicated NTT row) against
    the same compute-aware roofline, one level-0 [C, N] polynomial batch
    per step.  Runs in the default suite for logN17 (the ring size whose
    62-bit step exceeds single-chip HBM) and under
    TIBERATE_BENCH_KIND=ntt for any pinned preset."""
    import time

    import numpy as np

    import jax
    import jax.numpy as jnp

    from tiberate_tpu.engine import ckks_engine as E
    from tiberate_tpu.ops.mxu_ntt import GROUP_K, limbs_for_bits

    lp = eng.params.lp(0, False)
    C = lp.num_channels
    N = eng.params.N
    rng = np.random.default_rng(3)
    q = np.array(eng.params.q[: eng.params.P])
    x = jnp.stack([
        jnp.asarray(rng.integers(0, q[:, None], (C, N)),
                    dtype=jnp.int64 if eng.params.dtype == np.int64
                    else jnp.int32)
        for _ in range(batch)
    ])
    # lp rides as an ARGUMENT: closed over, its tables would be baked
    # into the HLO as literals (hundreds of MB at logN17 — overflows the
    # tunneled remote-compile transport with HTTP 413)
    f = jax.jit(jax.vmap(E._enter_ntt, in_axes=(0, None)))
    out = f(x, lp)
    np.asarray(out[0, 0, :4])
    ts = []
    for it in (iters, 3 * iters):
        t0 = time.perf_counter()
        for _ in range(it):
            out = f(x, lp)
        np.asarray(out[0, 0, :4])
        ts.append(time.perf_counter() - t0)
    dt = (ts[1] - ts[0]) / (2 * iters) / batch   # per [C, N] transform

    single = eng.ckksCfg.buffer_bit_length <= 31
    gk = 2 if single else GROUP_K
    fold = 45 if single else 190
    P1 = 1 << ((N.bit_length() - 1) // 2)
    P2 = N // P1
    mxu = vpu = 0
    for qi in eng.params.q[: eng.params.P]:
        L = limbs_for_bits(int(qi).bit_length() + 1)
        G = -(-(2 * L - 1) // gk)
        mxu += L * L * P1 * P2 * (P1 + P2)
        vpu += N * (2 * G * fold + 6 * L)
    t_roof = max(mxu / 197e12, vpu / 3.85e12,
                 2 * 8 * C * N / 819e9)
    value = 1.0 / dt
    rec = {
        "metric": f"enter_ntt_{preset}_transforms_per_s",
        "value": round(value, 1),
        "unit": "transforms/s",
        "vs_baseline": round(t_roof / dt, 4),
        "extra": {
            "latency_ms": round(dt * 1e3, 4),
            "channels": C,
            "batch": batch,
            "roofline_ms": round(t_roof * 1e3, 4),
        },
    }
    if emit:
        print(json.dumps(rec), flush=True)
    return rec


def _build_engine(preset):
    from tiberate_tpu.engine import CkksEngine

    if preset == "toy":
        from tiberate_tpu.config.toy import toy_config

        cfg = toy_config(logN=8, num_scales=4, num_special_primes=2,
                         scale_bits=30)
        eng = CkksEngine(cfg, seed=7)
    else:
        # "_30"-suffixed presets (e.g. logN15_30) parse to the 30-bit
        # buffer-mode twin via CkksConfig.parse_30bit
        eng = CkksEngine(preset, seed=7)
    return eng


def _run_cc_mult(eng, preset, iters, batch):
    """Measure the fused cc_mult step; returns the bench record dict."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from tiberate_tpu.parallel.sharded import make_mult_step, mult_step_params

    rng = np.random.default_rng(7)
    ms1 = [rng.uniform(-1, 1, eng.num_slots) for _ in range(batch)]
    ms2 = [rng.uniform(-1, 1, eng.num_slots) for _ in range(batch)]
    m1, m2 = ms1[0], ms2[0]
    cts1 = [eng.encodecrypt(m) for m in ms1]
    cts2 = [eng.encodecrypt(m) for m in ms2]
    # Device form: pair-split evk rows on the Pallas MXU path (fused
    # keyswitch ntt_keymul), plain int64 rows otherwise.
    evk_parts = tuple(eng._ksk_device(eng.evk))

    # Throughput mode: a batch of DISTINCT independent ciphertext multiplies
    # in one compiled program (the serving shape; saturates the VPU).
    step = make_mult_step(eng, level=0, pre_rescale=True)
    prm = mult_step_params(eng, level=0, pre_rescale=True)
    batched = jax.jit(jax.vmap(step, in_axes=(0, 0, 0, 0, None, None)))
    args = tuple(
        jnp.stack([ct.data[i] for ct in cts])
        for cts, i in ((cts1, 0), (cts1, 1), (cts2, 0), (cts2, 1))
    )

    out = batched(*args, evk_parts, prm)
    np.asarray(out[0][0, 0, :4])  # compile + warmup (host fetch = real sync)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = batched(*args, evk_parts, prm)
    np.asarray(out[0][0, 0, :4])  # host fetch forces a real device sync
    dt = (time.perf_counter() - t0) / iters / batch  # per ciphertext

    # correctness alongside latency, like the reference bench suite
    from tiberate_tpu.typing import Ciphertext

    ct_out = Ciphertext(
        data=(out[0][0], out[1][0]), level=1, logN=eng.ckksCfg.logN,
        creator_hash=eng.hash,
    )
    err = float(
        np.abs(eng.decryptcode(ct_out, is_real=True) - m1 * m2).max()
    )

    work_level = 1
    roofline, bounds = _roofline_ct_per_s(eng, work_level)
    # Both denominators (VERDICT r2): the compute-aware roofline for the
    # implemented algorithm (primary) AND the HBM-only bound (the r1
    # denominator; no exact integer NTT can reach it, but it is
    # design-choice-free).
    hbm_roofline = 1e3 / bounds["hbm_ms"]

    value = 1.0 / dt
    return {
        "metric": f"cc_mult_{preset}_ct_per_s",
        "value": round(value, 3),
        "unit": "ciphertexts/s",
        "vs_baseline": round(value / roofline, 4),
        "extra": {
            "latency_ms_per_ct": round(dt * 1e3, 3),
            "batch": batch,
            "decrypt_max_err": err,
            "roofline_ct_per_s": round(roofline, 1),
            "roofline_hbm_ct_per_s": round(hbm_roofline, 1),
            "vs_hbm_roofline": round(value / hbm_roofline, 4),
            "roofline_bounds_ms": bounds,
            "device": str(jax.devices()[0]),
        },
    }


def _rearm_watchdog():
    import signal

    try:
        signal.alarm(int(os.environ.get("TIBERATE_BENCH_TIMEOUT", "1200")))
    except (ValueError, AttributeError):
        pass


def main():
    """One driver run, FOUR rows by default (each printed as soon as it
    is measured; the 62-bit logN15 step is the primary row and prints
    LAST so the driver's last-line parse picks it up):

    * logN15_30 step — the equal-depth 30-bit inference preset,
    * logN17 forward NTT — the large-ring transform row (the 62-bit
      step at logN17 exceeds single-chip HBM; its sharded operating
      mode is exercised by the multichip dryrun / gated tests),
    * logN17_30 step — the depth-capped 30-bit large-ring step,
    * logN15 step (primary).

    TIBERATE_BENCH_PRESET pins a single preset (profiling workflows);
    the SIGALRM watchdog re-arms per row so one wedged preset cannot
    starve the rest."""
    iters = int(os.environ.get("TIBERATE_BENCH_ITERS", "10"))
    batch = int(os.environ.get("TIBERATE_BENCH_BATCH", "8"))

    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/jax_cache_tiberate"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    pinned = os.environ.get("TIBERATE_BENCH_PRESET")
    if pinned:
        presets = [(pinned, os.environ.get("TIBERATE_BENCH_KIND", "step"))]
    else:
        presets = [("logN15_30", "step"), ("logN17", "ntt"),
                   ("logN17_30", "step"), ("logN15", "step")]

    secondary = []
    for preset, kind in presets:
        _rearm_watchdog()
        primary = preset == "logN15" and not pinned
        try:
            eng = _build_engine(preset)
            if kind == "ntt":
                _ntt_bench(eng, preset, iters, batch)
                del eng
                continue
            rec = _run_cc_mult(eng, preset, iters, batch)
            del eng
        except Exception:  # noqa: BLE001 — keep the remaining rows alive
            if primary:
                raise
            import traceback

            traceback.print_exc(file=sys.stderr)
            continue
        if primary:
            # primary row also carries the secondaries' headline numbers,
            # so a last-line-only parse still captures every operating
            # point measured in this run
            if secondary:
                rec["extra"]["secondary_rows"] = secondary
            print(json.dumps(rec), flush=True)
        else:
            secondary.append({
                "metric": rec["metric"],
                "value": rec["value"],
                "vs_baseline": rec["vs_baseline"],
            })
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    # The TPU tunnel can wedge (backend init then blocks forever); a
    # SIGALRM watchdog turns a driver-visible hang into the error JSON.
    import signal

    def _timeout(signum, frame):
        raise TimeoutError("bench timed out (TPU tunnel unresponsive?)")

    try:
        signal.signal(signal.SIGALRM, _timeout)
        signal.alarm(int(os.environ.get("TIBERATE_BENCH_TIMEOUT", "1200")))
    except (ValueError, AttributeError):
        pass  # non-main thread / platform without SIGALRM
    try:
        main()
    except Exception as e:  # noqa: BLE001 — always emit the one JSON line
        import traceback

        traceback.print_exc(file=sys.stderr)
        try:
            # second attempt (tunnel hiccups are transient); re-arm the
            # watchdog — the first alarm was consumed
            try:
                signal.alarm(
                    int(os.environ.get("TIBERATE_BENCH_TIMEOUT", "1200"))
                )
            except (ValueError, AttributeError):
                pass
            main()
        except Exception as e2:  # noqa: BLE001
            print(
                json.dumps(
                    {
                        "metric": "cc_mult_ct_per_s",
                        "value": 0,
                        "unit": "ciphertexts/s",
                        "vs_baseline": 0,
                        "extra": {"error": str(e2)[:300]},
                    }
                )
            )

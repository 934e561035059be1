"""Headline benchmark: cc_mult (incl. rescale + relinearize/key-switch)
ciphertexts/second on one chip, logN=15 default preset.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured throughput over a single-chip HBM-roofline estimate
(the reference publishes no numbers — BASELINE.md targets ">=90% of
roofline"), so 1.0 == speed-of-light.
"""

import json
import os
import sys
import time


def _roofline_ct_per_s(N, C, C_sp, num_parts, hbm_gbps=819.0):
    """Optimistic HBM-roofline for one fused cc_mult.

    Counts the unavoidable HBM traffic assuming perfect on-chip fusion of
    each NTT/elementwise chain (read + write of each [C, N] operand once
    per pass, int64 = 8 B):

      rescale x4:     4 * 2 * C * N
      4 enter_ntt + tensor product + 3 intt (relin): ~ 7 * 2 * C * N
      key switch:     per part: extend write + ntt pass + 2 ksk reads +
                      2 accum  ~ num_parts * 6 * C_sp * N
      P-division + epilogue: ~ 6 * C_sp * N
    """
    b = 8 * N * (
        4 * 2 * C
        + 7 * 2 * C
        + num_parts * 6 * C_sp
        + 6 * C_sp
    )
    return hbm_gbps * 1e9 / b


def main():
    preset = os.environ.get("TIBERATE_BENCH_PRESET", "logN15")
    iters = int(os.environ.get("TIBERATE_BENCH_ITERS", "10"))
    batch = int(os.environ.get("TIBERATE_BENCH_BATCH", "8"))

    import numpy as np

    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/jax_cache_tiberate"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tiberate_tpu.engine import CkksEngine
    from tiberate_tpu.parallel.sharded import make_mult_step, mult_step_params

    if preset == "toy":
        from tiberate_tpu.config.toy import toy_config

        cfg = toy_config(logN=8, num_scales=4, num_special_primes=2,
                         scale_bits=30)
        eng = CkksEngine(cfg, seed=7)
    else:
        eng = CkksEngine(preset, seed=7)

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

    P, S = eng.params.P, eng.params.S
    work_level = 1
    C = P - work_level
    C_sp = C + S
    num_parts = len(eng.params.parts[work_level])
    roofline = _roofline_ct_per_s(eng.params.N, C, C_sp, num_parts)

    value = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": f"cc_mult_{preset}_ct_per_s",
                "value": round(value, 3),
                "unit": "ciphertexts/s",
                "vs_baseline": round(value / roofline, 4),
                "extra": {
                    "latency_ms_per_ct": round(dt * 1e3, 3),
                    "batch": batch,
                    "decrypt_max_err": err,
                    "roofline_ct_per_s": round(roofline, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — always emit the one JSON line
        import traceback

        traceback.print_exc(file=sys.stderr)
        try:
            # second attempt (tunnel hiccups are transient)
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

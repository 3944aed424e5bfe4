"""Round-5 on-chip A/B probes: four-step FFT vs flat at large n, and
signed-digit MSM windows vs the round-4 unsigned w=8/g=8 champion.

Appends one JSON record per measurement to artifacts/tpu_probe_r5.jsonl
so partial runs still leave evidence.  Each config is oracle-checked
against the already-verified baseline implementation at the probe size
(same inputs, same result) before its timing is recorded.

Usage: python bin/tpu_probe_r5.py [--fft] [--msm] [--log-n 22]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "tpu_probe_r5.jsonl")


def emit(rec):
    rec["ts"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def probe_fft(lg_n, lg1_list):
    import jax
    import numpy as np
    from plonky_tpu.fields import TWEEDLEDEE_BASE as F
    from plonky_tpu.poly.fft import (
        FftPrecomputation, fft, fft_four_step, four_step_twiddles)

    n = 1 << lg_n
    rng = np.random.default_rng(0)
    coeffs = jax.numpy.asarray(
        rng.integers(0, 256, (F.n_digits, n), dtype=np.int32))
    pre = FftPrecomputation(F, n)
    tabs = pre.device_tables()
    flat = jax.jit(lambda c, t: fft(pre, c, tables=t))

    t0 = time.time()
    base = jax.block_until_ready(flat(coeffs, tabs))
    emit({"probe": "fft_flat", "lg_n": lg_n,
          "first_s": round(time.time() - t0, 1)})
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        base = flat(coeffs, tabs)
    jax.block_until_ready(base)
    dt = (time.time() - t0) / reps
    emit({"probe": "fft_flat", "lg_n": lg_n, "ms": round(dt * 1e3, 1),
          "butterflies_per_s": (n // 2 * lg_n) / dt})
    base_np = np.asarray(base)

    for lg1 in lg1_list:
        tw = four_step_twiddles(F, n, lg1)
        fs = jax.jit(lambda c, t: fft_four_step(F, c, t, lg1))
        t0 = time.time()
        out = jax.block_until_ready(fs(coeffs, tw))
        first = time.time() - t0
        ok = bool((np.asarray(out) == base_np).all())
        t0 = time.time()
        for _ in range(reps):
            out = fs(coeffs, tw)
        jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        emit({"probe": "fft_four_step", "lg_n": lg_n, "lg_n1": lg1,
              "first_s": round(first, 1), "ms": round(dt * 1e3, 1),
              "butterflies_per_s": (n // 2 * lg_n) / dt, "oracle_ok": ok})


def probe_msm(lg_n, configs):
    import jax
    import numpy as np
    from plonky_tpu.curves import TWEEDLEDEE as curve
    from plonky_tpu.curves import msm as cmsm, ops as cops

    n = 1 << lg_n
    # VALID curve points (a doubling chain) + host oracle: the signed path
    # negates gathered points, and group-law equivalences between different
    # add orders only hold ON the curve -- random digit tensors would
    # spuriously fail the oracle.
    import bench
    P, S, expected = bench._bench_points(curve, n)

    def host_point(out):
        from plonky_tpu.protocol.circuit import device_point_to_host
        return device_point_to_host(curve, out)

    base_fn = cmsm.msm_jit(curve, 8, 8)
    t0 = time.time()
    base = jax.block_until_ready(base_fn(P, S))
    emit({"probe": "msm_unsigned", "lg_n": lg_n, "w": 8, "g": 8,
          "first_s": round(time.time() - t0, 1),
          "oracle_ok": host_point(base) == expected})
    t0 = time.time()
    base = base_fn(P, S)
    jax.block_until_ready(base)
    dt = time.time() - t0
    emit({"probe": "msm_unsigned", "lg_n": lg_n, "w": 8, "g": 8,
          "ms": round(dt * 1e3, 1), "points_per_s": n / dt})
    eq = jax.jit(lambda a, b: cops.eq_points(curve, a, b))

    for (w, g) in configs:
        fn = cmsm.msm_jit(curve, w, g, signed=True)
        t0 = time.time()
        out = jax.block_until_ready(fn(P, S))
        first = time.time() - t0
        ok = bool(np.asarray(eq(out, base)))
        t0 = time.time()
        out = fn(P, S)
        jax.block_until_ready(out)
        dt = time.time() - t0
        emit({"probe": "msm_signed", "lg_n": lg_n, "w": w, "g": g,
              "first_s": round(first, 1), "ms": round(dt * 1e3, 1),
              "points_per_s": n / dt, "oracle_ok": ok})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fft", action="store_true")
    ap.add_argument("--msm", action="store_true")
    ap.add_argument("--log-n", type=int, default=22)
    ap.add_argument("--msm-log-n", type=int, default=18)
    ap.add_argument("--lg1", type=int, nargs="*", default=[11])
    ap.add_argument("--msm-configs", type=str, default="9:8,10:8,12:8",
                    help="comma list of w:g signed configs")
    args = ap.parse_args()

    import plonky_tpu
    plonky_tpu.enable_compilation_cache()
    from plonky_tpu.utils import install_big_stack_compile, raise_stack_limit
    raise_stack_limit()
    install_big_stack_compile()

    if args.fft:
        probe_fft(args.log_n, args.lg1)
    if args.msm:
        cfgs = [tuple(int(v) for v in tok.split(":"))
                for tok in args.msm_configs.split(",") if tok]
        probe_msm(args.msm_log_n, cfgs)


if __name__ == "__main__":
    main()

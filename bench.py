"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: MSM points/s on the real chip (the prover's dominant kernel;
BASELINE.md driver target).  Also measures FFT butterflies/s and batched
field-mul throughput; details go to stderr.

Sizes are modest by default so a cold run (compile included) stays bounded;
override with PLONKY_BENCH_LOG_MSM / PLONKY_BENCH_LOG_FFT.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    import plonky_tpu
    plonky_tpu.enable_compilation_cache()

    from plonky_tpu.curves import TWEEDLEDEE as curve, host as chost
    from plonky_tpu.curves import msm as cmsm, ops as cops
    from plonky_tpu.fields import TWEEDLEDEE_BASE as F, ops as fops
    from plonky_tpu.poly.fft import FftPrecomputation, fft

    log("devices:", jax.devices())

    # ---- field multiply throughput --------------------------------------
    lg_mul = int(os.environ.get("PLONKY_BENCH_LOG_MUL", "18"))
    n_mul = 1 << lg_mul
    rng = np.random.default_rng(0)
    a = jax.numpy.asarray(rng.integers(0, 256, (F.n_digits, n_mul), dtype=np.int32))
    b = jax.numpy.asarray(rng.integers(0, 256, (F.n_digits, n_mul), dtype=np.int32))
    def sync(arr):
        """Force completion via a tiny host readback (block_until_ready can
        return early on the experimental axon backend)."""
        np.asarray(arr[:1, :8])

    mulf = fops.jitted('mul', F)
    sync(mulf(a, b))
    t0 = time.time()
    reps = 10
    for _ in range(reps):
        r = mulf(a, b)
    sync(r)
    mul_per_s = reps * n_mul / (time.time() - t0)
    log(f"field mul: {mul_per_s:.3e} muls/s (batch 2^{lg_mul})")

    # ---- FFT -------------------------------------------------------------
    lg_fft = int(os.environ.get("PLONKY_BENCH_LOG_FFT", "14"))
    n_fft = 1 << lg_fft
    pre = FftPrecomputation(F, n_fft)
    coeffs = jax.numpy.asarray(
        rng.integers(0, 256, (F.n_digits, n_fft), dtype=np.int32))
    ff = jax.jit(lambda c: fft(pre, c))
    sync(ff(coeffs))
    t0 = time.time()
    reps = 5
    for _ in range(reps):
        r = ff(coeffs)
    sync(r)
    fft_time = (time.time() - t0) / reps
    butterflies = n_fft // 2 * lg_fft
    fl_per_s = butterflies / fft_time
    log(f"FFT 2^{lg_fft}: {fft_time*1e3:.1f} ms -> {fl_per_s:.3e} butterflies/s")

    # ---- MSM (headline) ----------------------------------------------------
    lg_msm = int(os.environ.get("PLONKY_BENCH_LOG_MSM", "12"))
    n_msm = 1 << lg_msm
    g = chost.generator(curve)
    # build points as random multiples via doubling chain (host, cheap)
    pts = []
    cur = chost.mul(g, int(rng.integers(1, 1 << 62)))
    for _ in range(n_msm):
        pts.append(cur)
        cur = chost.add(cur, cur)
    xs = fops.from_ints(curve.base, [p.x for p in pts])
    ys = fops.from_ints(curve.base, [p.y for p in pts])
    P = cops.from_affine(curve, xs, ys,
                         jax.numpy.asarray(np.zeros(n_msm, bool)))
    scalars = fops.from_ints(curve.scalar, [
        int.from_bytes(rng.bytes(40), "little") % curve.scalar.p
        for _ in range(n_msm)])
    window = int(os.environ.get("PLONKY_BENCH_MSM_WINDOW", "8"))
    msm_fn = cmsm.msm_jit(curve, window)

    def run_msm():
        """Run + force full materialization.  block_until_ready alone can
        return early on the experimental axon backend, so sync via a host
        readback of one output coordinate."""
        out = msm_fn(P, scalars)
        np.asarray(out[0])
        return out

    t0 = time.time()
    out = run_msm()
    compile_and_first = time.time() - t0
    log(f"MSM first call (incl. compile): {compile_and_first:.1f}s")
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        out = run_msm()
    msm_time = (time.time() - t0) / reps
    pts_per_s = n_msm / msm_time
    log(f"MSM 2^{lg_msm} (w={window}): {msm_time*1e3:.1f} ms -> {pts_per_s:.3e} points/s")

    # correctness spot-check vs the host oracle (catches silent garbage).
    # The bench points form a doubling chain pts[i] = 2^i * pts[0], so
    # sum_i s_i pts[i] = (sum_i s_i 2^i mod |G|) * pts[0] -- one host mul.
    x_aff, y_aff, zero = jax.jit(lambda q: cops.to_affine(curve, q))(out)
    got = chost.AffinePoint(curve, fops.to_ints(curve.base, x_aff),
                            fops.to_ints(curve.base, y_aff))
    scal_ints = fops.to_ints(curve.scalar, scalars)
    total = 0
    for i, s in enumerate(scal_ints):
        total = (total + (int(s) << i)) % curve.scalar.p
    expected = chost.mul(pts[0], total)
    assert not bool(np.asarray(zero)) and got == expected, "MSM result wrong!"
    log("MSM result verified against host oracle")

    print(json.dumps({
        "metric": f"msm_points_per_s_2e{lg_msm}",
        "value": pts_per_s,
        "unit": "points/s",
        "vs_baseline": 0.0,
        "detail": {
            "field_mul_per_s": mul_per_s,
            "fft_butterflies_per_s": fl_per_s,
            "fft_ms": fft_time * 1e3,
            "msm_ms": msm_time * 1e3,
        },
    }))


if __name__ == "__main__":
    main()

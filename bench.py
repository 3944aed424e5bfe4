"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: MSM points/s on the real chip at the largest size that finished
(the prover's dominant kernel; BASELINE.md driver target), plus FFT
butterflies/s and raw field-mul throughput.

Deadline-proof by construction:

* ONE global budget (PLONKY_BENCH_BUDGET, default 1500 s).  Every phase
  child gets a slice of the *remaining* budget, never a fixed generous
  timeout, so the harness finishes well inside the driver's window.
* Each phase runs in a SUBPROCESS that escalates sizes (2^12 -> 2^22 ...)
  and appends a JSON record to a results FILE after EVERY size that
  completes.  A child killed mid-compile loses only the size it was on.
* The parent prints the cumulative headline JSON line after every child
  (and at the end), so the last stdout line is always parseable even if
  the harness itself is killed.

Axon TPU executables are not persistently cached, so every run repays
XLA/Mosaic compiles; sizes escalate small-first so a number is on the
board within minutes.  Measured 2026-08-18: the FIRST jit dispatch on the
axon backend costs ~200 s (tunnel/backend warmup, independent of the
kernel) — so ALL phases run in ONE child process that pays the warmup
once, ordered cheapest-compile first (field -> fft -> msm).  Reference
workloads: /root/reference/benches/bls12_g1_summations.rs:8-31
(MSM 2^16-2^22), /root/reference/benches/fft.rs:10-40 (FFT).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

START = time.time()
BUDGET = float(os.environ.get("PLONKY_BENCH_BUDGET", "1500"))


def remaining() -> float:
    return BUDGET - (time.time() - START)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(arr):
    """Force completion via a tiny host readback (block_until_ready can
    return early on the experimental axon backend; full readbacks go
    through the slow tunnel)."""
    small = arr
    while hasattr(small, "ndim") and small.ndim > 0:
        small = small[:1]
    np.asarray(small)


def emit(path: str, record: dict):
    """Append one JSON record to the results file (child side)."""
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
        f.flush()
        os.fsync(f.fileno())


# ---------------------------------------------------------------------------
# Phases.  Each escalates over sizes, records after every size, and respects
# its deadline (absolute unix time) between sizes.
# ---------------------------------------------------------------------------

def child_deadline() -> float:
    return float(os.environ.get("PLONKY_BENCH_CHILD_DEADLINE", "1e18"))


def phase_field(out_path: str, sizes, deadline=None):
    import jax
    from plonky_tpu.fields import TWEEDLEDEE_BASE as F, ops as fops

    rng = np.random.default_rng(0)
    mulf = fops.jitted('mul', F)
    for lg in sizes:
        if time.time() > (deadline or child_deadline()):
            return
        n = 1 << lg
        a = jax.numpy.asarray(rng.integers(0, 256, (F.n_digits, n), dtype=np.int32))
        b = jax.numpy.asarray(rng.integers(0, 256, (F.n_digits, n), dtype=np.int32))
        sync(mulf(a, b))
        t0 = time.time()
        reps = 10
        for _ in range(reps):
            r = mulf(a, b)
        sync(r)
        rate = reps * n / (time.time() - t0)
        log(f"field mul 2^{lg}: {rate:.3e} muls/s")
        emit(out_path, {"field_mul_per_s": rate, "field_mul_log_batch": lg})


def phase_fft(out_path: str, sizes, deadline=None):
    import jax
    from plonky_tpu.fields import TWEEDLEDEE_BASE as F
    from plonky_tpu.poly.fft import FftPrecomputation, fft

    rng = np.random.default_rng(0)
    for lg in sizes:
        if time.time() > (deadline or child_deadline()):
            return
        n = 1 << lg
        pre = FftPrecomputation(F, n)
        coeffs = jax.numpy.asarray(
            rng.integers(0, 256, (F.n_digits, n), dtype=np.int32))
        ff = jax.jit(lambda c, pre=pre: fft(pre, c))
        t0 = time.time()
        sync(ff(coeffs))
        log(f"FFT 2^{lg} first call (incl. compile): {time.time()-t0:.1f}s")
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            r = ff(coeffs)
        sync(r)
        dt = (time.time() - t0) / reps
        rate = (n // 2 * lg) / dt
        log(f"FFT 2^{lg}: {dt*1e3:.1f} ms -> {rate:.3e} butterflies/s")
        emit(out_path, {"fft_butterflies_per_s": rate, "fft_ms": dt * 1e3,
                        "fft_log_n": lg})


def _bench_points(curve, n: int):
    """n projective points + scalars with a cheap host oracle.

    Points follow a doubling chain of period CHAIN (pts[i] = 2^(i%CHAIN)*P0),
    so the oracle check collapses to ONE host scalar-mul however large n is.
    """
    import jax
    from plonky_tpu.curves import host as chost, ops as cops
    from plonky_tpu.fields import ops as fops

    rng = np.random.default_rng(0)
    chain = min(n, 1 << 12)
    g = chost.generator(curve)
    p0 = chost.mul(g, int(rng.integers(1, 1 << 62)))
    pts, cur = [], p0
    for _ in range(chain):
        pts.append(cur)
        cur = chost.add(cur, cur)
    reps = n // chain
    xs_np = np.stack([curve.base.to_digits(p.x) for p in pts], axis=-1)
    ys_np = np.stack([curve.base.to_digits(p.y) for p in pts], axis=-1)
    xs = jax.numpy.asarray(np.tile(xs_np, (1, reps)))
    ys = jax.numpy.asarray(np.tile(ys_np, (1, reps)))
    P = cops.from_affine(curve, xs, ys, jax.numpy.asarray(np.zeros(n, bool)))
    scal_ints = [int.from_bytes(rng.bytes(40), "little") % curve.scalar.p
                 for _ in range(n)]
    scalars = fops.from_ints(curve.scalar, scal_ints)
    total = 0
    for i, s in enumerate(scal_ints):
        total = (total + (s << (i % chain))) % curve.scalar.p
    expected = chost.mul(p0, total)
    return P, scalars, expected


def phase_msm(out_path: str, sizes, deadline=None):
    import jax
    from plonky_tpu.curves import TWEEDLEDEE as curve, host as chost
    from plonky_tpu.curves import msm as cmsm, ops as cops
    from plonky_tpu.fields import ops as fops

    window = int(os.environ.get("PLONKY_BENCH_MSM_WINDOW", "8"))
    group = int(os.environ.get("PLONKY_BENCH_MSM_GROUP", "4"))
    msm_fn = jax.jit(lambda P, S: cmsm.msm(curve, P, S, window_bits=window,
                                           window_group=group))
    for lg in sizes:
        if time.time() > (deadline or child_deadline()):
            return
        n = 1 << lg
        P, scalars, expected = _bench_points(curve, n)
        t0 = time.time()
        out = msm_fn(P, scalars)
        sync(out[0])
        compile_s = time.time() - t0
        log(f"MSM 2^{lg} first call (incl. compile): {compile_s:.1f}s")
        t0 = time.time()
        reps = 3 if lg <= 18 else 1
        for _ in range(reps):
            out = msm_fn(P, scalars)
        sync(out[0])
        dt = (time.time() - t0) / reps
        rate = n / dt
        log(f"MSM 2^{lg} (w={window} g={group}): {dt*1e3:.1f} ms -> "
            f"{rate:.3e} points/s")
        # correctness spot-check vs the host oracle (catches silent garbage)
        x_aff, y_aff, zero = jax.jit(lambda q: cops.to_affine(curve, q))(out)
        got = chost.AffinePoint(curve, fops.to_ints(curve.base, x_aff),
                                fops.to_ints(curve.base, y_aff))
        assert not bool(np.asarray(zero)) and got == expected, \
            f"MSM 2^{lg} result wrong!"
        log("MSM result verified against host oracle")
        emit(out_path, {"msm_points_per_s": rate, "msm_ms": dt * 1e3,
                        "msm_log_n": lg, "msm_window": window,
                        "msm_group": group, "msm_compile_s": compile_s})


PHASES = {"field": phase_field, "fft": phase_fft, "msm": phase_msm}

# share of the remaining budget each phase may consume before yielding to
# the next (msm, the headline, gets everything left)
PHASE_SHARES = (("field", 0.12), ("fft", 0.35), ("msm", 1.0))


def run_child(out_path: str, sizes: dict) -> None:
    """Run ALL phases in this one process: the ~200 s axon warmup is paid
    exactly once, then phases run cheapest-compile-first, each bounded by a
    share of the remaining time so the MSM headline always gets a slot."""
    import jax
    if os.environ.get("PLONKY_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import plonky_tpu
    plonky_tpu.enable_compilation_cache()
    log("devices:", jax.devices())
    t0 = time.time()
    sync(jax.jit(lambda x: x * 2 + 1)(jax.numpy.zeros((8, 128))))
    warm = time.time() - t0
    log(f"backend warmup: {warm:.1f}s")
    emit(out_path, {"warmup_s": round(warm, 1)})
    end = child_deadline()
    for phase, share in PHASE_SHARES:
        rem = end - time.time()
        if rem < 30:
            log(f"skipping phase {phase}: {rem:.0f}s left")
            continue
        deadline = time.time() + share * rem
        t0 = time.time()
        try:
            PHASES[phase](out_path, sizes[phase], deadline)
        except Exception as e:  # a failed phase must not kill the rest
            log(f"phase {phase} FAILED: {e!r}")
            emit(out_path, {f"{phase}_error": repr(e)[:200]})
        emit(out_path, {f"{phase}_wall_s": round(time.time() - t0, 1)})


# ---------------------------------------------------------------------------
# Parent
# ---------------------------------------------------------------------------

def _headline(detail: dict) -> dict:
    if "msm_points_per_s" in detail:
        metric = f"msm_points_per_s_2e{detail['msm_log_n']}"
        value = detail["msm_points_per_s"]
        unit = "points/s"
    elif "fft_butterflies_per_s" in detail:
        metric = f"fft_butterflies_per_s_2e{detail['fft_log_n']}"
        value = detail["fft_butterflies_per_s"]
        unit = "butterflies/s"
    elif "field_mul_per_s" in detail:
        metric = f"field_mul_per_s_2e{detail['field_mul_log_batch']}"
        value = detail["field_mul_per_s"]
        unit = "muls/s"
    else:
        metric, value, unit = "bench_failed", 0.0, "n/a"
    return {"metric": metric, "value": value, "unit": unit,
            "vs_baseline": 0.0, "detail": dict(detail)}


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        sizes = {p: [int(s) for s in os.environ.get(
            f"PLONKY_BENCH_{p.upper()}_SIZES", d).split(",")]
            for p, d in (("msm", "12,14,16,18,20,22"),
                         ("fft", "14,16,18,20"),
                         ("field", "18,20"))}
        run_child(sys.argv[2], sizes)
        return

    detail = {}
    out_path = tempfile.mktemp(prefix="bench_", suffix=".jsonl")
    slice_s = max(60.0, remaining() - 20)
    env = dict(os.environ)
    env["PLONKY_BENCH_CHILD_DEADLINE"] = str(time.time() + slice_s - 15)
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", out_path],
        env=env, cwd=os.path.dirname(os.path.abspath(__file__)) or ".")

    # Poll the results file: print a cumulative headline whenever it grows,
    # so the last stdout line is always parseable even if we are killed.
    seen = 0
    while True:
        done = child.poll() is not None
        try:
            with open(out_path) as f:
                lines = f.readlines()
        except FileNotFoundError:
            lines = []
        if len(lines) > seen:
            for line in lines[seen:]:
                try:
                    detail.update(json.loads(line))
                except json.JSONDecodeError:
                    pass
            seen = len(lines)
            print(json.dumps(_headline(detail)), flush=True)
        if done:
            break
        if time.time() - START > slice_s:
            log("global budget exhausted; terminating child")
            child.terminate()
            try:
                child.wait(timeout=15)
            except subprocess.TimeoutExpired:
                child.kill()
            break
        time.sleep(5)
    try:  # pick up records written after the last poll
        with open(out_path) as f:
            for line in f.readlines()[seen:]:
                try:
                    detail.update(json.loads(line))
                except json.JSONDecodeError:
                    pass
    except FileNotFoundError:
        pass
    print(json.dumps(_headline(detail)), flush=True)


if __name__ == "__main__":
    main()

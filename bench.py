"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: MSM points/s on the real chip at the largest size that finished
(the prover's dominant kernel; BASELINE.md driver target), plus FFT
butterflies/s and raw field-mul throughput.

Deadline-proof AND stall-proof by construction:

* ONE global budget (PLONKY_BENCH_BUDGET, default 1500 s) enforced by the
  PARENT, which only polls a results file -- it never touches the device,
  so it can always print the final JSON line in time.
* ALL phases run in ONE child process (the axon backend warmup -- the
  first host readback, measured ~120 s -- is paid once), ordered
  cheapest-compile-first (field -> rescue -> fft -> blsmsm -> msm), each
  bounded by a share of the remaining budget so the MSM headline always
  gets a slot.
* The child appends a JSON record to the results file BEFORE starting any
  potentially-blocking step ("starting" markers) and AFTER every size that
  completes.  The parent watches the file: if it stops growing past the
  step's stall allowance (the axon tunnel's first readback has been
  observed to hang forever), the parent kills the child and RESTARTS it
  with the completed sizes skipped and the in-flight size blacklisted.
  A hung compile or readback therefore costs one stall allowance, not the
  whole budget.
* The parent prints the cumulative headline JSON line whenever the file
  grows and once at the end, so the last stdout line is always parseable
  even if the harness itself is killed.

Reference workloads: /root/reference/benches/bls12_g1_summations.rs:8-31
(MSM 2^16-2^22), /root/reference/benches/fft.rs:10-40 (FFT).
"""

import functools
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

START = time.time()
BUDGET = float(os.environ.get("PLONKY_BENCH_BUDGET", "1500"))
# Seconds without a new child record before the parent declares a stall.
# Must exceed the legitimate quiet-path warmup (~120 s) plus one big
# compile; a real 2^22 MSM steady-state run is well under this.
STALL_S = float(os.environ.get("PLONKY_BENCH_STALL", "420"))
# Defense in depth: if the warmup readback ever wedges this long (tunnel
# outage), fall back to measuring small sizes on CPU -- an
# honestly-labeled CPU number beats no number.
WARMUP_STALL_S = float(os.environ.get(
    "PLONKY_BENCH_WARMUP_STALL", str(min(600.0, 0.4 * BUDGET))))
MAX_RESTARTS = int(os.environ.get("PLONKY_BENCH_RESTARTS", "2"))


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
        small = small[0]      # [0], NOT [:1]: must REDUCE ndim to terminate
    np.asarray(small)


def emit(path: str, record: dict):
    """Append one JSON record to the results file (child side)."""
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")
        f.flush()
        os.fsync(f.fileno())


def _skip_tokens() -> set:
    return set(t for t in os.environ.get("PLONKY_BENCH_SKIP", "").split(",") if t)


# ---------------------------------------------------------------------------
# Phases.  Each escalates over sizes, emits a "starting" marker before the
# blocking work, records after every size, and respects its deadline
# (absolute unix time) between sizes.
# ---------------------------------------------------------------------------

def child_deadline() -> float:
    return float(os.environ.get("PLONKY_BENCH_CHILD_DEADLINE", "1e18"))


def phase_field(out_path: str, sizes, deadline=None):
    import jax
    from plonky_tpu.fields import TWEEDLEDEE_BASE as F, ops as fops

    skip = _skip_tokens()
    rng = np.random.default_rng(0)
    mulf = fops.jitted('mul', F)
    for lg in sizes:
        if time.time() > (deadline or child_deadline()):
            return
        if f"field:{lg}" in skip:
            continue
        emit(out_path, {"starting": f"field:{lg}"})
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

    skip = _skip_tokens()
    rng = np.random.default_rng(0)
    for lg in sizes:
        if time.time() > (deadline or child_deadline()):
            return
        if f"fft:{lg}" in skip:
            continue
        emit(out_path, {"starting": f"fft:{lg}"})
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

    skip = _skip_tokens()
    env_w = os.environ.get("PLONKY_BENCH_MSM_WINDOW")
    env_g = os.environ.get("PLONKY_BENCH_MSM_GROUP")

    @functools.lru_cache(maxsize=None)
    def msm_fn_for(window, group):
        return jax.jit(lambda P, S: cmsm.msm(curve, P, S, window_bits=window,
                                             window_group=group))

    for lg in sizes:
        if time.time() > (deadline or child_deadline()):
            return
        if f"msm:{lg}" in skip:
            continue
        # Pippenger window: bigger windows amortize once N >> buckets
        # (~1.5x fewer point-adds at 2^20 with w=12 vs w=8).
        window = int(env_w) if env_w else (8 if lg < 18 else 12)
        group = int(env_g) if env_g else (4 if lg < 18 else 2)
        msm_fn = msm_fn_for(window, group)
        emit(out_path, {"starting": f"msm:{lg}"})
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


def phase_rescue(out_path: str, sizes, deadline=None):
    """Rescue permutation batch (BASELINE config: hash_to_curve/rescue
    workload, reference benches/hash_to_curve.rs)."""
    import jax
    from plonky_tpu.fields import TWEEDLEDEE_BASE as F
    from plonky_tpu.hashing import rescue

    skip = _skip_tokens()
    rng = np.random.default_rng(0)
    for lg in sizes:
        if time.time() > (deadline or child_deadline()):
            return
        if f"rescue:{lg}" in skip:
            continue
        emit(out_path, {"starting": f"rescue:{lg}"})
        n = 1 << lg
        state = [jax.numpy.asarray(
            rng.integers(0, 256, (F.n_digits, n), dtype=np.int32))
            for _ in range(4)]
        fn = jax.jit(lambda s: rescue.rescue_permutation(F, s, 128))
        sync(fn(state)[0])
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            r = fn(state)
        sync(r[0])
        rate = reps * n / (time.time() - t0)
        log(f"rescue perm 2^{lg}: {rate:.3e} perms/s")
        emit(out_path, {"rescue_perms_per_s": rate, "rescue_log_batch": lg})


def phase_bls_msm(out_path: str, sizes, deadline=None):
    """BLS12-377 G1 MSM (BASELINE config; reference
    benches/bls12_g1_summations.rs) -- detail record, Tweedledee MSM stays
    the headline ladder."""
    import jax
    from plonky_tpu.curves import BLS12_377 as curve
    from plonky_tpu.curves import msm as cmsm, ops as cops
    from plonky_tpu.fields import ops as fops

    skip = _skip_tokens()
    rng = np.random.default_rng(0)
    msm_fn = jax.jit(lambda P, S: cmsm.msm(curve, P, S, window_bits=8,
                                           window_group=4))
    for lg in sizes:
        if time.time() > (deadline or child_deadline()):
            return
        if f"blsmsm:{lg}" in skip:
            continue
        emit(out_path, {"starting": f"blsmsm:{lg}"})
        n = 1 << lg
        # random digit tensors: right shapes/compute, no curve membership
        # (throughput only; the Tweedledee phase oracle-checks results)
        P = cops.from_affine(
            curve,
            jax.numpy.asarray(rng.integers(0, 256, (curve.base.n_digits, n),
                                           dtype=np.int32)),
            jax.numpy.asarray(rng.integers(0, 256, (curve.base.n_digits, n),
                                           dtype=np.int32)),
            jax.numpy.asarray(np.zeros(n, bool)))
        S = jax.numpy.asarray(rng.integers(
            0, 256, (curve.scalar.n_digits, n), dtype=np.int32))
        t0 = time.time()
        out = msm_fn(P, S)
        sync(out[0])
        log(f"BLS12-377 MSM 2^{lg} first call: {time.time()-t0:.1f}s")
        t0 = time.time()
        out = msm_fn(P, S)
        sync(out[0])
        dt = time.time() - t0
        log(f"BLS12-377 MSM 2^{lg}: {dt*1e3:.1f} ms -> {n/dt:.3e} points/s")
        emit(out_path, {"bls_msm_points_per_s": n / dt,
                        "bls_msm_log_n": lg})


PHASES = {"field": phase_field, "fft": phase_fft, "msm": phase_msm,
          "rescue": phase_rescue, "blsmsm": phase_bls_msm}

# share of the remaining budget each phase may consume before yielding to
# the next.  msm IS the headline: it runs right after the cheap detail
# phases and before blsmsm -- BLS12-377's 47-digit field makes blsmsm the
# single most expensive compile, and running it before msm was observed
# (round 3) to eat the entire headline slot.
PHASE_SHARES = (("field", 0.10), ("rescue", 0.08), ("fft", 0.30),
                ("msm", 0.85), ("blsmsm", 1.0))


def run_child(out_path: str, sizes: dict) -> None:
    """Run ALL phases in this one process: the warmup (first readback) is
    paid exactly once, then phases run cheapest-compile-first, each bounded
    by a share of the remaining time so the MSM headline always gets a
    slot."""
    import jax
    if os.environ.get("PLONKY_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import plonky_tpu
    plonky_tpu.enable_compilation_cache()
    log("devices:", jax.devices())
    emit(out_path, {"backend":
                    "cpu" if os.environ.get("PLONKY_BENCH_CPU") else "tpu"})
    emit(out_path, {"starting": "warmup"})
    t0 = time.time()
    sync(jax.jit(lambda x: x * 2 + 1)(jax.numpy.zeros((8, 128))))
    warm = time.time() - t0
    log(f"backend warmup: {warm:.1f}s")
    emit(out_path, {"warmup_s": round(warm, 1)})
    end = child_deadline()
    done_phases = _skip_tokens()
    for phase, share in PHASE_SHARES:
        if f"phase:{phase}" in done_phases:
            continue
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
        emit(out_path, {f"{phase}_done": True,
                        f"{phase}_wall_s": round(time.time() - t0, 1)})


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
    if detail.get("backend") == "cpu" and metric != "bench_failed":
        metric += "_cpu_fallback"   # NOT a TPU number; tunnel was wedged
    return {"metric": metric, "value": value, "unit": unit,
            "vs_baseline": 0.0, "detail": dict(detail)}


def _read_records(path: str):
    """Complete (newline-terminated) JSON records in the results file.
    A trailing partial line is NOT counted, so the poll loop never skips a
    record that finishes being written after this read."""
    try:
        with open(path) as f:
            raw = f.read()
    except FileNotFoundError:
        return []
    return [line for line in raw.split("\n")[:-1] if line.strip()]


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        sizes = {p: [int(s) for s in os.environ.get(
            f"PLONKY_BENCH_{p.upper()}_SIZES", d).split(",")]
            for p, d in (("msm", "16,18,20,22"),
                         ("fft", "14,16,18,20"),
                         ("field", "18,20"),
                         ("rescue", "14"),
                         ("blsmsm", "16"))}
        run_child(sys.argv[2], sizes)
        return

    detail = {}
    out_path = tempfile.mktemp(prefix="bench_", suffix=".jsonl")
    slice_s = max(60.0, remaining() - 25)
    skip = set(t for t in os.environ.get("PLONKY_BENCH_SKIP", "").split(",") if t)
    cpu_fallback = bool(os.environ.get("PLONKY_BENCH_CPU"))

    def spawn():
        env = dict(os.environ)
        env["PLONKY_BENCH_CHILD_DEADLINE"] = str(START + slice_s - 15)
        env["PLONKY_BENCH_SKIP"] = ",".join(sorted(skip))
        if cpu_fallback:
            env["PLONKY_BENCH_CPU"] = "1"
            env.setdefault("PLONKY_BENCH_MSM_SIZES", "10,12")
            env.setdefault("PLONKY_BENCH_FFT_SIZES", "12,14")
            env.setdefault("PLONKY_BENCH_FIELD_SIZES", "14,16")
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--child", out_path],
            env=env, cwd=os.path.dirname(os.path.abspath(__file__)) or ".")

    child = spawn()
    restarts = 0
    seen = 0
    in_flight = None
    completed = set()   # size tokens already measured, skipped on restart
    last_progress = time.time()

    def absorb(lines):
        """Fold new records into detail/completed; returns True if any."""
        nonlocal seen, in_flight
        new = False
        for line in lines[seen:]:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            new = True
            if "starting" in rec:
                in_flight = rec["starting"]
                continue
            for key, tok in (("field_mul_log_batch", "field"),
                             ("fft_log_n", "fft"), ("msm_log_n", "msm")):
                if key in rec:
                    completed.add(f"{tok}:{rec[key]}")
            detail.update(rec)
        seen = len(lines)
        return new

    while True:
        done = child.poll() is not None
        if absorb(_read_records(out_path)):
            last_progress = time.time()
            print(json.dumps(_headline(detail)), flush=True)
        if done:
            break
        # A stall during "warmup" is the axon claim wait (a previous
        # process's terminal lease must expire first) -- killing/restarting
        # only re-enters the same queue, so wait it out up to
        # WARMUP_STALL_S, then fall back to CPU so a number still lands.
        idle = time.time() - last_progress
        warmup_wedged = (in_flight == "warmup" and not cpu_fallback
                         and idle > WARMUP_STALL_S)
        stalled = idle > STALL_S and in_flight != "warmup"
        out_of_time = time.time() - START > slice_s
        if stalled or out_of_time or warmup_wedged:
            why = ("warmup wedged -> CPU fallback" if warmup_wedged
                   else "stalled" if stalled and not out_of_time
                   else "budget exhausted")
            log(f"{why}; terminating child (in flight: {in_flight})")
            child.terminate()
            try:
                child.wait(timeout=15)
            except subprocess.TimeoutExpired:
                child.kill()
                try:
                    child.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    pass
            if warmup_wedged and remaining() > 120:
                cpu_fallback = True
                log("respawning child on CPU (small sizes)")
                child = spawn()
                in_flight = None
                last_progress = time.time()
                continue
            if (stalled and not out_of_time and restarts < MAX_RESTARTS
                    and remaining() > 180):
                # skip everything already measured, whole phases that
                # finished, and the hung step itself
                skip.update(completed)
                for k in ("field", "fft", "msm"):
                    if f"{k}_done" in detail:
                        skip.add(f"phase:{k}")
                if in_flight and in_flight != "warmup":
                    skip.add(in_flight)
                restarts += 1
                log(f"restarting child (attempt {restarts}), skip={sorted(skip)}")
                child = spawn()
                in_flight = None
                last_progress = time.time()
                continue
            break
        time.sleep(5)
    absorb(_read_records(out_path))
    detail.pop("starting", None)
    print(json.dumps(_headline(detail)), flush=True)


if __name__ == "__main__":
    main()

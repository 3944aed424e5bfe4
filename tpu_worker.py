"""Persistent TPU worker: holds the axon claim and executes job files.

The axon tunnel grants ONE terminal claim per process and a stale claim
from an exited process blocks the next process for a long time, so all
interactive TPU experiments in a session run through this single
long-lived process.  Protocol: drop `NNN_name.py` files into
/tmp/tpu_jobs/; the worker execs them (sharing one global namespace, so
jits/caches persist across jobs) and writes stdout+traceback to
`NNN_name.out`.  Session-local tooling, not part of the framework.

IDLE TIMEOUT: the worker EXITS after IDLE_EXIT_S (default 900 s) without
a new job.  A previous round left a worker like this running forever; it
was still holding the terminal claim when the driver's end-of-round
bench ran, which wedged the bench's warmup past its stall allowance and
forced a CPU fallback.  Self-destructing on idleness guarantees the
claim is free (or at worst expiring) by the time anything after the
session needs the chip.
"""
import io
import os
import sys
import time
import traceback

JOBS = "/tmp/tpu_jobs"
IDLE_EXIT_S = float(os.environ.get("PLONKY_WORKER_IDLE_S", "900"))
os.makedirs(JOBS, exist_ok=True)

import numpy as np
from plonky_tpu.utils import raise_map_count_limit
raise_map_count_limit()
import jax
import plonky_tpu
plonky_tpu.enable_compilation_cache()


def sync(arr):
    small = arr
    while hasattr(small, "ndim") and small.ndim > 0:
        small = small[0]      # [0], NOT [:1]: must REDUCE ndim to terminate
    np.asarray(small)


GLOBALS = {"jax": jax, "np": np, "sync": sync, "time": time}

print("worker: devices", jax.devices(), flush=True)
t0 = time.time()
sync(jax.jit(lambda x: x * 2 + 1)(jax.numpy.zeros((8, 128))))
print(f"worker: warmup {time.time()-t0:.1f}s, ready", flush=True)

done = set()
last_job_t = time.time()
while True:
    jobs = sorted(f for f in os.listdir(JOBS)
                  if f.endswith(".py") and f not in done)
    # Idle = no new jobs since last_job_t.  Check AFTER scanning, and
    # reset the clock when a job finishes: a single job longer than
    # IDLE_EXIT_S used to trip this check before the queue was rescanned,
    # abandoning everything queued behind it (round-5 repro: job 100 ran
    # 49 min, worker exited with 4 jobs waiting).
    if not jobs and time.time() - last_job_t > IDLE_EXIT_S:
        print(f"worker: idle {IDLE_EXIT_S:.0f}s, exiting to free the claim",
              flush=True)
        break
    if jobs:
        last_job_t = time.time()
    for j in jobs:
        done.add(j)
        out_path = os.path.join(JOBS, j[:-3] + ".out")
        src = open(os.path.join(JOBS, j)).read()
        buf = io.StringIO()
        old = sys.stdout
        sys.stdout = buf
        t0 = time.time()
        try:
            exec(compile(src, j, "exec"), GLOBALS)
            status = "ok"
        except BaseException:
            traceback.print_exc(file=buf)
            status = "error"
        finally:
            sys.stdout = old
        with open(out_path, "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n== {status} in {time.time()-t0:.1f}s ==\n")
        print(f"worker: {j} -> {status} ({time.time()-t0:.1f}s)", flush=True)
        last_job_t = time.time()
    time.sleep(2)

"""plonky_tpu: a TPU-native recursive zk-SNARK proving framework.

A from-scratch re-design of the capabilities of the reference `plonky`
(PLONK with custom gates + Halo IPA over the Tweedledee/Tweedledum 2-cycle)
for TPU hardware: batched digit-vector field arithmetic, fold-matrix modular
reduction, branch-free complete curve formulas, dense Pippenger MSM, and
mesh-sharded FFT/MSM via jax.sharding -- orchestrated by JAX/XLA with the
sequential transcript and circuit construction on host.
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str = "/root/.cache/plonky_tpu_xla"):
    """Enable JAX's persistent compilation cache (protocol graphs are large;
    caching makes repeat runs start in seconds).

    On the CPU backend the cache directory is suffixed with a host-CPU
    fingerprint: XLA:CPU serializes AOT executables with the *compile*
    machine's feature set, and loading them on a different host computes
    garbage or SIGILLs (observed: avx512/amx entries poisoning a plainer
    host).  TPU executables are device-targeted, so they share one
    directory (note the axon backend does not persist executables at all
    -- TPU compiles are paid per process regardless).

    The CPU cache is also a STABILITY measure, not just speed: long
    processes that COLD-compile many of our largest protocol graphs
    eventually segfault inside XLA:CPU (reproduced rounds 3-4 at
    different graphs per run; per-graph stack fixes and 8 GB compile-
    thread stacks moved but never eliminated it -- some cumulative
    process state is to blame).  With a warm cache those compiles never
    run, which is why earlier rounds' full-suite runs were green.  A cold
    population run may still crash partway; rerunning continues from the
    entries already written and converges to a fully-warm cache.
    PLONKY_COMPILE_CACHE=0 disables the cache everywhere;
    JAX_COMPILATION_CACHE_DIR overrides the path.
    """
    import os

    import jax

    if os.environ.get("PLONKY_COMPILE_CACHE") == "0":
        return
    env_path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env_path:
        path = env_path
    elif jax.default_backend() != "tpu":
        import hashlib
        import platform

        try:
            with open("/proc/cpuinfo") as f:
                flags = [line for line in f if line.startswith("flags")][0]
        except (OSError, IndexError):
            flags = platform.processor()
        fp = hashlib.sha256(flags.encode()).hexdigest()[:12]
        path = f"{path}_cpu_{fp}"
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

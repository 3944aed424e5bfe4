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

    GIANT entries are excluded from cache READS on CPU
    (`_install_cache_read_cap`): `deserialize_executable` on the largest
    (>~10 MB) XLA:CPU AOT entries SIGSEGVs in long-lived processes even
    on an 8 GB fixed-stack thread (round-5 repro: full suite died at
    test 79 inside jax/_src/compilation_cache.py:238
    `get_executable_and_time`, with the read already routed through the
    big-stack worker -- so it is not stack depth; the same entry
    deserializes fine in a fresh process).  Compiling those same graphs
    on the big-stack thread is stable (round 4: zero compile crashes
    after f0b27e3), so oversized entries are simply recompiled per
    process; everything under the cap still loads from cache.
    PLONKY_CACHE_MAX_READ_MB overrides the cap (default 6).
    """
    import os

    import jax

    if os.environ.get("PLONKY_COMPILE_CACHE") == "0":
        return
    env_path = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    on_tpu = jax.default_backend() == "tpu"
    if env_path:
        path = env_path
    elif not on_tpu:
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
    if not on_tpu:
        max_mb = float(os.environ.get("PLONKY_CACHE_MAX_READ_MB", "6"))
        _install_cache_read_cap(int(max_mb * (1 << 20)))


def _install_cache_read_cap(max_bytes: int) -> None:
    """Treat persistent-cache entries larger than max_bytes as misses.

    See enable_compilation_cache's docstring: XLA:CPU's
    deserialize_executable segfaults on the giant protocol-graph entries
    once a process has aged, while compiling the same graph (on the
    big-stack worker thread) does not.  The entry is fetched once here to
    check its size; undersized entries are re-fetched by the original
    reader (disk cache hits are cheap next to a multi-MB deserialize).
    Degrades to a no-op if jax internals move.  Idempotent."""
    import warnings

    try:
        import jax._src.compilation_cache as _cc
    except ImportError:  # pragma: no cover - jax internals moved
        warnings.warn("plonky_tpu: jax._src.compilation_cache missing; "
                      "cache read cap disabled")
        return
    orig = getattr(_cc, "get_executable_and_time", None)
    getc = getattr(_cc, "_get_cache", None)
    if orig is None or getc is None:  # pragma: no cover
        warnings.warn("plonky_tpu: compilation_cache internals renamed; "
                      "cache read cap disabled")
        return
    if getattr(orig, "_plonky_read_cap", False):
        return

    def capped(cache_key, compile_options, backend, executable_devices):
        try:
            cache = getc(backend)
            if cache is not None:
                entry = cache.get(cache_key)
                if entry is not None and len(entry) > max_bytes:
                    return None, None
        except Exception:
            pass
        return orig(cache_key, compile_options, backend, executable_devices)

    capped._plonky_read_cap = True
    _cc.get_executable_and_time = capped

    # Recompiled oversized entries would be re-SERIALIZED and rewritten
    # every process (serialization of the giants is the other historical
    # SIGSEGV mode, round 3) -- skip the put when the key already exists.
    orig_put = getattr(_cc, "put_executable_and_time", None)
    if orig_put is not None and not getattr(orig_put, "_plonky_read_cap",
                                            False):
        def put_once(cache_key, module_name, executable, backend,
                     compile_time):
            try:
                cache = getc(backend)
                if cache is not None and cache.get(cache_key) is not None:
                    return
            except Exception:
                pass
            return orig_put(cache_key, module_name, executable, backend,
                            compile_time)

        put_once._plonky_read_cap = True
        _cc.put_executable_and_time = put_once

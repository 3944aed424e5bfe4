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

    TPU backend only.  On XLA:CPU the cache is unsafe twice over on this
    image's jaxlib: (a) `executable.serialize()` SEGFAULTS during the cache
    *write* for some mid-size programs (reproduced twice, rounds 3-4, both
    at a prover commit graph -- it killed the whole pytest process), and
    (b) CPU executables are AOT-compiled for the *compile* machine's
    feature set, so a cache shared across heterogeneous hosts computes
    garbage or SIGILLs (observed: avx512/amx entries poisoning a plainer
    host).  TPU executables are device-targeted and their serialization is
    exercised every round without incident, so the cache stays on there.
    PLONKY_COMPILE_CACHE=force enables it on CPU anyway (single-host dev
    loops that accept the risk); PLONKY_COMPILE_CACHE=0 disables it
    everywhere; JAX_COMPILATION_CACHE_DIR overrides the path.
    """
    import os

    import jax

    knob = os.environ.get("PLONKY_COMPILE_CACHE")
    if knob == "0":
        return
    if jax.default_backend() != "tpu" and knob != "force":
        return
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", path)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
    caching makes repeat runs start in seconds)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

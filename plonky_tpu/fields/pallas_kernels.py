"""Pallas TPU kernels for the digit-vector hot path.

TPU VPUs have no fast 32-bit integer multiply (int32 muls are emulated and
~100x slower than f32 FMAs), so the digit convolution -- the inner loop of
EVERY field multiply -- runs ~620x faster as an f32 Pallas kernel: 8-bit
digit products are <= 2^16 and row sums <= min(La,Lb)*da*db, so any
convolution whose static bound stays under 2^24 is EXACT in float32
(`F32_EXACT`).  The XLA grouped-conv formulation is kept as the generic
fallback (CPU tests, tiny/odd batches).

Replaces the reference's u64 Montgomery inner loop (reference:
src/field/monty.rs:66-107) as the framework's multiply primitive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Largest integer magnitude exactly representable in float32 accumulation.
F32_EXACT = 1 << 24

_LANE = 128

# Minimum flat batch for the Pallas paths.  Each DISTINCT kernel shape pays
# a client-side kernel trace (the in-kernel convolutions are unrolled,
# ~30k jnp ops per point formula) plus a Mosaic compile, so structures
# with many shrinking shapes (scan levels) should fall back to the compact
# XLA grouped-conv path once the batch is small -- by then it carries
# little of the work anyway.
import os as _os

_FUSION_MIN = int(_os.environ.get("PLONKY_FUSION_MIN_BATCH", "2048"))


def pallas_conv_applicable(batch_elems: int) -> bool:
    """The f32 kernel path needs a lane-aligned, reasonably large batch."""
    return batch_elems >= _FUSION_MIN and batch_elems % _LANE == 0


def _pick_tile(N: int, want: int) -> int:
    """Largest lane-multiple tile <= want that DIVIDES N.

    The pallas_call grids are `(N // tile,)`: a tile that does not divide
    N silently DROPS the remainder columns -- the kernel never writes
    them, and the caller reads back garbage.  Power-of-two batches (MSM,
    FFT ladders) always divided the default tiles, which is why every
    bench and oracle test passed while the PROVER -- whose wire batch is
    9 x n, flat N = 2304 at degree 2^8 -- computed a corrupt 9th wire
    polynomial on TPU (caught by a TPU-vs-CPU pinned-proof bisect, round
    4).  Callers guarantee N % _LANE == 0, so a valid tile always exists
    (worst case _LANE itself)."""
    assert N % _LANE == 0, (
        f"pallas field kernels require N % {_LANE} == 0, got N={N}; a "
        "non-dividing tile would silently drop the remainder columns")
    t = min(want, N)
    t -= t % _LANE
    while t > _LANE and N % t:
        t -= _LANE
    return max(t, _LANE)


@functools.lru_cache(maxsize=None)
def _conv_call(La: int, Lb: int, N: int, tile: int):
    Lout = La + Lb - 1

    def kernel(a_ref, b_ref, out_ref):
        av = a_ref[:].astype(jnp.float32)
        bv = b_ref[:].astype(jnp.float32)
        for k in range(Lout):
            lo = max(0, k - (Lb - 1))
            hi = min(La - 1, k)
            acc = av[lo] * bv[k - lo]
            for i in range(lo + 1, hi + 1):
                acc = acc + av[i] * bv[k - i]
            out_ref[k] = acc.astype(jnp.int32)

    return pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[
            pl.BlockSpec((La, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lb, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Lout, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Lout, N), jnp.int32),
    )


def conv_pallas(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Digit convolution out[k] = sum_{i+j=k} a[i] b[j] over a flat batch.

    a: [La, N], b: [Lb, N] (same N).  Caller guarantees
    min(La, Lb) * digit_bound(a) * digit_bound(b) < F32_EXACT.
    """
    La, N = a.shape
    Lb = b.shape[0]
    tile = _pick_tile(N, 2048)
    return _conv_call(La, Lb, N, tile)(a, b)


@functools.lru_cache(maxsize=None)
def _reduce_work_call(spec, L: int, digit_bound: int, value_bound_key,
                      N: int, tile: int, loose: bool = True):
    """Fused reduction kernel: the entire reduce_work loop (loose carry
    rounds, carry-lookahead, fold matmuls) runs in VMEM, eliminating the
    HBM round trips that dominate the XLA formulation.  The control flow is
    static (bound-driven python), so the kernel body just re-traces
    ops.reduce_work on in-kernel values.

    value_bound is a huge python int; cache on its BIT LENGTH (the bound
    logic only uses magnitudes, and a slightly looser bound of the same
    bit length yields the same schedule semantics)."""
    from . import ops

    value_bound = 1 << value_bound_key  # conservative: >= true bound
    D = spec.n_digits

    R = spec.fold_rows.shape[0]

    def kernel(x_ref, fold_ref, out_ref):
        out_ref[:] = ops.reduce_work(spec, x_ref[:], digit_bound,
                                     value_bound, loose=loose,
                                     _in_kernel=True,
                                     _fold_rows_arr=fold_ref[:])

    return pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=[
            pl.BlockSpec((L, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, N), jnp.int32),
    )


def reduce_work_pallas(spec, x: jnp.ndarray, digit_bound: int,
                       value_bound: int, loose: bool = True) -> jnp.ndarray:
    """Flatten the batch and run the fused reduction kernel."""
    L = x.shape[0]
    batch = x.shape[1:]
    N = 1
    for d in batch:
        N *= d
    tile = _pick_tile(N, 2048)
    vb_key = max(1, (value_bound - 1).bit_length())
    fold = jnp.asarray(spec.fold_rows)
    out = _reduce_work_call(spec, L, digit_bound, vb_key, N, tile, loose)(
        x.reshape(L, N), fold)
    return out.reshape(spec.n_digits, *batch)


# ---------------------------------------------------------------------------
# Generic composite fusion: run an arbitrary digit-vector composite (point
# add, field mul, FFT butterfly, ...) entirely in VMEM by re-tracing its
# python body inside one kernel.  The body uses the normal fops/cops
# functions; the IN_KERNEL flag makes conv/reduce_work use their in-kernel
# formulations instead of dispatching nested pallas_calls.
# ---------------------------------------------------------------------------

_IN_KERNEL = [False]


def in_kernel() -> bool:
    return _IN_KERNEL[0]


def conv_f32_unrolled(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """In-kernel digit convolution: unrolled f32 FMAs (exact under
    F32_EXACT; the caller's bound discipline guarantees this on TPU)."""
    La, Lb = a.shape[0], b.shape[0]
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    rows = []
    for k in range(La + Lb - 1):
        lo = max(0, k - (Lb - 1))
        hi = min(La - 1, k)
        acc = af[lo] * bf[k - lo]
        for i in range(lo + 1, hi + 1):
            acc = acc + af[i] * bf[k - i]
        rows.append(acc)
    return jnp.stack(rows).astype(jnp.int32)


def fused_composite(body, inputs, n_outs: int, out_len: int,
                    tile: int = 512):
    """Run `body` (list of [Li, N] int32 -> list of [out_len, N] int32)
    as one Pallas kernel, tiled over the flat batch axis N.

    All intermediates stay in VMEM; `tile` bounds the VMEM footprint
    (composite bodies like a complete point addition hold ~15 live
    [<=70, tile] buffers).  The body's array constants (fold matrices,
    complement pads, ...) are collected by a dry run and passed as extra
    kernel inputs (Pallas kernels may not capture array constants)."""
    import numpy as np

    N = inputs[0].shape[-1]
    tile = _pick_tile(N, tile)

    # Dry-run to collect the constants this body materializes.  IN_KERNEL
    # is set so the dry run traces the exact same code path as the kernel.
    collector = _ConstCollector()
    _KERNEL_CONSTS[0] = collector
    _IN_KERNEL[0] = True
    try:
        jax.eval_shape(lambda ins: body(list(ins)), tuple(inputs))
    finally:
        _IN_KERNEL[0] = False
        _KERNEL_CONSTS[0] = None
    const_names = list(collector.factories)
    const_raw = [jnp.asarray(collector.factories[n]()) for n in const_names]
    const_shapes = [c.shape for c in const_raw]
    const_vals = [jnp.atleast_2d(c) for c in const_raw]

    def kernel(*refs):
        in_refs = refs[:len(inputs)]
        c_refs = refs[len(inputs):len(inputs) + len(const_vals)]
        out_refs = refs[len(inputs) + len(const_vals):]
        _IN_KERNEL[0] = True
        _KERNEL_CONSTS[0] = {
            n: r[:].reshape(shp)
            for n, r, shp in zip(const_names, c_refs, const_shapes)}
        try:
            outs = body([r[:] for r in in_refs])
        finally:
            _IN_KERNEL[0] = False
            _KERNEL_CONSTS[0] = None
        for o_ref, o in zip(out_refs, outs):
            o_ref[:] = o

    out_sds = [jax.ShapeDtypeStruct((out_len, N), jnp.int32)] * n_outs
    res = pl.pallas_call(
        kernel,
        grid=(N // tile,),
        in_specs=(
            [pl.BlockSpec((x.shape[0], tile), lambda i: (0, i),
                          memory_space=pltpu.VMEM) for x in inputs]
            + [pl.BlockSpec(c.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for c in const_vals]),
        out_specs=[pl.BlockSpec((out_len, tile), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * n_outs,
        out_shape=out_sds,
    )(*inputs, *const_vals)
    return tuple(res)


_FUSION_MIN_OVERRIDE = [None]


class force_fusion:
    """Context manager lowering the fusion threshold locally.  Use around
    a structure whose kernel shape is FIXED across many applications (e.g.
    the body of a sequential scan, traced once): the threshold exists to
    bound the number of distinct kernel traces/Mosaic compiles, which such
    a structure doesn't multiply."""

    def __init__(self, min_batch: int):
        self.min_batch = min_batch

    def __enter__(self):
        self.saved = _FUSION_MIN_OVERRIDE[0]
        _FUSION_MIN_OVERRIDE[0] = self.min_batch

    def __exit__(self, *exc):
        _FUSION_MIN_OVERRIDE[0] = self.saved


def fusion_applicable(batch_elems: int) -> bool:
    min_b = _FUSION_MIN_OVERRIDE[0] or _FUSION_MIN
    return (not _IN_KERNEL[0] and batch_elems >= min_b
            and batch_elems % _LANE == 0)


# ---------------------------------------------------------------------------
# Kernel constants: Pallas kernels may not capture array constants, so
# composite bodies materialize theirs through kernel_const().  fused_composite
# dry-runs the body once (jax.eval_shape) to collect which constants it
# needs, then passes them as extra kernel inputs.
# ---------------------------------------------------------------------------

_KERNEL_CONSTS = [None]   # None | _ConstCollector | dict[name -> value]


class _ConstCollector:
    def __init__(self):
        self.factories = {}

    def record(self, name, factory):
        if name not in self.factories:
            self.factories[name] = factory


def kernel_const(name: str, np_factory):
    """Materialize a (numpy-producing) constant; in-kernel it arrives as an
    extra input, outside kernels it is a plain jnp constant."""
    store = _KERNEL_CONSTS[0]
    if store is None:
        return jnp.asarray(np_factory())
    if isinstance(store, _ConstCollector):
        store.record(name, np_factory)
        return jnp.asarray(np_factory())
    return store[name]

"""Mesh-sharded MSM (SURVEY.md P2): points/scalars sharded across chips;
each chip runs the dense Pippenger bucket pipeline on its shard, and the
per-chip partial sums are combined with a log-depth tree of complete
point additions."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curves import msm as cmsm
from ..curves import ops as cops
from ..curves.spec import CurveSpec


def msm_sharded(mesh: Mesh, curve: CurveSpec, points: cops.Point,
                scalars: jnp.ndarray, window_bits: int = 8,
                axis_name: str = "dp") -> cops.Point:
    """points: [D, N] projective digit tensors, scalars: [Ds, N] canonical.
    N must be divisible by the mesh size."""
    n_dev = mesh.devices.size
    N = points[0].shape[-1]
    assert N % n_dev == 0

    pt_spec = P(None, axis_name)

    def local_msm(px, py, pz, s):
        r = cmsm.msm(curve, (px, py, pz), s, window_bits)
        # return the partial as a 1-point batch for concatenation
        return tuple(t[:, None] for t in r)

    # disable the varying-manual-axes check: the MSM's scan carry starts
    # from unvarying identity constants, which the checker flags spuriously
    try:
        fn = shard_map(local_msm, mesh=mesh,
                       in_specs=(pt_spec, pt_spec, pt_spec, pt_spec),
                       out_specs=(pt_spec, pt_spec, pt_spec),
                       check_vma=False)
    except TypeError:
        fn = shard_map(local_msm, mesh=mesh,
                       in_specs=(pt_spec, pt_spec, pt_spec, pt_spec),
                       out_specs=(pt_spec, pt_spec, pt_spec),
                       check_rep=False)

    def full(px, py, pz, s):
        partials = fn(px, py, pz, s)  # [D, n_dev] sharded
        # gather and tree-combine the per-chip partials
        gathered = tuple(jax.lax.with_sharding_constraint(
            t, NamedSharding(mesh, P(None, None))) for t in partials)
        return cmsm._tree_reduce(curve, gathered)

    sharding = NamedSharding(mesh, pt_spec)
    points = tuple(jax.device_put(t, sharding) for t in points)
    scalars = jax.device_put(scalars, sharding)
    return jax.jit(full)(points[0], points[1], points[2], scalars)

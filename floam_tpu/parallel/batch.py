"""Sequence-batched odometry: many independent SLAM problems advance one
scan per step, sharded over a device mesh.

This is the throughput axis of BASELINE.json ("scans/s/chip" over batched
KITTI sequences): per-scan odometry is sequential in time, so aggregate
throughput comes from point-level parallelism within a scan times sequence
-level data parallelism across chips. Under vmap, the keyframe-gated map
update (a lax.cond in the single-sequence path) becomes a select — every
lane pays the map-merge cost every step, which is the TPU-friendly tradeoff
for dense batching.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import odometry
from ..config import FloamConfig
from ..types import OdomState, PointBatch


def batched_odom_step(states: OdomState, edges: PointBatch,
                      surfs: PointBatch, cfg: FloamConfig):
    """vmap of the single-sequence update over a leading batch axis."""
    return jax.vmap(
        lambda st, e, s: odometry.odom_step_impl(st, e, s, cfg)
    )(states, edges, surfs)


def batched_init_state(cfg: FloamConfig, batch: int, dtype=jnp.float32
                       ) -> OdomState:
    one = odometry.init_state(cfg, dtype)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape).copy(), one)


def make_sharded_odom_step(mesh: Mesh, cfg: FloamConfig, axis: str = "dp"):
    """Build a jitted step where the batch axis is sharded over ``axis``.

    Each device advances its local shard of sequences; no cross-device
    communication is needed on this path (the map of each sequence lives
    with its shard), so scaling is embarrassingly parallel — the scaling
    -efficiency benchmark measures exactly this.
    """
    spec = P(axis)
    cfg = odometry.pin_assoc_backend(cfg, mesh.devices.flat[0].platform)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(spec, spec, spec),
        out_specs=(spec, spec), check_vma=False)
    def sharded(states, edges, surfs):
        return batched_odom_step(states, edges, surfs, cfg)

    return jax.jit(sharded, donate_argnums=(0,))

"""Map-sharded odometry: the local feature map partitioned across devices.

The BASELINE.json north star calls for "map blocks partitioned over hosts"
— the memory-scaling axis the reference has no analogue for (its maps live
in one process's RAM). Here the voxel hash tables are sharded by
contiguous bucket range over a mesh axis:

  * each device owns H/n buckets of the edge and surf tables (insert,
    crop, and the packed-view repack are purely local);
  * per association round, the packed query views are all-gathered over
    ICI (`jax.lax.all_gather`, ~10 MB for the default KITTI tables —
    microseconds on ICI) so k-NN gathers stay device-local;
  * the query set is split across devices; each computes factors for its
    chunk and the 6x6 Gauss-Newton normal equations are reduced with
    `jax.lax.psum`, so every device applies the identical pose update.

This composes with the sequence-batched axis: a 2-D ("dp", "mp") mesh
shards sequences over dp and each sequence's map over mp.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import odometry
from ..config import FloamConfig
from ..ops import voxelmap
from ..types import MapState, OdomState, Pose, PointBatch


def _state_spec(axis: str, cfg: FloamConfig):
    def vm(super):
        # ``super`` is pytree aux data: it must match the real state's or
        # tree_map over (state, spec) sees different structures
        return voxelmap.VoxelHashMap(
            sx=P(axis), sy=P(axis), sz=P(axis), counts=P(axis),
            keys=P(axis), leaf=P(), super=super)

    pose = Pose(q=P(), t=P())
    return OdomState(
        pose=pose, last_pose=pose,
        map=MapState(edge=vm(cfg.odom.map_edge_super),
                     surf=vm(cfg.odom.map_surf_super),
                     edge_view=P(axis), surf_view=P(axis)),
        opt_count=P(), last_kf_pose=pose, frame_idx=P())


def _batch_spec():
    return P()  # prefix spec: every leaf of the PointBatch replicated


def make_map_sharded_step(mesh: Mesh, cfg: FloamConfig, axis: str = "mp",
                          query_axis: str = None):
    """Jitted odometry step over a map-sharded state. Scan inputs are
    replicated; the state's hash-table planes and packed views are sharded
    along ``axis``.

    ``query_axis`` enables the hierarchical two-tier layout for multi-host
    meshes (the DCN analogue of the reference's single-process map,
    src/odomEstimationClass.cpp:78-79 — which has no scale-out story at
    all): the map planes are sharded over ``axis`` (intra-host ICI, where
    the per-scan packed-view all-gather is cheap) and REPLICATED over
    ``query_axis`` (hosts); each host solves a slice of the query set and
    only the 6x6 Gauss-Newton normal equations cross the host boundary
    (psum) — a few hundred bytes per round instead of the multi-MB views.
    Keyframe inserts run on the full (replicated) feature cloud on every
    host, so the per-host map replicas stay bit-identical with zero map
    traffic over DCN."""
    n = mesh.shape[axis]
    qn = mesh.shape[query_axis] if query_axis else 1
    cfg = odometry.pin_assoc_backend(cfg, mesh.devices.flat[0].platform)
    sspec = _state_spec(axis, cfg)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(sspec, _batch_spec(), _batch_spec()),
        out_specs=(sspec, P()), check_vma=False)
    def step(state, edge, surf):
        new_state, diag = odometry.odom_step_impl(
            state, edge, surf, cfg, shard_axis=axis, shard_n=n,
            query_axis=query_axis, query_n=qn)
        return new_state, diag

    return jax.jit(step, donate_argnums=(0,))


def shard_state(state: OdomState, mesh: Mesh, cfg: FloamConfig,
                axis: str = "mp") -> OdomState:
    """Place a replicated single-device state as a sharded one."""
    from jax.sharding import NamedSharding

    spec = _state_spec(axis, cfg)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        state, spec)

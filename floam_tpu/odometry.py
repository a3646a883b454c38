"""Scan-to-map odometry: the hot path of the engine.

TPU-native redesign of the reference's OdomEstimationClass
(src/odomEstimationClass.cpp) — its per-scan flow

    constant-velocity predict (:62) -> VoxelGrid downsample (:137-142) ->
    kd-tree rebuild (:78-79) -> N association+Ceres rounds (:81-108) ->
    keyframe gate (:118,320-343) -> map insert + crop + re-voxelize (:253-294)

becomes ONE jitted, statically-shaped XLA program per scan:

    predict -> masked voxel downsample -> (grid already built) ->
    fori_loop over association rounds, each = batched 27-cell grid 5-NN +
    closed-form line/plane fits + 4 IRLS Gauss-Newton iterations ->
    keyframe-gated map merge (scatter + sorted-segment re-voxelize + grid
    rebuild)

Key wins over a literal port: the NN structure is rebuilt only when the map
changes (the reference rebuilds both kd-trees every scan regardless of the
keyframe gate), all ~1e4 5-NN queries per round run as one batched gather
instead of sequential FLANN calls, and the Ceres DENSE_QR solve over a
materialized Jacobian becomes a 6x6 normal-equation reduction.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import FloamConfig, OdomConfig
from .ops import gauss_newton as gn
from .ops import knn, residuals, voxel
from .ops import se3
from .types import MapState, OdomState, PointBatch, Pose, VoxelGrid


class OdomDiagnostics(NamedTuple):
    num_edge_factors: jnp.ndarray  # () int32, last round
    num_surf_factors: jnp.ndarray  # () int32, last round
    is_keyframe: jnp.ndarray  # () bool
    map_edge_points: jnp.ndarray  # () int32
    map_surf_points: jnp.ndarray  # () int32
    cost: jnp.ndarray  # () final weighted cost


# ---------------------------------------------------------------------------
# State construction
# ---------------------------------------------------------------------------

def _empty_grid(capacity: int, cell_size: float, dtype) -> VoxelGrid:
    return VoxelGrid(
        keys=jnp.full((capacity,), voxel._INVALID_KEY, jnp.uint32),
        xyz=jnp.zeros((capacity, 3), dtype),
        mask=jnp.zeros((capacity,), bool),
        cell_size=jnp.asarray(cell_size, dtype),
    )


def init_state(cfg: FloamConfig, dtype=jnp.float32) -> OdomState:
    oc = cfg.odom
    return OdomState(
        pose=Pose.identity(dtype),
        last_pose=Pose.identity(dtype),
        map=MapState(
            edge=_empty_grid(oc.map_edge_capacity, oc.grid_cell_size, dtype),
            surf=_empty_grid(oc.map_surf_capacity, oc.grid_cell_size, dtype),
        ),
        opt_count=jnp.asarray(oc.min_outer_iters, jnp.int32),
        last_kf_pose=Pose.identity(dtype),
        frame_idx=jnp.asarray(0, jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def init_map(state: OdomState, edge: PointBatch, surf: PointBatch,
             cfg: FloamConfig) -> OdomState:
    """Seed the map with the raw (not downsampled) first-scan features
    (initMapWithPoints, src/odomEstimationClass.cpp:28-32)."""
    oc = cfg.odom
    dtype = state.pose.t.dtype
    edge_grid = _merge_into_map(state.map.edge, edge.xyz.astype(dtype),
                                edge.mask, state.pose, oc,
                                leaf=None, crop=False)
    surf_grid = _merge_into_map(state.map.surf, surf.xyz.astype(dtype),
                                surf.mask, state.pose, oc,
                                leaf=None, crop=False)
    return state._replace(
        map=MapState(edge=edge_grid, surf=surf_grid),
        opt_count=jnp.asarray(oc.max_outer_iters, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Map maintenance
# ---------------------------------------------------------------------------

def _merge_into_map(grid: VoxelGrid, new_xyz, new_mask, pose: Pose,
                    oc: OdomConfig, leaf, crop: bool) -> VoxelGrid:
    """Append new (sensor-frame) points transformed into world, optionally
    crop to +-crop_radius of the pose and re-voxelize, then rebuild the
    sorted NN grid (addPointsToMap, src/odomEstimationClass.cpp:253-294)."""
    dtype = grid.xyz.dtype
    capacity = grid.xyz.shape[0]
    world = se3.quat_rotate(pose.q[None, :], new_xyz.astype(dtype)) + pose.t
    all_xyz = jnp.concatenate([grid.xyz, world], axis=0)
    all_mask = jnp.concatenate([grid.mask, new_mask], axis=0)
    if crop:
        all_mask = voxel.crop_mask(all_xyz, all_mask, pose.t, oc.crop_radius)
    if leaf is not None:
        out_xyz, out_mask, _ = voxel.voxel_downsample(all_xyz, all_mask, leaf,
                                                      capacity)
    else:
        # raw insert (map seeding): keep first `capacity` valid points
        order = jnp.argsort(~all_mask)  # valid first, stable
        out_xyz = all_xyz[order][:capacity]
        out_mask = all_mask[order][:capacity]
    return knn.build_grid(out_xyz, out_mask, grid.cell_size)


# ---------------------------------------------------------------------------
# Association + solve
# ---------------------------------------------------------------------------

def _associate_and_solve(pose: Pose, map_state: MapState,
                         edge_xyz, edge_mask, surf_xyz, surf_mask,
                         oc: OdomConfig) -> Tuple[Pose, gn.GNStats]:
    """One outer round: re-associate at the current pose, then run the fixed
    inner GN iterations (one Ceres Solve in the reference, :92-108)."""
    pw_edge = se3.quat_rotate(pose.q[None, :], edge_xyz) + pose.t
    nn_e, d2_e, _ = knn.query_knn(map_state.edge, pw_edge, edge_mask,
                                  k=oc.k_neighbors,
                                  cell_capacity=oc.grid_cell_capacity)
    ef = residuals.edge_association(edge_xyz, nn_e, d2_e, oc.nn_radius_sq,
                                    oc.edge_eig_ratio, oc.line_half_length)
    ef = ef._replace(valid=ef.valid & edge_mask)

    pw_surf = se3.quat_rotate(pose.q[None, :], surf_xyz) + pose.t
    nn_s, d2_s, _ = knn.query_knn(map_state.surf, pw_surf, surf_mask,
                                  k=oc.k_neighbors,
                                  cell_capacity=oc.grid_cell_capacity)
    sf = residuals.surf_association(surf_xyz, nn_s, d2_s, oc.nn_radius_sq,
                                    oc.plane_fit_tol)
    sf = sf._replace(valid=sf.valid & surf_mask)

    return gn.solve_pose(pose, ef, sf, oc)


# ---------------------------------------------------------------------------
# The per-scan update
# ---------------------------------------------------------------------------

def odom_step_impl(state: OdomState, edge: PointBatch, surf: PointBatch,
                   cfg: FloamConfig, update_map: bool = True,
                   predict: bool = True
                   ) -> Tuple[OdomState, OdomDiagnostics]:
    """One scan-to-map update (updatePointsToMap VANILLA path,
    src/odomEstimationClass.cpp:57-124).

    ``edge``/``surf`` are sensor-frame feature clouds (masked, any capacity);
    they are voxel-downsampled here as in downSamplingToMap (:137-142).
    ``update_map=False`` corresponds to the deskew INITIAL_ITERATION variant
    that registers without touching the map (:40,63-68,117); ``predict=False``
    is the REFINEMENT_AND_UPDATE phase which starts Gauss-Newton from the
    already-registered pose instead of re-applying the constant-velocity
    model. (The reference *intends* this but its always-true condition at
    :63 re-predicts anyway — quirk 2; we implement the intent.)
    """
    oc = cfg.odom
    dtype = state.pose.t.dtype

    # --- decaying outer-iteration budget (:59-60) ---
    opt_count = jnp.maximum(state.opt_count - 1,
                            jnp.asarray(oc.min_outer_iters, jnp.int32))
    opt_count = jnp.where(state.opt_count > oc.min_outer_iters,
                          opt_count, state.opt_count)

    # --- constant-velocity prediction (:62-65) ---
    if predict:
        qi, ti = se3.pose_inverse(state.last_pose.q, state.last_pose.t)
        dq, dt = se3.pose_compose(qi, ti, state.pose.q, state.pose.t)
        pq, pt = se3.pose_compose(state.pose.q, state.pose.t, dq, dt)
        pred = Pose(q=se3.quat_normalize(pq), t=pt)
        last_pose = state.pose
    else:
        pred = state.pose
        last_pose = state.last_pose

    # --- feature downsample (:73-75; leaf = res for edge, 2x for surf) ---
    e_xyz, e_mask, _ = voxel.voxel_downsample(
        edge.xyz.astype(dtype), edge.mask, oc.map_resolution,
        oc.scan_edge_capacity)
    s_xyz, s_mask, _ = voxel.voxel_downsample(
        surf.xyz.astype(dtype), surf.mask, 2.0 * oc.map_resolution,
        oc.scan_surf_capacity)

    # --- map-size guard (:77,111-113) ---
    map_edge_n = jnp.sum(state.map.edge.mask.astype(jnp.int32))
    map_surf_n = jnp.sum(state.map.surf.mask.astype(jnp.int32))
    guard = (map_edge_n > oc.min_map_edge) & (map_surf_n > oc.min_map_surf)

    # --- outer association rounds (:81) ---
    def outer_body(_, carry):
        pose, _ = carry
        return _associate_and_solve(pose, state.map, e_xyz, e_mask,
                                    s_xyz, s_mask, oc)

    stats0 = gn.GNStats(num_edge=jnp.asarray(0, jnp.int32),
                        num_surf=jnp.asarray(0, jnp.int32),
                        cost=jnp.asarray(0.0, dtype))
    opt_pose, stats = jax.lax.fori_loop(0, opt_count, outer_body,
                                        (pred, stats0))
    new_pose = jax.tree_util.tree_map(
        lambda a, b: jnp.where(guard, a, b), opt_pose, pred)

    # --- keyframe gate (:118,320-343) ---
    qd, td = se3.pose_compose(*se3.pose_inverse(state.last_kf_pose.q,
                                                state.last_kf_pose.t),
                              new_pose.q, new_pose.t)
    moved = (jnp.linalg.norm(td) > oc.keyframe_min_transl) | \
            (se3.rotation_angle(qd) > oc.keyframe_min_rot)
    is_kf = moved | (state.frame_idx == 0)

    if update_map:
        def do_update(ms: MapState) -> MapState:
            eg = _merge_into_map(ms.edge, e_xyz, e_mask, new_pose, oc,
                                 leaf=oc.map_resolution, crop=True)
            sg = _merge_into_map(ms.surf, s_xyz, s_mask, new_pose, oc,
                                 leaf=2.0 * oc.map_resolution, crop=True)
            return MapState(edge=eg, surf=sg)

        new_map = jax.lax.cond(is_kf, do_update, lambda ms: ms, state.map)
        new_kf_pose = jax.tree_util.tree_map(
            lambda a, b: jnp.where(is_kf, a, b), new_pose, state.last_kf_pose)
    else:
        new_map = state.map
        new_kf_pose = state.last_kf_pose
        is_kf = jnp.asarray(False)

    new_state = OdomState(
        pose=new_pose,
        last_pose=last_pose,
        map=new_map,
        opt_count=opt_count,
        last_kf_pose=new_kf_pose,
        frame_idx=state.frame_idx + 1,
    )
    diag = OdomDiagnostics(
        num_edge_factors=stats.num_edge,
        num_surf_factors=stats.num_surf,
        is_keyframe=is_kf,
        map_edge_points=map_edge_n,
        map_surf_points=map_surf_n,
        cost=stats.cost,
    )
    return new_state, diag


#: jitted entry point (the un-jitted ``odom_step_impl`` composes under
#: vmap/shard_map for the multi-sequence and multi-chip paths)
odom_step = functools.partial(
    jax.jit, static_argnames=("cfg", "update_map", "predict"),
    donate_argnums=(0,))(odom_step_impl)


def get_velocity(state: OdomState, scan_period: float) -> jnp.ndarray:
    """(odom.t - last_odom.t) / scan_period (GetVelocity,
    include/odomEstimationClass.h:78)."""
    return (state.pose.t - state.last_pose.t) / scan_period

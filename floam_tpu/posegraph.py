"""Pose-graph back-end with revisit (loop-closure) constraints.

The reference system is a FRONT-END: it exports a g2o pose graph at exit
(reference src/utils.cpp:3-78) and its deployment launch chains lio_sam as
the SLAM back-end that detects loop closures and optimizes the full pose
chain (launch/structor_slam.launch:50-52; rviz/slam.rviz displays
lio_sam's loop-constraint and global-map topics). This module is that
back-end, in-framework and TPU-native:

  * **revisit detection** — keyframe proximity in pose space with a frame
    index gap (host-side, O(stored keyframes) numpy per attempt);
  * **constraint measurement** — re-registration of the revisiting
    keyframe's feature clouds against a voxel-hash map built on the fly
    from the revisited keyframe's stored clouds, using the same hash-grid
    5-NN + closed-form fits + IRLS GN machinery as the odometry hot path
    (odometry._associate_and_solve) — one jitted program per attempted
    pair, dispatched asynchronously so the frame loop never waits on it;
  * **global optimization** — Gauss-Newton over the keyframe chain with
    odometry chain edges + loop edges. The 6Kx6K normal equations are
    assembled dense and solved by Cholesky: dense linear algebra is MXU
    work (a 1000-node graph solve is ~2e11 flops — milliseconds on a TPU
    chip), which beats emulating a sparse factorization with scalar
    control flow. Same f32-safe cho_solve path as windowed BA
    (parallel/windowed_ba.ba_refine).

The window-BA ablation (docs/ba_ablation.jsonl) concluded that refining
against the same local map the odometry already registered to cannot
materially help and that "material gains need REVISIT (map-to-map)
constraints" — these are those constraints.

g2o interchange: :func:`optimize_g2o` ingests the same EDGE_SE3:QUAT
graphs the exporter writes (io/export.save_posegraph / load_g2o), so the
back-end also runs standalone on externally-produced graphs.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import FloamConfig
from .ops import se3, voxelmap
from .parallel.windowed_ba import _prior_residual
from .types import MapState, Pose


# ---------------------------------------------------------------------------
# Graph optimization (jittable; static node/edge counts via padding)
# ---------------------------------------------------------------------------

def _edge_terms(quats, trans, ei, ej, dq, dt):
    """Residuals + GN Jacobian blocks for E SE(3) relative-pose edges:
    r = log(Z^-1 * T_i^-1 * T_j) under right (body-frame) perturbation,
    via jacrev at the linearization point (exact GN blocks — verified
    against autodiff in the windowed-BA tests that share this residual)."""
    dtype = trans.dtype
    xi0 = jnp.zeros((6,), dtype)

    def one(qi, ti, qj, tj, zq, zt):
        r = _prior_residual(xi0, xi0, qi, ti, qj, tj, zq, zt)
        Ji, Jj = jax.jacrev(_prior_residual, argnums=(0, 1))(
            xi0, xi0, qi, ti, qj, tj, zq, zt)
        return r, Ji, Jj

    return jax.vmap(one)(quats[ei], trans[ei], quats[ej], trans[ej], dq, dt)


def optimize_pose_graph(quats, trans, ei, ej, dq, dt, weights,
                        iters: int = 8, damping: float = 1e-4,
                        fix_first: bool = True):
    """GN over K poses with E relative-pose edges.

    quats (K, 4) wxyz / trans (K, 3): initial node poses.
    ei/ej (E,) int32, dq (E, 4), dt (E, 3): edge a->b with measurement
    Z = T_a^-1 * T_b. weights (E, 6): per-edge information diagonal in
    residual order (omega, upsilon) = (rot, trans); a zero row is a
    padding edge. Returns refined (quats, trans). Gauge: node 0 pinned
    (the g2o FIX 0 the exporter writes, utils.cpp:21).
    """
    K = quats.shape[0]
    dtype = trans.dtype
    ei = jnp.asarray(ei, jnp.int32)
    ej = jnp.asarray(ej, jnp.int32)
    weights = jnp.asarray(weights, dtype)
    gauge = 1e12 if dtype == jnp.float64 else 1e6

    def body(_, qt):
        q, t = qt
        r, Ji, Jj = _edge_terms(q, t, ei, ej, dq, dt)  # (E,6),(E,6,6)x2
        JiW = Ji * weights[:, :, None]  # rows scaled by information
        JjW = Jj * weights[:, :, None]
        H4 = jnp.zeros((K, 6, K, 6), dtype)
        H4 = H4.at[ei, :, ei, :].add(jnp.einsum("eri,erj->eij", JiW, Ji))
        H4 = H4.at[ej, :, ej, :].add(jnp.einsum("eri,erj->eij", JjW, Jj))
        H4 = H4.at[ei, :, ej, :].add(jnp.einsum("eri,erj->eij", JiW, Jj))
        H4 = H4.at[ej, :, ei, :].add(jnp.einsum("eri,erj->eij", JjW, Ji))
        wr = weights * r
        b2 = jnp.zeros((K, 6), dtype)
        b2 = b2.at[ei].add(jnp.einsum("eri,er->ei", Ji, wr))
        b2 = b2.at[ej].add(jnp.einsum("eri,er->ei", Jj, wr))
        H = H4.reshape(6 * K, 6 * K) + damping * jnp.eye(6 * K, dtype=dtype)
        if fix_first:
            H = H.at[:6, :6].add(gauge * jnp.eye(6, dtype=dtype))
        delta = -jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(H),
            b2.reshape(-1)).reshape(K, 6)
        q2, t2 = jax.vmap(se3.pose_retract_right)(q, t, delta)
        return q2, t2

    return jax.lax.fori_loop(0, iters, body, (quats, trans))


#: jitted entry (edge arrays may be padded with zero-weight rows so the
#: program compiles once per (K, E) shape class)
optimize_pose_graph_jit = jax.jit(
    optimize_pose_graph, static_argnames=("iters", "fix_first"))


def chain_edges(quats: np.ndarray, trans: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Consecutive odometry edges over a pose chain (host-side):
    (ei, ej, dq (K-1,4), dt (K-1,3)) with Z_k = T_k^-1 * T_{k+1} — the
    chained EDGE_SE3:QUAT set the reference exporter writes
    (utils.cpp:41-56)."""
    K = len(quats)
    q = jnp.asarray(quats)
    t = jnp.asarray(trans)
    qi, ti = se3.pose_inverse(q[:-1], t[:-1])
    dq, dt = se3.pose_compose(qi, ti, q[1:], t[1:])
    return (np.arange(K - 1, dtype=np.int32),
            np.arange(1, K, dtype=np.int32),
            np.asarray(dq), np.asarray(dt))


# ---------------------------------------------------------------------------
# Pair registration (the loop-constraint measurement)
# ---------------------------------------------------------------------------

class PairResult(NamedTuple):
    q: jnp.ndarray  # (4,) measured T_a<-b rotation (pose of b in frame a)
    t: jnp.ndarray  # (3,)
    num_edge: jnp.ndarray  # () int32 factors in the final round
    num_surf: jnp.ndarray  # () int32
    cost: jnp.ndarray  # () mean weighted cost of the final round


def make_pair_registrar(cfg: FloamConfig, rounds: int = 8,
                        dtype=jnp.float32):
    """One jitted program measuring the relative pose between two
    keyframes' feature clouds: build a voxel-hash map from keyframe A's
    sensor-frame clouds at identity, then register keyframe B's clouds
    against it from the drift-predicted initial guess — the same
    per-round gather + fit + IRLS GN as the odometry hot path, with a
    fresh gather per round (gather_per_round) so the pose can pull in
    across several association radii of initial drift."""
    from . import odometry

    oc = dataclasses.replace(
        odometry.pin_assoc_backend(cfg, jax.default_backend()).odom,
        gather_per_round=True)

    @jax.jit
    def register(e_a_xyz, e_a_mask, s_a_xyz, s_a_mask,
                 e_b_xyz, e_b_mask, s_b_xyz, s_b_mask, q0, t0):
        em = voxelmap.insert(
            voxelmap.empty(oc.map_edge_table, oc.map_resolution, dtype,
                           oc.map_edge_super),
            e_a_xyz.astype(dtype), e_a_mask, oc.voxel_count_cap,
            probe_rounds=oc.map_insert_probe_rounds)
        sm = voxelmap.insert(
            voxelmap.empty(oc.map_surf_table, 2.0 * oc.map_resolution,
                           dtype, oc.map_surf_super),
            s_a_xyz.astype(dtype), s_a_mask, oc.voxel_count_cap,
            probe_rounds=oc.map_insert_probe_rounds)
        ms = MapState(edge=em, surf=sm,
                      edge_view=voxelmap.pack_query_view(em),
                      surf_view=voxelmap.pack_query_view(sm))
        from .ops import gauss_newton as gn

        pose0 = Pose(q=q0.astype(dtype), t=t0.astype(dtype))
        stats0 = gn.GNStats(num_edge=jnp.asarray(0, jnp.int32),
                            num_surf=jnp.asarray(0, jnp.int32),
                            cost=jnp.asarray(0.0, dtype))

        def rnd(_, carry):
            pose, _ = carry
            return odometry._associate_and_solve(
                pose, ms, e_b_xyz.astype(dtype), e_b_mask,
                s_b_xyz.astype(dtype), s_b_mask, oc)

        pose, stats = jax.lax.fori_loop(0, rounds, rnd, (pose0, stats0))
        return PairResult(q=pose.q, t=pose.t, num_edge=stats.num_edge,
                          num_surf=stats.num_surf, cost=stats.cost)

    return register


# ---------------------------------------------------------------------------
# Trajectory correction (shared with the windowed-BA path)
# ---------------------------------------------------------------------------

def apply_refined_poses(refined: dict, quats: np.ndarray,
                        trans: np.ndarray):
    """Correct a full trajectory with refined poses at a subset of frames:
    every frame after refined frame k moves by the world-frame delta
    refined_k o inv(odom_k) until the next refined frame. One batched
    device call for the whole trajectory."""
    kf = np.asarray(sorted(refined), np.int64)
    rq = jnp.stack([jnp.asarray(refined[i][0]) for i in kf])
    rt = jnp.stack([jnp.asarray(refined[i][1]) for i in kf])
    slot = np.searchsorted(kf, np.arange(len(quats)), side="right")

    @jax.jit
    def correct(rq, rt, kq, kt, qs, ts, sel):
        iq, it = se3.pose_inverse(kq, kt)
        dq, dt = se3.pose_compose(rq, rt, iq, it)  # (K, 4/3)
        ident_q = jnp.array([[1.0, 0, 0, 0]], dq.dtype)
        dq = jnp.concatenate([ident_q, dq])
        dt = jnp.concatenate([jnp.zeros((1, 3), dt.dtype), dt])
        return se3.pose_compose(dq[sel], dt[sel], qs, ts)

    q_c, t_c = correct(rq, rt, jnp.asarray(quats[kf]),
                       jnp.asarray(trans[kf]), jnp.asarray(quats),
                       jnp.asarray(trans), jnp.asarray(slot))
    return np.asarray(q_c), np.asarray(t_c)


# ---------------------------------------------------------------------------
# Standalone g2o back-end
# ---------------------------------------------------------------------------

def optimize_g2o(path_in, path_out=None, iters: int = 8,
                 damping: float = 1e-4):
    """Ingest a g2o pose graph (the exporter's own format or any
    VERTEX_SE3:QUAT/EDGE_SE3:QUAT text graph), optimize it, optionally
    write the refined graph back. Returns (quats (K,4) wxyz, trans)."""
    from .io.export import load_g2o, save_posegraph_graph

    quats, trans, edges = load_g2o(path_in)
    ei = np.asarray([e[0] for e in edges], np.int32)
    ej = np.asarray([e[1] for e in edges], np.int32)
    dq = np.stack([e[2] for e in edges])
    dt = np.stack([e[3] for e in edges])
    w = np.stack([e[4] for e in edges])  # (E, 6) info diag (rot, trans)
    q2, t2 = optimize_pose_graph_jit(
        jnp.asarray(quats), jnp.asarray(trans), ei, ej,
        jnp.asarray(dq), jnp.asarray(dt), jnp.asarray(w),
        iters=iters, damping=damping)
    q2, t2 = np.asarray(q2), np.asarray(t2)
    if path_out is not None:
        save_posegraph_graph(path_out, q2, t2,
                             extra_edges=[(int(a), int(b), zq, zt)
                                          for a, b, zq, zt, _ in edges
                                          if abs(int(a) - int(b)) != 1])
    return q2, t2

"""Distributed windowed bundle adjustment over keyframe poses.

The reference hands its trajectory to external back-ends (g2o / BALM /
lio_sam) at exit (src/utils.cpp, src/odomEstimationNode.cpp:373-387) and
keeps a write-only 3-keyframe history (quirk 9). This module provides the
in-framework equivalent sized for TPU pods (the BASELINE.json north star):

  * a sliding window of K keyframe poses is refined jointly against
    - point-to-line / point-to-plane feature factors (frozen world geometry
      from the local map association), and
    - SE(3) relative-pose chain priors from odometry;
  * the 6K x 6K Gauss-Newton normal equations are accumulated as one
    einsum, factor-sharded across the device mesh, reduced with
    jax.lax.psum over ICI, and solved replicated on every device
    (K <= ~64 keeps the dense solve trivial against the psum cost).

Feature-factor Jacobians reuse the analytic kernels (ops.residuals); prior
Jacobians come from jax.jacrev of the residual at the current linearization
point — both verified against autodiff in tests.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import OdomConfig
from ..ops import residuals as R
from ..ops import se3
from ..types import Pose


class BAProblem(NamedTuple):
    """A K-pose window. Factor arrays carry a leading frame axis."""

    quats: jnp.ndarray  # (K, 4)
    trans: jnp.ndarray  # (K, 3)
    edge: R.EdgeFactors  # fields shaped (K, Ne, ...)
    surf: R.SurfFactors  # fields shaped (K, Ns, ...)
    prior_dq: jnp.ndarray  # (K-1, 4) measured relative rotation
    prior_dt: jnp.ndarray  # (K-1, 3) measured relative translation
    prior_weight: jnp.ndarray  # () or (K-1,)


def _frame_normal_equations(q, t, edge: R.EdgeFactors, surf: R.SurfFactors,
                            cfg: OdomConfig):
    """Per-frame feature H (6,6), b (6,) with IRLS robust weights."""
    dtype = t.dtype
    re, Je = R.edge_residual_jacobian(q, t, edge)
    rs, Js = R.surf_residual_jacobian(q, t, surf)
    re, Je, ve = R.sanitize_factors(re, Je, edge.valid)
    rs, Js, vs = R.sanitize_factors(rs, Js, surf.valid)
    we = R.robust_weight(re, cfg.loss, cfg.huber_delta, cfg.cauchy_scale)
    ws = R.robust_weight(rs, cfg.loss, cfg.huber_delta, cfg.cauchy_scale)
    we = we * ve.astype(dtype)
    ws = ws * vs.astype(dtype)
    H = jnp.einsum("ni,n,nj->ij", Je, we, Je) + \
        jnp.einsum("ni,n,nj->ij", Js, ws, Js)
    b = jnp.einsum("ni,n->i", Je, we * re) + \
        jnp.einsum("ni,n->i", Js, ws * rs)
    return H, b


def _prior_residual(xi_i, xi_j, q_i, t_i, q_j, t_j, dq, dt):
    """r = log( Z^{-1} * (exp(xi_i) T_i)^{-1} * (exp(xi_j) T_j) ) with Z the
    measured relative pose; evaluated at the linearization point via local
    deltas so jax.jacrev yields the exact GN Jacobian blocks."""
    qi, ti = se3.pose_retract_right(q_i, t_i, xi_i)
    qj, tj = se3.pose_retract_right(q_j, t_j, xi_j)
    q_rel, t_rel = se3.pose_compose(*se3.pose_inverse(qi, ti), qj, tj)
    q_err, t_err = se3.pose_compose(*se3.pose_inverse(dq, dt), q_rel, t_rel)
    return se3.se3_log(q_err, t_err)


def ba_normal_equations(p: BAProblem, cfg: OdomConfig, axis: Optional[str]
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense (6K, 6K) H and (6K,) b. Feature terms may be factor-sharded
    along the factor axis; ``axis`` names the mesh axis to psum over
    (None = single device)."""
    K = p.quats.shape[0]
    dtype = p.trans.dtype

    Hf, bf = jax.vmap(
        lambda q, t, e, s: _frame_normal_equations(q, t, e, s, cfg)
    )(p.quats, p.trans, p.edge, p.surf)  # (K,6,6), (K,6)
    if axis is not None:
        Hf = jax.lax.psum(Hf, axis)
        bf = jax.lax.psum(bf, axis)

    H = jnp.zeros((6 * K, 6 * K), dtype)
    b = jnp.zeros((6 * K,), dtype)
    idx = jnp.arange(K)
    H = H.reshape(K, 6, K, 6).at[idx, :, idx, :].add(Hf).reshape(6 * K, 6 * K)
    b = b.reshape(K, 6).at[idx].add(bf).reshape(-1)

    # chain priors (replicated: O(K) work)
    def one_prior(k):
        xi0 = jnp.zeros((6,), dtype)
        r = _prior_residual(xi0, xi0, p.quats[k], p.trans[k],
                            p.quats[k + 1], p.trans[k + 1],
                            p.prior_dq[k], p.prior_dt[k])
        Ji, Jj = jax.jacrev(_prior_residual, argnums=(0, 1))(
            xi0, xi0, p.quats[k], p.trans[k], p.quats[k + 1], p.trans[k + 1],
            p.prior_dq[k], p.prior_dt[k])
        return r, Ji, Jj

    r_p, J_i, J_j = jax.vmap(one_prior)(jnp.arange(K - 1))  # (K-1, 6[,6])
    w = jnp.broadcast_to(jnp.asarray(p.prior_weight, dtype), (K - 1,))

    H4 = H.reshape(K, 6, K, 6)
    ii = jnp.arange(K - 1)
    jj = ii + 1
    H4 = H4.at[ii, :, ii, :].add(
        w[:, None, None] * jnp.einsum("kri,krj->kij", J_i, J_i))
    H4 = H4.at[jj, :, jj, :].add(
        w[:, None, None] * jnp.einsum("kri,krj->kij", J_j, J_j))
    H4 = H4.at[ii, :, jj, :].add(
        w[:, None, None] * jnp.einsum("kri,krj->kij", J_i, J_j))
    H4 = H4.at[jj, :, ii, :].add(
        w[:, None, None] * jnp.einsum("kri,krj->kij", J_j, J_i))
    H = H4.reshape(6 * K, 6 * K)
    b2 = b.reshape(K, 6)
    b2 = b2.at[ii].add(w[:, None] * jnp.einsum("kri,kr->ki", J_i, r_p))
    b2 = b2.at[jj].add(w[:, None] * jnp.einsum("kri,kr->ki", J_j, r_p))
    b = b2.reshape(-1)
    return H, b


def ba_refine(p: BAProblem, cfg: OdomConfig, iters: int = 4,
              damping: float = 1e-6, axis: Optional[str] = None,
              fix_first: bool = True) -> BAProblem:
    """Run ``iters`` GN iterations on the window. ``fix_first`` gauges the
    problem by freezing pose 0 (the reference's g2o export writes FIX 0,
    src/utils.cpp:21)."""
    K = p.quats.shape[0]
    dtype = p.trans.dtype

    # gauge prior magnitude: large enough to pin pose 0, small enough to
    # keep the normal matrix solvable in the working precision
    gauge = 1e12 if dtype == jnp.float64 else 1e6

    def body(_, prob):
        H, b = ba_normal_equations(prob, cfg, axis)
        H = H + damping * jnp.eye(6 * K, dtype=dtype)
        if fix_first:
            # gauge fix: huge prior on delta_0 = 0
            H = H.at[:6, :6].add(gauge * jnp.eye(6, dtype=dtype))
        # H is SPD (GN + damping + gauge): Cholesky. jnp.linalg.solve's LU
        # custom call costs ~19 ms per 48x48 solve on this TPU runtime vs
        # 0.07 ms for cho_solve — it was the entire BA window cost.
        delta = -jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(H), b).reshape(K, 6)
        q2, t2 = jax.vmap(se3.pose_retract_right)(prob.quats, prob.trans, delta)
        return prob._replace(quats=q2, trans=t2)

    return jax.lax.fori_loop(0, iters, body, p)


def build_window_problem(map_state, e_xyz, e_mask, s_xyz, s_mask,
                         quats, trans, oc: OdomConfig,
                         prior_weight: float = 1e2) -> BAProblem:
    """Snapshot a K-keyframe BA window from stored sensor-frame feature
    clouds: associate every keyframe's cloud against the CURRENT local map
    (frozen world geometry) at its current pose estimate, exactly as the
    odometry hot path does, and chain consecutive odometry relative poses
    as priors. The in-framework replacement for handing clouds+poses to
    BALM/g2o (src/utils.cpp:3-78).

    Shapes: e_xyz (K, Qe, 3), s_xyz (K, Qs, 3), quats (K, 4), trans (K, 3).
    The window's queries are FLATTENED into one (K*Q) association so the
    shared map view is gathered once (vmapping would broadcast the packed
    view per lane)."""
    from .. import odometry
    from ..ops import voxelmap

    K, Qe, _ = e_xyz.shape
    Qs = s_xyz.shape[1]
    k = oc.k_neighbors

    pw_e = jax.vmap(lambda q, t, p: se3.quat_rotate(q[None], p) + t)(
        quats, trans, e_xyz).reshape(K * Qe, 3)
    pw_s = jax.vmap(lambda q, t, p: se3.quat_rotate(q[None], p) + t)(
        quats, trans, s_xyz).reshape(K * Qs, 3)

    radius = float(oc.nn_radius_sq) ** 0.5
    e_deltas, e_valid = odometry._search_offsets(
        odometry._edge_leaf(oc), radius, oc.map_edge_table,
        oc.map_edge_super)
    s_deltas, s_valid = odometry._search_offsets(
        odometry._surf_leaf(oc), radius, oc.map_surf_table,
        oc.map_surf_super)

    cand_e, d2_e = voxelmap.query_candidates(
        map_state.edge_view, map_state.edge.leaf, pw_e,
        jnp.asarray(e_deltas), jnp.asarray(e_valid), oc.map_edge_super)
    kth_e, win_e = voxelmap.select_k_mask(d2_e, k)
    ef = R.edge_association_fused(
        e_xyz.reshape(K * Qe, 3), pw_e, cand_e, win_e, kth_e, k,
        oc.nn_radius_sq, oc.edge_eig_ratio, oc.line_half_length)
    ef = ef._replace(valid=ef.valid & e_mask.reshape(-1))

    cand_s, d2_s = voxelmap.query_candidates(
        map_state.surf_view, map_state.surf.leaf, pw_s,
        jnp.asarray(s_deltas), jnp.asarray(s_valid), oc.map_surf_super)
    kth_s, win_s = voxelmap.select_k_mask(d2_s, k)
    sf = R.surf_association_fused(
        s_xyz.reshape(K * Qs, 3), pw_s, cand_s, win_s, kth_s, k,
        oc.nn_radius_sq, oc.plane_fit_tol)
    sf = sf._replace(valid=sf.valid & s_mask.reshape(-1))

    edge = R.EdgeFactors(*[v.reshape((K, Qe) + v.shape[1:]) for v in ef])
    surf = R.SurfFactors(*[v.reshape((K, Qs) + v.shape[1:]) for v in sf])

    # odometry chain priors between consecutive keyframes
    def rel(k_):
        qi, ti = se3.pose_inverse(quats[k_], trans[k_])
        return se3.pose_compose(qi, ti, quats[k_ + 1], trans[k_ + 1])

    dq, dt = jax.vmap(rel)(jnp.arange(K - 1))
    return BAProblem(quats=quats, trans=trans, edge=edge, surf=surf,
                     prior_dq=dq, prior_dt=dt,
                     prior_weight=jnp.asarray(prior_weight, trans.dtype))


def window_ba_from_clouds(map_state, e_xyz, e_mask, s_xyz, s_mask,
                          quats, trans, oc: OdomConfig, iters: int = 4,
                          prior_weight: float = 1e2, damping: float = 1e-6,
                          axis: Optional[str] = None):
    """Build + refine a keyframe window in one jittable program; returns
    the refined (quats (K,4), trans (K,3))."""
    prob = build_window_problem(map_state, e_xyz, e_mask, s_xyz, s_mask,
                                quats, trans, oc, prior_weight)
    out = ba_refine(prob, oc, iters=iters, damping=damping, axis=axis)
    return out.quats, out.trans


def make_sharded_ba_step(mesh: Mesh, cfg: OdomConfig, iters: int = 4,
                         axis: str = "dp"):
    """Factor-sharded distributed BA: edge/surf factors split along their
    factor axis across ``axis``; poses replicated; normal equations reduced
    with psum; every device solves the same 6Kx6K system."""
    fspec = P(None, axis)  # (K, N/n, ...)
    espec = R.EdgeFactors(point=fspec, pa=fspec, pb=fspec, valid=fspec)
    sspec = R.SurfFactors(point=fspec, normal=fspec, offset=fspec,
                          valid=fspec)
    in_spec = BAProblem(
        quats=P(), trans=P(), edge=espec, surf=sspec,
        prior_dq=P(), prior_dt=P(), prior_weight=P())

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=(in_spec,),
                       out_specs=P(), check_vma=False)
    def sharded(prob: BAProblem):
        out = ba_refine(prob, cfg, iters=iters, axis=axis)
        return (out.quats, out.trans)

    return jax.jit(sharded)

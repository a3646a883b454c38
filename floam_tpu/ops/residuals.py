"""Point-to-line / point-to-plane factors: association geometry, residuals,
and analytic SE(3) Jacobians — batched over all factors at once.

TPU-native redesign of the reference's per-point Ceres cost functions:
  * EdgeAnalyticCostFunction  (reference src/lidarOptimization.cpp:12-43):
    r = |(pw - a) x (pw - b)| / |a - b|,
    dr/dxi = -nu^T [de]_x [-[pw]_x | I] / (|nu| |de|)
  * SurfNormAnalyticCostFunction (src/lidarOptimization.cpp:51-74):
    r = n . pw + d,  dr/dxi = n^T [-[pw]_x | I]
  * edge association: 5-NN covariance eigen-decomposition, validity
    lambda_max > 3 * lambda_mid, line endpoints at centroid +- 0.1 * dir
    (src/odomEstimationClass.cpp:144-196)
  * surf association: 5-point plane fit solving A n = -1, 0.2 m residual
    gate (src/odomEstimationClass.cpp:198-251)

The reference's per-point Eigen::SelfAdjointEigenSolver and
colPivHouseholderQr become closed-form batched 3x3 kernels (no iterative
LAPACK on device). Jacobians use the left-multiplicative perturbation
exp(xi) * T matching ops.se3.pose_retract, with xi = (omega, upsilon);
they are verified against jax.jacobian in tests (the working version of the
reference's disabled check_gradients, src/odomEstimationClass.cpp:104-105).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from .se3 import quat_rotate

_EPS = 1e-12


class EdgeFactors(NamedTuple):
    """Per-query line association (all (Q, ...) batched)."""

    point: jnp.ndarray  # (Q, 3) sensor-frame query point
    pa: jnp.ndarray  # (Q, 3) line endpoint a
    pb: jnp.ndarray  # (Q, 3) line endpoint b
    valid: jnp.ndarray  # (Q,) bool


class SurfFactors(NamedTuple):
    point: jnp.ndarray  # (Q, 3)
    normal: jnp.ndarray  # (Q, 3) unit plane normal
    offset: jnp.ndarray  # (Q,) plane offset d (n.x + d = 0)
    valid: jnp.ndarray  # (Q,) bool


def eigh3x3_psd(A: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Eigenvalues (descending) and principal eigenvector of symmetric PSD
    3x3 matrices, closed form (trigonometric method + Cayley-Hamilton
    eigenvector), batched over leading dims.

    Returns (eigvals (..., 3) descending, principal_dir (..., 3) unit).
    """
    dtype = A.dtype
    tr = jnp.trace(A, axis1=-2, axis2=-1)
    q = tr / 3.0
    eye = jnp.eye(3, dtype=dtype)
    B = A - q[..., None, None] * eye
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    Bn = B / p[..., None, None]
    detBn = jnp.linalg.det(Bn)
    phi = jnp.arccos(jnp.clip(detBn / 2.0, -1.0, 1.0)) / 3.0
    lam0 = q + 2.0 * p * jnp.cos(phi)
    lam2 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam1 = 3.0 * q - lam0 - lam2
    # principal eigenvector: columns of (A - lam1 I)(A - lam2 I) span the
    # lam0 eigenspace (Cayley-Hamilton); pick the largest column.
    M = (A - lam1[..., None, None] * eye) @ (A - lam2[..., None, None] * eye)
    norms = jnp.sum(M * M, axis=-2)  # (..., 3) column sq norms
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(M, best[..., None, None], axis=-1)[..., 0]
    vn = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), _EPS))
    # near-isotropic matrices have no well-defined direction; callers gate on
    # the eigenvalue ratio, so any unit vector works there
    v = jnp.where(vn > 1e-9, v / vn, jnp.asarray([1.0, 0.0, 0.0], dtype))
    evals = jnp.stack([lam0, lam1, lam2], axis=-1)
    return evals, v


def solve3x3(M: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve M x = b for batched 3x3 via adjugate. Returns (x, ok)."""
    c0 = jnp.cross(M[..., :, 1], M[..., :, 2], axis=-1)
    c1 = jnp.cross(M[..., :, 2], M[..., :, 0], axis=-1)
    c2 = jnp.cross(M[..., :, 0], M[..., :, 1], axis=-1)
    det = jnp.sum(M[..., :, 0] * c0, axis=-1)
    ok = jnp.abs(det) > 1e-12
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    adjT = jnp.stack([c0, c1, c2], axis=-2)  # rows of adjugate
    x = jnp.einsum("...ij,...j->...i", adjT, b) * inv_det[..., None]
    return x, ok


def edge_association(
    point: jnp.ndarray,  # (Q, 3) sensor frame
    nn_xyz: jnp.ndarray,  # (Q, 5, 3) map neighbors (world frame)
    nn_sqdist: jnp.ndarray,  # (Q, 5)
    radius_sq: float,
    eig_ratio: float,
    half_length: float,
) -> EdgeFactors:
    """Line fit of the 5 nearest edge-map points (odomEstimationClass.cpp:144-191)."""
    gate = nn_sqdist[:, -1] < radius_sq  # 5th-NN gate (:154)
    center = jnp.mean(nn_xyz, axis=1)  # (Q, 3)
    dm = nn_xyz - center[:, None, :]
    cov = jnp.einsum("qki,qkj->qij", dm, dm)  # sum of outer products (:168-173)
    evals, direction = eigh3x3_psd(cov)
    ok = gate & (evals[:, 0] > eig_ratio * evals[:, 1])  # (:179)
    pa = center + half_length * direction
    pb = center - half_length * direction
    return EdgeFactors(point=point, pa=pa, pb=pb, valid=ok)


def surf_association(
    point: jnp.ndarray,  # (Q, 3)
    nn_xyz: jnp.ndarray,  # (Q, 5, 3)
    nn_sqdist: jnp.ndarray,  # (Q, 5)
    radius_sq: float,
    fit_tol: float,
) -> SurfFactors:
    """5-point plane fit solving A n = -1 (odomEstimationClass.cpp:198-244)."""
    gate = nn_sqdist[:, -1] < radius_sq
    M = jnp.einsum("qki,qkj->qij", nn_xyz, nn_xyz)  # A^T A
    rhs = -jnp.sum(nn_xyz, axis=1)  # A^T (-1)
    n_raw, solvable = solve3x3(M, rhs)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(n_raw * n_raw, axis=-1), _EPS))
    d = 1.0 / norm  # negative_OA_dot_norm (:221)
    n_hat = n_raw / norm[:, None]
    # plane quality: every neighbor within fit_tol of the plane (:224-235)
    resid = jnp.abs(jnp.einsum("qki,qi->qk", nn_xyz, n_hat) + d[:, None])
    plane_ok = jnp.all(resid <= fit_tol, axis=1)
    return SurfFactors(point=point, normal=n_hat, offset=d,
                       valid=gate & solvable & plane_ok)


def _masked_moments(cand_soa, winners, queries):
    """First and second moments of the masked candidates RELATIVE TO THE
    QUERY — pure (Q, C) elementwise + reductions (wide minor dims; no
    gathers, no (Q, C, 3) tensors whose size-3 trailing axis would waste
    ~98% of the 128 VPU lanes). Query-centering keeps the second moments
    O(radius^2) instead of O(|world position|^2), which f32 covariance/
    plane fits need (docs/PERFORMANCE.md)."""
    cx = cand_soa[0] - queries[:, 0:1]
    cy = cand_soa[1] - queries[:, 1:2]
    cz = cand_soa[2] - queries[:, 2:3]
    w = winners.astype(cx.dtype)
    wx, wy, wz = w * cx, w * cy, w * cz
    S1 = jnp.stack([wx.sum(1), wy.sum(1), wz.sum(1)], axis=-1)  # (Q, 3)
    sxx = (wx * cx).sum(1)
    sxy = (wx * cy).sum(1)
    sxz = (wx * cz).sum(1)
    syy = (wy * cy).sum(1)
    syz = (wy * cz).sum(1)
    szz = (wz * cz).sum(1)
    row0 = jnp.stack([sxx, sxy, sxz], axis=-1)
    row1 = jnp.stack([sxy, syy, syz], axis=-1)
    row2 = jnp.stack([sxz, syz, szz], axis=-1)
    S2 = jnp.stack([row0, row1, row2], axis=-2)  # (Q, 3, 3)
    return S1, S2


def edge_association_fused(
    point: jnp.ndarray,  # (Q, 3) sensor frame
    query_world: jnp.ndarray,  # (Q, 3) query position in world frame
    cand_soa,  # (cx, cy, cz), each (Q, C): candidate centroids (world)
    winners: jnp.ndarray,  # (Q, C) bool, exactly k true where gate passes
    kth_d2: jnp.ndarray,  # (Q,)
    k: int,
    radius_sq: float,
    eig_ratio: float,
    half_length: float,
) -> EdgeFactors:
    """Gather-free line fit: the covariance of the k nearest map centroids
    is accumulated as query-centered masked moments over the candidate axis
    instead of extracting the winners. Semantics match edge_association
    (odomEstimationClass.cpp:144-191)."""
    S1, S2 = _masked_moments(cand_soa, winners, query_world)
    center_l = S1 / float(k)
    cov = S2 - float(k) * center_l[:, :, None] * center_l[:, None, :]
    evals, direction = eigh3x3_psd(cov)
    gate = kth_d2 < radius_sq
    ok = gate & (evals[:, 0] > eig_ratio * evals[:, 1])
    center = center_l + query_world
    pa = center + half_length * direction
    pb = center - half_length * direction
    return EdgeFactors(point=point, pa=pa, pb=pb, valid=ok)


def surf_association_fused(
    point: jnp.ndarray,  # (Q, 3)
    query_world: jnp.ndarray,  # (Q, 3)
    cand_soa,  # (cx, cy, cz), each (Q, C)
    winners: jnp.ndarray,  # (Q, C)
    kth_d2: jnp.ndarray,  # (Q,)
    k: int,
    radius_sq: float,
    fit_tol: float,
) -> SurfFactors:
    """Gather-free plane fit via query-centered masked normal-equation
    moments; the per-neighbor fit-quality check becomes a masked max over
    the candidate axis. Semantics match surf_association
    (odomEstimationClass.cpp:198-244) up to the A n = -1 normalization
    being taken about the query instead of the world origin (the
    reference's f64 world-origin fit is ill-conditioned in f32 kilometres
    out; the fitted plane is least-squares either way and the 0.2 m
    quality gate is identical)."""
    S1, M = _masked_moments(cand_soa, winners, query_world)
    rhs = -S1
    n_raw, solvable = solve3x3(M, rhs)
    norm = jnp.sqrt(jnp.maximum(jnp.sum(n_raw * n_raw, axis=-1), _EPS))
    d_local = 1.0 / norm
    n_hat = n_raw / norm[:, None]
    lx = cand_soa[0] - query_world[:, 0:1]
    ly = cand_soa[1] - query_world[:, 1:2]
    lz = cand_soa[2] - query_world[:, 2:3]
    resid = jnp.abs(lx * n_hat[:, 0:1] + ly * n_hat[:, 1:2]
                    + lz * n_hat[:, 2:3] + d_local[:, None])
    max_resid = jnp.max(jnp.where(winners, resid, 0.0), axis=1)
    gate = kth_d2 < radius_sq
    d_world = d_local - jnp.sum(n_hat * query_world, axis=-1)
    return SurfFactors(point=point, normal=n_hat, offset=d_world,
                       valid=gate & solvable & (max_resid <= fit_tol))


def edge_residual_jacobian(q, t, f: EdgeFactors):
    """Batched point-to-line residual + 1x6 Jacobian.

    The residual matches EdgeAnalyticCostFunction (lidarOptimization.cpp:
    12-43); the Jacobian is taken w.r.t. the BODY-frame perturbation
    T * exp(xi) (se3.pose_retract_right) rather than the reference's
    world-frame exp(xi) * T, for f32 conditioning far from the origin.
    """
    from .se3 import quat_conj

    pw = quat_rotate(q[None, :], f.point) + t[None, :]  # (Q, 3)
    u = pw - f.pa
    v = pw - f.pb
    nu = jnp.cross(u, v)
    de = f.pa - f.pb
    nu_n = jnp.sqrt(jnp.maximum(jnp.sum(nu * nu, axis=-1), _EPS))
    de_n = jnp.sqrt(jnp.maximum(jnp.sum(de * de, axis=-1), _EPS))
    r = nu_n / de_n
    # dr/dpw = -(nhat x de)^T / |de|; dpw/dxi_right = R [-[p]_x | I]
    nhat = nu / nu_n[:, None]
    g = -jnp.cross(nhat, de) / de_n[:, None]
    g_body = quat_rotate(quat_conj(q)[None, :], g)  # R^T g
    J_rot = jnp.cross(f.point, g_body)  # (p x R^T g)^T = -g R [p]_x
    J = jnp.concatenate([J_rot, g_body], axis=-1)  # (Q, 6)
    return r, J


def surf_residual_jacobian(q, t, f: SurfFactors):
    """Batched point-to-plane residual + 1x6 Jacobian (residual per
    SurfNormAnalyticCostFunction, lidarOptimization.cpp:51-74; Jacobian in
    the body-frame chart — see edge_residual_jacobian)."""
    from .se3 import quat_conj

    pw = quat_rotate(q[None, :], f.point) + t[None, :]
    r = jnp.sum(f.normal * pw, axis=-1) + f.offset
    n_body = quat_rotate(quat_conj(q)[None, :], f.normal)
    J_rot = jnp.cross(f.point, n_body)
    J = jnp.concatenate([J_rot, n_body], axis=-1)
    return r, J


def sanitize_factors(r: jnp.ndarray, J: jnp.ndarray, valid: jnp.ndarray):
    """Zero the residual/Jacobian rows of invalid (or non-finite) factors
    BEFORE any weighting. Invalid rows can hold non-finite garbage — e.g.
    when a query has fewer than k real candidates, far-sentinel coordinates
    overflow the f32 plane-fit adjugate to inf and the normal becomes NaN —
    and ``NaN * 0 == NaN`` would otherwise poison the accumulated normal
    equations for the WHOLE scan (every factor sums into the same 6x6 H).
    Returns (r, J, valid) with the mask also cleared on non-finite rows."""
    v = valid & jnp.isfinite(r) & jnp.all(jnp.isfinite(J), axis=-1)
    r = jnp.where(v, r, jnp.zeros_like(r))
    J = jnp.where(v[..., None], J, jnp.zeros_like(J))
    return r, J, v


def robust_weight(r: jnp.ndarray, loss: str, huber_delta: float,
                  cauchy_scale: float) -> jnp.ndarray:
    """IRLS weight w = rho'(r^2) for Ceres-style losses.

    Implements the loss options the reference *intended*: its Cauchy branch
    constructs-and-discards the loss object so it silently runs plain L2
    (src/odomEstimationClass.cpp:83-91, quirk 1). Here "cauchy" is real.
    """
    s = r * r
    if loss == "none":
        return jnp.ones_like(r)
    if loss == "huber":
        absr = jnp.sqrt(jnp.maximum(s, _EPS))
        return jnp.where(absr <= huber_delta, 1.0, huber_delta / absr)
    if loss == "cauchy":
        c2 = cauchy_scale * cauchy_scale
        return 1.0 / (1.0 + s / c2)
    raise ValueError(f"unknown loss {loss!r}")

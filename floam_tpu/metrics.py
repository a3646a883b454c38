"""Trajectory accuracy metrics: ATE, RPE, and KITTI-style segment drift.

The reference has no quantitative evaluation at all (SURVEY.md section 4 —
validation was visual rviz replay); these evaluators back the golden
-trajectory tests and the KITTI benchmark harness demanded by BASELINE.md.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = False):
    """Least-squares rigid alignment dst ~= s R src + t. Returns (s, R, t)."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate(est_t: np.ndarray, gt_t: np.ndarray, align: bool = True
        ) -> Tuple[float, np.ndarray]:
    """Absolute trajectory error RMSE over positions (N, 3)."""
    est_t = np.asarray(est_t, np.float64)
    gt_t = np.asarray(gt_t, np.float64)
    if align and len(est_t) >= 3:
        s, R, t = umeyama_alignment(est_t, gt_t)
        est_t = est_t @ R.T * s + t
    err = np.linalg.norm(est_t - gt_t, axis=1)
    return float(np.sqrt(np.mean(err ** 2))), err


def _pose_mats(quats: np.ndarray, trans: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    from .ops import se3

    R = np.asarray(se3.quat_to_mat(jnp.asarray(quats)))
    T = np.tile(np.eye(4), (len(quats), 1, 1))
    T[:, :3, :3] = R
    T[:, :3, 3] = trans
    return T


def rpe(est_q: np.ndarray, est_t: np.ndarray, gt_q: np.ndarray,
        gt_t: np.ndarray, delta: int = 1) -> Tuple[float, float]:
    """Relative pose error over frame gaps of ``delta``:
    (trans RMSE [m], rot RMSE [rad])."""
    E = _pose_mats(est_q, est_t)
    G = _pose_mats(gt_q, gt_t)
    errs_t, errs_r = [], []
    for i in range(len(E) - delta):
        de = np.linalg.inv(E[i]) @ E[i + delta]
        dg = np.linalg.inv(G[i]) @ G[i + delta]
        err = np.linalg.inv(dg) @ de
        errs_t.append(np.linalg.norm(err[:3, 3]))
        c = np.clip((np.trace(err[:3, :3]) - 1) / 2, -1.0, 1.0)
        errs_r.append(np.arccos(c))
    return (float(np.sqrt(np.mean(np.square(errs_t)))),
            float(np.sqrt(np.mean(np.square(errs_r)))))


_KITTI_LENGTHS = (100.0, 200.0, 300.0, 400.0, 500.0, 600.0, 700.0, 800.0)


def kitti_drift(est_q, est_t, gt_q, gt_t,
                lengths=_KITTI_LENGTHS) -> Tuple[float, float]:
    """KITTI odometry metric: average translational drift (fraction) and
    rotational drift (rad/m) over trajectory segments of fixed lengths."""
    E = _pose_mats(np.asarray(est_q), np.asarray(est_t))
    G = _pose_mats(np.asarray(gt_q), np.asarray(gt_t))
    dist = np.concatenate([[0.0], np.cumsum(
        np.linalg.norm(np.diff(np.asarray(gt_t), axis=0), axis=1))])

    t_errs, r_errs = [], []
    step = 10  # devkit rule: every 10th frame is a segment start
    for first in range(0, len(E), step):
        for L in lengths:
            last = np.searchsorted(dist, dist[first] + L)
            if last >= len(E):
                break
            dg = np.linalg.inv(G[first]) @ G[last]
            de = np.linalg.inv(E[first]) @ E[last]
            err = np.linalg.inv(dg) @ de
            t_errs.append(np.linalg.norm(err[:3, 3]) / L)
            c = np.clip((np.trace(err[:3, :3]) - 1) / 2, -1.0, 1.0)
            r_errs.append(np.arccos(c) / L)
    if not t_errs:
        return float("nan"), float("nan")
    return float(np.mean(t_errs)), float(np.mean(r_errs))

"""End-to-end scan-to-map odometry on a synthetic world with exact ground
truth — the golden-trajectory integration test the reference never had
(its validation was visual rosbag replay; SURVEY.md section 4)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from floam_tpu import odometry
from floam_tpu.config import FloamConfig, LidarConfig, OdomConfig
from floam_tpu.ops import features, se3
from floam_tpu import sim
from floam_tpu.types import PointBatch


def small_config() -> FloamConfig:
    return FloamConfig(
        lidar=LidarConfig(num_lines=16, points_per_ring=1024,
                          min_distance=0.5, max_distance=30.0),
        odom=OdomConfig(
            map_resolution=0.2,
            scan_edge_capacity=1024,
            scan_surf_capacity=4096,
            map_edge_table=8192,
            map_surf_table=32768,
            max_outer_iters=6,
        ),
    )


def scan_to_features(scan, cfg):
    edge_mask, surf_mask = features.extract_features(scan, cfg.features)
    flat_xyz = scan.xyz.reshape(-1, 3)
    return (
        PointBatch(xyz=flat_xyz, mask=edge_mask.reshape(-1)),
        PointBatch(xyz=flat_xyz, mask=surf_mask.reshape(-1)),
    )


@pytest.mark.slow
def test_odometry_tracks_ground_truth():
    cfg = small_config()
    world = sim.World.room(size=18.0, height=4.0, num_poles=14, seed=1)
    gt = sim.spiral_trajectory(12, step=0.12, yaw_rate=0.03)

    state = odometry.init_state(cfg, dtype=jnp.float64)
    est_poses = []
    for i, (q, t) in enumerate(gt):
        scan = sim.simulate_scan(world, q, t, cfg.lidar, azimuth_steps=720,
                                 noise=0.0, seed=i)
        edge, surf = scan_to_features(scan, cfg)
        if i == 0:
            # world frame == first sensor frame in this test (gt[0] is not
            # identity, so compare relative trajectories below)
            state = odometry.init_map(state, edge, surf, cfg)
            est_poses.append((np.array([1.0, 0, 0, 0]), np.zeros(3)))
            continue
        state, diag = odometry.odom_step(state, edge, surf, cfg)
        est_poses.append((np.asarray(state.pose.q), np.asarray(state.pose.t)))
        assert int(diag.num_surf_factors) > 100, f"frame {i}: too few surf"

    # ground truth relative to first pose
    q0, t0 = gt[0]
    q0i, t0i = se3.pose_inverse(jnp.asarray(q0), jnp.asarray(t0))
    errs_t, errs_r = [], []
    for (qe, te), (qg, tg) in zip(est_poses, gt):
        qr, tr = se3.pose_compose(q0i, t0i, jnp.asarray(qg), jnp.asarray(tg))
        errs_t.append(float(np.linalg.norm(np.asarray(tr) - te)))
        dq = se3.quat_mul(se3.quat_conj(jnp.asarray(qe)), qr)
        errs_r.append(float(se3.rotation_angle(dq)))
    ate = float(np.sqrt(np.mean(np.square(errs_t))))
    assert ate < 0.05, f"ATE {ate:.4f} m, per-frame {errs_t}"
    assert max(errs_r) < np.deg2rad(1.0), f"rot errs {np.rad2deg(errs_r)}"


def test_opt_count_decay():
    cfg = small_config()
    state = odometry.init_state(cfg, dtype=jnp.float64)
    assert int(state.opt_count) == cfg.odom.min_outer_iters
    e = PointBatch(xyz=jnp.zeros((64, 3)), mask=jnp.zeros(64, bool))
    state = odometry.init_map(state, e, e, cfg)
    assert int(state.opt_count) == cfg.odom.max_outer_iters
    state, _ = odometry.odom_step(state, e, e, cfg)
    assert int(state.opt_count) == cfg.odom.max_outer_iters - 1


def test_empty_map_guard_keeps_prediction():
    """Too-small map: pose must follow the constant-velocity prediction
    (reference quirk 10, src/odomEstimationClass.cpp:77-116)."""
    cfg = small_config()
    state = odometry.init_state(cfg, dtype=jnp.float64)
    # give the state a velocity: pose at x=1, last at x=0
    state = state._replace(
        pose=state.pose._replace(t=jnp.asarray([1.0, 0, 0])),
    )
    e = PointBatch(xyz=jnp.zeros((64, 3)), mask=jnp.zeros(64, bool))
    state2, diag = odometry.odom_step(state, e, e, cfg)
    np.testing.assert_allclose(np.asarray(state2.pose.t), [2.0, 0, 0],
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(state2.last_pose.t), [1.0, 0, 0],
                               atol=1e-9)

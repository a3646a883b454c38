"""End-to-end test of the structor_vlp16 preset — the reference's actual
deployment configuration (launch/structor_odom.launch:9-41): VLP-16, map
leaf 0.1 m, two-phase velocity deskew AND IMU rotational deskew enabled.

The fine 0.1 m leaf is the case that needs the widened packed-index lane
budget (ops/voxelmap._MAX_IDX_BITS = 16): at search radius 1.25 m the edge
side gathers 18,624 candidates/query, past the old 8,192 cap that made
this preset crash at trace time in round 2.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from floam_tpu import sim
from floam_tpu.config import DeskewConfig, FloamConfig, OdomConfig
from floam_tpu.ops import se3
from floam_tpu.pipeline import Pipeline


def test_candidate_budget_validated_at_build_time():
    """Configs whose k-NN candidate count exceeds the packed-index budget
    must fail at CONFIG construction, not at first-scan trace time."""
    cfg = FloamConfig.structor_vlp16()  # must build (18,624 <= 65,536)
    assert cfg.odom.map_resolution == 0.1
    with pytest.raises(ValueError, match="candidates/query"):
        # leaf 0.05 at radius 1.25 needs ~150k candidates: over budget
        FloamConfig(odom=OdomConfig(map_resolution=0.05))


@pytest.mark.slow
def test_structor_vlp16_end_to_end():
    """20-frame indoor run at leaf 0.1 with BOTH deskew paths active:
    per-scan motion skew in the simulator, exact IMU attitude feed, and the
    two-phase velocity-deskew registration. Reduced query budgets keep the
    CPU runtime bounded; the wide-candidate search path (C=18,624 > 8,192)
    is exercised unchanged because it depends only on leaf/supercell/radius."""
    cfg = FloamConfig.structor_vlp16()
    cfg = cfg.replace(
        odom=dataclasses.replace(
            cfg.odom, scan_edge_capacity=512, scan_surf_capacity=1024,
            scan_surf_slots=2048, crop_radius=30.0),
        # the preset's real extrinsic is RPY(0,0,pi); the simulated IMU
        # below reports attitude directly in the lidar frame, so zero it
        deskew=DeskewConfig(enabled=True, extrinsic_rpy=(0.0, 0.0, 0.0)))
    world = sim.World.room(size=14.0, height=3.5, num_poles=12, seed=4)
    T = cfg.lidar.scan_period
    num = 20
    step, yaw_rate = 0.08, 0.04
    gt = sim.spiral_trajectory(num, step=step, yaw_rate=yaw_rate,
                               center_z=1.4)
    pipe = Pipeline(cfg, dtype=jnp.float64)
    for ts in np.arange(-0.02, num * T + 0.02, 0.005):
        yaw = yaw_rate * ts / T
        pipe.add_imu(float(ts),
                     np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]))
    for i, (q, t) in enumerate(gt):
        motion = None if i == 0 else ((gt[i][1] - gt[i - 1][1]) / T,
                                      np.array([0, 0, yaw_rate / T]))
        scan = sim.simulate_scan(world, q, t, cfg.lidar, azimuth_steps=720,
                                 seed=i, motion_per_rev=motion)
        pipe.process(scan, stamp=i * T)

    # estimated poses land at mid-sweep (CenterTime re-basing): evaluate
    # against mid-sweep ground truth of the moving frames
    q0, t0 = gt[0]
    q0i, t0i = se3.pose_inverse(jnp.asarray(q0), jnp.asarray(t0))
    errs = []
    for i, (rec, (qg, tg)) in enumerate(zip(pipe.frames, gt)):
        tg_eval = tg if i == 0 else \
            tg + ((gt[i][1] - gt[i - 1][1]) / T) * (T / 2)
        _, tr = se3.pose_compose(q0i, t0i, jnp.asarray(qg),
                                 jnp.asarray(tg_eval))
        errs.append(float(np.linalg.norm(np.asarray(tr) - rec.pose_t)))
    ate = float(np.sqrt(np.mean(np.square(errs))))
    assert ate < 0.15, (ate, errs)
    assert all(np.isfinite(e) for e in errs)

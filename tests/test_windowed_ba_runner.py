"""Windowed BA on the product path: the runner's sliding-window refinement
must improve a degraded odometry trajectory on a long noisy sequence
(in-framework replacement for the reference's exit-time g2o/BALM handoff,
src/utils.cpp:3-78)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from floam_tpu import sim
from floam_tpu.config import BAConfig
from floam_tpu.ops import se3
from floam_tpu.runner import SequenceRunner

from test_odometry import small_config


def _run(cfg, n_frames, noise):
    world = sim.World.room(size=18.0, height=4.0, num_poles=14, seed=1)
    gt = sim.spiral_trajectory(n_frames, step=0.12, yaw_rate=0.03)

    def gen():
        for i, (q, t) in enumerate(gt):
            yield i * 0.1, sim.simulate_scan(world, q, t, cfg.lidar,
                                             azimuth_steps=720, noise=noise,
                                             seed=i)

    q0i, t0i = se3.pose_inverse(jnp.asarray(gt[0][0]), jnp.asarray(gt[0][1]))
    rel = [se3.pose_compose(q0i, t0i, jnp.asarray(q), jnp.asarray(t))
           for q, t in gt]
    gt_q = np.stack([np.asarray(r[0]) for r in rel])
    gt_t = np.stack([np.asarray(r[1]) for r in rel])
    runner = SequenceRunner(cfg, dtype=jnp.float64)
    return runner.run(gen(), gt=(gt_q, gt_t))


def _degraded(cfg):
    """Handicap the front-end (single cheap GN round on noisy scans) so the
    window solve has real error to correct."""
    return dataclasses.replace(
        cfg, odom=dataclasses.replace(
            cfg.odom, max_outer_iters=1, min_outer_iters=1, inner_iters=1,
            adaptive_rounds=False))


@pytest.mark.slow
def test_ba_improves_degraded_odometry():
    base = _degraded(small_config())
    n, noise = 50, 0.02
    cfg_off = dataclasses.replace(base, ba=BAConfig(enabled=False))
    cfg_on = dataclasses.replace(
        base, ba=BAConfig(enabled=True, window=8, every=2, iters=4,
                          prior_weight=10.0))
    r_off = _run(cfg_off, n, noise)
    r_on = _run(cfg_on, n, noise)
    assert r_on.ate_odom is not None  # BA actually ran
    # the raw front-ends are identical up to noise seeds (same config)
    np.testing.assert_allclose(r_on.ate_odom, r_off.ate, rtol=1e-6)
    assert r_on.ate < r_off.ate, (r_on.ate, r_off.ate)


@pytest.mark.slow
def test_ba_window_refines_perturbed_poses():
    """Direct product-path unit: perturbed keyframe poses pulled back
    toward truth by window_ba_from_clouds against a good map."""
    from floam_tpu import odometry
    from floam_tpu.parallel.windowed_ba import window_ba_from_clouds
    from floam_tpu.pipeline import _features_from_scan

    cfg = small_config()
    world = sim.World.room(size=18.0, height=4.0, num_poles=14, seed=2)
    gt = sim.spiral_trajectory(8, step=0.12, yaw_rate=0.03)
    q0i, t0i = se3.pose_inverse(jnp.asarray(gt[0][0]), jnp.asarray(gt[0][1]))

    state = odometry.init_state(cfg, dtype=jnp.float64)
    clouds, poses = [], []
    for i, (q, t) in enumerate(gt):
        scan = sim.simulate_scan(world, q, t, cfg.lidar, azimuth_steps=720,
                                 seed=i)
        edge, surf = _features_from_scan(scan, cfg)
        rq, rt = se3.pose_compose(q0i, t0i, jnp.asarray(q), jnp.asarray(t))
        pose_gt = (np.asarray(rq), np.asarray(rt))
        if i == 0:
            state = odometry.init_map(state, edge, surf, cfg)
        else:
            # build the map from ground-truth poses (frozen good geometry)
            from floam_tpu.types import PointBatch
            ew = se3.quat_rotate(jnp.asarray(rq)[None], edge.xyz) + \
                jnp.asarray(rt)
            sw = se3.quat_rotate(jnp.asarray(rq)[None], surf.xyz) + \
                jnp.asarray(rt)
            from floam_tpu.ops import voxelmap
            em = voxelmap.insert(state.map.edge, ew, edge.mask)
            sm = voxelmap.insert(state.map.surf, sw, surf.mask)
            state = state._replace(map=state.map._replace(
                edge=em, surf=sm,
                edge_view=voxelmap.pack_query_view(em),
                surf_view=voxelmap.pack_query_view(sm)))
        clouds.append((edge, surf))
        poses.append(pose_gt)

    rng = np.random.default_rng(0)
    K = len(poses)
    quats, trans = [], []
    for i, (q, t) in enumerate(poses):
        if i == 0:
            quats.append(q), trans.append(t)
            continue
        dq = np.asarray(se3.se3_exp(jnp.asarray(np.concatenate(
            [rng.normal(0, 0.01, 3), rng.normal(0, 0.05, 3)])))[0])
        qn, tn = se3.pose_compose(jnp.asarray(q), jnp.asarray(t),
                                  jnp.asarray(dq),
                                  jnp.asarray(rng.normal(0, 0.0, 3)))
        tn = jnp.asarray(t) + jnp.asarray(rng.normal(0, 0.05, 3))
        quats.append(np.asarray(qn)), trans.append(np.asarray(tn))

    e_xyz = jnp.stack([e.xyz for e, _ in clouds])
    e_mask = jnp.stack([e.mask for e, _ in clouds])
    s_xyz = jnp.stack([s.xyz for _, s in clouds])
    s_mask = jnp.stack([s.mask for _, s in clouds])
    q2, t2 = window_ba_from_clouds(
        state.map, e_xyz, e_mask, s_xyz, s_mask,
        jnp.asarray(np.stack(quats)), jnp.asarray(np.stack(trans)),
        cfg.odom, iters=6, prior_weight=0.0)
    err_before = np.linalg.norm(
        np.stack(trans) - np.stack([t for _, t in poses]), axis=1)
    err_after = np.linalg.norm(
        np.asarray(t2) - np.stack([t for _, t in poses]), axis=1)
    assert err_after[1:].mean() < 0.4 * err_before[1:].mean(), \
        (err_before.mean(), err_after.mean())

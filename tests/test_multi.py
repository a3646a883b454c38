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


@pytest.mark.slow
def test_multi_q16_wire_and_uneven_lanes(tmp_path):
    """q16 wire uploads through MultiSequenceRunner + a lane whose stream
    ends early: the short lane's trajectory must be truncated to its real
    frame count (no frozen-tail duplicates in exports/ATE) and match a
    single-lane run of the same short stream."""
    from floam_tpu.types import RingScan

    cfg = _cfg(ba=False)
    world = sim.World.room(size=18.0, height=4.0, num_poles=12, seed=1)
    B, F = 4, 6
    F_short = 4
    gts = [sim.spiral_trajectory(F if b != 1 else F_short,
                                 step=0.1 + 0.02 * b, yaw_rate=0.02)
           for b in range(B)]

    def wire_stream(b):
        for i, (q, t) in enumerate(gts[b]):
            d = sim.simulate_scan_np(world, q, t, cfg.lidar,
                                     azimuth_steps=360, seed=100 * b + i)
            yield i * 0.1, RingScan.pack_host_q16(
                d["xyz"], d["time"], d["mask"], d["intensity"], cols=512,
                range_m=cfg.lidar.max_distance)

    out = tmp_path / "multi_q16"
    runner = MultiSequenceRunner(cfg, lanes=B, n_devices=4, output_dir=out,
                                 dtype=jnp.float32)
    results = runner.run([wire_stream(b) for b in range(B)])
    assert len(results[1].stamps) == F_short
    assert all(len(results[b].stamps) == F for b in range(B) if b != 1)

    # short lane matches a fresh single-lane run on the same wire stream
    single = SequenceRunner(cfg, dtype=jnp.float32)
    res_s = single.run(wire_stream(1))
    np.testing.assert_allclose(results[1].trans, res_s.trans, atol=5e-3)

    summary = json.loads(
        (out / "seq_01" / "summary.json").read_text())
    assert summary["frames"] == F_short


@pytest.mark.slow
def test_multi_structor_deskew_matches_single(tmp_path):
    """The structor_vlp16 preset (rotational IMU deskew + two-phase
    velocity deskew — the reference's deployment config, README.md:9-16)
    runs under MultiSequenceRunner; lanes match single-lane Pipeline runs
    on the same skewed sweeps + IMU stream."""
    from floam_tpu.config import DeskewConfig, FloamConfig
    from floam_tpu.pipeline import Pipeline

    base = small_config()
    cfg = dataclasses.replace(
        base,
        odom=dataclasses.replace(base.odom, deskew=True),
        deskew=DeskewConfig(enabled=True, extrinsic_rpy=(0.0, 0.0, 0.0)))
    world = sim.World.room(size=18.0, height=4.0, num_poles=14, seed=1)
    B, F = 2, 5
    period = cfg.lidar.scan_period
    yaw_rate = 0.8  # rad/s of in-sweep rotation (the smear deskew removes)
    gt = sim.spiral_trajectory(F, step=0.12, yaw_rate=yaw_rate * period)

    def frames(seed0):
        out = []
        for i, (q, t) in enumerate(gt):
            nxt = gt[i + 1][1] if i + 1 < F else t + (t - gt[i - 1][1])
            motion = ((np.asarray(nxt) - np.asarray(t)) / period,
                      np.array([0.0, 0.0, yaw_rate]))
            s = sim.simulate_scan(world, q, t, cfg.lidar, azimuth_steps=360,
                                  seed=seed0 + i, motion_per_rev=motion)
            out.append(s)
        return out

    # shared world-frame IMU orientation stream (both lanes fly the same
    # trajectory here; per-lane streams are per-lane ImuStreams). Starts
    # AFTER frame 0's sweep begin so BOTH paths skip deskew on the seed
    # frame (the multi runner always skips it at init by design)
    t_imu = np.arange(0.02, F * period + 0.2, 1.0 / 100.0)
    yaw = yaw_rate * t_imu
    quats = np.stack([np.cos(yaw / 2), np.zeros_like(yaw),
                      np.zeros_like(yaw), np.sin(yaw / 2)], axis=1)

    lane_frames = [frames(0) for _ in range(B)]  # identical lanes

    def lane_stream(b):
        fed = 0
        for i, s in enumerate(lane_frames[b]):
            stamp = i * period
            # feed IMU covering this scan with the item (deterministic)
            hi = np.searchsorted(t_imu, stamp + 2 * period)
            batch = [(float(t_imu[k]), quats[k]) for k in range(fed, hi)]
            fed = hi
            yield stamp, s, batch

    runner = MultiSequenceRunner(cfg, lanes=B, n_devices=2,
                                 dtype=jnp.float64)
    results = runner.run([lane_stream(b) for b in range(B)])

    # single-lane reference: Pipeline with the same scans + IMU stream
    pipe = Pipeline(cfg, dtype=jnp.float64)
    for ts_, qv in zip(t_imu, quats):
        pipe.add_imu(float(ts_), qv)
    for i, s in enumerate(lane_frames[0]):
        pipe.process(s, i * period)
    _, qs, ts = pipe.trajectory()
    np.testing.assert_allclose(results[0].trans, ts, atol=2e-2)
    np.testing.assert_allclose(results[1].trans, results[0].trans,
                               atol=1e-9)

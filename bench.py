"""Benchmark: steady-state scan-to-map odometry throughput on one TPU chip.

Workload: synthetic HDL-64 sequence (64 rings x 1800 azimuth steps,
~115k points/scan after range gating) through the full jitted per-scan
program — feature extraction, hash-table voxel downsample, grid 5-NN
association, IRLS Gauss-Newton, keyframe-gated map update — i.e. the
reference's laserProcessing + odomEstimation pipeline
(BASELINE.json config 2).

Prints ONE JSON line:
  {"metric": "scans_per_sec_per_chip", "value": N, "unit": "scans/s",
   "vs_baseline": N / 20.0, ...}
vs_baseline compares against upstream F-LOAM's ~20 Hz desktop-CPU
processing rate (BASELINE.md; the repo itself publishes no numbers).
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))

NUM_SCANS = 12
REPS = 4
#: bump when sim geometry / scan generation semantics change, so stale
#: caches can never be silently re-benchmarked
SIM_VERSION = 3
#: rotational-skew workload parameters: a fast handheld-style yaw
#: (the smear IMU deskew exists to remove — reference README.md:9-16)
SKEW_YAW_RATE = 1.2  # rad/s -> 6.9 deg of smear per 0.1 s sweep
SKEW_SPEED = 3.0  # m/s
IMU_HZ = 200.0


def _cache_path(cfg, skew: bool) -> Path:
    """Cache file keyed on everything that shapes the scans: a silent
    geometry/config change must miss the cache, not re-benchmark old
    scans."""
    import dataclasses
    import hashlib

    key = repr((SIM_VERSION, NUM_SCANS, skew,
                dataclasses.asdict(cfg.lidar)))
    h = hashlib.sha256(key.encode()).hexdigest()[:12]
    return Path(__file__).parent / f".bench_scans_{h}.npz"


def get_scans(cfg, skew: bool = False):
    """Simulated HDL-64 benchmark scans (cached).

    ``skew=True`` generates ROTATIONALLY skewed sweeps — SKEW_YAW_RATE of
    continuous yaw plus SKEW_SPEED translation DURING each revolution
    (sim motion_per_rev) — together with a synthetic IMU orientation
    stream at IMU_HZ. This is the handheld-rig smear the fork's IMU
    deskew exists to remove (reference README.md:9-16,
    dataHandler.cpp:93-122); scan-to-map registration absorbs pure
    constant-velocity smear on its own (measured,
    docs/budget_sweep_bench.jsonl), so rotation is where deskew must
    prove itself. Returns (scans, gt_t, imu) with imu=(stamps, quats)."""
    from floam_tpu import sim

    cache = _cache_path(cfg, skew)
    if cache.exists():
        data = np.load(cache)
        imu = (data["imu_stamps"], data["imu_quats"]) if skew else None
        return ([dict(xyz=data["xyz"][i], time=data["time"][i],
                      mask=data["mask"][i], intensity=data["intensity"][i])
                 for i in range(NUM_SCANS)], data["gt_t"], imu)
    world = sim.World.room(size=50.0, height=6.0, num_poles=30, seed=0)
    period = cfg.lidar.scan_period
    if skew:
        step = SKEW_SPEED * period
        yaw_rate = SKEW_YAW_RATE * period  # per frame
    else:
        step, yaw_rate = 0.15, 0.02
    gt = sim.spiral_trajectory(NUM_SCANS, step=step, yaw_rate=yaw_rate,
                               center_z=1.5)
    xyzs, times, masks, intens, gts = [], [], [], [], []
    for i, (q, t) in enumerate(gt):
        motion = None
        if skew:
            # continuous motion matching the inter-frame trajectory step
            nxt = gt[i + 1][1] if i + 1 < len(gt) else \
                t + (t - gt[i - 1][1])
            motion = ((np.asarray(nxt) - np.asarray(t)) / period,
                      np.array([0.0, 0.0, yaw_rate / period]))
        s = sim.simulate_scan(world, q, t, cfg.lidar, azimuth_steps=1800,
                              seed=i, motion_per_rev=motion)
        xyzs.append(np.asarray(s.xyz, np.float32))
        times.append(np.asarray(s.time, np.float32))
        masks.append(np.asarray(s.mask))
        intens.append(np.asarray(s.intensity, np.float32))
        gts.append(t)
    payload = dict(xyz=np.stack(xyzs), time=np.stack(times),
                   mask=np.stack(masks), intensity=np.stack(intens),
                   gt_t=np.stack(gts))
    imu = None
    if skew:
        # world-frame orientation stream covering the sweeps with margin
        # (the yaw of the trajectory is continuous in absolute time)
        t_imu = np.arange(-0.15, NUM_SCANS * period + 0.15, 1.0 / IMU_HZ)
        yaw = (yaw_rate / period) * t_imu
        quats = np.stack([np.cos(yaw / 2), np.zeros_like(yaw),
                          np.zeros_like(yaw), np.sin(yaw / 2)], axis=1)
        payload["imu_stamps"] = t_imu
        payload["imu_quats"] = quats
        imu = (t_imu, quats)
    np.savez_compressed(cache, **payload)
    return ([dict(xyz=xyzs[i], time=times[i], mask=masks[i],
                  intensity=intens[i]) for i in range(NUM_SCANS)],
            np.stack(gts), imu)


def bench_single(cfg, scans, gt_t, imu=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from floam_tpu.pipeline import Pipeline

    pipe = Pipeline(cfg, dtype=jnp.float32)
    if imu is not None:
        # feed the whole orientation stream up front (stamps repeat across
        # bench reps; the deskew window lookup only needs coverage)
        for ts, q in zip(*imu):
            pipe.add_imu(float(ts), q)
    # warmup: init + compile + let opt_count decay to steady state
    for i, s in enumerate(scans):
        pipe.process(s, 0.1 * i)
    jax.block_until_ready(pipe.state.pose.t)

    t0 = time.perf_counter()
    n = 0
    for rep in range(REPS):
        for i, s in enumerate(scans[1:], start=1):
            pipe.process(s, 0.1 * i)
            n += 1
    jax.block_until_ready(pipe.state.pose.t)
    dt = time.perf_counter() - t0

    est_t = np.stack([f.pose_t for f in pipe.frames[:NUM_SCANS]])
    gt_rel = gt_t - gt_t[0]
    ate = float(np.sqrt(np.mean(np.sum((est_t - gt_rel) ** 2, axis=1))))
    return n / dt, ate


def bench_batched(cfg, scans, batch=8):
    """Aggregate throughput over `batch` independent sequences advanced in
    lockstep by one vmapped step (the sequence-level data-parallel axis)."""
    import functools

    import jax
    import jax.numpy as jnp

    from floam_tpu import odometry
    from floam_tpu.parallel.batch import batched_init_state
    from floam_tpu.pipeline import _features_from_scan, full_step

    B = batch
    bscans = [jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), s) for s in scans]
    step = jax.jit(jax.vmap(functools.partial(full_step, cfg=cfg)),
                   donate_argnums=(0,))
    states = batched_init_state(cfg, B, dtype=jnp.float32)
    e, s0 = jax.vmap(lambda sc: _features_from_scan(sc, cfg))(bscans[0])
    states = jax.vmap(
        lambda st, a, b: odometry.init_map_impl(st, a, b, cfg)
    )(states, e, s0)
    for sc in bscans[1:]:
        states, diag = step(states, sc)
    jax.block_until_ready(states.pose.t)
    t0 = time.perf_counter()
    n = 0
    for rep in range(REPS):
        for sc in bscans[1:]:
            states, diag = step(states, sc)
            n += B
    jax.block_until_ready(states.pose.t)
    return n / (time.perf_counter() - t0)


def bench_multi_lane(cfg, raw_scans, gt_t, lanes: int = 4, reps: int = 3):
    """Multi-lane PRODUCT rate on the available chip(s): B independent
    sequences through MultiSequenceRunner with q16 wire uploads — the
    deployment axis the multi-chip runner exists for, measured end to end
    (host packing + upload + lockstep device steps). Returns
    (lane_scans_per_sec, mean_per_lane_ate)."""
    import time as _time

    import numpy as np

    from floam_tpu.multi import MultiSequenceRunner
    from floam_tpu.types import RingScan

    wires = [RingScan.pack_host_q16(s["xyz"], s["time"], s["mask"],
                                    s["intensity"], cols=2048,
                                    range_m=cfg.lidar.max_distance)
             for s in raw_scans]

    def lane_stream(n_reps):
        def gen():
            f = 0
            for r in range(n_reps):
                for w in (wires if r == 0 else wires[1:]):
                    yield 0.1 * f, w
                    f += 1
        return gen()

    # warm runner: compiles the sharded q16 step (persistent cache makes
    # the timed runner's retrace cheap)
    warm = MultiSequenceRunner(cfg, lanes=lanes, n_devices=1)
    warm.run([lane_stream(1) for _ in range(lanes)])

    runner = MultiSequenceRunner(cfg, lanes=lanes, n_devices=1)
    gt_rel = gt_t - gt_t[0]
    gt_q = np.tile(np.array([1.0, 0, 0, 0]), (len(gt_rel), 1))
    t0 = _time.perf_counter()
    results = runner.run([lane_stream(reps) for _ in range(lanes)],
                         gt=[(gt_q, gt_rel)] * lanes)
    wall = _time.perf_counter() - t0
    n_frames = len(results[0].stamps)
    rate = lanes * n_frames / wall
    ates = [r.ate for r in results if r.ate is not None]
    return rate, float(np.mean(ates)) if ates else None


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent / ".jax_cache"))
    import jax.numpy as jnp

    from floam_tpu.config import FloamConfig
    from floam_tpu.types import RingScan

    cfg = FloamConfig.kitti_hdl64()

    def upload(raw):
        return [RingScan(xyz=jnp.asarray(s["xyz"]),
                         intensity=jnp.asarray(s["intensity"]),
                         time=jnp.asarray(s["time"]),
                         mask=jnp.asarray(s["mask"])) for s in raw]

    raw_scans, gt_t, _ = get_scans(cfg)
    scans = upload(raw_scans)

    single_rate, ate = bench_single(cfg, scans, gt_t)
    batch = 8
    batched_rate = bench_batched(cfg, scans, batch=batch)
    headline = max(single_rate, batched_rate)

    # BASELINE config 4: IMU rotational deskew on ROTATIONALLY skewed
    # sweeps (1.2 rad/s of in-sweep yaw — the handheld smear the fork
    # exists to remove, README.md:9-16, dataHandler.cpp:93-122).
    # vanilla-on-skewed is the control: deskew must beat it on accuracy.
    # (Pure constant-velocity smear needs no deskew here — scan-to-map
    # registration absorbs it; measured in docs/budget_sweep_bench.jsonl.)
    import dataclasses

    from floam_tpu.config import DeskewConfig

    raw_skew, gt_skew, imu_skew = get_scans(cfg, skew=True)
    skew_scans = upload(raw_skew)
    cfg_deskew = dataclasses.replace(
        cfg, deskew=DeskewConfig(enabled=True,
                                 extrinsic_rpy=(0.0, 0.0, 0.0)))
    deskew_rate, deskew_ate = bench_single(cfg_deskew, skew_scans, gt_skew,
                                           imu=imu_skew)
    _, skewed_ate_no_deskew = bench_single(cfg, skew_scans, gt_skew)

    # Long-horizon accuracy + PRODUCT-LOOP throughput: 240-frame outdoor
    # circuit with revisits and 2 cm range noise through the full
    # SequenceRunner — scans stream host->device through the quantized
    # chunked wire format exactly as a deployment would (the committed
    # replay-validation analogue, /root/reference/README.md:59-67; drift
    # metric = KITTI devkit rule). Default config = BA off (the committed
    # ablation decision, docs/ba_ablation.jsonl); a BA-on run is reported
    # alongside for the refinement-mode numbers.
    sys.path.insert(0, str(Path(__file__).parent / "scripts"))
    from longrun_sim import run_longrun

    # short warm pass first: the streaming programs (q16 decode variant of
    # the fused step, BA window) compile on first use in this process, and
    # the persistent cache does not reliably carry executables across
    # processes on this runtime — measure the product loop warm, which is
    # the state any deployment sits in after its first seconds
    run_longrun(frames=24, noise=0.02, workers=8, ba=False)
    run_longrun(frames=24, noise=0.02, workers=8, ba=True)
    run_longrun(frames=24, noise=0.02, workers=8, ba=False,
                with_global_map=True)
    longrun = run_longrun(frames=240, noise=0.02, workers=8, ba=False)
    longrun_ba = run_longrun(frames=240, noise=0.02, workers=8, ba=True)
    # FULL SLAM (BASELINE config 3): odometry + the global-map feed
    # (the reference's third executable, laserMappingNode.cpp:52-101)
    # on the same streaming loop — the map worker decodes the q16 wire on
    # the host and re-voxelizes in batches off the critical path
    longrun_map = run_longrun(frames=240, noise=0.02, workers=8, ba=False,
                              with_global_map=True)

    # LOOP CLOSURE (the pose-graph back-end, floam_tpu.posegraph): a
    # 2.6-loop circuit with the local-map crop tightened to 30 m so
    # revisits happen BEYOND the map's memory — the regime where odometry
    # drift persists and only revisit constraints can close it (with the
    # default 100 m crop the local map itself re-anchors revisits on this
    # small circuit; production-scale loops exceed any crop).
    from floam_tpu.config import LoopClosureConfig

    cfg_lc_base = FloamConfig.kitti_hdl64(crop_radius=30.0)
    loop_frames = 520
    lr_off = run_longrun(frames=loop_frames, noise=0.02, workers=8,
                         ba=False, cfg=cfg_lc_base)
    cfg_lc = dataclasses.replace(
        cfg_lc_base, loop=LoopClosureConfig(enabled=True))
    lr_on = run_longrun(frames=loop_frames, noise=0.02, workers=8,
                        ba=False, cfg=cfg_lc)

    # MULTI-LANE product rate: 4 sequences in lockstep on the one chip
    multi_lane_rate, multi_lane_ate = bench_multi_lane(
        cfg, raw_scans, gt_t, lanes=4, reps=3)

    print(json.dumps({
        "metric": "scans_per_sec_per_chip",
        "value": round(headline, 2),
        "unit": "scans/s",
        "vs_baseline": round(headline / 20.0, 2),
        "single_stream_rate": round(single_rate, 2),
        "batched_rate": round(batched_rate, 2),
        "batch": batch,
        "ms_per_scan_single": round(1e3 / single_rate, 2),
        "synthetic_ate_m": round(ate, 4),
        "deskew_rate": round(deskew_rate, 2),
        "deskew_ate_m": round(deskew_ate, 4),
        "skewed_ate_no_deskew_m": round(skewed_ate_no_deskew, 4),
        "longrun_frames": longrun["frames"],
        "longrun_ate_m": longrun["longrun_ate_m"],
        "longrun_drift_pct": longrun["longrun_drift_pct"],
        "longrun_rate": longrun["longrun_rate"],
        "longrun_rate_steady": longrun["longrun_rate_steady"],
        "longrun_ba_ate_m": longrun_ba["longrun_ate_m"],
        "longrun_ba_rate": longrun_ba["longrun_rate"],
        "longrun_map_rate": longrun_map["longrun_rate"],
        "longrun_map_rate_steady": longrun_map["longrun_rate_steady"],
        "longrun_map_ate_m": longrun_map["longrun_ate_m"],
        "longrun_map_points": longrun_map["map_points"],
        "loop_frames": loop_frames,
        "loop_ate_m": lr_on["longrun_ate_m"],
        "loop_odom_ate_m": lr_off["longrun_ate_m"],
        "loop_rate": lr_on["longrun_rate"],
        "multi_lane_rate": round(multi_lane_rate, 2),
        "multi_lane_ate_m": round(multi_lane_ate, 4)
            if multi_lane_ate is not None else None,
        "points_per_scan": int(raw_scans[0]["mask"].sum()),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

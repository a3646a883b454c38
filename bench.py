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
SIM_VERSION = 2


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
    """Simulated HDL-64 benchmark scans (cached). ``skew=True`` generates
    motion-skewed sweeps (continuous 10 m/s translation + 0.2 rad/s yaw
    during each revolution via sim motion_per_rev) — the input the deskew
    path exists for (reference README.md:9-16, dataHandler.cpp:82-122)."""
    from floam_tpu import sim

    cache = _cache_path(cfg, skew)
    if cache.exists():
        data = np.load(cache)
        return ([dict(xyz=data["xyz"][i], time=data["time"][i],
                      mask=data["mask"][i], intensity=data["intensity"][i])
                 for i in range(NUM_SCANS)], data["gt_t"])
    world = sim.World.room(size=50.0, height=6.0, num_poles=30, seed=0)
    if skew:
        step, yaw_rate = 1.0, 0.02  # 10 m/s + 0.2 rad/s at 10 Hz
    else:
        step, yaw_rate = 0.15, 0.02
    gt = sim.spiral_trajectory(NUM_SCANS, step=step, yaw_rate=yaw_rate,
                               center_z=1.5)
    period = cfg.lidar.scan_period
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
    np.savez_compressed(cache, xyz=np.stack(xyzs), time=np.stack(times),
                        mask=np.stack(masks), intensity=np.stack(intens),
                        gt_t=np.stack(gts))
    return ([dict(xyz=xyzs[i], time=times[i], mask=masks[i],
                  intensity=intens[i]) for i in range(NUM_SCANS)],
            np.stack(gts))


def bench_single(cfg, scans, gt_t):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from floam_tpu.pipeline import Pipeline

    pipe = Pipeline(cfg, dtype=jnp.float32)
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

    raw_scans, gt_t = get_scans(cfg)
    scans = upload(raw_scans)

    single_rate, ate = bench_single(cfg, scans, gt_t)
    batch = 8
    batched_rate = bench_batched(cfg, scans, batch=batch)
    headline = max(single_rate, batched_rate)

    # BASELINE config 4: the two-phase deskew registration
    # (UpdatePointsToMapSelector, src/odomEstimationClass.cpp:34-50 —
    # registers twice per scan, so roughly half the vanilla rate), run on
    # MOTION-SKEWED scans — the input deskew exists for (README.md:9-16).
    # vanilla-on-skewed is the control: deskew must beat it on accuracy.
    raw_skew, gt_skew = get_scans(cfg, skew=True)
    skew_scans = upload(raw_skew)
    cfg_deskew = FloamConfig.kitti_hdl64(deskew=True)
    deskew_rate, deskew_ate = bench_single(cfg_deskew, skew_scans, gt_skew)
    _, skewed_ate_no_deskew = bench_single(cfg, skew_scans, gt_skew)

    # Long-horizon accuracy: 240-frame outdoor circuit with revisits and
    # 2 cm range noise, through the full product SequenceRunner (windowed
    # BA on) — the committed replay-validation analogue
    # (/root/reference/README.md:59-67; drift metric = KITTI devkit rule)
    sys.path.insert(0, str(Path(__file__).parent / "scripts"))
    from longrun_sim import run_longrun

    longrun = run_longrun(frames=240, noise=0.02, workers=8)

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
        "longrun_ate_odom_m": longrun["longrun_ate_odom_m"],
        "longrun_drift_pct": longrun["longrun_drift_pct"],
        "longrun_rate": longrun["longrun_rate"],
        "longrun_rate_steady": longrun["longrun_rate_steady"],
        "points_per_scan": int(raw_scans[0]["mask"].sum()),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()

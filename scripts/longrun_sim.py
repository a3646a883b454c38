"""Long-horizon accuracy evaluation: 240-frame outdoor circuit with revisits.

The north-star accuracy target (KITTI 00-10 ATE) is unmeasurable without the
dataset; this is the closest available proxy: an outdoor-scale scene
(200 m extent, building-like boxes + ground plane + pole rows), a 300 m
closed circuit at KITTI-like speed (1.25 m/frame = 12.5 m/s at 10 Hz) with
map revisits after the first loop, scored with ATE + the KITTI devkit
segment-drift metric (every-10-frames start rule, 100-800 m segments).

Usage: python scripts/longrun_sim.py [--frames 240] [--noise 0.02]
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


_scan_cache: dict = {}


def run_longrun(frames: int = 240, noise: float = 0.0, azimuth_steps: int = 720,
                num_buildings: int = 16, workers: int = 2, ba: bool = True,
                progress_every: int = 0, cfg=None, ba_overrides=None,
                return_timers: bool = False, with_global_map: bool = False,
                output_dir=None, sim_stressors=None, moving_objects: int = 0):
    """Returns dict with ate_m, ate_odom_m, drift_pct, scans_per_sec.

    ``cfg`` overrides the default kitti_hdl64 config; ``ba_overrides`` is a
    dict of BAConfig field replacements (window/every/iters/budgets/...).
    Simulated scans are memoized per (frames, noise, azimuth) within the
    process so ablation sweeps pay scan generation once."""
    import dataclasses

    from floam_tpu import sim
    from floam_tpu.config import FloamConfig
    from floam_tpu.runner import SequenceRunner
    from floam_tpu.types import RingScan

    cfg = cfg or FloamConfig.kitti_hdl64()
    world = sim.World.outdoor(extent=200.0, num_buildings=num_buildings,
                              num_poles=36, path_radius=40.0, seed=0)
    if moving_objects:
        # pedestrian/vehicle-like movers crossing the corridor (the
        # dynamic-object stressor real data has; sim realism matrix)
        rng = np.random.default_rng(42)
        cyls = list(world.cylinders)
        for _ in range(moving_objects):
            ang = rng.uniform(0, 2 * np.pi)
            r = 40.0 + rng.uniform(-6.0, 6.0)
            speed = rng.uniform(0.5, 2.0)
            va = rng.uniform(0, 2 * np.pi)
            cyls.append(sim.Cylinder(
                float(r * np.cos(ang)), float(r * np.sin(ang)),
                float(rng.uniform(0.15, 0.4)), 0.0,
                float(rng.uniform(1.0, 2.0)),
                vx=float(speed * np.cos(va)), vy=float(speed * np.sin(va))))
        world = dataclasses.replace(world, cylinders=cyls)
    gt = sim.circuit_trajectory(frames, radius=40.0, step=1.25, center_z=1.8)

    t0 = time.perf_counter()
    stress = dict(sim_stressors or {})
    key = (frames, noise, azimuth_steps, num_buildings, moving_objects,
           tuple(sorted(stress.items())))
    if key not in _scan_cache:
        _scan_cache[key] = sim.simulate_sequence(
            world, gt, cfg.lidar, azimuth_steps=azimuth_steps, noise=noise,
            workers=workers, **stress)
    raw = _scan_cache[key]
    gen_s = time.perf_counter() - t0

    from floam_tpu.runner import chunked_device_stream

    def host_stream():
        for i, (xyz, tm, mask, inten) in enumerate(raw):
            # quantized wire format: ~7x fewer host->device bytes than the
            # raw f32 plane (the product loop's bottleneck on slow links)
            yield 0.1 * i, RingScan.pack_host_q16(
                xyz, tm, mask, inten, cols=768,
                range_m=cfg.lidar.max_distance)

    def scan_stream():
        # chunked device upload: one stacked transfer per 8 frames pays
        # the tunneled-runtime upload convoy once per chunk
        return chunked_device_stream(host_stream(), chunk=8)

    if not ba:
        cfg = dataclasses.replace(
            cfg, ba=dataclasses.replace(cfg.ba, enabled=False))
    else:
        over = dict(ba_overrides or {})
        over.setdefault("enabled", True)
        cfg = dataclasses.replace(
            cfg, ba=dataclasses.replace(cfg.ba, **over))
    runner = SequenceRunner(cfg, with_global_map=with_global_map,
                            output_dir=output_dir)
    gt_q = np.stack([q for q, _ in gt])
    gt_t = np.stack([t for _, t in gt])
    res = runner.run(scan_stream(), gt=(gt_q, gt_t),
                     progress_every=progress_every)
    out = {
        "frames": frames,
        "longrun_ate_m": round(res.ate, 4) if res.ate is not None else None,
        "longrun_ate_odom_m": round(res.ate_odom, 4)
            if res.ate_odom is not None else None,
        "longrun_drift_pct": round(res.drift_pct, 4)
            if res.drift_pct is not None else None,
        "longrun_rate": round(res.scans_per_sec, 2),
        "longrun_rate_steady": round(res.scans_per_sec_steady, 2),
        "sim_gen_s": round(gen_s, 1),
    }
    if with_global_map:
        out["map_points"] = int(runner.global_map.num_points)
        out["map_blocks"] = int(runner.global_map.num_blocks)
    if return_timers:
        out["timers_ms"] = {k: round(v * 1e3)
                            for k, v in runner.timers.totals.items()}
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--no-ba", action="store_true")
    ap.add_argument("--workers", type=int, default=2)
    args = ap.parse_args()
    out = run_longrun(frames=args.frames, noise=args.noise,
                      ba=not args.no_ba, workers=args.workers,
                      progress_every=50)
    print(json.dumps(out))

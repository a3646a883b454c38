"""Diagnose the product-runner vs bench throughput gap on the longrun
workload: plain pipeline loop vs cloud-collecting loop vs full
SequenceRunner with and without windowed BA.

Usage: python scripts/diag_runner_gap.py [frames]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    import jax.numpy as jnp

    from floam_tpu import sim
    from floam_tpu.config import FloamConfig
    from floam_tpu.pipeline import Pipeline
    from floam_tpu.runner import SequenceRunner
    from floam_tpu.types import RingScan

    cfg = FloamConfig.kitti_hdl64()
    world = sim.World.outdoor(extent=200.0, num_buildings=16, num_poles=36,
                              path_radius=40.0, seed=0)
    gt = sim.circuit_trajectory(frames, radius=40.0, step=1.25, center_z=1.8)
    t0 = time.perf_counter()
    raw = sim.simulate_sequence(world, gt, cfg.lidar, azimuth_steps=720,
                                noise=0.02, workers=8)
    print(f"simgen {time.perf_counter() - t0:.1f}s", flush=True)
    scans = [RingScan(xyz=jnp.asarray(x), intensity=jnp.asarray(i_),
                      time=jnp.asarray(t), mask=jnp.asarray(m))
             for x, t, m, i_ in raw]
    warm = min(12, frames // 2)

    def time_pipe(collect):
        pipe = Pipeline(cfg, dtype=jnp.float32, collect_clouds=collect)
        for i, s in enumerate(scans[:warm]):
            pipe.process(s, 0.1 * i)
        jax.block_until_ready(pipe.state.pose.t)
        t0 = time.perf_counter()
        for i, s in enumerate(scans[warm:], start=warm):
            pipe.process(s, 0.1 * i)
        jax.block_until_ready(pipe.state.pose.t)
        return (time.perf_counter() - t0) / (frames - warm) * 1e3

    print(f"plain pipeline:   {time_pipe(False):7.2f} ms/frame", flush=True)
    print(f"collect pipeline: {time_pipe(True):7.2f} ms/frame", flush=True)

    def gen():
        for i, s in enumerate(scans):
            yield 0.1 * i, s

    for ba in (False, True):
        c = cfg if ba else cfg.replace(ba=cfg.ba.__class__(enabled=False))
        r = SequenceRunner(c)
        t0 = time.perf_counter()
        res = r.run(gen())
        s = r.meter.summary()
        print(f"runner ba={ba}: total {time.perf_counter() - t0:.1f}s "
              f"rate {res.scans_per_sec:.1f} "
              f"steady {res.scans_per_sec_steady:.1f} "
              f"p50 {s.get('p50_ms', 0):.1f} "
              f"p95 {s.get('p95_ms', 0):.1f}", flush=True)
        print(r.timers.report(), flush=True)


if __name__ == "__main__":
    main()

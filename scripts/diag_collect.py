"""Isolate the collect_clouds overhead: dispatch vs device vs flush."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    import jax.numpy as jnp
    import numpy as np

    from floam_tpu import sim
    from floam_tpu.config import FloamConfig
    from floam_tpu.pipeline import Pipeline
    from floam_tpu.types import RingScan

    cfg = FloamConfig.kitti_hdl64()
    world = sim.World.outdoor(extent=200.0, num_buildings=16, num_poles=36,
                              path_radius=40.0, seed=0)
    gt = sim.circuit_trajectory(40, radius=40.0, step=1.25, center_z=1.8)
    raw = sim.simulate_sequence(world, gt, cfg.lidar, azimuth_steps=720,
                                noise=0.02, workers=8)
    R, C = cfg.lidar.num_lines, cfg.lidar.points_per_ring
    zeros_i = jnp.zeros((R, C), jnp.float32)
    scans = [RingScan(xyz=jnp.asarray(x), intensity=zeros_i,
                      time=jnp.asarray(t), mask=jnp.asarray(m))
             for x, t, m in raw]

    for flush_every in (32, 10_000):
        pipe = Pipeline(cfg, dtype=jnp.float32, collect_clouds=True,
                        cloud_flush_every=flush_every)
        for i, s in enumerate(scans[:12]):
            pipe.process(s, 0.1 * i)
        jax.block_until_ready(pipe.state.pose.t)
        per = []
        for i, s in enumerate(scans[12:], start=12):
            t0 = time.perf_counter()
            pipe.process(s, 0.1 * i)
            jax.block_until_ready(pipe.state.pose.t)
            per.append((time.perf_counter() - t0) * 1e3)
        print(f"flush_every={flush_every}: per-frame synced "
              f"p50 {np.percentile(per, 50):.2f} "
              f"p95 {np.percentile(per, 95):.2f} ms "
              f"mean {np.mean(per):.2f}", flush=True)

    # dispatch-only timing, no flush
    pipe = Pipeline(cfg, dtype=jnp.float32, collect_clouds=True,
                    cloud_flush_every=10_000)
    for i, s in enumerate(scans[:12]):
        pipe.process(s, 0.1 * i)
    jax.block_until_ready(pipe.state.pose.t)
    t0 = time.perf_counter()
    for i, s in enumerate(scans[12:], start=12):
        pipe.process(s, 0.1 * i)
    disp = (time.perf_counter() - t0) / 28 * 1e3
    t0 = time.perf_counter()
    jax.block_until_ready(pipe.state.pose.t)
    drain = (time.perf_counter() - t0) * 1e3
    print(f"dispatch-only {disp:.2f} ms/frame, drain {drain:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()

"""Round-4 diagnosis: why does collect_clouds cost ~50 ms/frame?

Isolates (a) the compiled step program with return_clouds=True vs False,
(b) the _flush_clouds host fetch, (c) holding pending device buffers.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    import functools

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    import jax.numpy as jnp

    from floam_tpu import sim
    from floam_tpu.config import FloamConfig
    from floam_tpu.pipeline import Pipeline, full_step
    from floam_tpu.types import RingScan

    cfg = FloamConfig.kitti_hdl64()
    world = sim.World.outdoor(extent=200.0, num_buildings=16, num_poles=36,
                              path_radius=40.0, seed=0)
    gt = sim.circuit_trajectory(frames, radius=40.0, step=1.25, center_z=1.8)
    raw = sim.simulate_sequence(world, gt, cfg.lidar, azimuth_steps=720,
                                noise=0.02, workers=8)
    scans = [RingScan(xyz=jnp.asarray(x), intensity=jnp.asarray(i_),
                      time=jnp.asarray(t), mask=jnp.asarray(m))
             for x, t, m, i_ in raw]
    warm = 12

    # (a) bare jitted step loops, manual state carry, no flushes
    for collect in (False, True):
        pipe = Pipeline(cfg, collect_clouds=collect,
                        cloud_flush_every=10**9)  # never flush
        for i, s in enumerate(scans[:warm]):
            pipe.process(s, 0.1 * i)
        jax.block_until_ready(pipe.state.pose.t)
        t0 = time.perf_counter()
        for i, s in enumerate(scans[warm:], start=warm):
            pipe.process(s, 0.1 * i)
        jax.block_until_ready(pipe.state.pose.t)
        dt = (time.perf_counter() - t0) / (frames - warm) * 1e3
        print(f"pipeline collect={collect} noflush: {dt:7.2f} ms/frame",
              flush=True)
        if collect:
            t0 = time.perf_counter()
            pipe._flush_clouds()
            print(f"  one flush of {frames - 0} frames: "
                  f"{(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)

    # (c) flush cadence 32 (the default)
    pipe = Pipeline(cfg, collect_clouds=True, cloud_flush_every=32)
    for i, s in enumerate(scans[:warm]):
        pipe.process(s, 0.1 * i)
    jax.block_until_ready(pipe.state.pose.t)
    t0 = time.perf_counter()
    for i, s in enumerate(scans[warm:], start=warm):
        pipe.process(s, 0.1 * i)
    jax.block_until_ready(pipe.state.pose.t)
    dt = (time.perf_counter() - t0) / (frames - warm) * 1e3
    print(f"pipeline collect=True flush32: {dt:7.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()

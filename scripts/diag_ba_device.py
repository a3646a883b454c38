"""Isolate device cost: collect-step+upload vs one windowed-BA call."""
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    import jax.numpy as jnp  # noqa: F401

    from floam_tpu import sim
    from floam_tpu.config import FloamConfig
    from floam_tpu.runner import SequenceRunner
    from floam_tpu.types import RingScan

    cfg = FloamConfig.kitti_hdl64()
    world = sim.World.outdoor(extent=200.0, num_buildings=16, num_poles=36,
                              path_radius=40.0, seed=0)
    gt = sim.circuit_trajectory(48, radius=40.0, step=1.25, center_z=1.8)
    raw = sim.simulate_sequence(world, gt, cfg.lidar, azimuth_steps=720,
                                noise=0.02, workers=8)

    c2 = cfg.replace(ba=dataclasses.replace(cfg.ba, every=10**6))
    r = SequenceRunner(c2)
    for i, (x, t, m) in enumerate(raw[:12]):
        r.pipe.process(RingScan.from_host(x, t, m), 0.1 * i)
    jax.block_until_ready(r.pipe.state.pose.t)
    t0 = time.perf_counter()
    for i, (x, t, m) in enumerate(raw[12:], start=12):
        r.pipe.process(RingScan.from_host(x, t, m), 0.1 * i)
    jax.block_until_ready(r.pipe.state.pose.t)
    print(f"collect step + upload: "
          f"{(time.perf_counter() - t0) / 36 * 1e3:.2f} ms/frame",
          flush=True)

    r2 = SequenceRunner(cfg)
    for i, (x, t, m) in enumerate(raw[:12]):
        r2.pipe.process(RingScan.from_host(x, t, m), 0.1 * i)
        r2._on_keyframe(len(r2.pipe.frames) - 1, r2.pipe.last_clouds)
    jax.block_until_ready(r2.pipe.state.pose.t)
    for rep in range(3):
        t0 = time.perf_counter()
        r2._run_ba()
        _, tt = list(r2._ba_poses.values())[-1]
        jax.block_until_ready(tt)
        print(f"BA call {rep} (device, blocked): "
              f"{(time.perf_counter() - t0) * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Compare scan upload strategies: pre-uploaded vs from_host vs separate
jnp.asarray fields, measured over the same pipeline loop (no flush)."""
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
    gt = sim.circuit_trajectory(48, radius=40.0, step=1.25, center_z=1.8)
    raw = sim.simulate_sequence(world, gt, cfg.lidar, azimuth_steps=720,
                                noise=0.02, workers=8)
    R, C = cfg.lidar.num_lines, cfg.lidar.points_per_ring
    zeros_i = jnp.zeros((R, C), jnp.float32)

    def run(make_scan, label):
        pipe = Pipeline(cfg, dtype=jnp.float32, collect_clouds=True,
                        cloud_flush_every=10_000)
        for i, r3 in enumerate(raw[:12]):
            pipe.process(make_scan(r3), 0.1 * i)
        jax.block_until_ready(pipe.state.pose.t)
        t0 = time.perf_counter()
        for i, r3 in enumerate(raw[12:], start=12):
            pipe.process(make_scan(r3), 0.1 * i)
        jax.block_until_ready(pipe.state.pose.t)
        print(f"{label}: {(time.perf_counter() - t0) / 36 * 1e3:.2f} "
              "ms/frame", flush=True)

    pre = [RingScan(xyz=jnp.asarray(x), intensity=zeros_i,
                    time=jnp.asarray(t), mask=jnp.asarray(m))
           for x, t, m in raw]
    jax.block_until_ready(pre[-1].xyz)
    run(lambda r3, _c=iter(pre + pre): next(_c), "pre-uploaded     ")
    run(lambda r3: RingScan(xyz=jnp.asarray(r3[0]), intensity=zeros_i,
                            time=jnp.asarray(r3[1]),
                            mask=jnp.asarray(r3[2])),
        "3x jnp.asarray   ")
    run(lambda r3: RingScan.from_host(*r3), "from_host packed ")


if __name__ == "__main__":
    main()

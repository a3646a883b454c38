"""Consumer-thread upload test: pass packed HOST arrays straight into the
jitted step (the jit call uploads synchronously on the calling thread,
avoiding the producer-thread upload convoy)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))

    from floam_tpu import sim
    from floam_tpu.config import FloamConfig
    from floam_tpu.pipeline import Pipeline
    from floam_tpu.runner import SequenceRunner
    from floam_tpu.types import RingScan

    cfg = FloamConfig.kitti_hdl64()
    world = sim.World.outdoor(extent=200.0, num_buildings=16, num_poles=36,
                              path_radius=40.0, seed=0)
    gt = sim.circuit_trajectory(240, radius=40.0, step=1.25, center_z=1.8)
    raw = sim.simulate_sequence(world, gt, cfg.lidar, azimuth_steps=720,
                                noise=0.02, workers=8)
    packed_np = [RingScan.pack_host(x, t, m, i_) for x, t, m, i_ in raw]

    for rep in range(2):
        pipe = Pipeline(cfg)
        t0 = time.perf_counter()
        for i, p in enumerate(packed_np):
            pipe.process(p, 0.1 * i)
        jax.block_until_ready(pipe.state.pose.t)
        dt = time.perf_counter() - t0
        print(f"np-arg streamed rep{rep}: {240/dt:6.1f} scans/s "
              f"({dt/240*1e3:.2f} ms/frame)", flush=True)

    def gen():
        for i, p in enumerate(packed_np):
            yield 0.1 * i, p

    for rep in range(2):
        r = SequenceRunner(cfg)
        res = r.run(gen())
        print(f"runner np-arg rep{rep}: rate {res.scans_per_sec:6.1f} "
              f"steady {res.scans_per_sec_steady:6.1f}", flush=True)
        print(" ", {k: round(v * 1e3) for k, v in r.timers.totals.items()},
              flush=True)


if __name__ == "__main__":
    main()

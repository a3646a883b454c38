"""Attribute the longrun product-loop gap: pre-uploaded RingScans vs
pre-uploaded packed planes vs streamed packed planes through the runner.
Usage: python scripts/diag_longrun_path.py [frames]"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 240
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
    gt = sim.circuit_trajectory(frames, radius=40.0, step=1.25,
                                center_z=1.8)
    raw = sim.simulate_sequence(world, gt, cfg.lidar, azimuth_steps=720,
                                noise=0.02, workers=8)
    packed_np = [RingScan.pack_host(x, t, m, i_) for x, t, m, i_ in raw]

    def loop_pipe(scans, label, reps=2):
        for rep in range(reps):
            pipe = Pipeline(cfg)
            t0 = time.perf_counter()
            for i, s in enumerate(scans):
                pipe.process(s, 0.1 * i)
            jax.block_until_ready(pipe.state.pose.t)
            dt = time.perf_counter() - t0
            print(f"{label} rep{rep}: {frames / dt:6.1f} scans/s "
                  f"({dt / frames * 1e3:.2f} ms/frame)", flush=True)

    dev_scans = [RingScan.from_packed(jnp.asarray(p)) for p in packed_np]
    jax.block_until_ready(dev_scans[-1].xyz)
    loop_pipe(dev_scans, "pre-uploaded RingScans ")
    dev_packed = [jnp.asarray(p) for p in packed_np]
    jax.block_until_ready(dev_packed[-1])
    loop_pipe(dev_packed, "pre-uploaded packed    ")

    def gen():
        for i, p in enumerate(packed_np):
            yield 0.1 * i, jnp.asarray(p)

    for rep in range(2):
        r = SequenceRunner(cfg)
        res = r.run(gen())
        print(f"runner streamed rep{rep}: rate {res.scans_per_sec:6.1f} "
              f"steady {res.scans_per_sec_steady:6.1f}", flush=True)
        print("  " + r.timers.report().replace("\n", "\n  "), flush=True)


if __name__ == "__main__":
    main()

"""Per-phase attribution of the BA-enabled runner loop on TPU."""
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
    from floam_tpu.runner import SequenceRunner
    from floam_tpu.types import RingScan

    cfg = FloamConfig.kitti_hdl64()
    world = sim.World.outdoor(extent=200.0, num_buildings=16, num_poles=36,
                              path_radius=40.0, seed=0)
    frames = 64
    gt = sim.circuit_trajectory(frames, radius=40.0, step=1.25,
                                center_z=1.8)
    raw = sim.simulate_sequence(world, gt, cfg.lidar, azimuth_steps=720,
                                noise=0.02, workers=8)
    R, C = cfg.lidar.num_lines, cfg.lidar.points_per_ring
    zeros_i = jnp.zeros((R, C), jnp.float32)

    r = SequenceRunner(cfg)  # BA on, collect on
    t_proc, t_drain, t_ba, t_wait = [], [], [], []
    pending = []
    import floam_tpu.runner as runner_mod
    orig_run_ba = r._run_ba

    def timed_run_ba():
        t0 = time.perf_counter()
        orig_run_ba()
        t_ba.append((time.perf_counter() - t0) * 1e3)
    r._run_ba = timed_run_ba

    for i, (xyz, tm, mask) in enumerate(raw):
        scan = RingScan.from_host(xyz, tm, mask)
        t0 = time.perf_counter()
        rec = r.pipe.process(scan, 0.1 * i)
        t1 = time.perf_counter()
        pending.append((len(r.pipe.frames) - 1, rec, None,
                        r.pipe.last_clouds))
        if len(pending) >= 8:
            jax.block_until_ready(r.pipe.state.pose.t)
            t1b = time.perf_counter()
            t_wait.append((t1b - t1) * 1e3)
            r._drain_keyframes(pending)
        t2 = time.perf_counter()
        t_proc.append((t1 - t0) * 1e3)
        t_drain.append((t2 - t1) * 1e3)
    jax.block_until_ready(r.pipe.state.pose.t)

    def stats(name, xs, skip=8):
        xs = np.asarray(xs[skip:])
        print(f"{name}: mean {xs.mean():.1f} p50 {np.percentile(xs, 50):.1f} "
              f"p95 {np.percentile(xs, 95):.1f} max {xs.max():.1f} ms "
              f"sum {xs.sum():.0f}", flush=True)

    stats("process ", t_proc)
    stats("drain   ", t_drain)
    stats("dev_wait", t_wait, skip=1)
    stats("ba_call ", t_ba, skip=1)
    print(f"ba_calls {len(t_ba)}")


if __name__ == "__main__":
    main()

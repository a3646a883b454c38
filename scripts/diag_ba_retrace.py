"""Check whether the windowed-BA jit retraces across calls in a runner
run, and where drain time goes. Usage: python scripts/diag_ba_retrace.py"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    import jax.numpy as jnp

    from floam_tpu import sim
    from floam_tpu.config import FloamConfig
    from floam_tpu.runner import SequenceRunner
    from floam_tpu.types import RingScan

    cfg = FloamConfig.kitti_hdl64()
    world = sim.World.outdoor(extent=200.0, num_buildings=16, num_poles=36,
                              path_radius=40.0, seed=0)
    gt = sim.circuit_trajectory(60, radius=40.0, step=1.25, center_z=1.8)
    raw = sim.simulate_sequence(world, gt, cfg.lidar, azimuth_steps=720,
                                noise=0.02, workers=8)
    scans = [RingScan(xyz=jnp.asarray(x), intensity=jnp.asarray(i_),
                      time=jnp.asarray(t), mask=jnp.asarray(m))
             for x, t, m, i_ in raw]

    r = SequenceRunner(cfg)

    def gen():
        for i, s in enumerate(scans):
            yield 0.1 * i, s

    r.run(gen())
    fn = r._ba_fn
    try:
        print("ba jit cache size:", fn._cache_size(), flush=True)
    except Exception as e:
        print("cache size unavailable:", e, flush=True)
    print("timers:", {k: (round(v * 1e3), r.timers.counts[k])
                      for k, v in r.timers.totals.items()}, flush=True)
    # immediate double-call with the final window: isolates dispatch cost
    w = r._kf_window
    args = (r.pipe.state.map,
            tuple(e.xyz for _, e, _, _, _ in w),
            tuple(e.mask for _, e, _, _, _ in w),
            tuple(s.xyz for _, _, s, _, _ in w),
            tuple(s.mask for _, _, s, _, _ in w),
            tuple(q for _, _, _, q, _ in w),
            tuple(t for _, _, _, _, t in w))
    for k in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        dt_dispatch = time.perf_counter() - t0
        jax.block_until_ready(out)
        dt_total = time.perf_counter() - t0
        print(f"call {k}: dispatch {dt_dispatch*1e3:.1f} ms, "
              f"complete {dt_total*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

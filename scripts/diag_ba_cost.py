"""Measure the device + dispatch cost of one windowed-BA solve vs one
odometry step, to size the BA budget against the >=100 scans/s target.

Usage: python scripts/diag_ba_cost.py [frames]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    import functools

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(Path(__file__).parent.parent / ".jax_cache"))
    import jax.numpy as jnp

    from floam_tpu import sim
    from floam_tpu.config import FloamConfig
    from floam_tpu.pipeline import Pipeline
    from floam_tpu.parallel.windowed_ba import window_ba_from_clouds
    from floam_tpu.types import RingScan

    cfg = FloamConfig.kitti_hdl64()
    bc = cfg.ba
    world = sim.World.outdoor(extent=200.0, num_buildings=16, num_poles=36,
                              path_radius=40.0, seed=0)
    gt = sim.circuit_trajectory(frames, radius=40.0, step=1.25, center_z=1.8)
    raw = sim.simulate_sequence(world, gt, cfg.lidar, azimuth_steps=720,
                                noise=0.02, workers=8)
    scans = [RingScan(xyz=jnp.asarray(x), intensity=jnp.asarray(i_),
                      time=jnp.asarray(t), mask=jnp.asarray(m))
             for x, t, m, i_ in raw]
    pipe = Pipeline(cfg, collect_clouds=True, keep_clouds=False)
    window = []
    for i, s in enumerate(scans):
        pipe.process(s, 0.1 * i)
        window.append(pipe.last_clouds)
    jax.block_until_ready(pipe.state.pose.t)
    w = window[-bc.window:]
    eb, sb = bc.edge_budget, bc.surf_budget
    e_xyz = jnp.stack([e.xyz[:eb] for e, _ in w])
    e_mask = jnp.stack([e.mask[:eb] for e, _ in w])
    s_xyz = jnp.stack([s.xyz[:sb] for _, s in w])
    s_mask = jnp.stack([s.mask[:sb] for _, s in w])
    rows = jnp.stack([pipe.frames[i]._row for i in range(-bc.window, 0)])
    quats, trans = rows[:, :4], rows[:, 4:7]
    fn = jax.jit(functools.partial(
        window_ba_from_clouds, oc=cfg.odom, iters=bc.iters,
        prior_weight=bc.prior_weight, damping=bc.damping))
    t0 = time.perf_counter()
    out = fn(pipe.state.map, e_xyz, e_mask, s_xyz, s_mask, quats, trans)
    jax.block_until_ready(out)
    print(f"BA compile+run: {(time.perf_counter()-t0)*1e3:.0f} ms",
          flush=True)
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(pipe.state.map, e_xyz, e_mask, s_xyz, s_mask, quats, trans)
        jax.block_until_ready(out)
        print(f"BA steady: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    # one odometry step for scale
    t0 = time.perf_counter()
    pipe.process(scans[-1], 99.0)
    jax.block_until_ready(pipe.state.pose.t)
    print(f"odom step: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Split windowed-BA cost: iters=0 (association/build only) vs iters=4."""
import functools
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
    from floam_tpu.parallel.windowed_ba import window_ba_from_clouds
    from floam_tpu.runner import SequenceRunner
    from floam_tpu.types import RingScan

    cfg = FloamConfig.kitti_hdl64()
    world = sim.World.outdoor(extent=200.0, num_buildings=16, num_poles=36,
                              path_radius=40.0, seed=0)
    gt = sim.circuit_trajectory(14, radius=40.0, step=1.25, center_z=1.8)
    raw = sim.simulate_sequence(world, gt, cfg.lidar, azimuth_steps=720,
                                noise=0.02, workers=8)
    r = SequenceRunner(cfg)
    for i, (x, t, m) in enumerate(raw):
        r.pipe.process(RingScan.from_host(x, t, m), 0.1 * i)
    jax.block_until_ready(r.pipe.state.pose.t)
    bc = cfg.ba
    eb, sb = bc.edge_budget, bc.surf_budget
    win = [(i, e, s) for i, e, s in
           [(len(r.pipe.frames) - 8 + j,
             r.pipe.last_clouds[0], r.pipe.last_clouds[1])
            for j in range(8)]]
    e_xyz = jnp.stack([e.xyz[:eb] for _, e, _ in win])
    e_mask = jnp.stack([e.mask[:eb] for _, e, _ in win])
    s_xyz = jnp.stack([s.xyz[:sb] for _, _, s in win])
    s_mask = jnp.stack([s.mask[:sb] for _, _, s in win])
    quats = jnp.stack([r.pipe.frames[i]._q for i, _, _ in win])
    trans = jnp.stack([r.pipe.frames[i]._t for i, _, _ in win])

    for iters in (0, 1, 4):
        fn = jax.jit(functools.partial(
            window_ba_from_clouds, oc=cfg.odom, iters=iters,
            prior_weight=bc.prior_weight, damping=bc.damping))
        q2, t2 = fn(r.pipe.state.map, e_xyz, e_mask, s_xyz, s_mask, quats,
                    trans)
        jax.block_until_ready(t2)
        t0 = time.perf_counter()
        for _ in range(5):
            q2, t2 = fn(r.pipe.state.map, e_xyz, e_mask, s_xyz, s_mask,
                        quats, trans)
            jax.block_until_ready(t2)
        print(f"iters={iters}: {(time.perf_counter() - t0) / 5 * 1e3:.1f} "
              "ms", flush=True)


if __name__ == "__main__":
    main()

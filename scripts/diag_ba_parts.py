"""Attribute windowed-BA device time: association (build) vs GN refine."""
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
    import numpy as np

    from floam_tpu import sim
    from floam_tpu.config import FloamConfig
    from floam_tpu.parallel.windowed_ba import (ba_refine,
                                                build_window_problem)
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
        r._on_keyframe(len(r.pipe.frames) - 1, r.pipe.last_clouds)
    jax.block_until_ready(r.pipe.state.pose.t)

    bc = cfg.ba
    eb, sb = bc.edge_budget, bc.surf_budget
    e_xyz = jnp.stack([e.xyz[:eb] for _, e, _ in r._kf_window])
    e_mask = jnp.stack([e.mask[:eb] for _, e, _ in r._kf_window])
    s_xyz = jnp.stack([s.xyz[:sb] for _, _, s in r._kf_window])
    s_mask = jnp.stack([s.mask[:sb] for _, _, s in r._kf_window])
    idxs = [i for i, _, _ in r._kf_window]
    quats = jnp.stack([r.pipe.frames[i]._q for i in idxs])
    trans = jnp.stack([r.pipe.frames[i]._t for i in idxs])

    build = jax.jit(functools.partial(build_window_problem, oc=cfg.odom,
                                      prior_weight=bc.prior_weight))
    refine = jax.jit(functools.partial(ba_refine, oc=cfg.odom,
                                       iters=bc.iters, damping=bc.damping))

    prob = build(r.pipe.state.map, e_xyz, e_mask, s_xyz, s_mask, quats,
                 trans)
    jax.block_until_ready(prob.trans)
    out = refine(prob)
    jax.block_until_ready(out.trans)

    for name, fn, arg in (("build ", lambda: build(
            r.pipe.state.map, e_xyz, e_mask, s_xyz, s_mask, quats, trans),
            None), ("refine", lambda: refine(prob), None)):
        t0 = time.perf_counter()
        for _ in range(5):
            res = fn()
            jax.block_until_ready(res.trans)
        print(f"{name}: {(time.perf_counter() - t0) / 5 * 1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()

"""End-to-end differential profiling: run the real pipeline at different
outer-round counts; differences isolate true per-stage costs."""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from floam_tpu import sim  # noqa: E402
from floam_tpu.config import FloamConfig  # noqa: E402
from floam_tpu.pipeline import Pipeline  # noqa: E402
from floam_tpu.types import RingScan  # noqa: E402

base = FloamConfig.kitti_hdl64()
world = sim.World.room(size=50.0, height=6.0, num_poles=30, seed=0)
gt = sim.spiral_trajectory(8, step=0.15, yaw_rate=0.02, center_z=1.5)
scans = []
for i, (q, t) in enumerate(gt):
    s = sim.simulate_scan(world, q, t, base.lidar, azimuth_steps=1800, seed=i)
    scans.append(RingScan(
        xyz=jnp.asarray(np.asarray(s.xyz), jnp.float32),
        intensity=jnp.asarray(np.asarray(s.intensity), jnp.float32),
        time=jnp.asarray(np.asarray(s.time), jnp.float32),
        mask=s.mask))
print("scans ready", flush=True)


def run(tag, cfg, reps=3):
    pipe = Pipeline(cfg, dtype=jnp.float32)
    for i, s in enumerate(scans):
        pipe.process(s, 0.1 * i)
    jax.block_until_ready(pipe.state.pose.t)
    t0 = time.perf_counter()
    n = 0
    for _ in range(reps):
        for i, s in enumerate(scans[1:], 1):
            pipe.process(s, 0.1 * i)
            n += 1
    jax.block_until_ready(pipe.state.pose.t)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{tag:28s} {dt:8.1f} ms/scan", flush=True)
    return dt


r0 = run("0 rounds (feat+map only)", dataclasses.replace(
    base, odom=dataclasses.replace(base.odom, max_outer_iters=0,
                                   min_outer_iters=0)))
r1 = run("1 round", dataclasses.replace(
    base, odom=dataclasses.replace(base.odom, max_outer_iters=1,
                                   min_outer_iters=1)))
r2 = run("2 rounds (steady default)", dataclasses.replace(
    base, odom=dataclasses.replace(base.odom, max_outer_iters=2,
                                   min_outer_iters=2)))
print(f"per-round cost: {r1 - r0:.1f} / {r2 - r1:.1f} ms", flush=True)

# inner GN iters sensitivity
g1 = run("2 rounds, 1 inner GN", dataclasses.replace(
    base, odom=dataclasses.replace(base.odom, max_outer_iters=2,
                                   min_outer_iters=2, inner_iters=1)))
print(f"3 extra inner iters x2 rounds: {r2 - g1:.1f} ms", flush=True)

"""TPU smoke test: compile + time the full per-scan program at HDL-64 scale."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
print("devices:", jax.devices(), flush=True)

sys.path.insert(0, "/root/repo")
from floam_tpu import odometry, sim  # noqa: E402
from floam_tpu.config import FloamConfig  # noqa: E402
from floam_tpu.pipeline import Pipeline  # noqa: E402
from floam_tpu.types import RingScan  # noqa: E402

cfg = FloamConfig.kitti_hdl64()
print("generating synthetic scans...", flush=True)
world = sim.World.room(size=50.0, height=6.0, num_poles=40, seed=0)
gt = sim.spiral_trajectory(12, step=0.15, yaw_rate=0.02, center_z=1.5)
scans = []
for i, (q, t) in enumerate(gt):
    s = sim.simulate_scan(world, q, t, cfg.lidar, azimuth_steps=1800, seed=i)
    scans.append(RingScan(
        xyz=jnp.asarray(np.asarray(s.xyz), jnp.float32),
        intensity=jnp.asarray(np.asarray(s.intensity), jnp.float32),
        time=jnp.asarray(np.asarray(s.time), jnp.float32),
        mask=s.mask,
    ))
print(f"  {len(scans)} scans, ~{int(np.asarray(scans[0].mask).sum())} pts each",
      flush=True)

pipe = Pipeline(cfg, dtype=jnp.float32)
t0 = time.perf_counter()
pipe.process(scans[0], 0.0)
print(f"init_map: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
pipe.process(scans[1], 0.1)
print(f"first step (compile): {time.perf_counter()-t0:.1f}s", flush=True)

jax.block_until_ready(pipe.state.pose.t)
t0 = time.perf_counter()
n = 0
for i in range(2, len(scans)):
    pipe.process(scans[i], 0.1 * i)
    n += 1
jax.block_until_ready(pipe.state.pose.t)
dt = time.perf_counter() - t0
print(f"steady-state (early, high opt_count): {dt/n*1e3:.1f} ms/scan "
      f"-> {n/dt:.1f} scans/s", flush=True)

# steady-state at min opt rounds: keep re-processing the last scans
t0 = time.perf_counter()
m = 0
for rep in range(3):
    for i in range(2, len(scans)):
        pipe.process(scans[i], 0.1 * i)
        m += 1
jax.block_until_ready(pipe.state.pose.t)
dt = time.perf_counter() - t0
print(f"steady-state (opt_count=2): {dt/m*1e3:.1f} ms/scan "
      f"-> {m/dt:.1f} scans/s", flush=True)
for i, f in enumerate(pipe.frames[:len(gt)]):
    print(i, f.pose_t.round(3), "kf" if f.is_keyframe else "")

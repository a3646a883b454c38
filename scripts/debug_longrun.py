"""Per-frame diagnosis of the outdoor circuit tracking failure."""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import functools

import jax
import jax.numpy as jnp

from floam_tpu import odometry, sim
from floam_tpu.config import FloamConfig
from floam_tpu.pipeline import _features_from_scan, full_step
from floam_tpu.types import RingScan

FRAMES = int(sys.argv[1]) if len(sys.argv) > 1 else 30
AZ = int(sys.argv[2]) if len(sys.argv) > 2 else 720

cfg = FloamConfig.kitti_hdl64()
world = sim.World.outdoor(extent=200.0, num_buildings=16, num_poles=36,
                          path_radius=40.0, seed=0)
gt = sim.circuit_trajectory(FRAMES, radius=40.0, step=1.25, center_z=1.8)

t0 = time.perf_counter()
raw = sim.simulate_sequence(world, gt, cfg.lidar, azimuth_steps=AZ,
                            noise=0.0, workers=0)
print(f"sim gen: {time.perf_counter() - t0:.1f}s", flush=True)

R, C = cfg.lidar.num_lines, cfg.lidar.points_per_ring
zeros_i = jnp.zeros((R, C), jnp.float32)


def mkscan(i):
    xyz, tm, mask = raw[i]
    return RingScan(xyz=jnp.asarray(xyz), intensity=zeros_i,
                    time=jnp.asarray(tm), mask=jnp.asarray(mask))


# surf/edge spacing diagnosis on frame 0's feature clouds
edge0, surf0 = jax.jit(functools.partial(_features_from_scan,
                                         cfg=cfg))(mkscan(0))
for name, pb in (("edge", edge0), ("surf", surf0)):
    p = np.asarray(pb.xyz)[np.asarray(pb.mask)]
    print(f"{name}: n={len(p)}", flush=True)
    if len(p) > 10:
        sub = p[:: max(1, len(p) // 500)]
        d2 = ((sub[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2[:, : len(sub)], np.inf) if len(sub) == len(p) \
            else None
        d2s = np.sort(d2, axis=1)
        # 5th-NN distance distribution (gate: < 1.0 m^2)
        k5 = np.sqrt(d2s[:, 5])
        print(f"  5NN dist m: p10={np.percentile(k5,10):.2f} "
              f"p50={np.percentile(k5,50):.2f} p90={np.percentile(k5,90):.2f}"
              f" frac<1.0={np.mean(k5 < 1.0):.2f}", flush=True)

step = jax.jit(functools.partial(full_step, cfg=cfg), donate_argnums=(0,))
state = odometry.init_state(cfg)
e0, s0 = jax.jit(functools.partial(_features_from_scan, cfg=cfg))(mkscan(0))
state = odometry.init_map(state, e0, s0, cfg)
R0 = sim._quat_to_mat_np(gt[0][0])
for i in range(1, FRAMES):
    state, diag = step(state, mkscan(i))
    q_gt, t_gt = gt[i]
    t_world = R0 @ np.asarray(state.pose.t) + gt[0][1]
    err = np.linalg.norm(t_world - t_gt)
    print(f"f{i:03d} kf={int(diag.is_keyframe)} "
          f"e={int(diag.num_edge_factors):5d} "
          f"s={int(diag.num_surf_factors):5d} "
          f"mapE={int(diag.map_edge_points):6d} "
          f"mapS={int(diag.map_surf_points):6d} "
          f"cost={float(diag.cost):9.4f} terr={err:7.3f}", flush=True)

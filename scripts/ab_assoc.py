"""A/B: XLA re-rank chain vs the fused Pallas association kernel
(ops.assoc_kernel), at benchmark shapes on the real chip. Checks parity
first, then times one re-rank round and the full per-scan program with
each backend. Chained iterations (the tunneled runtime caches identical
dispatches). Results recorded in docs/PERFORMANCE.md."""
import dataclasses
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from floam_tpu.config import FloamConfig
from floam_tpu import odometry
from floam_tpu.odometry import _gather_candidates, _solve_from_candidates
from floam_tpu.ops import voxelmap
from floam_tpu.types import MapState, Pose


def with_backend(cfg, backend):
    return dataclasses.replace(
        cfg, odom=dataclasses.replace(cfg.odom, assoc_backend=backend))


def timeit_chained(step, x0, n=100, label=""):
    x = step(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(n):
        x = step(x)
    jax.block_until_ready(x)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:52s} {ms:8.3f} ms")
    return x


def main():
    cfg = FloamConfig.kitti_hdl64()
    oc = cfg.odom
    rng = np.random.default_rng(0)
    state = odometry.init_state(cfg)
    pts = rng.uniform(-40, 40, (120_000, 3)).astype(np.float32)
    em = voxelmap.insert(state.map.edge, jnp.asarray(pts[:30_000]),
                         jnp.ones((30_000,), bool), oc.voxel_count_cap)
    sm = voxelmap.insert(state.map.surf, jnp.asarray(pts),
                         jnp.ones((pts.shape[0],), bool), oc.voxel_count_cap)
    ms_state = MapState(edge=em, surf=sm,
                        edge_view=voxelmap.pack_query_view(em),
                        surf_view=voxelmap.pack_query_view(sm))
    Qe, Qs = oc.scan_edge_capacity, oc.scan_surf_capacity
    e_xyz = jnp.asarray(rng.uniform(-30, 30, (Qe, 3)), jnp.float32)
    s_xyz = jnp.asarray(rng.uniform(-30, 30, (Qs, 3)), jnp.float32)
    e_mask = jnp.ones((Qe,), bool)
    s_mask = jnp.ones((Qs,), bool)
    pose0 = Pose.identity(jnp.float32)

    gather = jax.jit(functools.partial(
        _gather_candidates, oc=oc, margin=oc.assoc_margin))
    cand_e, _, cand_s, _ = gather(pose0, ms_state, ms_state.edge_view,
                                  ms_state.surf_view, e_xyz, s_xyz)
    print("edge cand", cand_e[0].shape, "surf cand", cand_s[0].shape)

    # --- parity ---
    oc_p = with_backend(cfg, "pallas").odom
    solve_x = jax.jit(functools.partial(_solve_from_candidates, oc=oc))
    solve_p = jax.jit(functools.partial(_solve_from_candidates, oc=oc_p))
    px, stx = solve_x(pose0, cand_e, None, cand_s, None, e_xyz, e_mask,
                      s_xyz, s_mask)
    pp, stp = solve_p(pose0, cand_e, None, cand_s, None, e_xyz, e_mask,
                      s_xyz, s_mask)
    print("parity: |dt|", float(jnp.linalg.norm(px.t - pp.t)),
          " dq", float(jnp.linalg.norm(px.q - pp.q)),
          " factors x", int(stx.num_edge), int(stx.num_surf),
          " p", int(stp.num_edge), int(stp.num_surf))

    # --- per-round timing ---
    for label, solve in (("xla", solve_x), ("pallas", solve_p)):
        @jax.jit
        def rerank_step(pose, solve=solve):
            p2, _ = solve(pose, cand_e, None, cand_s, None, e_xyz, e_mask,
                          s_xyz, s_mask)
            return Pose(q=p2.q, t=jnp.tanh(p2.t) * 1e-3)

        timeit_chained(rerank_step, pose0, label=f"re-rank round [{label}]")

    # --- full pipeline timing (bench-identical loop, fewer scans) ---
    import bench
    raw_scans, gt_t = bench.get_scans(cfg)
    from floam_tpu.types import RingScan
    R, C = cfg.lidar.num_lines, cfg.lidar.points_per_ring
    scans = [RingScan(xyz=jnp.asarray(s["xyz"]),
                      intensity=jnp.zeros((R, C), jnp.float32),
                      time=jnp.asarray(s["time"]),
                      mask=jnp.asarray(s["mask"])) for s in raw_scans]
    for label in ("xla", "pallas"):
        c = with_backend(cfg, label)
        rate, ate = bench.bench_single(c, scans, gt_t)
        print(f"full pipeline [{label}]: {rate:8.1f} scans/s "
              f"({1e3 / rate:.2f} ms/scan)  ate {ate:.4f} m")


if __name__ == "__main__":
    main()

"""Experiment 2: B=8 gather cost vs query capacity and edge supercell size."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))

import functools

import jax.numpy as jnp
import numpy as np

from floam_tpu.config import FloamConfig
from floam_tpu.odometry import _search_offsets, _edge_leaf, _surf_leaf
from floam_tpu.ops import se3, voxelmap
from floam_tpu.pipeline import Pipeline, _features_from_scan
from floam_tpu.types import RingScan
import bench


def timeit(fn, *args, n=20, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:52s} {ms:8.3f} ms")
    return out


def main():
    cfg = FloamConfig.kitti_hdl64()
    oc = cfg.odom
    raw, gt = bench.get_scans(cfg)
    R, C = cfg.lidar.num_lines, cfg.lidar.points_per_ring
    scans = [RingScan(xyz=jnp.asarray(s["xyz"]),
                      intensity=jnp.zeros((R, C), jnp.float32),
                      time=jnp.asarray(s["time"]),
                      mask=jnp.asarray(s["mask"])) for s in raw]
    pipe = Pipeline(cfg, dtype=jnp.float32)
    for i, s in enumerate(scans):
        pipe.process(s, 0.1 * i)
    jax.block_until_ready(pipe.state.pose.t)
    state = pipe.state
    feat = jax.jit(functools.partial(_features_from_scan, cfg=cfg))
    edge, surf = feat(scans[-1])
    B = 8
    radius = 1.0

    def bench_side(view, leaf, super_, table, q_xyz, label):
        deltas, valid = _search_offsets(leaf, radius, table, super_)
        bq = jnp.broadcast_to(q_xyz, (B,) + q_xyz.shape)
        bview = jnp.broadcast_to(view, (B,) + view.shape).copy()

        @jax.jit
        def f(views, qs):
            def one(v, q):
                cand, d2 = voxelmap.query_candidates(
                    v, jnp.asarray(leaf, q.dtype), q,
                    jnp.asarray(deltas), jnp.asarray(valid), super_)
                kth, win = voxelmap.select_k_mask(d2, oc.k_neighbors)
                return kth.sum()
            return jax.vmap(one)(views, qs)
        timeit(f, bview, bq, label=f"{label} O={deltas.shape[1]}")

    # current edge S=3
    ecap = {}
    for cap in (2048, 4096):
        cx, _ = voxelmap.compact_points(edge.xyz, edge.mask, cap)
        ecap[cap] = cx
        bench_side(state.map.edge_view, float(np.asarray(state.map.edge.leaf)),
                   3, oc.map_edge_table, cx, f"B=8 edge S=3 Q={cap}")

    # edge S=4: rebuild an S=4 edge map with the same centroids
    c, occ = state.map.edge.centroids()
    vm4 = voxelmap.empty(oc.map_edge_table, _edge_leaf(oc), jnp.float32, 4)
    vm4 = voxelmap.insert(vm4, c, occ, oc.voxel_count_cap, probe_rounds=4)
    view4 = voxelmap.pack_query_view(vm4)
    print("edge S=4 occupancy:", int(vm4.num_occupied()), "vs S=3:",
          int(state.map.edge.num_occupied()))
    for cap in (2048, 4096):
        bench_side(view4, _edge_leaf(oc), 4, oc.map_edge_table, ecap[cap],
                   f"B=8 edge S=4 Q={cap}")

    # surf side: current full 8192 vs compacted 6144
    bench_side(state.map.surf_view, float(np.asarray(state.map.surf.leaf)),
               4, oc.map_surf_table, surf.xyz, "B=8 surf S=4 Q=8192")
    sx, _ = voxelmap.compact_points(surf.xyz, surf.mask, 6144)
    bench_side(state.map.surf_view, float(np.asarray(state.map.surf.leaf)),
               4, oc.map_surf_table, sx, "B=8 surf S=4 Q=6144(compact)")

    # surf S=5 (125 ways -> block 128, rows 4*128=512 f32): fewer offsets?
    c5, occ5 = state.map.surf.centroids()
    vm5 = voxelmap.empty(oc.map_surf_table // 2, _surf_leaf(oc), jnp.float32, 5)
    vm5 = voxelmap.insert(vm5, c5, occ5, oc.voxel_count_cap, probe_rounds=4)
    view5 = voxelmap.pack_query_view(vm5)
    print("surf S=5 occupancy:", int(vm5.num_occupied()), "vs S=4:",
          int(state.map.surf.num_occupied()))
    bench_side(view5, _surf_leaf(oc), 5, oc.map_surf_table // 2, sx,
               "B=8 surf S=5 Q=6144(compact)")


if __name__ == "__main__":
    main()

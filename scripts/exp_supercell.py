"""Experiment 3: supercell-size sweep at compacted query counts (B=8).
Checks whether 2-4 KB rows stay ~row-count-priced, making larger supercells
(fewer offsets) a net win for the k-NN gather."""
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
    print(f"{label:56s} {ms:8.3f} ms")
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
    k = oc.k_neighbors

    def bench_cfg(points_vm, leaf, super_, buckets, q_xyz, label):
        """Rebuild a super_-sized table holding points_vm's centroids."""
        c, occ = points_vm.centroids()
        vm = voxelmap.empty(buckets, leaf, jnp.float32, super_)
        vm = voxelmap.insert(vm, c, occ, oc.voxel_count_cap,
                             probe_rounds=min(8, super_ ** 3))
        dropped = int(points_vm.num_occupied()) - int(vm.num_occupied())
        view = voxelmap.pack_query_view(vm)
        deltas, valid = voxelmap.sub_offset_tables(leaf, super_, radius,
                                                   buckets)
        bq = jnp.broadcast_to(q_xyz, (B,) + q_xyz.shape)
        bview = jnp.broadcast_to(view, (B,) + view.shape).copy()

        @jax.jit
        def f(views, qs):
            def one(v, q):
                cand, d2 = voxelmap.query_candidates(
                    v, jnp.asarray(leaf, q.dtype), q,
                    jnp.asarray(deltas), jnp.asarray(valid), super_)
                kth, win = voxelmap.select_k_mask(d2, k)
                return kth.sum()
            return jax.vmap(one)(views, qs)
        rows = q_xyz.shape[0] * deltas.shape[1]
        timeit(f, bview, bq,
               label=f"{label} O={deltas.shape[1]} rows/lane={rows} "
                     f"drop={dropped} view={view.nbytes>>20}MB")

    eq, _ = voxelmap.compact_points(edge.xyz, edge.mask, 4096)
    sq, _ = voxelmap.compact_points(surf.xyz, surf.mask, 6144)

    el = _edge_leaf(oc)
    sl = _surf_leaf(oc)
    bench_cfg(state.map.edge, el, 3, 8192, eq, "edge S=3 H=8192 Q=4096")
    bench_cfg(state.map.edge, el, 4, 4096, eq, "edge S=4 H=4096 Q=4096")
    bench_cfg(state.map.edge, el, 6, 1024, eq, "edge S=6 H=1024 Q=4096")
    bench_cfg(state.map.edge, el, 8, 512, eq, "edge S=8 H=512  Q=4096")
    bench_cfg(state.map.surf, sl, 4, 8192, sq, "surf S=4 H=8192 Q=6144")
    bench_cfg(state.map.surf, sl, 6, 1024, sq, "surf S=6 H=1024 Q=6144")
    bench_cfg(state.map.surf, sl, 8, 256, sq, "surf S=8 H=256  Q=6144")


if __name__ == "__main__":
    main()

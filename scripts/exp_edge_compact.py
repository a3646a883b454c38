"""Experiment: cut k-NN gather rows by compacting edge queries to the
valid prefix (the (R*S*EPS) slot buffer is mostly padding), and compare
edge-map supercell sizes. Drives VERDICT r1 item 1 (batched throughput)."""
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
from floam_tpu import odometry
from floam_tpu.odometry import _search_offsets, _edge_leaf
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
    print(f"{label:50s} {ms:8.3f} ms")
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
    for s in scans:
        e, sf = feat(s)
        print("valid edges:", int(e.mask.sum()), "/", e.mask.shape[0],
              "  valid surf:", int(sf.mask.sum()), "/", sf.mask.shape[0])

    edge, surf = feat(scans[-1])
    radius = float(oc.nn_radius_sq) ** 0.5
    e_deltas, e_valid = _search_offsets(_edge_leaf(oc), radius,
                                        oc.map_edge_table, oc.map_edge_super)
    print("edge offsets/sub-voxel:", e_deltas.shape)

    def gather_cost(q_xyz, label):
        @jax.jit
        def f(pose_t, st):
            pw = se3.quat_rotate(st.pose.q[None, :], q_xyz) + pose_t
            cand, d2 = voxelmap.query_candidates(
                st.map.edge_view, st.map.edge.leaf, pw,
                jnp.asarray(e_deltas), jnp.asarray(e_valid),
                oc.map_edge_super)
            kth, win = voxelmap.select_k_mask(d2, oc.k_neighbors)
            return kth.sum()
        timeit(f, state.pose.t, state, label=label)

    gather_cost(edge.xyz, "edge query+select, Q=7680 (current)")

    for cap in (1024, 2048, 4096):
        cx, cm = voxelmap.compact_points(edge.xyz, edge.mask, cap)
        gather_cost(cx, f"edge query+select, compacted Q={cap}")

    @jax.jit
    def compact_only(xyz, mask):
        return voxelmap.compact_points(xyz, mask, 2048)

    timeit(compact_only, edge.xyz, edge.mask, label="compact_points cost (7680->2048)")

    # B=8 versions
    B = 8
    bxyz = jnp.broadcast_to(edge.xyz, (B,) + edge.xyz.shape)
    bmask = jnp.broadcast_to(edge.mask, (B,) + edge.mask.shape)
    bstate = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), state)

    def bgather(q_all, label):
        @jax.jit
        def f(states, qs):
            def one(st, q):
                pw = se3.quat_rotate(st.pose.q[None, :], q) + st.pose.t
                cand, d2 = voxelmap.query_candidates(
                    st.map.edge_view, st.map.edge.leaf, pw,
                    jnp.asarray(e_deltas), jnp.asarray(e_valid),
                    oc.map_edge_super)
                kth, win = voxelmap.select_k_mask(d2, oc.k_neighbors)
                return kth.sum()
            return jax.vmap(one)(states, qs)
        timeit(f, bstate, q_all, label=label)

    bgather(bxyz, "B=8 edge query+select, Q=7680")
    bcx = jax.jit(jax.vmap(lambda x, m: voxelmap.compact_points(x, m, 2048)[0])
                  )(bxyz, bmask)
    bgather(bcx, "B=8 edge query+select, compacted Q=2048")

    @jax.jit
    def bcompact(xyz, mask):
        return jax.vmap(lambda x, m: voxelmap.compact_points(x, m, 2048))(
            xyz, mask)

    timeit(bcompact, bxyz, bmask, label="B=8 compact_points cost")


if __name__ == "__main__":
    main()

"""Break the per-scan program into stages and time each on the TPU at
benchmark shapes, to direct optimization. Chained iterations (output feeds
input) so dispatch pipelining can't hide costs."""
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
from floam_tpu.odometry import _associate_and_solve, _search_offsets, \
    _edge_leaf, _surf_leaf
from floam_tpu.ops import se3, voxelmap
from floam_tpu.pipeline import _features_from_scan
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
    print(f"{label:45s} {ms:8.3f} ms")
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

    # build a steady state
    from floam_tpu.pipeline import Pipeline
    pipe = Pipeline(cfg, dtype=jnp.float32)
    for i, s in enumerate(scans):
        pipe.process(s, 0.1 * i)
    jax.block_until_ready(pipe.state.pose.t)
    state = pipe.state
    scan = scans[-1]

    feat = jax.jit(functools.partial(_features_from_scan, cfg=cfg))
    edge, surf = timeit(feat, scan, label="features_from_scan")
    print("edge cap", edge.xyz.shape, "surf cap", surf.xyz.shape)

    e_xyz = edge.xyz
    s_xyz = surf.xyz

    @jax.jit
    def one_round(pose_t, st):
        pose = st.pose._replace(t=pose_t)
        p2, stats = _associate_and_solve(pose, st.map, e_xyz, edge.mask,
                                         s_xyz, surf.mask, oc)
        return p2.t

    timeit(one_round, state.pose.t, state, label="assoc+solve round (edge+surf)")

    radius = float(oc.nn_radius_sq) ** 0.5
    s_deltas, s_valid = _search_offsets(_surf_leaf(oc), radius,
                                        oc.map_surf_table,
                                        oc.map_surf_super)
    e_deltas, e_valid = _search_offsets(_edge_leaf(oc), radius,
                                        oc.map_edge_table,
                                        oc.map_edge_super)
    print("edge offsets", e_deltas.shape, "surf offsets", s_deltas.shape)

    @jax.jit
    def surf_gather(pose_t, st):
        pw = se3.quat_rotate(st.pose.q[None, :], s_xyz) + pose_t
        cand, d2 = voxelmap.query_candidates(
            st.map.surf_view, st.map.surf.leaf, pw,
            jnp.asarray(s_deltas), jnp.asarray(s_valid), oc.map_surf_super)
        return d2.sum()

    timeit(surf_gather, state.pose.t, state, label="surf query_candidates")

    @jax.jit
    def surf_select(pose_t, st):
        pw = se3.quat_rotate(st.pose.q[None, :], s_xyz) + pose_t
        cand, d2 = voxelmap.query_candidates(
            st.map.surf_view, st.map.surf.leaf, pw,
            jnp.asarray(s_deltas), jnp.asarray(s_valid), oc.map_surf_super)
        kth, win = voxelmap.select_k_mask(d2, oc.k_neighbors)
        return kth.sum()

    timeit(surf_select, state.pose.t, state, label="surf query+select_k")

    @jax.jit
    def edge_gather(pose_t, st):
        pw = se3.quat_rotate(st.pose.q[None, :], e_xyz) + pose_t
        cand, d2 = voxelmap.query_candidates(
            st.map.edge_view, st.map.edge.leaf, pw,
            jnp.asarray(e_deltas), jnp.asarray(e_valid), oc.map_edge_super)
        return d2.sum()

    timeit(edge_gather, state.pose.t, state, label="edge query_candidates")

    from floam_tpu.ops import residuals, gauss_newton as gn

    @jax.jit
    def full_assoc_surf(pose_t, st):
        pw = se3.quat_rotate(st.pose.q[None, :], s_xyz) + pose_t
        cand, d2 = voxelmap.query_candidates(
            st.map.surf_view, st.map.surf.leaf, pw,
            jnp.asarray(s_deltas), jnp.asarray(s_valid), oc.map_surf_super)
        kth, win = voxelmap.select_k_mask(d2, oc.k_neighbors)
        sf = residuals.surf_association_fused(
            s_xyz, pw, cand, win, kth, oc.k_neighbors, oc.nn_radius_sq,
            oc.plane_fit_tol)
        return sf.normal.sum()

    timeit(full_assoc_surf, state.pose.t, state, label="surf assoc (gather+sel+fit)")

    @jax.jit
    def map_update(st):
        e_world = se3.quat_rotate(st.pose.q[None, :], e_xyz) + st.pose.t
        s_world = se3.quat_rotate(st.pose.q[None, :], s_xyz) + st.pose.t
        em = voxelmap.insert(st.map.edge, e_world, edge.mask,
                             oc.voxel_count_cap)
        sm = voxelmap.insert(st.map.surf, s_world, surf.mask,
                             oc.voxel_count_cap)
        em = voxelmap.crop(em, st.pose.t, oc.crop_radius)
        sm = voxelmap.crop(sm, st.pose.t, oc.crop_radius)
        return voxelmap.pack_query_view(em).sum() + \
            voxelmap.pack_query_view(sm).sum()

    timeit(map_update, state, label="map update (insert+crop+pack) x2")

    # full step for reference
    from floam_tpu.pipeline import full_step
    step = jax.jit(functools.partial(full_step, cfg=cfg))
    st = state
    out = step(st, scan)
    jax.block_until_ready(out[0].pose.t)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        st, diag = step(st, scan)
    jax.block_until_ready(st.pose.t)
    print(f"{'full_step (steady)':45s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")


if __name__ == "__main__":
    main()


def batched():
    import functools
    from floam_tpu import odometry
    from floam_tpu.parallel.batch import batched_init_state
    from floam_tpu.pipeline import _features_from_scan, full_step
    from floam_tpu.types import RingScan

    cfg = FloamConfig.kitti_hdl64()
    oc = cfg.odom
    raw, gt = bench.get_scans(cfg)
    R, C = cfg.lidar.num_lines, cfg.lidar.points_per_ring
    scans = [RingScan(xyz=jnp.asarray(s["xyz"]),
                      intensity=jnp.zeros((R, C), jnp.float32),
                      time=jnp.asarray(s["time"]),
                      mask=jnp.asarray(s["mask"])) for s in raw]
    B = 8
    bscans = [jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape), s) for s in scans]
    step = jax.jit(jax.vmap(functools.partial(full_step, cfg=cfg)))
    states = batched_init_state(cfg, B, dtype=jnp.float32)
    e, s0 = jax.vmap(lambda sc: _features_from_scan(sc, cfg))(bscans[0])
    states = jax.vmap(
        lambda st, a, b: odometry.init_map_impl(st, a, b, cfg)
    )(states, e, s0)
    for sc in bscans[1:]:
        states, diag = step(states, sc)
    jax.block_until_ready(states.pose.t)

    # timed pieces
    feat = jax.jit(jax.vmap(functools.partial(_features_from_scan, cfg=cfg)))
    eb, sb = timeit(feat, bscans[-1], label="B=8 features")

    from floam_tpu.odometry import _associate_and_solve

    @jax.jit
    def one_round(pose_t, st):
        def f(pt, s, e_xyz, e_mask, s_xyz, s_mask):
            pose = s.pose._replace(t=pt)
            p2, stats = _associate_and_solve(pose, s.map, e_xyz, e_mask,
                                             s_xyz, s_mask, oc)
            return p2.t
        return jax.vmap(f)(pose_t, st, eb.xyz, eb.mask, sb.xyz, sb.mask)

    timeit(one_round, states.pose.t, states, label="B=8 assoc+solve round")

    @jax.jit
    def map_update(st):
        def f(s, e_xyz, e_mask, s_xyz, s_mask):
            e_world = se3.quat_rotate(s.pose.q[None, :], e_xyz) + s.pose.t
            s_world = se3.quat_rotate(s.pose.q[None, :], s_xyz) + s.pose.t
            em = voxelmap.insert(s.map.edge, e_world, e_mask,
                                 oc.voxel_count_cap)
            sm = voxelmap.insert(s.map.surf, s_world, s_mask,
                                 oc.voxel_count_cap)
            em = voxelmap.crop(em, s.pose.t, oc.crop_radius)
            sm = voxelmap.crop(sm, s.pose.t, oc.crop_radius)
            return voxelmap.pack_query_view(em).sum() + \
                voxelmap.pack_query_view(sm).sum()
        return jax.vmap(f)(st, eb.xyz, eb.mask, sb.xyz, sb.mask)

    timeit(map_update, states, label="B=8 map update x2")

    bstep = jax.jit(jax.vmap(functools.partial(full_step, cfg=cfg)))
    st = states
    st, diag = bstep(st, bscans[-1])
    jax.block_until_ready(st.pose.t)
    t0 = time.perf_counter()
    for _ in range(10):
        st, diag = bstep(st, bscans[-1])
    jax.block_until_ready(st.pose.t)
    print(f"{'B=8 full_step':45s} {(time.perf_counter()-t0)/10*1e3:8.3f} ms")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "batched":
    batched()

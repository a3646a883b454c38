"""Bisect why odometry's query_candidates costs ms while an equivalent
microbenchmark gather+d2 costs ~40us. Uses the real bench pipeline state."""
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

import bench
from floam_tpu.config import FloamConfig
from floam_tpu.odometry import _search_offsets, _surf_leaf
from floam_tpu.ops import se3, voxelmap
from floam_tpu.ops.sparse import table_gather
from floam_tpu.pipeline import Pipeline, _features_from_scan
from floam_tpu.types import RingScan


def t_chained(fn, state, *args, n=20):
    state = jax.block_until_ready(fn(state, *args))
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state, *args)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / n * 1e3


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
    edge, surf = jax.jit(functools.partial(_features_from_scan, cfg=cfg))(
        scans[-1])
    s_xyz = surf.xyz
    radius = float(oc.nn_radius_sq) ** 0.5
    s_deltas, s_valid = _search_offsets(_surf_leaf(oc), radius,
                                        oc.map_surf_table)
    view = state.map.surf_view
    leaf = state.map.surf.leaf
    H = view.shape[0]
    Q = s_xyz.shape[0]
    O = s_deltas.shape[1]
    print("view", view.shape, "Q", Q, "deltas", s_deltas.shape)

    deltas_j = jnp.asarray(s_deltas)
    valid_j = jnp.asarray(s_valid)
    pose_q = state.pose.q

    # full real query_candidates, chained via pose_t
    @jax.jit
    def full(pose_t):
        pw = se3.quat_rotate(pose_q[None, :], s_xyz) + pose_t
        _, d2 = voxelmap.query_candidates(view, leaf, pw, deltas_j, valid_j)
        return pose_t + 1e-12 * d2.min()

    print(f"full query_candidates: {t_chained(full, state.pose.t):.3f} ms")

    # variant: whole-cell (flat) deltas, no octant gather
    flat_offs = voxelmap.dedup_offsets(
        voxelmap.neighbor_offsets(float(np.asarray(leaf)), radius),
        oc.map_surf_table)
    flat_deltas = jnp.asarray(voxelmap.offset_key_deltas(flat_offs))
    print("flat offsets", flat_deltas.shape)

    @jax.jit
    def flat(pose_t):
        pw = se3.quat_rotate(pose_q[None, :], s_xyz) + pose_t
        _, d2 = voxelmap.query_candidates(view, leaf, pw, flat_deltas, None)
        return pose_t + 1e-12 * d2.min()

    print(f"flat-delta query_candidates: {t_chained(flat, state.pose.t):.3f} ms")

    # variant: computed buckets but direct jnp indexing, inline math
    @jax.jit
    def inline(pose_t):
        pw = se3.quat_rotate(pose_q[None, :], s_xyz) + pose_t
        base = jnp.floor(pw / leaf).astype(jnp.int32)
        base_key = voxelmap.linear_key(base)
        lkeys = base_key[:, None] + flat_deltas[None, :]
        bkt = (lkeys & jnp.uint32(H - 1)).astype(jnp.int32)
        rows = view[bkt]  # (Q, O, 16)
        W = 4
        Of = flat_deltas.shape[0]
        cx = rows[:, :, 0:4].reshape(Q, Of * W)
        cy = rows[:, :, 4:8].reshape(Q, Of * W)
        cz = rows[:, :, 8:12].reshape(Q, Of * W)
        d2 = ((cx - pw[:, 0:1]) ** 2 + (cy - pw[:, 1:2]) ** 2
              + (cz - pw[:, 2:3]) ** 2)
        return pose_t + 1e-12 * d2.min()

    print(f"inline flat (no table_gather): {t_chained(inline, state.pose.t):.3f} ms")

    # variant: random buckets (same shapes) — isolates hash/key math
    key = jax.random.PRNGKey(0)
    rbkt = jax.random.randint(key, (Q, flat_deltas.shape[0]), 0, H,
                              jnp.int32)

    @jax.jit
    def randidx(pose_t):
        pw = se3.quat_rotate(pose_q[None, :], s_xyz) + pose_t
        rows = view[rbkt]
        W = 4
        Of = rbkt.shape[1]
        cx = rows[:, :, 0:4].reshape(Q, Of * W)
        cy = rows[:, :, 4:8].reshape(Q, Of * W)
        cz = rows[:, :, 8:12].reshape(Q, Of * W)
        d2 = ((cx - pw[:, 0:1]) ** 2 + (cy - pw[:, 1:2]) ** 2
              + (cz - pw[:, 2:3]) ** 2)
        return pose_t + 1e-12 * d2.min()

    print(f"random-idx gather+d2: {t_chained(randidx, state.pose.t):.3f} ms")

    # variant: full but d2.min replaced by select_k + sum (downstream check)
    @jax.jit
    def fullsel(pose_t):
        pw = se3.quat_rotate(pose_q[None, :], s_xyz) + pose_t
        _, d2 = voxelmap.query_candidates(view, leaf, pw, deltas_j, valid_j)
        kth, win = voxelmap.select_k_mask(d2, oc.k_neighbors)
        return pose_t + 1e-12 * kth.min()

    print(f"query+select_k: {t_chained(fullsel, state.pose.t):.3f} ms")


if __name__ == "__main__":
    main()


def part2():
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
    edge, surf = jax.jit(functools.partial(_features_from_scan, cfg=cfg))(
        scans[-1])
    s_xyz = surf.xyz
    radius = float(oc.nn_radius_sq) ** 0.5
    view = state.map.surf_view
    leaf = state.map.surf.leaf
    H = view.shape[0]
    Q = s_xyz.shape[0]
    flat_offs = voxelmap.dedup_offsets(
        voxelmap.neighbor_offsets(float(np.asarray(leaf)), radius),
        oc.map_surf_table)
    flat_deltas = jnp.asarray(voxelmap.offset_key_deltas(flat_offs))
    O = flat_deltas.shape[0]
    pose_q = state.pose.q

    # precompute the REAL bucket indices on host, feed as input
    pw = se3.quat_rotate(pose_q[None, :], s_xyz) + state.pose.t
    base = jnp.floor(pw / leaf).astype(jnp.int32)
    base_key = voxelmap.linear_key(base)
    lkeys = base_key[:, None] + flat_deltas[None, :]
    real_bkt = np.asarray((lkeys & jnp.uint32(H - 1)).astype(jnp.int32))
    print("real bkt: unique", len(np.unique(real_bkt)), "of", real_bkt.size)

    def gather_d2(bkt_arr, label):
        bkt_j = jnp.asarray(bkt_arr)

        @jax.jit
        def f(pose_t):
            pwl = se3.quat_rotate(pose_q[None, :], s_xyz) + pose_t
            rows = view[bkt_j]
            cx = rows[:, :, 0:4].reshape(Q, O * 4)
            cy = rows[:, :, 4:8].reshape(Q, O * 4)
            cz = rows[:, :, 8:12].reshape(Q, O * 4)
            d2 = ((cx - pwl[:, 0:1]) ** 2 + (cy - pwl[:, 1:2]) ** 2
                  + (cz - pwl[:, 2:3]) ** 2)
            return pose_t + 1e-12 * d2.min()

        print(f"{label}: {t_chained(f, state.pose.t):.3f} ms")

    rng = np.random.default_rng(0)
    gather_d2(real_bkt, "precomputed REAL buckets")
    gather_d2(rng.integers(0, H, real_bkt.shape).astype(np.int32),
              "uniform random")
    perm = rng.permutation(real_bkt.reshape(-1)).reshape(real_bkt.shape)
    gather_d2(perm, "REAL values shuffled")
    gather_d2(np.sort(real_bkt, axis=None).reshape(real_bkt.shape).astype(np.int32),
              "REAL values sorted")
    gather_d2(np.zeros_like(real_bkt), "all-zero")
    # row-local random (each query's 81 spread, queries independent)
    small = (rng.integers(0, 64, real_bkt.shape) * (H // 64)).astype(np.int32)
    gather_d2(small, "64 distinct values")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "2":
    part2()


def part3():
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
    edge, surf = jax.jit(functools.partial(_features_from_scan, cfg=cfg))(
        scans[-1])
    s_xyz = surf.xyz
    radius = float(oc.nn_radius_sq) ** 0.5
    view = state.map.surf_view
    leaf = state.map.surf.leaf
    H = view.shape[0]
    Q = s_xyz.shape[0]
    flat_offs = voxelmap.dedup_offsets(
        voxelmap.neighbor_offsets(float(np.asarray(leaf)), radius),
        oc.map_surf_table)
    flat_deltas = jnp.asarray(voxelmap.offset_key_deltas(flat_offs))
    O = flat_deltas.shape[0]
    pose_q = state.pose.q

    @jax.jit
    def barrier(pose_t):
        pw = se3.quat_rotate(pose_q[None, :], s_xyz) + pose_t
        base = jnp.floor(pw / leaf).astype(jnp.int32)
        base_key = voxelmap.linear_key(base)
        lkeys = base_key[:, None] + flat_deltas[None, :]
        bkt = (lkeys & jnp.uint32(H - 1)).astype(jnp.int32)
        bkt = jax.lax.optimization_barrier(bkt)
        rows = view[bkt]
        cx = rows[:, :, 0:4].reshape(Q, O * 4)
        cy = rows[:, :, 4:8].reshape(Q, O * 4)
        cz = rows[:, :, 8:12].reshape(Q, O * 4)
        d2 = ((cx - pw[:, 0:1]) ** 2 + (cy - pw[:, 1:2]) ** 2
              + (cz - pw[:, 2:3]) ** 2)
        return pose_t + 1e-12 * d2.min()

    print(f"inline + barrier(bkt): {t_chained(barrier, state.pose.t):.3f} ms")

    # barrier only on the base key (cheap mults stay, adds fuse)
    @jax.jit
    def barrier_key(pose_t):
        pw = se3.quat_rotate(pose_q[None, :], s_xyz) + pose_t
        base = jnp.floor(pw / leaf).astype(jnp.int32)
        base_key = jax.lax.optimization_barrier(voxelmap.linear_key(base))
        lkeys = base_key[:, None] + flat_deltas[None, :]
        bkt = (lkeys & jnp.uint32(H - 1)).astype(jnp.int32)
        rows = view[bkt]
        cx = rows[:, :, 0:4].reshape(Q, O * 4)
        cy = rows[:, :, 4:8].reshape(Q, O * 4)
        cz = rows[:, :, 8:12].reshape(Q, O * 4)
        d2 = ((cx - pw[:, 0:1]) ** 2 + (cy - pw[:, 1:2]) ** 2
              + (cz - pw[:, 2:3]) ** 2)
        return pose_t + 1e-12 * d2.min()

    print(f"inline + barrier(base_key): {t_chained(barrier_key, state.pose.t):.3f} ms")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "3":
    part3()


def part4():
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
    edge, surf = jax.jit(functools.partial(_features_from_scan, cfg=cfg))(
        scans[-1])
    s_xyz = surf.xyz
    radius = float(oc.nn_radius_sq) ** 0.5
    view = state.map.surf_view
    leaf = state.map.surf.leaf
    H = view.shape[0]
    Q = s_xyz.shape[0]
    flat_offs = voxelmap.dedup_offsets(
        voxelmap.neighbor_offsets(float(np.asarray(leaf)), radius),
        oc.map_surf_table)
    flat_deltas = jnp.asarray(voxelmap.offset_key_deltas(flat_offs))
    O = flat_deltas.shape[0]
    pose_q = state.pose.q

    pw0 = se3.quat_rotate(pose_q[None, :], s_xyz) + state.pose.t
    base = jnp.floor(pw0 / leaf).astype(jnp.int32)
    base_key = voxelmap.linear_key(base)
    lkeys = base_key[:, None] + flat_deltas[None, :]
    real_bkt = jax.block_until_ready(
        (lkeys & jnp.uint32(H - 1)).astype(jnp.int32))

    @jax.jit
    def f_input(bkt, pose_t):
        pwl = se3.quat_rotate(pose_q[None, :], s_xyz) + pose_t
        rows = view[bkt]
        cx = rows[:, :, 0:4].reshape(Q, O * 4)
        cy = rows[:, :, 4:8].reshape(Q, O * 4)
        cz = rows[:, :, 8:12].reshape(Q, O * 4)
        d2 = ((cx - pwl[:, 0:1]) ** 2 + (cy - pwl[:, 1:2]) ** 2
              + (cz - pwl[:, 2:3]) ** 2)
        # chain through the index to defeat caching
        return bkt + (d2[:, ::4] > 1e30).astype(jnp.int32)

    print(f"indices as jit INPUT: {t_chained(f_input, real_bkt, state.pose.t):.3f} ms")

    # computed in kernel, but d2 on a SEPARATE gather consumer shape:
    # check whether the uint32 multiply COUNT is the issue by hashing with
    # shifts/xors only (no multiplies)
    @jax.jit
    def shift_hash(pose_t):
        pw = se3.quat_rotate(pose_q[None, :], s_xyz) + pose_t
        base = jnp.floor(pw / leaf).astype(jnp.int32).astype(jnp.uint32)
        k = base[:, 0] ^ (base[:, 1] << 11) ^ (base[:, 1] >> 7) \
            ^ (base[:, 2] << 22) ^ (base[:, 2] >> 14)
        lk = k[:, None] + flat_deltas[None, :]
        bkt = (lk & jnp.uint32(H - 1)).astype(jnp.int32)
        rows = view[bkt]
        cx = rows[:, :, 0:4].reshape(Q, O * 4)
        cy = rows[:, :, 4:8].reshape(Q, O * 4)
        cz = rows[:, :, 8:12].reshape(Q, O * 4)
        d2 = ((cx - pw[:, 0:1]) ** 2 + (cy - pw[:, 1:2]) ** 2
              + (cz - pw[:, 2:3]) ** 2)
        return pose_t + 1e-12 * d2.min()

    print(f"computed, shift/xor hash (no mults): {t_chained(shift_hash, state.pose.t):.3f} ms")

    # computed but WITHOUT the uint32->int32 cast (index as uint32)?
    @jax.jit
    def no_cast(pose_t):
        pw = se3.quat_rotate(pose_q[None, :], s_xyz) + pose_t
        base = jnp.floor(pw / leaf).astype(jnp.int32)
        base_key = voxelmap.linear_key(base)
        lk = base_key[:, None] + flat_deltas[None, :]
        bkt = (lk & jnp.uint32(H - 1))
        rows = view[bkt]
        cx = rows[:, :, 0:4].reshape(Q, O * 4)
        cy = rows[:, :, 4:8].reshape(Q, O * 4)
        cz = rows[:, :, 8:12].reshape(Q, O * 4)
        d2 = ((cx - pw[:, 0:1]) ** 2 + (cy - pw[:, 1:2]) ** 2
              + (cz - pw[:, 2:3]) ** 2)
        return pose_t + 1e-12 * d2.min()

    print(f"computed, uint32 index: {t_chained(no_cast, state.pose.t):.3f} ms")

    # tiny dependence: bkt = input_constant + 0*pose-derived (forces
    # runtime tensor with same values)
    @jax.jit
    def pseudo(pose_t):
        pwl = se3.quat_rotate(pose_q[None, :], s_xyz) + pose_t
        bump = (pwl[:, 0:1] > 1e30).astype(jnp.int32)  # all zero at runtime
        bkt = real_bkt + bump
        rows = view[bkt]
        cx = rows[:, :, 0:4].reshape(Q, O * 4)
        cy = rows[:, :, 4:8].reshape(Q, O * 4)
        cz = rows[:, :, 8:12].reshape(Q, O * 4)
        d2 = ((cx - pwl[:, 0:1]) ** 2 + (cy - pwl[:, 1:2]) ** 2
              + (cz - pwl[:, 2:3]) ** 2)
        return pose_t + 1e-12 * d2.min()

    print(f"constant + runtime-zero bump: {t_chained(pseudo, state.pose.t):.3f} ms")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "4":
    part4()


def part5():
    """Runtime-index gather cost vs (rows, width) — the honest cost model."""
    key = jax.random.PRNGKey(0)
    print(f"{'Q':>6} {'O':>4} {'W':>3} {'rows(k)':>8} {'ms':>8} {'ns/row':>7}")
    for H in [131072, 65536, 32768, 16384]:
        for Q, O, W in [(7680, 196, 16), (16384, 54, 16),
                        (7680, 54, 32), (16384, 20, 32),
                        (7680, 54, 16), (16384, 20, 64),
                        (7680, 8, 64), (16384, 8, 64), (16384, 27, 32)]:
            tab = jax.random.normal(key, (H, W), jnp.float32)
            idx0 = jax.random.randint(key, (Q, O), 0, H, jnp.int32)

            @jax.jit
            def f(idx, tab=tab, H=H):
                rows = tab[idx]
                s = rows.sum(axis=-1)
                return (idx + (s > 1e30).astype(jnp.int32)) % H

            ms = t_chained(f, idx0, n=30)
            rows = Q * O
            print(f"{Q:>6} {O:>4} {W:>3} {rows/1e3:>8.0f} {ms:>8.3f} "
                  f"{ms*1e6/rows:>7.2f}  H={H}")
        print()


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "5":
    part5()

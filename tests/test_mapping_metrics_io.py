"""Global map engine, trajectory metrics, and export format tests."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from floam_tpu import mapping, metrics
from floam_tpu.config import MappingConfig
from floam_tpu.io import export, kitti, pcd
from floam_tpu.ops import se3
from floam_tpu.types import Pose


# ---------------------------------------------------------------- mapping

def small_map_cfg():
    return MappingConfig(cell_size=10.0, map_resolution=0.2,
                         block_capacity=8192, neighbor_range=2)


def test_global_map_update_and_export(rng):
    cfg = small_map_cfg()
    gm = mapping.GlobalMap(cfg)
    pts = rng.uniform(-12, 12, size=(5000, 3))
    pose = Pose.identity(jnp.float64)
    gm.update(jnp.asarray(pts), pose)
    assert gm.num_blocks >= 8  # 10 m blocks over a 24 m extent
    out = gm.get_map()
    assert out.shape[1] == 4
    # voxel downsample happened near the pose: points at resolution >= 0.2
    assert gm.num_points <= len(pts)
    # intensity is the height coloring in [0, 1]
    assert (out[:, 3] >= 0).all() and (out[:, 3] <= 1).all()


def test_global_map_pose_transform(rng):
    cfg = small_map_cfg()
    gm = mapping.GlobalMap(cfg)
    pts = np.array([[1.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    q = np.asarray(se3.so3_exp_quat(jnp.asarray([0.0, 0.0, np.pi / 2])))
    pose = Pose(q=jnp.asarray(q), t=jnp.asarray([10.0, 0.0, 0.0]))
    gm.update(jnp.asarray(pts), pose)
    out = gm.get_map()
    want = {(10.0, 1.0), (10.0, 2.0)}
    got = {(round(p[0], 3), round(p[1], 3)) for p in out}
    assert got == want


def test_global_map_spatial_sharding_exact(rng):
    """Two spatial-hash shards fed the SAME (replicated) keyframe stream
    must partition the unsharded map exactly: disjoint block ownership,
    and the union of shard exports equals the single-host map point for
    point (the multi-host scale-out of C6 — block storage is partitioned,
    the input feed is replicated, nothing crosses hosts mid-run)."""
    cfg = small_map_cfg()
    full = mapping.GlobalMap(cfg)
    shards = [mapping.GlobalMap(cfg, shard_rank=r, shard_count=2)
              for r in range(2)]
    poses = [Pose(q=jnp.asarray([1.0, 0, 0, 0]),
                  t=jnp.asarray([4.0 * i, 0.0, 0.0])) for i in range(4)]
    for i, pose in enumerate(poses):
        pts = jnp.asarray(rng.uniform(-12, 12, size=(3000, 3)))
        full.update(pts, pose)
        for s in shards:
            s.update(pts, pose)

    keys = [set(s.blocks) for s in shards]
    assert keys[0].isdisjoint(keys[1])
    assert keys[0] | keys[1] == set(full.blocks)
    for key in full.blocks:
        owner = shards[mapping.block_owner(key, 2)]
        np.testing.assert_array_equal(owner.blocks[key], full.blocks[key])
    # ownership is reasonably balanced for this block pattern
    assert min(len(k) for k in keys) >= len(full.blocks) // 5


def test_global_map_accumulates_and_downsamples(rng):
    cfg = small_map_cfg()
    gm = mapping.GlobalMap(cfg)
    pose = Pose.identity(jnp.float64)
    pts = rng.uniform(-1, 1, size=(2000, 3))
    gm.update(jnp.asarray(pts), pose)
    n1 = gm.num_points
    gm.update(jnp.asarray(pts), pose)  # same points again
    # re-voxelization near the pose keeps density bounded
    assert gm.num_points <= n1 * 1.1


def test_global_map_over_capacity_lossless(rng):
    """More raw points than block_capacity in ONE block must still produce
    correct voxel centroids — nothing silently truncated (the reference's
    per-cell re-voxelize is lossless, laserMappingClass.cpp:175-184)."""
    cfg = MappingConfig(cell_size=10.0, map_resolution=1.0,
                        block_capacity=256, neighbor_range=1)
    gm = mapping.GlobalMap(cfg)
    pose = Pose.identity(jnp.float64)
    # 1000 points (4x capacity) in two voxels of the pose block; the voxel
    # centroid is correct only if the tail beyond capacity is averaged in
    pts = np.concatenate([
        np.tile([0.25, 0.25, 0.25], (500, 1)),
        np.tile([1.75, 0.25, 0.25], (500, 1)),
    ])
    gm.update(jnp.asarray(pts), pose)
    out = gm.get_map()
    got = {tuple(np.round(p[:3], 3)) for p in out}
    assert got == {(0.25, 0.25, 0.25), (1.75, 0.25, 0.25)}


def test_global_map_far_block_growth_bounded(rng):
    """A block far from the pose is re-voxelized once its raw size exceeds
    block_capacity (the round-1 implementation let far blocks grow without
    bound between visits)."""
    cfg = MappingConfig(cell_size=10.0, map_resolution=0.5,
                        block_capacity=512, neighbor_range=1)
    gm = mapping.GlobalMap(cfg)
    pose = Pose.identity(jnp.float64)
    far = rng.uniform(51, 54, size=(400, 3))  # entirely inside block (5,5,5)
    for _ in range(4):
        gm.update(jnp.asarray(far), pose)  # 1600 raw appends > capacity
    far_key = (5, 5, 5)
    assert far_key in gm.blocks
    got = len(gm.blocks[far_key])
    n_vox = len({tuple(np.floor(p / 0.5).astype(int)) for p in far})
    # the final update appends 400 raw, pushing 216-voxel content past the
    # 512 capacity, so the same update re-voxelizes it back down
    assert got <= n_vox + 2, (got, n_vox)


def test_global_map_checkpoint_roundtrip(tmp_path, rng):
    """GlobalMap blocks survive save/load bit-exactly (round-1 checkpoints
    lost the C6 map)."""
    from floam_tpu.utils import checkpoint as ckpt
    from floam_tpu import odometry
    from floam_tpu.config import FloamConfig, OdomConfig

    cfg = small_map_cfg()
    gm = mapping.GlobalMap(cfg)
    pts = rng.uniform(-12, 12, size=(3000, 3))
    gm.update(jnp.asarray(pts), Pose.identity(jnp.float64))
    fc = FloamConfig(odom=OdomConfig(map_edge_table=256, map_surf_table=256,
                                     scan_edge_capacity=64,
                                     scan_surf_capacity=64,
                                     scan_surf_slots=64))
    state = odometry.init_state(fc)
    ckpt.save_checkpoint(tmp_path / "c.npz", state, [0.0],
                         np.zeros((1, 4)), np.zeros((1, 3)),
                         global_map=gm, kf_flags=[True])
    gm2 = mapping.GlobalMap(cfg)
    ckpt.load_checkpoint(tmp_path / "c.npz", state, global_map=gm2)
    assert set(gm2.blocks) == set(gm.blocks)
    for k in gm.blocks:
        np.testing.assert_array_equal(gm.blocks[k], gm2.blocks[k])
    kf = ckpt.load_kf_flags(tmp_path / "c.npz")
    assert kf is not None and kf.tolist() == [True]


# ---------------------------------------------------------------- metrics

def test_ate_alignment_invariance(rng):
    gt = np.cumsum(rng.normal(0, 0.5, (50, 3)), axis=0)
    # a rigidly transformed copy must align to ~zero error
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(se3.quat_to_mat(jnp.asarray(q)))
    est = gt @ R.T + np.array([5.0, -2.0, 1.0])
    rmse, err = metrics.ate(est, gt, align=True)
    assert rmse < 1e-9
    rmse2, _ = metrics.ate(gt + [0.1, 0, 0], gt, align=False)
    assert abs(rmse2 - 0.1) < 1e-12


def test_rpe_known_offset(rng):
    n = 20
    qs = np.tile([1.0, 0, 0, 0], (n, 1))
    gt_t = np.column_stack([np.arange(n, dtype=float), np.zeros(n),
                            np.zeros(n)])
    est_t = gt_t.copy()
    est_t[:, 0] *= 1.01  # 1% scale drift
    t_rmse, r_rmse = metrics.rpe(qs, est_t, qs, gt_t, delta=1)
    assert abs(t_rmse - 0.01) < 1e-9
    assert r_rmse < 1e-9


def test_kitti_drift_metric(rng):
    # straight 1000 m trajectory at 1 m steps with 1% scale error
    n = 1001
    qs = np.tile([1.0, 0, 0, 0], (n, 1))
    gt_t = np.column_stack([np.arange(n, dtype=float), np.zeros(n),
                            np.zeros(n)])
    est_t = gt_t * 1.01
    t_drift, r_drift = metrics.kitti_drift(qs, est_t, qs, gt_t)
    assert abs(t_drift - 0.01) < 1e-3
    assert r_drift < 1e-9


# ---------------------------------------------------------------- io

def test_pcd_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    inten = rng.random(100).astype(np.float32)
    p = tmp_path / "a.pcd"
    pcd.write_pcd(p, xyz, inten)
    x2, i2 = pcd.read_pcd(p)
    np.testing.assert_allclose(x2, xyz, atol=0)
    np.testing.assert_allclose(i2, inten, atol=0)
    p2 = tmp_path / "b.pcd"
    pcd.write_pcd(p2, xyz, binary=False)
    x3, i3 = pcd.read_pcd(p2)
    assert i3 is None
    np.testing.assert_allclose(x3, xyz, atol=1e-4)


def test_g2o_posegraph_format(tmp_path, rng):
    n = 4
    quats = np.tile([1.0, 0, 0, 0], (n, 1))
    trans = np.column_stack([np.arange(n, dtype=float), np.zeros(n),
                             np.zeros(n)])
    stamps = np.arange(n) * 0.1
    clouds = [rng.normal(size=(10, 4)).astype(np.float32) for _ in range(n)]
    export.save_posegraph(tmp_path / "pg", quats, trans, stamps, clouds)
    text = (tmp_path / "pg" / "graph.g2o").read_text().splitlines()
    verts = [l for l in text if l.startswith("VERTEX_SE3:QUAT")]
    edges = [l for l in text if l.startswith("EDGE_SE3:QUAT")]
    assert len(verts) == n and len(edges) == n - 1
    assert "FIX 0" in text
    # vertex format: id x y z qx qy qz qw
    f = verts[1].split()
    assert f[1] == "1" and float(f[2]) == 1.0 and float(f[8]) == 1.0
    # edge: relative translation (1, 0, 0), information upper triangle 21 vals
    e = edges[0].split()
    assert float(e[3]) == 1.0 and len(e) == 3 + 7 + 21
    assert float(e[10]) == 0.01  # first information entry
    # keyframe dirs
    assert (tmp_path / "pg" / "000000" / "cloud.pcd").exists()
    data = (tmp_path / "pg" / "000001" / "data").read_text()
    assert "stamp" in data and "estimate" in data and "id 1" in data


def test_kitti_trajectory_roundtrip(tmp_path, rng):
    n = 8
    xi = rng.normal(size=(n, 6)) * 0.3
    q, t = se3.se3_exp(jnp.asarray(xi))
    q, t = np.asarray(q), np.asarray(t)
    export.save_kitti_trajectory(tmp_path / "traj.txt", q, t)
    q2, t2 = export.load_kitti_trajectory(tmp_path / "traj.txt")
    np.testing.assert_allclose(t2, t, atol=1e-7)
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-7)


def test_balm_and_odom_export(tmp_path, rng):
    n = 3
    quats = np.tile([1.0, 0, 0, 0], (n, 1))
    trans = rng.normal(size=(n, 3))
    stamps = [1.5, 2.5, 3.5]
    clouds = [rng.normal(size=(5, 4)).astype(np.float32) for _ in range(n)]
    export.save_balm(tmp_path / "balm", quats, trans, stamps, clouds)
    csv = (tmp_path / "balm" / "alidarPose.csv").read_text().splitlines()
    assert len(csv) == 4 * n
    # stamp sits in the last slot of each 4th row
    assert abs(float(csv[3].split(",")[3]) - 1.5) < 1e-9
    assert (tmp_path / "balm" / "full0.pcd").exists()
    export.save_odom(tmp_path / "odom", quats, trans, stamps, clouds)
    files = sorted(os.listdir(tmp_path / "odom"))
    assert len(files) == 2 * n  # .pcd + .odom per scan
    odom_file = [f for f in files if f.endswith(".odom")][0]
    mat = np.loadtxt(tmp_path / "odom" / odom_file)
    assert mat.shape == (4, 4)


def test_kitti_bin_to_ring_scan(rng):
    from floam_tpu.config import LidarConfig

    n = 5000
    az = rng.uniform(-np.pi, np.pi, n)
    el = np.deg2rad(rng.uniform(-24.0, 1.9, n))
    d = rng.uniform(3, 50, n)
    xyz = np.column_stack([d * np.cos(el) * np.cos(az),
                           d * np.cos(el) * np.sin(az),
                           d * np.sin(el)])
    raw = np.column_stack([xyz, rng.random(n)]).astype(np.float32)
    lidar = LidarConfig.hdl64(min_distance=2.0, max_distance=60.0)
    scan = kitti.bin_to_ring_scan(raw, lidar)
    m = np.asarray(scan.mask)
    assert m.sum() == n  # all in range and valid
    # ring-major bucketing: elevation within each ring is near-constant
    ring, _ = kitti.ring_ids_hdl64(xyz)
    for r in [0, 20, 50]:
        cnt = (ring == r).sum()
        assert m[r].sum() == cnt
    # per-point times in [0, scan_period)
    t = np.asarray(scan.time)[m]
    assert (t >= 0).all() and (t < lidar.scan_period).all()

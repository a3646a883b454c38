"""Native C++ loader: builds, matches the NumPy path, prefetcher streams."""
import numpy as np
import pytest

native = pytest.importorskip("floam_tpu.native")

try:
    native.load()
    HAVE = True
except Exception:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason="native build unavailable")


def make_raw(rng, n=20000):
    az = rng.uniform(-np.pi, np.pi, n)
    el = np.deg2rad(rng.uniform(-24.0, 1.9, n))
    d = rng.uniform(3, 50, n)
    xyz = np.column_stack([d * np.cos(el) * np.cos(az),
                           d * np.cos(el) * np.sin(az),
                           d * np.sin(el)])
    return np.column_stack([xyz, rng.random(n)]).astype(np.float32)


def test_prepare_matches_numpy_path(rng):
    from floam_tpu.config import LidarConfig
    from floam_tpu.io import kitti

    raw = make_raw(rng)
    lidar = LidarConfig.hdl64(min_distance=2.0, max_distance=60.0)
    R, C = lidar.num_lines, lidar.points_per_ring
    xyz, inten, time, mask = native.prepare_kitti_scan(
        raw, R, C, lidar.min_distance, lidar.max_distance, lidar.scan_period)

    # numpy reference path (kitti.bin_to_ring_scan without native)
    kitti._native = False
    scan = kitti.bin_to_ring_scan(raw, lidar)
    kitti._native = None
    np.testing.assert_array_equal(mask, np.asarray(scan.mask))
    np.testing.assert_allclose(xyz[mask], np.asarray(scan.xyz)[mask],
                               atol=1e-6)
    np.testing.assert_allclose(time[mask], np.asarray(scan.time)[mask],
                               atol=1e-6)


def test_kitti_sequence_uses_prefetcher(tmp_path, rng):
    """KittiSequence iteration (prefetcher-backed) yields the same scans as
    the synchronous NumPy path, in order."""
    from floam_tpu.config import LidarConfig
    from floam_tpu.io import kitti

    lidar = LidarConfig.hdl64(min_distance=2.0, max_distance=60.0)
    (tmp_path / "velodyne").mkdir()
    raws = []
    for i in range(4):
        raw = make_raw(rng, n=4000)
        raw.tofile(tmp_path / "velodyne" / f"{i:06d}.bin")
        raws.append(raw)
    seq = kitti.KittiSequence(tmp_path, lidar)
    got = list(seq)
    assert len(got) == 4
    kitti._native = False  # force the sync NumPy path for the reference
    try:
        for i, (stamp, scan) in enumerate(got):
            want = kitti.bin_to_ring_scan(raws[i], lidar)
            np.testing.assert_array_equal(np.asarray(scan.mask),
                                          np.asarray(want.mask))
            m = np.asarray(want.mask)
            np.testing.assert_allclose(np.asarray(scan.xyz)[m],
                                       np.asarray(want.xyz)[m], atol=1e-6)
    finally:
        kitti._native = None


def test_prefetcher_streams(tmp_path, rng):
    from floam_tpu.config import LidarConfig

    lidar = LidarConfig.hdl64()
    files = []
    raws = []
    for i in range(5):
        raw = make_raw(rng, n=5000)
        p = tmp_path / f"{i:06d}.bin"
        raw.tofile(p)
        files.append(p)
        raws.append(raw)
    pf = native.ScanPrefetcher(files, lidar.num_lines, lidar.points_per_ring,
                               2.0, 60.0, lidar.scan_period, threads=2,
                               depth=3)
    got = list(pf)
    pf.close()
    assert len(got) == 5
    for i, (xyz, inten, time, mask) in enumerate(got):
        # same content as direct preparation (order preserved)
        x2, i2, t2, m2 = native.prepare_kitti_scan(
            raws[i], lidar.num_lines, lidar.points_per_ring, 2.0, 60.0,
            lidar.scan_period)
        np.testing.assert_array_equal(mask, m2)
        np.testing.assert_allclose(xyz, x2, atol=0)

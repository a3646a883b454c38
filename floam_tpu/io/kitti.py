"""KITTI odometry dataset loading: velodyne .bin scans -> RingScan, poses,
calibration, times.

The reference consumed KITTI through rosbags with its geometric scanID
fallback (RingExtraction, src/laserProcessingClass.cpp:24-70, which drops
per-point time — quirk 7). Here the loader computes ring ids with the same
HDL-64 elevation formulas, estimates per-point time from azimuth (the
reference's KITTI path ran with deskew off because of the dropped field),
applies the cylindrical range gate of RingExtractionVelodyne (:14-15), and
buckets points ring-major in stream order — producing the fixed-shape
RingScan the device kernels consume.

A C++ fast path (native/loader.cpp, via ctypes) does the same bucketing at
memory bandwidth; this module falls back to NumPy when the shared library
is not built.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

from ..config import LidarConfig
from ..types import RingScan

_native = None


def _load_native():
    global _native
    if _native is not None:
        return _native or None
    try:
        from .. import native as native_mod

        native_mod.load()
        _native = native_mod
    except Exception:
        _native = False
    return _native or None


def ring_ids_hdl64(xyz: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """HDL-64 geometric ring ids (reference formulas,
    src/laserProcessingClass.cpp:50-61). Returns (ring (N,), valid (N,))."""
    d = np.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
    angle = np.degrees(np.arctan2(xyz[:, 2], d))
    upper = ((2.0 - angle) * 3.0 + 0.5).astype(np.int32)
    lower = 32 + ((-8.83 - angle) * 2.0 + 0.5).astype(np.int32)
    ring = np.where(angle >= -8.83, upper, lower)
    valid = (angle <= 2.0) & (angle >= -24.33) & (ring >= 0) & (ring < 64)
    return np.clip(ring, 0, 63), valid


def azimuth_times(xyz: np.ndarray, scan_period: float) -> np.ndarray:
    """Per-point time from azimuth angle: KITTI scans start at the back
    (-x) and sweep clockwise; time in [0, scan_period)."""
    az = np.arctan2(xyz[:, 1], xyz[:, 0])  # (-pi, pi]
    # KITTI HDL-64 spins clockwise viewed from above; normalize the sweep to
    # a monotone [0, 1) fraction starting at the rear
    frac = (np.pi - az) / (2 * np.pi)
    return (frac % 1.0) * scan_period


def bin_to_ring_scan(raw: np.ndarray, lidar: LidarConfig,
                     rings: Optional[np.ndarray] = None,
                     times: Optional[np.ndarray] = None) -> RingScan:
    """(N, 4) [x y z intensity] -> RingScan (range-gated, ring-major,
    stream order preserved within each ring)."""
    import jax.numpy as jnp

    xyz = raw[:, :3].astype(np.float32)
    inten = raw[:, 3].astype(np.float32) if raw.shape[1] > 3 else \
        np.zeros(len(raw), np.float32)
    finite = np.isfinite(xyz).all(axis=1)
    if rings is None:
        if lidar.num_lines == 64:
            ring, rvalid = ring_ids_hdl64(xyz)
        else:
            # geometric fallback for 16/32-beam clouds without a ring field
            # (RingExtraction formulas, src/laserProcessingClass.cpp:34-49)
            from ..ops.features import ring_ids_from_elevation

            ring, rvalid = ring_ids_from_elevation(xyz, lidar.num_lines)
            ring, rvalid = np.asarray(ring), np.asarray(rvalid)
    else:
        ring = rings.astype(np.int32)
        rvalid = (ring >= 0) & (ring < lidar.num_lines)
    if times is None:
        times = azimuth_times(xyz, lidar.scan_period)
    d = np.sqrt(xyz[:, 0] ** 2 + xyz[:, 1] ** 2)
    valid = finite & rvalid & (d >= lidar.min_distance) & \
        (d <= lidar.max_distance)

    R, C = lidar.num_lines, lidar.points_per_ring
    native = _load_native()
    if native is not None:
        out_xyz, out_int, out_t, out_mask = native.bucket_rings(
            xyz, inten, times.astype(np.float32), ring, valid, R, C)
    else:
        out_xyz = np.zeros((R, C, 3), np.float32)
        out_int = np.zeros((R, C), np.float32)
        out_t = np.zeros((R, C), np.float32)
        out_mask = np.zeros((R, C), bool)
        idx = np.nonzero(valid)[0]
        rr = ring[idx]
        order = np.argsort(rr, kind="stable")  # ring-major, stream order kept
        idx = idx[order]
        rr = rr[order]
        # position within each ring
        counts = np.bincount(rr, minlength=R)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(len(idx)) - starts[rr]
        keep = pos < C
        out_xyz[rr[keep], pos[keep]] = xyz[idx[keep]]
        out_int[rr[keep], pos[keep]] = inten[idx[keep]]
        out_t[rr[keep], pos[keep]] = times[idx[keep]]
        out_mask[rr[keep], pos[keep]] = True

    return RingScan(xyz=jnp.asarray(out_xyz), intensity=jnp.asarray(out_int),
                    time=jnp.asarray(out_t), mask=jnp.asarray(out_mask))


def load_bin(path) -> np.ndarray:
    """KITTI velodyne .bin: float32 (N, 4) [x y z reflectance]."""
    return np.fromfile(path, np.float32).reshape(-1, 4)


def load_poses(path, calib_path=None) -> Tuple[np.ndarray, np.ndarray]:
    """KITTI ground-truth poses (camera frame), optionally transformed into
    the velodyne frame with calib.txt's Tr. Returns (quats wxyz, trans)."""
    import jax.numpy as jnp

    from ..ops import se3

    data = np.loadtxt(path).reshape(-1, 3, 4)
    T = np.tile(np.eye(4), (len(data), 1, 1))
    T[:, :3, :] = data
    if calib_path is not None:
        Tr = load_calib_tr(calib_path)
        Tr_inv = np.linalg.inv(Tr)
        T = np.einsum("ij,njk,kl->nil", Tr_inv, T, Tr)
    q = np.asarray(se3.mat_to_quat(jnp.asarray(T[:, :3, :3])))
    return q, T[:, :3, 3]


def load_calib_tr(path) -> np.ndarray:
    """The 'Tr' line of a KITTI odometry calib.txt (velo -> cam0)."""
    for line in Path(path).read_text().splitlines():
        if line.startswith("Tr"):
            vals = np.array([float(v) for v in line.split()[1:]])
            T = np.eye(4)
            T[:3, :] = vals.reshape(3, 4)
            return T
    raise ValueError(f"no Tr line in {path}")


class KittiSequence:
    """Iterator over a KITTI odometry sequence directory
    (velodyne/*.bin [+ times.txt, calib.txt, poses])."""

    def __init__(self, seq_dir, lidar: Optional[LidarConfig] = None,
                 poses_path=None):
        self.dir = Path(seq_dir)
        self.lidar = lidar or LidarConfig.hdl64(min_distance=2.0,
                                               max_distance=60.0)
        self.bin_files = sorted((self.dir / "velodyne").glob("*.bin"))
        times_file = self.dir / "times.txt"
        self.times = (np.loadtxt(times_file) if times_file.exists()
                      else np.arange(len(self.bin_files)) *
                      self.lidar.scan_period)
        self.poses = None
        if poses_path and Path(poses_path).exists():
            calib = self.dir / "calib.txt"
            self.poses = load_poses(poses_path,
                                    calib if calib.exists() else None)

    def __len__(self) -> int:
        return len(self.bin_files)

    def __iter__(self) -> Iterator[Tuple[float, RingScan]]:
        """Streams scans through the native async prefetch pool when the
        shared library is available (worker threads overlap .bin reads +
        ring bucketing with the device loop — the reference's
        subscriber-queue-worker pattern, laserProcessingNode.cpp:33-36,
        80-102); falls back to synchronous NumPy loading otherwise."""
        native = _load_native()
        if native is not None and self.bin_files:
            ld = self.lidar
            pf = native.ScanPrefetcher(
                self.bin_files, ld.num_lines, ld.points_per_ring,
                ld.min_distance, ld.max_distance, ld.scan_period)
            try:
                for i, (xyz, inten, t, mask) in enumerate(pf):
                    # single packed upload (see RingScan.from_host)
                    yield float(self.times[i]), RingScan.from_host(
                        xyz, t, mask, intensity=inten)
            finally:
                pf.close()
            return
        for i, f in enumerate(self.bin_files):
            yield float(self.times[i]), bin_to_ring_scan(load_bin(f),
                                                         self.lidar)

    def iter_packed_q16(self) -> Iterator[Tuple[float, tuple]]:
        """Streams scans as quantized host wire-format tuples
        (RingScan.pack_host_q16) — ~2.4x fewer host->device bytes than
        f32 planes. Wrap with runner.chunked_device_stream and feed
        Pipeline.process directly; the decode happens inside the jitted
        step. (The hot streaming path for non-IMU runs: IMU deskew needs
        host-side time/mask and should use __iter__.)"""
        ld = self.lidar
        native = _load_native()
        if native is not None and self.bin_files:
            pf = native.ScanPrefetcher(
                self.bin_files, ld.num_lines, ld.points_per_ring,
                ld.min_distance, ld.max_distance, ld.scan_period)
            try:
                for i, (xyz, inten, t, mask) in enumerate(pf):
                    yield float(self.times[i]), RingScan.pack_host_q16(
                        xyz, t, mask, inten, cols=ld.points_per_ring,
                        range_m=ld.max_distance)
            finally:
                pf.close()
            return
        for i, f in enumerate(self.bin_files):
            s = bin_to_ring_scan(load_bin(f), ld)
            import numpy as _np

            yield float(self.times[i]), RingScan.pack_host_q16(
                _np.asarray(s.xyz), _np.asarray(s.time),
                _np.asarray(s.mask), _np.asarray(s.intensity),
                cols=ld.points_per_ring, range_m=ld.max_distance)

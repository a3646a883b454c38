"""Motion compensation: IMU rotational deskew + constant-velocity linear
deskew, and the host-side IMU stream.

TPU-native redesign of the reference's dmapping namespace
(src/dataHandler.cpp):
  * ``ImuStream``            -> ImuHandler: append-only timestamped buffer
    with duplicate-stamp rejection (>1e-5 s apart, :24-40) and
    lower_bound lookup (:51-70). The device side receives a fixed-capacity
    window of samples covering one scan.
  * ``rotational_deskew``    -> Compensate (:93-122): per point,
    q_diff = qInit^-1 * q(t_point) applied to the point, with the
    lidar->IMU extrinsic quaternion folded in. The reference's Interpolate
    is a stub returning the earlier sample (:48-50, quirk 5); here proper
    slerp is the default with ``slerp=False`` reproducing nearest-before.
  * ``compensate_velocity``  -> CompensateVelocity (:82-92): p += v * t.
  * ``center_time``          -> CenterTime (src/laserProcessingNode.cpp:65-78).

The per-point IMU lookup — a std::lower_bound per point in the reference —
becomes one batched searchsorted of all scan points into the (tiny) sample
window, entirely on device.
"""
from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import PointBatch, RingScan
from .se3 import quat_conj, quat_mul, quat_normalize, quat_rotate, quat_slerp


def compensate_velocity(batch: PointBatch, velocity: jnp.ndarray) -> PointBatch:
    """p += v * t_point (CompensateVelocity, src/dataHandler.cpp:82-92)."""
    if batch.time is None:
        raise ValueError("PointBatch.time required for velocity deskew")
    xyz = batch.xyz + velocity[None, :] * batch.time[:, None].astype(
        batch.xyz.dtype)
    return batch._replace(xyz=xyz)


def center_time(stamp: float, times: np.ndarray,
                mask: Optional[np.ndarray] = None) -> Tuple[float, np.ndarray]:
    """Re-stamp a scan to its center time and re-base per-point offsets
    (CenterTime, src/laserProcessingNode.cpp:65-78). Host-side."""
    if mask is not None and mask.any():
        tv = times[mask]
    else:
        tv = times
    t_begin = stamp + float(tv.min(initial=0.0))
    t_end = stamp + float(tv.max(initial=0.0))
    t_center = t_begin + (t_end - t_begin) / 2.0
    return t_center, times + (stamp - t_center)


@functools.partial(jax.jit, static_argnames=("slerp",))
def orientation_at(t_query: jnp.ndarray, imu_stamps: jnp.ndarray,
                   imu_quats: jnp.ndarray, imu_count: jnp.ndarray,
                   slerp: bool = True) -> jnp.ndarray:
    """Batched orientation lookup q(t) from a padded sample window.

    t_query (...,); imu_stamps (W,) ascending with padding at +inf;
    imu_quats (W, 4); imu_count () valid samples. Queries are clamped to the
    window. slerp=False reproduces the reference's nearest-before stub.
    """
    W = imu_stamps.shape[0]
    after = jnp.searchsorted(imu_stamps, t_query)  # first stamp >= t
    before = jnp.clip(after - 1, 0, imu_count - 1)
    after = jnp.clip(after, 0, imu_count - 1)
    q0 = imu_quats[before]
    if not slerp:
        return q0
    q1 = imu_quats[after]
    t0 = imu_stamps[before]
    t1 = imu_stamps[after]
    denom = jnp.where(t1 > t0, t1 - t0, 1.0)
    u = jnp.clip((t_query - t0) / denom, 0.0, 1.0)
    return quat_slerp(q0, q1, u)


@functools.partial(jax.jit, static_argnames=("slerp",))
def rotational_deskew(
    scan: RingScan,
    scan_stamp: jnp.ndarray,  # () absolute scan stamp (post center_time)
    imu_stamps: jnp.ndarray,  # (W,) absolute, ascending, padded with +inf
    imu_quats: jnp.ndarray,  # (W, 4) wxyz, world <- imu
    imu_count: jnp.ndarray,  # () int32
    extrinsic_q: jnp.ndarray,  # (4,) lidar->IMU extrinsic rotation
    slerp: bool = True,
) -> Tuple[RingScan, jnp.ndarray]:
    """Per-point rotational deskew (Compensate, src/dataHandler.cpp:93-122).

    Returns (deskewed scan, q_init) where q_init = q_imu(t_scan) * extrinsic
    is the scan-center attitude used for orientation alignment
    (src/laserProcessingNode.cpp:113-116).
    """
    dtype = scan.xyz.dtype
    q_init = quat_normalize(quat_mul(
        orientation_at(scan_stamp, imu_stamps, imu_quats, imu_count,
                       slerp=slerp),
        extrinsic_q).astype(dtype))
    t_abs = scan_stamp + scan.time.reshape(-1)
    q_now = quat_mul(
        orientation_at(t_abs, imu_stamps, imu_quats, imu_count, slerp=slerp),
        extrinsic_q[None, :]).astype(dtype)
    q_diff = quat_normalize(quat_mul(quat_conj(q_init)[None, :], q_now))
    flat = scan.xyz.reshape(-1, 3)
    rotated = quat_rotate(q_diff, flat).reshape(scan.xyz.shape)
    return scan._replace(xyz=rotated), q_init


def align_to_orientation(scan: RingScan, q_init: jnp.ndarray) -> RingScan:
    """Rotate the whole cloud into the IMU-predicted attitude
    (pcl::transformPointCloud by ImuNowT, src/laserProcessingNode.cpp:113-116)."""
    flat = scan.xyz.reshape(-1, 3)
    rotated = quat_rotate(q_init[None, :], flat).reshape(scan.xyz.shape)
    return scan._replace(xyz=rotated)


class ImuStream:
    """Host-side append-only IMU buffer (ImuHandler, src/dataHandler.cpp:24-81)."""

    MIN_DT = 1e-5  # duplicate-stamp rejection threshold (:31)

    def __init__(self, window_capacity: int = 64):
        import threading

        self.stamps: List[float] = []
        self.quats: List[np.ndarray] = []
        self.window_capacity = window_capacity
        #: producers (bag reader / subscriber thread) may append while the
        #: consumer thread reads a window — the reference's equivalent
        #: buffer is mutex-guarded (and famously misuses try_lock,
        #: src/laserProcessingNode.cpp:84-89); this one locks correctly
        self._lock = threading.Lock()

    def add(self, stamp: float, quat_wxyz) -> bool:
        with self._lock:
            if self.stamps and stamp - self.stamps[-1] <= self.MIN_DT:
                return False
            self.stamps.append(float(stamp))
            self.quats.append(np.asarray(quat_wxyz, np.float64))
            return True

    def contains(self, t: float) -> bool:
        with self._lock:
            return bool(self.stamps) and \
                self.stamps[0] <= t <= self.stamps[-1]

    def window(self, t0: float, t1: float
               ) -> Tuple[np.ndarray, np.ndarray, int]:
        """Padded sample window covering [t0, t1] (one bracketing sample on
        each side). Returns (stamps (W,), quats (W,4), count)."""
        W = self.window_capacity
        with self._lock:
            stamps = np.asarray(self.stamps)
            quats = np.asarray(self.quats) if self.quats else \
                np.zeros((0, 4))
        lo = int(np.searchsorted(stamps, t0, side="right")) - 1
        hi = int(np.searchsorted(stamps, t1, side="left")) + 1
        lo = max(lo, 0)
        hi = min(hi, len(stamps))
        sel = slice(lo, hi)
        s = stamps[sel][:W]
        q = quats[sel][:W]
        n = len(s)
        out_s = np.full((W,), np.inf)
        out_q = np.tile(np.array([1.0, 0, 0, 0]), (W, 1))
        out_s[:n] = s
        out_q[:n] = q
        return out_s, out_q, n

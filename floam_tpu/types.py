"""Core array containers (all fixed-shape pytrees).

The reference's dynamic PCL point clouds (``pcl::PointCloud<PointXYZIRT>``,
reference include/lidar.h:15-32) become fixed-capacity padded arrays with
validity masks so that every stage is a statically-shaped XLA program.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class RingScan(NamedTuple):
    """One revolution, bucketed ring-major (reference: RingExtractionVelodyne,
    src/laserProcessingClass.cpp:11-22). Points are compacted to the front of
    each ring row and keep their original stream (azimuth) order.

    Shapes: xyz (R, C, 3); intensity/time/mask (R, C).
    ``time`` is seconds relative to the scan header stamp.
    """

    xyz: jnp.ndarray
    intensity: jnp.ndarray
    time: jnp.ndarray
    mask: jnp.ndarray  # bool

    @property
    def num_rings(self) -> int:
        return self.xyz.shape[0]

    @property
    def capacity(self) -> int:
        return self.xyz.shape[1]

    @staticmethod
    def from_host(xyz: np.ndarray, time: np.ndarray, mask: np.ndarray,
                  intensity: Optional[np.ndarray] = None) -> "RingScan":
        """Build a device RingScan from host arrays with ONE host->device
        transfer: the fields are packed into a single (R, C, 5|6) plane and
        split by cheap device slices. Separate per-field uploads are
        LATENCY-bound (a full host-device round trip each — tens of ms per
        frame through a tunneled TPU), not bandwidth-bound."""
        planes = [np.asarray(xyz, np.float32),
                  np.asarray(time, np.float32)[..., None],
                  np.asarray(mask, np.float32)[..., None]]
        if intensity is not None:
            planes.append(np.asarray(intensity, np.float32)[..., None])
        d = jnp.asarray(np.concatenate(planes, axis=-1))
        R, C = d.shape[0], d.shape[1]
        inten = d[..., 5] if intensity is not None else \
            jnp.zeros((R, C), jnp.float32)
        return RingScan(xyz=d[..., :3], intensity=inten, time=d[..., 3],
                        mask=d[..., 4] > 0.5)


class PointBatch(NamedTuple):
    """A flat masked point set. Shapes: xyz (N, 3); rest (N,)."""

    xyz: jnp.ndarray
    mask: jnp.ndarray  # bool
    intensity: Optional[jnp.ndarray] = None
    time: Optional[jnp.ndarray] = None

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))

    def to_numpy_valid(self) -> np.ndarray:
        """Host-side: strip padding, return (n, 3) float array."""
        m = np.asarray(self.mask)
        return np.asarray(self.xyz)[m]


class Pose(NamedTuple):
    """SE(3) pose as unit quaternion (w, x, y, z) + translation.

    Replaces the reference's 7-double Ceres parameter block
    (include/odomEstimationClass.h:90-93, Eigen order x,y,z,w; we use w-first).
    """

    q: jnp.ndarray  # (4,) wxyz
    t: jnp.ndarray  # (3,)

    @staticmethod
    def identity(dtype=jnp.float32) -> "Pose":
        return Pose(
            q=jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype),
            t=jnp.zeros((3,), dtype=dtype),
        )

    def matrix(self) -> jnp.ndarray:
        from .ops import se3

        m = jnp.eye(4, dtype=self.t.dtype)
        m = m.at[:3, :3].set(se3.quat_to_mat(self.q))
        m = m.at[:3, 3].set(self.t)
        return m

    @staticmethod
    def from_matrix(m) -> "Pose":
        from .ops import se3

        m = jnp.asarray(m)
        return Pose(q=se3.mat_to_quat(m[..., :3, :3]), t=m[..., :3, 3])


class VoxelGrid(NamedTuple):
    """Sorted spatial-hash grid over a masked point set — the TPU-native
    replacement for the reference's per-scan ``pcl::KdTreeFLANN`` rebuilds
    (src/odomEstimationClass.cpp:78-79).

    Points are sorted by spatial-hash key; queries binary-search the 27
    neighbor cell keys and gather a bounded number of candidates per cell.
    Invalid slots carry key = INT32_MAX and sort to the end.
    """

    keys: jnp.ndarray  # (M,) int32 sorted hash keys
    xyz: jnp.ndarray  # (M, 3) points permuted into key order
    mask: jnp.ndarray  # (M,) bool, in key order
    cell_size: jnp.ndarray  # () f32


class MapState(NamedTuple):
    """Local feature map for scan-to-map odometry (replaces the reference's
    laserCloudCornerMap/laserCloudSurfMap + two kd-trees,
    src/odomEstimationClass.cpp:9-18,78-79). Each side is a
    ops.voxelmap.VoxelHashMap (voxel-centroid hash table that doubles as
    the NN structure) plus its packed query view (dense row table rebuilt
    whenever the map changes; the k-NN hot loop only touches the view)."""

    edge: "VoxelHashMap"  # type: ignore[name-defined]  # noqa: F821
    surf: "VoxelHashMap"  # type: ignore[name-defined]  # noqa: F821
    edge_view: jnp.ndarray  # (H_e, 16)
    surf_view: jnp.ndarray  # (H_s, 16)


class OdomState(NamedTuple):
    """Carried state of the odometry loop (src/odomEstimationClass.cpp)."""

    pose: Pose  # `odom`
    last_pose: Pose  # `last_odom`
    map: MapState
    #: decaying outer-iteration budget (12 after init -> 2; :22,31,59-60)
    opt_count: jnp.ndarray  # () int32
    last_kf_pose: Pose  # KeyFrameUpdate gate reference pose (:320-343)
    frame_idx: jnp.ndarray  # () int32 (0 before the first registered frame)


def masked_points(xyz, mask=None, intensity=None, time=None) -> PointBatch:
    xyz = jnp.asarray(xyz)
    if mask is None:
        mask = jnp.ones(xyz.shape[:-1], dtype=bool)
    return PointBatch(xyz=xyz, mask=mask, intensity=intensity, time=time)


def pad_points(xyz: np.ndarray, capacity: int, **extras) -> PointBatch:
    """Host-side helper: pad an (n,3) numpy array to a fixed-capacity batch."""
    n = min(len(xyz), capacity)
    out = np.zeros((capacity, 3), dtype=np.float32)
    out[:n] = xyz[:n]
    mask = np.zeros((capacity,), dtype=bool)
    mask[:n] = True
    fields = {}
    for k, v in extras.items():
        if v is None:
            fields[k] = None
            continue
        buf = np.zeros((capacity,), dtype=np.float32)
        buf[:n] = v[:n]
        fields[k] = jnp.asarray(buf)
    return PointBatch(
        xyz=jnp.asarray(out), mask=jnp.asarray(mask),
        intensity=fields.get("intensity"), time=fields.get("time"),
    )

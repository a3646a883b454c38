"""Voxel-grid operations on masked fixed-capacity point sets.

TPU-native replacements for the reference's PCL filters:
  * ``voxel_downsample``  -> pcl::VoxelGrid (centroid per occupied voxel;
    reference use at src/odomEstimationClass.cpp:13-14,137-142,289-292 and
    src/laserMappingClass.cpp:31,175-184)
  * ``crop_mask``         -> pcl::CropBox +-100 m around the pose
    (src/odomEstimationClass.cpp:270-287)

Everything is static-shape: dynamic point counts become validity masks, and
"number of occupied voxels" becomes a fixed output capacity (overflow voxels
are dropped — capacities are sized so this does not happen in practice, and
the hot path counts every capacity drop per frame: OdomDiagnostics
scan_*/map_insert_dropped, surfaced in summary.json "dropped_points",
frame_info.jsonl, and a one-shot runtime warning in SequenceRunner).

Voxel identity uses a 3-D multiplicative hash of the integer cell index into
uint32. Hash collisions merge distinct voxels; with ~1e5 points the expected
number of collisions per call is ~1 (birthday bound 27n^2/2^33), which moves
a single output centroid — negligible against the reference's own lossy
voxelization.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_INVALID_KEY = jnp.uint32(0xFFFFFFFF)


def _fmix32(k: jnp.ndarray) -> jnp.ndarray:
    """murmur3 finalizer: full-avalanche 32-bit mix (bijective)."""
    k = k ^ (k >> 16)
    k = k * jnp.uint32(0x85EBCA6B)
    k = k ^ (k >> 13)
    k = k * jnp.uint32(0xC2B2AE35)
    k = k ^ (k >> 16)
    return k


def cell_key(ixyz: jnp.ndarray) -> jnp.ndarray:
    """Hash integer cell coords (..., 3) int32 -> uint32 key.

    Chained murmur3 mixing gives near-birthday-bound collision rates even on
    dense small coordinate ranges (the classic prime-multiply-XOR spatial
    hash collides structurally there). Keys are steered away from the
    INVALID sentinel so a real cell can never alias the padding key.
    """
    u = ixyz.astype(jnp.uint32)
    k = _fmix32(u[..., 0])
    k = _fmix32(k ^ u[..., 1])
    k = _fmix32(k ^ u[..., 2])
    return jnp.where(k == _INVALID_KEY, jnp.uint32(0), k)


def voxel_indices(xyz: jnp.ndarray, leaf: jnp.ndarray) -> jnp.ndarray:
    return jnp.floor(xyz / leaf).astype(jnp.int32)


def voxel_downsample(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    leaf,
    out_capacity: int,
    extra: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Centroid-per-voxel downsample.

    xyz (N,3), mask (N,) -> (out_xyz (K,3), out_mask (K,), out_extra)
    where K = out_capacity. ``extra`` (N, E) is averaged per voxel alongside
    the coordinates (used for intensity).
    """
    leaf = jnp.asarray(leaf, xyz.dtype)
    keys = cell_key(voxel_indices(xyz, leaf))
    keys = jnp.where(mask, keys, _INVALID_KEY)
    order = jnp.argsort(keys)
    keys_s = keys[order]
    xyz_s = xyz[order]
    mask_s = mask[order]

    head = jnp.concatenate(
        [jnp.ones((1,), bool), keys_s[1:] != keys_s[:-1]]) & mask_s
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1  # segment id per point
    in_cap = mask_s & (seg >= 0) & (seg < out_capacity)
    seg_c = jnp.clip(seg, 0, out_capacity - 1)

    w = in_cap.astype(xyz.dtype)
    sums = jax.ops.segment_sum(xyz_s * w[:, None], seg_c,
                               num_segments=out_capacity)
    counts = jax.ops.segment_sum(w, seg_c, num_segments=out_capacity)
    denom = jnp.maximum(counts, 1.0)[:, None]
    out_xyz = sums / denom
    out_mask = counts > 0

    out_extra = None
    if extra is not None:
        extra_s = extra[order]
        if extra_s.ndim == 1:
            extra_s = extra_s[:, None]
        esums = jax.ops.segment_sum(extra_s * w[:, None], seg_c,
                                    num_segments=out_capacity)
        out_extra = esums / denom
    return out_xyz, out_mask, out_extra


def voxel_downsample_np(xyz, leaf: float):
    """Host-side centroid-per-voxel downsample for EXPORT paths (NumPy;
    no capacity cap). Million-point merged-map exports would otherwise run
    `jnp.argsort` on device — the op class docs/PERFORMANCE.md forbids on
    the TPU — for a once-per-run host artifact. bincount-based: one sort,
    no scatter loops."""
    import numpy as np

    xyz = np.asarray(xyz)
    if len(xyz) == 0:
        return xyz
    cell = np.floor(xyz / leaf).astype(np.int64)
    OFF = 1 << 20
    packed = (((cell[:, 0] + OFF) << 42) | ((cell[:, 1] + OFF) << 21)
              | (cell[:, 2] + OFF))
    _, inv = np.unique(packed, return_inverse=True)
    counts = np.bincount(inv).astype(xyz.dtype)
    out = np.stack([np.bincount(inv, weights=xyz[:, k]) for k in range(3)],
                   axis=1)
    return (out / counts[:, None]).astype(xyz.dtype)


class StreamingVoxelDownsample:
    """Incremental host-side centroid-per-voxel downsample for STREAMED
    export paths: each scan's cloud is reduced to its per-voxel partial
    sums on arrival, so peak RSS is O(occupied voxels), never O(points of
    the whole run) — the fix for the reference's concatenate-then-filter
    SaveMerged (src/odomEstimationNode.cpp:66-96) at long-run scale."""

    _OFF = 1 << 20

    def __init__(self, leaf: float):
        import numpy as np

        self.leaf = float(leaf)
        self._keys = np.zeros((0,), np.int64)
        self._sums = np.zeros((0, 3), np.float64)
        self._counts = np.zeros((0,), np.int64)

    def add(self, xyz) -> None:
        import numpy as np

        xyz = np.asarray(xyz)
        if len(xyz) == 0:
            return
        cell = np.floor(xyz / self.leaf).astype(np.int64)
        packed = (((cell[:, 0] + self._OFF) << 42)
                  | ((cell[:, 1] + self._OFF) << 21)
                  | (cell[:, 2] + self._OFF))
        keys, inv = np.unique(packed, return_inverse=True)
        sums = np.stack(
            [np.bincount(inv, weights=xyz[:, k]) for k in range(3)], axis=1)
        counts = np.bincount(inv).astype(np.int64)
        # merge with the running per-voxel partials (group-by on keys)
        all_keys = np.concatenate([self._keys, keys])
        merged, minv = np.unique(all_keys, return_inverse=True)
        msums = np.zeros((len(merged), 3), np.float64)
        np.add.at(msums, minv[:len(self._keys)], self._sums)
        np.add.at(msums, minv[len(self._keys):], sums)
        mcounts = np.bincount(minv, weights=np.concatenate(
            [self._counts, counts]).astype(np.float64)).astype(np.int64)
        self._keys, self._sums, self._counts = merged, msums, mcounts

    def centroids(self):
        import numpy as np

        if len(self._keys) == 0:
            return np.zeros((0, 3), np.float32)
        return (self._sums / self._counts[:, None]).astype(np.float32)


def crop_mask(xyz: jnp.ndarray, mask: jnp.ndarray, center: jnp.ndarray,
              radius) -> jnp.ndarray:
    """Axis-aligned box crop: keep points with |p - center|_inf <= radius."""
    radius = jnp.asarray(radius, xyz.dtype)
    inside = jnp.all(jnp.abs(xyz - center) <= radius, axis=-1)
    return mask & inside

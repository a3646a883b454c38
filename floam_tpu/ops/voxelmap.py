"""Voxel hash-table map: the engine's central data structure.

One bucketed hash table replaces three reference structures at once:
  * the feature map clouds (laserCloudCornerMap/SurfMap,
    src/odomEstimationClass.cpp:9-10),
  * the per-keyframe VoxelGrid re-downsampling of the whole map (:289-292),
  * the per-scan KdTreeFLANN rebuilds + 5-NN queries (:78-79,153,206).

Design (TPU-first): H buckets x W ways of per-voxel running centroids
(sum, count, full hash key). Everything is O(points) scatter/gather or
O(table) vectorized — **no sorts and no binary searches** on the hot path
(profiling on a v5e chip showed argsort-based voxelization and
searchsorted-based grid NN dominate any sorted-structure design at
~10 ms/scan):

  * insert: W scatter-claim rounds — each pending point tries way w of its
    cell's bucket, claims it if empty (scatter-set, last-writer-wins breaks
    same-batch races cleanly), verifies by gather-back, else advances to
    the next way. Points of an already-stored cell match its key in the
    round that reaches its way. Running mean per voxel, weight-capped (the
    reference instead re-averages the full map every keyframe);
  * crop: vectorized way eviction outside the +-crop_radius box, keys
    tombstone-free (evicted ways return to EMPTY) — replaces pcl::CropBox
    (:270-287);
  * k-NN: direct-indexed gather of all W ways over a *statically pruned*
    integer offset neighborhood whose cells can intersect the search ball
    (81 cells at leaf 0.8 / radius 1.0; 179 at leaf 0.4). Exact over the
    gate radius because map points ARE voxel centroids, one per cell, and
    bucket overflow (> W cells per bucket) is the only loss mode —
    negligible at <= 25% bucket load.
"""
from __future__ import annotations

import functools
import math
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .voxel import cell_key

EMPTY_KEY = jnp.uint32(0xFFFFFFFF)  # cell_key never produces this
NUM_WAYS = 4


class VoxelHashMap(NamedTuple):
    """Bucketed voxel table. Shapes: sums (H*W, 3), counts (H*W,),
    keys (H*W,) — flattened bucket-major so ways of one bucket are
    contiguous rows."""

    sums: jnp.ndarray
    counts: jnp.ndarray
    keys: jnp.ndarray
    leaf: jnp.ndarray  # () voxel edge length

    @property
    def num_buckets(self) -> int:
        return self.counts.shape[0] // NUM_WAYS

    def centroids(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.sums / jnp.maximum(self.counts, 1.0)[:, None]
        return c, self.counts > 0

    def num_occupied(self) -> jnp.ndarray:
        return jnp.sum(self.counts > 0, dtype=jnp.int32)


def empty(num_buckets: int, leaf: float, dtype=jnp.float32) -> VoxelHashMap:
    assert num_buckets & (num_buckets - 1) == 0, "num_buckets must be 2^k"
    HW = num_buckets * NUM_WAYS
    return VoxelHashMap(
        sums=jnp.zeros((HW, 3), dtype),
        counts=jnp.zeros((HW,), dtype),
        keys=jnp.full((HW,), EMPTY_KEY, jnp.uint32),
        leaf=jnp.asarray(leaf, dtype),
    )


def _bucket_of(keys: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    return (keys & jnp.uint32(num_buckets - 1)).astype(jnp.int32)


def _resolve_ways(table_keys: jnp.ndarray, pkeys: jnp.ndarray,
                  mask: jnp.ndarray, num_buckets: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assign each point a way slot in its bucket, claiming empty ways.

    Returns (slot per point; HW = dropped, updated table_keys)."""
    HW = num_buckets * NUM_WAYS
    bucket = _bucket_of(pkeys, num_buckets)
    slot_out = jnp.full(pkeys.shape, HW, jnp.int32)
    pending = mask
    for w in range(NUM_WAYS):
        slot = bucket * NUM_WAYS + w
        cur = table_keys[slot]
        claimable = pending & (cur == EMPTY_KEY)
        table_keys = table_keys.at[
            jnp.where(claimable, slot, HW)].set(pkeys, mode="drop")
        winner = table_keys[slot]
        resolved = pending & (winner == pkeys)
        slot_out = jnp.where(resolved, slot, slot_out)
        pending = pending & ~resolved
    return slot_out, table_keys


def insert(vm: VoxelHashMap, xyz: jnp.ndarray, mask: jnp.ndarray,
           count_cap: float = 25.0) -> VoxelHashMap:
    """Scatter points into their voxels (running mean, weight-capped)."""
    H = vm.num_buckets
    key = cell_key(jnp.floor(xyz / vm.leaf).astype(jnp.int32))
    slot, keys = _resolve_ways(vm.keys, key, mask, H)
    w = (slot < H * NUM_WAYS).astype(xyz.dtype)
    sums = vm.sums.at[slot].add(xyz * w[:, None], mode="drop")
    counts = vm.counts.at[slot].add(w, mode="drop")
    over = counts > count_cap
    scale = jnp.where(over, count_cap / jnp.maximum(counts, 1.0), 1.0)
    return VoxelHashMap(sums=sums * scale[:, None],
                        counts=jnp.minimum(counts, count_cap),
                        keys=keys, leaf=vm.leaf)


def crop(vm: VoxelHashMap, center: jnp.ndarray, radius) -> VoxelHashMap:
    """Evict voxels whose centroid leaves the +-radius box around ``center``
    (pcl::CropBox at src/odomEstimationClass.cpp:270-287). Evicted ways
    return to EMPTY so buckets never clog with tombstones."""
    c, occ = vm.centroids()
    keep = occ & (jnp.max(jnp.abs(c - center), axis=-1) <= radius)
    k = keep.astype(vm.sums.dtype)
    return vm._replace(
        sums=vm.sums * k[:, None],
        counts=vm.counts * k,
        keys=jnp.where(keep, vm.keys, EMPTY_KEY),
    )


def neighbor_offsets(leaf: float, radius: float) -> np.ndarray:
    """Integer cell offsets whose cells can intersect a ``radius`` ball
    around any query point in the base cell: pruned by the minimum distance
    between the base cell and the offset cell."""
    r = int(math.ceil(radius / leaf)) + 1
    offs: List[Tuple[int, int, int]] = []
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            for dz in range(-r, r + 1):
                d = sum((max(abs(o) - 1, 0) * leaf) ** 2
                        for o in (dx, dy, dz))
                if d <= radius * radius + 1e-9:
                    offs.append((dx, dy, dz))
    return np.asarray(offs, np.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def _query_impl(vm: VoxelHashMap, queries, qmask, offsets, k: int):
    H = vm.num_buckets
    dtype = queries.dtype
    big = jnp.asarray(jnp.inf, dtype)
    base = jnp.floor(queries / vm.leaf).astype(jnp.int32)  # (Q, 3)
    cells = base[:, None, :] + offsets[None, :, :]  # (Q, O, 3)
    keys = cell_key(cells)  # (Q, O)
    way0 = _bucket_of(keys, H) * NUM_WAYS  # (Q, O)
    slots = way0[..., None] + jnp.arange(NUM_WAYS)[None, None, :]  # (Q,O,W)
    cnt = vm.counts[slots]  # (Q, O, W)
    have = vm.keys[slots]
    cand = vm.sums[slots] / jnp.maximum(cnt, 1.0)[..., None]  # (Q, O, W, 3)
    ok = (cnt > 0) & (have == keys[..., None])
    d = queries[:, None, None, :] - cand
    d2 = jnp.where(ok, jnp.sum(d * d, axis=-1), big)
    Q, O = keys.shape
    d2 = d2.reshape(Q, O * NUM_WAYS)
    cand = cand.reshape(Q, O * NUM_WAYS, 3)
    neg, idx = jax.lax.top_k(-d2, k)
    nn_d2 = jnp.where(qmask[:, None], -neg, big)
    nn_xyz = jnp.take_along_axis(cand, idx[..., None], axis=1)
    return nn_xyz, nn_d2


def query_knn(vm: VoxelHashMap, queries: jnp.ndarray, qmask: jnp.ndarray,
              offsets: np.ndarray, k: int = 5):
    """k nearest voxel centroids within the pruned neighborhood.

    ``offsets`` comes from ``neighbor_offsets(leaf, radius)`` (static).
    Returns (nn_xyz (Q,k,3), nn_sqdist (Q,k); +inf where invalid).
    """
    return _query_impl(vm, queries, qmask, jnp.asarray(offsets), k)


def compact(vm: VoxelHashMap, out_capacity: int
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack occupied-voxel centroids to the front of a fixed-size array via
    prefix-sum compaction (no sort). Returns (xyz (C,3), mask (C,))."""
    c, occ = vm.centroids()
    pos = jnp.cumsum(occ.astype(jnp.int32)) - 1  # target index per slot
    tgt = jnp.where(occ & (pos < out_capacity), pos, out_capacity)
    out = jnp.zeros((out_capacity, 3), vm.sums.dtype).at[tgt].set(
        c, mode="drop")
    n = jnp.minimum(jnp.sum(occ, dtype=jnp.int32), out_capacity)
    mask = jnp.arange(out_capacity) < n
    return out, mask


def hash_downsample(xyz: jnp.ndarray, mask: jnp.ndarray, leaf,
                    num_buckets: int, out_capacity: int,
                    dtype=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort-free voxel-grid downsample (centroid per voxel) through a
    scratch bucketed table: W scatter-claim rounds + one scatter-add +
    prefix-sum compaction. Replaces the argsort-based
    ops.voxel.voxel_downsample on the hot path (~8 ms -> sub-ms per scan
    on a v5e chip at 147k points)."""
    dtype = dtype or xyz.dtype
    vm = empty(num_buckets, leaf, dtype)
    vm = insert(vm, xyz.astype(dtype), mask, count_cap=jnp.inf)
    return compact(vm, out_capacity)

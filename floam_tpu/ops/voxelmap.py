"""Voxel hash-table map: the engine's central data structure.

One bucketed hash table replaces three reference structures at once:
  * the feature map clouds (laserCloudCornerMap/SurfMap,
    src/odomEstimationClass.cpp:9-10),
  * the per-keyframe VoxelGrid re-downsampling of the whole map (:289-292),
  * the per-scan KdTreeFLANN rebuilds + 5-NN queries (:78-79,153,206).

Layout and algorithms are driven by the measured v5e cost model (see
docs/PERFORMANCE.md). The honest law for the k-NN hot loop's row gather —
with RUNTIME indices; constant-index microbenchmarks are ~100x flattered by
compile-time specialization — is a per-program fixed cost plus ~2-6 ns per
gathered ROW, nearly independent of row width up to ~1 KB rows while the
table stays in the fast tier (<= ~8 MB). Row COUNT is therefore the
variable that matters, which drives the central layout decision:

  * buckets are SUPERCELLS — SxSxS blocks of voxels (S configurable per
    table) — with S^3 way slots per bucket, one per sub-voxel position. A
    radius-1 m search needs candidate cells intersecting the ball; counted
    in supercells that is several-fold fewer gathered rows than per-voxel
    buckets, at wider (but latency-priced, so ~free) rows. Measured on a
    v5e at the odometry shapes: edge map S=2 -> S=3 cuts the per-round
    gather from 1.49 ms to 0.67 ms, surf S=2 -> S=4 from 0.90 ms to
    0.23 ms;
  * the authoritative table is H buckets x W ways stored as FLAT 1-D
    PLANES (sx, sy, sz, count, key) — every insert/evict touches only
    1-D scatters;
  * a derived PACKED QUERY VIEW (H, 4*B) f32 — B = ways padded to a lane
    block — [cx ways | cy ways | cz ways | pad] channel blocks, centroids
    pre-divided, empty/pad ways pushed to far-away coords — is rebuilt
    densely after map changes so the k-NN hot loop is ONE 2-D row gather +
    pure elementwise math;
  * bucket selection uses a LINEAR hash (k = ux*A + uy*B + uz*C mod 2^32)
    of the SUPERCELL index: per query only the base supercell is hashed
    and each neighbor offset adds a precomputed delta — no integer-multiply
    tensors at (Q, O) scale. Way ownership uses a SECOND linear key of the
    VOXEL cell over independent multipliers, so a false ownership match
    requires a joint alias across both lattices (see _OA/_OB/_OC);
  * inserts need no way-claim scan in the common case: a voxel's natural
    slot is its sub-voxel id within the supercell. Only bucket-aliased
    cells landing on the same (bucket, subid) probe the next ways
    (``probe_rounds`` rounds of gather/scatter-claim);
  * queries do NOT verify keys: a bucket-aliased way holds a *real* map
    centroid from a far-away cell, which simply loses the top-k by
    distance — so the search stays exact over stored cells within the
    pruned radius;
  * k-NN selection packs candidate indices into the low mantissa bits of
    the (non-negative) distances, so 5 rounds of uint-min + mask replace a
    sort-based top_k (IEEE order == uint order for floats >= 0; the
    2^-13 relative distance perturbation is far below the association
    gates).

Insert: running mean per voxel, weight-capped (the reference instead
re-averages the full map every keyframe). Bucket overflow (more aliased
cells on a bucket than free ways) is the only loss mode — points in
already-stored voxels always accumulate; only NEW voxels can be dropped,
and only while their bucket is saturated.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import table_gather, table_scatter_add, table_scatter_set

#: way-ownership sentinel. linear_key CAN produce this value for ~1 cell in
#: 2^32; insert() remaps that key to 0xFFFFFFFE (see _ownership_key), trading
#: a ~2^-32-per-cell chance of two specific cells merging for a guaranteed
#: never-ownable-slot bug.
EMPTY_KEY = jnp.uint32(0xFFFFFFFF)
SUPER = 2  # default voxels per supercell edge
NUM_WAYS = SUPER ** 3  # sub-voxel slots per bucket at the default size
#: odd multipliers for the linear bucket hash
_LA = np.uint32(0x9E3779B1)
_LB = np.uint32(0x85EBCA77)
_LC = np.uint32(0xC2B2AE3D)
#: INDEPENDENT odd multipliers for the way-OWNERSHIP key. Keeping the
#: ownership lattice independent of the bucket lattice means a silent
#: centroid merge requires a JOINT event — an ownership-key alias (none
#: within +-1188 cells; tests/test_voxelmap.py) AND bucket congruence of
#: the bucket-key (density 1/num_buckets) — so exact dedup needs no hard
#: map-extent limit: even the finest preset (leaf 0.1, crop +-100 m =
#: +-2000 live cells) sees an expected << 1e-4 aliased live pairs.
_OA = np.uint32(0xF1E54A8B)
_OB = np.uint32(0xA00641A9)
_OC = np.uint32(0xAF266A95)
#: coordinate of empty ways in the packed view (far from any query)
_FAR = 1e9


def way_block(ways: int) -> int:
    """Lane-aligned padded way count (power of two >= ways, min 8) so the
    packed view's channel blocks slice at aligned offsets."""
    b = 8
    while b < ways:
        b *= 2
    return b


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("sx", "sy", "sz", "counts", "keys", "leaf"),
    meta_fields=("super",),
)
@dataclasses.dataclass(frozen=True)
class VoxelHashMap:
    """Supercell-bucketed voxel table as flat planes of length H * super^3.

    ``super`` (static) is the supercell edge in voxels; larger supercells
    mean fewer, fatter rows per k-NN neighborhood (see module docstring).
    """

    sx: jnp.ndarray
    sy: jnp.ndarray
    sz: jnp.ndarray
    counts: jnp.ndarray
    keys: jnp.ndarray  # uint32 linear cell key (way ownership)
    leaf: jnp.ndarray  # () voxel edge length
    super: int = SUPER

    def _replace(self, **kw) -> "VoxelHashMap":
        return dataclasses.replace(self, **kw)

    @property
    def ways(self) -> int:
        return self.super ** 3

    @property
    def num_buckets(self) -> int:
        return self.counts.shape[0] // self.ways

    def centroids(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = jnp.maximum(self.counts, 1.0)
        c = jnp.stack([self.sx / d, self.sy / d, self.sz / d], axis=-1)
        return c, self.counts > 0

    def num_occupied(self) -> jnp.ndarray:
        return jnp.sum(self.counts > 0, dtype=jnp.int32)


def empty(num_buckets: int, leaf: float, dtype=jnp.float32,
          super: int = SUPER) -> VoxelHashMap:
    assert num_buckets & (num_buckets - 1) == 0, "num_buckets must be 2^k"
    HW = num_buckets * super ** 3
    # distinct buffers per plane (a shared zeros array would alias donated
    # buffers inside jitted state updates)
    return VoxelHashMap(
        sx=jnp.zeros((HW,), dtype),
        sy=jnp.zeros((HW,), dtype),
        sz=jnp.zeros((HW,), dtype),
        counts=jnp.zeros((HW,), dtype),
        keys=jnp.full((HW,), EMPTY_KEY, jnp.uint32),
        leaf=jnp.asarray(leaf, dtype),
        super=super,
    )


def linear_key(ixyz: jnp.ndarray) -> jnp.ndarray:
    """Linear hash of integer cells (..., 3): wraps mod 2^32 and is
    additive in the cell coordinates (enables per-offset deltas)."""
    u = ixyz.astype(jnp.uint32)
    return (u[..., 0] * _LA + u[..., 1] * _LB + u[..., 2] * _LC)


def _bucket_of(lkeys: jnp.ndarray, num_buckets: int) -> jnp.ndarray:
    return (lkeys & jnp.uint32(num_buckets - 1)).astype(jnp.int32)


def _subid(cells: jnp.ndarray, super: int = SUPER) -> jnp.ndarray:
    """Sub-voxel slot within the SxSxS supercell:
    (x mod S)*S^2 + (y mod S)*S + (z mod S)."""
    b = jnp.remainder(cells, super)
    return (b[..., 0] * (super * super) + b[..., 1] * super
            + b[..., 2]).astype(jnp.int32)


def _resolve_slots(table_keys: jnp.ndarray, bucket: jnp.ndarray,
                   subid: jnp.ndarray, pkeys: jnp.ndarray,
                   mask: jnp.ndarray, num_buckets: int, probe_rounds: int,
                   ways: int = NUM_WAYS) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assign each point its slot: the sub-voxel way when free/owned, else
    probe subsequent ways (bucket-alias overflow). Returns
    (slot per point; HW = dropped, updated table_keys)."""
    HW = num_buckets * ways
    slot_out = jnp.full(pkeys.shape, HW, jnp.int32)
    pending = mask
    for r in range(probe_rounds):
        way = (subid + r) % ways
        slot = bucket * ways + way
        cur = table_gather(table_keys, slot)
        claimable = pending & (cur == EMPTY_KEY)
        table_keys = table_scatter_set(
            table_keys, jnp.where(claimable, slot, HW), pkeys)
        winner = table_gather(table_keys, slot)
        resolved = pending & (winner == pkeys)
        slot_out = jnp.where(resolved, slot, slot_out)
        pending = pending & ~resolved
    return slot_out, table_keys


def _ownership_key(cells: jnp.ndarray) -> jnp.ndarray:
    """Way-ownership key: a second linear hash over INDEPENDENT multipliers
    (see _OA/_OB/_OC), with the EMPTY sentinel remapped
    (0xFFFFFFFF -> 0xFFFFFFFE) so every live voxel can own a slot."""
    u = cells.astype(jnp.uint32)
    k = u[..., 0] * _OA + u[..., 1] * _OB + u[..., 2] * _OC
    return jnp.where(k == EMPTY_KEY, jnp.uint32(0xFFFFFFFE), k)


def insert(vm: VoxelHashMap, xyz: jnp.ndarray, mask: jnp.ndarray,
           count_cap: float = 25.0, bucket_base=None,
           global_buckets: int = 0, probe_rounds: int = 2,
           return_dropped: bool = False):
    """Scatter points into their voxels (running mean, weight-capped).

    When ``vm`` is a device-local shard of a bucket-range-sharded table,
    pass ``global_buckets`` (full table size, static) and ``bucket_base``
    (this device's first global bucket, traced): points hashing outside the
    local range are dropped here and inserted by their owning device.

    ``return_dropped``: additionally return the () int32 count of VALID
    points that found no slot within ``probe_rounds`` (bucket-alias
    overflow of an undersized table) — a mis-sized table/crop/preset combo
    must surface as a counter, not as silent ATE loss.
    """
    H = vm.num_buckets
    cells = jnp.floor(xyz / vm.leaf).astype(jnp.int32)
    # ownership uses a SECOND linear key over independent multipliers
    # (validated alias-free within +-1188 cells, tests/test_voxelmap.py):
    # within that range dedup is exactly injective, and beyond it a silent
    # merge additionally requires bucket congruence of the (independent)
    # bucket key — a joint event with expected count << 1e-4 live pairs even
    # for the finest preset (leaf 0.1 at +-100 m crop = +-2000 live cells).
    # Linear keys avoid the murmur mix, whose emulated uint32 multiplies
    # dominate at full-cloud scale
    mkey = _ownership_key(cells)
    parent = cells // vm.super  # floor division (negatives round down)
    pkey = linear_key(parent)
    sub = _subid(cells, vm.super)
    if global_buckets:
        gbucket = _bucket_of(pkey, global_buckets)
        bucket = gbucket - bucket_base
        mask = mask & (gbucket >= bucket_base) & (bucket < H)
        bucket = jnp.clip(bucket, 0, H - 1)  # keep masked gathers in range
    else:
        bucket = _bucket_of(pkey, H)
    slot, keys = _resolve_slots(vm.keys, bucket, sub, mkey, mask, H,
                                probe_rounds, vm.ways)
    w = (slot < H * vm.ways).astype(vm.sx.dtype)
    sx = table_scatter_add(vm.sx, slot, xyz[:, 0].astype(vm.sx.dtype) * w)
    sy = table_scatter_add(vm.sy, slot, xyz[:, 1].astype(vm.sx.dtype) * w)
    sz = table_scatter_add(vm.sz, slot, xyz[:, 2].astype(vm.sx.dtype) * w)
    counts = table_scatter_add(vm.counts, slot, w)
    over = counts > count_cap
    scale = jnp.where(over, count_cap / jnp.maximum(counts, 1.0), 1.0)
    out = vm._replace(sx=sx * scale, sy=sy * scale, sz=sz * scale,
                      counts=jnp.minimum(counts, count_cap), keys=keys)
    if return_dropped:
        dropped = jnp.sum(mask & (slot == H * vm.ways), dtype=jnp.int32)
        return out, dropped
    return out


def crop(vm: VoxelHashMap, center: jnp.ndarray, radius) -> VoxelHashMap:
    """Evict voxels whose centroid leaves the +-radius box around ``center``
    (pcl::CropBox at src/odomEstimationClass.cpp:270-287). Evicted ways
    return to EMPTY so buckets never clog with tombstones."""
    d = jnp.maximum(vm.counts, 1.0)
    keep = ((vm.counts > 0)
            & (jnp.abs(vm.sx / d - center[0]) <= radius)
            & (jnp.abs(vm.sy / d - center[1]) <= radius)
            & (jnp.abs(vm.sz / d - center[2]) <= radius))
    k = keep.astype(vm.sx.dtype)
    return vm._replace(
        sx=vm.sx * k, sy=vm.sy * k, sz=vm.sz * k, counts=vm.counts * k,
        keys=jnp.where(keep, vm.keys, EMPTY_KEY),
    )


# ---------------------------------------------------------------------------
# Packed query view + k-NN
# ---------------------------------------------------------------------------

#: packed-view row width at the default supercell size
VIEW_WIDTH = 4 * way_block(NUM_WAYS)


def pack_query_view(vm: VoxelHashMap) -> jnp.ndarray:
    """Dense (H, 4*B) row table of pre-divided centroids, CHANNEL-BLOCKED
    with B = way_block(ways): columns [x ways | y ways | z ways | pad B].
    Empty AND pad ways sit at _FAR so they lose every distance comparison.

    The channel-block layout lets the query slice each coordinate into a
    (Q, O*B) plane whose minor dimension is hundreds wide — TPU vector
    registers are (8, 128), so keeping xyz as a trailing size-3 axis would
    run every elementwise op at ~2% lane utilization (docs/PERFORMANCE.md).
    """
    H = vm.num_buckets
    W = vm.ways
    B = way_block(W)
    d = jnp.maximum(vm.counts, 1.0)
    occ = vm.counts > 0
    far = jnp.asarray(_FAR, vm.sx.dtype)
    cx = jnp.where(occ, vm.sx / d, far).reshape(H, W)
    cy = jnp.where(occ, vm.sy / d, far).reshape(H, W)
    cz = jnp.where(occ, vm.sz / d, far).reshape(H, W)
    if B != W:
        padw = jnp.full((H, B - W), far, vm.sx.dtype)
        cx = jnp.concatenate([cx, padw], axis=1)
        cy = jnp.concatenate([cy, padw], axis=1)
        cz = jnp.concatenate([cz, padw], axis=1)
    pad = jnp.zeros_like(cx)
    return jnp.concatenate([cx, cy, cz, pad], axis=1)  # (H, 4*B)


def neighbor_offsets(cell: float, radius: float) -> np.ndarray:
    """Integer cell offsets whose cells can intersect a ``radius`` ball
    around any query point in the base cell: pruned by the minimum distance
    between the base cell and the offset cell. ``cell`` is the edge length
    of the search grid's cells (the SUPERCELL size on the hot path)."""
    r = int(math.ceil(radius / cell)) + 1
    offs: List[Tuple[int, int, int]] = []
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            for dz in range(-r, r + 1):
                d = sum((max(abs(o) - 1, 0) * cell) ** 2
                        for o in (dx, dy, dz))
                if d <= radius * radius + 1e-9:
                    offs.append((dx, dy, dz))
    return np.asarray(offs, np.int32)


def offset_key_deltas(offsets: np.ndarray) -> np.ndarray:
    """Linear-hash deltas for the static offsets (uint32)."""
    o = offsets.astype(np.uint32)
    with np.errstate(over="ignore"):
        return (o[:, 0] * _LA + o[:, 1] * _LB + o[:, 2] * _LC)


_IDX_BITS = 13  # minimum lane-index width (8192 candidates/query)
#: hard cap on the lane-index width. Packing the candidate index into the
#: low b mantissa bits perturbs distances by <= 2^(b-23) relative: 13 bits
#: -> 0.1%, 16 bits -> 0.8% — still far below every association gate (the
#: radius gate is 1.0 m^2 and line/plane fits recompute exact moments from
#: the winner mask). 16 bits supports 65,536 candidates/query, which covers
#: leaf 0.1 at radius 1.25 (the structor_vlp16 indoor preset needs 18,624).
_MAX_IDX_BITS = 16


def _lane_bits(C: int) -> int:
    """Lane-index width for C candidates/query (adaptive; see _MAX_IDX_BITS)."""
    bits = max(_IDX_BITS, (C - 1).bit_length())
    if bits > _MAX_IDX_BITS:
        raise ValueError(
            f"{C} candidates/query exceeds the packed-index budget "
            f"({1 << _MAX_IDX_BITS}); use a coarser map leaf, a larger "
            "supercell, or a smaller search radius")
    return bits


def _packed_min_k(d2: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k smallest of each row of a NON-NEGATIVE f32 (Q, C) array, with
    argmins, via index-in-mantissa packing: sort-free, k passes of uint min.
    Perturbs distances by <= 2^(bits-23) relative (harmless for gating)."""
    Q, C = d2.shape
    mask = jnp.uint32((1 << _lane_bits(C)) - 1)
    bits = jax.lax.bitcast_convert_type(d2, jnp.uint32)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (Q, C), 1)
    packed = (bits & ~mask) | lane
    vals = []
    idxs = []
    big = jnp.uint32(0xFFFFFFFF)
    for _ in range(k):
        m = jnp.min(packed, axis=1)  # (Q,)
        vals.append(jax.lax.bitcast_convert_type(m & ~mask, jnp.float32))
        idxs.append((m & mask).astype(jnp.int32))
        packed = jnp.where(packed == m[:, None], big, packed)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "super"))
def _query_impl(packed_view, leaf, queries, qmask, deltas, valid, k: int,
                super: int = SUPER):
    """Explicit k-NN (test/utility path; the odometry hot loop uses
    query_candidates + select_k_mask + fused association instead)."""
    H = packed_view.shape[0]
    dtype = queries.dtype
    B = packed_view.shape[1] // 4
    ways = super ** 3
    (cx, cy, cz), d2 = query_candidates(packed_view, leaf, queries, deltas,
                                        valid, super)
    sel_d2, nn_idx = _packed_min_k(d2.astype(jnp.float32), k)
    nx = jnp.take_along_axis(cx, nn_idx, axis=1)
    ny = jnp.take_along_axis(cy, nn_idx, axis=1)
    nz = jnp.take_along_axis(cz, nn_idx, axis=1)
    nn_xyz = jnp.stack([nx, ny, nz], axis=-1)  # (Q, k, 3)
    # selection used mantissa-packed distances; recompute exact d2 for the
    # k winners (cheap) so downstream gates see unperturbed values
    nn_d2 = ((nx - queries[:, 0:1]) ** 2 + (ny - queries[:, 1:2]) ** 2
             + (nz - queries[:, 2:3]) ** 2)
    big = jnp.asarray(jnp.inf, dtype)
    # bucket aliasing can surface the same stored way through two different
    # neighbor offsets; invalidate repeat winners so they fail the radius
    # gate instead of polluting line/plane fits with duplicate points
    cellq = jnp.floor(queries / leaf).astype(jnp.int32)
    base_key = linear_key(cellq // super)
    if deltas.ndim == 2:
        q_deltas = table_gather(deltas, _subid(cellq, super))
    else:
        q_deltas = jnp.broadcast_to(deltas[None, :],
                                    (queries.shape[0], deltas.shape[0]))
    bkt = _bucket_of(base_key[:, None] + q_deltas, H)
    way = nn_idx % B  # pad ways (>= ways) never win: they sit at _FAR
    o_idx = nn_idx // B
    slot = jnp.take_along_axis(bkt, o_idx, axis=1) * ways + way  # (Q, k)
    dup = jnp.zeros(slot.shape, bool)
    for i in range(1, slot.shape[1]):
        dup = dup.at[:, i].set(
            jnp.any(slot[:, :i] == slot[:, i:i + 1], axis=1))
    # empty/far ways produce huge but finite distances; gate them to inf
    nn_d2 = jnp.where((sel_d2 < _FAR) & qmask[:, None] & ~dup,
                      nn_d2.astype(dtype), big)
    return nn_xyz, nn_d2


def query_knn(vm_or_view, queries: jnp.ndarray, qmask: jnp.ndarray,
              k: int = 5, leaf=None, radius: float = 1.0,
              super: int = None):
    """k nearest voxel centroids within the pruned supercell neighborhood
    (exact within ``radius`` of each query).

    Accepts either a VoxelHashMap (packs on the fly — fine for tests) or a
    pre-packed (view, leaf) pair from pack_query_view — the view path then
    REQUIRES ``super`` (the supercell size the view was packed with; a
    mismatched value would compute wrong buckets/sub-ids silently).
    Returns (nn_xyz (Q,k,3), nn_sqdist (Q,k); +inf where invalid).
    """
    if isinstance(vm_or_view, VoxelHashMap):
        view = pack_query_view(vm_or_view)
        leaf = vm_or_view.leaf
        super = vm_or_view.super
    else:
        view = vm_or_view
        assert leaf is not None
        if super is None:
            raise TypeError("query_knn(view, ...) requires explicit super=")
        assert view.shape[1] == 4 * way_block(super ** 3), \
            f"view width {view.shape[1]} != super={super} layout"
    H = view.shape[0]
    deltas, valid = sub_offset_tables(
        float(np.asarray(leaf)), super, radius, H)
    return _query_impl(view, leaf, queries, qmask, jnp.asarray(deltas),
                       jnp.asarray(valid), k, super)


# ---------------------------------------------------------------------------
# Compaction + sort-free downsample
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def sub_offset_tables(leaf: float, super: int, radius: float,
                      num_buckets: int):
    """Per-sub-voxel pruned + bucket-deduped neighbor tables over the
    supercell grid (supercell edge = ``super * leaf``).

    A query inside sub-voxel (i, j, k) of its supercell can never reach
    supercells whose minimum distance from that sub-voxel box exceeds the
    radius; conditioning the offset set on the query's sub-voxel id prunes
    the offset count versus the whole-supercell bound. The sub-voxel id is
    the same integer the insert path computes, so it is free at query time.

    Returns (deltas (super^3, O) uint32, valid (super^3, O) bool),
    row index = _subid of the query's voxel cell.
    """
    cell = super * leaf
    r = int(math.ceil(radius / cell)) + 1
    per_sub: List[np.ndarray] = []
    for sid in range(super ** 3):
        i, j, k = sid // (super * super), (sid // super) % super, sid % super
        lo = np.array([i, j, k], np.float64) * leaf
        hi = lo + leaf
        offs = []
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                for dz in range(-r, r + 1):
                    d2 = 0.0
                    for ax, d in enumerate((dx, dy, dz)):
                        gap = max(d * cell - hi[ax], lo[ax] - (d + 1) * cell,
                                  0.0)
                        d2 += gap * gap
                    if d2 <= radius * radius + 1e-9:
                        offs.append((dx, dy, dz))
        per_sub.append(dedup_offsets(np.asarray(offs, np.int32),
                                     num_buckets))
    O = max(len(o) for o in per_sub)
    deltas = np.zeros((super ** 3, O), np.uint32)
    valid = np.zeros((super ** 3, O), bool)
    for i, offs in enumerate(per_sub):
        d = offset_key_deltas(offs)
        deltas[i, :len(d)] = d
        valid[i, :len(d)] = True
    return deltas, valid


def octant_offset_tables(cell: float, radius: float, num_buckets: int):
    """Back-compat wrapper: per-octant tables over 2x2x2 supercells whose
    SUPERCELL edge is ``cell`` (sub-voxel = half-cell)."""
    return sub_offset_tables(0.5 * cell, 2, radius, num_buckets)


def dedup_offsets(offsets: np.ndarray, num_buckets: int) -> np.ndarray:
    """Drop offsets that always alias another offset's bucket: the bucket
    of (base + o) is bucket(base_key + delta(o)), so two offsets whose
    deltas are congruent mod num_buckets hit the SAME bucket for every
    base cell — gathering it once already yields all its ways."""
    deltas = offset_key_deltas(offsets) & np.uint32(num_buckets - 1)
    _, first = np.unique(deltas, return_index=True)
    return offsets[np.sort(first)]


def query_candidates(packed_view: jnp.ndarray, leaf, queries: jnp.ndarray,
                     deltas: jnp.ndarray, valid: jnp.ndarray = None,
                     super: int = SUPER):
    """Gather all candidate centroids around each query: ONE row gather.

    ``deltas`` is either a flat (O,) linear-key delta table (whole-cell
    neighborhood) or a per-sub-voxel (super^3, O) table from
    sub_offset_tables — in the latter case each query uses the offset set
    for its sub-voxel position within its supercell. ``valid`` masks the
    padded per-sub-voxel entries. Offsets index SUPERCELLS (super^3 voxel
    blocks); ``super`` must match the supercell size the view was packed
    with.

    Returns ((cx, cy, cz), d2), each (Q, O*B) with B = way_block(super^3)
    — structure-of-arrays so every downstream op has a wide minor
    dimension. Empty ways, pad ways, and padded offsets sit at huge finite
    distances. Offset tables should be bucket-deduped (dedup_offsets) so
    no stored way appears twice.
    """
    Q = queries.shape[0]
    H = packed_view.shape[0]
    dtype = queries.dtype
    B = packed_view.shape[1] // 4
    cellq = jnp.floor(queries / leaf).astype(jnp.int32)
    base_key = linear_key(cellq // super)
    if deltas.ndim == 2:  # per-sub-voxel tables
        sub_id = _subid(cellq, super)
        q_deltas = table_gather(deltas, sub_id)  # (Q, O)
        q_valid = table_gather(valid, sub_id) if valid is not None else None
    else:
        q_deltas = deltas[None, :]
        q_valid = None
    O = q_deltas.shape[-1]
    lkeys = base_key[:, None] + q_deltas
    bkt = _bucket_of(lkeys, H)
    rows = table_gather(packed_view, bkt)  # (Q, O, 4B) channel-blocked
    # materialize the gather ONCE: its four consumers (cx/cy/cz slices and
    # d2) otherwise each pull the gather into their own fusion and the row
    # gather executes up to 4x (measured 2.2 ms vs 0.7 ms on the edge side)
    rows = jax.lax.optimization_barrier(rows)
    cx = rows[:, :, 0 * B:1 * B].reshape(Q, O * B)
    cy = rows[:, :, 1 * B:2 * B].reshape(Q, O * B)
    cz = rows[:, :, 2 * B:3 * B].reshape(Q, O * B)
    if q_valid is not None:
        # bake the padded-offset mask into the planes themselves (rows
        # gathered for padded offsets hold real but WRONG-neighborhood
        # centroids): candidates are then self-contained, so callers can
        # recompute distances against a MOVED query set (the gather-once
        # association reuses one gather across all Gauss-Newton rounds)
        pad = ~jnp.repeat(q_valid, B, axis=-1)
        far = jnp.asarray(_FAR, dtype)
        cx = jnp.where(pad, far, cx)
        cy = jnp.where(pad, far, cy)
        cz = jnp.where(pad, far, cz)
    dx = cx - queries[:, 0:1]
    dy = cy - queries[:, 1:2]
    dz = cz - queries[:, 2:3]
    d2 = dx * dx + dy * dy + dz * dz
    # materialize the candidate planes ONCE: the k-NN selection and the
    # masked-moment fits traverse them many times, and without the barrier
    # XLA fuses (= re-executes) the row gather into every pass — measured
    # 2x the whole association cost at the odometry shapes
    return jax.lax.optimization_barrier(((cx, cy, cz), d2))


def candidate_d2(cand_soa, queries: jnp.ndarray) -> jnp.ndarray:
    """Recompute squared distances of gathered candidate planes against an
    UPDATED query set (pure elementwise; no re-gather). Used by the
    gather-once association to re-rank candidates after each GN round's
    pose update."""
    cx, cy, cz = cand_soa
    dx = cx - queries[:, 0:1]
    dy = cy - queries[:, 1:2]
    dz = cz - queries[:, 2:3]
    return dx * dx + dy * dy + dz * dz


def select_k_mask(d2: jnp.ndarray, k: int):
    """(kth smallest distance (Q,), winner mask (Q, C)) — the winner mask
    falls out of the packed-min masking for free, enabling gather-free
    factor fits via masked moment accumulation."""
    Q, C = d2.shape
    mask = jnp.uint32((1 << _lane_bits(C)) - 1)
    bits = jax.lax.bitcast_convert_type(d2.astype(jnp.float32), jnp.uint32)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (Q, C), 1)
    packed = (bits & ~mask) | lane
    big = jnp.uint32(0xFFFFFFFF)
    orig = packed
    m = jnp.zeros((Q,), jnp.uint32)
    for _ in range(k):
        m = jnp.min(packed, axis=1)
        packed = jnp.where(packed == m[:, None], big, packed)
    kth_d2 = jax.lax.bitcast_convert_type(m & ~mask, jnp.float32)
    winners = (packed == big) & (orig != big)
    return kth_d2, winners


def compact(vm: VoxelHashMap, out_capacity: int
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack occupied-voxel centroids to the front of a fixed-size array via
    prefix-sum compaction (no sort). Returns (xyz (C,3), mask (C,))."""
    c, occ = vm.centroids()
    pos = jnp.cumsum(occ.astype(jnp.int32)) - 1  # target index per slot
    tgt = jnp.where(occ & (pos < out_capacity), pos, out_capacity)
    zeros = lambda: jnp.zeros((out_capacity,), vm.sx.dtype)
    ox = table_scatter_set(zeros(), tgt, c[:, 0])
    oy = table_scatter_set(zeros(), tgt, c[:, 1])
    oz = table_scatter_set(zeros(), tgt, c[:, 2])
    n = jnp.minimum(jnp.sum(occ, dtype=jnp.int32), out_capacity)
    mask = jnp.arange(out_capacity) < n
    return jnp.stack([ox, oy, oz], axis=-1), mask


def compact_points(xyz: jnp.ndarray, mask: jnp.ndarray, out_capacity: int,
                   extras: Tuple[jnp.ndarray, ...] = ()):
    """Prefix-sum compaction of a masked point set to a smaller capacity
    (valid points keep their relative order; overflow past the capacity is
    dropped). ``extras`` are additional per-point planes (e.g. timestamps)
    compacted with the same permutation. Uses the batch-safe scatter so the
    sequence-batched path stays in the fast shape class under vmap.

    Returns (xyz (C,3), mask (C,)) or (xyz, mask, extras...) with extras.
    """
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    tgt = jnp.where(mask & (pos < out_capacity), pos, out_capacity)
    dtype = xyz.dtype
    zeros = lambda dt: jnp.zeros((out_capacity,), dt)
    ox = table_scatter_set(zeros(dtype), tgt, xyz[:, 0])
    oy = table_scatter_set(zeros(dtype), tgt, xyz[:, 1])
    oz = table_scatter_set(zeros(dtype), tgt, xyz[:, 2])
    n = jnp.minimum(jnp.sum(mask, dtype=jnp.int32), out_capacity)
    out_xyz = jnp.stack([ox, oy, oz], axis=-1)
    out_mask = jnp.arange(out_capacity) < n
    if not extras:
        return out_xyz, out_mask
    out_extras = tuple(table_scatter_set(zeros(e.dtype), tgt, e)
                       for e in extras)
    return (out_xyz, out_mask) + out_extras


def hash_downsample(xyz: jnp.ndarray, mask: jnp.ndarray, leaf,
                    num_buckets: int, out_capacity: int,
                    dtype=None, super: int = SUPER
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sort-free voxel-grid downsample (centroid per voxel) through a
    scratch bucketed table: sub-voxel slot claim (+ probe rounds for
    bucket-aliased cells) + one scatter-add + prefix-sum compaction.
    Replaces the argsort-based ops.voxel.voxel_downsample on the hot
    path."""
    dtype = dtype or xyz.dtype
    vm = empty(num_buckets, leaf, dtype, super)
    vm = insert(vm, xyz.astype(dtype), mask, count_cap=jnp.inf,
                probe_rounds=super ** 3)
    return compact(vm, out_capacity)

"""Curvature-based edge/planar feature extraction — fully vectorized.

TPU-native redesign of the reference's per-ring scalar loops
(reference: src/laserProcessingClass.cpp):

  * 11-point curvature (:95-99) -> shifted-sum convolution over ring rows;
  * per-ring split into 6 azimuthal sectors (:103-114) -> per-point sector id;
  * per-sector sort + greedy top-20 edge pick with +-5 neighbor suppression
    gated by the 0.05 adjacent-gap break (:123-170) -> a 21-step masked
    argmax loop run in parallel over all (ring, sector) pairs (the
    reference's picked_points bookkeeping is per-sector, so sectors are
    independent and the O(n^2) std::find loops at :135,223 vanish);
  * all non-picked sector points become surf (:220-227).

Semantics preserved exactly (verified against a NumPy reimplementation of
the reference logic in tests/reference_models.py), including the quirks:
each sector drops its last curvature entry (the ``sector_end - 1`` slice at
:106-110), the 21st pick is suppressed from surf but not emitted as an edge
and triggers no window suppression (:140-148), and rings with < 131 points
are skipped entirely (:89).

Inputs are a RingScan whose rows are compacted (valid points first, stream
order preserved) — the loader performs NaN removal and the cylindrical
min/max range gate of RingExtractionVelodyne (:11-22).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import FeatureConfig
from ..types import RingScan

_NEG = jnp.float32(-1.0)


def curvature(xyz: jnp.ndarray, mask: jnp.ndarray, half_window: int = 5) -> jnp.ndarray:
    """Per-point curvature: || sum_{k=-w..w, k!=0} p[j+k] - 2w * p[j] ||^2.

    xyz: (R, C, 3), mask: (R, C). Entries within ``half_window`` of the row
    ends (or padding) are not meaningful — callers gate on position.
    """
    w = half_window
    acc = -2.0 * w * xyz
    for k in range(1, w + 1):
        acc = acc + jnp.roll(xyz, k, axis=1) + jnp.roll(xyz, -k, axis=1)
    return jnp.sum(acc * acc, axis=-1)


def _gap_sq_prev(xyz: jnp.ndarray) -> jnp.ndarray:
    """gap[j] = ||p[j] - p[j-1]||^2 along each ring row (gap[0] invalid)."""
    d = xyz - jnp.roll(xyz, 1, axis=1)
    return jnp.sum(d * d, axis=-1)


def _suppression_extents(gap_sq: jnp.ndarray, gap_limit: float, window: int):
    """For each point j, how far the +-window suppression runs before the
    adjacent-gap break (reference :150-167).

    right[j] = max k in [0, window] s.t. gap[j+1..j+k] all <= limit
    left[j]  = max k in [0, window] s.t. gap[j, j-1, .., j-k+1] all <= limit
               (step to j-k checks ||p[j-k] - p[j-k+1]|| = gap[j-k+1])
    """
    ok = gap_sq <= gap_limit  # ok[j]: step between j-1 and j is small
    right = jnp.zeros(gap_sq.shape, jnp.int32)
    run_r = jnp.ones(gap_sq.shape, bool)
    left = jnp.zeros(gap_sq.shape, jnp.int32)
    run_l = jnp.ones(gap_sq.shape, bool)
    for k in range(1, window + 1):
        # step k to the right: gap at j+k (roll left by k)
        run_r = run_r & jnp.roll(ok, -k, axis=1)
        right = right + run_r.astype(jnp.int32)
        # step k to the left: gap at j-k+1 (roll right by k-1)
        run_l = run_l & jnp.roll(ok, -(1 - k), axis=1)
        left = left + run_l.astype(jnp.int32)
    return left, right


def _sector_ids(counts: jnp.ndarray, capacity: int, num_sectors: int,
                half_window: int, min_ring_points: int) -> jnp.ndarray:
    """Per-point sector id in [0, num_sectors), or -1 if excluded.

    counts: (R,) valid points per ring. Curvature entry i = j - half_window
    for j in [hw, n - hw); total = n - 2*hw entries; sector s covers
    i in [s*L, (s+1)*L - 1) with L = total // num_sectors, and the last
    sector covers [num_sectors*L... wait, (reference :103-110) sector 5
    covers [5*L, total - 1). Each sector's final index is dropped.
    """
    R = counts.shape[0]
    n = counts[:, None].astype(jnp.int32)  # (R, 1)
    j = jnp.arange(capacity, dtype=jnp.int32)[None, :]  # (1, C)
    hw = half_window
    i = j - hw
    total = n - 2 * hw
    L = total // num_sectors
    in_range = (i >= 0) & (i < total) & (n >= min_ring_points) & (L > 0)
    s = jnp.minimum(i // jnp.maximum(L, 1), num_sectors - 1)
    # drop each sector's last curvature entry (the sector_end-1 slice quirk)
    sector_last = jnp.where(s < num_sectors - 1, (s + 1) * L - 1, total - 1)
    keep = in_range & (i != sector_last)
    return jnp.where(keep, s, -1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_features_full(scan: RingScan, cfg: FeatureConfig):
    """Full outputs: (edge_mask (R,C), surf_mask (R,C), edge_xyz
    (R*S*EPS, 3), edge_time (R*S*EPS,), edge_valid (R*S*EPS,),
    edge_intensity (R*S*EPS,)). Intensity rides along so exported clouds
    keep the sensor's XYZI channel (the reference's VelToIntensityCopy,
    src/odomEstimationClass.cpp:308-318).

    The edge positions are collected directly inside the greedy selection
    loop into dense per-(ring, sector) slots — the hot path consumes them
    without any full-scan-scale compaction (per-point scatter/gather at
    ~1.5e5 scale costs milliseconds on TPU; see docs/PERFORMANCE.md).
    """
    xyz = scan.xyz
    mask = scan.mask
    R, C, _ = xyz.shape
    S = cfg.sectors_per_ring
    dtype = xyz.dtype

    counts = jnp.sum(mask.astype(jnp.int32), axis=1)  # (R,)
    curv = curvature(xyz, mask, cfg.curvature_half_window)  # (R, C)
    sec = _sector_ids(counts, C, S, cfg.curvature_half_window,
                      cfg.min_ring_points)  # (R, C)
    gap = _gap_sq_prev(xyz)
    left_ext, right_ext = _suppression_extents(
        gap, cfg.suppression_gap_sq, cfg.suppression_window)

    # Flatten to (R*S, C) independent greedy problems.
    cand = (sec[:, None, :] == jnp.arange(S, dtype=jnp.int32)[None, :, None])  # (R,S,C)
    cand = cand.reshape(R * S, C)
    curv_b = jnp.broadcast_to(curv[:, None, :], (R, S, C)).reshape(R * S, C)
    left_b = jnp.broadcast_to(left_ext[:, None, :], (R, S, C)).reshape(R * S, C)
    right_b = jnp.broadcast_to(right_ext[:, None, :], (R, S, C)).reshape(R * S, C)

    col = jnp.arange(C, dtype=jnp.int32)[None, :]  # (1, C)
    thr = jnp.asarray(cfg.curvature_threshold, dtype)
    max_picks = cfg.edges_per_sector + 1  # 21st pick: suppressed, no edge
    EPS = cfg.edges_per_sector
    RS = R * S
    # per-(ring,sector) xyz rows for in-loop edge collection
    xyz_rs = jnp.broadcast_to(xyz[:, None, :, :], (R, S, C, 3)
                              ).reshape(RS, C, 3)
    time_rs = jnp.broadcast_to(scan.time[:, None, :], (R, S, C)
                               ).reshape(RS, C)
    inten_rs = jnp.broadcast_to(scan.intensity[:, None, :], (R, S, C)
                                ).reshape(RS, C)
    rows = jnp.arange(RS)

    eslot = jnp.arange(EPS, dtype=jnp.int32)[None, :]  # (1, EPS)

    def body(i, state):
        # every per-pick extraction is a one-hot dense reduction (NOT
        # take_along_axis / per-row scatter): those lower to the slow
        # batched-gather class under vmap, which the sequence-batched and
        # multi-chip paths rely on (docs/PERFORMANCE.md)
        picked, edge, count, done, ebuf, etime, evalid, einten = state
        avail_curv = jnp.where(cand & ~picked, curv_b, _NEG.astype(dtype))
        ind = jnp.argmax(avail_curv, axis=1)  # (RS,)
        val = jnp.max(avail_curv, axis=1)
        can_pick = (~done) & (val > thr)
        is_edge = can_pick & (count < cfg.edges_per_sector)
        is_last = can_pick & (count >= cfg.edges_per_sector)

        onehot = col == ind[:, None]  # (RS, C)
        ohf = onehot.astype(dtype)
        l = jnp.sum(jnp.where(onehot, left_b, 0), axis=1)[:, None]
        r = jnp.sum(jnp.where(onehot, right_b, 0), axis=1)[:, None]
        window = (col >= ind[:, None] - l) & (col <= ind[:, None] + r)

        picked = picked | (is_edge[:, None] & (window | onehot))
        picked = picked | (is_last[:, None] & onehot)
        edge = edge | (is_edge[:, None] & onehot)
        # collect the pick position into slot (rs, count)
        pick_x = jnp.sum(ohf * xyz_rs[:, :, 0], axis=1)
        pick_y = jnp.sum(ohf * xyz_rs[:, :, 1], axis=1)
        pick_z = jnp.sum(ohf * xyz_rs[:, :, 2], axis=1)
        pick_t = jnp.sum(jnp.where(onehot, time_rs, 0), axis=1)
        pick_i = jnp.sum(jnp.where(onehot, inten_rs, 0), axis=1)
        slot_oh = (eslot == jnp.clip(count, 0, EPS - 1)[:, None])  # (RS,EPS)
        put = is_edge[:, None] & slot_oh
        pick_xyz = jnp.stack([pick_x, pick_y, pick_z], axis=-1)
        ebuf = jnp.where(put[..., None], pick_xyz[:, None, :], ebuf)
        etime = jnp.where(put, pick_t[:, None], etime)
        einten = jnp.where(put, pick_i[:, None], einten)
        evalid = evalid | put
        count = count + can_pick.astype(jnp.int32)
        done = done | ~can_pick | is_last
        return picked, edge, count, done, ebuf, etime, evalid, einten

    init = (
        jnp.zeros((R * S, C), bool),
        jnp.zeros((R * S, C), bool),
        jnp.zeros((R * S,), jnp.int32),
        jnp.zeros((R * S,), bool),
        jnp.zeros((RS, EPS, 3), dtype),
        jnp.zeros((RS, EPS), scan.time.dtype),
        jnp.zeros((RS, EPS), bool),
        jnp.zeros((RS, EPS), scan.intensity.dtype),
    )
    picked, edge, _, _, ebuf, etime, evalid, einten = jax.lax.fori_loop(
        0, max_picks, body, init)

    # A point's surf membership is decided by its own sector's picked set;
    # suppression spill into neighboring sectors has no effect (:220-227).
    picked_own = (picked.reshape(R, S, C) & cand.reshape(R, S, C)).any(axis=1)
    edge_mask = edge.reshape(R, S, C).any(axis=1)
    in_sector = sec >= 0
    surf_mask = in_sector & ~picked_own & ~edge_mask
    return (edge_mask, surf_mask, ebuf.reshape(RS * EPS, 3),
            etime.reshape(RS * EPS), evalid.reshape(RS * EPS),
            einten.reshape(RS * EPS))


@functools.partial(jax.jit, static_argnames=("cfg",))
def extract_features(scan: RingScan, cfg: FeatureConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (edge_mask, surf_mask), both (R, C) bool over scan slots."""
    e, s, _, _, _, _ = extract_features_full(scan, cfg)
    return e, s


def ring_ids_from_elevation(xyz, num_lines: int):
    """Geometric scanID fallback for clouds without a ``ring`` field
    (KITTI-era formulas, reference src/laserProcessingClass.cpp:24-70).

    Returns (ring, valid). Works on numpy or jax arrays.
    """
    import numpy as np

    xp = jnp if isinstance(xyz, jnp.ndarray) else np
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    dist = xp.sqrt(x * x + y * y)
    angle = xp.arctan2(z, dist) * (180.0 / np.pi)
    if num_lines == 16:
        ring = ((angle + 15.0) / 2.0 + 0.5).astype(xp.int32)
        valid = (ring >= 0) & (ring < 16)
    elif num_lines == 32:
        ring = ((angle + 92.0 / 3.0) * 3.0 / 4.0).astype(xp.int32)
        valid = (ring >= 0) & (ring < 32)
    elif num_lines == 64:
        upper = ((2.0 - angle) * 3.0 + 0.5).astype(xp.int32)
        lower = 32 + ((-8.83 - angle) * 2.0 + 0.5).astype(xp.int32)
        ring = xp.where(angle >= -8.83, upper, lower)
        valid = (angle <= 2.0) & (angle >= -24.33) & (ring >= 0) & (ring < 64)
    else:
        raise ValueError(f"unsupported num_lines={num_lines}")
    ring = xp.clip(ring, 0, num_lines - 1)
    return ring, valid

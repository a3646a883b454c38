"""NumPy reimplementations of the reference algorithms' exact semantics,
used as golden models for the vectorized JAX kernels.

These deliberately mirror the control flow of /root/reference (scalar loops,
sorts, greedy suppression) so that behavioral fidelity — including quirks —
is pinned down by tests rather than by reading C++.
"""
from __future__ import annotations

import numpy as np


def feature_extraction_ref(rings, *, curvature_threshold=0.1, edges_per_sector=20,
                           sectors=6, window=5, gap_sq=0.05, min_ring_points=131):
    """Reference featureExtraction (src/laserProcessingClass.cpp:72-231).

    rings: list of (n_i, 3) arrays (already range-gated, stream order).
    Returns (edge_sets, surf_sets): per-ring sets of point indices.
    """
    edge_sets, surf_sets = [], []
    for pts in rings:
        n = len(pts)
        edges, surfs = set(), set()
        if n < min_ring_points:
            edge_sets.append(edges)
            surf_sets.append(surfs)
            continue
        hw = window  # curvature half-window == suppression window == 5
        # curvature entries: (id=j, value) for j in [5, n-5)
        ids = np.arange(hw, n - hw)
        acc = -2.0 * hw * pts[ids]
        for k in range(1, hw + 1):
            acc = acc + pts[ids - k] + pts[ids + k]
        curv = np.sum(acc * acc, axis=-1)
        total = n - 2 * hw
        L = total // sectors
        for s in range(sectors):
            start = L * s
            end = L * (s + 1) - 1 if s < sectors - 1 else total - 1
            # the slice [start, end) drops each sector's last entry (quirk)
            sub = [(ids[i], curv[i]) for i in range(start, end)]
            e, srf = _sector_ref(pts, sub, curvature_threshold,
                                 edges_per_sector, window, gap_sq)
            edges |= e
            surfs |= srf
        edge_sets.append(edges)
        surf_sets.append(surfs)
    return edge_sets, surf_sets


def _sector_ref(pts, sub, thr, max_edges, window, gap_sq):
    """featureExtractionFromSector (src/laserProcessingClass.cpp:121-231)."""
    order = sorted(range(len(sub)), key=lambda i: sub[i][1])
    picked = set()
    edges = set()
    n_picked = 0
    for i in reversed(order):
        ind, val = sub[i]
        if ind in picked:
            continue
        if val <= thr:
            break
        n_picked += 1
        picked.add(ind)
        if n_picked <= max_edges:
            edges.add(ind)
        else:
            break  # 21st pick: suppressed from surf, not an edge, no window
        for k in range(1, window + 1):
            d = pts[ind + k] - pts[ind + k - 1]
            if np.dot(d, d) > gap_sq:
                break
            picked.add(ind + k)
        for k in range(-1, -window - 1, -1):
            d = pts[ind + k] - pts[ind + k + 1]
            if np.dot(d, d) > gap_sq:
                break
            picked.add(ind + k)
    surf = {ind for ind, _ in sub if ind not in picked}
    return edges, surf


def voxel_downsample_ref(pts, leaf):
    """PCL VoxelGrid semantics: centroid per occupied voxel
    (reference use at src/odomEstimationClass.cpp:13-14,137-142).
    PCL computes voxel index as floor(coord/leaf); output ordering differs
    (we compare as sets)."""
    idx = np.floor(pts / leaf).astype(np.int64)
    key = {}
    for i, k in enumerate(map(tuple, idx)):
        key.setdefault(k, []).append(i)
    return np.array([pts[v].mean(axis=0) for v in key.values()])


def knn_ref(query, data, k):
    """Exact brute-force k-NN (golden for the grid search)."""
    d2 = np.sum((query[:, None, :] - data[None, :, :]) ** 2, axis=-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return idx, np.take_along_axis(d2, idx, axis=1)

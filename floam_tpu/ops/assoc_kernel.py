"""Fused association re-rank Pallas kernel: d2 + packed-min-k + winner
moments / plane fit in ONE pass over the candidate planes.

The XLA re-rank path (ops.voxelmap.candidate_d2 + select_k_mask +
ops.residuals.*_association_fused) traverses the (Q, C) candidate planes
several times per Gauss-Newton round: once to compute distances, ~2k times
for the k min/mask passes, and again for the masked moment reductions and
the surf residual gate. Each traversal is an HBM round trip over tens of
MB. This kernel keeps a (TQ, C) tile of the planes resident in VMEM and
does the whole chain — distance, index-in-mantissa packed k-min selection,
winner-masked moment accumulation, and (surf) the 3x3 adjugate plane solve
plus the per-neighbor fit-quality max — before it writes anything, so HBM
traffic collapses to one read of the planes plus a (Q, 16) scalar output.

Semantics match the XLA chain exactly (same packed-index arithmetic, same
query-centered moments — see select_k_mask and _masked_moments for the
derivations); reduction order inside a row may differ, so cross-backend
comparisons are tolerance-level, not bit-level. Replaces the association
inner loops of the reference (src/odomEstimationClass.cpp:144-251) on the
hot path when OdomConfig.assoc_backend == "pallas".

Measured A/B numbers live in docs/PERFORMANCE.md.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-12
#: int32 "removed" sentinel: all packed values from non-negative f32
#: distances are <= 0x7F8FFFFF (+inf with index bits), so int32 ordering
#: matches uint32 ordering and INT32_MAX can never be produced by packing.
_BIG = np.int32(0x7FFFFFFF)

#: output column layout (one (Q, 16) f32 array per kernel call)
_EDGE_COLS = 16  # kth_d2, s1x, s1y, s1z, sxx, sxy, sxz, syy, syz, szz
_SURF_COLS = 16  # kth_d2, nx, ny, nz, d_local, max_resid, solvable


def _tile_q(Q: int, C: int) -> int:
    """Largest power-of-two query tile keeping ~10 live (TQ, C) f32 buffers
    (3 plane blocks + packed/orig + distance/delta temporaries) within a
    conservative 8 MB VMEM budget. Raises when even the minimum 8-row tile
    cannot fit (presets that wide must pin assoc_backend="xla" instead of
    failing later inside the Mosaic compiler)."""
    budget = 8 * 1024 * 1024 // (40 * C)
    if budget < 8:
        raise ValueError(
            f"candidate width C={C} needs ~{40 * C * 8 / 2**20:.1f} MB of "
            "VMEM per minimum 8-row tile — beyond the Pallas kernel's "
            "budget; set OdomConfig.assoc_backend='xla' for this preset")
    tq = 8
    while tq * 2 <= min(budget, Q, 512) and Q % (tq * 2) == 0:
        tq *= 2
    return tq


def _rank_kernel(cx_ref, cy_ref, cz_ref, q_ref, out_ref, *, k: int,
                 lane_bits: int, surf: bool):
    cx = cx_ref[:]
    cy = cy_ref[:]
    cz = cz_ref[:]
    qx = q_ref[:, 0:1]
    qy = q_ref[:, 1:2]
    qz = q_ref[:, 2:3]
    dx = cx - qx
    dy = cy - qy
    dz = cz - qz
    d2 = dx * dx + dy * dy + dz * dz

    mask = np.int32((1 << lane_bits) - 1)
    bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    orig = jax.lax.bitwise_or(jax.lax.bitwise_and(bits, ~mask), lane)
    packed = orig
    m = jnp.zeros((d2.shape[0], 1), jnp.int32)
    for _ in range(k):
        m = jnp.min(packed, axis=1, keepdims=True)
        packed = jnp.where(packed == m, _BIG, packed)
    kth_d2 = jax.lax.bitcast_convert_type(
        jax.lax.bitwise_and(m, ~mask), jnp.float32)
    winners = (packed == _BIG) & (orig != _BIG)

    w = winners.astype(jnp.float32)
    wx, wy, wz = w * dx, w * dy, w * dz
    s1x = jnp.sum(wx, axis=1, keepdims=True)
    s1y = jnp.sum(wy, axis=1, keepdims=True)
    s1z = jnp.sum(wz, axis=1, keepdims=True)
    sxx = jnp.sum(wx * dx, axis=1, keepdims=True)
    sxy = jnp.sum(wx * dy, axis=1, keepdims=True)
    sxz = jnp.sum(wx * dz, axis=1, keepdims=True)
    syy = jnp.sum(wy * dy, axis=1, keepdims=True)
    syz = jnp.sum(wy * dz, axis=1, keepdims=True)
    szz = jnp.sum(wz * dz, axis=1, keepdims=True)

    out_ref[:, 0:1] = kth_d2
    if not surf:
        out_ref[:, 1:2] = s1x
        out_ref[:, 2:3] = s1y
        out_ref[:, 3:4] = s1z
        out_ref[:, 4:5] = sxx
        out_ref[:, 5:6] = sxy
        out_ref[:, 6:7] = sxz
        out_ref[:, 7:8] = syy
        out_ref[:, 8:9] = syz
        out_ref[:, 9:10] = szz
        out_ref[:, 10:16] = jnp.zeros((d2.shape[0], 6), jnp.float32)
        return

    # surf: solve M n = -S1 by adjugate (ops.residuals.solve3x3, scalar
    # planes), then the per-neighbor fit-quality max needs n — which is why
    # the solve lives in-kernel: doing it outside would force a second full
    # traversal of the planes for the residual gate.
    rx, ry, rz = -s1x, -s1y, -s1z
    # cofactor columns of the symmetric moment matrix
    c0x = syy * szz - syz * syz
    c0y = syz * sxz - sxy * szz
    c0z = sxy * syz - syy * sxz
    c1x = sxz * syz - sxy * szz
    c1y = sxx * szz - sxz * sxz
    c1z = sxy * sxz - sxx * syz
    # adjugate row 2 via cross of columns 0 and 1 (matches solve3x3's
    # cross(M[:,0], M[:,1]) with M columns (sxx,sxy,sxz)/(sxy,syy,syz))
    c2x = sxy * syz - sxz * syy
    c2y = sxz * sxy - sxx * syz
    c2z = sxx * syy - sxy * sxy
    det = sxx * c0x + sxy * c0y + sxz * c0z
    ok = jnp.abs(det) > 1e-12
    inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    nx = (c0x * rx + c0y * ry + c0z * rz) * inv_det
    ny = (c1x * rx + c1y * ry + c1z * rz) * inv_det
    nz = (c2x * rx + c2y * ry + c2z * rz) * inv_det
    nn = nx * nx + ny * ny + nz * nz
    norm = jnp.sqrt(jnp.maximum(nn, _EPS))
    d_local = 1.0 / norm
    nx = nx / norm
    ny = ny / norm
    nz = nz / norm
    resid = jnp.abs(dx * nx + dy * ny + dz * nz + d_local)
    max_resid = jnp.max(jnp.where(winners, resid, 0.0), axis=1,
                        keepdims=True)
    out_ref[:, 0:1] = kth_d2
    out_ref[:, 1:2] = nx
    out_ref[:, 2:3] = ny
    out_ref[:, 3:4] = nz
    out_ref[:, 4:5] = d_local
    out_ref[:, 5:6] = max_resid
    out_ref[:, 6:7] = ok.astype(jnp.float32)
    out_ref[:, 7:16] = jnp.zeros((d2.shape[0], 9), jnp.float32)


def edge_association_kernel(point, query_world, cand_soa, k: int,
                            radius_sq: float, eig_ratio: float,
                            half_length: float):
    """Drop-in for select_k_mask + residuals.edge_association_fused: the
    kernel returns the winner moments; the (Q,)-scale covariance/eigen fit
    stays in XLA (it reads ~100 KB, not the 10s-of-MB planes)."""
    from . import residuals
    from .voxelmap import _lane_bits

    C = cand_soa[0].shape[1]
    out = rank_scalars(cand_soa, query_world, k, _lane_bits(C), surf=False)
    kth_d2 = out[:, 0]
    S1 = out[:, 1:4]
    r0 = out[:, 4:7]
    row1 = jnp.stack([out[:, 5], out[:, 7], out[:, 8]], axis=-1)
    row2 = jnp.stack([out[:, 6], out[:, 8], out[:, 9]], axis=-1)
    S2 = jnp.stack([r0, row1, row2], axis=-2)
    center_l = S1 / float(k)
    cov = S2 - float(k) * center_l[:, :, None] * center_l[:, None, :]
    evals, direction = residuals.eigh3x3_psd(cov)
    ok = (kth_d2 < radius_sq) & (evals[:, 0] > eig_ratio * evals[:, 1])
    center = center_l + query_world
    pa = center + half_length * direction
    pb = center - half_length * direction
    return residuals.EdgeFactors(point=point, pa=pa, pb=pb, valid=ok)


def surf_association_kernel(point, query_world, cand_soa, k: int,
                            radius_sq: float, fit_tol: float):
    """Drop-in for select_k_mask + residuals.surf_association_fused; the
    plane solve and fit-quality max happen in-kernel (see _rank_kernel)."""
    from . import residuals
    from .voxelmap import _lane_bits

    C = cand_soa[0].shape[1]
    out = rank_scalars(cand_soa, query_world, k, _lane_bits(C), surf=True)
    kth_d2 = out[:, 0]
    n_hat = out[:, 1:4]
    d_local = out[:, 4]
    max_resid = out[:, 5]
    solvable = out[:, 6] > 0.5
    d_world = d_local - jnp.sum(n_hat * query_world, axis=-1)
    valid = (kth_d2 < radius_sq) & solvable & (max_resid <= fit_tol)
    return residuals.SurfFactors(point=point, normal=n_hat, offset=d_world,
                                 valid=valid)


@functools.partial(jax.jit, static_argnames=("k", "lane_bits", "surf"))
def rank_scalars(cand_soa, queries, k: int, lane_bits: int, surf: bool):
    """Run the fused re-rank kernel. Returns a (Q, 16) f32 scalar table
    (column layout per _rank_kernel); interpret-mode on CPU backends so the
     8-device virtual-mesh tests exercise the same code path."""
    cx, cy, cz = cand_soa
    Q, C = cx.shape
    if Q % 8 != 0:
        raise ValueError(
            f"query count Q={Q} must be a multiple of 8 (the minimum "
            "Pallas tile height); round scan_*_capacity / BA budgets up "
            "— FloamConfig validation enforces this for the shipped "
            "presets")
    tq = _tile_q(Q, C)
    grid = (Q // tq,)
    plane = pl.BlockSpec((tq, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(_rank_kernel, k=k, lane_bits=lane_bits,
                             surf=surf)
    return pl.pallas_call(
        kern,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((Q, 16), jnp.float32),
        in_specs=[plane, plane, plane,
                  pl.BlockSpec((tq, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tq, 16), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(cx.astype(jnp.float32), cy.astype(jnp.float32),
      cz.astype(jnp.float32), queries.astype(jnp.float32))

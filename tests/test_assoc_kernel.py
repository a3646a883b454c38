"""Parity of the fused Pallas association kernel (ops.assoc_kernel,
interpret mode on CPU) against the XLA re-rank chain it replaces
(candidate_d2 + select_k_mask + *_association_fused)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from floam_tpu.config import FloamConfig
from floam_tpu.ops import assoc_kernel, residuals, voxelmap

K = 5
RADIUS_SQ = 1.0


def _mk_candidates(rng, Q, C, frac_far=0.3):
    """Candidate planes clustered around the queries, with a fraction at
    the far sentinel (empty/pad ways) like a real packed gather."""
    q = rng.uniform(-5, 5, (Q, 3)).astype(np.float32)
    offs = rng.normal(0, 0.6, (Q, C, 3)).astype(np.float32)
    cand = q[:, None, :] + offs
    far = rng.random((Q, C)) < frac_far
    cand = np.where(far[..., None], voxelmap._FAR, cand)
    soa = tuple(jnp.asarray(np.ascontiguousarray(cand[..., i]))
                for i in range(3))
    return soa, jnp.asarray(q)


def _xla_edge(cand, q):
    d2 = voxelmap.candidate_d2(cand, q)
    kth, win = voxelmap.select_k_mask(d2, K)
    return residuals.edge_association_fused(
        q, q, cand, win, kth, K, RADIUS_SQ, 3.0, 0.1)


def _xla_surf(cand, q):
    d2 = voxelmap.candidate_d2(cand, q)
    kth, win = voxelmap.select_k_mask(d2, K)
    return residuals.surf_association_fused(
        q, q, cand, win, kth, K, RADIUS_SQ, 0.2)


@pytest.mark.parametrize("Q,C", [(64, 256), (96, 384)])
def test_edge_parity(Q, C):
    rng = np.random.default_rng(0)
    cand, q = _mk_candidates(rng, Q, C)
    fx = _xla_edge(cand, q)
    fp = assoc_kernel.edge_association_kernel(q, q, cand, K, RADIUS_SQ,
                                              3.0, 0.1)
    agree = np.mean(np.asarray(fx.valid) == np.asarray(fp.valid))
    assert agree > 0.98, agree  # borderline eig-ratio rows may flip
    both = np.asarray(fx.valid) & np.asarray(fp.valid)
    np.testing.assert_allclose(np.asarray(fp.pa)[both],
                               np.asarray(fx.pa)[both], atol=2e-3)
    np.testing.assert_allclose(np.asarray(fp.pb)[both],
                               np.asarray(fx.pb)[both], atol=2e-3)


@pytest.mark.parametrize("Q,C", [(64, 256), (96, 384)])
def test_surf_parity(Q, C):
    rng = np.random.default_rng(1)
    cand, q = _mk_candidates(rng, Q, C)
    fx = _xla_surf(cand, q)
    fp = assoc_kernel.surf_association_kernel(q, q, cand, K, RADIUS_SQ, 0.2)
    agree = np.mean(np.asarray(fx.valid) == np.asarray(fp.valid))
    assert agree > 0.98, agree
    both = np.asarray(fx.valid) & np.asarray(fp.valid)
    # normals are sign-fixed by the A n = -1 convention in both paths
    np.testing.assert_allclose(np.asarray(fp.normal)[both],
                               np.asarray(fx.normal)[both], atol=2e-3)
    np.testing.assert_allclose(np.asarray(fp.offset)[both],
                               np.asarray(fx.offset)[both], atol=2e-3)


@pytest.mark.slow
def test_solve_round_parity():
    """Whole _solve_from_candidates rounds agree between backends on a
    realistic map (end-to-end wiring incl. the odometry branch)."""
    import functools

    from floam_tpu import odometry
    from floam_tpu.types import MapState, Pose

    cfg = FloamConfig.kitti_hdl64()
    oc = cfg.odom
    rng = np.random.default_rng(2)
    state = odometry.init_state(cfg)
    pts = rng.uniform(-20, 20, (40_000, 3)).astype(np.float32)
    em = voxelmap.insert(state.map.edge, jnp.asarray(pts[:10_000]),
                         jnp.ones((10_000,), bool), oc.voxel_count_cap)
    sm = voxelmap.insert(state.map.surf, jnp.asarray(pts),
                         jnp.ones((pts.shape[0],), bool), oc.voxel_count_cap)
    ms = MapState(edge=em, surf=sm,
                  edge_view=voxelmap.pack_query_view(em),
                  surf_view=voxelmap.pack_query_view(sm))
    Qe, Qs = oc.scan_edge_capacity, oc.scan_surf_capacity
    e_xyz = jnp.asarray(rng.uniform(-15, 15, (Qe, 3)), jnp.float32)
    s_xyz = jnp.asarray(rng.uniform(-15, 15, (Qs, 3)), jnp.float32)
    e_mask = jnp.ones((Qe,), bool)
    s_mask = jnp.ones((Qs,), bool)
    pose = Pose.identity(jnp.float32)
    cand_e, _, cand_s, _ = odometry._gather_candidates(
        pose, ms, ms.edge_view, ms.surf_view, e_xyz, s_xyz, oc,
        oc.assoc_margin)
    oc_p = dataclasses.replace(oc, assoc_backend="pallas")
    px, stx = odometry._solve_from_candidates(
        pose, cand_e, None, cand_s, None, e_xyz, e_mask, s_xyz, s_mask, oc)
    pp, stp = odometry._solve_from_candidates(
        pose, cand_e, None, cand_s, None, e_xyz, e_mask, s_xyz, s_mask, oc_p)
    np.testing.assert_allclose(np.asarray(pp.t), np.asarray(px.t), atol=1e-3)
    np.testing.assert_allclose(np.asarray(pp.q), np.asarray(px.q), atol=1e-4)
    # factor counts within a handful of borderline-gate rows
    assert abs(int(stp.num_edge) - int(stx.num_edge)) <= 5
    assert abs(int(stp.num_surf) - int(stx.num_surf)) <= 20

"""The gather-free fused association must agree with the explicit
query_knn + association path on the same map."""
import jax.numpy as jnp
import numpy as np

from floam_tpu.ops import residuals, voxelmap


def build_map(rng, leaf=0.8, n=4000):
    pts = rng.uniform(-8, 8, size=(n, 3))
    vm = voxelmap.empty(16384, leaf, jnp.float64)
    return voxelmap.insert(vm, jnp.asarray(pts), jnp.ones(n, bool))


def fused_and_explicit(rng, leaf, assoc_kind):
    vm = build_map(rng, leaf)
    view = voxelmap.pack_query_view(vm)
    Q = 200
    queries = jnp.asarray(rng.uniform(-7, 7, size=(Q, 3)))
    qmask = jnp.ones(Q, bool)
    offs = voxelmap.neighbor_offsets(voxelmap.SUPER * leaf, 1.0)
    offs_d = voxelmap.dedup_offsets(offs, vm.num_buckets)
    deltas = voxelmap.offset_key_deltas(offs_d)

    # explicit path
    nn_xyz, nn_d2 = voxelmap.query_knn(view, queries, qmask, k=5,
                                       leaf=vm.leaf, super=vm.super)
    # fused path
    cand_soa, d2 = voxelmap.query_candidates(view, vm.leaf, queries,
                                             jnp.asarray(deltas))
    kth, win = voxelmap.select_k_mask(d2, 5)

    if assoc_kind == "edge":
        f_ref = residuals.edge_association(queries, nn_xyz, nn_d2, 1.0, 3.0,
                                           0.1)
        f_fused = residuals.edge_association_fused(queries, queries, cand_soa, win, kth,
                                                   5, 1.0, 3.0, 0.1)
    else:
        f_ref = residuals.surf_association(queries, nn_xyz, nn_d2, 1.0, 0.2)
        f_fused = residuals.surf_association_fused(queries, queries, cand_soa, win, kth,
                                                   5, 1.0, 0.2)
    return f_ref, f_fused


def test_select_k_mask_matches_topk(rng):
    d2 = jnp.asarray(np.abs(rng.normal(1.0, 0.5, (64, 324))),
                     jnp.float32)
    kth, win = voxelmap.select_k_mask(d2, 5)
    assert np.asarray(win.sum(axis=1) == 5).all()
    want = np.sort(np.asarray(d2), axis=1)[:, :5]
    got5 = np.sort(np.where(np.asarray(win), np.asarray(d2), np.inf),
                   axis=1)[:, :5]
    np.testing.assert_allclose(got5, want, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(kth), want[:, 4], rtol=2e-3)


def test_fused_edge_matches_explicit(rng):
    f_ref, f_fused = fused_and_explicit(rng, 0.8, "edge")
    vr = np.asarray(f_ref.valid)
    vf = np.asarray(f_fused.valid)
    # validity flags agree except possibly at near-tie gate boundaries
    agree = (vr == vf)
    assert agree.mean() > 0.97, agree.mean()
    both = vr & vf
    assert both.sum() >= 5  # the scene must actually produce edge factors
    # line geometry identical where both valid (pa/pb up to direction sign)
    pa_r, pb_r = np.asarray(f_ref.pa)[both], np.asarray(f_ref.pb)[both]
    pa_f, pb_f = np.asarray(f_fused.pa)[both], np.asarray(f_fused.pb)[both]
    same = np.linalg.norm(pa_r - pa_f, axis=1) < 1e-6
    flip = np.linalg.norm(pa_r - pb_f, axis=1) < 1e-6
    assert (same | flip).all()


def test_fused_surf_matches_explicit(rng):
    """The fused fit solves A n = -1 about the QUERY origin (documented
    f32-conditioning divergence), so normals agree geometrically (not
    bitwise) and both planes must contain the same fitted surface."""
    f_ref, f_fused = fused_and_explicit(rng, 0.8, "surf")
    vr = np.asarray(f_ref.valid)
    vf = np.asarray(f_fused.valid)
    assert (vr == vf).mean() > 0.95
    both = vr & vf
    assert both.sum() >= 3
    n_r = np.asarray(f_ref.normal)[both]
    n_f = np.asarray(f_fused.normal)[both]
    d_r = np.asarray(f_ref.offset)[both]
    d_f = np.asarray(f_fused.offset)[both]
    # normals aligned to ~1 deg
    assert (np.abs(np.sum(n_r * n_f, axis=1)) > 0.985).all()
    # the fused plane passes near the reference plane at the fit location
    # (project the query onto the ref plane: that is where the 5 NN are)
    q = np.asarray(f_ref.point)[both]
    x0 = q - (np.sum(n_r * q, axis=1) + d_r)[:, None] * n_r
    resid = np.abs(np.sum(n_f * x0, axis=1) + d_f)
    assert (resid < 0.15).all(), resid.max()

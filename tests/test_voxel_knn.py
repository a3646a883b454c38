"""Voxel downsample vs PCL-semantics golden model; grid 5-NN vs exact
brute-force k-NN within the association radius."""
import jax.numpy as jnp
import numpy as np
import pytest

from floam_tpu.ops import knn, voxel

from reference_models import knn_ref, voxel_downsample_ref


def test_voxel_downsample_matches_golden(rng):
    pts = rng.uniform(-20, 20, size=(2000, 3))
    mask = np.ones(2000, bool)
    mask[1500:] = rng.random(500) > 0.5
    leaf = 0.8
    out_xyz, out_mask, _ = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.asarray(mask), leaf, out_capacity=4096)
    got = np.asarray(out_xyz)[np.asarray(out_mask)]
    want = voxel_downsample_ref(pts[mask], leaf)
    # hash collisions may merge a voxel pair (expected << 1 per call);
    # tolerate up to 2 and require the rest to match exactly as sets
    assert abs(len(got) - len(want)) <= 2
    got_set = {tuple(np.round(p, 6)) for p in got}
    want_set = {tuple(np.round(p, 6)) for p in want}
    overlap = len(got_set & want_set)
    assert overlap >= len(want) - 4


def test_voxel_downsample_capacity_overflow(rng):
    pts = rng.uniform(-50, 50, size=(1000, 3))
    out_xyz, out_mask, _ = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.ones(1000, bool), 0.1, out_capacity=64)
    assert int(np.asarray(out_mask).sum()) == 64  # filled to cap, no crash


def test_voxel_downsample_averages_extra(rng):
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.0, 5.0, 5.0]])
    inten = np.array([1.0, 3.0, 10.0])
    out_xyz, out_mask, out_extra = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.ones(3, bool), 1.0, 8,
        extra=jnp.asarray(inten))
    m = np.asarray(out_mask)
    vals = sorted(np.asarray(out_extra)[m, 0].tolist())
    assert vals == [2.0, 10.0]


def test_crop_mask():
    pts = jnp.asarray([[0.0, 0, 0], [101, 0, 0], [-99, 50, -99], [0, 0, 100.5]])
    m = voxel.crop_mask(pts, jnp.ones(4, bool), jnp.zeros(3), 100.0)
    assert np.asarray(m).tolist() == [True, False, True, False]


@pytest.mark.parametrize("seed", [0, 1])
def test_grid_knn_exact_within_radius(seed):
    """Within the 1.0 m^2 gate radius, grid 5-NN must equal exact 5-NN."""
    rng = np.random.default_rng(seed)
    data = rng.uniform(-10, 10, size=(3000, 3))
    # sprinkle dense clusters so 5-NN distances are small
    centers = rng.uniform(-8, 8, size=(50, 3))
    clustered = (centers[:, None, :] + rng.normal(0, 0.3, (50, 40, 3))).reshape(-1, 3)
    data = np.concatenate([data, clustered])
    M = len(data)
    queries = np.concatenate([
        centers + rng.normal(0, 0.1, (50, 3)),
        rng.uniform(-10, 10, size=(30, 3)),
    ])
    grid = knn.build_grid(jnp.asarray(data), jnp.ones(M, bool), 1.0)
    nn_xyz, nn_d2, nn_valid = knn.query_knn(
        grid, jnp.asarray(queries), jnp.ones(len(queries), bool),
        k=5, cell_capacity=64)
    idx_ref, d2_ref = knn_ref(queries, data, 5)
    got_d2 = np.sort(np.asarray(nn_d2), axis=1)
    want_d2 = np.sort(d2_ref, axis=1)
    for qi in range(len(queries)):
        if want_d2[qi, -1] < 1.0:  # gate radius: must match exactly
            np.testing.assert_allclose(got_d2[qi], want_d2[qi], atol=1e-9,
                                       err_msg=f"query {qi}")


def test_grid_knn_masks_and_padding(rng):
    data = rng.uniform(-5, 5, size=(100, 3))
    mask = np.zeros(100, bool)
    mask[:10] = True
    grid = knn.build_grid(jnp.asarray(data), jnp.asarray(mask), 1.0)
    q = jnp.asarray(data[:5])
    nn_xyz, nn_d2, nn_valid = knn.query_knn(grid, q, jnp.ones(5, bool), k=5,
                                            cell_capacity=16)
    # self-match: nearest distance 0
    np.testing.assert_allclose(np.asarray(nn_d2)[:, 0], 0.0, atol=1e-12)
    # masked-out query
    _, nn_d2_m, nn_valid_m = knn.query_knn(
        grid, q, jnp.zeros(5, bool), k=5, cell_capacity=16)
    assert not bool(np.asarray(nn_valid_m).any())
    assert np.isinf(np.asarray(nn_d2_m)).all()


def test_grid_knn_empty_grid(rng):
    data = jnp.zeros((64, 3))
    grid = knn.build_grid(data, jnp.zeros(64, bool), 1.0)
    q = jnp.asarray(rng.uniform(-1, 1, size=(4, 3)))
    _, nn_d2, nn_valid = knn.query_knn(grid, q, jnp.ones(4, bool), k=5)
    assert not bool(np.asarray(nn_valid).any())

"""Voxel downsample vs PCL-semantics golden model (the NN path is tested
in test_voxelmap.py against the production voxel-hash tables)."""
import jax.numpy as jnp
import numpy as np

from floam_tpu.ops import voxel

from reference_models import voxel_downsample_ref


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


def test_voxel_downsample_np_matches_device(rng):
    """The host-side export downsample must produce the same centroid set
    as the device version (order-insensitive)."""
    pts = rng.uniform(-5, 5, size=(4000, 3))
    out_xyz, out_mask, _ = voxel.voxel_downsample(
        jnp.asarray(pts), jnp.ones(len(pts), bool), 0.5, 4096)
    dev = np.asarray(out_xyz)[np.asarray(out_mask)]
    host = voxel.voxel_downsample_np(pts, 0.5)
    assert len(host) == len(dev)
    dev_sorted = dev[np.lexsort(dev.T)]
    host_sorted = host[np.lexsort(host.T)]
    np.testing.assert_allclose(host_sorted, dev_sorted, atol=1e-6)

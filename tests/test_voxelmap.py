"""Voxel hash-table map: downsample vs golden model, insert/crop semantics,
pruned-neighborhood k-NN exactness within the gate radius."""
import jax.numpy as jnp
import numpy as np
import pytest

from floam_tpu.ops import voxelmap

from reference_models import knn_ref, voxel_downsample_ref


def test_hash_downsample_matches_golden(rng):
    pts = rng.uniform(-20, 20, size=(2000, 3))
    mask = np.ones(2000, bool)
    mask[1500:] = rng.random(500) > 0.5
    leaf = 0.8
    out_xyz, out_mask = voxelmap.hash_downsample(
        jnp.asarray(pts), jnp.asarray(mask), leaf, num_buckets=4096,
        out_capacity=4096)
    got = np.asarray(out_xyz)[np.asarray(out_mask)]
    want = voxel_downsample_ref(pts[mask], leaf)
    assert abs(len(got) - len(want)) <= 3  # rare slot-collision merges
    got_set = {tuple(np.round(p, 5)) for p in got}
    want_set = {tuple(np.round(p, 5)) for p in want}
    assert len(got_set & want_set) >= len(want) - 6


@pytest.mark.parametrize("super_", [2, 3, 4])
def test_insert_crop_reuse_any_super(rng, super_):
    """Insert/crop/evict-slot-reuse semantics hold at every production
    supercell size (sub-id/parent math regressions at odd S would otherwise
    only surface as ATE drift)."""
    vm = voxelmap.empty(1024, 1.0, jnp.float64, super=super_)
    pts = jnp.asarray([[0.5, 0.5, 0.5], [50.5, 0.5, 0.5], [0.5, 7.5, 0.5]])
    vm = voxelmap.insert(vm, pts, jnp.ones(3, bool), probe_rounds=super_ ** 3)
    assert int(vm.num_occupied()) == 3
    vm = voxelmap.crop(vm, jnp.zeros(3), 10.0)
    c, occ = vm.centroids()
    kept = np.asarray(c)[np.asarray(occ)]
    assert len(kept) == 2 and (np.abs(kept) <= 10.0).all()
    vm = voxelmap.insert(vm, jnp.asarray([[50.5, 0.5, 0.5]]),
                         jnp.ones(1, bool), probe_rounds=super_ ** 3)
    assert int(vm.num_occupied()) == 3


def test_insert_running_mean(rng):
    vm = voxelmap.empty(1024, 1.0, jnp.float64)
    pts = jnp.asarray([[0.2, 0.2, 0.2], [0.4, 0.4, 0.4], [5.1, 0.0, 0.0]])
    vm = voxelmap.insert(vm, pts, jnp.ones(3, bool))
    c, occ = vm.centroids()
    c = np.asarray(c)[np.asarray(occ)]
    assert len(c) == 2
    got = {tuple(np.round(p, 6)) for p in c}
    assert (0.3, 0.3, 0.3) in got and (5.1, 0.0, 0.0) in got
    # second insert into the same voxel updates the running mean
    vm = voxelmap.insert(vm, jnp.asarray([[0.6, 0.6, 0.6]]),
                         jnp.ones(1, bool))
    c, occ = vm.centroids()
    c = np.asarray(c)[np.asarray(occ)]
    assert any(np.allclose(p, [0.4, 0.4, 0.4]) for p in c)


def test_insert_count_cap():
    vm = voxelmap.empty(256, 1.0, jnp.float64)
    for i in range(40):
        vm = voxelmap.insert(vm, jnp.asarray([[0.5, 0.5, 0.5]]),
                             jnp.ones(1, bool), count_cap=10.0)
    assert float(vm.counts.max()) <= 10.0
    c, occ = vm.centroids()
    assert np.allclose(np.asarray(c)[np.asarray(occ)][0], [0.5, 0.5, 0.5])


def test_crop_evicts():
    vm = voxelmap.empty(1024, 1.0, jnp.float64)
    pts = jnp.asarray([[0.5, 0.5, 0.5], [50.5, 0.5, 0.5]])
    vm = voxelmap.insert(vm, pts, jnp.ones(2, bool))
    vm = voxelmap.crop(vm, jnp.zeros(3), 10.0)
    c, occ = vm.centroids()
    kept = np.asarray(c)[np.asarray(occ)]
    assert len(kept) == 1 and kept[0][0] < 1.0
    # evicted slot is reusable
    vm = voxelmap.insert(vm, jnp.asarray([[50.5, 0.5, 0.5]]),
                         jnp.ones(1, bool))
    assert int(vm.num_occupied()) == 2


@pytest.mark.parametrize("super_", [2, 3, 4])
@pytest.mark.parametrize("leaf", [0.4, 0.8])
def test_query_knn_exact_within_radius(rng, leaf, super_):
    """Against brute force over voxel centroids: exact within radius 1.0,
    at every production supercell size (edge map uses S=3, surf S=4)."""
    pts = rng.uniform(-8, 8, size=(4000, 3))
    vm = voxelmap.empty(16384, leaf, jnp.float64, super=super_)
    vm = voxelmap.insert(vm, jnp.asarray(pts), jnp.ones(len(pts), bool),
                         probe_rounds=super_ ** 3)
    cents, occ = vm.centroids()
    cents = np.asarray(cents)[np.asarray(occ)]

    queries = rng.uniform(-7, 7, size=(200, 3))
    nn_xyz, nn_d2 = voxelmap.query_knn(
        vm, jnp.asarray(queries), jnp.ones(len(queries), bool), k=5)
    got_d2 = np.sort(np.asarray(nn_d2), axis=1)
    _, want_d2 = knn_ref(queries, cents, 5)
    want_d2 = np.sort(want_d2, axis=1)
    for qi in range(len(queries)):
        if want_d2[qi, -1] < 1.0:
            np.testing.assert_allclose(got_d2[qi], want_d2[qi], atol=1e-9,
                                       err_msg=f"query {qi} leaf {leaf}")


def test_query_masks():
    vm = voxelmap.empty(256, 1.0, jnp.float64)
    vm = voxelmap.insert(vm, jnp.asarray([[0.5, 0.5, 0.5]]),
                         jnp.ones(1, bool))
    q = jnp.asarray([[0.6, 0.5, 0.5]])
    nn_xyz, nn_d2 = voxelmap.query_knn(vm, q, jnp.zeros(1, bool), k=5)
    assert np.isinf(np.asarray(nn_d2)).all()
    nn_xyz, nn_d2 = voxelmap.query_knn(vm, q, jnp.ones(1, bool), k=5)
    assert abs(float(nn_d2[0, 0]) - 0.01) < 1e-9
    assert np.isinf(np.asarray(nn_d2[0, 1:])).all()


def test_compact():
    vm = voxelmap.empty(256, 1.0, jnp.float64)
    pts = jnp.asarray([[i + 0.5, 0.5, 0.5] for i in range(10)])
    vm = voxelmap.insert(vm, pts, jnp.ones(10, bool))
    xyz, mask = voxelmap.compact(vm, 16)
    assert int(mask.sum()) == 10
    got = {round(float(x), 3) for x in np.asarray(xyz)[np.asarray(mask)][:, 0]}
    assert got == {i + 0.5 for i in range(10)}
    # capacity overflow truncates but stays masked-consistent
    xyz, mask = voxelmap.compact(vm, 4)
    assert int(mask.sum()) == 4


def test_neighbor_offsets_counts():
    assert len(voxelmap.neighbor_offsets(0.8, 1.0)) == 81
    o4 = voxelmap.neighbor_offsets(0.4, 1.0)
    assert len(o4) == 275
    assert (np.abs(o4) <= 3).all()
    # pruning beats the full cube
    assert len(o4) < 9 ** 3


@pytest.mark.parametrize("triple", [
    (0x9E3779B1, 0x85EBCA77, 0xC2B2AE3D),  # bucket hash (min alias 1023)
    (0xF1E54A8B, 0xA00641A9, 0xAF266A95),  # ownership key (min alias 1188)
])
def test_linear_hash_constants_alias_free(triple):
    """Both linear-key lattices {v : v.A + v.B + v.C == 0 mod 2^32} must
    have no alias vector within +-1000 cells (the exact-dedup range: the
    +-100 m crop at the 0.2 m minimum hot-path leaf). The bucket hash and
    the ownership key use INDEPENDENT triples, so beyond this range a
    silent centroid merge requires a joint alias across both lattices —
    expected count << 1e-4 live pairs at the finest preset (leaf 0.1)."""
    import numpy as np

    A, B, C = triple
    M = 2 ** 32
    Cinv = pow(C, -1, M)
    R = 1000
    dy = np.arange(-R, R + 1, dtype=np.int64)
    for vx in range(-R, R + 1):
        rhs = (-(vx * A + dy * B)) % M
        vz = (rhs * Cinv) % M
        vz_signed = np.where(vz > M // 2, vz - M, vz)
        hit = (np.abs(vz_signed) <= R) & ~((vx == 0) & (dy == 0) &
                                           (vz_signed == 0))
        assert not hit.any(), (vx, dy[hit], vz_signed[hit])

"""Multi-device tests on the 8-device virtual CPU mesh: sequence-batched
sharded odometry and distributed windowed BA (psum-reduced normal
equations)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from floam_tpu import odometry
from floam_tpu.config import OdomConfig
from floam_tpu.ops import residuals as R
from floam_tpu.ops import se3
from floam_tpu.parallel import (BAProblem, ba_refine, batched_odom_step,
                                make_sharded_ba_step, make_sharded_odom_step)
from floam_tpu.parallel.batch import batched_init_state
from floam_tpu.types import PointBatch

from test_odometry import small_config


def test_eight_devices():
    assert len(jax.devices()) == 8


def _make_batch_inputs(rng, B, n=512, dtype=jnp.float64):
    xyz = rng.uniform(-5, 5, size=(B, n, 3))
    return PointBatch(xyz=jnp.asarray(xyz, dtype),
                      mask=jnp.ones((B, n), bool))


@pytest.mark.slow
def test_batched_matches_single(rng):
    """vmap-batched odometry must agree with per-sequence runs."""
    cfg = small_config()
    B = 2
    states = batched_init_state(cfg, B, dtype=jnp.float64)
    edges = _make_batch_inputs(rng, B)
    surfs = _make_batch_inputs(rng, B, n=2048)
    # seed maps per sequence
    seeded = jax.vmap(
        lambda st, e, s: odometry.init_map_impl(st, e, s, cfg)
    )(states, edges, surfs)
    out_b, diag_b = batched_odom_step(seeded, edges, surfs, cfg)

    for b in range(B):
        st = jax.tree_util.tree_map(lambda x: x[b], states)
        e = jax.tree_util.tree_map(lambda x: x[b], edges)
        s = jax.tree_util.tree_map(lambda x: x[b], surfs)
        st = odometry.init_map(st, e, s, cfg)
        out_s, diag_s = odometry.odom_step_impl(st, e, s, cfg)
        np.testing.assert_allclose(np.asarray(out_b.pose.t[b]),
                                   np.asarray(out_s.pose.t), atol=1e-9)
        assert int(diag_b.num_surf_factors[b]) == int(diag_s.num_surf_factors)


@pytest.mark.slow
def test_sharded_odom_step_runs(rng):
    cfg = small_config()
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("dp",))
    B = 8
    states = batched_init_state(cfg, B, dtype=jnp.float64)
    edges = _make_batch_inputs(rng, B)
    surfs = _make_batch_inputs(rng, B, n=2048)
    states = jax.vmap(
        lambda st, e, s: odometry.init_map_impl(st, e, s, cfg)
    )(states, edges, surfs)
    step = make_sharded_odom_step(mesh, cfg)
    spec = NamedSharding(mesh, P("dp"))
    states = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(*( ("dp",) + (None,) * (x.ndim - 1))))), states)
    out, diag = step(states, edges, surfs)
    assert out.pose.t.shape == (B, 3)
    assert np.isfinite(np.asarray(out.pose.t)).all()


# ------------------------------------------------------------------ BA

def _window_problem(rng, K=4, Ne=64, Ns=256, noise=0.05):
    """Ground-truth window + exact world factors + noisy initial poses."""
    gt_q, gt_t = [], []
    q = jnp.asarray([1.0, 0, 0, 0], jnp.float64)
    t = jnp.zeros(3, jnp.float64)
    for k in range(K):
        gt_q.append(np.asarray(q))
        gt_t.append(np.asarray(t))
        dq, dt = se3.se3_exp(jnp.asarray(
            np.concatenate([rng.normal(0, 0.03, 3), [0.3, 0.05, 0.0]])))
        q, t = se3.pose_compose(q, t, dq, dt)

    planes = [(np.array([0, 0, 1.0]), -1.0), (np.array([1.0, 0, 0]), -5.0),
              (np.array([0, 1.0, 0]), 3.0)]
    lines = [(np.array([2.0, 0, 0]), np.array([0, 0, 1.0])),
             (np.array([0.0, 2, 1]), np.array([1.0, 0, 0]))]

    e_pts = np.zeros((K, Ne, 3))
    e_pa = np.zeros((K, Ne, 3))
    e_pb = np.zeros((K, Ne, 3))
    s_pts = np.zeros((K, Ns, 3))
    s_n = np.zeros((K, Ns, 3))
    s_d = np.zeros((K, Ns))
    for k in range(K):
        qk, tk = jnp.asarray(gt_q[k]), jnp.asarray(gt_t[k])
        qi, ti = se3.pose_inverse(qk, tk)
        for i in range(Ne):
            o, dv = lines[i % len(lines)]
            s = rng.uniform(-2, 2)
            w = o + s * dv
            e_pts[k, i] = np.asarray(se3.quat_rotate(qi, jnp.asarray(w)) + ti)
            e_pa[k, i] = o + (s + 0.1) * dv
            e_pb[k, i] = o - (0.1 - s) * dv
        for i in range(Ns):
            n, d = planes[i % len(planes)]
            p = rng.uniform(-4, 4, 3)
            p -= (n @ p + d) * n
            s_pts[k, i] = np.asarray(se3.quat_rotate(qi, jnp.asarray(p)) + ti)
            s_n[k, i] = n
            s_d[k, i] = d

    # priors = exact relative poses
    pr_q, pr_t = [], []
    for k in range(K - 1):
        qr, tr = se3.pose_compose(
            *se3.pose_inverse(jnp.asarray(gt_q[k]), jnp.asarray(gt_t[k])),
            jnp.asarray(gt_q[k + 1]), jnp.asarray(gt_t[k + 1]))
        pr_q.append(np.asarray(qr))
        pr_t.append(np.asarray(tr))

    # noisy initial poses (keep pose 0 exact: it is gauge-fixed)
    init_q, init_t = [gt_q[0]], [gt_t[0]]
    for k in range(1, K):
        xi = jnp.asarray(np.concatenate(
            [rng.normal(0, noise / 3, 3), rng.normal(0, noise, 3)]))
        q2, t2 = se3.pose_retract(jnp.asarray(gt_q[k]), jnp.asarray(gt_t[k]),
                                  xi)
        init_q.append(np.asarray(q2))
        init_t.append(np.asarray(t2))

    prob = BAProblem(
        quats=jnp.asarray(np.stack(init_q)),
        trans=jnp.asarray(np.stack(init_t)),
        edge=R.EdgeFactors(point=jnp.asarray(e_pts), pa=jnp.asarray(e_pa),
                           pb=jnp.asarray(e_pb),
                           valid=jnp.ones((K, Ne), bool)),
        surf=R.SurfFactors(point=jnp.asarray(s_pts), normal=jnp.asarray(s_n),
                           offset=jnp.asarray(s_d),
                           valid=jnp.ones((K, Ns), bool)),
        prior_dq=jnp.asarray(np.stack(pr_q)),
        prior_dt=jnp.asarray(np.stack(pr_t)),
        prior_weight=jnp.asarray(10.0),
    )
    return prob, np.stack(gt_q), np.stack(gt_t)


def test_ba_refine_converges(rng):
    cfg = OdomConfig(loss="none")
    prob, gt_q, gt_t = _window_problem(rng)
    init_err = np.linalg.norm(np.asarray(prob.trans) - gt_t, axis=1).max()
    out = ba_refine(prob, cfg, iters=8)
    err = np.linalg.norm(np.asarray(out.trans) - gt_t, axis=1).max()
    assert err < 1e-6, (init_err, err)
    for k in range(len(gt_q)):
        dq = se3.quat_mul(se3.quat_conj(out.quats[k]), jnp.asarray(gt_q[k]))
        assert float(se3.rotation_angle(dq)) < 1e-6


@pytest.mark.slow
def test_sharded_ba_matches_single_device(rng):
    cfg = OdomConfig(loss="none")
    prob, gt_q, gt_t = _window_problem(rng, Ne=64, Ns=256)
    out_single = ba_refine(prob, cfg, iters=4)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("dp",))
    step = make_sharded_ba_step(mesh, cfg, iters=4)
    q_sh, t_sh = step(prob)
    np.testing.assert_allclose(np.asarray(t_sh),
                               np.asarray(out_single.trans), atol=1e-8)
    sign = np.sign(np.sum(np.asarray(q_sh) * np.asarray(out_single.quats),
                          axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q_sh) * sign,
                               np.asarray(out_single.quats), atol=1e-8)


@pytest.mark.slow
def test_map_sharded_step_matches_single(rng):
    """Bucket-range map sharding: the 8-device map-sharded step must match
    the single-device step (views all-gathered over the mesh, factor
    chunks psum-reduced)."""
    import dataclasses

    from floam_tpu.parallel.sharded_map import (make_map_sharded_step,
                                                shard_state)

    cfg = small_config()
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("mp",))

    edge = _make_batch_inputs(rng, 1, n=512, dtype=jnp.float64)
    surf = _make_batch_inputs(rng, 1, n=2048, dtype=jnp.float64)
    edge = jax.tree_util.tree_map(lambda x: x[0], edge)
    surf = jax.tree_util.tree_map(lambda x: x[0], surf)

    s0 = odometry.init_state(cfg, dtype=jnp.float64)
    s0 = odometry.init_map_impl(s0, edge, surf, cfg)
    ref_state, ref_diag = odometry.odom_step_impl(s0, edge, surf, cfg)

    # sharded: seed via the sharded insert path so tables agree
    s1 = odometry.init_state(cfg, dtype=jnp.float64)
    s1 = odometry.init_map_impl(s1, edge, surf, cfg)
    s1 = shard_state(s1, mesh, cfg)
    step = make_map_sharded_step(mesh, cfg)
    out_state, diag = step(s1, edge, surf)

    np.testing.assert_allclose(np.asarray(out_state.pose.t),
                               np.asarray(ref_state.pose.t), atol=1e-9)
    sign = np.sign(np.dot(np.asarray(out_state.pose.q),
                          np.asarray(ref_state.pose.q)))
    np.testing.assert_allclose(np.asarray(out_state.pose.q) * sign,
                               np.asarray(ref_state.pose.q), atol=1e-9)
    assert int(diag.num_surf_factors) == int(ref_diag.num_surf_factors)
    # the sharded map contents agree with the single-device map
    occ_ref = int(ref_state.map.surf.num_occupied())
    occ_sh = int(np.asarray(out_state.map.surf.counts > 0).sum())
    assert occ_sh == occ_ref


@pytest.mark.slow
def test_hierarchical_map_sharded_step_matches_single(rng):
    """Two-tier (host x chip) layout: map planes sharded over the intra-host
    axis and replicated across hosts, queries sliced over hosts, normal
    equations psum-reduced over both axes. Must match the single-device
    step exactly, and the per-host map replicas must stay identical after
    the keyframe insert."""
    from floam_tpu.parallel.sharded_map import (make_map_sharded_step,
                                                shard_state)

    cfg = small_config()
    mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("host", "mp"))

    edge = _make_batch_inputs(rng, 1, n=512, dtype=jnp.float64)
    surf = _make_batch_inputs(rng, 1, n=2048, dtype=jnp.float64)
    edge = jax.tree_util.tree_map(lambda x: x[0], edge)
    surf = jax.tree_util.tree_map(lambda x: x[0], surf)

    s0 = odometry.init_state(cfg, dtype=jnp.float64)
    s0 = odometry.init_map_impl(s0, edge, surf, cfg)
    ref_state, ref_diag = odometry.odom_step_impl(s0, edge, surf, cfg)

    s1 = odometry.init_state(cfg, dtype=jnp.float64)
    s1 = odometry.init_map_impl(s1, edge, surf, cfg)
    s1 = shard_state(s1, mesh, cfg)
    step = make_map_sharded_step(mesh, cfg, axis="mp", query_axis="host")
    out_state, diag = step(s1, edge, surf)

    np.testing.assert_allclose(np.asarray(out_state.pose.t),
                               np.asarray(ref_state.pose.t), atol=1e-9)
    sign = np.sign(np.dot(np.asarray(out_state.pose.q),
                          np.asarray(ref_state.pose.q)))
    np.testing.assert_allclose(np.asarray(out_state.pose.q) * sign,
                               np.asarray(ref_state.pose.q), atol=1e-9)
    assert int(diag.num_surf_factors) == int(ref_diag.num_surf_factors)
    # occupancy can differ by a few voxels: the scatter winner among
    # bucket-alias way contenders is implementation-defined and the local
    # and global insert programs may break ties differently
    occ_ref = int(ref_state.map.surf.num_occupied())
    occ_sh = int(np.asarray(out_state.map.surf.counts > 0).sum())
    assert abs(occ_sh - occ_ref) <= 3, (occ_sh, occ_ref)
    # the per-host map replicas must be bit-identical (no DCN map traffic)
    by_index = {}
    for sh in out_state.map.surf.counts.addressable_shards:
        key = tuple((s.start, s.stop) for s in sh.index)
        if key in by_index:
            np.testing.assert_array_equal(np.asarray(sh.data),
                                          by_index[key])
        else:
            by_index[key] = np.asarray(sh.data)
    assert len(by_index) == 4  # 4 distinct mp shards, each replicated 2x

"""Pose-graph back-end units: optimizer recovers a drifted chain given
loop constraints; pair registrar measures relative poses; g2o round-trips
through the standalone back-end (the reference's handoff surface,
src/utils.cpp:3-78 + launch/structor_slam.launch:50-52)."""
import numpy as np
import jax.numpy as jnp
import pytest

from floam_tpu import posegraph, sim
from floam_tpu.ops import se3

from test_odometry import small_config


def _circle_poses(K, radius=10.0):
    th = np.linspace(0, 2 * np.pi, K, endpoint=False)
    quats, trans = [], []
    for a in th:
        yaw = a + np.pi / 2
        quats.append(np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)]))
        trans.append(np.array([radius * np.cos(a), radius * np.sin(a), 0.0]))
    return np.stack(quats), np.stack(trans)


def _drifted(quats, trans, drift_per_step=0.02, seed=0):
    """Integrate the true relative chain with a small systematic twist —
    simulated odometry drift."""
    rng = np.random.default_rng(seed)
    ei, ej, dq, dt = posegraph.chain_edges(quats, trans)
    bias = rng.normal(0, drift_per_step, 3)
    q = [quats[0]]
    t = [trans[0]]
    for k in range(len(ei)):
        zq, zt = dq[k], dt[k] + bias
        nq, nt = se3.pose_compose(jnp.asarray(q[-1]), jnp.asarray(t[-1]),
                                  jnp.asarray(zq), jnp.asarray(zt))
        q.append(np.asarray(nq))
        t.append(np.asarray(nt))
    return np.stack(q), np.stack(t)


def _ate(t_est, t_gt):
    return float(np.sqrt(np.mean(np.sum((t_est - t_gt) ** 2, axis=1))))


def test_loop_edges_recover_drifted_chain():
    K = 48
    gt_q, gt_t = _circle_poses(K)
    od_q, od_t = _drifted(gt_q, gt_t, drift_per_step=0.03)
    ate_odom = _ate(od_t, gt_t)
    assert ate_odom > 0.5  # drift accumulated

    # odometry edges carry the DRIFTED relative measurements (what the
    # front-end believes); loop edges carry TRUE relative poses between
    # revisiting nodes — exactly what pair registration measures
    ei, ej, dq, dt = posegraph.chain_edges(od_q, od_t)
    loops = [(0, K - 1), (4, K - 5)]
    for a, b in loops:
        zq, zt = se3.pose_compose(
            *se3.pose_inverse(jnp.asarray(gt_q[a]), jnp.asarray(gt_t[a])),
            jnp.asarray(gt_q[b]), jnp.asarray(gt_t[b]))
        ei = np.concatenate([ei, [a]])
        ej = np.concatenate([ej, [b]])
        dq = np.concatenate([dq, [np.asarray(zq)]])
        dt = np.concatenate([dt, [np.asarray(zt)]])
    w = np.tile(np.array([1e3] * 3 + [1e2] * 3), (len(ei), 1))
    q2, t2 = posegraph.optimize_pose_graph_jit(
        jnp.asarray(od_q), jnp.asarray(od_t), ei.astype(np.int32),
        ej.astype(np.int32), jnp.asarray(dq), jnp.asarray(dt),
        jnp.asarray(w), iters=10)
    ate_opt = _ate(np.asarray(t2), gt_t)
    # the loop constraints distribute the accumulated drift: large win
    assert ate_opt < 0.35 * ate_odom, (ate_opt, ate_odom)


def test_zero_weight_edges_are_padding():
    K = 8
    gt_q, gt_t = _circle_poses(K)
    ei, ej, dq, dt = posegraph.chain_edges(gt_q, gt_t)
    w = np.tile(np.array([1e3] * 3 + [1e2] * 3), (len(ei), 1))
    # pad with garbage edges at zero weight: must not perturb the solution
    ei_p = np.concatenate([ei, [0, 3]]).astype(np.int32)
    ej_p = np.concatenate([ej, [5, 7]]).astype(np.int32)
    dq_p = np.concatenate([dq, [[1, 0, 0, 0], [0.7, 0.7, 0, 0]]])
    dt_p = np.concatenate([dt, [[9, 9, 9], [-5, 0, 2]]])
    w_p = np.concatenate([w, np.zeros((2, 6))])
    q1, t1 = posegraph.optimize_pose_graph_jit(
        jnp.asarray(gt_q), jnp.asarray(gt_t), ei, ej, jnp.asarray(dq),
        jnp.asarray(dt), jnp.asarray(w), iters=3)
    q2, t2 = posegraph.optimize_pose_graph_jit(
        jnp.asarray(gt_q), jnp.asarray(gt_t), ei_p, ej_p,
        jnp.asarray(dq_p), jnp.asarray(dt_p), jnp.asarray(w_p), iters=3)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-8)


def test_pair_registrar_measures_relative_pose():
    """Two scans of the same scene from nearby poses: the registrar must
    recover T_a<-b from a drifted initial guess."""
    from floam_tpu.pipeline import _features_from_scan

    cfg = small_config()
    world = sim.World.room(size=18.0, height=4.0, num_poles=14, seed=3)
    qa = np.array([1.0, 0, 0, 0])
    ta = np.array([0.0, 0.0, 1.5])
    yaw = 0.3
    qb = np.array([np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)])
    tb = np.array([0.8, -0.4, 1.5])
    scan_a = sim.simulate_scan(world, qa, ta, cfg.lidar, azimuth_steps=720,
                               seed=0)
    scan_b = sim.simulate_scan(world, qb, tb, cfg.lidar, azimuth_steps=720,
                               seed=1)
    ea, sa = _features_from_scan(scan_a, cfg)
    eb, sb = _features_from_scan(scan_b, cfg)
    # true relative pose T_a^-1 * T_b
    zq, zt = se3.pose_compose(
        *se3.pose_inverse(jnp.asarray(qa), jnp.asarray(ta)),
        jnp.asarray(qb), jnp.asarray(tb))
    # drifted init: 0.35 m + 3 deg off
    dyaw = 0.05
    q0 = se3.quat_mul(jnp.asarray(zq),
                      jnp.asarray([np.cos(dyaw / 2), 0, 0,
                                   np.sin(dyaw / 2)]))
    t0 = jnp.asarray(zt) + jnp.asarray([0.25, -0.25, 0.0])
    reg = posegraph.make_pair_registrar(cfg, rounds=8, dtype=jnp.float64)
    res = reg(ea.xyz, ea.mask, sa.xyz, sa.mask,
              eb.xyz, eb.mask, sb.xyz, sb.mask, q0, t0)
    assert int(res.num_edge) + int(res.num_surf) > 200
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(zt), atol=0.03)
    dq_err = se3.quat_mul(se3.quat_conj(jnp.asarray(zq)), res.q)
    assert float(se3.rotation_angle(dq_err)) < 0.01


def test_g2o_roundtrip_optimize(tmp_path):
    from floam_tpu.io.export import load_g2o, save_posegraph_graph

    K = 24
    gt_q, gt_t = _circle_poses(K)
    od_q, od_t = _drifted(gt_q, gt_t, drift_per_step=0.05)
    loops = [(0, K - 1), (3, 15)]
    extra = []
    for a, b in loops:
        zq, zt = se3.pose_compose(
            *se3.pose_inverse(jnp.asarray(gt_q[a]), jnp.asarray(gt_t[a])),
            jnp.asarray(gt_q[b]), jnp.asarray(gt_t[b]))
        extra.append((a, b, np.asarray(zq), np.asarray(zt)))
    path = tmp_path / "graph.g2o"
    # properly-weighted information (the default reproduces the
    # reference's inverted variances byte-for-byte; see writer docstring)
    save_posegraph_graph(path, od_q, od_t, extra_edges=extra,
                         info_diag=[100.0] * 3 + [1000.0] * 3)
    # parse back: vertices + chain edges + the loop edge
    q_in, t_in, edges = load_g2o(path)
    np.testing.assert_allclose(t_in, od_t, atol=1e-9)
    assert len(edges) == K + 1  # K-1 chain + 2 loops
    assert (edges[-2][0], edges[-2][1]) == (0, K - 1)
    # the standalone back-end consumes its own export
    q2, t2 = posegraph.optimize_g2o(path, path_out=tmp_path / "opt.g2o")
    assert _ate(t2, gt_t) < 0.6 * _ate(od_t, gt_t)
    q3, t3, e3 = load_g2o(tmp_path / "opt.g2o")
    np.testing.assert_allclose(t3, t2, atol=1e-6)


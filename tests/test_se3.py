"""Unit tests for SE(3)/quaternion math (floam_tpu.ops.se3).

The reference validated its pose algebra only through Ceres's (disabled)
check_gradients flag (src/odomEstimationClass.cpp:104-105); here every op is
checked against scipy/autodiff/closure properties.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from floam_tpu.ops import se3

jax.config.update("jax_enable_x64", True)


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def to_scipy(q_wxyz):
    return R.from_quat(np.roll(np.asarray(q_wxyz), -1, axis=-1))  # xyzw


def test_quat_mul_matches_scipy(rng):
    a, b = random_quats(rng, 16), random_quats(rng, 16)
    got = np.asarray(se3.quat_mul(jnp.asarray(a), jnp.asarray(b)))
    want = (to_scipy(a) * to_scipy(b)).as_quat()  # xyzw
    want = np.roll(want, 1, axis=-1)
    # sign ambiguity
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-12)


def test_quat_rotate_matches_matrix(rng):
    q = random_quats(rng, 16)
    v = rng.normal(size=(16, 3))
    got = np.asarray(se3.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    want = np.einsum("nij,nj->ni", to_scipy(q).as_matrix(), v)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_quat_mat_roundtrip(rng):
    q = random_quats(rng, 32)
    m = se3.quat_to_mat(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(m), to_scipy(q).as_matrix(), atol=1e-12)
    q2 = np.asarray(se3.mat_to_quat(m))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-9)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(32, 6))
    xi[0] = 0.0  # identity
    xi[1, :3] = 1e-9  # tiny rotation
    q, t = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(q, t))
    np.testing.assert_allclose(xi2, xi, atol=1e-8)


def test_se3_exp_matches_expm(rng):
    from scipy.linalg import expm

    xi = rng.normal(size=(8, 6)) * 0.7
    q, t = se3.se3_exp(jnp.asarray(xi))
    for i in range(8):
        X = np.zeros((4, 4))
        w, u = xi[i, :3], xi[i, 3:]
        X[:3, :3] = np.array(
            [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
        )
        X[:3, 3] = u
        T = expm(X)
        np.testing.assert_allclose(
            np.asarray(se3.quat_to_mat(q[i])), T[:3, :3], atol=1e-10
        )
        np.testing.assert_allclose(np.asarray(t[i]), T[:3, 3], atol=1e-10)


def test_pose_compose_inverse(rng):
    qa, qb = map(jnp.asarray, (random_quats(rng, 8), random_quats(rng, 8)))
    ta, tb = map(jnp.asarray, (rng.normal(size=(8, 3)), rng.normal(size=(8, 3))))
    qc, tc = se3.pose_compose(qa, ta, qb, tb)
    qi, ti = se3.pose_inverse(qc, tc)
    q_id, t_id = se3.pose_compose(qc, tc, qi, ti)
    np.testing.assert_allclose(np.abs(np.asarray(q_id[..., 0])), 1.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(t_id), 0.0, atol=1e-12)
    # associativity with point transforms
    pts = jnp.asarray(rng.normal(size=(8, 5, 3)))
    direct = se3.quat_rotate(qc[:, None, :], pts) + tc[:, None, :]
    nested = se3.quat_rotate(qa[:, None, :],
                             se3.quat_rotate(qb[:, None, :], pts) + tb[:, None, :]) + ta[:, None, :]
    np.testing.assert_allclose(np.asarray(direct), np.asarray(nested), atol=1e-12)


def test_pose_retract_matches_reference_parameterization(rng):
    """x+ = exp(delta) * x with new_t = dR t + dt (lidarOptimization.cpp:88-89)."""
    q = jnp.asarray(random_quats(rng, 4))
    t = jnp.asarray(rng.normal(size=(4, 3)))
    xi = jnp.asarray(rng.normal(size=(4, 6)) * 0.3)
    q2, t2 = se3.pose_retract(q, t, xi)
    dq, dt = se3.se3_exp(xi)
    q_want = se3.quat_mul(dq, q)
    t_want = se3.quat_rotate(dq, t) + dt
    sign = jnp.sign(jnp.sum(q2 * q_want, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q2 * sign), np.asarray(q_want), atol=1e-12)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t_want), atol=1e-12)


def test_slerp_endpoints_and_midpoint(rng):
    q0 = jnp.asarray(random_quats(rng, 8))
    q1 = jnp.asarray(random_quats(rng, 8))
    np.testing.assert_allclose(
        np.asarray(se3.quat_slerp(q0, q1, 0.0)), np.asarray(q0), atol=1e-9
    )
    s1 = np.asarray(se3.quat_slerp(q0, q1, 1.0))
    sign = np.sign(np.sum(s1 * np.asarray(q1), axis=-1, keepdims=True))
    np.testing.assert_allclose(s1 * sign, np.asarray(q1), atol=1e-9)
    # midpoint matches scipy slerp
    from scipy.spatial.transform import Slerp

    for i in range(8):
        rots = R.from_quat(
            np.roll(np.stack([np.asarray(q0[i]), np.asarray(q1[i])]), -1, axis=-1)
        )
        want = Slerp([0, 1], rots)(0.5).as_quat()
        want = np.roll(want, 1)
        got = np.asarray(se3.quat_slerp(q0[i], q1[i], 0.5))
        sign = np.sign(np.dot(got, want))
        np.testing.assert_allclose(got, want * sign, atol=1e-9)


def test_rotation_angle(rng):
    angles = rng.uniform(0, np.pi, size=16)
    axes = rng.normal(size=(16, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    q = se3.so3_exp_quat(jnp.asarray(angles[:, None] * axes))
    np.testing.assert_allclose(np.asarray(se3.rotation_angle(q)), angles, atol=1e-9)


def test_so3_exp_small_angle_taylor():
    """The Taylor branch must agree with the exact formula near the switch."""
    for theta in [1e-10, 1e-8, 1e-6, 1e-4]:
        w = jnp.asarray([theta, 0.0, 0.0], dtype=jnp.float64)
        q = np.asarray(se3.so3_exp_quat(w))
        want = np.array([np.cos(theta / 2), np.sin(theta / 2), 0, 0])
        np.testing.assert_allclose(q, want, atol=1e-14)


def test_autodiff_through_exp():
    """Gradients stay finite at the identity (safe-where pattern)."""
    g = jax.jacobian(lambda xi: se3.se3_exp(xi)[1])(jnp.zeros(6, jnp.float64))
    assert np.all(np.isfinite(np.asarray(g)))
    # d t / d upsilon at identity should be I
    np.testing.assert_allclose(np.asarray(g)[:, 3:], np.eye(3), atol=1e-9)


def test_euler_to_quat_orders():
    q_ref = se3.euler_to_quat(0.0, 0.0, np.pi, order="ryp")
    q_std = se3.euler_to_quat(0.0, 0.0, np.pi, order="rpy")
    # pure yaw: both orders agree
    np.testing.assert_allclose(np.asarray(q_ref), np.asarray(q_std), atol=1e-12)
    want = R.from_euler("ZYX", [np.pi, 0, 0]).as_quat()
    got = np.asarray(q_std)
    np.testing.assert_allclose(got, np.roll(want, 1), atol=1e-12)

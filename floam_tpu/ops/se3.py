"""SE(3) / quaternion math, fully vectorized and autodiff-safe.

TPU-native replacement for the reference's Eigen pose algebra and the Ceres
``PoseSE3Parameterization`` (reference: src/lidarOptimization.cpp:77-152 —
left-multiplicative update x+ = exp(delta) * x, se(3) exp map with
small-angle Taylor branch and V-matrix for translation; ``skew`` helper).

Conventions:
  * quaternions are (w, x, y, z), Hamilton product, unit norm;
  * se(3) tangent vectors are xi = (omega[3], upsilon[3]) — rotation first,
    matching the reference's Jacobian layout (lidarOptimization.cpp:30-36);
  * all ops broadcast over leading batch dimensions and preserve dtype.

Small-angle branches use the "safe where" pattern so gradients stay finite
under jax.jacobian (used by tests to verify the analytic Jacobians, the real
version of the reference's disabled check_gradients flag,
src/odomEstimationClass.cpp:104-105).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b; (...,4)x(...,4)->(...,4), w-first."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.sqrt(jnp.maximum(jnp.sum(q * q, axis=-1, keepdims=True), _EPS))
    return q / n


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (...,3) by unit quaternions q (...,4)."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion, branchless 4-way-select (Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # candidate 0: trace-dominant
    s0 = safe_sqrt(1.0 + tr) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0,
                    (m10 - m01) / s0], axis=-1)
    # candidate 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)
    # candidate 2: m11 dominant
    s2 = safe_sqrt(1.0 - m00 + m11 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2,
                    (m12 + m21) / s2], axis=-1)
    # candidate 3: m22 dominant
    s3 = safe_sqrt(1.0 - m00 - m11 + m22) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3,
                    0.25 * s3], axis=-1)

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None], q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    return quat_normalize(q)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, u) -> jnp.ndarray:
    """Spherical interpolation (shortest arc). Replaces the reference's
    stubbed IMU Interpolate (src/dataHandler.cpp:48-50, which returns the
    earlier sample — quirk 5)."""
    u = jnp.asarray(u, dtype=q0.dtype)[..., None]
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(d, 0.0, 1.0 - 1e-7))
    sin_theta = jnp.sin(theta)
    near = d > 1.0 - 1e-6
    w0 = jnp.where(near, 1.0 - u, jnp.sin((1.0 - u) * theta) / sin_theta)
    w1 = jnp.where(near, u, jnp.sin(u * theta) / sin_theta)
    return quat_normalize(w0 * q0 + w1 * q1)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product matrix [v]_x (reference: lidarOptimization.cpp:142-152)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def so3_exp_quat(omega: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector -> quaternion with the reference's Taylor small-angle
    branch (lidarOptimization.cpp:111-123)."""
    theta_sq = jnp.sum(omega * omega, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS))
    half = 0.5 * theta
    small = theta_sq < 1e-14
    imag = jnp.where(
        small,
        0.5 - theta_sq / 48.0 + theta_sq * theta_sq / 3840.0,
        jnp.sin(half) / jnp.where(small, 1.0, theta),
    )
    real = jnp.cos(half)
    return jnp.concatenate([real, imag * omega], axis=-1)


def se3_exp(xi: jnp.ndarray):
    """se(3) exp map: xi=(omega, upsilon) -> (quat, trans).

    Mirrors getTransformFromSe3 (reference lidarOptimization.cpp:103-140):
    rotation via so3 exp, translation via the left Jacobian V * upsilon.
    """
    omega = xi[..., :3]
    upsilon = xi[..., 3:]
    q = so3_exp_quat(omega)
    theta_sq = jnp.sum(omega * omega, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS))
    small = theta_sq < 1e-14
    omega_hat = skew(omega)
    omega_hat2 = omega_hat @ omega_hat
    safe_theta = jnp.where(small, 1.0, theta)
    a = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / (safe_theta * safe_theta))
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (safe_theta - jnp.sin(theta)) / (safe_theta ** 3))
    eye = jnp.eye(3, dtype=xi.dtype)
    V = eye + a * omega_hat + b * omega_hat2
    t = jnp.einsum("...ij,...j->...i", V, upsilon)
    return q, t


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation vector."""
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1), _EPS))
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-7
    scale = jnp.where(small, 2.0 / jnp.maximum(w, 1e-7),
                      theta / jnp.where(small, 1.0, vn))
    return scale[..., None] * v


def se3_log(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(quat, trans) -> xi=(omega, upsilon), inverse of se3_exp."""
    omega = so3_log(q)
    theta_sq = jnp.sum(omega * omega, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS))
    small = theta_sq < 1e-14
    omega_hat = skew(omega)
    omega_hat2 = omega_hat @ omega_hat
    safe_theta = jnp.where(small, 1.0, theta)
    half = 0.5 * safe_theta
    # V^{-1} = I - 1/2 [w]x + (1/theta^2)(1 - theta cot(theta/2) / 2) [w]x^2
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / (safe_theta * safe_theta),
    )
    eye = jnp.eye(3, dtype=q.dtype)
    Vinv = eye - 0.5 * omega_hat + cot_term * omega_hat2
    upsilon = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([omega, upsilon], axis=-1)


# ---------------------------------------------------------------------------
# Pose-level ops (quat, trans) pairs
# ---------------------------------------------------------------------------

def pose_compose(qa, ta, qb, tb):
    """T_a * T_b."""
    return quat_mul(qa, qb), quat_rotate(qa, tb) + ta


def pose_inverse(q, t):
    qi = quat_conj(q)
    return qi, -quat_rotate(qi, t)


def pose_retract(q, t, xi):
    """Left-multiplicative update exp(xi) * T — the reference's
    PoseSE3Parameterization::Plus (lidarOptimization.cpp:77-92)."""
    dq, dt = se3_exp(xi)
    return quat_normalize(quat_mul(dq, q)), quat_rotate(dq, t) + dt


def pose_retract_right(q, t, xi):
    """Right-multiplicative (body-frame) update T * exp(xi).

    The engine's solvers use this instead of the reference's left/world
    perturbation: with left perturbation the rotation Jacobian scales with
    the world position (J_rot ~ [p_world]_x), so kilometres from the origin
    the 6x6 normal equations condition like |t|^4 and fall apart in f32.
    Body-frame perturbation bounds J_rot by the sensor range. Same optimum,
    different chart.
    """
    dq, dt = se3_exp(xi)
    return quat_normalize(quat_mul(q, dq)), quat_rotate(q, dt) + t


def transform_points(q, t, pts):
    """Apply pose to (..., 3) points (pointAssociateToMap,
    src/odomEstimationClass.cpp:126-135)."""
    return quat_rotate(q[..., None, :] if pts.ndim > q.ndim - 1 else q, pts) + t


def rotation_angle(q) -> jnp.ndarray:
    """|angle| of a unit quaternion (KeyFrameUpdate's AngleAxis angle,
    src/odomEstimationClass.cpp:331)."""
    w = jnp.abs(jnp.clip(q[..., 0], -1.0, 1.0))
    vn = jnp.sqrt(jnp.maximum(jnp.sum(q[..., 1:] ** 2, axis=-1), 0.0))
    return 2.0 * jnp.arctan2(vn, w)


def euler_to_quat(roll, pitch, yaw, order: str = "rpy") -> jnp.ndarray:
    """RPY -> quaternion.

    order="ryp" reproduces the reference's nonstandard roll*yaw*pitch
    multiply (euler2Quaternion, src/lidar.cpp:8-16); order="rpy" is the
    conventional yaw*pitch*roll (extrinsic XYZ).
    """
    def axis_quat(angle, axis):
        angle = jnp.asarray(angle, dtype=jnp.result_type(roll, pitch, yaw, 1.0))
        half = 0.5 * angle
        s = jnp.sin(half)
        vec = [jnp.cos(half)]
        for i in range(3):
            vec.append(s if i == axis else jnp.zeros_like(s))
        return jnp.stack(vec, axis=-1)

    r = axis_quat(roll, 0)
    p = axis_quat(pitch, 1)
    y = axis_quat(yaw, 2)
    if order == "ryp":
        return quat_mul(quat_mul(r, y), p)
    return quat_mul(quat_mul(y, p), r)

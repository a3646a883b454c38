"""Deskew: velocity compensation, IMU stream semantics, rotational deskew
round-trip on simulated rotating-sensor scans."""
import jax.numpy as jnp
import numpy as np

from floam_tpu.ops import deskew, se3
from floam_tpu.types import PointBatch, RingScan


def test_compensate_velocity():
    pts = jnp.asarray(np.zeros((4, 3)))
    t = jnp.asarray([0.0, 0.025, 0.05, -0.05])
    b = PointBatch(xyz=pts, mask=jnp.ones(4, bool), time=t)
    v = jnp.asarray([2.0, 0.0, -1.0])
    out = deskew.compensate_velocity(b, v)
    np.testing.assert_allclose(
        np.asarray(out.xyz),
        np.asarray(t)[:, None] * np.asarray(v)[None, :], atol=1e-12)


def test_center_time():
    times = np.array([0.0, 0.05, 0.1])
    stamp, new_times = deskew.center_time(10.0, times)
    assert abs(stamp - 10.05) < 1e-12
    np.testing.assert_allclose(new_times, [-0.05, 0.0, 0.05], atol=1e-12)
    # absolute times unchanged
    np.testing.assert_allclose(stamp + new_times, 10.0 + times, atol=1e-12)


def test_imu_stream_duplicate_rejection():
    s = deskew.ImuStream()
    assert s.add(0.0, [1, 0, 0, 0])
    assert not s.add(0.0, [1, 0, 0, 0])
    assert not s.add(0.000005, [1, 0, 0, 0])
    assert s.add(0.01, [1, 0, 0, 0])
    assert s.contains(0.005)
    assert not s.contains(0.02)


def test_imu_window_padding():
    s = deskew.ImuStream(window_capacity=8)
    for i in range(20):
        s.add(i * 0.01, [1.0, 0, 0, 0])
    st, q, n = s.window(0.05, 0.08)
    assert n >= 4  # covers [0.05, 0.08] plus bracketing samples
    assert np.isfinite(st[:n]).all() and np.isinf(st[n:]).all()
    assert st[0] <= 0.05 and st[n - 1] >= 0.08


def test_orientation_lookup_slerp_vs_nearest():
    stamps = np.array([0.0, 0.1, np.inf, np.inf])
    qs = np.stack([
        np.array([1.0, 0, 0, 0]),
        np.asarray(se3.so3_exp_quat(jnp.asarray([0.0, 0.0, 0.2]))),
    ] + [np.array([1.0, 0, 0, 0])] * 2)
    t = jnp.asarray([0.05])
    q_sl = deskew.orientation_at(t, jnp.asarray(stamps), jnp.asarray(qs),
                                 jnp.asarray(2), slerp=True)
    ang = float(se3.rotation_angle(q_sl)[0])
    assert abs(ang - 0.1) < 1e-9  # halfway
    q_nb = deskew.orientation_at(t, jnp.asarray(stamps), jnp.asarray(qs),
                                 jnp.asarray(2), slerp=False)
    assert float(se3.rotation_angle(q_nb)[0]) < 1e-12  # earlier sample


def test_rotational_deskew_undoes_rotation():
    """Simulate a sensor spinning at constant yaw rate: points measured at
    time t in the rotated frame; deskew must map them back into the
    scan-center frame (static world points become consistent)."""
    rng = np.random.default_rng(0)
    n = 128
    world_pts = rng.uniform(-10, 10, size=(n, 3))
    omega = np.array([0.0, 0.0, 0.5])  # rad/s yaw
    times = rng.uniform(-0.05, 0.05, size=n)
    t_scan = 100.0

    # sensor attitude at time t: R(t) = exp(omega * (t)) (world frame),
    # measured point = R(t)^T * p_world
    meas = np.empty_like(world_pts)
    for i in range(n):
        q = se3.so3_exp_quat(jnp.asarray(omega * times[i]))
        meas[i] = np.asarray(
            se3.quat_rotate(se3.quat_conj(q)[None], world_pts[i:i + 1]))[0]

    scan = RingScan(
        xyz=jnp.asarray(meas.reshape(1, n, 3)),
        intensity=jnp.zeros((1, n)),
        time=jnp.asarray(times.reshape(1, n)),
        mask=jnp.ones((1, n), bool),
    )
    # IMU samples: dense window of exact attitudes
    imu_t = np.linspace(-0.06, 0.06, 25) + t_scan
    imu_q = np.stack([
        np.asarray(se3.so3_exp_quat(jnp.asarray(omega * (t - t_scan))))
        for t in imu_t])
    W = 32
    stamps = np.full(W, np.inf)
    quats = np.tile([1.0, 0, 0, 0], (W, 1))
    stamps[:25] = imu_t
    quats[:25] = imu_q

    out, q_init = deskew.rotational_deskew(
        scan, jnp.asarray(t_scan), jnp.asarray(stamps), jnp.asarray(quats),
        jnp.asarray(25), jnp.asarray([1.0, 0, 0, 0]), slerp=True)
    # after deskew all points are in the scan-center attitude frame, which
    # here equals the world frame (R(0) = I)
    np.testing.assert_allclose(np.asarray(out.xyz)[0], world_pts, atol=1e-4)
    assert float(se3.rotation_angle(q_init)) < 1e-9

    # nearest-before mode (reference stub): coarser but same direction
    out_nb, _ = deskew.rotational_deskew(
        scan, jnp.asarray(t_scan), jnp.asarray(stamps), jnp.asarray(quats),
        jnp.asarray(25), jnp.asarray([1.0, 0, 0, 0]), slerp=False)
    err_nb = np.linalg.norm(np.asarray(out_nb.xyz)[0] - world_pts, axis=1)
    err_raw = np.linalg.norm(meas - world_pts, axis=1)
    assert np.mean(err_nb) < np.mean(err_raw)  # still reduces skew


def test_extrinsic_fold_in():
    """With extrinsic e, q_init = q(t_scan) * e and per-point rotation is
    e^-1 q(t_scan)^-1 q(t) e (Compensate, dataHandler.cpp:105-114)."""
    ext = se3.so3_exp_quat(jnp.asarray([0.0, 0.0, np.pi]))
    stamps = np.array([0.0, 1.0, np.inf, np.inf])
    qz = np.asarray(se3.so3_exp_quat(jnp.asarray([0.0, 0.0, 0.3])))
    quats = np.stack([np.array([1.0, 0, 0, 0]), qz,
                      np.array([1.0, 0, 0, 0]), np.array([1.0, 0, 0, 0])])
    pts = np.array([[1.0, 0.0, 0.0]])
    # query strictly after the second stamp: lower_bound lands past it and
    # nearest-before returns qz (at an exact stamp it returns the previous
    # sample, matching the reference's lower_bound + prev semantics)
    scan = RingScan(xyz=jnp.asarray(pts.reshape(1, 1, 3)),
                    intensity=jnp.zeros((1, 1)),
                    time=jnp.asarray([[1.5]]), mask=jnp.ones((1, 1), bool))
    out, q_init = deskew.rotational_deskew(
        scan, jnp.asarray(0.0), jnp.asarray(stamps), jnp.asarray(quats),
        jnp.asarray(2), ext, slerp=False)
    want_qdiff = se3.quat_mul(se3.quat_conj(ext),
                              se3.quat_mul(jnp.asarray(qz), ext))
    want = np.asarray(se3.quat_rotate(want_qdiff[None], jnp.asarray(pts)))
    np.testing.assert_allclose(np.asarray(out.xyz)[0], want, atol=1e-9)

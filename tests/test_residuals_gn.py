"""Residual kernels: closed-form eig/solve vs LAPACK, analytic Jacobians vs
autodiff, association geometry golden checks, GN convergence on synthetic
registration problems."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from floam_tpu.config import OdomConfig
from floam_tpu.ops import gauss_newton as gn
from floam_tpu.ops import residuals as R
from floam_tpu.ops import se3
from floam_tpu.types import Pose


def random_pose(rng, rot_scale=1.0, t_scale=1.0) -> Pose:
    xi = np.concatenate([rng.normal(0, rot_scale, 3), rng.normal(0, t_scale, 3)])
    q, t = se3.se3_exp(jnp.asarray(xi))
    return Pose(q=q, t=t)


def test_eigh3x3_matches_lapack(rng):
    X = rng.normal(size=(64, 5, 3))
    A = jnp.asarray(np.einsum("nki,nkj->nij", X, X))
    evals, v = R.eigh3x3_psd(A)
    evals = np.asarray(evals)
    want = np.linalg.eigvalsh(np.asarray(A))[:, ::-1]
    np.testing.assert_allclose(evals, want, rtol=1e-8, atol=1e-8)
    # principal eigenvector: A v = lam0 v
    Av = np.einsum("nij,nj->ni", np.asarray(A), np.asarray(v))
    np.testing.assert_allclose(Av, evals[:, :1] * np.asarray(v), atol=1e-6)


def test_solve3x3(rng):
    M = rng.normal(size=(32, 3, 3)) + 3 * np.eye(3)
    b = rng.normal(size=(32, 3))
    x, ok = R.solve3x3(jnp.asarray(M), jnp.asarray(b))
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.einsum("nij,nj->ni", M, np.asarray(x)), b,
                               atol=1e-9)


def _make_edge_factors(rng, n=16):
    pts = jnp.asarray(rng.normal(size=(n, 3)))
    pa = jnp.asarray(rng.normal(size=(n, 3)))
    pb = pa + jnp.asarray(rng.normal(size=(n, 3)))
    return R.EdgeFactors(point=pts, pa=pa, pb=pb, valid=jnp.ones(n, bool))


def _make_surf_factors(rng, n=16):
    pts = jnp.asarray(rng.normal(size=(n, 3)))
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    return R.SurfFactors(point=pts, normal=jnp.asarray(nrm),
                         offset=jnp.asarray(rng.normal(size=n)),
                         valid=jnp.ones(n, bool))


def test_edge_jacobian_vs_autodiff(rng):
    """The real version of the reference's disabled Ceres check_gradients."""
    pose = random_pose(rng)
    f = _make_edge_factors(rng)
    r, J = R.edge_residual_jacobian(pose.q, pose.t, f)

    def r_of_xi(xi):
        q2, t2 = se3.pose_retract_right(pose.q, pose.t, xi)
        return R.edge_residual_jacobian(q2, t2, f)[0]

    J_auto = jax.jacobian(r_of_xi)(jnp.zeros(6, jnp.float64))
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-8)


def test_surf_jacobian_vs_autodiff(rng):
    pose = random_pose(rng)
    f = _make_surf_factors(rng)
    r, J = R.surf_residual_jacobian(pose.q, pose.t, f)

    def r_of_xi(xi):
        q2, t2 = se3.pose_retract_right(pose.q, pose.t, xi)
        return R.surf_residual_jacobian(q2, t2, f)[0]

    J_auto = jax.jacobian(r_of_xi)(jnp.zeros(6, jnp.float64))
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_auto), atol=1e-8)


def test_edge_association_geometry(rng):
    """Points on a clean line -> valid factor with the line's direction."""
    d = np.array([1.0, 2.0, -0.5])
    d /= np.linalg.norm(d)
    c = np.array([5.0, -3.0, 1.0])
    offsets = np.linspace(-0.4, 0.4, 5)
    nn = c[None] + offsets[:, None] * d[None] + rng.normal(0, 1e-3, (5, 3))
    nn = jnp.asarray(nn[None])  # (1, 5, 3)
    d2 = jnp.asarray(np.sum((np.asarray(nn)[0] - c) ** 2, axis=-1)[None])
    f = R.edge_association(jnp.zeros((1, 3)), nn, d2, 1.0, 3.0, 0.1)
    assert bool(f.valid[0])
    line_dir = np.array(f.pa[0] - f.pb[0])
    line_dir = line_dir / np.linalg.norm(line_dir)
    assert abs(abs(np.dot(line_dir, d)) - 1.0) < 1e-4
    # isotropic cloud -> invalid
    nn_iso = jnp.asarray(rng.normal(0, 0.3, (1, 5, 3)) + c)
    f2 = R.edge_association(jnp.zeros((1, 3)), nn_iso,
                            jnp.full((1, 5), 0.5), 1.0, 3.0, 0.1)
    assert not bool(f2.valid[0])
    # far neighbors -> gated out
    f3 = R.edge_association(jnp.zeros((1, 3)), nn,
                            jnp.full((1, 5), 2.0), 1.0, 3.0, 0.1)
    assert not bool(f3.valid[0])


def test_surf_association_geometry(rng):
    n = np.array([0.0, 0.0, 1.0])
    h = 2.0  # plane z = 2
    pts = np.column_stack([rng.uniform(-1, 1, (5, 2)), np.full(5, h)])
    pts += rng.normal(0, 1e-4, (5, 3))
    f = R.surf_association(jnp.zeros((1, 3)), jnp.asarray(pts[None]),
                           jnp.full((1, 5), 0.2), 1.0, 0.2)
    assert bool(f.valid[0])
    got_n = np.asarray(f.normal[0])
    assert abs(abs(got_n @ n) - 1.0) < 1e-3
    # plane equation: n.p + d = 0 for plane points
    np.testing.assert_allclose(pts @ got_n + np.asarray(f.offset[0]), 0.0,
                               atol=1e-3)
    # non-planar -> invalid via fit tolerance
    bad = rng.normal(0, 1.0, (5, 3))
    f2 = R.surf_association(jnp.zeros((1, 3)), jnp.asarray(bad[None]),
                            jnp.full((1, 5), 0.2), 1.0, 0.2)
    assert not bool(f2.valid[0])


@pytest.mark.parametrize("loss", ["none", "huber", "cauchy"])
def test_gn_recovers_pose(rng, loss):
    """Synthetic registration: sample a world of 3 planes + 2 edges, build
    exact factors, perturb the pose, and check GN convergence."""
    true_pose = random_pose(rng, rot_scale=0.05, t_scale=0.3)

    # surf: points on 3 orthogonal planes (world frame)
    planes = [(np.array([0, 0, 1.0]), -1.0), (np.array([1.0, 0, 0]), -4.0),
              (np.array([0, 1.0, 0]), 2.0)]
    surf_pts, surf_n, surf_d = [], [], []
    for n, d in planes:
        for _ in range(30):
            p = rng.uniform(-5, 5, 3)
            p -= (n @ p + d) * n  # project to plane
            surf_pts.append(p)
            surf_n.append(n)
            surf_d.append(d)
    surf_pts_w = np.array(surf_pts)
    # edge: points on 2 lines
    lines = [(np.array([0.0, 0, 0]), np.array([0, 0, 1.0])),
             (np.array([3.0, 1, 0]), np.array([1.0, 0, 0]))]
    edge_pts, edge_a, edge_b = [], [], []
    for o, dvec in lines:
        for _ in range(20):
            s = rng.uniform(-3, 3)
            edge_pts.append(o + s * dvec)
            edge_a.append(o + (s + 0.1) * dvec)
            edge_b.append(o + (s - 0.1) * dvec)
    edge_pts_w = np.array(edge_pts)

    # sensor-frame observations: p_s = T^{ -1} p_w
    qi, ti = se3.pose_inverse(true_pose.q, true_pose.t)
    surf_s = np.asarray(se3.quat_rotate(qi[None], jnp.asarray(surf_pts_w)) + ti)
    edge_s = np.asarray(se3.quat_rotate(qi[None], jnp.asarray(edge_pts_w)) + ti)

    ef = R.EdgeFactors(point=jnp.asarray(edge_s), pa=jnp.asarray(edge_a),
                       pb=jnp.asarray(edge_b),
                       valid=jnp.ones(len(edge_s), bool))
    sf = R.SurfFactors(point=jnp.asarray(surf_s), normal=jnp.asarray(surf_n),
                       offset=jnp.asarray(np.array(surf_d)),
                       valid=jnp.ones(len(surf_s), bool))

    cfg = OdomConfig(loss=loss, inner_iters=10, damping=1e-9)
    init = Pose.identity(jnp.float64)
    est, stats = gn.solve_pose(init, ef, sf, cfg)
    dq = se3.quat_mul(se3.quat_conj(est.q), true_pose.q)
    assert float(se3.rotation_angle(dq)) < 1e-6
    np.testing.assert_allclose(np.asarray(est.t), np.asarray(true_pose.t),
                               atol=1e-6)


def test_gn_empty_problem_freezes_pose(rng):
    cfg = OdomConfig()
    pose = random_pose(rng)
    ef = R.EdgeFactors(point=jnp.zeros((8, 3)), pa=jnp.zeros((8, 3)),
                       pb=jnp.ones((8, 3)), valid=jnp.zeros(8, bool))
    sf = R.SurfFactors(point=jnp.zeros((8, 3)), normal=jnp.ones((8, 3)),
                       offset=jnp.zeros(8), valid=jnp.zeros(8, bool))
    est, stats = gn.solve_pose(pose, ef, sf, cfg)
    np.testing.assert_allclose(np.asarray(est.t), np.asarray(pose.t), atol=0)
    assert int(stats.num_edge) == 0 and int(stats.num_surf) == 0


def test_robust_weights():
    r = jnp.asarray([0.0, 0.05, 0.1, 1.0])
    w = np.asarray(R.robust_weight(r, "huber", 0.1, 0.2))
    np.testing.assert_allclose(w, [1.0, 1.0, 1.0, 0.1], atol=1e-6)
    w = np.asarray(R.robust_weight(r, "cauchy", 0.1, 0.2))
    np.testing.assert_allclose(w, 1.0 / (1.0 + (np.asarray(r) / 0.2) ** 2),
                               atol=1e-9)
    w = np.asarray(R.robust_weight(r, "none", 0.1, 0.2))
    np.testing.assert_allclose(w, 1.0)


def test_gn_nan_in_invalid_factors_does_not_poison(rng):
    """Invalid factor rows can hold non-finite garbage (overflowed plane
    fits from far-sentinel candidates when a query has < k real
    neighbors); the solve must still move the pose off a perfect
    constraint set. Regression: NaN * 0 weights froze whole outdoor runs."""
    true_pose = random_pose(rng, rot_scale=0.02, t_scale=0.05)
    n_w = np.array([[0.0, 0, 1], [1, 0, 0], [0, 1, 0]] * 8)
    d_w = rng.normal(0, 1.0, len(n_w))
    # sensor-frame points that lie exactly on the planes at true_pose
    pts_w = -n_w * d_w[:, None] + np.cross(n_w, rng.normal(size=(len(n_w), 3)))
    qi, ti = se3.pose_inverse(true_pose.q, true_pose.t)
    pts_s = np.asarray(se3.quat_rotate(qi[None], jnp.asarray(pts_w)) + ti)
    valid = np.ones(len(n_w), bool)
    # poison a few INVALID rows with NaN/inf payloads
    valid[::5] = False
    n_pois = n_w.copy()
    d_pois = d_w.copy()
    p_pois = pts_s.copy()
    n_pois[::5] = np.nan
    d_pois[::5] = np.inf
    p_pois[::5] = np.nan
    sf = R.SurfFactors(point=jnp.asarray(p_pois), normal=jnp.asarray(n_pois),
                       offset=jnp.asarray(d_pois), valid=jnp.asarray(valid))
    ef = R.EdgeFactors(point=jnp.full((4, 3), jnp.nan),
                       pa=jnp.full((4, 3), jnp.inf),
                       pb=jnp.full((4, 3), jnp.nan),
                       valid=jnp.zeros(4, bool))
    cfg = OdomConfig(loss="none", inner_iters=10, damping=1e-12)
    est, stats = gn.solve_pose(Pose.identity(jnp.float64), ef, sf, cfg)
    assert bool(jnp.all(jnp.isfinite(est.t))) and \
        bool(jnp.all(jnp.isfinite(est.q)))
    assert bool(jnp.isfinite(stats.cost))
    np.testing.assert_allclose(np.asarray(est.t), np.asarray(true_pose.t),
                               atol=1e-6)

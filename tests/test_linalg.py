"""Unrolled SPD solve vs numpy, in both dtypes and under vmap."""
import jax
import jax.numpy as jnp
import numpy as np

from floam_tpu.ops.linalg import solve_spd


def _spd(rng, n, dtype):
    A = rng.standard_normal((n, n))
    H = A @ A.T + n * np.eye(n)
    return H.astype(dtype)


def test_solve_spd_matches_numpy(rng):
    for dtype in (np.float32, np.float64):
        H = _spd(rng, 6, dtype)
        b = rng.standard_normal(6).astype(dtype)
        x = np.asarray(solve_spd(jnp.asarray(H), jnp.asarray(b)))
        ref = np.linalg.solve(H, b)
        tol = 1e-5 if dtype == np.float32 else 1e-12
        np.testing.assert_allclose(x, ref, rtol=tol, atol=tol)


def test_solve_spd_vmap(rng):
    Hs = np.stack([_spd(rng, 6, np.float64) for _ in range(4)])
    bs = rng.standard_normal((4, 6))
    xs = np.asarray(jax.vmap(solve_spd)(jnp.asarray(Hs), jnp.asarray(bs)))
    for i in range(4):
        np.testing.assert_allclose(xs[i], np.linalg.solve(Hs[i], bs[i]),
                                   rtol=1e-12, atol=1e-12)


def test_solve_spd_non_pd_is_nonfinite(rng):
    H = -np.eye(6)
    b = np.ones(6)
    x = np.asarray(solve_spd(jnp.asarray(H), jnp.asarray(b)))
    assert not np.all(np.isfinite(x))

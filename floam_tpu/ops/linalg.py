"""Tiny dense linear algebra in pure elementwise JAX ops.

XLA's LU/Cholesky custom calls are f32-only on TPU (LuDecomposition rejects
f64), and for 6x6 systems a compiler-visible unrolled factorization fuses
into the surrounding program instead of dispatching a library kernel. This
replaces the Ceres DENSE_QR solve of the reference
(src/odomEstimationClass.cpp:101) on the normal-equation path.

All functions work in any float dtype, compose with vmap/grad, and are
compile-time unrolled (intended for n <= ~12).
"""
from __future__ import annotations

import jax.numpy as jnp


def solve_spd(H: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve H x = b for symmetric positive-definite H ((n, n), n static)
    via unrolled Cholesky + two triangular substitutions.

    A non-PD H (degenerate geometry) yields NaN/inf in x — callers gate on
    finiteness exactly as they would after jnp.linalg.solve.
    """
    n = H.shape[-1]
    L = [[None] * n for _ in range(n)]
    inv_d = [None] * n
    for j in range(n):
        s = H[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(s)
        L[j][j] = d
        inv_d[j] = 1.0 / d
        for i in range(j + 1, n):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d[j]
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * inv_d[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s * inv_d[i]
    return jnp.stack(x, axis=-1)

"""Essential-matrix estimation on unit-sphere bearing vectors.

TPU-native counterpart of the reference's 2-view bootstrap math
(``src/processing/Initializer.cpp:458-697``):

- 8-point linear solve ``b2^T E b1 = 0`` with SVD null vector and
  rank-2 projection to singular values (s, s, 0), s = (s1+s2)/2,
- algebraic inlier test ``|b2^T E b1| < thresh``,
- decomposition into 4 (R, t) candidates via U W V^T / ±t.

The RANSAC loop itself lives in ``vio360_tpu.ops.ransac`` as a vmapped
hypothesis batch — here are only the batched per-hypothesis primitives.
All functions accept a leading hypothesis batch dim where noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def essential_constraint_rows(b1: jax.Array, b2: jax.Array) -> jax.Array:
    """[N,3],[N,3] -> [N,9] rows of the epipolar constraint matrix.

    Row layout matches row-major E: a = vec(b2 b1^T)
    (Initializer.cpp:505-517).
    """
    return (b2[:, :, None] * b1[:, None, :]).reshape(b1.shape[0], 9)


def solve_eight_point(b1: jax.Array, b2: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Least-squares essential matrix from N>=8 correspondences -> [3,3].

    Null vector of A (last right singular vector), then rank-2 projection
    (Initializer.cpp:521-539). Optional per-row weights (0/1 mask) allow
    a fixed-shape all-inlier refit without gathering.
    """
    a = essential_constraint_rows(b1, b2)
    if weights is not None:
        a = a * weights[:, None]
    # Direct SVD of A: better f32 conditioning than eigh(A^T A).
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    e = vt[8, :].reshape(3, 3)
    return enforce_rank2(e)


def enforce_rank2(e: jax.Array) -> jax.Array:
    """Project onto essential manifold: singular values -> (s, s, 0)."""
    u, s, vt = jnp.linalg.svd(e)
    sigma = 0.5 * (s[0] + s[1])
    return (u * jnp.array([sigma, sigma, 0.0], e.dtype)[None, :]) @ vt


def epipolar_errors(e: jax.Array, b1: jax.Array, b2: jax.Array) -> jax.Array:
    """|b2^T E b1| per correspondence; [N] (Initializer.cpp:550-556)."""
    return jnp.abs(jnp.sum(b2 * (b1 @ e.T), axis=-1))


def decompose_essential(e: jax.Array) -> tuple[jax.Array, jax.Array]:
    """E -> (Rs [4,3,3], ts [4,3]) candidate relative poses frame1->frame2.

    Candidates (R1,+t),(R1,-t),(R2,+t),(R2,-t) with det-sign fixes as in
    Initializer.cpp:625-671. Disambiguation is by reprojection voting in
    the initializer (no cheirality for ERP).
    """
    u, _, vt = jnp.linalg.svd(e)
    w = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], e.dtype)
    r1 = u @ w @ vt
    r2 = u @ w.T @ vt
    t = u[:, 2]

    d1 = jnp.linalg.det(r1)
    # Reference flips both R1 and t when det(R1)<0, and only R2 for det(R2)<0.
    t = jnp.where(d1 < 0, -t, t)
    r1 = jnp.where(d1 < 0, -r1, r1)
    d2 = jnp.linalg.det(r2)
    r2 = jnp.where(d2 < 0, -r2, r2)
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    rs = jnp.stack([r1, r1, r2, r2])
    ts = jnp.stack([t, -t, t, -t])
    return rs, ts


# Batched-over-hypotheses variants for RANSAC scoring.
solve_eight_point_b = jax.vmap(solve_eight_point)
epipolar_errors_b = jax.vmap(epipolar_errors, in_axes=(0, None, None))

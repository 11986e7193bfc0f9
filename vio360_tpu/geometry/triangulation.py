"""Two-view triangulation for bearing-vector (360°) observations.

Batched JAX counterparts of:

- mid-point triangulation over two rays via a 2x2 linear system, no
  cheirality check (reference ``Initializer.cpp:699-783``), used at
  bootstrap, and
- homogeneous DLT/SVD triangulation from two camera poses
  (reference ``Estimator.cpp:1082-1139``), used for new landmarks.

Both are fully vectorized over N point pairs and return a validity mask
instead of the reference's per-point early returns. ERP cameras see in
all directions, so (matching the reference) there is deliberately *no*
positive-depth check — validity is determinant/finite-ness only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate_midpoint(
    bearings1: jax.Array,  # [N, 3] unit rays in frame 1
    bearings2: jax.Array,  # [N, 3] unit rays in frame 2
    r_21: jax.Array,  # [3,3] rotation frame1 -> frame2
    t_21: jax.Array,  # [3] translation frame1 -> frame2
) -> tuple[jax.Array, jax.Array]:
    """Mid-point triangulation; returns (points3d [N,3] in frame 1, valid [N]).

    Solves per pair the 2x2 system for ray scales (Initializer.cpp:728-783):
      ray1: p = l1 * b1
      ray2: p = l2 * (R^T b2) + (-R^T t)
    """
    trans_12 = -(r_21.T @ t_21)  # frame2 origin in frame1
    b2_in_1 = bearings2 @ r_21  # == (R^T b2^T)^T

    d11 = jnp.sum(bearings1 * bearings1, axis=-1)
    d12 = jnp.sum(bearings1 * b2_in_1, axis=-1)
    d22 = jnp.sum(b2_in_1 * b2_in_1, axis=-1)
    b0 = bearings1 @ trans_12
    b1 = b2_in_1 @ trans_12

    # A = [[d11, -d12], [d12, -d22]]; det = -d11 d22 + d12^2
    det = d11 * (-d22) - (-d12) * d12
    valid = jnp.abs(det) >= 1e-10
    safe_det = jnp.where(valid, det, 1.0)
    # Cramer's rule
    l1 = (b0 * (-d22) - (-d12) * b1) / safe_det
    l2 = (d11 * b1 - d12 * b0) / safe_det

    pt1 = l1[:, None] * bearings1
    pt2 = l2[:, None] * b2_in_1 + trans_12
    points = 0.5 * (pt1 + pt2)
    valid = valid & jnp.all(jnp.isfinite(points), axis=-1)
    return jnp.where(valid[:, None], points, 0.0), valid


def triangulate_dlt(
    bearings1: jax.Array,  # [N, 3] rays in camera 1
    bearings2: jax.Array,  # [N, 3] rays in camera 2
    t1w: jax.Array,  # [3,4] or [4,4] world->cam1
    t2w: jax.Array,  # [3,4] or [4,4] world->cam2
) -> tuple[jax.Array, jax.Array]:
    """Homogeneous SVD triangulation; returns (points3d [N,3] world, valid [N]).

    Builds the standard 4x4 DLT system from the two bearing cross-product
    constraints (Estimator.cpp:1090-1106) and takes the null vector. The
    batched SVD maps onto XLA's batched linalg on TPU.
    """
    p1 = t1w[:3, :]  # [3,4]
    p2 = t2w[:3, :]

    def rows(b, p):
        r0 = b[:, 0:1] * p[2][None, :] - b[:, 2:3] * p[0][None, :]
        r1 = b[:, 1:2] * p[2][None, :] - b[:, 2:3] * p[1][None, :]
        return r0, r1

    a0, a1 = rows(bearings1, p1)
    a2, a3 = rows(bearings2, p2)
    a = jnp.stack([a0, a1, a2, a3], axis=-2)  # [N, 4, 4]

    # Null vector = right singular vector of smallest singular value.
    _, _, vt = jnp.linalg.svd(a)
    h = vt[:, 3, :]  # [N, 4]
    w = h[:, 3]
    valid = jnp.abs(w) >= 1e-10
    safe_w = jnp.where(valid, w, 1.0)
    points = h[:, :3] / safe_w[:, None]
    valid = valid & jnp.all(jnp.isfinite(points), axis=-1)
    return jnp.where(valid[:, None], points, 0.0), valid

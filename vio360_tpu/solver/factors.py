"""Reprojection factors: residuals + analytic Jacobians, fully batched.

Counterpart of the reference's Ceres cost functions ``PnPFactor`` /
``BAFactor`` (``src/optimization/Factors.cpp:22-662``):

- camera chain p_c = R_cb (R_bw p_w + t_bw) + t_cb with T_bw = T_wb^-1,
- ERP projection residual (obs - proj) with horizontal wrap of du to
  +-W/2 (Factors.cpp:100-106),
- right-perturbation pose Jacobian, twist order [rho, phi]:
  d r / d rho = J_pc (-R_cb),  d r / d phi = J_pc R_cb hat(p_b)
  (Factors.cpp:185-207), where J_pc = -d proj / d p_c,
- 2x3 landmark Jacobian J_pc R_cw (BAFactor),
- residuals with |du| or |dv| > 100 px are latched out (weight 0) to
  keep seam-crossing outliers from destabilizing the solve
  (Factors.cpp:110-125); chi2 is computed on the raw wrapped residual
  like compute_chi_square (Factors.cpp:214-268).

The whole window evaluates as one broadcasted computation over
[K keyframes, M landmarks]; information weighting is a scalar
1/sigma_px^2 (Optimizer.cpp:143: identity / noise^2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import camera as cam

MAX_PIXEL_ERROR = 100.0  # Factors.cpp:110


def transform_points(
    r_wb: jax.Array,  # [K, 3, 3]
    t_wb: jax.Array,  # [K, 3]
    r_cb: jax.Array,  # [3, 3] body->camera
    t_cb: jax.Array,  # [3]
    points_w: jax.Array,  # [M, 3]
) -> tuple[jax.Array, jax.Array]:
    """-> (p_b [K, M, 3] body-frame, p_c [K, M, 3] camera-frame)."""
    r_bw = jnp.swapaxes(r_wb, -1, -2)  # [K,3,3]
    diff = points_w[None, :, :] - t_wb[:, None, :]  # [K,M,3]
    p_b = jnp.einsum("kij,kmj->kmi", r_bw, diff)
    p_c = jnp.einsum("ij,kmj->kmi", r_cb, p_b) + t_cb
    return p_b, p_c


def reprojection_residual(
    p_c: jax.Array,  # [..., 3] camera-frame points
    obs_uv: jax.Array,  # [..., 2]
    width: float,
    height: float,
) -> jax.Array:
    """Wrapped pixel residual obs - proj, [..., 2]."""
    return cam.reprojection_residual(obs_uv, p_c, width, height)


def reprojection_jacobians(
    p_b: jax.Array,  # [..., 3]
    p_c: jax.Array,  # [..., 3]
    r_wb: jax.Array,  # [..., 3, 3] (broadcastable)
    r_cb: jax.Array,  # [3, 3]
    width: float,
    height: float,
) -> tuple[jax.Array, jax.Array]:
    """-> (J_pose [..., 2, 6], J_point [..., 2, 3]).

    J_pose columns are [d/d rho | d/d phi] for the right perturbation
    T_wb <- T_wb * exp([rho, phi]); J_point is w.r.t. the world point.
    """
    j_pc = -cam.projection_jacobian(p_c, width, height)  # [...,2,3] (residual sign)

    j_trans = jnp.einsum("...ij,jk->...ik", j_pc, -r_cb)  # [...,2,3]

    # hat(p_b) batched
    x, y, z = p_b[..., 0], p_b[..., 1], p_b[..., 2]
    zero = jnp.zeros_like(x)
    hat_pb = jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )  # [...,3,3]
    j_rot = jnp.einsum("...ij,jk,...kl->...il", j_pc, r_cb, hat_pb)
    j_pose = jnp.concatenate([j_trans, j_rot], axis=-1)  # [...,2,6]

    # J_point = J_pc R_cw = J_pc R_cb R_bw
    r_bw = jnp.swapaxes(r_wb, -1, -2)
    r_cw = jnp.einsum("ij,...jk->...ik", r_cb, r_bw)
    j_point = jnp.einsum("...ij,...jk->...ik", j_pc, r_cw)
    return j_pose, j_point


def chi2(residual: jax.Array, inv_sigma2: float | jax.Array) -> jax.Array:
    """r^T Info r with Info = I/sigma^2: [..., 2] -> [...]."""
    return jnp.sum(residual * residual, axis=-1) * inv_sigma2


def huber_weight(s: jax.Array, delta: float) -> jax.Array:
    """IRLS weight rho'(s) for Huber loss on squared norm s (Ceres form)."""
    return jnp.where(s <= delta * delta, 1.0, delta / jnp.sqrt(jnp.maximum(s, 1e-20)))


def robust_weights(
    residual: jax.Array,  # [..., 2]
    active: jax.Array,  # [...] bool (valid & not latched outlier)
    inv_sigma2: float | jax.Array,
    huber_delta: float,
) -> jax.Array:
    """Combined weight for the GN normal equations: [...].

    info * huber'(chi2), zeroed for inactive and >100 px residuals.
    """
    c2 = chi2(residual, inv_sigma2)
    w = huber_weight(c2, huber_delta) * inv_sigma2
    big = (jnp.abs(residual[..., 0]) > MAX_PIXEL_ERROR) | (
        jnp.abs(residual[..., 1]) > MAX_PIXEL_ERROR
    )
    return jnp.where(active & ~big, w, 0.0)

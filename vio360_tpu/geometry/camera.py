"""Equirectangular (ERP) camera model as pure, batched JAX functions.

Behavioral counterpart of the reference ``src/database/Camera.{h,cpp}``:

- camera frame: X-right, Y-down, Z-forward (Camera.cpp:22-47)
- ``pixel_to_bearing``: lon/lat -> unit vector (Camera.cpp:22-47)
- ``bearing_to_pixel``: theta = atan2(x, z), phi = -asin(y/|p|)
  (Camera.cpp:49-67)
- horizontal residual wrap to [-W/2, W/2] (Factors.cpp:100-106)
- polar-region and boundary predicates (Camera.cpp:120-139)
- analytic 2x3 Jacobian of the projection (Factors.cpp:151-207)

Unlike the reference's per-point scalar methods, every function here is
natively vectorized: pixel arrays are ``[..., 2]`` (u, v), points and
bearings ``[..., 3]``. Width/height are static Python numbers so shapes
stay static under jit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_TWO_PI = 2.0 * jnp.pi


@dataclasses.dataclass(frozen=True)
class ErpCamera:
    """Static ERP camera intrinsics (just the image size)."""

    width: int = 960
    height: int = 480
    polar_exclusion_ratio: float = 0.15
    boundary_margin: float = 20.0


def pixel_to_bearing(uv: jax.Array, width: float, height: float) -> jax.Array:
    """[..., 2] pixels -> [..., 3] unit bearing vectors."""
    u_norm = uv[..., 0] / width
    v_norm = uv[..., 1] / height
    lon = (u_norm - 0.5) * _TWO_PI
    lat = -(v_norm - 0.5) * jnp.pi
    cos_lat = jnp.cos(lat)
    bx = cos_lat * jnp.sin(lon)
    by = -jnp.sin(lat)
    bz = cos_lat * jnp.cos(lon)
    b = jnp.stack([bx, by, bz], axis=-1)
    return b / jnp.linalg.norm(b, axis=-1, keepdims=True)


def bearing_to_pixel(b: jax.Array, width: float, height: float) -> jax.Array:
    """[..., 3] bearings (any norm) -> [..., 2] pixels."""
    norm = jnp.linalg.norm(b, axis=-1)
    theta = jnp.arctan2(b[..., 0], b[..., 2])
    phi = -jnp.arcsin(jnp.clip(b[..., 1] / jnp.maximum(norm, 1e-12), -1.0, 1.0))
    u = width * (0.5 + theta / _TWO_PI)
    v = height * (0.5 - phi / jnp.pi)
    return jnp.stack([u, v], axis=-1)


def project(p_c: jax.Array, width: float, height: float) -> jax.Array:
    """Camera-frame 3D points [..., 3] -> pixels [..., 2] (Camera.cpp:69-75)."""
    return bearing_to_pixel(p_c, width, height)


def project_world(p_w: jax.Array, r_cw: jax.Array, t_cw: jax.Array, width, height) -> jax.Array:
    """World points [..., 3] through T_cw -> pixels (Camera.cpp:77-87)."""
    p_c = p_w @ r_cw.T + t_cw
    return project(p_c, width, height)


def wrap_residual_u(du: jax.Array, width: float) -> jax.Array:
    """Wrap horizontal pixel residual into [-W/2, W/2] (Factors.cpp:100-106).

    Uses a modulo formulation (equivalent to the reference's two-branch
    add/subtract for |du| < 1.5 W and exact for all du).
    """
    return du - width * jnp.round(du / width)


def wrap_pixel_u(u: jax.Array, width: float) -> jax.Array:
    """Wrap a pixel u-coordinate into [0, W) (Camera.cpp:125-132)."""
    return jnp.mod(u, width)


def reprojection_residual(obs_uv: jax.Array, p_c: jax.Array, width, height) -> jax.Array:
    """obs - project(p_c) with horizontal wrap; [..., 2]."""
    proj = project(p_c, width, height)
    d = obs_uv - proj
    du = wrap_residual_u(d[..., 0], width)
    return jnp.stack([du, d[..., 1]], axis=-1)


def angular_distance(b1: jax.Array, b2: jax.Array) -> jax.Array:
    """Angle between unit bearings [...,3] (Camera.cpp:89-98)."""
    c = jnp.clip(jnp.sum(b1 * b2, axis=-1), -1.0, 1.0)
    return jnp.arccos(c)


def is_in_polar_region(uv: jax.Array, height: float, threshold: float) -> jax.Array:
    """Bool [...,]: v within top/bottom `threshold` fraction (Camera.cpp:120-123)."""
    v_ratio = uv[..., 1] / height
    return (v_ratio < threshold) | (v_ratio > 1.0 - threshold)


def is_near_boundary(uv: jax.Array, width: float, height: float, margin: float) -> jax.Array:
    """Bool [...]: pixel within `margin` of any border (Camera.cpp:134-139)."""
    u, v = uv[..., 0], uv[..., 1]
    return (u < margin) | (u > width - margin) | (v < margin) | (v > height - margin)


def polar_mask(width: int, height: int, top_ratio: float, bottom_ratio: float | None = None) -> jax.Array:
    """[H, W] bool mask, False in the excluded polar rows (Camera.cpp:100-118)."""
    if bottom_ratio is None:
        bottom_ratio = top_ratio
    rows = jnp.arange(height)
    top_rows = int(height * top_ratio)
    bottom_start = int(height * (1.0 - bottom_ratio))
    row_ok = (rows >= top_rows) & (rows < bottom_start)
    return jnp.broadcast_to(row_ok[:, None], (height, width))


def projection_jacobian(p_c: jax.Array, width: float, height: float) -> jax.Array:
    """Analytic d(proj uv)/d(p_c): [..., 2, 3] (Factors.cpp:151-207).

    du/dx =  W/(2 pi) * z / (x^2+z^2)
    du/dz = -W/(2 pi) * x / (x^2+z^2)
    dv/dx = -H/pi * x y / (L^2 sqrt(x^2+z^2))
    dv/dy =  H/pi * sqrt(x^2+z^2) / L^2
    dv/dz = -H/pi * y z / (L^2 sqrt(x^2+z^2))

    Note this is the Jacobian of the *projection*; the residual
    (obs - proj) Jacobian is its negative.
    """
    x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
    xz_sq = x * x + z * z
    l_sq = x * x + y * y + z * z
    xz = jnp.sqrt(xz_sq)
    safe_xz_sq = jnp.maximum(xz_sq, 1e-12)
    safe_l_sq = jnp.maximum(l_sq, 1e-12)
    safe_xz = jnp.maximum(xz, 1e-12)

    cu = width / _TWO_PI
    cv = height / jnp.pi

    du_dx = cu * z / safe_xz_sq
    du_dy = jnp.zeros_like(x)
    du_dz = -cu * x / safe_xz_sq
    dv_dx = -cv * x * y / (safe_l_sq * safe_xz)
    dv_dy = cv * xz / safe_l_sq
    dv_dz = -cv * y * z / (safe_l_sq * safe_xz)

    row_u = jnp.stack([du_dx, du_dy, du_dz], axis=-1)
    row_v = jnp.stack([dv_dx, dv_dy, dv_dz], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)

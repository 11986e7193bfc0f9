"""Bilinear image sampling with ERP horizontal wrap.

The 360° image is periodic in u: samples past the left/right edge wrap
around the seam (the reference gets this implicitly by wrapping feature
coordinates, Camera.cpp:125-132); v is clamped. Used by the LK tracker
and the synthetic-scene renderer.

Gather-based: XLA lowers the advanced indexing to a gather, which the
TPU backend vectorizes; the Pallas LK kernel has its own in-VMEM
sampler for the hot path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Sample img [H, W] at uv [..., 2] (pixel coords) -> [...].

    Horizontal wrap (mod W), vertical clamp. Pixel centers at integer
    coordinates (OpenCV convention).
    """
    h, w = img.shape
    u = uv[..., 0]
    v = uv[..., 1]
    u0f = jnp.floor(u)
    v0f = jnp.floor(v)
    au = u - u0f
    av = v - v0f

    u0 = jnp.mod(u0f.astype(jnp.int32), w)
    u1 = jnp.mod(u0 + 1, w)
    v0 = jnp.clip(v0f.astype(jnp.int32), 0, h - 1)
    v1 = jnp.clip(v0 + 1, 0, h - 1)

    i00 = img[v0, u0]
    i01 = img[v0, u1]
    i10 = img[v1, u0]
    i11 = img[v1, u1]

    top = i00 * (1.0 - au) + i01 * au
    bot = i10 * (1.0 - au) + i11 * au
    return top * (1.0 - av) + bot * av


def in_bounds(uv: jax.Array, width: int, height: int, border: float = 0.0) -> jax.Array:
    """Valid-sample predicate: v within [border, H-1-border]; u always valid (wraps)."""
    v = uv[..., 1]
    return (v >= border) & (v <= height - 1.0 - border)


def patch_coords(center_uv: jax.Array, half: int) -> jax.Array:
    """Centers [..., 2] -> sample grid [..., (2h+1)*(2h+1), 2]."""
    r = jnp.arange(-half, half + 1, dtype=center_uv.dtype)
    dv, du = jnp.meshgrid(r, r, indexing="ij")
    offsets = jnp.stack([du.reshape(-1), dv.reshape(-1)], axis=-1)  # [P, 2]
    return center_uv[..., None, :] + offsets


def sample_patch(img: jax.Array, center_uv: jax.Array, half: int) -> jax.Array:
    """Bilinear patch of size (2h+1)^2 around center -> [..., P]."""
    return bilinear_sample(img, patch_coords(center_uv, half))

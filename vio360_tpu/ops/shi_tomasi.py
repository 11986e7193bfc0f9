"""Shi–Tomasi corner detection with max-pool NMS and top-K selection.

TPU-native counterpart of ``cv::goodFeaturesToTrack`` as used by the
reference detector (FeatureTracker.cpp:208-226): min-eigenvalue
response over a 3x3 structure tensor, quality-level threshold relative
to the global max, minimum-distance spacing, and an exclusion mask
(polar + boundary + existing features).

Design difference (documented deviation): OpenCV enforces min-distance
by greedy sequential suppression in response order; that is inherently
serial. Here spacing is enforced by (a) max-pool NMS with a window of
``min_distance`` and (b) rejection of candidates within min_distance of
existing features — fully parallel, deterministic, fixed-shape. The
feature *budget* and grid limiting still happen in the tracker.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pyramid import scharr_gradients
from ..utils.precision import jit as _pjit


def response_map(img: jax.Array, block_size: int = 3) -> jax.Array:
    """Min-eigenvalue response [H, W] of the 2x2 structure tensor."""
    ix, iy = scharr_gradients(img)
    ixx, ixy, iyy = ix * ix, ix * iy, iy * iy

    def box(a):
        # block_size box filter, wrap in u / clamp in v
        r = block_size // 2
        p = jnp.concatenate([a[:, -r:], a, a[:, :r]], axis=1)
        p = jnp.concatenate([jnp.repeat(p[:1], r, 0), p, jnp.repeat(p[-1:], r, 0)], axis=0)
        c = jnp.cumsum(jnp.cumsum(p, axis=0), axis=1)
        c = jnp.pad(c, ((1, 0), (1, 0)))
        h, w = a.shape
        k = block_size
        return (
            c[k : k + h, k : k + w]
            - c[0:h, k : k + w]
            - c[k : k + h, 0:w]
            + c[0:h, 0:w]
        )

    sxx, sxy, syy = box(ixx), box(ixy), box(iyy)
    half_tr = 0.5 * (sxx + syy)
    rad = jnp.sqrt(jnp.maximum(0.25 * (sxx - syy) ** 2 + sxy * sxy, 0.0))
    return half_tr - rad


def _maxpool_same(x: jax.Array, window: int) -> jax.Array:
    """Max-pool with SAME padding, wrap in u."""
    r = window // 2
    p = jnp.concatenate([x[:, -r:], x, x[:, :r]], axis=1)
    neg = jnp.finfo(x.dtype).min
    return jax.lax.reduce_window(
        p,
        neg,
        jax.lax.max,
        window_dimensions=(window, window),
        window_strides=(1, 1),
        padding=((r, r), (0, 0)),
    )


@functools.partial(_pjit, static_argnames=("max_new", "min_distance", "quality_level"))
def detect(
    img: jax.Array,
    allowed_mask: jax.Array,  # [H, W] bool: where detection is allowed
    existing_uv: jax.Array,  # [N, 2] current features (for spacing)
    existing_valid: jax.Array,  # [N] bool
    max_new: int,
    min_distance: float = 30.0,
    quality_level: float = 0.01,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (uv [max_new, 2], score [max_new], valid [max_new]).

    Candidates are local maxima of the Shi–Tomasi response inside
    ``allowed_mask``, above ``quality_level * max_response``, not within
    ``min_distance`` of any existing valid feature, ranked by response.
    """
    h, w = img.shape
    resp = response_map(img)
    resp = jnp.where(allowed_mask, resp, 0.0)

    window = int(2 * (min_distance // 2) + 1)
    peaks = (resp >= _maxpool_same(resp, window)) & (resp > 0)
    thresh = quality_level * jnp.max(resp)
    peaks &= resp > thresh

    score = jnp.where(peaks, resp, -1.0)
    flat_scores, flat_idx = jax.lax.top_k(score.reshape(-1), max_new)
    cand_v = (flat_idx // w).astype(jnp.float32)
    cand_u = (flat_idx % w).astype(jnp.float32)
    cand_uv = jnp.stack([cand_u, cand_v], axis=-1)
    cand_valid = flat_scores > 0

    #

    # Reject candidates within min_distance of existing valid features
    # (wrap-aware horizontal distance).
    du = jnp.abs(cand_uv[:, None, 0] - existing_uv[None, :, 0])
    du = jnp.minimum(du, w - du)
    dv = cand_uv[:, None, 1] - existing_uv[None, :, 1]
    d2 = du * du + dv * dv
    d2 = jnp.where(existing_valid[None, :], d2, jnp.inf)
    clear = jnp.min(d2, axis=1) >= min_distance * min_distance
    cand_valid &= clear

    return cand_uv, flat_scores, cand_valid

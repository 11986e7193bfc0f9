"""Gaussian image pyramid for pyramidal LK.

Counterpart of OpenCV's ``buildOpticalFlowPyramid``/``pyrDown`` used by
the reference tracker (FeatureTracker.cpp:238): 5-tap binomial blur
[1 4 6 4 1]/16 then 2x decimation. Horizontal convolution wraps around
the ERP seam; vertical is edge-clamped.

Implemented with separable depthwise convs so XLA fuses it into a few
TPU-friendly ops; static number of levels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_KERNEL = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _blur_h(img: jax.Array) -> jax.Array:
    # Wrap pad in u (ERP seam), then valid conv.
    pad = jnp.concatenate([img[:, -2:], img, img[:, :2]], axis=1)
    k = _KERNEL.astype(img.dtype)
    return (
        k[0] * pad[:, 0:-4]
        + k[1] * pad[:, 1:-3]
        + k[2] * pad[:, 2:-2]
        + k[3] * pad[:, 3:-1]
        + k[4] * pad[:, 4:]
    )


def _blur_v(img: jax.Array) -> jax.Array:
    pad = jnp.concatenate([img[:1], img[:1], img, img[-1:], img[-1:]], axis=0)
    k = _KERNEL.astype(img.dtype)
    return (
        k[0] * pad[0:-4]
        + k[1] * pad[1:-3]
        + k[2] * pad[2:-2]
        + k[3] * pad[3:-1]
        + k[4] * pad[4:]
    )


def pyr_down(img: jax.Array) -> jax.Array:
    """One pyramid level: blur then decimate by 2."""
    return _blur_v(_blur_h(img))[::2, ::2]


def build_pyramid(img: jax.Array, num_levels: int) -> list[jax.Array]:
    """[H, W] -> list of num_levels+1 images (level 0 = original).

    Matches OpenCV maxLevel semantics: maxLevel=3 gives 4 levels.
    """
    levels = [img]
    for _ in range(num_levels):
        levels.append(pyr_down(levels[-1]))
    return levels


# ---------------------------------------------------------------------------
# Banded-operator (matmul) formulation.
#
# Single-channel small-kernel convolutions and misaligned pads lower to
# slow data-formatting ops on TPU (measured ~5.6 ms for the LK prep at
# 960x480). The same separable blur / Scharr / pad / decimate operators
# are linear maps along one image axis, so each prepped array is exactly
#   out = L @ img @ R
# with L, R precomposed constant banded matrices — two MXU matmuls per
# output, no data formatting at all. Builders below return numpy f32
# (entries are dyadic rationals, hence exact).
# ---------------------------------------------------------------------------

import numpy as _np


def blur_decimate_matrix(n: int, wrap: bool) -> "_np.ndarray":
    """(ceil(n/2), n) operator: 5-tap binomial blur then 2x decimation.

    ``wrap`` selects ERP-seam wraparound (horizontal axis); otherwise
    edge-clamp (vertical axis) — matching ``_blur_h`` / ``_blur_v``.
    """
    k = _np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    m = _np.zeros((n, n))
    for t in range(-2, 3):
        for i in range(n):
            j = (i + t) % n if wrap else min(max(i + t, 0), n - 1)
            m[i, j] += k[t + 2]
    return m[::2].astype(_np.float32)


def smooth3_matrix(n: int, wrap: bool) -> "_np.ndarray":
    """(n, n) Scharr smoothing [3, 10, 3]/16 along one axis."""
    k = _np.array([3.0, 10.0, 3.0]) / 16.0
    m = _np.zeros((n, n))
    for t in range(-1, 2):
        for i in range(n):
            j = (i + t) % n if wrap else min(max(i + t, 0), n - 1)
            m[i, j] += k[t + 1]
    return m.astype(_np.float32)


def diff_matrix(n: int, wrap: bool) -> "_np.ndarray":
    """(n, n) central difference 0.5*(x[i+1] - x[i-1]) along one axis."""
    m = _np.zeros((n, n))
    for i in range(n):
        jp = (i + 1) % n if wrap else min(i + 1, n - 1)
        jm = (i - 1) % n if wrap else max(i - 1, 0)
        m[i, jp] += 0.5
        m[i, jm] -= 0.5
    return m.astype(_np.float32)


def pad_matrix(n_out: int, n: int, before: int, wrap: bool) -> "_np.ndarray":
    """(n_out, n) selection: row r reads src index (r - before), wrapped
    (horizontal seam) or clamped (vertical edge-replicate) while the
    content+band region lasts; rows past n + 2*before are zero (alignment
    margin, never used by the kernel)."""
    m = _np.zeros((n_out, n))
    for r in range(min(n_out, n + 2 * before)):
        s = r - before
        s = s % n if wrap else min(max(s, 0), n - 1)
        m[r, s] = 1.0
    return m.astype(_np.float32)


def wrap_pad_matrix(n_out: int, n: int) -> "_np.ndarray":
    """(n_out, n) selection: row r reads src (r mod n) — append-only
    horizontal wrap padding (ERP seam) to a 128-aligned width."""
    m = _np.zeros((n_out, n))
    for r in range(n_out):
        m[r, r % n] = 1.0
    return m.astype(_np.float32)


def scharr_gradients(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Scharr 3x3 x/y gradients (OpenCV LK uses Scharr-like deriv), wrap in u.

    Returns (Ix, Iy), same shape as img, scaled by 1/32 as OpenCV does.
    """
    p = jnp.concatenate([img[:, -1:], img, img[:, :1]], axis=1)
    p = jnp.concatenate([p[:1], p, p[-1:]], axis=0)
    # smooth kernel [3 10 3], diff kernel [-1 0 1]
    sm = jnp.array([3.0, 10.0, 3.0], img.dtype) / 16.0
    # Ix: smooth vertically, diff horizontally
    sv = sm[0] * p[0:-2] + sm[1] * p[1:-1] + sm[2] * p[2:]
    ix = 0.5 * (sv[:, 2:] - sv[:, 0:-2])
    # Iy: smooth horizontally, diff vertically
    sh = sm[0] * p[:, 0:-2] + sm[1] * p[:, 1:-1] + sm[2] * p[:, 2:]
    iy = 0.5 * (sh[2:] - sh[0:-2])
    return ix, iy

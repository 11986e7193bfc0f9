"""Batched pyramidal Lucas–Kanade optical flow.

TPU-native counterpart of ``cv::calcOpticalFlowPyrLK`` as used by the
reference tracker (FeatureTracker.cpp:228-251: 21x21 window, 3 pyramid
levels, 30 iterations, eps 0.01). Differences by design:

- all N features are tracked as one batched computation per pyramid
  level (vmap over features, lax.scan over iterations) instead of a
  per-feature serial loop — shapes are static, no data-dependent exit;
  convergence is handled by masking the update once |delta| < eps;
- sampling wraps horizontally across the ERP seam (the reference
  tracks on the raw image and loses features at the seam; SURVEY.md §7
  "hard parts" #4) — strictly more capable, and polar/boundary culling
  still happens in the tracker policy layer;
- template gradients use Scharr patches of the previous image, G is the
  classic 2x2 Gauss–Newton system per feature (standard forward-additive
  LK, same as OpenCV).

Returns updated positions, a status mask, and the mean absolute
residual per feature (OpenCV "err").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .pyramid import build_pyramid, scharr_gradients
from .sampling import bilinear_sample, patch_coords
from ..utils.precision import jit as _pjit


def _track_level(
    img_i: jax.Array,
    img_j: jax.Array,
    grad_ix: jax.Array,
    grad_iy: jax.Array,
    uv_i: jax.Array,  # [N, 2] feature positions in THIS level's coords
    uv_j: jax.Array,  # [N, 2] current guesses in this level's coords
    valid: jax.Array,  # [N]
    half_win: int,
    iters: int,
    eps: float,
    min_eig_threshold: float = 1.5e-9,  # OpenCV's 1e-4 rescaled to [0,1] intensities
) -> tuple[jax.Array, jax.Array]:
    """One pyramid level of LK for all features. Returns (uv_j, valid)."""
    h, wdt = img_i.shape
    coords = patch_coords(uv_i, half_win)  # [N, P, 2]
    t = bilinear_sample(img_i, coords)  # template [N, P]
    gx = bilinear_sample(grad_ix, coords)
    gy = bilinear_sample(grad_iy, coords)

    # 2x2 normal matrix per feature
    gxx = jnp.sum(gx * gx, axis=-1)
    gxy = jnp.sum(gx * gy, axis=-1)
    gyy = jnp.sum(gy * gy, axis=-1)
    det = gxx * gyy - gxy * gxy
    npix = float((2 * half_win + 1) ** 2)
    min_eig = 0.5 * (gxx + gyy - jnp.sqrt((gxx - gyy) ** 2 + 4.0 * gxy * gxy)) / npix
    ok_g = (min_eig > min_eig_threshold) & (det > 1e-12)
    safe_det = jnp.where(ok_g, det, 1.0)
    inv00 = gyy / safe_det
    inv01 = -gxy / safe_det
    inv11 = gxx / safe_det

    # Template center must be inside vertically (u wraps; the window
    # itself may clamp over the border, equivalent to OpenCV's border
    # replication on its padded pyramid levels).
    ok_t = (uv_i[:, 1] >= 0.0) & (uv_i[:, 1] <= h - 1.0)
    valid = valid & ok_g & ok_t

    def body(carry, _):
        uv, active = carry
        pc = patch_coords(uv, half_win)
        p = bilinear_sample(img_j, pc)  # [N, P]
        diff = p - t
        b0 = jnp.sum(diff * gx, axis=-1)
        b1 = jnp.sum(diff * gy, axis=-1)
        du = -(inv00 * b0 + inv01 * b1)
        dv = -(inv01 * b0 + inv11 * b1)
        delta = jnp.stack([du, dv], axis=-1)
        step = jnp.where(active[:, None], delta, 0.0)
        uv = uv + step
        active = active & (jnp.sum(delta * delta, axis=-1) >= eps * eps)
        return (uv, active), None

    (uv_j, _), _ = jax.lax.scan(body, (uv_j, valid), None, length=iters)

    # Tracked point must stay inside vertically.
    ok_j = (uv_j[:, 1] >= 0.0) & (uv_j[:, 1] <= h - 1.0)
    valid = valid & ok_j & jnp.all(jnp.isfinite(uv_j), axis=-1)
    return uv_j, valid


def resolve_backend(backend: str = "auto") -> str:
    """'auto' -> the Pallas VMEM kernel on TPU (XLA gathers are scalar-
    unit bound there, ~100x slower), pure-XLA everywhere else."""
    if backend == "auto":
        return "matmul" if jax.default_backend() == "tpu" else "xla"
    return backend


def track(
    img_prev: jax.Array,
    img_next: jax.Array,
    uv_prev: jax.Array,
    valid_in: jax.Array,
    uv_guess: jax.Array | None = None,
    num_levels: int = 3,
    half_win: int = 10,
    iters: int = 30,
    eps: float = 0.01,
    backend: str = "auto",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pyramidal LK for all features at once (backend dispatcher)."""
    resolved = resolve_backend(backend)
    if resolved == "matmul":
        from . import lk_matmul

        # Synchronized fixed-iteration ladder: 8 iterations with
        # convergence masking covers cv2's 30-with-eps-exit behavior
        # (convergence is quadratic; extra sync'd iterations are wasted
        # MXU work for already-converged features).
        return lk_matmul.track(
            img_prev, img_next, uv_prev, valid_in, uv_guess,
            num_levels=num_levels, half_win=half_win,
            iters=min(iters, 8), eps=eps,
        )
    if resolved == "pallas":
        from . import lk_pallas

        return lk_pallas.track(
            img_prev, img_next, uv_prev, valid_in, uv_guess,
            num_levels=num_levels, half_win=half_win, iters=iters, eps=eps,
        )
    return track_xla(
        img_prev, img_next, uv_prev, valid_in, uv_guess,
        num_levels=num_levels, half_win=half_win, iters=iters, eps=eps,
    )


@functools.partial(_pjit, static_argnames=("num_levels", "half_win", "iters", "eps"))
def track_xla(
    img_prev: jax.Array,  # [H, W] float32
    img_next: jax.Array,
    uv_prev: jax.Array,  # [N, 2] level-0 pixel coords
    valid_in: jax.Array,  # [N] bool
    uv_guess: jax.Array | None = None,
    num_levels: int = 3,
    half_win: int = 10,  # 21x21 window
    iters: int = 30,
    eps: float = 0.01,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pyramidal LK for all features at once.

    Returns (uv_next [N,2] with u wrapped into [0, W), status [N] bool,
    err [N] mean |I-J| over the window for diagnostics).
    """
    w = img_prev.shape[1]
    pyr_i = build_pyramid(img_prev, num_levels)
    pyr_j = build_pyramid(img_next, num_levels)
    grads = [scharr_gradients(im) for im in pyr_i]

    if uv_guess is None:
        uv_guess = uv_prev
    uv = uv_guess
    status = valid_in
    for lvl in range(num_levels, -1, -1):
        s = 1.0 / (2.0**lvl)
        uv_l, status = _track_level(
            pyr_i[lvl],
            pyr_j[lvl],
            grads[lvl][0],
            grads[lvl][1],
            uv_prev * s,
            uv * s,
            status,
            half_win,
            iters,
            eps,
        )
        uv = uv_l / s

    # Final error: mean |patch difference| at level 0.
    pc_i = patch_coords(uv_prev, half_win)
    pc_j = patch_coords(uv, half_win)
    err = jnp.mean(
        jnp.abs(bilinear_sample(img_next, pc_j) - bilinear_sample(img_prev, pc_i)), axis=-1
    )

    uv = uv.at[:, 0].set(jnp.mod(uv[:, 0], w))
    uv = jnp.where(status[:, None], uv, uv_prev)
    return uv, status, err

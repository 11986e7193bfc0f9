"""Batched RANSAC: rotation-only (tracking) and essential (init).

TPU-native counterparts of the reference's two sequential RANSAC loops:

- rotation-only outlier rejection on bearing vectors: sample 3, Kabsch
  SVD rotation, inliers by angular error < threshold
  (FeatureTracker.cpp:253-379, 1000 iters, 2°);
- 8-point essential RANSAC with |b2^T E b1| inlier test + all-inlier
  refit (Initializer.cpp:458-621, 200 iters, 0.1).

All hypotheses are scored in ONE fused batch (`vmap` over the
hypothesis axis) instead of a Python loop — [iters, N] error matrices
map onto the MXU/VPU (SURVEY.md §7 design stance). Sampling uses
jax.random with a caller-provided key; hypotheses drawing an invalid
feature (or coincidentally duplicated indices) score as degenerate
rather than being resampled, keeping shapes static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..geometry.essential import enforce_rank2, epipolar_errors, solve_eight_point
from ..utils.precision import jit as _pjit


def _sample_valid(key: jax.Array, valid: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Draw indices uniformly from the VALID entries (fixed-shape).

    Sampling over raw capacity would make most hypotheses degenerate
    whenever the valid density is low ((density)^8 survival for the
     8-point sampler); instead draw ranks into the compacted valid-index
    list. Duplicates remain possible and are filtered by the caller's
    degeneracy check.
    """
    n = valid.shape[0]
    valid_idx = jnp.nonzero(valid, size=n, fill_value=0)[0]
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    ranks = jax.random.randint(key, shape, 0, n_valid)
    return valid_idx[ranks]


def _kabsch_rotation(b1: jax.Array, b2: jax.Array) -> jax.Array:
    """Best rotation R with b2 ~= R b1 from paired unit vectors [S, 3]."""
    h = b1.T @ b2  # [3,3] correlation
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.linalg.det(vt.T @ u.T)
    s = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(d)
    return vt.T @ s @ u.T


@functools.partial(_pjit, static_argnames=("iterations",))
def rotation_ransac(
    key: jax.Array,
    bearings_prev: jax.Array,  # [N, 3]
    bearings_curr: jax.Array,  # [N, 3]
    valid: jax.Array,  # [N] bool
    threshold_rad: float | jax.Array = jnp.deg2rad(2.0),
    iterations: int = 1000,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (R_best [3,3], inlier_mask [N], num_inliers scalar).

    R maps prev-frame bearings onto curr-frame bearings. Features with
    valid=False are never inliers and never sampled into a winning
    hypothesis (hypotheses touching them are discarded).
    """
    n = bearings_prev.shape[0]
    idx = _sample_valid(key, valid, (iterations, 3))

    samp_ok = jnp.all(valid[idx], axis=-1)
    # Degenerate if two sampled indices coincide.
    samp_ok &= (idx[:, 0] != idx[:, 1]) & (idx[:, 0] != idx[:, 2]) & (idx[:, 1] != idx[:, 2])

    b1s = bearings_prev[idx]  # [I, 3, 3]
    b2s = bearings_curr[idx]
    rs = jax.vmap(_kabsch_rotation)(b1s, b2s)  # [I, 3, 3]

    # Angular error of every feature under every hypothesis: [I, N]
    rotated = jnp.einsum("kij,nj->kni", rs, bearings_prev)
    cosang = jnp.clip(jnp.sum(rotated * bearings_curr[None], axis=-1), -1.0, 1.0)
    ang = jnp.arccos(cosang)
    inl = (ang < threshold_rad) & valid[None, :]
    counts = jnp.where(samp_ok, jnp.sum(inl, axis=-1), -1)

    best = jnp.argmax(counts)
    return rs[best], inl[best], counts[best]


@functools.partial(_pjit, static_argnames=("iterations",))
def essential_ransac(
    key: jax.Array,
    bearings1: jax.Array,  # [N, 3]
    bearings2: jax.Array,  # [N, 3]
    valid: jax.Array,  # [N] bool
    threshold: float | jax.Array = 0.1,
    iterations: int = 200,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (E [3,3] refit on best inliers, inlier_mask [N], num_inliers).

    Mirrors Initializer.cpp:458-621 including the final all-inlier
    refit + rank-2 re-projection; the refit uses a 0/1 weight vector so
    the shape stays [N, 9].
    """
    n = bearings1.shape[0]
    idx = _sample_valid(key, valid, (iterations, 8))
    samp_ok = jnp.all(valid[idx], axis=-1)
    # Pairwise-distinct check over the 8 samples.
    pair_eq = idx[:, :, None] == idx[:, None, :]
    dup = jnp.sum(pair_eq, axis=(1, 2)) > 8  # diagonal contributes 8
    samp_ok &= ~dup

    e_hyp = jax.vmap(solve_eight_point)(bearings1[idx], bearings2[idx])  # [I,3,3]
    errs = jax.vmap(epipolar_errors, in_axes=(0, None, None))(e_hyp, bearings1, bearings2)
    inl = (errs < threshold) & valid[None, :]
    counts = jnp.where(samp_ok, jnp.sum(inl, axis=-1), -1)

    best = jnp.argmax(counts)
    best_mask = inl[best]
    e_refit = solve_eight_point(bearings1, bearings2, weights=best_mask.astype(bearings1.dtype))
    e_refit = enforce_rank2(e_refit)
    return e_refit, best_mask, counts[best]

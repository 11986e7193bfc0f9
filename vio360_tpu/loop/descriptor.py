"""ERP-native place recognition primitives.

No reference counterpart: the reference has no loop closure or
relocalization of any kind (``src/processing/Estimator.cpp`` — no
reloc/loop path; SURVEY.md §5 "no relocalization, no loop closure").
This module supplies the retrieval half of the capability the sliding
window cannot provide: recognizing a previously-visited place after
the map forgot it.

TPU-first design:

- **Ring descriptor**: a 360° ERP image wraps horizontally, so a yaw
  rotation of the camera is (approximately, for yaw-dominant motion) a
  CIRCULAR SHIFT in longitude. Pooling the image into latitude bands x
  longitude bins (plus a gradient-energy channel) gives a descriptor
  whose similarity under unknown yaw is a circular cross-correlation —
  evaluated for ALL shifts at once as one [N, 2BL] x [2BL, L] matmul
  (MXU work, no FFT precision caveats). Per-band normalization makes
  the score exposure/vignette-invariant (same nuisance family as the
  tracker's row-gain compensation).
- **Patch descriptors**: 8x8 bilinear patches around tracked features,
  zero-mean/unit-norm so matching is NCC via ONE [C,P]x[P,C] matmul.
  The reference's front end is pure KLT and carries no descriptors at
  all; patches are what make correspondence across a multi-hundred-
  frame gap possible.

Everything is fixed-shape and traceable; the whole
ingest+retrieve+match+verify step fuses into one program
(loop/closure.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.precision import jit as _pjit


def ring_descriptor(image: jax.Array, bands: int, bins: int) -> jax.Array:
    """[H,W] ERP intensity image -> [2, bands, bins] descriptor.

    Channel 0: band-normalized mean intensity per (latitude band,
    longitude bin). Channel 1: same pooling of horizontal gradient
    magnitude (wrap-correct). Each (channel, band) row is zero-mean,
    and the whole descriptor is L2-normalized, so a full circular
    correlation against another descriptor lies in [-1, 1].

    The pooled grid is SMOOTHED (circular along longitude, clamped
    along latitude) before normalization: raw cell means of fine
    texture decorrelate within a fraction of a bin of camera motion
    (measured on the revisit benchmark: adjacent frames scored 0.24
    unsmoothed, 0.43 smoothed), and retrieval must tolerate the
    sub-bin shifts + modest pitch/roll a real revisit has.
    """
    h, w = image.shape
    assert h % bands == 0 and w % bins == 0, (h, w, bands, bins)
    gx = jnp.roll(image, -1, axis=1) - jnp.roll(image, 1, axis=1)

    def pool(img):
        return img.reshape(bands, h // bands, bins, w // bins).mean((1, 3))

    d = jnp.stack([pool(image), pool(jnp.abs(gx))])  # [2,B,L]
    for _ in range(4):  # [1,2,1]/4 passes, circular in longitude
        d = 0.5 * d + 0.25 * (jnp.roll(d, 1, axis=2) + jnp.roll(d, -1, axis=2))
    for _ in range(2):  # same along latitude, edge-clamped
        pad = jnp.concatenate([d[:, :1], d, d[:, -1:]], axis=1)
        d = 0.5 * d + 0.25 * (pad[:, :-2] + pad[:, 2:])
    # per-(channel,band) zero mean: kills exposure offset per latitude
    d = d - d.mean(axis=2, keepdims=True)
    # per-(channel,band) unit scale: kills gain/vignette per latitude;
    # bands with no structure (uniform sky) contribute ~zero signal but
    # must not blow up -> epsilon floor.
    d = d / (jnp.linalg.norm(d, axis=2, keepdims=True) + 1e-6)
    return d / jnp.sqrt(jnp.asarray(2.0 * bands, jnp.float32))


def score_all_shifts(desc_q: jax.Array, desc_db: jax.Array) -> tuple:
    """Circular-correlation retrieval scores.

    desc_q [2,B,L], desc_db [N,2,B,L] -> (scores [N], shifts [N]):
    the best correlation over all L longitude shifts and the shift
    achieving it (the relative-yaw estimate in bins).
    """
    n = desc_db.shape[0]
    l = desc_q.shape[-1]
    shifted = jnp.stack(
        [jnp.roll(desc_q, s, axis=-1) for s in range(l)]
    )  # [L, 2, B, L]
    flat_db = desc_db.reshape(n, -1)
    flat_q = shifted.reshape(l, -1)
    corr = flat_db @ flat_q.T  # [N, L]
    return jnp.max(corr, axis=1), jnp.argmax(corr, axis=1).astype(jnp.int32)


def extract_patches(
    image: jax.Array,  # [H,W]
    uv: jax.Array,  # [C,2] pixel coords
    valid: jax.Array,  # [C] bool
    size: int,
    levels: int = 0,
) -> jax.Array:
    """[C, size*size] zero-mean unit-norm bilinear patches (horizontal
    wrap, vertical clamp — ERP boundary semantics as in ops/lk.py).
    Invalid slots return zero rows (NCC with anything = 0).

    ``levels`` pyramid-downsamples the image first (ops/pyramid.py
    blur+decimate) and scales uv to match: full-resolution patches on
    fine texture decorrelate within ~1 px of viewpoint change
    (measured on the revisit benchmark: 6/280 grid matches at level 0
    vs 65-92/280 at level 2 across a 0.3-0.6 m baseline), so loop
    matching needs the coarse scale; PnP chi2 then arbitrates identity
    using the full-resolution feature coordinates.
    """
    if levels:
        from ..ops import pyramid

        for _ in range(levels):
            image = pyramid.pyr_down(image)
        uv = uv / float(2 ** levels)
    h, w = image.shape
    off = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    ys = uv[:, 1, None, None] + off[None, :, None]  # [C,s,1]
    xs = uv[:, 0, None, None] + off[None, None, :]  # [C,1,s]
    ys = jnp.broadcast_to(ys, (uv.shape[0], size, size))
    xs = jnp.broadcast_to(xs, (uv.shape[0], size, size))

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0

    def sample(yi, xi):
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.mod(xi, w).astype(jnp.int32)  # horizontal wrap
        return image[yi, xi]

    p = (
        sample(y0, x0) * (1 - fy) * (1 - fx)
        + sample(y0, x0 + 1) * (1 - fy) * fx
        + sample(y0 + 1, x0) * fy * (1 - fx)
        + sample(y0 + 1, x0 + 1) * fy * fx
    ).reshape(uv.shape[0], size * size)
    p = p - p.mean(axis=1, keepdims=True)
    p = p / (jnp.linalg.norm(p, axis=1, keepdims=True) + 1e-6)
    return jnp.where(valid[:, None], p, 0.0)


def match_patches(
    pq: jax.Array,  # [C,P] query patches (current frame)
    vq: jax.Array,  # [C] bool
    pc: jax.Array,  # [C,P] candidate patches (database entry)
    vc: jax.Array,  # [C] bool
    min_ncc: float,
    min_margin: float,
) -> tuple:
    """Mutual-nearest NCC matching: (match_idx [C] into candidate slots
    or -1, score [C]). One [C,C] matmul + row/col argmax — no loops."""
    s = pq @ pc.T  # [C,C] NCC in [-1,1]
    neg = jnp.asarray(-2.0, s.dtype)
    s = jnp.where(vq[:, None] & vc[None, :], s, neg)
    best_j = jnp.argmax(s, axis=1).astype(jnp.int32)  # [C]
    s1 = jnp.max(s, axis=1)
    # second best for the margin test
    s_wo = s.at[jnp.arange(s.shape[0]), best_j].set(neg)
    s2 = jnp.max(s_wo, axis=1)
    # mutual: the candidate's best query is this row
    best_i_of_j = jnp.argmax(s, axis=0).astype(jnp.int32)  # [C]
    mutual = best_i_of_j[best_j] == jnp.arange(s.shape[0], dtype=jnp.int32)
    accept = vq & (s1 >= min_ncc) & (s1 - s2 >= min_margin) & mutual
    return jnp.where(accept, best_j, -1), s1


@functools.partial(_pjit, static_argnames=("bands", "bins", "size"))
def describe_frame(image, uv, valid, bands: int, bins: int, size: int):
    """Convenience: (ring descriptor, patches) in one dispatch."""
    return (
        ring_descriptor(image, bands, bins),
        extract_patches(image, uv, valid, size),
    )

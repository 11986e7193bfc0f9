"""Matmul-gather pyramidal Lucas–Kanade — fully vectorized, no Pallas.

Production LK path on the tunneled TPU. Rationale (measured, see also
the repo survey notes): once any device->host transfer has happened in
a process, Pallas kernel SCALAR/loop operations run ~50x slower
(~1 us per loop step), so any per-feature sequential kernel structure
costs ~milliseconds at 1024 features. Pure-XLA vector/MXU work is
unaffected. This module therefore expresses LK entirely as batched
einsums and elementwise math:

- patch EXTRACTION is a separable one-hot gather: for each feature an
  integer (G x G) neighbourhood is img contracted with row/col
  selection matrices (built from iota comparisons, bf16), i.e. two MXU
  matmuls — the TPU-native replacement for per-feature dynamic slices;
- the template's Scharr gradients and bilinear sub-pixel blend are
  elementwise ops on the [N, G, G] patches (linear ops commute with
  the blend, so this equals sampling gradient images);
- the LK iteration ladder runs a FIXED number of synchronized
  iterations (lax.scan) for all features, each sampling a 22x22 window
  from the feature's CACHED search patch via two batched small einsums
  with fractional-weight matrices; converged features are frozen by
  masking (cv::calcOpticalFlowPyrLK semantics with eps=0.01; the
  reference's data-dependent 30-iteration exit is replaced by a fixed
  iteration budget, which matches its results to sub-0.05 px on tracked
  features since convergence is quadratic).
- positions that drift outside the cached search radius fail (status
  false) — the radius matches the LK window half-size, beyond which the
  estimate is unreliable anyway.

Same contract as ops/lk.py::track. Horizontal ERP seam wrap is exact
(column indices are taken mod W); vertical is edge-clamped.

Cited behavior: cv::calcOpticalFlowPyrLK defaults as used by the
reference tracker (FeatureTracker.cpp:228-251).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import pyramid as pyr
from ..utils.precision import jit as _pjit

# Search patch: template window (2*half+1) + drift margin on each side.
_DRIFT = 6  # px per level beyond the initial guess

# Pyramid-operator matmul precision. Measured on the tunneled v5e:
# HIGH/DEFAULT shift tracked positions by up to 0.49/0.56 px vs HIGHEST
# (the composed blur operators feed template gradients, where bf16
# rounding is NOT hidden by the gathers' own bf16 cast) while saving
# nothing end-to-end — the pyramid matmuls overlap other work. Keep the
# 6-pass f32-equivalent product.
_PYR_PRECISION = jax.lax.Precision.HIGHEST


def _row_selectors(v0: jax.Array, g: int, h: int) -> jax.Array:
    """[N] integer top rows -> [N, g, h] one-hot row selectors (clamped)."""
    rows = jnp.clip(v0[:, None] + jnp.arange(g)[None, :], 0, h - 1)  # [N, g]
    io = jnp.arange(h)[None, None, :]
    return (io == rows[:, :, None]).astype(jnp.bfloat16)


def pad_blocks(w: int) -> int:
    """128-aligned padded width covering any length-64 window starting
    in [0, w): enough whole blocks that block b+1 always exists."""
    return 128 * ((w - 1) // 128 + 2)


def _gather_int_patches(
    img_pad: jax.Array, v0: jax.Array, u0: jax.Array, g: int, w: int
) -> jax.Array:
    """[N] integer corners (u0 already wrapped into [0, w)) -> [N, g, g]
    f32 patches. Three stages, sized for the TPU:
    1. row gather: one BIG MXU matmul with stacked one-hot selectors;
    2. block select: the two 128-col blocks containing the window
       (cheap einsum over the block axis — avoids the O(W) per-feature
       column reduction that lowers to a VPU multiply-reduce);
    3. column selection within the 256-col window (small einsum).
    The image is pre-padded to a whole number of 128 blocks with
    wrap-around content so stage 2 indices never wrap.

    All intermediates bf16: every stage is a one-hot SELECTION of
    values already bf16-quantized at the image cast, so bf16 storage
    is lossless here and halves the dominant HBM traffic (the [N, g,
    WP] rows array is ~100 MB at level 0 in f32). int8 with int32
    accumulators was measured SLOWER (4.96 vs 3.79 ms end-to-end):
    the s32 einsum outputs materialize at 4 bytes before the s8 cast,
    doubling the very traffic the quantization was meant to halve."""
    h, wp = img_pad.shape
    nb = wp // 128
    rw = _row_selectors(v0, g, h)
    rows = jnp.einsum(
        "fgh,hw->fgw", rw, img_pad.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )  # [N, g, WP]
    n = rows.shape[0]
    rows = rows.reshape(n, g, nb, 128)
    b = u0 // 128  # [N], b+1 <= nb-1 by construction of wp
    iob = jnp.arange(nb)[None, :]
    win = jnp.concatenate(
        [
            jnp.einsum(
                "fgbc,fb->fgc", rows, (iob == b[:, None]).astype(jnp.bfloat16),
                preferred_element_type=jnp.bfloat16,
            ),
            jnp.einsum(
                "fgbc,fb->fgc", rows, (iob == b[:, None] + 1).astype(jnp.bfloat16),
                preferred_element_type=jnp.bfloat16,
            ),
        ],
        axis=-1,
    )  # [N, g, 256]
    off = u0 - b * 128  # [0, 127]
    ioc = jnp.arange(256)[None, None, :]
    cw = (ioc == (off[:, None, None] + jnp.arange(g)[None, :, None])).astype(
        jnp.bfloat16
    )  # [N, g, 256]
    return jnp.einsum(
        "fgc,frc->fgr", win, cw,
        preferred_element_type=jnp.float32,
    )  # [N, g, g]


def _blend(patch: jax.Array, au: jax.Array, av: jax.Array) -> jax.Array:
    """[N, g, g] integer patch -> [N, g-1, g-1] at fractional offset."""
    tl = patch[:, :-1, :-1]
    tr = patch[:, :-1, 1:]
    bl = patch[:, 1:, :-1]
    br = patch[:, 1:, 1:]
    au = au[:, None, None]
    av = av[:, None, None]
    top = tl * (1.0 - au) + tr * au
    bot = bl * (1.0 - au) + br * au
    return top * (1.0 - av) + bot * av


def _frac_weights(x: jax.Array, p: int, g: int) -> jax.Array:
    """Per-feature fractional positions [N] -> [N, p, g] bilinear row
    weights for sampling a p-length window from a g-length patch axis:
    weight[f, r, c] = max(0, 1 - |x[f] + r - c|)."""
    r = jnp.arange(p)[None, :, None]
    c = jnp.arange(g)[None, None, :]
    d = jnp.abs(x[:, None, None] + r - c)
    return jnp.maximum(0.0, 1.0 - d)


def _sample_in_patch(patch: jax.Array, lu: jax.Array, lv: jax.Array, p: int) -> jax.Array:
    """Sample [N, p, p] windows at patch-local fractional origin
    (lu, lv) from [N, g, g] patches: two batched small einsums.

    Precision: unlike the gather stages (one-hot SELECTION, where bf16
    is lossless), these weights are a bilinear BLEND — bf16 weights
    shift the effective sample position and bf16 accumulation of the
    first einsum re-quantizes the blended intermediate every LK
    iteration, which was measured to move tracked positions by up to
    0.154 px (3x the 0.05 px equivalence bound vs track_xla). Weights
    and accumulation therefore stay f32.
    """
    g = patch.shape[1]
    wv = _frac_weights(lv, p, g)  # [N, p, g] f32
    wu = _frac_weights(lu, p, g)  # [N, p, g] f32
    rows = jnp.einsum(
        "fpg,fgr->fpr", wv, patch, preferred_element_type=jnp.float32
    )  # [N, p, g]
    return jnp.einsum(
        "fpr,fqr->fpq", rows, wu, preferred_element_type=jnp.float32
    )  # [N, p, p]


def _track_level(
    img_i: jax.Array,  # [H, WP] wrap-padded to whole 128-blocks
    img_j: jax.Array,
    w: int,  # ORIGINAL level width
    uv_i: jax.Array,  # [N, 2] template positions in THIS level's coords
    uv_j: jax.Array,  # [N, 2] current guesses
    valid: jax.Array,  # [N]
    half_win: int,
    iters: int,
    eps: float,
    min_eig_threshold: float,
    drift: int = _DRIFT,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    h = img_i.shape[0]
    p = 2 * half_win + 1
    npix = float(p * p)

    # ---- template: ONE integer (p+3)^2 gather -> scharr -> blend ----
    u_t = uv_i[:, 0]
    v_t = uv_i[:, 1]
    ok_in = valid & (v_t >= 0.0) & (v_t <= h - 1.0)
    v0f = jnp.floor(v_t - half_win)
    u0f = jnp.floor(u_t - half_win)
    au = u_t - half_win - u0f
    av = v_t - half_win - v0f
    ext = _gather_int_patches(
        img_i,
        v0f.astype(jnp.int32) - 1,
        jnp.mod(u0f.astype(jnp.int32) - 1, w),
        p + 3,
        w,
    )  # [N, p+3, p+3]; ext[f, r, c] = img[v0-1+r, u0-1+c]
    t_int = ext[:, 1 : p + 2, 1 : p + 2]
    sve = (
        3.0 * ext[:, : p + 1, :] + 10.0 * ext[:, 1 : p + 2, :]
        + 3.0 * ext[:, 2 : p + 3, :]
    ) * (1.0 / 16.0)
    gx_int = 0.5 * (sve[:, :, 2 : p + 3] - sve[:, :, : p + 1])
    she = (
        3.0 * ext[:, :, : p + 1] + 10.0 * ext[:, :, 1 : p + 2]
        + 3.0 * ext[:, :, 2 : p + 3]
    ) * (1.0 / 16.0)
    gy_int = 0.5 * (she[:, 2 : p + 3, :] - she[:, : p + 1, :])
    t_pat = _blend(t_int, au, av)  # [N, p, p]
    gx_pat = _blend(gx_int, au, av)
    gy_pat = _blend(gy_int, au, av)

    gxx = jnp.sum(gx_pat * gx_pat, axis=(1, 2))
    gxy = jnp.sum(gx_pat * gy_pat, axis=(1, 2))
    gyy = jnp.sum(gy_pat * gy_pat, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    min_eig = 0.5 * (gxx + gyy - jnp.sqrt((gxx - gyy) ** 2 + 4.0 * gxy * gxy)) / npix
    ok_g = (min_eig > min_eig_threshold) & (det > 1e-12)
    inv_det = 1.0 / jnp.where(ok_g, det, 1.0)

    # ---- moving image: ONE cached search patch per feature ----
    g = p + 2 * drift + 1  # integer patch length covering drift + blend
    cu = jnp.floor(uv_j[:, 0] - half_win) - drift
    cv = jnp.floor(uv_j[:, 1] - half_win) - drift
    jpatch = _gather_int_patches(
        img_j, cv.astype(jnp.int32), jnp.mod(cu.astype(jnp.int32), w), g, w
    )  # [N, g, g]

    # ---- synchronized iteration ladder on the cached patches ----
    # while_loop with an all-converged early exit instead of a fixed
    # scan: updates are masked by `active`, so once every feature is
    # frozen the remaining iterations are the identity — skipping them
    # is exact, and typical frames converge in 3-5 of the 8 budgeted
    # iterations per level.
    def cond(carry):
        u, v, active, it = carry
        return (it < iters) & jnp.any(active)

    def step(carry):
        u, v, active, it = carry
        lu = u - half_win - cu  # patch-local window origin
        lv = v - half_win - cv
        inb = (lu >= 0.0) & (lu <= g - p - 1.0) & (lv >= 0.0) & (lv <= g - p - 1.0)
        j_pat = _sample_in_patch(jpatch, lu, lv, p)
        diff = j_pat - t_pat
        b0 = jnp.sum(diff * gx_pat, axis=(1, 2))
        b1 = jnp.sum(diff * gy_pat, axis=(1, 2))
        du = -(gyy * b0 - gxy * b1) * inv_det
        dv = -(-gxy * b0 + gxx * b1) * inv_det
        upd = active & inb
        u = jnp.where(upd, u + du, u)
        v = jnp.where(upd, v + dv, v)
        active = upd & (du * du + dv * dv >= eps * eps)
        return (u, v, active, it + 1)

    active0 = ok_in & ok_g
    u_f, v_f, _, _ = jax.lax.while_loop(
        cond, step,
        (uv_j[:, 0], uv_j[:, 1], active0, jnp.asarray(0, jnp.int32)),
    )

    lu = u_f - half_win - cu
    lv = v_f - half_win - cv
    inb = (lu >= 0.0) & (lu <= g - p - 1.0) & (lv >= 0.0) & (lv <= g - p - 1.0)
    ok_out = ok_in & ok_g & inb & (v_f >= 0.0) & (v_f <= h - 1.0)
    u_out = jnp.where(ok_out, u_f, u_t)
    v_out = jnp.where(ok_out, v_f, v_t)
    # OpenCV-style err: mean |J - I| over the tracking window at the
    # final position, from the CACHED patches (one extra in-patch
    # sample) — replaces a separate image-gather pass that cost ~0.8 ms
    # per frame at the production operating point.
    j_fin = _sample_in_patch(
        jpatch, jnp.clip(lu, 0.0, g - p - 1.0), jnp.clip(lv, 0.0, g - p - 1.0), p
    )
    err = jnp.mean(jnp.abs(j_fin - t_pat), axis=(1, 2))
    return jnp.stack([u_out, v_out], axis=-1), ok_out, err


@functools.lru_cache(maxsize=8)
def _pyr_device(h: int, w: int, num_levels: int):
    """Device-resident composed blur+decimate operators: level-k image
    = V_k @ img @ U_k^T as two MXU matmuls from the raw frame (the conv
    formulation of build_pyramid lowers to slow single-channel convs on
    TPU). Level 0 is the raw image (no operators).

    The device_puts run under ensure_compile_time_eval: track() may be
    FIRST called inside an outer jit trace, and a bare device_put there
    returns a tracer of that trace — which this lru_cache would then
    leak into every later trace (UnexpectedTracerError on the second
    jitted caller)."""
    with jax.ensure_compile_time_eval():
        return _pyr_device_build(h, w, num_levels)


def _pyr_device_build(h: int, w: int, num_levels: int):
    """Level operators, fused for launch efficiency.

    The naive form (per level, per image: V_k @ img @ U_k^T) issues
    4*num_levels small HIGHEST-precision matmuls whose M-dims (240/120/
    60 rows) under-fill the MXU — measured ~0.9 ms of the frame step.
    Fused form: ONE left matmul applies every level's composed blur to
    BOTH images stacked row-wise (block-diagonal [sum 2*h_k, 2H]
    operator), then one right matmul per level applies that level's
    (wrap-pad o blur)^T. Same math, 1 + num_levels launches with
    MXU-friendly shapes.

    Returns (shapes, bd, us, offs): shapes[lvl] = (h_k, w_k) for
    lvl 0..num_levels; bd = [sum 2h_k, 2H] device f32 (None when
    num_levels == 0); us[lvl-1] = [W, WP_k] device f32; offs[lvl-1] =
    row offset of level lvl's 2*h_k block in bd's output.
    """
    shapes = {}
    v_list, u_list = [], []
    v_k = np.eye(h)
    u_k = np.eye(w)
    h_k, w_k = h, w
    for lvl in range(num_levels + 1):
        shapes[lvl] = (h_k, w_k)
        if lvl > 0:
            # Right operator = (wrap-pad to whole 128 blocks) o blur:
            # the gather's block-select stage needs 128-aligned width
            # with seam wraparound baked in.
            wp = pad_blocks(w_k)
            u_pad = (pyr.wrap_pad_matrix(wp, w_k).astype(np.float64) @ u_k).T
            v_list.append(np.ascontiguousarray(v_k, np.float32))
            u_list.append(np.ascontiguousarray(u_pad, np.float32))
        if lvl < num_levels:
            v_k = pyr.blur_decimate_matrix(h_k, wrap=False).astype(np.float64) @ v_k
            u_k = pyr.blur_decimate_matrix(w_k, wrap=True).astype(np.float64) @ u_k
            h_k = -(-h_k // 2)
            w_k = -(-w_k // 2)
    if not v_list:
        return shapes, None, (), ()
    rows = sum(2 * v.shape[0] for v in v_list)
    bd = np.zeros((rows, 2 * h), np.float32)
    offs = []
    off = 0
    for v in v_list:
        hk = v.shape[0]
        bd[off : off + hk, 0:h] = v
        bd[off + hk : off + 2 * hk, h : 2 * h] = v
        offs.append(off)
        off += 2 * hk
    return (
        shapes,
        jax.device_put(bd),
        tuple(jax.device_put(u) for u in u_list),
        tuple(offs),
    )


def track(
    img_prev: jax.Array,
    img_next: jax.Array,
    uv_prev: jax.Array,  # [N, 2]
    valid_in: jax.Array,  # [N] bool
    uv_guess: jax.Array | None = None,
    num_levels: int = 3,
    half_win: int = 10,
    iters: int = 8,
    eps: float = 0.01,
    min_eig_threshold: float = 1.5e-9,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    shapes, bd, us, offs = _pyr_device(
        img_prev.shape[0], img_prev.shape[1], num_levels
    )
    if uv_guess is None:
        uv_guess = uv_prev
    level_shapes = tuple(shapes[lvl] for lvl in range(num_levels + 1))
    return _track_impl(
        img_prev, img_next, uv_prev, valid_in, uv_guess, bd, us,
        level_offs=offs, level_shapes=level_shapes, num_levels=num_levels,
        half_win=half_win, iters=iters, eps=eps,
        min_eig_threshold=min_eig_threshold,
    )


@functools.partial(
    _pjit,
    static_argnames=(
        "level_offs", "level_shapes", "num_levels", "half_win", "iters",
        "eps", "min_eig_threshold",
    ),
)
def _track_impl(
    img_prev: jax.Array,
    img_next: jax.Array,
    uv_prev: jax.Array,
    valid_in: jax.Array,
    uv_guess: jax.Array,
    bd,  # [sum 2h_k, 2H] fused left operator (None when num_levels == 0)
    us,  # tuple of [W, WP_k] right operators for levels 1..num_levels
    *,
    level_offs,
    level_shapes,
    num_levels: int,
    half_win: int,
    iters: int,
    eps: float,
    min_eig_threshold: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pyramidal LK, matmul-gather formulation; ops.lk.track contract."""
    w = img_prev.shape[1]
    hi = _PYR_PRECISION

    def wrap_pad(img):
        wp = pad_blocks(w)
        reps = [img] + [
            img[:, : min(w, wp - w * k)] for k in range(1, -(-wp // w))
        ]
        return jnp.concatenate(reps, axis=1)[:, :wp]

    # All pyramid levels for BOTH images in one left matmul (see
    # _pyr_device_build), then one right matmul per level.
    if bd is not None:
        l_all = jnp.matmul(
            bd, jnp.concatenate([img_prev, img_next], axis=0), precision=hi
        )

    def level_imgs(lvl):
        if lvl == 0:  # level 0: pure horizontal wrap-pad
            return wrap_pad(img_prev), wrap_pad(img_next)
        hk = level_shapes[lvl][0]
        off = level_offs[lvl - 1]
        pair = jnp.matmul(
            jax.lax.slice_in_dim(l_all, off, off + 2 * hk, axis=0),
            us[lvl - 1],
            precision=hi,
        )
        return pair[:hk], pair[hk:]

    uv = uv_guess.astype(jnp.float32)
    status = valid_in
    err = jnp.zeros(uv_prev.shape[0], jnp.float32)

    # The topmost level actually PROCESSED absorbs the raw inter-frame
    # motion and needs the full drift margin; deeper levels only refine
    # a sub-pixel upsampled guess. Tiny images can skip the nominal top
    # level (rows < half_win), so key the margin on the topmost
    # non-skipped level, not on lvl == num_levels.
    top_lvl = max(
        (l for l in range(num_levels + 1) if level_shapes[l][0] >= half_win),
        default=0,
    )

    for lvl in range(num_levels, -1, -1):
        if level_shapes[lvl][0] < half_win:
            continue
        im_i, im_j = level_imgs(lvl)
        s = 1.0 / (2.0**lvl)
        # Below the top level the guess is the level above's converged
        # estimate (sub-pixel) upsampled by 2, plus inter-level
        # appearance shift — a 3 px search margin is ample and shrinks
        # the dominant search-patch gather ~18%. The top level absorbs
        # the raw inter-frame motion and keeps the full margin.
        uv_l, status, err = _track_level(
            im_i,
            im_j,
            level_shapes[lvl][1],
            uv_prev * s,
            uv * s,
            status,
            half_win,
            iters,
            eps,
            min_eig_threshold,
            drift=_DRIFT if lvl == top_lvl else 3,
        )
        uv = uv_l / s

    status = status & jnp.all(jnp.isfinite(uv), axis=-1)
    uv = uv.at[:, 0].set(jnp.mod(uv[:, 0], w))
    uv = jnp.where(status[:, None], uv, uv_prev)
    return uv, status, err

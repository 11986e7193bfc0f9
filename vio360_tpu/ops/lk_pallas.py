"""Pallas TPU kernel for pyramidal Lucas–Kanade.

The pure-XLA LK (``ops/lk.py``) lowers bilinear sampling to HBM
gathers — measured ~2.3 s/frame for 1024 features on TPU v5e, because
TPU gathers are scalar-unit bound. This kernel instead keeps the whole
ERP image (1.8 MB at 960x480 — comfortably inside the ~16 MB VMEM) plus
its gradients resident in VMEM and uses *dynamic slices* for patch
extraction, which are vector loads.

Layout: the feature axis is tiled into grid programs of ``FPB=128``
features; each program loops over its features, runs the whole LK
iteration ladder per feature on (P+1)x(P+1) VMEM slices, and packs
results into an (8, 128) output tile (rows: u, v, status, pad) —
satisfying the TPU (8, 128) block-tiling constraint.

Seam handling: images are pre-padded horizontally by PAD columns of
wrap-around content, so slices never cross the seam; positions are in
padded coordinates and wrapped back outside the kernel. Vertical
positions clamp to the slice-valid range (the polar exclusion mask
keeps real features away from the borders anyway).

Cited behavior: cv::calcOpticalFlowPyrLK defaults as used by the
reference (FeatureTracker.cpp:228-251).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from . import pyramid as pyr
from ..utils.precision import jit as _pjit

FPB = 128  # features per grid program


def _interp(patch: jax.Array, au: jax.Array, av: jax.Array, p: int) -> jax.Array:
    """(P+1)x(P+1) integer patch -> PxP patch at fractional offset."""
    tl = patch[:p, :p]
    tr = patch[:p, 1 : p + 1]
    bl = patch[1 : p + 1, :p]
    br = patch[1 : p + 1, 1 : p + 1]
    top = tl * (1.0 - au) + tr * au
    bot = bl * (1.0 - au) + br * au
    return top * (1.0 - av) + bot * av


def _tile_shape(p: int) -> tuple[int, int]:
    """Aligned VMEM tile that can hold a (p+1)x(p+1) patch at any
    sub-tile offset: rows cover the 8 possible sublane remainders,
    cols the 128 possible lane remainders (Mosaic only allows dynamic
    slice starts that are provably 8/128-aligned)."""
    rows = -(-(p + 1 + 7) // 8) * 8
    cols = -(-(p + 1 + 127) // 128) * 128
    return rows, cols


def _lk_pyr_kernel(
    uv_p_ref,  # [N,2] previous-frame positions, level-0 CONTENT coords
    uv_g_ref,  # [N,2] initial guesses, level-0 content coords
    valid_ref,  # [N,1] int32
    *refs,  # im_i, im_j per level (coarse->fine), then out_ref
    metas,  # tuple per processed level (coarse->fine) of (h_l, wp_l, inv_scale)
    half: int,
    iters: int,
    eps: float,
    min_eig_thr: float,
    use_jnp_roll: bool,
):
    """ALL pyramid levels fused in one dispatch: per feature, the
    level-L..0 extraction + iteration ladders run back to back with the
    position carried in level-0 content coordinates. One pallas call per
    frame instead of one per level — on the tunneled TPU each kernel
    execution pays a fixed host-sync cost once any D2H has happened, so
    dispatch count dominates the real per-frame latency."""
    out_ref = refs[-1]
    img_refs = refs[:-1]
    blk = pl.program_id(0)
    p = 2 * half + 1
    npix = float(p * p)
    pad = half + 3
    vpad = half + 4
    t_rows, t_cols = _tile_shape(p)

    def roll(x, shift, axis):
        if use_jnp_roll:  # interpret mode: tpu.dynamic_rotate unavailable
            return jnp.roll(x, shift, axis)
        return pltpu.roll(x, shift=shift, axis=axis)

    def load_tile(ref, v0, u0):
        """Aligned tile load with the patch origin (v0, u0) rotated to
        element (0, 0) — dynamic slice starts must be provably
        8-sublane/128-lane aligned, so load aligned and roll the
        remainder in-register."""
        v0a = pl.multiple_of((v0 // 8) * 8, 8)
        u0a = pl.multiple_of((u0 // 128) * 128, 128)
        tile = ref[pl.ds(v0a, t_rows), pl.ds(u0a, t_cols)]
        tile = roll(tile, -(v0 - v0a), 0)
        return roll(tile, -(u0 - u0a), 1)

    def level_step(im_i_ref, im_j_ref, h_l, wp_l, s, up, vp, u, v, ok):
        """One pyramid level for one feature; all positions in level-0
        content coords. Returns updated (u, v, ok)."""
        max_u0 = float(wp_l - p - 2)
        max_v0 = float(h_l + 2 * vpad - p - 2)
        v_lo, v_hi = float(vpad), float(vpad + h_l - 1)
        u_t = up * s + pad
        v_t = vp * s + vpad
        # Template center must sit inside the content rows (the window
        # may overhang into the replicate band) — matches ops/lk.py.
        ok_in = ok & (v_t >= v_lo) & (v_t <= v_hi)

        # Lower clip is 1 so the gradient neighbourhood load at
        # (v0-1, u0-1) stays in bounds even for garbage invalid slots;
        # valid features always sit well inside (pad, vpad >= 13).
        u0f = jnp.clip(jnp.floor(u_t - half), 1.0, max_u0)
        v0f = jnp.clip(jnp.floor(v_t - half), 1.0, max_v0)
        au = u_t - half - u0f
        av = v_t - half - v0f
        u0 = u0f.astype(jnp.int32)
        v0 = v0f.astype(jnp.int32)

        # ONE tile load serves template AND its Scharr gradients: load
        # with origin (v0-1, u0-1) so the (p+3)x(p+3) neighbourhood of
        # the integer patch is in-register, then compute smooth/diff
        # with static slices. Linear ops commute with bilinear interp,
        # so this equals sampling precomputed gradient images at a third
        # of the tile-load traffic. ext[r, c] = img[v0-1+r, u0-1+c].
        ext = load_tile(im_i_ref, v0 - 1, u0 - 1)[: p + 3, : p + 3]
        t_int = ext[1 : p + 2, 1 : p + 2]
        # vertical smooth at rows v0..v0+p, cols u0-1..u0+p+1
        sve = (
            3.0 * ext[: p + 1, :] + 10.0 * ext[1 : p + 2, :]
            + 3.0 * ext[2 : p + 3, :]
        ) * (1.0 / 16.0)
        gx_int = 0.5 * (sve[:, 2 : p + 3] - sve[:, : p + 1])
        # horizontal smooth at rows v0-1..v0+p+1, cols u0..u0+p
        she = (
            3.0 * ext[:, : p + 1] + 10.0 * ext[:, 1 : p + 2]
            + 3.0 * ext[:, 2 : p + 3]
        ) * (1.0 / 16.0)
        gy_int = 0.5 * (she[2 : p + 3, :] - she[: p + 1, :])
        t_pat = _interp(t_int, au, av, p)
        gx_pat = _interp(gx_int, au, av, p)
        gy_pat = _interp(gy_int, au, av, p)

        gxx = jnp.sum(gx_pat * gx_pat)
        gxy = jnp.sum(gx_pat * gy_pat)
        gyy = jnp.sum(gy_pat * gy_pat)
        det = gxx * gyy - gxy * gxy
        min_eig = 0.5 * (gxx + gyy - jnp.sqrt((gxx - gyy) ** 2 + 4.0 * gxy * gxy)) / npix
        ok_g = (min_eig > min_eig_thr) & (det > 1e-12)
        inv_det = 1.0 / jnp.where(ok_g, det, 1.0)

        # Nested iteration ladder: the EXPENSIVE part of a step is the
        # aligned tile load + double roll; the patch's integer origin
        # changes only when the estimate crosses a pixel boundary, so
        # the outer loop reloads and the inner loop iterates on the
        # cached integer patch with only fractional re-interpolation.
        def outer_cond(carry):
            it, uu, vv, active = carry
            return (it < iters) & active

        def outer_body(carry):
            it, uu, vv, active = carry
            cu0f = jnp.clip(jnp.floor(uu - half), 0.0, max_u0)
            cv0f = jnp.clip(jnp.floor(vv - half), 0.0, max_v0)
            j_int = load_tile(
                im_j_ref, cv0f.astype(jnp.int32), cu0f.astype(jnp.int32)
            )[: p + 1, : p + 1]

            def inner_cond(c):
                it2, u2, v2, act2 = c
                same = (jnp.clip(jnp.floor(u2 - half), 0.0, max_u0) == cu0f) & (
                    jnp.clip(jnp.floor(v2 - half), 0.0, max_v0) == cv0f
                )
                return (it2 < iters) & act2 & same

            def inner_body(c):
                it2, u2, v2, act2 = c
                j_pat = _interp(j_int, u2 - half - cu0f, v2 - half - cv0f, p)
                diff = j_pat - t_pat
                b0 = jnp.sum(diff * gx_pat)
                b1 = jnp.sum(diff * gy_pat)
                du = -(gyy * b0 - gxy * b1) * inv_det
                dv = -(-gxy * b0 + gxx * b1) * inv_det
                act2 = act2 & (du * du + dv * dv >= eps * eps)
                return (it2 + 1, u2 + du, v2 + dv, act2)

            return jax.lax.while_loop(inner_cond, inner_body, (it, uu, vv, active))

        active0 = ok_in & ok_g
        _, u_f, v_f, _ = jax.lax.while_loop(
            outer_cond,
            outer_body,
            (jnp.asarray(0, jnp.int32), u * s + pad, v * s + vpad, active0),
        )

        ok_out = ok_in & ok_g & (v_f >= v_lo) & (v_f <= v_hi)
        # Failed features fall back to the previous-frame position, in
        # level-0 coords (matches the per-level formulation where the
        # level output was u_t and levels rescale losslessly).
        u_n = jnp.where(ok_out, (u_f - pad) / s, up)
        v_n = jnp.where(ok_out, (v_f - vpad) / s, vp)
        return u_n, v_n, ok_out

    def one_feature(j, acc):
        i = blk * FPB + j
        up = uv_p_ref[i, 0]
        vp = uv_p_ref[i, 1]
        u = uv_g_ref[i, 0]
        v = uv_g_ref[i, 1]
        ok = valid_ref[i, 0] > 0
        for li, (h_l, wp_l, s) in enumerate(metas):
            u, v, ok = level_step(
                img_refs[2 * li], img_refs[2 * li + 1], h_l, wp_l, s, up, vp, u, v, ok
            )
        # One-hot column write (Mosaic has no scatter primitive).
        col = jax.lax.broadcasted_iota(jnp.int32, (8, FPB), 1)
        vals = jnp.concatenate(
            [
                jnp.stack([u, v, ok.astype(jnp.float32)]),
                jnp.zeros((5,), jnp.float32),
            ]
        )[:, None]
        return jnp.where(col == j, vals, acc)

    acc = jax.lax.fori_loop(0, FPB, one_feature, jnp.zeros((8, FPB), jnp.float32))
    out_ref[:, :] = acc


@functools.lru_cache(maxsize=8)
def _prep_operators(h: int, w: int, num_levels: int, half_win: int):
    """Precomposed banded operators so every per-level prepped array is
    exactly two MXU matmuls from the RAW image: out = L @ img @ R.

    The naive prep (pyramid convs + wrap/edge/align pads as concats)
    lowers to single-channel small convolutions and misaligned copies —
    data-formatting ops measured at ~5.6 ms/frame on TPU v5e. Composing
    blur+decimate chains, Scharr smooth/diff, and pad selections into one
    (L, R) pair per output keeps the whole prep on the MXU (~0.4 ms).
    Entries are dyadic rationals composed in f64 → exact in f32.

    Returns (mats, meta): mats[lvl] = (L_im, R_im) as numpy f32, meta[lvl] = (h_l, wp_l).
    """
    p = 2 * half_win + 1
    pad = half_win + 3
    vpad = half_win + 4
    t_rows, t_cols = _tile_shape(p)

    mats = []
    meta = []
    v_k = np.eye(h, dtype=np.float64)  # level-k vertical operator (h_k, h)
    u_k = np.eye(w, dtype=np.float64)
    h_k, w_k = h, w
    for lvl in range(num_levels + 1):
        hp = -(-(h_k + 2 * vpad) // 8) * 8 + t_rows
        wp_l = w_k + 2 * pad
        wr = -(-wp_l // 128) * 128 + t_cols
        pv = pyr.pad_matrix(hp, h_k, vpad, wrap=False).astype(np.float64)
        ph = pyr.pad_matrix(wr, w_k, pad, wrap=True).astype(np.float64)
        f32 = lambda m: np.ascontiguousarray(m, dtype=np.float32)
        mats.append((f32(pv @ v_k), f32((ph @ u_k).T)))
        meta.append((h_k, wp_l))
        if lvl < num_levels:
            v_k = pyr.blur_decimate_matrix(h_k, wrap=False).astype(np.float64) @ v_k
            u_k = pyr.blur_decimate_matrix(w_k, wrap=True).astype(np.float64) @ u_k
            h_k = -(-h_k // 2)
            w_k = -(-w_k // 2)
    return tuple(mats), tuple(meta)


@functools.lru_cache(maxsize=8)
def _prep_device(h: int, w: int, num_levels: int, half_win: int):
    """Device-resident copies of the prep operators.

    The operators total ~25 MB at 960x480; passing them as jit ARGUMENTS
    (ordinary device buffers, uploaded once per process) instead of
    closing over numpy keeps them out of the executable — embedded HLO
    constants were observed being re-uploaded through the device tunnel
    on later executions (~8 ms/frame regression after other large
    programs ran)."""
    mats, meta = _prep_operators(h, w, num_levels, half_win)
    # ensure_compile_time_eval: a bare device_put during an outer jit
    # trace would cache a tracer of that trace (see lk_matmul._pyr_device).
    with jax.ensure_compile_time_eval():
        dev = tuple(tuple(jax.device_put(a) for a in lvl) for lvl in mats)
    return dev, meta


def track(
    img_prev: jax.Array,
    img_next: jax.Array,
    uv_prev: jax.Array,  # [N,2], N divisible by FPB
    valid_in: jax.Array,  # [N] bool
    uv_guess: jax.Array | None = None,
    num_levels: int = 3,
    half_win: int = 10,
    iters: int = 30,
    eps: float = 0.01,
    min_eig_threshold: float = 1.5e-9,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pyramidal LK via the Pallas kernel; same contract as ops.lk.track."""
    mats, meta = _prep_device(
        img_prev.shape[0], img_prev.shape[1], num_levels, half_win
    )
    if uv_guess is None:
        uv_guess = uv_prev
    return _track_impl(
        img_prev,
        img_next,
        uv_prev,
        valid_in,
        uv_guess,
        mats,
        meta=meta,
        num_levels=num_levels,
        half_win=half_win,
        iters=iters,
        eps=eps,
        min_eig_threshold=min_eig_threshold,
        interpret=interpret,
    )


@functools.partial(
    _pjit,
    static_argnames=(
        "meta", "num_levels", "half_win", "iters", "eps",
        "min_eig_threshold", "interpret",
    ),
)
def _track_impl(
    img_prev: jax.Array,
    img_next: jax.Array,
    uv_prev: jax.Array,
    valid_in: jax.Array,
    uv_guess: jax.Array,
    mats,  # tuple per level of (L_im, R_im)
    *,
    meta,  # tuple per level of (h_l, wp_l)
    num_levels: int,
    half_win: int,
    iters: int,
    eps: float,
    min_eig_threshold: float,
    interpret: bool,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    w = img_prev.shape[1]
    n = uv_prev.shape[0]
    n_pad = -(-n // FPB) * FPB
    pad_feats = n_pad - n

    uv_p = jnp.pad(uv_prev, ((0, pad_feats), (0, 0))).astype(jnp.float32)
    uv_g = jnp.pad(uv_guess, ((0, pad_feats), (0, 0))).astype(jnp.float32)
    valid = jnp.pad(valid_in, (0, pad_feats))

    # Per-level padded images via two MXU matmuls each; all levels feed
    # ONE fused kernel (see _lk_pyr_kernel).
    hi = jax.lax.Precision.HIGHEST
    imgs = []
    kernel_metas = []
    for lvl in range(num_levels, -1, -1):
        l_im, r_im = mats[lvl]
        h_l, wp_l = meta[lvl]
        # Skip degenerate deep levels (OpenCV similarly reduces maxLevel
        # for small images); the replicate band handles moderate ones.
        if h_l < half_win:
            continue

        def mm(left, img, right):
            t = jnp.matmul(left, img, precision=hi)
            return jnp.matmul(t, right, precision=hi)

        imgs.append(mm(l_im, img_prev, r_im))
        imgs.append(mm(l_im, img_next, r_im))
        kernel_metas.append((h_l, wp_l, 1.0 / (2.0**lvl)))

    kernel = functools.partial(
        _lk_pyr_kernel,
        metas=tuple(kernel_metas),
        half=half_win,
        iters=iters,
        eps=eps,
        min_eig_thr=min_eig_threshold,
        use_jnp_roll=interpret,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // FPB,),
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + len(imgs)),
        out_specs=pl.BlockSpec((8, FPB), lambda b: (0, b), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(uv_p, uv_g, valid.astype(jnp.int32)[:, None], *imgs)
    uv = jnp.stack([out[0], out[1]], axis=-1)
    status = out[2] > 0.5

    uv = uv[:n]
    status = status[:n]
    status = status & jnp.all(jnp.isfinite(uv), axis=-1)
    # diagnostic error at level 0 via a cheap subsample (XLA gather on 9 px)
    from .sampling import bilinear_sample, patch_coords

    pc_i = patch_coords(uv_prev, 1)
    pc_j = patch_coords(uv, 1)
    err = jnp.mean(
        jnp.abs(bilinear_sample(img_next, pc_j) - bilinear_sample(img_prev, pc_i)),
        axis=-1,
    )
    uv = uv.at[:, 0].set(jnp.mod(uv[:, 0], w))
    uv = jnp.where(status[:, None], uv, uv_prev)
    return uv, status, err

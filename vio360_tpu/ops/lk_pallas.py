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

from .pyramid import build_pyramid, scharr_gradients

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


def _lk_level_kernel(
    uv_i_ref,  # [N,2] template positions (padded coords) — VMEM
    uv_j_ref,  # [N,2] initial guesses (padded coords)
    valid_ref,  # [N,1] int32
    img_i_ref,  # [Hp, Wr] template image (aligned-padded)
    img_j_ref,  # [Hp, Wr] moving image
    gx_ref,  # [Hp, Wr] template x-gradient
    gy_ref,  # [Hp, Wr]
    out_ref,  # (8, FPB) block: rows 0=u, 1=v, 2=status
    *,
    half: int,
    iters: int,
    eps: float,
    height: int,  # CONTENT height (pre-padding)
    width_pad: int,
    vpad: int,  # vertical edge-replicate padding rows (top & bottom)
    min_eig_thr: float,
    use_jnp_roll: bool,
):
    blk = pl.program_id(0)
    p = 2 * half + 1
    npix = float(p * p)
    max_u0 = float(width_pad - p - 2)
    max_v0 = float(height + 2 * vpad - p - 2)
    v_lo, v_hi = float(vpad), float(vpad + height - 1)
    t_rows, t_cols = _tile_shape(p)

    def roll(x, shift, axis):
        if use_jnp_roll:  # interpret mode: tpu.dynamic_rotate unavailable
            return jnp.roll(x, shift, axis)
        return pltpu.roll(x, shift=shift, axis=axis)

    def load_patch(ref, v0, u0):
        """(p+1)x(p+1) patch at dynamic integer (v0, u0): load an
        aligned tile, rotate the remainder into place in-register."""
        v0a = pl.multiple_of((v0 // 8) * 8, 8)
        u0a = pl.multiple_of((u0 // 128) * 128, 128)
        tile = ref[pl.ds(v0a, t_rows), pl.ds(u0a, t_cols)]
        tile = roll(tile, -(v0 - v0a), 0)
        tile = roll(tile, -(u0 - u0a), 1)
        return tile[: p + 1, : p + 1]

    def one_feature(j, acc):
        i = blk * FPB + j
        u_t = uv_i_ref[i, 0]
        v_t = uv_i_ref[i, 1]
        # Template center must sit inside the content rows (the window
        # may overhang into the replicate band) — matches ops/lk.py.
        ok_in = (valid_ref[i, 0] > 0) & (v_t >= v_lo) & (v_t <= v_hi)

        u0f = jnp.clip(jnp.floor(u_t - half), 0.0, max_u0)
        v0f = jnp.clip(jnp.floor(v_t - half), 0.0, max_v0)
        au = u_t - half - u0f
        av = v_t - half - v0f
        u0 = u0f.astype(jnp.int32)
        v0 = v0f.astype(jnp.int32)

        t_pat = _interp(load_patch(img_i_ref, v0, u0), au, av, p)
        gx_pat = _interp(load_patch(gx_ref, v0, u0), au, av, p)
        gy_pat = _interp(load_patch(gy_ref, v0, u0), au, av, p)

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
            it, u, v, active = carry
            return (it < iters) & active

        def outer_body(carry):
            it, u, v, active = carry
            cu0f = jnp.clip(jnp.floor(u - half), 0.0, max_u0)
            cv0f = jnp.clip(jnp.floor(v - half), 0.0, max_v0)
            j_int = load_patch(
                img_j_ref, cv0f.astype(jnp.int32), cu0f.astype(jnp.int32)
            )

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

            return jax.lax.while_loop(inner_cond, inner_body, (it, u, v, active))

        u_j = uv_j_ref[i, 0]
        v_j = uv_j_ref[i, 1]
        active0 = ok_in & ok_g
        _, u_f, v_f, _ = jax.lax.while_loop(
            outer_cond, outer_body, (jnp.asarray(0, jnp.int32), u_j, v_j, active0)
        )

        ok_out = ok_in & ok_g & (v_f >= v_lo) & (v_f <= v_hi)
        u_out = jnp.where(ok_out, u_f, u_t)
        v_out = jnp.where(ok_out, v_f, v_t)
        # One-hot column write (Mosaic has no scatter primitive).
        col = jax.lax.broadcasted_iota(jnp.int32, (8, FPB), 1)
        vals = jnp.concatenate(
            [
                jnp.stack([u_out, v_out, ok_out.astype(jnp.float32)]),
                jnp.zeros((5,), jnp.float32),
            ]
        )[:, None]
        return jnp.where(col == j, vals, acc)

    acc = jax.lax.fori_loop(0, FPB, one_feature, jnp.zeros((8, FPB), jnp.float32))
    out_ref[:, :] = acc


def _pad_wrap(img: jax.Array, pad: int) -> jax.Array:
    return jnp.concatenate([img[:, -pad:], img, img[:, :pad]], axis=1)


def _align_pad(img: jax.Array, t_rows: int, t_cols: int) -> jax.Array:
    """Zero-pad so every aligned tile load stays in bounds: rows to a
    multiple of 8 plus one tile, cols to a multiple of 128 plus one."""
    h, wp = img.shape
    hp = -(-h // 8) * 8 + t_rows
    wr = -(-wp // 128) * 128 + t_cols
    return jnp.pad(img, ((0, hp - h), (0, wr - wp)))


@functools.partial(
    jax.jit, static_argnames=("num_levels", "half_win", "iters", "eps", "interpret")
)
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
    w = img_prev.shape[1]
    n = uv_prev.shape[0]
    n_pad = -(-n // FPB) * FPB
    pad_feats = n_pad - n
    pad = half_win + 3

    pyr_i = build_pyramid(img_prev, num_levels)
    pyr_j = build_pyramid(img_next, num_levels)

    if uv_guess is None:
        uv_guess = uv_prev
    uv_prev_p = jnp.pad(uv_prev, ((0, pad_feats), (0, 0)))
    uv = jnp.pad(uv_guess, ((0, pad_feats), (0, 0)))
    status = jnp.pad(valid_in, (0, pad_feats))

    p_full = 2 * half_win + 1
    for lvl in range(num_levels, -1, -1):
        # Skip degenerate deep levels (OpenCV similarly reduces maxLevel
        # for small images); the replicate band handles moderate ones.
        if pyr_i[lvl].shape[0] < half_win:
            continue
        s = 1.0 / (2.0**lvl)
        vpad = half_win + 4  # replicate band ≙ bilinear_sample's v-clamp
        h_l = pyr_i[lvl].shape[0]

        def prep(img):
            img = _pad_wrap(img, pad)
            img = jnp.pad(img, ((vpad, vpad), (0, 0)), mode="edge")
            return img

        im_i = prep(pyr_i[lvl])
        im_j = prep(pyr_j[lvl])
        gx, gy = scharr_gradients(pyr_i[lvl])
        gx = prep(gx)
        gy = prep(gy)
        wp_l = im_i.shape[1]
        t_rows, t_cols = _tile_shape(p_full)
        im_i = _align_pad(im_i, t_rows, t_cols)
        im_j = _align_pad(im_j, t_rows, t_cols)
        gx = _align_pad(gx, t_rows, t_cols)
        gy = _align_pad(gy, t_rows, t_cols)

        uv_i_l = (uv_prev_p * s) + jnp.array([pad, vpad], jnp.float32)
        uv_j_l = (uv * s) + jnp.array([pad, vpad], jnp.float32)

        kernel = functools.partial(
            _lk_level_kernel,
            half=half_win,
            iters=iters,
            eps=eps,
            height=h_l,
            width_pad=wp_l,
            vpad=vpad,
            min_eig_thr=min_eig_threshold,
            use_jnp_roll=interpret,
        )
        out = pl.pallas_call(
            kernel,
            grid=(n_pad // FPB,),
            out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, FPB), lambda b: (0, b), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(
            uv_i_l.astype(jnp.float32),
            uv_j_l.astype(jnp.float32),
            status.astype(jnp.int32)[:, None],
            im_i,
            im_j,
            gx,
            gy,
        )
        uv = (jnp.stack([out[0] - pad, out[1] - vpad], axis=-1)) / s
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

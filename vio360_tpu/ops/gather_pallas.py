"""Pallas TPU window gather for the matmul-LK front end.

Replaces the one-hot ROW-GATHER + BLOCK-SELECT stages of
``lk_matmul._gather_int_patches`` (stages 1-2) with a copy-speed
kernel. The einsum formulation is MXU-friendly but burns ~19 GMAC and
~80 MB of bf16 intermediates at level 0 to perform what is a 9M-element
COPY (SCALING.md §6 roofline: the production LK runs at ~20-25% of its
HBM+MXU bound, and this slab is the dominant term). Here the
wrap-padded image (bf16: 1.05 MB at 960x480 level 0 — comfortably
VMEM-resident) is reshaped to [H, nb, 128] lane blocks and each
feature's [g, 2, 128] window is a dynamic-start slice; the only
"gather" left is two aligned-block reads per feature.

Row edge handling: the einsum path clamps each ROW index to [0, H-1]
(vertical edge-replication). A slice cannot replicate rows, so the
kernel reads from ``v0c = clip(v0, 0, H-g)`` and the caller remaps
rows with a tiny per-feature one-hot einsum (~0.3 GMAC — the identity
permutation for all interior features).

The kernel contains NO data-dependent loops — a static feature-block
unroll with scalar-prefetched indices — the same structural recipe as
the production ``ba_pallas`` megakernel, which runs at full speed on
the tunneled-TPU rig (the rig's known defect penalizes Pallas
SCALAR/LOOP-heavy kernels, ops/lk_matmul.py header).

Cited behavior: same selection semantics as
``lk_matmul._gather_int_patches`` (window-pair extraction for
FeatureTracker.cpp:228-251's LK), asserted element-exact by
tests/test_gather_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: features copied per grid step (static unroll; 8 slices per step
#: keeps the scalar core busy while the VPU streams copies)
_FPB = 8


def _kernel(v8_ref, b_ref, img_ref, out_ref):
    """Copy _FPB features' [2, gs, 128] row slabs from the
    VMEM-resident block-major image [nb, H, 128]. ``v8_ref`` (16-aligned
    row bases — Mosaic requires sublane-aligned dynamic offsets) and
    ``b_ref`` are scalar-prefetched SMEM."""
    i = pl.program_id(0)
    gs = out_ref.shape[2]
    for f in range(_FPB):
        fi = i * _FPB + f
        # v8_ref holds base//8: multiplying INSIDE the kernel lets
        # Mosaic statically prove the sublane offset is 8-aligned
        v8 = v8_ref[fi] * 8
        b = b_ref[fi]
        out_ref[f] = img_ref[pl.ds(b, 2), pl.ds(v8, gs), :]


@functools.partial(jax.jit, static_argnames=("g", "interpret"))
def gather_window_pairs(
    img_pad: jax.Array,  # [H, WP] wrap-padded to whole 128 blocks
    v0: jax.Array,  # [N] int32 top row (pre-clamp)
    b: jax.Array,  # [N] int32 left 128-block index (b+1 exists)
    g: int,
    interpret: bool = False,
) -> jax.Array:
    """[N, g, 256] bf16 window pairs, element-equal to the einsum
    path's stage-2 output:
    out[f, r, c] = bf16(img_pad)[clip(v0[f]+r, 0, H-1), b[f]*128 + c].
    bf16 is LOSSLESS here (pure selection of bf16-quantized values) and
    halves the dominant write traffic, as in lk_matmul."""
    h, wp = img_pad.shape
    n = v0.shape[0]
    npad = -(-n // _FPB) * _FPB
    # 8-aligned slab covering any clamped g-window whose base is within
    # 7 rows below it (Mosaic sublane alignment for dynamic offsets)
    gs = -(-(g + 7) // 8) * 8
    if h < gs:
        raise ValueError(f"image height {h} < slab {gs}")
    bp = jnp.zeros(npad, jnp.int32).at[:n].set(b)
    v0c = jnp.clip(jnp.zeros(npad, jnp.int32).at[:n].set(v0), 0, h - g)
    v8 = jnp.clip((v0c // 8) * 8, 0, h - gs)
    img3 = (
        img_pad.astype(jnp.bfloat16)
        .reshape(h, wp // 128, 128)
        .transpose(1, 0, 2)  # block-major: dynamic block index unconstrained
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(npad // _FPB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (_FPB, 2, gs, 128), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    win = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npad, 2, gs, 128), jnp.bfloat16),
        interpret=interpret,
    )(v8 // 8, bp, img3)
    # [n, gs, 256] slabs, rows still at the aligned base
    win = win[:n].transpose(0, 2, 1, 3).reshape(n, gs, 256)

    # row selection + vertical edge-replication in one tiny one-hot
    # einsum: out row r = slab row clip(v0+r, 0, H-1) - v8 (identity
    # shift for interior features)
    rows = jnp.clip(v0[:, None] + jnp.arange(g)[None, :], 0, h - 1)
    rel = rows - v8[:n, None]  # [N, g] in [0, gs)
    sel = (
        rel[:, :, None] == jnp.arange(gs)[None, None, :]
    ).astype(jnp.bfloat16)  # [N, g, gs]
    return jnp.einsum(
        "fgs,fsc->fgc", sel, win, preferred_element_type=jnp.bfloat16
    )

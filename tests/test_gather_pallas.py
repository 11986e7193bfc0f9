"""Pallas window-gather kernel == the einsum gather, element-exact.

ops/gather_pallas.py is the round-5 probe of SCALING.md §6's "fused
gather" roofline lever. The MEASURED outcome on the tunneled v5e killed
the lever's premise: the einsum row-gather runs at 0.19 ms device
(near MXU full rate), the Pallas copy kernel at 0.49 ms (dynamic
sublane-offset loads), so the production LK keeps the einsum path and
the kernel stays as the documented measurement + a working example of
the scalar-prefetch dynamic-slice pattern (SCALING.md §9).

These tests pin the kernel's exactness (interpret mode — bit-for-bit
the TPU kernel logic) against a numpy oracle of the einsum path's
stage-2 contract, including vertical edge replication.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from vio360_tpu.ops import gather_pallas as gp


def _oracle(img, v0, b, g):
    h = img.shape[0]
    imgb = np.asarray(jnp.asarray(img).astype(jnp.bfloat16).astype(jnp.float32))
    out = np.zeros((len(v0), g, 256), np.float32)
    for f in range(len(v0)):
        rows = np.clip(v0[f] + np.arange(g), 0, h - 1)
        out[f] = imgb[rows, b[f] * 128:(b[f] + 2) * 128]
    return out


@pytest.mark.parametrize("g,n", [(34, 100), (24, 37)])
def test_gather_matches_einsum_contract(g, n):
    rng = np.random.default_rng(7)
    h, wp = 480, 1152
    img = rng.random((h, wp)).astype(np.float32)
    v0 = rng.integers(-6, h + 4, n).astype(np.int32)  # incl. edge clamps
    b = rng.integers(0, wp // 128 - 1, n).astype(np.int32)
    out = np.asarray(gp.gather_window_pairs(
        jnp.asarray(img), jnp.asarray(v0), jnp.asarray(b), g,
        interpret=True,
    )).astype(np.float32)
    np.testing.assert_array_equal(out, _oracle(img, v0, b, g))


def test_small_image_rejected():
    img = jnp.zeros((16, 256), jnp.float32)
    with pytest.raises(ValueError, match="height"):
        gp.gather_window_pairs(
            img, jnp.zeros(8, jnp.int32), jnp.zeros(8, jnp.int32), 34,
            interpret=True,
        )

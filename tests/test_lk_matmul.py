"""Matmul-gather LK (the TPU production path) vs the pure-XLA reference.

ops/lk_matmul.py must reproduce ops/lk.py::track_xla's tracking: same
template-gradient/bilinear math expressed as one-hot-selector einsums
with a fixed synchronized iteration ladder. Cited behavior:
cv::calcOpticalFlowPyrLK defaults as used by the reference tracker
(FeatureTracker.cpp:228-251).
"""

import jax
import numpy as np
import jax.numpy as jnp

from vio360_tpu.ops import lk, lk_matmul


def _textured_pair(h=240, w=480, dx=1.3, dy=2.1, seed=7):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = np.random.default_rng(seed)

    def tex(ddx, ddy):
        img = np.zeros((h, w), np.float32)
        rr = np.random.default_rng(seed + 1)
        for _ in range(24):
            fx, fy = rr.uniform(0.02, 0.3, 2)
            ph = rr.uniform(0, 2 * np.pi)
            img += np.sin(fx * (xx + ddx) + fy * (yy + ddy) + ph)
        img -= img.min()
        return img / img.max()

    return tex(0.0, 0.0), tex(dx, dy), r


def test_matmul_matches_xla():
    img0, img1, rng = _textured_pair()
    h, w = img0.shape
    n = 256
    # include seam-adjacent features: horizontal wrap must be exact
    uv = np.stack(
        [rng.uniform(2, w - 2, n), rng.uniform(30, h - 30, n)], -1
    ).astype(np.float32)
    valid = np.ones(n, bool)
    # Same fixed iteration budget for both backends: the matmul path
    # runs a synchronized 8-step ladder (lk.py clamps iters to 8); any
    # residual deviation beyond that is real implementation error.
    uv_x, st_x, _ = lk.track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(uv),
        jnp.asarray(valid), backend="xla", iters=8,
    )
    uv_m, st_m, _ = lk.track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(uv),
        jnp.asarray(valid), backend="matmul",
    )
    st_x, st_m = np.asarray(st_x), np.asarray(st_m)
    assert st_m.sum() >= 0.9 * st_x.sum()
    both = st_x & st_m
    d = np.linalg.norm(np.asarray(uv_m) - np.asarray(uv_x), axis=-1)[both]
    assert d.max() < 0.05, f"max deviation from XLA reference {d.max():.4f} px"
    assert d.mean() < 0.01
    # recovered flow equals the synthetic shift
    flow = np.median(np.asarray(uv_m)[both] - uv[both], axis=0)
    np.testing.assert_allclose(flow, [-1.3, -2.1], atol=0.1)


def test_matmul_invalid_features_stay_put():
    img0, img1, _ = _textured_pair(seed=1)
    n = 8
    uv = np.full((n, 2), 50.0, np.float32)
    valid = np.zeros(n, bool)
    uv_m, st_m, _ = lk_matmul.track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(uv), jnp.asarray(valid)
    )
    assert not np.asarray(st_m).any()
    np.testing.assert_allclose(np.asarray(uv_m), uv)


def test_matmul_tiny_image_skips_deep_levels():
    img0, img1, _ = _textured_pair(h=64, w=256, seed=2)
    uv = np.array([[100.0, 32.0], [150.0, 30.0]], np.float32)
    valid = np.ones(2, bool)
    uv_m, st_m, _ = lk_matmul.track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(uv), jnp.asarray(valid)
    )
    assert np.isfinite(np.asarray(uv_m)).all()


def test_no_tracer_leak_across_traces():
    """track()'s cached pyramid operators must be concrete arrays even
    when the FIRST call happens inside an outer jit trace — a bare
    device_put there caches a tracer of that trace and every later
    jitted caller dies with UnexpectedTracerError (hit by bench.py's
    multi-stream stage after the frame-step stage)."""
    lk_matmul._pyr_device.cache_clear()
    img = jnp.asarray(np.random.default_rng(0).random((240, 480), np.float32))
    uv = jnp.asarray(np.random.default_rng(1).uniform(30, 200, (64, 2)), jnp.float32)
    valid = jnp.ones(64, bool)

    @jax.jit
    def first(a, b):
        return lk_matmul.track(a, b, uv, valid)[0]

    @jax.jit
    def second(a, b):
        return lk_matmul.track(a, b, uv, valid)[0]

    assert first(img, img).shape == (64, 2)
    assert second(img, img).shape == (64, 2)

def test_matmul_matches_xla_with_guess():
    """The production tracker seeds LK from the rotation-predicted flow
    (frontend/tracker._rotation_guess); with IDENTICAL guess inputs the
    matmul path must still match the XLA formulation at the same
    equivalence bound (different guesses legitimately select different
    local minima on repetitive texture, so inputs must match)."""
    img0, img1, rng = _textured_pair()
    h, w = img0.shape
    n = 256
    uv = np.stack(
        [rng.uniform(2, w - 2, n), rng.uniform(30, h - 30, n)], -1
    ).astype(np.float32)
    valid = np.ones(n, bool)
    guess = jnp.asarray(
        uv + np.array([-1.3, -2.1]) + rng.uniform(-1.0, 1.0, (n, 2)), jnp.float32
    )
    uv_x, st_x, _ = lk.track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(uv),
        jnp.asarray(valid), uv_guess=guess, backend="xla", iters=8,
    )
    uv_m, st_m, _ = lk.track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(uv),
        jnp.asarray(valid), uv_guess=guess, backend="matmul",
    )
    st_x, st_m = np.asarray(st_x), np.asarray(st_m)
    assert st_m.sum() >= 0.9 * st_x.sum()
    both = st_x & st_m
    d = np.linalg.norm(np.asarray(uv_m) - np.asarray(uv_x), axis=-1)[both]
    assert d.max() < 0.05, f"max deviation from XLA reference {d.max():.4f} px"

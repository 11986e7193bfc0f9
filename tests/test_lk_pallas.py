"""Pallas LK kernel vs the pure-XLA reference implementation.

The TPU kernel (ops/lk_pallas.py) must reproduce ops/lk.py's tracking
(same math, different memory strategy); on CPU we run it through the
Pallas interpreter. Cited behavior: cv::calcOpticalFlowPyrLK defaults
as used by the reference (FeatureTracker.cpp:228-251).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vio360_tpu.ops import lk, lk_pallas


def _shifted_pair(h=240, w=480, dx=1, dy=2, seed=0):
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    base = gaussian_filter(rng.random((h + 8, w + 8)).astype(np.float32), 2.0)
    return base[:h, :w], base[dy : dy + h, dx : dx + w]


def test_pallas_matches_xla_interpret():
    img0, img1 = _shifted_pair()
    h, w = img0.shape
    rng = np.random.default_rng(3)
    n = 128
    uv = np.stack([rng.uniform(30, w - 30, n), rng.uniform(40, h - 40, n)], -1).astype(
        np.float32
    )
    valid = np.ones(n, bool)
    uv_x, st_x, _ = lk.track_xla(jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(uv), jnp.asarray(valid))
    uv_p, st_p, _ = lk_pallas.track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(uv), jnp.asarray(valid),
        interpret=True,
    )
    st_x, st_p = np.asarray(st_x), np.asarray(st_p)
    assert st_p.sum() >= 0.9 * st_x.sum()
    both = st_x & st_p
    assert np.abs(np.asarray(uv_p) - np.asarray(uv_x))[both].max() < 1e-2
    # the recovered flow is the synthetic shift
    flow = np.median(np.asarray(uv_p)[both] - uv[both], axis=0)
    np.testing.assert_allclose(flow, [-1.0, -2.0], atol=0.1)


def test_pallas_invalid_features_stay_put():
    img0, img1 = _shifted_pair(seed=1)
    n = 8
    uv = np.full((n, 2), 50.0, np.float32)
    valid = np.zeros(n, bool)
    uv_p, st_p, _ = lk_pallas.track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(uv), jnp.asarray(valid),
        interpret=True,
    )
    assert not np.asarray(st_p).any()
    np.testing.assert_allclose(np.asarray(uv_p), uv)


def test_dispatcher_selects_xla_on_cpu():
    assert lk.resolve_backend("auto") in ("xla", "pallas")
    assert lk.resolve_backend("xla") == "xla"
    assert lk.resolve_backend("pallas") == "pallas"


def test_tiny_image_skips_deep_levels():
    # 64-px-high image: levels 2+ are smaller than the 22-px patch and
    # must be skipped rather than crash.
    img0, img1 = _shifted_pair(h=64, w=256, seed=2)
    uv = np.array([[100.0, 32.0], [150.0, 30.0]], np.float32)
    valid = np.ones(2, bool)
    uv_p, st_p, _ = lk_pallas.track(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(uv), jnp.asarray(valid),
        interpret=True,
    )
    assert np.isfinite(np.asarray(uv_p)).all()

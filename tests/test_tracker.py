"""Tests for the SoA feature-track state machine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from vio360_tpu import config as cfgmod
from vio360_tpu.frontend import tracker
from vio360_tpu.geometry import camera as cam
from vio360_tpu.geometry import lie

H, W = 240, 480


@pytest.fixture(scope="module")
def cfg():
    return cfgmod.VioConfig(
        camera=cfgmod.CameraConfig(width=W, height=H),
        features=cfgmod.FeatureConfig(
            max_features=200, capacity=256, min_distance=15.0, grid_cols=10, grid_rows=5
        ),
        ransac=cfgmod.RansacConfig(max_iterations=300),
    )


@pytest.fixture(scope="module")
def pano():
    return synthetic.make_panorama(7, H, W)


class TestBootstrap:
    def test_detects_features(self, cfg, pano):
        st = tracker.init_state(cfg.features.capacity)
        st = tracker.bootstrap_frame(st, pano, jnp.asarray(0.0), cfg)
        n = int(st.valid.sum())
        assert 30 < n <= cfg.features.max_features
        # ids unique among valid
        ids = np.asarray(st.ids[np.asarray(st.valid)])
        assert len(np.unique(ids)) == len(ids)
        assert int(st.next_id) >= n


class TestTrackFrame:
    def test_pure_rotation_sequence(self, cfg, pano):
        st = tracker.init_state(cfg.features.capacity)
        st = tracker.bootstrap_frame(st, pano, jnp.asarray(0.0), cfg)
        img_prev = pano
        r_wc = jnp.eye(3)
        key = jax.random.PRNGKey(0)
        for i in range(3):
            phi = jnp.array([0.0, 0.015, 0.002])
            r_wc = r_wc @ lie.so3_exp(phi)
            img_next = synthetic.render_rotated_view(pano, r_wc)
            key, sub = jax.random.split(key)
            prev_ids = np.asarray(st.ids).copy()
            prev_uv = np.asarray(st.uv).copy()
            prev_valid = np.asarray(st.valid).copy()
            st, r_rel, diag = tracker.track_frame(
                st, img_prev, img_next, jnp.asarray(0.1 * (i + 1)), sub, cfg
            )
            # camera rotates by exp(phi) => bearings rotate by exp(phi)^T
            np.testing.assert_allclose(
                np.asarray(r_rel), np.asarray(lie.so3_exp(phi)).T, atol=5e-3
            )
            # surviving features keep their ids and slots
            both = prev_valid & np.asarray(st.valid) & (np.asarray(st.ids) == prev_ids)
            assert both.sum() > 30
            assert int(diag["n_ransac_inliers"]) > 30
            img_prev = img_next

        # ages accumulate for survivors
        assert int(st.age.max()) == 3

    def test_budget_respected(self, cfg, pano):
        st = tracker.init_state(cfg.features.capacity)
        st = tracker.bootstrap_frame(st, pano, jnp.asarray(0.0), cfg)
        img2 = synthetic.render_rotated_view(pano, lie.so3_exp(jnp.array([0.0, 0.01, 0.0])))
        st, _, _ = tracker.track_frame(
            st, pano, img2, jnp.asarray(0.1), jax.random.PRNGKey(1), cfg
        )
        assert int(st.valid.sum()) <= cfg.features.max_features

    def test_velocity_estimates(self, cfg, pano):
        st = tracker.init_state(cfg.features.capacity)
        st = tracker.bootstrap_frame(st, pano, jnp.asarray(0.0), cfg)
        yaw = 0.02
        img2 = synthetic.render_rotated_view(pano, lie.so3_exp(jnp.array([0.0, yaw, 0.0])))
        st, _, _ = tracker.track_frame(
            st, pano, img2, jnp.asarray(0.1), jax.random.PRNGKey(2), cfg
        )
        survivors = np.asarray(st.valid & (st.age > 0))
        v = np.asarray(st.vel)[survivors]
        # yaw of +0.02 rad moves features left: du = -yaw/(2pi)*W px over 0.1 s
        expected_u = -yaw / (2 * np.pi) * W / 0.1
        assert abs(np.median(v[:, 0]) - expected_u) < 3.0


class TestGridOps:
    def test_limit_per_cell(self):
        # 10 features crammed in one cell, cap 3 -> keep 3 best by track_count
        uv = jnp.tile(jnp.array([[5.0, 5.0]]), (10, 1)) + jnp.arange(10)[:, None] * 0.1
        valid = jnp.ones(10, bool)
        tc = jnp.arange(10)
        keep = tracker._limit_per_cell(uv, valid, tc, 480, 240, 10, 5, 3)
        assert int(keep.sum()) == 3
        assert bool(keep[9] & keep[8] & keep[7])

    def test_remove_clustered(self):
        # 6 features within 2 px in one cell -> removed; 4 spread out -> kept
        tight = jnp.array([[100.0 + 0.3 * i, 100.0] for i in range(6)])
        cw, chh = 480 / 10, 240 / 5
        spread = jnp.array(
            [[200.0 + (i % 2) * cw * 0.8, 150.0 + (i // 2) * chh * 0.8] for i in range(4)]
        )
        uv = jnp.concatenate([tight, spread])
        valid = jnp.ones(10, bool)
        keep = tracker._remove_clustered(uv, valid, 480, 240, 10, 5)
        assert not bool(keep[:6].any())
        assert bool(keep[6:].all())


def test_row_gain_compensation_restores_brightness_constancy():
    """Exposure-gain x vignette between frames is exactly removed by
    per-row gain matching (frontend/tracker._row_gain_compensate)."""
    import numpy as np

    from vio360_tpu.frontend.tracker import _row_gain_compensate

    rng = np.random.default_rng(3)
    ref = jnp.asarray(rng.uniform(0.2, 0.8, (64, 128)).astype(np.float32))
    lat = np.abs(np.linspace(-1, 1, 64, dtype=np.float32))
    vign = (1.0 - 0.35 * lat**2)[:, None]
    img = ref * jnp.asarray(vign) * 1.12  # vignette + 12% gain
    out = _row_gain_compensate(ref, img)
    # latitude box-smoothing leaves a small curvature/edge bias on the
    # quadratic vignette profile; exact inversion is not the contract.
    # The outermost rows sit inside the polar exclusion band (no
    # features live there), so the tight bound applies to the interior.
    err = jnp.abs(out - ref)
    assert float(err[8:-8].max()) < 5e-3
    assert float(err.max()) < 5e-2

    # clamp: a pathological 10x gain cannot be fully inverted
    out2 = _row_gain_compensate(ref, ref * 10.0)
    g_eff = float(jnp.mean(out2 / ref))
    assert 4.9 < g_eff < 5.1  # 10x clamped to x0.5 -> 5x remains

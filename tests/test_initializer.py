"""Tests for the two-view monocular bootstrap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from vio360_tpu import config as cfgmod
from vio360_tpu.estimator import initializer
from vio360_tpu.geometry import camera as cam
from vio360_tpu.geometry import lie
from vio360_tpu.utils import metrics

W, H = 960, 480
C = 256  # capacity


def cfg_small(min_features=60):
    return cfgmod.VioConfig(
        camera=cfgmod.CameraConfig(width=W, height=H),
        features=cfgmod.FeatureConfig(capacity=C),
        init=cfgmod.InitializationConfig(min_features=min_features, min_observations=10),
    )


def build_two_view(seed=0, n=200, baseline=0.6, noise_px=0.0, rot=True):
    pts = synthetic.make_point_world(seed, n)
    r1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, np.float32)
    phi = np.array([0.03, 0.08, -0.02], np.float32) if rot else np.zeros(3, np.float32)
    r2 = np.asarray(lie.so3_exp(jnp.asarray(phi)))
    t2 = np.array([baseline, 0.1, 0.2], np.float32)
    rs = np.stack([r1, r2])
    ts = np.stack([t1, t2])
    uv, _ = synthetic.project_tracks(pts, rs, ts, W, H, noise_px=noise_px, seed=seed)
    uv_first = np.zeros((C, 2), np.float32)
    uv_last = np.zeros((C, 2), np.float32)
    tracked = np.zeros(C, bool)
    uv_first[:n] = uv[0]
    uv_last[:n] = uv[1]
    tracked[:n] = True
    obs = np.where(tracked, 12, 0)
    return (
        jnp.asarray(uv_first), jnp.asarray(uv_last), jnp.asarray(tracked),
        jnp.asarray(obs), pts, rs, ts,
    )


class TestMaskedMedian:
    def test_odd(self):
        v = jnp.array([3.0, 1.0, 2.0, 99.0])
        m = jnp.array([True, True, True, False])
        assert float(initializer.masked_median(v, m)) == 2.0

    def test_even(self):
        v = jnp.array([4.0, 1.0, 2.0, 3.0])
        m = jnp.ones(4, bool)
        assert float(initializer.masked_median(v, m)) == 2.5

    def test_empty(self):
        assert float(initializer.masked_median(jnp.array([1.0]), jnp.array([False]))) == 0.0


class TestInitializer:
    def test_clean_two_view(self):
        uv_f, uv_l, tracked, obs, pts, rs, ts = build_two_view()
        res = initializer.try_initialize(
            jax.random.PRNGKey(0), uv_f, uv_l, tracked, obs, jnp.eye(4), cfg_small()
        )
        assert bool(res.success)
        # Relative camera rotation: bearings b2 = R_21 b1 relation comes from
        # p_2 = R_c2c1... ground truth: p_c2 = R2^T (p_w - t2); p_c1 = p_w
        # => p_c2 = R2^T p_c1 - R2^T t2, so R_21 = R2^T.
        r21_gt = np.asarray(rs[1]).T
        np.testing.assert_allclose(np.asarray(res.r_21), r21_gt, atol=5e-3)
        # translation direction (scale-free)
        t21_gt = -r21_gt @ np.asarray(ts[1])
        t_est = np.asarray(res.t_21)
        cos = abs(np.dot(t_est / np.linalg.norm(t_est), t21_gt / np.linalg.norm(t21_gt)))
        assert cos > 0.999
        # selection caps eligible features at 8x4 cells x 5/cell = 160
        assert int(res.num_valid_points) >= 100

    def test_landmarks_match_geometry(self):
        uv_f, uv_l, tracked, obs, pts, rs, ts = build_two_view(seed=1)
        res = initializer.try_initialize(
            jax.random.PRNGKey(1), uv_f, uv_l, tracked, obs, jnp.eye(4), cfg_small()
        )
        assert bool(res.success)
        v = np.asarray(res.point_valid)
        est = np.asarray(res.points_w)[v]
        gt = pts[v[: pts.shape[0]]]
        # World = body1 = camera1 (identity extrinsics): points equal up to
        # ONE global scale (the essential t is unit-norm, then the map is
        # median-depth normalized) — estimate it and compare shapes.
        c = np.median(np.linalg.norm(est, axis=-1) / np.linalg.norm(gt, axis=-1))
        np.testing.assert_allclose(est, gt * c, rtol=5e-2, atol=5e-2)

    def test_insufficient_parallax(self):
        # No rotation: the (rotation-uncompensated, like the reference's)
        # pixel-parallax gate sees only the tiny baseline.
        uv_f, uv_l, tracked, obs, *_ = build_two_view(seed=2, baseline=0.0005, rot=False)
        res = initializer.try_initialize(
            jax.random.PRNGKey(2), uv_f, uv_l, tracked, obs, jnp.eye(4), cfg_small()
        )
        assert not bool(res.success)

    def test_too_few_features(self):
        uv_f, uv_l, tracked, obs, *_ = build_two_view(seed=3, n=40)
        res = initializer.try_initialize(
            jax.random.PRNGKey(3), uv_f, uv_l, tracked, obs, jnp.eye(4), cfg_small()
        )
        assert not bool(res.success)

    def test_with_outliers_and_noise(self):
        uv_f, uv_l, tracked, obs, pts, rs, ts = build_two_view(seed=4, noise_px=0.3)
        rng = np.random.default_rng(4)
        uv_l_np = np.array(uv_l)
        bad = rng.choice(200, 30, replace=False)
        uv_l_np[bad] += rng.uniform(20, 80, (30, 2))
        res = initializer.try_initialize(
            jax.random.PRNGKey(4), uv_f, jnp.asarray(uv_l_np), tracked, obs,
            jnp.eye(4), cfg_small()
        )
        assert bool(res.success)
        r21_gt = np.asarray(rs[1]).T
        np.testing.assert_allclose(np.asarray(res.r_21), r21_gt, atol=3e-2)
        # Most corrupted features excluded from the map
        assert np.asarray(res.point_valid)[bad].mean() < 0.25

    def test_nontrivial_extrinsics(self):
        uv_f, uv_l, tracked, obs, pts, rs, ts = build_two_view(seed=5)
        t_bc = np.eye(4, dtype=np.float32)
        t_bc[:3, :3] = np.asarray(lie.so3_exp(jnp.array([0.0, 0.0, np.pi / 2])))
        t_bc[:3, 3] = [0.05, 0.0, 0.02]
        res = initializer.try_initialize(
            jax.random.PRNGKey(5), uv_f, uv_l, tracked, obs, jnp.asarray(t_bc), cfg_small()
        )
        assert bool(res.success)
        # Consistency: projecting a world landmark through the body pose +
        # extrinsics must reproduce the observation in frame 2.
        v = np.asarray(res.point_valid)
        idx = np.nonzero(v)[0][:20]
        r_wb2, t_wb2 = np.asarray(res.r_wb2), np.asarray(res.t_wb2)
        r_bc, p_bc = t_bc[:3, :3], t_bc[:3, 3]
        # T_wc2 = T_wb2 * T_BC
        r_wc2 = r_wb2 @ r_bc
        t_wc2 = r_wb2 @ p_bc + t_wb2
        p_c2 = (np.asarray(res.points_w)[idx] - t_wc2) @ r_wc2
        uv_prj = np.asarray(cam.project(jnp.asarray(p_c2), W, H))
        duv = np.asarray(uv_l)[idx] - uv_prj
        duv[:, 0] = (duv[:, 0] + W / 2) % W - W / 2
        assert np.abs(duv).max() < 2.0

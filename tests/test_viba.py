"""Tests for visual-inertial window BA (run_viba)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from test_imu_init import make_vi_scene, G
from vio360_tpu.geometry import camera as cam
from vio360_tpu.geometry import lie
from vio360_tpu.solver import viba
from vio360_tpu.utils import metrics

W, H = 960, 480


def build_vi_window(n_kf=5, m=120, seed=0):
    """Metric VI scene + visual observations of a landmark cloud."""
    kf_r, kf_t_vision, preints, pair_valid, truth = make_vi_scene(
        lam=1.0, n_kf=n_kf, seed=seed
    )
    kf_t = jnp.asarray(truth["t_metric"], jnp.float32)  # metric poses
    pts = synthetic.make_point_world(seed + 5, m, radius=(4.0, 9.0))
    uv = np.zeros((n_kf, m, 2), np.float32)
    for i in range(n_kf):
        p_c = (pts - np.asarray(kf_t)[i]) @ np.asarray(kf_r[i])
        uv[i] = np.asarray(cam.project(jnp.asarray(p_c), W, H))
    g_w = jnp.asarray(truth["g_w"], jnp.float32)
    vel = jnp.asarray(truth["vel"], jnp.float32)
    return kf_r, kf_t, vel, jnp.asarray(pts), jnp.asarray(uv), preints, pair_valid, g_w


class TestViba:
    def test_refines_perturbed_window(self):
        kf_r, kf_t, vel, pts, uv, preints, pair_valid, g_w = build_vi_window()
        k, m = kf_t.shape[0], pts.shape[0]
        rng = np.random.default_rng(0)
        rs_n, ts_n = [np.asarray(kf_r[0])], [np.asarray(kf_t[0])]
        for i in range(1, k):
            dr, dt = lie.se3_exp(jnp.asarray(rng.standard_normal(6) * 0.01, jnp.float32))
            r2, t2 = lie.se3_compose(kf_r[i], kf_t[i], dr, dt)
            rs_n.append(np.asarray(r2))
            ts_n.append(np.asarray(t2))
        pts_n = np.asarray(pts) + rng.standard_normal((m, 3)).astype(np.float32) * 0.03
        vel_n = np.asarray(vel) + rng.standard_normal((k, 3)).astype(np.float32) * 0.1

        res = viba.run_viba(
            jnp.asarray(np.stack(rs_n)), jnp.asarray(np.stack(ts_n)),
            jnp.asarray(vel_n), jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(pts_n), uv, jnp.ones((k, m), bool),
            jnp.zeros(k, bool).at[0].set(True), jnp.zeros(m, bool),
            jnp.zeros(m, bool), preints, pair_valid, g_w,
            jnp.eye(3), jnp.zeros(3), W, H,
        )
        assert float(res.final_cost) < 0.05 * float(res.initial_cost)
        a = metrics.ate(np.asarray(res.t_wb), np.asarray(kf_t), align="none")
        assert a.rmse < 5e-3, a
        # velocities recovered
        np.testing.assert_allclose(np.asarray(res.vel), np.asarray(vel), atol=0.05)

    def test_inertial_constrains_scale(self):
        # Scale the window translations+landmarks by 1.1: visual cost is
        # invariant (monocular gauge) but the inertial residuals are not;
        # VIBA must pull the scale back toward metric.
        kf_r, kf_t, vel, pts, uv, preints, pair_valid, g_w = build_vi_window(seed=1)
        k, m = kf_t.shape[0], pts.shape[0]
        s0 = 1.1
        t0 = kf_t[0]
        kf_t_s = t0 + (kf_t - t0) * s0
        pts_s = t0 + (pts - t0) * s0

        res = viba.run_viba(
            kf_r, kf_t_s, vel, jnp.zeros(3), jnp.zeros(3),
            pts_s, uv, jnp.ones((k, m), bool),
            jnp.zeros(k, bool).at[0].set(True), jnp.zeros(m, bool),
            jnp.zeros(m, bool), preints, pair_valid, g_w,
            jnp.eye(3), jnp.zeros(3), W, H, max_iterations=40,
        )
        d_est = np.linalg.norm(np.diff(np.asarray(res.t_wb), axis=0), axis=1)
        d_gt = np.linalg.norm(np.diff(np.asarray(kf_t), axis=0), axis=1)
        scale_err_before = abs(s0 - 1.0)
        scale_err_after = abs(np.median(d_est / d_gt) - 1.0)
        assert scale_err_after < 0.5 * scale_err_before, (scale_err_after, scale_err_before)

    def test_bias_recovery(self):
        bg_true = np.array([0.015, -0.01, 0.008], np.float32)
        kf_r, kf_t_v, preints, pair_valid, truth = make_vi_scene(
            lam=1.0, n_kf=5, bg=bg_true, seed=2
        )
        kf_t = jnp.asarray(truth["t_metric"], jnp.float32)
        m = 100
        pts = synthetic.make_point_world(9, m, radius=(4.0, 9.0))
        uv = np.zeros((5, m, 2), np.float32)
        for i in range(5):
            p_c = (pts - np.asarray(kf_t)[i]) @ np.asarray(kf_r[i])
            uv[i] = np.asarray(cam.project(jnp.asarray(p_c), W, H))
        res = viba.run_viba(
            kf_r, kf_t, jnp.asarray(truth["vel"], jnp.float32),
            jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(pts), jnp.asarray(uv), jnp.ones((5, m), bool),
            jnp.zeros(5, bool).at[0].set(True), jnp.zeros(m, bool),
            jnp.zeros(m, bool), preints, pair_valid,
            jnp.asarray(truth["g_w"], jnp.float32),
            jnp.eye(3), jnp.zeros(3), W, H, max_iterations=40,
        )
        np.testing.assert_allclose(np.asarray(res.bg), bg_true, atol=4e-3)

"""End-to-end VIO on synthetic images + exact IMU (SURVEY.md §4 (3)).

Renders blob landmarks along an analytic trajectory under gravity,
feeds images + IMU to the Estimator, and checks IMU initialization
produces a METRIC, gravity-aligned trajectory (SE(3) ATE, no scale
alignment needed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from vio360_tpu import config as cfgmod
from vio360_tpu.estimator.estimator import Estimator
from vio360_tpu.geometry import lie
from vio360_tpu.utils import metrics

W, H = 480, 240
G = 9.81
FPS = 10.0
IMU_HZ = 200.0


def make_cfg():
    return cfgmod.VioConfig(
        camera=cfgmod.CameraConfig(width=W, height=H, boundary_margin=10.0),
        features=cfgmod.FeatureConfig(
            max_features=250, capacity=256, min_distance=10.0, quality_level=0.02,
            grid_cols=10, grid_rows=5, max_features_per_grid=10,
        ),
        ransac=cfgmod.RansacConfig(max_iterations=300),
        init=cfgmod.InitializationConfig(
            window_size=8, min_features=50, min_observations=8, min_parallax=6.0,
        ),
        tracking=cfgmod.TrackingConfig(min_parallax_for_keyframe=10.0),
        window=cfgmod.WindowConfig(max_keyframes=8, max_landmarks=512),
    )


def make_vio_sequence(n_frames=20, seed=3, tilt=(0.06, -0.04)):
    """Analytic metric trajectory + exact-ish IMU + rendered images."""
    from vio360_tpu.solver import imu_init as imu_init_mod

    r_wg = np.asarray(
        imu_init_mod.gravity_dir_to_rotation(jnp.asarray(tilt, jnp.float32))
    )
    g_w = r_wg @ np.array([0.0, 0.0, -G])

    dt = 1.0 / IMU_HZ
    t_total = (n_frames - 1) / FPS
    ts = np.arange(0.0, t_total + dt / 2, dt)

    # Dynamically rich trajectory: |a| ~ 4 m/s^2 and strong rotation, so
    # gravity direction and metric scale are well decoupled (at |a| ~
    # 0.1 g the tilt<->scale degeneracy limits mono-VI scale to ~20%,
    # which is physics, not implementation).
    def pos(t):
        return np.stack(
            [0.8 * np.sin(2.2 * t), 0.55 * np.cos(1.8 * t) - 0.55, 0.3 * np.sin(1.5 * t)],
            axis=-1,
        )

    def rot(t):
        phi = np.stack(
            [0.3 * np.sin(1.5 * t), 0.25 * t, 0.2 * np.cos(1.2 * t)], axis=-1
        )
        return np.asarray(jax.vmap(lie.so3_exp)(jnp.asarray(phi, jnp.float32)))

    p = pos(ts)
    r = rot(ts)
    v = np.gradient(p, dt, axis=0)
    a_w = np.gradient(v, dt, axis=0)

    rows = np.zeros((len(ts), 7), np.float64)
    rows[:, 0] = ts
    for i in range(len(ts)):
        rows[i, 1:4] = r[i].T @ (a_w[i] - g_w)
        if 0 < i < len(ts) - 1:
            dr = r[i - 1].T @ r[i + 1]
            rows[i, 4:7] = np.asarray(lie.so3_log(jnp.asarray(dr, jnp.float32))) / (2 * dt)

    pts = synthetic.make_point_world(seed, 500, radius=(3.0, 9.0))
    frame_idx = [int(round(i * IMU_HZ / FPS)) for i in range(n_frames)]
    frames = []
    prev_fi = None
    for fi in frame_idx:
        img = synthetic.render_point_image(pts, r[fi], p[fi], W, H)
        imu = rows[prev_fi + 1 : fi + 1] if prev_fi is not None else np.zeros((0, 7))
        frames.append((ts[fi], img, imu))
        prev_fi = fi
    gt_r = r[frame_idx]
    gt_t = p[frame_idx]
    return frames, gt_r, gt_t, g_w


@pytest.fixture(scope="module")
def vio_run():
    frames, gt_r, gt_t, g_w = make_vio_sequence(n_frames=40)
    est = Estimator(make_cfg())
    results = [est.process_frame(img, t, imu) for (t, img, imu) in frames]
    return est, results, gt_r, gt_t, g_w


class TestEndToEndVIO:
    def test_imu_initializes(self, vio_run):
        est, results, *_ = vio_run
        assert est.initialized
        assert est.imu_initialized

    def test_metric_scale_converges(self, vio_run):
        """The first IMU init (8 short KF pairs + vision-window shape
        error) lands within ~25% of metric; the periodic VIBA + inertial
        refinements must pull the LIVE trajectory to metric — so the
        displacement-scale is checked on the SECOND HALF of the run."""
        est, results, gt_r, gt_t, g_w = vio_run
        half = len(results) // 2
        t_est = np.stack([r.t_wb for r in results[half:]])
        t_gt = gt_t[half:]
        d_est = np.linalg.norm(np.diff(t_est, axis=0), axis=1)
        d_gt = np.linalg.norm(np.diff(t_gt, axis=0), axis=1)
        m = d_gt > 0.01
        ratio = np.median(d_est[m] / d_gt[m])
        assert 0.85 < ratio < 1.15, ratio
        # and the aligned tail trajectory error stays bounded
        a = metrics.ate(t_est, t_gt, align="se3")
        extent = np.linalg.norm(gt_t - gt_t.mean(0), axis=1).max()
        assert a.rmse < 0.2 * extent, (a, extent)

    def test_gravity_aligned(self, vio_run):
        # After alignment the world-frame gravity must be (0,0,-G); the
        # estimated body orientation at frame i should map the measured
        # accel direction near -g... check via keyframe velocities being
        # finite and bounded instead (detailed check in test_imu_init).
        est, *_ = vio_run
        v = np.asarray(est.win.kf_vel)[np.asarray(est.win.kf_id) >= 0]
        assert np.isfinite(v).all()
        assert np.abs(v).max() < 5.0

    def test_tracks_post_init(self, vio_run):
        est, results, *_ = vio_run
        post = [r for r in results if r.state in ("tracking", "tracking_lost")]
        lost = [r for r in post if r.state == "tracking_lost"]
        assert len(lost) <= len(post) // 3


class TestScaleGravityRefine:
    """Pins the periodic inertial scale/gravity refinement schedule in
    isolation (estimator._refine_scale_gravity): corrections must be
    applied when the window drifts off metric, and the 0.5<s<2.0 gate
    must reject degenerate estimates. (r1 covered this only implicitly
    through the single e2e fixture.)"""

    def _scaled_estimator(self, factor):
        import dataclasses

        frames, gt_r, gt_t, g_w = make_vio_sequence(n_frames=24, seed=5)
        est = Estimator(make_cfg())
        for (t, img, imu) in frames:
            est.process_frame(img, t, imu)
        assert est.imu_initialized
        # Simulate scale drift: stretch poses/landmarks/velocities by
        # `factor` while the preintegrations stay metric.
        est.win = dataclasses.replace(
            est.win,
            kf_t=est.win.kf_t * factor,
            kf_vel=est.win.kf_vel * factor,
            lm_pos=est.win.lm_pos * factor,
        )
        est.scale_refine_count = 0
        return est

    def test_refine_pulls_back_to_metric(self):
        """A 35% scale drift must be detected and corrected in one pass.
        The applied scale is measured on keyframe DISPLACEMENTS from
        KF0 (the alignment is a similarity about the first keyframe plus
        a gravity re-rotation, so per-row norms are not the scale)."""
        factor = 1.35
        est = self._scaled_estimator(factor)
        before = np.asarray(est.win.kf_t).copy()
        diag = {}
        est._refine_scale_gravity(diag)
        assert "scale_refine" in diag
        after = np.asarray(est.win.kf_t)
        d_before = np.linalg.norm(before[1:] - before[0], axis=1)
        d_after = np.linalg.norm(after[1:] - after[0], axis=1)
        s_applied = np.median(d_after / np.maximum(d_before, 1e-9))
        np.testing.assert_allclose(s_applied * factor, 1.0, atol=0.08)

    def test_gate_rejects_degenerate_scale(self):
        factor = 4.0  # implies a correction of ~0.25 — outside (0.5, 2)
        est = self._scaled_estimator(factor)
        before = np.asarray(est.win.kf_t).copy()
        est._refine_scale_gravity({})
        np.testing.assert_allclose(np.asarray(est.win.kf_t), before)
        assert est.scale_refine_count == 0

    def test_refine_budget_respected(self):
        est = self._scaled_estimator(1.0)
        est.scale_refine_count = 12  # max_refines default
        before = np.asarray(est.win.kf_t).copy()
        est._refine_scale_gravity({})
        np.testing.assert_allclose(np.asarray(est.win.kf_t), before)

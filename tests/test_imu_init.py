"""Tests for visual-inertial initialization (gravity/scale/velocity/bias).

Synthesizes exact IMU from an analytic trajectory under gravity, feeds
VISION-scaled keyframe poses (unknown scale + tilted gravity) and checks
the solver recovers scale, gravity direction, velocities, and biases.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vio360_tpu.geometry import lie
from vio360_tpu.imu import preintegration as pre
from vio360_tpu.solver import imu_init

G = 9.81


def make_vi_scene(
    lam=0.25,  # vision scale: t_vision = lam * t_metric
    tilt=(0.08, -0.05),  # gravity tilt (theta_x, theta_y) in vision world
    bg=np.zeros(3),
    ba=np.zeros(3),
    n_kf=6,
    kf_dt=0.3,
    imu_hz=200.0,
    seed=0,
):
    """Returns (kf_r, kf_t_vision, preints, pair_valid, truth dict)."""
    r_wg = np.asarray(imu_init.gravity_dir_to_rotation(jnp.asarray(tilt, jnp.float32)))
    g_w = r_wg @ np.array([0.0, 0.0, -G])

    t_total = (n_kf - 1) * kf_dt
    dt = 1.0 / imu_hz
    ts = np.arange(0.0, t_total + dt / 2, dt)

    # Analytic metric trajectory (world frame)
    def pos(t):
        return np.stack(
            [0.8 * np.sin(1.1 * t), 0.5 * np.cos(0.9 * t) - 0.5, 0.3 * np.sin(0.7 * t)],
            axis=-1,
        )

    def rot(t):
        phi = np.stack([0.2 * np.sin(0.8 * t), 0.15 * t, 0.1 * np.cos(0.6 * t)], axis=-1)
        return np.asarray(jax.vmap(lie.so3_exp)(jnp.asarray(phi, jnp.float32)))

    p = pos(ts)
    r = rot(ts)
    v = np.gradient(p, dt, axis=0)
    a_w = np.gradient(v, dt, axis=0)

    # body-frame IMU with biases
    rows = np.zeros((len(ts), 7), np.float32)
    rows[:, 0] = ts
    for i in range(len(ts)):
        rows[i, 1:4] = r[i].T @ (a_w[i] - g_w) + ba
        if 0 < i < len(ts) - 1:
            dr = r[i - 1].T @ r[i + 1]
            w_vec = np.asarray(lie.so3_log(jnp.asarray(dr, jnp.float32))) / (2 * dt)
        else:
            w_vec = np.zeros(3)
        rows[i, 4:7] = w_vec + bg

    # keyframes + preintegrations between them (true biases unknown: 0)
    kf_idx = [int(round(i * kf_dt / dt)) for i in range(n_kf)]
    preints = []
    for i in range(n_kf - 1):
        lo, hi = kf_idx[i], kf_idx[i + 1]
        seg = jnp.asarray(rows[lo + 1 : hi + 1])
        m = jnp.ones(seg.shape[0], bool)
        preints.append(pre.preintegrate(seg, m, jnp.zeros(3), jnp.zeros(3)))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *preints)

    kf_r = jnp.asarray(r[kf_idx])
    kf_t_vision = jnp.asarray(p[kf_idx] * lam, jnp.float32)
    truth = {
        "scale": 1.0 / lam,
        "g_w": g_w,
        "vel": v[kf_idx],
        "bg": bg,
        "ba": ba,
        "t_metric": p[kf_idx],
    }
    return kf_r, kf_t_vision, stacked, jnp.ones(n_kf - 1, bool), truth


class TestImuInit:
    def test_recovers_scale_and_gravity(self):
        kf_r, kf_t, preints, valid, truth = make_vi_scene()
        res = imu_init.solve_imu_init(kf_r, kf_t, preints, valid)
        assert bool(res.success)
        assert float(res.scale) == pytest.approx(truth["scale"], rel=0.05)
        g_est = np.asarray(res.gravity_w)
        cos = g_est @ truth["g_w"] / (np.linalg.norm(g_est) * np.linalg.norm(truth["g_w"]))
        assert cos > 0.999, (g_est, truth["g_w"])

    def test_recovers_velocities(self):
        kf_r, kf_t, preints, valid, truth = make_vi_scene()
        res = imu_init.solve_imu_init(kf_r, kf_t, preints, valid)
        # stage-2 velocities are in vision units (scaled by s in the
        # residual): metric velocity = s * v_est
        v_metric = float(res.scale) * np.asarray(res.velocities)
        np.testing.assert_allclose(v_metric, truth["vel"], atol=0.08)

    def test_recovers_gyro_bias(self):
        bg = np.array([0.02, -0.015, 0.01])
        kf_r, kf_t, preints, valid, truth = make_vi_scene(bg=bg)
        res = imu_init.solve_imu_init(kf_r, kf_t, preints, valid)
        assert bool(res.success)
        np.testing.assert_allclose(np.asarray(res.bg), bg, atol=5e-3)

    def test_alignment_produces_metric_map(self):
        kf_r, kf_t, preints, valid, truth = make_vi_scene()
        res = imu_init.solve_imu_init(kf_r, kf_t, preints, valid)
        r_wg = imu_init.gravity_dir_to_rotation(res.gravity_dir)
        pts = kf_t  # reuse keyframe positions as stand-in landmarks
        r2, t2, v2, p2 = imu_init.align_gravity_and_scale(
            kf_r, kf_t, res.velocities, pts, r_wg, res.scale
        )
        # After alignment: displacements are metric
        d_est = np.linalg.norm(np.diff(np.asarray(t2), axis=0), axis=1)
        d_gt = np.linalg.norm(np.diff(truth["t_metric"], axis=0), axis=1)
        np.testing.assert_allclose(d_est, d_gt, rtol=0.06)
        # and gravity in the new world is along -Z: check by rotating the
        # estimated gravity vector
        g_new = np.asarray(r_wg).T @ np.asarray(res.gravity_w)
        np.testing.assert_allclose(g_new, [0, 0, -G], atol=1e-4)

    def test_insufficient_pairs(self):
        kf_r, kf_t, preints, valid, _ = make_vi_scene(n_kf=3)
        valid = valid.at[:].set(False).at[0].set(True)
        res = imu_init.solve_imu_init(kf_r, kf_t, preints, valid)
        assert not bool(res.success)

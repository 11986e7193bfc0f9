"""Tests for IMU preintegration: closed forms, bias Jacobians, propagation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vio360_tpu.geometry import lie
from vio360_tpu.imu import preintegration as pre

G = 9.81


def make_samples(n, hz=200.0, gyro=(0.0, 0.0, 0.0), accel=(0.0, 0.0, 0.0), t0=0.0):
    """Constant body-frame gyro/accel readings."""
    t = t0 + np.arange(n) / hz
    rows = np.zeros((n, 7), np.float32)
    rows[:, 0] = t
    rows[:, 1:4] = accel
    rows[:, 4:7] = gyro
    return jnp.asarray(rows), jnp.ones(n, bool)


class TestClosedForms:
    def test_constant_rotation(self):
        # Constant gyro about z: delta_R = exp(w * T)
        w = np.array([0.0, 0.0, 0.5])
        s, m = make_samples(200, gyro=w)
        p = pre.preintegrate(s, m, jnp.zeros(3), jnp.zeros(3))
        t_total = float(p.dt_total)
        expected = lie.so3_exp(jnp.asarray(w * t_total, jnp.float32))
        np.testing.assert_allclose(p.delta_r, expected, atol=1e-4)

    def test_constant_accel_no_rotation(self):
        a = np.array([0.3, -0.2, 9.81])
        s, m = make_samples(100, accel=a)
        p = pre.preintegrate(s, m, jnp.zeros(3), jnp.zeros(3))
        t = float(p.dt_total)
        np.testing.assert_allclose(p.delta_v, a * t, rtol=1e-4, atol=1e-5)
        # delta_p = 1/2 a t^2 up to discretization
        np.testing.assert_allclose(p.delta_p, 0.5 * a * t * t, rtol=2e-2)

    def test_mask_stops_integration(self):
        s, m = make_samples(100, accel=(1.0, 0, 0))
        m = m.at[50:].set(False)
        p = pre.preintegrate(s, m, jnp.zeros(3), jnp.zeros(3))
        assert int(p.n_samples) == 50
        assert float(p.dt_total) == pytest.approx(0.25, abs=1e-3)

    def test_bias_subtraction(self):
        w = np.array([0.01, -0.02, 0.03])
        s, m = make_samples(100, gyro=w)
        p = pre.preintegrate(s, m, jnp.asarray(w, jnp.float32), jnp.zeros(3))
        np.testing.assert_allclose(p.delta_r, np.eye(3), atol=1e-6)


class TestBiasJacobians:
    def cross_check(self, dbg, dba):
        rng = np.random.default_rng(0)
        n = 120
        t = np.arange(n) / 200.0
        rows = np.zeros((n, 7), np.float32)
        rows[:, 0] = t
        rows[:, 1:4] = np.array([0.2, 9.7, -0.3]) + rng.standard_normal((n, 3)) * 0.05
        rows[:, 4:7] = np.array([0.1, -0.2, 0.3]) + rng.standard_normal((n, 3)) * 0.02
        s = jnp.asarray(rows)
        m = jnp.ones(n, bool)
        bg0 = jnp.zeros(3)
        ba0 = jnp.zeros(3)
        p0 = pre.preintegrate(s, m, bg0, ba0)
        # First-order update via Jacobians
        p1 = pre.update_bias(p0, jnp.asarray(dbg, jnp.float32), jnp.asarray(dba, jnp.float32))
        # Ground truth: re-integrate at the new bias
        p2 = pre.preintegrate(s, m, jnp.asarray(dbg, jnp.float32), jnp.asarray(dba, jnp.float32))
        return p1, p2

    def test_gyro_bias_jacobian(self):
        p1, p2 = self.cross_check([1e-3, -2e-3, 1.5e-3], [0.0, 0.0, 0.0])
        np.testing.assert_allclose(p1.delta_r, p2.delta_r, atol=5e-5)
        np.testing.assert_allclose(p1.delta_v, p2.delta_v, atol=5e-4)
        np.testing.assert_allclose(p1.delta_p, p2.delta_p, atol=5e-4)

    def test_accel_bias_jacobian(self):
        p1, p2 = self.cross_check([0.0, 0.0, 0.0], [5e-3, -4e-3, 3e-3])
        np.testing.assert_allclose(p1.delta_v, p2.delta_v, atol=5e-5)
        np.testing.assert_allclose(p1.delta_p, p2.delta_p, atol=5e-5)

    def test_combined(self):
        p1, p2 = self.cross_check([1e-3, 1e-3, -1e-3], [3e-3, -2e-3, 2e-3])
        np.testing.assert_allclose(p1.delta_v, p2.delta_v, atol=1e-3)


class TestCovariance:
    def test_grows_with_time(self):
        s, m = make_samples(200, accel=(0, 0, 9.81), gyro=(0.1, 0, 0))
        p = pre.preintegrate(s, m, jnp.zeros(3), jnp.zeros(3))
        cov = np.asarray(p.cov)
        # rotation, velocity, position, bias blocks all positive
        assert np.trace(cov[0:3, 0:3]) > 0  # reference bug: this stayed 0
        assert np.trace(cov[3:6, 3:6]) > 0
        assert np.trace(cov[6:9, 6:9]) > 0
        assert np.trace(cov[9:15, 9:15]) > 0
        # symmetric PSD
        np.testing.assert_allclose(cov, cov.T, atol=1e-12)
        assert np.linalg.eigvalsh(cov).min() > -1e-12

    def test_longer_interval_more_uncertain(self):
        s, m = make_samples(200, gyro=(0.1, 0.05, 0))
        p_all = pre.preintegrate(s, m, jnp.zeros(3), jnp.zeros(3))
        p_half = pre.preintegrate(s, m.at[100:].set(False), jnp.zeros(3), jnp.zeros(3))
        assert np.trace(p_all.cov[:9, :9]) > np.trace(p_half.cov[:9, :9])


class TestPropagation:
    def test_stationary_gravity_cancels(self):
        # Body at rest, z-up world: accel measures +g in body frame.
        s, m = make_samples(100, accel=(0, 0, G))
        p = pre.preintegrate(s, m, jnp.zeros(3), jnp.zeros(3))
        g_w = jnp.array([0.0, 0.0, -G])
        r_j, p_j, v_j = pre.predict_state(jnp.eye(3), jnp.zeros(3), jnp.zeros(3), p, g_w)
        np.testing.assert_allclose(v_j, np.zeros(3), atol=1e-4)
        np.testing.assert_allclose(p_j, np.zeros(3), atol=1e-4)

    def test_free_fall(self):
        s, m = make_samples(100, accel=(0, 0, 0))  # accelerometer reads 0 in free fall
        p = pre.preintegrate(s, m, jnp.zeros(3), jnp.zeros(3))
        g_w = jnp.array([0.0, 0.0, -G])
        t = float(p.dt_total)
        r_j, p_j, v_j = pre.predict_state(jnp.eye(3), jnp.zeros(3), jnp.zeros(3), p, g_w)
        np.testing.assert_allclose(v_j, [0, 0, -G * t], rtol=1e-5)
        np.testing.assert_allclose(p_j, [0, 0, -0.5 * G * t * t], rtol=1e-4)


class TestStaticBias:
    def test_recovers_biases(self):
        rng = np.random.default_rng(1)
        n = 400
        bg = np.array([0.01, -0.02, 0.005])
        ba = np.array([0.05, 0.02, -0.03])
        g_body = np.array([0.1, 9.7, 1.2])
        g_body = g_body / np.linalg.norm(g_body) * G
        rows = np.zeros((n, 7), np.float32)
        rows[:, 0] = np.arange(n) / 200.0
        rows[:, 1:4] = g_body + ba + rng.standard_normal((n, 3)) * 1e-3
        rows[:, 4:7] = bg + rng.standard_normal((n, 3)) * 1e-4
        bg_e, ba_e, gdir = pre.estimate_static_bias(jnp.asarray(rows), jnp.ones(n, bool))
        np.testing.assert_allclose(bg_e, bg, atol=1e-4)
        # accel bias is observable only orthogonal to gravity here; check
        # the gravity direction instead
        np.testing.assert_allclose(
            np.asarray(gdir), g_body / G, atol=0.01
        )

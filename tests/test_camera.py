"""Unit tests for the ERP camera model (vio360_tpu.geometry.camera).

Golden values mirror reference Camera.cpp behavior; the projection
Jacobian is cross-checked against jax.jacfwd.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vio360_tpu.geometry import camera

W, H = 960, 480


class TestPixelBearing:
    def test_center_pixel_is_forward(self):
        b = camera.pixel_to_bearing(jnp.array([W / 2.0, H / 2.0]), W, H)
        np.testing.assert_allclose(b, [0.0, 0.0, 1.0], atol=1e-6)

    def test_quarter_right_is_plus_x(self):
        # u = 3W/4 -> lon = pi/2 -> X direction
        b = camera.pixel_to_bearing(jnp.array([0.75 * W, H / 2.0]), W, H)
        np.testing.assert_allclose(b, [1.0, 0.0, 0.0], atol=1e-6)

    def test_top_center_is_up(self):
        # v = 0 -> lat = pi/2 -> Y = -1 (Y-down frame, up is -Y)
        b = camera.pixel_to_bearing(jnp.array([W / 2.0, 0.0]), W, H)
        np.testing.assert_allclose(b, [0.0, -1.0, 0.0], atol=1e-6)

    def test_left_edge_is_backward(self):
        b = camera.pixel_to_bearing(jnp.array([0.0, H / 2.0]), W, H)
        np.testing.assert_allclose(b, [0.0, 0.0, -1.0], atol=1e-6)

    def test_roundtrip(self):
        rng = np.random.default_rng(1)
        uv = jnp.asarray(
            np.stack(
                [rng.uniform(1.0, W - 1.0, 100), rng.uniform(1.0, H - 1.0, 100)], axis=-1
            ),
            jnp.float32,
        )
        b = camera.pixel_to_bearing(uv, W, H)
        uv2 = camera.bearing_to_pixel(b, W, H)
        np.testing.assert_allclose(uv2, uv, atol=2e-2)

    def test_unit_norm(self):
        rng = np.random.default_rng(2)
        uv = jnp.asarray(rng.uniform(0, [W, H], (50, 2)), jnp.float32)
        b = camera.pixel_to_bearing(uv, W, H)
        np.testing.assert_allclose(jnp.linalg.norm(b, axis=-1), 1.0, atol=1e-6)

    def test_project_scale_invariant(self):
        p = jnp.array([1.0, 2.0, 3.0])
        np.testing.assert_allclose(
            camera.project(p, W, H), camera.project(5.0 * p, W, H), atol=1e-4
        )


class TestWrap:
    def test_wrap_residual(self):
        np.testing.assert_allclose(camera.wrap_residual_u(jnp.array(500.0), W), -460.0)
        np.testing.assert_allclose(camera.wrap_residual_u(jnp.array(-500.0), W), 460.0)
        np.testing.assert_allclose(camera.wrap_residual_u(jnp.array(100.0), W), 100.0)
        np.testing.assert_allclose(camera.wrap_residual_u(jnp.array(-479.0), W), -479.0)

    def test_wrap_pixel(self):
        np.testing.assert_allclose(camera.wrap_pixel_u(jnp.array(-10.0), W), 950.0)
        np.testing.assert_allclose(camera.wrap_pixel_u(jnp.array(970.0), W), 10.0)

    def test_residual_across_seam(self):
        # Observation near right edge, point projecting near left edge:
        # the true error is small through the seam.
        obs = jnp.array([W - 2.0, H / 2.0])
        b = camera.pixel_to_bearing(jnp.array([1.0, H / 2.0]), W, H)
        r = camera.reprojection_residual(obs, b, W, H)
        assert abs(float(r[0])) < 4.0


class TestRegions:
    def test_polar_region(self):
        assert bool(camera.is_in_polar_region(jnp.array([480.0, 10.0]), H, 0.15))
        assert bool(camera.is_in_polar_region(jnp.array([480.0, 475.0]), H, 0.15))
        assert not bool(camera.is_in_polar_region(jnp.array([480.0, 240.0]), H, 0.15))

    def test_boundary(self):
        assert bool(camera.is_near_boundary(jnp.array([5.0, 240.0]), W, H, 20.0))
        assert not bool(camera.is_near_boundary(jnp.array([480.0, 240.0]), W, H, 20.0))

    def test_polar_mask(self):
        m = camera.polar_mask(W, H, 0.15)
        assert m.shape == (H, W)
        assert not bool(m[0, 0])
        assert not bool(m[H - 1, 0])
        assert bool(m[H // 2, 0])
        # 15% top and bottom excluded -> 70% rows valid
        assert float(m.mean()) == pytest.approx(0.7, abs=0.01)


class TestJacobian:
    def test_matches_autodiff(self):
        rng = np.random.default_rng(3)
        pts = rng.standard_normal((20, 3)) * 3.0
        for p in pts:
            if np.hypot(p[0], p[2]) < 0.3:
                continue  # skip near-pole where chart is singular
            p = jnp.asarray(p, jnp.float32)
            j_analytic = camera.projection_jacobian(p, W, H)
            j_auto = jax.jacfwd(lambda q: camera.project(q, W, H))(p)
            np.testing.assert_allclose(j_analytic, j_auto, rtol=1e-3, atol=1e-3)

    def test_angular_distance(self):
        a = jnp.array([1.0, 0.0, 0.0])
        b = jnp.array([0.0, 1.0, 0.0])
        assert float(camera.angular_distance(a, b)) == pytest.approx(np.pi / 2, abs=1e-6)

"""Tests for mid-point and DLT triangulation against synthetic geometry."""

import jax.numpy as jnp
import numpy as np

from vio360_tpu.geometry import lie, triangulation


def make_scene(n=50, seed=0):
    rng = np.random.default_rng(seed)
    points = rng.uniform(-4, 4, (n, 3)) + np.array([0, 0, 6.0])
    # Relative pose frame1 -> frame2
    phi = np.array([0.02, -0.05, 0.03])
    r_21 = np.asarray(lie.so3_exp(jnp.asarray(phi, jnp.float32)))
    t_21 = np.array([0.8, -0.1, 0.2], np.float32)
    b1 = points / np.linalg.norm(points, axis=-1, keepdims=True)
    p2 = points @ r_21.T + t_21
    b2 = p2 / np.linalg.norm(p2, axis=-1, keepdims=True)
    return (
        jnp.asarray(points, jnp.float32),
        jnp.asarray(b1, jnp.float32),
        jnp.asarray(b2, jnp.float32),
        jnp.asarray(r_21),
        jnp.asarray(t_21),
    )


class TestMidpoint:
    def test_recovers_points(self):
        pts, b1, b2, r, t = make_scene()
        est, valid = triangulation.triangulate_midpoint(b1, b2, r, t)
        assert bool(valid.all())
        np.testing.assert_allclose(est, pts, rtol=1e-2, atol=2e-2)

    def test_behind_camera_points(self):
        # ERP sees backwards: negative-Z points must still triangulate.
        rng = np.random.default_rng(1)
        points = rng.uniform(-3, 3, (20, 3)) - np.array([0, 0, 7.0])
        r = jnp.eye(3)
        t = jnp.array([1.0, 0.0, 0.0])
        b1 = points / np.linalg.norm(points, axis=-1, keepdims=True)
        p2 = points + np.asarray(t)  # p_2 = R p_1 + t_21 with R = I
        b2 = p2 / np.linalg.norm(p2, axis=-1, keepdims=True)
        est, valid = triangulation.triangulate_midpoint(
            jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32), r, t
        )
        assert bool(valid.all())
        np.testing.assert_allclose(est, points, rtol=1e-2, atol=3e-2)

    def test_degenerate_parallel_rays(self):
        b = jnp.array([[0.0, 0.0, 1.0]])
        _, valid = triangulation.triangulate_midpoint(b, b, jnp.eye(3), jnp.zeros(3))
        assert not bool(valid[0])


class TestDLT:
    def test_recovers_points_world(self):
        pts, b1, b2, r, t = make_scene(seed=2)
        t1w = jnp.eye(4)
        t2w = lie.se3_matrix(r, t)  # world == frame1
        est, valid = triangulation.triangulate_dlt(b1, b2, t1w, t2w)
        assert bool(valid.all())
        np.testing.assert_allclose(est, pts, rtol=1e-2, atol=3e-2)

    def test_agrees_with_midpoint(self):
        pts, b1, b2, r, t = make_scene(seed=3)
        mid, _ = triangulation.triangulate_midpoint(b1, b2, r, t)
        dlt, _ = triangulation.triangulate_dlt(b1, b2, jnp.eye(4), lie.se3_matrix(r, t))
        np.testing.assert_allclose(mid, dlt, rtol=5e-2, atol=5e-2)

"""Tests for 8-point essential estimation + decomposition on bearings."""

import jax.numpy as jnp
import numpy as np

from vio360_tpu.geometry import essential, lie


def make_pair(n=60, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    points = rng.uniform(-5, 5, (n, 3)) + np.array([0, 0, 8.0])
    phi = np.array([0.05, 0.1, -0.07])
    r = np.asarray(lie.so3_exp(jnp.asarray(phi, jnp.float32)))
    t = np.array([1.0, 0.3, -0.2])
    t = t / np.linalg.norm(t)
    b1 = points / np.linalg.norm(points, axis=-1, keepdims=True)
    p2 = points @ r.T + t
    b2 = p2 / np.linalg.norm(p2, axis=-1, keepdims=True)
    if noise > 0:
        b2 = b2 + rng.standard_normal(b2.shape) * noise
        b2 /= np.linalg.norm(b2, axis=-1, keepdims=True)
    e_true = np.asarray(lie.hat(jnp.asarray(t, jnp.float32))) @ r
    return (
        jnp.asarray(b1, jnp.float32),
        jnp.asarray(b2, jnp.float32),
        jnp.asarray(r, jnp.float32),
        jnp.asarray(t, jnp.float32),
        jnp.asarray(e_true, jnp.float32),
    )


def normalize_e(e):
    e = np.asarray(e)
    e = e / np.linalg.norm(e)
    if e.flat[np.argmax(np.abs(e))] < 0:
        e = -e
    return e


class TestEightPoint:
    def test_exact_recovery(self):
        b1, b2, r, t, e_true = make_pair()
        e = essential.solve_eight_point(b1, b2)
        np.testing.assert_allclose(normalize_e(e), normalize_e(e_true), atol=1e-3)

    def test_epipolar_errors_zero_on_inliers(self):
        b1, b2, *_ = make_pair(seed=1)
        e = essential.solve_eight_point(b1, b2)
        err = essential.epipolar_errors(e, b1, b2)
        assert float(err.max()) < 1e-3

    def test_weighted_refit_ignores_outliers(self):
        b1, b2, r, t, e_true = make_pair(seed=2)
        b2_corrupt = b2.at[:10].set(jnp.array([0.0, 0.0, 1.0]))
        w = jnp.ones(b1.shape[0]).at[:10].set(0.0)
        e = essential.solve_eight_point(b1, b2_corrupt, weights=w)
        np.testing.assert_allclose(normalize_e(e), normalize_e(e_true), atol=1e-3)

    def test_rank2(self):
        b1, b2, *_ = make_pair(seed=3)
        e = essential.solve_eight_point(b1, b2)
        s = jnp.linalg.svd(e, compute_uv=False)
        assert float(s[2]) < 1e-5 * float(s[0])
        np.testing.assert_allclose(float(s[0]), float(s[1]), rtol=1e-4)


class TestDecompose:
    def test_contains_true_pose(self):
        b1, b2, r_true, t_true, e_true = make_pair(seed=4)
        rs, ts = essential.decompose_essential(e_true)
        found = False
        for i in range(4):
            dr = float(jnp.linalg.norm(rs[i] - r_true))
            dt = float(jnp.linalg.norm(ts[i] - t_true))
            if dr < 1e-2 and dt < 1e-2:
                found = True
        assert found

    def test_rotations_proper(self):
        *_, e_true = make_pair(seed=5)
        rs, ts = essential.decompose_essential(e_true)
        for i in range(4):
            assert float(jnp.linalg.det(rs[i])) > 0.99
        np.testing.assert_allclose(jnp.linalg.norm(ts, axis=-1), 1.0, atol=1e-5)

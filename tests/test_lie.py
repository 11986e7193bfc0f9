"""Unit tests for SO(3)/SE(3) ops (vio360_tpu.geometry.lie).

Cross-validates against scipy-free float64 NumPy constructions and
autodiff; mirrors the conventions of reference LieUtils.cpp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vio360_tpu.geometry import lie


def rand_phi(rng, scale=1.0):
    return jnp.asarray(rng.standard_normal(3) * scale, jnp.float32)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestSO3:
    def test_exp_identity(self):
        r = lie.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-6)

    def test_exp_known_axis(self):
        # 90 deg about z
        r = lie.so3_exp(jnp.array([0.0, 0.0, np.pi / 2]))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_allclose(r, expected, atol=1e-6)

    def test_exp_log_roundtrip(self, rng):
        for scale in [1e-7, 1e-4, 0.5, 2.0, 3.0]:
            phi = rand_phi(rng, scale)
            # keep |phi| < pi for uniqueness of log
            n = float(jnp.linalg.norm(phi))
            if n > 3.1:
                phi = phi / n * 3.0
            r = lie.so3_exp(phi)
            phi2 = lie.so3_log(r)
            np.testing.assert_allclose(phi2, phi, rtol=2e-4, atol=2e-6)

    def test_log_near_pi(self):
        axis = np.array([1.0, 2.0, -0.5])
        axis /= np.linalg.norm(axis)
        theta = np.pi - 1e-5
        phi = jnp.asarray(axis * theta, jnp.float32)
        r = lie.so3_exp(phi)
        phi2 = np.asarray(lie.so3_log(r))
        np.testing.assert_allclose(np.abs(phi2 @ axis), theta, rtol=1e-3)

    def test_orthogonality(self, rng):
        phi = rand_phi(rng)
        r = lie.so3_exp(phi)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert float(jnp.linalg.det(r)) == pytest.approx(1.0, abs=1e-5)

    def test_right_jacobian_finite_diff(self, rng):
        # exp(phi + d) ~= exp(phi) exp(Jr(phi) d)
        phi = rand_phi(rng, 0.7)
        jr = lie.so3_right_jacobian(phi)
        eps = 1e-3
        for k in range(3):
            d = jnp.zeros(3).at[k].set(eps)
            lhs = lie.so3_exp(phi + d)
            rhs = lie.so3_exp(phi) @ lie.so3_exp(jr @ d)
            np.testing.assert_allclose(lhs, rhs, atol=5e-5)

    def test_right_jacobian_inverse(self, rng):
        phi = rand_phi(rng, 1.2)
        jr = lie.so3_right_jacobian(phi)
        jri = lie.so3_right_jacobian_inv(phi)
        np.testing.assert_allclose(jr @ jri, np.eye(3), atol=1e-5)

    def test_hat_vee(self, rng):
        v = rand_phi(rng)
        m = lie.hat(v)
        np.testing.assert_allclose(m, -m.T, atol=0)
        np.testing.assert_allclose(lie.vee(m), v)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.standard_normal(6), jnp.float32)
        r, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(r, t)
        np.testing.assert_allclose(xi2, xi, rtol=1e-4, atol=1e-5)

    def test_twist_order_translation_first(self):
        # Pure translation twist: [rho, 0] -> t == rho
        xi = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
        r, t = lie.se3_exp(xi)
        np.testing.assert_allclose(r, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(t, [1.0, 2.0, 3.0], atol=1e-6)

    def test_compose_inverse(self, rng):
        xi = jnp.asarray(rng.standard_normal(6) * 0.5, jnp.float32)
        r, t = lie.se3_exp(xi)
        ri, ti = lie.se3_inverse(r, t)
        rc, tc = lie.se3_compose(r, t, ri, ti)
        np.testing.assert_allclose(rc, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(tc, np.zeros(3), atol=1e-5)

    def test_apply_matches_matrix(self, rng):
        xi = jnp.asarray(rng.standard_normal(6) * 0.5, jnp.float32)
        r, t = lie.se3_exp(xi)
        p = jnp.asarray(rng.standard_normal(3), jnp.float32)
        m = lie.se3_matrix(r, t)
        ph = jnp.concatenate([p, jnp.ones(1)])
        np.testing.assert_allclose(lie.se3_apply(r, t, p), (m @ ph)[:3], rtol=1e-5, atol=1e-5)


class TestInterp:
    def test_slerp_endpoints(self, rng):
        r0 = lie.so3_exp(jnp.asarray(rng.standard_normal(3), jnp.float32))
        r1 = lie.so3_exp(jnp.asarray(rng.standard_normal(3), jnp.float32))
        np.testing.assert_allclose(lie.slerp(r0, r1, 0.0), r0, atol=1e-5)
        np.testing.assert_allclose(lie.slerp(r0, r1, 1.0), r1, atol=1e-5)

    def test_slerp_halfway_geodesic(self):
        r0 = jnp.eye(3)
        r1 = lie.so3_exp(jnp.array([0.0, 0.0, 1.0]))
        mid = lie.slerp(r0, r1, 0.5)
        np.testing.assert_allclose(mid, lie.so3_exp(jnp.array([0.0, 0.0, 0.5])), atol=1e-5)

    def test_orthonormalize(self, rng):
        r = lie.so3_exp(rand_phi(rng))
        noisy = r + 0.01 * jnp.asarray(rng.standard_normal((3, 3)), jnp.float32)
        fixed = lie.rotation_orthonormalize(noisy)
        np.testing.assert_allclose(fixed @ fixed.T, np.eye(3), atol=1e-5)
        assert float(jnp.linalg.det(fixed)) == pytest.approx(1.0, abs=1e-5)

    def test_so3_renormalize_snaps_near_rotation(self, rng):
        r = lie.so3_exp(rand_phi(rng))
        noisy = r + 1e-3 * jnp.asarray(rng.standard_normal((3, 3)), jnp.float32)
        fixed = lie.so3_renormalize(noisy)
        np.testing.assert_allclose(fixed @ fixed.T, np.eye(3), atol=1e-6)
        # batched
        rs = lie.so3_exp_b(jnp.asarray(rng.standard_normal((8, 3)), jnp.float32))
        noisy_b = rs + 1e-4 * jnp.asarray(rng.standard_normal((8, 3, 3)), jnp.float32)
        fixed_b = lie.so3_renormalize(noisy_b)
        err = jnp.abs(fixed_b @ jnp.swapaxes(fixed_b, -1, -2) - jnp.eye(3)).max()
        assert float(err) < 1e-6

    def test_const_velocity_composition_stays_on_manifold(self, rng):
        """The VO prediction R_cur (R_prev^T R_cur) amplifies off-manifold
        f32 error geometrically (~2.4x/frame measured: eps -> 0.29 in 23
        frames, then inf). With the renorm the deviation stays at eps."""
        r_prev = lie.so3_exp(rand_phi(rng))
        r_cur = lie.so3_exp(rand_phi(rng))
        for _ in range(200):
            r_pred = lie.so3_renormalize(r_cur @ (r_prev.T @ r_cur))
            r_prev, r_cur = r_cur, r_pred
        dev = float(jnp.abs(r_cur @ r_cur.T - jnp.eye(3)).max())
        assert dev < 1e-5, dev


class TestBatched:
    def test_vmap_consistency(self, rng):
        phis = jnp.asarray(rng.standard_normal((16, 3)), jnp.float32)
        rs = lie.so3_exp_b(phis)
        for i in range(16):
            np.testing.assert_allclose(rs[i], lie.so3_exp(phis[i]), atol=1e-6)

    def test_jit_no_recompile_shapes(self):
        f = jax.jit(lie.so3_exp)
        f(jnp.zeros(3))
        f(jnp.ones(3))  # same shape, cached

"""Tests for the LM solver stack: factors (vs autodiff), PnP, windowed BA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from vio360_tpu.geometry import camera as cam
from vio360_tpu.geometry import lie
from vio360_tpu.solver import ba, factors, pnp
from vio360_tpu.utils import metrics

W, H = 960, 480


def build_scene(n_points=120, n_frames=4, seed=0, noise_px=0.0):
    pts = synthetic.make_point_world(seed, n_points)
    rs, ts = synthetic.make_trajectory(n_frames, step=0.15, rot_step=0.02)
    uv, brg = synthetic.project_tracks(pts, rs, ts, W, H, noise_px=noise_px, seed=seed)
    return (
        jnp.asarray(pts),
        jnp.asarray(rs),
        jnp.asarray(ts),
        jnp.asarray(uv),
        jnp.asarray(brg),
    )


IDENTITY_EXTR = (jnp.eye(3), jnp.zeros(3))


class TestFactorJacobians:
    def test_pose_jacobian_matches_autodiff(self):
        pts, rs, ts, uv, _ = build_scene()
        r0, t0 = rs[1], ts[1]
        r_cb, t_cb = IDENTITY_EXTR

        def residual_of_xi(xi):
            dr, dt = lie.se3_exp(xi)
            r, t = lie.se3_compose(r0, t0, dr, dt)
            _, p_c = factors.transform_points(r[None], t[None], r_cb, t_cb, pts)
            return factors.reprojection_residual(p_c[0], uv[1], W, H)

        j_auto = jax.jacfwd(residual_of_xi)(jnp.zeros(6))  # [M,2,6]
        p_b, p_c = factors.transform_points(r0[None], t0[None], r_cb, t_cb, pts)
        j_pose, _ = factors.reprojection_jacobians(p_b[0], p_c[0], r0, r_cb, W, H)
        np.testing.assert_allclose(j_pose, j_auto, rtol=5e-2, atol=5e-2)

    def test_point_jacobian_matches_autodiff(self):
        pts, rs, ts, uv, _ = build_scene()
        r0, t0 = rs[2], ts[2]
        r_cb, t_cb = IDENTITY_EXTR

        def residual_of_point(p, obs):
            _, p_c = factors.transform_points(r0[None], t0[None], r_cb, t_cb, p[None])
            return factors.reprojection_residual(p_c[0, 0], obs, W, H)

        p_b, p_c = factors.transform_points(r0[None], t0[None], r_cb, t_cb, pts)
        _, j_pt = factors.reprojection_jacobians(p_b[0], p_c[0], r0, r_cb, W, H)
        for i in [0, 7, 31]:
            j_auto = jax.jacfwd(residual_of_point)(pts[i], uv[2, i])
            np.testing.assert_allclose(j_pt[i], j_auto, rtol=5e-3, atol=1e-3)

    def test_extrinsics_jacobian(self):
        # Nontrivial T_cb
        pts, rs, ts, uv, _ = build_scene(seed=3)
        r_cb = lie.so3_exp(jnp.array([0.1, -0.2, 0.05]))
        t_cb = jnp.array([0.01, 0.02, -0.01])
        r0, t0 = rs[1], ts[1]
        _, p_c = factors.transform_points(r0[None], t0[None], r_cb, t_cb, pts)
        obs = cam.project(p_c[0], W, H)

        def residual_of_xi(xi):
            dr, dt = lie.se3_exp(xi)
            r, t = lie.se3_compose(r0, t0, dr, dt)
            _, pc = factors.transform_points(r[None], t[None], r_cb, t_cb, pts)
            return factors.reprojection_residual(pc[0], obs, W, H)

        j_auto = jax.jacfwd(residual_of_xi)(jnp.zeros(6))
        p_b, p_c = factors.transform_points(r0[None], t0[None], r_cb, t_cb, pts)
        j_pose, _ = factors.reprojection_jacobians(p_b[0], p_c[0], r0, r_cb, W, H)
        np.testing.assert_allclose(j_pose, j_auto, rtol=5e-2, atol=5e-2)

    def test_huber_weight(self):
        assert float(factors.huber_weight(jnp.asarray(0.5), 1.0)) == 1.0
        assert float(factors.huber_weight(jnp.asarray(4.0), 1.0)) == pytest.approx(0.5)


class TestPnP:
    def run(self, perturb, outlier_frac=0.0, n_points=100, seed=0):
        pts, rs, ts, uv, _ = build_scene(n_points=n_points, seed=seed)
        r_gt, t_gt = rs[2], ts[2]
        obs = uv[2]
        rng = np.random.default_rng(seed)
        active = np.ones(n_points, bool)
        obs = np.array(obs)
        n_out = int(outlier_frac * n_points)
        out_idx = rng.choice(n_points, n_out, replace=False)
        obs[out_idx] += rng.uniform(30, 60, (n_out, 2)) * np.sign(rng.standard_normal((n_out, 2)))
        dr, dt = lie.se3_exp(jnp.asarray(perturb, jnp.float32))
        r0, t0 = lie.se3_compose(r_gt, t_gt, dr, dt)
        res = pnp.solve_pnp(
            r0, t0, pts, jnp.asarray(obs), jnp.asarray(active),
            jnp.zeros(n_points, bool), *IDENTITY_EXTR, W, H,
        )
        return res, r_gt, t_gt, out_idx

    def test_recovers_exact_pose(self):
        res, r_gt, t_gt, _ = self.run([0.1, -0.05, 0.08, 0.02, -0.03, 0.01])
        assert bool(res.success)
        np.testing.assert_allclose(res.r_wb, r_gt, atol=1e-3)
        np.testing.assert_allclose(res.t_wb, t_gt, atol=5e-3)
        assert int(res.num_inliers) == 100

    def test_robust_to_outliers(self):
        res, r_gt, t_gt, out_idx = self.run(
            [0.05, 0.02, -0.04, 0.01, 0.02, -0.01], outlier_frac=0.3
        )
        assert bool(res.success)
        np.testing.assert_allclose(res.r_wb, r_gt, atol=2e-3)
        np.testing.assert_allclose(res.t_wb, t_gt, atol=1e-2)
        out = np.asarray(res.outlier)
        assert out[out_idx].mean() > 0.9

    def test_too_few_inliers_keeps_init(self):
        pts, rs, ts, uv, _ = build_scene(n_points=20, seed=1)
        active = jnp.zeros(20, bool).at[:5].set(True)
        r0, t0 = rs[0], ts[0] + 0.5
        res = pnp.solve_pnp(
            r0, t0, pts, uv[0], active, jnp.zeros(20, bool), *IDENTITY_EXTR, W, H,
        )
        assert not bool(res.success)
        np.testing.assert_allclose(res.t_wb, t0)

    def test_marginalized_never_outlier(self):
        pts, rs, ts, uv, _ = build_scene(n_points=50, seed=2)
        obs = np.array(uv[1])
        obs[:5] += 50.0  # gross errors on marginalized points
        marg = jnp.zeros(50, bool).at[:5].set(True)
        res = pnp.solve_pnp(
            rs[1], ts[1], pts, jnp.asarray(obs), jnp.ones(50, bool), marg,
            *IDENTITY_EXTR, W, H,
        )
        assert not bool(res.outlier[:5].any())


class TestBA:
    def test_refines_noisy_window(self):
        pts, rs, ts, uv, _ = build_scene(n_points=150, n_frames=5, seed=4)
        k, m = 5, 150
        rng = np.random.default_rng(4)

        # Perturb all but first pose and all points
        rs_n, ts_n = [np.asarray(rs[0])], [np.asarray(ts[0])]
        for i in range(1, k):
            dr, dt = lie.se3_exp(jnp.asarray(rng.standard_normal(6) * 0.01, jnp.float32))
            r, t = lie.se3_compose(rs[i], ts[i], dr, dt)
            rs_n.append(np.asarray(r))
            ts_n.append(np.asarray(t))
        pts_n = np.asarray(pts) + rng.standard_normal((m, 3)).astype(np.float32) * 0.05

        obs_mask = jnp.ones((k, m), bool)
        fixed_pose = jnp.zeros(k, bool).at[0].set(True)
        fixed_point = jnp.zeros(m, bool)

        res = ba.run_ba(
            jnp.asarray(np.stack(rs_n)), jnp.asarray(np.stack(ts_n)),
            jnp.asarray(pts_n), uv, obs_mask, fixed_pose, fixed_point,
            jnp.zeros(m, bool), *IDENTITY_EXTR, W, H,
        )
        assert float(res.final_cost) < 1e-2 * float(res.initial_cost)
        # Trajectory matches GT after sim3 alignment (scale gauge is free)
        r = metrics.ate(np.asarray(res.t_wb), np.asarray(ts), align="sim3")
        assert r.rmse < 2e-3, r

    def test_fixed_pose_stays(self):
        pts, rs, ts, uv, _ = build_scene(n_points=80, n_frames=3, seed=5)
        res = ba.run_ba(
            rs, ts, pts, uv, jnp.ones((3, 80), bool),
            jnp.zeros(3, bool).at[0].set(True), jnp.zeros(80, bool),
            jnp.zeros(80, bool), *IDENTITY_EXTR, W, H,
        )
        np.testing.assert_allclose(res.r_wb[0], rs[0], atol=1e-7)
        np.testing.assert_allclose(res.t_wb[0], ts[0], atol=1e-7)

    def test_fixed_points_stay(self):
        pts, rs, ts, uv, _ = build_scene(n_points=80, n_frames=3, seed=6)
        pts_n = jnp.asarray(np.asarray(pts) + 0.1)
        fixed_point = jnp.zeros(80, bool).at[:10].set(True)
        res = ba.run_ba(
            rs, ts, pts_n, uv, jnp.ones((3, 80), bool),
            jnp.zeros(3, bool).at[0].set(True), fixed_point,
            fixed_point, *IDENTITY_EXTR, W, H,
        )
        np.testing.assert_allclose(res.points[:10], pts_n[:10], atol=1e-7)

    def test_bad_landmark_marking(self):
        pts, rs, ts, uv, _ = build_scene(n_points=60, n_frames=4, seed=7)
        obs = np.array(uv)
        rng = np.random.default_rng(7)
        # landmarks 0-2 corrupted INCONSISTENTLY per frame (not fittable by
        # moving the 3D point)
        obs[:, :3] += rng.uniform(40, 90, (4, 3, 2)) * np.sign(
            rng.standard_normal((4, 3, 2))
        )
        res = ba.run_ba(
            rs, ts, pts, jnp.asarray(obs), jnp.ones((4, 60), bool),
            jnp.zeros(4, bool).at[0].set(True), jnp.zeros(60, bool),
            jnp.zeros(60, bool), *IDENTITY_EXTR, W, H,
        )
        bad = np.asarray(res.new_bad)
        out_per_lm = np.asarray(res.outlier_obs).sum(axis=0)
        # Corrupted landmarks accumulate outlier observations; at least the
        # fully-outlier one goes bad (reference rule: 0 inliers AND >=2
        # outliers, Optimizer.cpp:445-460 — a single fitted obs keeps it).
        assert (out_per_lm[:3] >= 2).all()
        assert bad[:3].any()
        assert bad[3:].sum() == 0

    def test_masked_observations_ignored(self):
        pts, rs, ts, uv, _ = build_scene(n_points=50, n_frames=3, seed=8)
        obs = np.array(uv)
        obs[1, :10] = 0.0  # garbage, but masked out
        mask = np.ones((3, 50), bool)
        mask[1, :10] = False
        res = ba.run_ba(
            rs, ts, pts, jnp.asarray(obs), jnp.asarray(mask),
            jnp.zeros(3, bool).at[0].set(True), jnp.zeros(50, bool),
            jnp.zeros(50, bool), *IDENTITY_EXTR, W, H,
        )
        assert float(res.final_cost) < 1e-4

"""Distributed BA tests on the virtual 8-device CPU mesh.

Asserts the landmark-sharded Schur BA equals the single-device solver
(SURVEY.md §4 (4)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from vio360_tpu.geometry import lie
from vio360_tpu.parallel import dist_ba, mesh as mesh_mod
from vio360_tpu.solver import ba

W, H = 960, 480


def build_batch(b=2, k=4, m=64, seed=0):
    rng = np.random.default_rng(seed)
    rs_all, ts_all, pts_all, uv_all = [], [], [], []
    for s in range(b):
        pts = synthetic.make_point_world(seed + s, m)
        rs, ts = synthetic.make_trajectory(k, step=0.3)
        uv, _ = synthetic.project_tracks(pts, rs, ts, W, H)
        # perturb
        rs_n, ts_n = [rs[0]], [ts[0]]
        for i in range(1, k):
            dr, dt = lie.se3_exp(jnp.asarray(rng.standard_normal(6) * 0.01, jnp.float32))
            r, t = lie.se3_compose(jnp.asarray(rs[i]), jnp.asarray(ts[i]), dr, dt)
            rs_n.append(np.asarray(r))
            ts_n.append(np.asarray(t))
        pts_n = pts + rng.standard_normal((m, 3)).astype(np.float32) * 0.05
        rs_all.append(np.stack(rs_n))
        ts_all.append(np.stack(ts_n))
        pts_all.append(pts_n)
        uv_all.append(uv)
    return (
        jnp.asarray(np.stack(rs_all)),
        jnp.asarray(np.stack(ts_all)),
        jnp.asarray(np.stack(pts_all)),
        jnp.asarray(np.stack(uv_all)),
    )


@pytest.fixture(scope="module")
def batch():
    return build_batch()


class TestDistBA:
    def test_matches_single_device(self, batch):
        rs, ts, pts, uv = batch
        b, k, m = rs.shape[0], rs.shape[1], pts.shape[1]
        mask = jnp.ones((b, k, m), bool)
        fixed_pose = jnp.zeros((b, k), bool).at[:, 0].set(True)
        fixed_point = jnp.zeros((b, m), bool)
        r_cb, t_cb = jnp.eye(3), jnp.zeros(3)

        msh = mesh_mod.make_mesh(n_seq=2, n_lm=4)
        fn = dist_ba.make_dist_ba(msh, W, H)
        r_d, t_d, p_d, cost_d, cost0_d, it_d = fn(
            rs, ts, pts, uv, mask, fixed_pose, fixed_point, r_cb, t_cb
        )

        for s in range(b):
            res = ba.run_ba(
                rs[s], ts[s], pts[s], uv[s], mask[s], fixed_pose[s], fixed_point[s],
                jnp.zeros(m, bool), r_cb, t_cb, W, H,
            )
            # same robust cost minimum and same poses
            np.testing.assert_allclose(cost_d[s], res.final_cost, rtol=1e-3, atol=1e-4)
            np.testing.assert_allclose(r_d[s], res.r_wb, atol=5e-4)
            np.testing.assert_allclose(t_d[s], res.t_wb, atol=5e-4)
            np.testing.assert_allclose(p_d[s], res.points, atol=5e-3)

    def test_seq_axis_independent(self, batch):
        # Each sequence's result must not depend on the other's data.
        rs, ts, pts, uv = batch
        b, k, m = rs.shape[0], rs.shape[1], pts.shape[1]
        mask = jnp.ones((b, k, m), bool)
        fixed_pose = jnp.zeros((b, k), bool).at[:, 0].set(True)
        fixed_point = jnp.zeros((b, m), bool)
        r_cb, t_cb = jnp.eye(3), jnp.zeros(3)
        msh = mesh_mod.make_mesh(n_seq=2, n_lm=4)
        fn = dist_ba.make_dist_ba(msh, W, H)
        out1 = fn(rs, ts, pts, uv, mask, fixed_pose, fixed_point, r_cb, t_cb)
        # corrupt sequence 1's data, sequence 0 result must be unchanged
        uv2 = uv.at[1].add(3.0)
        out2 = fn(rs, ts, pts, uv2, mask, fixed_pose, fixed_point, r_cb, t_cb)
        np.testing.assert_allclose(out1[1][0], out2[1][0], atol=1e-6)

    def test_eight_way_lm_sharding(self):
        rs, ts, pts, uv = build_batch(b=1, k=3, m=128, seed=3)
        b, k, m = 1, 3, 128
        mask = jnp.ones((b, k, m), bool)
        fixed_pose = jnp.zeros((b, k), bool).at[:, 0].set(True)
        fixed_point = jnp.zeros((b, m), bool)
        r_cb, t_cb = jnp.eye(3), jnp.zeros(3)
        msh = mesh_mod.make_mesh(n_seq=1, n_lm=8)
        fn = dist_ba.make_dist_ba(msh, W, H)
        r_d, t_d, p_d, cost_d, *_ = fn(
            rs, ts, pts, uv, mask, fixed_pose, fixed_point, r_cb, t_cb
        )
        res = ba.run_ba(
            rs[0], ts[0], pts[0], uv[0], mask[0], fixed_pose[0], fixed_point[0],
            jnp.zeros(m, bool), r_cb, t_cb, W, H,
        )
        np.testing.assert_allclose(cost_d[0], res.final_cost, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(t_d[0], res.t_wb, atol=5e-4)

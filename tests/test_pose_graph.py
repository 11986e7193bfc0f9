"""Pose-graph optimization tests (solver/pose_graph.py).

SURVEY.md §4 strategy: golden/closed-form checks at the unit level,
drift-reduction on synthetic graphs, sharded == unsharded on the
virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vio360_tpu.geometry import lie
from vio360_tpu.parallel import dist_pose_graph, mesh as mesh_mod
from vio360_tpu.solver import pose_graph


def make_circle_trajectory(p, radius=2.0):
    """Ground-truth poses on a circle with tangent heading."""
    ang = np.linspace(0.0, 1.5 * np.pi, p)
    ts = np.stack([radius * np.cos(ang), radius * np.sin(ang), 0.1 * ang], -1)
    rs = []
    for a in ang:
        c, s = np.cos(a), np.sin(a)
        rs.append(np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]))
    return np.stack(rs).astype(np.float32), ts.astype(np.float32)


def rel_pose(r_i, t_i, r_j, t_j):
    ri_inv, ti_inv = lie.se3_inverse(jnp.asarray(r_i), jnp.asarray(t_i))
    return lie.se3_compose(ri_inv, ti_inv, jnp.asarray(r_j), jnp.asarray(t_j))


def build_graph(rs, ts, skip=(1, 2), rng=None):
    """Exact relative edges for the given strides."""
    p = len(rs)
    ei, ej, rr, rt = [], [], [], []
    for s in skip:
        for i in range(p - s):
            r, t = rel_pose(rs[i], ts[i], rs[i + s], ts[i + s])
            ei.append(i)
            ej.append(i + s)
            rr.append(np.asarray(r))
            rt.append(np.asarray(t))
    c = len(ei)
    return (
        jnp.asarray(ei, jnp.int32),
        jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.stack(rr), jnp.float32),
        jnp.asarray(np.stack(rt), jnp.float32),
        jnp.ones((c, 6), jnp.float32),
        jnp.ones((c,), bool),
    )


def perturb(rs, ts, sigma_t, sigma_r, seed=0, keep_first=1):
    rng = np.random.default_rng(seed)
    rs2, ts2 = rs.copy(), ts.copy()
    for i in range(keep_first, len(rs)):
        xi = np.concatenate([
            rng.standard_normal(3) * sigma_t, rng.standard_normal(3) * sigma_r
        ]).astype(np.float32)
        dr, dt = lie.se3_exp(jnp.asarray(xi))
        r, t = lie.se3_compose(jnp.asarray(rs[i]), jnp.asarray(ts[i]), dr, dt)
        rs2[i], ts2[i] = np.asarray(r), np.asarray(t)
    return rs2, ts2


class TestPoseGraphCore:
    def test_zero_residual_at_ground_truth(self):
        rs, ts = make_circle_trajectory(8)
        ei, ej, rr, rt, w, ev = build_graph(rs, ts)
        fixed = jnp.zeros(8, bool).at[0].set(True)
        res = pose_graph.optimize_pose_graph(
            jnp.asarray(rs), jnp.asarray(ts), ei, ej, rr, rt, w, ev, fixed
        )
        assert float(res.initial_cost) < 1e-8
        np.testing.assert_allclose(np.asarray(res.t_wb), ts, atol=1e-5)

    def test_recovers_perturbed_trajectory(self):
        """Exact redundant constraints + noisy initial guess: the solve
        must pull every pose back to ground truth (graph is rigid with
        one anchor)."""
        p = 16
        rs, ts = make_circle_trajectory(p)
        ei, ej, rr, rt, w, ev = build_graph(rs, ts, skip=(1, 2))
        rs0, ts0 = perturb(rs, ts, sigma_t=0.15, sigma_r=0.05, keep_first=1)
        fixed = jnp.zeros(p, bool).at[0].set(True)
        res = pose_graph.optimize_pose_graph(
            jnp.asarray(rs0), jnp.asarray(ts0), ei, ej, rr, rt, w, ev, fixed
        )
        err0 = np.linalg.norm(ts0 - ts, axis=1).max()
        err1 = np.linalg.norm(np.asarray(res.t_wb) - ts, axis=1).max()
        assert err0 > 0.1
        assert err1 < 1e-3, (err0, err1)
        assert float(res.final_cost) < float(res.initial_cost) * 1e-6

    def test_drift_reduction_odometry_plus_anchors(self):
        """The estimator's operating mode: a drifty odometry chain of
        evicted keyframes whose tail poses (the live window) are pinned
        at refined values. Pose-graph optimization must propagate the
        endpoint correction back through the chain, beating the
        window-only (frozen-history) trajectory."""
        p = 24
        rs, ts = make_circle_trajectory(p)
        rng = np.random.default_rng(3)

        # Odometry with small noise -> integrated chain drifts.
        rs_odo = np.zeros_like(rs)
        ts_odo = np.zeros_like(ts)
        rs_odo[0], ts_odo[0] = rs[0], ts[0]
        ei, ej, rr, rt = [], [], [], []
        for i in range(p - 1):
            r, t = rel_pose(rs[i], ts[i], rs[i + 1], ts[i + 1])
            xi = np.concatenate([
                rng.standard_normal(3) * 0.02, rng.standard_normal(3) * 0.004
            ]).astype(np.float32)
            dr, dt = lie.se3_exp(jnp.asarray(xi))
            r, t = lie.se3_compose(r, t, dr, dt)
            ei.append(i)
            ej.append(i + 1)
            rr.append(np.asarray(r))
            rt.append(np.asarray(t))
            rn, tn = lie.se3_compose(
                jnp.asarray(rs_odo[i]), jnp.asarray(ts_odo[i]), r, t
            )
            rs_odo[i + 1], ts_odo[i + 1] = np.asarray(rn), np.asarray(tn)

        # Live window (last 4 poses) pinned at ground truth = the
        # BA-refined present; first pose is the world anchor.
        fixed = np.zeros(p, bool)
        fixed[0] = True
        fixed[-4:] = True
        rs0, ts0 = rs_odo.copy(), ts_odo.copy()
        rs0[fixed], ts0[fixed] = rs[fixed], ts[fixed]

        res = pose_graph.optimize_pose_graph(
            jnp.asarray(rs0), jnp.asarray(ts0),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(rr), jnp.float32),
            jnp.asarray(np.stack(rt), jnp.float32),
            jnp.ones((p - 1, 6), jnp.float32),
            jnp.ones((p - 1,), bool),
            jnp.asarray(fixed),
        )
        drift_before = float(np.sqrt(np.mean(
            np.sum((ts_odo - ts) ** 2, axis=1))))
        drift_after = float(np.sqrt(np.mean(
            np.sum((np.asarray(res.t_wb) - ts) ** 2, axis=1))))
        assert drift_after < 0.5 * drift_before, (drift_before, drift_after)

    def test_invalid_edges_ignored(self):
        p = 8
        rs, ts = make_circle_trajectory(p)
        ei, ej, rr, rt, w, ev = build_graph(rs, ts, skip=(1,))
        # Append a GARBAGE edge, masked invalid.
        ei = jnp.concatenate([ei, jnp.asarray([0], jnp.int32)])
        ej = jnp.concatenate([ej, jnp.asarray([5], jnp.int32)])
        rr = jnp.concatenate([rr, jnp.eye(3)[None]])
        rt = jnp.concatenate([rt, jnp.asarray([[9.0, 9.0, 9.0]])])
        w = jnp.concatenate([w, jnp.ones((1, 6))])
        ev = jnp.concatenate([ev, jnp.asarray([False])])
        fixed = jnp.zeros(p, bool).at[0].set(True)
        res = pose_graph.optimize_pose_graph(
            jnp.asarray(rs), jnp.asarray(ts), ei, ej, rr, rt, w, ev, fixed
        )
        assert float(res.initial_cost) < 1e-8
        np.testing.assert_allclose(np.asarray(res.t_wb), ts, atol=1e-5)

    def test_fixed_poses_untouched(self):
        p = 10
        rs, ts = make_circle_trajectory(p)
        ei, ej, rr, rt, w, ev = build_graph(rs, ts, skip=(1,))
        rs0, ts0 = perturb(rs, ts, sigma_t=0.1, sigma_r=0.03, keep_first=2)
        fixed = jnp.zeros(p, bool).at[0].set(True).at[1].set(True)
        res = pose_graph.optimize_pose_graph(
            jnp.asarray(rs0), jnp.asarray(ts0), ei, ej, rr, rt, w, ev, fixed
        )
        np.testing.assert_allclose(np.asarray(res.t_wb)[:2], ts0[:2], atol=1e-7)
        np.testing.assert_allclose(np.asarray(res.r_wb)[:2], rs0[:2], atol=1e-6)


class TestDistributedPoseGraph:
    def test_sharded_equals_unsharded(self):
        p = 16
        rs, ts = make_circle_trajectory(p)
        ei, ej, rr, rt, w, ev = build_graph(rs, ts, skip=(1, 2))
        # Pad edges to a multiple of 8 with invalid entries.
        c = ei.shape[0]
        pad = (-c) % 8
        ei = jnp.concatenate([ei, jnp.zeros(pad, jnp.int32)])
        ej = jnp.concatenate([ej, jnp.zeros(pad, jnp.int32)])
        rr = jnp.concatenate([rr, jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))])
        rt = jnp.concatenate([rt, jnp.zeros((pad, 3))])
        w = jnp.concatenate([w, jnp.zeros((pad, 6))])
        ev = jnp.concatenate([ev, jnp.zeros(pad, bool)])
        rs0, ts0 = perturb(rs, ts, sigma_t=0.1, sigma_r=0.03)
        fixed = jnp.zeros(p, bool).at[0].set(True)

        args = (jnp.asarray(rs0), jnp.asarray(ts0), ei, ej, rr, rt, w, ev, fixed)
        single = pose_graph.optimize_pose_graph(*args, max_iterations=30)

        msh = mesh_mod.make_mesh(n_seq=1, n_lm=8)
        fn = dist_pose_graph.make_dist_pose_graph(msh, max_iterations=30)
        dist = fn(*args)

        np.testing.assert_allclose(
            np.asarray(dist.t_wb), np.asarray(single.t_wb), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(dist.r_wb), np.asarray(single.r_wb), atol=1e-4
        )
        # Both must actually have solved the graph.
        np.testing.assert_allclose(np.asarray(dist.t_wb), ts, atol=1e-3)


class TestSim3Graph:
    """Sim(3) pose graph (solver/pose_graph.py::optimize_pose_graph_sim3)
    — scale-drift-aware loop closure for monocular VO. The defining
    property an SE(3) graph lacks: a trajectory whose odometry scale
    drifts lap-over-lap is EXACTLY repaired once a loop edge ties the
    revisit back to the first-visit scale."""

    def _scale_drift_problem(self, n=12, drift=1.5):
        """Ground truth: unit-spaced waypoints on a closed loop.
        Odometry measurements: correct directions, but lengths scaled
        by a growing factor (monocular scale drift). One loop edge
        (last -> first revisit) measured at TRUE scale."""
        # ground-truth square loop
        gt_t = []
        for k in range(n):
            ang = 2 * np.pi * k / n
            gt_t.append([2 * np.cos(ang), 0.0, 2 * np.sin(ang)])
        gt_t = np.asarray(gt_t, np.float32)
        gt_r = np.stack([np.eye(3, dtype=np.float32)] * n)

        # odometry-integrated estimate with per-step scale drift
        est_t = [gt_t[0]]
        for k in range(n - 1):
            s_k = drift ** ((k + 1) / n)
            step = (gt_t[k + 1] - gt_t[k]) * s_k
            est_t.append(est_t[-1] + step)
        est_t = np.asarray(est_t, np.float32)

        ei, ej, rel_r, rel_t, w = [], [], [], [], []
        for k in range(n - 1):
            s_k = drift ** ((k + 1) / n)
            ei.append(k); ej.append(k + 1)
            rel_r.append(np.eye(3, dtype=np.float32))
            # measured in the LOCAL (drifted) scale = what integrating
            # the estimate reproduces
            rel_t.append((gt_t[k + 1] - gt_t[k]) * s_k)
            w.append([50, 50, 50, 200, 200, 200, 1.0 / 0.08])
        # loop edge: last node observes node 0 at the LAST node's local
        # (drifted) scale — what a PnP against the old map measures
        # divided by the old map's (anchor) scale; its own scale
        # residual is left nearly free (the drift IS the unknown)
        ei.append(n - 1); ej.append(0)
        rel_r.append(np.eye(3, dtype=np.float32))
        rel_t.append((gt_t[0] - gt_t[n - 1]).astype(np.float32))
        w.append([100, 100, 100, 300, 300, 300, 1.0])
        fixed = np.zeros(n, bool); fixed[0] = True
        return gt_r, gt_t, est_t, map(np.asarray, (ei, ej)), rel_r, rel_t, w, fixed

    def test_loop_repairs_scale_drift(self):
        gt_r, gt_t, est_t, (ei, ej), rel_r, rel_t, w, fixed = (
            self._scale_drift_problem()
        )
        n = len(gt_t)
        err_before = np.linalg.norm(est_t - gt_t, axis=1).max()
        res = pose_graph.optimize_pose_graph_sim3(
            jnp.asarray(np.stack([np.eye(3, dtype=np.float32)] * n)),
            jnp.asarray(est_t),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(rel_r)), jnp.asarray(np.stack(rel_t)),
            jnp.asarray(np.stack(w), jnp.float32),
            jnp.ones(len(rel_r), bool), jnp.asarray(fixed),
            max_iterations=60,
        )
        t_out = np.asarray(res.t_wb)
        err_after = np.linalg.norm(t_out - gt_t, axis=1).max()
        assert float(res.final_cost) < float(res.initial_cost)
        # scale drift was the dominant error; sim3 must remove most of it
        assert err_after < 0.35 * err_before, (err_before, err_after)
        # recovered per-node scales track the INVERSE of the injected
        # drift (a node whose odometry ran at s_true needs s = 1/s_true
        # for its drifted measurements to reproject onto the true
        # geometry)
        ls = np.asarray(res.log_s)
        assert ls[0] == 0.0
        assert np.all(np.diff(ls[: n - 1]) < 0.05)  # monotone-ish decay
        assert ls[n - 2] < -0.2  # ~ -log(drift) = -0.405 at the end

    def test_sim3_zero_residual_consistency(self):
        """With consistent (drift-free) measurements the solve is a
        no-op: zero residual at the initial state."""
        n = 6
        t = np.cumsum(np.ones((n, 3), np.float32) * [1, 0, 0], axis=0)
        r = np.stack([np.eye(3, dtype=np.float32)] * n)
        ei = np.arange(n - 1); ej = ei + 1
        rel_r = np.stack([np.eye(3, dtype=np.float32)] * (n - 1))
        rel_t = t[1:] - t[:-1]
        w = np.full((n - 1, 7), 10.0, np.float32)
        fixed = np.zeros(n, bool); fixed[0] = True
        res = pose_graph.optimize_pose_graph_sim3(
            jnp.asarray(r), jnp.asarray(t),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(rel_r), jnp.asarray(rel_t), jnp.asarray(w),
            jnp.ones(n - 1, bool), jnp.asarray(fixed),
        )
        assert float(res.initial_cost) < 1e-8
        np.testing.assert_allclose(np.asarray(res.t_wb), t, atol=1e-5)
        np.testing.assert_allclose(np.asarray(res.log_s), 0.0, atol=1e-5)

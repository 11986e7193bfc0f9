"""Pallas BA-iteration megakernel vs the XLA formulation.

One LM iteration of the windowed BA (solver/ba_pallas.py) must produce
the same candidate state, costs and step norm as the reference XLA math
(solver/ba.py building blocks). Run through the Pallas interpreter on
CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vio360_tpu.geometry import camera as cam, lie
from vio360_tpu.solver import ba_pallas, factors, linsolve

W, H = 480, 240
K, M = 6, 256


def _problem(seed=0, noise=0.5):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-5, 5, (M, 3)) + np.array([0, 0, 7.0]), jnp.float32)
    angles = rng.uniform(-0.05, 0.05, (K, 3)).astype(np.float32)
    rs = jnp.stack([lie.so3_exp(jnp.asarray(a)) for a in angles])
    ts = jnp.asarray(np.cumsum(rng.uniform(-0.05, 0.08, (K, 3)), 0), jnp.float32)
    r_cb = lie.so3_exp(jnp.asarray([0.02, -0.01, 0.03]))
    t_cb = jnp.asarray([0.01, 0.0, -0.02])
    p_b = jnp.einsum("kji,mj->kmi", rs, pts[None].repeat(1, 0)[0]) - jnp.einsum(
        "kji,kj->ki", rs, ts
    )[:, None]
    p_c = jnp.einsum("ij,kmj->kmi", r_cb, p_b) + t_cb
    uv = cam.project(p_c, W, H)
    uv = uv + jnp.asarray(rng.standard_normal(uv.shape) * noise, jnp.float32)
    mask = jnp.asarray(rng.random((K, M)) < 0.7)
    fixed_pose = jnp.zeros(K, bool).at[0].set(True)
    fixed_point = jnp.asarray(rng.random(M) < 0.1)
    return rs, ts, pts, uv, mask, fixed_pose, fixed_point, r_cb, t_cb


def _xla_iteration(r, t, pts, uv, mask, fixed_pose, fixed_point, r_cb, t_cb, lam):
    """Reference: same math as ba.run_ba's lm_body, one iteration."""
    inv_sigma2, hd = 1.0, 1.0
    k, m = mask.shape

    def ev(r, t, pts):
        p_b, p_c = factors.transform_points(r, t, r_cb, t_cb, pts)
        res = factors.reprojection_residual(p_c, uv, W, H)
        c2 = factors.chi2(res, inv_sigma2)
        rho = jnp.where(c2 <= 1.0, c2, 2.0 * jnp.sqrt(jnp.maximum(c2, 1e-20)) - 1.0)
        cost = 0.5 * jnp.sum(jnp.where(mask, rho, 0.0))
        return p_b, p_c, res, cost

    p_b, p_c, res, cur_cost = ev(r, t, pts)
    j_pose, j_pt = factors.reprojection_jacobians(p_b, p_c, r[:, None], r_cb, W, H)
    w = factors.robust_weights(res, mask, inv_sigma2, hd)
    jp = j_pose.transpose(0, 2, 3, 1)
    jl = j_pt.transpose(0, 2, 3, 1)
    rs_ = res.transpose(0, 2, 1)
    u_blk = jnp.einsum("kicm,km,kidm->kcd", jp, w, jp)
    v_blk = jnp.einsum("kicm,km,kidm->cdm", jl, w, jl)
    w_blk = jnp.einsum("kicm,km,kidm->kcdm", jp, w, jl)
    b_p = -jnp.einsum("kicm,km,kim->kc", jp, w, rs_)
    b_l = -jnp.einsum("kicm,km,kim->cm", jl, w, rs_)
    u_d = u_blk + lam * jnp.eye(6) * jnp.einsum("kcc->k", u_blk)[:, None, None] / 6.0
    tr_v = v_blk[0, 0] + v_blk[1, 1] + v_blk[2, 2]
    v_d = v_blk + (lam / 3.0) * jnp.eye(3)[:, :, None] * tr_v + 1e-8 * jnp.eye(3)[:, :, None]
    v_inv = linsolve.inv3x3_mminor(v_d)
    v_inv = jnp.where(fixed_point[None, None, :], 0.0, v_inv)
    wv = jnp.einsum("kcdm,dem->kcem", w_blk, v_inv)
    a2 = wv.reshape(k * 6, 3 * m)
    b2 = w_blk.reshape(k * 6, 3 * m)
    s_mat = -(a2 @ b2.T)
    s_mat = s_mat + jnp.einsum("kl,kcf->kclf", jnp.eye(k), u_d).reshape(k * 6, k * 6)
    fm = jnp.repeat((~fixed_pose).astype(s_mat.dtype), 6)
    s_mat = s_mat * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
    rhs = (b_p - jnp.einsum("kcem,em->kc", wv, b_l)).reshape(k * 6) * fm
    dx = linsolve.solve(s_mat, rhs).reshape(k, 6)
    dx = jnp.where(fixed_pose[:, None], 0.0, dx)
    dl = jnp.einsum("dem,em->dm", v_inv, b_l - jnp.einsum("kcdm,kc->dm", w_blk, dx))
    dl = jnp.where(fixed_point[:, None], 0.0, dl.T)
    dr_dt = jax.vmap(lie.se3_exp)(dx)
    r_new, t_new = jax.vmap(lie.se3_compose)(r, t, dr_dt[0], dr_dt[1])
    pts_new = pts + dl
    *_, new_cost = ev(r_new, t_new, pts_new)
    step = jnp.sum(dx * dx) + jnp.sum(dl * dl)
    return r_new, t_new, pts_new, cur_cost, new_cost, step


@pytest.mark.parametrize("lam", [1e-4, 1e-1])
def test_pallas_iteration_matches_xla(lam):
    rs, ts, pts, uv, mask, fp, fpt, r_cb, t_cb = _problem()
    obs_w = mask.astype(jnp.float32)
    got = ba_pallas.ba_iteration(
        rs, ts, pts, uv, obs_w, fp, fpt, jnp.asarray(lam, jnp.float32),
        r_cb, t_cb, W, H, interpret=True,
    )
    ref = _xla_iteration(rs, ts, pts, uv, mask, fp, fpt, r_cb, t_cb, lam)
    names = ["r", "t", "pts", "cur_cost", "new_cost", "step"]
    for name, g, r in zip(names, got, ref):
        g, r = np.asarray(g), np.asarray(r)
        scale = max(1.0, float(np.abs(r).max()))
        np.testing.assert_allclose(g, r, atol=2e-3 * scale, rtol=2e-3, err_msg=name)


def test_pallas_iteration_decreases_cost():
    rs, ts, pts, uv, mask, fp, fpt, r_cb, t_cb = _problem(seed=3, noise=0.2)
    # perturb the state so there is something to optimize
    rng = np.random.default_rng(4)
    ts_p = ts + jnp.asarray(rng.normal(0, 0.02, ts.shape), jnp.float32)
    got = ba_pallas.ba_iteration(
        rs, ts_p, pts, uv, mask.astype(jnp.float32), fp, fpt,
        jnp.asarray(1e-4, jnp.float32), r_cb, t_cb, W, H, interpret=True,
    )
    cur, new = float(got[3]), float(got[4])
    assert new < cur
    # fixed entities did not move
    np.testing.assert_allclose(np.asarray(got[0])[0], np.asarray(rs)[0], atol=1e-6)
    moved = np.abs(np.asarray(got[2]) - np.asarray(pts)).max(axis=1)
    assert (moved[np.asarray(fpt)] < 1e-7).all()


def test_run_ba_pallas_full_solve_matches_xla():
    from vio360_tpu.solver import ba

    rs, ts, pts, uv, mask, fp, fpt, r_cb, t_cb = _problem(seed=5)
    rng = np.random.default_rng(6)
    ts_p = ts + jnp.asarray(rng.normal(0, 0.03, ts.shape), jnp.float32)
    marg = jnp.zeros(M, bool)
    kw = dict(width=W, height=H, max_iterations=8)
    res_x = ba.run_ba_xla(rs, ts_p, pts, uv, mask, fp, fpt, marg, r_cb, t_cb, **kw)
    # interpret=True can't be threaded through run_ba_pallas's jit; on
    # CPU the pallas kernel runs via the interpreter path only in
    # ba_iteration directly, so emulate the pallas LM loop here.
    r, t, p = rs, ts_p, pts
    lam = jnp.asarray(1e-4, jnp.float32)
    obs_w = mask.astype(jnp.float32)
    for _ in range(8):
        r_n, t_n, p_n, cur, new, step = ba_pallas.ba_iteration(
            r, t, p, uv, obs_w, fp, fpt, lam, r_cb, t_cb, W, H, interpret=True
        )
        accept = bool(new < cur)
        if accept:
            r, t, p = r_n, t_n, p_n
            lam = max(float(lam) * 0.5, 1e-9)
            if (float(cur) - float(new)) < 1e-6 * float(cur) or float(step) < 1e-14:
                break
        else:
            lam = min(float(lam) * 4.0, 1e6)
        lam = jnp.asarray(lam, jnp.float32)
    # both reach equivalent optima (same final cost within tolerance)
    from vio360_tpu.solver.ba import _evaluate

    *_, cost_p = _evaluate(r, t, p, uv, mask, r_cb, t_cb, W, H, 1.0, 1.0)
    assert abs(float(cost_p) - float(res_x.final_cost)) < 0.02 * float(res_x.final_cost)


def test_solve_pnp_pallas_matches_xla():
    from vio360_tpu.solver import pnp

    rng = np.random.default_rng(9)
    n = 256
    pts = jnp.asarray(rng.uniform(-5, 5, (n, 3)) + np.array([0, 0, 7.0]), jnp.float32)
    r_true = lie.so3_exp(jnp.asarray([0.03, -0.02, 0.01]))
    t_true = jnp.asarray([0.15, -0.1, 0.2])
    r_cb = lie.so3_exp(jnp.asarray([0.01, 0.02, -0.01]))
    t_cb = jnp.asarray([0.02, 0.01, 0.0])
    p_b = (pts - t_true) @ r_true  # R^T (p - t)
    p_c = p_b @ r_cb.T + t_cb
    uv = cam.project(p_c, W, H)
    uv = uv + jnp.asarray(rng.standard_normal(uv.shape) * 0.5, jnp.float32)
    # a few gross outliers
    out_idx = rng.choice(n, 20, replace=False)
    uv = uv.at[out_idx].add(jnp.asarray(rng.uniform(30, 60, (20, 2)), jnp.float32))
    active = jnp.ones(n, bool)
    marg = jnp.zeros(n, bool)

    res_x = pnp.solve_pnp_xla(
        jnp.eye(3), jnp.zeros(3), pts, uv, active, marg, r_cb, t_cb, W, H
    )
    res_p = pnp.solve_pnp_pallas(
        jnp.eye(3), jnp.zeros(3), pts, uv, active, marg, r_cb, t_cb, W, H,
        interpret=True,
    )
    assert bool(res_p.success) and bool(res_x.success)
    np.testing.assert_allclose(np.asarray(res_p.t_wb), np.asarray(res_x.t_wb), atol=5e-3)
    np.testing.assert_allclose(np.asarray(res_p.r_wb), np.asarray(res_x.r_wb), atol=5e-4)
    # both recover the true pose
    np.testing.assert_allclose(np.asarray(res_p.t_wb), np.asarray(t_true), atol=2e-2)
    assert abs(int(res_p.num_inliers) - int(res_x.num_inliers)) <= 3

"""solver/marginals.py: pose marginal covariance + derived edge weights.

The gold check builds the full (pose tangent, landmark) Gauss-Newton
information with jax.jacfwd on the stacked residual vector — an
implementation completely independent of the solver's einsum assembly —
Schur-marginalizes the landmarks in numpy, and compares against
_pose_information's reduced system.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vio360_tpu.geometry import camera as cam
from vio360_tpu.geometry import lie
from vio360_tpu.solver import marginals
from vio360_tpu.solver.factors import reprojection_residual, transform_points

W, H = 480, 240


def _toy_window(k=3, m=32, seed=0, drop=0.0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-4, 4, (m, 3)) + np.array([0, 0, 6.0]), jnp.float32)
    rs = jnp.broadcast_to(jnp.eye(3), (k, 3, 3)).copy()
    ts = jnp.asarray(np.cumsum(rng.uniform(-0.05, 0.08, (k, 3)), 0), jnp.float32)
    uv = cam.project(pts[None] - ts[:, None], W, H)
    uv = uv + jnp.asarray(rng.standard_normal((k, m, 2)) * 0.3, jnp.float32)
    mask = jnp.asarray(rng.random((k, m)) >= drop)
    fixed_pose = jnp.zeros(k, bool).at[0].set(True)
    fixed_point = jnp.zeros(m, bool)
    return rs, ts, pts, uv, mask, fixed_pose, fixed_point


def test_pose_information_matches_autodiff_schur():
    """S == Schur complement of the autodiff full GN information (large
    huber delta -> plain least squares, so both sides are exact)."""
    k, m = 3, 32
    rs, ts, pts, uv, mask, fixed_pose, fixed_point = _toy_window(k, m)

    def resid(xi, dl):  # xi [K,6] right-perturbation, dl [M,3]
        dr_dt = jax.vmap(lie.se3_exp)(xi)
        r2, t2 = jax.vmap(lie.se3_compose)(rs, ts, dr_dt[0], dr_dt[1])
        _, p_c = transform_points(r2, t2, jnp.eye(3), jnp.zeros(3), pts + dl)
        res = reprojection_residual(p_c, uv, W, H)  # [K,M,2]
        return jnp.where(mask[..., None], res, 0.0).reshape(-1)

    j_xi, j_dl = jax.jacfwd(resid, argnums=(0, 1))(
        jnp.zeros((k, 6)), jnp.zeros((m, 3))
    )
    jp = np.asarray(j_xi).reshape(-1, k * 6)
    jl = np.asarray(j_dl).reshape(-1, m * 3)
    u = jp.T @ jp
    v = jl.T @ jl
    # same per-landmark relative ridge as _pose_information
    for lm_i in range(m):
        blk = slice(3 * lm_i, 3 * lm_i + 3)
        v[blk, blk] += (1e-3 * np.trace(v[blk, blk]) + 1e-8) * np.eye(3)
    wm = jp.T @ jl
    s_gold = u - wm @ np.linalg.solve(v, wm.T)
    # gauge: identity rows/cols for the fixed pose
    fm = np.repeat(~np.asarray(fixed_pose), 6).astype(np.float64)
    s_gold = s_gold * fm[:, None] * fm[None, :] + np.diag(1.0 - fm) + 1e-6 * np.diag(fm)

    s_ours, _ = marginals._pose_information(
        rs, ts, pts, uv, mask, fixed_pose, fixed_point,
        jnp.eye(3), jnp.zeros(3), W, H, 1.0, 1e9,
    )
    s_ours = np.asarray(s_ours)
    scale = max(1.0, np.abs(s_gold).max())
    assert np.abs(s_ours - s_gold).max() / scale < 2e-3


def test_sqrt_info_scales_with_pixel_noise():
    """w proportional to 1/sigma: doubling pixel noise halves sqrt-info."""
    rs, ts, pts, uv, mask, fixed_pose, fixed_point = _toy_window()
    args = (rs, ts, pts, uv, mask, fixed_pose, fixed_point,
            jnp.eye(3), jnp.zeros(3),
            jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32), W, H)
    w1 = np.asarray(marginals.window_relpose_sqrt_info(
        *args, pixel_noise_std=1.0, min_sigma_t=0.0, min_sigma_r=0.0))
    w2 = np.asarray(marginals.window_relpose_sqrt_info(
        *args, pixel_noise_std=2.0, min_sigma_t=0.0, min_sigma_r=0.0))
    np.testing.assert_allclose(w2, w1 / 2.0, rtol=1e-3)


def test_sqrt_info_drops_with_fewer_observations():
    """Removing observations can only reduce edge information."""
    rs, ts, pts, uv, mask, fixed_pose, fixed_point = _toy_window()
    sparse = _toy_window(drop=0.6)[4]
    pairs = (jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32))
    w_full = np.asarray(marginals.window_relpose_sqrt_info(
        rs, ts, pts, uv, mask, fixed_pose, fixed_point,
        jnp.eye(3), jnp.zeros(3), *pairs, W, H,
        min_sigma_t=0.0, min_sigma_r=0.0))
    w_sparse = np.asarray(marginals.window_relpose_sqrt_info(
        rs, ts, pts, uv, mask & sparse, fixed_pose, fixed_point,
        jnp.eye(3), jnp.zeros(3), *pairs, W, H,
        min_sigma_t=0.0, min_sigma_r=0.0))
    assert (w_sparse <= w_full * 1.01).all()
    assert w_sparse.mean() < w_full.mean()


def test_sigma_floor_caps_weights():
    rs, ts, pts, uv, mask, fixed_pose, fixed_point = _toy_window()
    w = np.asarray(marginals.window_relpose_sqrt_info(
        rs, ts, pts, uv, mask, fixed_pose, fixed_point,
        jnp.eye(3), jnp.zeros(3),
        jnp.asarray([0], jnp.int32), jnp.asarray([1], jnp.int32), W, H,
        min_sigma_t=1e-2, min_sigma_r=1e-2))
    assert (w <= 100.0 + 1e-3).all()
    assert (w > 0).all()


def test_preint_edge_sqrt_info_longer_span_weaker():
    """Covariance grows with integration span -> weights shrink; the
    velocity-uncertainty term also grows with dt."""
    cov_a = np.diag(np.concatenate([
        np.full(3, 1e-6), np.full(3, 1e-4), np.full(3, 1e-5),
        np.full(3, 1e-8), np.full(3, 1e-8),
    ]))
    cov_b = cov_a * 10.0
    wt_a, wr_a = marginals.preint_edge_sqrt_info(cov_a, dt=0.1)
    wt_b, wr_b = marginals.preint_edge_sqrt_info(cov_b, dt=0.5)
    assert (wt_b < wt_a).all()
    assert (wr_b < wr_a).all()
    # dt=0: only the floor and dP covariance remain
    wt_0, _ = marginals.preint_edge_sqrt_info(cov_a, dt=0.0, vel_sigma=1.0)
    assert (wt_0 > wt_a).all()


def test_anchor_pair_uses_free_marginal_only():
    """Edge out of the gauge anchor: covariance contribution comes from
    the free endpoint alone (anchor rows are exactly zero), so the
    derived weight is finite and positive even with min floors off."""
    rs, ts, pts, uv, mask, fixed_pose, fixed_point = _toy_window()
    w = np.asarray(marginals.window_relpose_sqrt_info(
        rs, ts, pts, uv, mask, fixed_pose, fixed_point,
        jnp.eye(3), jnp.zeros(3),
        jnp.asarray([0], jnp.int32), jnp.asarray([2], jnp.int32), W, H,
        min_sigma_t=0.0, min_sigma_r=0.0))
    assert np.isfinite(w).all() and (w > 0).all()

"""Visual-inertial windowed bundle adjustment.

Counterpart of ``Optimizer::RunVIBA`` (Optimizer.cpp:493-724) — and its
completion: the reference implements the fixed-gravity inertial factor
with the pose Jacobian blocks left ZERO and the call disabled "for
debugging" (Factors.cpp:1411-1418, Estimator.cpp:768-786). Here the
inertial residuals (er/ev/ep with known gravity, scale=1 after
alignment) enter the window solve with FULL Jacobians via jacfwd —
the inertial block is tiny (9(K-1) residuals over 9K+6 parameters), so
autodiff costs nothing while the visual part keeps its analytic
batched Jacobians + Schur elimination.

Parameter layout y = [pose twists (6K) | velocities (3K) | bg(3) ba(3)]
with shared window biases (Optimizer.cpp:557-570). Landmarks are
Schur-eliminated exactly as in solver/ba.py; the reduced visual system
is embedded in the pose block of the full (9K+6)^2 dense system.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..geometry import lie
from ..imu.preintegration import Preintegration
from . import factors, linsolve
from ..utils.precision import jit as _pjit
def _sqrt_information_full(cov9: jax.Array) -> jax.Array:
    """True sqrt information of the 9x9 preintegration covariance.

    Unlike the init-stage factor (which mirrors the reference's 1e-6
    down-scaling, Factors.cpp:997), VIBA uses the physically correct
    information so the inertial terms carry their real weight against
    the 1 px^-2 visual terms — otherwise any O(1) prior swamps the IMU
    and biases/scale are unobservable in practice.
    """
    s, u = jnp.linalg.eigh(0.5 * (cov9 + cov9.T))
    s = jnp.maximum(s, 1e-10)
    info = (u * (1.0 / s)[None, :]) @ u.T
    l = jnp.linalg.cholesky(info + 1e-8 * jnp.eye(9))
    return l.T


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VibaResult:
    r_wb: jax.Array  # [K,3,3]
    t_wb: jax.Array  # [K,3]
    vel: jax.Array  # [K,3]
    bg: jax.Array  # [3]
    ba: jax.Array  # [3]
    points: jax.Array  # [M,3]
    initial_cost: jax.Array
    final_cost: jax.Array
    num_iterations: jax.Array
    outlier_obs: jax.Array  # [K,M]
    new_bad: jax.Array  # [M]
    num_inliers: jax.Array  # [] i32 chi2-inlier observations


def _inertial_residuals(
    r_wb, t_wb, vel, bg, ba, preints: Preintegration, pair_valid, sqrt_infos,
    gravity_w,
):
    """Stacked weighted inertial residuals [ (K-1)*9 ]."""
    k = t_wb.shape[0]

    def one(i):
        pre_i = jax.tree_util.tree_map(lambda a: a[i], preints)
        dt = pre_i.dt_total
        dbg = bg - pre_i.bg
        dba = ba - pre_i.ba
        delta_r = pre_i.delta_r @ lie.so3_exp(pre_i.j_rg @ dbg)
        delta_v = pre_i.delta_v + pre_i.j_vg @ dbg + pre_i.j_va @ dba
        delta_p = pre_i.delta_p + pre_i.j_pg @ dbg + pre_i.j_pa @ dba
        r_bwi = r_wb[i].T
        er = lie.so3_log(delta_r.T @ r_bwi @ r_wb[i + 1])
        ev = r_bwi @ (vel[i + 1] - vel[i] - gravity_w * dt) - delta_v
        ep = r_bwi @ (
            t_wb[i + 1] - t_wb[i] - vel[i] * dt - 0.5 * gravity_w * dt * dt
        ) - delta_p
        r9 = sqrt_infos[i] @ jnp.concatenate([er, ev, ep])
        return jnp.where(pair_valid[i], r9, 0.0)

    return jnp.concatenate([one(i) for i in range(k - 1)])


def _run_viba_core(
    r_wb: jax.Array,  # [K,3,3]
    t_wb: jax.Array,  # [K,3]
    vel: jax.Array,  # [K,3]
    bg: jax.Array,  # [3] shared window gyro bias
    ba_bias: jax.Array,  # [3]
    points: jax.Array,  # [M,3]
    obs_uv: jax.Array,  # [K,M,2]
    obs_mask: jax.Array,  # [K,M]
    fixed_pose: jax.Array,  # [K]
    fixed_point: jax.Array,  # [M]
    marginalized: jax.Array,  # [M]
    preints: Preintegration,  # stacked K-1
    pair_valid: jax.Array,  # [K-1]
    gravity_w: jax.Array,  # [3]
    r_cb: jax.Array,
    t_cb: jax.Array,
    width: int,
    height: int,
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    chi2_threshold: float = 5.991,
    max_iterations: int = 20,
    inertial_weight: float = 1.0,
    bg_prior_weight: float = 50.0,  # sigma ~ 0.02 rad/s
    # Tight accel-bias prior: at low excitation (|a| ~ 0.1 g) a ~0.04
    # m/s^2 bias is degenerate with a ~20% map-scale error; a loose
    # prior lets VIBA absorb scale errors into ba (observed on the
    # synthetic e2e VIO run). sigma ~ 0.02 m/s^2 keeps scale observable.
    ba_prior_weight: float = 50.0,
    axis: str | None = None,
) -> VibaResult:
    """LM loop. With ``axis``, landmark-axis arrays hold this device's
    shard and the reduced visual system / visual cost / inlier count
    are psum'd over that mesh axis (parallel/dist_viba.py); the
    inertial block is landmark-independent and stays replicated."""
    inv_sigma2 = 1.0 / (pixel_noise_std * pixel_noise_std)
    k, m = obs_mask.shape
    n_par = 9 * k + 6

    sqrt_infos = jax.vmap(_sqrt_information_full)(preints.cov[:, :9, :9]) * inertial_weight

    def vis_eval(r, t, pts):
        p_b, p_c = factors.transform_points(r, t, r_cb, t_cb, pts)
        res = factors.reprojection_residual(p_c, obs_uv, width, height)
        c2 = factors.chi2(res, inv_sigma2)
        d2 = huber_delta * huber_delta
        rho = jnp.where(
            c2 <= d2, c2, 2.0 * huber_delta * jnp.sqrt(jnp.maximum(c2, 1e-20)) - d2
        )
        cost = 0.5 * jnp.sum(jnp.where(obs_mask, rho, 0.0))
        return p_b, p_c, res, c2, cost

    def _with_prior(ri, bgx, bax):
        # Zero-mean bias prior: without it, free window biases absorb
        # metric-scale errors instead of the poses correcting them
        # (observed on synthetic scaled-map tests).
        return jnp.concatenate([ri, bg_prior_weight * bgx, ba_prior_weight * bax])

    def total_cost(r, t, pts, v, bgx, bax):
        *_, cv = vis_eval(r, t, pts)
        if axis is not None:
            cv = jax.lax.psum(cv, axis)
        ri = _inertial_residuals(r, t, v, bgx, bax, preints, pair_valid, sqrt_infos, gravity_w)
        ri = _with_prior(ri, bgx, bax)
        return cv + 0.5 * jnp.sum(ri * ri)

    init_cost = total_cost(r_wb, t_wb, points, vel, bg, ba_bias)

    def lm_cond(carry):
        *_, it, done = carry
        return (it < max_iterations) & ~done

    def lm_body(carry):
        r, t, pts, v, bgx, bax, lam, cost, it, done = carry

        # ----- visual part (analytic, Schur) -----
        p_b, p_c, res, c2, _ = vis_eval(r, t, pts)
        j_pose, j_pt = factors.reprojection_jacobians(
            p_b, p_c, r[:, None], r_cb, width, height
        )
        wgt = factors.robust_weights(res, obs_mask, inv_sigma2, huber_delta)
        u_blk = jnp.einsum("kmic,km,kmid->kcd", j_pose, wgt, j_pose)
        v_blk = jnp.einsum("kmic,km,kmid->mcd", j_pt, wgt, j_pt)
        w_blk = jnp.einsum("kmic,km,kmid->kmcd", j_pose, wgt, j_pt)
        b_p = -jnp.einsum("kmic,km,kmi->kc", j_pose, wgt, res)
        b_l = -jnp.einsum("kmic,km,kmi->mc", j_pt, wgt, res)

        v_d = v_blk + lam * jnp.eye(3) * jnp.einsum("mcc->m", v_blk)[:, None, None] / 3.0
        v_d = v_d + 1e-8 * jnp.eye(3)
        v_inv = linsolve.inv3x3(v_d)
        v_inv = jnp.where(fixed_point[:, None, None], 0.0, v_inv)
        wv = jnp.einsum("kmcd,mde->kmce", w_blk, v_inv)
        s_off = jnp.einsum("kmce,lmfe->klcf", wv, w_blk)
        s_vis = -s_off
        s_vis = s_vis.at[jnp.arange(k), jnp.arange(k)].add(u_blk)
        rhs_vis = b_p - jnp.einsum("kmce,me->kc", wv, b_l)  # [K,6]
        if axis is not None:
            # The ONLY collectives in the LM body: the reduced camera
            # system + rhs (a few tens of KB), as in parallel/dist_ba.
            s_vis = jax.lax.psum(s_vis, axis)
            rhs_vis = jax.lax.psum(rhs_vis, axis)

        # ----- inertial part (autodiff over the perturbation) -----
        def inertial_of_delta(delta):
            dxi = delta[: 6 * k].reshape(k, 6)
            dv = delta[6 * k : 9 * k].reshape(k, 3)
            dbg_ = delta[9 * k : 9 * k + 3]
            dba_ = delta[9 * k + 3 :]
            dr_dt = jax.vmap(lie.se3_exp)(dxi)
            r_new, t_new = jax.vmap(lie.se3_compose)(r, t, dr_dt[0], dr_dt[1])
            ri = _inertial_residuals(
                r_new, t_new, v + dv, bgx + dbg_, bax + dba_, preints, pair_valid,
                sqrt_infos, gravity_w,
            )
            return _with_prior(ri, bgx + dbg_, bax + dba_)

        zero = jnp.zeros(n_par)
        r_in = inertial_of_delta(zero)
        j_in = jax.jacfwd(inertial_of_delta)(zero)  # [(K-1)*9, n_par]

        h = j_in.T @ j_in
        g = j_in.T @ r_in
        # embed visual reduced system in the pose block
        h = h.at[: 6 * k, : 6 * k].add(
            s_vis.transpose(0, 2, 1, 3).reshape(6 * k, 6 * k)
        )
        g = g.at[: 6 * k].add(-rhs_vis.reshape(6 * k))

        # damping + gauge
        h = h + lam * jnp.diag(jnp.diag(h)) + 1e-8 * jnp.eye(n_par)
        free = jnp.ones(n_par, bool)
        pose_free = ~fixed_pose
        free = free.at[: 6 * k].set(jnp.repeat(pose_free, 6))
        fmask = free.astype(h.dtype)
        h = h * fmask[:, None] * fmask[None, :] + jnp.diag(1.0 - fmask)
        g = g * fmask

        delta = -linsolve.solve(h, g)
        dxi = delta[: 6 * k].reshape(k, 6)
        dv = delta[6 * k : 9 * k].reshape(k, 3)
        dbg_ = delta[9 * k : 9 * k + 3]
        dba_ = delta[9 * k + 3 :]

        dr_dt = jax.vmap(lie.se3_exp)(dxi)
        r_new, t_new = jax.vmap(lie.se3_compose)(r, t, dr_dt[0], dr_dt[1])
        v_new = v + dv
        bg_new = bgx + dbg_
        ba_new = bax + dba_
        dl = jnp.einsum(
            "mde,me->md", v_inv, b_l - jnp.einsum("kmcd,kc->md", w_blk, dxi)
        )
        dl = jnp.where(fixed_point[:, None], 0.0, dl)
        pts_new = pts + dl

        new_cost = total_cost(r_new, t_new, pts_new, v_new, bg_new, ba_new)
        accept = new_cost < cost
        r = jnp.where(accept, r_new, r)
        t = jnp.where(accept, t_new, t)
        pts = jnp.where(accept, pts_new, pts)
        v = jnp.where(accept, v_new, v)
        bgx = jnp.where(accept, bg_new, bgx)
        bax = jnp.where(accept, ba_new, bax)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        done = accept & ((cost - new_cost) < 1e-6 * cost)
        cost = jnp.where(accept, new_cost, cost)
        return (r, t, pts, v, bgx, bax, lam, cost, it + 1, done)

    lam0 = jnp.asarray(1e-4, jnp.float32) + 0.0 * init_cost
    done0 = init_cost < 0.0  # always False; robust cost is non-negative
    r_f, t_f, pts_f, v_f, bg_f, ba_f, _, final_cost, iters, _ = jax.lax.while_loop(
        lm_cond,
        lm_body,
        (
            r_wb, t_wb, points, vel, bg, ba_bias,
            lam0, init_cost,
            jnp.asarray(0, jnp.int32), done0,
        ),
    )

    # chi2 classification identical to run_ba
    _, _, _, c2, _ = vis_eval(r_f, t_f, pts_f)
    outlier_obs = obs_mask & (c2 > chi2_threshold)
    inlier_obs = obs_mask & ~outlier_obs
    new_bad = (
        (~marginalized)
        & (~fixed_point)
        & (jnp.sum(inlier_obs, axis=0) == 0)
        & (jnp.sum(outlier_obs, axis=0) >= 2)
    )

    num_inl = jnp.sum(inlier_obs).astype(jnp.int32)
    if axis is not None:
        num_inl = jax.lax.psum(num_inl, axis)
    return VibaResult(
        r_wb=r_f,
        t_wb=t_f,
        vel=v_f,
        bg=bg_f,
        ba=ba_f,
        points=pts_f,
        initial_cost=init_cost,
        final_cost=final_cost,
        num_iterations=iters,
        outlier_obs=outlier_obs,
        new_bad=new_bad,
        num_inliers=num_inl,
    )


run_viba = functools.partial(_pjit, static_argnames=(
    "width", "height", "max_iterations", "pixel_noise_std", "huber_delta",
    "chi2_threshold", "inertial_weight", "bg_prior_weight", "ba_prior_weight",
))(functools.partial(_run_viba_core, axis=None))

"""Distributed bundle adjustment: landmark-sharded Schur reduction.

New design work (the reference has no distributed dimension,
SURVEY.md §2): scale window BA across a device mesh by

- sharding the LANDMARK axis over mesh axis ``lm``: residuals,
  robust weights, V-blocks, W-blocks and the landmark back-
  substitution are all landmark-local (zero communication);
- ``psum``-ing ONLY the reduced camera system S [6K x 6K] + rhs [6K]
  and the scalar robust cost over ICI per LM iteration — a few tens
  of KB per step, the textbook distributed-Schur pattern
  (SURVEY.md §5 "Distributed communication backend");
- sharding independent WINDOWS (sequences) over mesh axis ``seq`` with
  no cross-talk at all — the production throughput axis.

The math matches ``solver/ba.run_ba`` exactly; a test asserts the
sharded result equals the single-device result on a CPU mesh.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # JAX >= 0.6
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..geometry import lie
from ..solver import factors, linsolve
from ..utils.precision import jit as _pjit


def _evaluate_local(r_wb, t_wb, points, obs, mask, r_cb, t_cb, width, height,
                    inv_sigma2, huber_delta, axis: str | None):
    """Residuals + robust cost; cost is psum'd over the landmark axis."""
    p_b, p_c = factors.transform_points(r_wb, t_wb, r_cb, t_cb, points)
    res = factors.reprojection_residual(p_c, obs, width, height)
    c2 = factors.chi2(res, inv_sigma2)
    d2 = huber_delta * huber_delta
    rho = jnp.where(c2 <= d2, c2, 2.0 * huber_delta * jnp.sqrt(jnp.maximum(c2, 1e-20)) - d2)
    cost = 0.5 * jnp.sum(jnp.where(mask, rho, 0.0))
    if axis is not None:
        cost = jax.lax.psum(cost, axis)
    return p_b, p_c, res, c2, cost


def _ba_one_window(
    r_wb, t_wb, points, obs_uv, obs_mask, fixed_pose, fixed_point,
    r_cb, t_cb, *, width, height, inv_sigma2, huber_delta, max_iterations,
    axis: str | None,
):
    """LM loop for one window with landmark-sharded inputs.

    points/obs hold this device's landmark shard; S and rhs are psum'd.
    """
    k = obs_mask.shape[0]

    _, _, _, _, init_cost = _evaluate_local(
        r_wb, t_wb, points, obs_uv, obs_mask, r_cb, t_cb, width, height,
        inv_sigma2, huber_delta, axis,
    )

    def lm_cond(carry):
        *_, it, done = carry
        return (it < max_iterations) & ~done

    def lm_body(carry):
        r, t, pts, lam, cost, it, done = carry
        p_b, p_c, res, c2, _ = _evaluate_local(
            r, t, pts, obs_uv, obs_mask, r_cb, t_cb, width, height,
            inv_sigma2, huber_delta, None,
        )
        j_pose, j_pt = factors.reprojection_jacobians(p_b, p_c, r[:, None], r_cb, width, height)
        w = factors.robust_weights(res, obs_mask, inv_sigma2, huber_delta)

        u_blk = jnp.einsum("kmic,km,kmid->kcd", j_pose, w, j_pose)
        v_blk = jnp.einsum("kmic,km,kmid->mcd", j_pt, w, j_pt)
        w_blk = jnp.einsum("kmic,km,kmid->kmcd", j_pose, w, j_pt)
        b_p = -jnp.einsum("kmic,km,kmi->kc", j_pose, w, res)
        b_l = -jnp.einsum("kmic,km,kmi->mc", j_pt, w, res)

        # U and b_p need the global sums before damping.
        if axis is not None:
            u_blk = jax.lax.psum(u_blk, axis)
            b_p = jax.lax.psum(b_p, axis)

        u_d = u_blk + lam * jnp.eye(6) * jnp.einsum("kcc->k", u_blk)[:, None, None] / 6.0
        v_d = v_blk + lam * jnp.eye(3) * jnp.einsum("mcc->m", v_blk)[:, None, None] / 3.0
        v_d = v_d + 1e-8 * jnp.eye(3)
        v_inv = linsolve.inv3x3(v_d)
        v_inv = jnp.where(fixed_point[:, None, None], 0.0, v_inv)

        wv = jnp.einsum("kmcd,mde->kmce", w_blk, v_inv)
        s_off = jnp.einsum("kmce,lmfe->klcf", wv, w_blk)
        rhs_corr = jnp.einsum("kmce,me->kc", wv, b_l)
        if axis is not None:
            s_off = jax.lax.psum(s_off, axis)  # the ONLY O(K^2) collective
            rhs_corr = jax.lax.psum(rhs_corr, axis)

        s = -s_off
        s = s.at[jnp.arange(k), jnp.arange(k)].add(u_d)
        rhs = b_p - rhs_corr

        free_p = (~fixed_pose).astype(s.dtype)
        s = s * free_p[:, None, None, None] * free_p[None, :, None, None]
        s = s.at[jnp.arange(k), jnp.arange(k)].add(
            jnp.eye(6) * fixed_pose[:, None, None].astype(s.dtype)
        )
        rhs = rhs * free_p[:, None]

        s_mat = s.transpose(0, 2, 1, 3).reshape(k * 6, k * 6)
        dx = linsolve.solve(s_mat, rhs.reshape(k * 6)).reshape(k, 6)
        dx = jnp.where(fixed_pose[:, None], 0.0, dx)
        dl = jnp.einsum("mde,me->md", v_inv, b_l - jnp.einsum("kmcd,kc->md", w_blk, dx))
        dl = jnp.where(fixed_point[:, None], 0.0, dl)

        dr_dt = jax.vmap(lie.se3_exp)(dx)
        r_new, t_new = jax.vmap(lie.se3_compose)(r, t, dr_dt[0], dr_dt[1])
        pts_new = pts + dl

        _, _, _, _, new_cost = _evaluate_local(
            r_new, t_new, pts_new, obs_uv, obs_mask, r_cb, t_cb, width, height,
            inv_sigma2, huber_delta, axis,
        )
        accept = new_cost < cost
        r = jnp.where(accept, r_new, r)
        t = jnp.where(accept, t_new, t)
        pts = jnp.where(accept, pts_new, pts)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        step2 = jnp.sum(dx * dx)
        dl2 = jnp.sum(dl * dl)
        if axis is not None:
            dl2 = jax.lax.psum(dl2, axis)
        step_small = (step2 + dl2) < 1e-14
        rel_drop = (cost - new_cost) < 1e-6 * cost
        done = accept & (step_small | rel_drop)
        cost = jnp.where(accept, new_cost, cost)
        return (r, t, pts, lam, cost, it + 1, done)

    # Initial lam/done must inherit init_cost's varying axes (shard_map's
    # varying-manual-axes typing rejects invarying->varying carries).
    lam0 = jnp.asarray(1e-4, jnp.float32) + 0.0 * init_cost
    done0 = init_cost < 0.0  # always False; robust cost is non-negative
    r_f, t_f, pts_f, _, final_cost, iters, _ = jax.lax.while_loop(
        lm_cond,
        lm_body,
        (r_wb, t_wb, points, lam0, init_cost, jnp.asarray(0, jnp.int32), done0),
    )
    return r_f, t_f, pts_f, final_cost, init_cost, iters


def make_dist_ba(
    mesh: Mesh,
    width: int,
    height: int,
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    max_iterations: int = 50,
):
    """Build a jitted distributed BA over a (seq, lm) mesh.

    Input shapes (global): poses [B,K,...], points [B,M,3],
    obs_uv [B,K,M,2], obs_mask [B,K,M], fixed_* masks. B is sharded
    over ``seq``, M over ``lm``. Returns (r, t, points, final_cost,
    initial_cost, iters) with the same sharding.
    """
    inv_sigma2 = 1.0 / (pixel_noise_std * pixel_noise_std)

    one = functools.partial(
        _ba_one_window,
        width=width,
        height=height,
        inv_sigma2=inv_sigma2,
        huber_delta=huber_delta,
        max_iterations=max_iterations,
        axis="lm",
    )

    def local_fn(r_wb, t_wb, points, obs_uv, obs_mask, fixed_pose, fixed_point, r_cb, t_cb):
        return jax.vmap(
            lambda r, t, p, ou, om, fp, fl: one(r, t, p, ou, om, fp, fl, r_cb, t_cb)
        )(r_wb, t_wb, points, obs_uv, obs_mask, fixed_pose, fixed_point)

    in_specs = (
        P("seq"),  # r_wb [B,K,3,3]
        P("seq"),  # t_wb
        P("seq", "lm"),  # points [B,M,3]
        P("seq", None, "lm"),  # obs_uv [B,K,M,2]
        P("seq", None, "lm"),  # obs_mask
        P("seq"),  # fixed_pose [B,K]
        P("seq", "lm"),  # fixed_point [B,M]
        P(),  # r_cb
        P(),  # t_cb
    )
    out_specs = (P("seq"), P("seq"), P("seq", "lm"), P("seq"), P("seq"), P("seq"))

    return _pjit(
        shard_map(local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    )

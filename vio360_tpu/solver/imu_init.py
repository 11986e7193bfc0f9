"""Visual-inertial initialization: gravity, scale, velocities, biases.

Counterpart of ``Optimizer::OptimizeIMUInit`` (Optimizer.cpp:972-1257)
and the inertial factor ``InertialGravityScaleFactor``
(Factors.cpp:977-1293):

residual per consecutive-keyframe pair (i, j), 9-dim:
  er = Log(dR(b)^T R_bwi R_wbj)
  ev = R_bwi (s (vj - vi) - g dt) - dV(b)
  ep = R_bwi (s (t_j - t_i - vi dt) - 1/2 g dt^2) - dP(b)
with g = R_wg(theta_x, theta_y) (0,0,-G) (2-DoF gravity direction,
Factors.cpp:944-975), bias-relinearized deltas, and a sqrt-information
from the 9x9 preintegration covariance (SVD-clamped inverse scaled by
1e-6, Factors.cpp:981-1013).

Stage 1 frees only {gravity_dir(2), scale(1)}; stage 2 frees
{velocities, biases} with weak zero-bias priors, gravity/scale fixed
(Optimizer.cpp:1063-1208). Both stages are tiny dense LM problems;
Jacobians come from jacfwd (the once-per-session cost is irrelevant —
the hot path keeps analytic Jacobians).

``align_gravity_and_scale`` then rotates the world so g -> (0,0,-G)
and rescales about the first keyframe (Estimator.cpp:1436-1557).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..geometry import lie
from ..imu.preintegration import Preintegration
from . import linsolve
from ..utils.precision import jit as _pjit


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ImuInitResult:
    success: jax.Array
    gravity_dir: jax.Array  # [2] (theta_x, theta_y)
    gravity_w: jax.Array  # [3] world gravity vector
    scale: jax.Array  # []
    velocities: jax.Array  # [K,3]
    bg: jax.Array  # [3]
    ba: jax.Array  # [3]
    stage1_cost: jax.Array
    stage2_cost: jax.Array


def gravity_dir_to_rotation(gdir: jax.Array) -> jax.Array:
    """[theta_x, theta_y] -> R_wg via Rodrigues about the x/y axes
    (Factors.cpp:944-975)."""
    phi = jnp.stack([gdir[0], gdir[1], jnp.zeros((), gdir.dtype)])
    return lie.so3_exp(phi)


def _sqrt_information(cov9: jax.Array) -> jax.Array:
    """SVD-clamped inverse scaled by 1e-6, Cholesky upper factor
    (Factors.cpp:981-1003)."""
    # symmetric: use eigh
    s, u = jnp.linalg.eigh(0.5 * (cov9 + cov9.T))
    s = jnp.maximum(s, 1e-6)
    info = (u * (1.0 / s)[None, :]) @ u.T * 1e-6
    l = jnp.linalg.cholesky(info + 1e-12 * jnp.eye(9))
    return l.T


def _pair_residual(
    r_i, t_i, v_i, r_j, t_j, v_j, bg, ba, gdir, scale,
    preint: Preintegration, gravity_magnitude: float,
) -> jax.Array:
    """Unweighted 9-vector inertial residual for one KF pair."""
    dt = preint.dt_total
    dbg = bg - preint.bg
    dba = ba - preint.ba
    delta_r = preint.delta_r @ lie.so3_exp(preint.j_rg @ dbg)
    delta_v = preint.delta_v + preint.j_vg @ dbg + preint.j_va @ dba
    delta_p = preint.delta_p + preint.j_pg @ dbg + preint.j_pa @ dba

    r_wg = gravity_dir_to_rotation(gdir)
    g = r_wg @ jnp.array([0.0, 0.0, -gravity_magnitude])

    r_bwi = r_i.T
    er = lie.so3_log(delta_r.T @ r_bwi @ r_j)
    ev = r_bwi @ (scale * (v_j - v_i) - g * dt) - delta_v
    ep = r_bwi @ (scale * (t_j - t_i - v_i * dt) - 0.5 * g * dt * dt) - delta_p
    return jnp.concatenate([er, ev, ep])


def _huber_factor(r2: jax.Array, delta2: float) -> jax.Array:
    """Scaling of squared norm for Huber (applied as weight on J^T J)."""
    return jnp.where(r2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(r2, 1e-20)))


def _lm_minimize(residual_fn, x0: jax.Array, iters: int = 50):
    """Tiny dense LM: residual_fn(x) -> [R] weighted residual vector."""

    def cost(x):
        r = residual_fn(x)
        return 0.5 * jnp.sum(r * r)

    def body(carry):
        x, lam, c, it, done = carry
        r = residual_fn(x)
        j = jax.jacfwd(residual_fn)(x)
        h = j.T @ j
        g = j.T @ r
        n = x.shape[0]
        damped = h + lam * jnp.diag(jnp.diag(h)) + 1e-12 * jnp.eye(n)
        dx = -linsolve.solve(damped, g)
        c_new = cost(x + dx)
        accept = c_new < c
        x = jnp.where(accept, x + dx, x)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e8))
        done = accept & ((c - c_new) < 1e-8 * c)
        c = jnp.where(accept, c_new, c)
        return (x, lam, c, it + 1, done)

    def cond(carry):
        *_, it, done = carry
        return (it < iters) & ~done

    x, _, c, _, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(1e-3, x0.dtype), cost(x0), jnp.asarray(0), jnp.asarray(False))
    )
    return x, c


def _linear_init(kf_r, kf_t, preints, pair_valid):
    """Closed-form joint (velocity, gravity, scale) initialization.

    The ev/ep residuals are LINEAR in (w = s*v, g, s) for fixed
    rotations, so one lstsq gives the global optimum — this is the
    VINS-Mono-style linear alignment the reference lacks (its stage 1
    freezes velocities at R_prev*dV, Optimizer.cpp:1010-1020, which
    only works when the true scale is near 1; our synthetic ground-
    truth test exposed that failure mode).

    Rows per pair i:
      R_bwi (w_j - w_i - g dt)                = dV_i
      R_bwi (s (t_j - t_i) - w_i dt - g dt^2/2) = dP_i
    """
    k = kf_r.shape[0]
    n_unk = 3 * k + 4  # w (3K), g (3), s (1)
    rows = []
    rhs = []
    for i in range(k - 1):
        r_bwi = kf_r[i].T
        dt = preints.dt_total[i]
        w_valid = pair_valid[i].astype(kf_r.dtype)
        a_v = jnp.zeros((3, n_unk))
        a_v = a_v.at[:, 3 * i : 3 * i + 3].set(-r_bwi)
        a_v = a_v.at[:, 3 * (i + 1) : 3 * (i + 1) + 3].set(r_bwi)
        a_v = a_v.at[:, 3 * k : 3 * k + 3].set(-r_bwi * dt)
        rows.append(a_v * w_valid)
        rhs.append(preints.delta_v[i] * w_valid)

        a_p = jnp.zeros((3, n_unk))
        a_p = a_p.at[:, 3 * i : 3 * i + 3].set(-r_bwi * dt)
        a_p = a_p.at[:, 3 * k : 3 * k + 3].set(-0.5 * r_bwi * dt * dt)
        a_p = a_p.at[:, 3 * k + 3].set(r_bwi @ (kf_t[i + 1] - kf_t[i]))
        rows.append(a_p * w_valid)
        rhs.append(preints.delta_p[i] * w_valid)

    a = jnp.concatenate(rows)
    b = jnp.concatenate(rhs)
    x, *_ = jnp.linalg.lstsq(a, b)
    w = x[: 3 * k].reshape(k, 3)
    g = x[3 * k : 3 * k + 3]
    s = x[3 * k + 3]
    return w, g, s


def _gravity_to_dir(g: jax.Array) -> jax.Array:
    """World gravity vector -> (theta_x, theta_y) chart with
    R_wg @ (0,0,-1) ~ g_hat. The rotation axis cross((0,0,-1), g_hat)
    always has zero z-component, so the 2-param chart is exact."""
    g_hat = g / jnp.maximum(jnp.linalg.norm(g), 1e-9)
    e = jnp.array([0.0, 0.0, -1.0])
    axis = jnp.cross(e, g_hat)
    s_norm = jnp.linalg.norm(axis)
    c = jnp.dot(e, g_hat)
    angle = jnp.arctan2(s_norm, c)
    axis = axis / jnp.maximum(s_norm, 1e-9)
    phi = axis * angle
    return phi[:2]


@functools.partial(_pjit, static_argnames=("gravity_magnitude", "max_iterations"))
def solve_imu_init(
    kf_r: jax.Array,  # [K,3,3]
    kf_t: jax.Array,  # [K,3]
    preints: Preintegration,  # stacked with leading axis K-1 (pair i->i+1)
    pair_valid: jax.Array,  # [K-1] bool (dt in (0.001, 2.0), Optimizer.cpp:1035)
    gravity_magnitude: float = 9.81,
    max_iterations: int = 50,
) -> ImuInitResult:
    k = kf_r.shape[0]

    sqrt_infos = jax.vmap(_sqrt_information)(preints.cov[:, :9, :9])  # [K-1,9,9]
    huber_delta2 = 16.0  # HuberLoss(sqrt(16)) on the weighted norm

    # Linear joint (velocity, gravity, scale) alignment replaces the
    # reference's crude v = R_prev*dV guess.
    w_lin, g_lin, s_lin = _linear_init(kf_r, kf_t, preints, pair_valid)
    s_lin = jnp.maximum(s_lin, 1e-3)
    v_init = w_lin / s_lin  # residual velocities are vision-scale (s*v terms)
    gdir_init = _gravity_to_dir(g_lin)

    def residuals(vel, bg, ba, gdir, scale):
        def one(i):
            r = _pair_residual(
                kf_r[i], kf_t[i], vel[i], kf_r[i + 1], kf_t[i + 1], vel[i + 1],
                bg, ba, gdir, scale, jax.tree_util.tree_map(lambda a: a[i], preints),
                gravity_magnitude,
            )
            rw = sqrt_infos[i] @ r
            hub = jnp.sqrt(_huber_factor(jnp.sum(rw * rw), huber_delta2))
            return jnp.where(pair_valid[i], hub * rw, 0.0)

        return jnp.concatenate([one(i) for i in range(k - 1)])

    # ---- Stage 1: gravity direction + scale (from the linear estimate) ----
    def stage1_res(x):
        return residuals(v_init, jnp.zeros(3), jnp.zeros(3), x[:2], x[2])

    x1, cost1 = _lm_minimize(
        stage1_res, jnp.concatenate([gdir_init, s_lin[None]]), max_iterations
    )
    gdir = x1[:2]
    scale = x1[2]

    # ---- Stage 2: velocities + biases (weak zero-bias priors) ----
    def stage2_res(x):
        vel = x[: 3 * k].reshape(k, 3)
        bg = x[3 * k : 3 * k + 3]
        ba = x[3 * k + 3 :]
        r = residuals(vel, bg, ba, gdir, scale)
        # Zero-bias prior. The reference uses weight 1.0
        # (Optimizer.cpp:1143-1160) against factors whose information is
        # scaled by 1e-6 (Factors.cpp:997) — making the "weak" prior
        # dominate and freeze the biases near zero. We scale the prior by
        # the same sqrt(1e-6) so it is weak RELATIVE to the data, which
        # lets the rotation residuals actually observe the gyro bias
        # (validated by the synthetic ground-truth test).
        prior = 1e-3 * jnp.concatenate([bg, ba])
        return jnp.concatenate([r, prior])

    x2_0 = jnp.concatenate([v_init.reshape(-1), jnp.zeros(6)])
    x2, cost2 = _lm_minimize(stage2_res, x2_0, max_iterations)
    vel = x2[: 3 * k].reshape(k, 3)
    bg = x2[3 * k : 3 * k + 3]
    ba = x2[3 * k + 3 :]

    r_wg = gravity_dir_to_rotation(gdir)
    g_w = r_wg @ jnp.array([0.0, 0.0, -gravity_magnitude])

    n_pairs = jnp.sum(pair_valid)
    success = (n_pairs >= 2) & (scale > 1e-3) & jnp.isfinite(cost2)

    return ImuInitResult(
        success=success,
        gravity_dir=gdir,
        gravity_w=g_w,
        scale=scale,
        velocities=vel,
        bg=bg,
        ba=ba,
        stage1_cost=cost1,
        stage2_cost=cost2,
    )


def align_gravity_and_scale(
    kf_r: jax.Array, kf_t: jax.Array, kf_vel: jax.Array, points: jax.Array,
    r_wg: jax.Array, scale: jax.Array,
):
    """World transform after IMU init (Estimator.cpp:1436-1557): rotate
    everything by R_gw = R_wg^T so gravity becomes (0,0,-G), then scale
    translations/velocities/points about the first keyframe.

    NOTE on the scale convention: the inertial residual uses
    ``s * (t_j - t_i)`` to convert VISION-scale displacements to metric,
    so the map becomes metric by multiplying by s. (The reference
    applies 1/s at Estimator.cpp:1439 against its own factor convention;
    our synthetic ground-truth test pins the correct direction.)
    """
    r_gw = r_wg.T
    kf_r2 = jnp.einsum("ij,kjl->kil", r_gw, kf_r)
    kf_t2 = kf_t @ r_gw.T
    vel2 = kf_vel @ r_gw.T
    pts2 = points @ r_gw.T

    t0 = kf_t2[0]
    kf_t3 = t0 + (kf_t2 - t0) * scale
    pts3 = t0 + (pts2 - t0) * scale
    vel3 = vel2 * scale
    return kf_r2, kf_t3, vel3, pts3

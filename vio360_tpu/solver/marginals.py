"""Pose marginal covariance from the window BA normal equations.

The pose-graph layer (solver/pose_graph.py) weighs each SE(3) relative
edge by a diagonal sqrt-information. Round-3 used hand-set config
constants; this module derives them from the data instead: the inverse
of the Schur-reduced (landmark-marginalized) robust Gauss-Newton
information at the window's converged state is the marginal pose
covariance, and the exact right-perturbation Jacobians of the relative
pose map it to a per-edge covariance.

No reference counterpart: the reference exports no uncertainty (its
Ceres problem is solved and discarded, Optimizer.cpp:247-283). The
closest upstream analog is ceres::Covariance on the same problem; here
the Schur-reduced S matrix is assembled exactly as in the BA solver's
LM iteration (solver/ba.py::_run_ba_xla_core) minus damping, and the
K*6-dim inverse (<= 60x60 at the reference window size) is a tiny
in-jit Gauss-Jordan — the whole extraction is one fused TPU dispatch
per eviction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.precision import jit as _pjit
from . import factors, linsolve
from .ba import _evaluate
from .pose_graph import _edge_residual_jac


def _inv_dense(a: jax.Array) -> jax.Array:
    """In-jit Gauss-Jordan inverse of a small damped-SPD matrix
    (same construction as linsolve.solve, matrix RHS)."""
    n = a.shape[0]
    aug = jnp.concatenate([a, jnp.eye(n, dtype=a.dtype)], axis=1)
    eye = jnp.eye(n, dtype=a.dtype)
    for i in range(n):
        piv = aug[i] / aug[i, i]
        col = aug[:, i]
        aug = aug - ((1.0 - eye[i]) * col)[:, None] * piv[None, :]
        aug = aug.at[i].set(piv)
    return aug[:, n:]


def _pose_information(
    r_wb, t_wb, points, obs_uv, obs_mask, fixed_pose, fixed_point,
    r_cb, t_cb, width, height, pixel_noise_std, huber_delta,
):
    """Schur-reduced pose information S [6K,6K] at the current state —
    the LM iteration's reduced camera system (ba.py lm_body) with zero
    damping; gauge-fixed poses get identity rows/cols."""
    inv_sigma2 = 1.0 / (pixel_noise_std * pixel_noise_std)
    k, m = obs_mask.shape
    p_b, p_c, res, _, _ = _evaluate(
        r_wb, t_wb, points, obs_uv, obs_mask, r_cb, t_cb, width, height,
        inv_sigma2, huber_delta,
    )
    j_pose, j_pt = factors.reprojection_jacobians(
        p_b, p_c, r_wb[:, None], r_cb, width, height
    )
    w = factors.robust_weights(res, obs_mask, inv_sigma2, huber_delta)

    jp = j_pose.transpose(0, 2, 3, 1)  # [K,2,6,M]
    jl = j_pt.transpose(0, 2, 3, 1)  # [K,2,3,M]
    u_blk = jnp.einsum("kicm,km,kidm->kcd", jp, w, jp)  # [K,6,6]
    v_blk = jnp.einsum("kicm,km,kidm->cdm", jl, w, jl)  # [3,3,M]
    w_blk = jnp.einsum("kicm,km,kidm->kcdm", jp, w, jl)  # [K,6,3,M]

    # RELATIVE ridge on the landmark blocks. A landmark seen by a
    # single pose has a rank-2 V (2 residual rows); its exact Schur
    # contribution is a projection (zero along the unobservable
    # direction), which the ridge limit reproduces — but an ABSOLUTE
    # ridge makes cond(V) ~ tr/1e-6 ~ 3e8, far beyond what the f32
    # closed-form adjugate inverse can handle (measured: S picks up
    # O(1e8) negative eigenvalues). At 1e-3*tr the inverse is accurate
    # to ~1e-4 relative and the ridge perturbs well-observed landmarks
    # by 0.1%.
    tr_v = v_blk[0, 0] + v_blk[1, 1] + v_blk[2, 2]  # [M]
    v_d = v_blk + (1e-3 * tr_v + 1e-8) * jnp.eye(3)[:, :, None]
    v_inv = linsolve.inv3x3_mminor(v_d)
    v_inv = jnp.where(fixed_point[None, None, :], 0.0, v_inv)

    wv = jnp.einsum("kcdm,dem->kcem", w_blk, v_inv)
    s_mat = -(wv.reshape(k * 6, 3 * m) @ w_blk.reshape(k * 6, 3 * m).T)
    s_mat = s_mat + jnp.einsum(
        "kl,kcf->kclf", jnp.eye(k), u_blk
    ).reshape(k * 6, k * 6)
    fm = jnp.repeat((~fixed_pose).astype(s_mat.dtype), 6)
    s_mat = s_mat * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
    # Ridge on the free block too: a window whose free poses are weakly
    # constrained (few shared tracks) must yield LARGE covariance, not a
    # singular solve.
    s_mat = s_mat + 1e-6 * jnp.diag(fm)
    return s_mat, fm


@functools.partial(
    _pjit,
    static_argnames=("width", "height", "pixel_noise_std", "huber_delta"),
)
def window_relpose_sqrt_info(
    r_wb,  # [K,3,3] converged window poses
    t_wb,  # [K,3]
    points,  # [M,3]
    obs_uv,  # [K,M,2]
    obs_mask,  # [K,M] bool
    fixed_pose,  # [K] bool (gauge anchors)
    fixed_point,  # [M] bool
    r_cb,
    t_cb,
    pair_i,  # [N] int32 window pose indices
    pair_j,  # [N] int32
    width: int,
    height: int,
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    min_sigma_t: float = 1e-3,  # m — floor keeps weights finite
    min_sigma_r: float = 5e-4,  # rad
):
    """Per-pair diagonal sqrt-information [N,6] (rho, phi) of the SE(3)
    relatives T_i^-1 T_j under the window's marginal pose covariance.

    The covariance of gauge-anchored poses is exactly zero, so an edge
    out of the anchor carries the other endpoint's marginal alone —
    which is the correct conditional covariance given the anchor.
    """
    k = r_wb.shape[0]
    s_mat, fm = _pose_information(
        r_wb, t_wb, points, obs_uv, obs_mask, fixed_pose, fixed_point,
        r_cb, t_cb, width, height, pixel_noise_std, huber_delta,
    )
    cov = _inv_dense(s_mat)
    cov = 0.5 * (cov + cov.T)  # symmetrize f32 inversion noise
    # Identity gauge rows would read as unit variance — anchors have none.
    cov = cov * fm[:, None] * fm[None, :]
    cov = cov.reshape(k, 6, k, 6)

    def one(i, j):
        ri, ti, rj, tj = r_wb[i], t_wb[i], r_wb[j], t_wb[j]
        from ..geometry import lie

        rii, tii = lie.se3_inverse(ri, ti)
        rel_r, rel_t = lie.se3_compose(rii, tii, rj, tj)
        _, j_i, j_j = _edge_residual_jac(ri, ti, rj, tj, rel_r, rel_t)
        jmat = jnp.concatenate([j_i, j_j], axis=1)  # [6,12]
        joint = jnp.concatenate(
            [
                jnp.concatenate([cov[i, :, i, :], cov[i, :, j, :]], axis=1),
                jnp.concatenate([cov[j, :, i, :], cov[j, :, j, :]], axis=1),
            ],
            axis=0,
        )  # [12,12]
        cov_rel = jmat @ joint @ jmat.T
        var = jnp.diagonal(cov_rel)
        floor = jnp.concatenate(
            [jnp.full(3, min_sigma_t**2), jnp.full(3, min_sigma_r**2)]
        )
        # 1e-12 backstop: f32 inversion noise must never produce a
        # negative variance -> nan weight.
        return 1.0 / jnp.sqrt(jnp.maximum(jnp.maximum(var, floor), 1e-12))

    return jax.vmap(one)(pair_i, pair_j)


def preint_edge_sqrt_info_diag(
    cov_r_diag,  # [3] rotation covariance diagonal (theta block)
    cov_p_diag,  # [3] position covariance diagonal (p block)
    dt: float,
    vel_sigma: float = 0.05,  # m/s — velocity estimate uncertainty
    min_sigma_t: float = 1e-3,
    min_sigma_r: float = 5e-4,
) -> tuple:
    """Diagonal sqrt-information (w_t [3], w_r [3]) for an IMU odometry
    pose-graph edge from the preintegration covariance diagonals.

    The edge translation t_rel = R0^T (v0 dt + g dt^2/2) + dP carries
    dP's propagated covariance PLUS the window velocity estimate's
    uncertainty through the v0*dt term (velocity covariance is not
    tracked by VIBA; ``vel_sigma`` is its configured prior scale).
    Host-side numpy — runs once per eviction.
    """
    import numpy as np

    var_r = np.clip(np.asarray(cov_r_diag, np.float64), min_sigma_r**2, None)
    var_t = np.asarray(cov_p_diag, np.float64) + (vel_sigma * dt) ** 2
    var_t = np.clip(var_t, min_sigma_t**2, None)
    return (
        (1.0 / np.sqrt(var_t)).astype(np.float32),
        (1.0 / np.sqrt(var_r)).astype(np.float32),
    )


def preint_edge_sqrt_info(
    cov15,  # [15,15] preintegration covariance (theta, v, p, bg, ba)
    dt: float,
    vel_sigma: float = 0.05,
    min_sigma_t: float = 1e-3,
    min_sigma_r: float = 5e-4,
) -> tuple:
    """See preint_edge_sqrt_info_diag — convenience form on the full
    [15,15] (imu/preintegration.py ordering theta, v, p, bg, ba)."""
    import numpy as np

    d = np.diagonal(np.asarray(cov15))
    return preint_edge_sqrt_info_diag(
        d[0:3], d[6:9], dt, vel_sigma=vel_sigma,
        min_sigma_t=min_sigma_t, min_sigma_r=min_sigma_r,
    )


def window_pair_sqrt_info(win, cfg, r_cb, t_cb):
    """Sqrt-information of a window's (0,1) and (0,2) relatives from
    the marginal pose covariance at its CURRENT state. Mirrors
    window.window_ba's problem construction exactly (same observations,
    gauge and boundary filter). Traceable: composes into the fused
    keyframe event (estimator/fused.py) or runs standalone.

    INTENTIONAL approximation: the information matrix is assembled from
    the VISION factors only, even when the window was solved by
    window_viba. Inertial factors couple poses to velocities/biases, so
    their pose-block contribution requires marginalizing the 9K
    velocity/bias states out of the full VIBA information — extra
    machinery for a systematically CONSERVATIVE effect: ignoring them
    can only overestimate pose covariance, i.e. underweight (never
    overweight) eviction edges relative to their true information. The
    pose-graph solve degrades gracefully toward the odometry prior in
    that direction; the opposite error (overconfident edges) would not.
    """
    from ..estimator import window as window_mod
    from ..geometry import camera as cam

    pcfg = cfg.pose_graph
    obs_uv, obs_mask = window_mod.observations(win)
    obs_mask &= ~cam.is_near_boundary(
        obs_uv, cfg.camera.width, cfg.camera.height,
        cfg.camera.boundary_margin,
    )
    kf_ok = win.kf_id >= 0
    fixed_pose = ~kf_ok | (jnp.arange(win.max_kf) == 0)
    fixed_point = ~win.lm_alive | win.lm_marg
    return window_relpose_sqrt_info(
        win.kf_r, win.kf_t, win.lm_pos, obs_uv, obs_mask,
        fixed_pose, fixed_point, r_cb, t_cb,
        jnp.asarray([0, 0], jnp.int32), jnp.asarray([1, 2], jnp.int32),
        cfg.camera.width, cfg.camera.height,
        huber_delta=cfg.window.huber_delta,
        min_sigma_t=pcfg.min_sigma_t, min_sigma_r=pcfg.min_sigma_r,
    )

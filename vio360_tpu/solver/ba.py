"""Windowed bundle adjustment: batched LM with Schur landmark elimination.

Counterpart of ``Optimizer::RunBA`` / ``RunLocalBA``
(Optimizer.cpp:304-491, 726-966) without Ceres. The window is a DENSE
problem over [K keyframes, M landmarks] with an observation mask —
at the reference's scale (K<=10, M~2000) the reduced camera system is
(6K)x(6K) <= 60x60, so dense Schur on-chip is exact and MXU-friendly
(SURVEY.md §7 design stance: no sparse structures needed).

Per LM iteration:
  1. relinearize: residuals [K,M,2], J_pose [K,M,2,6], J_pt [K,M,2,3]
  2. robust weights (Huber(1.0) * info, >100 px latched) [K,M]
  3. normal blocks  U_k  = sum_m J_p^T w J_p            [K,6,6]
                    V_m  = sum_k J_l^T w J_l            [M,3,3]
                    W_km = J_p^T w J_l                  [K,M,6,3]
  4. Schur: S = U - W V^-1 W^T (reduced camera system), solve 6K dense,
     back-substitute landmark updates dl = V^-1 (b_l - W^T dx)
  5. LM accept/reject on the robust cost.

Gauge handling matches the reference: fixed poses (first / oldest KF)
and fixed landmarks (marginalized scale anchors) are masked out of the
update; chi2 classification and bad-landmark marking (0 inliers & >=2
outlier observations -> bad, never for marginalized) happen after the
solve exactly as Optimizer.cpp:419-460.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..geometry import lie
from . import factors, linsolve
from ..utils.precision import jit as _pjit


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BaResult:
    r_wb: jax.Array  # [K,3,3]
    t_wb: jax.Array  # [K,3]
    points: jax.Array  # [M,3]
    num_inliers: jax.Array
    num_outliers: jax.Array
    new_bad: jax.Array  # [M] bool landmarks newly marked bad
    outlier_obs: jax.Array  # [K,M] bool per-observation chi2 outliers
    initial_cost: jax.Array
    final_cost: jax.Array
    num_iterations: jax.Array


def _evaluate(r_wb, t_wb, points, obs, mask, r_cb, t_cb, width, height, inv_sigma2, huber_delta):
    p_b, p_c = factors.transform_points(r_wb, t_wb, r_cb, t_cb, points)
    res = factors.reprojection_residual(p_c, obs, width, height)  # [K,M,2]
    c2 = factors.chi2(res, inv_sigma2)
    d2 = huber_delta * huber_delta
    rho = jnp.where(c2 <= d2, c2, 2.0 * huber_delta * jnp.sqrt(jnp.maximum(c2, 1e-20)) - d2)
    cost = 0.5 * jnp.sum(jnp.where(mask, rho, 0.0))
    return p_b, p_c, res, c2, cost


def resolve_backend(backend: str = "auto") -> str:
    """'auto': the Pallas LM-iteration megakernel on TPU (~30x faster
    per iteration than the XLA formulation — per-fusion fixed costs
    dominate at this problem size), XLA elsewhere. 'pallas-interpret'
    runs the Pallas kernel via the interpreter (production kernel
    logic, executable on CPU)."""
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return backend


def run_ba(
    r_wb,
    t_wb,
    points,
    obs_uv,
    obs_mask,
    fixed_pose,
    fixed_point,
    marginalized,
    r_cb,
    t_cb,
    width: int,
    height: int,
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    chi2_threshold: float = 5.991,
    max_iterations: int = 50,
    backend: str = "auto",
) -> BaResult:
    """Windowed BA dispatcher — see ``run_ba_xla`` for the contract."""
    m = obs_mask.shape[1]
    resolved = resolve_backend(backend)
    if resolved in ("pallas", "pallas-interpret") and m % 128 == 0:
        return run_ba_pallas(
            r_wb, t_wb, points, obs_uv, obs_mask, fixed_pose, fixed_point,
            marginalized, r_cb, t_cb, width, height,
            pixel_noise_std=pixel_noise_std, huber_delta=huber_delta,
            chi2_threshold=chi2_threshold, max_iterations=max_iterations,
            interpret=resolved == "pallas-interpret",
        )
    return run_ba_xla(
        r_wb, t_wb, points, obs_uv, obs_mask, fixed_pose, fixed_point,
        marginalized, r_cb, t_cb, width, height,
        pixel_noise_std=pixel_noise_std, huber_delta=huber_delta,
        chi2_threshold=chi2_threshold, max_iterations=max_iterations,
    )


@functools.partial(
    _pjit,
    static_argnames=(
        "width", "height", "max_iterations", "pixel_noise_std", "huber_delta",
        "interpret",
    ),
)
def run_ba_pallas(
    r_wb: jax.Array,
    t_wb: jax.Array,
    points: jax.Array,
    obs_uv: jax.Array,
    obs_mask: jax.Array,
    fixed_pose: jax.Array,
    fixed_point: jax.Array,
    marginalized: jax.Array,
    r_cb: jax.Array,
    t_cb: jax.Array,
    width: int,
    height: int,
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    chi2_threshold: float = 5.991,
    max_iterations: int = 50,
    interpret: bool = False,
) -> BaResult:
    """LM loop driving the Pallas iteration kernel (solver/ba_pallas.py);
    per-iteration XLA work is only scalar bookkeeping + [K]/[M] selects."""
    from . import ba_pallas

    inv_sigma2 = 1.0 / (pixel_noise_std * pixel_noise_std)
    obs_w = obs_mask.astype(jnp.float32)
    _, _, _, _, initial_cost = _evaluate(
        r_wb, t_wb, points, obs_uv, obs_mask, r_cb, t_cb, width, height,
        inv_sigma2, huber_delta,
    )

    # Whole LM loop in ONE kernel dispatch (ba_pallas._lm_loop runs the
    # accept/reject control flow in-kernel; per-dispatch host-sync costs
    # on the tunneled TPU make one-dispatch-per-iteration ~10x slower).
    r_fin, t_fin, pts_fin, final_cost, iters = ba_pallas.ba_solve(
        r_wb, t_wb, points, obs_uv, obs_w, fixed_pose, fixed_point,
        jnp.asarray(1e-4, jnp.float32), r_cb, t_cb, width, height,
        pixel_noise_std=pixel_noise_std, huber_delta=huber_delta,
        max_iterations=max_iterations, interpret=interpret,
    )
    final_cost = jnp.where(iters > 0, final_cost, initial_cost)
    return _classify(
        r_fin, t_fin, pts_fin, obs_uv, obs_mask, marginalized, fixed_point,
        r_cb, t_cb, width, height, inv_sigma2, huber_delta, chi2_threshold,
        initial_cost, final_cost, iters,
    )


def _run_ba_xla_core(
    r_wb: jax.Array,  # [K,3,3] initial poses
    t_wb: jax.Array,  # [K,3]
    points: jax.Array,  # [M,3] initial landmarks
    obs_uv: jax.Array,  # [K,M,2] observations
    obs_mask: jax.Array,  # [K,M] bool (feature valid & not boundary & landmark ok)
    fixed_pose: jax.Array,  # [K] bool (gauge anchors)
    fixed_point: jax.Array,  # [M] bool (marginalized / bad / unused slots)
    marginalized: jax.Array,  # [M] bool (never become bad)
    r_cb: jax.Array,
    t_cb: jax.Array,
    width: int,
    height: int,
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    chi2_threshold: float = 5.991,
    max_iterations: int = 50,
    axis: str | None = None,
) -> BaResult:
    """LM loop (see the jitted ``run_ba_xla`` wrapper). With ``axis``,
    landmark-axis arrays hold this device's shard; the reduced camera
    system, robust cost and classification counts are psum'd over that
    mesh axis (parallel/dist_window_ba.py)."""
    inv_sigma2 = 1.0 / (pixel_noise_std * pixel_noise_std)
    k, m = obs_mask.shape

    def gsum(x):
        return jax.lax.psum(x, axis) if axis is not None else x

    p_b0, p_c0, res0, _, initial_cost = _evaluate(
        r_wb, t_wb, points, obs_uv, obs_mask, r_cb, t_cb, width, height, inv_sigma2, huber_delta
    )
    initial_cost = gsum(initial_cost)

    def lm_cond(carry):
        *_, it, done = carry
        return (it < max_iterations) & ~done

    def lm_body(carry):
        # The evaluation products at the CURRENT state ride in the carry
        # (p_b, p_c, res) — they were already computed as last
        # iteration's trial evaluation, so each iteration runs exactly
        # one window evaluation instead of two.
        r, t, pts, p_b, p_c, res, lam, cost, it, done = carry
        j_pose, j_pt = factors.reprojection_jacobians(p_b, p_c, r[:, None], r_cb, width, height)
        w = factors.robust_weights(res, obs_mask, inv_sigma2, huber_delta)  # [K,M]

        # M-minor layout: the landmark axis lives in the TPU lane
        # dimension (128 lanes); the tiny 2/6/3 axes stay in registers.
        # With the [K,M,2,6] logical layout every einsum pads a 6-wide
        # minor dim to 128 lanes — measured ~5x slower per LM iteration.
        jp = j_pose.transpose(0, 2, 3, 1)  # [K,2,6,M]
        jl = j_pt.transpose(0, 2, 3, 1)  # [K,2,3,M]
        rs_ = res.transpose(0, 2, 1)  # [K,2,M]

        # Normal equation blocks
        u_blk = jnp.einsum("kicm,km,kidm->kcd", jp, w, jp)  # [K,6,6]
        v_blk = jnp.einsum("kicm,km,kidm->cdm", jl, w, jl)  # [3,3,M]
        w_blk = jnp.einsum("kicm,km,kidm->kcdm", jp, w, jl)  # [K,6,3,M]
        b_p = -jnp.einsum("kicm,km,kim->kc", jp, w, rs_)  # [K,6]
        b_l = -jnp.einsum("kicm,km,kim->cm", jl, w, rs_)  # [3,M]
        u_blk = gsum(u_blk)
        b_p = gsum(b_p)

        # LM damping on block diagonals
        u_d = u_blk + lam * jnp.eye(6) * jnp.einsum("kcc->k", u_blk)[:, None, None] / 6.0
        tr_v = v_blk[0, 0] + v_blk[1, 1] + v_blk[2, 2]  # [M]
        v_d = v_blk + (lam / 3.0) * jnp.eye(3)[:, :, None] * tr_v + 1e-8 * jnp.eye(3)[:, :, None]

        # Landmark inverse; fixed landmarks contribute nothing and don't move.
        v_inv = linsolve.inv3x3_mminor(v_d)  # [3,3,M]
        v_inv = jnp.where(fixed_point[None, None, :], 0.0, v_inv)

        # Reduced camera system, assembled directly in flat [(k c),(l f)]
        # form (transpose-free): the Schur cross-term is one real MXU
        # matmul [K*6, 3M] @ [3M, K*6]; the U block-diagonal and the
        # gauge masks apply in the flat layout.
        wv = jnp.einsum("kcdm,dem->kcem", w_blk, v_inv)  # [K,6,3,M]
        a2 = wv.reshape(k * 6, 3 * m)
        b2 = w_blk.reshape(k * 6, 3 * m)
        # The ONLY O(K^2) collectives: the Schur cross-term + rhs
        # correction (a few tens of KB), as in parallel/dist_ba.
        s_mat = -gsum(a2 @ b2.T)
        s_mat = s_mat + jnp.einsum("kl,kcf->kclf", jnp.eye(k), u_d).reshape(k * 6, k * 6)
        # Gauge: zero rows/cols of fixed poses, identity diagonal.
        fm = jnp.repeat((~fixed_pose).astype(s_mat.dtype), 6)
        s_mat = s_mat * fm[:, None] * fm[None, :] + jnp.diag(1.0 - fm)
        rhs = (b_p - gsum(jnp.einsum("kcem,em->kc", wv, b_l))).reshape(k * 6) * fm

        dx = linsolve.solve(s_mat, rhs).reshape(k, 6)
        dx = jnp.where(fixed_pose[:, None], 0.0, dx)
        dl_m = jnp.einsum(
            "dem,em->dm", v_inv, b_l - jnp.einsum("kcdm,kc->dm", w_blk, dx)
        )  # [3,M]
        dl = jnp.where(fixed_point[:, None], 0.0, dl_m.T)

        dr_dt = jax.vmap(lie.se3_exp)(dx)
        r_new, t_new = jax.vmap(lie.se3_compose)(r, t, dr_dt[0], dr_dt[1])
        pts_new = pts + dl

        p_b_n, p_c_n, res_n, _, new_cost = _evaluate(
            r_new, t_new, pts_new, obs_uv, obs_mask, r_cb, t_cb, width, height,
            inv_sigma2, huber_delta,
        )
        new_cost = gsum(new_cost)
        accept = new_cost < cost
        r = jnp.where(accept, r_new, r)
        t = jnp.where(accept, t_new, t)
        pts = jnp.where(accept, pts_new, pts)
        p_b = jnp.where(accept, p_b_n, p_b)
        p_c = jnp.where(accept, p_c_n, p_c)
        res = jnp.where(accept, res_n, res)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        step_small = (jnp.sum(dx * dx) + gsum(jnp.sum(dl * dl))) < 1e-14
        rel_drop = (cost - new_cost) < 1e-6 * cost
        # Also stop when the trust region has collapsed (many rejected
        # steps in a row — e.g. the window is already at the optimum).
        done = (accept & (step_small | rel_drop)) | (lam > 1e5)
        cost = jnp.where(accept, new_cost, cost)
        return (r, t, pts, p_b, p_c, res, lam, cost, it + 1, done)

    # Initial lam/done inherit initial_cost's varying axes (shard_map's
    # varying-manual-axes typing rejects invarying->varying carries).
    lam0 = jnp.asarray(1e-4, jnp.float32) + 0.0 * initial_cost
    done0 = initial_cost < 0.0  # always False; robust cost is non-negative
    r_fin, t_fin, pts_fin, _, _, _, _, final_cost, iters, _ = jax.lax.while_loop(
        lm_cond,
        lm_body,
        (
            r_wb,
            t_wb,
            points,
            p_b0,
            p_c0,
            res0,
            lam0,
            initial_cost,
            jnp.asarray(0, jnp.int32),
            done0,
        ),
    )

    return _classify(
        r_fin, t_fin, pts_fin, obs_uv, obs_mask, marginalized, fixed_point,
        r_cb, t_cb, width, height, inv_sigma2, huber_delta, chi2_threshold,
        initial_cost, final_cost, iters, axis=axis,
    )


def _classify(
    r_fin, t_fin, pts_fin, obs_uv, obs_mask, marginalized, fixed_point,
    r_cb, t_cb, width, height, inv_sigma2, huber_delta, chi2_threshold,
    initial_cost, final_cost, iters, axis: str | None = None,
) -> BaResult:
    """Post-solve chi2 classification (Optimizer.cpp:419-460)."""
    _, _, _, c2, _ = _evaluate(
        r_fin, t_fin, pts_fin, obs_uv, obs_mask, r_cb, t_cb, width, height,
        inv_sigma2, huber_delta,
    )
    outlier_obs = obs_mask & (c2 > chi2_threshold)
    inlier_obs = obs_mask & ~outlier_obs
    inl_per_lm = jnp.sum(inlier_obs, axis=0)
    outl_per_lm = jnp.sum(outlier_obs, axis=0)
    new_bad = (~marginalized) & (~fixed_point) & (inl_per_lm == 0) & (outl_per_lm >= 2)

    n_inl = jnp.sum(inlier_obs).astype(jnp.int32)
    n_outl = jnp.sum(outlier_obs).astype(jnp.int32)
    if axis is not None:
        n_inl = jax.lax.psum(n_inl, axis)
        n_outl = jax.lax.psum(n_outl, axis)
    return BaResult(
        r_wb=r_fin,
        t_wb=t_fin,
        points=pts_fin,
        num_inliers=n_inl,
        num_outliers=n_outl,
        new_bad=new_bad,
        outlier_obs=outlier_obs,
        initial_cost=initial_cost,
        final_cost=final_cost,
        num_iterations=iters,
    )


run_ba_xla = functools.partial(
    _pjit, static_argnames=("width", "height", "max_iterations")
)(functools.partial(_run_ba_xla_core, axis=None))

"""Single-pose PnP via on-manifold Levenberg–Marquardt.

Counterpart of ``Optimizer::SolvePnP`` (Optimizer.cpp:83-302) without
Ceres: 4 rounds of [LM solve -> chi2 classification], outliers latched
across rounds, marginalized landmarks never outliers, Huber(1.0),
info = I/sigma_px^2, >=10 inliers required else the predicted pose is
kept. Each round restarts from the *initial* pose with zero
perturbation, exactly like the reference's re-zeroed parameter block
(Optimizer.cpp:189-191).

Everything is fixed-shape: observations live in [N] arrays with an
active mask; the LM loop is a ``lax.while_loop`` over a 6x6 damped
normal-equation solve — one jit, no recompiles across frames.
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
class PnpResult:
    r_wb: jax.Array  # [3,3] optimized (or kept) pose
    t_wb: jax.Array  # [3]
    success: jax.Array  # [] bool
    num_inliers: jax.Array  # [] int32
    num_outliers: jax.Array  # [] int32
    outlier: jax.Array  # [N] bool latched outlier flags
    final_cost: jax.Array  # [] f32 mean inlier chi2


def _evaluate(r_wb, t_wb, points, obs, active, r_cb, t_cb, width, height, inv_sigma2, huber_delta):
    p_b, p_c = factors.transform_points(r_wb[None], t_wb[None], r_cb, t_cb, points)
    res = factors.reprojection_residual(p_c[0], obs, width, height)  # [N,2]
    c2 = factors.chi2(res, inv_sigma2)
    # Ceres total cost: 1/2 sum rho(chi2)
    delta2 = huber_delta * huber_delta
    rho = jnp.where(c2 <= delta2, c2, 2.0 * huber_delta * jnp.sqrt(jnp.maximum(c2, 1e-20)) - delta2)
    cost = 0.5 * jnp.sum(jnp.where(active, rho, 0.0))
    return p_b[0], p_c[0], res, c2, cost


def resolve_backend(backend: str = "auto") -> str:
    """'auto' -> Pallas megakernel on TPU, XLA elsewhere.
    'pallas-interpret' runs the Pallas kernel via the interpreter
    (production kernel logic, executable on CPU)."""
    if backend == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return backend


def solve_pnp(
    r_wb_init,
    t_wb_init,
    points_w,
    obs_uv,
    active,
    marginalized,
    r_cb,
    t_cb,
    width: int,
    height: int,
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    chi2_threshold: float = 5.991,
    rounds: int = 4,
    max_iterations: int = 50,
    min_inliers: int = 10,
    backend: str = "auto",
) -> PnpResult:
    """PnP dispatcher — see ``solve_pnp_xla`` for the contract."""
    n = points_w.shape[0]
    resolved = resolve_backend(backend)
    kw = dict(
        pixel_noise_std=pixel_noise_std, huber_delta=huber_delta,
        chi2_threshold=chi2_threshold, rounds=rounds,
        max_iterations=max_iterations, min_inliers=min_inliers,
    )
    if resolved in ("pallas", "pallas-interpret") and n % 128 == 0:
        fn = solve_pnp_pallas
        kw["interpret"] = resolved == "pallas-interpret"
    else:
        fn = solve_pnp_xla
    return fn(
        r_wb_init, t_wb_init, points_w, obs_uv, active, marginalized,
        r_cb, t_cb, width, height, **kw,
    )


@functools.partial(
    _pjit,
    static_argnames=(
        "width", "height", "rounds", "max_iterations", "min_inliers",
        "pixel_noise_std", "huber_delta", "chi2_threshold", "interpret",
    ),
)
def solve_pnp_pallas(
    r_wb_init: jax.Array,
    t_wb_init: jax.Array,
    points_w: jax.Array,
    obs_uv: jax.Array,
    active: jax.Array,
    marginalized: jax.Array,
    r_cb: jax.Array,
    t_cb: jax.Array,
    width: int,
    height: int,
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    chi2_threshold: float = 5.991,
    rounds: int = 4,
    max_iterations: int = 50,
    min_inliers: int = 10,
    interpret: bool = False,
) -> PnpResult:
    """PnP via the BA megakernel with K=1 and every landmark frozen
    (solver/ba_pallas.py, diag_damping matches the PnP LM flavor)."""
    from . import ba_pallas

    n = points_w.shape[0]
    enough = jnp.sum(active) >= 6  # Optimizer.cpp:127

    # All 4 chi2 rounds x LM solves run inside ONE kernel dispatch
    # (ba_pallas._pnp_solve_kernel); per-dispatch host-sync costs on the
    # tunneled TPU would otherwise multiply by rounds x LM iterations.
    r_fin, t_fin, outlier, final_cost, num_inliers, num_outliers = (
        ba_pallas.pnp_solve(
            r_wb_init, t_wb_init, points_w, obs_uv, active, marginalized,
            jnp.asarray(1e-4, jnp.float32), r_cb, t_cb, width, height,
            pixel_noise_std=pixel_noise_std, huber_delta=huber_delta,
            chi2_threshold=chi2_threshold, rounds=rounds,
            max_iterations=max_iterations, interpret=interpret,
        )
    )
    success = enough & (num_inliers >= min_inliers)
    # Snap onto SO(3) on the way out: PnP output feeds the next frame's
    # constant-velocity prediction, which amplifies off-manifold error.
    r_out = lie.so3_renormalize(jnp.where(success, r_fin, r_wb_init))
    t_out = jnp.where(success, t_fin, t_wb_init)
    return PnpResult(
        r_wb=r_out,
        t_wb=t_out,
        success=success,
        num_inliers=num_inliers,
        num_outliers=num_outliers,
        outlier=outlier,
        final_cost=final_cost,
    )


@functools.partial(
    _pjit,
    static_argnames=("width", "height", "rounds", "max_iterations", "min_inliers"),
)
def solve_pnp_xla(
    r_wb_init: jax.Array,  # [3,3]
    t_wb_init: jax.Array,  # [3]
    points_w: jax.Array,  # [N,3] landmark positions
    obs_uv: jax.Array,  # [N,2] observations
    active: jax.Array,  # [N] bool (valid feat & landmark & not boundary)
    marginalized: jax.Array,  # [N] bool (never outliers, Optimizer.cpp:218-220)
    r_cb: jax.Array,  # [3,3]
    t_cb: jax.Array,  # [3]
    width: int,
    height: int,
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    chi2_threshold: float = 5.991,
    rounds: int = 4,
    max_iterations: int = 50,
    min_inliers: int = 10,
) -> PnpResult:
    inv_sigma2 = 1.0 / (pixel_noise_std * pixel_noise_std)
    n = points_w.shape[0]
    enough = jnp.sum(active) >= 6  # Optimizer.cpp:127

    outlier = jnp.zeros((n,), bool)
    r_fin, t_fin = r_wb_init, t_wb_init
    final_cost = jnp.asarray(0.0, jnp.float32)

    for _ in range(rounds):
        use = active & ~outlier

        def lm_cond(carry):
            r, t, lam, cost, it, done = carry
            return (it < max_iterations) & ~done

        def lm_body(carry):
            r, t, lam, cost, it, done = carry
            p_b, p_c, res, c2, _ = _evaluate(
                r, t, points_w, obs_uv, use, r_cb, t_cb, width, height, inv_sigma2, huber_delta
            )
            j_pose, _ = factors.reprojection_jacobians(p_b, p_c, r, r_cb, width, height)
            w = factors.robust_weights(res, use, inv_sigma2, huber_delta)  # [N]
            # N-minor layout (N in the lane dim; see ba.py note)
            jp = j_pose.transpose(1, 2, 0)  # [2,6,N]
            h = jnp.einsum("icn,n,idn->cd", jp, w, jp)  # [6,6]
            g = jnp.einsum("icn,n,in->c", jp, w, res.T)  # [6]
            damped = h + lam * jnp.diag(jnp.diag(h)) + 1e-10 * jnp.eye(6)
            delta = -linsolve.solve(damped, g)
            dr, dt = lie.se3_exp(delta)
            r_new, t_new = lie.se3_compose(r, t, dr, dt)
            _, _, _, _, new_cost = _evaluate(
                r_new, t_new, points_w, obs_uv, use, r_cb, t_cb, width, height,
                inv_sigma2, huber_delta,
            )
            accept = new_cost < cost
            r = jnp.where(accept, r_new, r)
            t = jnp.where(accept, t_new, t)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
            step_small = jnp.sum(delta * delta) < 1e-16
            rel_drop = (cost - new_cost) < 1e-6 * cost
            # lam > 1e5: trust region collapsed (e.g. already at the
            # optimum and every step is rejected) — stop early.
            done = (accept & (step_small | rel_drop)) | (lam > 1e5)
            cost = jnp.where(accept, new_cost, cost)
            return (r, t, lam, cost, it + 1, done)

        _, _, _, _, init_cost = _evaluate(
            r_wb_init, t_wb_init, points_w, obs_uv, use, r_cb, t_cb, width, height,
            inv_sigma2, huber_delta,
        )
        # lam/done inherit init_cost's varying axes: under shard_map
        # (parallel/multi_seq.py) the carry must not mix invarying
        # literals with values that become axis-varying in the body.
        lam0 = jnp.asarray(1e-4, jnp.float32) + 0.0 * init_cost
        done0 = init_cost < 0.0  # always False; robust cost >= 0
        r_sol, t_sol, _, _, _, _ = jax.lax.while_loop(
            lm_cond,
            lm_body,
            (r_wb_init, t_wb_init, lam0, init_cost,
             jnp.asarray(0, jnp.int32), done0),
        )

        # chi2 classification at the solution (raw wrapped residuals)
        _, _, _, c2, _ = _evaluate(
            r_sol, t_sol, points_w, obs_uv, active, r_cb, t_cb, width, height,
            inv_sigma2, huber_delta,
        )
        outlier = active & ~marginalized & (c2 > chi2_threshold)
        r_fin, t_fin = r_sol, t_sol
        inlier_mask = active & ~outlier
        n_inl = jnp.sum(inlier_mask)
        final_cost = jnp.sum(jnp.where(inlier_mask, c2, 0.0)) / jnp.maximum(n_inl, 1)

    inlier_mask = active & ~outlier
    num_inliers = jnp.sum(inlier_mask).astype(jnp.int32)
    num_outliers = jnp.sum(outlier).astype(jnp.int32)
    success = enough & (num_inliers >= min_inliers)

    # Keep the predicted pose on failure (Optimizer.cpp:283-291);
    # renormalized either way — PnP output feeds the next frame's
    # constant-velocity prediction, which amplifies off-manifold error.
    r_out = lie.so3_renormalize(jnp.where(success, r_fin, r_wb_init))
    t_out = jnp.where(success, t_fin, t_wb_init)
    return PnpResult(
        r_wb=r_out,
        t_wb=t_out,
        success=success,
        num_inliers=num_inliers,
        num_outliers=num_outliers,
        outlier=outlier,
        final_cost=final_cost,
    )

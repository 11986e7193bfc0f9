"""SE(3) pose-graph optimization — batched LM over relative-pose factors.

New capability vs the reference: its sliding window forgets everything
older than 10 keyframes (Estimator.cpp:692-754 eviction) and exports
nothing; long-sequence consistency ends at the window boundary. This
layer keeps the FULL keyframe trajectory optimizable: evicted keyframes
stay connected to the live window through SE(3) relative constraints
(consecutive-KF relatives from BA-refined poses, skip relatives, and
IMU preintegration odometry — see estimator integration), and a
periodic pose-graph solve propagates present refinements back through
the history. SURVEY.md §7 stage 8 / BASELINE north star ("pose-graph
optimization over the same mesh").

TPU-first design (no reference counterpart to port):

- fixed-capacity SoA: [P] poses + [C] edges with valid masks — one
  compiled program for any graph that fits the capacity;
- per-edge residual r = log(T_meas^-1 * T_i^-1 * T_j) with EXACT
  Jacobians via forward-mode autodiff of the right-perturbation
  (vmapped over edges — the 6x12 per-edge Jacobian is tiny, batched
  work; no hand-derived approximate J_r inverses to validate);
- Hessian assembled DENSE [6P, 6P] by scatter-add of the 4 per-edge
  blocks — at window-history scale (P <= a few hundred) a dense MXU
  Cholesky beats any sparse structure, mirroring the dense-Schur
  choice in solver/ba.py;
- LM loop is a lax.while_loop with accept/reject damping, the same
  flavor as solver/ba.py / parallel/dist_ba.py;
- distributed form: shard the EDGE axis over a mesh axis; each device
  assembles its shard's H/b partial sums, one psum [6P,6P]+[6P] per
  iteration, identical replicated solve (parallel/dist_pose_graph.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..geometry import lie
from . import linsolve
from ..utils.precision import jit as _pjit


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PoseGraphResult:
    r_wb: jax.Array  # [P,3,3] optimized rotations
    t_wb: jax.Array  # [P,3]
    final_cost: jax.Array  # [] f32
    initial_cost: jax.Array  # [] f32
    num_iterations: jax.Array  # [] int32


def edge_residual(r_i, t_i, r_j, t_j, rel_r, rel_t):
    """r = log( T_meas^-1 * T_i^-1 * T_j )  [6] (rho, phi)."""
    rm_inv, tm_inv = lie.se3_inverse(rel_r, rel_t)
    ri_inv, ti_inv = lie.se3_inverse(r_i, t_i)
    re, te = lie.se3_compose(ri_inv, ti_inv, r_j, t_j)
    re, te = lie.se3_compose(rm_inv, tm_inv, re, te)
    return lie.se3_log(re, te)


def _edge_residual_jac(r_i, t_i, r_j, t_j, rel_r, rel_t):
    """Residual + exact 6x6 Jacobians wrt right-perturbations of T_i, T_j."""

    def f(xi):
        d_ri, d_ti = lie.se3_exp(xi[:6])
        d_rj, d_tj = lie.se3_exp(xi[6:])
        ri, ti = lie.se3_compose(r_i, t_i, d_ri, d_ti)
        rj, tj = lie.se3_compose(r_j, t_j, d_rj, d_tj)
        return edge_residual(ri, ti, rj, tj, rel_r, rel_t)

    res = f(jnp.zeros(12))
    jac = jax.jacfwd(f)(jnp.zeros(12))  # [6, 12]
    return res, jac[:, :6], jac[:, 6:]


def _assemble(h, b, idx, blk_h, blk_b):
    """Scatter-add one [C,6,6] block set at pose indices idx into the
    dense H [6P,6P] / b [6P]."""
    rows = 6 * idx[:, None] + jnp.arange(6)[None, :]  # [C, 6]
    h = h.at[rows[:, :, None], rows[:, None, :]].add(blk_h)
    b = b.at[rows].add(blk_b)
    return h, b


def _assemble_off(h, idx_r, idx_c, blk):
    rows = 6 * idx_r[:, None] + jnp.arange(6)[None, :]
    cols = 6 * idx_c[:, None] + jnp.arange(6)[None, :]
    return h.at[rows[:, :, None], cols[:, None, :]].add(blk)


def _graph_cost(r_wb, t_wb, ei, ej, rel_r, rel_t, w_sqrt, edge_valid, axis):
    res = jax.vmap(
        lambda i, j, rr, rt: edge_residual(r_wb[i], t_wb[i], r_wb[j], t_wb[j], rr, rt)
    )(ei, ej, rel_r, rel_t)  # [C, 6]
    wres = res * w_sqrt
    cost = 0.5 * jnp.sum(jnp.where(edge_valid[:, None], wres * wres, 0.0))
    if axis is not None:
        cost = jax.lax.psum(cost, axis)
    return cost


def optimize_pose_graph_core(
    r_wb,  # [P,3,3]
    t_wb,  # [P,3]
    ei,  # [C] int32 source pose index per edge
    ej,  # [C] int32 target pose index
    rel_r,  # [C,3,3] measured T_i^-1 T_j rotation
    rel_t,  # [C,3]
    w_sqrt,  # [C,6] diagonal sqrt-information (rho, phi)
    edge_valid,  # [C] bool
    fixed_pose,  # [P] bool (gauge anchors / live-window poses)
    max_iterations: int = 50,
    axis: str | None = None,
) -> PoseGraphResult:
    """LM over the pose graph. With ``axis``, edge arrays hold this
    device's shard and H/b/cost are psum'd over that mesh axis."""
    p = r_wb.shape[0]
    ei = jnp.clip(ei, 0, p - 1)
    ej = jnp.clip(ej, 0, p - 1)
    w_eff = jnp.where(edge_valid[:, None], w_sqrt, 0.0)

    init_cost = _graph_cost(r_wb, t_wb, ei, ej, rel_r, rel_t, w_eff, edge_valid, axis)

    def lm_cond(carry):
        *_, it, done = carry
        return (it < max_iterations) & ~done

    def lm_body(carry):
        r, t, lam, cost, it, done = carry
        res, j_i, j_j = jax.vmap(
            lambda i, j, rr, rt: _edge_residual_jac(r[i], t[i], r[j], t[j], rr, rt)
        )(ei, ej, rel_r, rel_t)  # [C,6], [C,6,6], [C,6,6]

        # Whiten: rows scaled by sqrt-info diag.
        j_i = j_i * w_eff[:, :, None]
        j_j = j_j * w_eff[:, :, None]
        wres = res * w_eff

        h = jnp.zeros((6 * p, 6 * p), jnp.float32)
        b = jnp.zeros((6 * p,), jnp.float32)
        h, b = _assemble(h, b, ei, jnp.einsum("cri,crj->cij", j_i, j_i),
                         -jnp.einsum("cri,cr->ci", j_i, wres))
        h, b = _assemble(h, b, ej, jnp.einsum("cri,crj->cij", j_j, j_j),
                         -jnp.einsum("cri,cr->ci", j_j, wres))
        hij = jnp.einsum("cri,crj->cij", j_i, j_j)
        h = _assemble_off(h, ei, ej, hij)
        h = _assemble_off(h, ej, ei, hij.transpose(0, 2, 1))
        if axis is not None:
            h = jax.lax.psum(h, axis)
            b = jax.lax.psum(b, axis)

        # Damping + gauge: fixed poses get identity rows/cols.
        free = jnp.repeat(~fixed_pose, 6).astype(h.dtype)  # [6P]
        diag = jnp.diagonal(h)
        h = h + jnp.diag(lam * jnp.maximum(diag, 1e-6))
        h = h * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        b = b * free

        dx = linsolve.solve(h, b).reshape(p, 6)
        dx = jnp.where(fixed_pose[:, None], 0.0, dx)

        dr_dt = jax.vmap(lie.se3_exp)(dx)
        r_new, t_new = jax.vmap(lie.se3_compose)(r, t, dr_dt[0], dr_dt[1])
        new_cost = _graph_cost(r_new, t_new, ei, ej, rel_r, rel_t, w_eff, edge_valid, axis)

        accept = new_cost < cost
        r = jnp.where(accept, r_new, r)
        t = jnp.where(accept, t_new, t)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6))
        step_small = jnp.sum(dx * dx) < 1e-14
        rel_drop = (cost - new_cost) < 1e-7 * cost
        done = accept & (step_small | rel_drop)
        cost = jnp.where(accept, new_cost, cost)
        return (r, t, lam, cost, it + 1, done)

    lam0 = jnp.asarray(1e-4, jnp.float32) + 0.0 * init_cost
    done0 = init_cost < 0.0
    r_f, t_f, _, final_cost, iters, _ = jax.lax.while_loop(
        lm_cond, lm_body,
        (r_wb, t_wb, lam0, init_cost, jnp.asarray(0, jnp.int32), done0),
    )
    return PoseGraphResult(
        r_wb=jax.vmap(lie.so3_renormalize)(r_f),
        t_wb=t_f,
        final_cost=final_cost,
        initial_cost=init_cost,
        num_iterations=iters,
    )


@functools.partial(_pjit, static_argnames=("max_iterations",))
def optimize_pose_graph(
    r_wb, t_wb, ei, ej, rel_r, rel_t, w_sqrt, edge_valid, fixed_pose,
    max_iterations: int = 50,
) -> PoseGraphResult:
    """Single-device jitted entry point (see optimize_pose_graph_core)."""
    return optimize_pose_graph_core(
        r_wb, t_wb, ei, ej, rel_r, rel_t, w_sqrt, edge_valid, fixed_pose,
        max_iterations=max_iterations, axis=None,
    )


# ----------------------------------------------------------------------
# Sim(3) pose graph — scale-drift-aware loop closure for monocular VO.
# ----------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Sim3GraphResult:
    r_wb: jax.Array  # [P,3,3]
    t_wb: jax.Array  # [P,3]
    log_s: jax.Array  # [P] per-node log scale
    final_cost: jax.Array
    initial_cost: jax.Array
    num_iterations: jax.Array


def sim3_edge_residual(r_i, t_i, ls_i, r_j, t_j, ls_j, rel_r, rel_t):
    """[7] residual of the Sim(3) relative (Strasdat RSS'10 form):

      e_R = log( R_m^T R_i^T R_j )
      e_t = s_i^{-1} R_i^T (t_j - t_i) - t_m
      e_s = log s_j - log s_i

    Monocular odometry measures t_m in ITS OWN local scale, so a
    drifting per-node scale s_i keeps e_t consistent — scale drift
    becomes an explicit state the loop edges can observe and remove,
    which an SE(3) graph structurally cannot (measured: 3-lap VO with
    per-lap map scale 6.54 -> 7.84; SE(3) graph recovered 3% of ATE,
    Sim(3) is the standard fix). Edge measurements carry implicit
    s_m = 1: loops tie the revisit's scale to the mapped-first-visit
    scale through e_t and e_s.
    """
    e_r = lie.so3_log(rel_r.T @ (r_i.T @ r_j))
    e_t = jnp.exp(-ls_i) * (r_i.T @ (t_j - t_i)) - rel_t
    e_s = (ls_j - ls_i)[None]
    return jnp.concatenate([e_t, e_r, e_s])


def _sim3_residual_jac(r_i, t_i, ls_i, r_j, t_j, ls_j, rel_r, rel_t):
    def f(xi):
        d_ri, d_ti = lie.se3_exp(xi[:6])
        d_rj, d_tj = lie.se3_exp(xi[7:13])
        ri, ti = lie.se3_compose(r_i, t_i, d_ri, d_ti)
        rj, tj = lie.se3_compose(r_j, t_j, d_rj, d_tj)
        return sim3_edge_residual(
            ri, ti, ls_i + xi[6], rj, tj, ls_j + xi[13], rel_r, rel_t
        )

    res = f(jnp.zeros(14))
    jac = jax.jacfwd(f)(jnp.zeros(14))  # [7, 14]
    return res, jac[:, :7], jac[:, 7:]


def _sim3_cost(r, t, ls, ei, ej, rel_r, rel_t, w_sqrt, edge_valid):
    res = jax.vmap(
        lambda i, j, rr, rt: sim3_edge_residual(
            r[i], t[i], ls[i], r[j], t[j], ls[j], rr, rt
        )
    )(ei, ej, rel_r, rel_t)
    wres = res * w_sqrt
    return 0.5 * jnp.sum(jnp.where(edge_valid[:, None], wres * wres, 0.0))


@functools.partial(_pjit, static_argnames=("max_iterations",))
def optimize_pose_graph_sim3(
    r_wb,  # [P,3,3]
    t_wb,  # [P,3]
    ei,  # [C] i32
    ej,  # [C] i32
    rel_r,  # [C,3,3]
    rel_t,  # [C,3]
    w_sqrt,  # [C,7] diagonal sqrt-info (rho, phi, sigma)
    edge_valid,  # [C] bool
    fixed_pose,  # [P] bool
    max_iterations: int = 50,
) -> Sim3GraphResult:
    """LM over the Sim(3) graph; same dense-H/scatter structure as the
    SE(3) solve with a 7-dim per-node block."""
    p = r_wb.shape[0]
    d = 7
    ei = jnp.clip(ei, 0, p - 1)
    ej = jnp.clip(ej, 0, p - 1)
    w_eff = jnp.where(edge_valid[:, None], w_sqrt, 0.0)
    ls0 = jnp.zeros((p,), jnp.float32)

    init_cost = _sim3_cost(r_wb, t_wb, ls0, ei, ej, rel_r, rel_t, w_eff, edge_valid)

    def assemble(h, b, idx, blk_h, blk_b):
        rows = d * idx[:, None] + jnp.arange(d)[None, :]
        h = h.at[rows[:, :, None], rows[:, None, :]].add(blk_h)
        b = b.at[rows].add(blk_b)
        return h, b

    def assemble_off(h, idx_r, idx_c, blk):
        rows = d * idx_r[:, None] + jnp.arange(d)[None, :]
        cols = d * idx_c[:, None] + jnp.arange(d)[None, :]
        return h.at[rows[:, :, None], cols[:, None, :]].add(blk)

    def lm_cond(carry):
        *_, it, done = carry
        return (it < max_iterations) & ~done

    def lm_body(carry):
        r, t, ls, lam, cost, rejects, it, done = carry
        res, j_i, j_j = jax.vmap(
            lambda i, j, rr, rt: _sim3_residual_jac(
                r[i], t[i], ls[i], r[j], t[j], ls[j], rr, rt
            )
        )(ei, ej, rel_r, rel_t)
        j_i = j_i * w_eff[:, :, None]
        j_j = j_j * w_eff[:, :, None]
        wres = res * w_eff

        h = jnp.zeros((d * p, d * p), jnp.float32)
        b = jnp.zeros((d * p,), jnp.float32)
        h, b = assemble(h, b, ei, jnp.einsum("cri,crj->cij", j_i, j_i),
                        -jnp.einsum("cri,cr->ci", j_i, wres))
        h, b = assemble(h, b, ej, jnp.einsum("cri,crj->cij", j_j, j_j),
                        -jnp.einsum("cri,cr->ci", j_j, wres))
        hij = jnp.einsum("cri,crj->cij", j_i, j_j)
        h = assemble_off(h, ei, ej, hij)
        h = assemble_off(h, ej, ei, hij.transpose(0, 2, 1))

        free = jnp.repeat(~fixed_pose, d).astype(h.dtype)
        diag = jnp.diagonal(h)
        h = h + jnp.diag(lam * jnp.maximum(diag, 1e-6))
        h = h * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        b = b * free

        dx = linsolve.solve(h, b).reshape(p, d)
        dx = jnp.where(fixed_pose[:, None], 0.0, dx)

        dr_dt = jax.vmap(lie.se3_exp)(dx[:, :6])
        r_new, t_new = jax.vmap(lie.se3_compose)(r, t, dr_dt[0], dr_dt[1])
        ls_new = ls + dx[:, 6]
        new_cost = _sim3_cost(r_new, t_new, ls_new, ei, ej, rel_r, rel_t,
                              w_eff, edge_valid)
        accept = new_cost < cost
        r = jnp.where(accept, r_new, r)
        t = jnp.where(accept, t_new, t)
        ls = jnp.where(accept, ls_new, ls)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        step_small = jnp.sum(dx * dx) < 1e-14
        rel_drop = (cost - new_cost) < 1e-7 * cost
        rejects = jnp.where(accept, 0, rejects + 1)
        # f32 stall: near the optimum cost differences fall below f32
        # resolution and every step rejects forever. Only treat a long
        # reject run as convergence once lambda is large (the step is
        # genuinely tiny) — early reject runs are lambda warm-up, and
        # exiting there leaves the solve at a divergent point
        # (measured: node scales 4.5x on the 3-lap benchmark).
        stalled = (rejects >= 10) & (lam >= 1e2)
        done = (accept & (step_small | rel_drop)) | stalled
        cost = jnp.where(accept, new_cost, cost)
        return (r, t, ls, lam, cost, rejects, it + 1, done)

    lam0 = jnp.asarray(1e-4, jnp.float32) + 0.0 * init_cost
    done0 = init_cost < 0.0
    r_f, t_f, ls_f, _, final_cost, _, iters, _ = jax.lax.while_loop(
        lm_cond, lm_body,
        (r_wb, t_wb, ls0, lam0, init_cost, jnp.asarray(0, jnp.int32),
         jnp.asarray(0, jnp.int32), done0),
    )
    return Sim3GraphResult(
        r_wb=jax.vmap(lie.so3_renormalize)(r_f),
        t_wb=t_f,
        log_s=ls_f,
        final_cost=final_cost,
        initial_cost=init_cost,
        num_iterations=iters,
    )

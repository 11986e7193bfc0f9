"""Pallas TPU megakernel for one windowed-BA LM iteration.

The XLA formulation of the LM body (solver/ba.py) runs ~0.7 ms per
iteration at the reference operating point (K=10 poses, M=2048
landmarks): the [K, M]-sized tensors are small enough that per-fusion
fixed costs dominate. This kernel runs the ENTIRE iteration —
linearize -> normal blocks -> Schur reduction -> 60x60 solve ->
retract -> trial evaluation — as one VMEM-resident Pallas program, so
a full LM solve is one kernel dispatch per iteration and nothing ever
touches HBM between stages.

Layout strategy:
- per-observation quantities are [K, M] planes (K keyframes in
  sublanes, M landmarks in lanes);
- per-pose quantities are [K, 1] columns that broadcast against the
  planes; landmark reductions are sublane sums to [1, M] rows;
- the reduced camera system uses the (c, k) unknown ordering so it
  assembles from 6x6 = 36 [K, K] blocks by concatenation (no
  interleaved scatter), with the U block-diagonal added via iota
  masks; one MXU matmul computes all Schur cross-terms at once;
- the 6K x 6K solve is a statically unrolled Gauss-Jordan.

Math mirrors solver/ba.py exactly (which mirrors Optimizer.cpp:304-491
semantics); equivalence is asserted by tests/test_ba_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ..utils.precision import jit as _pjit

MAX_PIXEL_ERROR = 100.0  # Factors.cpp:110
_TWO_PI = 2.0 * jnp.pi
_PI = jnp.pi
_PI_2 = jnp.pi / 2
_PI_4 = jnp.pi / 4


def _atan01(x):
    """atan for x in [0, 1] (cephes atanf: one range reduction at
    tan(pi/8) + odd minimax polynomial; |err| < 1e-6 rad). Mosaic has
    no atan/atan2/asin lowering, so the kernel carries its own."""
    red = x > 0.4142135623730951
    xr = jnp.where(red, (x - 1.0) / (x + 1.0), x)
    z = xr * xr
    y = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * xr + xr
    return jnp.where(red, _PI_4 + y, y)


def _atan2(a, b):
    """Branch-free atan2 built on _atan01 (quadrant fixup via selects)."""
    abs_a = jnp.abs(a)
    abs_b = jnp.abs(b)
    mx = jnp.maximum(abs_a, abs_b)
    mn = jnp.minimum(abs_a, abs_b)
    q = mn / jnp.maximum(mx, 1e-30)
    at = _atan01(q)
    at = jnp.where(abs_a > abs_b, _PI_2 - at, at)
    at = jnp.where(b < 0.0, _PI - at, at)
    return jnp.where(a < 0.0, -at, at)


def _asin(t):
    """asin(t) for |t| <= 1 via atan2(t, sqrt(1 - t^2))."""
    c = jnp.sqrt(jnp.maximum(1.0 - t * t, 0.0))
    return _atan2(t, c)


def _evaluate_plane(
    r, t,  # [3][3] / [3] of [K, 1] pose columns
    px, py, pz,  # [1, M]
    obs_u, obs_v,  # [K, M]
    wmask,  # [K, M]
    rcb, tcb, inv_s2,
    width: float,
    height: float,
    huber_delta: float,
):
    """ERP reprojection on [K, M] planes -> (pb, pc, res_u, res_v,
    chi2, huber cost). Mirrors solver/ba.py::_evaluate."""
    d2 = huber_delta * huber_delta
    dx = px - t[0]  # [K, M]
    dy = py - t[1]
    dz = pz - t[2]
    # body frame: R^T (p - t)
    pb = [r[0][i0] * dx + r[1][i0] * dy + r[2][i0] * dz for i0 in range(3)]
    # camera frame: R_cb pb + t_cb
    pc = [
        rcb[i0][0] * pb[0] + rcb[i0][1] * pb[1] + rcb[i0][2] * pb[2] + tcb[i0]
        for i0 in range(3)
    ]
    x, y, z = pc
    theta = _atan2(x, z)
    # -asin(y/|p|) == -atan2(y, sqrt(x^2+z^2))
    phi = -_atan2(y, jnp.sqrt(jnp.maximum(x * x + z * z, 1e-24)))
    proj_u = width * (0.5 + theta / _TWO_PI)
    proj_v = height * (0.5 - phi / jnp.pi)
    du = obs_u - proj_u
    du = du - width * jnp.round(du / width)  # horizontal wrap
    dv = obs_v - proj_v
    c2 = (du * du + dv * dv) * inv_s2
    rho = jnp.where(
        c2 <= d2, c2, 2.0 * huber_delta * jnp.sqrt(jnp.maximum(c2, 1e-20)) - d2
    )
    cost = 0.5 * jnp.sum(rho * wmask)
    return pb, pc, du, dv, c2, cost


def _lm_iteration(
    pose12,  # [K, 12] value: rows r00..r22, t0..t2
    px, py, pz,  # [1, M] landmark rows
    obs_u, obs_v,  # [K, M]
    wmask,  # [K, M] f32 1.0 = active observation
    fixedpt,  # [1, M] 1.0 = fixed landmark
    fm_col,  # [6K, 1] free-pose mask in (c, k) order
    fm_row,  # [1, 6K]
    lam,  # scalar
    rcb, tcb,  # [3][3] / [3] scalars
    inv_s2,  # scalar
    *,
    k: int,
    m: int,
    width: float,
    height: float,
    huber_delta: float,
    diag_damping: bool,
):
    """One LM iteration on VALUES (usable both as a standalone kernel
    body and inside an in-kernel LM while_loop). Returns
    (pose12_new [K,12], px_new, py_new, pz_new, cur_cost, new_cost,
    step_sq)."""
    f32 = jnp.float32
    d2 = huber_delta * huber_delta
    cu = width / _TWO_PI
    cv = height / jnp.pi

    # pose components as [K, 1] columns
    r = [[pose12[:, 3 * i + j][:, None] for j in range(3)] for i in range(3)]
    t = [pose12[:, 9 + i][:, None] for i in range(3)]

    def evaluate(r, t, px, py, pz):
        return _evaluate_plane(
            r, t, px, py, pz, obs_u, obs_v, wmask, rcb, tcb, inv_s2,
            width, height, huber_delta,
        )

    pb, pc, du, dv, c2, cur_cost = evaluate(r, t, px, py, pz)

    # robust IRLS weight (Huber' * info), >100 px latched out
    w_huber = jnp.where(
        c2 <= d2, 1.0, huber_delta / jnp.sqrt(jnp.maximum(c2, 1e-20))
    ) * inv_s2
    big = (jnp.abs(du) > MAX_PIXEL_ERROR) | (jnp.abs(dv) > MAX_PIXEL_ERROR)
    w = jnp.where(big, 0.0, w_huber * wmask)

    # ---- projection jacobian (residual sign: J = -d proj / d pc) ----
    x, y, z = pc
    xz_sq = jnp.maximum(x * x + z * z, 1e-12)
    l_sq = jnp.maximum(x * x + y * y + z * z, 1e-12)
    xz = jnp.sqrt(xz_sq)
    jpc = [
        [-(cu * z / xz_sq), jnp.zeros_like(x), -(-cu * x / xz_sq)],
        [
            -(-cv * x * y / (l_sq * xz)),
            -(cv * xz / l_sq),
            -(-cv * y * z / (l_sq * xz)),
        ],
    ]  # [2][3] of [K, M]
    # translation block: jpc @ (-R_cb)
    jt = [
        [
            -(jpc[i0][0] * rcb[0][j0] + jpc[i0][1] * rcb[1][j0] + jpc[i0][2] * rcb[2][j0])
            for j0 in range(3)
        ]
        for i0 in range(2)
    ]
    # rotation block: jpc @ R_cb @ hat(pb)
    # rh = jpc @ R_cb  (same contraction as jt without the minus)
    rh = [[-jt[i0][j0] for j0 in range(3)] for i0 in range(2)]
    hat = [
        [None, lambda: -pb[2], lambda: pb[1]],
        [lambda: pb[2], None, lambda: -pb[0]],
        [lambda: -pb[1], lambda: pb[0], None],
    ]
    jr = [[None] * 3 for _ in range(2)]
    for i0 in range(2):
        for j0 in range(3):
            acc = None
            for l0 in range(3):
                if hat[l0][j0] is None:
                    continue
                term = rh[i0][l0] * hat[l0][j0]()
                acc = term if acc is None else acc + term
            jr[i0][j0] = acc
    jp = [jt[0] + jr[0], jt[1] + jr[1]]  # [2][6] of [K, M]
    # landmark block: jpc @ R_cb @ R_bw  (R_bw = R^T -> R_bw[i][j] = r[j][i])
    jl = [
        [
            rh[i0][0] * r[j0][0] + rh[i0][1] * r[j0][1] + rh[i0][2] * r[j0][2]
            for j0 in range(3)
        ]
        for i0 in range(2)
    ]

    res2 = [du, dv]

    # ---- normal blocks ----
    # U[k][c][f] scalars per k: lane+row reductions -> [K, 1]
    u_blk = [[None] * 6 for _ in range(6)]
    for c in range(6):
        for f in range(c, 6):
            s = jnp.sum(
                w * (jp[0][c] * jp[0][f] + jp[1][c] * jp[1][f]), axis=1, keepdims=True
            )  # [K, 1]
            u_blk[c][f] = s
            u_blk[f][c] = s
    b_p = [
        -jnp.sum(w * (jp[0][c] * res2[0] + jp[1][c] * res2[1]), axis=1, keepdims=True)
        for c in range(6)
    ]  # 6 x [K, 1]

    # V[d][e] rows: sublane reductions -> [1, M]
    v_blk = [[None] * 3 for _ in range(3)]
    for d in range(3):
        for e in range(d, 3):
            s = jnp.sum(
                w * (jl[0][d] * jl[0][e] + jl[1][d] * jl[1][e]), axis=0, keepdims=True
            )  # [1, M]
            v_blk[d][e] = s
            v_blk[e][d] = s
    b_l = [
        -jnp.sum(w * (jl[0][d] * res2[0] + jl[1][d] * res2[1]), axis=0, keepdims=True)
        for d in range(3)
    ]  # 3 x [1, M]

    # W[c][d] planes [K, M]
    w_blk = [
        [w * (jp[0][c] * jl[0][d] + jp[1][c] * jl[1][d]) for d in range(3)]
        for c in range(6)
    ]

    # ---- damping ----
    if diag_damping:
        # PnP flavor: elementwise H + lam*diag(H) (Optimizer.cpp PnP path)
        u_d = [
            [
                u_blk[c][f] * (1.0 + lam if c == f else 1.0)
                + (1e-10 if c == f else 0.0)
                for f in range(6)
            ]
            for c in range(6)
        ]
    else:
        u_tr = (
            u_blk[0][0] + u_blk[1][1] + u_blk[2][2]
            + u_blk[3][3] + u_blk[4][4] + u_blk[5][5]
        )
        u_d = [
            [
                u_blk[c][f] + (lam / 6.0) * u_tr * (1.0 if c == f else 0.0)
                for f in range(6)
            ]
            for c in range(6)
        ]
    v_tr = v_blk[0][0] + v_blk[1][1] + v_blk[2][2]
    v_d = [
        [
            v_blk[d][e] + ((lam / 3.0) * v_tr + 1e-8) * (1.0 if d == e else 0.0)
            for e in range(3)
        ]
        for d in range(3)
    ]

    # closed-form 3x3 inverse per landmark ([1, M] rows)
    a = v_d
    co = [[None] * 3 for _ in range(3)]
    co[0][0] = a[1][1] * a[2][2] - a[1][2] * a[2][1]
    co[0][1] = a[0][2] * a[2][1] - a[0][1] * a[2][2]
    co[0][2] = a[0][1] * a[1][2] - a[0][2] * a[1][1]
    co[1][0] = a[1][2] * a[2][0] - a[1][0] * a[2][2]
    co[1][1] = a[0][0] * a[2][2] - a[0][2] * a[2][0]
    co[1][2] = a[0][2] * a[1][0] - a[0][0] * a[1][2]
    co[2][0] = a[1][0] * a[2][1] - a[1][1] * a[2][0]
    co[2][1] = a[0][1] * a[2][0] - a[0][0] * a[2][1]
    co[2][2] = a[0][0] * a[1][1] - a[0][1] * a[1][0]
    det = a[0][0] * co[0][0] + a[0][1] * co[1][0] + a[0][2] * co[2][0]
    inv_det = jnp.where(fixedpt > 0.5, 0.0, 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0))
    v_inv = [[co[d][e] * inv_det for e in range(3)] for d in range(3)]

    # wv[c][e] = sum_d W[c][d] * v_inv[d][e]  ([K, M] planes)
    wv = [
        [
            w_blk[c][0] * v_inv[0][e] + w_blk[c][1] * v_inv[1][e] + w_blk[c][2] * v_inv[2][e]
            for e in range(3)
        ]
        for c in range(6)
    ]

    # ---- Schur cross terms: ONE matmul over stacked components ----
    # rows ordered (c, e) major: index 3c+e
    a_all = jnp.concatenate([wv[ce // 3][ce % 3] for ce in range(18)], axis=0)  # [18K, M]
    b_all = jnp.concatenate([w_blk[ce // 3][ce % 3] for ce in range(18)], axis=0)
    s_all = jax.lax.dot_general(
        a_all, b_all, (((1,), (1,)), ((), ())), preferred_element_type=f32
    )  # [18K, 18K]

    # rhs correction: rc[c] [K,1] = sum_e lane-reduce(wv[c][e] * b_l[e])
    rhs_c = [
        b_p[c]
        - jnp.sum(
            wv[c][0] * b_l[0] + wv[c][1] * b_l[1] + wv[c][2] * b_l[2],
            axis=1,
            keepdims=True,
        )
        for c in range(6)
    ]

    # ---- assemble the 6K x 6K system in (c, k) ordering ----
    n6 = 6 * k
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    diag_kk = (iota_r == iota_c).astype(f32)

    rows = []
    for c in range(6):
        blocks = []
        for f in range(6):
            blk = -(
                s_all[3 * c * k : (3 * c + 1) * k, 3 * f * k : (3 * f + 1) * k]
                + s_all[(3 * c + 1) * k : (3 * c + 2) * k, (3 * f + 1) * k : (3 * f + 2) * k]
                + s_all[(3 * c + 2) * k : (3 * c + 3) * k, (3 * f + 2) * k : (3 * f + 3) * k]
            )
            blk = blk + diag_kk * u_d[c][f]  # u_d[c][f] is [K,1], broadcasts
            blocks.append(blk)
        rows.append(jnp.concatenate(blocks, axis=1))
    s_mat = jnp.concatenate(rows, axis=0)  # [6K, 6K]
    rhs = jnp.concatenate(rhs_c, axis=0)  # [6K, 1]

    # gauge masks (flat (c,k) order)
    fm_col = fm_col[:n6, :]  # [6K, 1]
    fm_row = fm_row[:, :n6]  # [1, 6K]
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (n6, n6), 0)
    iota_n2 = jax.lax.broadcasted_iota(jnp.int32, (n6, n6), 1)
    s_mat = s_mat * fm_col * fm_row + (iota_n == iota_n2).astype(f32) * (1.0 - fm_col)
    rhs = rhs * fm_col

    # ---- unrolled Gauss-Jordan on [6K, 6K+1] ----
    aug = jnp.concatenate([s_mat, rhs], axis=1)  # [6K, 6K+1]
    row_io = jax.lax.broadcasted_iota(jnp.int32, (n6, n6 + 1), 0)
    col_io1 = jax.lax.broadcasted_iota(jnp.int32, (n6, 1), 0)
    for i in range(n6):
        sel = (row_io == i).astype(f32)
        piv_row = jnp.sum(sel * aug, axis=0, keepdims=True)  # [1, 6K+1]
        piv = piv_row[0, i]
        piv_row = piv_row / piv
        colv = aug[:, i][:, None]  # [6K, 1]
        keep = (col_io1 != i).astype(f32)
        aug = aug - (keep * colv) * piv_row
        aug = jnp.where(row_io == i, piv_row, aug)
    x = aug[:, n6 : n6 + 1]  # [6K, 1] solution in (c, k) order
    dx = [x[c * k : (c + 1) * k, :] for c in range(6)]  # 6 x [K, 1]

    # ---- landmark back-substitution ----
    # tmp[d] [1, M] = b_l[d] - sum_c sublane-reduce(W[c][d] * dx[c])
    tmp = [
        b_l[d]
        - jnp.sum(
            sum(w_blk[c][d] * dx[c] for c in range(6)), axis=0, keepdims=True
        )
        for d in range(3)
    ]
    dl = [
        (v_inv[d][0] * tmp[0] + v_inv[d][1] * tmp[1] + v_inv[d][2] * tmp[2])
        * (1.0 - fixedpt)
        for d in range(3)
    ]

    # ---- retract poses: T_new = T * exp([rho, phi]) ----
    rho0, rho1, rho2 = dx[0], dx[1], dx[2]  # [K, 1]
    w0, w1, w2 = dx[3], dx[4], dx[5]
    th2 = w0 * w0 + w1 * w1 + w2 * w2
    th = jnp.sqrt(jnp.maximum(th2, 1e-30))
    small = th2 < 1e-10
    sa = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    sb = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / jnp.maximum(th2, 1e-30))
    sc = jnp.where(small, 1.0 / 6.0 - th2 / 120.0, (th - jnp.sin(th)) / jnp.maximum(th2 * th, 1e-30))
    wv3 = [w0, w1, w2]
    # explicit hat(w) matrix entries
    hw = [
        [None, -w2, w1],
        [w2, None, -w0],
        [-w1, w0, None],
    ]

    def rot_entry(coef_k, coef_k2, i0, j0):
        """delta_ij + a*K_ij + b*(w_i w_j - th2 delta_ij)"""
        kij = hw[i0][j0] if hw[i0][j0] is not None else 0.0
        base = 1.0 if i0 == j0 else 0.0
        k2ij = wv3[i0] * wv3[j0] - (th2 if i0 == j0 else 0.0)
        return base + coef_k * kij + coef_k2 * k2ij

    dr = [[rot_entry(sa, sb, i0, j0) for j0 in range(3)] for i0 in range(3)]
    vmat = [[rot_entry(sb, sc, i0, j0) for j0 in range(3)] for i0 in range(3)]
    # dt = V @ rho
    rho3 = [rho0, rho1, rho2]
    dt = [
        vmat[i0][0] * rho3[0] + vmat[i0][1] * rho3[1] + vmat[i0][2] * rho3[2]
        for i0 in range(3)
    ]
    # r_new = r @ dr ; t_new = r @ dt + t
    r_new = [
        [
            r[i0][0] * dr[0][j0] + r[i0][1] * dr[1][j0] + r[i0][2] * dr[2][j0]
            for j0 in range(3)
        ]
        for i0 in range(3)
    ]
    t_new = [
        r[i0][0] * dt[0] + r[i0][1] * dt[1] + r[i0][2] * dt[2] + t[i0] for i0 in range(3)
    ]

    px_new = px + dl[0]
    py_new = py + dl[1]
    pz_new = pz + dl[2]

    # ---- trial evaluation ----
    *_, new_cost = evaluate(r_new, t_new, px_new, py_new, pz_new)

    step_sq = jnp.sum(x * x) + jnp.sum(
        dl[0] * dl[0] + dl[1] * dl[1] + dl[2] * dl[2]
    )

    pose_new = jnp.concatenate(
        [r_new[i0][j0] for i0 in range(3) for j0 in range(3)] + t_new, axis=1
    )  # [K, 12]
    return pose_new, px_new, py_new, pz_new, cur_cost, new_cost, step_sq


def _read_scal(scal_ref):
    lam = scal_ref[0, 0]
    rcb = [[scal_ref[0, 1 + 3 * i + j] for j in range(3)] for i in range(3)]
    tcb = [scal_ref[0, 10 + i] for i in range(3)]
    inv_s2 = scal_ref[0, 13]
    return lam, rcb, tcb, inv_s2


def _ba_iter_kernel(
    # inputs (VMEM unless noted)
    pose_ref,  # [K, 12] rows: r00..r22, t0..t2
    pts_ref,  # [8, M] rows 0..2 = x, y, z
    obs_u_ref,  # [K, M]
    obs_v_ref,  # [K, M]
    wmask_ref,  # [K, M] f32 1.0 = active observation
    fixedpt_ref,  # [8, M] row 0: 1.0 = fixed landmark
    fm_col_ref,  # [P6, 1] free-pose mask in (c,k) order (P6 = pad of 6K)
    fm_row_ref,  # [1, P6]
    scal_ref,  # SMEM [1, 14]: lam, r_cb(9), t_cb(3), inv_sigma2
    # outputs
    pose_out_ref,  # [K, 12]
    pts_out_ref,  # [8, M]
    out_ref,  # [1, 128]: 0=cur_cost, 1=new_cost, 2=step_sq
    *,
    k: int,
    m: int,
    width: float,
    height: float,
    huber_delta: float,
    diag_damping: bool,
):
    f32 = jnp.float32
    lam, rcb, tcb, inv_s2 = _read_scal(scal_ref)
    pose_new, px_new, py_new, pz_new, cur_cost, new_cost, step_sq = _lm_iteration(
        pose_ref[:, :],
        pts_ref[0:1, :], pts_ref[1:2, :], pts_ref[2:3, :],
        obs_u_ref[:, :], obs_v_ref[:, :], wmask_ref[:, :],
        fixedpt_ref[0:1, :],
        fm_col_ref[:, :], fm_row_ref[:, :],
        lam, rcb, tcb, inv_s2,
        k=k, m=m, width=width, height=height,
        huber_delta=huber_delta, diag_damping=diag_damping,
    )
    pose_out_ref[:, :] = pose_new
    pts_out_ref[0:1, :] = px_new
    pts_out_ref[1:2, :] = py_new
    pts_out_ref[2:3, :] = pz_new
    pts_out_ref[3:, :] = jnp.zeros((5, m), f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_ref[:, :] = (
        jnp.where(lane == 0, cur_cost, 0.0)
        + jnp.where(lane == 1, new_cost, 0.0)
        + jnp.where(lane == 2, step_sq, 0.0)
    )


@functools.partial(
    _pjit,
    static_argnames=("width", "height", "huber_delta", "diag_damping", "interpret"),
)
def ba_iteration(
    r_wb: jax.Array,  # [K,3,3]
    t_wb: jax.Array,  # [K,3]
    points: jax.Array,  # [M,3]
    obs_uv: jax.Array,  # [K,M,2]
    obs_w: jax.Array,  # [K,M] f32 active-observation weights
    fixed_pose: jax.Array,  # [K] bool
    fixed_point: jax.Array,  # [M] bool
    lam: jax.Array,  # [] f32
    r_cb: jax.Array,
    t_cb: jax.Array,
    width: int,
    height: int,
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    diag_damping: bool = False,
    interpret: bool = False,
):
    """One LM iteration; returns (r_new, t_new, pts_new, cur_cost,
    new_cost, step_sq). ``diag_damping`` selects the PnP-flavor
    elementwise H + lam*diag(H) damping (vs trace-scaled for BA)."""
    k, m = obs_w.shape
    assert m % 128 == 0, "landmark capacity must be lane-aligned"
    f32 = jnp.float32
    pose = jnp.concatenate([r_wb.reshape(k, 9), t_wb], axis=1).astype(f32)
    pts_t = jnp.zeros((8, m), f32).at[:3, :].set(points.T.astype(f32))
    fixedpt = jnp.zeros((8, m), f32).at[0, :].set(fixed_point.astype(f32))
    p6 = -(-(6 * k) // 8) * 8
    fm = jnp.tile((~fixed_pose).astype(f32), (6,))  # (c,k) order
    fm_col = jnp.zeros((p6, 1), f32).at[: 6 * k, 0].set(fm)
    fm_row = jnp.zeros((1, p6), f32).at[0, : 6 * k].set(fm)
    inv_s2 = 1.0 / (pixel_noise_std * pixel_noise_std)
    scal = jnp.concatenate(
        [
            jnp.asarray(lam, f32).reshape(1),
            r_cb.astype(f32).reshape(9),
            t_cb.astype(f32).reshape(3),
            jnp.asarray(inv_s2, f32).reshape(1),
        ]
    ).reshape(1, 14)

    kernel = functools.partial(
        _ba_iter_kernel,
        k=k,
        m=m,
        width=float(width),
        height=float(height),
        huber_delta=float(huber_delta),
        diag_damping=diag_damping,
    )
    pose_out, pts_out, scal_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((k, 12), f32),
            jax.ShapeDtypeStruct((8, m), f32),
            jax.ShapeDtypeStruct((1, 128), f32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        pose,
        pts_t,
        obs_uv[..., 0].astype(f32),
        obs_uv[..., 1].astype(f32),
        obs_w.astype(f32),
        fixedpt,
        fm_col,
        fm_row,
        scal,
    )
    r_new = pose_out[:, :9].reshape(k, 3, 3)
    t_new = pose_out[:, 9:]
    pts_new = pts_out[:3, :].T
    return (
        r_new,
        t_new,
        pts_new,
        scal_out[0, 0],
        scal_out[0, 1],
        scal_out[0, 2],
    )


# ---------------------------------------------------------------------------
# Whole-solve kernels: the LM accept/reject loop (and for PnP the chi2
# outlier rounds) run INSIDE one Pallas dispatch. On the tunneled TPU
# every pallas-kernel execution pays a fixed host-sync penalty (~0.7 ms)
# once any device->host transfer has happened in the process, so a
# 10-iteration LM solve as 10 dispatches costs ~7 ms of pure overhead;
# as ONE dispatch it costs it once. State (pose [K,12], landmarks
# [1,M]x3, lam) lives in the while_loop carry in VMEM/registers.
# ---------------------------------------------------------------------------


def _lm_loop(
    pose0, px0, py0, pz0, obs_u, obs_v, wmask, fixedpt, fm_col, fm_row,
    lam0, rcb, tcb, inv_s2,
    *,
    k, m, width, height, huber_delta, diag_damping, max_iterations,
    step_tol, rel_tol,
):
    """In-kernel LM loop; control flow mirrors ba.run_ba_pallas /
    pnp.solve_pnp_pallas exactly. Returns (pose, px, py, pz, cost, iters)."""
    f32 = jnp.float32

    def cond(c):
        it, done = c[0], c[1]
        return (it < max_iterations) & jnp.logical_not(done)

    def body(c):
        it, done, pose, px, py, pz, lam, cost = c
        pose_n, pxn, pyn, pzn, cur, new, step = _lm_iteration(
            pose, px, py, pz, obs_u, obs_v, wmask, fixedpt, fm_col, fm_row,
            lam, rcb, tcb, inv_s2,
            k=k, m=m, width=width, height=height,
            huber_delta=huber_delta, diag_damping=diag_damping,
        )
        accept = new < cur
        pose = jnp.where(accept, pose_n, pose)
        px = jnp.where(accept, pxn, px)
        py = jnp.where(accept, pyn, py)
        pz = jnp.where(accept, pzn, pz)
        lam = jnp.where(
            accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e6)
        )
        done = (accept & ((step < step_tol) | ((cur - new) < rel_tol * cur))) | (
            lam > 1e5
        )
        cost = jnp.where(accept, new, cur)
        return (it + 1, done, pose, px, py, pz, lam, cost)

    it, _, pose, px, py, pz, _, cost = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            pose0, px0, py0, pz0,
            lam0,
            jnp.asarray(0.0, f32),
        ),
    )
    return pose, px, py, pz, cost, it


def _ba_solve_kernel(
    pose_ref, pts_ref, obs_u_ref, obs_v_ref, wmask_ref, fixedpt_ref,
    fm_col_ref, fm_row_ref, scal_ref,
    pose_out_ref, pts_out_ref, out_ref,
    *,
    k, m, width, height, huber_delta, diag_damping, max_iterations,
):
    f32 = jnp.float32
    lam0, rcb, tcb, inv_s2 = _read_scal(scal_ref)
    pose, px, py, pz, cost, iters = _lm_loop(
        pose_ref[:, :],
        pts_ref[0:1, :], pts_ref[1:2, :], pts_ref[2:3, :],
        obs_u_ref[:, :], obs_v_ref[:, :], wmask_ref[:, :],
        fixedpt_ref[0:1, :],
        fm_col_ref[:, :], fm_row_ref[:, :],
        lam0, rcb, tcb, inv_s2,
        k=k, m=m, width=width, height=height, huber_delta=huber_delta,
        diag_damping=diag_damping, max_iterations=max_iterations,
        step_tol=1e-14, rel_tol=1e-6,
    )
    pose_out_ref[:, :] = pose
    pts_out_ref[0:1, :] = px
    pts_out_ref[1:2, :] = py
    pts_out_ref[2:3, :] = pz
    pts_out_ref[3:, :] = jnp.zeros((5, m), f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_ref[:, :] = (
        jnp.where(lane == 0, cost, 0.0)
        + jnp.where(lane == 1, iters.astype(f32), 0.0)
    )


@functools.partial(
    _pjit,
    static_argnames=(
        "width", "height", "huber_delta", "diag_damping", "max_iterations",
        "pixel_noise_std", "interpret",
    ),
)
def ba_solve(
    r_wb, t_wb, points, obs_uv, obs_w, fixed_pose, fixed_point, lam,
    r_cb, t_cb,
    width: int,
    height: int,
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    diag_damping: bool = False,
    max_iterations: int = 50,
    interpret: bool = False,
):
    """Full LM solve in ONE kernel dispatch. Same argument contract as
    ``ba_iteration``; returns (r_new, t_new, pts_new, final_cost, iters)."""
    k, m = obs_w.shape
    assert m % 128 == 0, "landmark capacity must be lane-aligned"
    f32 = jnp.float32
    pose = jnp.concatenate([r_wb.reshape(k, 9), t_wb], axis=1).astype(f32)
    pts_t = jnp.zeros((8, m), f32).at[:3, :].set(points.T.astype(f32))
    fixedpt = jnp.zeros((8, m), f32).at[0, :].set(fixed_point.astype(f32))
    p6 = -(-(6 * k) // 8) * 8
    fm = jnp.tile((~fixed_pose).astype(f32), (6,))  # (c,k) order
    fm_col = jnp.zeros((p6, 1), f32).at[: 6 * k, 0].set(fm)
    fm_row = jnp.zeros((1, p6), f32).at[0, : 6 * k].set(fm)
    inv_s2 = 1.0 / (pixel_noise_std * pixel_noise_std)
    scal = jnp.concatenate(
        [
            jnp.asarray(lam, f32).reshape(1),
            r_cb.astype(f32).reshape(9),
            t_cb.astype(f32).reshape(3),
            jnp.asarray(inv_s2, f32).reshape(1),
        ]
    ).reshape(1, 14)

    kernel = functools.partial(
        _ba_solve_kernel,
        k=k, m=m, width=float(width), height=float(height),
        huber_delta=float(huber_delta), diag_damping=diag_damping,
        max_iterations=max_iterations,
    )
    pose_out, pts_out, scal_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((k, 12), f32),
            jax.ShapeDtypeStruct((8, m), f32),
            jax.ShapeDtypeStruct((1, 128), f32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        pose,
        pts_t,
        obs_uv[..., 0].astype(f32),
        obs_uv[..., 1].astype(f32),
        obs_w.astype(f32),
        fixedpt,
        fm_col,
        fm_row,
        scal,
    )
    r_new = pose_out[:, :9].reshape(k, 3, 3)
    t_new = pose_out[:, 9:]
    pts_new = pts_out[:3, :].T
    return r_new, t_new, pts_new, scal_out[0, 0], scal_out[0, 1].astype(jnp.int32)


def _pnp_solve_kernel(
    pose_ref,  # [1, 12]
    pts_ref,  # [8, M]
    obs_u_ref, obs_v_ref,  # [1, M]
    active_ref,  # [1, M] f32
    marg_ref,  # [1, M] f32
    scal_ref,  # SMEM [1, 14]
    pose_out_ref,  # [1, 12]
    flags_out_ref,  # [8, M] row 0: latched outlier
    out_ref,  # [1, 128]: 0=final_cost, 1=n_inliers, 2=n_outliers
    *,
    m, width, height, huber_delta, chi2_threshold, rounds, max_iterations,
):
    """4-round PnP entirely in-kernel: [LM solve -> chi2 classify],
    outliers latched across rounds, each round restarting from the
    initial pose with a fresh lam (Optimizer.cpp:83-302 semantics,
    matching pnp.solve_pnp_pallas's per-round control flow)."""
    f32 = jnp.float32
    lam0, rcb, tcb, inv_s2 = _read_scal(scal_ref)
    pose0 = pose_ref[:, :]
    px = pts_ref[0:1, :]
    py = pts_ref[1:2, :]
    pz = pts_ref[2:3, :]
    obs_u = obs_u_ref[:, :]
    obs_v = obs_v_ref[:, :]
    active = active_ref[:, :]
    marg = marg_ref[:, :]
    fixedpt = jnp.ones((1, m), f32)
    fm_col = (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) < 6).astype(f32)
    fm_row = (jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) < 6).astype(f32)

    def round_body(rnd, carry):
        pose_fin, outlier, final_cost = carry
        wmask = active * (1.0 - outlier)
        pose, _, _, _, _, _ = _lm_loop(
            pose0, px, py, pz, obs_u, obs_v, wmask, fixedpt, fm_col, fm_row,
            lam0, rcb, tcb, inv_s2,
            k=1, m=m, width=width, height=height, huber_delta=huber_delta,
            diag_damping=True, max_iterations=max_iterations,
            step_tol=1e-16, rel_tol=1e-6,
        )
        # chi2 classification at the solution (raw wrapped residuals)
        r_s = [[pose[:, 3 * i0 + j0][:, None] for j0 in range(3)] for i0 in range(3)]
        t_s = [pose[:, 9 + i0][:, None] for i0 in range(3)]
        _, _, _, _, c2, _ = _evaluate_plane(
            r_s, t_s, px, py, pz, obs_u, obs_v, active, rcb, tcb, inv_s2,
            width, height, huber_delta,
        )
        outlier = active * (1.0 - marg) * (c2 > chi2_threshold).astype(f32)
        inl = active * (1.0 - outlier)
        n_inl = jnp.sum(inl)
        final_cost = jnp.sum(inl * c2) / jnp.maximum(n_inl, 1.0)
        return (pose, outlier, final_cost)

    pose_fin, outlier, final_cost = jax.lax.fori_loop(
        0,
        rounds,
        round_body,
        (pose0, jnp.zeros((1, m), f32), jnp.asarray(0.0, f32)),
    )
    inl = active * (1.0 - outlier)
    pose_out_ref[:, :] = pose_fin
    flags_out_ref[0:1, :] = outlier
    flags_out_ref[1:, :] = jnp.zeros((7, m), f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out_ref[:, :] = (
        jnp.where(lane == 0, final_cost, 0.0)
        + jnp.where(lane == 1, jnp.sum(inl), 0.0)
        + jnp.where(lane == 2, jnp.sum(outlier), 0.0)
    )


@functools.partial(
    _pjit,
    static_argnames=(
        "width", "height", "huber_delta", "chi2_threshold", "rounds",
        "max_iterations", "pixel_noise_std", "interpret",
    ),
)
def pnp_solve(
    r_wb, t_wb, points, obs_uv, active, marginalized, lam, r_cb, t_cb,
    width: int,
    height: int,
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    chi2_threshold: float = 5.991,
    rounds: int = 4,
    max_iterations: int = 50,
    interpret: bool = False,
):
    """Whole PnP (4 chi2 rounds x LM solve) in ONE kernel dispatch.
    Returns (r_new, t_new, outlier [M] bool, final_cost, n_inl, n_out)."""
    m = points.shape[0]
    assert m % 128 == 0, "landmark capacity must be lane-aligned"
    f32 = jnp.float32
    pose = jnp.concatenate(
        [r_wb.reshape(1, 9), t_wb.reshape(1, 3)], axis=1
    ).astype(f32)
    pts_t = jnp.zeros((8, m), f32).at[:3, :].set(points.T.astype(f32))
    inv_s2 = 1.0 / (pixel_noise_std * pixel_noise_std)
    scal = jnp.concatenate(
        [
            jnp.asarray(lam, f32).reshape(1),
            r_cb.astype(f32).reshape(9),
            t_cb.astype(f32).reshape(3),
            jnp.asarray(inv_s2, f32).reshape(1),
        ]
    ).reshape(1, 14)
    kernel = functools.partial(
        _pnp_solve_kernel,
        m=m, width=float(width), height=float(height),
        huber_delta=float(huber_delta), chi2_threshold=float(chi2_threshold),
        rounds=rounds, max_iterations=max_iterations,
    )
    pose_out, flags_out, scal_out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, 12), f32),
            jax.ShapeDtypeStruct((8, m), f32),
            jax.ShapeDtypeStruct((1, 128), f32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        pose,
        pts_t,
        obs_uv[:, 0].reshape(1, m).astype(f32),
        obs_uv[:, 1].reshape(1, m).astype(f32),
        active.reshape(1, m).astype(f32),
        marginalized.reshape(1, m).astype(f32),
        scal,
    )
    r_new = pose_out[0, :9].reshape(3, 3)
    t_new = pose_out[0, 9:]
    outlier = flags_out[0, :] > 0.5
    return (
        r_new,
        t_new,
        outlier,
        scal_out[0, 0],
        scal_out[0, 1].astype(jnp.int32),
        scal_out[0, 2].astype(jnp.int32),
    )

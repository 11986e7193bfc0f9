"""Trajectory evaluation metrics (ATE / RPE) with Umeyama alignment.

New capability (the reference has no evaluation tooling; SURVEY.md §6
requires us to create the baseline). Monocular VO has a gauge freedom
(global SE(3) + scale), so ATE is computed after Sim(3) or SE(3)
alignment, matching standard SLAM evaluation practice.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class AteResult:
    rmse: float
    mean: float
    median: float
    max: float
    scale: float
    n: int


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform dst ~= s R src + t.

    Returns (s, R [3,3], t [3]).
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / src.shape[0]
    u, d, vt = np.linalg.svd(cov)
    s_mat = np.eye(3)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        s_mat[2, 2] = -1
    r = u @ s_mat @ vt
    if with_scale:
        var_s = (xs**2).sum() / src.shape[0]
        scale = float(np.trace(np.diag(d) @ s_mat) / max(var_s, 1e-12))
    else:
        scale = 1.0
    t = mu_d - scale * r @ mu_s
    return scale, r, t


def ate(
    est_positions: np.ndarray,
    gt_positions: np.ndarray,
    align: str = "sim3",
) -> AteResult:
    """Absolute trajectory error after alignment.

    align: "sim3" (monocular: scale+SE3), "se3", or "none".
    """
    est = np.asarray(est_positions, np.float64)
    gt = np.asarray(gt_positions, np.float64)
    assert est.shape == gt.shape, (est.shape, gt.shape)
    if align == "sim3":
        s, r, t = umeyama_alignment(est, gt, with_scale=True)
    elif align == "se3":
        s, r, t = umeyama_alignment(est, gt, with_scale=False)
    else:
        s, r, t = 1.0, np.eye(3), np.zeros(3)
    aligned = s * est @ r.T + t
    err = np.linalg.norm(aligned - gt, axis=-1)
    return AteResult(
        rmse=float(np.sqrt((err**2).mean())),
        mean=float(err.mean()),
        median=float(np.median(err)),
        max=float(err.max()),
        scale=float(s),
        n=len(err),
    )


def rpe(
    est_r: np.ndarray,
    est_t: np.ndarray,
    gt_r: np.ndarray,
    gt_t: np.ndarray,
    delta: int = 1,
):
    """Relative pose error over frame pairs (i, i+delta).

    Returns (trans_rmse, rot_rmse_deg).
    """
    n = len(est_t) - delta
    et, er = [], []
    for i in range(n):
        def rel(rs, ts):
            r1, t1 = rs[i], ts[i]
            r2, t2 = rs[i + delta], ts[i + delta]
            dr = r1.T @ r2
            dt = r1.T @ (t2 - t1)
            return dr, dt

        dr_e, dt_e = rel(np.asarray(est_r), np.asarray(est_t))
        dr_g, dt_g = rel(np.asarray(gt_r), np.asarray(gt_t))
        err_r = dr_g.T @ dr_e
        err_t = dt_e - dt_g
        et.append(np.linalg.norm(err_t))
        ang = np.arccos(np.clip((np.trace(err_r) - 1) / 2, -1, 1))
        er.append(np.degrees(ang))
    et = np.asarray(et)
    er = np.asarray(er)
    return float(np.sqrt((et**2).mean())), float(np.sqrt((er**2).mean()))

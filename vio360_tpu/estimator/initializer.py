"""Monocular two-view bootstrap on bearing vectors.

TPU-native counterpart of ``src/processing/Initializer.{h,cpp}``:

1. eligibility: features observed >= min_observations times
   (Initializer.cpp:351-433), uniform 8x4-grid sampling <=5/cell ranked
   by observation count;
2. median-parallax gate (>= min_parallax px, Initializer.cpp:293-349);
3. 8-point essential RANSAC on bearings (vmapped hypothesis batch,
   Initializer.cpp:458-621) + all-inlier refit;
4. pose recovery: 4 candidates from E, disambiguated by reprojection-
   error voting (triangulate, err < 5 px in BOTH frames — ERP sees
   backwards so cheirality is useless, Initializer.cpp:623-697,785-835);
5. mid-point triangulation of all inliers (no positive-depth check,
   Initializer.cpp:699-783);
6. validation: per-point max reproj error <= max_reprojection_error
   in both frames, >= min_features survivors (Initializer.cpp:889-995);
7. scale normalization: median point distance -> 1.0
   (Initializer.cpp:997-1048);
8. body-pose seeding with T_BC, world := body1 frame
   (Initializer.cpp:168-224).

Everything runs as ONE jitted fixed-shape program over the feature
capacity C; the two-keyframe RunFullBA polish happens in the estimator.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..config import VioConfig
from ..geometry import camera as cam
from ..geometry import essential as ess
from ..geometry import triangulation
from ..ops import ransac
from ..utils.precision import jit as _pjit

_VOTE_REPROJ_THR = 5.0  # px, Initializer.cpp:818


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class InitResult:
    success: jax.Array  # [] bool
    r_21: jax.Array  # [3,3] camera frame1->frame2 rotation
    t_21: jax.Array  # [3] (scale-normalized)
    r_wb2: jax.Array  # [3,3] body pose of frame2 (world = body1)
    t_wb2: jax.Array  # [3]
    points_w: jax.Array  # [C,3] world landmarks (slot-aligned to features)
    point_valid: jax.Array  # [C] bool
    scale_factor: jax.Array  # []
    median_parallax: jax.Array  # []
    num_inliers: jax.Array  # []
    num_valid_points: jax.Array  # []


def masked_median(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Median over masked entries, reference-style (average of the two
    middle order stats for even counts)."""
    big = jnp.finfo(values.dtype).max
    v = jnp.sort(jnp.where(mask, values, big))
    n = jnp.sum(mask)
    mid = n // 2
    lo = v[jnp.maximum(mid - 1, 0)]
    hi = v[jnp.clip(mid, 0, values.shape[0] - 1)]
    even = (n % 2 == 0) & (n > 0)
    med = jnp.where(even, 0.5 * (lo + hi), hi)
    return jnp.where(n > 0, med, 0.0)


def _select_grid(
    uv: jax.Array, eligible: jax.Array, obs_count: jax.Array,
    width: int, height: int, cols: int, rows: int, cap: int,
) -> jax.Array:
    """Uniform spatial sampling: keep <= cap per cell ranked by
    observation count (Initializer.cpp:389-433)."""
    cw = width / cols
    ch = height / rows
    cx = jnp.clip((uv[:, 0] / cw).astype(jnp.int32), 0, cols - 1)
    cy = jnp.clip((uv[:, 1] / ch).astype(jnp.int32), 0, rows - 1)
    cell = cy * cols + cx
    same = (cell[:, None] == cell[None, :]) & eligible[None, :] & eligible[:, None]
    idx = jnp.arange(uv.shape[0])
    beats = (obs_count[None, :] > obs_count[:, None]) | (
        (obs_count[None, :] == obs_count[:, None]) & (idx[None, :] < idx[:, None])
    )
    rank = jnp.sum(same & beats, axis=1)
    return eligible & (rank < cap)


def _reproj_err_px(p: jax.Array, bearing: jax.Array, width: int, height: int) -> jax.Array:
    """Pixel distance between projections of p and the observed bearing
    (wrap-aware; ComputeReprojectionErrorInFrame, Initializer.cpp:837-871)."""
    uv_obs = cam.bearing_to_pixel(bearing, width, height)
    uv_prj = cam.bearing_to_pixel(p, width, height)
    du = cam.wrap_residual_u(uv_obs[..., 0] - uv_prj[..., 0], width)
    dv = uv_obs[..., 1] - uv_prj[..., 1]
    err = jnp.sqrt(du * du + dv * dv)
    return jnp.where(jnp.linalg.norm(p, axis=-1) < 1e-6, 1000.0, err)


@functools.partial(_pjit, static_argnames=("cfg",))
def try_initialize(
    key: jax.Array,
    uv_first: jax.Array,  # [C,2] feature pixels in the window's first frame
    uv_last: jax.Array,  # [C,2] same slots in the last frame
    tracked_full_window: jax.Array,  # [C] bool: alive with same id across window
    obs_count: jax.Array,  # [C] int: observations (track_count)
    t_bc: jax.Array,  # [4,4] camera-to-body extrinsics
    cfg: VioConfig,
) -> InitResult:
    c = cfg.camera
    icfg = cfg.init
    w, h = c.width, c.height
    cap = uv_first.shape[0]

    eligible = tracked_full_window & (obs_count >= icfg.min_observations)

    # Parallax gate (wrap-aware pixel distance, median over eligible)
    du = cam.wrap_residual_u(uv_last[:, 0] - uv_first[:, 0], w)
    dv = uv_last[:, 1] - uv_first[:, 1]
    par = jnp.sqrt(du * du + dv * dv)
    med_par = masked_median(par, eligible)
    parallax_ok = med_par >= icfg.min_parallax

    enough = jnp.sum(eligible) >= icfg.min_features

    # Grid-uniform feature selection
    selected = _select_grid(
        uv_last, eligible, obs_count, w, h, icfg.grid_cols, icfg.grid_rows, icfg.max_per_cell
    )

    b1 = cam.pixel_to_bearing(uv_first, w, h)
    b2 = cam.pixel_to_bearing(uv_last, w, h)

    # Essential RANSAC + refit
    e_mat, inlier, n_inl = ransac.essential_ransac(
        key, b1, b2, selected,
        threshold=icfg.ransac_threshold,
        iterations=icfg.ransac_iterations,
    )
    e_ok = n_inl >= icfg.min_features

    # Pose candidates + reprojection voting
    rs, ts = ess.decompose_essential(e_mat)

    def vote(r_c, t_c):
        pts, tri_ok = triangulation.triangulate_midpoint(b1, b2, r_c, t_c)
        e_ref = _reproj_err_px(pts, b1, w, h)
        p2 = pts @ r_c.T + t_c
        e_cur = _reproj_err_px(p2, b2, w, h)
        good = inlier & tri_ok & (e_ref < _VOTE_REPROJ_THR) & (e_cur < _VOTE_REPROJ_THR)
        return jnp.sum(good)

    votes = jax.vmap(vote)(rs, ts)
    best = jnp.argmax(votes)
    r_21 = rs[best]
    t_21 = ts[best]
    pose_ok = votes[best] >= icfg.min_features

    # Triangulate all inliers with the winning pose
    pts_c1, tri_ok = triangulation.triangulate_midpoint(b1, b2, r_21, t_21)

    # Validation: max(reproj err frame1, frame2) <= max_reprojection_error
    e_ref = _reproj_err_px(pts_c1, b1, w, h)
    p2 = pts_c1 @ r_21.T + t_21
    e_cur = _reproj_err_px(p2, b2, w, h)
    point_valid = (
        inlier
        & tri_ok
        & (jnp.linalg.norm(pts_c1, axis=-1) >= 1e-6)
        & (e_ref <= icfg.max_reprojection_error)
        & (e_cur <= icfg.max_reprojection_error)
    )
    n_valid = jnp.sum(point_valid)
    valid_ok = n_valid >= icfg.min_features

    # Scale normalization: median distance -> 1.0
    dist = jnp.linalg.norm(pts_c1, axis=-1)
    med_depth = masked_median(dist, point_valid & (dist > 0.01))
    scale = jnp.where(med_depth > 1e-9, 1.0 / med_depth, 1.0)
    pts_c1 = pts_c1 * scale
    t_21_s = t_21 * scale

    # Body poses: world = body1. T_wc1 = T_BC; T_wc2 = T_wc1 T_c2c1;
    # T_wb2 = T_wc2 T_CB  (Initializer.cpp:168-224)
    r_bc = t_bc[:3, :3]
    p_bc = t_bc[:3, 3]
    r_12 = r_21.T
    t_12 = -(r_21.T @ t_21_s)  # T_c2c1 = inv(T_c1c2)
    r_wc2 = r_bc @ r_12
    t_wc2 = r_bc @ t_12 + p_bc
    r_cb = r_bc.T
    p_cb = -(r_bc.T @ p_bc)
    r_wb2 = r_wc2 @ r_cb
    t_wb2 = r_wc2 @ p_cb + t_wc2

    # Landmarks to world: p_w = T_wc1 p_c1 = T_BC p_c1
    points_w = pts_c1 @ r_bc.T + p_bc

    success = parallax_ok & enough & e_ok & pose_ok & valid_ok
    point_valid = point_valid & success

    return InitResult(
        success=success,
        r_21=r_21,
        t_21=t_21_s,
        r_wb2=r_wb2,
        t_wb2=t_wb2,
        points_w=jnp.where(point_valid[:, None], points_w, 0.0),
        point_valid=point_valid,
        scale_factor=scale,
        median_parallax=med_par,
        num_inliers=n_inl,
        num_valid_points=n_valid,
    )

"""The steady-state tracking frame as ONE compiled dispatch.

Counterpart of the reference's per-frame hot path
(``Estimator::ProcessFrame`` tracking branch, Estimator.cpp:239-389
driven by app/main.cpp:178-223) — but where the reference runs it as
sequential C++ stages, here the WHOLE non-keyframe frame is a single
jitted program:

  pose prediction (IMU preintegration or constant-velocity)
  -> rotation-guess seeding -> pyramidal LK + RANSAC front end
  -> landmark association (slot join) -> PnP with chi2 rounds
  -> outlier-latch relabeling -> keyframe-decision statistics

The host receives ONE small scalar bundle per frame (pose + decision
scalars) and keeps every array on device. This matters doubly on
dispatch-latency environments (each dispatch through the tunneled TPU
relay costs ~1.5-2 ms; the staged round-3 estimator paid it ~6x per
frame) and is simply the right shape for a TPU-resident pipeline:
steady-state frames are 1 host->device image transfer, 1 program, 1
device->host scalar read.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..config import VioConfig
from ..frontend import tracker
from ..geometry import camera as cam_g
from ..geometry import lie
from ..imu import preintegration as pre
from ..solver import pnp as pnp_mod
from ..utils.precision import jit as _pjit
from . import initializer, window


@functools.partial(_pjit, static_argnames=("width",))
def _median_parallax(uv_now, ids_now, valid_now, kf_uv, kf_ids, width):
    """Median pixel displacement of features shared with a keyframe
    snapshot (slot-aligned join; Estimator.cpp:616-635)."""
    shared = valid_now & (ids_now >= 0) & (ids_now == kf_ids)
    du = cam_g.wrap_residual_u(uv_now[:, 0] - kf_uv[:, 0], width)
    dv = uv_now[:, 1] - kf_uv[:, 1]
    par = jnp.sqrt(du * du + dv * dv)
    return initializer.masked_median(par, shared), jnp.sum(shared)


@functools.partial(_pjit, static_argnames=("width", "height", "margin"))
def _pnp_inputs(win: window.WindowState, ids, valid, uv, width, height, margin):
    """Slot-aligned PnP arrays: landmark positions + masks per feature slot."""
    lm_idx = window.slot_to_landmark(win, ids)
    has = lm_idx >= 0
    safe = jnp.clip(lm_idx, 0, win.max_lm - 1)
    points = win.lm_pos[safe]
    active = valid & has & ~cam_g.is_near_boundary(uv, width, height, margin)
    marg = win.lm_marg[safe] & has
    return points, active, marg


@_pjit
def _relabel_tracks(track: tracker.TrackState, mask):
    """Give outlier-latched slots a FRESH feature id.

    This is the SoA equivalent of the reference's per-frame outlier
    latch (Optimizer.cpp:253-267 SetValid(false)): the next frame's
    Feature objects default back to valid (Feature.cpp:25), so the
    persistent effect of the latch is only that map-point LINKING skips
    the feature (Estimator.cpp:819) and triangulation skips it in the
    keyframe where it was latched (Estimator.cpp:1159,1192). The 2D
    track itself stays alive and re-seeds a NEW landmark once two fresh
    keyframe snapshots carry it. Re-id-ing the slot reproduces exactly
    that: the id-join to the old landmark and to pre-latch keyframe
    snapshots breaks, the slot keeps its feature budget.

    (An earlier kill-the-slot version starved the map: each latch storm
    permanently destroyed tracks and n_shared collapsed.)
    """
    mask = mask & track.valid
    fresh = track.next_id + jnp.cumsum(mask.astype(jnp.int32)) - 1
    return dataclasses.replace(
        track,
        ids=jnp.where(mask, fresh, track.ids),
        next_id=track.next_id + jnp.sum(mask).astype(jnp.int32),
    )


def _predict_cv(r_cur, t_cur, r_prev, t_prev):
    """Constant-velocity pose prediction (Estimator.cpp:318-334)."""
    ri, ti = lie.se3_inverse(r_prev, t_prev)
    dr, dt = lie.se3_compose(ri, ti, r_cur, t_cur)
    r_pred, t_pred = lie.se3_compose(r_cur, t_cur, dr, dt)
    # Snap back onto SO(3): this composition amplifies any off-manifold
    # f32 error geometrically frame-over-frame (lie.so3_renormalize;
    # the reference SVD-normalizes every constructed SO3,
    # LieUtils.h:40-44).
    return lie.so3_renormalize(r_pred), t_pred


@functools.partial(_pjit, static_argnames=("cfg", "use_imu"))
def tracking_step(
    track: tracker.TrackState,
    win: window.WindowState,
    img_prev: jax.Array,
    img_next: jax.Array,
    timestamp: jax.Array,
    key: jax.Array,
    r_cur: jax.Array,
    t_cur: jax.Array,
    r_prev: jax.Array,
    t_prev: jax.Array,
    vel_cur: jax.Array,
    bg: jax.Array,
    ba: jax.Array,
    gravity_w: jax.Array,
    imu_samples: jax.Array,  # [S,7] padded rows (ignored unless use_imu)
    imu_mask: jax.Array,  # [S] bool
    have_imu: jax.Array,  # [] bool: any real samples this frame
    r_bc: jax.Array,  # [3,3] camera-to-body rotation
    r_cb: jax.Array,
    t_cb: jax.Array,
    cfg: VioConfig,
    use_imu: bool,  # static: IMU initialized (gyro-based prediction)
):
    """One fused tracking frame. Returns
    ``(new_track, new_key, r_new, t_new, v_new, bundle)`` where
    ``bundle`` is the per-frame scalar record the host reads in a
    single transfer (pose copy + keyframe decision + diagnostics).
    """
    w, h = cfg.camera.width, cfg.camera.height

    # ---- pose prediction (Estimator.cpp:318-334, 429-471) ----
    r_cv, t_cv = _predict_cv(r_cur, t_cur, r_prev, t_prev)
    if use_imu:
        icfg = cfg.imu
        pf = pre.preintegrate(
            imu_samples, imu_mask, bg, ba,
            gyro_noise=icfg.gyro_noise, accel_noise=icfg.accel_noise,
            gyro_bias_noise=icfg.gyro_bias_noise,
            accel_bias_noise=icfg.accel_bias_noise,
            min_dt=icfg.min_dt, max_dt=icfg.max_dt,
        )
        r_imu, t_imu, v_imu = pre.predict_state(
            r_cur, t_cur, vel_cur, pf, gravity_w
        )
        r_pred = jnp.where(have_imu, r_imu, r_cv)
        t_pred = jnp.where(have_imu, t_imu, t_cv)
        v_pred = jnp.where(have_imu, v_imu, vel_cur)
    else:
        r_pred, t_pred, v_pred = r_cv, t_cv, vel_cur

    # ---- rotation-guess seeding + front end ----
    r_cc_pred = None
    if cfg.optical_flow.use_rotation_guess:
        # R_wc = R_wb R_bc; guess maps prev-cam bearings to cur-cam.
        r_cc_pred = (r_pred @ r_bc).T @ (r_cur @ r_bc)
    key, sub = jax.random.split(key)
    track, _, tdiag = tracker.track_frame(
        track, img_prev, img_next, timestamp, sub, cfg,
        r_cc_pred=r_cc_pred, guess_from_imu=use_imu,
    )

    # ---- landmark association + PnP (Estimator.cpp:806-843 + SolvePnP) ----
    ids = jnp.where(track.valid, track.ids, -1)
    points, active, marg = _pnp_inputs(
        win, ids, track.valid, track.uv, w, h, cfg.camera.boundary_margin
    )
    res = pnp_mod.solve_pnp(
        r_pred, t_pred, points, track.uv, active, marg,
        r_cb, t_cb, w, h,
        huber_delta=cfg.window.huber_delta,
        chi2_threshold=cfg.window.chi2_threshold,
        rounds=cfg.window.pnp_rounds,
        max_iterations=cfg.window.max_lm_iterations,
        min_inliers=cfg.window.pnp_min_inliers,
        backend=cfg.solver.backend,
    )
    # Outlier-latch feedback: chi2 outlier features lose their landmark
    # association and can only seed a fresh landmark from post-latch
    # evidence. res.outlier already excludes marginalized anchors; the
    # relabel only applies on PnP success (the staged path gated it the
    # same way).
    track = _relabel_tracks(track, res.outlier & res.success)

    # ---- keyframe decision statistics (Estimator.cpp:616-635) ----
    i_last = jnp.clip(win.n_kf - 1, 0, win.max_kf - 1)
    par, n_shared = _median_parallax(
        track.uv, ids, track.valid,
        win.kf_feat_uv[i_last], win.kf_feat_id[i_last], w,
    )
    n_active = jnp.sum(active).astype(jnp.int32)
    n_inl = res.num_inliers
    parallax_kf = par >= cfg.tracking.min_parallax_for_keyframe
    ratio = cfg.tracking.kf_min_inlier_ratio
    if ratio > 0:
        # Map-freshness trigger, gated on healthy pose support (a
        # keyframe after a collapse would bake a bad pose into the map).
        starving = (
            (n_inl < ratio * jnp.maximum(n_active, 1))
            & (n_inl >= 3 * cfg.window.pnp_min_inliers)
        )
    else:
        starving = jnp.asarray(False)
    is_kf = res.success & (parallax_kf | starving)

    # ONE packed [20] f32 vector: the relay charges a full round trip
    # PER FETCHED ARRAY (measured ~5-60 ms each, utils/hostsync.py), so
    # the per-frame scalar record must be a single buffer, not a
    # 10-leaf dict. Layout: see unpack_bundle.
    bundle = jnp.concatenate([
        jnp.stack([
            res.success.astype(jnp.float32),
            is_kf.astype(jnp.float32),
            n_inl.astype(jnp.float32),
            tdiag["n_tracked"].astype(jnp.float32),
            res.final_cost,
            par,
            n_shared.astype(jnp.float32),
            n_active.astype(jnp.float32),
        ]),
        res.r_wb.ravel(),
        res.t_wb,
    ])
    return track, key, res.r_wb, res.t_wb, v_pred, bundle


def unpack_bundle(b) -> dict:
    """Host-side unpack of tracking_step's packed [20] record."""
    return {
        "success": bool(b[0]),
        "is_kf": bool(b[1]),
        "n_inliers": int(b[2]),
        "n_tracked": int(b[3]),
        "pnp_cost": float(b[4]),
        "parallax": float(b[5]),
        "n_shared": int(b[6]),
        "n_active": int(b[7]),
        "r": b[8:17].reshape(3, 3).copy(),
        "t": b[17:20].copy(),
    }

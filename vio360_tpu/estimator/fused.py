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


def keyframe_decision(pnp_success, parallax, n_inl, n_active, cfg: VioConfig):
    """The keyframe trigger, traceable and unit-testable.

    Two triggers OR'd under PnP success:
    - parallax: median shared-feature displacement from the last
      keyframe snapshot >= min_parallax_for_keyframe — the reference's
      ONLY rule (Estimator.cpp:616-635).
    - starving (beyond-reference, default-on; set
      tracking.kf_min_inlier_ratio = 0 for strict reference cadence):
      PnP inliers below that fraction of the active map observations —
      the local map has gone stale faster than parallax accumulates.
      Gated on n_inl >= 3 * pnp_min_inliers: a keyframe taken during a
      tracking collapse would bake a weakly-supported pose into the map,
      so near-collapse frames coast on odometry instead.
    """
    parallax_kf = parallax >= cfg.tracking.min_parallax_for_keyframe
    ratio = cfg.tracking.kf_min_inlier_ratio
    if ratio > 0:
        starving = (
            (n_inl < ratio * jnp.maximum(n_active, 1))
            & (n_inl >= 3 * cfg.window.pnp_min_inliers)
        )
    else:
        starving = jnp.asarray(False)
    return pnp_success & (parallax_kf | starving)


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


#: wire dtype + intensity scale per image-transport mode. The relay
#: moves ~30 MB/s (tools/profile_pipeline.py, round 5), so the frame
#: upload's BYTE COUNT is a first-order term in the per-frame budget:
#: "u8" cuts the 960x480 frame from 1.8 MB to 0.47 MB. The reference
#: consumes 8-bit camera images (OpenCV CV_8U mats, app/main.cpp:199-204
#: + FeatureTracker's cv::Mat pipeline), so the u8 wire format carries
#: the reference's full input precision; "u16" is a 1.5e-5-quantization
#: middle ground for float-native synthetic data; "f32" is exact.
_TRANSPORTS = {"f32": (None, 1.0), "u8": ("uint8", 255.0),
               "u16": ("uint16", 65535.0)}


def pack_frame_input(image, timestamp, imu_rows, cap: int, width: int,
                     frame_id: int = 0, transport: str = "f32"):
    """Host-side: ONE [H+aux_rows, W] buffer carrying the frame image
    plus every per-frame scalar input (timestamp, frame id, IMU
    samples, masks). The relay charges a round trip per uploaded array
    (utils/hostsync.py), so the frame's host->device traffic must be a
    single buffer — tracking_step unpacks it in-graph.

    ``transport`` picks the wire dtype (see _TRANSPORTS). Quantized
    modes carry the image as uint8/uint16 and the aux floats as their
    raw little-endian bytes (bitcast back in-graph); floats never ride
    an f32 REINTERPRETED lane (the TPU relay flushes denormals created
    by bitcasts through float buffers — utils/hostsync.py round-5
    finding — so the wire dtype here is integral end to end)."""
    import numpy as np

    h, w = image.shape
    # timestamp, frame_id, have_imu, samples [cap,7], mask [cap]
    n_aux = 3 + cap * 8
    aux = np.zeros(n_aux, np.float32)
    aux[0] = timestamp
    aux[1] = frame_id
    n = min(len(imu_rows), cap) if imu_rows is not None else 0
    aux[2] = 1.0 if n else 0.0
    if n:
        aux[3:3 + n * 7] = np.asarray(
            imu_rows[-n:], np.float32
        ).ravel()
        aux[3 + cap * 7:3 + cap * 7 + n] = 1.0
    dt_name, scale = _TRANSPORTS[transport]
    if dt_name is None:
        aux_rows = -(-n_aux // width)
        buf = np.zeros((h + aux_rows, w), np.float32)
        buf[:h] = image
        a = np.zeros(aux_rows * width, np.float32)
        a[:n_aux] = aux
        buf[h:] = a.reshape(aux_rows, width)
        return buf
    dt = np.dtype(dt_name)
    lanes = 4 // dt.itemsize  # u8: 4 lanes per f32, u16: 2
    n_words = n_aux * lanes
    aux_rows = -(-n_words // width)
    buf = np.zeros((h + aux_rows, w), dt)
    buf[:h] = np.rint(
        np.asarray(image, np.float32) * scale
    ).clip(0, scale).astype(dt)
    a = np.zeros(aux_rows * width, dt)
    a[:n_words] = aux.view(dt)
    buf[h:] = a.reshape(aux_rows, width)
    return buf


def buf_image(frame_buf, height: int):
    """Image rows of a packed frame buffer as f32 in [0, 1], for any
    transport (works on device arrays in-graph and on np arrays)."""
    img = frame_buf[:height]
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) * (1.0 / 255.0)
    if img.dtype == jnp.uint16:
        return img.astype(jnp.float32) * (1.0 / 65535.0)
    return img


def unpack_frame_buf(frame_buf, cfg):
    """In-graph unpack of pack_frame_input's layout (any transport)."""
    h = cfg.camera.height
    cap = cfg.imu.max_samples_per_frame
    n_aux = 3 + cap * 8
    img = buf_image(frame_buf, h)
    if frame_buf.dtype == jnp.float32:
        aux = frame_buf[h:].ravel()
    else:
        lanes = 4 // frame_buf.dtype.itemsize
        raw = frame_buf[h:].ravel()[:n_aux * lanes]
        aux = jax.lax.bitcast_convert_type(
            raw.reshape(n_aux, lanes), jnp.float32
        )
    return {
        "img": img,
        "timestamp": aux[0],
        "frame_id": aux[1].astype(jnp.int32),
        "have_imu": aux[2] > 0.5,
        "imu_samples": aux[3:3 + cap * 7].reshape(cap, 7),
        "imu_mask": aux[3 + cap * 7:3 + cap * 8] > 0.5,
    }


@functools.partial(_pjit, static_argnames=("cfg", "use_imu"))
def tracking_step(
    track: tracker.TrackState,
    win: window.WindowState,
    prev_buf: jax.Array,  # [H+aux, W] PREVIOUS frame's packed buffer
    frame_buf: jax.Array,  # [H+aux, W] packed image + per-frame scalars
    key: jax.Array,
    r_cur: jax.Array,
    t_cur: jax.Array,
    r_prev: jax.Array,
    t_prev: jax.Array,
    vel_cur: jax.Array,
    bg: jax.Array,
    ba: jax.Array,
    gravity_w: jax.Array,
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

    Both images arrive as PACKED buffers (pack_frame_input) and are
    sliced in-graph: the relay charges ~45 ms per large program OUTPUT
    buffer even when never fetched (measured round 4), so the frame
    must neither upload more than one array nor return any — the
    caller keeps ``frame_buf``'s device handle as the next
    ``prev_buf``.
    """
    w, h = cfg.camera.width, cfg.camera.height

    # ---- unpack the single frame buffer (see pack_frame_input) ----
    fb = unpack_frame_buf(frame_buf, cfg)
    img_prev = buf_image(prev_buf, h)
    img_next = fb["img"]
    timestamp = fb["timestamp"]
    have_imu = fb["have_imu"]
    imu_samples = fb["imu_samples"]
    imu_mask = fb["imu_mask"]

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
    is_kf = keyframe_decision(res.success, par, n_inl, n_active, cfg)

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


# ----------------------------------------------------------------------
# The keyframe event as ONE compiled dispatch.
# ----------------------------------------------------------------------

KF_AUX_LEN = 6  # timestamp, frame_id, n_pairs, was_full, do_refine, n_imu


def pack_kf_input(timestamp, frame_id, n_pairs, was_full, do_refine,
                  imu_rows, cap: int):
    """Host-side single upload for the keyframe event: control scalars
    + the since-last-KF IMU rows (up to ``cap``)."""
    import numpy as np

    buf = np.zeros(KF_AUX_LEN + cap * 7, np.float32)
    n = min(len(imu_rows), cap) if imu_rows is not None else 0
    buf[0] = timestamp
    buf[1] = frame_id
    buf[2] = n_pairs
    buf[3] = 1.0 if was_full else 0.0
    buf[4] = 1.0 if do_refine else 0.0
    buf[5] = n
    if n:
        buf[KF_AUX_LEN:KF_AUX_LEN + n * 7] = np.asarray(
            imu_rows[-n:], np.float32
        ).ravel()
    return buf


_KF_STEP_CACHE: dict = {}


def _kf_event_body(
    cfg: VioConfig, use_imu: bool, dist_ba_fn, dist_viba_fn,
    track, win, preints, timestamp, frame_id, n_pairs, was_full,
    do_refine, imu_rows, imu_mask, r_cur, t_cur, vel_cur, bg, ba,
    gravity_w, t_bc, r_cb, t_cb,
):
    """The traceable keyframe event: eviction capture -> add_keyframe
    -> KF preintegration append -> window (VI)BA -> bias re-linearize
    -> scale/gravity refine -> outlier relabel -> triangulate ->
    packed host record. Shared by make_keyframe_step (standalone
    dispatch) and make_mega_step (inlined behind lax.cond in the frame
    program). Returns (track', win', preints', bg', ba', r', t', vel',
    record) — record is one flat f32 vector (unpack_kf_record)."""
    from ..solver import imu_init as imu_init_mod
    from ..solver import marginals

    w, h = cfg.camera.width, cfg.camera.height
    max_kf = cfg.window.max_keyframes
    icfg = cfg.imu
    if True:
        # ---- eviction capture on the PRE-eviction window ----
        # (host uses it only when was_full & pose_graph.enabled)
        cap_kf_id = win.kf_id[:3]
        cap_kf_r = win.kf_r[:3]
        cap_kf_t = win.kf_t[:3]
        cap_vel0 = win.kf_vel[0]
        if cfg.pose_graph.enabled and cfg.pose_graph.cov_weighted:
            pair_w = marginals.window_pair_sqrt_info(win, cfg, r_cb, t_cb)
        else:
            pair_w = jnp.zeros((2, 6))
        if use_imu:
            imu_edge = _imu_edge_parts(preints, bg, ba, win.kf_r[0],
                                       win.kf_vel[0], gravity_w)
        else:
            imu_edge = jnp.zeros(22)

        # ---- append keyframe ----
        ids = jnp.where(track.valid, track.ids, -1)
        win = window.add_keyframe(
            win, r_cur, t_cur, vel_cur, bg, ba, timestamp, frame_id,
            track.uv, ids,
        )

        # ---- per-pair preintegration bookkeeping ----
        if use_imu:
            newp = pre.preintegrate(
                imu_rows, imu_mask, bg, ba,
                gyro_noise=icfg.gyro_noise, accel_noise=icfg.accel_noise,
                gyro_bias_noise=icfg.gyro_bias_noise,
                accel_bias_noise=icfg.accel_bias_noise,
                min_dt=icfg.min_dt, max_dt=icfg.max_dt,
            )
            idx = jnp.where(was_full, max_kf - 2, jnp.minimum(n_pairs, max_kf - 2))
            rolled = jax.lax.cond(
                was_full,
                lambda s: jax.tree_util.tree_map(
                    lambda a: jnp.roll(a, -1, axis=0), s
                ),
                lambda s: s,
                preints,
            )
            preints = jax.tree_util.tree_map(
                lambda a, n: a.at[idx].set(n), rolled, newp
            )
            n_pairs = jnp.minimum(n_pairs + 1, max_kf - 1)

        # ---- window solve ----
        if use_imu:
            pair_valid = (
                (jnp.arange(max_kf - 1) < n_pairs)
                & (preints.dt_total > 0.001)
                & (preints.dt_total < 2.0)
            )
            win, res = window.window_viba(
                win, t_bc, preints, pair_valid, gravity_w, bg, ba,
                w, h, cfg.camera.boundary_margin,
                huber_delta=cfg.window.huber_delta,
                chi2_threshold=cfg.window.chi2_threshold,
                max_iterations=cfg.window.viba_max_iterations,
                inertial_weight=cfg.window.viba_inertial_weight,
                bg_prior_weight=cfg.window.viba_bg_prior_weight,
                ba_prior_weight=cfg.window.viba_ba_prior_weight,
                dist_fn=dist_viba_fn,
            )
            bg, ba = res.bg, res.ba
            preints = jax.vmap(pre.update_bias, in_axes=(0, None, None))(
                preints, bg, ba
            )
        else:
            win, res = window.window_ba(
                win, t_bc, w, h, cfg.camera.boundary_margin,
                huber_delta=cfg.window.huber_delta,
                chi2_threshold=cfg.window.chi2_threshold,
                max_iterations=cfg.window.max_lm_iterations,
                backend=cfg.solver.backend,
                dist_fn=dist_ba_fn,
            )

        # ---- periodic scale/gravity refinement (VIO; gated in-graph on
        # the host's do_refine flag + the solution sanity bounds) ----
        refine_applied = jnp.asarray(False)
        refine_s = jnp.asarray(1.0, jnp.float32)
        r_wg = jnp.eye(3)
        t_anchor = jnp.zeros(3)
        if use_imu:
            ri = imu_init_mod.solve_imu_init(
                win.kf_r, win.kf_t, preints, pair_valid,
                gravity_magnitude=icfg.gravity_magnitude,
            )
            s_ok = (ri.scale > 0.5) & (ri.scale < 2.0)
            refine_applied = do_refine & ri.success & s_ok
            refine_s = jnp.where(refine_applied, ri.scale, 1.0)
            r_wg_c = imu_init_mod.gravity_dir_to_rotation(ri.gravity_dir)
            r_wg = jnp.where(refine_applied, r_wg_c, jnp.eye(3))
            t_anchor = r_wg.T @ win.kf_t[0]
            kf_r2, kf_t2, vel2, pts2 = imu_init_mod.align_gravity_and_scale(
                win.kf_r, win.kf_t, win.kf_vel, win.lm_pos, r_wg, refine_s,
            )
            kf_ok = win.kf_id >= 0
            app = refine_applied
            win = dataclasses.replace(
                win,
                kf_r=jnp.where(app & kf_ok[:, None, None], kf_r2, win.kf_r),
                kf_t=jnp.where(app & kf_ok[:, None], kf_t2, win.kf_t),
                kf_vel=jnp.where(app & kf_ok[:, None], vel2, win.kf_vel),
                lm_pos=jnp.where(
                    app & win.lm_alive[:, None], pts2, win.lm_pos
                ),
            )

        # ---- outlier feedback + triangulation ----
        bad = _bad_slots(track, win.lm_slot, win.lm_feat_id, res.new_bad)
        track = _relabel_tracks(track, bad)
        win, n_new, n_dropped = window.triangulate_new_landmarks(
            win, t_bc, w, h, live_ids=track.ids,
        )

        i_last = jnp.clip(win.n_kf - 1, 0, max_kf - 1)
        r_out = win.kf_r[i_last]
        t_out = win.kf_t[i_last]
        vel_out = win.kf_vel[i_last] if use_imu else vel_cur

        # ---- packed host record (see unpack_kf_record) ----
        record = jnp.concatenate([
            jnp.stack([
                res.final_cost,
                res.num_inliers.astype(jnp.float32),
                n_new.astype(jnp.float32),
                n_dropped.astype(jnp.float32),
                jnp.sum(win.lm_alive).astype(jnp.float32),
                jnp.sum(win.lm_marg & win.lm_alive).astype(jnp.float32),
                refine_applied.astype(jnp.float32),
                refine_s,
            ]),
            r_wg.ravel(),  # 9
            t_anchor,  # 3
            win.kf_id.astype(jnp.float32),  # K
            win.kf_r.ravel(),  # 9K
            win.kf_t.ravel(),  # 3K
            cap_kf_id.astype(jnp.float32),  # 3
            cap_kf_r.ravel(),  # 27
            cap_kf_t.ravel(),  # 9
            cap_vel0,  # 3
            pair_w.ravel(),  # 12
            imu_edge,  # 22
        ])
        return track, win, preints, bg, ba, r_out, t_out, vel_out, record


def make_keyframe_step(cfg: VioConfig, use_imu: bool, dist_ba_fn=None,
                       dist_viba_fn=None):
    """Standalone fused keyframe event: 1 upload + 1 dispatch + 1
    record fetch (see _kf_event_body). The staged equivalent made ~12
    separate dispatches/fetches. Returns a jitted ``kf_step(track, win,
    preints, aux_buf, r_cur, t_cur, vel_cur, bg, ba, gravity_w, t_bc,
    r_cb, t_cb) -> (track', win', preints', bg', ba', r', t', vel',
    record)``."""
    # The built program compiles in ~1 min at the production shape —
    # cache per configuration so every Estimator instance (and every
    # bench/CLI run in one process) reuses the compiled step.
    cache_key = ("kf", cfg, use_imu, dist_ba_fn, dist_viba_fn)
    hit = _KF_STEP_CACHE.get(cache_key)
    if hit is not None:
        return hit

    cap = cfg.imu.max_samples_per_keyframe

    def kf_step(track, win, preints, aux, r_cur, t_cur, vel_cur, bg, ba,
                gravity_w, t_bc, r_cb, t_cb):
        timestamp = aux[0]
        frame_id = aux[1].astype(jnp.int32)
        n_pairs = aux[2].astype(jnp.int32)
        was_full = aux[3] > 0.5
        do_refine = aux[4] > 0.5
        n_imu = aux[5].astype(jnp.int32)
        imu_rows = aux[KF_AUX_LEN:].reshape(cap, 7)
        imu_mask = jnp.arange(cap) < n_imu
        return _kf_event_body(
            cfg, use_imu, dist_ba_fn, dist_viba_fn,
            track, win, preints, timestamp, frame_id, n_pairs, was_full,
            do_refine, imu_rows, imu_mask, r_cur, t_cur, vel_cur, bg, ba,
            gravity_w, t_bc, r_cb, t_cb,
        )

    fn = _pjit(kf_step)
    _KF_STEP_CACHE[cache_key] = fn
    return fn


def _imu_edge_parts(preints_stacked, bg, ba, kf_r0, kf_vel0, gravity_w):
    """[22] flat vector: bias-corrected IMU odometry measurement for
    the pose-graph edge of pair 0 (see estimator._imu_edge_measurement,
    whose fields this flattens for the fused record): dr(9), dp(3),
    dt(1), t_rel(3), cov_r_diag(3), cov_p_diag(3)."""
    p0 = jax.tree_util.tree_map(lambda a: a[0], preints_stacked)
    dbg = bg - p0.bg
    dba = ba - p0.ba
    dr = p0.delta_r @ lie.so3_exp(p0.j_rg @ dbg)
    dp = p0.delta_p + p0.j_pg @ dbg + p0.j_pa @ dba
    dt = p0.dt_total
    t_rel = kf_r0.T @ (kf_vel0 * dt + 0.5 * gravity_w * dt * dt) + dp
    cov_d = jnp.diagonal(p0.cov)
    return jnp.concatenate([
        dr.ravel(), dp, dt[None], t_rel, cov_d[0:3], cov_d[6:9],
    ])


def _bad_slots(track, lm_slot, lm_feat_id, new_bad):
    """Tracker slots whose landmark BA just marked bad (id-joined so a
    recycled slot is never hit; see estimator._bad_landmark_slots)."""
    c = track.uv.shape[0]
    dest = jnp.where(new_bad, jnp.clip(lm_slot, 0, c - 1), c)
    bad_id = jnp.full((c,), -2, jnp.int32).at[dest].set(lm_feat_id, mode="drop")
    return track.ids == bad_id


def unpack_kf_record(rec, max_kf: int) -> dict:
    """Host-side unpack of make_keyframe_step's flat record."""
    import numpy as np

    k = max_kf
    o = 8
    out = {
        "ba_cost": float(rec[0]),
        "ba_inliers": int(rec[1]),
        "n_new": int(rec[2]),
        "n_dropped": int(rec[3]),
        "n_lm_alive": int(rec[4]),
        "n_lm_marg": int(rec[5]),
        "refine_applied": bool(rec[6] > 0.5),
        "refine_s": float(rec[7]),
    }
    out["r_wg"] = rec[o:o + 9].reshape(3, 3).copy(); o += 9
    out["t_anchor"] = rec[o:o + 3].copy(); o += 3
    out["kf_id"] = rec[o:o + k].astype(np.int32); o += k
    out["kf_r"] = rec[o:o + 9 * k].reshape(k, 3, 3).copy(); o += 9 * k
    out["kf_t"] = rec[o:o + 3 * k].reshape(k, 3).copy(); o += 3 * k
    out["cap_kf_id"] = rec[o:o + 3].astype(np.int32); o += 3
    out["cap_kf_r"] = rec[o:o + 27].reshape(3, 3, 3).copy(); o += 27
    out["cap_kf_t"] = rec[o:o + 9].reshape(3, 3).copy(); o += 9
    out["cap_vel0"] = rec[o:o + 3].copy(); o += 3
    out["pair_w"] = rec[o:o + 12].reshape(2, 6).copy(); o += 12
    e = rec[o:o + 22]
    out["imu_edge"] = {
        "dr": e[0:9].reshape(3, 3).copy(),
        "dp": e[9:12].copy(),
        "dt": float(e[12]),
        "t_rel": e[13:16].copy(),
        "cov_r_diag": e[16:19].copy(),
        "cov_p_diag": e[19:22].copy(),
    }
    return out


# ----------------------------------------------------------------------
# The WHOLE frame — tracking AND (conditionally) the keyframe event —
# as ONE compiled dispatch.
# ----------------------------------------------------------------------

def kf_record_len(max_kf: int) -> int:
    """Flat length of the keyframe record (see unpack_kf_record)."""
    return 96 + 13 * max_kf


def make_mega_step(cfg: VioConfig, use_imu: bool, dist_ba_fn=None,
                   dist_viba_fn=None):
    """Build the megastep: fused tracking frame + in-graph conditional
    keyframe event (lax.cond on the keyframe decision).

    Measured motivation (tools/profile_pipeline.py, round 5): the
    tunneled-TPU relay serializes ~30 ms of server time PER operation,
    so the op COUNT per frame bounds throughput. The pipelined
    two-dispatch design (tracking_step + make_keyframe_step) pays 3 ops
    on plain frames but ~6-7 on keyframe frames (tracking fetch + aux
    upload + kf dispatch + record fetch + re-dispatch); folding the
    keyframe event INTO the frame program makes EVERY frame exactly
    3 ops (1 packed upload, 1 dispatch, 1 combined-record fetch) and
    removes the keyframe rewind entirely — the speculative next-frame
    dispatch is always valid because the keyframe is already applied
    in-graph. On a locally-attached TPU the same structure amortizes
    launch overhead; XLA executes only the taken lax.cond branch.

    The IMU rows since the last keyframe accumulate in a DEVICE ring
    buffer fed by each frame's packed buffer (the host list is only a
    mirror), and the keyframe-policy counters the host used to pack
    (n_pairs, scale-refine budget, window fullness) are computed
    in-graph — the host learns about a keyframe AFTER it happened, from
    the combined record, which is exactly what the one-frame-deferred
    pipelined resolve already tolerates.

    Returns a jitted
    ``mega(track, win, preints, kf_rows, kf_count, n_pairs,
    refine_count, prev_buf, frame_buf, key, r_cur, t_cur, r_prev,
    t_prev, vel_cur, bg, ba, gravity_w, t_bc, r_bc, r_cb, t_cb) ->
    (track', win', preints', kf_rows', kf_count', n_pairs',
    refine_count', key', r', t', v', record)`` where ``record`` is
    ``concat(tracking bundle [20], keyframe record)`` — the keyframe
    half is zeros on non-keyframe frames.
    """
    cache_key = ("mega", cfg, use_imu, dist_ba_fn, dist_viba_fn)
    hit = _KF_STEP_CACHE.get(cache_key)
    if hit is not None:
        return hit

    core = _make_mega_core(cfg, use_imu, dist_ba_fn, dist_viba_fn)
    fetch_k = max(cfg.solver.fetch_every, 1)

    def mega(track, win, preints, kf_rows, kf_count, n_pairs,
             refine_count, loop_db, loop_seq, rec_ring, prev_buf,
             frame_buf, key, r_cur, t_cur, r_prev, t_prev, vel_cur, bg,
             ba, gravity_w, t_bc, r_bc, r_cb, t_cb):
        (track3, win3, preints3, kf_rows2, kf_count2, n_pairs2, refine2,
         loop_db2, loop_seq2, key2, r3, t3, v3, bg3, ba3,
         record) = core(
            track, win, preints, kf_rows, kf_count, n_pairs,
            refine_count, loop_db, loop_seq, prev_buf, frame_buf, key,
            r_cur, t_cur, r_prev, t_prev, vel_cur, bg, ba, gravity_w,
            t_bc, r_bc, r_cb, t_cb,
        )
        # batched-fetch ring: the host reads K frames' records in ONE
        # transfer (cfg.solver.fetch_every); slot = frame id mod K
        fid = unpack_frame_buf(frame_buf, cfg)["frame_id"]
        rec_ring = rec_ring.at[jnp.mod(fid, fetch_k)].set(record)
        return (track3, win3, preints3, kf_rows2, kf_count2, n_pairs2,
                refine2, loop_db2, loop_seq2, rec_ring, key2, r3, t3,
                v3, bg3, ba3)

    fn = _pjit(mega)
    _KF_STEP_CACHE[cache_key] = fn
    return fn


def _make_mega_core(cfg: VioConfig, use_imu: bool, dist_ba_fn=None,
                    dist_viba_fn=None):
    """The megastep body as a pure per-frame function, shared by the
    single-dispatch wrapper (make_mega_step) and the K-frame scanned
    dispatch (make_multi_mega_step)."""
    cap_kf = cfg.imu.max_samples_per_keyframe
    max_kf = cfg.window.max_keyframes
    rec_len = kf_record_len(max_kf)
    loop_on = cfg.loop.enabled

    def core(track, win, preints, kf_rows, kf_count, n_pairs,
             refine_count, loop_db, loop_seq, prev_buf,
             frame_buf, key, r_cur, t_cur, r_prev, t_prev, vel_cur, bg,
             ba, gravity_w, t_bc, r_bc, r_cb, t_cb):
        fb = unpack_frame_buf(frame_buf, cfg)
        (track2, key2, r_new, t_new, v_new, bundle) = tracking_step(
            track, win, prev_buf, frame_buf, key, r_cur, t_cur, r_prev,
            t_prev, vel_cur, bg, ba, gravity_w, r_bc, r_cb, t_cb, cfg,
            use_imu,
        )
        is_kf = bundle[1] > 0.5

        # ---- device-side IMU accumulation since the last keyframe ----
        cap_f = cfg.imu.max_samples_per_frame
        idx = jnp.mod(kf_count + jnp.arange(cap_f), cap_kf)
        upd = jnp.where(fb["imu_mask"][:, None], fb["imu_samples"],
                        kf_rows[idx])
        kf_rows = kf_rows.at[idx].set(upd)
        kf_count = kf_count + jnp.sum(fb["imu_mask"]).astype(jnp.int32)

        # ---- keyframe-policy scalars, in-graph (the host packed these
        # in make_keyframe_step's aux; here they must not lag) ----
        was_full = win.n_kf >= max_kf
        n_kf_after = jnp.minimum(win.n_kf + 1, max_kf)
        if use_imu:
            pairs_after = jnp.minimum(n_pairs + 1, max_kf - 1)
        else:
            pairs_after = n_pairs
        do_refine = (
            jnp.asarray(use_imu)
            & (refine_count < cfg.window.max_scale_refines)
            & (n_kf_after >= 3)
            & (pairs_after == n_kf_after - 1)
        )

        def kf_branch(op):
            track_i, win_i, preints_i, bg_i, ba_i, db_i, dbseq_i = op
            # ring -> oldest-first rows (keep the NEWEST cap_kf rows,
            # matching the staged path's rows[-cap:])
            start = jnp.maximum(kf_count - cap_kf, 0)
            order = jnp.mod(start + jnp.arange(cap_kf), cap_kf)
            rows = kf_rows[order]
            mask = jnp.arange(cap_kf) < jnp.minimum(kf_count, cap_kf)
            (track_o, win_o, preints_o, bg_o, ba_o, r_o, t_o, v_o,
             rec) = _kf_event_body(
                cfg, use_imu, dist_ba_fn, dist_viba_fn,
                track_i, win_i, preints_i, fb["timestamp"],
                fb["frame_id"], n_pairs, was_full, do_refine, rows,
                mask, r_new, t_new, v_new, bg_i, ba_i, gravity_w, t_bc,
                r_cb, t_cb,
            )
            if loop_on:
                # in-graph place-database ingest (loop/closure.py): the
                # NEW keyframe's descriptor, coarse patches and landmark
                # join enter the ring at slot seq % cap — no separate
                # per-keyframe dispatch (one relay op saved per KF)
                from ..loop import closure as loop_mod

                desc_e, patch_e, lmp_e, lmo_e = loop_mod._describe_and_join(
                    fb["img"],
                    track_o.uv,
                    jnp.where(track_o.valid, track_o.ids, -1),
                    track_o.valid, win_o, cfg,
                )
                db_i = loop_mod._ingest(
                    db_i, jnp.mod(dbseq_i, db_i.capacity), desc_e,
                    patch_e, track_o.uv, lmp_e, lmo_e, r_o, t_o,
                )
                dbseq_i = dbseq_i + 1
            return (
                track_o, win_o, preints_o, bg_o, ba_o, r_o, t_o, v_o,
                jnp.asarray(0, jnp.int32),  # kf_rows count resets
                pairs_after,
                refine_count + (rec[6] > 0.5).astype(jnp.int32),
                db_i, dbseq_i,
                rec,
            )

        def no_kf(op):
            track_i, win_i, preints_i, bg_i, ba_i, db_i, dbseq_i = op
            return (
                track_i, win_i, preints_i, bg_i, ba_i, r_new, t_new,
                v_new, kf_count, n_pairs, refine_count, db_i, dbseq_i,
                jnp.zeros(rec_len),
            )

        (track3, win3, preints3, bg3, ba3, r3, t3, v3, kf_count2,
         n_pairs2, refine2, loop_db2, loop_seq2, kfrec) = jax.lax.cond(
            is_kf, kf_branch, no_kf,
            (track2, win, preints, bg, ba, loop_db, loop_seq),
        )
        record = jnp.concatenate([bundle, kfrec])
        return (track3, win3, preints3, kf_rows, kf_count2, n_pairs2,
                refine2, loop_db2, loop_seq2, key2, r3, t3,
                v3, bg3, ba3, record)

    return core


def mega_qstate_len(cfg: VioConfig) -> int:
    """Length of the per-frame loop-query tail the scanned dispatch
    appends to each record: post-frame feature state (uv, ids, valid)
    + pose, so the host can run loop-closure detection for a mid-batch
    keyframe without per-frame device snapshots."""
    n = cfg.features.max_features
    return n * 2 + n + n + 9 + 3


def unpack_mega_qstate(tail, cfg: VioConfig) -> dict:
    """Host-side unpack of the scanned record's loop-query tail."""
    import numpy as np

    n = cfg.features.max_features
    uv = np.asarray(tail[:n * 2]).reshape(n, 2)
    ids = np.asarray(tail[n * 2:n * 3]).astype(np.int64)
    valid = np.asarray(tail[n * 3:n * 4]) > 0.5
    r = np.asarray(tail[n * 4:n * 4 + 9]).reshape(3, 3)
    t = np.asarray(tail[n * 4 + 9:n * 4 + 12])
    return {"uv": uv, "ids": ids, "valid": valid, "r": r, "t": t}


def make_multi_mega_step(cfg: VioConfig, use_imu: bool, k: int,
                         dist_ba_fn=None, dist_viba_fn=None,
                         unroll: bool = False):
    """K megasteps as ONE scanned program over ONE stacked upload.

    Motivation (round 5, tools/profile_pipeline.py + the stacked-upload
    probe): the tunneled-TPU relay charges ~30 ms of serialized server
    time PER operation plus ~30 MB/s for the payload, so after the
    megastep collapsed every frame to 3 ops, the remaining lever is
    dispatching K frames per op triplet: one stacked [K+1, H+aux, W]
    upload (row 0 = the PREVIOUS frame's buffer, so consecutive batches
    chain without keeping a device-side image handle), one program that
    ``lax.scan``s the megastep core over the K (prev, next) buffer
    pairs, and one fetch of the stacked per-frame records. On local
    hardware the same structure amortizes K dispatch overheads.

    Each scanned record is ``concat(mega record, loop-query tail)``
    (mega_qstate_len): the tail carries the post-frame track/pose state
    the host's loop-closure detection would otherwise read from the
    per-frame pipeline snapshots that batch mode doesn't keep.

    Returns a jitted
    ``multi(track, win, preints, kf_rows, kf_count, n_pairs,
    refine_count, loop_db, loop_seq, bufs, key, r_cur, t_cur, r_prev,
    t_prev, vel_cur, bg, ba, gravity_w, t_bc, r_bc, r_cb, t_cb) ->
    (track', win', preints', kf_rows', kf_count', n_pairs',
    refine_count', loop_db', loop_seq', key', r', t', r_prev', t_prev',
    v', bg', ba', records[k, rec+qstate])``.
    """
    cache_key = ("multi", cfg, use_imu, k, dist_ba_fn, dist_viba_fn,
                 unroll)
    hit = _KF_STEP_CACHE.get(cache_key)
    if hit is not None:
        return hit

    core = _make_mega_core(cfg, use_imu, dist_ba_fn, dist_viba_fn)

    def multi(track, win, preints, kf_rows, kf_count, n_pairs,
              refine_count, loop_db, loop_seq, bufs, key, r_cur, t_cur,
              r_prev, t_prev, vel_cur, bg, ba, gravity_w, t_bc, r_bc,
              r_cb, t_cb):
        def body(carry, pair):
            (track, win, preints, kf_rows, kf_count, n_pairs,
             refine_count, loop_db, loop_seq, key, r_cur, t_cur,
             r_prev, t_prev, vel_cur, bg, ba) = carry
            pbuf, fbuf = pair
            (track3, win3, preints3, kf_rows2, kf_count2, n_pairs2,
             refine2, loop_db2, loop_seq2, key2, r3, t3, v3, bg3, ba3,
             record) = core(
                track, win, preints, kf_rows, kf_count, n_pairs,
                refine_count, loop_db, loop_seq, pbuf, fbuf, key,
                r_cur, t_cur, r_prev, t_prev, vel_cur, bg, ba,
                gravity_w, t_bc, r_bc, r_cb, t_cb,
            )
            ids = jnp.where(track3.valid, track3.ids, -1)
            # f32 carries the ids exactly to 2^24 — far beyond any
            # feature-id watermark a real run reaches
            qtail = jnp.concatenate([
                track3.uv.ravel(),
                ids.astype(jnp.float32),
                track3.valid.astype(jnp.float32),
                r3.ravel(), t3,
            ])
            carry2 = (track3, win3, preints3, kf_rows2, kf_count2,
                      n_pairs2, refine2, loop_db2, loop_seq2, key2,
                      r3, t3, r_cur, t_cur, v3, bg3, ba3)
            return carry2, jnp.concatenate([record, qtail])

        carry0 = (track, win, preints, kf_rows, kf_count, n_pairs,
                  refine_count, loop_db, loop_seq, key, r_cur, t_cur,
                  r_prev, t_prev, vel_cur, bg, ba)
        carry1, records = jax.lax.scan(
            body, carry0, (bufs[:-1], bufs[1:]),
            unroll=k if unroll else 1,
        )
        (track3, win3, preints3, kf_rows2, kf_count2, n_pairs2, refine2,
         loop_db2, loop_seq2, key2, r3, t3, rp3, tp3, v3, bg3,
         ba3) = carry1
        return (track3, win3, preints3, kf_rows2, kf_count2, n_pairs2,
                refine2, loop_db2, loop_seq2, key2, r3, t3, rp3, tp3,
                v3, bg3, ba3, records)

    fn = _pjit(multi)
    _KF_STEP_CACHE[cache_key] = fn
    return fn

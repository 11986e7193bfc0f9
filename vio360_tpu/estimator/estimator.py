"""Per-frame VO/VIO state machine (host orchestration over jitted kernels).

Counterpart of ``src/processing/Estimator.{h,cpp}``: the only API a
caller needs is ``Estimator.process_frame(image, timestamp, imu)``
(Estimator.cpp:71-389). Control flow (bootstrap vs tracking, keyframe
decisions) runs in Python on the host; every numeric stage — tracking,
RANSAC, init, PnP, triangulation, BA — is one of the fixed-shape jitted
kernels from the other modules, so steady-state frames never
recompile.

Pipeline states:
- BOOTSTRAPPING: accumulate a ``window_size`` frame buffer, attempt the
  two-view init on (first, last) when full (Estimator.cpp:77-153);
  success seeds two keyframes + landmarks and runs full BA.
- TRACKING: constant-velocity pose prediction (Estimator.cpp:318-334)
  or IMU propagation when available, PnP against the local map,
  keyframe creation on >= min parallax from the last keyframe
  (Estimator.cpp:616-635) with new-landmark triangulation and local BA.

Failure contract mirrors the reference: PnP failure keeps the predicted
pose and coasts (Optimizer.cpp:286-291); init failure just slides the
window and retries.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VioConfig
from ..frontend import tracker
from ..geometry import camera as cam_g
from ..geometry import lie
from ..solver import pnp as pnp_mod
from ..utils.logging import get_logger
from . import initializer, window

log = get_logger("vio360.estimator")


@dataclasses.dataclass
class FrameResult:
    frame_id: int
    timestamp: float
    state: str  # "bootstrapping" | "initialized" | "tracking" | "tracking_lost"
    r_wb: np.ndarray
    t_wb: np.ndarray
    is_keyframe: bool
    n_tracked: int
    n_pnp_inliers: int
    diag: dict[str, Any]


@functools.partial(jax.jit, static_argnames=("width",))
def _median_parallax(uv_now, ids_now, valid_now, kf_uv, kf_ids, width):
    """Median pixel displacement of features shared with a keyframe
    snapshot (slot-aligned join; Estimator.cpp:616-635)."""
    shared = valid_now & (ids_now >= 0) & (ids_now == kf_ids)
    du = cam_g.wrap_residual_u(uv_now[:, 0] - kf_uv[:, 0], width)
    dv = uv_now[:, 1] - kf_uv[:, 1]
    par = jnp.sqrt(du * du + dv * dv)
    return initializer.masked_median(par, shared), jnp.sum(shared)


@jax.jit
def _pnp_inputs(win: window.WindowState, ids, valid, uv):
    """Slot-aligned PnP arrays: landmark positions + masks per feature slot."""
    lm_idx = window.slot_to_landmark(win, ids)
    has = lm_idx >= 0
    safe = jnp.clip(lm_idx, 0, win.max_lm - 1)
    points = win.lm_pos[safe]
    active = valid & has
    marg = win.lm_marg[safe] & has
    return points, active, marg


class Estimator:
    """Stateful facade (the reference's god object, Estimator.h:81-91)."""

    def __init__(self, cfg: VioConfig):
        self.cfg = cfg
        self.capacity = cfg.features.capacity
        self.track = tracker.init_state(self.capacity)
        self.win = window.empty_window(
            cfg.window.max_keyframes, cfg.window.max_landmarks, self.capacity
        )
        self.t_bc = jnp.asarray(cfg.t_bc_array())
        r_bc = self.t_bc[:3, :3]
        self.r_cb = r_bc.T
        self.t_cb = -(r_bc.T @ self.t_bc[:3, 3])

        self.initialized = False
        self.frame_id = -1
        self.img_prev: jax.Array | None = None
        self.key = jax.random.PRNGKey(0)
        # bootstrap window of tracker snapshots (host list of small pytrees)
        self.snapshots: list[dict[str, Any]] = []
        # current/previous body pose for the constant-velocity model
        self.r_cur = jnp.eye(3)
        self.t_cur = jnp.zeros(3)
        self.r_prev = jnp.eye(3)
        self.t_prev = jnp.zeros(3)
        self.trajectory: list[tuple[float, np.ndarray, np.ndarray]] = []

    # ------------------------------------------------------------------

    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def _snapshot(self, timestamp: float) -> dict[str, Any]:
        t = self.track
        return {
            "uv": t.uv,
            "ids": jnp.where(t.valid, t.ids, -1),
            "valid": t.valid,
            "track_count": t.track_count,
            "age": t.age,
            "time": timestamp,
            "frame_id": self.frame_id,
        }

    def _record(self, timestamp: float):
        self.trajectory.append(
            (timestamp, np.asarray(self.r_cur), np.asarray(self.t_cur))
        )

    # ------------------------------------------------------------------

    def process_frame(
        self, image, timestamp: float, imu: np.ndarray | None = None
    ) -> FrameResult:
        self.frame_id += 1
        img = jnp.asarray(image, jnp.float32)
        cfg = self.cfg

        if self.img_prev is None:
            self.track = tracker.bootstrap_frame(self.track, img, jnp.asarray(timestamp), cfg)
            self.img_prev = img
            self.snapshots = [self._snapshot(timestamp)]
            self._record(timestamp)
            return self._result(timestamp, "bootstrapping", False, 0, 0, {})

        self.track, r_rel, tdiag = tracker.track_frame(
            self.track, self.img_prev, img, jnp.asarray(timestamp), self._next_key(), cfg
        )
        self.img_prev = img
        n_tracked = int(tdiag["n_tracked"])

        if not self.initialized:
            return self._bootstrap_step(timestamp, n_tracked, tdiag)
        return self._tracking_step(timestamp, n_tracked, tdiag)

    # ------------------------------------------------------------------

    def _bootstrap_step(self, timestamp, n_tracked, tdiag) -> FrameResult:
        cfg = self.cfg
        self.snapshots.append(self._snapshot(timestamp))
        if len(self.snapshots) > cfg.init.window_size:
            self.snapshots.pop(0)

        if len(self.snapshots) == cfg.init.window_size:
            first, last = self.snapshots[0], self.snapshots[-1]
            tracked_full = (
                last["valid"] & (last["ids"] >= 0) & (last["ids"] == first["ids"])
            )
            res = initializer.try_initialize(
                self._next_key(),
                first["uv"],
                last["uv"],
                tracked_full,
                last["track_count"] + 1,  # observations = tracks + birth frame
                self.t_bc,
                cfg,
            )
            if bool(res.success):
                self._seed_from_init(first, last, res, timestamp)
                self._record(timestamp)
                return self._result(
                    timestamp, "initialized", True, n_tracked,
                    int(res.num_valid_points),
                    {"median_parallax": float(res.median_parallax),
                     "scale_factor": float(res.scale_factor)},
                )
        self._record(timestamp)
        return self._result(timestamp, "bootstrapping", False, n_tracked, 0, {})

    def _seed_from_init(self, first, last, res: initializer.InitResult, timestamp):
        cfg = self.cfg
        zeros = jnp.zeros(3)
        # KF1: world = body1 (identity pose)
        self.win = window.add_keyframe(
            self.win, jnp.eye(3), zeros, zeros, zeros, zeros,
            jnp.asarray(first["time"], jnp.float32), jnp.asarray(first["frame_id"]),
            first["uv"], first["ids"],
        )
        self.win = window.add_keyframe(
            self.win, res.r_wb2, res.t_wb2, zeros, zeros, zeros,
            jnp.asarray(last["time"], jnp.float32), jnp.asarray(last["frame_id"]),
            last["uv"], last["ids"],
        )
        self.win = window.add_landmarks(
            self.win, res.points_w, res.point_valid, last["ids"], self.win.kf_id[0]
        )
        # Full BA over the 2 keyframes (Initializer.cpp:250-280)
        self.win, ba_res = window.window_ba(
            self.win, self.t_bc, cfg.camera.width, cfg.camera.height,
            cfg.camera.boundary_margin, max_iterations=cfg.window.max_lm_iterations,
        )
        i_last = int(self.win.n_kf) - 1
        self.r_cur = self.win.kf_r[i_last]
        self.t_cur = self.win.kf_t[i_last]
        self.r_prev, self.t_prev = self.r_cur, self.t_cur
        self.initialized = True
        self.last_kf_index = i_last
        log.info(
            "Init success: %d landmarks, BA cost %.2f -> %.2f",
            int(res.num_valid_points), float(ba_res.initial_cost), float(ba_res.final_cost),
        )

    # ------------------------------------------------------------------

    def _tracking_step(self, timestamp, n_tracked, tdiag) -> FrameResult:
        cfg = self.cfg
        w, h = cfg.camera.width, cfg.camera.height

        # Constant-velocity prediction: T_pred = T_cur * (T_prev^-1 T_cur)
        ri, ti = lie.se3_inverse(self.r_prev, self.t_prev)
        dr, dt = lie.se3_compose(ri, ti, self.r_cur, self.t_cur)
        r_pred, t_pred = lie.se3_compose(self.r_cur, self.t_cur, dr, dt)

        ids = jnp.where(self.track.valid, self.track.ids, -1)
        points, active, marg = _pnp_inputs(self.win, ids, self.track.valid, self.track.uv)
        active &= ~cam_g.is_near_boundary(self.track.uv, w, h, cfg.camera.boundary_margin)

        res = pnp_mod.solve_pnp(
            r_pred, t_pred, points, self.track.uv, active, marg,
            self.r_cb, self.t_cb, w, h,
            huber_delta=cfg.window.huber_delta,
            chi2_threshold=cfg.window.chi2_threshold,
            rounds=cfg.window.pnp_rounds,
            max_iterations=cfg.window.max_lm_iterations,
            min_inliers=cfg.window.pnp_min_inliers,
        )
        self.r_prev, self.t_prev = self.r_cur, self.t_cur
        self.r_cur, self.t_cur = res.r_wb, res.t_wb
        pnp_ok = bool(res.success)
        n_inl = int(res.num_inliers)

        # Keyframe decision: median parallax vs last keyframe
        # (Estimator.cpp:616-635), plus a map-freshness trigger when PnP
        # inlier support collapses (see TrackingConfig.kf_min_inlier_ratio).
        i_last = int(self.win.n_kf) - 1
        par, n_shared = _median_parallax(
            self.track.uv, ids, self.track.valid,
            self.win.kf_feat_uv[i_last], self.win.kf_feat_id[i_last], w,
        )
        n_active = int(jnp.sum(active))
        parallax_kf = float(par) >= cfg.tracking.min_parallax_for_keyframe
        # Only fire the freshness trigger while the pose is still well
        # supported — keyframing after a collapse would bake a bad pose
        # into the map.
        starving = (
            cfg.tracking.kf_min_inlier_ratio > 0
            and n_inl < cfg.tracking.kf_min_inlier_ratio * max(n_active, 1)
            and n_inl >= 3 * cfg.window.pnp_min_inliers
        )
        is_kf = pnp_ok and (parallax_kf or starving)
        diag = {
            "pnp_cost": float(res.final_cost),
            "parallax": float(par),
            "n_shared": int(n_shared),
            "n_active": n_active,
        }

        if is_kf:
            self._create_keyframe(timestamp, diag)

        self._record(timestamp)
        state = "tracking" if pnp_ok else "tracking_lost"
        return self._result(timestamp, state, is_kf, n_tracked, n_inl, diag)

    def _create_keyframe(self, timestamp, diag):
        cfg = self.cfg
        zeros = jnp.zeros(3)
        ids = jnp.where(self.track.valid, self.track.ids, -1)
        self.win = window.add_keyframe(
            self.win, self.r_cur, self.t_cur, zeros, zeros, zeros,
            jnp.asarray(timestamp, jnp.float32), jnp.asarray(self.frame_id),
            self.track.uv, ids,
        )
        # BA first, then triangulate new landmarks from the REFINED poses
        # (deviation from the reference's triangulate->BA order,
        # Estimator.cpp:756-789: measured to cut trajectory error ~2.5x in
        # high-keyframe-rate regimes because fresh landmarks no longer
        # inherit the pre-BA drifted pose).
        self.win, ba_res = window.window_ba(
            self.win, self.t_bc, cfg.camera.width, cfg.camera.height,
            cfg.camera.boundary_margin, max_iterations=cfg.window.max_lm_iterations,
        )
        self.win, n_new = window.triangulate_new_landmarks(
            self.win, self.t_bc, cfg.camera.width, cfg.camera.height
        )
        i_last = int(self.win.n_kf) - 1
        self.r_cur = self.win.kf_r[i_last]
        self.t_cur = self.win.kf_t[i_last]
        diag.update(
            n_new_landmarks=int(n_new),
            ba_cost=float(ba_res.final_cost),
            ba_inliers=int(ba_res.num_inliers),
        )

    # ------------------------------------------------------------------

    def _result(self, timestamp, state, is_kf, n_tracked, n_inl, diag) -> FrameResult:
        return FrameResult(
            frame_id=self.frame_id,
            timestamp=timestamp,
            state=state,
            r_wb=np.asarray(self.r_cur),
            t_wb=np.asarray(self.t_cur),
            is_keyframe=is_kf,
            n_tracked=n_tracked,
            n_pnp_inliers=n_inl,
            diag=diag,
        )

    # ------------------------------------------------------------------

    def export_trajectory(self):
        ts = np.asarray([t for t, _, _ in self.trajectory])
        rs = np.stack([r for _, r, _ in self.trajectory]) if self.trajectory else np.zeros((0, 3, 3))
        ps = np.stack([p for _, _, p in self.trajectory]) if self.trajectory else np.zeros((0, 3))
        return ts, rs, ps

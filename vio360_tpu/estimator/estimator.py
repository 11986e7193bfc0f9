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

import contextlib
import dataclasses
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VioConfig
from ..frontend import tracker
from ..geometry import lie
from ..imu import preintegration as pre
from ..solver import imu_init as imu_init_mod
from ..solver import marginals
from ..solver import pnp as pnp_mod
from ..utils import hostsync
from ..utils.logging import StageTimer, get_logger
from . import fused, initializer, window
from .fused import _pnp_inputs, _relabel_tracks
from ..utils.precision import jit as _pjit

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


@dataclasses.dataclass
class PgEdge:
    """One SE(3) relative constraint in the evicted-keyframe pose graph
    (solver/pose_graph.py). ``w_sqrt`` is the [6] diagonal
    sqrt-information (rho, phi) — covariance-derived by default
    (solver/marginals.py). IMU odometry edges additionally keep the
    pieces needed to RE-DERIVE their translation under a world
    similarity transform: unlike visual relatives, the accelerometer's
    dP and gravity terms are metric and must not rescale with the
    visual map — only the v0*dt kinematic term tracks the rescaled
    world (see _transform_history)."""

    fi: int
    fj: int
    rel_r: np.ndarray  # [3,3]
    rel_t: np.ndarray  # [3]
    w_sqrt: np.ndarray  # [6] diagonal sqrt-information (rho, phi)
    kind: str = "vis"  # "vis" | "skip" | "imu"
    # IMU-only (kind == "imu"):
    v0: np.ndarray | None = None  # world velocity of node i at record time
    r0: np.ndarray | None = None  # world rotation of node i at record time
    dt: float = 0.0  # preintegration span [s]
    dp: np.ndarray | None = None  # bias-corrected body-frame delta-p (metric)


@_pjit
def _bad_landmark_slots(track: tracker.TrackState, lm_slot, lm_feat_id, new_bad):
    """Tracker slots whose landmark BA just marked bad
    (Optimizer.cpp:446-456 SetBad): joined by feature id so a recycled
    slot is never hit."""
    cap = track.uv.shape[0]
    dest = jnp.where(new_bad, jnp.clip(lm_slot, 0, cap - 1), cap)
    bad_id = jnp.full((cap,), -2, jnp.int32).at[dest].set(lm_feat_id, mode="drop")
    return track.ids == bad_id  # only if the slot still holds that feature


@_pjit
def _imu_edge_measurement(preints_stacked, bg, ba, kf_r0, kf_vel0, gravity_w):
    """Bias-corrected IMU odometry measurement for a pose-graph edge
    (pair 0 of the stacked preintegrations), entirely on device (one
    dispatch feeding the eviction event's single packed fetch):
    first-order bias correction of the deltas
    (IMUPreintegrator.cpp:276-308), the SE(3) translation prediction,
    and the covariance diagonals the edge weight needs."""
    p0 = jax.tree_util.tree_map(lambda a: a[0], preints_stacked)
    dbg = bg - p0.bg
    dba = ba - p0.ba
    dr = p0.delta_r @ lie.so3_exp(p0.j_rg @ dbg)
    dp = p0.delta_p + p0.j_pg @ dbg + p0.j_pa @ dba
    dt = p0.dt_total
    t_rel = kf_r0.T @ (kf_vel0 * dt + 0.5 * gravity_w * dt * dt) + dp
    cov_d = jnp.diagonal(p0.cov)
    return dr, dp, dt, t_rel, cov_d[0:3], cov_d[6:9]


@_pjit
def _stack_preints(pres: list):
    """One jitted dispatch for the [n_pairs]-stacking (a Python-level
    tree_map of jnp.stack issues ~117 eager ops — each a host->device
    round trip, seconds through the axon relay)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pres)


# The window's keyframe-pair preintegrations live PERMANENTLY as one
# stacked device tree [P, ...] (P = max_keyframes - 1) with a
# host-tracked pair count — a host list of separate trees costs one
# relay round trip per element for every append/rebias/stack
# (~10 extra ops per keyframe event, utils/hostsync.py).

@_pjit
def _append_preint(stacked, new, idx, evict):
    """Append ``new`` at slot ``idx``; when ``evict`` the window just
    rolled, so pair 0 leaves and the stack shifts left first."""
    rolled = jax.lax.cond(
        evict,
        lambda s: jax.tree_util.tree_map(lambda a: jnp.roll(a, -1, axis=0), s),
        lambda s: s,
        stacked,
    )
    return jax.tree_util.tree_map(lambda a, n: a.at[idx].set(n), rolled, new)


@_pjit
def _update_bias_all(stacked, bg, ba):
    """Re-linearize EVERY pair's preintegration at the new bias in one
    dispatch (IMUPreintegrator.cpp:276-308 applied per pair)."""
    return jax.vmap(pre.update_bias, in_axes=(0, None, None))(stacked, bg, ba)


@_pjit
def _pair_valid_mask(stacked, n_real):
    """[P] validity: within the live pair count and dt in the
    reference's (0.001, 2.0) window (Optimizer.cpp:1035)."""
    n_pairs = stacked.dt_total.shape[0]
    return (
        (jnp.arange(n_pairs) < n_real)
        & (stacked.dt_total > 0.001)
        & (stacked.dt_total < 2.0)
    )


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
        self.r_bc = r_bc  # cached: slicing t_bc eagerly per frame would
        self.r_cb = r_bc.T  # cost a relay dispatch (utils/hostsync.py)
        self.t_cb = -(r_bc.T @ self.t_bc[:3, 3])

        # ---- distributed window solvers (--mesh lm=N) ----
        # BASELINE config #5: the window's landmark axis sharded over a
        # device mesh; reduced camera system psum'd per LM iteration
        # (parallel/dist_window_ba.py, parallel/dist_viba.py).
        self._dist_ba_fn = None
        self._dist_viba_fn = None
        if cfg.solver.mesh:
            axis, _, n_str = cfg.solver.mesh.partition("=")
            n_dev = int(n_str)
            if axis != "lm":
                raise ValueError(f"unsupported mesh axis {axis!r} (only 'lm')")
            if cfg.window.max_landmarks % n_dev:
                raise ValueError(
                    f"max_landmarks {cfg.window.max_landmarks} not divisible "
                    f"by mesh size {n_dev}"
                )
            from ..parallel import dist_viba, dist_window_ba, mesh as mesh_mod

            msh = mesh_mod.make_mesh(n_seq=1, n_lm=n_dev, devices=jax.devices()[:n_dev])
            self._dist_ba_fn = dist_window_ba.make_dist_window_ba(
                msh, cfg.camera.width, cfg.camera.height,
                huber_delta=cfg.window.huber_delta,
                chi2_threshold=cfg.window.chi2_threshold,
                max_iterations=cfg.window.max_lm_iterations,
            )
            self._dist_viba_fn = dist_viba.make_dist_viba(
                msh, cfg.camera.width, cfg.camera.height,
                huber_delta=cfg.window.huber_delta,
                chi2_threshold=cfg.window.chi2_threshold,
                max_iterations=cfg.window.viba_max_iterations,
                inertial_weight=cfg.window.viba_inertial_weight,
                bg_prior_weight=cfg.window.viba_bg_prior_weight,
                ba_prior_weight=cfg.window.viba_ba_prior_weight,
            )

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
        # BA-refined keyframe poses by frame id: export_trajectory
        # overrides the at-capture odometry estimates with these — the
        # bootstrap window's identity poses and every keyframe's pre-BA
        # pose get backfilled by their latest optimized values (new vs
        # the reference, which never exports a trajectory; SURVEY.md §5).
        self.kf_pose_log: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        # per-keyframe local scale from the Sim(3) pose-graph solve
        # (export-time only; 1.0 unless a monocular loop graph ran)
        self.kf_scale_log: dict[int, float] = {}
        # Per-frame (ref_kf_frame_id, rel_r, rel_p) anchors: non-keyframe
        # poses are derived at export as T_kf_refined * rel, the
        # reference's Frame reference-keyframe mechanism
        # (Frame.cpp:44-72, 278-301) recast as an export-time compose.
        self.traj_rel: list[tuple[int, np.ndarray, np.ndarray] | None] = []
        self.last_kf_fid = -1
        self.last_kf_capture: tuple[np.ndarray, np.ndarray] | None = None
        # Host-tracked keyframe count (== int(win.n_kf) by
        # construction): every int(device_scalar) read costs a full
        # relay round trip (utils/hostsync.py), and the KF count is
        # host-decidable — add_keyframe saturates at max_keyframes.
        self.n_kf_host = 0
        # fused keyframe event (fused.make_keyframe_step), built lazily
        # per IMU mode
        self._kf_step_fn = None
        self._kf_step_use_imu: bool | None = None
        # in-flight pipelined frames, oldest first (process_frame_async)
        self._pending_q: list[dict] = []

        # ---- loop closure + relocalization (loop/closure.py) ----
        # New capability vs the reference (no reloc/loop path at all,
        # SURVEY.md §5): keyframe place database + circular-correlation
        # retrieval + PnP verification; accepted closures add "loop"
        # pose-graph edges and rigidly correct the live window/map.
        self.loop_closer = None
        self.lost_streak = 0
        self._last_kf_window_host = None  # (kf_id, kf_r, kf_t) host copy
        if cfg.loop.enabled:
            from ..config import fit_loop_config
            from ..loop.closure import LoopCloser

            fitted = fit_loop_config(cfg.loop, cfg.camera)
            if fitted is not cfg.loop:
                cfg = dataclasses.replace(cfg, loop=fitted)
                self.cfg = cfg
            self.loop_closer = LoopCloser(cfg)

        # ---- megastep device-owned keyframe-policy state ----
        # (fused.make_mega_step: the keyframe event runs IN-GRAPH, so
        # the IMU accumulator and the policy counters the host used to
        # pack aux buffers must live on device; host copies are mirrors
        # updated from the fetched records.)
        self.kf_rows_dev = jnp.zeros((cfg.imu.max_samples_per_keyframe, 7))
        self.kf_count_dev = jnp.asarray(0, jnp.int32)
        self.n_pairs_dev = jnp.asarray(0, jnp.int32)
        self.refine_count_dev = jnp.asarray(0, jnp.int32)
        # batched-fetch record ring (fused.make_mega_step writes each
        # frame's combined record at slot fid % K; ONE host fetch
        # resolves K frames — cfg.solver.fetch_every)
        self.rec_ring_dev = jnp.zeros((
            max(cfg.solver.fetch_every, 1),
            20 + fused.kf_record_len(cfg.window.max_keyframes),
        ))
        # loop place-database: estimator-owned device state (threaded
        # through the megastep for in-graph ingest); a 1-slot dummy
        # when loop closure is disabled (the mega signature is fixed)
        from ..loop import closure as _loop_mod

        if self.loop_closer is not None:
            self.loop_db_dev = self.loop_closer.db
        else:
            self.loop_db_dev = _loop_mod.empty_db(
                dataclasses.replace(
                    cfg,
                    loop=dataclasses.replace(cfg.loop, db_capacity=1),
                    features=dataclasses.replace(cfg.features, capacity=1),
                )
            )
        self.loop_seq_dev = jnp.asarray(0, jnp.int32)
        self._mega_fn = None
        self._mega_use_imu: bool | None = None
        self._mega_active = False
        # ---- K-frame scanned dispatch (fused.make_multi_mega_step) ----
        # staged-but-undispatched frames (host packed buffers) and the
        # previous frame's host buffer (row 0 of each stacked upload)
        self._stage_q: list[dict] = []
        self._last_buf_host = None
        self._multi_fn = None
        self._multi_key = None

        # ---- pose-graph store (solver/pose_graph.py) ----
        # Evicted keyframes leave BA's reach; SE(3) relative edges keep
        # them connected to the live window so export-time pose-graph
        # optimization propagates present refinements back through the
        # history (new vs the reference: Estimator.cpp:692-754 eviction
        # simply forgets). Nodes are keyframe frame-ids in eviction
        # order; edges are (fid_i, fid_j, rel_r, rel_t, w_t, w_r).
        self.pg_nodes: list[int] = []
        self.pg_edges: list[PgEdge] = []

        # ---- inertial state (Estimator.cpp:239-471, 1320-1557) ----
        self.imu_initialized = False
        self.has_imu_stream = False  # any IMU rows seen yet
        self.scale_refine_count = 0  # ORB-SLAM3-style periodic refinements
        self.vel_cur = jnp.zeros(3)
        self.bg = jnp.zeros(3)
        self.ba = jnp.zeros(3)
        self.gravity_w = jnp.array([0.0, 0.0, -cfg.imu.gravity_magnitude])
        self.imu_since_last_kf: list[np.ndarray] = []  # rows (t,ax..gz)
        # preintegration for window KF pair (i, i+1), host list parallel
        # to the window's keyframe pairs
        n_max_pairs = cfg.window.max_keyframes - 1
        self.preints: pre.Preintegration = _stack_preints(
            [pre.identity_preintegration()] * n_max_pairs
        )
        self.n_pairs = 0  # host-tracked live pair count
        self.last_timestamp: float | None = None
        # Per-stage wall-clock accumulation (SURVEY.md §5 tracing — the
        # reference has no timers at all). Most stages synchronize on
        # their results for host control flow, so wall time ≈ stage time.
        self.timers = StageTimer()

    @contextlib.contextmanager
    def _stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timers.add(name, time.perf_counter() - t0)

    # ------------------------------------------------------------------

    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def _snapshot(self, timestamp: float, imu: np.ndarray | None = None) -> dict[str, Any]:
        t = self.track
        return {
            "uv": t.uv,
            "ids": jnp.where(t.valid, t.ids, -1),
            "valid": t.valid,
            "track_count": t.track_count,
            "age": t.age,
            "time": timestamp,
            "frame_id": self.frame_id,
            "imu": np.zeros((0, 7)) if imu is None else np.asarray(imu, np.float64),
        }

    def _preintegrate(
        self, rows: np.ndarray, bg: jax.Array, ba: jax.Array, cap: int
    ) -> pre.Preintegration:
        """Fixed-shape preintegration of host-side IMU rows."""
        icfg = self.cfg.imu
        s = np.zeros((cap, 7), np.float32)
        m = np.zeros(cap, bool)
        n = min(len(rows), cap)
        if n:
            s[:n] = rows[-n:]
            m[:n] = True
        with self._stage("preintegration"):
            return pre.preintegrate(
                jnp.asarray(s), jnp.asarray(m), bg, ba,
                gyro_noise=icfg.gyro_noise, accel_noise=icfg.accel_noise,
                gyro_bias_noise=icfg.gyro_bias_noise,
                accel_bias_noise=icfg.accel_bias_noise,
                min_dt=icfg.min_dt, max_dt=icfg.max_dt,
            )

    def _record(self, timestamp: float, r: np.ndarray | None = None, p: np.ndarray | None = None):
        if r is None:
            r, p = hostsync.fetch_tree((self.r_cur, self.t_cur))
        self.trajectory.append((timestamp, r, p))
        if self.last_kf_capture is not None:
            kr, kp = self.last_kf_capture
            self.traj_rel.append((self.last_kf_fid, kr.T @ r, kr.T @ (p - kp)))
        else:
            self.traj_rel.append(None)

    def _log_window_poses(self):
        """Snapshot the window's current (BA-refined) keyframe poses into
        the export log. ONE packed device->host transfer per call
        (utils/hostsync.py). Returns the host copies (kf_id, kf_r, kf_t)
        so callers reuse them instead of re-fetching."""
        n = self.n_kf_host
        if n == 0:
            return None
        kf_id, kf_r, kf_t = hostsync.fetch_tree(
            (self.win.kf_id[:n], self.win.kf_r[:n], self.win.kf_t[:n])
        )
        for i in range(n):
            fid = int(kf_id[i])
            if fid >= 0:
                self.kf_pose_log[fid] = (np.asarray(kf_r[i]), np.asarray(kf_t[i]))
        return kf_id, kf_r, kf_t

    def _record_pose_graph_eviction(self) -> None:
        """Capture SE(3) relative constraints for the about-to-be-evicted
        oldest keyframe (window slot 0), before add_keyframe rolls it
        out: a consecutive relative + a skip relative from the current
        BA-refined window poses, and (VIO) an IMU preintegration
        odometry edge (Forster RSS'15 prediction with current bias /
        gravity / velocity estimates)."""
        pcfg = self.cfg.pose_graph
        n = self.n_kf_host
        if n < 2:
            return
        m = 3  # fixed slice; empty slots carry kf_id == -1

        # ONE packed device->host transfer for the whole eviction event
        # (utils/hostsync.py): window slice + derived weights + the
        # bias-corrected IMU odometry measurement (computed ON device by
        # _imu_edge_measurement — the old host-side version paid a
        # ~12-leaf preintegration fetch plus an eager so3_exp dispatch).
        tree = {
            "kf_id": self.win.kf_id[:m],
            "kf_r": self.win.kf_r[:m],
            "kf_t": self.win.kf_t[:m],
            "kf_vel0": self.win.kf_vel[0],
        }
        if pcfg.cov_weighted:
            tree["pair_w"] = self._pair_sqrt_info()
        if self.imu_initialized and self.n_pairs > 0:
            tree["imu"] = _imu_edge_measurement(
                self.preints, self.bg, self.ba,
                self.win.kf_r[0], self.win.kf_vel[0], self.gravity_w,
            )
        h = hostsync.fetch_tree(tree)
        imu_edge = None
        if "imu" in h:
            dr, dp, dt_arr, t_rel, cov_r_d, cov_p_d = h["imu"]
            imu_edge = {
                "dr": dr, "dp": dp, "dt": float(dt_arr), "t_rel": t_rel,
                "cov_r_diag": cov_r_d, "cov_p_diag": cov_p_d,
            }
        self._append_pg_edges_host(
            h["kf_id"], h["kf_r"], h["kf_t"], h["kf_vel0"],
            h.get("pair_w"), imu_edge,
        )

    def _append_pg_edges_host(
        self, kf_id, kf_r, kf_t, vel0, pair_w, imu_edge,
    ) -> None:
        """Host half of the eviction capture: turn the fetched pieces
        (window slice, derived weights, bias-corrected IMU odometry)
        into PgEdge records. Shared by the staged path above and the
        fused keyframe event (fused.make_keyframe_step)."""
        pcfg = self.cfg.pose_graph
        fid0 = int(kf_id[0])
        if fid0 < 0:
            return
        self.pg_nodes.append(fid0)

        def fallback(wt, wr):
            return np.concatenate(
                [np.full(3, wt), np.full(3, wr)]
            ).astype(np.float32)

        if pcfg.cov_weighted and pair_w is not None:
            # Marginal pose covariance of the converged window
            # (Schur-reduced information inverted), propagated to the
            # (0,1) and (0,2) relatives (solver/marginals.py). Fixed
            # shape; the second row is discarded when no skip edge is
            # recorded.
            w01, w02 = np.asarray(pair_w)
        else:
            w01 = fallback(pcfg.vis_weight_t, pcfg.vis_weight_r)
            w02 = fallback(pcfg.skip_weight_t, pcfg.skip_weight_r)

        def rel(i, j):
            rr = kf_r[i].T @ kf_r[j]
            rt = kf_r[i].T @ (kf_t[j] - kf_t[i])
            return np.asarray(rr, np.float32), np.asarray(rt, np.float32)

        rr, rt = rel(0, 1)
        self.pg_edges.append(PgEdge(fid0, int(kf_id[1]), rr, rt, w01, "vis"))
        if int(kf_id[2]) >= 0:
            rr, rt = rel(0, 2)
            self.pg_edges.append(PgEdge(fid0, int(kf_id[2]), rr, rt, w02, "skip"))
        if imu_edge is not None:
            # preints pair 0 preintegrates window pair (0, 1):
            #   R_rel = dR_corr,  t_rel = R0^T (v0 dt + 0.5 g dt^2) + dP_corr
            # (bias correction first-order, IMUPreintegrator.cpp:276-308)
            dt = imu_edge["dt"]
            if dt > 1e-6:
                if pcfg.cov_weighted:
                    wt, wr = marginals.preint_edge_sqrt_info_diag(
                        imu_edge["cov_r_diag"], imu_edge["cov_p_diag"], dt,
                        vel_sigma=pcfg.imu_vel_sigma,
                        min_sigma_t=pcfg.min_sigma_t,
                        min_sigma_r=pcfg.min_sigma_r,
                    )
                    w_imu = np.concatenate([wt, wr])
                else:
                    w_imu = fallback(pcfg.imu_weight_t, pcfg.imu_weight_r)
                self.pg_edges.append(
                    PgEdge(
                        fid0, int(kf_id[1]),
                        np.asarray(imu_edge["dr"], np.float32),
                        np.asarray(imu_edge["t_rel"], np.float32),
                        w_imu, "imu",
                        v0=np.asarray(vel0, np.float32),
                        r0=np.asarray(kf_r[0], np.float32),
                        dt=dt,
                        dp=np.asarray(imu_edge["dp"], np.float32),
                    )
                )

    def _pair_sqrt_info(self):
        """Sqrt-information of the window's (0,1) and (0,2) relatives
        from the marginal pose covariance at the CURRENT (BA-refined)
        window state. Mirrors window.window_ba's problem construction
        exactly (same observations, gauge and boundary filter)."""
        return marginals.window_pair_sqrt_info(
            self.win, self.cfg, self.r_cb, self.t_cb
        )

    def optimize_pose_graph(self):
        """Pose-graph solve over the evicted-keyframe history with the
        live window pinned at its BA-refined poses (gauge anchors).
        Refined historical poses are written back into the export log,
        so non-keyframes re-derive from them too (Frame::GetTwb
        compose). Returns the PoseGraphResult or None if there is no
        history yet."""
        from ..solver import pose_graph as pg_mod

        pcfg = self.cfg.pose_graph
        if not pcfg.enabled or not self.pg_nodes:
            return None
        n = self.n_kf_host
        if n == 0:
            return None
        win_fids = [
            int(f) for f in hostsync.fetch_tree(self.win.kf_id[:n]) if f >= 0
        ]
        known = set(self.pg_nodes)
        nodes = list(self.pg_nodes) + [f for f in win_fids if f not in known]
        idx = {f: i for i, f in enumerate(nodes)}
        edges = [e for e in self.pg_edges if e.fi in idx and e.fj in idx]
        if not edges:
            return None
        # Pad to buckets so repeated exports reuse the compiled program.
        p = len(nodes)
        c = len(edges)
        pp = -(-p // 16) * 16
        pc = -(-c // 64) * 64
        rs = np.tile(np.eye(3, dtype=np.float32), (pp, 1, 1))
        ts_ = np.zeros((pp, 3), np.float32)
        fixed = np.ones(pp, bool)  # padded slots stay fixed
        for f, i in idx.items():
            logged = self.kf_pose_log.get(f)
            if logged is None:
                return None
            rs[i], ts_[i] = logged
            fixed[i] = False
        # Gauge: with only odometry edges the live window IS the best
        # available estimate — pin it and let the history follow. With
        # LOOP edges the drift sits in the RECENT trajectory; pinning
        # the window would drag the accurate old history toward the
        # drifted present, so only the world anchor stays fixed and the
        # loop constraints pull the recent keyframes back instead.
        have_loops = any(e.kind == "loop" for e in edges)
        if not have_loops:
            for f in win_fids:
                fixed[idx[f]] = True
        fixed[idx[nodes[0]]] = True  # world anchor
        ei = np.zeros(pc, np.int32)
        ej = np.zeros(pc, np.int32)
        rel_r = np.tile(np.eye(3, dtype=np.float32), (pc, 1, 1))
        rel_t = np.zeros((pc, 3), np.float32)
        w = np.zeros((pc, 6), np.float32)
        ev = np.zeros(pc, bool)
        for k, e in enumerate(edges):
            ei[k], ej[k] = idx[e.fi], idx[e.fj]
            rel_r[k], rel_t[k] = e.rel_r, e.rel_t
            w[k] = e.w_sqrt
            ev[k] = True
        # Monocular VO + loop edges: scale drift is the dominant error
        # (measured: per-lap map scale 6.54 -> 7.84 over 3 laps) and an
        # SE(3) graph cannot express it — use the Sim(3) graph there.
        use_sim3 = have_loops and not self.imu_initialized
        if use_sim3:
            w7 = np.zeros((pc, 7), np.float32)
            w7[:, :6] = w
            for k, e in enumerate(edges):
                sig = (pcfg.sim3_loop_scale_sigma if e.kind == "loop"
                       else pcfg.sim3_odom_scale_sigma)
                w7[k, 6] = 1.0 / sig
                if e.kind != "loop":
                    # systematic-drift floor: the covariance-derived
                    # odometry weights measure LOCAL precision; their
                    # errors are correlated along the chain (that IS
                    # the drift), so for the graph they carry at most
                    # drift-fraction information (r5 tuning:
                    # node-ATE 0.074 -> 0.046 on the 3-lap benchmark)
                    sig_t = 0.05 * float(np.linalg.norm(e.rel_t)) + 1e-3
                    w7[k, :3] = np.minimum(w7[k, :3], 1.0 / sig_t)
                    w7[k, 3:6] = np.minimum(w7[k, 3:6], 1.0 / 0.03)
            res = pg_mod.optimize_pose_graph_sim3(
                jnp.asarray(rs), jnp.asarray(ts_), jnp.asarray(ei),
                jnp.asarray(ej), jnp.asarray(rel_r), jnp.asarray(rel_t),
                jnp.asarray(w7), jnp.asarray(ev), jnp.asarray(fixed),
                max_iterations=pcfg.max_iterations,
            )
            r_out, t_out, ls_out = hostsync.fetch_tree(
                (res.r_wb, res.t_wb, res.log_s)
            )
            for f, i in idx.items():
                if not fixed[i]:
                    self.kf_pose_log[f] = (
                        np.asarray(r_out[i]), np.asarray(t_out[i])
                    )
                    # per-node scale: non-keyframes re-derive through
                    # relative anchors captured at the LOCAL scale
                    self.kf_scale_log[f] = float(np.exp(ls_out[i]))
            return res
        if have_loops:
            # SE(3)/VIO graph: the config loop weights are tuned for the
            # monocular Sim(3) solve (where correlated-odometry floors
            # rebalance them); against full-strength covariance-weighted
            # VIO odometry they over-pull on drift-free runs (measured:
            # vio_hard se3 0.021 -> 0.028) — cap to their single-edge
            # measured accuracy (~1 cm / 0.4 deg).
            for k, e in enumerate(edges):
                if e.kind == "loop":
                    w[k, :3] = np.minimum(w[k, :3], 100.0)
                    w[k, 3:6] = np.minimum(w[k, 3:6], 150.0)
        res = pg_mod.optimize_pose_graph(
            jnp.asarray(rs), jnp.asarray(ts_), jnp.asarray(ei), jnp.asarray(ej),
            jnp.asarray(rel_r), jnp.asarray(rel_t), jnp.asarray(w),
            jnp.asarray(ev), jnp.asarray(fixed),
            max_iterations=pcfg.max_iterations,
        )
        r_out, t_out = hostsync.fetch_tree((res.r_wb, res.t_wb))
        for f, i in idx.items():
            if not fixed[i]:
                self.kf_pose_log[f] = (
                    np.asarray(r_out[i]), np.asarray(t_out[i])
                )
        return res

    def _transform_history(self, r_wg, scale, t_anchor=None):
        """Re-express the recorded trajectory + current pose in the new
        (gravity-aligned, rescaled) world frame so the export stays in
        ONE frame across alignments. Anchored at the first keyframe like
        align_gravity_and_scale. With ``t_anchor`` given (fused keyframe
        path), all three arguments are host values and no device fetch
        happens."""
        if t_anchor is None:
            r_wg_h, scale_h, kf_t0 = hostsync.fetch_tree(
                (jnp.asarray(r_wg), jnp.asarray(scale, jnp.float32),
                 self.win.kf_t[0])
            )
            r_gw = r_wg_h.T
            s = float(scale_h)
            t_anchor = r_gw @ kf_t0
        else:
            r_gw = np.asarray(r_wg).T
            s = float(scale)
            t_anchor = np.asarray(t_anchor)
        self.trajectory = [
            (t, r_gw @ r, t_anchor + (r_gw @ p - t_anchor) * s)
            for (t, r, p) in self.trajectory
        ]
        self.kf_pose_log = {
            fid: (r_gw @ r, t_anchor + (r_gw @ p - t_anchor) * s)
            for fid, (r, p) in self.kf_pose_log.items()
        }
        # Relative anchors: rotation part is invariant under a global
        # similarity; the translation part scales by s.
        self.traj_rel = [
            None if e is None else (e[0], e[1], e[2] * s) for e in self.traj_rel
        ]
        # Pose-graph edges are relative too: rotations invariant.
        # Visual relatives' translations scale by s. IMU odometry edges
        # do NOT — their dP and gravity terms are metric accelerometer
        # measurements; only the v0*dt kinematic term tracks the
        # rescaled world. Re-derive those exactly from the stored
        # pieces: v0' = s R_gw v0, R0' = R_gw R0, g unchanged (the
        # world is gravity-aligned after the transform, and
        # self.gravity_w stays canonical).
        g = np.asarray(self.gravity_w)

        def xf(e: PgEdge) -> PgEdge:
            if e.kind != "imu":
                return dataclasses.replace(e, rel_t=e.rel_t * s)
            v0 = s * (r_gw @ e.v0)
            r0 = r_gw @ e.r0
            t_rel = r0.T @ (v0 * e.dt + 0.5 * g * e.dt * e.dt) + e.dp
            return dataclasses.replace(
                e, rel_t=np.asarray(t_rel, np.float32),
                v0=np.asarray(v0, np.float32), r0=np.asarray(r0, np.float32),
            )

        self.pg_edges = [xf(e) for e in self.pg_edges]
        if self.last_kf_capture is not None:
            kr, kp = self.last_kf_capture
            self.last_kf_capture = (r_gw @ kr, t_anchor + (r_gw @ kp - t_anchor) * s)
        r_gw_j = jnp.asarray(r_gw)
        t_anchor_j = jnp.asarray(t_anchor, jnp.float32)
        for attr in ("r_cur", "r_prev"):
            setattr(self, attr, r_gw_j @ getattr(self, attr))
        for attr in ("t_cur", "t_prev"):
            setattr(self, attr, t_anchor_j + (r_gw_j @ getattr(self, attr) - t_anchor_j) * s)
        self.vel_cur = (r_gw_j @ self.vel_cur) * s
        if self.loop_closer is not None:
            # the place database stores world-frame landmarks/poses
            self.loop_closer.db = self.loop_db_dev
            self.loop_closer.transform(r_gw, s, t_anchor)
            self.loop_db_dev = self.loop_closer.db

    # ------------------------------------------------------------------

    def process_frame(
        self, image, timestamp: float, imu: np.ndarray | None = None
    ) -> FrameResult:
        if self._pending_q or self._stage_q:
            # mixing the sync and pipelined APIs: drain the in-flight
            # frames first so state evolution stays sequential (callers
            # should stick to one API; this keeps state correct anyway)
            self.flush()
        self.frame_id += 1
        cfg = self.cfg
        imu_rows = (
            np.asarray(imu, np.float64).reshape(-1, 7)
            if imu is not None and len(imu)
            else np.zeros((0, 7))
        )
        if len(imu_rows):
            self.imu_since_last_kf.append(imu_rows)
            self.has_imu_stream = True
        self.last_imu_rows = imu_rows
        self.last_timestamp = timestamp

        h = cfg.camera.height
        if self.img_prev is None:
            # img_prev is ALWAYS a packed frame buffer (fused.
            # pack_frame_input); the image part is buf[:h].
            buf_np = fused.pack_frame_input(
                np.asarray(image, np.float32), timestamp, None,
                cfg.imu.max_samples_per_frame, cfg.camera.width,
                transport=cfg.solver.image_transport,
            )
            buf = jax.device_put(buf_np)
            self._last_buf_host = buf_np
            self.track = tracker.bootstrap_frame(
                self.track, fused.buf_image(buf, h), jnp.asarray(timestamp),
                cfg,
            )
            self.img_prev = buf
            self.snapshots = [self._snapshot(timestamp, imu_rows)]
            self._record(timestamp)
            return self._result(timestamp, "bootstrapping", False, 0, 0, {})

        if not self.initialized:
            # Bootstrap frames: bare front-end step (no pose prediction
            # exists yet), host window accumulation + init attempt.
            buf_np = fused.pack_frame_input(
                np.asarray(image, np.float32), timestamp, None,
                cfg.imu.max_samples_per_frame, cfg.camera.width,
                transport=cfg.solver.image_transport,
            )
            buf = jax.device_put(buf_np)
            self._last_buf_host = buf_np
            with self._stage("frontend"):
                self.track, _, tdiag = tracker.track_frame(
                    self.track, fused.buf_image(self.img_prev, h),
                    fused.buf_image(buf, h),
                    jnp.asarray(timestamp), self._next_key(), cfg,
                )
            self.img_prev = buf
            n_tracked = int(tdiag["n_tracked"])
            return self._bootstrap_step(timestamp, n_tracked, tdiag, imu_rows)

        # Steady state: the WHOLE tracking frame — prediction, LK,
        # RANSAC, landmark join, PnP, outlier relabel, keyframe decision
        # — is ONE compiled dispatch (estimator/fused.py) over ONE
        # uploaded buffer with a single device->host scalar-bundle read
        # (3 relay operations total; img_prev stays device-resident).
        return self._tracking_step(np.asarray(image, np.float32), timestamp)

    # ------------------------------------------------------------------

    def _bootstrap_step(self, timestamp, n_tracked, tdiag, imu_rows) -> FrameResult:
        cfg = self.cfg
        self.snapshots.append(self._snapshot(timestamp, imu_rows))
        if len(self.snapshots) > cfg.init.window_size:
            self.snapshots.pop(0)

        if len(self.snapshots) == cfg.init.window_size:
            first, last = self.snapshots[0], self.snapshots[-1]
            tracked_full = (
                last["valid"] & (last["ids"] >= 0) & (last["ids"] == first["ids"])
            )
            with self._stage("init"):
                res = initializer.try_initialize(
                    self._next_key(),
                    first["uv"],
                    last["uv"],
                    tracked_full,
                    last["track_count"] + 1,  # observations = tracks + birth frame
                    self.t_bc,
                    cfg,
                )
            # one packed fetch for the attempt's outcome scalars
            ok_h, par_h, sf_h, nvp_h = hostsync.fetch_tree(
                (res.success, res.median_parallax, res.scale_factor,
                 res.num_valid_points)
            )
            if bool(ok_h):
                self._seed_from_init(first, last, res, timestamp)
                diag = {
                    "median_parallax": float(par_h),
                    "scale_factor": float(sf_h),
                }
                has_imu = any(len(s["imu"]) for s in self.snapshots)
                if has_imu:
                    # VIO path: promote all window frames to keyframes and
                    # initialize gravity/scale/velocities/biases
                    # (Estimator.cpp:282-287, 845-1019, 1320-1399)
                    self._promote_window_frames(res)
                    imu_ok = self._try_initialize_imu()
                    diag["imu_initialized"] = imu_ok
                else:
                    # VO path: export-quality pose backfill for the
                    # bootstrap window (interpolate + per-frame PnP
                    # against the fresh map). New vs the reference,
                    # whose VO path leaves pre-init frames at their
                    # placeholder poses — those frames dominated the
                    # whole-trajectory ATE (measured: the first window
                    # contributes ~0.4 m mean error vs ~0.08 after).
                    self._backfill_bootstrap_poses(res)
                self._record(timestamp)
                return self._result(
                    timestamp, "initialized", True, n_tracked,
                    int(nvp_h), diag,
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
        self.n_kf_host = 2
        self.win = window.add_landmarks(
            self.win, res.points_w, res.point_valid, last["ids"], self.win.kf_id[0]
        )
        # Full BA over the 2 keyframes (Initializer.cpp:250-280)
        self.win, ba_res = window.window_ba(
            self.win, self.t_bc, cfg.camera.width, cfg.camera.height,
            cfg.camera.boundary_margin,
            huber_delta=cfg.window.huber_delta,
            chi2_threshold=cfg.window.chi2_threshold,
            max_iterations=cfg.window.max_lm_iterations,
            backend=cfg.solver.backend,
            dist_fn=self._dist_ba_fn,
        )
        i_last = self.n_kf_host - 1
        self.r_cur = self.win.kf_r[i_last]
        self.t_cur = self.win.kf_t[i_last]
        self.r_prev, self.t_prev = self.r_cur, self.t_cur
        self.initialized = True
        self.last_kf_index = i_last
        self.last_kf_fid = int(last["frame_id"])
        logged = self._log_window_poses()
        _, kf_r_h, kf_t_h = logged
        self.last_kf_capture = (kf_r_h[i_last], kf_t_h[i_last])
        nvp_h, c0_h, c1_h = hostsync.fetch_tree(
            (res.num_valid_points, ba_res.initial_cost, ba_res.final_cost)
        )
        log.info(
            "Init success: %d landmarks, BA cost %.2f -> %.2f",
            int(nvp_h), float(c0_h), float(c1_h),
        )

    # ------------------------------------------------------------------
    # VIO: window promotion + IMU initialization (Estimator.cpp:845-1019,
    # 1320-1399, 1436-1557)
    # ------------------------------------------------------------------

    def _backfill_bootstrap_poses(self, res: initializer.InitResult) -> None:
        """Refine the bootstrap window's INTERMEDIATE frame poses for
        export (VO mode): slerp/lerp between the two seeded keyframes
        (Estimator.cpp:900-917's interpolation), then per-frame PnP
        against the fresh landmarks. Results are anchored to the second
        keyframe via the relative-pose export mechanism, so later BA
        refinements of that keyframe re-derive them (Frame::GetTwb,
        Frame.cpp:44-72)."""
        cfg = self.cfg
        w, h = cfg.camera.width, cfg.camera.height
        snaps = self.snapshots
        if len(snaps) < 3:
            return
        r_n = np.asarray(res.r_wb2)
        t_n = np.asarray(res.t_wb2)
        t_first, t_last = snaps[0]["time"], snaps[-1]["time"]
        anchor_fid = int(snaps[-1]["frame_id"])
        for s in snaps[1:-1]:
            alpha = (s["time"] - t_first) / max(t_last - t_first, 1e-9)
            r_i, t_i = lie.interpolate_pose(
                jnp.eye(3), jnp.zeros(3), res.r_wb2, res.t_wb2, alpha
            )
            points, active, marg = _pnp_inputs(
                self.win, s["ids"], s["valid"], s["uv"],
                w, h, cfg.camera.boundary_margin,
            )
            pr = pnp_mod.solve_pnp(
                r_i, t_i, points, s["uv"], active, marg,
                self.r_cb, self.t_cb, w, h,
                rounds=cfg.window.pnp_rounds,
                max_iterations=cfg.window.max_lm_iterations,
                min_inliers=cfg.window.pnp_min_inliers,
                backend=cfg.solver.backend,
            )
            if bool(pr.success):
                r_i, t_i = pr.r_wb, pr.t_wb
            fid = int(s["frame_id"])
            if not (0 <= fid < len(self.trajectory)):
                continue
            r_np, t_np = np.asarray(r_i), np.asarray(t_i)
            self.trajectory[fid] = (float(s["time"]), r_np, t_np)
            self.traj_rel[fid] = (
                anchor_fid, r_n.T @ r_np, r_n.T @ (t_np - t_n)
            )

    def _promote_window_frames(self, res: initializer.InitResult):
        """Promote all bootstrap-window frames to keyframes: interpolate
        poses, refine each by PnP, wire per-pair preintegrations."""
        cfg = self.cfg
        w, h = cfg.camera.width, cfg.camera.height
        snaps = self.snapshots[-cfg.window.max_keyframes :]
        n = len(snaps)
        zeros = jnp.zeros(3)

        self.win = window.empty_window(
            cfg.window.max_keyframes, cfg.window.max_landmarks, self.capacity
        )
        promote_preints: list[pre.Preintegration] = []
        r0, t0v = jnp.eye(3), jnp.zeros(3)
        r_n, t_n = res.r_wb2, res.t_wb2
        t_first, t_last = snaps[0]["time"], snaps[-1]["time"]

        self.win = window.add_keyframe(
            self.win, r0, t0v, zeros, zeros, zeros,
            jnp.asarray(t_first, jnp.float32), jnp.asarray(snaps[0]["frame_id"]),
            snaps[0]["uv"], snaps[0]["ids"],
        )
        self.win = window.add_landmarks(
            self.win, res.points_w, res.point_valid, snaps[-1]["ids"], self.win.kf_id[0]
        )

        for i in range(1, n):
            s = snaps[i]
            if i == n - 1:
                r_i, t_i = r_n, t_n
            else:
                alpha = (s["time"] - t_first) / max(t_last - t_first, 1e-9)
                r_i, t_i = lie.interpolate_pose(r0, t0v, r_n, t_n, alpha)
                points, active, marg = _pnp_inputs(
                    self.win, s["ids"], s["valid"], s["uv"],
                    w, h, cfg.camera.boundary_margin,
                )
                pr = pnp_mod.solve_pnp(
                    r_i, t_i, points, s["uv"], active, marg, self.r_cb, self.t_cb, w, h,
                    rounds=cfg.window.pnp_rounds,
                    max_iterations=cfg.window.max_lm_iterations,
                    min_inliers=cfg.window.pnp_min_inliers,
                    backend=cfg.solver.backend,
                )
                if bool(pr.success):
                    r_i, t_i = pr.r_wb, pr.t_wb
            self.win = window.add_keyframe(
                self.win, r_i, t_i, zeros, zeros, zeros,
                jnp.asarray(s["time"], jnp.float32), jnp.asarray(s["frame_id"]),
                s["uv"], s["ids"],
            )
            promote_preints.append(
                self._preintegrate(s["imu"], self.bg, self.ba, cfg.imu.max_samples_per_frame)
            )
        self.n_kf_host = min(n, cfg.window.max_keyframes)
        self._set_preints(promote_preints)

        self.win, _ = window.window_ba(
            self.win, self.t_bc, w, h, cfg.camera.boundary_margin,
            huber_delta=cfg.window.huber_delta,
            chi2_threshold=cfg.window.chi2_threshold,
            max_iterations=cfg.window.max_lm_iterations,
            backend=cfg.solver.backend,
            dist_fn=self._dist_ba_fn,
        )
        i_last = self.n_kf_host - 1
        self.r_cur = self.win.kf_r[i_last]
        self.t_cur = self.win.kf_t[i_last]
        self.r_prev, self.t_prev = self.r_cur, self.t_cur
        self.imu_since_last_kf = []
        self.last_kf_fid = int(snaps[-1]["frame_id"])
        _, kf_r_h, kf_t_h = self._log_window_poses()
        self.last_kf_capture = (kf_r_h[i_last], kf_t_h[i_last])

    def _set_preints(self, pres: list) -> None:
        """Install a host list of per-pair preintegrations as the
        stacked device tree (one dispatch)."""
        n_max = self.cfg.window.max_keyframes - 1
        pres = list(pres[:n_max])
        self.n_pairs = len(pres)
        while len(pres) < n_max:
            pres.append(pre.identity_preintegration())
        self.preints = _stack_preints(pres)

    def _stacked_preints(self):
        """(stacked tree, [P] validity mask) — the stack is maintained
        on device; only the mask is derived (one dispatch)."""
        return self.preints, _pair_valid_mask(self.preints, self.n_pairs)

    def _try_initialize_imu(self) -> bool:
        cfg = self.cfg
        k = self.n_kf_host
        if k < 3 or self.n_pairs != k - 1:
            return False
        stacked, pair_valid = self._stacked_preints()
        res = imu_init_mod.solve_imu_init(
            self.win.kf_r, self.win.kf_t, stacked, pair_valid,
            gravity_magnitude=cfg.imu.gravity_magnitude,
        )
        # Split-half cross-validation of the gravity estimate: solve on
        # the window's first and second halves independently and demand
        # directional agreement. The stage-1 residual alone cannot
        # discriminate — a corrupted window can FIT well with a wrong
        # gravity (measured: blur-epoch inits reached 26° gravity error
        # at per-pair residuals under any usable threshold).
        n_pairs = max(self.n_pairs, 1)
        # Gravity from 1 preintegration pair is weakly determined, so on
        # minimal windows (either half < 2 pairs, i.e. n_pairs < 4) the
        # split gate would reject healthy inits on half-solver noise —
        # fall back to the per-pair-cost gate alone there and skip the
        # two half solves entirely (two fewer dispatches).
        use_split = (n_pairs // 2) >= 2
        if use_split:
            half = jnp.arange(cfg.window.max_keyframes - 1) < (n_pairs // 2)
            res_a = imu_init_mod.solve_imu_init(
                self.win.kf_r, self.win.kf_t, stacked, pair_valid & half,
                gravity_magnitude=cfg.imu.gravity_magnitude,
            )
            res_b = imu_init_mod.solve_imu_init(
                self.win.kf_r, self.win.kf_t, stacked, pair_valid & ~half,
                gravity_magnitude=cfg.imu.gravity_magnitude,
            )
            (ok_h, cost1_h, scale_h, g_h, bg_h, ok_a, ok_b, g_a, g_b
             ) = hostsync.fetch_tree(
                (res.success, res.stage1_cost, res.scale, res.gravity_w,
                 res.bg, res_a.success, res_b.success, res_a.gravity_w,
                 res_b.gravity_w)
            )
        else:
            ok_h, cost1_h, scale_h, g_h, bg_h = hostsync.fetch_tree(
                (res.success, res.stage1_cost, res.scale, res.gravity_w,
                 res.bg)
            )
            ok_a = ok_b = False
        # Quality gates (new vs the reference's unconditional one-shot
        # init, Optimizer.cpp:972-1257): (a) gross stage-1 residual —
        # a corrupted visual window; (b) split-half gravity agreement —
        # overfit/unobservable gravity. Reject and retry at the next
        # keyframe (_create_keyframe) on fresher window data.
        per_pair = float(cost1_h) / n_pairs
        split_deg = np.inf if use_split else 0.0
        if bool(ok_a) and bool(ok_b):
            ca = float(
                np.dot(g_a, g_b) / max(np.linalg.norm(g_a) * np.linalg.norm(g_b), 1e-9)
            )
            split_deg = float(np.degrees(np.arccos(np.clip(ca, -1.0, 1.0))))
        if (
            not bool(ok_h)
            or per_pair > cfg.imu.init_max_cost_per_pair
            or split_deg > cfg.imu.init_max_gravity_split_deg
        ):
            log.info(
                "IMU init rejected (cost1=%.3g/pair %.3g, gravity split %.1f deg)",
                float(cost1_h), per_pair, split_deg,
            )
            return False
        r_wg = imu_init_mod.gravity_dir_to_rotation(res.gravity_dir)
        self._transform_history(r_wg, scale_h)
        kf_r2, kf_t2, vel2, pts2 = imu_init_mod.align_gravity_and_scale(
            self.win.kf_r, self.win.kf_t, res.velocities, self.win.lm_pos,
            r_wg, res.scale,
        )
        kf_ok = self.win.kf_id >= 0
        self.win = dataclasses.replace(
            self.win,
            kf_r=jnp.where(kf_ok[:, None, None], kf_r2, self.win.kf_r),
            kf_t=jnp.where(kf_ok[:, None], kf_t2, self.win.kf_t),
            kf_vel=jnp.where(kf_ok[:, None], vel2, self.win.kf_vel),
            lm_pos=jnp.where(self.win.lm_alive[:, None], pts2, self.win.lm_pos),
        )
        self.bg = res.bg
        self.ba = res.ba
        self.gravity_w = jnp.array([0.0, 0.0, -cfg.imu.gravity_magnitude])
        self.preints = _update_bias_all(self.preints, self.bg, self.ba)
        i_last = self.n_kf_host - 1
        self.r_cur = self.win.kf_r[i_last]
        self.t_cur = self.win.kf_t[i_last]
        self.r_prev, self.t_prev = self.r_cur, self.t_cur
        self.vel_cur = self.win.kf_vel[i_last]
        self.imu_initialized = True
        _, kf_r_h, kf_t_h = self._log_window_poses()
        if self.last_kf_capture is not None:
            self.last_kf_capture = (kf_r_h[i_last], kf_t_h[i_last])
        log.info(
            "IMU init: scale=%.4f g=(%.2f,%.2f,%.2f) bg=%s",
            float(scale_h), *[float(x) for x in g_h],
            np.round(bg_h, 4),
        )
        return True

    # ------------------------------------------------------------------

    def _tracking_step(self, image_np, timestamp) -> FrameResult:
        """Steady-state frame, synchronous form: one packed upload +
        one fused dispatch + one scalar-bundle read (fused.tracking_step
        — prediction, LK, RANSAC, landmark join, PnP, relabel, keyframe
        decision all on device). Shares the dispatch/resolve machinery
        with the pipelined path (process_frame_async), resolving
        immediately instead of one frame later."""
        cur = self._dispatch_tracking(image_np, timestamp, self.last_imu_rows)
        self._pending_q.append(cur)
        return self._resolve_queue()[0]

    # ------------------------------------------------------------------
    # Software-pipelined frame loop (VERDICT r4 item 1).
    #
    # The relay processes queued async ops in the BACKGROUND (measured:
    # a fetch after 200 ms of host delay costs ~29 ms vs ~97 ms
    # immediately — tools/profile_pipeline.py), so deferring frame N's
    # scalar-bundle fetch until after frame N+1's upload+dispatch hides
    # the upload+execute relay legs behind the previous fetch. Only the
    # keyframe decision needs the bundle, and it tolerates one frame of
    # latency: frame N+1 is dispatched SPECULATIVELY on the post-N
    # state; if N turns out to be a keyframe, the state is rewound to
    # the stashed post-N handles (device arrays are immutable — the
    # rewind is free), the keyframe event runs, and N+1 re-dispatches
    # from the refined state, making the pipelined trajectory EXACTLY
    # equal to the sequential one (tests/test_pipelined.py).
    # Counterpart of the reference's synchronous loop
    # (app/main.cpp:178-223), which has no pipelining of any kind.
    # ------------------------------------------------------------------

    _PIPE_SNAP = (
        "track", "win", "preints", "key", "img_prev",
        "r_cur", "t_cur", "r_prev", "t_prev", "vel_cur", "bg", "ba",
        "kf_rows_dev", "kf_count_dev", "n_pairs_dev", "refine_count_dev",
        "loop_db_dev", "loop_seq_dev", "rec_ring_dev",
    )

    def process_frame_async(self, image, timestamp, imu=None) -> list:
        """Pipelined ``process_frame``: returns the FrameResults that
        became available (possibly none this call; at most two around
        mode transitions). Call ``flush()`` after the last frame."""
        if self.img_prev is None or not self.initialized:
            out = self.flush()
            out.append(self.process_frame(image, timestamp, imu))
            return out

        self.frame_id += 1
        imu_rows = (
            np.asarray(imu, np.float64).reshape(-1, 7)
            if imu is not None and len(imu)
            else np.zeros((0, 7))
        )
        if self._pending_q:
            # state as of the previous dispatch — the rewind point if
            # that frame turns out to need a host-applied state change
            self._pending_q[-1]["post_state"] = self._pipe_snapshot()
        if len(imu_rows):
            self.imu_since_last_kf.append(imu_rows)
            self.has_imu_stream = True
        self.last_imu_rows = imu_rows
        self.last_timestamp = timestamp

        k_batch = max(self.cfg.solver.frames_per_dispatch, 1)
        if k_batch > 1 and self._use_mega():
            # K-frame scanned dispatch: stage the packed host buffer;
            # ONE stacked upload + ONE scanned program + ONE stacked
            # record fetch cover the whole batch
            # (fused.make_multi_mega_step).
            cfg = self.cfg
            cur = {
                "fid": self.frame_id, "ts": timestamp,
                "buf_host": fused.pack_frame_input(
                    np.asarray(image, np.float32), timestamp, imu_rows,
                    cfg.imu.max_samples_per_frame, cfg.camera.width,
                    frame_id=self.frame_id,
                    transport=cfg.solver.image_transport,
                ),
                "imu_rows": imu_rows,
                "imu_mirror_end": len(self.imu_since_last_kf),
            }
            self._stage_q.append(cur)
            if len(self._stage_q) >= k_batch:
                self._dispatch_batch()
                return self._resolve_queue()
            return []

        if self._stage_q:
            # mode changed under a partial batch: dispatch it singly
            # before this frame so ordering holds
            self._flush_stage()
        cur = self._dispatch_tracking(
            np.asarray(image, np.float32), timestamp, imu_rows
        )
        self._pending_q.append(cur)
        # Resolve when the record ring is full (ONE fetch covers the
        # whole queue) or when a frame took a non-mega path (its
        # resolution may apply host-side keyframe/transition logic).
        k = max(self.cfg.solver.fetch_every, 1)
        if not cur.get("mega") or len(self._pending_q) >= k:
            return self._resolve_queue()
        return []

    def flush(self) -> list:
        """Resolve every in-flight (staged or pipelined) frame."""
        self._flush_stage()
        return self._resolve_queue()

    def _flush_stage(self) -> None:
        """Dispatch any staged-but-unbatched frames singly (the single
        megastep program — partial batches would compile one scanned
        program per distinct length)."""
        staged, self._stage_q = self._stage_q, []
        for e in staged:
            if self._pending_q:
                self._pending_q[-1].setdefault(
                    "post_state", self._pipe_snapshot()
                )
            self.last_imu_rows = e["imu_rows"]
            self._dispatch_from_buf(e)
            self._pending_q.append(e)

    def _dispatch_batch(self) -> None:
        """Dispatch the staged frames as ONE scanned program over ONE
        stacked upload (fused.make_multi_mega_step). Row 0 of the stack
        is the previous frame's buffer, so consecutive batches chain
        without a device-resident image handle."""
        staged, self._stage_q = self._stage_q, []
        if not staged:
            return
        cfg = self.cfg
        use_imu = self.imu_initialized
        if not self._mega_active:
            # every staged frame's IMU chunk re-enters from its buffer
            n_excl = sum(1 for e in staged if len(e["imu_rows"]))
            self._sync_mega_state(n_excl)
            self._mega_active = True
        if self._pending_q:
            self._pending_q[-1].setdefault(
                "post_state", self._pipe_snapshot()
            )
        snap = self._pipe_snapshot()  # pre-batch rewind point
        k = len(staged)
        mkey = (use_imu, k)
        if self._multi_fn is None or self._multi_key != mkey:
            self._multi_fn = fused.make_multi_mega_step(
                cfg, use_imu, k, self._dist_ba_fn, self._dist_viba_fn
            )
            self._multi_key = mkey
        bufs = np.stack(
            [self._last_buf_host] + [e["buf_host"] for e in staged]
        )
        dev = jax.device_put(bufs)
        (self.track, self.win, self.preints, self.kf_rows_dev,
         self.kf_count_dev, self.n_pairs_dev, self.refine_count_dev,
         self.loop_db_dev, self.loop_seq_dev, self.key, self.r_cur,
         self.t_cur, self.r_prev, self.t_prev, self.vel_cur, self.bg,
         self.ba, records) = self._multi_fn(
            self.track, self.win, self.preints, self.kf_rows_dev,
            self.kf_count_dev, self.n_pairs_dev, self.refine_count_dev,
            self.loop_db_dev, self.loop_seq_dev, dev, self.key,
            self.r_cur, self.t_cur, self.r_prev, self.t_prev,
            self.vel_cur, self.bg, self.ba, self.gravity_w, self.t_bc,
            self.r_bc, self.r_cb, self.t_cb,
        )
        if self.loop_closer is not None:
            self.loop_closer.db = self.loop_db_dev
        self.img_prev = staged[-1]["buf_host"]  # np; uploaded on demand
        self._last_buf_host = staged[-1]["buf_host"]
        for i, e in enumerate(staged):
            e["mega"] = True
            e["batch"] = True
            e["use_imu"] = use_imu
            e["batch_records"] = records
            e["batch_index"] = i
            e["batch_snap"] = snap
            e["batch_prefix"] = staged[:i + 1]
            self._pending_q.append(e)

    def _resolve_queue(self) -> list:
        """Resolve the pending queue oldest-first. Mega entries share
        ONE record-ring fetch; an entry that applies a host-side state
        change (staged keyframe, loop correction, relocalization)
        rewinds and re-dispatches every LATER entry, whose (now stale)
        records then wait for the next fetch."""
        q = self._pending_q
        if not q:
            return []
        q[-1].setdefault("post_state", self._pipe_snapshot())
        ring_host = None
        results = []
        while q:
            prev = q[0]
            rest = q[1:]
            if prev.get("mega") and "record_host" not in prev:
                if "batch_records" in prev:
                    # ONE stacked fetch resolves the whole batch; the
                    # qstate tail (loop-query state) is split off here
                    rh = prev.get("batch_records_host")
                    if rh is None:
                        with self._stage("tracking_step"):
                            rh = np.asarray(prev["batch_records"])
                        for e in q:
                            if e.get("batch_records") is prev["batch_records"]:
                                e["batch_records_host"] = rh
                    rec_total = 20 + fused.kf_record_len(
                        self.cfg.window.max_keyframes
                    )
                    row = rh[prev["batch_index"]]
                    prev["record_host"] = row[:rec_total]
                    prev["qstate_host"] = row[rec_total:]
                else:
                    if ring_host is None:
                        with self._stage("tracking_step"):
                            ring_host = np.asarray(self.rec_ring_dev)
                    k = ring_host.shape[0]
                    prev["record_host"] = ring_host[prev["fid"] % k]
            results.append(self._resolve_pending(prev, rest))
            q.pop(0)
            if rest and rest[0].pop("redispatched", False):
                # later entries were re-run from a corrected state;
                # their ring records are stale — resolve them at the
                # next fetch
                break
        return results

    def _pipe_snapshot(self) -> dict:
        snap = {k: getattr(self, k) for k in self._PIPE_SNAP}
        snap["imu_since_last_kf"] = list(self.imu_since_last_kf)
        snap["last_imu_rows"] = self.last_imu_rows
        return snap

    def _pipe_restore(self, snap: dict) -> None:
        for k in self._PIPE_SNAP:
            setattr(self, k, snap[k])
        self.imu_since_last_kf = list(snap["imu_since_last_kf"])
        self.last_imu_rows = snap["last_imu_rows"]
        if self.loop_closer is not None:
            self.loop_closer.db = self.loop_db_dev

    def _restore_post_state(self, prev: dict) -> None:
        """Rewind the live state to 'just after frame ``prev`` ran'.
        Single-dispatch entries stashed that snapshot when their
        successor dispatched; a batch entry (K-frame scanned dispatch)
        has no per-frame snapshot — rewind to the pre-batch state and
        replay the batch's frames up to this one through the
        single-frame megastep (rare path: accepted loop corrections
        and relocalization only)."""
        ps = prev.get("post_state")
        if ps is not None:
            self._pipe_restore(ps)
            return
        self._pipe_restore(prev["batch_snap"])
        for e in prev["batch_prefix"]:
            if len(e["imu_rows"]):
                self.imu_since_last_kf.append(e["imu_rows"])
            e["imu_mirror_end"] = len(self.imu_since_last_kf)
            self.last_imu_rows = e["imu_rows"]
            self._dispatch_from_buf(e)
        prev["post_state"] = self._pipe_snapshot()

    def _dispatch_tracking(self, image_np, timestamp, imu_rows) -> dict:
        """Upload + dispatch one steady-state frame (no sync)."""
        cfg = self.cfg
        buf_np = fused.pack_frame_input(
            image_np, timestamp, imu_rows,
            cfg.imu.max_samples_per_frame, cfg.camera.width,
            frame_id=self.frame_id,
            transport=cfg.solver.image_transport,
        )
        buf = jax.device_put(buf_np)
        self._last_buf_host = buf_np
        cur = {
            "fid": self.frame_id, "ts": timestamp, "buf": buf,
            "buf_host": buf_np,
            "imu_rows": imu_rows,
            # mirror watermark: entries at index >= this were appended
            # AFTER this frame (pipelined successor) — the mega keyframe
            # resolve keeps exactly those (device accumulator is
            # authoritative; the host list is a mirror for transitions
            # and checkpoints)
            "imu_mirror_end": len(self.imu_since_last_kf),
        }
        self._dispatch_from_buf(cur)
        return cur

    def _use_mega(self) -> bool:
        scfg = self.cfg.solver
        return (
            scfg.megastep and scfg.fused_keyframe and self.initialized
            and self.imu_initialized == self.has_imu_stream
        )

    def _sync_mega_state(self, exclude_chunks: int) -> None:
        """Host -> device sync of the keyframe-policy state when
        entering megastep mode (one small upload; happens once per
        mode transition). ``exclude_chunks`` drops the LAST that many
        just-appended row chunks (the current frame's — or, entering
        via a batch dispatch, every staged frame's): the mega program
        re-appends them from the frame buffers, and syncing them too
        would preintegrate the interval twice (measured: 10x VIBA cost
        on the first mega keyframe)."""
        cap = self.cfg.imu.max_samples_per_keyframe
        chunks = (
            self.imu_since_last_kf[:-exclude_chunks]
            if exclude_chunks else self.imu_since_last_kf
        )
        rows = (
            np.concatenate(chunks) if chunks else np.zeros((0, 7))
        )
        buf = np.zeros((cap, 7), np.float32)
        n = min(len(rows), cap)
        if n:
            buf[:n] = rows[-n:]
        self.kf_rows_dev = jax.device_put(buf)
        self.kf_count_dev = jnp.asarray(n, jnp.int32)
        self.n_pairs_dev = jnp.asarray(self.n_pairs, jnp.int32)
        self.refine_count_dev = jnp.asarray(
            self.scale_refine_count, jnp.int32
        )
        if self.loop_closer is not None:
            self.loop_db_dev = self.loop_closer.db
            self.loop_seq_dev = jnp.asarray(
                self.loop_closer.seq, jnp.int32
            )

    def _dispatch_from_buf(self, cur: dict) -> None:
        """Dispatch the frame program on ``cur['buf']`` against the
        CURRENT state (used both for the speculative dispatch and the
        post-keyframe/post-correction re-dispatch). Megastep mode runs
        tracking + conditional keyframe as ONE program."""
        cfg = self.cfg
        use_imu = self.imu_initialized
        if cur.get("buf") is None:
            # batch-dispatched entry being re-run singly: its image
            # rode the stacked upload; re-upload from the host buffer
            cur["buf"] = jax.device_put(cur["buf_host"])
        if cur.get("buf_host") is not None:
            self._last_buf_host = cur["buf_host"]
        if self._use_mega():
            if not self._mega_active:
                self._sync_mega_state(1 if len(cur["imu_rows"]) else 0)
                self._mega_active = True
            if self._mega_fn is None or self._mega_use_imu != use_imu:
                self._mega_fn = fused.make_mega_step(
                    cfg, use_imu, self._dist_ba_fn, self._dist_viba_fn
                )
                self._mega_use_imu = use_imu
            (self.track, self.win, self.preints, self.kf_rows_dev,
             self.kf_count_dev, self.n_pairs_dev, self.refine_count_dev,
             self.loop_db_dev, self.loop_seq_dev, self.rec_ring_dev,
             self.key, r_new, t_new, v_new, self.bg,
             self.ba) = self._mega_fn(
                self.track, self.win, self.preints, self.kf_rows_dev,
                self.kf_count_dev, self.n_pairs_dev,
                self.refine_count_dev, self.loop_db_dev,
                self.loop_seq_dev, self.rec_ring_dev, self.img_prev,
                cur["buf"], self.key, self.r_cur, self.t_cur,
                self.r_prev, self.t_prev, self.vel_cur, self.bg,
                self.ba, self.gravity_w, self.t_bc, self.r_bc,
                self.r_cb, self.t_cb,
            )
            if self.loop_closer is not None:
                self.loop_closer.db = self.loop_db_dev
            self.img_prev = cur["buf"]
            self.r_prev, self.t_prev = self.r_cur, self.t_cur
            self.r_cur, self.t_cur = r_new, t_new
            self.vel_cur = v_new
            cur["mega"] = True
            cur["use_imu"] = use_imu
            return
        self._mega_active = False
        cur["use_imu"] = use_imu
        (self.track, self.key, r_new, t_new, v_new,
         bundle) = fused.tracking_step(
            self.track, self.win, self.img_prev, cur["buf"], self.key,
            self.r_cur, self.t_cur, self.r_prev, self.t_prev,
            self.vel_cur, self.bg, self.ba, self.gravity_w,
            self.r_bc, self.r_cb, self.t_cb, cfg, use_imu,
        )
        self.img_prev = cur["buf"]
        self.r_prev, self.t_prev = self.r_cur, self.t_cur
        self.r_cur, self.t_cur = r_new, t_new
        self.vel_cur = v_new
        cur["bundle"] = bundle

    def _redispatch(self, rest) -> None:
        """Re-run every later in-flight frame from the (changed)
        current state, in order, re-stamping their rewind points and
        IMU-mirror watermarks; marks them so _resolve_queue defers
        their (stale) records to the next fetch."""
        if not rest:
            return
        entries = rest if isinstance(rest, list) else [rest]
        for j, entry in enumerate(entries):
            if len(entry["imu_rows"]):
                self.imu_since_last_kf.append(entry["imu_rows"])
            entry["imu_mirror_end"] = len(self.imu_since_last_kf)
            self.last_imu_rows = entry["imu_rows"]
            self._dispatch_from_buf(entry)
            entry.pop("record_host", None)
            # a re-run batch entry is a single-dispatch entry now: its
            # stacked records are stale — resolve it from the ring
            for k2 in ("batch", "batch_records", "batch_records_host",
                       "qstate_host", "batch_snap", "batch_prefix",
                       "batch_index"):
                entry.pop(k2, None)
            if j + 1 < len(entries):
                entry["post_state"] = self._pipe_snapshot()
        entries[0]["redispatched"] = True

    def _resolve_pending(self, prev: dict, cur) -> FrameResult:
        """Fetch frame N's bundle; on a keyframe, rewind to the post-N
        state, run the keyframe event, and re-dispatch frame N+1."""
        mega = prev.get("mega", False)
        if "record_host" in prev:
            full = prev["record_host"]
        else:
            with self._stage("tracking_step"):
                full = np.asarray(prev["bundle"])
        b = fused.unpack_bundle(full[:20] if mega else full)
        fid, ts = prev["fid"], prev["ts"]
        pnp_ok, is_kf = b["success"], b["is_kf"]
        r_np, t_np = b["r"], b["t"]
        diag = {
            "pnp_cost": float(b["pnp_cost"]),
            "parallax": float(b["parallax"]),
            "n_shared": int(b["n_shared"]),
            "n_active": int(b["n_active"]),
        }
        state = "tracking" if pnp_ok else "tracking_lost"
        if is_kf and mega:
            # the keyframe event already ran IN-GRAPH (make_mega_step);
            # only host mirrors + the loop-closure query remain. No
            # rewind: the speculative next-frame dispatch is valid.
            rec = fused.unpack_kf_record(
                full[20:], self.cfg.window.max_keyframes
            )
            r_np, t_np = self._apply_mega_kf_host(rec, prev, cur, diag)
            self.lost_streak = 0
            self._record(ts, r_np, t_np)
        elif is_kf:
            self._pipe_restore(prev["post_state"])
            outer_fid = self.frame_id
            self.frame_id = fid
            try:
                r_np, t_np = self._create_keyframe(ts, diag)
                if self.loop_closer is not None:
                    r_np, t_np = self._loop_on_keyframe(diag, r_np, t_np)
            finally:
                self.frame_id = outer_fid
            self.lost_streak = 0
            self._record(ts, r_np, t_np)
            # sequential semantics: later frames' IMU rows re-enter the
            # accumulator the keyframe event just consumed, and each
            # later frame re-runs from the refined post-KF state.
            self._redispatch(cur)
        else:
            if pnp_ok:
                self.lost_streak = 0
            else:
                self.lost_streak += 1
                if (
                    self.loop_closer is not None
                    and self.lost_streak >= self.cfg.loop.reloc_after
                    and self.loop_closer.n_entries > 0
                ):
                    # relocalization changes device state -> rewind to
                    # the post-N handles (like the keyframe path) so
                    # the speculative N+1 can re-run afterwards
                    self._restore_post_state(prev)
                    got = self._try_relocalize(diag)
                    if got is not None:
                        r_np, t_np = got
                        state = "relocalized"
                        self.lost_streak = 0
                    self._redispatch(cur)
            self._record(ts, r_np, t_np)
        return FrameResult(
            frame_id=fid,
            timestamp=ts,
            state=state,
            r_wb=np.asarray(r_np),
            t_wb=np.asarray(t_np),
            is_keyframe=is_kf,
            n_tracked=int(b["n_tracked"]),
            n_pnp_inliers=int(b["n_inliers"]),
            diag=diag,
        )

    def _create_keyframe(self, timestamp, diag):
        cfg = self.cfg
        # The fused single-dispatch event covers the two steady modes
        # (VO, VIO); the VO->VIO transition (IMU-init retry pending)
        # stays on the staged path below.
        if cfg.solver.fused_keyframe and (
            self.imu_initialized == self.has_imu_stream
        ):
            return self._create_keyframe_fused(timestamp, diag)
        zeros = jnp.zeros(3)
        ids = jnp.where(self.track.valid, self.track.ids, -1)
        was_full = self.n_kf_host == cfg.window.max_keyframes
        if was_full and cfg.pose_graph.enabled:
            self._record_pose_graph_eviction()
        self.win = window.add_keyframe(
            self.win, self.r_cur, self.t_cur, self.vel_cur, self.bg, self.ba,
            jnp.asarray(timestamp, jnp.float32), jnp.asarray(self.frame_id),
            self.track.uv, ids,
        )
        self.n_kf_host = min(self.n_kf_host + 1, cfg.window.max_keyframes)
        if self.imu_initialized or self.has_imu_stream:
            # KF-to-KF preintegration from the accumulated samples
            # (Estimator.cpp:645-669). Also maintained while IMU init is
            # pending (rejected by the quality gate) so a later retry
            # has the full window's preintegrations.
            rows = (
                np.concatenate(self.imu_since_last_kf)
                if self.imu_since_last_kf
                else np.zeros((0, 7))
            )
            newp = self._preintegrate(
                rows, self.bg, self.ba, cfg.imu.max_samples_per_keyframe
            )
            n_max = cfg.window.max_keyframes - 1
            evict = self.n_pairs == n_max
            idx = np.int32(n_max - 1 if evict else self.n_pairs)
            self.preints = _append_preint(self.preints, newp, idx, np.bool_(evict))
            self.n_pairs = min(self.n_pairs + 1, n_max)
        self.imu_since_last_kf = []

        # BA first, then triangulate new landmarks from the REFINED poses
        # (deviation from the reference's triangulate->BA order,
        # Estimator.cpp:756-789: measured to cut trajectory error ~2.5x in
        # high-keyframe-rate regimes because fresh landmarks no longer
        # inherit the pre-BA drifted pose).
        if self.imu_initialized:
            with self._stage("viba"):
                stacked, pair_valid = self._stacked_preints()
                self.win, vres = window.window_viba(
                    self.win, self.t_bc, stacked, pair_valid, self.gravity_w,
                    self.bg, self.ba, cfg.camera.width, cfg.camera.height,
                    cfg.camera.boundary_margin,
                    huber_delta=cfg.window.huber_delta,
                    chi2_threshold=cfg.window.chi2_threshold,
                    max_iterations=cfg.window.viba_max_iterations,
                    inertial_weight=cfg.window.viba_inertial_weight,
                    bg_prior_weight=cfg.window.viba_bg_prior_weight,
                    ba_prior_weight=cfg.window.viba_ba_prior_weight,
                    dist_fn=self._dist_viba_fn,
                )
            new_bg, new_ba = vres.bg, vres.ba
            self.preints = _update_bias_all(self.preints, new_bg, new_ba)
            self.bg, self.ba = new_bg, new_ba
            cost_dev, inl_dev = vres.final_cost, vres.num_inliers
            solver_res = vres
            self._refine_scale_gravity(diag)
            i_last = self.n_kf_host - 1
            self.vel_cur = self.win.kf_vel[i_last]
        else:
            with self._stage("ba"):
                self.win, ba_res = window.window_ba(
                    self.win, self.t_bc, cfg.camera.width, cfg.camera.height,
                    cfg.camera.boundary_margin,
                    huber_delta=cfg.window.huber_delta,
                    chi2_threshold=cfg.window.chi2_threshold,
                    max_iterations=cfg.window.max_lm_iterations,
                    backend=cfg.solver.backend,
                    dist_fn=self._dist_ba_fn,
                )
            cost_dev, inl_dev = ba_res.final_cost, ba_res.num_inliers
            solver_res = ba_res
            if self.has_imu_stream and self.n_pairs == self.n_kf_host - 1:
                # IMU init was rejected by the quality gate at bootstrap
                # — retry on the fresh (BA-refined) window until a clean
                # epoch passes the gate.
                if self._try_initialize_imu():
                    diag["imu_initialized"] = True
        # Feed the BA bad-marking back into the tracker before
        # triangulating: re-id the bad landmark's track so it can't
        # immediately re-seed from the same corrupted snapshots
        # (Optimizer.cpp:446-456 SetBad + Estimator.cpp:1159,1192).
        new_bad = solver_res.new_bad
        self.track = _relabel_tracks(
            self.track,
            _bad_landmark_slots(
                self.track, self.win.lm_slot, self.win.lm_feat_id, new_bad
            ),
        )
        with self._stage("triangulation"):
            self.win, n_new, n_dropped = window.triangulate_new_landmarks(
                self.win, self.t_bc, cfg.camera.width, cfg.camera.height,
                live_ids=self.track.ids,
            )
        i_last = self.n_kf_host - 1
        self.r_cur = self.win.kf_r[i_last]
        self.t_cur = self.win.kf_t[i_last]
        self.last_kf_fid = self.frame_id
        # ONE packed device->host transfer for the whole keyframe event:
        # solver scalars + landmark stats + the refined window poses for
        # the export log (each separate int()/float()/device_get here
        # previously cost a full relay round trip — ~12 per keyframe,
        # the dominant end-to-end pipeline cost; utils/hostsync.py).
        n = self.n_kf_host
        scal, kf_id_h, kf_r_h, kf_t_h = hostsync.fetch_tree((
            (cost_dev, inl_dev, n_new, n_dropped,
             jnp.sum(self.win.lm_alive),
             jnp.sum(self.win.lm_marg & self.win.lm_alive)),
            self.win.kf_id[:n], self.win.kf_r[:n], self.win.kf_t[:n],
        ))
        for i in range(n):
            fid = int(kf_id_h[i])
            if fid >= 0:
                self.kf_pose_log[fid] = (kf_r_h[i], kf_t_h[i])
        self.last_kf_capture = (kf_r_h[i_last], kf_t_h[i_last])
        self._last_kf_window_host = (kf_id_h, kf_r_h, kf_t_h)
        if int(scal[3]):
            log.warning(
                "landmark slots saturated: dropped %d new landmarks "
                "(capacity %d)", int(scal[3]), self.win.max_lm,
            )
        diag.update(
            n_new_landmarks=int(scal[2]),
            n_lm_dropped=int(scal[3]),
            n_lm_alive=int(scal[4]),
            n_lm_marginalized=int(scal[5]),
            ba_cost=float(scal[0]),
            ba_inliers=int(scal[1]),
        )
        return kf_r_h[i_last], kf_t_h[i_last]

    def _create_keyframe_fused(self, timestamp, diag):
        """The keyframe event as ONE dispatch + ONE record fetch
        (fused.make_keyframe_step). Host work is bookkeeping on the
        unpacked record: counters, pose log, pose-graph edges, and the
        history transform when a scale/gravity refine applied."""
        cfg = self.cfg
        use_imu = self.imu_initialized
        if self._kf_step_fn is None or self._kf_step_use_imu != use_imu:
            self._kf_step_fn = fused.make_keyframe_step(
                cfg, use_imu, self._dist_ba_fn, self._dist_viba_fn
            )
            self._kf_step_use_imu = use_imu

        max_kf = cfg.window.max_keyframes
        was_full = self.n_kf_host == max_kf
        n_kf_after = min(self.n_kf_host + 1, max_kf)
        pairs_after = min(self.n_pairs + 1, max_kf - 1) if use_imu else self.n_pairs
        do_refine = (
            use_imu
            and self.scale_refine_count < cfg.window.max_scale_refines
            and n_kf_after >= 3
            and pairs_after == n_kf_after - 1
        )
        rows = (
            np.concatenate(self.imu_since_last_kf)
            if self.imu_since_last_kf
            else np.zeros((0, 7))
        )
        aux = jax.device_put(fused.pack_kf_input(
            timestamp, self.frame_id, self.n_pairs, was_full, do_refine,
            rows if use_imu else None, cfg.imu.max_samples_per_keyframe,
        ))

        with self._stage("keyframe_step"):
            (self.track, self.win, self.preints, self.bg, self.ba,
             self.r_cur, self.t_cur, self.vel_cur, record) = self._kf_step_fn(
                self.track, self.win, self.preints, aux,
                self.r_cur, self.t_cur, self.vel_cur, self.bg, self.ba,
                self.gravity_w, self.t_bc, self.r_cb, self.t_cb,
            )
            rec = fused.unpack_kf_record(np.asarray(record), max_kf)

        self.n_kf_host = n_kf_after
        if use_imu:
            self.n_pairs = pairs_after
        self.imu_since_last_kf = []
        i_last = self.n_kf_host - 1

        # eviction capture -> pose-graph edges (host half; captured in
        # the PRE-refine world frame, like everything else in history)
        if was_full and cfg.pose_graph.enabled:
            self._append_pg_edges_host(
                rec["cap_kf_id"], rec["cap_kf_r"], rec["cap_kf_t"],
                rec["cap_vel0"],
                rec["pair_w"] if cfg.pose_graph.cov_weighted else None,
                rec["imu_edge"] if use_imu else None,
            )
        # scale/gravity refine applied in-graph -> transform the host
        # history FIRST (trajectory, pose log, edges — all still in the
        # old frame); the record's window poses below are already
        # aligned and must not be transformed again.
        if rec["refine_applied"]:
            self.scale_refine_count += 1
            diag["scale_refine"] = rec["refine_s"]
            # r_cur/t_cur/vel_cur came out of the kernel ALREADY aligned
            # — _transform_history must not transform them again
            # (r_prev/t_prev are old-frame and must be).
            cur = (self.r_cur, self.t_cur, self.vel_cur)
            self._transform_history(
                rec["r_wg"], rec["refine_s"], t_anchor=rec["t_anchor"]
            )
            self.r_cur, self.t_cur, self.vel_cur = cur
        # refined (and possibly aligned) window poses -> export log
        for i in range(self.n_kf_host):
            fid = int(rec["kf_id"][i])
            if fid >= 0:
                self.kf_pose_log[fid] = (rec["kf_r"][i], rec["kf_t"][i])
        self.last_kf_fid = self.frame_id
        self.last_kf_capture = (rec["kf_r"][i_last], rec["kf_t"][i_last])
        self._last_kf_window_host = (rec["kf_id"], rec["kf_r"], rec["kf_t"])
        if rec["n_dropped"]:
            log.warning(
                "landmark slots saturated: dropped %d new landmarks "
                "(capacity %d)", rec["n_dropped"], self.win.max_lm,
            )
        diag.update(
            n_new_landmarks=rec["n_new"],
            n_lm_dropped=rec["n_dropped"],
            n_lm_alive=rec["n_lm_alive"],
            n_lm_marginalized=rec["n_lm_marg"],
            ba_cost=rec["ba_cost"],
            ba_inliers=rec["ba_inliers"],
        )
        return rec["kf_r"][i_last], rec["kf_t"][i_last]

    def _apply_mega_kf_host(self, rec, prev, cur, diag):
        """Host mirror updates for a keyframe that ran IN-GRAPH
        (fused.make_mega_step): counters, IMU-mirror trim, pose-graph
        eviction edges, history transform when the in-graph refine
        applied, export pose log, and the loop-closure query. Mirrors
        _create_keyframe_fused's post-record section — the device state
        is already final."""
        cfg = self.cfg
        use_imu = prev.get("use_imu", self.imu_initialized)
        max_kf = cfg.window.max_keyframes
        was_full = self.n_kf_host == max_kf
        self.n_kf_host = min(self.n_kf_host + 1, max_kf)
        if use_imu:
            self.n_pairs = min(self.n_pairs + 1, max_kf - 1)
        # device accumulator is authoritative; trim the host mirror to
        # the rows appended AFTER this frame (pipelined successor)
        mirror_after = list(self.imu_since_last_kf[prev["imu_mirror_end"]:])
        self.imu_since_last_kf = list(mirror_after)
        prev["mirror_after"] = mirror_after
        i_last = self.n_kf_host - 1

        if was_full and cfg.pose_graph.enabled:
            self._append_pg_edges_host(
                rec["cap_kf_id"], rec["cap_kf_r"], rec["cap_kf_t"],
                rec["cap_vel0"],
                rec["pair_w"] if cfg.pose_graph.cov_weighted else None,
                rec["imu_edge"] if use_imu else None,
            )
        if rec["refine_applied"]:
            self.scale_refine_count += 1
            diag["scale_refine"] = rec["refine_s"]
            # every live device handle already derives from the
            # in-graph-aligned state — transform host history only
            kept = (self.r_cur, self.t_cur, self.r_prev, self.t_prev,
                    self.vel_cur)
            self._transform_history(
                rec["r_wg"], rec["refine_s"], t_anchor=rec["t_anchor"]
            )
            (self.r_cur, self.t_cur, self.r_prev, self.t_prev,
             self.vel_cur) = kept
        for i in range(self.n_kf_host):
            f = int(rec["kf_id"][i])
            if f >= 0:
                self.kf_pose_log[f] = (rec["kf_r"][i], rec["kf_t"][i])
        self.last_kf_fid = prev["fid"]
        self.last_kf_capture = (rec["kf_r"][i_last], rec["kf_t"][i_last])
        self._last_kf_window_host = (rec["kf_id"], rec["kf_r"], rec["kf_t"])
        if rec["n_dropped"]:
            log.warning(
                "landmark slots saturated: dropped %d new landmarks "
                "(capacity %d)", rec["n_dropped"], self.win.max_lm,
            )
        diag.update(
            n_new_landmarks=rec["n_new"],
            n_lm_dropped=rec["n_dropped"],
            n_lm_alive=rec["n_lm_alive"],
            n_lm_marginalized=rec["n_lm_marg"],
            ba_cost=rec["ba_cost"],
            ba_inliers=rec["ba_inliers"],
        )
        r_np, t_np = rec["kf_r"][i_last], rec["kf_t"][i_last]
        if self.loop_closer is not None:
            self.loop_closer.note_ingested(prev["fid"])
            r_np, t_np = self._loop_on_keyframe_mega(
                prev, cur, diag, r_np, t_np
            )
        return r_np, t_np

    # ------------------------------------------------------------------
    # Loop closure + relocalization (loop/closure.py). No reference
    # counterpart (SURVEY.md §5: no reloc, no loop closure).
    # ------------------------------------------------------------------

    def _loop_on_keyframe(self, diag, r_np, t_np):
        """Ingest the new keyframe into the place database and, when it
        is queryable, retrieve + verify a loop candidate. An accepted
        closure (a) appends a ``loop`` edge to the pose-graph store and
        (b) rigidly corrects the live window/map/current pose in one
        dispatch (yaw-only rotation in VIO mode: gravity alignment must
        survive)."""
        lc = self.loop_closer
        h = self.cfg.camera.height
        ids = jnp.where(self.track.valid, self.track.ids, -1)
        hit = lc.on_keyframe(
            fused.buf_image(self.img_prev, h),
            self.track.uv, ids, self.track.valid,
            self.win, self.r_cur, self.t_cur, self.r_cb, self.t_cb,
            self.frame_id, yaw_only=self.imu_initialized,
        )
        if hit is None:
            return r_np, t_np
        from ..loop import closure as loop_mod

        lcfg = self.cfg.loop
        w = np.concatenate([
            np.full(3, lcfg.edge_weight_t), np.full(3, lcfg.edge_weight_r),
        ]).astype(np.float32)
        self.pg_edges.append(PgEdge(
            hit["old_fid"], hit["cur_fid"],
            hit["rel_r"].astype(np.float32), hit["rel_t"].astype(np.float32),
            w, "loop",
        ))
        diag["loop_closed_to"] = hit["old_fid"]
        diag["loop_inliers"] = hit["n_inliers"]
        diag["loop_score"] = round(hit["score"], 3)
        if not hit["apply_correction"]:
            # edge recorded; correction below the noise floor
            return r_np, t_np
        (self.win, self.r_cur, self.t_cur, self.r_prev, self.t_prev,
         self.vel_cur) = loop_mod.apply_world_correction(
            self.win, jnp.asarray(hit["corr_r"]), jnp.asarray(hit["corr_t"]),
            self.r_cur, self.t_cur, self.r_prev, self.t_prev, self.vel_cur,
        )
        # host mirrors of everything the correction moved
        rc, tc = hit["corr_r"], hit["corr_t"]
        if self._last_kf_window_host is not None:
            kf_id_h, kf_r_h, kf_t_h = self._last_kf_window_host
            for i in range(len(kf_id_h)):
                f = int(kf_id_h[i])
                if f >= 0:
                    self.kf_pose_log[f] = (
                        rc @ kf_r_h[i], rc @ kf_t_h[i] + tc
                    )
        if self.last_kf_capture is not None:
            kr, kp = self.last_kf_capture
            self.last_kf_capture = (rc @ kr, rc @ kp + tc)
        log.info(
            "loop closure: frame %d -> %d (%d matches, %d inliers, "
            "score %.2f, |dt|=%.3f m)",
            self.frame_id, hit["old_fid"], hit["n_match"],
            hit["n_inliers"], hit["score"], float(np.linalg.norm(tc)),
        )
        return rc @ r_np, rc @ t_np + tc

    def _loop_on_keyframe_mega(self, prev, cur, diag, r_np, t_np):
        """Loop-closure query for an IN-GRAPH keyframe (megastep). The
        post-keyframe device handles live in ``prev["post_state"]`` (the
        snapshot taken when the NEXT frame dispatched) — ingest/detect
        reads them without touching the live (possibly one-frame-ahead)
        state; only an ACCEPTED correction rewinds and re-dispatches."""
        from ..loop import closure as loop_mod

        lc = self.loop_closer
        h = self.cfg.camera.height
        ps = prev.get("post_state")
        if ps is not None:
            track = ps["track"]
            uv, valid = track.uv, track.valid
            ids = jnp.where(track.valid, track.ids, -1)
            r_q, t_q = ps["r_cur"], ps["t_cur"]
            img_q = fused.buf_image(
                prev["buf"] if prev.get("buf") is not None
                else prev["buf_host"], h,
            )
        else:
            # batch entry: the post-frame query state rode the scanned
            # record's qstate tail (fused.unpack_mega_qstate) — no
            # per-frame device snapshot exists
            qs = fused.unpack_mega_qstate(prev["qstate_host"], self.cfg)
            uv, ids, valid = qs["uv"], qs["ids"], qs["valid"]
            r_q, t_q = qs["r"], qs["t"]
            img_q = fused.buf_image(prev["buf_host"], h)
        # the ingest already happened IN-GRAPH (make_mega_step keyframe
        # branch); only the query runs here. Up to fetch_every-1 LATER
        # frames are in flight (speculatively dispatched, unresolved)
        # and any of them may have been keyframes that already wrote
        # the next ring slots on device — the host does not know their
        # identities yet, so mask the whole in-flight slot range
        # (measured failure: a future frame's entry attributed to the
        # stale fid at its slot produced a loop edge between unrelated
        # frames — initial graph cost 5e7).
        k_inflight = max(self.cfg.solver.fetch_every,
                         self.cfg.solver.frames_per_dispatch, 1)
        hit = lc.detect(
            img_q, uv, ids, valid,
            r_q, t_q, self.r_cb, self.t_cb,
            prev["fid"], yaw_only=self.imu_initialized,
            extra_mask_slots=range(lc.seq, lc.seq + k_inflight),
        )
        if hit is None:
            return r_np, t_np
        lcfg = self.cfg.loop
        w = np.concatenate([
            np.full(3, lcfg.edge_weight_t), np.full(3, lcfg.edge_weight_r),
        ]).astype(np.float32)
        self.pg_edges.append(PgEdge(
            hit["old_fid"], hit["cur_fid"],
            hit["rel_r"].astype(np.float32), hit["rel_t"].astype(np.float32),
            w, "loop",
        ))
        diag["loop_closed_to"] = hit["old_fid"]
        diag["loop_inliers"] = hit["n_inliers"]
        diag["loop_score"] = round(hit["score"], 3)
        if not hit["apply_correction"]:
            return r_np, t_np
        # rewind to the post-keyframe state, apply the rigid world
        # correction, fix the host mirrors, and re-run the speculative
        # next frame from the corrected state
        self._restore_post_state(prev)
        self.imu_since_last_kf = list(prev.get("mirror_after", []))
        (self.win, self.r_cur, self.t_cur, self.r_prev, self.t_prev,
         self.vel_cur) = loop_mod.apply_world_correction(
            self.win, jnp.asarray(hit["corr_r"]), jnp.asarray(hit["corr_t"]),
            self.r_cur, self.t_cur, self.r_prev, self.t_prev, self.vel_cur,
        )
        rc, tc = hit["corr_r"], hit["corr_t"]
        if self._last_kf_window_host is not None:
            kf_id_h, kf_r_h, kf_t_h = self._last_kf_window_host
            for i in range(len(kf_id_h)):
                f = int(kf_id_h[i])
                if f >= 0:
                    self.kf_pose_log[f] = (
                        rc @ kf_r_h[i], rc @ kf_t_h[i] + tc
                    )
        if self.last_kf_capture is not None:
            kr, kp = self.last_kf_capture
            self.last_kf_capture = (rc @ kr, rc @ kp + tc)
        log.info(
            "loop closure: frame %d -> %d (%d matches, %d inliers, "
            "score %.2f, |dt|=%.3f m)",
            prev["fid"], hit["old_fid"], hit["n_match"],
            hit["n_inliers"], hit["score"], float(np.linalg.norm(tc)),
        )
        self._redispatch(cur)
        return rc @ r_np, rc @ t_np + tc

    def _try_relocalize(self, diag):
        """Query the place database with the current (lost) frame and
        PnP against the best candidate's stored landmarks. On success:
        reset the pose, zero the velocity, and re-seed the map by
        injecting the matched landmarks as marginalized entries linked
        to the CURRENT tracker ids — PnP has associations again on the
        very next frame."""
        from ..loop import closure as loop_mod

        lc = self.loop_closer
        h = self.cfg.camera.height
        ids = jnp.where(self.track.valid, self.track.ids, -1)
        rec, r_dev, t_dev, inj_pos, inj_ok = lc.relocalize(
            fused.buf_image(self.img_prev, h),
            self.track.uv, ids, self.track.valid,
            self.r_cb, self.t_cb,
        )
        if rec is None:
            return None
        self.r_cur, self.t_cur = r_dev, t_dev
        self.r_prev, self.t_prev = r_dev, t_dev
        self.vel_cur = jnp.zeros(3)
        i_last = max(self.n_kf_host - 1, 0)
        self.win = loop_mod.inject_landmarks(
            self.win, inj_pos, inj_ok, ids, self.win.kf_id[i_last]
        )
        r_h, t_h = hostsync.fetch_tree((r_dev, t_dev))
        diag["reloc_to"] = rec["old_fid"]
        diag["reloc_inliers"] = rec["n_inliers"]
        log.info(
            "relocalized against frame %d (%d inliers, score %.2f)",
            rec["old_fid"], rec["n_inliers"], rec["score"],
        )
        return np.asarray(r_h), np.asarray(t_h)

    def _refine_scale_gravity(self, diag):
        """Periodic inertial-only re-estimation of scale + gravity on the
        (already metric) window — each pass should return s ~ 1; residual
        corrections are applied while the map matures. New capability vs
        the reference (which runs IMU init exactly once,
        Estimator.cpp:800-803); standard practice since ORB-SLAM3's
        staged inertial optimizations."""
        cfg = self.cfg
        if self.scale_refine_count >= cfg.window.max_scale_refines:
            return
        k = self.n_kf_host
        if k < 3 or self.n_pairs != k - 1:
            return
        stacked, pair_valid = self._stacked_preints()
        res = imu_init_mod.solve_imu_init(
            self.win.kf_r, self.win.kf_t, stacked, pair_valid,
            gravity_magnitude=cfg.imu.gravity_magnitude,
        )
        ok_h, s_arr = hostsync.fetch_tree((res.success, res.scale))
        s = float(s_arr)
        if not bool(ok_h) or not (0.5 < s < 2.0):
            return
        # Apply ONLY the gravity/scale correction; biases stay owned by
        # VIBA (feeding stage-2 biases back into the preints here lets a
        # bias/scale degeneracy bake itself into the map — observed).
        r_wg = imu_init_mod.gravity_dir_to_rotation(res.gravity_dir)
        self._transform_history(r_wg, s)
        kf_r2, kf_t2, vel2, pts2 = imu_init_mod.align_gravity_and_scale(
            self.win.kf_r, self.win.kf_t, self.win.kf_vel, self.win.lm_pos,
            r_wg, res.scale,
        )
        kf_ok = self.win.kf_id >= 0
        self.win = dataclasses.replace(
            self.win,
            kf_r=jnp.where(kf_ok[:, None, None], kf_r2, self.win.kf_r),
            kf_t=jnp.where(kf_ok[:, None], kf_t2, self.win.kf_t),
            kf_vel=jnp.where(kf_ok[:, None], vel2, self.win.kf_vel),
            lm_pos=jnp.where(self.win.lm_alive[:, None], pts2, self.win.lm_pos),
        )
        self.scale_refine_count += 1
        diag["scale_refine"] = s

    # ------------------------------------------------------------------

    def _result(
        self, timestamp, state, is_kf, n_tracked, n_inl, diag,
        r: np.ndarray | None = None, t: np.ndarray | None = None,
    ) -> FrameResult:
        if r is None:
            r, t = hostsync.fetch_tree((self.r_cur, self.t_cur))
        return FrameResult(
            frame_id=self.frame_id,
            timestamp=timestamp,
            state=state,
            r_wb=np.asarray(r),
            t_wb=np.asarray(t),
            is_keyframe=is_kf,
            n_tracked=n_tracked,
            n_pnp_inliers=n_inl,
            diag=diag,
        )

    def reset(self) -> None:
        """Return to the pre-bootstrap state (Estimator::Reset,
        Estimator.cpp:545-556 — present in the reference API though its
        app never calls it). Configuration is kept; all tracking, map,
        inertial and trajectory state is discarded."""
        self.__init__(self.cfg)

    # ------------------------------------------------------------------
    # Checkpoint / resume (new vs the reference — SURVEY.md §5): capture
    # the COMPLETE mutable state so a resumed run is bit-identical to an
    # uninterrupted one.
    # ------------------------------------------------------------------

    _SCALAR_STATE = (
        "frame_id", "initialized", "imu_initialized", "has_imu_stream",
        "scale_refine_count", "last_timestamp", "n_pairs",
    )
    _ARRAY_STATE = (
        "track", "win", "img_prev", "key", "r_cur", "t_cur", "r_prev", "t_prev",
        "vel_cur", "bg", "ba", "gravity_w", "snapshots", "preints",
        "kf_rows_dev", "kf_count_dev", "n_pairs_dev", "refine_count_dev",
        "loop_db_dev", "loop_seq_dev", "rec_ring_dev",
    )

    def capture_state(self) -> dict:
        self.flush()  # resolve any in-flight pipelined frame first
        state: dict = {"version": 1, "last_kf_index": getattr(self, "last_kf_index", -1)}
        for name in self._SCALAR_STATE + self._ARRAY_STATE:
            state[name] = getattr(self, name)
        state["trajectory"] = [
            {"t": float(t), "r": r, "p": p} for (t, r, p) in self.trajectory
        ]
        state["imu_since_last_kf"] = [np.asarray(x) for x in self.imu_since_last_kf]
        state["kf_pose_log"] = {
            str(fid): (r, p) for fid, (r, p) in self.kf_pose_log.items()
        }
        state["traj_rel"] = [
            {} if e is None else {"kf": e[0], "r": e[1], "p": e[2]}
            for e in self.traj_rel
        ]
        state["last_kf_fid"] = self.last_kf_fid
        state["last_kf_capture"] = self.last_kf_capture
        state["lost_streak"] = self.lost_streak
        state["_mega_active"] = self._mega_active
        if self.loop_closer is not None:
            self.loop_closer.db = self.loop_db_dev
            state["loop"] = self.loop_closer.capture_state()
        state["pg_nodes"] = list(self.pg_nodes)
        state["pg_edges"] = [
            {
                "i": e.fi, "j": e.fj, "r": e.rel_r, "t": e.rel_t,
                "w": e.w_sqrt, "kind": e.kind,
                **(
                    {"v0": e.v0, "r0": e.r0, "dt": e.dt, "dp": e.dp}
                    if e.kind == "imu" else {}
                ),
            }
            for e in self.pg_edges
        ]
        return state

    def restore_state(self, state: dict) -> None:
        from ..io import checkpoint as ckpt

        for name in self._SCALAR_STATE:
            if name in state:  # tolerate pre-round-4 checkpoints
                setattr(self, name, state[name])
        self.last_kf_index = state["last_kf_index"]
        self._mega_active = bool(state.get("_mega_active", False))
        for name in self._ARRAY_STATE:
            if name.endswith("_dev") and name not in state:
                self._mega_active = False  # pre-round-5: re-sync lazily
                continue
            if name == "preints" and name not in state:
                # pre-round-4 checkpoint: host list of per-pair trees
                self._set_preints([
                    ckpt.device_put_tree(x) for x in state.get("kf_preints", [])
                ])
                continue
            setattr(self, name, ckpt.device_put_tree(state[name]))
        # host-tracked keyframe count (one fetch at restore time)
        self.n_kf_host = int(np.asarray(self.win.n_kf))
        # pre-round-4 checkpoints stored the bare image, not the packed
        # frame buffer (fused.pack_frame_input)
        h = self.cfg.camera.height
        if self.img_prev is not None and self.img_prev.shape[0] == h:
            self.img_prev = jax.device_put(fused.pack_frame_input(
                np.asarray(self.img_prev), float(self.last_timestamp or 0.0),
                None, self.cfg.imu.max_samples_per_frame,
                self.cfg.camera.width,
                transport=self.cfg.solver.image_transport,
            ))
        if (self.cfg.solver.frames_per_dispatch > 1
                and self.img_prev is not None):
            # batch dispatches stack the previous frame's HOST buffer
            self._last_buf_host = np.asarray(self.img_prev)
        self.trajectory = [
            (e["t"], np.asarray(e["r"]), np.asarray(e["p"])) for e in state["trajectory"]
        ]
        self.imu_since_last_kf = [np.asarray(x) for x in state["imu_since_last_kf"]]
        self.kf_pose_log = {
            int(fid): (np.asarray(r), np.asarray(p))
            for fid, (r, p) in state.get("kf_pose_log", {}).items()
        }
        self.traj_rel = [
            None if not e else (int(e["kf"]), np.asarray(e["r"]), np.asarray(e["p"]))
            for e in state.get("traj_rel", [])
        ]
        # keep index-parallel with trajectory (older checkpoints)
        self.traj_rel += [None] * (len(self.trajectory) - len(self.traj_rel))
        self.last_kf_fid = int(state.get("last_kf_fid", -1))
        cap_kf = state.get("last_kf_capture")
        self.last_kf_capture = (
            None if cap_kf is None
            else (np.asarray(cap_kf[0]), np.asarray(cap_kf[1]))
        )
        self.lost_streak = int(state.get("lost_streak", 0))
        if self.loop_closer is not None and "loop" in state:
            self.loop_closer.restore_state(state["loop"])
            self.loop_db_dev = self.loop_closer.db
            self.loop_seq_dev = jnp.asarray(self.loop_closer.seq, jnp.int32)
        self.pg_nodes = [int(f) for f in state.get("pg_nodes", [])]

        def _edge(e: dict) -> PgEdge:
            if "w" not in e:  # pre-round-4 checkpoint: scalar wt/wr pair
                w = np.concatenate(
                    [np.full(3, float(e["wt"])), np.full(3, float(e["wr"]))]
                ).astype(np.float32)
                return PgEdge(int(e["i"]), int(e["j"]), np.asarray(e["r"]),
                              np.asarray(e["t"]), w)
            kind = str(e.get("kind", "vis"))
            extra = (
                {
                    "v0": np.asarray(e["v0"]), "r0": np.asarray(e["r0"]),
                    "dt": float(e["dt"]), "dp": np.asarray(e["dp"]),
                }
                if kind == "imu" else {}
            )
            return PgEdge(
                int(e["i"]), int(e["j"]), np.asarray(e["r"]),
                np.asarray(e["t"]), np.asarray(e["w"]), kind, **extra,
            )

        self.pg_edges = [
            _edge(e)
            for e in state.get("pg_edges", [])
        ]

    def save(self, path: str) -> None:
        from ..io import checkpoint as ckpt

        ckpt.save_state(path, self.capture_state())

    @classmethod
    def load(cls, path: str, cfg: VioConfig) -> "Estimator":
        from ..io import checkpoint as ckpt

        est = cls(cfg)
        est.restore_state(ckpt.load_state(path))
        return est

    # ------------------------------------------------------------------

    def export_trajectory(self):
        """Trajectory with keyframe entries overridden by their latest
        BA-refined poses (trajectory index == frame id: every processed
        frame records exactly one entry). When evicted keyframes exist,
        a pose-graph solve first propagates the live window's refined
        poses back through the history (solver/pose_graph.py)."""
        self.flush()  # resolve any in-flight pipelined frame
        self.optimize_pose_graph()
        ts = np.asarray([t for t, _, _ in self.trajectory])
        rs = np.stack([r for _, r, _ in self.trajectory]) if self.trajectory else np.zeros((0, 3, 3))
        ps = np.stack([p for _, _, p in self.trajectory]) if self.trajectory else np.zeros((0, 3))
        # Non-keyframes: re-derive from their reference keyframe's
        # refined pose x the captured relative transform (the
        # reference's Frame::GetTwb mechanism, Frame.cpp:44-72).
        for i, rel in enumerate(self.traj_rel):
            if rel is None:
                continue
            kf_fid, rel_r, rel_p = rel
            refined = self.kf_pose_log.get(kf_fid)
            if refined is not None:
                kr, kp = refined
                sc = self.kf_scale_log.get(kf_fid, 1.0)
                rs[i] = kr @ rel_r
                ps[i] = kp + kr @ (rel_p * sc)
        # Keyframes: their refined pose directly (rel would be identity).
        for fid, (r, p) in self.kf_pose_log.items():
            if 0 <= fid < len(ts):
                rs[fid] = r
                ps[fid] = p
        return ts, rs, ps

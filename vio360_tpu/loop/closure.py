"""Appearance-based loop closure + relocalization.

No reference counterpart — the reference's Estimator has no reloc or
loop path at all (graceful-degradation only, Estimator.cpp:362-368;
SURVEY.md §5) and its sliding window forgets everything >10 keyframes
old. This module is the capability that changes long-run accuracy: the
round-4 organic-drift experiment showed a pose graph without loop
closures can only re-shuffle ~1% of ATE, because its edges ARE the
odometry that produced the drift. A loop closure is the one
independent measurement.

Pipeline (all device work fused into ONE program per keyframe):

  keyframe event
    -> ring descriptor + feature patches (loop/descriptor.py)
    -> ingest into the fixed-capacity device-resident database
    -> circular-correlation retrieval over ALL database entries
       (one matmul; yaw-indexable on the sphere)
    -> NCC mutual-nearest patch matching vs the best candidate
    -> geometric verification: PnP of current features against the
       candidate's stored landmark positions (solver/pnp.py — the
       same chi2-latched kernel the tracker uses)
    -> SE(3) loop edge + world correction, returned in one packed
       record

The host gates the record (score / match / inlier / magnitude
thresholds), appends a ``loop`` edge to the pose-graph store, and
applies the rigid world correction to the live window + map in one
dispatch. In VIO mode the correction rotation is projected to yaw only
— gravity alignment must survive a loop closure (4-DoF correction,
standard since VINS-Mono).

Relocalization reuses the same machinery with the candidate's stored
pose as the PnP seed, and re-seeds the map by injecting the matched
landmarks as marginalized (scale-pinning) entries so tracking resumes
against them on the very next frame.

Database cost: ~cap x (2BL + C*64 + C*6 + 12) f32 — at the default
256 x (2048 + 256*64 + ...) about 20 MB HBM; retrieval is one
[cap, 2BL] x [2BL, L] matmul (MXU) regardless of occupancy.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import VioConfig
from ..estimator import window as window_mod
from ..geometry import lie
from ..solver import pnp as pnp_mod
from ..utils import hostsync
from ..utils.precision import jit as _pjit
from . import descriptor as desc_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LoopDb:
    """Fixed-capacity device-resident place database (ring buffer)."""

    desc: jax.Array  # [N,2,B,L] ring descriptors
    patches: jax.Array  # [N,C,P] normalized feature patches
    uv: jax.Array  # [N,C,2] feature pixel coords
    lm_pos: jax.Array  # [N,C,3] landmark world positions (slot-aligned)
    lm_ok: jax.Array  # [N,C] landmark validity
    pose_r: jax.Array  # [N,3,3] keyframe pose at ingest
    pose_t: jax.Array  # [N,3]

    @property
    def capacity(self) -> int:
        return self.desc.shape[0]


def empty_db(cfg: VioConfig) -> LoopDb:
    lcfg = cfg.loop
    n, c = lcfg.db_capacity, cfg.features.capacity
    p = lcfg.patch_size * lcfg.patch_size
    return LoopDb(
        desc=jnp.zeros((n, 2, lcfg.desc_bands, lcfg.desc_bins)),
        patches=jnp.zeros((n, c, p)),
        uv=jnp.zeros((n, c, 2)),
        lm_pos=jnp.zeros((n, c, 3)),
        lm_ok=jnp.zeros((n, c), bool),
        pose_r=jnp.broadcast_to(jnp.eye(3), (n, 3, 3)).copy(),
        pose_t=jnp.zeros((n, 3)),
    )


def _yaw_only(r: jax.Array) -> jax.Array:
    """Frobenius-closest rotation about +z (gravity axis)."""
    th = jnp.arctan2(r[1, 0] - r[0, 1], r[0, 0] + r[1, 1])
    c, s = jnp.cos(th), jnp.sin(th)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


# record layout: [score, cand, shift, n_match, pnp_ok, n_inl, pnp_cost,
#                 rel_r(9), rel_t(3), corr_r(9), corr_t(3)]
REC_LEN = 7 + 24


def unpack_record(rec) -> dict:
    rec = np.asarray(rec)
    return {
        "score": float(rec[0]),
        "cand": int(rec[1]),
        "shift": int(rec[2]),
        "n_match": int(rec[3]),
        "pnp_ok": bool(rec[4] > 0.5),
        "n_inliers": int(rec[5]),
        "pnp_cost": float(rec[6]),
        "rel_r": rec[7:16].reshape(3, 3).copy(),
        "rel_t": rec[16:19].copy(),
        "corr_r": rec[19:28].reshape(3, 3).copy(),
        "corr_t": rec[28:31].copy(),
    }


def _describe_and_join(image, uv, ids, valid, win, cfg: VioConfig):
    lcfg = cfg.loop
    desc = desc_mod.ring_descriptor(image, lcfg.desc_bands, lcfg.desc_bins)
    patches = desc_mod.extract_patches(
        image, uv, valid, lcfg.patch_size, lcfg.patch_pyr_levels
    )
    lm_idx = window_mod.slot_to_landmark(win, jnp.where(valid, ids, -1))
    safe = jnp.clip(lm_idx, 0, win.max_lm - 1)
    lm_pos = win.lm_pos[safe]
    lm_ok = valid & (lm_idx >= 0)
    return desc, patches, lm_pos, lm_ok


def _ingest(db: LoopDb, write_idx, desc, patches, uv, lm_pos, lm_ok,
            r_kf, t_kf) -> LoopDb:
    return dataclasses.replace(
        db,
        desc=db.desc.at[write_idx].set(desc),
        patches=db.patches.at[write_idx].set(patches),
        uv=db.uv.at[write_idx].set(uv),
        lm_pos=db.lm_pos.at[write_idx].set(lm_pos),
        lm_ok=db.lm_ok.at[write_idx].set(lm_ok),
        pose_r=db.pose_r.at[write_idx].set(r_kf),
        pose_t=db.pose_t.at[write_idx].set(t_kf),
    )


def make_loop_step(cfg: VioConfig):
    """Build the fused keyframe-time loop program: ingest + retrieve +
    match + verify. Returns (full-SE3, yaw-only) jitted variants of
    ``fn(db, image, uv, ids, valid, win, r_kf, t_kf, r_cb, t_cb,
    write_idx, qmask) -> (db', record)``."""

    def make(yaw_only: bool):
        def step(db, image, uv, ids, valid, win, r_kf, t_kf, r_cb, t_cb,
                 write_idx, qmask):
            desc, patches, lm_pos, lm_ok = _describe_and_join(
                image, uv, ids, valid, win, cfg
            )
            db = _ingest(db, write_idx, desc, patches, uv, lm_pos, lm_ok,
                         r_kf, t_kf)
            record, _, _, _ = _retrieve_and_verify_cam(
                db, desc, patches, uv, valid, qmask,
                jnp.asarray(False), r_kf, t_kf, r_cb, t_cb, cfg,
                yaw_only=yaw_only,
            )
            return db, record

        return _pjit(step)

    return make(False), make(True)


def make_detect_step(cfg: VioConfig):
    """Detect-only program (megastep mode: ingest already happened
    IN-GRAPH inside fused.make_mega_step's keyframe branch): retrieve +
    match + verify against the device database. Returns (full-SE3,
    yaw-only) jitted variants of ``fn(db, image, uv, ids, valid, r_kf,
    t_kf, r_cb, t_cb, qmask) -> record``."""

    def make(yaw_only: bool):
        def step(db, image, uv, ids, valid, r_kf, t_kf, r_cb, t_cb,
                 qmask):
            lcfg = cfg.loop
            desc = desc_mod.ring_descriptor(
                image, lcfg.desc_bands, lcfg.desc_bins
            )
            patches = desc_mod.extract_patches(
                image, uv, valid, lcfg.patch_size, lcfg.patch_pyr_levels
            )
            record, _, _, _ = _retrieve_and_verify_cam(
                db, desc, patches, uv, valid, qmask,
                jnp.asarray(False), r_kf, t_kf, r_cb, t_cb, cfg,
                yaw_only=yaw_only,
            )
            return record

        return _pjit(step)

    return make(False), make(True)


def make_ingest_step(cfg: VioConfig):
    """Ingest-only variant (database not yet queryable): ONE async
    dispatch, nothing fetched."""

    def step(db, image, uv, ids, valid, win, r_kf, t_kf, write_idx):
        desc, patches, lm_pos, lm_ok = _describe_and_join(
            image, uv, ids, valid, win, cfg
        )
        return dataclasses.replace(
            db,
            desc=db.desc.at[write_idx].set(desc),
            patches=db.patches.at[write_idx].set(patches),
            uv=db.uv.at[write_idx].set(uv),
            lm_pos=db.lm_pos.at[write_idx].set(lm_pos),
            lm_ok=db.lm_ok.at[write_idx].set(lm_ok),
            pose_r=db.pose_r.at[write_idx].set(r_kf),
            pose_t=db.pose_t.at[write_idx].set(t_kf),
        )

    return _pjit(step)


def _retrieve_and_verify_cam(
    db, desc, patches, uv, valid, qmask, seed_from_cand, r_kf, t_kf,
    r_cb, t_cb, cfg: VioConfig, yaw_only: bool,
):
    """Retrieval + geometric verification over the TOP-K candidates.

    Retrieval RANKS; geometry DECIDES: inside self-similar
    environments the best-correlating entry is often not the true
    revisit (measured on the revisit benchmark: a mid-circuit entry
    out-scored the true one 0.36 vs 0.25), so the top-K candidates are
    each patch-matched and PnP-verified (vmapped — one batched
    program) and the candidate with the most chi2 inliers among the
    PnP successes wins. A PnP-verified match is trustworthy regardless
    of its retrieval rank: the inliers ARE correct 2D-3D
    correspondences against the stored map.
    """
    lcfg = cfg.loop
    k = min(lcfg.verify_top_k, db.capacity)
    scores, shifts = desc_mod.score_all_shifts(desc, db.desc)
    scores = jnp.where(qmask, scores, -2.0)
    top_s, top_i = jax.lax.top_k(scores, k)  # [K]

    def verify(ci):
        match_idx, _ = desc_mod.match_patches(
            patches, valid, db.patches[ci], db.lm_ok[ci],
            lcfg.match_min_ncc, lcfg.match_min_margin,
        )
        has = match_idx >= 0
        safe_m = jnp.clip(match_idx, 0, match_idx.shape[0] - 1)
        pts = db.lm_pos[ci, safe_m]
        active = has & db.lm_ok[ci, safe_m]
        r_seed = jnp.where(seed_from_cand, db.pose_r[ci], r_kf)
        t_seed = jnp.where(seed_from_cand, db.pose_t[ci], t_kf)
        res = pnp_mod.solve_pnp(
            r_seed, t_seed, pts, uv, active, jnp.zeros_like(active),
            r_cb, t_cb, cfg.camera.width, cfg.camera.height,
            huber_delta=cfg.window.huber_delta,
            chi2_threshold=cfg.window.chi2_threshold,
            rounds=cfg.window.pnp_rounds,
            max_iterations=cfg.window.max_lm_iterations,
            min_inliers=lcfg.min_inliers,
            backend=cfg.solver.backend,
        )
        n_match = jnp.sum(active).astype(jnp.int32)
        inj_ok = active & res.success & ~res.outlier
        return (res.r_wb, res.t_wb, res.success, res.num_inliers,
                res.final_cost, n_match, pts, inj_ok)

    (r_all, t_all, ok_all, inl_all, cost_all, nm_all, pts_all,
     inj_all) = jax.vmap(verify)(top_i)

    quality = jnp.where(ok_all, inl_all, -1)
    b = jnp.argmax(quality)
    cand = top_i[b]
    score = top_s[b]
    r_pnp, t_pnp = r_all[b], t_all[b]
    r_old, t_old = db.pose_r[cand], db.pose_t[cand]
    rel_r = r_old.T @ r_pnp
    rel_t = r_old.T @ (t_pnp - t_old)
    rc_full = r_pnp @ r_kf.T
    rc = _yaw_only(rc_full) if yaw_only else rc_full
    tc = t_pnp - rc @ t_kf
    record = jnp.concatenate([
        jnp.stack([
            score,
            cand.astype(jnp.float32),
            shifts[cand].astype(jnp.float32),
            nm_all[b].astype(jnp.float32),
            ok_all[b].astype(jnp.float32),
            inl_all[b].astype(jnp.float32),
            cost_all[b],
        ]),
        rel_r.ravel(), rel_t, rc.ravel(), tc,
    ])

    # slot-aligned injection arrays for relocalization: the matched
    # landmark per current feature slot (world position) + validity
    return record, (r_pnp, t_pnp), pts_all[b], inj_all[b]


def make_reloc_step(cfg: VioConfig):
    """Relocalization program: retrieve + match + PnP seeded from the
    CANDIDATE's stored pose. Returns jitted
    ``fn(db, image, uv, ids, valid, r_cb, t_cb, qmask) ->
    (record, inj_pos [C,3], inj_ok [C])`` — record is the only fetch;
    the injection arrays stay on device for re-seeding the window."""

    def step(db, image, uv, ids, valid, r_cb, t_cb, qmask):
        lcfg = cfg.loop
        desc = desc_mod.ring_descriptor(
            image, lcfg.desc_bands, lcfg.desc_bins
        )
        patches = desc_mod.extract_patches(
            image, uv, valid, lcfg.patch_size, lcfg.patch_pyr_levels
        )
        record, (r_b, t_b), inj_pos, inj_ok = _retrieve_and_verify_cam(
            db, desc, patches, uv, valid, qmask,
            jnp.asarray(True),  # PnP seeds from each candidate's pose
            jnp.eye(3), jnp.zeros(3), r_cb, t_cb, cfg, yaw_only=False,
        )
        return record, r_b, t_b, inj_pos, inj_ok

    return _pjit(step)


@_pjit
def apply_world_correction(
    win: window_mod.WindowState, r_c, t_c,
    r_cur, t_cur, r_prev, t_prev, vel,
):
    """Left-multiply the live window + map + current pose by the rigid
    world correction (x' = R_c x + t_c). One dispatch; history stays in
    the old frame (the pose-graph solve reconciles it at export —
    relative edges are invariant under a left rigid transform)."""
    kf_ok = win.kf_id >= 0
    kf_r2 = jnp.einsum("ij,kjl->kil", r_c, win.kf_r)
    kf_t2 = jnp.einsum("ij,kj->ki", r_c, win.kf_t) + t_c
    vel2 = jnp.einsum("ij,kj->ki", r_c, win.kf_vel)
    lm2 = win.lm_pos @ r_c.T + t_c
    win = dataclasses.replace(
        win,
        kf_r=jnp.where(kf_ok[:, None, None], kf_r2, win.kf_r),
        kf_t=jnp.where(kf_ok[:, None], kf_t2, win.kf_t),
        kf_vel=jnp.where(kf_ok[:, None], vel2, win.kf_vel),
        lm_pos=jnp.where(win.lm_alive[:, None], lm2, win.lm_pos),
    )
    return (
        win,
        lie.so3_renormalize(r_c @ r_cur), r_c @ t_cur + t_c,
        lie.so3_renormalize(r_c @ r_prev), r_c @ t_prev + t_c,
        r_c @ vel,
    )


@_pjit
def inject_landmarks(
    win: window_mod.WindowState, pos, ok, feat_ids, ref_kf_id,
):
    """Re-seed the map after relocalization: allocate landmark slots
    for the matched database landmarks, linked to the CURRENT tracker
    ids and pinned (marginalized) so BA keeps the recovered scale
    anchored to the old map."""
    win = window_mod.add_landmarks(
        win, pos, ok & ~win_has_landmark(win, feat_ids), feat_ids,
        ref_kf_id,
    )
    # add_landmarks clears marg at the new slots; re-pin the injected
    # ones by id-join (positions came from the established map).
    lm_new = (
        win.lm_alive
        & jnp.isin(win.lm_feat_id, jnp.where(ok, feat_ids, -3))
    )
    return dataclasses.replace(win, lm_marg=win.lm_marg | lm_new)


def win_has_landmark(win, feat_ids):
    return window_mod.slot_to_landmark(win, feat_ids) >= 0


@_pjit
def transform_db(db: LoopDb, r_gw, s, t_anchor):
    """Mirror estimator._transform_history on the database: world
    rotation + scale about the anchor applied to stored landmark
    positions and poses."""
    def xp(p):
        return t_anchor + (p @ r_gw.T - t_anchor) * s

    return dataclasses.replace(
        db,
        lm_pos=xp(db.lm_pos.reshape(-1, 3)).reshape(db.lm_pos.shape),
        pose_r=jnp.einsum("ij,kjl->kil", r_gw, db.pose_r),
        pose_t=xp(db.pose_t),
    )


class LoopCloser:
    """Host orchestration: ring-buffer bookkeeping, record gating,
    pose-graph edge emission. All device work happens in the fused
    programs above; per keyframe this costs ONE async dispatch while
    the database is not yet queryable, and one extra fetch once it is."""

    def __init__(self, cfg: VioConfig):
        self.cfg = cfg
        self.db = empty_db(cfg)
        n = cfg.loop.db_capacity
        self.entry_fid = np.full(n, -1, np.int64)
        self.entry_seq = np.full(n, -1, np.int64)
        self.seq = 0
        self._last_correction_seq = -(10**9)
        self._ingest = make_ingest_step(cfg)
        self._step_full, self._step_yaw = make_loop_step(cfg)
        self._detect_full, self._detect_yaw = make_detect_step(cfg)
        self._reloc = make_reloc_step(cfg)

    # -- bookkeeping -----------------------------------------------------
    def _write_idx(self) -> int:
        return self.seq % self.cfg.loop.db_capacity

    def _query_mask(self, exclude_recent: int) -> np.ndarray:
        """Entries old enough to be loop candidates (not the sliding
        window's own recent past)."""
        return (self.entry_seq >= 0) & (
            self.entry_seq <= self.seq - exclude_recent
        )

    @property
    def n_entries(self) -> int:
        return int((self.entry_seq >= 0).sum())

    def queryable(self) -> bool:
        return bool(self._query_mask(self.cfg.loop.exclude_recent_kf).any())

    # -- megastep mode: ingest happened in-graph ------------------------
    def note_ingested(self, fid: int) -> None:
        """Mirror an IN-GRAPH ingest (fused.make_mega_step keyframe
        branch): the device wrote slot seq % cap; record its identity."""
        w = self._write_idx()
        self.entry_fid[w] = fid
        self.entry_seq[w] = self.seq
        self.seq += 1

    def detect(self, image, uv, ids, valid, r_kf, t_kf, r_cb, t_cb,
               fid: int, yaw_only: bool, extra_mask_slots=()):
        """Query-only loop detection against the (estimator-owned,
        in-graph-maintained) database. ``extra_mask_slots`` masks ring
        slots possibly dirtied by in-flight (pipelined, not yet
        resolved) keyframes whose identities the host does not know
        yet."""
        lcfg = self.cfg.loop
        if not self.queryable():
            return None
        qm = self._query_mask(lcfg.exclude_recent_kf)
        for s in extra_mask_slots:
            qm[int(s) % self.cfg.loop.db_capacity] = False
        step = self._detect_yaw if yaw_only else self._detect_full
        rec_dev = step(
            self.db, image, uv, ids, valid, r_kf, t_kf, r_cb, t_cb,
            jnp.asarray(qm),
        )
        return self._gate(unpack_record(rec_dev), fid)

    # -- keyframe-time detection ----------------------------------------
    def on_keyframe(
        self, image, uv, ids, valid, win, r_kf, t_kf, r_cb, t_cb,
        fid: int, yaw_only: bool,
    ):
        """Ingest the new keyframe; if the database holds queryable
        entries, also retrieve + verify and return the gated result
        dict (or None)."""
        lcfg = self.cfg.loop
        w = self._write_idx()
        out = None
        if self.queryable():
            qm = self._query_mask(lcfg.exclude_recent_kf)
            # after the ring wraps, the CURRENT frame's ingest
            # overwrites slot w in-place — leaving it queryable would
            # self-match the frame against its own just-written entry
            # while the host still maps the slot to the OLD fid
            # (measured: a cluster of rel~identity edges exactly
            # db_capacity keyframes apart, 155 deg wrong vs GT)
            qm[w] = False
            qmask = jnp.asarray(qm)
            step = self._step_yaw if yaw_only else self._step_full
            self.db, rec_dev = step(
                self.db, image, uv, ids, valid, win, r_kf, t_kf,
                r_cb, t_cb, jnp.asarray(w, jnp.int32), qmask,
            )
            rec = unpack_record(rec_dev)
            out = self._gate(rec, fid)
        else:
            self.db = self._ingest(
                self.db, image, uv, ids, valid, win, r_kf, t_kf,
                jnp.asarray(w, jnp.int32),
            )
        self.entry_fid[w] = fid
        self.entry_seq[w] = self.seq
        self.seq += 1
        return out

    def _gate(self, rec: dict, fid: int):
        lcfg = self.cfg.loop
        if (
            rec["score"] < lcfg.min_score
            or rec["n_match"] < lcfg.min_matches
            or not rec["pnp_ok"]
            or rec["n_inliers"] < lcfg.min_inliers
        ):
            return None
        # correction magnitude sanity: a "loop" implying an enormous
        # jump is a mismatch, not a correction
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(rec["corr_r"]) - 1.0) / 2.0, -1.0, 1.0)))
        tmag = float(np.linalg.norm(rec["corr_t"]))
        if ang > lcfg.max_rot_correction_deg or tmag > lcfg.max_trans_correction:
            return None
        old_fid = int(self.entry_fid[rec["cand"]])
        if old_fid < 0 or old_fid == fid:
            return None
        # Below the floors the EDGE is still valuable (export-time pose
        # graph) but perturbing the live window is not; live corrections
        # are reloc-grade events: large, strongly verified, rate-limited.
        apply = (
            (tmag >= lcfg.min_trans_correction
             or ang >= lcfg.min_rot_correction_deg)
            and rec["n_inliers"] >= lcfg.apply_inlier_factor * lcfg.min_inliers
            and self.seq - self._last_correction_seq
            >= lcfg.correction_cooldown_kf
        )
        if apply:
            self._last_correction_seq = self.seq
        return {**rec, "old_fid": old_fid, "cur_fid": fid,
                "apply_correction": apply}

    # -- relocalization ---------------------------------------------------
    def relocalize(self, image, uv, ids, valid, r_cb, t_cb):
        """Full-database retrieval + PnP seeded at the candidate pose.
        Returns (result dict | None, r_dev, t_dev, inj_pos, inj_ok) —
        device handles are only meaningful when the dict is not None."""
        qmask = jnp.asarray(self.entry_seq >= 0)
        if not qmask.any():
            return None, None, None, None, None
        rec_dev, r_dev, t_dev, inj_pos, inj_ok = self._reloc(
            self.db, image, uv, ids, valid, r_cb, t_cb, qmask,
        )
        rec = unpack_record(rec_dev)
        lcfg = self.cfg.loop
        if (
            rec["score"] < lcfg.reloc_min_score
            or rec["n_match"] < lcfg.min_matches
            or not rec["pnp_ok"]
            or rec["n_inliers"] < lcfg.min_inliers
        ):
            return None, None, None, None, None
        rec["old_fid"] = int(self.entry_fid[rec["cand"]])
        return rec, r_dev, t_dev, inj_pos, inj_ok

    # -- world-frame maintenance -----------------------------------------
    def transform(self, r_gw, s, t_anchor):
        """Called from estimator._transform_history: keep the database
        in the same world frame as the live map."""
        self.db = transform_db(
            self.db, jnp.asarray(r_gw), jnp.asarray(s, jnp.float32),
            jnp.asarray(t_anchor, jnp.float32),
        )

    # -- checkpoint -------------------------------------------------------
    def capture_state(self) -> dict:
        return {
            "db": self.db,
            "entry_fid": self.entry_fid.copy(),
            "entry_seq": self.entry_seq.copy(),
            "seq": self.seq,
            "last_correction_seq": self._last_correction_seq,
        }

    def restore_state(self, state: dict) -> None:
        from ..io import checkpoint as ckpt

        self.db = ckpt.device_put_tree(state["db"])
        self.entry_fid = np.asarray(state["entry_fid"], np.int64).copy()
        self.entry_seq = np.asarray(state["entry_seq"], np.int64).copy()
        self.seq = int(state["seq"])
        self._last_correction_seq = int(
            state.get("last_correction_seq", -(10**9))
        )

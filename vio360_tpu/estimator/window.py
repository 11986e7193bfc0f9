"""Sliding-window map state as fixed-capacity SoA arrays.

TPU-native counterpart of the reference's pointer graph
(``Frame``/``MapPoint``/``Estimator`` window bookkeeping,
``src/database/Frame.cpp``, ``src/database/MapPoint.cpp``,
``src/processing/Estimator.cpp:637-804``):

- keyframes live oldest-first in ``[K]`` slots with a valid count;
- each keyframe stores a full SNAPSHOT of the tracker's feature slots
  (``kf_feat_uv [K,C,2]``, ``kf_feat_id [K,C]``) — because tracker
  slots are stable for a feature's lifetime, the landmark<->keyframe
  observation incidence is *derived* by an id-equality join instead of
  maintained mutable observation lists (replaces
  ``MapPoint::AddObservation/RemoveObservation``);
- landmarks live in ``[L]`` slots: position, alive/marginalized flags,
  owning feature slot + id, reference keyframe id.

Window eviction mirrors Estimator.cpp:692-754: landmarks whose
reference keyframe is evicted are re-referenced to the oldest remaining
observer and pinned via ``marginalized`` (scale anchors), or killed if
unobserved; zero-observation landmarks die.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..config import VioConfig
from ..geometry import camera as cam
from ..geometry import lie
from ..geometry import triangulation
from ..solver import ba as ba_mod
from ..solver import viba as viba_mod
from ..utils.precision import jit as _pjit


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WindowState:
    # keyframes (oldest first, slots [0, n_kf))
    kf_r: jax.Array  # [K,3,3]
    kf_t: jax.Array  # [K,3]
    kf_vel: jax.Array  # [K,3]
    kf_bg: jax.Array  # [K,3] gyro bias
    kf_ba: jax.Array  # [K,3] accel bias
    kf_time: jax.Array  # [K] f32
    kf_id: jax.Array  # [K] i32 frame id (-1 = empty)
    kf_feat_uv: jax.Array  # [K,C,2] tracker snapshot
    kf_feat_id: jax.Array  # [K,C] i32 (-1 = invalid)
    n_kf: jax.Array  # [] i32
    # landmarks
    lm_pos: jax.Array  # [L,3]
    lm_alive: jax.Array  # [L] bool
    lm_marg: jax.Array  # [L] bool (scale anchors: fixed in BA, never bad)
    lm_slot: jax.Array  # [L] i32 feature slot
    lm_feat_id: jax.Array  # [L] i32 feature id
    lm_ref_kf: jax.Array  # [L] i32 reference keyframe id

    @property
    def max_kf(self) -> int:
        return self.kf_r.shape[0]

    @property
    def max_lm(self) -> int:
        return self.lm_pos.shape[0]


def empty_window(max_kf: int, max_lm: int, capacity: int) -> WindowState:
    return WindowState(
        kf_r=jnp.broadcast_to(jnp.eye(3), (max_kf, 3, 3)).copy(),
        kf_t=jnp.zeros((max_kf, 3)),
        kf_vel=jnp.zeros((max_kf, 3)),
        kf_bg=jnp.zeros((max_kf, 3)),
        kf_ba=jnp.zeros((max_kf, 3)),
        kf_time=jnp.zeros((max_kf,)),
        kf_id=jnp.full((max_kf,), -1, jnp.int32),
        kf_feat_uv=jnp.zeros((max_kf, capacity, 2)),
        kf_feat_id=jnp.full((max_kf, capacity), -1, jnp.int32),
        n_kf=jnp.asarray(0, jnp.int32),
        lm_pos=jnp.zeros((max_lm, 3)),
        lm_alive=jnp.zeros((max_lm,), bool),
        lm_marg=jnp.zeros((max_lm,), bool),
        lm_slot=jnp.full((max_lm,), -1, jnp.int32),
        lm_feat_id=jnp.full((max_lm,), -1, jnp.int32),
        lm_ref_kf=jnp.full((max_lm,), -1, jnp.int32),
    )


def observations(win: WindowState) -> tuple[jax.Array, jax.Array]:
    """Derive the dense incidence: (obs_uv [K,L,2], obs_mask [K,L])."""
    slot = jnp.clip(win.lm_slot, 0, win.kf_feat_uv.shape[1] - 1)
    uv = win.kf_feat_uv[:, slot, :]  # [K,L,2]
    ids = win.kf_feat_id[:, slot]  # [K,L]
    kf_ok = win.kf_id >= 0
    mask = (
        kf_ok[:, None]
        & win.lm_alive[None, :]
        & (win.lm_feat_id[None, :] >= 0)
        & (ids == win.lm_feat_id[None, :])
    )
    return uv, mask


def slot_to_landmark(win: WindowState, feat_ids: jax.Array) -> jax.Array:
    """[C] feature ids -> landmark index per slot (-1 = none)."""
    c = feat_ids.shape[0]
    out = jnp.full((c,), -1, jnp.int32)
    src = jnp.where(
        win.lm_alive & (win.lm_feat_id >= 0), win.lm_slot, c
    )  # scatter destination
    lm_idx = jnp.arange(win.max_lm, dtype=jnp.int32)
    out = out.at[src].set(lm_idx, mode="drop")
    # verify id still matches (slot may have been recycled)
    got = jnp.where(out >= 0, win.lm_feat_id[jnp.clip(out, 0, win.max_lm - 1)], -2)
    return jnp.where(got == feat_ids, out, -1)


@_pjit
def add_keyframe(
    win: WindowState,
    r_wb: jax.Array,
    t_wb: jax.Array,
    vel: jax.Array,
    bg: jax.Array,
    ba_bias: jax.Array,
    time: jax.Array,
    frame_id: jax.Array,
    feat_uv: jax.Array,  # [C,2]
    feat_ids: jax.Array,  # [C] (-1 for invalid slots)
) -> WindowState:
    """Append a keyframe, evicting the oldest if the window is full
    (Estimator.cpp:671-754)."""
    k = win.max_kf
    full = win.n_kf >= k

    def evict(w: WindowState) -> WindowState:
        evicted_id = w.kf_id[0]
        # Landmarks referenced to the evicted KF:
        _, mask = observations(w)
        obs_later = jnp.any(mask[1:], axis=0)  # observed by any remaining KF
        ref_evicted = w.lm_ref_kf == evicted_id
        # transfer reference to oldest remaining observer + marginalize
        first_obs = jnp.argmax(mask[1:], axis=0) + 1  # [L] index of oldest observer
        new_ref = w.kf_id[jnp.clip(first_obs, 0, k - 1)]
        lm_ref = jnp.where(ref_evicted & obs_later, new_ref, w.lm_ref_kf)
        lm_marg = w.lm_marg | (ref_evicted & obs_later & w.lm_alive)
        lm_alive = w.lm_alive & ~(ref_evicted & ~obs_later)
        # remove evicted observations: landmarks left with zero obs die
        # (marginalized anchors survive only through remaining obs, same as
        #  reference RemoveObservation -> SetBad on count 0)
        lm_alive = lm_alive & obs_later

        def shift(a):
            return jnp.roll(a, -1, axis=0)

        return dataclasses.replace(
            w,
            kf_r=shift(w.kf_r),
            kf_t=shift(w.kf_t),
            kf_vel=shift(w.kf_vel),
            kf_bg=shift(w.kf_bg),
            kf_ba=shift(w.kf_ba),
            kf_time=shift(w.kf_time),
            kf_id=shift(w.kf_id).at[k - 1].set(-1),
            kf_feat_uv=shift(w.kf_feat_uv),
            kf_feat_id=shift(w.kf_feat_id).at[k - 1].set(-1),
            n_kf=w.n_kf - 1,
            lm_ref_kf=lm_ref,
            lm_marg=lm_marg,
            lm_alive=lm_alive,
        )

    win = jax.lax.cond(full, evict, lambda w: w, win)
    idx = jnp.clip(win.n_kf, 0, k - 1)
    return dataclasses.replace(
        win,
        kf_r=win.kf_r.at[idx].set(r_wb),
        kf_t=win.kf_t.at[idx].set(t_wb),
        kf_vel=win.kf_vel.at[idx].set(vel),
        kf_bg=win.kf_bg.at[idx].set(bg),
        kf_ba=win.kf_ba.at[idx].set(ba_bias),
        kf_time=win.kf_time.at[idx].set(time),
        kf_id=win.kf_id.at[idx].set(frame_id.astype(jnp.int32)),
        kf_feat_uv=win.kf_feat_uv.at[idx].set(feat_uv),
        kf_feat_id=win.kf_feat_id.at[idx].set(feat_ids),
        n_kf=win.n_kf + 1,
    )


def add_landmarks(
    win: WindowState,
    positions: jax.Array,  # [C,3] world positions, slot-aligned
    new_valid: jax.Array,  # [C] bool which slots get a landmark
    feat_ids: jax.Array,  # [C]
    ref_kf_id: jax.Array,  # [] reference keyframe id
) -> WindowState:
    """Allocate landmark slots for feature slots (slot-aligned input)."""
    l = win.max_lm
    free = jnp.nonzero(~win.lm_alive, size=l, fill_value=l)[0]
    rank = jnp.cumsum(new_valid.astype(jnp.int32)) - 1
    take = new_valid & (rank < jnp.sum(~win.lm_alive))
    dest = jnp.where(take, free[jnp.clip(rank, 0, l - 1)], l)
    c = positions.shape[0]
    slots = jnp.arange(c, dtype=jnp.int32)
    return dataclasses.replace(
        win,
        lm_pos=win.lm_pos.at[dest].set(positions, mode="drop"),
        lm_alive=win.lm_alive.at[dest].set(True, mode="drop"),
        lm_marg=win.lm_marg.at[dest].set(False, mode="drop"),
        lm_slot=win.lm_slot.at[dest].set(slots, mode="drop"),
        lm_feat_id=win.lm_feat_id.at[dest].set(feat_ids, mode="drop"),
        lm_ref_kf=win.lm_ref_kf.at[dest].set(ref_kf_id.astype(jnp.int32), mode="drop"),
    )


@functools.partial(_pjit, static_argnames=("width", "height"))
def triangulate_new_landmarks(
    win: WindowState,
    t_bc: jax.Array,
    width: int,
    height: int,
    live_ids: jax.Array | None = None,  # [C] CURRENT tracker ids by slot
) -> tuple[WindowState, jax.Array]:
    """DLT-triangulate features shared by the last two keyframes that
    have no landmark yet (Estimator.cpp:1082-1318; every finite
    triangulation is accepted, matching the reference's ungated loop).

    ``live_ids`` is the tracker's CURRENT per-slot feature id: a slot
    whose live id no longer matches the latest keyframe snapshot was
    outlier-relabeled after the snapshot (BA just marked its landmark
    bad) and is skipped, matching the reference's ``!IsValid()`` guard
    in the current keyframe (Estimator.cpp:1159,1192) — without it a
    landmark killed as bad would be instantly re-seeded from the same
    corrupted snapshots.

    Returns (window, number of new landmarks).
    """
    k = win.max_kf
    i2 = jnp.clip(win.n_kf - 1, 0, k - 1)
    i1 = jnp.clip(win.n_kf - 2, 0, k - 1)
    ok_pair = win.n_kf >= 2

    ids1 = win.kf_feat_id[i1]
    ids2 = win.kf_feat_id[i2]
    uv1 = win.kf_feat_uv[i1]
    uv2 = win.kf_feat_uv[i2]
    shared = (ids1 >= 0) & (ids1 == ids2)

    # slots that already have a landmark
    has_lm = slot_to_landmark(win, ids2) >= 0
    cand = shared & ~has_lm & ok_pair
    if live_ids is not None:
        cand &= ids2 == live_ids

    # camera poses: T_wc = T_wb T_BC; T_cw = inv
    r_bc, p_bc = t_bc[:3, :3], t_bc[:3, 3]

    def t_cw(r_wb, t_wb):
        r_wc = r_wb @ r_bc
        t_wc = r_wb @ p_bc + t_wb
        top = jnp.concatenate([r_wc.T, (-(r_wc.T @ t_wc))[:, None]], axis=1)
        return jnp.concatenate([top, jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)

    t1w = t_cw(win.kf_r[i1], win.kf_t[i1])
    t2w = t_cw(win.kf_r[i2], win.kf_t[i2])

    b1 = cam.pixel_to_bearing(uv1, width, height)
    b2 = cam.pixel_to_bearing(uv2, width, height)
    pts_w, tri_ok = triangulation.triangulate_dlt(b1, b2, t1w, t2w)
    new_valid = cand & tri_ok

    # Saturation is observable, never silent: report how many accepted
    # triangulations found no free landmark slot this keyframe.
    n_free = jnp.sum(~win.lm_alive)
    n_want = jnp.sum(new_valid)
    n_dropped = jnp.maximum(n_want - n_free, 0)
    win = add_landmarks(win, pts_w, new_valid, ids2, win.kf_id[i1])
    return win, jnp.minimum(n_want, n_free), n_dropped


def window_ba(
    win: WindowState,
    t_bc: jax.Array,
    width: int,
    height: int,
    boundary_margin: float,
    huber_delta: float = 1.0,
    chi2_threshold: float = 5.991,
    max_iterations: int = 50,
    backend: str = "auto",
    dist_fn=None,
) -> tuple[WindowState, ba_mod.BaResult]:
    """Local BA over the window (Optimizer::RunLocalBA semantics):
    fix the oldest keyframe + marginalized landmarks, boundary-filtered
    observations, then write back poses/points and kill newly-bad
    landmarks. ``dist_fn`` (parallel.dist_window_ba.make_dist_window_ba)
    replaces the single-device solver with the landmark-sharded one."""
    obs_uv, obs_mask = observations(win)
    obs_mask &= ~cam.is_near_boundary(obs_uv, width, height, boundary_margin)

    kf_ok = win.kf_id >= 0
    fixed_pose = ~kf_ok | (jnp.arange(win.max_kf) == 0)
    fixed_point = ~win.lm_alive | win.lm_marg

    r_bc, p_bc = t_bc[:3, :3], t_bc[:3, 3]
    r_cb = r_bc.T
    t_cb = -(r_bc.T @ p_bc)

    if dist_fn is not None:
        res = dist_fn(
            win.kf_r, win.kf_t, win.lm_pos, obs_uv, obs_mask,
            fixed_pose, fixed_point, win.lm_marg, r_cb, t_cb,
        )
    else:
        res = ba_mod.run_ba(
            win.kf_r,
            win.kf_t,
            win.lm_pos,
            obs_uv,
            obs_mask,
            fixed_pose,
            fixed_point,
            win.lm_marg,
            r_cb,
            t_cb,
            width,
            height,
            huber_delta=huber_delta,
            chi2_threshold=chi2_threshold,
            max_iterations=max_iterations,
            backend=backend,
        )
    win = dataclasses.replace(
        win,
        # renorm: window rotations survive many solves; keep them on
        # SO(3) (reference SVD-normalizes, LieUtils.h:40-44)
        kf_r=jnp.where(
            kf_ok[:, None, None], lie.so3_renormalize(res.r_wb), win.kf_r
        ),
        kf_t=jnp.where(kf_ok[:, None], res.t_wb, win.kf_t),
        lm_pos=jnp.where((win.lm_alive & ~win.lm_marg)[:, None], res.points, win.lm_pos),
        lm_alive=win.lm_alive & ~res.new_bad,
    )
    return win, res


def window_viba(
    win: WindowState,
    t_bc: jax.Array,
    preints,  # stacked Preintegration, leading axis max_kf-1
    pair_valid: jax.Array,  # [max_kf-1]
    gravity_w: jax.Array,
    bg: jax.Array,
    ba_bias: jax.Array,
    width: int,
    height: int,
    boundary_margin: float,
    huber_delta: float = 1.0,
    chi2_threshold: float = 5.991,
    max_iterations: int = 20,
    inertial_weight: float = 1.0,
    bg_prior_weight: float = 50.0,
    ba_prior_weight: float = 50.0,
    dist_fn=None,
) -> tuple[WindowState, viba_mod.VibaResult]:
    """Visual-inertial local BA over the window (the completed
    RunVIBA, Optimizer.cpp:493-724): same gauge/outlier rules as
    window_ba plus inertial factors between consecutive keyframes.
    ``dist_fn`` (parallel.dist_viba.make_dist_viba) replaces the
    single-device solver with the landmark-sharded one."""
    obs_uv, obs_mask = observations(win)
    obs_mask &= ~cam.is_near_boundary(obs_uv, width, height, boundary_margin)

    kf_ok = win.kf_id >= 0
    fixed_pose = ~kf_ok | (jnp.arange(win.max_kf) == 0)
    fixed_point = ~win.lm_alive | win.lm_marg

    r_bc, p_bc = t_bc[:3, :3], t_bc[:3, 3]
    r_cb = r_bc.T
    t_cb = -(r_bc.T @ p_bc)

    if dist_fn is not None:
        res = dist_fn(
            win.kf_r, win.kf_t, win.kf_vel, bg, ba_bias,
            win.lm_pos, obs_uv, obs_mask, fixed_pose, fixed_point,
            win.lm_marg, preints, pair_valid, gravity_w, r_cb, t_cb,
        )
    else:
        res = viba_mod.run_viba(
            win.kf_r, win.kf_t, win.kf_vel, bg, ba_bias,
            win.lm_pos, obs_uv, obs_mask, fixed_pose, fixed_point, win.lm_marg,
            preints, pair_valid, gravity_w, r_cb, t_cb, width, height,
            huber_delta=huber_delta,
            chi2_threshold=chi2_threshold,
            max_iterations=max_iterations,
            inertial_weight=inertial_weight,
            bg_prior_weight=bg_prior_weight,
            ba_prior_weight=ba_prior_weight,
        )
    win = dataclasses.replace(
        win,
        kf_r=jnp.where(
            kf_ok[:, None, None], lie.so3_renormalize(res.r_wb), win.kf_r
        ),
        kf_t=jnp.where(kf_ok[:, None], res.t_wb, win.kf_t),
        kf_vel=jnp.where(kf_ok[:, None], res.vel, win.kf_vel),
        lm_pos=jnp.where((win.lm_alive & ~win.lm_marg)[:, None], res.points, win.lm_pos),
        lm_alive=win.lm_alive & ~res.new_bad,
    )
    return win, res

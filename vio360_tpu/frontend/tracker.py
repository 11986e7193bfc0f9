"""Feature-track state machine as fixed-capacity SoA arrays + masks.

TPU-native counterpart of the reference front end
(``src/processing/FeatureTracker.{h,cpp}`` + ``src/database/Feature.h``):
instead of per-frame ``vector<shared_ptr<Feature>>`` with id-joins, a
feature lives at a stable SLOT in ``[capacity]`` arrays from birth to
death, so cross-frame association is the identity mapping and the whole
per-frame update jits into one fixed-shape program (SURVEY.md §7).

Pipeline per frame (mirroring FeatureTracker::TrackFeatures):
 1. pyramidal LK prev->curr                (FeatureTracker.cpp:228-251)
 2. polar/boundary rejection               (FeatureTracker.cpp:118-126)
 3. rotation-only RANSAC on bearings       (FeatureTracker.cpp:253-379)
 4. bookkeeping: age/track_count/velocity  (FeatureTracker.cpp:137-163)
 5. clustered-cell removal by per-cell std (FeatureTracker.cpp:404-497)
 6. per-grid-cell cap by track count       (Frame.cpp:142-202)
 7. re-detection to top up max_features    (FeatureTracker.cpp:176-202)

All stages are masked array ops; no recompilation in steady state.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..config import VioConfig
from ..geometry import camera as cam
from ..ops import lk, ransac, shi_tomasi
from ..utils.precision import jit as _pjit


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrackState:
    uv: jax.Array  # [C, 2] current pixel positions
    prev_uv: jax.Array  # [C, 2] positions in previous frame
    vel: jax.Array  # [C, 2] px/s flow velocity
    ids: jax.Array  # [C] int32 unique feature ids (-1 = empty slot)
    age: jax.Array  # [C] int32 frames since birth
    track_count: jax.Array  # [C] int32 consecutive successful tracks
    valid: jax.Array  # [C] bool slot occupied & healthy
    next_id: jax.Array  # [] int32
    last_time: jax.Array  # [] f32 timestamp of current positions

    @property
    def capacity(self) -> int:
        return self.uv.shape[0]


def init_state(capacity: int) -> TrackState:
    return TrackState(
        uv=jnp.zeros((capacity, 2), jnp.float32),
        prev_uv=jnp.zeros((capacity, 2), jnp.float32),
        vel=jnp.zeros((capacity, 2), jnp.float32),
        ids=jnp.full((capacity,), -1, jnp.int32),
        age=jnp.zeros((capacity,), jnp.int32),
        track_count=jnp.zeros((capacity,), jnp.int32),
        valid=jnp.zeros((capacity,), bool),
        next_id=jnp.asarray(0, jnp.int32),
        last_time=jnp.asarray(0.0, jnp.float32),
    )


def _cell_index(uv: jax.Array, width: int, height: int, cols: int, rows: int) -> jax.Array:
    cw = width / cols
    ch = height / rows
    cx = jnp.clip((uv[:, 0] / cw).astype(jnp.int32), 0, cols - 1)
    cy = jnp.clip((uv[:, 1] / ch).astype(jnp.int32), 0, rows - 1)
    return cy * cols + cx


def _remove_clustered(
    uv: jax.Array, valid: jax.Array, width: int, height: int, cols: int, rows: int,
    std_ratio: float = 0.25,
) -> jax.Array:
    """Invalidate all features in cells whose position std is tiny
    (FeatureTracker.cpp:404-497; >=4 features per cell required)."""
    n_cells = cols * rows
    cell = _cell_index(uv, width, height, cols, rows)
    cell = jnp.where(valid, cell, n_cells)  # invalid -> overflow bucket
    w = valid.astype(jnp.float32)
    cnt = jax.ops.segment_sum(w, cell, num_segments=n_cells + 1)
    sx = jax.ops.segment_sum(w * uv[:, 0], cell, num_segments=n_cells + 1)
    sy = jax.ops.segment_sum(w * uv[:, 1], cell, num_segments=n_cells + 1)
    sxx = jax.ops.segment_sum(w * uv[:, 0] ** 2, cell, num_segments=n_cells + 1)
    syy = jax.ops.segment_sum(w * uv[:, 1] ** 2, cell, num_segments=n_cells + 1)
    safe = jnp.maximum(cnt, 1.0)
    var = (sxx + syy) / safe - (sx / safe) ** 2 - (sy / safe) ** 2
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    diag = jnp.sqrt((width / cols) ** 2 + (height / rows) ** 2)
    clustered = (cnt >= 4) & (std < std_ratio * diag)
    return valid & ~clustered[cell]


def _limit_per_cell(
    uv: jax.Array,
    valid: jax.Array,
    track_count: jax.Array,
    width: int, height: int, cols: int, rows: int, cap: int,
) -> jax.Array:
    """Keep at most `cap` features per grid cell, preferring higher
    track_count (Frame.cpp:142-202). Rank via a pairwise comparison —
    O(C^2) bitwise ops, trivially parallel on the VPU."""
    cell = _cell_index(uv, width, height, cols, rows)
    same_cell = (cell[:, None] == cell[None, :]) & valid[None, :] & valid[:, None]
    tc_i = track_count[:, None]
    tc_j = track_count[None, :]
    idx = jnp.arange(uv.shape[0])
    beats_me = (tc_j > tc_i) | ((tc_j == tc_i) & (idx[None, :] < idx[:, None]))
    rank = jnp.sum(same_cell & beats_me, axis=1)
    return valid & (rank < cap)


def _row_gain_compensate(ref: jax.Array, img: jax.Array) -> jax.Array:
    """Per-row multiplicative gain matching ``img`` to ``ref``.

    LK assumes brightness constancy; real 360 rigs violate it with
    auto-exposure gain drift MULTIPLIED by latitude illumination
    rolloff (stitch vignetting) — a spatially-varying brightness change
    that biases every track along the vertical gradient and was
    measured to corrupt gravity initialization (round 4: exposure x
    vignette = 0.23 m ATE vs 0.03 for either alone). On the ERP chart
    that nuisance is a function of latitude only, so matching each
    row's mean to the reference frame's removes it exactly; the gain is
    clamped to [0.5, 2] so scene change cannot inject wild gains. The
    reference's OpenCV KLT has no such compensation
    (FeatureTracker.cpp:228-251) — this is a robustness capability on
    top."""
    rm = jnp.mean(ref, axis=-1)
    im = jnp.mean(img, axis=-1)
    g = rm / jnp.maximum(im, 1e-6)
    # Confidence-weight then latitude-smooth: on sparse scenes a
    # feature crossing rows legitimately changes a row's mean — that is
    # scene change, not exposure, and inverting it INJECTS a gain
    # error (measured +68% ATE on the blob suite). Low-signal rows keep
    # gain 1; the surviving correction is box-smoothed because the real
    # nuisance (vignette x exposure) is smooth in latitude.
    w = jnp.clip(im / 0.05, 0.0, 1.0)
    g = 1.0 + (g - 1.0) * w
    g = jnp.convolve(jnp.pad(g, 4, mode="edge"), jnp.ones(9) / 9.0, mode="valid")
    g = jnp.clip(g, 0.5, 2.0)
    return img * g[:, None]


@functools.partial(_pjit, static_argnames=("width", "height"))
def _rotation_guess(uv, r_cc, width, height):
    """Rotation-predicted feature positions: bearings through the
    predicted camera rotation, reprojected on the ERP chart."""
    b_prev = cam.pixel_to_bearing(uv, width, height)
    b_cur = b_prev @ r_cc.T
    return cam.bearing_to_pixel(b_cur, width, height)


@functools.partial(_pjit, static_argnames=("cfg", "guess_from_imu"))
def track_frame(
    state: TrackState,
    img_prev: jax.Array,
    img_next: jax.Array,
    timestamp: jax.Array,
    key: jax.Array,
    cfg: VioConfig,
    r_cc_pred: jax.Array | None = None,
    guess_from_imu: bool = False,
) -> tuple[TrackState, jax.Array, dict]:
    """One front-end step. Returns (new_state, R_prev_to_curr, diag).

    ``r_cc_pred``: optional predicted camera rotation, mapping PREV-
    camera bearings to CUR-camera bearings (R_wc_cur^T R_wc_prev).
    When given (and enabled in config), LK starts from the rotation-
    predicted flow instead of the previous position.

    ``guess_skips_top_level`` only fires when the prediction comes from
    gyro propagation (``guess_from_imu``): a constant-velocity VO
    prediction has unbounded error under rotational acceleration, so
    dropping the top pyramid level there would halve the absorbable
    motion margin exactly when it is needed most."""
    c = cfg.camera
    w, h = c.width, c.height
    f = cfg.features

    if cfg.optical_flow.photometric_compensation:
        img_next = _row_gain_compensate(img_prev, img_next)

    uv_guess = None
    num_levels = cfg.optical_flow.max_level
    if r_cc_pred is not None and cfg.optical_flow.use_rotation_guess:
        uv_guess = _rotation_guess(state.uv, r_cc_pred, w, h)
        if (
            guess_from_imu
            and cfg.optical_flow.guess_skips_top_level
            and num_levels >= 2
        ):
            num_levels -= 1

    # 1. LK track
    uv_new, status, err = lk.track(
        img_prev,
        img_next,
        state.uv,
        state.valid,
        uv_guess=uv_guess,
        num_levels=num_levels,
        half_win=cfg.optical_flow.window_size // 2,
        iters=cfg.optical_flow.max_iterations,
        eps=cfg.optical_flow.epsilon,
        backend=cfg.optical_flow.backend,
    )
    tracked = state.valid & status
    n_tracked = jnp.sum(tracked)

    # 2. polar / boundary rejection (FeatureTracker.cpp:118-126: tracked
    # points are culled both by IsInPolarRegion and IsNearBoundary)
    good_region = ~cam.is_in_polar_region(uv_new, h, c.polar_exclusion_ratio)
    good_region &= ~cam.is_near_boundary(uv_new, w, h, c.boundary_margin)
    tracked &= good_region

    # 3. rotation-only RANSAC on bearings
    b_prev = cam.pixel_to_bearing(state.uv, w, h)
    b_curr = cam.pixel_to_bearing(uv_new, w, h)
    r_rel, inliers, n_inl = ransac.rotation_ransac(
        key,
        b_prev,
        b_curr,
        tracked,
        threshold_rad=jnp.deg2rad(cfg.ransac.threshold_degrees),
        iterations=cfg.ransac.max_iterations,
    )
    survived = tracked & inliers

    # 4. bookkeeping
    dt = jnp.maximum(timestamp - state.last_time, 1e-6)
    vel = (uv_new - state.uv) / dt
    # wrap velocity across the seam
    vel = vel.at[:, 0].set(cam.wrap_residual_u(vel[:, 0] * dt, w) / dt)
    age = jnp.where(survived, state.age + 1, 0)
    track_count = jnp.where(survived, state.track_count + 1, 0)

    # 5. clustered-cell removal, GATED on the *visualization* flag and
    # using its std ratio — the reference quirk (FeatureTracker.cpp:405-408
    # returns early when highlight_clustered_grid is off). cfg is a
    # static jit arg, so the gate costs nothing when disabled.
    if cfg.viz.highlight_clustered_grid:
        survived = _remove_clustered(
            uv_new, survived, w, h, f.grid_cols, f.grid_rows,
            std_ratio=cfg.viz.clustered_std_ratio,
        )
    # 6. per-cell cap
    survived = _limit_per_cell(
        uv_new, survived, track_count, w, h, f.grid_cols, f.grid_rows,
        f.max_features_per_grid,
    )

    # 7. re-detect to top up max_features
    allowed = cam.polar_mask(w, h, c.polar_exclusion_ratio)
    cand_uv, cand_score, cand_valid = shi_tomasi.detect(
        img_next,
        allowed,
        uv_new,
        survived,
        max_new=f.capacity,
        min_distance=f.min_distance,
        quality_level=f.quality_level,
    )

    n_valid = jnp.sum(survived)
    budget = jnp.maximum(f.max_features - n_valid, 0)

    capacity = state.capacity
    free_slots = jnp.nonzero(~survived, size=capacity, fill_value=capacity)[0]
    cand_rank = jnp.cumsum(cand_valid.astype(jnp.int32)) - 1
    take = cand_valid & (cand_rank < budget) & (cand_rank < capacity)
    dest = jnp.where(take, free_slots[jnp.clip(cand_rank, 0, capacity - 1)], capacity)

    uv = state.uv.at[:].set(jnp.where(survived[:, None], uv_new, state.uv))
    uv = uv.at[dest].set(cand_uv, mode="drop")
    prev_uv = jnp.where(survived[:, None], state.uv, uv)
    prev_uv = prev_uv.at[dest].set(cand_uv, mode="drop")
    vel = jnp.where(survived[:, None], vel, 0.0)
    vel = vel.at[dest].set(0.0, mode="drop")

    n_new = jnp.sum(take)
    new_ids = state.next_id + jnp.cumsum(take.astype(jnp.int32)) - 1
    ids = jnp.where(survived, state.ids, -1)
    ids = ids.at[dest].set(new_ids, mode="drop")
    age = jnp.where(survived, age, 0).at[dest].set(0, mode="drop")
    track_count = jnp.where(survived, track_count, 0).at[dest].set(0, mode="drop")
    new_valid = survived.at[dest].set(True, mode="drop")

    new_state = TrackState(
        uv=uv,
        prev_uv=prev_uv,
        vel=vel,
        ids=ids,
        age=age,
        track_count=track_count,
        valid=new_valid,
        next_id=state.next_id + n_new.astype(jnp.int32),
        last_time=jnp.asarray(timestamp, jnp.float32),
    )
    diag = {
        "n_tracked": n_tracked,
        "n_ransac_inliers": n_inl,
        "n_survived": n_valid,
        "n_new": n_new,
        "mean_err": jnp.sum(jnp.where(survived, err, 0.0)) / jnp.maximum(n_valid, 1),
    }
    return new_state, r_rel, diag


@functools.partial(_pjit, static_argnames=("cfg",))
def bootstrap_frame(
    state: TrackState, img: jax.Array, timestamp: jax.Array, cfg: VioConfig
) -> TrackState:
    """First-frame detection (no tracking)."""
    c = cfg.camera
    f = cfg.features
    allowed = cam.polar_mask(c.width, c.height, c.polar_exclusion_ratio)
    cand_uv, _, cand_valid = shi_tomasi.detect(
        img,
        allowed,
        jnp.zeros((1, 2), jnp.float32),
        jnp.zeros((1,), bool),
        max_new=f.capacity,
        min_distance=f.min_distance,
        quality_level=f.quality_level,
    )
    n = jnp.minimum(jnp.sum(cand_valid), f.max_features)
    idx = jnp.arange(state.capacity)
    valid = cand_valid & (idx < n)
    ids = jnp.where(valid, idx, -1).astype(jnp.int32)
    return TrackState(
        uv=cand_uv,
        prev_uv=cand_uv,
        vel=jnp.zeros_like(state.vel),
        ids=ids,
        age=jnp.zeros_like(state.age),
        track_count=jnp.zeros_like(state.track_count),
        valid=valid,
        next_id=n.astype(jnp.int32),
        last_time=jnp.asarray(timestamp, jnp.float32),
    )

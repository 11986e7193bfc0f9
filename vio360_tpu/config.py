"""Single-source-of-truth configuration for the VIO engine.

Replaces the reference's ``ConfigUtils`` singleton + OpenCV YAML loader
(``src/util/ConfigUtils.{h,cpp}``, ``config/default_config.yaml``) with
frozen dataclasses passed explicitly. The YAML schema is mirrored so
reference config files can be ingested directly (``load_yaml``).

Where the reference's hardcoded defaults diverge from its shipped YAML
(SURVEY.md §5 "Config"), we take the values the reference *actually
uses at runtime*: e.g. the tracker hardcodes a 21x21 LK window and a 2°
RANSAC threshold regardless of the YAML (FeatureTracker.cpp:33-38), and
the sliding window is hardcoded to 10 keyframes (Estimator.cpp:693).

Static capacities (``max_features``, ``window_size`` …) become compile-
time array sizes, so changing them triggers recompilation — by design.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    width: int = 960
    height: int = 480
    polar_exclusion_ratio: float = 0.15
    boundary_margin: float = 20.0


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    max_features: int = 1000
    quality_level: float = 0.01
    min_distance: float = 30.0
    grid_cols: int = 20
    grid_rows: int = 10
    max_features_per_grid: int = 10
    # Padded SoA capacity (multiple of 128 for TPU lane alignment).
    capacity: int = 1024


@dataclasses.dataclass(frozen=True)
class OpticalFlowConfig:
    # The reference code hardcodes 21/3/30/0.01 (FeatureTracker.cpp:33-35)
    # even though its YAML says 51.
    window_size: int = 21
    max_level: int = 3
    max_iterations: int = 30
    epsilon: float = 0.01
    # LK kernel backend: "auto" picks the Pallas VMEM-resident kernel on
    # TPU and the pure-XLA gather path elsewhere; "pallas"/"xla" force.
    backend: str = "auto"
    # Seed LK with the rotation-predicted flow (IMU gyro propagation or
    # constant-velocity model, Estimator.cpp:318-334/429-471, applied
    # through the ERP projection). The iteration ladder then converges
    # in ~1 step at the upper pyramid levels (masked early exit), and
    # fast yaw no longer outruns the top level's search margin. The
    # reference tracks from the previous position only
    # (FeatureTracker.cpp:238); this is a capability on top.
    use_rotation_guess: bool = True
    # With a GYRO-propagated rotation guess the top pyramid level's job
    # — absorbing the raw inter-frame motion — is already done by the
    # prediction, so the tracker drops the deepest level (both backends
    # see the same level count, preserving the matmul==XLA equivalence
    # contract). The remaining top level's +-6 px margin at its scale
    # still absorbs ~24 px of prediction error, bounded for gyro
    # propagation. Constant-velocity VO predictions keep the FULL
    # pyramid regardless (their error is unbounded under rotational
    # acceleration); the skip only fires when the estimator passes
    # guess_from_imu=True (IMU initialized). Measured: -0.3 ms device
    # time per frame. Set False to always run the full pyramid.
    guess_skips_top_level: bool = True
    # Per-row (latitude) gain matching of the current frame to the
    # previous one before LK (frontend/tracker._row_gain_compensate):
    # removes auto-exposure x vignetting brightness drift, which
    # violates LK's brightness-constancy with a vertical bias (measured
    # to corrupt gravity init). No reference counterpart.
    photometric_compensation: bool = True


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    # NOTE: the reference YAML also carries ransac.confidence, but the
    # tracker never reads it (FeatureTracker.cpp:38 hardcodes 0.99 and
    # runs every iteration anyway); a vmapped RANSAC scores all
    # hypotheses regardless, so there is deliberately no field here.
    max_iterations: int = 1000
    threshold_degrees: float = 2.0  # FeatureTracker.cpp:37 hardcodes 2.0


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    # NOTE: tracking.min_features_ratio is parsed-but-dead in the
    # reference too (only ConfigUtils touches it); re-detection here
    # tops up to max_features every frame exactly like
    # FeatureTracker::DetectNewFeatures, so no redetect threshold exists.
    min_parallax_for_keyframe: float = 10.0
    # Extra keyframe trigger (beyond the reference's parallax-only rule):
    # create a keyframe when PnP inliers fall below this fraction of the
    # active map observations — keeps the local map fresh when features
    # churn faster than parallax accumulates. Set to 0 for strict
    # reference behavior.
    kf_min_inlier_ratio: float = 0.5


@dataclasses.dataclass(frozen=True)
class InitializationConfig:
    window_size: int = 10
    min_parallax: float = 10.0
    min_features: int = 100
    min_observations: int = 10
    grid_cols: int = 8
    grid_rows: int = 4
    max_per_cell: int = 5
    ransac_threshold: float = 0.1
    ransac_iterations: int = 200
    # initialization.min_inlier_ratio is log-only in the reference ("ratio
    # check removed for 360 cameras", Initializer.cpp:988) — not a field.
    max_reprojection_error: float = 5.0


@dataclasses.dataclass(frozen=True)
class WindowConfig:
    max_keyframes: int = 10  # Estimator.cpp:693 (hardcoded)
    max_landmarks: int = 2048  # SoA capacity for window landmarks
    # BA behavior (Optimizer.cpp)
    huber_delta: float = 1.0
    chi2_threshold: float = 5.991
    pnp_rounds: int = 4
    pnp_min_inliers: int = 10
    max_lm_iterations: int = 50
    # Visual-inertial window BA (solver/viba.py). The bias priors are
    # zero-mean weights (1/sigma): sigma ~ 0.02 keeps the accel-bias /
    # map-scale degeneracy from baking scale error into ba at low
    # excitation; see run_viba's docstring.
    viba_max_iterations: int = 20
    viba_inertial_weight: float = 1.0
    viba_bg_prior_weight: float = 50.0
    viba_ba_prior_weight: float = 50.0
    # Periodic inertial-only scale/gravity refinement passes after IMU
    # init (estimator._refine_scale_gravity) — capability beyond the
    # reference's run-once init (Estimator.cpp:800-803).
    max_scale_refines: int = 12


@dataclasses.dataclass(frozen=True)
class PoseGraphConfig:
    """Keyframe pose graph over evicted-window constraints
    (solver/pose_graph.py). New capability vs the reference, whose
    sliding window forgets everything older than 10 keyframes
    (Estimator.cpp:692-754); SURVEY.md §7 stage 8.

    Edge weights are diagonal sqrt-information (1/sigma per residual
    axis). With ``cov_weighted`` (default) they are DERIVED per edge:
    visual/skip relatives from the window BA's marginal pose covariance
    (solver/marginals.py — Schur-reduced information inverted at the
    converged state), IMU odometry edges from the preintegration
    covariance. The ``*_weight_*`` constants below are the fallback
    used when ``cov_weighted`` is off."""
    enabled: bool = True
    cov_weighted: bool = True
    # covariance floors: sigma below these is treated as these (keeps
    # derived weights finite; anchors have exactly zero covariance)
    min_sigma_t: float = 1e-3  # m
    min_sigma_r: float = 5e-4  # rad
    # velocity-estimate uncertainty entering IMU edge translations via
    # the v0*dt term (VIBA does not track velocity covariance)
    imu_vel_sigma: float = 0.05  # m/s
    # fallback sqrt-info for (translation m, rotation rad) components
    vis_weight_t: float = 20.0
    vis_weight_r: float = 100.0
    skip_weight_t: float = 10.0
    skip_weight_r: float = 50.0
    imu_weight_t: float = 4.0
    imu_weight_r: float = 40.0
    max_iterations: int = 50
    # Sim(3) mode (used automatically for monocular VO graphs that
    # contain loop edges): per-edge scale-residual sigma. Odometry
    # edges get a moderate smoothness prior (drift accumulates slowly);
    # loop edges leave scale nearly FREE — the revisit's local scale
    # vs the first visit's is exactly the unknown being estimated, and
    # their POSITION residual (expressed in the old node's scale) is
    # what ties the drift down (measured: a strong loop e_s pulled the
    # recovered scale profile to zero instead of the inverse drift).
    sim3_odom_scale_sigma: float = 0.05
    sim3_loop_scale_sigma: float = 1.0


@dataclasses.dataclass(frozen=True)
class LoopConfig:
    """Appearance-based loop closure + relocalization (loop/closure.py).

    New capability vs the reference, which has neither (SURVEY.md §5:
    "No relocalization, no loop closure"). The round-4 organic-drift
    experiment showed the pose graph alone recovers ~1% ATE — loop
    closures are the independent measurement that actually removes
    accumulated drift."""
    enabled: bool = True
    db_capacity: int = 256  # keyframe place database (ring buffer)
    # ring descriptor: latitude bands x longitude bins; must divide the
    # image height / width (960x480 default -> 16x64)
    desc_bands: int = 16
    desc_bins: int = 64
    patch_size: int = 8  # NCC patch side (pixels, at the coarse level)
    # pyramid levels to downsample before patch extraction: full-res
    # patches on fine texture decorrelate within ~1 px of viewpoint
    # change (see loop/descriptor.py::extract_patches)
    patch_pyr_levels: int = 2
    # retrieval gate on the VERIFIED candidate's correlation score.
    # Deliberately permissive: retrieval only RANKS candidates; the
    # decision is geometric (PnP inliers over the top-K, see
    # loop/closure.py::_retrieve_and_verify_cam).
    min_score: float = 0.20
    reloc_min_score: float = 0.15  # reloc searches the whole database
    verify_top_k: int = 4  # candidates patch-matched + PnP-verified
    # Candidates younger than this many keyframes are the sliding
    # window's own recent past, not loops. Also an accuracy guard:
    # short-range closures add nothing the covariance-weighted local
    # odometry doesn't already know, and their ~1 cm verification noise
    # measurably pollutes drift-free VIO runs (vio_hard se3
    # 0.021 -> 0.028 at 20); true revisits sit 40+ keyframes out.
    exclude_recent_kf: int = 30
    match_min_ncc: float = 0.60
    match_min_margin: float = 0.02
    min_matches: int = 20
    min_inliers: int = 25
    # correction sanity bounds: a "loop" implying a larger jump is a
    # mismatch, not a correction
    max_rot_correction_deg: float = 30.0
    max_trans_correction: float = 5.0
    # Live rigid corrections are RELOC-GRADE only: a correction below
    # these floors is odometry-noise-scale and snapping the live window
    # around at that scale is measured to HURT (129 small corrections
    # on a 3-lap run: ATE 0.089 -> 0.689; the fine-grained gain comes
    # from the export-time pose graph over the recorded loop edges).
    min_trans_correction: float = 0.15
    min_rot_correction_deg: float = 5.0
    # a live correction must also be strongly verified and rate-limited
    apply_inlier_factor: float = 2.0  # x min_inliers to apply
    correction_cooldown_kf: int = 10
    # Loop-edge sqrt-information. Tuned on the 3-lap revisit benchmark
    # (r5): loop errors are ~1 cm / 0.4 deg AND independent across
    # edges, while odometry errors are strongly correlated along the
    # chain — treating both as independent information undercounts
    # loops, so they carry more than their single-edge sigma
    # (node-ATE 0.089 -> 0.046 at these values vs 0.066 at the naive
    # per-edge weights).
    edge_weight_t: float = 400.0
    edge_weight_r: float = 1500.0
    # relocalization: consecutive tracking_lost frames before querying
    reloc_after: int = 5


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Nonlinear-solver kernel selection (PnP + window BA).

    ``backend``: "auto" picks the Pallas LM megakernel on TPU and the
    XLA formulation elsewhere; "xla" / "pallas" force; and
    "pallas-interpret" runs the TPU Pallas kernels through the Pallas
    interpreter on CPU — bit-for-bit the production kernel logic,
    executable anywhere (used by the parity eval to score the shipped
    TPU code path without a TPU).

    ``mesh``: distribute the window solves over a device mesh, e.g.
    "lm=8" shards the landmark axis of window BA / VIBA over 8 devices
    (parallel/dist_window_ba.py, parallel/dist_viba.py); empty =
    single-device. Requires that many JAX devices and max_landmarks
    divisible by the axis size."""
    backend: str = "auto"
    mesh: str = ""
    # Run the whole keyframe event (eviction capture, window append,
    # preintegration, window (VI)BA, bias re-linearization,
    # scale/gravity refine, outlier relabel, triangulation) as ONE
    # compiled dispatch with one packed record fetch
    # (fused.make_keyframe_step). Off = the staged multi-dispatch path
    # (still used for bootstrap promotion and IMU-init retries).
    fused_keyframe: bool = True
    # Fold the keyframe event INTO the frame program behind lax.cond
    # (fused.make_mega_step): EVERY steady-state frame is exactly one
    # upload + one dispatch + one combined-record fetch, keyframe or
    # not — the op-count floor on dispatch-latency links, and the
    # launch-overhead floor on local hardware. Requires fused_keyframe
    # semantics; the staged and two-dispatch paths remain for
    # transitions and as the equality oracle (tests/test_megastep.py).
    megastep: bool = True
    # Batched record fetch: the megastep writes each frame's combined
    # record into a K-slot device ring and the host fetches it once
    # every K frames — (2 + 1/K) relay ops per frame instead of 3.
    # Results still arrive strictly in order, up to K frames late
    # (keyframes are decided and applied IN-GRAPH, so nothing
    # latency-critical waits on the fetch). 1 = fetch every frame.
    fetch_every: int = 4
    # Wire dtype of the per-frame image upload (fused.pack_frame_input):
    # "u8" carries the image as uint8 — the reference's own camera input
    # precision (OpenCV CV_8U mats, app/main.cpp:199-204) — cutting the
    # 960x480 upload 4x (1.8 MB -> 0.47 MB; the relay moves ~30 MB/s, so
    # upload bytes are first-order in the frame budget); "u16" quantizes
    # at 1.5e-5 for float-native synthetic data; "f32" is exact.
    image_transport: str = "u8"
    # Dispatch K steady-state frames as ONE scanned program over ONE
    # stacked upload (fused.make_multi_mega_step): ~3/K relay ops per
    # frame plus the per-byte cost. Adds up to K-1 frames of result
    # latency on top of the pipelined resolve; 1 = one dispatch/frame.
    frames_per_dispatch: int = 1


@dataclasses.dataclass(frozen=True)
class ImuConfig:
    frequency: float = 200.0
    gyro_noise: float = 0.001
    accel_noise: float = 0.01
    gyro_bias_noise: float = 0.0001
    accel_bias_noise: float = 0.001
    gravity_magnitude: float = 9.81
    min_dt: float = 0.0005  # IMUPreintegrator.cpp:183-184 clamp
    max_dt: float = 0.02
    # Static capacity of per-interval sample buffers (fixed-shape scan).
    max_samples_per_frame: int = 64
    max_samples_per_keyframe: int = 512
    # IMU-init quality gate: reject (and retry at the next keyframe) an
    # initialization whose stage-1 gravity/scale residual per keyframe
    # pair exceeds this. Measured discrimination on the photometric
    # nuisance suite: healthy inits ~2.6e-6 per pair, blur-corrupted
    # ~9e-4 (round 4). New vs the reference, which accepts its one-shot
    # init unconditionally (Optimizer.cpp:972-1257).
    init_max_cost_per_pair: float = 1e-4
    # Split-half cross-validation: the gravity directions solved on the
    # window's two halves must agree within this angle. A corrupted or
    # excitation-poor window can FIT stage-1 well with a wrong gravity;
    # disagreement between independent halves exposes it.
    init_max_gravity_split_deg: float = 10.0


@dataclasses.dataclass(frozen=True)
class VisualizationConfig:
    """Mirrors the reference YAML ``visualization`` section
    (config/default_config.yaml:45-54). ``clustered_std_ratio`` is ALSO a
    tracking behavior in the reference — the tracker reads visualization
    config to decide clustered-cell removal (FeatureTracker.cpp:405-408);
    we keep that single source of truth here."""

    scale: float = 1.0
    show_grid: bool = True
    grid_color: tuple = (100, 255, 100)
    grid_thickness: int = 1
    max_age_for_color: int = 30
    stable_age_threshold: int = 5
    highlight_clustered_grid: bool = True
    clustered_grid_color: tuple = (255, 100, 100)
    clustered_std_ratio: float = 0.25


@dataclasses.dataclass(frozen=True)
class VioConfig:
    camera: CameraConfig = CameraConfig()
    features: FeatureConfig = FeatureConfig()
    optical_flow: OpticalFlowConfig = OpticalFlowConfig()
    ransac: RansacConfig = RansacConfig()
    tracking: TrackingConfig = TrackingConfig()
    init: InitializationConfig = InitializationConfig()
    window: WindowConfig = WindowConfig()
    solver: SolverConfig = SolverConfig()
    pose_graph: PoseGraphConfig = PoseGraphConfig()
    loop: LoopConfig = LoopConfig()
    imu: ImuConfig = ImuConfig()
    viz: VisualizationConfig = VisualizationConfig()
    # T_BC: camera-to-body extrinsics (4x4 row-major tuple-of-tuples so the
    # config stays hashable/static under jit).
    t_bc: tuple = (
        (1.0, 0.0, 0.0, 0.0),
        (0.0, 1.0, 0.0, 0.0),
        (0.0, 0.0, 1.0, 0.0),
        (0.0, 0.0, 0.0, 1.0),
    )

    def t_bc_array(self) -> np.ndarray:
        return np.asarray(self.t_bc, dtype=np.float32)


def _get(d: dict, *keys, default=None):
    for k in keys:
        if not isinstance(d, dict) or k not in d:
            return default
        d = d[k]
    return d


def load_yaml(path: str) -> VioConfig:
    """Ingest a reference-format YAML config (config/default_config.yaml).

    Handles the OpenCV ``%YAML:1.0`` header that standard parsers reject.
    Values absent from the file keep the dataclass defaults. Like the
    reference runtime, the YAML ``optical_flow``/``ransac`` sections are
    deliberately NOT read: the reference tracker hardcodes its LK window
    and RANSAC threshold and never consults those sections
    (FeatureTracker.cpp:33-38), so ingesting them would change behavior
    vs the reference on its own config files. Override via the
    ``OpticalFlowConfig``/``RansacConfig`` dataclasses directly instead.
    """
    import yaml  # lazy; PyYAML ships with the baked-in deps

    with open(path) as f:
        text = f.read()
    # OpenCV FileStorage header is not valid YAML 1.1 for pyyaml.
    lines = [ln for ln in text.splitlines() if not ln.startswith("%YAML")]
    data: dict[str, Any] = yaml.safe_load("\n".join(lines)) or {}

    cam = CameraConfig(
        width=_get(data, "camera", "width", default=960),
        height=_get(data, "camera", "height", default=480),
        polar_exclusion_ratio=_get(data, "camera", "polar_exclusion_ratio", default=0.15),
        boundary_margin=_get(data, "camera", "boundary_margin", default=20.0),
    )
    max_features = _get(data, "feature_detection", "max_features", default=1000)
    feats = FeatureConfig(
        max_features=max_features,
        quality_level=_get(data, "feature_detection", "quality_level", default=0.01),
        min_distance=_get(data, "feature_detection", "min_distance", default=30.0),
        grid_cols=_get(data, "feature_detection", "grid_cols", default=20),
        grid_rows=_get(data, "feature_detection", "grid_rows", default=10),
        max_features_per_grid=_get(data, "feature_detection", "max_features_per_grid", default=10),
        capacity=-(-max_features // 128) * 128,
    )
    tracking = TrackingConfig(
        min_parallax_for_keyframe=_get(
            data, "tracking", "min_parallax_for_keyframe", default=10.0
        ),
    )
    init = InitializationConfig(
        window_size=_get(data, "initialization", "window_size", default=10),
        min_parallax=_get(data, "initialization", "min_parallax", default=10.0),
        min_features=_get(data, "initialization", "min_features", default=100),
        min_observations=_get(data, "initialization", "min_observations", default=10),
        ransac_threshold=_get(data, "initialization", "ransac_threshold", default=0.1),
        ransac_iterations=_get(data, "initialization", "ransac_iterations", default=200),
        max_reprojection_error=_get(
            data, "initialization", "max_reprojection_error", default=5.0
        ),
    )
    imu = ImuConfig(
        frequency=_get(data, "imu", "frequency", default=200.0),
        gyro_noise=_get(data, "imu", "gyro_noise", default=0.001),
        accel_noise=_get(data, "imu", "accel_noise", default=0.01),
        gyro_bias_noise=_get(data, "imu", "gyro_bias_noise", default=0.0001),
        accel_bias_noise=_get(data, "imu", "accel_bias_noise", default=0.001),
    )
    viz = VisualizationConfig(
        scale=_get(data, "visualization", "scale", default=1.0),
        show_grid=bool(_get(data, "visualization", "show_grid", default=1)),
        grid_color=tuple(_get(data, "visualization", "grid_color", default=(100, 255, 100))),
        grid_thickness=_get(data, "visualization", "grid_thickness", default=1),
        max_age_for_color=_get(data, "visualization", "max_age_for_color", default=30),
        stable_age_threshold=_get(data, "visualization", "stable_age_threshold", default=5),
        highlight_clustered_grid=bool(
            _get(data, "visualization", "highlight_clustered_grid", default=1)
        ),
        clustered_grid_color=tuple(
            _get(data, "visualization", "clustered_grid_color", default=(255, 100, 100))
        ),
        clustered_std_ratio=_get(data, "visualization", "clustered_std_ratio", default=0.25),
    )
    t_bc_raw = _get(data, "extrinsics", "T_BC")
    t_bc = (
        tuple(tuple(float(x) for x in row) for row in t_bc_raw)
        if t_bc_raw is not None
        else VioConfig.t_bc
    )
    return VioConfig(
        camera=cam, features=feats, tracking=tracking, init=init, imu=imu,
        viz=viz, t_bc=t_bc, loop=fit_loop_config(LoopConfig(), cam),
    )


def fit_loop_config(loop: LoopConfig, cam: CameraConfig) -> LoopConfig:
    """Snap the ring-descriptor grid to divisors of the image size
    (the pooled reshape in loop/descriptor.py needs exact tiling)."""

    def best_divisor(n: int, target: int) -> int:
        for d in range(target, 0, -1):
            if n % d == 0:
                return d
        return 1

    bands = best_divisor(cam.height, loop.desc_bands)
    bins = best_divisor(cam.width, loop.desc_bins)
    if bands == loop.desc_bands and bins == loop.desc_bins:
        return loop
    return dataclasses.replace(loop, desc_bands=bands, desc_bins=bins)

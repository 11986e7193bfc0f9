"""Generate a synthetic 360 dataset in the reference layout.

Renders Gaussian-blob landmarks along a dynamically-rich analytic
trajectory into .npy ERP frames + cam_timestamps.txt + imu_data.csv +
groundtruth.tum, so the full CLI pipeline (and ATE evaluation), the
reference harness (refharness/), and robustness tests can run without
real data.

The trajectory is sinusoidal with closed-form velocity/acceleration
(|a| ~ 4 m/s^2 at --accel-scale 1.0) and the IMU is derived from the
analytic derivatives, so gravity direction and metric scale are well
observable — a monocular-inertial system should recover scale within a
few percent. (The r1 generator used a near-constant-velocity walk with
zero-order-hold finite-difference IMU; scale was ~unobservable and the
stock demo silently ran 4-5x off metric.)

Noise injection (all default off) for robustness testing:
  --pixel-noise    photometric Gaussian noise added to every frame
  --imu-noise      multiplier on the config IMU noise densities
  --bias-drift     gyro/accel bias random-walk per sqrt(s)
  --outlier-points N   blobs that MOVE in the world (break rigidity)

Usage: python tools/make_synthetic_dataset.py OUT_DIR [--frames N] ...
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

G = 9.81


def analytic_trajectory(ts: np.ndarray, accel_scale: float, yaw_rate: float):
    """Closed-form position/velocity/acceleration + rotation.

    p(t) amplitudes/frequencies chosen so peak |a| ~ 4 m/s^2 * accel_scale
    with sub-metre excursions (landmarks sit 3-9 m away).
    """
    s = accel_scale
    ax_, wx = 0.8 * s, 2.2
    ay_, wy = 0.55 * s, 1.8
    az_, wz = 0.3 * s, 1.5
    p = np.stack(
        [ax_ * np.sin(wx * ts), ay_ * (np.cos(wy * ts) - 1.0), az_ * np.sin(wz * ts)],
        axis=-1,
    )
    v = np.stack(
        [ax_ * wx * np.cos(wx * ts), -ay_ * wy * np.sin(wy * ts), az_ * wz * np.cos(wz * ts)],
        axis=-1,
    )
    a = np.stack(
        [-ax_ * wx**2 * np.sin(wx * ts), -ay_ * wy**2 * np.cos(wy * ts), -az_ * wz**2 * np.sin(wz * ts)],
        axis=-1,
    )
    phi = np.stack(
        [0.3 * np.sin(1.5 * ts), yaw_rate * ts, 0.2 * np.cos(1.2 * ts) - 0.2],
        axis=-1,
    )
    return p, v, a, phi


def revisit_trajectory(ts: np.ndarray, accel_scale: float, yaw_rate: float,
                       laps: int = 1):
    """Closed-loop trajectory: leaves the start, travels a smooth
    closed circuit, and RETURNS to the start pose — ``laps`` times over
    the sequence — the loop-closure/relocalization test geometry
    (VERDICT r4 item 3). With laps > 1 the camera re-traverses the SAME
    circuit, so odometry drift accumulates lap over lap while every
    lap-2+ keyframe has a lap-1 revisit to close against. High-
    frequency low-amplitude wiggle keeps the IMU excited (scale
    observable) on top of the slow circuit."""
    s = accel_scale
    T = float(ts[-1]) if len(ts) > 1 else 1.0
    w0 = 2.0 * np.pi * laps / T

    # slow closed circuit (period = sequence length)
    cx, cy, cz = 1.4, 0.9, 0.3

    def sincos(w, amp):
        return (
            amp * np.sin(w * ts),
            amp * w * np.cos(w * ts),
            -amp * w * w * np.sin(w * ts),
        )

    px, vx, ax = sincos(w0, cx)
    py, vy, ay = sincos(2 * w0, cy / 2)
    pz, vz, az = sincos(3 * w0, cz / 3)
    # high-frequency excitation (integer multiples of w0: still closed)
    k = max(int(round(2.0 / w0)), 8)  # ~2 rad/s wiggle
    for axi, amp in ((0, 0.10 * s), (1, 0.08 * s), (2, 0.05 * s)):
        w = k * w0 * (1.0 + 0.25 * axi)
        w = round(w / w0) * w0  # keep it closed
        p_, v_, a_ = sincos(w, amp)
        if axi == 0:
            px, vx, ax = px + p_, vx + v_, ax + a_
        elif axi == 1:
            py, vy, ay = py + p_, vy + v_, ay + a_
        else:
            pz, vz, az = pz + p_, vz + v_, az + a_

    p = np.stack([px, py, pz], axis=-1)
    v = np.stack([vx, vy, vz], axis=-1)
    a = np.stack([ax, ay, az], axis=-1)
    # yaw also closes (integer number of turns over the circuit)
    n_turns = max(round(yaw_rate * T / (2 * np.pi)), 1)
    phi = np.stack(
        [
            0.25 * np.sin(2 * w0 * ts / 1.0),
            (n_turns * w0) * ts,
            0.18 * np.sin(3 * w0 * ts) - 0.0,
        ],
        axis=-1,
    )
    return p, v, a, phi


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--points", type=int, default=500)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--fps", type=float, default=10.0)
    p.add_argument("--imu-hz", type=float, default=200.0)
    p.add_argument("--accel-scale", type=float, default=1.0,
                   help="trajectory dynamics multiplier (peak |a| ~ 4 m/s^2 at 1.0)")
    p.add_argument("--yaw-rate", type=float, default=0.25, help="rad/s")
    p.add_argument("--tilt", type=float, nargs=2, default=(0.06, -0.04),
                   help="gravity-direction tilt [theta_x, theta_y] (rad)")
    p.add_argument("--pixel-noise", type=float, default=0.0,
                   help="photometric Gaussian noise std (image range is [0,1])")
    p.add_argument("--imu-noise", type=float, default=0.0,
                   help="IMU white-noise multiplier (1.0 = config densities)")
    p.add_argument("--bias-drift", type=float, default=0.0,
                   help="bias random-walk multiplier (1.0 = config densities)")
    p.add_argument("--outlier-points", type=int, default=0,
                   help="number of landmarks that move in the world")
    p.add_argument("--outlier-speed", type=float, default=0.5, help="m/s")
    p.add_argument("--texture", action="store_true",
                   help="render dense natural-spectrum texture (camera "
                   "inside a texture-mapped sphere, true parallax) "
                   "instead of Gaussian blobs — the regime real 360 "
                   "footage puts the KLT front end in")
    p.add_argument("--texture-radius", type=float, default=6.0,
                   help="texture sphere radius in metres")
    # ---- photometric nuisances (VERDICT r3 Missing #1: real 360
    # footage has exposure change, motion blur, vignetting, sensor
    # noise — FeatureTracker.cpp:208-251 KLT must survive them) ----
    p.add_argument("--exposure", type=float, default=0.0,
                   help="per-frame exposure gain amplitude (0.2 -> "
                   "gain swings x0.8..x1.2 over the sequence)")
    p.add_argument("--exposure-bias", type=float, default=0.0,
                   help="per-frame additive black-level swing amplitude")
    p.add_argument("--motion-blur", type=float, default=0.0,
                   help="blur length in px per (rad/s) of angular rate "
                   "(horizontal ERP streak; ~exposure_time * width/2pi)")
    p.add_argument("--vignette", type=float, default=0.0,
                   help="latitude falloff strength: poles darkened by "
                   "this fraction (stitched-360 illumination rolloff)")
    # ---- dynamic-scene nuisances (VERDICT r4 item 7) ----
    p.add_argument("--moving-cluster", type=int, default=0,
                   help="number of blobs in a COHERENT independently-"
                   "moving object (a textured cluster on its own orbit) "
                   "— the rigidity-breaking case the rotation-RANSAC + "
                   "chi2-latch stack must reject")
    p.add_argument("--cluster-omega", type=float, default=0.6,
                   help="moving-cluster orbital rate (rad/s)")
    p.add_argument("--rolling-shutter", type=float, default=0.0,
                   help="row-time skew as a fraction of the frame "
                   "interval: row v is exposed at t + S*dt*(v/H - 1/2) "
                   "(rendered as 8 row bands at interpolated poses)")
    p.add_argument("--laps", type=int, default=1,
                   help="with --revisit: number of traversals of the "
                   "closed circuit (drift accumulates per lap)")
    p.add_argument("--revisit", action="store_true",
                   help="closed-loop trajectory that returns to the "
                   "start pose at the end (loop-closure test geometry)")
    p.add_argument("--blackout", type=int, nargs=2, default=None,
                   metavar=("FROM", "TO"),
                   help="render frames [FROM, TO) as sensor-noise-only "
                   "black (forced tracking loss; relocalization test)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import synthetic  # tests/synthetic.py
    from vio360_tpu.geometry import lie
    from vio360_tpu.io import trajectory as tio
    from vio360_tpu.solver import imu_init as imu_init_mod

    rng = np.random.default_rng(args.seed)
    os.makedirs(os.path.join(args.out_dir, "images"), exist_ok=True)

    # world
    pts = synthetic.make_point_world(args.seed, args.points, radius=(3.0, 9.0))
    n_out = min(args.outlier_points, len(pts))
    out_vel = np.zeros((len(pts), 3), np.float32)
    if n_out:
        d = rng.standard_normal((n_out, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        out_vel[:n_out] = d * args.outlier_speed

    # timeline at IMU rate; camera frames are every imu_hz/fps-th sample
    dt = 1.0 / args.imu_hz
    per_frame = int(round(args.imu_hz / args.fps))
    n_samples = (args.frames - 1) * per_frame + 1
    ts = np.arange(n_samples) * dt

    if args.revisit:
        p_w, v_w, a_w, phi = revisit_trajectory(
            ts, args.accel_scale, args.yaw_rate, laps=args.laps
        )
    else:
        p_w, v_w, a_w, phi = analytic_trajectory(
            ts, args.accel_scale, args.yaw_rate
        )
    r_wb = np.asarray(jax.vmap(lie.so3_exp)(jnp.asarray(phi, jnp.float32)))

    r_wg = np.asarray(
        imu_init_mod.gravity_dir_to_rotation(jnp.asarray(args.tilt, jnp.float32))
    )
    g_w = r_wg @ np.array([0.0, 0.0, -G])

    # IMU rows: accel from the analytic derivative, gyro from the
    # midpoint log of the rotation increments (exact to O(dt^2)).
    rows = np.zeros((n_samples, 7), np.float64)
    rows[:, 0] = ts
    dr = np.einsum("tij,tik->tjk", r_wb[:-2], r_wb[2:])  # R_i^T R_{i+2}
    omega_mid = np.asarray(
        jax.vmap(lie.so3_log)(jnp.asarray(dr, jnp.float32))
    ) / (2 * dt)
    rows[1:-1, 4:7] = omega_mid
    rows[0, 4:7] = omega_mid[0]
    rows[-1, 4:7] = omega_mid[-1]
    rows[:, 1:4] = np.einsum("tij,tj->ti", r_wb.transpose(0, 2, 1), a_w - g_w)

    if args.imu_noise > 0:
        # white noise: sigma_discrete = density * sqrt(rate)
        sq = np.sqrt(args.imu_hz)
        rows[:, 1:4] += rng.standard_normal((n_samples, 3)) * 0.01 * args.imu_noise * sq
        rows[:, 4:7] += rng.standard_normal((n_samples, 3)) * 0.001 * args.imu_noise * sq
    if args.bias_drift > 0:
        bg = np.cumsum(
            rng.standard_normal((n_samples, 3)) * 1e-4 * args.bias_drift * np.sqrt(dt), axis=0
        )
        ba = np.cumsum(
            rng.standard_normal((n_samples, 3)) * 1e-3 * args.bias_drift * np.sqrt(dt), axis=0
        )
        rows[:, 4:7] += bg
        rows[:, 1:4] += ba

    with open(os.path.join(args.out_dir, "imu_data.csv"), "w") as f:
        f.write("timestamp,ax,ay,az,gx,gy,gz\n")
        for row in rows:
            f.write(",".join(f"{v:.9f}" for v in row) + "\n")

    # camera frames
    frame_idx = np.arange(args.frames) * per_frame
    stamps = ts[frame_idx]
    with open(os.path.join(args.out_dir, "cam_timestamps.txt"), "w") as f:
        f.write("\n".join(f"{t:.6f}" for t in stamps) + "\n")

    pano = None
    if args.texture:
        # 2x the frame resolution keeps texture gradients sharp after
        # the renderer's bilinear resampling.
        pano = synthetic.make_panorama(
            args.seed + 77, 2 * args.height, 2 * args.width, octaves=6
        )

    # latitude-dependent illumination rolloff (optical, frame-constant)
    vignette_row = None
    if args.vignette > 0:
        lat = (np.arange(args.height, dtype=np.float32) + 0.5) / args.height - 0.5
        vignette_row = (1.0 - args.vignette * (2.0 * np.abs(lat)) ** 2)[:, None]

    # per-frame exposure: slow sinusoidal gain/black-level drift with a
    # random phase (auto-exposure hunting on real rigs)
    ph_g, ph_b = rng.uniform(0, 2 * np.pi, 2)
    k_arr = np.arange(args.frames, dtype=np.float32)
    gains = 1.0 + args.exposure * np.sin(2 * np.pi * k_arr / 23.0 + ph_g)
    biases = args.exposure_bias * np.sin(2 * np.pi * k_arr / 17.0 + ph_b)

    # coherent moving object: a ball of blobs orbiting on its own path
    cluster_local = None
    if args.moving_cluster:
        crng = np.random.default_rng(args.seed + 901)
        cluster_local = (
            crng.standard_normal((args.moving_cluster, 3)).astype(np.float32)
        )
        cluster_local *= 0.45 / np.maximum(
            np.linalg.norm(cluster_local, axis=1, keepdims=True), 1e-6
        ) * crng.uniform(0.3, 1.0, (args.moving_cluster, 1))

    def cluster_points(t: float) -> np.ndarray:
        ang = args.cluster_omega * t
        c = np.array([
            2.6 + 0.9 * np.cos(ang), 0.5 * np.sin(0.7 * ang),
            2.8 + 0.9 * np.sin(ang),
        ], np.float32)
        return c + cluster_local

    def render_at(si: int) -> np.ndarray:
        """Render the static world + moving cluster at IMU-sample index
        ``si`` (sub-frame pose access for rolling shutter)."""
        if args.texture:
            img = np.asarray(
                synthetic.render_textured_view(
                    pano, jnp.asarray(r_wb[si]), jnp.asarray(p_w[si], jnp.float32),
                    args.width, args.height, radius=args.texture_radius,
                )
            )
        else:
            pts_t = pts + out_vel * ts[si]
            img = np.asarray(
                synthetic.render_point_image(pts_t, r_wb[si], p_w[si], args.width, args.height)
            )
        if cluster_local is not None:
            img = np.clip(img + np.asarray(synthetic.render_point_image(
                cluster_points(ts[si]), r_wb[si], p_w[si],
                args.width, args.height,
            )), 0.0, 1.0)
        return img

    for k, fi in enumerate(frame_idx):
        if args.rolling_shutter > 0:
            # 8 row bands, each exposed at its own skewed time: pose
            # taken from the nearest IMU-rate sample (dt = 5 ms at
            # 200 Hz — finer than any realistic readout step)
            bands = 8
            h_px = args.height
            img = np.zeros((h_px, args.width), np.float32)
            for b in range(bands):
                r0, r1 = b * h_px // bands, (b + 1) * h_px // bands
                mid = (r0 + r1) / (2.0 * h_px) - 0.5
                si = int(np.clip(
                    round(fi + args.rolling_shutter * per_frame * mid),
                    0, n_samples - 1,
                ))
                img[r0:r1] = render_at(si)[r0:r1]
        else:
            img = render_at(fi)
        # optical chain order: exposure-time integration (motion blur)
        # -> lens/stitch rolloff (vignette) -> electronic gain/offset
        # -> sensor noise -> quantization clip
        if args.motion_blur > 0:
            # streak along u (yaw dominates ERP flow); length from the
            # frame's angular speed. u wraps (ERP is periodic).
            w_speed = float(np.linalg.norm(rows[fi, 4:7]))
            blur_len = int(np.clip(round(w_speed * args.motion_blur), 1, 31))
            if blur_len > 1:
                img = np.mean(
                    [np.roll(img, s, axis=1)
                     for s in range(-(blur_len // 2), blur_len - blur_len // 2)],
                    axis=0,
                ).astype(np.float32)
        if vignette_row is not None:
            img = img * vignette_row
        img = img * gains[k] + biases[k]
        if args.pixel_noise > 0:
            img = img + rng.standard_normal(img.shape).astype(np.float32) * args.pixel_noise
        img = np.clip(img, 0.0, 1.0)
        if args.blackout is not None and args.blackout[0] <= k < args.blackout[1]:
            # total exposure failure: sensor noise floor only
            img = np.clip(
                rng.standard_normal(img.shape).astype(np.float32) * 0.01 + 0.02,
                0.0, 1.0,
            )
        np.save(os.path.join(args.out_dir, "images", f"{k:06d}.npy"), img.astype(np.float32))

    tio.write_tum(
        os.path.join(args.out_dir, "groundtruth.tum"), stamps, r_wb[frame_idx], p_w[frame_idx]
    )
    print(
        f"wrote {args.frames} frames to {args.out_dir} "
        f"(peak |a|={np.linalg.norm(a_w, axis=1).max():.2f} m/s^2, "
        f"extent={np.linalg.norm(p_w - p_w.mean(0), axis=1).max():.2f} m)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

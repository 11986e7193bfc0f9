"""Generate a synthetic 360 dataset in the reference layout.

Renders Gaussian-blob landmarks along a known trajectory into .npy ERP
frames + cam_timestamps.txt + imu_data.csv + groundtruth.tum, so the
full CLI pipeline (and ATE evaluation) can run without real data.

Usage: python tools/make_synthetic_dataset.py OUT_DIR [--frames N]
       [--width W] [--height H] [--points M] [--seed S]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("out_dir")
    p.add_argument("--frames", type=int, default=40)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--points", type=int, default=500)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--step", type=float, default=0.1)
    p.add_argument("--rot-step", type=float, default=0.004)
    p.add_argument("--fps", type=float, default=10.0)
    p.add_argument("--imu-hz", type=float, default=200.0)
    args = p.parse_args(argv)

    import synthetic  # tests/synthetic.py
    from vio360_tpu.io import trajectory as tio

    os.makedirs(os.path.join(args.out_dir, "images"), exist_ok=True)
    pts = synthetic.make_point_world(args.seed, args.points, radius=(3.0, 10.0))
    rs, ts = synthetic.make_trajectory(args.frames, step=args.step, rot_step=args.rot_step)

    dt = 1.0 / args.fps
    stamps = np.arange(args.frames) * dt
    with open(os.path.join(args.out_dir, "cam_timestamps.txt"), "w") as f:
        f.write("\n".join(f"{t:.6f}" for t in stamps) + "\n")

    for i in range(args.frames):
        img = synthetic.render_point_image(pts, rs[i], ts[i], args.width, args.height)
        np.save(os.path.join(args.out_dir, "images", f"{i:06d}.npy"), np.asarray(img))

    # Simple consistent IMU: finite-difference the trajectory (gravity in -Z
    # world, body frame = camera frame). Adequate for pipeline plumbing.
    imu_t = np.arange(0.0, stamps[-1] + 1e-9, 1.0 / args.imu_hz)
    g_w = np.array([0.0, 0.0, -9.81])
    rows = []
    vel = np.gradient(ts, dt, axis=0)
    acc_w = np.gradient(vel, dt, axis=0)
    for t in imu_t:
        i = min(int(t / dt), args.frames - 1)
        r = rs[i]
        omega = np.zeros(3)
        if 0 < i < args.frames - 1:
            dr = rs[i - 1].T @ rs[i + 1]
            angle = np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1))
            if angle > 1e-9:
                ax = (
                    np.array(
                        [dr[2, 1] - dr[1, 2], dr[0, 2] - dr[2, 0], dr[1, 0] - dr[0, 1]]
                    )
                    / (2 * np.sin(angle))
                )
                omega = ax * angle / (2 * dt)
        a_b = r.T @ (acc_w[i] - g_w)
        rows.append([t, *a_b, *omega])
    with open(os.path.join(args.out_dir, "imu_data.csv"), "w") as f:
        f.write("timestamp,ax,ay,az,gx,gy,gz\n")
        for row in rows:
            f.write(",".join(f"{v:.9f}" for v in row) + "\n")

    tio.write_tum(os.path.join(args.out_dir, "groundtruth.tum"), stamps, rs, ts)
    print(f"wrote {args.frames} frames to {args.out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Command-line VO/VIO runner.

Counterpart of the reference's ``app/main.cpp`` (dataset loading, main
loop, ``main.cpp:121-236``) minus the Pangolin GUI: results go to a
TUM trajectory file + JSONL per-frame metrics instead of a window
(SURVEY.md §5: trajectory export is required to compute ATE at all).

Usage::

    python -m vio360_tpu <dataset_dir> [--config cfg.yaml]
        [--output traj.tum] [--metrics metrics.jsonl] [--max-frames N]

Dataset layout (build.sh:63 convention)::

    dataset_dir/cam_timestamps.txt
    dataset_dir/imu_data.csv        (optional)
    dataset_dir/images/*.png|npy
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="vio360", description="TPU-native 360 visual-inertial odometry"
    )
    p.add_argument("dataset_dir", help="dataset directory (images/ + cam_timestamps.txt)")
    p.add_argument("--config", default=None, help="reference-format YAML config")
    p.add_argument("--output", default="trajectory.tum", help="TUM trajectory output path")
    p.add_argument("--metrics", default=None, help="JSONL per-frame metrics path")
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument(
        "--vo", action="store_true",
        help="visual-only mode: ignore the dataset's IMU stream",
    )
    p.add_argument("--quiet", action="store_true")
    p.add_argument(
        "--step", action="store_true",
        help="interactive stepping: pause after every frame "
        "(Enter = next frame, a number = run N frames, c = continue "
        "free-running, q = quit). Counterpart of the reference's "
        "Pangolin pause/step UI (app/main.cpp:179-190, "
        "VizUtils.h:77-91), driving the headless artifacts instead",
    )
    p.add_argument(
        "--pause-on-init", action="store_true",
        help="pause once when the estimator initializes (the "
        "reference's pause_on_initialization flag, main.cpp:185-190)",
    )
    p.add_argument(
        "--no-pipelined", action="store_true",
        help="disable the software-pipelined frame loop (one-frame "
        "deferred host sync; results still arrive in order)",
    )
    p.add_argument(
        "--viz-dir",
        default=None,
        help="write tracking video + map.ply + viewer.html + trajectory.png here",
    )
    p.add_argument("--viz-fps", type=float, default=20.0)
    p.add_argument("--checkpoint", default=None, help="write a state snapshot here at the end")
    p.add_argument(
        "--checkpoint-every", type=int, default=0,
        help="also snapshot every N frames (requires --checkpoint)",
    )
    p.add_argument("--resume", default=None, help="resume from a state snapshot")
    p.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the run into DIR",
    )
    p.add_argument(
        "--lk-backend", default=None,
        choices=["auto", "xla", "matmul", "pallas"],
        help="LK tracking kernel (default: config / auto)",
    )
    p.add_argument(
        "--solver-backend", default=None,
        choices=["auto", "xla", "pallas", "pallas-interpret"],
        help="PnP/BA solver kernel; pallas-interpret runs the TPU "
        "Pallas megakernels through the interpreter on CPU",
    )
    p.add_argument(
        "--x64", action="store_true",
        help="run the WHOLE pipeline in double precision (parity with "
        "the reference, which optimizes in double via Ceres/Eigen — "
        "Optimizer.cpp operates on double arrays). Enables JAX x64 "
        "semantics and routes kernels through the XLA formulations "
        "(the Pallas megakernels are f32-only by Mosaic). Measured "
        "cost: see SCALING.md. Default f32 + measured mitigations "
        "(polar renorm, relative ridges) matches f64 to mm-level",
    )
    p.add_argument(
        "--no-pose-graph", action="store_true",
        help="disable the export-time pose-graph refinement of the "
        "evicted-keyframe history (solver/pose_graph.py)",
    )
    p.add_argument(
        "--mesh", default=None, metavar="AXIS=N",
        help="distribute the window BA over a device mesh, e.g. lm=8 "
        "shards the landmark axis over 8 devices (distributed VIO; "
        "requires that many JAX devices)",
    )
    p.add_argument(
        "--frames-per-dispatch", type=int, default=None, metavar="K",
        help="dispatch K steady-state frames as ONE scanned program "
        "over ONE stacked upload (throughput mode for dispatch-latency "
        "links; adds up to K-1 frames of result latency). Default 1",
    )
    p.add_argument(
        "--image-transport", default=None, choices=["f32", "u8", "u16"],
        help="wire dtype of the per-frame image upload (default: "
        "config; u8 = the reference's own 8-bit camera precision)",
    )
    args = p.parse_args(argv)

    if not os.path.isdir(args.dataset_dir):
        print(f"error: dataset directory not found: {args.dataset_dir}", file=sys.stderr)
        return 2
    ts_file = os.path.join(args.dataset_dir, "cam_timestamps.txt")
    img_dir = os.path.join(args.dataset_dir, "images")
    if not os.path.isfile(ts_file):
        print(f"error: missing {ts_file}", file=sys.stderr)
        return 2
    if not os.path.isdir(img_dir):
        print(f"error: missing images directory {img_dir}", file=sys.stderr)
        return 2

    if args.x64:
        import jax

        jax.config.update("jax_enable_x64", True)

    from . import config as cfgmod
    from .estimator.estimator import Estimator
    from .io import dataset as ds
    from .io import trajectory as tio
    from .utils.logging import MetricsWriter, get_logger

    log = get_logger("vio360.cli")
    if args.config:
        if not os.path.isfile(args.config):
            print(f"error: config not found: {args.config}", file=sys.stderr)
            return 2
        cfg = cfgmod.load_yaml(args.config)
    else:
        cfg = cfgmod.VioConfig()
    import dataclasses as _dc

    if args.lk_backend:
        cfg = _dc.replace(
            cfg, optical_flow=_dc.replace(cfg.optical_flow, backend=args.lk_backend)
        )
    if args.solver_backend:
        cfg = _dc.replace(
            cfg, solver=_dc.replace(cfg.solver, backend=args.solver_backend)
        )
    if args.mesh:
        cfg = _dc.replace(cfg, solver=_dc.replace(cfg.solver, mesh=args.mesh))
    if args.frames_per_dispatch:
        cfg = _dc.replace(cfg, solver=_dc.replace(
            cfg.solver, frames_per_dispatch=args.frames_per_dispatch,
            fetch_every=max(cfg.solver.fetch_every,
                            args.frames_per_dispatch),
        ))
    if args.image_transport:
        cfg = _dc.replace(cfg, solver=_dc.replace(
            cfg.solver, image_transport=args.image_transport
        ))
    if args.no_pose_graph:
        cfg = _dc.replace(
            cfg, pose_graph=_dc.replace(cfg.pose_graph, enabled=False)
        )
    if args.x64:
        # Mosaic has no f64 lowering; run the XLA twins of every kernel
        cfg = _dc.replace(
            cfg,
            solver=_dc.replace(cfg.solver, backend="xla"),
            optical_flow=_dc.replace(cfg.optical_flow, backend="matmul"),
        )
        log.info("x64: double-precision pipeline (XLA kernel backends)")

    data = ds.VioDataset(args.dataset_dir, image_size=(cfg.camera.width, cfg.camera.height))
    n = len(data)
    if n == 0:
        print("error: dataset contains no frames", file=sys.stderr)
        return 2
    if args.max_frames:
        n = min(n, args.max_frames)
    log.info("dataset: %d frames, %d IMU samples", n, data.imu.shape[0])

    if args.resume:
        if not os.path.isfile(args.resume):
            print(f"error: checkpoint not found: {args.resume}", file=sys.stderr)
            return 2
        est = Estimator.load(args.resume, cfg)
        log.info("resumed from %s at frame %d", args.resume, est.frame_id)
    else:
        est = Estimator(cfg)
    metrics = MetricsWriter(args.metrics)
    video = None
    if args.viz_dir:
        from . import viz

        os.makedirs(args.viz_dir, exist_ok=True)
        video = viz.VideoWriter(os.path.join(args.viz_dir, "tracking.mp4"), fps=args.viz_fps)
    profiler_ctx = None
    if args.profile:
        import contextlib

        import jax

        os.makedirs(args.profile, exist_ok=True)
        profiler_ctx = contextlib.ExitStack()
        profiler_ctx.enter_context(jax.profiler.trace(args.profile))
    t0 = time.time()
    n_kf = 0
    # The pipelined loop (estimator.process_frame_async) defers each
    # frame's host sync behind the next frame's dispatch — ~2x
    # throughput on dispatch-latency links. Per-frame hooks that read
    # estimator state synchronously (viz overlay, periodic checkpoints)
    # need the sequential loop.
    interactive = args.step or args.pause_on_init
    pipelined = not args.no_pipelined and video is None and not (
        args.checkpoint and args.checkpoint_every
    ) and not interactive

    step_state = {"paused": args.step, "run_until": -1, "inited": False}

    def interact(res):
        """Reference pause/step loop (main.cpp:179-190) as a prompt:
        blocks after a frame when stepping is active."""
        if args.pause_on_init and not step_state["inited"] and res.state not in (
            "bootstrapping",
        ):
            step_state["inited"] = True
            step_state["paused"] = True
            log.info("initialized at frame %d — paused (--pause-on-init)",
                     res.frame_id)
        if not step_state["paused"] or res.frame_id < step_state["run_until"]:
            return True
        while True:
            try:
                cmd = input(
                    f"[frame {res.frame_id} {res.state}"
                    f"{' KF' if res.is_keyframe else ''}] "
                    "Enter=step, N=run N, c=continue, q=quit> "
                ).strip()
            except EOFError:
                return False
            if cmd == "":
                return True
            if cmd == "c":
                step_state["paused"] = False
                return True
            if cmd == "q":
                return False
            if cmd.isdigit():
                step_state["run_until"] = res.frame_id + int(cmd)
                return True

    def handle(res):
        nonlocal n_kf
        n_kf += int(res.is_keyframe)
        metrics.write(
            frame=res.frame_id,
            t=res.timestamp,
            state=res.state,
            keyframe=res.is_keyframe,
            tracked=res.n_tracked,
            inliers=res.n_pnp_inliers,
            **{k: v for k, v in res.diag.items() if np.isscalar(v)},
        )
        if not args.quiet and (res.frame_id % 10 == 0 or res.is_keyframe):
            log.info(
                "frame %4d  %-13s tracked=%4d inliers=%4d%s",
                res.frame_id, res.state, res.n_tracked, res.n_pnp_inliers,
                "  [KF]" if res.is_keyframe else "",
            )

    for frame in data:
        if frame.index >= n:
            break
        if args.resume and frame.index <= est.frame_id:
            continue  # already processed before the snapshot
        imu = None if args.vo else frame.imu
        if pipelined:
            for res in est.process_frame_async(frame.image, frame.timestamp, imu):
                handle(res)
            continue
        res = est.process_frame(frame.image, frame.timestamp, imu)
        if args.checkpoint and args.checkpoint_every and (
            res.frame_id % args.checkpoint_every == 0
        ):
            est.save(args.checkpoint)
        if video is not None:
            tr = est.track
            video.write(
                viz.draw_tracking(
                    frame.image,
                    np.asarray(tr.uv), np.asarray(tr.prev_uv),
                    np.asarray(tr.valid), np.asarray(tr.age),
                    viz=cfg.viz,
                    grid_cols=cfg.features.grid_cols, grid_rows=cfg.features.grid_rows,
                )
            )
        handle(res)
        if interactive and not interact(res):
            log.info("stopped at frame %d (interactive quit)", res.frame_id)
            break
    if pipelined:
        for res in est.flush():
            handle(res)
    wall = time.time() - t0
    if profiler_ctx is not None:
        profiler_ctx.close()
        log.info("profiler trace written to %s", args.profile)
    stage_summary = est.timers.summary()
    for stage, s in sorted(stage_summary.items(), key=lambda kv: -kv[1]["total_s"]):
        log.info(
            "stage %-14s %6.1f ms/call x%-4d (%.2fs total)",
            stage, s["mean_ms"], s["count"], s["total_s"],
        )
    metrics.write(event="stage_summary", **{k: v["mean_ms"] for k, v in stage_summary.items()})
    metrics.close()
    if args.checkpoint:
        est.save(args.checkpoint)
        log.info("checkpoint written to %s", args.checkpoint)

    ts, rs, ps = est.export_trajectory()
    tio.write_tum(args.output, ts, rs, ps)
    if args.viz_dir:
        video.close()
        kf_mask = np.asarray(est.win.kf_id) >= 0
        kf_pos = np.asarray(est.win.kf_t)[kf_mask]
        lm_pos = np.asarray(est.win.lm_pos)
        lm_alive = np.asarray(est.win.lm_alive)
        viz.write_ply(os.path.join(args.viz_dir, "map.ply"), lm_pos, lm_alive, ps)
        viz.write_html_viewer(
            os.path.join(args.viz_dir, "viewer.html"), ps, lm_pos, lm_alive, kf_pos
        )
        viz.plot_trajectory(os.path.join(args.viz_dir, "trajectory.png"), ps, keyframes=kf_pos)
        log.info("viz written to %s", args.viz_dir)
    log.info(
        "done: %d frames in %.1fs (%.2f fps), %d keyframes, %d landmarks -> %s",
        len(ts), wall, len(ts) / max(wall, 1e-9), n_kf,
        int(est.win.lm_alive.sum()), args.output,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

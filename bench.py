"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric: sliding-window BA latency per frame at the reference's
operating point (10 keyframes x 2048-landmark window, 960x480 ERP),
measured steady-state on the available accelerator. BASELINE.md target:
< 5 ms/frame on one chip -> vs_baseline = 5.0 / measured_ms (>1 beats
the target). Extra fields report the per-frame front-end+PnP step and
device info.
"""

from __future__ import annotations

import json
import time

import numpy as np


def time_fn(fn, argsets, warmup=2, iters=12):
    """Pipelined steady-state latency, cycling DISTINCT input sets.

    The tunneled-TPU relay can return cached results for repeated
    executions on identical buffers, so every iteration must see fresh
    data; per-call block_until_ready would measure the relay's ~26 ms
    round trip instead of device time, so sync once at the end (this is
    also the streaming-VIO operating mode: frames are pipelined)."""
    import jax

    if not isinstance(argsets, list):
        argsets = [argsets]
    for _ in range(warmup):
        out = fn(*argsets[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*argsets[i % len(argsets)]) for i in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def bench_window_ba():
    import jax
    import jax.numpy as jnp

    from vio360_tpu.solver import ba

    k, m, w, h = 10, 2048, 960, 480
    from vio360_tpu.geometry import camera as cam

    argsets = []
    for seed in range(4):
        rng = np.random.default_rng(seed)
        pts = jnp.asarray(
            rng.uniform(-6, 6, (m, 3)) + np.array([0, 0, 8.0]), jnp.float32
        )
        rs = jnp.broadcast_to(jnp.eye(3), (k, 3, 3)).copy()
        ts = jnp.asarray(np.cumsum(rng.uniform(-0.05, 0.08, (k, 3)), 0), jnp.float32)
        p_c = pts[None] - ts[:, None]
        uv = cam.project(p_c, w, h)
        uv = uv + jnp.asarray(rng.standard_normal(uv.shape) * 0.5, jnp.float32)
        # realistic density: ~60% of landmark-frame pairs observed
        mask = jnp.asarray(rng.random((k, m)) < 0.6)
        argsets.append((rs, ts, pts, uv, mask))
    fixed_pose = jnp.zeros(k, bool).at[0].set(True)
    fixed_point = jnp.zeros(m, bool)
    marg = jnp.zeros(m, bool)

    def run(rs, ts, pts, uv, mask):
        res = ba.run_ba(
            rs, ts, pts, uv, mask, fixed_pose, fixed_point, marg,
            jnp.eye(3), jnp.zeros(3), w, h, max_iterations=10,
        )
        return res.r_wb, res.t_wb, res.points, res.final_cost, res.num_iterations

    fn = jax.jit(run)
    dt = time_fn(fn, argsets)
    # iterations actually executed (LM may converge early; report per-solve
    # latency as the per-frame number — one local BA per keyframe)
    out = fn(*argsets[0])
    iters = int(out[4])
    return dt * 1e3, iters


def bench_frame_step():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    fn, args = ge.entry()
    # Distinct image buffers per iteration (horizontal rolls of the ERP
    # frame are valid new frames) so the relay can't serve cached runs.
    img_prev, img_next = np.asarray(args[0]), np.asarray(args[1])
    argsets = [
        (
            jax.device_put(jnp.asarray(np.roll(img_prev, 3 * i, axis=1))),
            jax.device_put(jnp.asarray(np.roll(img_next, 3 * i, axis=1))),
            *args[2:],
        )
        for i in range(6)
    ]
    jfn = jax.jit(fn)
    dt = time_fn(jfn, argsets, warmup=2, iters=12)
    return dt * 1e3


def bench_frame_step_device():
    """TRUE device time of the frame step, separated from the tunnel
    relay's ~1-1.5 ms per-execution overhead (measured; SCALING.md §1):
    run the step N times inside one jit (data-dependent chain) and take
    the slope between N=1 and N=17. On a local (non-tunneled) TPU the
    external and device numbers coincide."""
    import functools

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge

    fn, args = ge.entry()
    rest = args[2:]

    def chain(n, img_a, img_b):
        def body(i, ab):
            a, b = ab
            r_wb, t_wb, uv_new, status, n_inl = fn(a, b, *rest)
            # feed a tiny function of the outputs back into the next
            # frame so XLA cannot hoist the step out of the loop
            b2 = b + (t_wb[0] + jnp.mean(uv_new) * 1e-9) * 1e-6
            return (b, b2)

        return jax.lax.fori_loop(0, n, body, (img_a, img_b))

    times = {}
    for n in (1, 17):
        f = jax.jit(functools.partial(chain, n))
        dt = time_fn(f, [(args[0], args[1])], warmup=2, iters=6)
        times[n] = dt
    return (times[17] - times[1]) / 16 * 1e3


def bench_weak_scaling():
    """Device-count weak scaling: frames/s per stream with one stream
    per device at N=1 vs N=2 virtual CPU devices (the largest genuine
    parallel step on this 2-core host; SCALING.md §2). The serving
    program is collective-free (asserted by
    test_multi_seq.py::test_no_collectives_in_hlo), so this measures
    the actual device-scaling axis of BASELINE's >=80% target."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.abspath(__file__))
    env = {
        **{k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"},
        "JAX_PLATFORMS": "cpu",
    }
    fps = {}
    for n in (1, 2):
        r = subprocess.run(
            [sys.executable, os.path.join(root, "tools", "bench_weak_scaling.py"), str(n)],
            env=env, capture_output=True, text=True, timeout=900,
        )
        try:
            fps[n] = json.loads(r.stdout.strip().splitlines()[-1])["fps_per_stream"]
        except Exception:
            return None, None
    return fps, fps[2] / fps[1]


def bench_weak_scaling_mp():
    """Cross-PROCESS weak scaling: 2 jax.distributed processes x 1
    pinned core x 1 stream each on the product's global (seq) mesh
    (tools/bench_weak_scaling_mp.py), vs the same step in 1 process.
    The serving program is collective-free, so this measures the
    process boundary's real cost on the multi-host serving path."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.abspath(__file__))
    env = {
        **{k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"},
    }
    tool = os.path.join(root, "tools", "bench_weak_scaling_mp.py")

    def run(nprocs):
        port = 21000 + (os.getpid() % 9000)
        coord = f"127.0.0.1:{port}"
        procs = [
            subprocess.Popen(
                [sys.executable, tool, str(nprocs), str(i), coord],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(nprocs)
        ]
        fps = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            if p.returncode:
                return None
            fps.append(json.loads(out.strip().splitlines()[-1])["fps_per_stream"])
        return sum(fps) / len(fps)

    try:
        f1 = run(1)
        f2 = run(2)
    except Exception:
        return None, None
    if not f1 or not f2:
        return None, None
    return {1: f1, 2: f2}, f2 / f1


def bench_multi_stream(batches=(1, 8)):
    """Frames/s serving B independent camera streams on ONE chip via the
    multi_seq sharded frame step. NOTE (SCALING.md §1): on one device
    this is an OCCUPANCY metric — one stream's LK workload already
    saturates the chip, so B-stream throughput is bounded by hardware,
    not by the program. The BASELINE >=80% scaling target is the
    device-count axis (bench_weak_scaling), not this."""
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from vio360_tpu.parallel import multi_seq

    w, h = 960, 480
    _, args = ge.entry()
    mesh = multi_seq.make_seq_mesh(jax.devices()[:1])
    step = multi_seq.make_multi_seq_frame_step(mesh, w, h)

    out = {}
    for b in batches:
        def tile(x):
            return jnp.broadcast_to(x[None], (b, *x.shape)).copy()

        argsets = []
        for i in range(4):
            ip = jnp.asarray(np.roll(np.asarray(args[0]), 3 * i, axis=1))
            inx = jnp.asarray(np.roll(np.asarray(args[1]), 3 * i, axis=1))
            argsets.append(
                (tile(ip), tile(inx), *[tile(a) for a in args[2:9]], *args[9:])
            )
        dt = time_fn(step, argsets, warmup=2, iters=8)
        out[b] = b / dt  # frames/s across all streams
    eff = out[batches[-1]] / (batches[-1] * out[batches[0]])
    return out, eff


def bench_pipeline_fps():
    """MEASURED end-to-end pipeline throughput on the accelerator — the
    ACTUAL product loop (Estimator.process_frame over a 960x480 VIO
    sequence at the reference's operating point; cli.py:162-200 ≙
    app/main.cpp:178-223), not a kernel-level bound. Pass 1 warms every
    jit cache (bootstrap, init, fused tracking, VIBA, triangulation,
    marginals); pass 2 re-runs a FRESH estimator over the same frames
    and is timed wall-clock end to end — including every host sync and
    dispatch the product makes per frame (the steady-state frame is ONE
    fused dispatch + one scalar read, estimator/fused.py)."""
    import os
    import subprocess
    import sys
    import time

    root = os.path.dirname(os.path.abspath(__file__))
    seq = "/tmp/bench_seq_prod120"
    env = {
        **{k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"},
        "JAX_PLATFORMS": "cpu",
    }
    if not os.path.isfile(os.path.join(seq, "groundtruth.tum")):
        subprocess.run(
            [sys.executable, os.path.join(root, "tools", "make_synthetic_dataset.py"),
             seq, "--frames", "120", "--width", "960", "--height", "480",
             "--texture", "--pixel-noise", "0.02"],
            env=env, check=True, capture_output=True,
        )

    from vio360_tpu import config as cfgmod
    from vio360_tpu.estimator.estimator import Estimator
    from vio360_tpu.io import dataset as ds

    cfg = cfgmod.VioConfig()  # defaults ARE the reference operating point
    data = ds.VioDataset(seq, image_size=(cfg.camera.width, cfg.camera.height))
    frames = [(f.image, f.timestamp, f.imu) for f in data]

    def run(pipelined: bool):
        est = Estimator(cfg)
        t0 = time.perf_counter()
        states = []
        for img, t, imu in frames:
            if pipelined:
                states += [
                    r.state for r in est.process_frame_async(img, t, imu)
                ]
            else:
                states.append(est.process_frame(img, t, imu).state)
        if pipelined:
            states += [r.state for r in est.flush()]
        dt = time.perf_counter() - t0
        return est, dt, states

    run(False)  # warm: compile everything the product loop reaches
    run(True)   # warm the pipelined resolve path too
    est, dt, states = run(True)
    n_tracking = sum(s.startswith("tracking") for s in states)
    if n_tracking < len(frames) // 2:
        return None, None  # tracking collapsed; fps would be meaningless
    fps = len(frames) / dt
    ts = est.timers.summary().get("tracking_step")
    return fps, (ts["mean_ms"] if ts else None)


def bench_accuracy():
    """End-to-end accuracy on the stock 30-frame synthetic VIO demo
    (CPU subprocess — accuracy is platform-independent; the driver's
    BENCH record then tracks ATE/scale regressions round over round)."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.abspath(__file__))
    seq = "/tmp/bench_seq30"
    env = {
        **{k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"},
        "JAX_PLATFORMS": "cpu",
    }
    if not os.path.isfile(os.path.join(seq, "groundtruth.tum")):
        subprocess.run(
            [sys.executable, os.path.join(root, "tools", "make_synthetic_dataset.py"),
             seq, "--frames", "30"],
            env=env, check=True, capture_output=True,
        )
    traj = os.path.join(seq, "bench_traj.tum")
    r = subprocess.run(
        [sys.executable, "-m", "vio360_tpu", seq, "--config",
         os.path.join(root, "configs", "synthetic_480.yaml"),
         "--output", traj, "--quiet"],
        env=env, cwd=root, capture_output=True, text=True,
    )
    if r.returncode:
        return None
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "evaluate_ate.py"),
         traj, os.path.join(seq, "groundtruth.tum")],
        env=env, capture_output=True, text=True,
    )
    try:
        return json.loads(r.stdout.strip().splitlines()[-1])
    except Exception:
        return None


def main():
    import jax

    try:
        # persist compiled programs across bench/driver invocations
        # (the fused keyframe program alone compiles ~60 s at the
        # production shape)
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass
    dev = jax.devices()[0]
    ba_ms, ba_iters = bench_window_ba()
    frame_ms = bench_frame_step()
    frame_dev_ms = bench_frame_step_device()
    streams, eff = bench_multi_stream()
    pipe_fps, pipe_track_ms = bench_pipeline_fps()
    ws_fps, ws_eff = bench_weak_scaling()
    mp_fps, mp_eff = bench_weak_scaling_mp()
    acc = bench_accuracy()
    target_ms = 5.0
    # Per-stream batching cost: chip time per frame at B=8 (total fps
    # counts all streams) over the direct unbatched step (1.0 =
    # batching is free; chip saturated by one stream; SCALING.md §1).
    per_stream_b8_ms = 1e3 / streams[8]
    rec = {
        "metric": "sliding_window_ba_latency",
        "value": round(ba_ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(target_ms / ba_ms, 3),
        "ba_lm_iterations": ba_iters,
        "frontend_pnp_step_ms": round(frame_ms, 3),
        "frontend_pnp_step_device_ms": round(frame_dev_ms, 3),
        "vo_fps_upper_bound": round(1e3 / (frame_ms + ba_ms / 5.0), 1),
        "multi_stream_fps": {str(b): round(v, 1) for b, v in streams.items()},
        "single_chip_occupancy_eff": round(eff, 3),
        "single_chip_batching_cost": round(per_stream_b8_ms / frame_ms, 3),
        "device": str(dev),
        "platform": dev.platform,
    }
    if pipe_fps is not None:
        # the MEASURED end-to-end product-loop number (not a bound)
        rec["pipeline_fps"] = round(pipe_fps, 1)
        if pipe_track_ms is not None:
            rec["pipeline_tracking_step_ms"] = round(pipe_track_ms, 3)
    if ws_eff is not None:
        rec["weak_scaling_fps_per_stream"] = {
            str(n): round(v, 2) for n, v in ws_fps.items()
        }
        rec["device_scaling_efficiency_2dev"] = round(ws_eff, 3)
    if mp_eff is not None:
        rec["cross_process_fps_per_stream"] = {
            str(n): round(v, 2) for n, v in mp_fps.items()
        }
        rec["cross_process_scaling_efficiency_2proc"] = round(mp_eff, 3)
    if acc:
        rec["ate_rmse_se3"] = round(acc["ate_rmse_se3"], 4)
        rec["scale_error"] = round(acc["scale_error"], 4)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

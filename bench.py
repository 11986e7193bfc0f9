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


def main():
    import jax

    dev = jax.devices()[0]
    ba_ms, ba_iters = bench_window_ba()
    frame_ms = bench_frame_step()
    target_ms = 5.0
    print(
        json.dumps(
            {
                "metric": "sliding_window_ba_latency",
                "value": round(ba_ms, 3),
                "unit": "ms/frame",
                "vs_baseline": round(target_ms / ba_ms, 3),
                "ba_lm_iterations": ba_iters,
                "frontend_pnp_step_ms": round(frame_ms, 3),
                "vo_fps_upper_bound": round(1e3 / (frame_ms + ba_ms / 5.0), 1),
                "device": str(dev),
                "platform": dev.platform,
            }
        )
    )


if __name__ == "__main__":
    main()

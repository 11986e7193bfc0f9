"""Op-by-op relay ledger for the steady-state tracking frame.

VERDICT r4 item 1: BENCH_r04 measured pipeline_tracking_step_ms =
143.7 while the documented cost model (3 relay ops x ~30 ms) predicts
~90. This tool breaks the product loop's per-frame wall clock into its
host-visible operations so the ledger in SCALING.md is measured, not
inferred:

  pack      host-side numpy packing (fused.pack_frame_input)
  put       jax.device_put of the packed frame buffer
  dispatch  the fused tracking_step call returning (async submit)
  fetch     np.asarray(bundle) — blocks on upload+compute+readback
  host      everything after the fetch (records, result assembly)

Also times the raw relay primitives (tiny put / eager op / tiny fetch)
for the per-op baseline. Run WITH the TPU env (no env stripping).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_sequence(seq: str, frames: int = 60) -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **{k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"},
        "JAX_PLATFORMS": "cpu",
    }
    if not os.path.isfile(os.path.join(seq, "groundtruth.tum")):
        subprocess.run(
            [sys.executable,
             os.path.join(root, "tools", "make_synthetic_dataset.py"),
             seq, "--frames", str(frames), "--width", "960", "--height",
             "480", "--texture", "--pixel-noise", "0.02"],
            env=env, check=True, capture_output=True,
        )


def relay_primitives():
    import jax
    import jax.numpy as jnp

    out = {}
    x = np.zeros(20, np.float32)
    d = jax.device_put(x)
    jax.block_until_ready(d)

    def t(fn, n=5):
        fn()
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n * 1e3

    out["put_tiny_ms"] = t(lambda: jax.block_until_ready(jax.device_put(x)))
    big = np.zeros((482, 960), np.float32)
    out["put_frame_ms"] = t(lambda: jax.block_until_ready(jax.device_put(big)))
    f = jax.jit(lambda a: a * 2 + 1)
    jax.block_until_ready(f(d))
    out["tiny_dispatch_sync_ms"] = t(lambda: jax.block_until_ready(f(d)))
    out["fetch_tiny_ms"] = t(lambda: np.asarray(f(d)))
    out["eager_op_sync_ms"] = t(lambda: jax.block_until_ready(d * 2))
    return out


def profile(seq: str, n_profile: int = 20):
    import jax

    from vio360_tpu import config as cfgmod
    from vio360_tpu.estimator import fused
    from vio360_tpu.estimator.estimator import Estimator
    from vio360_tpu.io import dataset as ds

    cfg = cfgmod.VioConfig()
    data = ds.VioDataset(seq, image_size=(cfg.camera.width, cfg.camera.height))
    frames = [(f.image, f.timestamp, f.imu) for f in data]

    # pass 1: warm every jit cache
    est = Estimator(cfg)
    for img, t_, imu in frames:
        est.process_frame(img, t_, imu)

    # pass 2: fresh estimator; instrument the steady-state frames by
    # running the product loop but timing _tracking_step's phases via
    # a wrapped fused.tracking_step + device_put.
    est = Estimator(cfg)
    ledger = []
    states = []
    real_put = jax.device_put
    cur: dict = {}

    def timed_put(x, *a, **k):
        t0 = time.perf_counter()
        r = real_put(x, *a, **k)
        cur.setdefault("put_ms", 0.0)
        cur["put_ms"] += (time.perf_counter() - t0) * 1e3
        cur.setdefault("n_put", 0)
        cur["n_put"] += 1
        return r

    class _FetchTimer:
        """Wraps the record so np.asarray is timed."""

        def __init__(self, b):
            self._b = b

        def __array__(self, dtype=None, copy=None):
            ta = time.perf_counter()
            r = np.asarray(self._b)
            cur["fetch_ms"] = (time.perf_counter() - ta) * 1e3
            return r if dtype is None else r.astype(dtype)

        def __getitem__(self, k):
            return np.asarray(self)[k]

    # Patch at the estimator dispatch level so both program shapes
    # (tracking_step and make_mega_step) are timed uniformly.
    real_dispatch = est.__class__._dispatch_from_buf

    def timed_dispatch(self_est, cur_dict):
        t0 = time.perf_counter()
        real_dispatch(self_est, cur_dict)
        cur["dispatch_ms"] = (time.perf_counter() - t0) * 1e3
        cur["mega"] = cur_dict.get("mega", False)
        cur_dict["bundle"] = _FetchTimer(cur_dict["bundle"])

    est.__class__._dispatch_from_buf = timed_dispatch
    import vio360_tpu.estimator.estimator as est_mod

    est_mod.jax.device_put = timed_put
    try:
        for i, (img, t_, imu) in enumerate(frames):
            cur.clear()
            t0 = time.perf_counter()
            res = est.process_frame(img, t_, imu)
            total = (time.perf_counter() - t0) * 1e3
            states.append((res.state, res.is_keyframe, sorted(cur)))
            if res.state.startswith("tracking") and not res.is_keyframe \
                    and "dispatch_ms" in cur:
                ledger.append({
                    "frame": i, "total_ms": total,
                    **{k: round(v, 2) for k, v in cur.items()},
                })
    finally:
        est.__class__._dispatch_from_buf = real_dispatch
        est_mod.jax.device_put = real_put

    return ledger, states


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default="/tmp/bench_seq_prod60")
    ap.add_argument("--skip-primitives", action="store_true")
    args = ap.parse_args()
    make_sequence(args.seq)

    if not args.skip_primitives:
        prim = relay_primitives()
        print("relay primitives (ms):")
        for k, v in prim.items():
            print(f"  {k:24s} {v:8.2f}")

    ledger, states = profile(args.seq)
    if not ledger:
        print("no steady-state non-KF frames profiled; states:", states)
        return
    keys = ["total_ms", "put_ms", "dispatch_ms", "fetch_ms", "wrap_ms"]
    meds = {k: float(np.median([r.get(k, 0.0) for r in ledger]))
            for k in keys}
    n_put = float(np.median([r.get("n_put", 0) for r in ledger]))
    print(f"\nsteady-state non-KF frames: {len(ledger)}")
    print(f"median n_put/frame: {n_put}")
    for k in keys:
        print(f"  {k:14s} {meds[k]:8.2f} ms (median)")
    other = meds["total_ms"] - sum(meds[k] for k in keys[1:])
    print(f"  {'host/other':14s} {other:8.2f} ms (median)")
    print("\nper-frame ledger (first 10):")
    for r in ledger[:10]:
        print("  ", r)


if __name__ == "__main__":
    main()

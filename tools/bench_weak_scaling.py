"""Device-count weak scaling of the multi-stream serving step.

Measures frames/s with one stream per device at N=1 vs N=2 virtual CPU
devices (the largest GENUINE parallel step a 2-core host can run; see
SCALING.md §2 — 8 virtual devices on 2 cores would measure host
oversubscription, not the program). One XLA host-platform thread per
device keeps the comparison honest.

Run as a subprocess with a clean env (bench.py does this):
    python tools/bench_weak_scaling.py <n_devices>
Prints one JSON line {"n": N, "fps_per_stream": F}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
        + " --xla_cpu_multi_thread_eigen=false"
    )
    os.environ["OMP_NUM_THREADS"] = "1"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    # Fair weak scaling: give the run exactly ONE physical core per
    # virtual device, else the N=1 baseline silently uses every core
    # and the ratio measures core sharing, not program scaling.
    try:
        os.sched_setaffinity(0, set(range(min(n, os.cpu_count()))))
    except (AttributeError, OSError):  # pragma: no cover
        pass

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    from vio360_tpu.parallel import multi_seq

    w, h = 960, 480
    _, args = ge.entry()
    mesh = multi_seq.make_seq_mesh(jax.devices()[:n])
    step = multi_seq.make_multi_seq_frame_step(mesh, w, h)

    def tile(x):
        return jnp.broadcast_to(x[None], (n, *x.shape)).copy()

    ip, inx = np.asarray(args[0]), np.asarray(args[1])
    argsets = []
    for i in range(3):
        a0 = jnp.asarray(np.roll(ip, 3 * i, axis=1))
        a1 = jnp.asarray(np.roll(inx, 3 * i, axis=1))
        argsets.append(
            (tile(a0), tile(a1), *[tile(a) for a in args[2:9]], *args[9:])
        )

    for _ in range(2):
        out = step(*argsets[0])
    jax.block_until_ready(out)
    iters = 6
    t0 = time.perf_counter()
    outs = [step(*argsets[i % len(argsets)]) for i in range(iters)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"n": n, "fps_per_stream": round(1.0 / dt, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

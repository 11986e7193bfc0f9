"""CROSS-PROCESS weak scaling: N jax.distributed processes, one CPU
core + one virtual device each, each serving one stream through the
collective-free multi_seq frame step on the product's global mesh
(parallel/multihost.global_mesh — the same seq-over-processes
partitioning a TPU pod deployment uses, with Gloo under the hood
instead of DCN).

Round-3 measured device-count weak scaling within ONE process
(tools/bench_weak_scaling.py); this adds the process boundary, so the
measured ratio includes jax.distributed's coordination overhead on the
serving path (which must be ~none: the program emits no collectives —
asserted by test_multi_seq.py::test_no_collectives_in_hlo).

Spawned by bench.py:
    python tools/bench_weak_scaling_mp.py <nprocs> <pid> <coord>
Each process prints one JSON line {"pid": P, "fps_per_stream": F}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    nprocs = int(sys.argv[1])
    pid = int(sys.argv[2])
    coord = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1"
        + " --xla_cpu_multi_thread_eigen=false"
    )
    os.environ["OMP_NUM_THREADS"] = "1"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    # One physical core per process — without pinning, the 1-process
    # baseline would silently use every core and the ratio would
    # measure core sharing, not cross-process scaling.
    try:
        os.sched_setaffinity(0, {pid % os.cpu_count()})
    except (AttributeError, OSError):  # pragma: no cover
        pass

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from vio360_tpu.parallel import multihost

    ok = multihost.init_distributed(
        coordinator_address=coord, num_processes=nprocs, process_id=pid
    )
    assert ok or nprocs == 1

    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from vio360_tpu.parallel import multi_seq

    w, h = 960, 480
    _, args = ge.entry()
    mesh = multihost.global_mesh(n_seq=nprocs, n_lm=1)
    step = multi_seq.make_multi_seq_frame_step(mesh, w, h)

    def tile(x):
        return jnp.broadcast_to(x[None], (nprocs, *x.shape)).copy()

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
    print(json.dumps({"pid": pid, "fps_per_stream": round(1.0 / dt, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

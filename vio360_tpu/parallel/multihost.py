"""Multi-host execution: jax.distributed + global meshes over ICI/DCN.

SURVEY.md §5 (Distributed comm backend): the TPU-native multi-host
recipe is ``jax.distributed.initialize`` (one process per host) + a
``Mesh`` over ``jax.devices()`` — which is then the GLOBAL device list
— with the same ``shard_map`` programs as single-host. Nothing else in
this codebase changes across the host boundary:

- the serving axis (``parallel/multi_seq``) emits NO collectives, so
  hosts never talk — weak scaling over hosts is structural (SCALING.md
  §2-3);
- the solver axes (``dist_window_ba``/``dist_viba``/
  ``dist_pose_graph``) psum a ~15 KB reduced system per LM iteration;
  over DCN (~100 us RTT) that stays <10% of a window solve.

This module is the thin, testable seam: process-env-driven
initialization plus mesh builders that partition the global device
list. On one process it degrades to the local mesh with zero
collectives emitted across DCN (no jax.distributed needed), so every
code path here is exercised by the single-host test suite; the
multi-process branch only wires arguments through to
``jax.distributed.initialize`` (its transport is JAX's, not ours).

No reference counterpart: the reference is single-process
(SURVEY.md §2 "Parallelism: none").
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-process JAX from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID —
    also auto-detected on Cloud TPU pods where no env is needed).

    Returns True when running multi-process (jax.distributed active),
    False for the single-process fallback. Idempotent.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "-1"))
    if not coordinator_address or num_processes <= 1:
        return False
    # Must not touch the XLA backend (jax.devices()/process_count())
    # before initialize — detect an existing cluster via the
    # distributed global state instead.
    try:
        from jax._src.distributed import global_state

        if global_state.client is not None:  # already initialized
            return True
    except ImportError:  # pragma: no cover - private-API drift
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(n_seq: int | None = None, n_lm: int | None = None) -> Mesh:
    """(seq, lm) mesh over the GLOBAL device list (all hosts).

    Defaults: the ``seq`` (serving / data-parallel, collective-free)
    axis spans hosts — its shards never communicate, so it should ride
    DCN — and the ``lm`` (Schur-reduction psum) axis spans the devices
    WITHIN a host, so the per-iteration psum rides ICI. Explicit sizes
    override (their product must equal the global device count).
    """
    devs = jax.devices()
    total = len(devs)
    if n_seq is None and n_lm is None:
        per_host = max(
            1, len([d for d in devs if d.process_index == devs[0].process_index])
        )
        n_lm = per_host
        n_seq = total // per_host
    elif n_seq is None:
        n_seq = total // n_lm
    elif n_lm is None:
        n_lm = total // n_seq
    assert n_seq * n_lm == total, (n_seq, n_lm, total)
    # jax.devices() orders by process then local id, so this reshape
    # puts each host's devices contiguous along the lm axis.
    arr = np.asarray(devs).reshape(n_seq, n_lm)
    return Mesh(arr, axis_names=("seq", "lm"))

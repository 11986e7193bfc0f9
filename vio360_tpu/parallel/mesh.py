"""Device mesh + sharding helpers.

The reference is single-process with no distributed dimension
(SURVEY.md §2 "Parallelism: none"), so this layer is new design: the
TPU-native scaling axes for sliding-window VIO are

- ``seq``  (data parallel): independent sequences/windows per device —
  the throughput axis for production serving;
- ``lm``   (model parallel): landmark blocks within one window — the
  Schur reduction's landmark elimination is embarrassingly parallel
  and the reduced (6K)^2 camera system is tiny, so only one ``psum``
  of that system rides the ICI per LM iteration (SURVEY.md §5
  "Distributed communication backend").

Single-host/single-chip runs create a trivial 1-device mesh and incur
no collectives at all.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_seq: int = 1, n_lm: int | None = None, devices=None) -> Mesh:
    """Build a (seq, lm) mesh over the available devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    total = devs.size
    if n_lm is None:
        n_lm = total // n_seq
    assert n_seq * n_lm == total, (n_seq, n_lm, total)
    return Mesh(devs.reshape(n_seq, n_lm), axis_names=("seq", "lm"))


def window_shardings(mesh: Mesh):
    """Shardings for a batched window BA problem.

    Returns dict of NamedShardings: poses replicated over ``lm`` and
    sharded over ``seq`` (batch dim), landmarks + observations sharded
    over ``lm`` along the landmark axis.
    """
    return {
        "poses": NamedSharding(mesh, P("seq")),
        "landmarks": NamedSharding(mesh, P("seq", "lm")),
        "obs": NamedSharding(mesh, P("seq", None, "lm")),
        "replicated": NamedSharding(mesh, P()),
    }

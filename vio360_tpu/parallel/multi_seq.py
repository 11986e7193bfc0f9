"""Multi-sequence serving: the per-frame hot path sharded over a mesh.

Production deployment of a VIO engine on TPU pods serves MANY camera
streams at once; a single 10-keyframe window fits comfortably on one
chip (SURVEY.md §7 "hard parts" #5: don't shard a problem that fits on
one chip — scale throughput). This module batches the full per-frame
hot path — pyramidal LK tracking + PnP pose solve, the same program as
``__graft_entry__.entry()`` — over B independent sequences and shards
the batch over the mesh's ``seq`` axis with ``shard_map``. There is no
cross-sequence math, so no collectives are emitted: scaling efficiency
is bounded only by per-chip occupancy, and one compiled program serves
any pod slice.

The reference processes exactly one stream in one thread
(app/main.cpp:178-223); this axis is new design work, like
``parallel/dist_ba`` (SURVEY.md §2 "Parallelism: none").
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # JAX >= 0.6
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops import lk
from ..solver import pnp
from ..utils.precision import jit as _pjit


def make_seq_mesh(devices=None) -> Mesh:
    """1-D ``seq`` mesh over all available devices (pure data parallel)."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, axis_names=("seq",))


def frame_step_single(
    img_prev, img_next, uv, valid, uv_guess, points, marg, r_wb, t_wb, r_cb, t_cb,
    *, width: int, height: int, lk_backend: str = "auto",
    pnp_backend: str = "auto",
):
    """One sequence's frame step: LK track then PnP. Unbatched reference
    semantics for the sharded path (and the single-chip hot path).
    ``uv_guess`` is the rotation-predicted flow seed (the production
    tracker's _rotation_guess output; pass uv to disable).

    ``pnp_backend`` "auto" resolves to the Pallas LM megakernel on TPU
    — measured round 4: it vmaps cleanly over the batch (grid
    extension; bit-identical to the unbatched kernel) and runs the B=8
    PnP stage in 2.2 ms where the vmapped XLA formulation took 11.4 ms.
    (Round 3 assumed the opposite without measuring the batched Pallas
    path.)
    """
    uv_new, status, err = lk.track(
        img_prev, img_next, uv, valid, uv_guess=uv_guess, backend=lk_backend
    )
    res = pnp.solve_pnp(
        r_wb, t_wb, points, uv_new, status, marg, r_cb, t_cb,
        width, height, backend=pnp_backend,
    )
    return res.r_wb, res.t_wb, res.success, res.num_inliers, uv_new, status, err


def make_multi_seq_frame_step(
    mesh: Mesh,
    width: int,
    height: int,
    *,
    axis: str = "seq",
    lk_backend: str = "auto",
    pnp_backend: str = "auto",
):
    """Build a jitted frame step over [B, ...] batches sharded on ``axis``.

    Global input shapes: images [B,H,W], uv/uv_guess [B,N,2],
    valid [B,N], points [B,N,3], marg [B,N], r_wb [B,3,3], t_wb [B,3];
    extrinsics r_cb [3,3], t_cb [3] replicated. B must be divisible by
    the mesh's ``axis`` size. Returns (r_wb, t_wb, success,
    num_inliers, uv_new, status, err), each sharded like its inputs.
    """
    one = functools.partial(
        frame_step_single,
        width=width,
        height=height,
        lk_backend=lk_backend,
        pnp_backend=pnp_backend,
    )

    def local_fn(img_prev, img_next, uv, valid, uv_guess, points, marg, r_wb, t_wb, r_cb, t_cb):
        if img_prev.shape[0] == 1:
            # One stream per device (the weak-scaling operating point):
            # run the UNBATCHED program — the batched shape costs extra
            # on a single stream (XLA schedules the batched einsums
            # worse; SCALING.md §1) and buys nothing at B=1.
            out = one(
                img_prev[0], img_next[0], uv[0], valid[0], uv_guess[0],
                points[0], marg[0], r_wb[0], t_wb[0], r_cb, t_cb,
            )
            return tuple(o[None] for o in out)
        # lax.map, NOT vmap: a TPU core runs one program at a time, so
        # sequentially executing the well-scheduled UNBATCHED program
        # per stream wins over the vmapped shape (measured round 4:
        # B=8 LK 19.4 ms vs 30.2 vmapped — the batched einsum layouts
        # cost ~2.4x per stream; SCALING.md §6). Same total latency
        # semantics for a serving batch.
        return jax.lax.map(
            lambda t: one(*t, r_cb, t_cb),
            (img_prev, img_next, uv, valid, uv_guess, points, marg, r_wb, t_wb),
        )

    b_spec = P(axis)
    in_specs = (b_spec,) * 9 + (P(), P())
    out_specs = (b_spec,) * 7
    try:
        # The Pallas PnP megakernel's outputs carry no varying-mesh-axes
        # metadata; the program is collective-free (HLO-asserted in
        # tests), so the vma check adds nothing here.
        sm = shard_map(
            local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # older JAX: no check_vma kwarg
        sm = shard_map(local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    return _pjit(sm)

"""Distributed pose-graph optimization: edge-sharded factor reduction.

Companion of ``parallel/dist_ba`` for the pose-graph layer (SURVEY.md
§7 stage 8: "pose-graph optimization over the same mesh"): the EDGE
axis is sharded over a mesh axis — residuals, Jacobians and the
per-edge H/b block contributions are edge-local — and the dense
reduced system H [6P,6P] + b [6P] is ``psum``'d once per LM iteration
(the pose-graph analog of dist_ba's reduced camera system). Every
device then performs the identical replicated solve, so the sharded
result is bitwise the single-device result up to psum reduction order.

No reference counterpart (the reference has neither a pose graph nor
any distributed dimension, SURVEY.md §2/§5); the math being
distributed is solver/pose_graph.py's.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # JAX >= 0.6
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..solver import pose_graph
from ..utils.precision import jit as _pjit


def make_dist_pose_graph(mesh: Mesh, max_iterations: int = 50, axis: str = "lm"):
    """Build a jitted distributed pose-graph solve over ``mesh``.

    Global input shapes: poses [P,...] replicated; edge arrays [C,...]
    sharded over ``axis`` (C divisible by the axis size). Returns a
    PoseGraphResult with replicated poses.
    """
    core = functools.partial(
        pose_graph.optimize_pose_graph_core,
        max_iterations=max_iterations,
        axis=axis,
    )

    e_spec = P(axis)
    in_specs = (P(), P(), e_spec, e_spec, e_spec, e_spec, e_spec, e_spec, P())
    out_specs = pose_graph.PoseGraphResult(
        r_wb=P(), t_wb=P(), final_cost=P(), initial_cost=P(), num_iterations=P()
    )
    return _pjit(
        shard_map(core, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    )

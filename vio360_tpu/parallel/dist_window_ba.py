"""Distributed PRODUCT window BA: landmark-sharded run_ba with full
chi2 classification.

``parallel/dist_ba`` scales batched multi-window benchmarks; this
module is the distributed form of the product's single-window solve
(``solver/ba.run_ba_xla``): identical LM semantics including Huber
weights, marginalized pinning, gauge fixing, chi2 outlier
classification and bad-landmark marking (Optimizer.cpp:419-460) — so
the estimator can route its window BA through a mesh unchanged
(``--mesh lm=N``). Residuals/Jacobians/Schur blocks are landmark-
local; the reduced (6K)^2 camera system, robust cost, and inlier
counts psum over mesh axis ``lm`` once per LM iteration.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # JAX >= 0.6
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..solver import ba as ba_mod
from ..utils.precision import jit as _pjit


def make_dist_window_ba(
    mesh: Mesh,
    width: int,
    height: int,
    *,
    axis: str = "lm",
    pixel_noise_std: float = 1.0,
    huber_delta: float = 1.0,
    chi2_threshold: float = 5.991,
    max_iterations: int = 50,
):
    """Build a jitted landmark-sharded window BA over ``mesh``.

    Global shapes match ``solver.ba.run_ba``: poses replicated,
    points [M,3] / obs [K,M,...] / landmark masks sharded over
    ``axis`` (M divisible by the axis size). Returns a BaResult with
    landmark-axis outputs sharded likewise.
    """
    core = functools.partial(
        ba_mod._run_ba_xla_core,
        width=width,
        height=height,
        pixel_noise_std=pixel_noise_std,
        huber_delta=huber_delta,
        chi2_threshold=chi2_threshold,
        max_iterations=max_iterations,
        axis=axis,
    )

    lm = P(axis)
    in_specs = (
        P(),  # r_wb
        P(),  # t_wb
        lm,  # points [M,3]
        P(None, axis),  # obs_uv [K,M,2]
        P(None, axis),  # obs_mask [K,M]
        P(),  # fixed_pose [K]
        lm,  # fixed_point [M]
        lm,  # marginalized [M]
        P(),  # r_cb
        P(),  # t_cb
    )
    out_specs = ba_mod.BaResult(
        r_wb=P(), t_wb=P(), points=lm,
        num_inliers=P(), num_outliers=P(), new_bad=lm,
        outlier_obs=P(None, axis),
        initial_cost=P(), final_cost=P(), num_iterations=P(),
    )
    return _pjit(
        shard_map(core, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    )

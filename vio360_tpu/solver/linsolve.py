"""TPU-native small dense linear algebra.

XLA lowers ``jnp.linalg.solve``/``inv``/``cholesky`` to LAPACK-style
custom calls that cost ~3 ms per invocation on TPU regardless of size
(sequential scalar pipelines) — measured 90x slower than a vectorized
in-jit Gaussian elimination for the 6x6..60x60 systems our LM solvers
produce (Optimizer.cpp uses Ceres DENSE_SCHUR at the same scales).
These replacements stay inside the fused program:

- ``solve`` — Gauss-Jordan elimination without pivoting (valid for the
  damped SPD normal-equation / Schur systems LM produces; diagonal
  dominance is guaranteed by the LM damping).
- ``inv3x3`` — closed-form adjugate inverse, batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve(a: jax.Array, b: jax.Array) -> jax.Array:
    """Solve ``a @ x = b`` for square damped-SPD ``a`` ([n,n], [n]) by
    vectorized Gauss-Jordan (statically unrolled pivots, rank-1
    updates — ~2.4x faster than a fori_loop on TPU for n<=64, and the
    LM systems here are at most 6K+... ~60-dim)."""
    n = a.shape[0]
    aug = jnp.concatenate([a, b[:, None]], axis=1)  # [n, n+1]
    eye = jnp.eye(n, dtype=aug.dtype)
    for i in range(n):
        piv = aug[i] / aug[i, i]
        col = aug[:, i]
        aug = aug - ((1.0 - eye[i]) * col)[:, None] * piv[None, :]
        aug = aug.at[i].set(piv)
    return aug[:, n]


def inv3x3(a: jax.Array) -> jax.Array:
    """Batched closed-form inverse of [..., 3, 3] matrices."""
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c02 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c10 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c20 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c21 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c10 + a[..., 0, 2] * c20
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c10, c11, c12], -1),
            jnp.stack([c20, c21, c22], -1),
        ],
        -2,
    )
    safe = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    return adj / safe[..., None, None]


def inv3x3_mminor(a: jax.Array) -> jax.Array:
    """Inverse of [3, 3, M] matrices (batch axis MINOR — the TPU-friendly
    layout: M lives in the 128-lane dimension, the 3x3 in registers)."""
    c00 = a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1]
    c01 = a[0, 2] * a[2, 1] - a[0, 1] * a[2, 2]
    c02 = a[0, 1] * a[1, 2] - a[0, 2] * a[1, 1]
    c10 = a[1, 2] * a[2, 0] - a[1, 0] * a[2, 2]
    c11 = a[0, 0] * a[2, 2] - a[0, 2] * a[2, 0]
    c12 = a[0, 2] * a[1, 0] - a[0, 0] * a[1, 2]
    c20 = a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0]
    c21 = a[0, 1] * a[2, 0] - a[0, 0] * a[2, 1]
    c22 = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    det = a[0, 0] * c00 + a[0, 1] * c10 + a[0, 2] * c20
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02]),
            jnp.stack([c10, c11, c12]),
            jnp.stack([c20, c21, c22]),
        ]
    )  # [3,3,M]
    safe = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    return adj / safe

"""TPU-native dense solves vs numpy reference (solver/linsolve.py)."""

import numpy as np
import jax.numpy as jnp

from vio360_tpu.solver import linsolve


def _spd(n, seed, diag_boost):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)).astype(np.float32)
    return a @ a.T + diag_boost * np.eye(n, dtype=np.float32)


def test_solve_matches_numpy():
    for n in (6, 15, 60):
        a = _spd(n, n, n)
        b = np.random.default_rng(n + 1).standard_normal(n).astype(np.float32)
        x = np.asarray(linsolve.solve(jnp.asarray(a), jnp.asarray(b)))
        ref = np.linalg.solve(a, b)
        assert np.linalg.norm(x - ref) / np.linalg.norm(ref) < 1e-4, n


def test_solve_damped_system():
    # the actual LM shape: H + lam*diag(H), poorly scaled blocks
    h = _spd(12, 0, 0.0)
    h[:6] *= 1e3
    h[:, :6] *= 1e3
    damped = h + 0.1 * np.diag(np.diag(h)) + 1e-8 * np.eye(12)
    g = np.random.default_rng(2).standard_normal(12).astype(np.float32)
    x = np.asarray(linsolve.solve(jnp.asarray(damped), jnp.asarray(g)))
    ref = np.linalg.solve(damped.astype(np.float64), g.astype(np.float64))
    assert np.linalg.norm(x - ref) / np.linalg.norm(ref) < 1e-3


def test_inv3x3_batched():
    rng = np.random.default_rng(3)
    a = rng.standard_normal((64, 3, 3)).astype(np.float32)
    a = a @ a.transpose(0, 2, 1) + 2 * np.eye(3, dtype=np.float32)
    inv = np.asarray(linsolve.inv3x3(jnp.asarray(a)))
    ref = np.linalg.inv(a)
    np.testing.assert_allclose(inv, ref, rtol=1e-3, atol=1e-4)


def test_inv3x3_singular_no_nan():
    a = jnp.zeros((2, 3, 3))
    out = np.asarray(linsolve.inv3x3(a))
    assert np.isfinite(out).all()

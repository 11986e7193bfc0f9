"""Landmark-sharded VIBA == single-device VIBA (parallel/dist_viba.py).

Runs on the virtual 8-device CPU mesh from conftest (SURVEY.md §4 (4)).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vio360_tpu.geometry import camera as cam
from vio360_tpu.imu import preintegration as pre
from vio360_tpu.parallel import dist_viba, mesh as mesh_mod
from vio360_tpu.solver import viba as viba_mod

W, H = 480, 240


def make_problem(k=6, m=256, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-4, 4, (m, 3)) + np.array([0, 0, 6.0]), jnp.float32)
    rs = jnp.broadcast_to(jnp.eye(3), (k, 3, 3)).copy()
    ts = jnp.asarray(np.cumsum(rng.uniform(-0.04, 0.05, (k, 3)), 0), jnp.float32)
    p_c = pts[None] - ts[:, None]
    uv = cam.project(p_c, W, H)
    uv = uv + jnp.asarray(rng.standard_normal(uv.shape) * 0.4, jnp.float32)
    mask = jnp.asarray(rng.random((k, m)) < 0.7)
    fixed_pose = jnp.zeros(k, bool).at[0].set(True)
    fixed_point = jnp.zeros(m, bool)
    marg = jnp.zeros(m, bool)
    vel = jnp.asarray(rng.standard_normal((k, 3)) * 0.1, jnp.float32)
    bg = jnp.zeros(3)
    ba = jnp.zeros(3)
    gravity = jnp.array([0.0, 0.0, -9.81])

    # Synthetic preintegrations between consecutive keyframes: integrate
    # a constant-rate gyro/accel stream per pair.
    preints = []
    dt_pair = 0.1
    for i in range(k - 1):
        n_s = 8
        tgrid = np.linspace(0, dt_pair, n_s, endpoint=False)
        rows = np.zeros((n_s, 7), np.float32)
        rows[:, 0] = tgrid
        rows[:, 1:4] = rng.standard_normal(3) * 0.2 + np.array([0, 0, 9.81])
        rows[:, 4:7] = rng.standard_normal(3) * 0.02
        preints.append(
            pre.preintegrate(
                jnp.asarray(rows), jnp.ones(n_s, bool), jnp.zeros(3), jnp.zeros(3),
            )
        )
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *preints)
    pair_valid = jnp.ones(k - 1, bool)
    return (
        rs, ts, vel, bg, ba, pts, uv, mask, fixed_pose, fixed_point, marg,
        stacked, pair_valid, gravity, jnp.eye(3), jnp.zeros(3),
    )


def test_dist_viba_matches_single_device():
    # 8 LM iterations: enough to converge the window while keeping the
    # f32 psum-reduction-order divergence in accept/reject decisions
    # below the comparison tolerance (measured: 7e-6 max pose delta at
    # 8 iters; by 12 iters near-convergence chaos on the flat
    # bias/gauge directions can flip an LM accept and drift 1e-2).
    args = make_problem()
    single = viba_mod.run_viba(*args, width=W, height=H, max_iterations=8)

    msh = mesh_mod.make_mesh(n_seq=1, n_lm=8)
    fn = dist_viba.make_dist_viba(msh, W, H, max_iterations=8)
    dist = fn(*args)

    np.testing.assert_allclose(
        np.asarray(dist.t_wb), np.asarray(single.t_wb), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(dist.r_wb), np.asarray(single.r_wb), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(dist.vel), np.asarray(single.vel), atol=5e-4
    )
    # Landmarks: the damped V^-1 back-substitution amplifies psum
    # reduction-order noise (~1e-8 in dx) by the V-block condition
    # number — measured 6e-4 point drift after ONE identical-path
    # iteration on weakly-observed landmarks, without moving the cost.
    # Assert agreement where it is numerically meaningful: the bulk of
    # the map (median), the well-conditioned landmarks (>=6
    # observations), and the total cost.
    obs_count = np.asarray(jnp.sum(args[7], axis=0))
    dp = np.abs(np.asarray(dist.points) - np.asarray(single.points)).max(axis=1)
    assert float(np.median(dp)) < 1e-3, float(np.median(dp))
    well = obs_count >= 6
    assert well.sum() > 20
    assert float(dp[well].max()) < 5e-2, float(dp[well].max())
    np.testing.assert_allclose(
        float(dist.final_cost), float(single.final_cost), rtol=1e-3
    )
    assert int(dist.num_inliers) == int(single.num_inliers)


_X64_WORKER = r'''
import sys, os
sys.path.insert(0, os.environ["VIO360_ROOT"])
sys.path.insert(0, os.path.join(os.environ["VIO360_ROOT"], "tests"))
import jax, jax.numpy as jnp
import numpy as np
from test_dist_viba import make_problem, W, H
from vio360_tpu.parallel import dist_viba, mesh as mesh_mod
from vio360_tpu.solver import viba as viba_mod

args = make_problem()
to64 = lambda x: (
    x.astype(jnp.float64)
    if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating)
    else x
)
args64 = jax.tree_util.tree_map(to64, args)
single = viba_mod.run_viba(*args64, width=W, height=H, max_iterations=8)
fn = dist_viba.make_dist_viba(
    mesh_mod.make_mesh(n_seq=1, n_lm=8), W, H, max_iterations=8
)
dist = fn(*args64)
dp = np.abs(np.asarray(dist.points) - np.asarray(single.points)).max()
dt = float(jnp.abs(dist.t_wb - single.t_wb).max())
assert dp < 1e-6, dp
assert dt < 1e-8, dt
print(f"X64_EXACT_OK dp={dp:.2e} dt={dt:.2e}", flush=True)
'''


def test_dist_viba_x64_exact():
    """The 5e-2 f32 weak-landmark tolerance above is PRECISION, not a
    sharding bug: in f64 the sharded solve matches the single-device
    solve to 1e-6 on EVERY landmark (measured 6.6e-9; SCALING.md §5).
    Runs in a subprocess because JAX_ENABLE_X64 is process-global."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update(
        JAX_PLATFORMS="cpu", JAX_ENABLE_X64="1", VIO360_ROOT=root,
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    r = subprocess.run(
        [sys.executable, "-c", _X64_WORKER], env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "X64_EXACT_OK" in r.stdout


def test_dist_viba_improves_cost():
    args = make_problem(seed=3)
    msh = mesh_mod.make_mesh(n_seq=1, n_lm=8)
    fn = dist_viba.make_dist_viba(msh, W, H, max_iterations=12)
    res = fn(*args)
    assert float(res.final_cost) < float(res.initial_cost)
    assert np.isfinite(float(res.final_cost))


def test_estimator_builds_and_uses_mesh_solvers():
    """--mesh lm=8 wiring: the estimator constructs the landmark-sharded
    window solvers and window_ba routes through them (full CLI drive
    asserted manually/round-logged; here the wiring + one solve)."""
    from vio360_tpu import config as cfgmod
    from vio360_tpu.estimator import window as win_mod
    from vio360_tpu.estimator.estimator import Estimator

    cfg = cfgmod.VioConfig(
        camera=cfgmod.CameraConfig(width=W, height=H),
        window=cfgmod.WindowConfig(max_keyframes=4, max_landmarks=256),
        solver=cfgmod.SolverConfig(mesh="lm=8"),
    )
    est = Estimator(cfg)
    assert est._dist_ba_fn is not None and est._dist_viba_fn is not None

    # Drive one window BA through the dist path on synthetic state.
    win = win_mod.empty_window(4, 256, cfg.features.capacity)
    k = 3
    for i in range(k):
        t_i = jnp.asarray([0.05 * i, 0.0, 0.0], jnp.float32)
        uv_snap = jnp.zeros((cfg.features.capacity, 2), jnp.float32)
        ids = jnp.full((cfg.features.capacity,), -1, jnp.int32)
        win = win_mod.add_keyframe(
            win, jnp.eye(3), t_i, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(0.1 * i, jnp.float32), jnp.asarray(i), uv_snap, ids,
        )
    # no landmarks -> solve degenerates gracefully (masks empty)
    win2, res = win_mod.window_ba(
        win, jnp.eye(4), W, H, 10.0, dist_fn=est._dist_ba_fn
    )
    assert np.isfinite(float(res.final_cost))


def test_estimator_mesh_validation():
    import pytest as _pytest

    from vio360_tpu import config as cfgmod
    from vio360_tpu.estimator.estimator import Estimator

    bad = cfgmod.VioConfig(
        window=cfgmod.WindowConfig(max_landmarks=100),  # not divisible by 8
        solver=cfgmod.SolverConfig(mesh="lm=8"),
    )
    with _pytest.raises(ValueError):
        Estimator(bad)

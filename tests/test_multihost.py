"""Multi-host seam (parallel/multihost.py) on the virtual 8-device mesh.

True multi-process runs need multiple hosts; everything OUR code does —
env parsing, global-mesh partitioning, and the fact that the same
shard_map programs run on the global mesh — is testable single-process
(SURVEY.md §5 distributed-comm row).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vio360_tpu.parallel import dist_ba, multihost


def test_init_distributed_single_process_fallback(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert multihost.init_distributed() is False
    # explicit single-process args also fall back
    assert multihost.init_distributed("host:1234", 1, 0) is False


def test_global_mesh_partitions_all_devices():
    mesh = multihost.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("seq", "lm")
    # single host: all devices on the lm (ICI) axis by default
    assert mesh.shape["lm"] == len(jax.devices())

    mesh2 = multihost.global_mesh(n_seq=2)
    assert mesh2.shape == {"seq": 2, "lm": len(jax.devices()) // 2}


def test_same_program_runs_on_global_mesh():
    """The distributed BA built for a local mesh runs unchanged on the
    global mesh — the only multi-host difference is mesh construction."""
    mesh = multihost.global_mesh(n_seq=2)
    b, k, m, w, h = 2, 4, 64, 480, 240
    rng = np.random.default_rng(0)
    from vio360_tpu.geometry import camera as cam

    pts = jnp.asarray(rng.uniform(-4, 4, (b, m, 3)) + np.array([0, 0, 6.0]), jnp.float32)
    rs = jnp.broadcast_to(jnp.eye(3), (b, k, 3, 3)).copy()
    ts = jnp.asarray(np.cumsum(rng.uniform(-0.03, 0.03, (b, k, 3)), 1), jnp.float32)
    uv = cam.project(pts[:, None] - ts[:, :, None], w, h)
    mask = jnp.ones((b, k, m), bool)
    fixed_pose = jnp.zeros((b, k), bool).at[:, 0].set(True)
    fixed_point = jnp.zeros((b, m), bool)

    fn = dist_ba.make_dist_ba(mesh, w, h, max_iterations=5)
    out = fn(rs, ts, pts, uv, mask, fixed_pose, fixed_point, jnp.eye(3), jnp.zeros(3))
    assert np.isfinite(np.asarray(out[3])).all()

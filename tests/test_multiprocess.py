"""REAL multi-process execution: 2 jax.distributed processes on CPU.

SURVEY.md §5 prescribes ``jax.distributed.initialize`` + a mesh over
ICI/DCN. This test EXECUTES that path (not a single-process proxy):
two OS processes form a cluster over the Gloo CPU collectives backend,
build the global (seq, lm) mesh via parallel.multihost, and run the
landmark-sharded window BA with its per-iteration psum crossing the
process boundary; process 0 also checks the result against the
single-device solve. This is byte-for-byte the multi-host code path —
on TPU pods only the transport under the same collectives changes.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r'''
import os, sys
sys.path.insert(0, os.environ["VIO360_ROOT"])
import jax
from vio360_tpu.parallel import multihost

ok = multihost.init_distributed(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert ok, "init_distributed must report multi-process"
assert jax.process_count() == 2
assert jax.device_count() == 2

import jax.numpy as jnp
import numpy as np
from vio360_tpu.geometry import camera as cam
from vio360_tpu.parallel import dist_window_ba
from vio360_tpu.solver import ba as ba_mod

# lm axis across the TWO processes: the Schur psum crosses the
# process boundary every LM iteration.
mesh = multihost.global_mesh(n_seq=1, n_lm=2)
assert mesh.shape == {"seq": 1, "lm": 2}
mesh2 = jax.sharding.Mesh(np.asarray(jax.devices()), ("lm",))

k, m, w, h = 4, 64, 480, 240
rng = np.random.default_rng(0)
pts = jnp.asarray(rng.uniform(-4, 4, (m, 3)) + np.array([0, 0, 6.0]), jnp.float32)
rs = jnp.broadcast_to(jnp.eye(3), (k, 3, 3)).copy()
ts = jnp.asarray(np.cumsum(rng.uniform(-0.03, 0.03, (k, 3)), 0), jnp.float32)
uv = cam.project(pts[None] - ts[:, None], w, h)
uv = uv + jnp.asarray(rng.standard_normal((k, m, 2)) * 0.3, jnp.float32)
mask = jnp.ones((k, m), bool)
fixed_pose = jnp.zeros(k, bool).at[0].set(True)
fixed_point = jnp.zeros(m, bool)
marg = jnp.zeros(m, bool)
args = (rs, ts, pts, uv, mask, fixed_pose, fixed_point, marg, jnp.eye(3), jnp.zeros(3))

fn = dist_window_ba.make_dist_window_ba(mesh2, w, h, max_iterations=8)
res = fn(*args)
final = float(res.final_cost)
t_out = np.asarray(jax.device_get(res.t_wb))

if int(sys.argv[1]) == 0:
    # single-device reference on this process's local device
    with jax.default_device(jax.local_devices()[0]):
        ref = ba_mod.run_ba_xla(*args, width=w, height=h, max_iterations=8)
    dref = float(np.abs(t_out - np.asarray(ref.t_wb)).max())
    rel = abs(final - float(ref.final_cost)) / max(float(ref.final_cost), 1e-9)
    assert dref < 1e-3, f"pose mismatch {dref}"
    assert rel < 1e-3, f"cost mismatch {rel}"
    print(f"MULTIPROC_OK final={final:.6f} dref={dref:.2e}", flush=True)
else:
    print("MULTIPROC_OK worker", flush=True)
'''


def test_two_process_distributed_ba():
    port = 20000 + (os.getpid() % 10000)
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["COORD"] = f"127.0.0.1:{port}"
    env["VIO360_ROOT"] = ROOT
    # one virtual device per process (the default when the flag is absent)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert "MULTIPROC_OK" in out, f"proc {i} output:\n{out[-2000:]}"

"""REAL multi-process execution: 2 jax.distributed processes on CPU.

SURVEY.md §5 prescribes ``jax.distributed.initialize`` + a mesh over
ICI/DCN. These tests EXECUTE that path (not a single-process proxy):
two OS processes form a cluster over the Gloo CPU collectives backend,
build the global (seq, lm) mesh via parallel.multihost, and solve ON
that mesh — this is byte-for-byte the multi-host code path; on TPU
pods only the transport under the same collectives changes.

Two partitionings are exercised:
- ``lm`` across processes: the landmark-sharded window BA's
  per-iteration Schur psum crosses the process boundary; process 0
  checks the result against the single-device solve.
- ``seq`` across processes (seq=2, lm=1): two independent sequences
  solved data-parallel, one per process, NO cross-process collectives
  (the serving axis); each process checks ITS OWN addressable result
  shard against the single-device solve of its sequence.
"""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PRELUDE = r'''
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
from vio360_tpu.solver import ba as ba_mod


def make_problem(seed, k=4, m=64, w=480, h=240):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.uniform(-4, 4, (m, 3)) + np.array([0, 0, 6.0]), jnp.float32)
    rs = jnp.broadcast_to(jnp.eye(3), (k, 3, 3)).copy()
    ts = jnp.asarray(np.cumsum(rng.uniform(-0.03, 0.03, (k, 3)), 0), jnp.float32)
    uv = cam.project(pts[None] - ts[:, None], w, h)
    uv = uv + jnp.asarray(rng.standard_normal((k, m, 2)) * 0.3, jnp.float32)
    mask = jnp.ones((k, m), bool)
    fixed_pose = jnp.zeros(k, bool).at[0].set(True)
    fixed_point = jnp.zeros(m, bool)
    marg = jnp.zeros(m, bool)
    return (rs, ts, pts, uv, mask, fixed_pose, fixed_point, marg,
            jnp.eye(3), jnp.zeros(3))
'''

# ---- lm across the process boundary: Schur psum over DCN/Gloo ----
_WORKER_LM = _PRELUDE + r'''
from vio360_tpu.parallel import dist_window_ba

# THE product mesh builder (multihost.global_mesh) — the solve runs on
# this exact mesh object, lm axis spanning the two processes.
mesh = multihost.global_mesh(n_seq=1, n_lm=2)
assert mesh.shape == {"seq": 1, "lm": 2}

w, h = 480, 240
args = make_problem(0)
fn = dist_window_ba.make_dist_window_ba(mesh, w, h, max_iterations=8)
res = fn(*args)
final = float(res.final_cost)
t_out = np.asarray(jax.device_get(res.t_wb))

if int(sys.argv[1]) == 0:
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

# ---- seq across the process boundary: data-parallel, collective-free ----
_WORKER_SEQ = _PRELUDE + r'''
from vio360_tpu.parallel import dist_ba

mesh = multihost.global_mesh(n_seq=2, n_lm=1)
assert mesh.shape == {"seq": 2, "lm": 1}

w, h = 480, 240
p0 = make_problem(10)
p1 = make_problem(11)
batched = tuple(
    jnp.stack([a, b]) for a, b in zip(p0[:7], p1[:7])
)  # [2,...] over seq
fn = dist_ba.make_dist_ba(mesh, w, h, max_iterations=8)
out = fn(*batched, jnp.eye(3), jnp.zeros(3))
jax.block_until_ready(out)

# Each process owns ONE sequence shard (seq axis == process axis).
pid = int(sys.argv[1])
t_shard = out[1].addressable_shards[0]
assert t_shard.index[0] == slice(pid, pid + 1), t_shard.index
t_local = np.asarray(t_shard.data)[0]
cost_local = np.asarray(out[3].addressable_shards[0].data)[0]

ref_args = (p0 if pid == 0 else p1)
with jax.default_device(jax.local_devices()[0]):
    ref = ba_mod.run_ba_xla(*ref_args, width=w, height=h, max_iterations=8)
dref = float(np.abs(t_local - np.asarray(ref.t_wb)).max())
rel = abs(float(cost_local) - float(ref.final_cost)) / max(float(ref.final_cost), 1e-9)
assert dref < 1e-3, f"proc {pid} pose mismatch {dref}"
assert rel < 1e-3, f"proc {pid} cost mismatch {rel}"
print(f"MULTIPROC_OK seq pid={pid} dref={dref:.2e}", flush=True)
'''


def _run_two_process(worker_src: str, port_salt: int) -> None:
    port = 20000 + ((os.getpid() + port_salt) % 10000)
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["COORD"] = f"127.0.0.1:{port}"
    env["VIO360_ROOT"] = ROOT
    # one virtual device per process (the default when the flag is absent)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker_src, str(i)], env=env,
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


def test_two_process_distributed_ba():
    _run_two_process(_WORKER_LM, 0)


def test_two_process_seq_parallel():
    _run_two_process(_WORKER_SEQ, 137)

"""--x64 double-precision pipeline (VERDICT r4 item 8).

The reference optimizes every parameter block in double
(/root/reference/src/optimization/Optimizer.cpp:154-191; Ceres is
double throughout). The product's default is f32 with measured
mitigations; ``--x64`` opts the WHOLE pipeline into f64 (JAX x64
semantics + the XLA kernel formulations — Mosaic has no f64 lowering).
Runs in a subprocess because JAX_ENABLE_X64 is process-global.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_x64_cli_end_to_end(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    seq = str(tmp_path / "seq")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "make_synthetic_dataset.py"),
         seq, "--frames", "14", "--seed", "3"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-500:]
    traj = str(tmp_path / "traj.tum")
    r = subprocess.run(
        [sys.executable, "-m", "vio360_tpu", seq,
         "--config", os.path.join(ROOT, "configs", "synthetic_480.yaml"),
         "--x64", "--vo", "--output", traj, "--quiet"],
        env=env, capture_output=True, text=True, timeout=540, cwd=ROOT,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-800:]
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "evaluate_ate.py"),
         traj, os.path.join(seq, "groundtruth.tum")],
        env=env, capture_output=True, text=True, timeout=300,
    )
    d = json.loads(r.stdout.strip().splitlines()[-1])
    # same accuracy regime as the f32 path on this easy sequence
    assert d["ate_rmse_sim3"] < 0.05, d

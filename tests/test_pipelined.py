"""Pipelined frame loop == sequential frame loop, exactly.

process_frame_async defers frame N's scalar-bundle fetch until after
frame N+1's dispatch and speculates across keyframe boundaries
(estimator.py "Software-pipelined frame loop"). Because device arrays
are immutable, the keyframe rewind + re-dispatch reproduces the
sequential op sequence exactly — so the two modes must agree
bit-for-bit on every state decision and every exported pose.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from vio360_tpu import config as cfgmod
from vio360_tpu.estimator.estimator import Estimator
from vio360_tpu.io.dataset import VioDataset

CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "configs", "synthetic_480.yaml"
)


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    import make_synthetic_dataset as gen

    out = str(tmp_path_factory.mktemp("pipe_seq"))
    assert gen.main([out, "--frames", "45", "--seed", "11", "--texture"]) == 0
    return out


def _run(seq, pipelined: bool, use_imu: bool):
    cfg = cfgmod.load_yaml(CFG_PATH)
    est = Estimator(cfg)
    ds = VioDataset(seq, image_size=(cfg.camera.width, cfg.camera.height))
    results = []
    for f in ds:
        imu = f.imu if use_imu else None
        if pipelined:
            results.extend(est.process_frame_async(f.image, f.timestamp, imu))
        else:
            results.append(est.process_frame(f.image, f.timestamp, imu))
    if pipelined:
        results.extend(est.flush())
    ts, rs, ps = est.export_trajectory()
    return est, results, rs, ps


@pytest.mark.parametrize("use_imu", [True, False], ids=["vio", "vo"])
def test_pipelined_matches_sequential(seq, use_imu):
    est_p, res_p, rs_p, ps_p = _run(seq, pipelined=True, use_imu=use_imu)
    est_s, res_s, rs_s, ps_s = _run(seq, pipelined=False, use_imu=use_imu)

    # every frame resolved exactly once, in order
    assert [r.frame_id for r in res_p] == [r.frame_id for r in res_s]
    # identical state machine decisions
    assert [r.state for r in res_p] == [r.state for r in res_s]
    assert [r.is_keyframe for r in res_p] == [r.is_keyframe for r in res_s]
    assert [r.n_pnp_inliers for r in res_p] == [r.n_pnp_inliers for r in res_s]
    assert sum(r.is_keyframe for r in res_p) >= 3
    # identical per-frame poses as reported
    for a, b in zip(res_p, res_s):
        np.testing.assert_array_equal(a.r_wb, b.r_wb)
        np.testing.assert_array_equal(a.t_wb, b.t_wb)
    # identical exported trajectory (pose graph + Frame::GetTwb compose)
    np.testing.assert_array_equal(rs_p, rs_s)
    np.testing.assert_array_equal(ps_p, ps_s)
    # identical pose-graph stores
    assert est_p.pg_nodes == est_s.pg_nodes
    assert len(est_p.pg_edges) == len(est_s.pg_edges)


def test_flush_idempotent(seq):
    cfg = cfgmod.load_yaml(CFG_PATH)
    est = Estimator(cfg)
    ds = VioDataset(seq, image_size=(cfg.camera.width, cfg.camera.height))
    n = 0
    for f in ds:
        n += len(est.process_frame_async(f.image, f.timestamp, None))
        if f.index >= 14:
            break
    n += len(est.flush())
    assert est.flush() == []
    assert n == 15

"""The fused keyframe event == the staged multi-dispatch path.

fused.make_keyframe_step compiles the whole keyframe event (eviction
capture, window append, preintegration bookkeeping, window (VI)BA, bias
re-linearization, scale/gravity refine, outlier relabel, triangulation)
into ONE program; this suite drives the FULL estimator over the same
synthetic sequence with the flag on and off and demands matching
results — trajectories, window poses, pose-graph stores and export.
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from vio360_tpu import config as cfgmod
from vio360_tpu.estimator.estimator import Estimator
from vio360_tpu.io.dataset import VioDataset

CFG_PATH = os.path.join(os.path.dirname(__file__), "..", "configs", "synthetic_480.yaml")


def _run(seq, fused: bool, use_imu: bool):
    base = cfgmod.load_yaml(CFG_PATH)
    cfg = dataclasses.replace(
        base, solver=dataclasses.replace(base.solver, fused_keyframe=fused)
    )
    est = Estimator(cfg)
    ds = VioDataset(seq, image_size=(cfg.camera.width, cfg.camera.height))
    results = [
        est.process_frame(f.image, f.timestamp, f.imu if use_imu else None)
        for f in ds
    ]
    ts, rs, ps = est.export_trajectory()
    return est, results, ps


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    import make_synthetic_dataset as gen

    out = str(tmp_path_factory.mktemp("fused_kf_seq"))
    # 60 frames with eviction activity; texture keeps the scene realistic
    assert gen.main([out, "--frames", "60", "--seed", "5", "--texture"]) == 0
    return out


@pytest.mark.parametrize("use_imu", [True, False], ids=["vio", "vo"])
def test_fused_matches_staged(seq, use_imu):
    est_f, res_f, ps_f = _run(seq, fused=True, use_imu=use_imu)
    est_s, res_s, ps_s = _run(seq, fused=False, use_imu=use_imu)

    # same state machine decisions frame by frame
    assert [r.state for r in res_f] == [r.state for r in res_s]
    assert [r.is_keyframe for r in res_f] == [r.is_keyframe for r in res_s]

    # exported trajectories agree (both paths run identical math; the
    # tolerance absorbs f32 pack round-trips + accept/reject jitter on
    # converged LM steps)
    d = np.abs(ps_f - ps_s).max()
    assert d < 1e-3, d

    # window + bookkeeping agree
    assert est_f.n_kf_host == est_s.n_kf_host
    assert est_f.n_pairs == est_s.n_pairs
    assert est_f.scale_refine_count == est_s.scale_refine_count
    np.testing.assert_allclose(
        np.asarray(est_f.win.kf_t), np.asarray(est_s.win.kf_t), atol=1e-3
    )
    assert int(np.asarray(est_f.win.lm_alive).sum()) == pytest.approx(
        int(np.asarray(est_s.win.lm_alive).sum()), abs=5
    )

    # pose-graph store: same topology, matching measurements
    assert est_f.pg_nodes == est_s.pg_nodes
    assert len(est_f.pg_edges) == len(est_s.pg_edges)
    for ef, es in zip(est_f.pg_edges, est_s.pg_edges):
        assert (ef.fi, ef.fj, ef.kind) == (es.fi, es.fj, es.kind)
        np.testing.assert_allclose(ef.rel_t, es.rel_t, atol=1e-3)
        np.testing.assert_allclose(ef.w_sqrt, es.w_sqrt, rtol=0.05, atol=0.5)

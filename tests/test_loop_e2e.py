"""Loop closure end-to-end: a multi-lap revisit sequence (VERDICT r4
item 3).

The round-4 experiment proved an odometry-only pose graph recovers ~1%
of organic ATE; this is the experiment that changes that. A 3-lap
closed-circuit VO run accumulates per-lap MAP-SCALE drift (measured:
local scale 6.54 -> 7.37 -> 7.84 across laps) plus translation drift;
the place database closes lap-2/3 keyframes against lap-1 entries
(PnP-verified: median edge error 9.5 mm / 0.4 deg vs ground truth) and
the Sim(3) pose graph — the only graph that can EXPRESS scale drift —
removes most of it at export.

Measured on this exact configuration (r5): no-loop sim3 ATE 0.0885,
with-loop 0.0488 (1.81x), recovered per-node scales [0.86, 1.11]
matching the injected drift profile. The assertions leave margin for
cross-platform float jitter, not for regressions.

Runtime note: ~8-10 min on the 2-core CI host (two 300-frame runs);
this is the capstone accuracy test of the loop subsystem.
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from vio360_tpu import config as cfgmod
from vio360_tpu.estimator.estimator import Estimator
from vio360_tpu.io import trajectory as tio
from vio360_tpu.io.dataset import VioDataset
from vio360_tpu.utils import metrics

CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "configs", "synthetic_480.yaml"
)


@pytest.fixture(scope="module")
def lap_seq(tmp_path_factory):
    import make_synthetic_dataset as gen

    seq = str(tmp_path_factory.mktemp("laps3"))
    assert gen.main([
        seq, "--frames", "300", "--texture", "--revisit", "--laps", "3",
        "--seed", "41", "--pixel-noise", "0.05", "--motion-blur", "3",
        "--exposure", "0.12", "--vignette", "0.3",
    ]) == 0
    return seq


def _run(seq, loop_on: bool):
    cfg = cfgmod.load_yaml(CFG_PATH)
    if not loop_on:
        cfg = dataclasses.replace(
            cfg, loop=dataclasses.replace(cfg.loop, enabled=False)
        )
    est = Estimator(cfg)
    ds = VioDataset(seq, image_size=(cfg.camera.width, cfg.camera.height))
    for f in ds:
        est.process_frame_async(f.image, f.timestamp, None)
    est.flush()
    ts, rs, ps = est.export_trajectory()
    _, _, gt_p = tio.read_tum(os.path.join(seq, "groundtruth.tum"))
    a = metrics.ate(ps, gt_p[: len(ps)], align="sim3")
    return est, a


@pytest.fixture(scope="module")
def both_runs(lap_seq):
    est_on, a_on = _run(lap_seq, True)
    est_off, a_off = _run(lap_seq, False)
    return est_on, a_on, est_off, a_off


def test_loops_detected_and_verified(both_runs):
    est_on, a_on, *_ = both_runs
    n_loop = sum(1 for e in est_on.pg_edges if e.kind == "loop")
    assert n_loop >= 25, n_loop


def test_sim3_scales_recover_drift(both_runs):
    """The Sim(3) solve must produce a sane, non-degenerate per-node
    scale profile (the r5 self-match and in-flight-slot bugs both
    manifested as scales of 4-7x here)."""
    est_on, *_ = both_runs
    scales = np.asarray(sorted(est_on.kf_scale_log.values()))
    assert scales.size > 0
    assert scales.min() > 0.75 and scales.max() < 1.35, (
        scales.min(), scales.max()
    )


def test_loop_closure_cuts_drift(both_runs):
    """The headline: loop closure + Sim(3) graph vs the identical run
    without it (measured 1.81x on this configuration)."""
    est_on, a_on, est_off, a_off = both_runs
    assert a_off.rmse > 0.05, f"baseline did not drift ({a_off.rmse})"
    ratio = a_off.rmse / a_on.rmse
    assert ratio >= 1.4, (a_off.rmse, a_on.rmse, ratio)
    assert a_on.rmse < 0.06, a_on.rmse

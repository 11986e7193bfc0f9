"""Keyframe-trigger policy (fused.keyframe_decision).

The reference's policy is parallax-only (Estimator.cpp:616-635). This
framework adds a default-on map-freshness ("starving") trigger
(config.py TrackingConfig.kf_min_inlier_ratio); VERDICT r4 item 6
requires it to be directly tested: it must fire on map staleness, must
NOT fire near tracking collapse (below 3 x pnp_min_inliers), and
disabling it must reproduce the reference's parallax-only cadence
end to end.
"""

import dataclasses
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from vio360_tpu import config as cfgmod
from vio360_tpu.estimator import fused
from vio360_tpu.estimator.estimator import Estimator
from vio360_tpu.io.dataset import VioDataset

CFG_PATH = os.path.join(
    os.path.dirname(__file__), "..", "configs", "synthetic_480.yaml"
)


def _decide(cfg, success=True, parallax=0.0, n_inl=0, n_active=0) -> bool:
    return bool(fused.keyframe_decision(
        np.bool_(success), np.float32(parallax),
        np.int32(n_inl), np.int32(n_active), cfg,
    ))


class TestStarvingTriggerUnit:
    cfg = cfgmod.VioConfig()  # kf_min_inlier_ratio=0.5, pnp_min_inliers=10

    def test_fires_on_map_staleness(self):
        # healthy pose support (80 inliers >= 3*10) but only 80 of 200
        # active observations agree -> the map went stale; fire.
        assert _decide(self.cfg, parallax=2.0, n_inl=80, n_active=200)

    def test_does_not_fire_below_collapse_gate(self):
        # 20 inliers < 3 * pnp_min_inliers (30): near-collapse — a
        # keyframe here would bake a weakly-supported pose into the map.
        assert not _decide(self.cfg, parallax=2.0, n_inl=20, n_active=200)

    def test_does_not_fire_on_healthy_ratio(self):
        assert not _decide(self.cfg, parallax=2.0, n_inl=150, n_active=200)

    def test_boundary_exact_ratio(self):
        # n_inl == ratio * n_active is NOT starving (strict <)
        assert not _decide(self.cfg, parallax=2.0, n_inl=100, n_active=200)
        assert _decide(self.cfg, parallax=2.0, n_inl=99, n_active=200)

    def test_boundary_collapse_gate(self):
        # exactly 3*pnp_min_inliers passes the gate
        assert _decide(self.cfg, parallax=2.0, n_inl=30, n_active=200)
        assert not _decide(self.cfg, parallax=2.0, n_inl=29, n_active=200)

    def test_parallax_trigger_independent(self):
        assert _decide(self.cfg, parallax=10.0, n_inl=150, n_active=200)
        assert not _decide(self.cfg, parallax=9.9, n_inl=150, n_active=200)

    def test_pnp_failure_blocks_everything(self):
        assert not _decide(self.cfg, success=False, parallax=50.0,
                           n_inl=80, n_active=200)

    def test_ratio_zero_disables_starving(self):
        cfg0 = dataclasses.replace(
            self.cfg,
            tracking=dataclasses.replace(
                self.cfg.tracking, kf_min_inlier_ratio=0.0
            ),
        )
        # same staleness scenario: with the trigger off, no keyframe
        assert not _decide(cfg0, parallax=2.0, n_inl=80, n_active=200)
        # parallax rule unaffected
        assert _decide(cfg0, parallax=10.0, n_inl=80, n_active=200)


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    import make_synthetic_dataset as gen

    out = str(tmp_path_factory.mktemp("kf_policy_seq"))
    assert gen.main([out, "--frames", "45", "--seed", "7", "--texture"]) == 0
    return out


def _run_kf_frames(seq, ratio: float):
    base = cfgmod.load_yaml(CFG_PATH)
    cfg = dataclasses.replace(
        base, tracking=dataclasses.replace(base.tracking,
                                           kf_min_inlier_ratio=ratio)
    )
    est = Estimator(cfg)
    ds = VioDataset(seq, image_size=(cfg.camera.width, cfg.camera.height))
    kfs = []
    for f in ds:
        r = est.process_frame(f.image, f.timestamp, None)
        if r.is_keyframe:
            kfs.append(r.frame_id)
    return kfs


def test_disabled_reproduces_reference_cadence(seq):
    """On a healthy sequence the starving trigger must be quiescent:
    keyframe cadence with the trigger on equals the strict
    parallax-only (reference, Estimator.cpp:616-635) cadence."""
    kf_on = _run_kf_frames(seq, 0.5)
    kf_off = _run_kf_frames(seq, 0.0)
    assert kf_off, "parallax-only run produced no keyframes"
    assert kf_on == kf_off

"""Checkpoint / resume: a resumed run must be bit-identical to an
uninterrupted one (SURVEY.md §5 — new capability vs the reference)."""

import numpy as np
import pytest

import synthetic
from vio360_tpu import config as cfgmod
from vio360_tpu.estimator.estimator import Estimator
from vio360_tpu.io import checkpoint as ckpt

W, H = 480, 240


def make_cfg():
    return cfgmod.VioConfig(
        camera=cfgmod.CameraConfig(width=W, height=H, boundary_margin=10.0),
        features=cfgmod.FeatureConfig(
            max_features=200, capacity=256, min_distance=10.0, quality_level=0.02,
            grid_cols=10, grid_rows=5, max_features_per_grid=10,
        ),
        init=cfgmod.InitializationConfig(
            window_size=6, min_features=40, min_observations=6, min_parallax=6.0,
        ),
        window=cfgmod.WindowConfig(max_keyframes=5, max_landmarks=256),
    )


def _frames(n):
    pts = synthetic.make_point_world(7, 400, radius=(3.0, 10.0))
    rs, ts = synthetic.make_trajectory(n, step=0.12, rot_step=0.004)
    return [synthetic.render_point_image(pts, rs[i], ts[i], W, H) for i in range(n)]


def test_roundtrip_state_dict(tmp_path):
    path = str(tmp_path / "s.npz")
    state = {
        "a": np.arange(6).reshape(2, 3),
        "nested": {"flag": True, "n": 3, "x": 1.5, "s": "hi", "none": None},
        "lst": [np.zeros(2), {"y": np.ones(3)}],
        "tup": (1, 2.0),
    }
    ckpt.save_state(path, state)
    out = ckpt.load_state(path)
    assert out["nested"] == state["nested"]
    assert out["tup"] == (1, 2.0)
    np.testing.assert_array_equal(out["a"], state["a"])
    np.testing.assert_array_equal(out["lst"][1]["y"], np.ones(3))


def test_resume_bit_identical(tmp_path):
    n, split = 16, 9
    frames = _frames(n)
    cfg = make_cfg()

    # uninterrupted reference run
    est_full = Estimator(cfg)
    for i, img in enumerate(frames):
        est_full.process_frame(img, i * 0.1)

    # interrupted: snapshot at `split`, reload, continue
    est_a = Estimator(cfg)
    for i in range(split):
        est_a.process_frame(frames[i], i * 0.1)
    path = str(tmp_path / "ck.npz")
    est_a.save(path)
    est_b = Estimator.load(path, cfg)
    assert est_b.frame_id == est_a.frame_id
    assert est_b.initialized == est_a.initialized
    for i in range(split, n):
        est_b.process_frame(frames[i], i * 0.1)

    ts1, rs1, ps1 = est_full.export_trajectory()
    ts2, rs2, ps2 = est_b.export_trajectory()
    np.testing.assert_array_equal(ts1, ts2)
    np.testing.assert_allclose(ps1, ps2, atol=1e-6)
    np.testing.assert_allclose(rs1, rs2, atol=1e-6)
    # window state matches too
    np.testing.assert_allclose(
        np.asarray(est_full.win.kf_t), np.asarray(est_b.win.kf_t), atol=1e-6
    )
    assert int(est_full.win.n_kf) == int(est_b.win.n_kf)


def test_checkpoint_during_bootstrap(tmp_path):
    frames = _frames(4)
    cfg = make_cfg()
    est = Estimator(cfg)
    for i in range(3):
        est.process_frame(frames[i], i * 0.1)
    path = str(tmp_path / "boot.npz")
    est.save(path)
    est2 = Estimator.load(path, cfg)
    assert not est2.initialized
    assert len(est2.snapshots) == len(est.snapshots)
    res = est2.process_frame(frames[3], 0.3)
    assert res.frame_id == 3

"""Visualization subsystem tests (headless counterpart of VizUtils)."""

import os

import numpy as np

from vio360_tpu.config import VisualizationConfig
from vio360_tpu.viz import VideoWriter, draw_tracking, plot_trajectory, write_html_viewer, write_ply


def _track_inputs(n=50, w=320, h=160, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.random((h, w)).astype(np.float32)
    uv = np.stack([rng.uniform(5, w - 5, n), rng.uniform(5, h - 5, n)], -1)
    prev = uv + rng.normal(0, 2, uv.shape)
    valid = rng.random(n) > 0.2
    age = rng.integers(0, 40, n)
    return img, uv, prev, valid, age


def test_draw_tracking_shape_and_dtype():
    img, uv, prev, valid, age = _track_inputs()
    out = draw_tracking(img, uv, prev, valid, age)
    assert out.shape == (160, 320, 3)
    assert out.dtype == np.uint8
    # overlay actually drew something (not just the gray background)
    gray = np.clip(img * 255, 0, 255).astype(np.uint8)
    assert not np.array_equal(out[..., 0], gray)


def test_draw_tracking_outliers_skipped_and_scaled():
    img, uv, prev, valid, age = _track_inputs()
    viz = VisualizationConfig(scale=0.5, show_grid=False, highlight_clustered_grid=False)
    out_all = draw_tracking(img, uv, prev, valid, age, viz=viz)
    out_none = draw_tracking(img, uv, prev, valid, age, outlier=np.ones_like(valid), viz=viz)
    assert out_all.shape == (80, 160, 3)
    # with every feature an outlier nothing but the image remains
    assert (out_all != out_none).any()


def test_write_ply_counts(tmp_path):
    path = str(tmp_path / "map.ply")
    pts = np.random.default_rng(0).normal(size=(100, 3))
    mask = np.zeros(100, bool)
    mask[:30] = True
    pts[5] = np.nan  # dropped
    traj = np.zeros((10, 3))
    n = write_ply(path, pts, mask, traj)
    assert n == 29 + 10
    header = open(path).read().splitlines()
    assert f"element vertex {n}" in header


def test_html_viewer_selfcontained(tmp_path):
    path = str(tmp_path / "viewer.html")
    traj = np.cumsum(np.random.default_rng(1).normal(size=(50, 3)), 0)
    write_html_viewer(path, traj, points=np.zeros((5, 3)), keyframes=traj[::10])
    text = open(path).read()
    assert "const DATA" in text and '"traj"' in text
    assert "http" not in text.lower().replace("http-equiv", "")  # no external fetches


def test_plot_trajectory(tmp_path):
    path = str(tmp_path / "traj.png")
    traj = np.cumsum(np.random.default_rng(2).normal(size=(40, 3)), 0)
    plot_trajectory(path, traj, groundtruth=traj + 0.1, keyframes=traj[::8])
    assert os.path.getsize(path) > 1000


def test_video_writer(tmp_path):
    path = str(tmp_path / "out.mp4")
    with VideoWriter(path, fps=10) as vw:
        for _ in range(5):
            vw.write(np.zeros((64, 128, 3), np.uint8))
    frames_dir = str(tmp_path / "out_frames")
    wrote_mp4 = os.path.exists(path) and os.path.getsize(path) > 0
    wrote_frames = os.path.isdir(frames_dir) and len(os.listdir(frames_dir)) == 5
    assert wrote_mp4 or wrote_frames

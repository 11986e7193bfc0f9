"""Tests for config ingestion, dataset IO, trajectory export, and metrics."""

import os

import numpy as np
import pytest

from vio360_tpu import config as cfg
from vio360_tpu.io import dataset, trajectory
from vio360_tpu.utils import metrics


class TestConfig:
    def test_defaults_match_reference_runtime(self):
        c = cfg.VioConfig()
        assert c.camera.width == 960 and c.camera.height == 480
        assert c.optical_flow.window_size == 21  # code value, not YAML's 51
        assert c.ransac.threshold_degrees == 2.0  # code value, not YAML's 5.0
        assert c.window.max_keyframes == 10
        assert c.features.capacity % 128 == 0

    def test_load_reference_yaml(self, tmp_path):
        yaml_text = """%YAML:1.0
---
camera:
  width: 480
  height: 240
feature_detection:
  max_features: 500
initialization:
  window_size: 8
imu:
  frequency: 100.0
extrinsics:
  T_BC:
    - [0.0, -1.0, 0.0, 0.01]
    - [0.0, 0.0, 1.0, 0.02]
    - [-1.0, 0.0, 0.0, 0.03]
    - [0.0, 0.0, 0.0, 1.0]
"""
        p = tmp_path / "cfg.yaml"
        p.write_text(yaml_text)
        c = cfg.load_yaml(str(p))
        assert c.camera.width == 480
        assert c.features.max_features == 500
        assert c.features.capacity == 512
        assert c.init.window_size == 8
        assert c.imu.frequency == 100.0
        np.testing.assert_allclose(c.t_bc_array()[0], [0.0, -1.0, 0.0, 0.01])

    def test_config_hashable(self):
        hash(cfg.VioConfig())  # needed for static jit args


@pytest.fixture
def fake_dataset(tmp_path):
    d = tmp_path / "seq"
    (d / "images").mkdir(parents=True)
    ts = [0.0, 0.1, 0.2]
    (d / "cam_timestamps.txt").write_text("\n".join(str(t) for t in ts))
    imu_lines = ["timestamp,ax,ay,az,gx,gy,gz"]
    for i in range(60):
        t = i * 0.005
        imu_lines.append(f"{t},0.1,0.2,9.8,0.01,0.02,0.03")
    (d / "imu_data.csv").write_text("\n".join(imu_lines))
    rng = np.random.default_rng(0)
    for i in range(3):
        np.save(d / "images" / f"{i:06d}.npy", rng.random((24, 48)).astype(np.float32))
    return str(d)


class TestDataset:
    def test_loads_and_slices_imu(self, fake_dataset):
        ds = dataset.VioDataset(fake_dataset)
        assert len(ds) == 3
        frames = list(ds)
        assert frames[0].image.shape == (24, 48)
        # Frame 1 gets IMU in [0.0, 0.1): 20 samples at 200 Hz
        assert frames[1].imu.shape[0] == 20
        assert frames[1].imu[0, 0] >= 0.0 and frames[1].imu[-1, 0] < 0.1

    def test_imu_csv_no_header(self, tmp_path):
        p = tmp_path / "imu.csv"
        p.write_text("0.0,1,2,3,4,5,6\n0.005,1,2,3,4,5,6\n")
        imu = dataset.load_imu_csv(str(p))
        assert imu.shape == (2, 7)


class TestTrajectory:
    def test_tum_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        n = 5
        ts = np.arange(n) * 0.1
        rs, ps = [], []
        for _ in range(n):
            a = rng.standard_normal(3) * 0.3
            # build rotation via Rodrigues
            th = np.linalg.norm(a)
            k = a / max(th, 1e-9)
            km = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
            rs.append(np.eye(3) + np.sin(th) * km + (1 - np.cos(th)) * km @ km)
            ps.append(rng.standard_normal(3))
        path = str(tmp_path / "traj.tum")
        trajectory.write_tum(path, ts, rs, ps)
        ts2, rs2, ps2 = trajectory.read_tum(path)
        np.testing.assert_allclose(ts2, ts, atol=1e-8)
        np.testing.assert_allclose(ps2, ps, atol=1e-8)
        np.testing.assert_allclose(rs2, rs, atol=1e-6)

    def test_kitti_write(self, tmp_path):
        path = str(tmp_path / "traj.kitti")
        trajectory.write_kitti(path, [np.eye(3)], [np.zeros(3)])
        vals = [float(x) for x in open(path).read().split()]
        assert len(vals) == 12


class TestMetrics:
    def test_ate_zero_for_identical(self):
        rng = np.random.default_rng(2)
        p = rng.standard_normal((50, 3))
        r = metrics.ate(p, p, align="none")
        assert r.rmse == pytest.approx(0.0, abs=1e-12)

    def test_sim3_alignment_removes_gauge(self):
        rng = np.random.default_rng(3)
        gt = np.cumsum(rng.standard_normal((100, 3)) * 0.1, axis=0)
        # Apply arbitrary similarity transform to the estimate
        ang = 0.7
        rz = np.array(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
        )
        est = 2.5 * gt @ rz.T + np.array([10.0, -5.0, 3.0])
        r = metrics.ate(est, gt, align="sim3")
        assert r.rmse < 1e-9
        assert r.scale == pytest.approx(1 / 2.5, rel=1e-6)

    def test_rpe_zero_for_identical(self):
        rng = np.random.default_rng(4)
        n = 20
        ts = np.cumsum(rng.standard_normal((n, 3)), axis=0)
        rs = np.broadcast_to(np.eye(3), (n, 3, 3))
        t_err, r_err = metrics.rpe(rs, ts, rs, ts)
        assert t_err == pytest.approx(0.0, abs=1e-12)
        assert r_err == pytest.approx(0.0, abs=1e-6)

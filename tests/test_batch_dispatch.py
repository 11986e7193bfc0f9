"""K-frame scanned dispatch == single-frame megastep loop.

``solver.frames_per_dispatch=K`` routes steady-state frames through
``fused.make_multi_mega_step``: ONE stacked upload + ONE program that
``lax.scan``s the megastep core over K frames + ONE stacked record
fetch (~3/K relay ops per frame; the round-5 relay ledger in
SCALING.md §7 is the motivation). The scan body traces the SAME core
as the single-frame program, but XLA compiles it as a loop body, so
the contract is tight-tolerance equality (f32 fusion-order spread),
plus EXACT equality of every state-machine decision.

Also covers the quantized image transport (``solver.image_transport``):
pack/unpack roundtrip and e2e accuracy parity — the u8 wire format is
the reference's own camera input precision (OpenCV CV_8U mats,
app/main.cpp:199-204).
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


@pytest.fixture(scope="module")
def seq(tmp_path_factory):
    import make_synthetic_dataset as gen

    out = str(tmp_path_factory.mktemp("batch_seq"))
    assert gen.main([out, "--frames", "40", "--seed", "17", "--texture"]) == 0
    return out


def _run(seq, k, use_imu=True, transport=None):
    cfg = cfgmod.load_yaml(CFG_PATH)
    sol = dataclasses.replace(cfg.solver, frames_per_dispatch=k)
    if transport is not None:
        sol = dataclasses.replace(sol, image_transport=transport)
    cfg = dataclasses.replace(cfg, solver=sol)
    est = Estimator(cfg)
    ds = VioDataset(seq, image_size=(cfg.camera.width, cfg.camera.height))
    results = []
    for f in ds:
        imu = f.imu if use_imu else None
        results.extend(est.process_frame_async(f.image, f.timestamp, imu))
    results.extend(est.flush())
    ts, rs, ps = est.export_trajectory()
    return est, results, rs, ps


@pytest.mark.parametrize("k", [3, 4])
def test_batch_matches_single_dispatch(seq, k):
    est_b, res_b, rs_b, ps_b = _run(seq, k)
    est_s, res_s, rs_s, ps_s = _run(seq, 1)

    # every frame resolved exactly once, in order, with identical
    # state-machine decisions (keyframe cadence is threshold-based; the
    # scanned program must not flip any decision on this sequence)
    assert [r.frame_id for r in res_b] == [r.frame_id for r in res_s]
    assert [r.state for r in res_b] == [r.state for r in res_s]
    assert [r.is_keyframe for r in res_b] == [r.is_keyframe for r in res_s]
    assert sum(r.is_keyframe for r in res_b) >= 3
    # poses equal to scan-vs-single compile spread
    for a, b in zip(res_b, res_s):
        np.testing.assert_allclose(a.t_wb, b.t_wb, atol=2e-3)
    assert rs_b.shape == rs_s.shape
    # export runs the pose graph on slightly different edge values, so
    # the spread amplifies there; bound it well below trajectory scale
    assert float(np.max(np.linalg.norm(ps_b - ps_s, axis=-1))) < 0.02
    # pose-graph stores agree structurally
    assert est_b.pg_nodes == est_s.pg_nodes
    assert len(est_b.pg_edges) == len(est_s.pg_edges)


def test_batch_partial_flush(seq):
    """A trailing partial batch (sequence length not divisible by K)
    drains through the single-dispatch path at flush()."""
    est, res, _, _ = _run(seq, 7)
    ds = VioDataset(seq)
    assert [r.frame_id for r in res] == list(range(1, len(ds.timestamps) + 1))


@pytest.mark.parametrize("transport", ["u8", "u16"])
def test_pack_roundtrip_quantized(transport):
    cap, w, h = 8, 64, 8
    rng = np.random.default_rng(3)
    img = rng.random((h, w)).astype(np.float32)
    rows = rng.standard_normal((5, 7))
    buf = fused.pack_frame_input(
        img, 12.25, rows, cap, w, frame_id=42, transport=transport
    )
    assert buf.dtype == (np.uint8 if transport == "u8" else np.uint16)

    cam = dataclasses.replace(cfgmod.CameraConfig(), width=w, height=h)
    imu = dataclasses.replace(
        cfgmod.ImuConfig(), max_samples_per_frame=cap
    )
    cfg = dataclasses.replace(cfgmod.VioConfig(), camera=cam, imu=imu)
    fb = fused.unpack_frame_buf(np.asarray(buf), cfg)
    # aux floats ride raw bytes -> bitcast: EXACT
    assert float(fb["timestamp"]) == 12.25
    assert int(fb["frame_id"]) == 42
    np.testing.assert_array_equal(
        np.asarray(fb["imu_samples"][:5]), rows.astype(np.float32)
    )
    assert np.asarray(fb["imu_mask"]).sum() == 5
    # image quantizes at 1/(2*scale)
    tol = 0.5 / (255.0 if transport == "u8" else 65535.0)
    np.testing.assert_allclose(np.asarray(fb["img"]), img, atol=tol + 1e-7)


def test_batch_relocalizes_after_blackout(tmp_path_factory):
    """Relocalization inside a batch exercises the rare rewind path:
    no per-frame snapshot exists for a mid-batch entry, so the
    estimator rewinds to the pre-batch state and REPLAYS the batch's
    frames through the single-frame megastep (_restore_post_state)
    before applying the reloc surgery and re-dispatching successors."""
    import make_synthetic_dataset as gen

    seq = str(tmp_path_factory.mktemp("batch_blackout"))
    assert gen.main([
        seq, "--frames", "90", "--texture", "--seed", "51",
        "--pixel-noise", "0.02", "--blackout", "45", "55",
    ]) == 0
    cfg = cfgmod.load_yaml(CFG_PATH)
    cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
        cfg.solver, frames_per_dispatch=4
    ))
    est = Estimator(cfg)
    ds = VioDataset(seq, image_size=(cfg.camera.width, cfg.camera.height))
    results = []
    for f in ds:
        results.extend(est.process_frame_async(f.image, f.timestamp, None))
    results.extend(est.flush())
    assert [r.frame_id for r in results] == list(
        range(1, len(ds.timestamps) + 1)
    )
    reloc = [r for r in results if r.state == "relocalized"]
    assert reloc, "no relocalization event in batch mode"
    assert 55 <= reloc[0].frame_id <= 62, reloc[0].frame_id
    post = [r for r in results if r.frame_id > reloc[0].frame_id]
    frac = sum(r.state == "tracking" for r in post) / max(len(post), 1)
    assert frac > 0.9, frac


def test_u8_transport_accuracy_parity(seq):
    """The u8 wire format must not change the state machine or move the
    trajectory beyond quantization-level noise vs exact f32 transport."""
    _, res_u8, _, ps_u8 = _run(seq, 1, transport="u8")
    _, res_f32, _, ps_f32 = _run(seq, 1, transport="f32")
    assert [r.state for r in res_u8] == [r.state for r in res_f32]
    # the trajectories see different pixel values (1/510 quantization),
    # so compare end-to-end drift, not bits
    drift = float(np.max(np.linalg.norm(ps_u8 - ps_f32, axis=-1)))
    assert drift < 0.02, drift

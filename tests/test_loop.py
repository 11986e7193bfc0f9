"""Loop closure / relocalization units (loop/descriptor.py,
loop/closure.py).

No reference counterpart exists (SURVEY.md §5: the reference has no
reloc and no loop closure) — these tests pin the new capability's
primitives: yaw-indexable ring retrieval, mutual-NN patch matching,
database ring-buffer bookkeeping, landmark injection, and the rigid
world correction.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from vio360_tpu import config as cfgmod
from vio360_tpu.estimator import window as window_mod
from vio360_tpu.loop import closure, descriptor

CFG = cfgmod.VioConfig()  # 960x480, bands 16 x bins 64


def _image(seed=0, h=480, w=960):
    rng = np.random.default_rng(seed)
    # smooth random texture: sum of low-frequency sinusoids
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for _ in range(12):
        fy, fx = rng.uniform(0.2, 3.0, 2)
        ph = rng.uniform(0, 2 * np.pi, 2)
        img += rng.uniform(0.2, 1.0) * np.sin(
            2 * np.pi * (fy * yy / h + ph[0])
        ) * np.sin(2 * np.pi * (fx * xx / w + ph[1]))
    # high-frequency detail so 8x8 patches are distinctive
    for _ in range(20):
        fy, fx = rng.uniform(10.0, 45.0, 2)
        ph = rng.uniform(0, 2 * np.pi, 2)
        img += rng.uniform(0.2, 1.0) * np.sin(
            2 * np.pi * (fy * yy / h + ph[0])
        ) * np.sin(2 * np.pi * (fx * xx / w + ph[1]))
    img -= img.min()
    return (img / img.max()).astype(np.float32)


class TestRingDescriptor:
    def test_self_similarity_and_norm(self):
        d = descriptor.ring_descriptor(jnp.asarray(_image()), 16, 64)
        assert d.shape == (2, 16, 64)
        s, sh = descriptor.score_all_shifts(d, d[None])
        assert abs(float(s[0]) - 1.0) < 1e-3
        assert int(sh[0]) == 0

    def test_yaw_shift_recovered(self):
        img = _image(1)
        d0 = descriptor.ring_descriptor(jnp.asarray(img), 16, 64)
        # yaw rotation of the camera == horizontal roll of the ERP image
        k_bins = 5
        px = k_bins * img.shape[1] // 64
        d1 = descriptor.ring_descriptor(jnp.asarray(np.roll(img, px, 1)), 16, 64)
        s, sh = descriptor.score_all_shifts(d1, d0[None])
        assert float(s[0]) > 0.95
        assert int(sh[0]) == 64 - k_bins or int(sh[0]) == k_bins  # roll sign

    def test_exposure_invariance(self):
        img = _image(2)
        d0 = descriptor.ring_descriptor(jnp.asarray(img), 16, 64)
        d1 = descriptor.ring_descriptor(jnp.asarray(0.6 * img + 0.15), 16, 64)
        s, _ = descriptor.score_all_shifts(d1, d0[None])
        assert float(s[0]) > 0.999

    def test_different_images_score_low(self):
        d0 = descriptor.ring_descriptor(jnp.asarray(_image(3)), 16, 64)
        d1 = descriptor.ring_descriptor(jnp.asarray(_image(4)), 16, 64)
        s, _ = descriptor.score_all_shifts(d1, d0[None])
        assert float(s[0]) < 0.7


class TestPatchMatching:
    def test_extract_normalized(self):
        img = jnp.asarray(_image(5))
        uv = jnp.asarray([[100.0, 100.0], [432.5, 221.25], [10.0, 470.0]])
        valid = jnp.asarray([True, True, False])
        p = descriptor.extract_patches(img, uv, valid, 8)
        assert p.shape == (3, 64)
        np.testing.assert_allclose(np.linalg.norm(p[0]), 1.0, atol=1e-4)
        np.testing.assert_allclose(p[2], 0.0)

    def test_horizontal_wrap(self):
        img = jnp.asarray(_image(6))
        # u=0.5 samples across the seam; must equal the rolled image's
        # interior patch at the same physical location
        p0 = descriptor.extract_patches(
            img, jnp.asarray([[0.5, 200.0]]), jnp.asarray([True]), 8
        )
        rolled = jnp.roll(img, 480, axis=1)
        p1 = descriptor.extract_patches(
            rolled, jnp.asarray([[480.5, 200.0]]), jnp.asarray([True]), 8
        )
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-5)

    def test_mutual_matching_permutation(self):
        img = jnp.asarray(_image(7))
        rng = np.random.default_rng(8)
        uv = jnp.asarray(
            np.stack([rng.uniform(50, 900, 32), rng.uniform(50, 430, 32)], -1),
            jnp.float32,
        )
        valid = jnp.ones(32, bool)
        pq = descriptor.extract_patches(img, uv, valid, 8)
        perm = rng.permutation(32)
        pc = pq[perm]
        m, _ = descriptor.match_patches(pq, valid, pc, valid, 0.6, 0.02)
        m = np.asarray(m)
        # every query matches the slot its patch was permuted into
        inv = np.empty(32, int)
        inv[perm] = np.arange(32)
        assert (m == inv).mean() > 0.9

    def test_no_match_returns_minus_one(self):
        img_a, img_b = jnp.asarray(_image(9)), jnp.asarray(_image(10))
        rng = np.random.default_rng(11)
        uv = jnp.asarray(
            np.stack([rng.uniform(50, 900, 16), rng.uniform(50, 430, 16)], -1),
            jnp.float32,
        )
        valid = jnp.ones(16, bool)
        pq = descriptor.extract_patches(img_a, uv, valid, 8)
        pc = descriptor.extract_patches(img_b, uv, valid, 8)
        m, _ = descriptor.match_patches(pq, valid, pc, valid, 0.8, 0.05)
        assert (np.asarray(m) == -1).mean() > 0.7


class TestClosurePrimitives:
    def test_yaw_only_projection(self):
        from vio360_tpu.geometry import lie

        r = np.asarray(lie.so3_exp(jnp.asarray([0.05, -0.03, 0.7])))
        rz = np.asarray(closure._yaw_only(jnp.asarray(r)))
        # exactly a z-rotation
        np.testing.assert_allclose(rz[2], [0, 0, 1], atol=1e-6)
        np.testing.assert_allclose(rz[:, 2], [0, 0, 1], atol=1e-6)
        # close to the input's yaw component
        th = np.arctan2(r[1, 0] - r[0, 1], r[0, 0] + r[1, 1])
        assert abs(np.arctan2(rz[1, 0], rz[0, 0]) - th) < 1e-6

    def test_apply_world_correction_rigid(self):
        cfg = CFG
        win = window_mod.empty_window(4, 128, 64)
        win = dataclasses.replace(
            win,
            kf_id=win.kf_id.at[0].set(0).at[1].set(3),
            kf_t=win.kf_t.at[0].set(jnp.asarray([1.0, 0, 0])),
            lm_alive=win.lm_alive.at[0].set(True),
            lm_pos=win.lm_pos.at[0].set(jnp.asarray([0.0, 2.0, 0])),
        )
        rc = np.asarray(closure._yaw_only(jnp.asarray(
            [[0.0, -1, 0], [1, 0, 0], [0, 0, 1.0]])))
        tc = jnp.asarray([0.0, 0.0, 5.0])
        win2, r2, t2, *_ = closure.apply_world_correction(
            win, jnp.asarray(rc), tc, jnp.eye(3), jnp.zeros(3),
            jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
        )
        np.testing.assert_allclose(
            np.asarray(win2.kf_t[0]), [0, 1, 5], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(win2.lm_pos[0]), [-2, 0, 5], atol=1e-6
        )
        # empty KF slots untouched
        np.testing.assert_allclose(np.asarray(win2.kf_t[2]), 0.0)

    def test_inject_landmarks_pins_marginalized(self):
        win = window_mod.empty_window(4, 128, 64)
        pos = jnp.zeros((64, 3)).at[3].set(jnp.asarray([1.0, 2, 3]))
        ok = jnp.zeros(64, bool).at[3].set(True)
        ids = jnp.full(64, -1, jnp.int32).at[3].set(77)
        win2 = closure.inject_landmarks(
            win, pos, ok, ids, jnp.asarray(5, jnp.int32)
        )
        alive = np.asarray(win2.lm_alive)
        assert alive.sum() == 1
        i = int(np.argmax(alive))
        assert bool(win2.lm_marg[i])
        assert int(win2.lm_feat_id[i]) == 77
        np.testing.assert_allclose(np.asarray(win2.lm_pos[i]), [1, 2, 3])

    def test_db_ring_and_query_mask(self):
        cfg = dataclasses.replace(
            CFG, loop=dataclasses.replace(CFG.loop, db_capacity=8,
                                          exclude_recent_kf=3),
        )
        lc = closure.LoopCloser(cfg)
        assert not lc.queryable()
        for i in range(5):
            lc.entry_fid[lc._write_idx()] = i * 10
            lc.entry_seq[lc._write_idx()] = lc.seq
            lc.seq += 1
        # seq=5 now; entries with seq <= 2 are queryable -> 3 of them
        m = lc._query_mask(3)
        assert m.sum() == 3 and lc.queryable()

    def test_transform_db_matches_history_transform(self):
        cfg = dataclasses.replace(
            CFG, loop=dataclasses.replace(CFG.loop, db_capacity=4),
        )
        db = closure.empty_db(cfg)
        db = dataclasses.replace(
            db,
            lm_pos=db.lm_pos.at[0, 0].set(jnp.asarray([1.0, 1, 1])),
            pose_t=db.pose_t.at[0].set(jnp.asarray([2.0, 0, 0])),
        )
        r_gw = np.eye(3, dtype=np.float32)
        s, anchor = 2.0, np.asarray([1.0, 0, 0], np.float32)
        db2 = closure.transform_db(
            db, jnp.asarray(r_gw), jnp.asarray(s, jnp.float32),
            jnp.asarray(anchor),
        )
        np.testing.assert_allclose(
            np.asarray(db2.lm_pos[0, 0]), [1, 2, 2], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(db2.pose_t[0]), [3, 0, 0], atol=1e-6
        )

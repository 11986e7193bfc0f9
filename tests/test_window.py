"""Tests for the sliding-window map state (keyframes, landmarks, eviction)."""

import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from vio360_tpu.estimator import window
from vio360_tpu.geometry import lie

K, L, C = 4, 64, 32
W, H = 960, 480


def kf_args(i, n_feats=8, id_base=0):
    uv = jnp.zeros((C, 2)).at[:n_feats].set(
        jnp.arange(n_feats * 2, dtype=jnp.float32).reshape(n_feats, 2) * 20 + 100
    )
    ids = jnp.full((C,), -1, jnp.int32).at[:n_feats].set(jnp.arange(n_feats) + id_base)
    z = jnp.zeros(3)
    return (
        jnp.eye(3), jnp.ones(3) * i, z, z, z,
        jnp.asarray(float(i)), jnp.asarray(i), uv, ids,
    )


class TestKeyframes:
    def test_add_until_full_then_evict(self):
        win = window.empty_window(K, L, C)
        for i in range(K):
            win = window.add_keyframe(win, *kf_args(i))
        assert int(win.n_kf) == K
        np.testing.assert_array_equal(np.asarray(win.kf_id), [0, 1, 2, 3])

        win = window.add_keyframe(win, *kf_args(K))
        assert int(win.n_kf) == K
        np.testing.assert_array_equal(np.asarray(win.kf_id), [1, 2, 3, 4])
        np.testing.assert_allclose(win.kf_t[-1], [4.0, 4.0, 4.0])

    def test_landmark_allocation_and_join(self):
        win = window.empty_window(K, L, C)
        win = window.add_keyframe(win, *kf_args(0))
        win = window.add_keyframe(win, *kf_args(1))
        pos = jnp.zeros((C, 3)).at[:8].set(1.0)
        valid = jnp.zeros(C, bool).at[:5].set(True)
        ids = jnp.full((C,), -1, jnp.int32).at[:8].set(jnp.arange(8))
        win = window.add_landmarks(win, pos, valid, ids, win.kf_id[0])
        assert int(win.lm_alive.sum()) == 5

        uv, mask = window.observations(win)
        assert mask.shape == (K, L)
        # both KFs observe all 5 landmarks (same ids in both snapshots)
        assert int(mask[:2].sum()) == 10
        assert int(mask[2:].sum()) == 0

        s2l = window.slot_to_landmark(win, ids)
        assert (np.asarray(s2l[:5]) >= 0).all()
        assert (np.asarray(s2l[5:]) == -1).all()

    def test_eviction_marginalizes_or_kills(self):
        win = window.empty_window(K, L, C)
        for i in range(K):
            win = window.add_keyframe(win, *kf_args(i))
        ids = jnp.full((C,), -1, jnp.int32).at[:8].set(jnp.arange(8))
        pos = jnp.ones((C, 3))
        valid = jnp.zeros(C, bool).at[:8].set(True)
        win = window.add_landmarks(win, pos, valid, ids, win.kf_id[0])
        # all landmarks referenced to KF id 0; all KFs share the ids
        win = window.add_keyframe(win, *kf_args(K))
        # evicted KF0 was reference for all: they are observed later -> marginalized
        alive = np.asarray(win.lm_alive)
        marg = np.asarray(win.lm_marg)
        assert alive[:8].all() if alive[:8].any() else True
        assert marg[np.nonzero(alive)[0]].all()

    def test_eviction_kills_unobserved(self):
        win = window.empty_window(K, L, C)
        win = window.add_keyframe(win, *kf_args(0, id_base=0))
        # landmark seen only in KF0 (other KFs have different ids)
        ids0 = jnp.full((C,), -1, jnp.int32).at[:4].set(jnp.arange(4))
        win = window.add_landmarks(
            win, jnp.ones((C, 3)), jnp.zeros(C, bool).at[:4].set(True), ids0, win.kf_id[0]
        )
        for i in range(1, K + 1):
            win = window.add_keyframe(win, *kf_args(i, id_base=100 * i))
        assert int(win.lm_alive.sum()) == 0


class TestTriangulateNew:
    def test_triangulates_shared_features(self):
        pts = synthetic.make_point_world(0, 20)
        rs, ts = synthetic.make_trajectory(2, step=0.5)
        uv, _ = synthetic.project_tracks(pts, rs, ts, W, H)
        win = window.empty_window(K, L, C)
        ids = jnp.full((C,), -1, jnp.int32).at[:20].set(jnp.arange(20))
        z = jnp.zeros(3)
        for i in range(2):
            uvi = jnp.zeros((C, 2)).at[:20].set(jnp.asarray(uv[i]))
            win = window.add_keyframe(
                win, jnp.asarray(rs[i]), jnp.asarray(ts[i]), z, z, z,
                jnp.asarray(float(i)), jnp.asarray(i), uvi, ids,
            )
        win, n_new, _ = window.triangulate_new_landmarks(win, jnp.eye(4), W, H)
        assert int(n_new) == 20
        # positions match the true world points
        alive = np.asarray(win.lm_alive)
        est = np.asarray(win.lm_pos)[alive]
        slot = np.asarray(win.lm_slot)[alive]
        np.testing.assert_allclose(est, pts[slot], rtol=5e-2, atol=5e-2)
        # reference kf is the previous one
        assert (np.asarray(win.lm_ref_kf)[alive] == 0).all()

    def test_skips_existing_landmarks(self):
        pts = synthetic.make_point_world(1, 10)
        rs, ts = synthetic.make_trajectory(2, step=0.5)
        uv, _ = synthetic.project_tracks(pts, rs, ts, W, H)
        win = window.empty_window(K, L, C)
        ids = jnp.full((C,), -1, jnp.int32).at[:10].set(jnp.arange(10))
        z = jnp.zeros(3)
        for i in range(2):
            uvi = jnp.zeros((C, 2)).at[:10].set(jnp.asarray(uv[i]))
            win = window.add_keyframe(
                win, jnp.asarray(rs[i]), jnp.asarray(ts[i]), z, z, z,
                jnp.asarray(float(i)), jnp.asarray(i), uvi, ids,
            )
        win = window.add_landmarks(
            win, jnp.zeros((C, 3)), jnp.zeros(C, bool).at[:10].set(True), ids, win.kf_id[0]
        )
        win, n_new, _ = window.triangulate_new_landmarks(win, jnp.eye(4), W, H)
        assert int(n_new) == 0

    def test_live_ids_guard_blocks_relabeled_tracks(self):
        """A slot whose live tracker id no longer matches the latest
        keyframe snapshot (outlier-relabeled after BA bad-marking) must
        not seed a landmark (Estimator.cpp:1159,1192 IsValid guard)."""
        pts = synthetic.make_point_world(0, 20)
        rs, ts = synthetic.make_trajectory(2, step=0.5)
        uv, _ = synthetic.project_tracks(pts, rs, ts, W, H)
        win = window.empty_window(K, L, C)
        ids = jnp.full((C,), -1, jnp.int32).at[:20].set(jnp.arange(20))
        z = jnp.zeros(3)
        for i in range(2):
            uvi = jnp.zeros((C, 2)).at[:20].set(jnp.asarray(uv[i]))
            win = window.add_keyframe(
                win, jnp.asarray(rs[i]), jnp.asarray(ts[i]), z, z, z,
                jnp.asarray(float(i)), jnp.asarray(i), uvi, ids,
            )
        # slots 0..4 were relabeled after the snapshot: fresh ids
        live = ids.at[:5].set(jnp.arange(1000, 1005))
        win, n_new, _ = window.triangulate_new_landmarks(
            win, jnp.eye(4), W, H, live_ids=live
        )
        assert int(n_new) == 15
        alive_slots = set(np.asarray(win.lm_slot)[np.asarray(win.lm_alive)].tolist())
        assert alive_slots.isdisjoint(range(5))

    def test_slot_saturation_is_reported(self):
        """Landmark-slot saturation must be visible (n_dropped), never a
        silent cap on map growth."""
        small_l = 8
        pts = synthetic.make_point_world(0, 20)
        rs, ts = synthetic.make_trajectory(2, step=0.5)
        uv, _ = synthetic.project_tracks(pts, rs, ts, W, H)
        win = window.empty_window(K, small_l, C)
        ids = jnp.full((C,), -1, jnp.int32).at[:20].set(jnp.arange(20))
        z = jnp.zeros(3)
        for i in range(2):
            uvi = jnp.zeros((C, 2)).at[:20].set(jnp.asarray(uv[i]))
            win = window.add_keyframe(
                win, jnp.asarray(rs[i]), jnp.asarray(ts[i]), z, z, z,
                jnp.asarray(float(i)), jnp.asarray(i), uvi, ids,
            )
        win, n_new, n_dropped = window.triangulate_new_landmarks(win, jnp.eye(4), W, H)
        assert int(n_new) == small_l
        assert int(n_dropped) == 20 - small_l
        assert int(win.lm_alive.sum()) == small_l


class TestWindowBA:
    def test_ba_improves_noisy_window(self):
        pts = synthetic.make_point_world(2, 60)
        rs, ts = synthetic.make_trajectory(3, step=0.4)
        uv, _ = synthetic.project_tracks(pts, rs, ts, W, H)
        rng = np.random.default_rng(0)
        win = window.empty_window(K, 128, 64)
        ids = jnp.full((64,), -1, jnp.int32).at[:60].set(jnp.arange(60))
        z = jnp.zeros(3)
        for i in range(3):
            r, t = rs[i], ts[i]
            if i > 0:
                dr, dt = lie.se3_exp(jnp.asarray(rng.standard_normal(6) * 0.01, jnp.float32))
                r, t = lie.se3_compose(jnp.asarray(r), jnp.asarray(t), dr, dt)
            uvi = jnp.zeros((64, 2)).at[:60].set(jnp.asarray(uv[i]))
            win = window.add_keyframe(
                win, jnp.asarray(r), jnp.asarray(t), z, z, z,
                jnp.asarray(float(i)), jnp.asarray(i), uvi, ids,
            )
        noisy = pts + rng.standard_normal((60, 3)).astype(np.float32) * 0.03
        win = window.add_landmarks(
            win, jnp.zeros((64, 3)).at[:60].set(jnp.asarray(noisy)),
            jnp.zeros(64, bool).at[:60].set(True), ids, win.kf_id[0],
        )
        win, res = window.window_ba(win, jnp.eye(4), W, H, 0.0)
        assert float(res.final_cost) < 0.05 * float(res.initial_cost)

"""Tests for front-end ops: pyramid, Shi–Tomasi detection, LK, RANSAC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from vio360_tpu.geometry import camera as cam
from vio360_tpu.geometry import lie
from vio360_tpu.ops import lk, pyramid, ransac, sampling, shi_tomasi

H, W = 240, 480


@pytest.fixture(scope="module")
def pano():
    return synthetic.make_panorama(0, H, W)


class TestSampling:
    def test_integer_coords_exact(self, pano):
        uv = jnp.array([[10.0, 20.0], [100.0, 200.0]])
        vals = sampling.bilinear_sample(pano, uv)
        np.testing.assert_allclose(vals[0], pano[20, 10], atol=1e-6)
        np.testing.assert_allclose(vals[1], pano[200, 100], atol=1e-6)

    def test_horizontal_wrap(self, pano):
        a = sampling.bilinear_sample(pano, jnp.array([-1.0, 50.0]))
        b = sampling.bilinear_sample(pano, jnp.array([W - 1.0, 50.0]))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_interpolation_midpoint(self, pano):
        v = sampling.bilinear_sample(pano, jnp.array([10.5, 20.0]))
        expected = 0.5 * (pano[20, 10] + pano[20, 11])
        np.testing.assert_allclose(v, expected, atol=1e-6)


class TestPyramid:
    def test_shapes(self, pano):
        lv = pyramid.build_pyramid(pano, 3)
        assert [x.shape for x in lv] == [(240, 480), (120, 240), (60, 120), (30, 60)]

    def test_downsample_preserves_mean(self, pano):
        lo = pyramid.pyr_down(pano)
        assert abs(float(lo.mean()) - float(pano.mean())) < 0.01

    def test_gradients_of_ramp(self):
        img = jnp.broadcast_to(jnp.arange(64, dtype=jnp.float32)[None, :], (32, 64)).copy()
        ix, iy = pyramid.scharr_gradients(img)
        # interior: horizontal ramp slope 1, no vertical gradient
        np.testing.assert_allclose(ix[5:-5, 5:-5], 1.0, atol=1e-4)
        np.testing.assert_allclose(iy[5:-5, 5:-5], 0.0, atol=1e-4)


class TestDetect:
    def test_finds_strong_corners(self, pano):
        mask = cam.polar_mask(W, H, 0.15)
        empty_uv = jnp.zeros((1, 2))
        empty_valid = jnp.zeros((1,), bool)
        uv, score, valid = shi_tomasi.detect(
            pano, mask, empty_uv, empty_valid, max_new=128, min_distance=15.0
        )
        n = int(valid.sum())
        assert n > 30
        # All detections inside allowed region
        v = np.asarray(uv[np.asarray(valid)])
        assert (v[:, 1] >= 0.15 * H).all() and (v[:, 1] <= 0.85 * H).all()

    def test_min_distance_spacing_vs_existing(self, pano):
        mask = cam.polar_mask(W, H, 0.15)
        # First detect, then re-detect with the found features as existing:
        uv1, _, val1 = shi_tomasi.detect(
            pano, mask, jnp.zeros((1, 2)), jnp.zeros((1,), bool), max_new=64, min_distance=20.0
        )
        uv2, _, val2 = shi_tomasi.detect(
            pano, mask, uv1, val1, max_new=64, min_distance=20.0
        )
        a = np.asarray(uv1[np.asarray(val1)])
        b = np.asarray(uv2[np.asarray(val2)])
        if len(a) and len(b):
            du = np.abs(b[:, None, 0] - a[None, :, 0])
            du = np.minimum(du, W - du)
            dv = b[:, None, 1] - a[None, :, 1]
            d = np.sqrt(du**2 + dv**2)
            assert d.min() >= 20.0

    def test_respects_mask(self, pano):
        mask = jnp.zeros((H, W), bool).at[:, : W // 4].set(True)
        mask &= cam.polar_mask(W, H, 0.15)
        uv, _, valid = shi_tomasi.detect(
            pano, mask, jnp.zeros((1, 2)), jnp.zeros((1,), bool), max_new=32, min_distance=10.0
        )
        v = np.asarray(uv[np.asarray(valid)])
        assert (v[:, 0] < W // 4).all()


class TestLK:
    def test_tracks_pure_rotation(self, pano):
        # Rotate camera by a small yaw: flow is ~ -dlon * W/(2pi) px in u.
        phi = jnp.array([0.0, 0.02, 0.0])
        r = lie.so3_exp(phi)
        img2 = synthetic.render_rotated_view(pano, r)

        mask = cam.polar_mask(W, H, 0.2)
        uv0, _, val0 = shi_tomasi.detect(
            pano, mask, jnp.zeros((1, 2)), jnp.zeros((1,), bool), max_new=64, min_distance=15.0
        )
        uv1, status, err = lk.track(pano, img2, uv0, val0, num_levels=3, half_win=10)
        ok = np.asarray(status & val0)
        assert ok.sum() > 20

        # Ground truth: b_c1 = bearing(uv0); new pixel = project(R^T b)
        b = cam.pixel_to_bearing(uv0, W, H)
        b2 = b @ r  # R^T b
        uv_gt = cam.bearing_to_pixel(b2, W, H)
        e = np.array(uv1 - uv_gt)[ok]
        e[:, 0] = (e[:, 0] + W / 2) % W - W / 2
        rms = np.sqrt((e**2).sum(axis=1).mean())
        assert rms < 0.35, rms

    def test_tracks_across_seam(self, pano):
        phi = jnp.array([0.0, 0.05, 0.0])
        r = lie.so3_exp(phi)
        img2 = synthetic.render_rotated_view(pano, r)
        # Feature near the seam
        uv0 = jnp.array([[2.0, H / 2.0], [W - 3.0, H / 2.0 + 10.0]])
        val0 = jnp.array([True, True])
        uv1, status, _ = lk.track(pano, img2, uv0, val0)
        assert bool(status.all())
        b = cam.pixel_to_bearing(uv0, W, H)
        uv_gt = cam.bearing_to_pixel(b @ r, W, H)
        e = np.array(uv1 - uv_gt)
        e[:, 0] = (e[:, 0] + W / 2) % W - W / 2
        assert np.abs(e).max() < 0.5

    def test_invalid_stay_invalid(self, pano):
        uv0 = jnp.array([[100.0, 100.0]])
        uv1, status, _ = lk.track(pano, pano, uv0, jnp.array([False]))
        assert not bool(status[0])

    def test_zero_motion(self, pano):
        mask = cam.polar_mask(W, H, 0.2)
        uv0, _, val0 = shi_tomasi.detect(
            pano, mask, jnp.zeros((1, 2)), jnp.zeros((1,), bool), max_new=32, min_distance=20.0
        )
        uv1, status, _ = lk.track(pano, pano, uv0, val0)
        d = np.asarray(uv1 - uv0)[np.asarray(status & val0)]
        assert np.abs(d).max() < 0.05


class TestRotationRansac:
    def make_bearings(self, n=200, outliers=40, seed=0):
        rng = np.random.default_rng(seed)
        b1 = rng.standard_normal((n, 3))
        b1 /= np.linalg.norm(b1, axis=-1, keepdims=True)
        r = np.asarray(lie.so3_exp(jnp.array([0.03, -0.05, 0.02])))
        b2 = b1 @ r.T
        # corrupt some
        idx = rng.choice(n, outliers, replace=False)
        junk = rng.standard_normal((outliers, 3))
        junk /= np.linalg.norm(junk, axis=-1, keepdims=True)
        b2[idx] = junk
        return jnp.asarray(b1, jnp.float32), jnp.asarray(b2, jnp.float32), r, idx

    def test_recovers_rotation_and_outliers(self):
        b1, b2, r_true, out_idx = self.make_bearings()
        key = jax.random.PRNGKey(0)
        r_est, inliers, n_inl = ransac.rotation_ransac(
            key, b1, b2, jnp.ones(b1.shape[0], bool), iterations=500
        )
        assert float(jnp.linalg.norm(r_est - jnp.asarray(r_true))) < 1e-2
        inl = np.asarray(inliers)
        assert not inl[out_idx].any()
        assert inl.sum() >= 150

    def test_respects_valid_mask(self):
        b1, b2, *_ = self.make_bearings(seed=1)
        valid = jnp.ones(b1.shape[0], bool).at[:50].set(False)
        _, inliers, _ = ransac.rotation_ransac(jax.random.PRNGKey(1), b1, b2, valid)
        assert not bool(inliers[:50].any())


class TestEssentialRansac:
    def test_recovers_with_outliers(self):
        rng = np.random.default_rng(3)
        n = 300
        pts = rng.uniform(-5, 5, (n, 3)) + np.array([0, 0, 8.0])
        r = np.asarray(lie.so3_exp(jnp.array([0.04, 0.09, -0.03])))
        t = np.array([1.0, 0.2, -0.3])
        t /= np.linalg.norm(t)
        b1 = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        p2 = pts @ r.T + t
        b2 = p2 / np.linalg.norm(p2, axis=-1, keepdims=True)
        out_idx = rng.choice(n, 60, replace=False)
        junk = rng.standard_normal((60, 3))
        b2[out_idx] = junk / np.linalg.norm(junk, axis=-1, keepdims=True)

        e, mask, n_inl = ransac.essential_ransac(
            jax.random.PRNGKey(2),
            jnp.asarray(b1, jnp.float32),
            jnp.asarray(b2, jnp.float32),
            jnp.ones(n, bool),
            threshold=0.02,
            iterations=300,
        )
        assert int(n_inl) >= 200
        m = np.asarray(mask)
        assert m[out_idx].mean() < 0.1
        # Check recovered E annihilates true inliers
        true_inl = np.setdiff1d(np.arange(n), out_idx)
        errs = np.abs(np.einsum("ni,ij,nj->n", b2[true_inl], np.asarray(e), b1[true_inl]))
        assert np.median(errs) < 5e-3

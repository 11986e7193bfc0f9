"""Synthetic ERP scenes for testing (SURVEY.md §4 test strategy).

Two generators:

- dense: random smooth panorama + pure-rotation view renderer (exact
  ground-truth optical flow) for detector/LK tests;
- sparse: 3D point cloud + known trajectory -> per-frame feature tracks
  through the ERP model, for initializer/solver/estimator tests where
  ATE should be ~0.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from vio360_tpu.geometry import camera as cam
from vio360_tpu.geometry import lie
from vio360_tpu.ops.pyramid import pyr_down, _blur_h, _blur_v
from vio360_tpu.ops.sampling import bilinear_sample


def make_panorama(seed: int, height: int, width: int, octaves: int = 4) -> jnp.ndarray:
    """Smooth multi-octave random texture [H, W] in [0, 1]."""
    rng = np.random.default_rng(seed)
    img = np.zeros((height, width), np.float32)
    for o in range(octaves):
        h = max(4, height >> (octaves - 1 - o))
        w = max(8, width >> (octaves - 1 - o))
        noise = rng.standard_normal((h, w)).astype(np.float32)
        # upsample by repeating + blurring on device
        t = jnp.asarray(noise)
        while t.shape[0] < height:
            t = jnp.repeat(jnp.repeat(t, 2, 0), 2, 1)
            t = _blur_v(_blur_h(t))
        t = t[:height, :width]
        img += np.asarray(t) * (0.5**(octaves - 1 - o))
    img = (img - img.min()) / (img.max() - img.min() + 1e-9)
    return jnp.asarray(img)


def render_rotated_view(pano: jnp.ndarray, r_wc: jnp.ndarray) -> jnp.ndarray:
    """Render the panorama seen by a camera with orientation r_wc.

    Identity pose reproduces the panorama. Pixel bearing b_c maps to the
    world bearing r_wc @ b_c, sampled from the panorama's ERP chart.
    """
    h, w = pano.shape
    vv, uu = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij")
    uv = jnp.stack([uu, vv], axis=-1)
    b_c = cam.pixel_to_bearing(uv, w, h)
    b_w = b_c @ r_wc.T
    src = cam.bearing_to_pixel(b_w, w, h)
    return bilinear_sample(pano, src)


def render_textured_view(
    pano: jnp.ndarray,  # [PH, PW] texture on the sphere (ERP chart)
    r_wc: jnp.ndarray,  # [3,3] camera orientation
    t_wc: jnp.ndarray,  # [3] camera center (|t| < radius)
    width: int,
    height: int,
    radius: float = 6.0,
) -> jnp.ndarray:
    """Render an ERP view from INSIDE a texture-mapped sphere, with
    true parallax (VERDICT r2 missing #4: Gaussian-blob imagery is the
    easiest possible case for LK/Shi-Tomasi; this exercises the front
    end on dense natural-spectrum texture, the regime the reference's
    KLT runs in on real 360 footage, FeatureTracker.cpp:228-251).

    Each pixel's camera bearing b is ray-cast from t_wc onto the sphere
    |p| = radius centred at the world origin; the texture is indexed by
    the WORLD direction of the hit point, so camera translation slides
    texture with physically correct parallax (a rigid spherical room).
    """
    h, w = height, width
    ph, pw = pano.shape
    vv, uu = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    uv = jnp.stack([uu, vv], axis=-1)
    b_c = cam.pixel_to_bearing(uv, w, h)  # [H,W,3] unit
    b_w = b_c @ r_wc.T
    tb = b_w @ t_wc  # [H,W]
    tt = jnp.dot(t_wc, t_wc)
    s = -tb + jnp.sqrt(jnp.maximum(tb * tb + radius * radius - tt, 1e-9))
    p_w = t_wc[None, None, :] + s[..., None] * b_w
    dir_w = p_w / jnp.linalg.norm(p_w, axis=-1, keepdims=True)
    src = cam.bearing_to_pixel(dir_w, pw, ph)
    return bilinear_sample(pano, src)


def make_point_world(seed: int, n_points: int = 400, radius: tuple[float, float] = (4.0, 12.0)) -> np.ndarray:
    """Random 3D landmarks in a shell around the origin."""
    rng = np.random.default_rng(seed)
    dirs = rng.standard_normal((n_points, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    r = rng.uniform(*radius, n_points)[:, None]
    return (dirs * r).astype(np.float32)


def make_trajectory(n_frames: int, step: float = 0.08, rot_step: float = 0.01):
    """Smooth forward trajectory; returns (rs_wb [T,3,3], ts_wb [T,3])."""
    rs, ts = [], []
    r = np.eye(3, dtype=np.float32)
    t = np.zeros(3, dtype=np.float32)
    for i in range(n_frames):
        rs.append(r.copy())
        ts.append(t.copy())
        phi = np.array([0.2 * rot_step * np.sin(i * 0.3), rot_step, 0.1 * rot_step * np.cos(i * 0.2)], np.float32)
        r = r @ np.asarray(lie.so3_exp(jnp.asarray(phi)))
        t = t + r @ np.array([0.3 * step * np.sin(i * 0.1), 0.05 * step, step], np.float32)
    return np.stack(rs), np.stack(ts)


def render_point_image(
    points_w: np.ndarray,  # [M,3]
    r_wc: np.ndarray,  # [3,3]
    t_wc: np.ndarray,  # [3] camera center
    width: int,
    height: int,
    sigma: float = 1.2,
    half: int = 4,
) -> jnp.ndarray:
    """Render a dense trackable image: Gaussian blob per visible landmark.

    Gives real parallax under translation (unlike the rotated panorama),
    so the full VO loop — LK, init, PnP, BA — can run end-to-end on
    images with known ground truth.
    """
    p_c = (points_w - t_wc) @ r_wc  # R_cw = R_wc^T
    uv = np.asarray(cam.project(jnp.asarray(p_c, jnp.float32), width, height))
    m = points_w.shape[0]
    r = np.arange(-half, half + 1)
    dv, du = np.meshgrid(r, r, indexing="ij")
    offs = np.stack([du.reshape(-1), dv.reshape(-1)], -1)  # [P,2]
    centers = np.floor(uv).astype(np.int64)
    frac = uv - centers
    pix = centers[:, None, :] + offs[None, :, :]  # [M,P,2]
    d = offs[None] - frac[:, None, :]
    val = np.exp(-(d[..., 0] ** 2 + d[..., 1] ** 2) / (2 * sigma**2))
    px = np.mod(pix[..., 0], width)
    py = pix[..., 1]
    ok = (py >= 0) & (py < height)
    img = np.zeros((height, width), np.float32)
    np.add.at(img, (py[ok], px[ok]), val[ok])
    return jnp.asarray(np.clip(img, 0.0, 1.0))


def project_tracks(
    points_w: np.ndarray,  # [M, 3]
    rs_wc: np.ndarray,  # [T, 3, 3] camera-to-world rotations
    ts_wc: np.ndarray,  # [T, 3] camera centers in world
    width: int,
    height: int,
    noise_px: float = 0.0,
    seed: int = 0,
):
    """Project all landmarks into every frame.

    Returns (uv [T, M, 2], bearings [T, M, 3] unit camera-frame rays).
    """
    rng = np.random.default_rng(seed)
    t_frames, m = rs_wc.shape[0], points_w.shape[0]
    uv = np.zeros((t_frames, m, 2), np.float32)
    brg = np.zeros((t_frames, m, 3), np.float32)
    for k in range(t_frames):
        p_c = (points_w - ts_wc[k]) @ rs_wc[k]  # R_cw = R_wc^T
        u = np.asarray(cam.project(jnp.asarray(p_c), width, height))
        if noise_px > 0:
            u = u + rng.standard_normal(u.shape).astype(np.float32) * noise_px
            u[:, 0] %= width
        uv[k] = u
        b = np.asarray(cam.pixel_to_bearing(jnp.asarray(u), width, height))
        brg[k] = b
    return uv, brg

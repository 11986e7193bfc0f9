"""Multi-sequence serving path on the virtual 8-device CPU mesh.

Asserts the seq-sharded batched frame step (LK + PnP,
parallel/multi_seq.py) equals the unsharded per-sequence path — the
production throughput axis must not change results (SURVEY.md §4 (4)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import synthetic
from vio360_tpu.geometry import camera as cam, lie
from vio360_tpu.parallel import multi_seq

W, H = 192, 96
CAP = 64


def build_batch(b=8, seed=0):
    """B sequences: rotated panorama pairs + geometrically consistent
    landmarks so LK tracks real flow and PnP converges."""
    rng = np.random.default_rng(seed)
    imgs_p, imgs_n, uvs, valids, pts_all, r0s, t0s = [], [], [], [], [], [], []
    for s in range(b):
        pano = synthetic.make_panorama(seed + s, H, W)
        rot = lie.so3_exp(jnp.asarray([0.0, 0.015 + 0.002 * s, 0.0], jnp.float32))
        img_p = pano
        img_n = synthetic.render_rotated_view(pano, rot)
        pts = synthetic.make_point_world(seed + 10 + s, CAP)
        uv = np.asarray(cam.project(jnp.asarray(pts), W, H))
        inb = (uv[:, 1] > H * 0.2) & (uv[:, 1] < H * 0.8)
        imgs_p.append(np.asarray(img_p))
        imgs_n.append(np.asarray(img_n))
        uvs.append(uv)
        valids.append(inb)
        pts_all.append(pts)
        r0s.append(np.eye(3, dtype=np.float32))
        t0s.append(np.zeros(3, np.float32))
    to = lambda x: jnp.asarray(np.stack(x))
    uv_b = to(uvs).astype(jnp.float32)
    return (
        to(imgs_p), to(imgs_n), uv_b, to(valids),
        uv_b,  # uv_guess: no prediction in this test
        to(pts_all), jnp.zeros((b, CAP), bool), to(r0s), to(t0s),
    )


@pytest.fixture(scope="module")
def batch():
    return build_batch()


def test_sharded_equals_unsharded(batch):
    mesh = multi_seq.make_seq_mesh()
    assert mesh.devices.size == 8
    r_cb, t_cb = jnp.eye(3), jnp.zeros(3)

    sharded_fn = multi_seq.make_multi_seq_frame_step(mesh, W, H)
    out_sh = sharded_fn(*batch, r_cb, t_cb)

    # unsharded reference: plain per-sequence loop, no vmap, no mesh
    outs = []
    for s in range(batch[0].shape[0]):
        args = tuple(a[s] for a in batch)
        outs.append(
            multi_seq.frame_step_single(*args, r_cb, t_cb, width=W, height=H)
        )
    out_ref = [jnp.stack([o[i] for o in outs]) for i in range(len(outs[0]))]

    names = ["r_wb", "t_wb", "success", "num_inliers", "uv", "status", "err"]
    for name, a, b in zip(names, out_sh, out_ref):
        if a.dtype == bool:
            assert bool(jnp.all(a == b)), name
        elif jnp.issubdtype(a.dtype, jnp.integer):
            assert bool(jnp.all(a == b)), name
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=name
            )


def test_no_collectives_in_hlo(batch):
    """Pure data parallelism must not emit any cross-device collective."""
    mesh = multi_seq.make_seq_mesh()
    fn = multi_seq.make_multi_seq_frame_step(mesh, W, H)
    hlo = fn.lower(*batch, jnp.eye(3), jnp.zeros(3)).compile().as_text()
    for op in (
        "all-reduce", "all-gather", "collective-permute", "all-to-all",
        "reduce-scatter",
    ):
        assert op not in hlo, op


def test_tracking_quality(batch):
    """Sanity: the batched path actually tracks (majority status true)."""
    mesh = multi_seq.make_seq_mesh()
    fn = multi_seq.make_multi_seq_frame_step(mesh, W, H)
    out = fn(*batch, jnp.eye(3), jnp.zeros(3))
    status = np.asarray(out[5])
    valid = np.asarray(batch[3])
    frac = status[valid].mean()
    assert frac > 0.6, frac

"""Native C++ data loader vs the PIL reference path.

Requires ``make -C native`` (skipped otherwise). Decodes must match the
Python path: exactly for same-size npy/pgm/png, within quantization for
resizes.
"""

import os

import numpy as np
import pytest

from vio360_tpu.io import dataset as ds
from vio360_tpu.io import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native loader not built (make -C native)"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    """One synthetic frame in several formats."""
    from PIL import Image

    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    h, w = 48, 96
    gray = (rng.random((h, w)) * 255).astype(np.uint8)
    paths = {}
    np.save(root / "a.npy", gray.astype(np.float32) / 255.0)
    paths["npy"] = str(root / "a.npy")
    Image.fromarray(gray).save(root / "a.png")
    paths["png"] = str(root / "a.png")
    Image.fromarray(gray).save(root / "a.pgm")
    paths["pgm"] = str(root / "a.pgm")
    Image.fromarray(gray).save(root / "a.jpg", quality=95)
    paths["jpg"] = str(root / "a.jpg")
    return paths, gray, (w, h)


def test_native_matches_python_exact(images):
    paths, gray, (w, h) = images
    for fmt in ("npy", "png", "pgm"):
        loader = native_loader.NativeImageLoader([paths[fmt]], (w, h))
        native = loader.get(0)
        loader.close()
        ref = ds.load_image_gray(paths[fmt], (w, h))
        np.testing.assert_allclose(native, ref, atol=1e-6, err_msg=fmt)


def test_native_jpeg_close(images):
    paths, gray, (w, h) = images
    loader = native_loader.NativeImageLoader([paths["jpg"]], (w, h))
    native = loader.get(0)
    loader.close()
    # JPEG decoders differ slightly (IDCT variants); compare loosely
    assert np.abs(native - gray / 255.0).mean() < 0.02


def test_native_resize_close(images):
    paths, gray, (w, h) = images
    size = (w // 2, h // 2)
    loader = native_loader.NativeImageLoader([paths["png"]], size)
    native = loader.get(0)
    loader.close()
    ref = ds.load_image_gray(paths["png"], size)
    assert native.shape == ref.shape == (size[1], size[0])
    assert np.abs(native - ref).max() < 0.02  # PIL uses area-weighted bilinear


def test_prefetch_sequence(tmp_path):
    rng = np.random.default_rng(1)
    n, h, w = 12, 32, 64
    paths = []
    imgs = []
    for i in range(n):
        img = rng.random((h, w)).astype(np.float32)
        p = str(tmp_path / f"{i:03d}.npy")
        np.save(p, img)
        paths.append(p)
        imgs.append(img)
    loader = native_loader.NativeImageLoader(paths, (w, h), n_threads=3, prefetch=4)
    for i in range(n):
        np.testing.assert_allclose(loader.get(i), imgs[i], atol=1e-7)
    loader.close()


def test_decode_error_reported(tmp_path):
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not a png")
    loader = native_loader.NativeImageLoader([bad], (8, 8))
    with pytest.raises(RuntimeError, match="decode failed"):
        loader.get(0)
    loader.close()


def test_dataset_uses_native(tmp_path):
    os.makedirs(tmp_path / "images")
    rng = np.random.default_rng(2)
    for i in range(3):
        np.save(tmp_path / "images" / f"{i:03d}.npy", rng.random((24, 48)).astype(np.float32))
    with open(tmp_path / "cam_timestamps.txt", "w") as f:
        f.write("0.0\n0.1\n0.2\n")
    data = ds.VioDataset(str(tmp_path), image_size=(48, 24))
    assert data._native is not None
    frames = list(data)
    assert len(frames) == 3 and frames[0].image.shape == (24, 48)

"""Host-side dataset loading for the reference 360-VIO format.

Counterpart of ``app/main.cpp:30-119``:

- ``cam_timestamps.txt``  — one float seconds-timestamp per line
- ``imu_data.csv``        — header + rows ``t,ax,ay,az,gx,gy,gz``
- ``images/``             — sorted image files (grayscale ERP frames)

Decoding stays on host (SURVEY.md §3 device-boundary note); frames are
handed to the device as float32 [H, W] arrays in [0, 1]. A native C++
prefetching decoder can be slotted in behind the same iterator API.
"""

from __future__ import annotations

import csv
import dataclasses
import os
from collections.abc import Iterator

import numpy as np


@dataclasses.dataclass
class ImuSample:
    timestamp: float
    accel: np.ndarray  # [3] ax, ay, az
    gyro: np.ndarray  # [3] gx, gy, gz


@dataclasses.dataclass
class DatasetFrame:
    index: int
    timestamp: float
    image: np.ndarray  # [H, W] float32 in [0,1]
    imu: np.ndarray  # [M, 7] rows (t, ax, ay, az, gx, gy, gz) in [prev_t, t)


def load_camera_timestamps(path: str) -> np.ndarray:
    """One float per line -> [N] float64 seconds (main.cpp:30-48)."""
    ts = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                ts.append(float(line))
    return np.asarray(ts, dtype=np.float64)


def load_imu_csv(path: str) -> np.ndarray:
    """Header + 7 columns -> [M, 7] float64 (main.cpp:50-89)."""
    rows = []
    with open(path) as f:
        reader = csv.reader(f)
        header = next(reader, None)
        if header is not None and _is_numeric_row(header):
            rows.append([float(x) for x in header[:7]])
        for row in reader:
            if len(row) >= 7:
                rows.append([float(x) for x in row[:7]])
    return np.asarray(rows, dtype=np.float64).reshape(-1, 7)


def _is_numeric_row(row: list[str]) -> bool:
    try:
        [float(x) for x in row[:7]]
        return len(row) >= 7
    except (ValueError, IndexError):
        return False


_IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".pgm", ".bmp", ".tif", ".tiff", ".npy")


def list_image_files(images_dir: str) -> list[str]:
    """Sorted image paths (main.cpp:105-119)."""
    files = [
        os.path.join(images_dir, f)
        for f in sorted(os.listdir(images_dir))
        if f.lower().endswith(_IMAGE_EXTS)
    ]
    return files


def load_image_gray(path: str, size: tuple[int, int] | None = None) -> np.ndarray:
    """Decode to float32 grayscale [H, W] in [0, 1]; optional resize to (W, H).

    Uses PIL (host side). ``.npy`` files load directly (used by
    synthetic datasets and tests).
    """
    if path.endswith(".npy"):
        img = np.load(path)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = np.asarray(img, dtype=np.float32)
    else:
        from PIL import Image

        with Image.open(path) as im:
            im = im.convert("L")
            if size is not None and im.size != size:
                im = im.resize(size, Image.BILINEAR)
            img = np.asarray(im, dtype=np.float32) / 255.0
        return img
    if size is not None and (img.shape[1], img.shape[0]) != size:
        from PIL import Image

        im = Image.fromarray((img * 255).astype(np.uint8))
        img = np.asarray(im.resize(size, Image.BILINEAR), dtype=np.float32) / 255.0
    return img


def slice_imu(imu: np.ndarray, t0: float, t1: float) -> np.ndarray:
    """IMU rows with t in [t0, t1) (main.cpp:91-103)."""
    if imu.size == 0:
        return np.zeros((0, 7), dtype=np.float64)
    m = (imu[:, 0] >= t0) & (imu[:, 0] < t1)
    return imu[m]


class VioDataset:
    """Iterates DatasetFrames of a reference-format dataset directory.

    Expected layout (build.sh:63 convention)::

        dataset_dir/
          cam_timestamps.txt
          imu_data.csv          (optional; VO-only without it)
          images/*.png
    """

    def __init__(
        self,
        dataset_dir: str,
        image_size: tuple[int, int] | None = None,
        use_native: bool = True,
    ):
        self.dir = dataset_dir
        self.timestamps = load_camera_timestamps(
            os.path.join(dataset_dir, "cam_timestamps.txt")
        )
        imu_path = os.path.join(dataset_dir, "imu_data.csv")
        self.imu = load_imu_csv(imu_path) if os.path.exists(imu_path) else np.zeros((0, 7))
        self.image_files = list_image_files(os.path.join(dataset_dir, "images"))
        self.image_size = image_size
        n = min(len(self.timestamps), len(self.image_files))
        self.timestamps = self.timestamps[:n]
        self.image_files = self.image_files[:n]
        # Native threaded prefetch decoder when built (make -C native);
        # VIO360_NO_NATIVE=1 forces the PIL path.
        self._native = None
        if (
            use_native
            and image_size is not None
            and not os.environ.get("VIO360_NO_NATIVE")
        ):
            from . import native_loader

            if native_loader.available():
                self._native = native_loader.NativeImageLoader(
                    self.image_files, image_size
                )

    def __len__(self) -> int:
        return len(self.image_files)

    def load_image(self, i: int) -> np.ndarray:
        if self._native is not None:
            try:
                return self._native.get(i)
            except RuntimeError:
                # per-frame fallback: formats the native decoder rejects
                return load_image_gray(self.image_files[i], self.image_size)
        return load_image_gray(self.image_files[i], self.image_size)

    def __iter__(self) -> Iterator[DatasetFrame]:
        prev_t = -np.inf
        for i, t in enumerate(self.timestamps):
            img = self.load_image(i)
            imu = slice_imu(self.imu, prev_t, t)
            yield DatasetFrame(index=i, timestamp=float(t), image=img, imu=imu)
            prev_t = t

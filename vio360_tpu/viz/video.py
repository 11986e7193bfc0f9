"""Annotated-frame video output.

The reference's build script advertises a video-output argument that
``app/main.cpp`` never implemented (build.sh:60-63; SURVEY.md §5
checkpoint/resume note) — here it actually works: wrap OpenCV's
VideoWriter when an encoder is available, else fall back to writing
numbered PNG frames into a sibling directory.
"""

from __future__ import annotations

import os

import numpy as np


class VideoWriter:
    """Sequential RGB-frame sink: MP4 if cv2 has an encoder, else PNGs."""

    def __init__(self, path: str, fps: float = 20.0):
        self.path = path
        self.fps = fps
        self._writer = None
        self._frame_dir: str | None = None
        self._count = 0

    def _open(self, h: int, w: int) -> None:
        try:
            import cv2

            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            writer = cv2.VideoWriter(self.path, fourcc, self.fps, (w, h))
            if writer.isOpened():
                self._writer = writer
                return
        except Exception:
            pass
        self._frame_dir = os.path.splitext(self.path)[0] + "_frames"
        os.makedirs(self._frame_dir, exist_ok=True)

    def write(self, frame_rgb: np.ndarray) -> None:
        h, w = frame_rgb.shape[:2]
        if self._writer is None and self._frame_dir is None:
            self._open(h, w)
        if self._writer is not None:
            import cv2

            self._writer.write(cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2BGR))
        else:
            from PIL import Image

            Image.fromarray(frame_rgb).save(
                os.path.join(self._frame_dir, f"{self._count:06d}.png")
            )
        self._count += 1

    def close(self) -> None:
        if self._writer is not None:
            self._writer.release()
            self._writer = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

"""ctypes binding for the native threaded image loader.

``native/dataloader.cpp`` decodes and resizes frames in a C++ worker
pool ahead of the consumer (the reference does synchronous cv::imread +
resize in its main loop, app/main.cpp:199-204). Falls back cleanly when
the shared library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB_ENV = "VIO360_NATIVE_LIB"


def _lib_path() -> str | None:
    cand = os.environ.get(_LIB_ENV)
    if cand and os.path.isfile(cand):
        return cand
    here = os.path.dirname(os.path.abspath(__file__))
    native_dir = os.path.join(here, "..", "..", "native")
    cand = os.path.join(native_dir, "libvio360_io.so")
    if os.path.isfile(cand):
        return cand
    # Build on demand when the source tree is present (idempotent;
    # silent failure falls back to the PIL path).
    if os.path.isfile(os.path.join(native_dir, "Makefile")):
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", native_dir],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
        if os.path.isfile(cand):
            return cand
    return None


_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    path = _lib_path()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.vio_loader_open.restype = ctypes.c_void_p
    lib.vio_loader_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.vio_loader_count.restype = ctypes.c_int
    lib.vio_loader_count.argtypes = [ctypes.c_void_p]
    lib.vio_loader_get.restype = ctypes.c_int
    lib.vio_loader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)
    ]
    lib.vio_loader_last_error.restype = ctypes.c_char_p
    lib.vio_loader_last_error.argtypes = [ctypes.c_void_p]
    lib.vio_loader_close.restype = None
    lib.vio_loader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


class NativeImageLoader:
    """Prefetching grayscale-float32 frame source over a path list."""

    def __init__(
        self,
        paths: list[str],
        size: tuple[int, int],  # (W, H)
        n_threads: int = 2,
        prefetch: int = 4,
    ):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native loader not built; run `make -C native` or set "
                f"${_LIB_ENV}"
            )
        self._lib = lib
        self.w, self.h = size
        joined = b"\0".join(p.encode() for p in paths) + b"\0"
        self._joined = joined  # keep alive
        self._h = lib.vio_loader_open(
            joined, len(paths), self.w, self.h, n_threads, prefetch
        )
        self._n = len(paths)

    def __len__(self) -> int:
        return self._n

    def get(self, idx: int) -> np.ndarray:
        out = np.empty((self.h, self.w), np.float32)
        rc = self._lib.vio_loader_get(
            self._h, idx, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            msg = self._lib.vio_loader_last_error(self._h).decode()
            raise RuntimeError(f"native decode failed for frame {idx}: {msg}")
        return out

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.vio_loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

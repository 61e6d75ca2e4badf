"""ctypes binding for the native FFmpeg batch video decoder
(csrc/video_decoder.cc) — the Decord-equivalent host decode path.

The reference's production pipeline decodes with Decord's C++ VideoReader
(mmaction/datasets/pipelines/loading.py:1499-1621). Neither decord nor
PyAV wheels exist in this image, but the system FFmpeg 5.x dev libraries
do, so the same design is built directly on libavcodec/libavformat:
open once → demux-scan a display-order frame index → batch-decode
arbitrary frame indices with keyframe seeks only on jumps → swscale to
RGB24, optionally at reduced resolution (short side ≥ target, mirroring
the JPEG reduced-decode recipe in decode.RawFrameBackend).

Compiled on first use with g++ (cached by source mtime), like
wordpiece_native. Falls back cleanly when g++ or the FFmpeg headers are
missing — decode.get_backend("ffmpeg") then raises and callers keep
using the OpenCV backend.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Sequence

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "video_decoder.cc")


def _build_library(cache_dir: Optional[str] = None) -> str:
    cache_dir = cache_dir or os.path.join(
        tempfile.gettempdir(), "clover_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libvideodecoder.so")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(_CSRC)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", so_path, _CSRC,
             "-lavformat", "-lavcodec", "-lavutil", "-lswscale"],
            check=True, capture_output=True)
    return so_path


_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_library())
        lib.vd_open.restype = ctypes.c_void_p
        lib.vd_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.vd_read.restype = ctypes.c_int
        lib.vd_read.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.vd_close.argtypes = [ctypes.c_void_p]
        lib.vd_last_error.restype = ctypes.c_char_p
        _LIB = lib
    return _LIB


def native_available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


class VideoReader:
    """One open container; len() = frame count, get_batch() = Decord-style
    batched random access returning uint8 RGB (N, H, W, 3)."""

    def __init__(self, path: str, target_short_side: int = 0,
                 threads: int = 1):
        self._lib = _lib()
        nf = ctypes.c_int()
        h = ctypes.c_int()
        w = ctypes.c_int()
        self._handle = self._lib.vd_open(
            path.encode("utf-8"), int(target_short_side), int(threads),
            ctypes.byref(nf), ctypes.byref(h), ctypes.byref(w))
        if not self._handle:
            raise RuntimeError(
                f"ffmpeg open failed for {path}: "
                f"{self._lib.vd_last_error().decode()}")
        self.num_frames = nf.value
        self.height = h.value
        self.width = w.value

    def __len__(self) -> int:
        return self.num_frames

    def get_batch(self, frame_indices: Sequence[int]) -> np.ndarray:
        inds = np.ascontiguousarray(frame_indices, dtype=np.int32)
        out = np.empty((len(inds), self.height, self.width, 3), np.uint8)
        ok = self._lib.vd_read(
            self._handle,
            inds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(inds),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if not ok:
            raise RuntimeError(
                f"ffmpeg decode failed: {self._lib.vd_last_error().decode()}")
        return out

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.vd_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

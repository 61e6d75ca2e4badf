"""ctypes binding for the native C++ WordPiece tokenizer (csrc/wordpiece.cc).

Compiles the shared library on first use (g++, cached by source mtime) and
exposes the same ``encode`` contract as the pure-Python
clover_tpu.data.tokenization.BertTokenizer. Use for high-throughput
pretraining text pipelines; falls back cleanly if no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Dict, Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "wordpiece.cc")


def _build_library(cache_dir: Optional[str] = None) -> str:
    cache_dir = cache_dir or os.path.join(
        tempfile.gettempdir(), "clover_tpu_native")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libwordpiece.so")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < os.path.getmtime(_CSRC)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", so_path, _CSRC],
            check=True, capture_output=True)
    return so_path


_LIB = None


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_library())
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.wp_vocab_size.restype = ctypes.c_int
        lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
        lib.wp_encode.restype = ctypes.c_int
        lib.wp_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
        lib.wp_encode_batch.restype = None
        lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.wp_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


class NativeBertTokenizer:
    """C++-backed tokenizer; same encode() contract as BertTokenizer."""

    def __init__(self, vocab_file: str, lower_case: bool = True):
        self._lib = _lib()
        self._handle = self._lib.wp_create(
            vocab_file.encode("utf-8"), int(lower_case))
        if not self._handle:
            raise FileNotFoundError(vocab_file)

    @property
    def vocab_size(self) -> int:
        return self._lib.wp_vocab_size(self._handle)

    def encode(self, text: str, max_length: int = 30) -> Dict[str, np.ndarray]:
        ids = np.zeros(max_length, dtype=np.int32)
        mask = np.zeros(max_length, dtype=np.int32)
        self._lib.wp_encode(
            self._handle, text.encode("utf-8"), max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return {"token_ids": ids, "input_mask": mask,
                "segment_ids": np.zeros(max_length, dtype=np.int32)}

    def encode_batch(self, texts, max_length: int = 30) -> Dict[str, np.ndarray]:
        n = len(texts)
        ids = np.zeros((n, max_length), dtype=np.int32)
        mask = np.zeros((n, max_length), dtype=np.int32)
        arr = (ctypes.c_char_p * n)(*[t.encode("utf-8") for t in texts])
        self._lib.wp_encode_batch(
            self._handle, arr, n, max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return {"token_ids": ids, "input_mask": mask,
                "segment_ids": np.zeros((n, max_length), dtype=np.int32)}

    def __del__(self):
        try:
            self._lib.wp_destroy(self._handle)
        except Exception:
            pass

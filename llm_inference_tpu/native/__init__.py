"""ctypes bindings to the native runtime library (native/libllmi_native.so).

The compute path is JAX/XLA/Pallas; the RUNTIME around it — tokenization and
weight-file IO, the host-side serving hot paths — has native C++
implementations (mirroring the reference, whose entire runtime is C++:
tokenizer src/models/tokenizer.h, weight loading src/utils/weight_utils.cu).

The library is built on demand with `make -C native` on first use (g++,
~2 s) and cached; every consumer falls back to the pure-Python
implementation if the toolchain is unavailable, so the framework never hard-
depends on a compiled artifact.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libllmi_native.so")

_lock = threading.Lock()
_lib = None
_lib_error: Optional[str] = None


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _NATIVE_DIR, "-j4"],
                           capture_output=True, text=True, timeout=180)
        return r.returncode == 0
    except Exception:
        return False


def load_library():
    """The loaded CDLL, or None if unavailable (build failure, no g++...)."""
    global _lib, _lib_error
    with _lock:
        if _lib is not None or _lib_error is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            srcs = os.path.join(_NATIVE_DIR, "src")
            if not os.path.isdir(srcs) or not _build():
                _lib_error = "native library unavailable"
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            _lib_error = str(e)
            return None
        # signatures
        lib.llmi_tokenizer_load.restype = ctypes.c_void_p
        lib.llmi_tokenizer_load.argtypes = [ctypes.c_char_p]
        lib.llmi_tokenizer_free.argtypes = [ctypes.c_void_p]
        for fn in ("vocab_size", "bos_id", "eos_id"):
            f = getattr(lib, f"llmi_tokenizer_{fn}")
            f.restype = ctypes.c_int32
            f.argtypes = [ctypes.c_void_p]
        lib.llmi_tokenizer_encode.restype = ctypes.c_int32
        lib.llmi_tokenizer_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.llmi_tokenizer_decode.restype = ctypes.c_int32
        lib.llmi_tokenizer_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32]
        for name, st in (("f32_to_bf16", ctypes.c_float),
                         ("f16_to_bf16", ctypes.c_uint16),
                         ("f16_to_f32", ctypes.c_uint16)):
            f = getattr(lib, f"llmi_convert_{name}")
            f.restype = None
            f.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                          ctypes.c_int32]
        lib.llmi_mmap_open.restype = ctypes.c_void_p
        lib.llmi_mmap_open.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64)]
        lib.llmi_mmap_close.argtypes = [ctypes.c_void_p]
        lib.llmi_parallel_memcpy.restype = None
        lib.llmi_parallel_memcpy.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


class NativeBPETokenizer:
    """Drop-in for engine.tokenizer.BPETokenizer backed by the C++ core
    (identical ids; ~30-100x faster encode)."""

    def __init__(self, path: str):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.llmi_tokenizer_load(path.encode())
        if not self._h:
            raise FileNotFoundError(f"cannot load vocab from {path}")
        self.bos_id = lib.llmi_tokenizer_bos_id(self._h)
        self.eos_id = lib.llmi_tokenizer_eos_id(self._h)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.llmi_tokenizer_free(h)
            self._h = None

    @property
    def vocab_size(self) -> int:
        return self._lib.llmi_tokenizer_vocab_size(self._h)

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        data = text.encode()
        cap = max(64, 2 * len(data) + 8)
        while True:
            buf = (ctypes.c_int32 * cap)()
            n = self._lib.llmi_tokenizer_encode(self._h, data,
                                                1 if add_bos else 0, buf, cap)
            if n <= cap:
                return list(buf[:n])
            cap = n

    def decode(self, ids: Sequence[int]) -> str:
        arr = (ctypes.c_int32 * len(ids))(*[int(i) for i in ids])
        cap = max(64, 8 * len(ids))
        while True:
            buf = ctypes.create_string_buffer(cap)
            n = self._lib.llmi_tokenizer_decode(self._h, arr, len(ids),
                                                buf, cap)
            if n <= cap:
                return buf.raw[:n].decode("utf-8", errors="replace")
            cap = n

    def decode_token(self, tid: int) -> str:
        # single-token streaming decode keeps python-side semantics
        return self.decode([tid]) if tid not in (self.bos_id,) else ""


def convert_to_bf16(src, threads: int = 8):
    """numpy f32/f16 array → bf16 (ml_dtypes) using the parallel native
    converter; returns None if the library is unavailable."""
    import numpy as np
    import ml_dtypes
    lib = load_library()
    if lib is None:
        return None
    src = np.ascontiguousarray(src)
    dst = np.empty(src.shape, ml_dtypes.bfloat16)
    n = src.size
    if src.dtype == np.float32:
        lib.llmi_convert_f32_to_bf16(
            src.ctypes.data_as(ctypes.c_void_p),
            dst.ctypes.data_as(ctypes.c_void_p), n, threads)
    elif src.dtype == np.float16:
        lib.llmi_convert_f16_to_bf16(
            src.ctypes.data_as(ctypes.c_void_p),
            dst.ctypes.data_as(ctypes.c_void_p), n, threads)
    else:
        return None
    return dst

"""ctypes bindings for the native JPEG batch loader (native/imgload).

Built on demand with g++ (-ljpeg). ``load_jpeg_batch(paths, (h, w))``
decodes + resizes a whole batch into one float32 array with a worker-thread
pool — the framework's native replacement for the reference's tf.data C++
image path. Non-JPEG files report failure and callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "imgload", "imgload.cpp")
_SO = os.path.join(os.path.dirname(__file__), "imgload", "libimgload.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO, "-ljpeg", "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.imgload_batch.restype = ctypes.c_int
    lib.imgload_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return lib


def load_jpeg_batch(paths: Sequence[str], image_size: Tuple[int, int],
                    num_threads: int = 0
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode+resize JPEGs -> (images [B,H,W,3] f32 in [0,1], ok [B] bool).

    num_threads=0 uses os.cpu_count().
    """
    lib = load()
    b = len(paths)
    h, w = image_size
    out = np.zeros((b, h, w, 3), np.float32)
    ok = np.zeros((b,), np.int32)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    threads = num_threads or (os.cpu_count() or 1)
    lib.imgload_batch(arr, b, h, w, min(threads, b),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                      ok.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out, ok.astype(bool)

"""ctypes binding for the native C++ image-decode runtime (native/loader.cpp).

Builds the shared library on first use (g++ + libpng/libjpeg, baked into the
image); falls back to PIL transparently if the build or load fails, so the
framework never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")


def _build_and_load():
    so_path = os.path.join(_NATIVE_DIR, "libmogloader.so")
    src = os.path.join(_NATIVE_DIR, "loader.cpp")
    if not os.path.exists(so_path) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(so_path)):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(so_path)
    lib.mog_decode_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.mog_decode_batch.restype = ctypes.c_int
    lib.mog_decode_batch_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.mog_decode_batch_u8.restype = ctypes.c_int
    return lib


def get_lib():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is None and not _TRIED:
            _TRIED = True
            try:
                _LIB = _build_and_load()
            except Exception as e:  # noqa: BLE001 — fall back to PIL
                print(f"native loader unavailable ({e}); using PIL",
                      flush=True)
        return _LIB


def decode_batch(paths: list[str], out_h: int, out_w: int, out_c: int,
                 threads: int = 8, dtype=np.float32) -> np.ndarray:
    """Decode+resize a batch of image files -> (N, H, W, C).

    dtype=np.uint8 returns raw [0, 255] pixels — the transport format for
    the device input path: the reference pipeline keeps uint8 through
    every PIL transform and only normalizes in ToTensor
    (code/multi-mnist/main.py:80-82), so shipping uint8 and normalizing
    on-device (utils.images.as_model_image) is bit-faithful and moves 4x
    fewer bytes host->device. dtype=np.float32 returns normalized [-1, 1]
    directly. Uses the C++ thread pool when available."""
    n = len(paths)
    dtype = np.dtype(dtype)
    if dtype not in (np.dtype(np.uint8), np.dtype(np.float32)):
        # the native entry points write exactly 1-byte or 4-byte pixels;
        # any other dtype would reinterpret the buffer silently
        raise ValueError(f"decode_batch supports uint8/float32, got {dtype}")
    out = np.empty((n, out_h, out_w, out_c), dtype)
    # more workers than cores just thrash (bench hosts can have 1 core)
    threads = max(1, min(threads, os.cpu_count() or 1, n))
    lib = get_lib()
    if lib is not None:
        buf = b"\0".join(p.encode() for p in paths) + b"\0"
        if dtype == np.uint8:
            got = lib.mog_decode_batch_u8(
                buf, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                out_h, out_w, out_c, threads)
        else:
            got = lib.mog_decode_batch(
                buf, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                out_h, out_w, out_c, threads)
        if got == n:
            return out
        # partial failure: retry everything via PIL; unreadable files stay 0
    from PIL import Image
    for i, p in enumerate(paths):
        try:
            img = Image.open(p).convert("L" if out_c == 1 else "RGB")
        except OSError:
            out[i] = 0
            continue
        if img.size != (out_w, out_h):
            img = img.resize((out_w, out_h), Image.BILINEAR)
        arr = np.asarray(img)
        if out_c == 1:
            arr = arr[..., None]
        out[i] = arr if dtype == np.uint8 else (
            arr.astype(np.float32) / 127.5 - 1.0)
    return out

"""Build + load the native gamio library; columnar BAM decode via ctypes."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "gamio.cc")
_SO = os.path.join(_HERE, "libgamio.so")

_lock = threading.Lock()
_lib = None
_tried = False


class _GamBam(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("ref_id", ctypes.POINTER(ctypes.c_int32)),
        ("pos", ctypes.POINTER(ctypes.c_int32)),
        ("end_pos", ctypes.POINTER(ctypes.c_int32)),
        ("flag", ctypes.POINTER(ctypes.c_uint16)),
        ("l_seq", ctypes.POINTER(ctypes.c_int32)),
        ("mate_ref_id", ctypes.POINTER(ctypes.c_int32)),
        ("mate_pos", ctypes.POINTER(ctypes.c_int32)),
        ("nh", ctypes.POINTER(ctypes.c_int32)),
        ("xt", ctypes.POINTER(ctypes.c_uint8)),
        ("name_h1", ctypes.POINTER(ctypes.c_uint64)),
        ("name_h2", ctypes.POINTER(ctypes.c_uint64)),
        ("header_text", ctypes.c_char_p),
        ("n_ref", ctypes.c_int32),
        ("ref_names", ctypes.POINTER(ctypes.c_char_p)),
        ("ref_lengths", ctypes.POINTER(ctypes.c_int32)),
        ("error", ctypes.c_char_p),
    ]


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-lz",
             "-pthread"],
            check=True, capture_output=True, text=True)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("GAM_NO_NATIVE"):
            return None
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.gamio_read_bam.restype = ctypes.POINTER(_GamBam)
        lib.gamio_read_bam.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.gamio_free.argtypes = [ctypes.POINTER(_GamBam)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def read_bam_native(path: str, n_threads: int = 8):
    """Decode a BAM file natively.

    Returns (header_text, ref_names, ref_lengths, columns-dict) or None
    if the native library is unavailable; raises on decode errors.
    """
    lib = _load()
    if lib is None:
        return None
    h = lib.gamio_read_bam(path.encode(), n_threads)
    try:
        b = h.contents
        if b.error:
            raise ValueError(
                f"native BAM decode failed for {path}: "
                f"{b.error.decode()}")
        n = b.n

        def arr(ptr, dtype):
            if n == 0:
                return np.empty(0, dtype)
            return np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype,
                                                                 copy=True)

        cols = dict(
            ref_id=arr(b.ref_id, np.int32),
            pos=arr(b.pos, np.int32),
            end_pos=arr(b.end_pos, np.int32),
            flag=arr(b.flag, np.uint16),
            l_seq=arr(b.l_seq, np.int32),
            mate_ref_id=arr(b.mate_ref_id, np.int32),
            mate_pos=arr(b.mate_pos, np.int32),
            nh=arr(b.nh, np.int32),
            xt=arr(b.xt, np.uint8),
            name_h1=arr(b.name_h1, np.uint64),
            name_h2=arr(b.name_h2, np.uint64),
        )
        text = b.header_text.decode() if b.header_text else ""
        names = [b.ref_names[i].decode() for i in range(b.n_ref)]
        lengths = [int(b.ref_lengths[i]) for i in range(b.n_ref)]
        return text, names, lengths, cols
    finally:
        lib.gamio_free(h)

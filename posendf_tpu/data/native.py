"""ctypes bindings for the native data-loading runtime (libposendf_io.so).

The C++ runtime (``native/posendf_io.cc``) mmaps .npz files (np.savez writes
STORED zip entries — zero decode) and assembles training sub-batches on a
thread pool: random row gathers, k-label mean reduction, optional w>=0
quaternion flips — the work the reference spread over 30 DataLoader worker
processes (``model/load_data.py:76-85``). Falls back cleanly when the shared
library hasn't been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional

import numpy as np

__all__ = ["available", "NativeNpz", "build", "assemble_batch",
           "supports_assemble_batch"]

def _lib_path() -> str:
    """Resolve libposendf_io.so: env override, repo layout (native/ next to
    the package's parent — the development checkout), then inside the
    installed package (build.sh copies the .so into posendf_tpu/ so wheels
    built afterwards ship it as package data)."""
    env = os.environ.get("POSENDF_NATIVE_LIB")
    if env:
        return env
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates = [
        os.path.join(os.path.dirname(pkg_dir), "native", "libposendf_io.so"),
        os.path.join(pkg_dir, "libposendf_io.so"),
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    return candidates[0]


_LIB_PATH = _lib_path()
_lib = None
_lib_lock = threading.Lock()


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.pndf_open.restype = ctypes.c_void_p
        lib.pndf_open.argtypes = [ctypes.c_char_p]
        lib.pndf_close.argtypes = [ctypes.c_void_p]
        lib.pndf_rows.restype = ctypes.c_int64
        lib.pndf_rows.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.pndf_row_elems.restype = ctypes.c_int64
        lib.pndf_row_elems.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.pndf_sample_labeled.restype = ctypes.c_int
        lib.pndf_sample_labeled.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.pndf_sample_rows.restype = ctypes.c_int
        lib.pndf_sample_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_uint64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        # whole-batch entry point (newer .so builds); probe so an older
        # library resolved via POSENDF_NATIVE_LIB degrades to per-file calls
        if hasattr(lib, "pndf_assemble_batch"):
            lib.pndf_assemble_batch.restype = ctypes.c_int
            lib.pndf_assemble_batch.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
        _lib = lib
        return _lib


def build() -> bool:
    """Compile the shared library (g++) if missing. Returns availability."""
    if os.path.exists(_LIB_PATH):
        return True
    import subprocess

    script = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
    try:
        subprocess.run(["sh", script], check=True, capture_output=True)
    except Exception:
        return False
    return os.path.exists(_LIB_PATH)


def available() -> bool:
    return _load_lib() is not None


def _fptr(a: np.ndarray, shape) -> "ctypes.POINTER(ctypes.c_float)":
    """Float pointer for a C out-buffer — validated, because the C side
    writes blindly: a wrong dtype means silently garbled data, a short or
    strided buffer means heap corruption with no Python-level error."""
    if a.dtype != np.float32:
        raise TypeError(f"out buffer must be float32, got {a.dtype}")
    if not a.flags["C_CONTIGUOUS"]:
        raise ValueError("out buffer must be C-contiguous")
    if a.shape != tuple(shape):
        raise ValueError(f"out buffer shape {a.shape} != required {tuple(shape)}")
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeNpz:
    """An mmap'd .npz with native batch-assembly kernels."""

    def __init__(self, path: str):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libposendf_io.so not built (run native/build.sh)")
        self._lib = lib
        self._h = lib.pndf_open(path.encode())
        if not self._h:
            raise OSError(f"native open failed for {path} (compressed npz or bad file)")
        self.path = path

    def _handle(self):
        if not self._h:
            raise ValueError(f"NativeNpz for {self.path} is closed")
        return self._h

    def rows(self, key: str) -> int:
        return int(self._lib.pndf_rows(self._handle(), key.encode()))

    def row_elems(self, key: str) -> int:
        return int(self._lib.pndf_row_elems(self._handle(), key.encode()))

    def sample_labeled(self, n: int, seed: int, flip: bool = False,
                       threads: int = 4,
                       poses_out: Optional[np.ndarray] = None,
                       dist_out: Optional[np.ndarray] = None):
        """(poses (n, 21, 4) float32, dist (n,) float32): random labeled rows
        with the k-label mean reduction."""
        pe = self.row_elems("pose")
        poses = poses_out if poses_out is not None else np.empty((n, pe), np.float32)
        dist = dist_out if dist_out is not None else np.empty((n,), np.float32)
        rc = self._lib.pndf_sample_labeled(
            self._handle(), n, seed & 0xFFFFFFFFFFFFFFFF, int(flip),
            _fptr(poses, (n, pe)), _fptr(dist, (n,)), threads)
        if rc != 0:
            raise RuntimeError(f"pndf_sample_labeled failed rc={rc} for {self.path}")
        return poses.reshape(n, pe // 4, 4), dist

    def sample_rows(self, key: str, n: int, seed: int, flip: bool = False,
                    threads: int = 4,
                    out: Optional[np.ndarray] = None) -> np.ndarray:
        pe = self.row_elems(key)
        if pe < 0:
            raise KeyError(f"{key} not in {self.path}")
        if out is None:
            out = np.empty((n, pe), np.float32)
        rc = self._lib.pndf_sample_rows(
            self._handle(), key.encode(), n, seed & 0xFFFFFFFFFFFFFFFF, int(flip),
            _fptr(out, (n, pe)), threads)
        if rc != 0:
            raise RuntimeError(f"pndf_sample_rows failed rc={rc} for {self.path}")
        return out

    def close(self):
        if self._h:
            self._lib.pndf_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def supports_assemble_batch() -> bool:
    lib = _load_lib()
    return lib is not None and hasattr(lib, "pndf_assemble_batch")


def assemble_batch(labeled: "list[NativeNpz]", manifold: "Optional[list[NativeNpz]]",
                   seeds: "list[int]", num_pts: int, flip: bool,
                   ref_flip_quirk: bool,
                   poses_out: np.ndarray, dist_out: np.ndarray,
                   man_out: np.ndarray, threads: int = 4) -> None:
    """One whole training batch in a single native call (see
    ``pndf_assemble_batch``): bit-identical to B sequential
    ``sample_labeled`` + ``sample_rows(seed^0xDEADBEEF)`` pairs, but with one
    ctypes crossing and one thread fan-out per batch.

    ``manifold`` may be None only under ``ref_flip_quirk`` (the reference's
    man_poses = flipped noisy rows, ``model/load_data.py:63``).
    """
    lib = _load_lib()
    B = len(labeled)
    if len(seeds) != B:
        raise ValueError(f"{len(seeds)} seeds for {B} labeled files")
    if not ref_flip_quirk and (manifold is None or len(manifold) != B):
        raise ValueError("manifold handles required unless ref_flip_quirk")
    pe = labeled[0].row_elems("pose")
    lab_arr = (ctypes.c_void_p * B)(*[h._handle() for h in labeled])
    man_arr = ((ctypes.c_void_p * B)(*[h._handle() for h in manifold])
               if not ref_flip_quirk else None)
    seed_arr = (ctypes.c_uint64 * B)(
        *[s & 0xFFFFFFFFFFFFFFFF for s in seeds])
    n = B * num_pts
    rc = lib.pndf_assemble_batch(
        lab_arr, man_arr, seed_arr, B, num_pts, int(flip),
        int(ref_flip_quirk),
        _fptr(poses_out, (n, pe)), _fptr(dist_out, (n,)),
        _fptr(man_out, (n, pe)), threads)
    if rc != 0:
        raise RuntimeError(
            f"pndf_assemble_batch failed rc={rc} "
            f"(files: {[h.path for h in labeled]})")

"""Native host runtime (C++ via ctypes): fast KITTI scan preparation and an
async prefetch pool. Build on demand with ``python -m floam_tpu.native`` or
let ``load()`` compile lazily; the pure-NumPy fallbacks in io.kitti keep
everything working without the shared library.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "libfloam_native.so"
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> Path:
    src = _DIR / "loader.cpp"
    if _SO.exists() and not force and _SO.stat().st_mtime >= src.stat().st_mtime:
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", str(_SO), str(src), "-lpthread"]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    build()
    lib = ctypes.CDLL(str(_SO))
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.bucket_rings.argtypes = [f32p, f32p, f32p, i32p, u8p,
                                 ctypes.c_int64, ctypes.c_int32,
                                 ctypes.c_int32, f32p, f32p, f32p, u8p]
    lib.bucket_rings.restype = None
    lib.prepare_kitti_scan.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, f32p, f32p, f32p, u8p]
    lib.prepare_kitti_scan.restype = ctypes.c_int64
    lib.prefetcher_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32]
    lib.prefetcher_create.restype = ctypes.c_void_p
    lib.prefetcher_next.argtypes = [ctypes.c_void_p, f32p, f32p, f32p, u8p]
    lib.prefetcher_next.restype = ctypes.c_int64
    lib.prefetcher_destroy.argtypes = [ctypes.c_void_p]
    lib.prefetcher_destroy.restype = None
    _lib = lib
    return lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def prepare_kitti_scan(raw: np.ndarray, R: int, C: int, min_dist: float,
                       max_dist: float, scan_period: float):
    """(n,4) float32 -> (xyz (R,C,3), inten (R,C), time (R,C), mask (R,C))."""
    lib = load()
    raw = np.ascontiguousarray(raw, np.float32)
    xyz = np.zeros((R, C, 3), np.float32)
    inten = np.zeros((R, C), np.float32)
    time = np.zeros((R, C), np.float32)
    mask = np.zeros((R, C), np.uint8)
    lib.prepare_kitti_scan(_fp(raw), len(raw), R, C, min_dist, max_dist,
                           scan_period, _fp(xyz), _fp(inten), _fp(time),
                           _u8(mask))
    return xyz, inten, time, mask.astype(bool)


def bucket_rings(xyz: np.ndarray, inten: np.ndarray, times: np.ndarray,
                 ring: np.ndarray, valid: np.ndarray, R: int, C: int):
    lib = load()
    xyz = np.ascontiguousarray(xyz, np.float32)
    inten = np.ascontiguousarray(inten, np.float32)
    times = np.ascontiguousarray(times, np.float32)
    ring = np.ascontiguousarray(ring, np.int32)
    valid = np.ascontiguousarray(valid, np.uint8)
    out_xyz = np.zeros((R, C, 3), np.float32)
    out_i = np.zeros((R, C), np.float32)
    out_t = np.zeros((R, C), np.float32)
    out_m = np.zeros((R, C), np.uint8)
    lib.bucket_rings(
        _fp(xyz), _fp(inten), _fp(times),
        ring.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _u8(valid),
        len(xyz), R, C, _fp(out_xyz), _fp(out_i), _fp(out_t), _u8(out_m))
    return out_xyz, out_i, out_t, out_m.astype(bool)


class ScanPrefetcher:
    """Async KITTI sequence reader: worker threads prepare ring scans ahead
    of the device loop (replaces the reference's subscriber-queue-worker
    pattern, laserProcessingNode.cpp:33-36,80-102)."""

    def __init__(self, paths, R: int, C: int, min_dist: float,
                 max_dist: float, scan_period: float, threads: int = 4,
                 depth: int = 8):
        self._lib = load()
        self._paths = [str(p).encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._h = self._lib.prefetcher_create(
            arr, len(self._paths), R, C, min_dist, max_dist, scan_period,
            threads, depth)
        self.R, self.C = R, C
        self._n = len(self._paths)
        self._consumed = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._consumed >= self._n or self._h is None:
            raise StopIteration
        xyz = np.zeros((self.R, self.C, 3), np.float32)
        inten = np.zeros((self.R, self.C), np.float32)
        time = np.zeros((self.R, self.C), np.float32)
        mask = np.zeros((self.R, self.C), np.uint8)
        kept = self._lib.prefetcher_next(self._h, _fp(xyz), _fp(inten),
                                         _fp(time), _u8(mask))
        if kept == -2:
            # the worker could not open/read the .bin: raise (matching the
            # synchronous load_bin path) instead of yielding an empty scan
            # that would silently become constant-velocity drift
            path = self._paths[self._consumed].decode()
            self._consumed += 1
            raise IOError(f"failed to read scan file {path!r}")
        if kept < 0:
            raise StopIteration
        self._consumed += 1
        return xyz, inten, time, mask.astype(bool)

    def close(self):
        if self._h is not None:
            self._lib.prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


if __name__ == "__main__":
    print("built:", build(force=True))

"""Append-only on-disk spool of per-scan point clouds.

The reference accumulates every frame's cloud in RAM for its exit-time
exports (the unbounded ``Dump`` struct, src/odomEstimationNode.cpp:284-287
/ include/utils.h:23-30) — SURVEY.md section 5 flags this as a real
long-run limitation. Here cloud-bearing exports stream through this spool
instead: the pipeline's background fetch thread appends each scan's
sensor-frame feature cloud as it leaves the device, and the exporters read
records back one at a time, so host RSS stays O(one scan), not O(run).

Format: magic line, then per record a (uint32 n, uint32 k) header followed
by n*k little-endian float32 values. List-like read access via an
in-memory offset index (8 bytes per frame).
"""
from __future__ import annotations

import struct
import threading
from pathlib import Path
from typing import Iterator, List

import numpy as np

_MAGIC = b"FTCS1\n"
_HDR = struct.Struct("<II")


class CloudSpool:
    """Disk-backed list of (n_i, k) float32 arrays.

    Mode "w": create/truncate and append; records become readable
    immediately (the writer flushes after each append). Mode "r": open an
    existing spool and index it. A single spool may be appended to from
    one thread while being read from another — the offset index is
    guarded and records are immutable once written.
    """

    def __init__(self, path, mode: str = "w"):
        self.path = Path(path)
        self._lock = threading.Lock()
        self._offsets: List[int] = []
        self._sizes: List[tuple] = []
        if mode == "w":
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._f = open(self.path, "w+b")
            self._f.write(_MAGIC)
            self._f.flush()
        elif mode == "r":
            self._f = open(self.path, "rb")
            if self._f.read(len(_MAGIC)) != _MAGIC:
                raise ValueError(f"{path}: not a cloud spool")
            self._index_existing()
        else:
            raise ValueError(f"mode must be 'w' or 'r', got {mode!r}")

    def _index_existing(self) -> None:
        while True:
            off = self._f.tell()
            hdr = self._f.read(_HDR.size)
            if len(hdr) < _HDR.size:
                break
            n, k = _HDR.unpack(hdr)
            self._offsets.append(off)
            self._sizes.append((n, k))
            self._f.seek(n * k * 4, 1)

    def append(self, cloud: np.ndarray) -> int:
        cloud = np.ascontiguousarray(cloud, np.float32)
        if cloud.ndim != 2:
            raise ValueError(f"expected (n, k) array, got {cloud.shape}")
        n, k = cloud.shape
        with self._lock:
            self._f.seek(0, 2)
            off = self._f.tell()
            self._f.write(_HDR.pack(n, k))
            self._f.write(cloud.tobytes())
            self._f.flush()
            self._offsets.append(off)
            self._sizes.append((n, k))
            return len(self._offsets) - 1

    def __len__(self) -> int:
        with self._lock:
            return len(self._offsets)

    def __getitem__(self, i: int) -> np.ndarray:
        with self._lock:
            if i < 0:
                i += len(self._offsets)
            off = self._offsets[i]
            n, k = self._sizes[i]
            self._f.seek(off + _HDR.size)
            data = self._f.read(n * k * 4)
        return np.frombuffer(data, np.float32).reshape(n, k)

    def __iter__(self) -> Iterator[np.ndarray]:
        for i in range(len(self)):
            yield self[i]

    def close(self) -> None:
        with self._lock:
            self._f.close()

"""Minimal PCD (Point Cloud Data) writer/reader, binary and ASCII.

Replaces the reference's pcl::io::savePCDFileBinary usage
(src/utils.cpp:67,96, src/odomEstimationNode.cpp:89-93). Fields: x y z
[intensity], float32.
"""
from __future__ import annotations

import io
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def write_pcd(path, xyz: np.ndarray, intensity: Optional[np.ndarray] = None,
              binary: bool = True) -> None:
    xyz = np.asarray(xyz, np.float32)
    n = len(xyz)
    has_i = intensity is not None
    fields = "x y z intensity" if has_i else "x y z"
    count = "1 1 1 1" if has_i else "1 1 1"
    size = "4 4 4 4" if has_i else "4 4 4"
    typ = "F F F F" if has_i else "F F F"
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {fields}\n"
        f"SIZE {size}\n"
        f"TYPE {typ}\n"
        f"COUNT {count}\n"
        f"WIDTH {n}\n"
        "HEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    if has_i:
        data = np.concatenate(
            [xyz, np.asarray(intensity, np.float32)[:, None]], axis=1)
    else:
        data = xyz
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            f.write(np.ascontiguousarray(data, np.float32).tobytes())
        else:
            np.savetxt(f, data, fmt="%.6f")


class StreamingPcdWriter:
    """Incremental binary PCD writer: points are appended chunk by chunk
    and the header's WIDTH/POINTS fields (reserved as zero-padded fixed
    width, which PCD parsers read as ordinary integers) are patched on
    close. Lets multi-million-point merged-map exports stream to disk
    without ever materializing the whole cloud in RAM (the reference
    concatenates everything in memory first — SaveMerged,
    src/odomEstimationNode.cpp:66-96)."""

    _NUMW = 12  # fixed digits reserved for the point count

    def __init__(self, path, has_intensity: bool = False):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.has_intensity = has_intensity
        self.n = 0
        fields = "x y z intensity" if has_intensity else "x y z"
        k = 4 if has_intensity else 3
        zeros = "0" * self._NUMW
        header = (
            "# .PCD v0.7 - Point Cloud Data file format\n"
            "VERSION 0.7\n"
            f"FIELDS {fields}\n"
            f"SIZE {' '.join(['4'] * k)}\n"
            f"TYPE {' '.join(['F'] * k)}\n"
            f"COUNT {' '.join(['1'] * k)}\n"
            f"WIDTH {zeros}\n"
            "HEIGHT 1\n"
            "VIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {zeros}\n"
            "DATA binary\n"
        ).encode()
        self._width_off = header.index(b"WIDTH ") + len(b"WIDTH ")
        self._points_off = header.index(b"POINTS ") + len(b"POINTS ")
        self._f = open(self.path, "w+b")
        self._f.write(header)

    def append(self, xyz: np.ndarray,
               intensity: Optional[np.ndarray] = None) -> None:
        xyz = np.asarray(xyz, np.float32)
        if self.has_intensity:
            inten = np.zeros(len(xyz), np.float32) if intensity is None \
                else np.asarray(intensity, np.float32)
            data = np.concatenate([xyz, inten[:, None]], axis=1)
        else:
            data = xyz
        self._f.write(np.ascontiguousarray(data, np.float32).tobytes())
        self.n += len(xyz)

    def close(self) -> None:
        num = str(self.n).rjust(self._NUMW, "0").encode()
        for off in (self._width_off, self._points_off):
            self._f.seek(off)
            self._f.write(num)
        self._f.close()


def read_pcd(path) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Returns (xyz (N,3), intensity (N,) or None). Supports the subset of
    PCD written by write_pcd plus common float32 x/y/z[/intensity] files."""
    with open(path, "rb") as f:
        raw = f.read()
    header_end = raw.find(b"DATA ")
    nl = raw.find(b"\n", header_end)
    header = raw[:nl].decode()
    body = raw[nl + 1:]
    fields, n, mode = [], 0, "binary"
    sizes, types = [], []
    for line in header.splitlines():
        key, _, val = line.partition(" ")
        if key == "FIELDS":
            fields = val.split()
        elif key == "POINTS":
            n = int(val)
        elif key == "DATA":
            mode = val.strip()
        elif key == "SIZE":
            sizes = val.split()
        elif key == "TYPE":
            types = val.split()
    if any(t != "F" or s != "4" for t, s in zip(types, sizes)):
        raise ValueError("only float32 fields supported")
    k = len(fields)
    if mode == "binary":
        data = np.frombuffer(body, np.float32, count=n * k).reshape(n, k)
    else:
        data = np.loadtxt(io.BytesIO(body), np.float32).reshape(n, k)
    ix = [fields.index(c) for c in "xyz"]
    xyz = data[:, ix]
    inten = data[:, fields.index("intensity")] if "intensity" in fields else None
    return xyz, inten

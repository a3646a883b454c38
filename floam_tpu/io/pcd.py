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

"""Binary STL writer/reader (write parity: ref sdf/stl.py).

Record layout per the STL spec: 80-byte zero header, uint32 triangle count,
then per triangle a float32 normal (from the face cross product), 3 float32
vertices and a zero uint16 attribute (ref sdf/stl.py:4-24).
"""

from __future__ import annotations

import struct

import numpy as np


def write_binary_stl(path, points):
    n = len(points) // 3

    points = np.asarray(points, dtype="float32").reshape((-1, 3, 3))
    normals = np.cross(points[:, 1] - points[:, 0], points[:, 2] - points[:, 0])
    norm = np.linalg.norm(normals, axis=1).reshape((-1, 1))
    normals = normals / np.where(norm == 0, 1, norm)  # guard degenerate faces

    dtype = np.dtype(
        [
            ("normal", ("<f", 3)),
            ("points", ("<f", (3, 3))),
            ("attr", "<H"),
        ]
    )

    a = np.zeros(n, dtype=dtype)
    a["points"] = points
    a["normal"] = normals

    with open(path, "wb") as fp:
        fp.write(b"\x00" * 80)
        fp.write(struct.pack("<I", n))
        fp.write(a.tobytes())


def read_binary_stl(path):
    """Read a binary STL; returns (points (V, 3), triangles (T, 3) indices)."""
    with open(path, "rb") as fp:
        data = fp.read()
    n = struct.unpack("<I", data[80:84])[0]
    dtype = np.dtype(
        [
            ("normal", ("<f", 3)),
            ("points", ("<f", (3, 3))),
            ("attr", "<H"),
        ]
    )
    if len(data) < 84 + n * dtype.itemsize:
        # An ASCII STL ("solid ...") parsed as binary yields an arbitrary
        # count from text bytes; fail with a clear message instead of a
        # frombuffer size error or silent garbage.
        if data[:5] == b"solid" and b"facet" in data[:1024]:
            raise ValueError(
                "%r is an ASCII STL; only binary STL is supported" % path
            )
        raise ValueError("truncated binary STL %r" % path)
    a = np.frombuffer(data[84 : 84 + n * dtype.itemsize], dtype=dtype)
    from . import meshfmt

    return meshfmt.dedup(a["points"].reshape(-1, 3).astype(np.float64))

"""Canonical CSG demo (parity: ref examples/example.py)."""

from sdf_tpu import *

f = sphere(1) & box(1.5)

c = cylinder(0.5)
f -= c.orient(X) | c.orient(Y) | c.orient(Z)

f.save("out.stl")

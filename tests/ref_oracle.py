"""Import the reference implementation (/root/reference) as a test oracle.

The reference imports ``skimage`` and lazily ``meshio``/``pyopenvdb`` which
are not installed here; stub just enough for the pure-numpy SDF math (the
oracle we compare against) to import.  Marching cubes is NOT stubbed with a
fake implementation -- geometry tests validate our device marching cubes
against analytic ground truth instead.
"""

import sys
import types

if "skimage" not in sys.modules:
    skimage = types.ModuleType("skimage")
    measure = types.ModuleType("skimage.measure")

    def _unavailable(*args, **kwargs):
        raise RuntimeError("skimage stub: marching_cubes unavailable in tests")

    measure.marching_cubes = _unavailable
    skimage.measure = measure
    sys.modules["skimage"] = skimage
    sys.modules["skimage.measure"] = measure

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import sdf as ref  # noqa: E402

__all__ = ["ref"]

"""Model zoo: the reference's example workloads as importable builders.

The reference ships its workloads as loose scripts (ref examples/*.py);
here each is a parameterized function returning an SDF3 expression pytree so
it can be jitted, sharded, differentiated, and benchmarked directly.  The
geometry of each builder matches the corresponding reference script
(cited per function); default sample counts for end-to-end runs follow the
reference's ``save`` calls.
"""

from .zoo import (
    MODELS,
    blobby,
    customizable_box_body,
    customizable_box_lid,
    example,
    gearlike,
    knurling,
    pawn,
    weave,
)
from .fit import fit_step, make_sharded_fit_step

__all__ = [
    "MODELS",
    "example",
    "blobby",
    "gearlike",
    "knurling",
    "pawn",
    "weave",
    "customizable_box_body",
    "customizable_box_lid",
    "fit_step",
    "make_sharded_fit_step",
]

"""Parametric storage box + lid (parity: ref examples/customizable_box.py).

The geometry lives in sdf_tpu.models.zoo as parameterized builders; pass
overrides (width=, rows=, ...) to customize.
"""

from sdf_tpu.models import customizable_box_body, customizable_box_lid

SAMPLES = 2**24

customizable_box_body().save("box.stl", samples=SAMPLES)
customizable_box_lid().save("lid.stl", samples=SAMPLES)

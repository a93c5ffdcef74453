"""Render the showcase/doc assets the API table does not cover.

Reference parity set (ref README.md:37-40,101,207,300,520,543 and
docs/images/): the workload hero renders (blobby/gearlike/knurling/
weave + example), the customizable-box pair, the large text and image
(butterfly) renders, the show_slice matplotlib capture, and a mesh
preview.  Two honest substitutions, noted in the README: the
reference's ``*.jpg`` assets are photographs of 3D prints and
``meshview.png`` is a screenshot of the author's desktop viewer -- both
irreproducible here, so they are JPEG conversions of our renders and a
render from this repo's own ``tools/render`` respectively.  The
butterfly mask is this repo's procedural asset
(``tools/make_butterfly.py``), not the reference's photo mask.

Run from this directory:  python render_showcase.py [--samples LOG2]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sdf_tpu import *  # noqa: F401,F403
from sdf_tpu.models import zoo

SAMPLES = 2**26
if "--samples" in sys.argv:
    SAMPLES = 2 ** int(sys.argv[sys.argv.index("--samples") + 1])
RENDER = os.path.join(os.path.dirname(__file__), "..", "tools", "render")


def generate(f, name, samples=None, jpg=False, **kwargs):
    os.makedirs("models", exist_ok=True)
    os.makedirs("images", exist_ok=True)
    stl_path = "models/%s.stl" % name
    png_path = "images/%s.png" % name
    jpg_path = "images/%s.jpg" % name
    if not os.path.exists(png_path):
        f.save(stl_path, samples=samples or SAMPLES, **kwargs)
        subprocess.run([RENDER, stl_path, png_path], check=True)
    if jpg and not os.path.exists(jpg_path):
        from PIL import Image

        Image.open(png_path).convert("RGB").save(jpg_path, quality=92)


def _font(name):
    from PIL import ImageFont

    try:
        ImageFont.truetype(name, 12)
        return name
    except OSError:
        return "DejaVuSans"


# --- workload heroes (ref README.md:37-40; jpgs substitute the print
# photos with render conversions) -------------------------------------
generate(zoo.example(), "example", jpg=True)
generate(zoo.blobby(), "blobby", jpg=True)
generate(zoo.gearlike(), "gearlike", jpg=True)
generate(zoo.knurling(), "knurling", jpg=True)
generate(zoo.weave(), "weave", jpg=True)

# --- parametric CAD pair (ref README.md:300; examples/customizable_box.py)
generate(zoo.customizable_box_body(), "customizable_box", samples=2**24)
generate(zoo.customizable_box_lid(), "customizable_lid", samples=2**24)

# --- large text plate (ref README.md:520-531) ------------------------
FONT = _font("Arial")
TEXT = "Hello, world!"
w, h = measure_text(FONT, TEXT)
f = rounded_box((w + 1, h + 1, 0.2), 0.1)
f -= text(FONT, TEXT).extrude(1)
generate(f, "text-large")

# --- image mask (ref README.md:543-551; procedural butterfly asset) --
IMAGE = os.path.join(os.path.dirname(__file__), "..", "examples",
                     "butterfly.png")
if not os.path.exists("images/butterfly.png"):
    w, h = measure_image(IMAGE)
    f = rounded_box((w * 1.1, h * 1.1, 0.1), 0.05)
    f |= image(IMAGE).extrude(1) & slab(z0=0, z1=0.075)
    generate(f, "butterfly")

# --- show_slice capture (ref README.md:207-214) ----------------------
if not os.path.exists("images/show_slice.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from sdf_tpu.core import engine

    f = zoo.example()
    a, extent, axes = engine.sample_slice(f, z=0)
    im = plt.imshow(
        np.abs(a), extent=extent, origin="lower", cmap="viridis",
    )
    plt.colorbar(im)
    plt.xlabel(axes[0].upper())
    plt.ylabel(axes[1].upper())
    plt.savefig("images/show_slice.png", dpi=150, bbox_inches="tight")
    plt.close()

# --- mesh preview (render-substitute for the meshview screenshot,
# ref README.md:101) ---------------------------------------------------
if not os.path.exists("images/meshview.png"):
    generate(zoo.pawn(), "meshview")

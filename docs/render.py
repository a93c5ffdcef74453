"""Regenerate every documented shape image (parity: ref docs/render.py).

Writes models/<name>.stl and images/<name>.png for each documented API
entry, skipping names whose PNG already exists (idempotence guard, ref
docs/render.py:9-10).  The renderer is the native C++ tool (tools/render,
``make -C tools``), which replaces the reference's Go fauxgl rasterizer
with identical camera/shading settings.

Run from this directory:  python render.py [--samples LOG2]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sdf_tpu import *  # noqa: F401,F403

SAMPLES = 2**26
if "--samples" in sys.argv:
    SAMPLES = 2 ** int(sys.argv[sys.argv.index("--samples") + 1])
RENDER = os.path.join(os.path.dirname(__file__), "..", "tools", "render")


def generate(f, name, samples=None, **kwargs):
    os.makedirs("models", exist_ok=True)
    os.makedirs("images", exist_ok=True)
    stl_path = "models/%s.stl" % name
    png_path = "images/%s.png" % name
    if os.path.exists(png_path):
        return
    f.save(stl_path, samples=samples or SAMPLES, **kwargs)
    subprocess.run([RENDER, stl_path, png_path], check=True)


# example
f = sphere(1) & box(1.5)
c = cylinder(0.5)
f -= c.orient(X) | c.orient(Y) | c.orient(Z)
example = f
generate(f, "example")

# 3D primitives
generate(sphere(1), "sphere")
generate(box(1), "box")
generate(box((1, 2, 3)), "box2")
generate(rounded_box((1, 2, 3), 0.25), "rounded_box")
generate(wireframe_box((1, 2, 3), 0.05), "wireframe_box")
generate(torus(1, 0.25), "torus")
generate(capsule(-Z, Z, 0.5), "capsule")
generate(capped_cylinder(-Z, Z, 0.5), "capped_cylinder")
generate(rounded_cylinder(0.5, 0.1, 2), "rounded_cylinder")
generate(capped_cone(-Z, Z, 1, 0.5), "capped_cone")
generate(rounded_cone(0.75, 0.25, 2), "rounded_cone")
generate(ellipsoid((1, 2, 3)), "ellipsoid")
generate(pyramid(1), "pyramid")
generate(tetrahedron(1), "tetrahedron")
generate(octahedron(1), "octahedron")
generate(dodecahedron(1), "dodecahedron")
generate(icosahedron(1), "icosahedron")

# infinite primitives, clipped for display
generate(sphere() & plane(), "plane")
generate(sphere() & slab(z0=-0.5, z1=0.5, x0=0), "slab")
generate(sphere() - cylinder(0.5), "cylinder")

# positioning
generate(sphere().translate((0, 0, 2)), "translate")
generate(sphere().scale((1, 2, 3)), "scale")
generate(capped_cylinder(-Z, Z, 0.5).rotate(pi / 4, X), "rotate")
c = capped_cylinder(-Z, Z, 0.25)
generate(c.orient(X) | c.orient(Y) | c.orient(Z), "orient")

# boolean operations
a = box((3, 3, 0.5))
b = sphere()
generate(a | b, "union")
generate(a - b, "difference")
generate(a & b, "intersection")
generate(a | b.k(0.25), "smooth_union")
generate(a - b.k(0.25), "smooth_difference")
generate(a & b.k(0.25), "smooth_intersection")

# alterations & repetition
generate(sphere().repeat(3, (1, 1, 0)), "repeat")
generate(capped_cylinder(-Z, Z, 0.5).circular_array(8, 4), "circular_array")
generate(sphere().blend(box()), "blend")
generate(example.dilate(0.1), "dilate")
generate(example.erode(0.1), "erode")
generate(sphere().shell(0.05) & plane(-Z), "shell")
generate(example.elongate((0.25, 0.5, 0.75)), "elongate")
generate(box().twist(pi / 2), "twist")
generate(box().bend(1), "bend")
generate(
    capsule(-Z * 2, Z * 2, 0.25).bend_linear(-Z, Z, X, ease.in_out_quad),
    "bend_linear",
)
generate(
    box((5, 5, 0.25)).bend_radial(1, 2, -1, ease.in_out_quad),
    "bend_radial",
    sparse=False,
)
generate(
    box().transition_linear(sphere(), e=ease.in_out_quad), "transition_linear"
)
generate(
    box().transition_radial(sphere(), e=ease.in_out_quad), "transition_radial"
)

# 2D -> 3D
generate(hexagon(1).extrude(1), "extrude")
generate(rectangle(2).extrude_to(circle(1), 2, ease.in_out_quad), "extrude_to")
generate(hexagon(1).revolve(3), "revolve")
generate(example.translate((0, 0, 0.55)).slice().extrude(0.1), "slice")

# text -- fall back to a font that exists on this system (the reference
# assumes Georgia/Arial, which only macOS ships)
def _font(name):
    from PIL import ImageFont

    try:
        ImageFont.truetype(name, 12)
        return name
    except OSError:
        return "DejaVuSans"


f = rounded_box((7, 2, 0.2), 0.1)
f -= text(_font("Georgia"), "Hello, World!").extrude(0.2).rotate(pi).translate(0.1 * Z)
generate(f, "text")

FONT = _font("Arial")
TEXT = " wrap_around " * 3
w, h = measure_text(FONT, TEXT)
f = text(FONT, TEXT).extrude(0.1).orient(Y).wrap_around(-w / 2, w / 2)
generate(f, "wrap_around")

# hero (the reference README's gearlike walkthrough model)
f = sphere(2) & slab(z0=-0.5, z1=0.5).k(0.1)
f -= cylinder(1).k(0.1)
f -= cylinder(0.25).circular_array(16, 2).k(0.1)
generate(f, "gearlike_hero")

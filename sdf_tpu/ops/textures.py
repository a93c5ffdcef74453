"""Text and image SDFs (parity: ref sdf/text.py).

Setup (TrueType rasterization via PIL, exact Euclidean distance transform via
scipy) runs once on the host, exactly like the reference (ref
sdf/text.py:42-84); the resulting SDF *texture* becomes a differentiable
pytree leaf sampled on device with a bilinear gather.  Points outside the
texture fall back to a half-size rectangle SDF (ref sdf/text.py:112-114, a
documented reference hack preserved for parity).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.node import as_param
from . import shapes2 as d2

PIXELS = 2**22


def _load_image(thing):
    from PIL import Image

    if isinstance(thing, str):
        return Image.open(thing)
    elif isinstance(thing, (np.ndarray, np.generic)):
        return Image.fromarray(thing)
    return Image.fromarray(np.array(thing))


def _fit_aspect(aspect, width, height):
    """Resolve (width, height) from an aspect ratio and at most one given
    extent; with neither given, height defaults to 1 (ref sdf/text.py
    measure semantics, shared by text/image/texture setup)."""
    if width is not None and height is not None:
        return (width, height)
    if width is not None:
        return (width, width / aspect)
    height = 1 if height is None else height
    return (height * aspect, height)


def measure_text(name, text, width=None, height=None):
    from PIL import ImageFont

    x0, y0, x1, y1 = ImageFont.truetype(name, 96).getbbox(text)
    return _fit_aspect((x1 - x0) / (y1 - y0), width, height)


def measure_image(thing, width=None, height=None):
    w, h = _load_image(thing).size
    return _fit_aspect(w / h, width, height)


@d2.sdf2
def text(font_name, text, width=None, height=None, pixels=PIXELS, points=512):
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.truetype(font_name, points)

    # Texture bounds: 20% padding around the glyph bbox (ref sdf/text.py:48-53).
    p = 0.2
    x0, y0, x1, y1 = font.getbbox(text)
    px = int((x1 - x0) * p)
    py = int((y1 - y0) * p)
    tw = x1 - x0 + 1 + px * 2
    th = y1 - y0 + 1 + py * 2

    im = Image.new("L", (tw, th))
    draw = ImageDraw.Draw(im)
    draw.text((px - x0, py - y0), text, font=font, fill=255)

    return _texture_sdf(width, height, pixels, px, py, im)


@d2.sdf2
def image(thing, width=None, height=None, pixels=PIXELS):
    im = _load_image(thing).convert("L")
    return _texture_sdf(width, height, pixels, 0, 0, im)


def _texture_sdf(width, height, pixels, px, py, im):
    import scipy.ndimage as nd

    tw, th = im.size

    # Cap texture size (ref sdf/text.py:71-75).
    factor = (pixels / (tw * th)) ** 0.5
    if factor < 1:
        tw, th = int(round(tw * factor)), int(round(th * factor))
        px, py = int(round(px * factor)), int(round(py * factor))
        im = im.resize((tw, th))

    # Two-sided exact EDT -> signed texture: - inside, + outside
    # (ref sdf/text.py:77-84).  Host setup; the sampling is on device.
    im = im.convert("1")
    a = np.array(im)
    inside = -nd.distance_transform_edt(a)
    outside = nd.distance_transform_edt(~a)
    texture = np.zeros(a.shape)
    texture[a] = inside[a]
    texture[~a] = outside[~a]

    # World bounds from padded texture extent (ref sdf/text.py:93-110).
    pw = tw - px * 2
    ph = th - py * 2
    width, height = _fit_aspect(pw / ph, width, height)
    x0 = -width / 2
    y0 = -height / 2
    x1 = width / 2
    y1 = height / 2

    texture = texture * (width / tw)

    rectangle = d2.rectangle((width / 2, height / 2))

    params = {"texture": as_param(texture), "rectangle": rectangle}
    extent = (x0, y0, x1, y1)

    from ..core.hybrid import mark_gather

    @mark_gather
    def fn(q, p):
        tex = q["texture"]
        x, y = p.c
        u = (x - extent[0]) / (extent[2] - extent[0])
        v = 1 - (y - extent[1]) / (extent[3] - extent[1])
        i = u * pw + px
        j = v * ph + py
        d = _bilinear_interpolate(tex, i, j)
        fallback = q["rectangle"](p)
        outside_tex = (i < 0) | (i >= tw - 1) | (j < 0) | (j >= th - 1)
        return jnp.where(outside_tex, fallback, d)

    return fn, params


def _bilinear_interpolate(a, x, y):
    """Device-side bilinear texture fetch at fractional texel (x, y).

    TPU layout: the four neighbor reads go through ONE flattened texture
    with linear indices (a single 1D gather per corner fuses better on
    XLA:TPU than 2D advanced indexing), and the blend is two nested lerps
    reusing the fractional weights.  Coordinates clamp to the texel grid;
    out-of-texture points are replaced by the rectangle fallback in the
    caller, so clamping only guards the gather.

    Equivalent to the reference's four-weight formulation
    (ref sdf/text.py:132-153): lerp(lerp(p00,p01,fx), lerp(p10,p11,fx), fy)
    expands to exactly wa*pa + wb*pb + wc*pc + wd*pd.
    """
    h, w = a.shape
    flat = a.reshape(-1)
    cx = jnp.clip(x, 0.0, w - 1.0)
    cy = jnp.clip(y, 0.0, h - 1.0)
    ix = jnp.minimum(jnp.floor(cx).astype(jnp.int32), w - 2)
    iy = jnp.minimum(jnp.floor(cy).astype(jnp.int32), h - 2)
    fx = cx - ix
    fy = cy - iy

    def lerp(p, q, t):
        return p + t * (q - p)

    base = iy * w + ix
    top = lerp(flat[base], flat[base + 1], fx)
    bot = lerp(flat[base + w], flat[base + w + 1], fx)
    return lerp(top, bot, fy)

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


def measure_text(name, text, width=None, height=None):
    from PIL import ImageFont

    font = ImageFont.truetype(name, 96)
    x0, y0, x1, y1 = font.getbbox(text)
    aspect = (x1 - x0) / (y1 - y0)
    if width is None and height is None:
        height = 1
    if width is None:
        width = height * aspect
    if height is None:
        height = width / aspect
    return (width, height)


def measure_image(thing, width=None, height=None):
    im = _load_image(thing)
    w, h = im.size
    aspect = w / h
    if width is None and height is None:
        height = 1
    if width is None:
        width = height * aspect
    if height is None:
        height = width / aspect
    return (width, height)


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
    aspect = pw / ph
    if width is None and height is None:
        height = 1
    if width is None:
        width = height * aspect
    if height is None:
        height = width / aspect
    x0 = -width / 2
    y0 = -height / 2
    x1 = width / 2
    y1 = height / 2

    texture = texture * (width / tw)

    rectangle = d2.rectangle((width / 2, height / 2))

    params = {"texture": as_param(texture), "rectangle": rectangle}
    extent = (x0, y0, x1, y1)

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
    x0 = jnp.floor(x).astype(jnp.int32)
    x1 = x0 + 1
    y0 = jnp.floor(y).astype(jnp.int32)
    y1 = y0 + 1

    x0 = jnp.clip(x0, 0, a.shape[1] - 1)
    x1 = jnp.clip(x1, 0, a.shape[1] - 1)
    y0 = jnp.clip(y0, 0, a.shape[0] - 1)
    y1 = jnp.clip(y1, 0, a.shape[0] - 1)

    pa = a[y0, x0]
    pb = a[y1, x0]
    pc = a[y0, x1]
    pd = a[y1, x1]

    wa = (x1 - x) * (y1 - y)
    wb = (x1 - x) * (y - y0)
    wc = (x - x0) * (y1 - y)
    wd = (x - x0) * (y - y0)

    return wa * pa + wb * pb + wc * pc + wd * pd

#!/usr/bin/env python
"""Generate examples/butterfly.png -- a procedural butterfly silhouette.

The reference ships a hand-made butterfly photo mask as its image-SDF
example asset (ref examples/image.py:3); this repo's asset is generated
from the classic Temple Fay butterfly curve so it carries no third-party
content: r = e^{sin t} - 2 cos 4t + sin^5((2t - pi)/24), rendered as a
filled polygon, mirrored for symmetry, anti-aliased by supersampling.
"""

import os

import numpy as np
from PIL import Image, ImageDraw

OUT = os.path.join(os.path.dirname(__file__), "..", "examples", "butterfly.png")


def main(size=1024, ss=4):
    n = size * ss
    t = np.linspace(0, 24 * np.pi, 400000)
    r = (
        np.exp(np.sin(t))
        - 2 * np.cos(4 * t)
        + np.sin((2 * t - np.pi) / 24) ** 5
    )
    # Solid silhouette: the curve self-overlaps, so fill the polar
    # envelope (max |r| per direction) instead of the raw path.
    x = r * np.sin(t)
    y = r * np.cos(t)
    ang = np.arctan2(y, x)
    rad = np.hypot(x, y)
    nbins = 2048
    bins = ((ang + np.pi) / (2 * np.pi) * nbins).astype(np.int64) % nbins
    env = np.zeros(nbins)
    np.maximum.at(env, bins, rad)
    # close tiny gaps where no sample landed
    for _ in range(3):
        env = np.maximum(env, np.maximum(np.roll(env, 1), np.roll(env, -1)))
    th = (np.arange(nbins) + 0.5) / nbins * 2 * np.pi - np.pi
    ex = env * np.cos(th)
    ey = env * np.sin(th)
    s = n / 2 / (env.max() * 1.1)
    px = (n / 2 + ex * s).astype(np.int64)
    py = (n / 2 - ey * s).astype(np.int64)
    img = Image.new("L", (n, n), 0)
    d = ImageDraw.Draw(img)
    d.polygon(list(zip(px.tolist(), py.tolist())), fill=255)
    img = img.resize((size, size), Image.LANCZOS)
    img = img.rotate(-90)  # body vertical, wings up
    img.save(OUT)
    print("wrote", os.path.abspath(OUT))


if __name__ == "__main__":
    main()

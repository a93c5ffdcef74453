"""Isosurface topology adjudication (north-star: BASELINE.md).

The reference delegates meshing to skimage's Lewiner marching cubes
(ref sdf/core.py:16-18).  skimage cannot be installed offline, so the
topology claim is adjudicated in three parts (docs/TOPOLOGY.md carries
the full analysis):

  1. For the 136 face-UNambiguous cases the cell polygonization is forced:
     any marching-cubes variant whose per-face boundaries follow marching
     squares (Lorensen-Cline, Chernyaev/MC33, Lewiner) yields exactly the
     same edge loops.  We verify our tables equal that method-independent
     decomposition, computed here from first principles.
  2. For the 120 ambiguous cases we pin OUR documented resolution rule
     (inside corners always separated) and verify it is applied in every
     one -- this is where variants may legitimately differ (Lewiner
     resolves per-cell from the trilinear interpolant), and both choices
     are watertight.
  3. Global topological invariants on analytic shapes (Euler
     characteristic: sphere chi=2, torus chi=0, two components chi=4) and
     a committed golden fixture of the canonical example model -- full
     cell case-code grid plus canonicalized triangle-soup hash -- pin the
     end-to-end topology against regression, cell by cell.

Regenerate the golden fixture with SDF_TPU_REGEN_GOLDEN=1 (only after a
deliberate, documented table change).
"""

import hashlib
import os

import numpy as np
import pytest

import sdf_tpu as st
from sdf_tpu.core import mc, mc_tables

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "example_topology.npz")

_FACES = [[0, 3, 2, 1], [4, 5, 6, 7], [0, 1, 5, 4],
          [3, 7, 6, 2], [0, 4, 7, 3], [1, 2, 6, 5]]


def _face_is_ambiguous(case, face):
    b = [(case >> c) & 1 for c in face]
    return b[0] == b[2] and b[1] == b[3] and b[0] != b[1]


def _ambiguous_cases():
    return [
        c for c in range(256)
        if any(_face_is_ambiguous(c, f) for f in _FACES)
    ]


def _loops_of_case(case):
    """Our table's edge loops, recovered from the fan structure."""
    tris = mc_tables.TRI_TABLE[case][: mc_tables.NTRI_TABLE[case]]
    # fans emit (loop[0], loop[i+1], loop[i]); group by apex vertex chains
    loops = []
    cur = None
    for a, b, c in tris.tolist():
        if cur is None or a != cur[0] or c != cur[-1]:
            if cur:
                loops.append(cur)
            cur = [a, c, b]
        else:
            cur.append(b)
    if cur:
        loops.append(cur)
    return loops


def test_ambiguous_case_census():
    # The census quoted in docs/TOPOLOGY.md: 120 of 256 cases touch at
    # least one ambiguous (diagonal) face; 136 are forced.
    amb = _ambiguous_cases()
    assert len(amb) == 120
    by_count = {}
    for c in amb:
        k = sum(_face_is_ambiguous(c, f) for f in _FACES)
        by_count[k] = by_count.get(k, 0) + 1
    assert by_count == {1: 72, 2: 30, 3: 16, 6: 2}


def test_unambiguous_cases_have_forced_topology():
    """For face-unambiguous cases, independently derive the unique
    polygonization (crossing edges chained by the unambiguous marching-
    squares face segments) and require our tables to match it exactly.

    This is the method-independent part of "bit-matching topology": every
    watertight MC variant produces these same loops here, so equality
    proves parity with skimage on 136/256 cases without skimage."""
    edge_corners = np.asarray(mc_tables.EDGE_CORNERS)
    for case in range(256):
        if any(_face_is_ambiguous(case, f) for f in _FACES):
            continue
        inside = [(case >> c) & 1 for c in range(8)]
        # next-edge map from marching squares on each face
        succ = {}
        for corners in _FACES:
            bits = [inside[c] for c in corners]
            n = sum(bits)
            if n in (0, 4):
                continue
            idx = {}
            for e, (a, b) in enumerate(edge_corners):
                idx[(a, b)] = e
                idx[(b, a)] = e

            def edge(i, j):
                return idx[(corners[i % 4], corners[j % 4])]

            segs = []
            if n == 1:
                i = bits.index(True)
                segs = [(edge(i, i + 1), edge(i - 1, i))]
            elif n == 3:
                j = bits.index(False)
                segs = [(edge(j - 1, j), edge(j, j + 1))]
            else:  # adjacent pair (diagonal excluded above)
                if bits[0] == bits[1]:
                    i = 0 if bits[0] else 2
                else:
                    i = 1 if bits[1] else 3
                segs = [(edge(i + 1, i + 2), edge(i - 1, i))]
            for a, b in segs:
                assert a not in succ
                succ[a] = b

        # chain into loops (canonical: rotate to min edge)
        def canon(loop):
            i = loop.index(min(loop))
            return tuple(loop[i:] + loop[:i])

        expected = set()
        remaining = set(succ)
        while remaining:
            e0 = next(iter(remaining))
            loop = [e0]
            e = succ[e0]
            while e != e0:
                loop.append(e)
                e = succ[e]
            remaining -= set(loop)
            expected.add(canon(loop))

        ours = {canon(l) for l in _loops_of_case(case)}
        assert ours == expected, f"case {case}"


def test_ambiguous_cases_follow_separation_rule():
    """Every ambiguous face must be resolved with the inside corners
    SEPARATED (two corner cuts), our documented fixed rule: the face then
    contributes two directed segments, one around each inside corner.
    Checked structurally: on such a face no loop may contain a segment
    connecting the two edges adjacent to DIFFERENT inside corners in a
    joining pattern."""
    edge_corners = np.asarray(mc_tables.EDGE_CORNERS)
    idx = {}
    for e, (a, b) in enumerate(edge_corners):
        idx[(a, b)] = e
        idx[(b, a)] = e
    for case in _ambiguous_cases():
        inside = [(case >> c) & 1 for c in range(8)]
        loops = _loops_of_case(case)
        succ = {}
        for loop in loops:
            for i, e in enumerate(loop):
                succ[e] = loop[(i + 1) % len(loop)]
        for corners in _FACES:
            if not _face_is_ambiguous(case, corners):
                continue
            bits = [inside[c] for c in corners]
            for i in range(4):
                if not bits[i]:
                    continue
                # separation: the segment entering at edge(i, i+1) must
                # exit at edge(i-1, i) around THIS corner
                e_in = idx[(corners[i], corners[(i + 1) % 4])]
                e_out = idx[(corners[(i - 1) % 4], corners[i])]
                assert succ[e_in] == e_out, (case, corners, i)


def _euler(points):
    """chi = V - E + F of a triangle soup with bit-exact seam vertices."""
    tris = np.asarray(points).reshape(-1, 3, 3)
    v = {tuple(p) for t in tris for p in t}
    e = set()
    for t in tris:
        for i in range(3):
            a, b = tuple(t[i]), tuple(t[(i + 1) % 3])
            e.add((a, b) if a < b else (b, a))
    return len(v) - len(e) + len(tris)


@pytest.mark.parametrize(
    "name,chi",
    [("sphere", 2), ("torus", 0), ("two_spheres", 4)],
)
def test_euler_characteristic(name, chi):
    import jax.numpy as jnp

    # explicit roomy bounds: with estimated bounds the arange-exclusive
    # last sample plane can clip the surface, opening boundary edges
    if name == "sphere":
        f, b = st.sphere(1), 1.3
    elif name == "torus":
        f, b = st.torus(1, 0.3), 1.6
    else:
        f = st.sphere(0.5).translate((-0.8, 0, 0)) | st.sphere(0.5).translate(
            (0.8, 0, 0)
        )
        b = 1.6
    pts = f.generate(
        samples=2**15, verbose=False, dtype=jnp.float64, sparse=False,
        bounds=((-b,) * 3, (b,) * 3),
    )
    assert _euler(pts) == chi


def _example_fixture():
    import jax.numpy as jnp

    f = st.sphere(1) & st.box(1.5)
    c = st.cylinder(0.5)
    f -= c.orient(st.X) | c.orient(st.Y) | c.orient(st.Z)

    bounds = ((-1.1,) * 3, (1.1,) * 3)
    step = 0.04
    # mc_variant="fast" pins the fixed separated-ambiguity rule (the
    # pre-round-4 default); the out-of-the-box default is now "lewiner",
    # pinned by tests/test_lewiner.py's golden.
    pts = f.generate(
        step=step, bounds=bounds, verbose=False, dtype=jnp.float64,
        sparse=False, mc_variant="fast",
    )
    # full per-cell case codes on the same grid
    X = np.arange(-1.1, 1.1, step)
    from sdf_tpu.core import engine
    from sdf_tpu.core.node import cast

    vol = engine._eval_volume(cast(f, jnp.float64), X, X, X, jnp.float64)
    case = np.asarray(mc._cell_cases(vol), dtype=np.uint8)

    tris = np.asarray(pts).round(9).reshape(-1, 9)
    order = np.lexsort(tris.T[::-1])
    soup_hash = hashlib.sha256(tris[order].tobytes()).hexdigest()
    return {
        "case": case,
        "n_triangles": np.int64(len(pts) // 3),
        "euler": np.int64(_euler(pts)),
        "soup_sha256": np.str_(soup_hash),
    }


def test_example_model_golden():
    """Cell-by-cell topology pin of the canonical example model: committed
    case-code grid + canonicalized triangle-soup hash + Euler number."""
    got = _example_fixture()
    if os.environ.get("SDF_TPU_REGEN_GOLDEN") == "1":
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez_compressed(GOLDEN, **got)
    with np.load(GOLDEN) as z:
        assert np.array_equal(z["case"], got["case"]), "case codes changed"
        assert int(z["n_triangles"]) == int(got["n_triangles"])
        assert int(z["euler"]) == int(got["euler"])
        assert str(z["soup_sha256"]) == str(got["soup_sha256"])

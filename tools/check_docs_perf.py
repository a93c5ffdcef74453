"""Docs-vs-driver-artifact perf consistency checker (round-3 verdict
item: "the perf headline outruns the driver artifact").

Single source of truth: ``docs/PERF_QUOTES.json`` holds the canonical
quoted range for every headline metric.  This tool enforces, for every
committed ``BENCH_r{N}.json`` with ``N >= since``:

  1. the artifact's value lies INSIDE the quoted range (so no quoted
     range can exclude a driver-captured session again), and
  2. the canonical ``range_text`` literally appears in every doc file
     the quote names (so README/PERF/STATUS/SURVEY cannot drift from
     the range the artifacts are checked against).

Run directly (``python tools/check_docs_perf.py``) or via
tests/test_periphery.py::test_docs_perf_consistency.  Exit code 0 =
consistent.
"""

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_quotes():
    with open(os.path.join(ROOT, "docs", "PERF_QUOTES.json")) as fp:
        return json.load(fp)


def _bench_line(artifact):
    """The driver wraps bench.py's one JSON line inside a ``tail`` string
    (with runtime warnings around it); a bare dict with ``metric`` is
    accepted too so the tool can check a raw ``python bench.py`` line."""
    if "metric" in artifact:
        return artifact
    for line in reversed(artifact.get("tail", "").splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return {}


def bench_files():
    out = []
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as fp:
            data = _bench_line(json.load(fp))
        out.append((int(m.group(1)), os.path.basename(path), data))
    return out

def check():
    quotes = load_quotes()["quotes"]
    errors = []
    benches = bench_files()
    if not benches:
        errors.append("no BENCH_r*.json artifacts found")
    for field, q in quotes.items():
        since = q.get("since", 3)
        for rnd, name, data in benches:
            if rnd < since:
                continue
            if field not in data:
                # a field the quote requires must exist from its round on
                errors.append(f"{name}: missing field {field!r} (since r{since})")
                continue
            v = data[field]
            if "equals" in q:
                if v != q["equals"]:
                    errors.append(
                        f"{name}: {field}={v!r} != pinned {q['equals']!r}"
                    )
            elif "same_as" in q:
                if v != data.get(q["same_as"]):
                    errors.append(
                        f"{name}: {field}={v!r} != {q['same_as']}="
                        f"{data.get(q['same_as'])!r}"
                    )
            elif not (q["lo"] <= v <= q["hi"]):
                errors.append(
                    f"{name}: {field}={v} outside quoted range "
                    f"[{q['lo']}, {q['hi']}] ({q.get('range_text', '')})"
                )
        for doc in q.get("must_appear_in", []):
            with open(os.path.join(ROOT, doc)) as fp:
                text = fp.read()
            if q["range_text"] not in text:
                errors.append(
                    f"{doc}: canonical range text {q['range_text']!r} for "
                    f"{field} not found -- doc drifted from PERF_QUOTES.json"
                )
    return errors


def main():
    errors = check()
    if errors:
        for e in errors:
            print("FAIL:", e)
        return 1
    n = len(bench_files())
    print(f"ok: {len(load_quotes()['quotes'])} quoted ranges consistent "
          f"with {n} BENCH artifacts and the docs")
    return 0


if __name__ == "__main__":
    sys.exit(main())

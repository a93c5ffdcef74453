"""Docs-vs-driver-artifact perf consistency checker (round-3 verdict
item: "the perf headline outruns the driver artifact"; gate semantics
rebuilt in round 5 per the round-4 verdict: raw wall-clock through the
tunneled runtime drifts 2-4x between sessions, so only
weather-normalized and device-deterministic metrics carry hard bands).

Single source of truth: ``docs/PERF_QUOTES.json`` holds the canonical
quote for every headline metric.  Quote kinds (checked for every
committed ``BENCH_r{N}.json`` with ``N >= since``):

  equals: X        -- device-deterministic pin (hashes, counts): exact.
  same_as: FIELD   -- must equal another field of the same artifact.
  differs_from: F  -- must DIFFER from another field (e.g. the
                      per-variant soup hashes of an ambiguity-rich
                      model: collapse = regression).
  lo/hi            -- hard band; reserved for weather-normalized
                      metrics (utilizations, same-session ratios).
  floor / ceil     -- one-sided absolute bound (e.g. the BASELINE.md
                      north star: >10x the CPU reference, any weather).
  informational    -- no value check; the field must exist and the
                      observed-band text must appear in the docs.

Every quote also enforces that its canonical ``range_text`` literally
appears in each doc file it names (so README/PERF/STATUS/SURVEY cannot
drift from what the artifacts are checked against).

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

def check_value(field, q, data, name):
    """Errors for one quote against one artifact's bench line."""
    v = data[field]
    errors = []
    if "equals" in q:
        if v != q["equals"]:
            errors.append(f"{name}: {field}={v!r} != pinned {q['equals']!r}")
    elif "same_as" in q:
        if v != data.get(q["same_as"]):
            errors.append(
                f"{name}: {field}={v!r} != {q['same_as']}="
                f"{data.get(q['same_as'])!r}"
            )
    elif "differs_from" in q:
        if v == data.get(q["differs_from"]):
            errors.append(
                f"{name}: {field}={v!r} EQUALS {q['differs_from']} -- "
                f"the two are pinned distinct ({q.get('range_text', '')})"
            )
    elif q.get("informational"):
        pass  # existence (checked by the caller) + doc text only
    else:
        lo = q.get("lo", q.get("floor", float("-inf")))
        hi = q.get("hi", q.get("ceil", float("inf")))
        if not (lo <= v <= hi):
            kind = "band" if "lo" in q else "absolute bound"
            errors.append(
                f"{name}: {field}={v} outside quoted {kind} "
                f"[{lo}, {hi}] ({q.get('range_text', '')})"
            )
    return errors


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
            errors.extend(check_value(field, q, data, name))
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

#!/usr/bin/env python
"""(Re)generate sdf_tpu/core/mc33_tables.npz -- the Lewiner-compatible
(trilinear-faithful) extended marching-cubes table set.

See sdf_tpu/core/mc33_build.py for the derivation.  The build samples
random realizations per case, resolves topology with a dense trilinear
oracle, and records per-entry conflict rates; it is deterministic for a
fixed seed.  Runtime code loads the committed artifact and CI re-verifies
sampled entries against the oracle (tests/test_topology.py).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sdf_tpu.core import mc33_build as mb  # noqa: E402

OUT = os.path.join(
    os.path.dirname(__file__), "..", "sdf_tpu", "core", "mc33_tables.npz"
)


def main():
    t0 = time.time()
    tabs = mb.build_tables(
        samples_per_case=120_000, reps_per_bucket=9, oracle_n=64,
        seed=7, verbose=True,
    )
    dt = time.time() - t0
    n_conf = int((tabs["conflict_rate"] > 0).sum())
    print(
        f"built {mb.N_EXT} entries in {dt:.0f}s: "
        f"max_tris={tabs['tri_table'].shape[1]}, "
        f"realizable={int(tabs['realizable'].sum())}, "
        f"conflicted buckets={n_conf} "
        f"(max rate {tabs['conflict_rate'].max():.3f})"
    )
    np.savez_compressed(OUT, **tabs)
    print(f"wrote {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()

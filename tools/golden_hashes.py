"""Golden result-hash manifest for the driver queries.

Computes a canonical sha256 per oracle-bearing registry query at
sf0.001 (columns sorted by name, rows sorted, stable repr encoding —
the same order-insensitive shape the driver's oracle compare hashes)
and stores them in ``tests/golden/query_hashes_sf0001.json``.

Why beside the DuckDB oracle: the oracle proves Spark == SQL-replay at
a point in time; the manifest proves THIS round == LAST round. A
refactor that changes results in a way the refactored oracle happens
to replay too (the failure mode oracle-only checking can't see: both
sides edited together) trips the stored hash instead. Every hash is
layout-invariant by the engine's determinism design — integer
micro/nano units, decimal moments, content-hash sampling, explicit
tie-breaks — which tests/test_layout_invariance.py pins directly.

Regenerate CONSCIOUSLY after an intended semantics change:

    python tools/golden_hashes.py --update
    git diff tests/golden/   # review exactly which queries moved

``approx_sketches`` (rows-only, engine-specific estimates) is
excluded by the same rule that exempts it from the oracle.
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GOLDEN = REPO / "tests" / "golden" / "query_hashes_sf0001.json"
# Data dir: --sf-dir <path> wins, then $SPARK_GRAFT_GOLDEN_SF_DIR, then
# the default sf0.001 location — the manifest is only meaningful for
# the sf0.001 tables it was recorded against, but the PATH to them is
# machine-specific.
if "--sf-dir" in sys.argv:
    _i = sys.argv.index("--sf-dir")
    if _i + 1 >= len(sys.argv):
        sys.exit("usage: golden_hashes.py [--update] [--sf-dir <path>]")
    SF_DIR = sys.argv[_i + 1]
else:
    import os

    SF_DIR = os.environ.get(
        "SPARK_GRAFT_GOLDEN_SF_DIR", "/root/testdata/sf0.001"
    )


def canonical_hash(df) -> str:
    cols = sorted(df.columns)
    rows = sorted(
        tuple(repr(r[c]) for c in cols) for r in df.select(*cols).collect()
    )
    h = hashlib.sha256()
    h.update(repr(cols).encode())
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()


def compute_all(spark) -> dict[str, str]:
    from mapreduce_task_spark.registry import all_queries

    out = {}
    for name, q in all_queries().items():
        if q.oracle is None:
            continue  # rows-only: estimates are engine-specific
        out[name] = canonical_hash(q.fn(spark, SF_DIR))
    return out


def main() -> int:
    from mapreduce_task_spark.session import get_spark

    spark = get_spark(app_name="golden-hashes", shuffle_partitions=8)
    got = compute_all(spark)
    if "--update" in sys.argv:
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN.write_text(json.dumps(got, indent=1, sort_keys=True) + "\n")
        print(f"wrote {len(got)} hashes to {GOLDEN}")
        return 0
    want = json.loads(GOLDEN.read_text())
    bad = {n for n in want if got.get(n) != want[n]} | (
        set(want) ^ set(got)
    )
    for n in sorted(bad):
        print(f"MOVED {n}: {want.get(n, '<absent>')[:12]} -> "
              f"{got.get(n, '<absent>')[:12]}")
    print(f"{len(got) - len(bad)}/{len(got)} unchanged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

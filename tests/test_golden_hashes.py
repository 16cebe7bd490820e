"""Cross-round regression tripwire: every oracle-bearing driver query
still produces the EXACT result recorded in the golden manifest.

The DuckDB oracle proves Spark == SQL-replay at a point in time; this
proves this-commit == last-recorded-commit. The failure mode it
catches that oracle-only checking can't: a change that moves results
AND edits the oracle to match (both sides edited together still hash
green against each other). An intended semantics change regenerates
the manifest consciously: `python tools/golden_hashes.py --update`,
then review `git diff tests/golden/` for exactly which queries moved.
"""

import json
from pathlib import Path

import pytest

from mapreduce_task_spark.registry import all_queries

GOLDEN = Path(__file__).parent / "golden" / "query_hashes_sf0001.json"


def _want():
    return json.loads(GOLDEN.read_text())


def test_manifest_covers_every_oracle_query():
    oracle_names = {n for n, q in all_queries().items() if q.oracle is not None}
    assert set(_want()) == oracle_names


@pytest.mark.parametrize("name", sorted(json.loads(GOLDEN.read_text())))
def test_query_result_matches_golden_hash(spark, sf_small, name):
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from golden_hashes import canonical_hash

    got = canonical_hash(all_queries()[name].fn(spark, sf_small))
    assert got == _want()[name], (
        f"{name} result moved from its golden hash - if intended, "
        "regenerate with `python tools/golden_hashes.py --update` and "
        "review the diff"
    )

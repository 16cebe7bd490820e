"""Empty-input totality sweep over the FULL query registry.

At 100 TB empty inputs are routine, not exceptional: an incremental
run over a day with no new documents, a partition-pruned scan that
matches nothing, a tenant with no data yet. Every registered query
must be *total* on schema-correct empty tables — return an empty (or
small constant-shaped) DataFrame, never raise from an unguarded
``collect()[0]``, an argmax over nothing, or an ANSI division.

This class exists because the sweep FOUND a real bug on first run:
``quality_bins``'s percentile_approx cut-point aggregate returns NULL
(not an empty list) on zero rows, and the CASE-builder iterated it
(operators/sampling.py). The parametrization keeps every query's
empty-input behavior pinned independently.
"""

import os

import pytest

from mapreduce_task_spark.registry import all_queries
from mapreduce_task_spark.sources.tables import (
    TABLES,
    load_table,
    write_empty_copies,
)

_QUERY_NAMES = sorted(all_queries().keys())


@pytest.fixture(scope="session")
def empty_sf_dir(spark, sf_small, tmp_path_factory):
    """Schema-correct, zero-row copies of all ten tables — built by
    the same library routine the manual sweep tool uses
    (sources.tables.write_empty_copies), so CI and tooling always
    exercise the same empty corpus."""
    dest = write_empty_copies(
        spark, sf_small, str(tmp_path_factory.mktemp("empty_sf"))
    )
    for name in TABLES:
        assert load_table(spark, dest, name).count() == 0
    return dest


@pytest.mark.parametrize("qname", _QUERY_NAMES)
def test_query_is_total_on_empty_input(spark, empty_sf_dir, qname):
    q = all_queries()[qname]
    df = q.fn(spark, empty_sf_dir)
    # must build AND execute without raising; row count is free to be
    # 0 or a small constant (reports/funnels emit fixed-shape rows)
    n = df.count()
    assert n >= 0

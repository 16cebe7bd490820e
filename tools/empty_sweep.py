"""Empty-input robustness sweep: run every registry query against a
directory of schema-correct but EMPTY parquet tables.

At 100 TB empty inputs are routine — an incremental run over a day with
no events, a partition-pruned scan that matches nothing, a tenant with
no documents yet. Every registered query must be *total* on empty
input: return an empty (or small constant) DataFrame, never raise from
an unguarded ``collect()[0]``, argmax over nothing, or ANSI division.

Usage: python tools/empty_sweep.py [src_sf_dir] [dest_dir]
Prints one line per query: OK/FAIL + error. Exit code = number of fails.
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from mapreduce_task_spark.registry import all_queries  # noqa: E402
from mapreduce_task_spark.session import get_spark  # noqa: E402
from mapreduce_task_spark.sources.tables import (  # noqa: E402
    TABLES,
    load_table,
    write_empty_copies,
)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_empty_sf"
    spark = get_spark(app_name="empty-sweep", shuffle_partitions=4)
    # unconditional rebuild: the library routine (shared with the CI
    # fixture) always overwrites, so a schema change in the source can
    # never leave this sweep testing a stale empty corpus
    write_empty_copies(spark, src, dest)
    # sanity: every table loads and is empty
    for name in TABLES:
        assert load_table(spark, dest, name).count() == 0, name

    fails = []
    for qname, q in all_queries().items():
        try:
            df = q.fn(spark, dest)
            n = df.count()
            print(f"OK    {qname}: {n} rows")
        except Exception as e:
            fails.append(qname)
            msg = traceback.format_exc().strip().splitlines()[-1]
            print(f"FAIL  {qname}: {msg}")
    print(f"\n{len(fails)} failures: {fails}")
    return len(fails)


if __name__ == "__main__":
    sys.exit(main())

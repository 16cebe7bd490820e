"""Registry invariants against the driver's correctness-record cap.

The driver records at most 50 correctness rows (observed in rounds 1-2):
with more queries registered, later entries silently vanish from the
correctness record. These tests make any future drop LOUD at pytest time
instead (round-2 advice): adding a 51st query fails here, forcing either
a consolidation of low-information entries or a deliberate cap bump.
"""

from mapreduce_task_spark.registry import all_queries

DRIVER_RECORD_CAP = 50  # observed driver behavior, rounds 1-2


def test_registry_fits_driver_record_cap():
    qs = all_queries()
    assert len(qs) <= DRIVER_RECORD_CAP, (
        f"{len(qs)} queries registered but the driver records only "
        f"{DRIVER_RECORD_CAP} correctness rows - the surplus would be "
        "silently unchecked. Consolidate low-information entries "
        "(see queries/relational.py merge notes) instead of exceeding the cap."
    )


def test_oracle_bearing_queries_ordered_first():
    # rows-only entries sort last so that IF the cap ever binds, it drops
    # the weakest-information rows, never an oracle-checked query
    names = list(all_queries().values())
    seen_rows_only = False
    for q in names:
        if q.oracle is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracle-bearing query {q.name!r} registered after a "
                "rows-only entry - ordering contract broken"
            )


def test_every_query_name_is_oracle_aligned():
    # oracle() keys and queries() keys must be identical sets minus
    # rows-only entries (driver contract: per-name pairing)
    qs = all_queries()
    with_oracle = {n for n, q in qs.items() if q.oracle is not None}
    assert with_oracle  # non-empty
    for n in with_oracle:
        assert qs[n].fn is not None

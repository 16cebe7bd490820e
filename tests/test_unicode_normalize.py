"""Unicode normalization (functions/text.py:unicode_normalize) — the
pre-dedup pass that makes composed and decomposed text hash alike."""

import unicodedata

import pytest
from pyspark.sql import Row, functions as F

from mapreduce_task_spark.functions.text import (
    normalize_unicode_text,
    unicode_normalize,
)

# "Café" composed (U+00E9) vs decomposed (e + U+0301); fullwidth and
# ligature forms for the NFKC compatibility fold
COMPOSED = "Café costs １０"          # é + fullwidth 10
DECOMPOSED = "Café costs １０"
LIGATURE = "oﬃce"                              # oﬃce with ffi ligature

ROWS = [
    (1, COMPOSED),
    (2, DECOMPOSED),
    (3, LIGATURE),
    (4, None),
    (5, ""),
    (6, "plain ascii stays identical"),
]


@pytest.fixture(scope="module")
def uni(spark):
    return spark.createDataFrame(ROWS, "doc_id int, text string")


def test_nfc_makes_composed_and_decomposed_hash_alike(spark, uni):
    """The dedup motivation: before NFC the two Café rows have
    different md5s; after NFC they are byte-identical."""
    pre = uni.filter(F.col("doc_id").isin(1, 2)).select(
        F.md5(F.encode("text", "UTF-8")).alias("h")
    )
    assert len({r["h"] for r in pre.collect()}) == 2
    post = normalize_unicode_text(uni.filter(F.col("doc_id").isin(1, 2))).select(
        F.md5(F.encode("text", "UTF-8")).alias("h")
    )
    assert len({r["h"] for r in post.collect()}) == 1


def test_matches_python_unicodedata_and_preserves_nulls(spark, uni):
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = {
            r["doc_id"]: r["n"]
            for r in uni.select(
                "doc_id", unicode_normalize("text", form).alias("n")
            ).collect()
        }
        want = {
            i: (unicodedata.normalize(form, t) if t is not None else None)
            for i, t in ROWS
        }
        assert got == want


def test_nfkc_folds_compatibility_forms(spark, uni):
    out = {
        r["doc_id"]: r["n"]
        for r in normalize_unicode_text(uni, form="NFKC")
        .select("doc_id", F.col("text").alias("n"))
        .collect()
    }
    assert out[3] == "office"          # ligature folded
    assert out[1].endswith("10")       # fullwidth digits folded
    assert out[6] == "plain ascii stays identical"


def test_nfc_agrees_with_duckdb_nfc_normalize(spark, uni):
    """Cross-engine spot check: Spark-side NFC (unicodedata) equals
    DuckDB's nfc_normalize on the same strings — evidence an oracle
    COULD replay NFC-built operators (NFK* forms have no DuckDB twin,
    which is why unicode-normalizing operators stay pytest-verified)."""
    import duckdb

    got = {
        r["doc_id"]: r["n"]
        for r in uni.select(
            "doc_id", unicode_normalize("text", "NFC").alias("n")
        ).collect()
    }
    for i, t in ROWS:
        if t is None:
            continue
        (want,) = duckdb.sql("SELECT nfc_normalize(?)", params=[t]).fetchone()
        assert got[i] == want, f"doc {i}"


def test_bad_form_rejected(spark):
    with pytest.raises(ValueError):
        unicode_normalize("text", "NFX")


def test_exact_dedup_and_shingles_opt_in_normalization(spark):
    """The wiring the helper exists for: with unicode_form='NFC' the
    composed and decomposed Café docs fall into ONE exact-dup group
    and produce IDENTICAL shingle sets; without it they are (wrongly
    but by-design, plan-purity default) distinct content."""
    from pyspark.sql import Row

    from mapreduce_task_spark.operators.dedup import exact_dedup_groups, shingles

    text_c = "nous allons au Café demain matin ensemble"
    text_d = "nous allons au Café demain matin ensemble"
    assert text_c != text_d
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=text_c), Row(doc_id=2, text=text_d)]
    )

    raw_groups = exact_dedup_groups(docs).count()
    assert raw_groups == 2  # raw bytes differ
    nfc_groups = exact_dedup_groups(docs, unicode_form="NFC").collect()
    assert len(nfc_groups) == 1 and nfc_groups[0]["n_copies"] == 2

    by_doc = (
        shingles(docs, unicode_form="NFC")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("shingle")).alias("s"))
        .collect()
    )
    sets = {r["doc_id"]: tuple(r["s"]) for r in by_doc}
    assert sets[1] == sets[2] and len(sets[1]) > 0


def test_ascii_fast_path_plan_and_bit_identical_results(spark, uni):
    """The r10 ASCII fast path: the Python (Arrow) stage must be fed by
    the RLIKE-filtered non-ASCII subset — never the whole frame — and
    results must be bit-identical to the ungated column form for every
    form, including NULL and empty-string rows."""
    for form in ("NFC", "NFKC"):
        got = {
            (r["doc_id"], r["text"])
            for r in normalize_unicode_text(uni, form=form).collect()
        }
        want = {
            (r["doc_id"], r["n"])
            for r in uni.select(
                "doc_id", unicode_normalize("text", form).alias("n")
            ).collect()
        }
        assert got == want

    plan = (
        normalize_unicode_text(uni)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan  # the hot branch still normalizes
    # the Arrow stage sits above the non-ASCII filter: split the plan at
    # the Arrow node and require an RLIKE filter below it in that branch
    import re

    arrow_idx = plan.index("ArrowEvalPython")
    assert re.search(r"RLIKE", plan[arrow_idx:]), plan
    # and the union's other branch carries NO python stage
    assert plan.count("ArrowEvalPython") == 1, plan

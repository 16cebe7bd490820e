"""PII redaction + boilerplate-line removal semantics."""

from pyspark.sql import Observation, Row

from mapreduce_task_spark.operators.scrub import (
    redact_pii,
    remove_boilerplate_lines,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


def test_redact_pii_all_categories(spark):
    df = _docs(
        spark,
        [
            "mail bob@example.com now",
            "see https://example.com/x?q=1 and 10.0.0.1",
            "call +1 (555) 123-4567 today",
            "clean text stays clean",
        ],
    )
    obs = Observation("pii")
    got = {r["doc_id"]: r["text"] for r in redact_pii(df, observation=obs).collect()}
    assert got[0] == "mail <EMAIL> now"
    assert got[1] == "see <URL> and <IPV4>"
    assert got[2] == "call <PHONE> today"
    assert got[3] == "clean text stays clean"
    m = obs.get
    assert m["PII_EMAIL_HITS"] == 1
    assert m["PII_URL_HITS"] == 1
    assert m["PII_PHONE_HITS"] >= 1
    assert m["PII_IPV4_HITS"] == 1


def test_redact_pii_is_pure_codegen(spark):
    plan = (
        redact_pii(_docs(spark, ["x"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_remove_boilerplate_lines_by_document_frequency(spark):
    footer = "subscribe to our newsletter"
    texts = [
        f"unique alpha\n{footer}",
        f"unique beta\n{footer}\nmore beta",
        f"{footer}\nunique gamma",
        "only unique delta",
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(_docs(spark, texts), df_max=2).collect()
    }
    # footer appears in 3 docs > df_max=2 -> dropped everywhere,
    # order of surviving lines preserved
    assert got[0] == "unique alpha"
    assert got[1] == "unique beta\nmore beta"
    assert got[2] == "unique gamma"
    assert got[3] == "only unique delta"


def test_remove_boilerplate_keeps_lines_at_or_below_threshold(spark):
    shared = "appears twice only"
    texts = [f"{shared}\na", f"{shared}\nb", "c"]
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(_docs(spark, texts), df_max=2).collect()
    }
    assert got[0] == f"{shared}\na"  # df=2 == df_max -> kept
    assert got[1] == f"{shared}\nb"
    assert got[2] == "c"


def test_remove_boilerplate_repeated_within_one_doc_not_hot(spark):
    # document frequency is DISTINCT docs: a line repeated 5x inside one
    # doc is not boilerplate
    texts = ["echo\necho\necho\necho\necho", "other"]
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(_docs(spark, texts), df_max=1).collect()
    }
    assert got[0] == "echo\necho\necho\necho\necho"
    assert got[1] == "other"


def test_remove_boilerplate_keeps_fully_boilerplate_docs_empty(spark):
    """A document whose every line is boilerplate must survive as an
    empty-text row — dropping it would silently shrink corpus row
    counts before any quality filter gets to decide."""
    footer = "all rights reserved"
    texts = [f"a\n{footer}", f"b\n{footer}", f"c\n{footer}", footer]
    got = {
        r["doc_id"]: r["text"]
        for r in remove_boilerplate_lines(_docs(spark, texts), df_max=2).collect()
    }
    assert set(got) == {0, 1, 2, 3}  # all four docs present
    assert got[3] == ""  # all-footer doc survives, emptied
    assert got[0] == "a" and got[1] == "b" and got[2] == "c"


def test_remove_repeated_spans_matches_python_replay(spark):
    """Cross-doc repeated token-span removal vs an independent python
    replay, including the overlap-merge (covered-union) semantics and
    the everything-removed -> empty-string contract."""
    from mapreduce_task_spark.operators.scrub import remove_repeated_spans

    n = 3
    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "a quick brown fox ran off",          # shares 'quick brown fox'
        2: "the lazy dog sat on the lazy dog",   # internal repeat, 1 doc only
        3: "over the lazy dog indeed",           # shares 'the lazy dog' w/ 0,2
        4: "quick brown fox",                    # fully covered -> empty
        5: "short one",                          # < n tokens, untouched
    }
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])

    toks = {i: t.split() for i, t in texts.items()}
    from collections import defaultdict

    docs_per_gram = defaultdict(set)
    for i, t in toks.items():
        for s in range(len(t) - n + 1):
            docs_per_gram[" ".join(t[s : s + n])].add(i)
    hot = {g for g, ds in docs_per_gram.items() if len(ds) > 1}
    want = {}
    for i, t in toks.items():
        covered = set()
        for s in range(len(t) - n + 1):
            if " ".join(t[s : s + n]) in hot:
                covered.update(range(s, s + n))
        kept = [w for p, w in enumerate(t) if p not in covered]
        want[i] = (" ".join(kept), len(t) - len(kept))

    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_repeated_spans(df, n=n, df_max=1).collect()
    }
    assert got == want
    assert got[4] == ("", 3)          # fully removed
    assert got[5] == ("short one", 0) # under n tokens untouched
    # 'the lazy dog' is hot (docs 0/2/3) so BOTH its occurrences in doc
    # 2 are cut (positions 0-2 and 5-7); the purely-internal trigrams
    # ('lazy dog sat', ...) are not hot and the middle tokens survive
    assert got[2] == ("sat on", 6)

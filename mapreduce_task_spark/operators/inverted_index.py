"""Inverted index — the reference's trace-insertindex-job re-expressed.

Reference semantics (SURVEY.md §2.2 P6-P8, §2.3 A2/A6): parse
``word\\tdocId`` pairs (malformed lines dropped + counted), group by
word, dedupe doc ids (HashSet, TraceInsertIndexReducer.java:132-135),
emit the comma-joined list (TraceInsertIndexReducer.java:140-145).

The reference's HashSet iteration order is nondeterministic; we emit
``sort_array(collect_set(...))`` so results are deterministic and
oracle-comparable (SURVEY §7.3).

Spark plan: partial ``collect_set`` runs map-side (ObjectHashAggregate),
so the shuffle carries per-partition deduped sets, not raw pairs —
the combiner the reference lacks. For skewed words at 100 TB the AQE
skew handling plus the bounded vocabulary keep reduce partitions sane;
for truly giant postings lists switch the caller to the pair output
(``explode`` of the set) rather than a single concatenated string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import normalized_tokens, words


def inverted_index(
    pairs: DataFrame,
    word_col: str = "word",
    doc_col: str = "doc_id",
    out_docs_col: str = "doc_ids",
    sort: bool = True,
    max_postings: int | None = None,
) -> DataFrame:
    """(word, doc) pairs -> (word, csv-of-sorted-distinct-docs, n_docs).

    ``max_postings`` caps the emitted list (first N sorted doc ids) —
    the 100 TB guard against a word present in every document blowing
    up one aggregation buffer; ``n_docs`` still reports the true
    distinct count.
    """
    docs_set = F.sort_array(F.collect_set(F.col(doc_col).cast("string")))
    if max_postings is not None:
        docs_set = F.slice(docs_set, 1, max_postings)
    out = pairs.groupBy(F.col(word_col).alias("word")).agg(
        F.array_join(docs_set, ",").alias(out_docs_col),
        F.size(F.collect_set(F.col(doc_col).cast("string"))).cast("long").alias("n_docs"),
    )
    return out.orderBy("word") if sort else out


def inverted_index_from_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sort: bool = True,
) -> DataFrame:
    """Tokenize documents, then index: word -> distinct doc ids.

    The driver-table analogue of the reference job (FIXTURES.md maps
    insertindex onto the ``documents`` table).
    """
    pairs = words(docs, text_col=text_col, keep=(id_col,))
    return inverted_index(pairs, word_col="word", doc_col=id_col, sort=sort)


def positional_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Positional inverted index: (word, doc, sorted positions array) —
    the phrase-query upgrade of the reference's doc-set index
    (TraceInsertIndexReducer.java:132-145 keeps only WHICH docs; this
    keeps WHERE, enabling adjacency queries).

    One posexplode + one (word, doc) groupBy; positions are 0-based
    normalized-token offsets, sorted for deterministic output. Shuffle
    keys are (word, doc) — finer than the plain index's (word), so a
    stopword's postings spread across reducers instead of hot-spotting
    one.
    """
    toks = docs.select(
        F.col(id_col), F.posexplode(normalized_tokens(text_col)).alias("pos", "word")
    ).filter(F.col("word") != "")
    return toks.groupBy("word", id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase query over the positional index: (doc, n_hits).

    The classic intersect-with-offset plan: a doc contains the phrase
    iff the per-word position sets, each shifted left by its phrase
    offset, intersect — ``array_intersect`` folds the k word-position
    arrays after a k-way per-doc alignment (inner joins on the doc id;
    a doc missing any phrase word drops out at the join). Everything
    after the index groupBy is pure codegen; the phrase length bounds
    the join count, not the corpus.

    Query terms pass through the SAME normalization as the index side
    (lowercase + strip ``[^a-z]`` + drop empties, mirroring
    ``normalized_tokens``) — a phrase like "don't stop" or "top 10"
    matches the normalized index tokens instead of silently missing.
    """
    import re

    terms = [
        t
        for t in (re.sub("[^a-z]", "", w) for w in phrase.lower().split())
        if t
    ]
    if not terms:
        raise ValueError("phrase must contain at least one token")
    idx = positional_index(docs, id_col, text_col)

    def shifted(off: int):
        # single-param lambda closing over off — a two-param lambda
        # would be read as (element, index) by pyspark's HOF binding
        return F.transform(F.col("positions"), lambda p: p - F.lit(off))

    aligned = None
    for i, term in enumerate(terms):
        side = idx.filter(F.col("word") == term).select(
            F.col(id_col), shifted(i).alias(f"__p{i}")
        )
        aligned = side if aligned is None else aligned.join(side, id_col)
    hits = F.col("__p0")
    for i in range(1, len(terms)):
        hits = F.array_intersect(hits, F.col(f"__p{i}"))
    return (
        aligned.select(F.col(id_col), F.size(hits).alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )

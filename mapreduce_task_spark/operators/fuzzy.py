"""Fuzzy string matching: edit-distance joins without the O(n^2) scan.

The reference has no string-similarity surface at all; entity
resolution / typo clustering over a 100 TB vocabulary needs an
edit-distance join whose candidate generation is a plain equi-join.

``symdelete_pairs`` uses the symmetric-delete blocking idea (the
SymSpell family): every string emits itself plus every single-character
deletion variant; two strings within Levenshtein distance 1 ALWAYS
share at least one variant (substitution -> delete the differing
position from both; insertion/deletion -> delete the extra char from
the longer), so an equi-join on the variant column finds every
candidate pair, and an exact ``levenshtein`` check removes the false
positives (distance-2 pairs that happen to collide, e.g. transposed
neighbors). Fan-out is len+1 variants per string — linear in corpus
size — and the join key distribution mirrors the vocabulary, so the
shuffle is uniform. Compare ``dedup.py``'s shingle LSH: same
block-then-verify shape, specialized to edit distance.

Verification stays JVM-side (``F.levenshtein``); no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def deletion_variants(col: str = "word") -> F.Column:
    """Array of the string itself plus every single-char deletion —
    pure codegen (transform over 0..len)."""
    c = F.col(col)
    # dynamic-position deletion: prefix substr(c, 1, i-1) || suffix
    # substr(c, i+1) — both JVM substr with column args, pure codegen
    dels = F.transform(
        F.sequence(F.lit(1), F.length(c)),
        lambda i: F.concat(
            c.substr(F.lit(1), (i - F.lit(1)).cast("int")),
            c.substr((i + F.lit(1)).cast("int"), F.length(c)),
        ),
    )
    return F.array_union(F.array(c), dels)


def symdelete_pairs(
    df: DataFrame, col: str = "word", max_dist: int = 1
) -> DataFrame:
    """All distinct pairs (a, b), a < b, with levenshtein(a, b) <=
    ``max_dist`` (currently 1 — the radius the single-deletion
    neighborhood covers exactly).

    Block: explode deletion variants, equi-join on the variant.
    Verify: exact JVM levenshtein. Dedup: pairs are oriented a < b and
    distinct-ed (a pair can collide on several variants).
    """
    if max_dist != 1:
        raise ValueError(
            "symdelete_pairs covers max_dist=1; chain merges or use "
            "a deeper deletion neighborhood for larger radii"
        )
    words = df.select(col).distinct()
    posted = words.select(
        F.col(col).alias("w"), F.explode(deletion_variants(col)).alias("v")
    )
    b = posted.select(F.col("w").alias("w2"), F.col("v").alias("v2"))
    cand = (
        posted.join(b, (F.col("v") == F.col("v2")) & (F.col("w") < F.col("w2")))
        .select(F.col("w").alias("a"), F.col("w2").alias("b"))
        .distinct()
    )
    return cand.filter(F.levenshtein("a", "b") <= max_dist)


def typo_clusters(
    df: DataFrame, col: str = "word", min_count_ratio: int = 4
) -> DataFrame:
    """Map rare words to a much more frequent edit-distance-1 neighbor
    (the classic typo-correction table): returns (variant, canonical,
    n_variant, n_canonical) where n_canonical >= ratio * n_variant.
    Ties resolve to the most frequent neighbor, then the
    lexicographically greatest (max_by over the (n, word) struct).
    """
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    pairs = symdelete_pairs(df, col)
    # orient every pair both ways, then keep rare -> frequent edges
    edges = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    ca = counts.select(F.col(col).alias("a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col(col).alias("b"), F.col("n").alias("n_b"))
    scored = (
        edges.join(ca, "a")
        .join(cb, "b")
        .filter(F.col("n_b") >= F.lit(min_count_ratio) * F.col("n_a"))
    )
    best = scored.groupBy("a").agg(
        F.max_by(
            F.struct(
                F.col("b").alias("canonical"), F.col("n_b").alias("n_canonical")
            ),
            F.struct(F.col("n_b"), F.col("b")),
        ).alias("__best"),
        F.first("n_a").alias("n_variant"),
    )
    return best.select(
        F.col("a").alias("variant"),
        F.col("__best.canonical").alias("canonical"),
        "n_variant",
        F.col("__best.n_canonical").alias("n_canonical"),
    )

"""Column-pruning plan assertions — a projection must reach the parquet
reader (`ReadSchema`), or at 100 TB the scan reads whole rows for
2-column queries. Complements the pushdown/broadcast plan tests in
test_subqueries.py."""

from mapreduce_task_spark.registry import all_queries


def _read_schemas(df) -> list[str]:
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    return [l.split("ReadSchema:", 1)[1] for l in plan.splitlines() if "ReadSchema:" in l]


def test_q1_scan_reads_only_needed_lineitem_columns(spark, sf_small):
    df = all_queries()["q1_pricing_summary"].fn(spark, sf_small)
    schemas = _read_schemas(df)
    assert schemas
    s = schemas[0]
    for needed in ("l_returnflag", "l_linestatus", "l_quantity"):
        assert needed in s, s
    for unused in ("l_partkey", "l_suppkey", "l_orderkey"):
        assert unused not in s, s


def test_text_quality_scan_prunes_documents(spark, sf_small):
    df = all_queries()["text_quality"].fn(spark, sf_small)
    schemas = _read_schemas(df)
    assert schemas
    s = schemas[0]
    assert "text" in s
    for unused in ("lang", "source", "n_chars"):
        assert unused not in s, s


def test_embedding_norms_scan_prunes_label(spark, sf_small):
    df = all_queries()["embedding_norms"].fn(spark, sf_small)
    schemas = _read_schemas(df)
    assert schemas and "label" not in schemas[0], schemas


def test_chunking_shapes_scans_read_only_id_and_text(spark, sf_small):
    # both legs of the merged chunking union derive from the chunk frame:
    # every documents scan must project only (doc_id, text)
    df = all_queries()["chunking_shapes"].fn(spark, sf_small)
    schemas = _read_schemas(df)
    assert schemas
    for s in schemas:
        assert "doc_id" in s and "text" in s
        for unused in ("lang", "source", "n_chars"):
            assert unused not in s, s


def test_sampling_shapes_scans_prune_text_column(spark, sf_small):
    # every documents leg of the merged sampling union projects only
    # (doc_id, lang, source, n_chars); text — the wide column — must
    # never be read just to apply hash filters / window row caps. The
    # clusterbal leg (r8) adds embeddings scans: those must read only
    # (vec_id, embedding) — never the label column.
    df = all_queries()["sampling_shapes"].fn(spark, sf_small)
    schemas = _read_schemas(df)
    assert schemas
    saw_docs = saw_emb = False
    for s in schemas:
        if "embedding" in s:
            # the centroid-update branch even prunes vec_id away
            saw_emb = True
            assert "label" not in s, s
        elif "doc_id" in s:
            saw_docs = True
        else:
            # tempmix's per-domain count scans (r10) prune doc_id away
            # entirely — the narrowest possible documents read; they
            # carry only the domain column
            assert s.strip() == "struct<source:string>", s
        assert "text" not in s, s
    assert saw_docs and saw_emb


def test_graph_analytics_scans_read_only_graph_columns(spark, sf_small):
    # both lineitem-derived graphs need only (orderkey, partkey,
    # linenumber); the money/date columns must never reach the scan
    df = all_queries()["graph_analytics"].fn(spark, sf_small)
    schemas = _read_schemas(df)
    assert schemas
    for s in schemas:
        if "l_" not in s:
            continue  # non-lineitem leaves (checkpointed rank frames)
        assert "l_orderkey" in s or "l_partkey" in s, s
        for unused in ("l_extendedprice", "l_discount", "l_shipdate", "l_quantity"):
            assert unused not in s, s


def test_scrub_shapes_scans_read_only_id_and_text(spark, sf_small):
    # documents legs read only (doc_id, text); the semdecontam leg
    # (r8) adds embeddings scans that must read only (vec_id,
    # embedding) — never the label column
    df = all_queries()["scrub_shapes"].fn(spark, sf_small)
    schemas = _read_schemas(df)
    assert schemas
    saw_docs = saw_emb = False
    for s in schemas:
        if "embedding" in s:
            saw_emb = True
            assert "label" not in s, s
            continue
        saw_docs = True
        assert "doc_id" in s and "text" in s, s
        for unused in ("lang", "source", "n_chars"):
            assert unused not in s, s
    assert saw_docs and saw_emb

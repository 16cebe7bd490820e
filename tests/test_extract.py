"""HTML -> text extraction semantics (operators/extract.py).

The driver-side oracle leg (scrub_shapes html) hash-gates the chain
against a planted full-page fixture; these tests pin the semantics on
hand-written markup — including malformed/nested cases the fixture
does not plant — plus DuckDB replay parity and the plan contract
(map-only, no Python stage).
"""

import duckdb
import pytest
from pyspark.sql import Row

from mapreduce_task_spark.operators.extract import (
    SENTINEL,
    extract_main_content,
    html_text_column,
    html_to_text,
    html_to_text_duckdb_sql,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id bigint, text string",
    )


def _extract(spark, texts):
    return {
        r["doc_id"]: r["text"]
        for r in html_to_text(_docs(spark, texts)).collect()
    }


def test_full_page(spark):
    page = (
        "<!DOCTYPE html><html><head><title>T</title>"
        "<style>p {color: red}</style></head><body>"
        "<h1>Head</h1><p>para one</p><p>para two</p>"
        "<script>var x = 1 < 2;</script></body></html>"
    )
    assert _extract(spark, [page])[0] == "Head\npara one\npara two"


def test_block_structure_becomes_lines(spark):
    got = _extract(
        spark,
        ["<div>one</div><div>two</div><ul><li>a</li><li>b</li></ul>c<br>d"],
    )[0]
    # </li></ul> adjacency leaves a paragraph break (only 3+ newlines
    # collapse to 2 — double newlines are preserved block separation)
    assert got == "one\ntwo\na\nb\n\nc\nd"


def test_entities(spark):
    got = _extract(
        spark,
        ["A &amp; B &lt;i&gt; &quot;Q&quot; it&apos;s 100&nbsp;% caf&#233;"],
    )[0]
    assert got == 'A & B <i> "Q" it\'s 100 % café'


def test_out_of_range_and_hex_entities_pass_through(spark):
    # >= 256 (Spark char wraps mod 256, DuckDB chr does full Unicode —
    # so the common subset is 1..255 and the rest is verbatim), &#0;,
    # and hex refs all survive unchanged
    got = _extract(spark, ["&#8364; &#0; &#x27; &#1114112;"])[0]
    assert got == "&#8364; &#0; &#x27; &#1114112;"


def test_malformed_markup_degrades_gracefully(spark):
    got = _extract(
        spark,
        [
            "unclosed <tag and < bare lt",
            "<p>nested <div><p>deep</p></div> ok",
            "<b>no closing",
            "text with > bare gt",
        ],
    )
    assert got[0] == "unclosed <tag and < bare lt"
    assert got[1] == "nested deep\n\nok"
    assert got[2] == "no closing"
    assert got[3] == "text with > bare gt"


def test_comment_and_head_and_case_insensitive_script(spark):
    got = _extract(
        spark,
        [
            "<!-- c with <p>tag</p> -->visible",
            "<head><script>s</script><style>c</style></head>body",
            "<SCRIPT TYPE='x'>DROP</SCRIPT>kept<STYLE>s</STYLE>",
        ],
    )
    assert got[0] == "visible"
    assert got[1] == "body"
    assert got[2] == "kept"


def test_whitespace_normalization(spark):
    got = _extract(spark, ["  a   b\t c \n\n\n\n d  "])[0]
    assert got == "a b c\n\nd"


def test_sentinel_in_input_cannot_forge_decode(spark):
    from mapreduce_task_spark.operators.extract import SENTINEL_CLOSE

    got = _extract(
        spark, [f"{SENTINEL}#65{SENTINEL_CLOSE} and #66 raw"]
    )[0]
    assert got == "#65 and #66 raw"


def test_numeric_entity_adjacent_plain_text_not_decoded(spark):
    # r13 self-review regression: '#digits' plain text abutting a real
    # entity must NOT be mistaken for an entity token (the two-sentinel
    # wrap distinguishes inside-token from after-token segments)
    got = _extract(
        spark,
        [
            "&#65;#66",
            "#2020&#8212;x",
            "&#49;#123&#50;",
            "&#65;&#66; back to back",
        ],
    )
    assert got[0] == "A#66"
    assert got[1] == "#2020&#8212;x"
    assert got[2] == "1#123" + "2"
    assert got[3] == "AB back to back"


def test_null_text_passes_through(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text=None)], "doc_id bigint, text string"
    )
    assert html_to_text(df).collect()[0]["text"] is None


def test_duckdb_replay_parity(spark):
    texts = [
        "<p attr=\"x > y\">attr gt edge</p>",
        "&#38;amp; double decode edge",
        "a<br/>b &amp;&amp; c &#65;&#66;",
        "<header>nav</header><article>body text</article><footer>f</footer>",
        "plain",
        "&#65;#66 adjacency",
        "#2020&#8212;x",
        "&#49;#123&#50;",
    ]
    spark_out = _extract(spark, texts)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(texts))
    )
    duck = dict(
        con.execute(
            f"SELECT doc_id, {html_to_text_duckdb_sql('text')} FROM t"
        ).fetchall()
    )
    assert spark_out == duck


def test_plan_is_map_only_no_python(spark):
    plan = (
        html_to_text(_docs(spark, ["<p>x</p>"]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_extract_main_content_drops_template_lines(spark):
    nav = "<div>Home | About | Contact</div>"
    pages = [
        f"{nav}<p>alpha content</p>",
        f"{nav}<p>beta content</p>",
        f"{nav}<p>gamma content</p>",
    ]
    got = {
        r["doc_id"]: r["text"]
        for r in extract_main_content(_docs(spark, pages), df_max=2).collect()
    }
    assert got[0] == "alpha content"
    assert got[1] == "beta content"
    assert got[2] == "gamma content"


def test_column_form_composes(spark):
    # html_text_column is usable inline in any select
    from pyspark.sql import functions as F

    df = _docs(spark, ["<p>x</p>"]).select(
        html_text_column(F.col("text")).alias("out")
    )
    assert df.collect()[0]["out"] == "x"

"""Golden end-to-end byte-parity tests on the reference's canned inputs.

The reference repo's only "tests" are the literal micro-inputs its upload
scripts generate:

- fruit list            trace-sort-job/upload-test-input.sh:11-23
- fox/dog text          trace-wordcount-job/upload-wordcount-input.sh:9-20
- word\tdocN part files trace-insertindex-job/upload-insertindex-input.sh:13-20

Each test pushes those exact bytes through the full text-in -> operator ->
``write_kv_text`` -> text-out path (single output partition) and compares
the output FILE BYTES against an independently computed expectation that
replays the Java job's semantics:

- wordcount: split("\\s+") -> toLowerCase -> strip [^a-z] -> drop empty ->
  sum -> key-sorted ``word\tcount`` (TraceWordCountMapper.java:108-113,
  TraceWordCountReducer.java:117).
- sort: identity keys, duplicate-preserving reduce, byte-lexicographic key
  order; Hadoop's TextOutputFormat writes ``key + '\t' + value`` even for
  the empty value Text (TraceSortMapper.java:116, TraceSortReducer.java:119).
- insertindex: tab parse -> per-word distinct doc set -> comma join
  (TraceInsertIndexMapper.java:109-111, TraceInsertIndexReducer.java:131-145).
  The reference's comma ORDER is Java-HashSet-iteration order (an
  implementation artifact); ours is the documented sorted-set substitution
  (SURVEY §7.3), so the byte check asserts the sorted canonical form and a
  separate assertion checks order-insensitive parity per word.
"""

from __future__ import annotations

import re
from collections import Counter
from pathlib import Path

from pyspark.sql import functions as F

from mapreduce_task_spark.operators.inverted_index import inverted_index
from mapreduce_task_spark.operators.sortops import total_sort
from mapreduce_task_spark.operators.wordcount import wordcount
from mapreduce_task_spark.sources.text import read_lines, read_tab_pairs, write_kv_text

SORT_INPUT = """orange
apple
banana
grape
kiwi
pear
mango
pineapple
lemon
strawberry
"""

WORDCOUNT_INPUT = """The quick brown fox jumps over the lazy dog.
The quick brown fox is fast and clever.
Lazy dogs don't jump over quick foxes.
The fox and the dog became friends in the forest.
Every morning, the quick fox would race with the lazy dog.
Sometimes the dog won, but usually the fox was faster.
One day, a clever crow watched them from a tall tree.
She wondered who would win the next morning’s race.
In the end, they both sat under the sun, tired but happy.
"""


def _read_output_bytes(out_dir: str) -> bytes:
    parts = sorted(Path(out_dir).glob("part-*"))
    assert len(parts) == 1, f"expected one part file, got {parts}"
    return parts[0].read_bytes()


def test_golden_wordcount_fox_dog(spark, tmp_path):
    inp = tmp_path / "wordcount_sample.txt"
    inp.write_text(WORDCOUNT_INPUT, encoding="utf-8")

    # independent oracle replaying the Java mapper/reducer semantics
    counts: Counter[str] = Counter()
    for line in WORDCOUNT_INPUT.splitlines():
        for tok in re.split(r"\s+", line, flags=re.ASCII):
            word = re.sub(r"[^a-z]", "", tok.lower())
            if word:
                counts[word] += 1
    expected = "".join(f"{w}\t{counts[w]}\n" for w in sorted(counts))

    df = wordcount(read_lines(spark, str(inp)), text_col="value")
    out = tmp_path / "wc-out"
    write_kv_text(df.coalesce(1), str(out), "word", "cnt")
    assert _read_output_bytes(str(out)) == expected.encode("utf-8")


def test_golden_sort_fruit_list(spark, tmp_path):
    inp = tmp_path / "input.txt"
    inp.write_text(SORT_INPUT, encoding="utf-8")

    # identity map -> byte-lexicographic key sort -> TextOutputFormat
    # emits "key\t" because the value is the (non-null) empty Text
    expected = "".join(f"{line}\t\n" for line in sorted(SORT_INPUT.splitlines()))

    df = total_sort(read_lines(spark, str(inp)), "value").select(
        "value", F.lit("").alias("empty")
    )
    out = tmp_path / "sort-out"
    write_kv_text(df.coalesce(1), str(out), "value", "empty")
    assert _read_output_bytes(str(out)) == expected.encode("utf-8")


def test_golden_insertindex_part_files(spark, tmp_path):
    inp = tmp_path / "insertindex-input"
    inp.mkdir()
    for i in range(1, 6):
        (inp / f"part-{i}.txt").write_text(
            f"apple\tdoc{i}\nbanana\tdoc{i}\ncat\tdoc{i}\n", encoding="utf-8"
        )
    (inp / "part-special.txt").write_text("zebra\tdoc6\n", encoding="utf-8")

    docs15 = ",".join(f"doc{i}" for i in range(1, 6))
    expected = (
        f"apple\t{docs15}\nbanana\t{docs15}\ncat\t{docs15}\nzebra\tdoc6\n"
    )

    pairs = read_tab_pairs(spark, str(inp))
    idx = inverted_index(pairs, word_col="word", doc_col="doc_id")
    out = tmp_path / "ii-out"
    write_kv_text(idx.coalesce(1), str(out), "word", "doc_ids")
    got = _read_output_bytes(str(out))
    assert got == expected.encode("utf-8")

    # order-insensitive parity with the reference's HashSet-ordered output
    ref_unordered = {
        "apple": frozenset(f"doc{i}" for i in range(1, 6)),
        "banana": frozenset(f"doc{i}" for i in range(1, 6)),
        "cat": frozenset(f"doc{i}" for i in range(1, 6)),
        "zebra": frozenset(["doc6"]),
    }
    got_map = {
        line.split("\t")[0]: frozenset(line.split("\t")[1].split(","))
        for line in got.decode().splitlines()
    }
    assert got_map == ref_unordered

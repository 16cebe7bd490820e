"""mapreduce_task_spark — a PySpark-native analytics engine.

Rebuilds the query and data-processing capabilities of the reference
``oscar-osu/mapreduce-task`` (three OpenTelemetry-traced Hadoop MapReduce
jobs: WordCount, Sort, InsertIndex — see SURVEY.md) as an idiomatic
PySpark DataFrame engine, and extends it with the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
required at 100 TB scale.

Layout
------
- ``session``    : SparkSession builder tuned for scale + local test mode
- ``sources``    : parquet/text/TSV readers, key\\tvalue text sink
- ``functions``  : scalar/text/hash/vector column helpers (JVM built-ins)
- ``operators``  : the dataflow operators (wordcount, sort, inverted
                   index, relational breadth, dedup, similarity, text
                   analysis, multimodal)
- ``plans``      : logical-plan signature (the reference's
                   ``mr.job.signature.v1`` analogue)
- ``obs``        : observability — spans, counters, task metrics
- ``chaos``      : straggler/skew fault injection (the reference's
                   ``insertindex.slow.*`` surface)
- ``streaming``  : Structured Streaming operators (windowed aggs)

Design stance: DataFrame API only; every operator is expressible at
arbitrary scale (no ``collect()`` in any dataflow, no driver-side loops
over data, broadcast for small sides, AQE-friendly shuffles).
"""

__version__ = "0.1.0"

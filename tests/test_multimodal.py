"""Multimodal binary-column plumbing: schema, batching, stubbed decode."""

import hashlib

import pytest
from pyspark.sql import Row

from mapreduce_task_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    extract_features,
    with_binary_payload,
)


def _docs(spark, texts):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_payload_schema(spark):
    df = with_binary_payload(_docs(spark, ["abc", "defg"]))
    dt = dict(df.dtypes)
    assert dt["payload"] == "binary"
    assert dt["media_meta"].startswith("struct<modality:string,width:int")
    rows = {r["doc_id"]: r for r in df.collect()}
    assert bytes(rows[0]["payload"]) == b"abc"
    assert rows[0]["media_meta"]["modality"] == "image"
    assert rows[1]["media_meta"]["modality"] == "audio"


def test_extract_features_deterministic(spark):
    df = with_binary_payload(_docs(spark, ["abc"]))
    r = extract_features(df).collect()[0]
    assert r["n_bytes"] == 3
    assert r["byte_sum"] == ord("a") + ord("b") + ord("c")
    assert r["head_md5"] == hashlib.md5(b"abc").hexdigest()
    assert r["payload_md5"] == hashlib.md5(b"abc").hexdigest()
    assert r["modality"] == "image"
    assert (r["width"], r["height"], r["duration_ms"]) == (0, 0, 1000)


def test_extract_features_empty_payloads_anywhere(spark):
    # a trailing empty payload must not corrupt the byte sum of the
    # payload before it (the reduceat-clamp formulation dropped its
    # last byte: [b'ab', b''] -> 97), and empties in any slot are 0
    texts = ["ab", "", "xyz", "", ""]
    df = with_binary_payload(_docs(spark, texts)).coalesce(1)
    rows = {r["doc_id"]: r for r in extract_features(df).collect()}
    assert rows[0]["byte_sum"] == ord("a") + ord("b")
    assert rows[1]["byte_sum"] == 0 and rows[1]["n_bytes"] == 0
    assert rows[2]["byte_sum"] == sum(b"xyz")
    assert rows[3]["byte_sum"] == 0 and rows[4]["byte_sum"] == 0
    assert rows[1]["head_md5"] == hashlib.md5(b"").hexdigest()


def test_decoders_are_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_sample_frames_fan_out_contract(spark, sf_small):
    """1->N Arrow fan-out: every video doc yields exactly
    frames_per_doc rows with deterministic payload-slice frames and
    uniformly spaced timestamps; non-video rows contribute nothing."""
    from pyspark.sql import functions as F

    from mapreduce_task_spark.operators.multimodal import (
        sample_frames,
        with_binary_payload,
    )
    from mapreduce_task_spark.sources.tables import load_table

    docs = with_binary_payload(load_table(spark, sf_small, "documents"))
    n_video = docs.filter(F.col("media_meta.modality") == "video").count()
    frames = sample_frames(docs, frames_per_doc=4, frame_bytes=16)
    rows = frames.collect()
    assert len(rows) == 4 * n_video > 0
    assert frames.columns == ["doc_id", "frame_idx", "frame_bytes", "ts_ms"]

    # deterministic replay for one doc
    src = {
        r["doc_id"]: (bytes(r["payload"]), r["media_meta"]["duration_ms"])
        for r in docs.filter(F.col("media_meta.modality") == "video")
        .limit(3)
        .collect()
    }
    for r in rows:
        if r["doc_id"] in src:
            payload, dur = src[r["doc_id"]]
            start = r["frame_idx"] * len(payload) // 4
            assert bytes(r["frame_bytes"]) == payload[start : start + 16]
            assert r["ts_ms"] == r["frame_idx"] * dur // 4


def test_sample_frames_null_duration_survives(spark):
    """A video row with NULL media_meta.duration_ms must not poison the
    Arrow batch (int(None) TypeError pre-fix); it defaults to ts_ms=0."""
    from pyspark.sql import Row

    from mapreduce_task_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [
            Row(doc_id=1, payload=bytes(range(64)),
                media_meta=Row(modality="video", duration_ms=8000)),
            Row(doc_id=2, payload=bytes(range(32)),
                media_meta=Row(modality="video", duration_ms=None)),
        ],
        schema="doc_id bigint, payload binary, "
        "media_meta struct<modality:string, duration_ms:bigint>",
    )
    out = sample_frames(df, frames_per_doc=2, frame_bytes=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 2
    assert all(r.ts_ms == 0 for r in by_doc[2])
    assert {r.frame_idx for r in by_doc[2]} == {0, 1}

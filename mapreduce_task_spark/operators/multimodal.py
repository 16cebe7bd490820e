"""Multimodal (binary) column plumbing for training-data pipelines.

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, and runs decode / feature-extraction through
Arrow-batched ``mapInPandas`` — the pattern a 100 TB multimodal
pipeline uses (JVM moves the bytes; Python touches each batch once).

The container has no image/audio libraries, so the actual decoders are
STUBS: ``decode_image``/``decode_audio`` raise NotImplementedError
unless PIL/soundfile import (they don't here), and the production
entry point ``extract_features`` computes deterministic byte-level
features instead — the Spark-side contract (schema, batching,
partitioning) is real and tested either way.

Scale notes: mapInPandas streams Arrow record batches — constant
memory per task regardless of partition size; binary payloads are
never collected to the driver; feature extraction parallelism == scan
parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

from ..sources.tables import ensure_parallelism

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, byte_sum bigint, head_md5 string, "
    "payload_md5 string, modality string, width int, height int, duration_ms int"
)


def with_binary_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    The synthetic corpus has no real media, so the payload is the
    UTF-8 text bytes and the metadata is derived deterministically —
    the column SHAPES (binary + struct<format,width,height,duration>)
    are what downstream multimodal operators program against.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    meta = F.struct(
        modality.alias("modality"),
        (F.col(id_col) % 64 * 16).cast("int").alias("width"),
        (F.col(id_col) % 48 * 16).cast("int").alias("height"),
        ((F.col(id_col) % 30 + 1) * 1000).cast("int").alias("duration_ms"),
    )
    return ensure_parallelism(df).select(
        F.col(id_col), payload.alias("payload"), meta.alias("media_meta")
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Decode an image payload to a pixel array. STUB: the container
    ships no imaging library."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires an imaging library (e.g. Pillow); "
            "not available in this environment"
        ) from e
    raise NotImplementedError("wire Image.open(BytesIO(payload)) here when PIL exists")


def decode_audio(payload: bytes):  # pragma: no cover - stub by design
    """Decode an audio payload to samples. STUB: no audio library."""
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "audio decoding requires soundfile/librosa; not available here"
        ) from e
    raise NotImplementedError("wire soundfile.read(BytesIO(payload)) here")


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched byte-level feature extraction over the payload.

    Deterministic features stand in for the decode->embed step; swap
    the numpy pass for decode_image/decode_audio when the libs exist.

    Everything expressible as a built-in stays JVM-side codegen —
    byte length (``octet_length``), digests (``md5`` over binary and
    over the 16-byte ``substring`` prefix; Spark's substring slices
    byte arrays), and the metadata struct fields. The Python stage is
    exactly one vectorized numpy pass computing ``byte_sum`` (the
    stand-in for real decoding): per-payload sums by differencing a
    cumulative sum over the concatenated bytes — one C-level pass per
    Arrow batch, exact for empty payloads anywhere in the batch
    (``reduceat`` over clamped offsets corrupted the payload before a
    trailing empty one).
    """
    import numpy as np
    import pandas as pd

    pre = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5(F.substring(F.col("payload"), 1, 16)).alias("head_md5"),
        F.md5(F.col("payload")).alias("payload_md5"),
        F.col("media_meta.modality").alias("modality"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
        F.col("media_meta.duration_ms").alias("duration_ms"),
        F.col("payload"),
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            lens = pdf["n_bytes"].to_numpy(dtype="int64")
            flat = np.frombuffer(b"".join(pdf["payload"]), dtype=np.uint8)
            csum = np.concatenate(([0], np.cumsum(flat, dtype=np.int64)))
            ends = np.cumsum(lens)
            sums = csum[ends] - csum[ends - lens]
            out = pdf.drop(columns=["payload"])
            out["byte_sum"] = sums % (1 << 31)
            yield out

    return pre.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    frames_per_doc: int = 4,
    frame_bytes: int = 32,
) -> DataFrame:
    """Frame-sampling fan-out for video rows: one input row -> N frame
    rows, via mapInPandas (the 1->N Arrow contract a real decoder
    uses; a scalar pandas_udf cannot change row count).

    The decode step is STUBBED deterministically — frame i is the
    ``frame_bytes``-byte payload slice starting at
    ``i * len(payload) // frames_per_doc`` (replayable from the
    payload alone; swap in a real keyframe extractor when a video
    library exists — the schema, batch shape, and timestamps are the
    production contract). ``ts_ms`` spaces frames uniformly across the
    duration in ``media_meta``.

    Scale: the Python stage fans out rows but touches only the payload
    and two metadata fields (Arrow-projected); output rows carry small
    frame slices, never the full payload. Partition count is inherited
    — a decoder needing more parallelism repartitions upstream on id.
    """
    import pandas as pd

    # NULL duration would TypeError inside the Arrow worker (int(None))
    # and fail the whole stage — default it to 0 (all frames ts_ms=0)
    # rather than poisoning the batch
    video = df.filter(F.col("media_meta.modality") == "video").select(
        id_col,
        F.col("payload"),
        F.coalesce(F.col("media_meta.duration_ms"), F.lit(0)).alias("__dur"),
    )

    def fan_out(it):
        for pdf in it:
            if not len(pdf):
                continue
            ids, idxs, buf, ts = [], [], [], []
            for did, payload, dur in zip(
                pdf[id_col], pdf["payload"], pdf["__dur"]
            ):
                n = len(payload)
                for i in range(frames_per_doc):
                    start = i * n // frames_per_doc
                    ids.append(did)
                    idxs.append(i)
                    buf.append(bytes(payload[start : start + frame_bytes]))
                    ts.append(i * int(dur) // frames_per_doc)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": buf,
                    "ts_ms": pd.Series(ts, dtype="int64"),
                }
            )

    return video.mapInPandas(
        fan_out,
        schema=f"{id_col} bigint, frame_idx int, frame_bytes binary, ts_ms bigint",
    )

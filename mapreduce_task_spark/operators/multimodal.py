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
    "doc_id bigint, n_bytes bigint, byte_sum bigint, head_md5 string, modality string"
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

    Deterministic features (length, byte sum, md5 of the first 16
    bytes) stand in for the decode->embed step; swap the inner loop
    for decode_image/decode_audio when the libs exist.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            payloads = pdf["payload"]
            # One concatenated uint8 view + np.add.reduceat over payload
            # boundaries: the whole batch's byte sums in a single C-level
            # pass (a per-payload Python sum() loop was ~100x slower and
            # the bench's hottest spot).
            lens = payloads.map(len).to_numpy(dtype="int64")
            if lens.sum():
                flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
                offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
                # trailing empty payloads would index one past the end
                offsets = np.minimum(offsets, len(flat) - 1)
                sums = np.add.reduceat(flat.astype(np.int64), offsets)
                sums[lens == 0] = 0  # reduceat folds the next range into empties
            else:
                sums = np.zeros(len(lens), dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": lens,
                    "byte_sum": sums % (1 << 31),
                    "head_md5": payloads.map(lambda b: hashlib.md5(b[:16]).hexdigest()),
                    "modality": pdf["media_meta"].map(lambda m: m["modality"]),
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)

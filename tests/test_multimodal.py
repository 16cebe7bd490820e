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


def _ppm_p6(w, h, maxval=255):
    """Deterministic P6 image: pixel (x, y, c) = (x*3 + y*7 + c*11) % (maxval+1)."""
    head = f"P6\n# test comment\n{w} {h}\n{maxval}\n".encode()
    px = bytes(
        (x * 3 + y * 7 + c * 11) % (maxval + 1)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    return head + px


def _pgm_p5(w, h):
    head = f"P5 {w} {h} 255 ".encode()
    return head + bytes((x + y * w) % 256 for y in range(h) for x in range(w))


def _wav_pcm16(rate, samples):
    import struct

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_image_pnm_real():
    import numpy as np
    import pytest

    from mapreduce_task_spark.operators.multimodal import decode_image

    arr = decode_image(_ppm_p6(5, 4))
    assert arr.shape == (4, 5, 3)
    assert arr[2, 3, 1] == (3 * 3 + 2 * 7 + 11) % 256
    g = decode_image(_pgm_p5(6, 2))
    assert g.shape == (2, 6) and g[1, 4] == (4 + 6) % 256
    # 16-bit raster is big-endian per spec
    head = b"P5 2 1 65535 " + (1000).to_bytes(2, "big") + (2).to_bytes(2, "big")
    wide = decode_image(head)
    assert list(wide[0]) == [1000, 2]
    # a full-signature PNG with no parseable chunks is structurally
    # malformed (r10: PNG now REALLY decodes, so this is ValueError,
    # not a format gap)
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg soi/app0")


def test_decode_audio_wav_real():
    import pytest

    from mapreduce_task_spark.operators.multimodal import decode_audio

    samples, rate = decode_audio(_wav_pcm16(8000, [0, 100, -200, 32767, -32768]))
    assert rate == 8000
    assert list(samples) == [0, 100, -200, 32767, -32768]
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03rest-of-an-mp3")


def test_decoded_image_stats_mapinpandas(spark):
    """The real decoder inside the Arrow contract: decodable payloads
    get exact integer stats, junk degrades to ok=false rows."""
    from mapreduce_task_spark.operators.multimodal import decoded_image_stats

    payloads = [
        (0, _ppm_p6(5, 4)),
        (1, _pgm_p5(6, 2)),
        (2, b"\x89PNG not a pnm"),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decoded_image_stats(df).collect()}
    import numpy as np

    a0 = np.frombuffer(_ppm_p6(5, 4)[-60:], dtype="u1")
    assert got[0]["ok"] and (got[0]["width"], got[0]["height"], got[0]["channels"]) == (5, 4, 3)
    assert got[0]["px_mean_milli"] == int(a0.sum()) * 1000 // 60
    assert got[1]["ok"] and got[1]["channels"] == 1
    assert not got[2]["ok"] and got[2]["width"] is None


def test_decoded_audio_stats_mapinpandas(spark):
    from mapreduce_task_spark.operators.multimodal import decoded_audio_stats

    wav = _wav_pcm16(16000, [10, -20, 30, -40])
    df = spark.createDataFrame(
        [(0, wav), (1, b"junk")], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r for r in decoded_audio_stats(df).collect()}
    r0 = got[0]
    assert r0["ok"] and r0["sample_rate"] == 16000 and r0["n_frames"] == 4
    assert r0["peak_abs"] == 40
    assert r0["mean_abs_milli"] == (10 + 20 + 30 + 40) * 1000 // 4
    assert not got[1]["ok"]


# --- PNG (r10): spec-faithful encoder used only by the tests ---------------

def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_forward_filter(row, prev, bpp, ft):
    """The spec's FORWARD filter (encoder side) — the decoder must
    invert exactly this."""
    out = bytearray()
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            v = x
        elif ft == 1:
            v = x - a
        elif ft == 2:
            v = x - b
        elif ft == 3:
            v = x - ((a + b) >> 1)
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = x - pred
        out.append(v & 0xFF)
    return bytes(out)


def _make_png(arr, filters=None, depth=8, interlace=0, color_type=None):
    """Encode a numpy uint8 array ((h,w) gray or (h,w,ch)) as a PNG,
    one filter type per scanline (default: cycle 0..4 so every filter
    is exercised)."""
    import struct
    import zlib

    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = arr.reshape(h, w * ch).astype("u1")
    raw = bytearray()
    prev = bytes(w * ch)
    for y in range(h):
        ft = (filters[y] if filters else y % 5)
        row = bytes(flat[y])
        raw.append(ft)
        raw += _png_forward_filter(row, prev, ch, ft)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _px(h, w, ch, seed=7):
    """Deterministic pseudo-random pixels (no RNG dependency)."""
    import numpy as np

    n = h * w * ch
    v = (np.arange(n, dtype="int64") * 2654435761 + seed) % 251
    a = v.astype("u1")
    return a.reshape((h, w)) if ch == 1 else a.reshape((h, w, ch))


def test_decode_png_roundtrip_all_filters_and_channels():
    """Gray / gray+alpha / RGB / RGBA roundtrip with every filter type
    (0..4) appearing on some scanline — decode(encode(px)) == px."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    for ch in (1, 2, 3, 4):
        px = _px(7, 5, ch)
        got = decode_image(_make_png(px))
        assert got.shape == px.shape
        assert np.array_equal(got, px), f"channels={ch}"
    # multi-IDAT stream: split the compressed bytes across two chunks
    import struct
    import zlib

    px = _px(6, 4, 3)
    whole = _make_png(px, filters=[4] * 6)
    # rebuild with the IDAT split in half
    comp = zlib.compress(bytes(_rebuild_raw(px, [4] * 6)))
    ihdr = struct.pack(">IIBBBBB", 4, 6, 8, 2, 0, 0, 0)
    split = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", comp[: len(comp) // 2])
        + _png_chunk(b"IDAT", comp[len(comp) // 2 :])
        + _png_chunk(b"IEND", b"")
    )
    import numpy as np

    assert np.array_equal(decode_image(split), px)
    assert np.array_equal(decode_image(whole), px)


def _rebuild_raw(arr, filters):
    h, w = arr.shape[0], arr.shape[1]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    flat = arr.reshape(h, w * ch).astype("u1")
    raw = bytearray()
    prev = bytes(w * ch)
    for y in range(h):
        row = bytes(flat[y])
        raw.append(filters[y])
        raw += _png_forward_filter(row, prev, ch, filters[y])
        prev = row
    return raw


def test_decode_png_unsupported_variants_degrade():
    """16-bit, palette, and interlaced PNGs are format gaps
    (NotImplementedError -> ok=false rows); truncated or corrupt
    structure is ValueError."""
    import pytest

    from mapreduce_task_spark.operators.multimodal import decode_image

    px = _px(3, 3, 3)
    with pytest.raises(NotImplementedError):
        decode_image(_make_png(px, depth=16))
    with pytest.raises(NotImplementedError):
        decode_image(_make_png(px, color_type=3))
    with pytest.raises(NotImplementedError):
        decode_image(_make_png(px, interlace=1))
    whole = _make_png(px)
    with pytest.raises(ValueError):
        decode_image(whole[:40])  # truncated mid-chunk
    # corrupt deflate bytes inside IDAT must be ValueError (zlib.error
    # would escape decoded_image_stats' degradation catch and kill the
    # task)
    corrupt = bytearray(whole)
    corrupt[len(whole) // 2] ^= 0xFF
    with pytest.raises((ValueError, NotImplementedError)):
        decode_image(bytes(corrupt))
    # raster/IHDR mismatch: lie about the height
    import struct

    bad = bytearray(whole)
    struct.pack_into(">I", bad, 8 + 8 + 4, 99)  # IHDR height field
    with pytest.raises(ValueError):
        decode_image(bytes(bad))


def test_decoded_image_stats_handles_png(spark):
    """The driver-shaped Arrow contract over a mixed corpus: PNG and
    PNM rows decode with exact integer stats, unsupported PNG variants
    and junk degrade to ok=false."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decoded_image_stats

    rgb = _px(4, 6, 3)
    gray = _px(5, 2, 1)
    payloads = [
        (0, _make_png(rgb)),
        (1, _make_png(gray)),
        (2, _make_png(rgb, interlace=1)),
        (3, b"not an image at all"),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decoded_image_stats(df).collect()}
    r0 = got[0]
    assert r0["ok"] and (r0["width"], r0["height"], r0["channels"]) == (6, 4, 3)
    assert r0["px_min"] == int(rgb.min()) and r0["px_max"] == int(rgb.max())
    assert r0["px_mean_milli"] == int(rgb.sum(dtype="int64")) * 1000 // rgb.size
    r1 = got[1]
    assert r1["ok"] and (r1["width"], r1["height"], r1["channels"]) == (2, 5, 1)
    assert not got[2]["ok"] and not got[3]["ok"]


def test_decode_png_roundtrip_property():
    """Hypothesis: ANY 8-bit pixel array under ANY per-scanline filter
    assignment roundtrips bit-exactly through encode -> decode — the
    unfilter inverts the spec's forward filter for every (shape,
    channels, filter-sequence) combination, not just the fixtures."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from mapreduce_task_spark.operators.multimodal import decode_image

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 6),
        w=st.integers(1, 6),
        ch=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
        data=st.data(),
    )
    def roundtrip(h, w, ch, seed, data):
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        px = _px(h, w, ch, seed=seed)
        got = decode_image(_make_png(px, filters=filters))
        assert got.shape == px.shape
        assert np.array_equal(got, px)

    roundtrip()

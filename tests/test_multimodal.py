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
    # r11: baseline JPEG now REALLY decodes, so a truncated SOI/APP0
    # fragment is structural damage (ValueError), not a format gap
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg soi/app0")


def _wav(rate, data, tag, channels, bits, extensible=False):
    """Generic WAV builder: raw ``data`` bytes under any (tag,
    channels, bits) header; extensible=True wraps the real tag inside
    a WAVE_FORMAT_EXTENSIBLE fmt chunk's SubFormat GUID."""
    import struct

    align = channels * bits // 8
    if extensible:
        guid = struct.pack("<H", tag) + b"\x00\x00" + bytes(
            [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
             0x00, 0x38, 0x9B, 0x71]
        )
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, channels, rate, rate * align, align,
            bits, 22, bits, (1 << channels) - 1,
        ) + guid
    else:
        fmt = struct.pack("<HHIIHH", tag, channels, rate, rate * align, align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_audio_wav_real():
    import pytest

    from mapreduce_task_spark.operators.multimodal import decode_audio

    samples, rate = decode_audio(_wav_pcm16(8000, [0, 100, -200, 32767, -32768]))
    assert rate == 8000
    assert list(samples) == [0, 100, -200, 32767, -32768]
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03rest-of-an-mp3")


def test_decode_audio_wav_float_24bit_extensible():
    """r12: IEEE-float WAV (tag 3, f32/f64), 24- and 32-bit integer
    PCM, and WAVE_FORMAT_EXTENSIBLE unwrapping all decode exactly;
    mu-law still degrades."""
    import struct

    import numpy as np
    import pytest

    from mapreduce_task_spark.operators.multimodal import decode_audio

    want = [0.0, 0.5, -0.25, 1.0, -1.0]
    s, rate = decode_audio(
        _wav(44100, struct.pack("<5f", *want), 3, 1, 32)
    )
    assert rate == 44100 and s.dtype == np.dtype("<f4")
    assert list(s) == want
    s, _ = decode_audio(_wav(8000, struct.pack("<3d", 0.1, -0.2, 0.3), 3, 1, 64))
    assert s.dtype == np.dtype("<f8") and list(s) == [0.1, -0.2, 0.3]

    # 24-bit PCM: sign extension across the full range, stereo framing
    vals = [0, 1, -1, 8388607, -8388608, 123456, -654321]
    data = b"".join(
        (v & 0xFFFFFF).to_bytes(3, "little") for v in vals + [7]
    )
    s, _ = decode_audio(_wav(22050, data, 1, 2, 24))
    assert s.shape == (4, 2) and s.dtype == np.dtype("i4")
    assert [int(x) for x in s.flat] == vals + [7]

    # 32-bit PCM
    s, _ = decode_audio(
        _wav(8000, struct.pack("<3i", 2**31 - 1, -(2**31), 42), 1, 1, 32)
    )
    assert [int(x) for x in s] == [2**31 - 1, -(2**31), 42]

    # extensible wrapper around 16-bit PCM and float32
    s, _ = decode_audio(
        _wav(8000, struct.pack("<4h", 1, -2, 3, -4), 1, 2, 16, extensible=True)
    )
    assert s.shape == (2, 2) and [int(x) for x in s.flat] == [1, -2, 3, -4]
    s, _ = decode_audio(
        _wav(8000, struct.pack("<2f", 0.5, -0.5), 3, 1, 32, extensible=True)
    )
    assert list(s) == [0.5, -0.5]

    # ADPCM (tag 2) is a genuine codec gap
    with pytest.raises(NotImplementedError):
        decode_audio(_wav(8000, b"\x00\x01", 2, 1, 4))


def test_decode_audio_g711_companding():
    """G.711 expansion checked against the published table anchors:
    mu-law peaks at +-32124 with TWO zero codes (0x7F/0xFF), A-law
    peaks at +-32256 with quiet codes 0xD5/0x55 -> +-8; both decode
    all 256 codes monotonically within each sign half."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_audio

    allb = bytes(range(256))
    mu, _ = decode_audio(_wav(8000, allb, 7, 1, 8))
    assert mu.dtype == np.dtype("i2")
    assert int(mu.max()) == 32124 and int(mu.min()) == -32124
    assert mu[0xFF] == 0 and mu[0x7F] == 0
    assert len(set(int(x) for x in mu)) == 255  # two zero codes
    # positive codes 0x80..0xFF decode monotonically decreasing
    pos = [int(mu[b]) for b in range(0x80, 0x100)]
    assert all(a > b for a, b in zip(pos, pos[1:]))

    al, _ = decode_audio(_wav(8000, allb, 6, 1, 8))
    assert int(al.max()) == 32256 and int(al.min()) == -32256
    assert al[0xD5] == 8 and al[0x55] == -8
    assert len(set(int(x) for x in al)) == 256
    # extensible wrapper around mu-law too
    mu2, _ = decode_audio(_wav(8000, allb, 7, 1, 8, extensible=True))
    assert np.array_equal(mu2, mu)


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
    import struct

    from mapreduce_task_spark.operators.multimodal import decoded_audio_stats

    wav = _wav_pcm16(16000, [10, -20, 30, -40])
    fwav = _wav(8000, struct.pack("<4f", 0.5, -0.25, 1.0, 0.0), 3, 1, 32)
    df = spark.createDataFrame(
        [(0, wav), (1, b"junk"), (2, fwav)], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r for r in decoded_audio_stats(df).collect()}
    r0 = got[0]
    assert r0["ok"] and r0["sample_rate"] == 16000 and r0["n_frames"] == 4
    assert r0["peak_abs"] == 40
    assert r0["mean_abs_milli"] == (10 + 20 + 30 + 40) * 1000 // 4
    assert not got[1]["ok"]
    # float payload: stats on the int16 grid (r12)
    r2 = got[2]
    assert r2["ok"] and r2["n_frames"] == 4 and r2["peak_abs"] == 32767
    want_sum = round(0.5 * 32767) + round(0.25 * 32767) + 32767
    assert r2["mean_abs_milli"] == want_sum * 1000 // 4


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


def _make_png16(arr, filters=None):
    """Independent encoder for 16-bit PNG: big-endian sample bytes,
    filter bpp = channels*2."""
    import struct
    import zlib

    h, w = arr.shape[0], arr.shape[1]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch * 2
    rowbytes = arr.reshape(h, w * ch).astype(">u2").tobytes()
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = rowbytes[y * stride : (y + 1) * stride]
        ft = filters[y] if filters else y % 5
        raw.append(ft)
        raw += _png_forward_filter(row, prev, ch * 2, ft)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 16, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _make_png_palette(idx, plt, depth, trns=None, filters=None):
    """Independent encoder for paletted PNG: pack indices MSB-first at
    ``depth`` bits per pixel, PLTE from ``plt`` ((n,3) uint8), optional
    tRNS alpha bytes."""
    import struct
    import zlib

    import numpy as np

    h, w = idx.shape
    if depth == 8:
        packed = idx.astype("u1")
    else:
        bits = ((idx[:, :, None] >> np.arange(depth - 1, -1, -1)) & 1).reshape(
            h, w * depth
        )
        pad = (-bits.shape[1]) % 8
        if pad:
            bits = np.concatenate(
                [bits, np.zeros((h, pad), dtype=bits.dtype)], axis=1
            )
        packed = np.packbits(bits.astype("u1"), axis=1)
    stride = packed.shape[1]
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = bytes(packed[y])
        ft = filters[y] if filters else y % 5
        raw.append(ft)
        raw += _png_forward_filter(row, prev, 1, ft)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    out += _png_chunk(b"PLTE", plt.astype("u1").tobytes())
    if trns is not None:
        out += _png_chunk(b"tRNS", bytes(trns))
    return out + _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(
        b"IEND", b""
    )


def test_decode_png_16bit_roundtrip():
    """16-bit gray and RGB roundtrip exactly (every filter type on some
    scanline); samples come back as big-endian uint16."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    for ch in (1, 3):
        n = 7 * 5 * ch
        v = ((np.arange(n, dtype="int64") * 2654435761 + 11) % 60001).astype(
            "u2"
        )
        px = v.reshape((7, 5)) if ch == 1 else v.reshape((7, 5, ch))
        got = decode_image(_make_png16(px))
        assert got.shape == px.shape and got.dtype == np.dtype(">u2")
        assert np.array_equal(got, px), f"channels={ch}"


def test_decode_png_palette_roundtrip_all_depths():
    """Paletted PNG at depths 1/2/4/8 expands through PLTE to exactly
    the encoder's RGB pixels; a tRNS chunk adds the alpha channel
    (entries beyond tRNS default to 255)."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    for depth in (1, 2, 4, 8):
        n_entries = min(2**depth, 19)
        plt = (
            (np.arange(n_entries * 3, dtype="int64") * 97 + depth) % 256
        ).astype("u1").reshape(-1, 3)
        idx = (
            (np.arange(6 * 7, dtype="int64") * 31 + 5) % n_entries
        ).astype("u1").reshape(6, 7)
        got = decode_image(_make_png_palette(idx, plt, depth))
        assert got.shape == (6, 7, 3), depth
        assert np.array_equal(got, plt[idx]), depth
        trns = bytes(range(0, min(n_entries, 3) * 50, 50))  # partial alpha
        got_a = decode_image(_make_png_palette(idx, plt, depth, trns=trns))
        assert got_a.shape == (6, 7, 4), depth
        alpha = np.full(n_entries, 255, dtype="u1")
        alpha[: len(trns)] = np.frombuffer(trns, dtype="u1")
        assert np.array_equal(got_a[..., 3], alpha[idx]), depth
        assert np.array_equal(got_a[..., :3], plt[idx]), depth


def _make_png_adam7(arr, plt=None, filters=None):
    """Independent Adam7 encoder: the seven reduced images, each
    forward-filtered at its own reduced width (filters cycle 0..4
    across pass scanlines). ``arr`` is uint8 (h,w[,ch]) or uint16; with
    ``plt`` the array holds palette indices (depth 8, color type 3)."""
    import struct
    import zlib

    import numpy as np

    h, w = arr.shape[:2]
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    wide = arr.dtype.itemsize == 2
    if plt is not None:
        color_type, depth = 3, 8
    else:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        depth = 16 if wide else 8
    bpp = ch * (2 if wide else 1)
    raw = bytearray()
    fidx = 0
    for x0, y0, dx, dy in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        sub = arr[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        stride = pw * bpp
        rowbytes = sub.reshape(ph, pw * ch).astype(">u2" if wide else "u1").tobytes()
        prev = bytes(stride)
        for y in range(ph):
            ft = filters[fidx % len(filters)] if filters else fidx % 5
            fidx += 1
            row = rowbytes[y * stride : (y + 1) * stride]
            raw.append(ft)
            raw += _png_forward_filter(row, prev, bpp, ft)
            prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, 1)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plt is not None:
        out += _png_chunk(b"PLTE", plt.astype("u1").tobytes())
    return out + _png_chunk(b"IDAT", zlib.compress(bytes(raw))) + _png_chunk(
        b"IEND", b""
    )


def test_decode_png_adam7_roundtrip():
    """Adam7-interlaced PNG roundtrips exactly: gray/RGB/RGBA, odd
    dims that leave some passes empty, 16-bit, and palette."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    for h, w, ch in ((9, 10, 1), (8, 8, 3), (7, 5, 4), (3, 3, 1),
                     (1, 1, 3), (2, 2, 1), (16, 3, 2)):
        px = _px(h, w, ch, seed=h * 31 + w)
        got = decode_image(_make_png_adam7(px))
        assert got.shape == px.shape, (h, w, ch)
        assert np.array_equal(got, px), (h, w, ch)
    # 16-bit gray
    v = ((np.arange(6 * 7, dtype="int64") * 40503 + 3) % 60001).astype("u2")
    px16 = v.reshape(6, 7)
    got16 = decode_image(_make_png_adam7(px16))
    assert got16.dtype == np.dtype(">u2") and np.array_equal(got16, px16)
    # palette
    plt = ((np.arange(12 * 3, dtype="int64") * 89 + 1) % 256).astype("u1").reshape(-1, 3)
    idx = ((np.arange(9 * 9, dtype="int64") * 17 + 2) % 12).astype("u1").reshape(9, 9)
    gotp = decode_image(_make_png_adam7(idx, plt=plt))
    assert gotp.shape == (9, 9, 3) and np.array_equal(gotp, plt[idx])


def test_decode_png_adam7_roundtrip_property():
    """Hypothesis: ANY pixel array under ANY per-scanline filter
    assignment across the seven Adam7 passes roundtrips bit-exactly —
    the pass geometry (reduced widths, empty passes, scatter origins)
    and per-pass filtering hold for arbitrary shapes, not just the
    fixtures."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from mapreduce_task_spark.operators.multimodal import decode_image

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 9),
        w=st.integers(1, 9),
        ch=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
        data=st.data(),
    )
    def roundtrip(h, w, ch, seed, data):
        n_lines = 2 * h + 10  # >= total scanlines across all passes
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=n_lines, max_size=n_lines)
        )
        px = _px(h, w, ch, seed=seed)
        got = decode_image(_make_png_adam7(px, filters=filters))
        assert got.shape == px.shape
        assert np.array_equal(got, px)

    roundtrip()


def test_decode_png_unsupported_variants_degrade():
    """A NON-interlaced raster mislabeled interlaced is structural
    damage (ValueError — Adam7 expects different pass byte counts);
    truncated or corrupt structure is ValueError, including malformed
    palette files."""
    import numpy as np
    import pytest

    from mapreduce_task_spark.operators.multimodal import decode_image

    px = _px(3, 3, 3)
    with pytest.raises(ValueError):
        decode_image(_make_png(px, interlace=1))
    # palette index beyond the PLTE table is structural damage
    plt = np.zeros((4, 3), dtype="u1")
    idx = np.full((3, 3), 9, dtype="u1")
    with pytest.raises(ValueError, match="PLTE"):
        decode_image(_make_png_palette(idx, plt, 8))
    # a palette file with no PLTE at all
    import struct as _struct
    import zlib as _zlib

    ihdr = _struct.pack(">IIBBBBB", 3, 3, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00\x00\x01\x02" for _ in range(3))
    noplte = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        decode_image(noplte)
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


# --------------------------------------------------------------------------
# Baseline JPEG (r11): an INDEPENDENT test-side encoder (forward DCT +
# canonical-Huffman entropy coding, all-ones quant tables so the only
# loss is DCT float rounding) exercises the module's decoder — the
# reverse path is written from the spec, not from this encoder.
# --------------------------------------------------------------------------


def _jpeg_enc_tables():
    """Simple VALID canonical Huffman tables: 12 DC categories at code
    length 4, and EOB/ZRL/every (run, size<=10) at length 8."""
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = bytes(range(12))
    ac_vals = bytes(
        sorted([0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])
    )
    ac_bits = [0] * 7 + [len(ac_vals)] + [0] * 8
    return dc_bits, dc_vals, ac_bits, ac_vals


def _enc_huff_map(bits, vals):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (length, code)
            k += 1
            code += 1
        code <<= 1
    return out


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def align(self):
        while self.nbits:
            self.put(1, 1)  # pad with 1-bits per spec


def _encode_jpeg(px, subsample=False, restart_interval=0):
    """Minimal baseline JFIF encoder. px: (h, w) gray or (h, w, 3) RGB
    uint8. subsample=True uses 4:2:0 (2x2 Y + averaged chroma)."""
    import struct

    import numpy as np

    from mapreduce_task_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _idct_matrix,
    )

    h, w = px.shape[:2]
    gray = px.ndim == 2
    if gray:
        planes = {1: px.astype(np.float64)}
        comps = [(1, 1, 1)]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even dims, then 2x2 mean for chroma
            ye = np.pad(y, ((0, h % 2), (0, w % 2)), mode="edge")
            cbe = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
            cre = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
            cb2 = cbe.reshape(ye.shape[0] // 2, 2, ye.shape[1] // 2, 2).mean((1, 3))
            cr2 = cre.reshape(ye.shape[0] // 2, 2, ye.shape[1] // 2, 2).mean((1, 3))
            planes = {1: y, 2: cb2, 3: cr2}
            comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
        else:
            planes = {1: y, 2: cb, 3: cr}
            comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad every plane to its MCU-aligned size by edge replication
    for cid, ch_, cv in comps:
        p = planes[cid]
        th, tw = mcus_y * cv * 8, mcus_x * ch_ * 8
        planes[cid] = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )

    cmat = _idct_matrix()
    dc_bits, dc_vals, ac_bits, ac_vals = _jpeg_enc_tables()
    dc_map = _enc_huff_map(dc_bits, dc_vals)
    ac_map = _enc_huff_map(ac_bits, ac_vals)

    def emit_block(bw, block, pred):
        coefs = cmat @ (block - 128.0) @ cmat.T  # forward DCT
        zz = [int(round(coefs.flat[_JPEG_ZIGZAG[k]])) for k in range(64)]
        diff = zz[0] - pred
        t = diff.bit_length() if diff else 0
        ln, code = dc_map[t]
        bw.put(code, ln)
        if t:
            bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ln, code = ac_map[0xF0]
                bw.put(code, ln)
                run -= 16
            s = abs(zz[k]).bit_length()
            ln, code = ac_map[(run << 4) | s]
            bw.put(code, ln)
            v = zz[k]
            bw.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            ln, code = ac_map[0x00]
            bw.put(code, ln)
        return zz[0]

    bw = _JpegBitWriter()
    preds = {cid: 0 for cid, *_ in comps}
    entropy_parts = []
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            bw.align()
            entropy_parts.append(bytes(bw.out))
            entropy_parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            bw = _JpegBitWriter()
            preds = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m, mcus_x)
        for cid, ch_, cv in comps:
            for v in range(cv):
                for hh in range(ch_):
                    by, bx = (my * cv + v) * 8, (mx * ch_ + hh) * 8
                    blk = planes[cid][by : by + 8, bx : bx + 8]
                    preds[cid] = emit_block(bw, blk, preds[cid])
    bw.align()
    entropy_parts.append(bytes(bw.out))
    entropy = b"".join(entropy_parts)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT id 0, all ones
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch_, cv in comps:
        sof += bytes([cid, (ch_ << 4) | cv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)  # DC id 0
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)  # AC id 0
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy + b"\xff\xd9"
    return out


def _test_image(h, w, ch, seed=1):
    import numpy as np

    x = seed
    vals = []
    for _ in range(h * w * (ch if ch > 1 else 1)):
        x = (x * 1103515245 + 12345) % (1 << 31)
        vals.append((x >> 7) % 256)
    a = np.array(vals, dtype="u1")
    return a.reshape((h, w)) if ch == 1 else a.reshape((h, w, ch))


# --------------------------------------------------------------------------
# Progressive JPEG (r12): independent test-side SOF2 encoder — spectral
# selection bands and (successive=True) successive approximation with
# correction bits, per spec G.1.2 / libjpeg's emission discipline. The
# module decoder is written from the spec's decode side; agreement of
# the two independent implementations is the roundtrip evidence.
# --------------------------------------------------------------------------


def _jpeg_coef_blocks(px, subsample=False):
    """Quantized (all-ones table) zigzag DCT coefficients per block —
    the shared front half of both encoders. Returns (h, w, comps,
    zzb, mcus_x, mcus_y) with zzb[cid][by][bx] a 64-list."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _idct_matrix,
    )

    h, w = px.shape[:2]
    if px.ndim == 2:
        planes = {1: px.astype(np.float64)}
        comps = [(1, 1, 1)]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ye = np.pad(y, ((0, h % 2), (0, w % 2)), mode="edge")
            cbe = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
            cre = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
            cb2 = cbe.reshape(ye.shape[0] // 2, 2, ye.shape[1] // 2, 2).mean((1, 3))
            cr2 = cre.reshape(ye.shape[0] // 2, 2, ye.shape[1] // 2, 2).mean((1, 3))
            planes = {1: y, 2: cb2, 3: cr2}
            comps = [(1, 2, 2), (2, 1, 1), (3, 1, 1)]
        else:
            planes = {1: y, 2: cb, 3: cr}
            comps = [(1, 1, 1), (2, 1, 1), (3, 1, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    cmat = _idct_matrix()
    zzb = {}
    for cid, ch_, cv in comps:
        p = planes[cid]
        th, tw = mcus_y * cv * 8, mcus_x * ch_ * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        grid = []
        for by in range(th // 8):
            row = []
            for bx in range(tw // 8):
                blk = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coefs = cmat @ (blk - 128.0) @ cmat.T
                row.append(
                    [int(round(coefs.flat[_JPEG_ZIGZAG[k]])) for k in range(64)]
                )
            grid.append(row)
        zzb[cid] = grid
    return h, w, comps, zzb, mcus_x, mcus_y


def _encode_jpeg_progressive(
    px, subsample=False, restart_interval=0, successive=False,
    bands=((1, 5), (6, 63)),
):
    """SOF2 encoder. successive=False: DC scan + spectral-selection AC
    band scans, all at Ah=Al=0. successive=True: DC first at Al=1 +
    AC band firsts at Al=1, then the DC and AC refinement scans
    (Ah=1, Al=0) with correction bits. Restart markers (if any) apply
    to every scan — MCU units for the interleaved DC scan, block units
    for AC scans."""
    import struct

    h, w, comps, zzb, mcus_x, mcus_y = _jpeg_coef_blocks(px, subsample)
    dc_bits, dc_vals, ac_bits, ac_vals = _jpeg_enc_tables()
    dc_map = _enc_huff_map(dc_bits, dc_vals)
    ac_map = _enc_huff_map(ac_bits, ac_vals)
    factors = {cid: (ch_, cv) for cid, ch_, cv in comps}
    # actual (non-padded) block dims per component for AC scans
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    bdims = {
        cid: (
            -(-(-(-h * cv // vmax)) // 8),
            -(-(-(-w * ch_ // hmax)) // 8),
        )
        for cid, ch_, cv in comps
    }

    def entropy(units, emit_unit, reset):
        """Run emit_unit over units with restart markers every
        restart_interval units; returns the entropy bytes."""
        bw = _JpegBitWriter()
        parts = []
        rst = 0
        reset()
        for u, unit in enumerate(units):
            if restart_interval and u and u % restart_interval == 0:
                bw.align()
                parts.append(bytes(bw.out))
                parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                bw = _JpegBitWriter()
                reset()
            emit_unit(bw, unit)
        bw.align()
        parts.append(bytes(bw.out))
        return b"".join(parts)

    def put_sym(bw, m, sym):
        ln, code = m[sym]
        bw.put(code, ln)

    preds = {}

    def dc_first_scan(al):
        def reset():
            preds.clear()
            preds.update({cid: 0 for cid, *_ in comps})

        def emit(bw, m):
            my, mx = divmod(m, mcus_x)
            for cid, ch_, cv in comps:
                for v in range(cv):
                    for hh in range(ch_):
                        dc = zzb[cid][my * cv + v][mx * ch_ + hh][0] >> al
                        diff = dc - preds[cid]
                        preds[cid] = dc
                        t = abs(diff).bit_length()
                        put_sym(bw, dc_map, t)
                        if t:
                            bw.put(
                                diff if diff > 0 else diff + (1 << t) - 1, t
                            )

        return entropy(list(range(mcus_x * mcus_y)), emit, reset)

    def dc_refine_scan(al):
        def emit(bw, m):
            my, mx = divmod(m, mcus_x)
            for cid, ch_, cv in comps:
                for v in range(cv):
                    for hh in range(ch_):
                        bw.put((zzb[cid][my * cv + v][mx * ch_ + hh][0] >> al) & 1, 1)

        return entropy(list(range(mcus_x * mcus_y)), emit, lambda: None)

    def ac_first_scan(cid, lo, hi, al):
        bh, bw_ = bdims[cid]

        def emit(bw, blk):
            by, bx = blk
            v = zzb[cid][by][bx]
            r = 0
            for k in range(lo, hi + 1):
                t = abs(v[k]) >> al
                if t == 0:
                    r += 1
                    continue
                while r > 15:
                    put_sym(bw, ac_map, 0xF0)
                    r -= 16
                s = t.bit_length()
                put_sym(bw, ac_map, (r << 4) | s)
                sv = t if v[k] > 0 else -t
                bw.put(sv if sv > 0 else sv + (1 << s) - 1, s)
                r = 0
            if r > 0:
                put_sym(bw, ac_map, 0x00)  # EOB0

        units = [(by, bx) for by in range(bh) for bx in range(bw_)]
        return entropy(units, emit, lambda: None)

    def ac_refine_scan(cid, lo, hi, al):
        bh, bw_ = bdims[cid]

        def emit(bw, blk):
            by, bx = blk
            v = zzb[cid][by][bx]
            absv = [abs(x) >> al for x in v]
            eobpos = max(
                (k for k in range(lo, hi + 1) if absv[k] == 1), default=-1
            )
            r = 0
            pending = []
            for k in range(lo, hi + 1):
                t = absv[k]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eobpos:
                    put_sym(bw, ac_map, 0xF0)
                    r -= 16
                    for bit in pending:
                        bw.put(bit, 1)
                    pending = []
                if t > 1:  # nonzero history: one correction bit
                    pending.append(t & 1)
                    continue
                put_sym(bw, ac_map, (r << 4) | 1)
                bw.put(1 if v[k] > 0 else 0, 1)
                for bit in pending:
                    bw.put(bit, 1)
                pending = []
                r = 0
            if r > 0 or pending:
                put_sym(bw, ac_map, 0x00)  # EOB0 covers this block's tail
                for bit in pending:
                    bw.put(bit, 1)

        units = [(by, bx) for by in range(bh) for bx in range(bw_)]
        return entropy(units, emit, lambda: None)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def sos(scan_comps, ss, se, ah, al, data):
        body = bytes([len(scan_comps)])
        for cid in scan_comps:
            body += bytes([cid, 0x00])  # DC table 0 / AC table 0
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body) + data

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, ch_, cv in comps:
        sof += bytes([cid, (ch_ << 4) | cv, 0])
    out += seg(0xC2, sof)  # SOF2: progressive
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    al0 = 1 if successive else 0
    all_cids = [cid for cid, *_ in comps]
    out += sos(all_cids, 0, 0, 0, al0, dc_first_scan(al0))
    for cid in all_cids:
        for lo, hi in bands:
            out += sos([cid], lo, hi, 0, al0, ac_first_scan(cid, lo, hi, al0))
    if successive:
        out += sos(all_cids, 0, 0, 1, 0, dc_refine_scan(0))
        for cid in all_cids:
            for lo, hi in bands:
                out += sos([cid], lo, hi, 1, 0, ac_refine_scan(cid, lo, hi, 0))
    return out + b"\xff\xd9"


def test_decode_jpeg_progressive_spectral_matches_baseline():
    """Spectral-selection progressive (DC scan + AC band scans, Ah=Al=0)
    carries the SAME coefficients as the baseline encoding — the decoded
    images must be bit-identical, for gray, 4:4:4 color, 4:2:0, and with
    restart markers in every scan."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    cases = [
        (_test_image(13, 21, 1, seed=2), {}),
        (_test_image(11, 18, 3, seed=7), {}),
        (_test_image(20, 25, 3, seed=9), {"subsample": True}),
        (_test_image(24, 17, 1, seed=4), {"restart_interval": 2}),
    ]
    for px, kw in cases:
        want = decode_image(_encode_jpeg(px, **kw))
        got = decode_image(_encode_jpeg_progressive(px, **kw))
        assert got.shape == want.shape, kw
        assert np.array_equal(got, want), kw
        if not kw.get("subsample"):
            # closeness to source (4:2:0 noise chroma legitimately
            # averages away — equality with baseline covers that case)
            assert int(np.abs(got.astype(int) - px.astype(int)).max()) <= 3, kw


def test_decode_jpeg_progressive_successive_approximation():
    """Successive approximation (DC/AC firsts at Al=1, then refinement
    scans with correction bits at Ah=1, Al=0) reconstructs the full
    coefficients — decode equals the baseline decode bit-for-bit,
    including 4:2:0, multi-band splits, and restart markers."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    cases = [
        (_test_image(13, 21, 1, seed=3), {}),
        (_test_image(11, 18, 3, seed=8), {}),
        (_test_image(20, 25, 3, seed=5), {"subsample": True}),
        (_test_image(16, 16, 1, seed=6), {"restart_interval": 3}),
        (
            _test_image(9, 30, 1, seed=12),
            {"bands": ((1, 2), (3, 20), (21, 63))},
        ),
    ]
    for px, kw in cases:
        want = decode_image(_encode_jpeg(px, **{k: v for k, v in kw.items() if k != "bands"}))
        got = decode_image(_encode_jpeg_progressive(px, successive=True, **kw))
        assert got.shape == want.shape, kw
        assert np.array_equal(got, want), kw

    # trailing bytes after EOI are common padding — the marker walk
    # must stop at EOI, not read the padding as markers
    px = _test_image(9, 9, 1, seed=1)
    prog = _encode_jpeg_progressive(px, successive=True)
    want = decode_image(prog)
    assert np.array_equal(decode_image(prog + b"\x00paddingbytes"), want)
    assert np.array_equal(decode_image(_encode_jpeg(px) + b"\x01junk"),
                          decode_image(_encode_jpeg(px)))


def test_decode_jpeg_roundtrip_grayscale():
    """decode(encode(px)) within DCT float-rounding tolerance, exact
    dims, non-multiple-of-8 sizes included."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    for (h, w) in ((8, 8), (13, 21)):
        px = _test_image(h, w, 1, seed=h * 100 + w)
        got = decode_image(_encode_jpeg(px))
        assert got.shape == (h, w) and got.dtype == np.uint8
        assert int(np.abs(got.astype(int) - px.astype(int)).max()) <= 1


def test_decode_jpeg_roundtrip_color_444():
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    px = _test_image(11, 18, 3, seed=7)
    got = decode_image(_encode_jpeg(px))
    assert got.shape == (11, 18, 3) and got.dtype == np.uint8
    # YCbCr roundtrip + DCT rounding: small but not zero
    assert int(np.abs(got.astype(int) - px.astype(int)).max()) <= 3


def test_decode_jpeg_420_subsampling_and_restarts():
    """2x2-subsampled chroma with a constant-color image decodes back
    exactly (flat blocks are DC-only, quant 1); restart markers reset
    DC predictors and must not disturb the result."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    px = np.zeros((20, 25, 3), dtype="u1")
    px[..., 0], px[..., 1], px[..., 2] = 180, 90, 40
    for ri in (0, 1, 2):
        got = decode_image(_encode_jpeg(px, subsample=True, restart_interval=ri))
        assert got.shape == (20, 25, 3)
        assert int(np.abs(got.astype(int) - px.astype(int)).max()) <= 2, ri

    # gradient + 4:2:0: chroma is smooth so the 2x2 averaging loss is
    # bounded; Y carries the detail at full resolution
    grad = np.empty((16, 16, 3), dtype="u1")
    for yy in range(16):
        for xx in range(16):
            grad[yy, xx] = (yy * 16, 128, xx * 16)
    got = decode_image(_encode_jpeg(grad, subsample=True))
    assert int(np.abs(got.astype(int) - grad.astype(int)).max()) <= 14


def test_decode_jpeg_unsupported_and_corrupt_degrade():
    import pytest as _pytest

    from mapreduce_task_spark.operators.multimodal import decode_image

    px = _test_image(8, 8, 1)
    good = _encode_jpeg(px)
    # arithmetic-coded: flip SOF0 (0xC0) to SOF9 (0xC9)
    arith = good.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with _pytest.raises(NotImplementedError):
        decode_image(arith)
    # a baseline stream mislabeled SOF2: the full-band SOS (Ss=0,
    # Se=63) is not a legal progressive DC scan — structural damage
    mislabel = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with _pytest.raises(ValueError):
        decode_image(mislabel)
    # truncated entropy stream
    with _pytest.raises(ValueError):
        decode_image(good[: len(good) - (len(good) - good.find(b"\xff\xda")) // 2])
    # bad marker alignment
    with _pytest.raises(ValueError):
        decode_image(b"\xff\xd8\x00\x00\x00\x00")


def test_decode_jpeg_standalone_markers_skipped():
    """Length-less markers (TEM 0x01, RSTn) appearing in the header
    walk carry no size field — the walker must skip them instead of
    misreading the following bytes as a segment length (r11 ADVICE)."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    px = _test_image(8, 8, 1, seed=5)
    good = _encode_jpeg(px)
    want = decode_image(good)
    # inject a TEM marker right after SOI, before any sized segment
    tem = good[:2] + b"\xff\x01" + good[2:]
    assert np.array_equal(decode_image(tem), want)


def test_decoded_image_stats_handles_jpeg(spark):
    """The mapInPandas stats operator over a mixed batch: baseline AND
    real progressive JPEGs decode (ok=true with exact dims); a baseline
    stream mislabeled SOF2 and a truncated one degrade to ok=false."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decoded_image_stats

    g = _test_image(10, 12, 1, seed=3)
    c = _test_image(9, 8, 3, seed=4)
    good_g = _encode_jpeg(g)
    good_c = _encode_jpeg(c, subsample=True)
    mislabel = good_g.replace(b"\xff\xc0", b"\xff\xc2", 1)
    corrupt = good_c[:40]
    prog = _encode_jpeg_progressive(c, successive=True)
    rows = [
        Row(doc_id=1, payload=bytearray(good_g)),
        Row(doc_id=2, payload=bytearray(good_c)),
        Row(doc_id=3, payload=bytearray(mislabel)),
        Row(doc_id=4, payload=bytearray(corrupt)),
        Row(doc_id=5, payload=bytearray(prog)),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r for r in decoded_image_stats(df).collect()}
    assert got[1]["ok"] and (got[1]["width"], got[1]["height"], got[1]["channels"]) == (12, 10, 1)
    assert got[2]["ok"] and (got[2]["width"], got[2]["height"], got[2]["channels"]) == (8, 9, 3)
    exp_mean = int(np.int64(g.astype("int64").sum()) * 1000 // g.size)
    assert abs(got[1]["px_mean_milli"] - exp_mean) <= 1000  # ±1 pixel-unit
    assert not got[3]["ok"] and not got[4]["ok"]
    assert got[5]["ok"] and (got[5]["width"], got[5]["height"], got[5]["channels"]) == (8, 9, 3)


# --- GIF (r13): independent test-side encoder — real LZW compressor,
# interlace, local color tables, transparency, multi-frame -------------------


def _gif_lzw_encode(seq: bytes, mcs: int) -> bytes:
    """Independent LZW compressor (dictionary growth, KwKwK-capable):
    emits raw codes first, then assigns each code the width the
    DECODER's table-size rule implies at that read — the spec's
    synchronization restated from the reader's side, so an encoder bug
    here cannot silently mirror a decoder bug there."""
    clear = 1 << mcs
    end = clear + 1
    emitted = [clear]
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    prev = b""
    for ch in seq:
        nxt = prev + bytes([ch])
        if nxt in table:
            prev = nxt
            continue
        emitted.append(table[prev])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
        else:
            emitted.append(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
        prev = bytes([ch])
    if prev:
        emitted.append(table[prev])
    emitted.append(end)
    # width assignment by decoder simulation
    buf = bytearray()
    acc = nbits = 0
    width = mcs + 1
    dec_len = clear + 2
    first = True
    for code in emitted:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            width, dec_len, first = mcs + 1, clear + 2, True
        elif code != end:
            if first:
                first = False
            elif dec_len < 4096:
                dec_len += 1
            if dec_len == (1 << width) and width < 12:
                width += 1
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _make_gif(
    idx,
    palette,
    interlace=False,
    transparent=None,
    local_ct=False,
    extra_frame=False,
):
    """Minimal-but-real GIF89a writer over an (h, w) uint8 index array
    and an (n, 3) palette."""
    import numpy as np

    h, w = idx.shape
    f = max(1, (len(palette) - 1).bit_length() - 1)
    npal = 2 << f
    pal = np.zeros((npal, 3), dtype="u1")
    pal[: len(palette)] = palette
    mcs = max(2, f + 1)
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    if local_ct:
        out += bytes([0x70, 0, 0])  # no global table
    else:
        out += bytes([0xF0 | f, 0, 0]) + pal.tobytes()
    if transparent is not None:
        out += b"\x21\xf9\x04" + bytes([1, 0, 0, transparent]) + b"\x00"
    # a plain-text extension the decoder must skip
    out += b"\x21\x01" + bytes([3]) + b"abc" + b"\x00"

    def frame(body_idx):
        fr = bytearray(b"\x2c")
        fr += (0).to_bytes(2, "little") * 2
        fr += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        fr += bytes([(0x80 | f if local_ct else 0) | (0x40 if interlace else 0)])
        if local_ct:
            fr += pal.tobytes()
        rows = body_idx
        if interlace:
            order = [
                r for start, step in _GIF_PASSES for r in range(start, h, step)
            ]
            rows = body_idx[np.asarray(order)]
        data = _gif_lzw_encode(rows.tobytes(), mcs)
        fr += bytes([mcs])
        for i in range(0, len(data), 255):
            blk = data[i : i + 255]
            fr += bytes([len(blk)]) + blk
        fr += b"\x00"
        return fr

    out += frame(idx)
    if extra_frame:
        out += frame((idx ^ 1) & (npal - 1))
    out += b"\x3b"
    return bytes(out)


def _gif_fixture(h, w, npal, seed):
    import numpy as np

    rng = np.random.RandomState(seed)
    idx = rng.randint(0, npal, size=(h, w)).astype("u1")
    palette = rng.randint(0, 256, size=(npal, 3)).astype("u1")
    return idx, palette


def test_decode_gif_roundtrip():
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    idx, palette = _gif_fixture(13, 17, 200, seed=3)
    got = decode_image(_make_gif(idx, palette))
    assert got.shape == (13, 17, 3)
    assert np.array_equal(got, palette[idx])


def test_decode_gif_lzw_dictionary_growth_stress():
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    # 96x97 structured-plus-noise image: thousands of dictionary
    # entries, multiple width increases (code width reaches 12 bits)
    rng = np.random.RandomState(11)
    grad = (np.add.outer(np.arange(96), np.arange(97)) % 251).astype("u1")
    noise = rng.randint(0, 5, size=grad.shape).astype("u1")
    idx = ((grad + noise) % 251).astype("u1")
    palette = rng.randint(0, 256, size=(251, 3)).astype("u1")
    got = decode_image(_make_gif(idx, palette))
    assert np.array_equal(got, palette[idx])


def test_decode_gif_interlaced_roundtrip():
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    idx, palette = _gif_fixture(11, 7, 16, seed=5)
    got = decode_image(_make_gif(idx, palette, interlace=True))
    assert np.array_equal(got, palette[idx])


def test_decode_gif_transparency_rgba():
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    idx, palette = _gif_fixture(6, 6, 8, seed=7)
    got = decode_image(_make_gif(idx, palette, transparent=3))
    assert got.shape == (6, 6, 4)
    assert np.array_equal(got[:, :, :3], palette[idx])
    assert np.array_equal(got[:, :, 3] == 0, idx == 3)


def test_decode_gif_local_color_table_preferred():
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    idx, palette = _gif_fixture(5, 9, 32, seed=9)
    got = decode_image(_make_gif(idx, palette, local_ct=True))
    assert np.array_equal(got, palette[idx])


def test_decode_gif_animated_returns_first_frame():
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    idx, palette = _gif_fixture(8, 8, 64, seed=13)
    got = decode_image(_make_gif(idx, palette, extra_frame=True))
    assert np.array_equal(got, palette[idx])


def test_decode_gif_malformed_degrades():
    import pytest

    from mapreduce_task_spark.operators.multimodal import decode_image

    idx, palette = _gif_fixture(6, 6, 8, seed=1)
    good = _make_gif(idx, palette)
    for bad in (
        good[:10],                        # truncated header/table
        good[:-8],                        # truncated image data
        good.replace(b"\x2c", b"\x7e", 1),  # bad block introducer
        b"GIF89a" + good[6:10],           # truncated screen descriptor
    ):
        with pytest.raises(ValueError):
            decode_image(bad)


# --- BMP (r13): independent test-side encoder -------------------------------


def _make_bmp(
    arr=None,
    idx=None,
    palette=None,
    bpp=24,
    top_down=False,
    rle=False,
    compression=None,
):
    import struct

    import numpy as np

    if arr is not None:
        h, w = arr.shape[:2]
    else:
        h, w = idx.shape
    if rle:
        comp = 1 if bpp == 8 else 2
        body = bytearray()
        for r in range(h):
            row = idx[h - 1 - r]  # RLE streams run bottom-up
            x = 0
            while x < w:
                run = 1
                while x + run < w and row[x + run] == row[x] and run < 255:
                    run += 1
                if bpp == 8:
                    body += bytes([run, int(row[x])])
                else:
                    v = (int(row[x]) << 4) | int(row[x])
                    body += bytes([run, v])
                x += run
            body += b"\x00\x00"
        body += b"\x00\x01"
        raster = bytes(body)
    else:
        comp = compression if compression is not None else 0
        stride = ((w * bpp + 31) // 32) * 4
        rows = []
        for r in range(h):
            y = r if top_down else h - 1 - r
            if bpp == 24:
                line = arr[y][:, ::-1].tobytes()  # RGB -> BGR
            elif bpp == 32:
                line = arr[y][:, [2, 1, 0, 3]].tobytes()
            elif bpp == 8:
                line = idx[y].tobytes()
            elif bpp == 4:
                padded = np.zeros(((w + 1) // 2) * 2, dtype="u1")
                padded[:w] = idx[y]
                line = ((padded[0::2] << 4) | padded[1::2]).tobytes()
            else:  # 1-bit
                line = np.packbits(idx[y]).tobytes()
            rows.append(line + b"\x00" * (stride - len(line)))
        raster = b"".join(rows)
    pal_bytes = b""
    n_colors = 0
    if palette is not None:
        n_colors = len(palette)
        pal = np.zeros((n_colors, 4), dtype="u1")
        pal[:, :3] = palette[:, ::-1]  # RGB -> BGRX
        pal_bytes = pal.tobytes()
    data_off = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        bpp,
        comp,
        len(raster),
        2835,
        2835,
        n_colors,
        0,
    )
    hdr = struct.pack("<2sIHHI", b"BM", data_off + len(raster), 0, 0, data_off)
    return hdr + info + pal_bytes + raster


def test_decode_bmp_24_and_32_bit():
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(2)
    rgb = rng.randint(0, 256, size=(7, 5, 3)).astype("u1")
    assert np.array_equal(decode_image(_make_bmp(arr=rgb, bpp=24)), rgb)
    assert np.array_equal(
        decode_image(_make_bmp(arr=rgb, bpp=24, top_down=True)), rgb
    )
    rgba = rng.randint(0, 256, size=(4, 9, 4)).astype("u1")
    rgba[0, 0, 3] = 1  # ensure the 4th channel is actually used
    assert np.array_equal(decode_image(_make_bmp(arr=rgba, bpp=32)), rgba)
    # BI_RGB 32-bit with an all-zero reserved byte is OPAQUE RGB, not
    # a fully-transparent RGBA (the 4th byte is reserved per the spec)
    rgbx = rgba.copy()
    rgbx[:, :, 3] = 0
    got = decode_image(_make_bmp(arr=rgbx, bpp=32))
    assert got.shape == (4, 9, 3)
    assert np.array_equal(got, rgbx[:, :, :3])


def test_decode_bmp_paletted_depths():
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(4)
    for bpp, ncol in ((8, 200), (4, 16), (1, 2)):
        idx = rng.randint(0, ncol, size=(6, 11)).astype("u1")
        palette = rng.randint(0, 256, size=(ncol, 3)).astype("u1")
        got = decode_image(_make_bmp(idx=idx, palette=palette, bpp=bpp))
        assert np.array_equal(got, palette[idx]), f"bpp={bpp}"


def test_decode_bmp_rle8_and_rle4():
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(6)
    # runs of varying length, exercised through the run encoder
    base = np.repeat(rng.randint(0, 9, size=60), rng.randint(1, 7, size=60))
    assert base.size >= 13 * 8
    idx = base[: 13 * 8].reshape(13, 8).astype("u1")
    palette = rng.randint(0, 256, size=(16, 3)).astype("u1")
    got8 = decode_image(_make_bmp(idx=idx, palette=palette, bpp=8, rle=True))
    assert np.array_equal(got8, palette[idx])
    got4 = decode_image(_make_bmp(idx=idx, palette=palette, bpp=4, rle=True))
    assert np.array_equal(got4, palette[idx])


def test_decode_bmp_rle8_absolute_and_delta():
    """Hand-crafted stream: encoded run, absolute run (odd length ->
    word padding), delta move, early end-of-bitmap; unnamed pixels are
    index 0."""
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    palette = np.arange(30, dtype="u1").reshape(10, 3)
    stream = bytes(
        [3, 5]            # run: 3 pixels of 5 at (0, x0..2) bottom row
        + [0, 3, 7, 8, 9, 0]  # absolute: 3 pixels 7,8,9 (+pad byte)
        + [0, 0]          # end of line
        + [0, 2, 1, 1]    # delta: x+=1, y+=1 -> row 2, x 1
        + [2, 4]          # run: 2 pixels of 4
        + [0, 1]          # end of bitmap
    )
    import struct

    data_off = 14 + 40 + 40
    pal = np.zeros((10, 4), dtype="u1")
    pal[:, :3] = palette[:, ::-1]
    info = struct.pack(
        "<IiiHHIIiiII", 40, 6, 4, 1, 8, 1, len(stream), 0, 0, 10, 0
    )
    hdr = struct.pack(
        "<2sIHHI", b"BM", data_off + len(stream), 0, 0, data_off
    )
    got = decode_image(hdr + info + pal.tobytes() + stream)
    want_idx = np.zeros((4, 6), dtype="u1")
    want_idx[3, 0:3] = 5
    want_idx[3, 3:6] = (7, 8, 9)
    want_idx[1, 1:3] = 4   # after EOL (y=1) + delta (y=2) from the bottom
    assert np.array_equal(got, palette[want_idx])


def test_decode_bmp_unsupported_and_malformed():
    import numpy as np
    import pytest

    from mapreduce_task_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(8)
    rgb = rng.randint(0, 256, size=(3, 3, 3)).astype("u1")
    good = _make_bmp(arr=rgb, bpp=24)
    with pytest.raises(ValueError):
        decode_image(good[: 14 + 40 + 4])  # truncated raster
    with pytest.raises(ValueError):
        decode_image(b"BM" + good[2:20])  # truncated header
    with pytest.raises(NotImplementedError):
        decode_image(_make_bmp(arr=rgb, bpp=24, compression=3))  # bitfields
    # 16 bpp needs masks
    import struct

    info16 = struct.pack(
        "<IiiHHIIiiII", 40, 3, 3, 1, 16, 0, 0, 0, 0, 0, 0
    )
    hdr16 = struct.pack("<2sIHHI", b"BM", 14 + 40 + 24, 0, 0, 14 + 40)
    with pytest.raises(NotImplementedError):
        decode_image(hdr16 + info16 + b"\x00" * 24)


def test_decoded_image_stats_handles_gif_and_bmp(spark):
    import numpy as np
    from pyspark.sql import Row

    from mapreduce_task_spark.operators.multimodal import decoded_image_stats

    idx, palette = _gif_fixture(9, 6, 50, seed=21)
    gif = _make_gif(idx, palette)
    rng = np.random.RandomState(22)
    rgb = rng.randint(0, 256, size=(5, 8, 3)).astype("u1")
    bmp = _make_bmp(arr=rgb, bpp=24)
    rows = [
        Row(doc_id=1, payload=bytearray(gif)),
        Row(doc_id=2, payload=bytearray(bmp)),
        Row(doc_id=3, payload=bytearray(gif[:-6])),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r for r in decoded_image_stats(df).collect()}
    assert got[1]["ok"] and (got[1]["width"], got[1]["height"], got[1]["channels"]) == (6, 9, 3)
    exp = palette[idx]
    assert got[1]["px_mean_milli"] == int(exp.astype("int64").sum()) * 1000 // exp.size
    assert got[2]["ok"] and (got[2]["width"], got[2]["height"], got[2]["channels"]) == (8, 5, 3)
    assert got[2]["px_mean_milli"] == int(rgb.astype("int64").sum()) * 1000 // rgb.size
    assert not got[3]["ok"]


# --- TIFF (r13): independent test-side writer -------------------------------


def _packbits_encode(data: bytes) -> bytes:
    """Independent PackBits compressor: repeat runs >= 3 become
    (257-len, byte); literals chunk at 128."""
    out = bytearray()
    i, n = 0, len(data)
    lit = bytearray()

    def flush():
        j = 0
        while j < len(lit):
            chunk = lit[j : j + 128]
            out.append(len(chunk) - 1)
            out.extend(chunk)
            j += 128
        lit.clear()

    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            flush()
            out.append(257 - run)
            out.append(data[i])
            i += run
        else:
            lit += data[i : i + run]
            i += run
    flush()
    return bytes(out)


def _make_tiff(
    arr, big_endian=False, rows_per_strip=None, packbits=False
):
    import struct

    import numpy as np

    bo = ">" if big_endian else "<"
    h, w = arr.shape[:2]
    spp = 1 if arr.ndim == 2 else arr.shape[2]
    depth = 16 if arr.dtype.itemsize == 2 else 8
    rps = rows_per_strip or h
    data = arr.astype(bo + "u2") if depth == 16 else arr.astype("u1")
    strips = []
    for y0 in range(0, h, rps):
        raw = data[y0 : y0 + rps].tobytes()
        strips.append(_packbits_encode(raw) if packbits else raw)

    entries = []  # (tag, type, count, value_or_bytes)
    extra = bytearray()
    header_size = 8

    def add(tag, typ, vals):
        entries.append((tag, typ, vals))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [depth] * spp)
    add(259, 3, [32773 if packbits else 1])
    add(262, 3, [2 if spp >= 3 else 1])
    add(277, 3, [spp])
    add(278, 4, [rps])
    # strip offsets/counts patched after layout
    add(273, 4, [0] * len(strips))
    add(279, 4, [len(s_) for s_ in strips])
    entries.sort()
    n = len(entries)
    ifd_off = header_size
    data_off = ifd_off + 2 + n * 12 + 4
    sz = {3: 2, 4: 4}
    fmt = {3: "H", 4: "I"}
    # lay out overflow values then strips
    blobs = []
    pos = data_off
    for tag, typ, vals in entries:
        total = sz[typ] * len(vals)
        if total > 4:
            blobs.append((tag, pos))
            pos += total
    strip_offsets = []
    for s_ in strips:
        strip_offsets.append(pos)
        pos += len(s_)
    out = bytearray()
    out += (b"II*\x00" if not big_endian else b"MM\x00*")
    out += struct.pack(bo + "I", ifd_off)
    out += struct.pack(bo + "H", n)
    blob_pos = dict(blobs)
    for tag, typ, vals in entries:
        if tag == 273:
            vals = strip_offsets
        total = sz[typ] * len(vals)
        out += struct.pack(bo + "HHI", tag, typ, len(vals))
        if total <= 4:
            packed = struct.pack(bo + fmt[typ] * len(vals), *vals)
            out += packed + b"\x00" * (4 - total)
        else:
            out += struct.pack(bo + "I", blob_pos[tag])
    out += struct.pack(bo + "I", 0)  # next-IFD pointer
    for tag, typ, vals in entries:
        if tag == 273:
            vals = strip_offsets
        total = sz[typ] * len(vals)
        if total > 4:
            out += struct.pack(bo + fmt[typ] * len(vals), *vals)
    for s_ in strips:
        out += s_
    return bytes(out)


def test_decode_tiff_roundtrip_forms():
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(31)
    gray = rng.randint(0, 256, size=(9, 7)).astype("u1")
    rgb = rng.randint(0, 256, size=(6, 5, 3)).astype("u1")
    rgba = rng.randint(0, 256, size=(4, 4, 4)).astype("u1")
    g16 = rng.randint(0, 65536, size=(5, 6)).astype("u2")
    for arr in (gray, rgb, rgba):
        for be in (False, True):
            got = decode_image(_make_tiff(arr, big_endian=be))
            assert np.array_equal(got, arr), f"be={be} shape={arr.shape}"
    got16 = decode_image(_make_tiff(g16, big_endian=True))
    assert np.array_equal(got16.astype("u2"), g16)


def test_decode_tiff_multi_strip_and_packbits():
    import numpy as np

    from mapreduce_task_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(33)
    # runs + noise exercise both PackBits modes across strip boundaries
    base = np.repeat(rng.randint(0, 5, size=120), rng.randint(1, 9, size=120))
    rgb = base[: 13 * 6 * 3].reshape(13, 6, 3).astype("u1")
    for pb in (False, True):
        got = decode_image(_make_tiff(rgb, rows_per_strip=4, packbits=pb))
        assert np.array_equal(got, rgb), f"packbits={pb}"


def test_decode_tiff_malformed_and_unsupported():
    import numpy as np
    import pytest

    from mapreduce_task_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(35)
    arr = rng.randint(0, 256, size=(5, 5)).astype("u1")
    good = _make_tiff(arr)
    with pytest.raises(ValueError):
        decode_image(good[:-8])  # truncated strip
    with pytest.raises(ValueError):
        decode_image(good[:6])  # truncated header
    lzw = bytearray(good)
    # compression tag (259) value -> 5 (LZW): format gap, not damage
    import struct

    n = struct.unpack_from("<H", lzw, 8)[0]
    for k in range(n):
        off = 10 + k * 12
        if struct.unpack_from("<H", lzw, off)[0] == 259:
            struct.pack_into("<H", lzw, off + 8, 5)
    with pytest.raises(NotImplementedError):
        decode_image(bytes(lzw))

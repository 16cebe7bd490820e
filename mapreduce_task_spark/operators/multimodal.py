"""Multimodal (binary) column plumbing for training-data pipelines.

Treats image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct, and runs decode / feature-extraction through
Arrow-batched ``mapInPandas`` — the pattern a 100 TB multimodal
pipeline uses (JVM moves the bytes; Python touches each batch once).

Decoders (round 8; PNG round 10; JPEG round 11; WAV/progressive round
12; GIF/BMP round 13): ``decode_image`` REALLY decodes binary PNM
(P5/P6), PNG (8/16-bit gray/gray+alpha/RGB/RGBA, paletted with tRNS,
non-interlaced AND Adam7 — the full deflate-era surface), JPEG —
baseline sequential AND progressive (spectral selection + successive
approximation) — GIF (LZW, interlace, transparency, first frame of
animations) and BMP (1/4/8/24/32-bit BI_RGB + RLE8/RLE4);
``decode_audio`` REALLY decodes RIFF/WAVE integer PCM (8/16/24/32),
IEEE float, WAVE_FORMAT_EXTENSIBLE, and G.711 A-law/mu-law — all pure
python/numpy, no new dependencies — and ``decoded_image_stats`` /
``decoded_audio_stats`` run them inside the ``mapInPandas`` contract.
Formats that genuinely need an external codec library
(arithmetic-coded/hierarchical/12-bit JPEG, MP3/AAC/ADPCM audio)
raise NotImplementedError: the container ships no PIL/soundfile, and
the production entry point ``extract_features`` computes
deterministic byte-level features for arbitrary payloads — the
Spark-side contract (schema, batching, partitioning) is identical
either way.

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


def _pnm_header(buf: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse ``n_tokens`` whitespace-separated integer tokens after the
    PNM magic, honoring ``#`` comments; returns (values, raster_offset)
    — the offset is one byte past the single whitespace that terminates
    the last header token (the PNM spec's raster delimiter)."""
    i = 2  # past the 2-byte magic
    toks: list[int] = []
    while len(toks) < n_tokens:
        while i < len(buf):
            c = buf[i : i + 1]
            if c == b"#":
                j = buf.find(b"\n", i)
                i = (j + 1) if j != -1 else len(buf)
            elif c.isspace():
                i += 1
            else:
                break
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace() and buf[j : j + 1] != b"#":
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        toks.append(int(buf[i:j]))
        i = j
    return toks, i + 1


# zigzag scan order: entry k is the NATURAL (row-major) index of the
# k-th zigzag coefficient (JPEG spec figure A.6)
_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


def _jpeg_huffman_table(bits: list, vals: bytes) -> dict:
    """Canonical Huffman decode table from a DHT segment's BITS (count
    of codes per length 1..16) and HUFFVAL: {(length, code): value}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(vals):
                raise ValueError("JPEG DHT counts exceed HUFFVAL length")
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit reader over one entropy-coded segment (byte
    stuffing already removed). Running past the end is malformed data
    -> ValueError (degrades to ok=false in decoded_image_stats)."""

    __slots__ = ("d", "pos", "bit")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.d):
            raise ValueError("truncated JPEG entropy stream")
        b = (self.d[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _jpeg_decode_huff(br: "_JpegBits", table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """JPEG EXTEND (spec F.2.2.1): map a t-bit magnitude to its signed
    value."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _idct_matrix():
    """The 8x8 type-III DCT basis C with C[u, x] = c(u)/2 *
    cos((2x+1) u pi / 16); spatial = C.T @ coefs @ C."""
    import math

    import numpy as np

    c = np.empty((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            c[u, x] = cu / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return c


def _jpeg_entropy_segments(data: bytes, start: int) -> tuple:
    """Split the scan's entropy-coded bytes into restart segments:
    0xFF00 unstuffs to a literal 0xFF, 0xFFD0-0xFFD7 ends a segment,
    any other marker ends the scan. Returns (segments, end) where
    ``end`` is the offset of the terminating marker's 0xFF (or
    len(data)) — the progressive walker resumes there for the next
    scan's header segments."""
    segs = []
    cur = bytearray()
    i = start
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # restart marker
                segs.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or another marker: scan over
        cur.append(b)
        i += 1
    segs.append(bytes(cur))
    return segs, i


def _decode_jpeg(payload: bytes):
    """Pure-stdlib/numpy JPEG decoder — BASELINE (SOF0/SOF1) and
    PROGRESSIVE (SOF2), Huffman, 8-bit. Baseline: marker walk ->
    DQT/DHT/SOF/SOS -> per-MCU Huffman decode (restart-interval aware)
    -> dequantize -> inverse zigzag -> 8x8 IDCT (one numpy matmul pair
    per block) -> plane assembly with nearest-neighbor chroma
    upsampling -> JFIF YCbCr->RGB. Progressive (r12): each SOS scan
    accumulates its spectral band of coefficients into per-block
    arrays (spectral selection + successive approximation with
    correction bits, see ``_JpegProgressive``), and the single
    dequant/IDCT/assembly pass runs at the end. Grayscale returns
    (h, w) uint8; color (h, w, 3) uint8. Arithmetic-coded,
    hierarchical/lossless, and 12-bit files raise NotImplementedError
    (ok=false degradation); structural damage raises ValueError. The
    bit loop is per payload inside a mapInPandas batch —
    slow-but-bounded python, the same posture as the PNG unfilter
    loops."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("missing JPEG SOI marker")
    qt: dict[int, list] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    sof = None
    progressive = False
    prog = None
    dri = 0
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        # optional 0xFF fill bytes before a marker (spec B.1.1.2)
        while i + 4 <= len(payload) and payload[i + 1] == 0xFF:
            i += 1
        marker = payload[i + 1]
        if marker == 0xD9:
            # EOI ends the image — STOP walking (trailing bytes after
            # EOI are common padding and must not be read as markers;
            # a progressive stream assembles below)
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # standalone markers (TEM, RSTn, SOI) carry no length
            # segment (spec B.1.1.3) — skip them instead of misreading
            # the following bytes as a phantom segment size
            i += 2
            continue
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic-coded/hierarchical/lossless JPEG needs an "
                "imaging library; baseline sequential and progressive "
                "Huffman decode here"
            )
        (size,) = struct.unpack(">H", payload[i + 2 : i + 4])
        body = payload[i + 4 : i + 2 + size]
        if len(body) != size - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                prec, tid = body[j] >> 4, body[j] & 15
                n = 64 * (2 if prec else 1)
                raw = body[j + 1 : j + 1 + n]
                if len(raw) < n:
                    raise ValueError("truncated JPEG DQT")
                if prec:
                    qt[tid] = list(struct.unpack(f">{64}H", raw))
                else:
                    qt[tid] = list(raw)
                j += 1 + n
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(body):
                cls, tid = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                vals = body[j + 17 : j + 17 + n]
                if len(vals) < n:
                    raise ValueError("truncated JPEG DHT")
                (ac_tabs if cls else dc_tabs)[tid] = _jpeg_huffman_table(
                    bits, vals
                )
                j += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 prog.
            depth, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if depth != 8:
                raise NotImplementedError("only 8-bit JPEG decodes here")
            if w == 0 or h == 0:
                raise ValueError("zero-dimension JPEG")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            sof = (h, w, comps)
            progressive = marker == 0xC2
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            if not progressive:
                scan = {}
                for c in range(ns):
                    cid, tt = body[1 + 2 * c : 3 + 2 * c]
                    scan[cid] = (tt >> 4, tt & 15)
                return _jpeg_decode_scan(
                    payload, i + 2 + size, sof, scan, qt, dc_tabs, ac_tabs,
                    dri,
                )
            # progressive: accumulate this scan's spectral band, then
            # keep walking — more DHT/DRI/SOS segments follow
            if len(body) < 4 + 2 * ns:
                raise ValueError("short JPEG SOS header")
            if prog is None:
                prog = _JpegProgressive(sof)
            scan_list = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c : 3 + 2 * c]
                scan_list.append((cid, tt >> 4, tt & 15))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            segs, end = _jpeg_entropy_segments(payload, i + 2 + size)
            prog.scan(
                scan_list, ss, se, ahal >> 4, ahal & 15, segs, dri,
                dc_tabs, ac_tabs,
            )
            i = end
            continue
        i += 2 + size
    if prog is not None and prog.n_scans:
        return prog.image(qt)
    raise ValueError("JPEG has no SOS scan")


def _jpeg_decode_scan(payload, start, sof, scan, qt, dc_tabs, ac_tabs, dri):
    import numpy as np

    h, w, comps = sof
    if any(cid not in scan for cid, *_ in comps):
        raise NotImplementedError(
            "multi-scan (non-interleaved) JPEG not supported"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad JPEG sampling factors")
    if any(hmax % c[1] or vmax % c[2] for c in comps):
        # nearest-neighbor upsampling below assumes integer ratios
        # (every real-world 4:4:4/4:2:2/4:2:0/4:1:1 layout); a 3:2
        # ratio needs a resampling filter an imaging library provides
        raise NotImplementedError(
            "non-integer JPEG chroma sampling ratio needs an imaging library"
        )
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    cmat = _idct_matrix()
    # per-component natural-order dequant tables and MCU-aligned planes
    planes = {}
    deq = {}
    for cid, ch_, cv, tq in comps:
        if tq not in qt:
            raise ValueError(f"JPEG component references missing DQT {tq}")
        q = np.zeros(64)
        for k in range(64):
            q[_JPEG_ZIGZAG[k]] = qt[tq][k]
        deq[cid] = q.reshape(8, 8)
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch_ * 8))

    segs, _ = _jpeg_entropy_segments(payload, start)
    seg_idx = 0
    br = _JpegBits(segs[0])
    preds = {cid: 0 for cid, *_ in comps}
    total = mcus_x * mcus_y
    for m in range(total):
        if dri and m and m % dri == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("JPEG missing restart segment")
            br = _JpegBits(segs[seg_idx])
            preds = {cid: 0 for cid, *_ in comps}
        my, mx = divmod(m, mcus_x)
        for cid, ch_, cv, _tq in comps:
            dsel, asel = scan[cid]
            if dsel not in dc_tabs or asel not in ac_tabs:
                raise ValueError("JPEG scan references missing DHT")
            for v in range(cv):
                for hh in range(ch_):
                    coefs = np.zeros(64)
                    t = _jpeg_decode_huff(br, dc_tabs[dsel])
                    if t > 11:
                        raise ValueError("bad JPEG DC category")
                    diff = _jpeg_extend(br.read_bits(t), t) if t else 0
                    preds[cid] += diff
                    coefs[0] = preds[cid]
                    k = 1
                    while k < 64:
                        rs = _jpeg_decode_huff(br, ac_tabs[asel])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        coefs[_JPEG_ZIGZAG[k]] = _jpeg_extend(
                            br.read_bits(s), s
                        )
                        k += 1
                    block = (coefs.reshape(8, 8)) * deq[cid]
                    spatial = cmat.T @ block @ cmat + 128.0
                    by = (my * cv + v) * 8
                    bx = (mx * ch_ + hh) * 8
                    planes[cid][by : by + 8, bx : bx + 8] = spatial
    return _jpeg_planes_to_image(planes, comps, hmax, vmax, h, w)


def _jpeg_planes_to_image(planes, comps, hmax, vmax, h, w):
    """Shared decode tail (baseline and progressive): upsample each
    component plane to full resolution, crop the MCU padding, JFIF
    YCbCr->RGB for 3-component images."""
    import numpy as np

    out = []
    for cid, ch_, cv, _tq in comps:
        p = planes[cid]
        if ch_ < hmax or cv < vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch_, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype("u1")
    if len(out) != 3:
        raise NotImplementedError(
            f"{len(out)}-component JPEG (CMYK?) needs an imaging library"
        )
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype("u1")


class _JpegProgressive:
    """Progressive (SOF2) coefficient accumulator: each SOS scan
    deposits or refines a spectral band of DCT coefficients (spec
    G.1.2 / G.2 — spectral selection Ss..Se, successive approximation
    Ah/Al with correction bits), and ``image()`` runs the one
    dequantize + IDCT + assembly pass at the end over the accumulated
    per-block coefficient arrays (kept in ZIGZAG order). DC scans may
    interleave components in MCU order; AC scans are per-component in
    block-raster order per the spec. Restart markers reset the DC
    predictors AND the EOB run."""

    def __init__(self, sof):
        import numpy as np

        h, w, comps = sof
        self.h, self.w, self.comps = h, w, comps
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        if self.hmax < 1 or self.vmax < 1 or self.hmax > 4 or self.vmax > 4:
            raise ValueError("bad JPEG sampling factors")
        if any(self.hmax % c[1] or self.vmax % c[2] for c in comps):
            raise NotImplementedError(
                "non-integer JPEG chroma sampling ratio needs an imaging "
                "library"
            )
        self.mcus_x = -(-w // (8 * self.hmax))
        self.mcus_y = -(-h // (8 * self.vmax))
        self.coefs = {}
        self.bdims = {}
        self.factors = {}
        for cid, ch_, cv, _tq in comps:
            # MCU-padded block grid (interleaved DC scans cover the
            # padding); non-interleaved scans touch only the ACTUAL
            # component blocks, per the spec's data-unit count
            self.coefs[cid] = np.zeros(
                (self.mcus_y * cv, self.mcus_x * ch_, 64), dtype=np.int32
            )
            comp_w = -(-w * ch_ // self.hmax)
            comp_h = -(-h * cv // self.vmax)
            self.bdims[cid] = (-(-comp_h // 8), -(-comp_w // 8))
            self.factors[cid] = (ch_, cv)
        self.n_scans = 0

    def _units(self, scan_list):
        """Restart-countable data units: one MCU's block list per unit
        for interleaved scans, one block per unit otherwise."""
        if len(scan_list) > 1:
            units = []
            for m in range(self.mcus_x * self.mcus_y):
                my, mx = divmod(m, self.mcus_x)
                blocks = []
                for cid, _d, _a in scan_list:
                    ch_, cv = self.factors[cid]
                    for v in range(cv):
                        for hh in range(ch_):
                            blocks.append((cid, my * cv + v, mx * ch_ + hh))
                units.append(blocks)
            return units
        cid = scan_list[0][0]
        bh, bw = self.bdims[cid]
        return [
            [(cid, by, bx)] for by in range(bh) for bx in range(bw)
        ]

    def scan(self, scan_list, ss, se, ah, al, segs, dri, dc_tabs, ac_tabs):
        if not (0 <= ss <= 63 and ss <= se <= 63) or al > 13:
            raise ValueError("bad JPEG progressive scan parameters")
        if ss == 0 and se != 0:
            raise ValueError("JPEG DC scan must have Se=0")
        if ss > 0 and len(scan_list) > 1:
            raise ValueError("JPEG progressive AC scan must be one component")
        for cid, dsel, asel in scan_list:
            if cid not in self.coefs:
                raise ValueError("JPEG scan references unknown component")
            if ss == 0 and ah == 0 and dsel not in dc_tabs:
                raise ValueError("JPEG scan references missing DHT")
            if ss > 0 and asel not in ac_tabs:
                raise ValueError("JPEG scan references missing DHT")
        units = self._units(scan_list)
        seg_idx = 0
        br = _JpegBits(segs[0])
        preds = {cid: 0 for cid, _d, _a in scan_list}
        self._eobrun = 0
        for u, blocks in enumerate(units):
            if dri and u and u % dri == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("JPEG missing restart segment")
                br = _JpegBits(segs[seg_idx])
                preds = {cid: 0 for cid, _d, _a in scan_list}
                self._eobrun = 0
            for cid, by, bx in blocks:
                cz = self.coefs[cid][by, bx]
                dsel = asel = None
                for scid, d, a in scan_list:
                    if scid == cid:
                        dsel, asel = d, a
                if ss == 0:
                    if ah == 0:
                        t = _jpeg_decode_huff(br, dc_tabs[dsel])
                        if t > 11:
                            raise ValueError("bad JPEG DC category")
                        diff = _jpeg_extend(br.read_bits(t), t) if t else 0
                        preds[cid] += diff
                        cz[0] = preds[cid] << al
                    elif br.read_bit():
                        cz[0] |= 1 << al
                elif ah == 0:
                    self._ac_first(br, ac_tabs[asel], cz, ss, se, al)
                else:
                    self._ac_refine(br, ac_tabs[asel], cz, ss, se, al)
        self.n_scans += 1

    def _ac_first(self, br, table, cz, ss, se, al):
        if self._eobrun > 0:
            self._eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = _jpeg_decode_huff(br, table)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:  # ZRL: 16 zeros
                    k += 16
                    continue
                self._eobrun = (1 << r) - 1  # EOBn: this block ends now
                if r:
                    self._eobrun += br.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("JPEG AC run past band end")
            cz[k] = _jpeg_extend(br.read_bits(s), s) << al
            k += 1

    def _ac_refine(self, br, table, cz, ss, se, al):
        """Correction-bit pass (spec G.1.2.3): already-nonzero
        coefficients in the band receive one refinement bit each as the
        scan traverses them; zero-history positions count toward the
        run that places each newly-significant +-1<<Al coefficient."""
        p1 = 1 << al
        m1 = -p1
        k = ss
        if self._eobrun == 0:
            while k <= se:
                rs = _jpeg_decode_huff(br, table)
                r, s = rs >> 4, rs & 15
                s_val = 0
                if s == 0:
                    if r != 15:
                        # refinement EOB run INCLUDES the current block:
                        # its remaining in-band correction bits are
                        # consumed by the tail walk below, then the run
                        # decrements (unlike the first pass, where the
                        # current block ends immediately)
                        self._eobrun = 1 << r
                        if r:
                            self._eobrun += br.read_bits(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history positions
                else:
                    if s != 1:
                        raise ValueError("bad JPEG AC refinement magnitude")
                    s_val = p1 if br.read_bit() else m1
                while k <= se:
                    if cz[k] != 0:
                        if br.read_bit() and (cz[k] & p1) == 0:
                            cz[k] += p1 if cz[k] >= 0 else m1
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if s_val and k <= se:
                    cz[k] = s_val
                k += 1
        if self._eobrun > 0:
            while k <= se:
                if cz[k] != 0:
                    if br.read_bit() and (cz[k] & p1) == 0:
                        cz[k] += p1 if cz[k] >= 0 else m1
                k += 1
            self._eobrun -= 1

    def image(self, qt):
        import numpy as np

        cmat = _idct_matrix()
        zz = list(_JPEG_ZIGZAG)
        planes = {}
        for cid, ch_, cv, tq in self.comps:
            if tq not in qt:
                raise ValueError(f"JPEG component references missing DQT {tq}")
            qtbl = np.asarray(qt[tq], dtype=np.float64)  # zigzag order
            plane = np.zeros((self.mcus_y * cv * 8, self.mcus_x * ch_ * 8))
            nblk_y, nblk_x = self.coefs[cid].shape[:2]
            for by in range(nblk_y):
                for bx in range(nblk_x):
                    nat = np.zeros(64)
                    nat[zz] = self.coefs[cid][by, bx] * qtbl
                    spatial = cmat.T @ nat.reshape(8, 8) @ cmat + 128.0
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = spatial
            planes[cid] = plane
        return _jpeg_planes_to_image(
            planes, self.comps, self.hmax, self.vmax, self.h, self.w
        )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel: gray, RGB, gray+alpha, RGBA (8- and
# 16-bit depths). Palette (3) expands through the PLTE lookup and
# Adam7 interlacing decodes pass-by-pass (both r12) — no PNG format
# gaps remain on the deflate-era surface.
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytearray:
    """Invert the per-scanline PNG filters (spec §9: None/Sub/Up/
    Average/Paeth). ``stride`` is the scanline byte length, ``bpp`` the
    filter's byte distance to the prior pixel (max(1, bits//8) — 1 for
    sub-byte palette rows, channels*2 for 16-bit). Sub/Average/Paeth
    carry a prior-PIXEL dependency along the row, so those scanlines
    are sequential byte loops; None and Up rows stay O(stride) slice
    ops. Fine for the mapInPandas batch context: the loop is per
    payload, not per corpus."""
    out = bytearray(h * stride)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = bytearray(raw[pos : pos + stride])
        if len(row) < stride:
            raise ValueError("truncated PNG raster")
        pos += stride
        ro = y * stride
        up = out[ro - stride : ro] if y else bytes(stride)
        if ft == 0:
            pass
        elif ft == 1:  # Sub: prior pixel in this row
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up: same byte in prior row
            for i in range(stride):
                row[i] = (row[i] + up[i]) & 0xFF
        elif ft == 3:  # Average of left and up
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((a + up[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth predictor of left/up/up-left
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = up[i]
                c = up[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[ro : ro + stride] = row
    return out


def _decode_png(payload: bytes):
    """Pure-stdlib PNG decoder: chunk walk -> IHDR validation -> one
    zlib inflate over the concatenated IDAT stream -> per-scanline
    unfilter. Covers 8- and 16-bit gray/gray+alpha/RGB/RGBA plus
    palette images (PLTE lookup, depths 1/2/4/8, optional tRNS alpha
    -> RGBA), non-interlaced AND Adam7-interlaced (r12: seven
    independently-filtered reduced images scattered onto the sample
    grid) — the full deflate-era PNG surface. Anything structurally
    malformed raises ValueError. 16-bit samples come back as
    big-endian uint16 arrays (the PNM decoder's convention)."""
    import struct
    import zlib

    import numpy as np

    ihdr = None
    idat: list[bytes] = []
    plte = trns = None
    i = len(_PNG_SIG)
    while i + 8 <= len(payload):
        (size,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + size]
        if len(body) < size:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            if len(body) < 13:
                # struct.error would escape decoded_image_stats' catch
                raise ValueError("short PNG IHDR chunk")
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IEND":
            break
        i += 12 + size  # len + type + data + CRC
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"bad PNG compression/filter method {comp}/{filt}")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension PNG")
    if color_type == 3:
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"bad palette PNG bit depth {depth}")
        if not plte or len(plte) % 3:
            raise ValueError("palette PNG missing or malformed PLTE")
        stride = (w * depth + 7) // 8
        bpp = 1
    elif color_type in _PNG_CHANNELS:
        if depth not in (8, 16):
            raise NotImplementedError(
                f"PNG depth {depth} color type {color_type} needs an "
                "imaging library; 8/16-bit gray/gray+alpha/RGB/RGBA and "
                "paletted images decode here"
            )
        bpp = _PNG_CHANNELS[color_type] * (depth // 8)
        stride = w * bpp
    else:
        raise ValueError(f"bad PNG color type {color_type}")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        # corrupt deflate stream is malformed data, not a format gap —
        # normalize to ValueError so decoded_image_stats degrades the
        # row (ok=false) instead of the zlib.error killing the task
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e

    def region_stride(pw: int) -> int:
        if color_type == 3:
            return (pw * depth + 7) // 8
        return pw * bpp

    def decode_region(part: bytes, ph: int, pw: int):
        """Unfilter one filtered raster region (the whole image, or one
        Adam7 pass's reduced image) and return its per-pixel samples —
        palette indices (ph, pw) or channel samples (ph, pw[, ch])."""
        st = region_stride(pw)
        pix = _png_unfilter(part, ph, st, bpp)
        if color_type == 3:
            rows = np.frombuffer(bytes(pix), dtype="u1").reshape(ph, st)
            if depth == 8:
                return rows[:, :pw]
            # sub-byte indices pack MSB-first within each scanline byte
            bits = np.unpackbits(rows, axis=1)
            return (
                bits[:, : pw * depth]
                .reshape(ph, pw, depth)
                .dot(1 << np.arange(depth - 1, -1, -1))
                .astype("u1")
            )
        ch_ = _PNG_CHANNELS[color_type]
        a = np.frombuffer(bytes(pix), dtype=">u2" if depth == 16 else "u1")
        return a.reshape((ph, pw)) if ch_ == 1 else a.reshape((ph, pw, ch_))

    if interlace == 0:
        if len(raw) != h * (1 + stride):
            raise ValueError(
                f"PNG raster size mismatch: {len(raw)} != {h * (1 + stride)}"
            )
        samples = decode_region(raw, h, w)
    else:
        # Adam7 (spec §8.2): seven reduced images, each filtered
        # independently at its own reduced width; empty passes
        # contribute no bytes. Scatter each pass onto its sample grid.
        if color_type == 3:
            samples = np.zeros((h, w), dtype="u1")
        else:
            ch_ = _PNG_CHANNELS[color_type]
            dt = ">u2" if depth == 16 else "u1"
            samples = np.zeros(
                (h, w) if ch_ == 1 else (h, w, ch_), dtype=dt
            )
        pos = 0
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            nbytes = ph * (1 + region_stride(pw))
            part = raw[pos : pos + nbytes]
            if len(part) < nbytes:
                raise ValueError("truncated interlaced PNG raster")
            pos += nbytes
            samples[y0::dy, x0::dx] = decode_region(part, ph, pw)
        if pos != len(raw):
            raise ValueError(
                f"PNG raster size mismatch: {len(raw)} != {pos}"
            )

    if color_type == 3:
        idx = samples
        plt = np.frombuffer(plte, dtype="u1").reshape(-1, 3)
        if int(idx.max()) >= len(plt):
            raise ValueError("palette PNG index out of PLTE range")
        rgb = plt[idx]
        if trns is None:
            return rgb
        if len(trns) > len(plt):
            raise ValueError("palette PNG tRNS longer than PLTE")
        alpha = np.full(len(plt), 255, dtype="u1")
        alpha[: len(trns)] = np.frombuffer(trns, dtype="u1")
        return np.dstack([rgb, alpha[idx]])
    return samples


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW decompress: LSB-first bit packing, variable code
    width growing to 12 bits, clear/end-of-information codes, table
    frozen at 4096 entries until the next clear. Returns exactly
    ``n_pixels`` index bytes; anything structurally wrong (first code
    not a literal, code beyond the table, truncated stream) raises
    ValueError — corrupt data, not a format gap."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1

    def fresh() -> tuple[list[bytes], int]:
        # clear/end slots hold placeholders so indices line up
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = fresh()
    prev: bytes | None = None
    out = bytearray()
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + width <= total_bits:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table, width = fresh()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table) or code > end:
                raise ValueError("GIF LZW: first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW: code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError(
            f"GIF LZW: pixel stream truncated ({len(out)} < {n_pixels})"
        )
    return bytes(out[:n_pixels])


def _decode_gif(payload: bytes):
    """Pure-stdlib GIF decoder (87a/89a): logical screen descriptor ->
    global color table -> block walk (extensions skipped except the
    graphic control's transparency index) -> FIRST image frame through
    the LZW decoder, local color table preferred, 4-pass interlace
    deinterleaved. Returns (h, w, 3) RGB, or (h, w, 4) RGBA when the
    frame declares a transparent index. Animated GIFs decode their
    first frame (per-frame fan-out belongs to ``sample_frames``-style
    operators, not the single-image contract)."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("bad GIF signature")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    packed = payload[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = payload[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    transparent = None
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            if pos + 2 > len(payload):
                raise ValueError("truncated GIF extension")
            label = payload[pos + 1]
            pos += 2
            subs: list[bytes] = []
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF extension sub-blocks")
                sz = payload[pos]
                pos += 1
                if sz == 0:
                    break
                if pos + sz > len(payload):
                    raise ValueError("truncated GIF extension sub-block")
                subs.append(payload[pos : pos + sz])
                pos += sz
            if label == 0xF9 and subs and len(subs[0]) >= 4 and subs[0][0] & 1:
                transparent = subs[0][3]
            continue
        if b0 != 0x2C:
            raise ValueError(f"bad GIF block introducer {b0:#x}")
        # image descriptor — decode this (first) frame
        if pos + 10 > len(payload):
            raise ValueError("truncated GIF image descriptor")
        iw = int.from_bytes(payload[pos + 5 : pos + 7], "little")
        ih = int.from_bytes(payload[pos + 7 : pos + 9], "little")
        ipacked = payload[pos + 9]
        pos += 10
        if iw == 0 or ih == 0:
            raise ValueError("zero-dimension GIF frame")
        lct = None
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            lct = payload[pos : pos + 3 * n]
            if len(lct) < 3 * n:
                raise ValueError("truncated GIF local color table")
            pos += 3 * n
        if pos >= len(payload):
            raise ValueError("truncated GIF image data")
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while True:
            if pos >= len(payload):
                raise ValueError("truncated GIF image sub-blocks")
            sz = payload[pos]
            pos += 1
            if sz == 0:
                break
            if pos + sz > len(payload):
                raise ValueError("truncated GIF image sub-block")
            data += payload[pos : pos + sz]
            pos += sz
        ct = lct if lct is not None else gct
        if ct is None:
            raise ValueError("GIF frame has no color table")
        idx = np.frombuffer(
            _gif_lzw_decode(bytes(data), mcs, iw * ih), dtype="u1"
        ).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows stored in 4 passes
            order = (
                list(range(0, ih, 8))
                + list(range(4, ih, 8))
                + list(range(2, ih, 4))
                + list(range(1, ih, 2))
            )
            deint = np.empty_like(idx)
            deint[np.asarray(order)] = idx
            idx = deint
        pal = np.frombuffer(ct, dtype="u1").reshape(-1, 3)
        if int(idx.max()) >= len(pal):
            raise ValueError("GIF index out of color table range")
        rgb = pal[idx]
        if transparent is not None and transparent < len(pal):
            alpha = np.where(idx == transparent, 0, 255).astype("u1")
            return np.dstack([rgb, alpha])
        return rgb
    raise ValueError("GIF contains no image data")


def _bmp_rle_decode(data: bytes, w: int, h: int, four_bit: bool):
    """BMP RLE8/RLE4 decompress to an (h, w) index array. Encoded runs,
    absolute runs (word-aligned), end-of-line/bitmap, and delta moves
    per the spec; rows are bottom-up (a top-down BMP cannot be RLE).
    Pixels the stream never names stay 0 (the common convention);
    writes past the raster raise ValueError."""
    import numpy as np

    out = np.zeros((h, w), dtype="u1")
    x = y = i = 0
    while i + 1 < len(data):
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if y >= h or x + cnt > w:
                raise ValueError("BMP RLE run past raster bounds")
            row = out[h - 1 - y]
            if four_bit:
                pair = (val >> 4, val & 0x0F)
                for j in range(cnt):
                    row[x + j] = pair[j & 1]
            else:
                row[x : x + cnt] = val
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return out
        elif val == 2:  # delta
            if i + 2 > len(data):
                raise ValueError("truncated BMP RLE delta")
            x += data[i]
            y += data[i + 1]
            i += 2
            if x > w or y > h:
                raise ValueError("BMP RLE delta past raster bounds")
        else:  # absolute run of `val` pixels, word-aligned
            npix = val
            nbytes = (npix + 1) // 2 if four_bit else npix
            padded = nbytes + (nbytes & 1)
            if i + padded > len(data):
                raise ValueError("truncated BMP RLE absolute run")
            if y >= h or x + npix > w:
                raise ValueError("BMP RLE absolute run past raster bounds")
            row = out[h - 1 - y]
            if four_bit:
                for j in range(npix):
                    b = data[i + (j >> 1)]
                    row[x + j] = (b >> 4) if j & 1 == 0 else (b & 0x0F)
            else:
                row[x : x + npix] = np.frombuffer(
                    data[i : i + npix], dtype="u1"
                )
            x += npix
            i += padded
    raise ValueError("BMP RLE stream missing end-of-bitmap")


def _decode_bmp(payload: bytes):
    """Pure-stdlib BMP decoder: BITMAPINFOHEADER (and the V4/V5
    supersets — same leading fields) with bit depths 1/4/8 (paletted,
    BGRX entries), 24 (BGR) and 32 (BGRA), BI_RGB plus RLE8/RLE4,
    bottom-up or top-down rows, 4-byte row padding. Returns (h, w, 3)
    RGB for paletted/24-bit and for 32-bit files whose reserved 4th
    byte is all-zero (the BI_RGB spec reserves it; GDI zeroes it),
    (h, w, 4) RGBA when the 4th channel carries data. 16-bit and
    BI_BITFIELDS masks (and the ancient BITMAPCOREHEADER) raise
    NotImplementedError; structural damage raises ValueError."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("bad BMP signature")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError(
            f"BMP header size {hdr_size} (BITMAPCOREHEADER era) needs an "
            "imaging library; BITMAPINFOHEADER and its V4/V5 supersets "
            "decode here"
        )
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    (clr_used,) = struct.unpack_from("<I", payload, 46)
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_raw}")
    if planes != 1:
        raise ValueError(f"bad BMP plane count {planes}")
    if bpp in (16,) or compression == 3:
        raise NotImplementedError(
            "16-bit / BI_BITFIELDS BMP needs mask-aware decode from an "
            "imaging library"
        )
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"bad BMP bit depth {bpp}")
    if compression not in (0, 1, 2):
        raise ValueError(f"bad BMP compression {compression}")
    if (compression == 1 and bpp != 8) or (compression == 2 and bpp != 4):
        raise ValueError(f"BMP compression {compression} invalid at {bpp} bpp")
    palette = None
    if bpp <= 8:
        n = clr_used or (1 << bpp)
        pal_off = 14 + hdr_size
        pal = payload[pal_off : pal_off + 4 * n]
        if len(pal) < 4 * n:
            raise ValueError("truncated BMP palette")
        palette = np.frombuffer(pal, dtype="u1").reshape(-1, 4)[:, [2, 1, 0]]
    if compression in (1, 2):
        if top_down:
            raise ValueError("top-down BMP cannot be RLE-compressed")
        idx = _bmp_rle_decode(
            payload[data_off:], w, h, four_bit=(compression == 2)
        )
        if int(idx.max()) >= len(palette):
            raise ValueError("BMP index out of palette range")
        return palette[idx]
    stride = ((w * bpp + 31) // 32) * 4
    raster = payload[data_off : data_off + stride * h]
    if len(raster) < stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype="u1").reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        return rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()
    if bpp == 32:
        # BI_RGB 32-bit's 4th byte is RESERVED, not alpha (GDI writes
        # 0 there — returning it as alpha would make ordinary files
        # fully transparent, the r13 self-review finding). Surface it
        # as alpha only when some pixel actually uses it; otherwise
        # drop it and return RGB like every mainstream decoder.
        px = rows[:, : w * 4].reshape(h, w, 4)
        if int(px[:, :, 3].max()) == 0:
            return px[:, :, [2, 1, 0]].copy()
        return px[:, :, [2, 1, 0, 3]].copy()
    if bpp == 8:
        idx = rows[:, :w]
    elif bpp == 4:
        nb = (w + 1) // 2
        b = rows[:, :nb]
        idx = np.empty((h, nb * 2), dtype="u1")
        idx[:, 0::2] = b >> 4
        idx[:, 1::2] = b & 0x0F
        idx = idx[:, :w]
    else:  # 1-bit, MSB first
        idx = np.unpackbits(rows[:, : (w + 7) // 8], axis=1)[:, :w]
    if int(idx.max()) >= len(palette):
        raise ValueError("BMP index out of palette range")
    return palette[idx]




def _packbits_decode(data: bytes, expect: int) -> bytes:
    """Apple PackBits decompress (TIFF compression 32773): n in 0..127
    copies n+1 literal bytes, n in -127..-1 repeats the next byte
    1-n times, -128 is a no-op. Raises ValueError on truncation."""
    out = bytearray()
    i = 0
    while len(out) < expect:
        if i >= len(data):
            raise ValueError("truncated PackBits stream")
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            if i + n + 1 > len(data):
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expect])


def _decode_tiff(payload: bytes):
    """Pure-stdlib baseline TIFF decoder: both byte orders, first IFD,
    strip-based (chunky planar) 8- and 16-bit gray/RGB/RGBA,
    uncompressed (1) or PackBits (32773). Tiled, planar-separated,
    palette, and LZW/JPEG-compressed TIFFs raise NotImplementedError
    (the last two genuinely carry codecs; the first two are rare
    layout variants recorded as honest gaps). Structural damage
    raises ValueError."""
    import struct

    import numpy as np

    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("bad TIFF signature")
    if len(payload) < 8:
        raise ValueError("truncated TIFF header")
    (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD offset")
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    if ifd_off + 2 + n_entries * 12 > len(payload):
        raise ValueError("truncated TIFF IFD")
    _SZ = {1: 1, 2: 1, 3: 2, 4: 4}

    def entry_values(off: int):
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, off)
        if typ not in _SZ:
            return tag, None  # rationals etc. — ignored tags here
        total = _SZ[typ] * cnt
        if total <= 4:
            raw = payload[off + 8 : off + 8 + total]
        else:
            (voff,) = struct.unpack_from(bo + "I", payload, off + 8)
            if voff + total > len(payload):
                raise ValueError("truncated TIFF tag values")
            raw = payload[voff : voff + total]
        if typ == 3:
            vals = list(struct.unpack(bo + "H" * cnt, raw))
        elif typ == 4:
            vals = list(struct.unpack(bo + "I" * cnt, raw))
        elif typ == 1:
            vals = list(raw)
        else:
            vals = [raw]
        return tag, vals

    tags: dict[int, list] = {}
    for k in range(n_entries):
        tag, vals = entry_values(ifd_off + 2 + k * 12)
        if vals is not None:
            tags[tag] = vals
    try:
        w = int(tags[256][0])
        h = int(tags[257][0])
        offsets = [int(v) for v in tags[273]]
        counts = [int(v) for v in tags[279]]
    except (KeyError, IndexError) as e:
        raise ValueError(f"TIFF missing required tag: {e}") from e
    spp = int(tags.get(277, [1])[0])
    bits = tags.get(258, [8] * spp)
    rows_per_strip = int(tags.get(278, [h])[0])
    compression = int(tags.get(259, [1])[0])
    planar = int(tags.get(284, [1])[0])
    if w <= 0 or h <= 0:
        raise ValueError("zero-dimension TIFF")
    if 322 in tags or 324 in tags:
        raise NotImplementedError("tiled TIFF needs an imaging library")
    if planar != 1:
        raise NotImplementedError(
            "planar-separated TIFF needs an imaging library"
        )
    if int(tags.get(262, [1])[0]) == 3:
        raise NotImplementedError("palette TIFF needs an imaging library")
    if compression not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {compression} needs a codec library; "
            "uncompressed and PackBits decode here"
        )
    if len(set(bits)) != 1 or bits[0] not in (8, 16):
        raise NotImplementedError(
            f"TIFF bit depths {bits} need an imaging library (8/16 here)"
        )
    depth = int(bits[0])
    if spp not in (1, 3, 4):
        raise ValueError(f"bad TIFF samples-per-pixel {spp}")
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offsets/counts disagree")
    bpp = spp * (depth // 8)
    raster = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(payload):
            raise ValueError("truncated TIFF strip")
        strip = payload[off : off + cnt]
        rows_here = min(rows_per_strip, h - si * rows_per_strip)
        if rows_here <= 0:
            raise ValueError("TIFF has more strips than rows")
        expect = rows_here * w * bpp
        if compression == 32773:
            strip = _packbits_decode(strip, expect)
        if len(strip) < expect:
            raise ValueError("short TIFF strip")
        raster += strip[:expect]
    dt = np.dtype(bo + "u2") if depth == 16 else np.dtype("u1")
    arr = np.frombuffer(bytes(raster), dtype=dt, count=h * w * spp)
    return arr.reshape((h, w)) if spp == 1 else arr.reshape((h, w, spp))


def decode_image(payload: bytes):
    """Decode an image payload to a numpy pixel array.

    REAL pure-python/numpy decoders for binary PNM — P5 (grayscale,
    returns (h, w)) and P6 (RGB, returns (h, w, 3)); maxval > 255
    raster is big-endian uint16 per the spec — and (r10-r12) for
    non-interlaced PNG: 8/16-bit gray/gray+alpha/RGB/RGBA plus
    paletted images (PLTE lookup, depths 1/2/4/8, tRNS alpha -> RGBA),
    non-interlaced and Adam7, via stdlib zlib inflate + spec §9
    unfiltering; baseline AND progressive JPEG decode through
    ``_decode_jpeg``; (r13) GIF 87a/89a — LZW, interlace, local color
    tables, transparency -> RGBA, first frame of animations — BMP
    1/4/8/24/32-bit BI_RGB + RLE8/RLE4, and baseline strip TIFF
    (both byte orders, 8/16-bit gray/RGB/RGBA, uncompressed +
    PackBits). Formats that genuinely need an
    imaging library (arithmetic-coded/hierarchical/12-bit JPEG, 16-bit
    / BI_BITFIELDS BMP) still raise NotImplementedError — the
    container ships no PIL.
    """
    import numpy as np

    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return _decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return _decode_tiff(payload)
    magic = payload[:2]
    if magic in (b"P5", b"P6"):
        (w, h, maxval), off = _pnm_header(payload, 3)
        ch = 3 if magic == b"P6" else 1
        dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
        count = w * h * ch
        arr = np.frombuffer(payload, dtype=dt, count=count, offset=off)
        return arr.reshape((h, w, 3)) if ch == 3 else arr.reshape((h, w))
    raise NotImplementedError(
        f"image format {magic!r} requires an imaging library (e.g. Pillow); "
        "binary PNM (P5/P6), PNG, baseline+progressive JPEG, GIF, and BMP "
        "decode without one"
    )


def decode_audio(payload: bytes):
    """Decode an audio payload to (samples, sample_rate).

    REAL pure-python decoder for RIFF/WAVE: walks the chunk list,
    reads fmt + data. Integer PCM (format tag 1): uint8 for 8-bit,
    int16 for 16-bit, and (r12) int32 for 24-bit (each frame's 3
    little-endian bytes sign-extended into the low 3 bytes of an
    int32) and 32-bit. IEEE float (tag 3, r12): float32/float64
    returned as-is. WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE, r12) unwraps
    to the SubFormat GUID's real tag (PCM/float) and decodes
    identically. G.711 A-law/mu-law (tags 6/7, r12) expand to int16
    via the fixed companding tables. Returns (n_frames,) for mono or
    (n_frames, n_channels). Genuinely compressed formats (MP3, AAC,
    ADPCM...) still raise NotImplementedError — they need a codec
    library the container doesn't ship.
    """
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "audio payload is not RIFF/WAVE; compressed formats require "
            "soundfile/librosa, not available here"
        )
    fmt = data = None
    ext_tag = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            if fmt[0] == 0xFFFE:
                # WAVE_FORMAT_EXTENSIBLE: cbSize(2) + validBits(2) +
                # channelMask(4) + SubFormat GUID whose first 2 bytes
                # are the real format tag (spec: KSDATAFORMAT_SUBTYPE_*)
                if len(body) < 26:
                    raise ValueError("short WAVE_FORMAT_EXTENSIBLE fmt chunk")
                (ext_tag,) = struct.unpack("<H", body[24:26])
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _brate, _align, bits = fmt
    if audio_format == 0xFFFE:
        audio_format = ext_tag
    if audio_format == 1 and bits in (8, 16, 24, 32):
        if bits == 24:
            raw = np.frombuffer(data, dtype="u1")
            if len(raw) % 3:
                raise ValueError("24-bit WAV data not a multiple of 3 bytes")
            raw = raw.reshape(-1, 3).astype("u4")
            u = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            samples = (
                (u ^ 0x800000).astype("i4") - 0x800000
            )  # sign-extend bit 23
        else:
            dt = {8: "u1", 16: "<i2", 32: "<i4"}[bits]
            samples = np.frombuffer(data, dtype=np.dtype(dt))
    elif audio_format == 3 and bits in (32, 64):
        samples = np.frombuffer(
            data, dtype=np.dtype("<f4" if bits == 32 else "<f8")
        )
    elif audio_format in (6, 7) and bits == 8:
        # G.711 A-law (6) / mu-law (7): fixed 8-bit companding — pure
        # arithmetic expansion to int16 (r12), not a codec-library gap
        b = np.frombuffer(data, dtype="u1").astype("i4")
        if audio_format == 7:
            u = (~b) & 0xFF
            t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
            mag = t - 0x84
            samples = np.where(u & 0x80, -mag, mag).astype("i2")
        else:
            a = b ^ 0x55
            seg = (a & 0x70) >> 4
            t = (a & 0x0F) << 4
            t = np.where(
                seg == 0,
                t + 8,
                (t + 0x108) << np.maximum(seg - 1, 0),
            )
            samples = np.where(a & 0x80, t, -t).astype("i2")
    else:
        raise NotImplementedError(
            f"WAV format tag {audio_format}/{bits}-bit needs a codec "
            "library; integer PCM (8/16/24/32-bit), IEEE float "
            "(32/64-bit), and G.711 A-law/mu-law decode without one"
        )
    if n_channels > 1:
        if len(samples) % n_channels:
            raise ValueError("WAV data not a whole number of frames")
        samples = samples.reshape((-1, n_channels))
    return samples, sample_rate


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


def decoded_image_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Run the REAL PNM decoder over payload rows inside mapInPandas:
    (id, width, height, channels, px_min, px_max, px_mean_milli, ok).

    Per Arrow batch each payload decodes to a pixel array; stats are
    exact integers (mean in floor milli-units, the engine's unit
    discipline). Undecodable payloads (non-PNM magic, truncated
    header) yield ok=false with NULL stats instead of failing the
    stage — at 100 TB a corrupt shard must degrade, not kill the job
    (same posture as PERMISSIVE corrupt-record counting in
    sources/formats.py). Scale shape is ``extract_features``'s:
    Arrow-batched, payload never driver-side, parallelism == scan."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    arr = decode_image(bytes(payload))
                    h, w = arr.shape[0], arr.shape[1]
                    ch = arr.shape[2] if arr.ndim == 3 else 1
                    n = int(arr.size)
                    rows.append(
                        (did, w, h, ch, int(arr.min()), int(arr.max()),
                         int(arr.sum(dtype="int64")) * 1000 // n, True)
                    )
                except (NotImplementedError, ValueError):
                    rows.append((did, None, None, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "width", "height", "channels", "px_min",
                         "px_max", "px_mean_milli", "ok"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches,
        schema=f"{id_col} bigint, width int, height int, channels int, "
        "px_min int, px_max int, px_mean_milli bigint, ok boolean",
    )


def decoded_audio_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Run the REAL WAV PCM decoder over payload rows inside
    mapInPandas: (id, sample_rate, n_frames, n_channels, peak_abs,
    mean_abs_milli, ok) — integer stats only (no sqrt in the output),
    corrupt payloads degrade to ok=false rows (see
    decoded_image_stats). Float WAV samples (full scale +-1.0 by
    convention) are scaled to the int16 grid (*32767, rounded) before
    the integer stats, so peak/mean are comparable across int16 and
    float payloads."""
    import numpy as np
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    samples, rate = decode_audio(bytes(payload))
                    n_frames = samples.shape[0]
                    n_ch = samples.shape[1] if samples.ndim == 2 else 1
                    if samples.dtype.kind == "f":
                        samples = np.round(samples * 32767.0)
                    a = np.abs(samples.astype("int64"))
                    n = max(int(a.size), 1)
                    rows.append(
                        (did, rate, n_frames, n_ch, int(a.max(initial=0)),
                         int(a.sum()) * 1000 // n, True)
                    )
                except (NotImplementedError, ValueError):
                    rows.append((did, None, None, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_rate", "n_frames", "n_channels",
                         "peak_abs", "mean_abs_milli", "ok"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches,
        schema=f"{id_col} bigint, sample_rate int, n_frames bigint, "
        "n_channels int, peak_abs bigint, mean_abs_milli bigint, ok boolean",
    )

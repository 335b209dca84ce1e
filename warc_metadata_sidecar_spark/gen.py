"""Deterministic synthetic data generator (seed=42) — FIXTURES.md shapes.

Renders the reference test fixtures (/root/reference/tests/*.warc — html_200,
dns, gif, revisit, arc_text, digest_multiples, empty_payload, soft404_page,
non_200_html) as rows of the `documents` table, plus the media blob table,
seed frontier and robots tables for the north-rule crawl engine.

Everything is a pure function of (seed, index): the generator never consults
wall-clock or RNG state shared across rows, so any slice of any scale
regenerates identically — that is what makes the local[8] vs local[32]
scaling runs byte-identical inputs, and crawl ordering reproducible.

Scale note: small scales build rows driver-side (pytest); large scales
build distributed from ``spark.range`` with the same per-index functions —
no driver bottleneck, no collect.
"""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark import schema

SEED = 42

_GIF_BYTES = b"GIF89a" + b"\x01\x00\x01\x00\x80\x00\x00" + b"\x00" * 25
_PNG_BYTES = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + b"\x00" * 24
_JPG_BYTES = b"\xff\xd8\xff\xe0\x00\x10JFIF" + b"\x00" * 22

_EN = (
    "the quick brown fox jumps over the lazy dog and it is a fine day for "
    "crawling the web with a distributed frontier that is polite to hosts"
)
_ES = (
    "el zorro marron salta sobre el perro y es un buen dia para rastrear la "
    "web con una cola de prioridad que es amable con los servidores"
)
_HTML_TMPL = (
    "<!DOCTYPE html><html><head><title>{title}</title></head>"
    "<body><p>{body}</p></body></html>"
)
_SOFT404_BODY = (
    "Sorry, the page you requested was not found. Error 404. "
    "The page does not exist or is no longer available."
)


def _sha1(data: bytes) -> str:
    return "sha1:" + hashlib.sha1(data).hexdigest().upper()


def _ts(i: int) -> dt.datetime:
    return dt.datetime(2021, 11, 11, 21, 11, 11, tzinfo=dt.timezone.utc) + dt.timedelta(
        seconds=i
    )


# ten archetypes, cycled by doc index — every FIXTURES.md archetype appears
# once per 10 rows at any scale.
_ARCHETYPES = [
    "html_200",
    "dns",
    "gif",
    "revisit",
    "arc_text",
    "digest_dup_a",
    "digest_dup_b",
    "empty_payload",
    "soft404_page",
    "non_200_html",
]


def _doc_row(i: int, text_scale: int = 1) -> dict:
    """One document row. `text_scale` repeats the body text to reach
    realistic web-page payload sizes (~3 KB at 24) for throughput runs —
    correctness tests use 1."""
    arch = _ARCHETYPES[i % 10]
    host_n = i % 50
    url = f"https://host{host_n:02d}.example.com/page/{i}"
    doc_id = f"<urn:uuid:{SEED:08x}-{i:012d}>"
    base = dict(
        doc_id=doc_id,
        url=url,
        warc_date=_ts(i),
        rec_type="response",
        warcinfo_id=f"<urn:uuid:warcinfo-{i // 100}>",
        http_status="200",
        is_arc=False,
        source_file=f"crawl-{i // 1000:05d}.warc.gz",
        payload_digest=None,
        spans=[],
    )

    def text_spans(text: str) -> list[dict]:
        # split into two spans to exercise multi-span ordering
        mid = len(text) // 2
        return [
            {"kind": "text", "text": text[:mid], "media_ref": None, "offset": 0},
            {"kind": "text", "text": text[mid:], "media_ref": None, "offset": mid},
        ]

    if arch == "html_200":
        body = (_EN if i % 20 < 10 else _ES) * text_scale
        html = _HTML_TMPL.format(title=f"Page {i}", body=body)
        base["spans"] = text_spans(html)
        base["payload_digest"] = _sha1(html.encode())
    elif arch == "dns":
        base["url"] = f"dns:host{host_n:02d}.example.com"
        text = f"20211111211111 1.2.3.{i % 255}"
        base["spans"] = text_spans(text)
        base["payload_digest"] = _sha1(text.encode())
    elif arch == "gif":
        ref = f"media://gif/{i % 7}"  # 7 distinct blobs → digest dedup on media too
        base["spans"] = [{"kind": "media", "text": None, "media_ref": ref, "offset": 0}]
        base["payload_digest"] = _sha1(_GIF_BYTES + bytes([i % 7]))
    elif arch == "revisit":
        base["rec_type"] = "revisit"
        base["spans"] = text_spans("revisited content")
        base["payload_digest"] = _sha1(b"revisit")
    elif arch == "arc_text":
        base["is_arc"] = True
        base["payload_digest"] = None
        base["warcinfo_id"] = None
        base["source_file"] = f"crawl-{i // 1000:05d}.arc.gz"
        base["spans"] = text_spans("plain text from an arc record " + _EN)
    elif arch in ("digest_dup_a", "digest_dup_b"):
        # analytics-beacon twins: many rows, 2 distinct digests per 10-block
        # pair-group of 40 (cf. tests/digest_multiples.warc)
        group = (i // 40) % 97
        which = 0 if arch == "digest_dup_a" else 1
        if which == 0:
            text = _HTML_TMPL.format(title=f"Beacon {group}", body=_EN * text_scale)
        else:
            text = f"__utm.gif beacon payload {group}"
        base["spans"] = text_spans(text)
        base["payload_digest"] = _sha1(f"beacon:{group}:{which}".encode())
    elif arch == "empty_payload":
        base["spans"] = []
        base["payload_digest"] = None
    elif arch == "soft404_page":
        html = _HTML_TMPL.format(title="404 Not Found", body=_SOFT404_BODY * text_scale)
        base["spans"] = text_spans(html)
        base["payload_digest"] = _sha1(html.encode())
    elif arch == "non_200_html":
        html = _HTML_TMPL.format(title=f"Gone {i}", body=_SOFT404_BODY * text_scale)
        base["spans"] = text_spans(html)
        base["http_status"] = "404"
        base["payload_digest"] = _sha1((html + "404").encode())
    return base


def documents(spark: SparkSession, n_rows: int = 100, text_scale: int = 1) -> DataFrame:
    """The documents table: driver-side for small n, spark.range for large."""
    if n_rows <= 10_000:
        rows = [_doc_row(i, text_scale) for i in range(n_rows)]
        return spark.createDataFrame(rows, schema.DOCUMENTS)

    # distributed: same per-index function applied executor-side
    def batch(iterator):
        import pandas as pd

        for pdf in iterator:
            out = pd.DataFrame([_doc_row(int(i), text_scale) for i in pdf["id"]])
            yield out

    return (
        spark.range(0, n_rows, 1, numPartitions=max(32, n_rows // 50_000))
        .mapInPandas(batch, schema.DOCUMENTS)
    )


_MP4_BYTES = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 20
_WAV_BYTES = b"RIFF\x24\x00\x00\x00WAVEfmt " + b"\x00" * 20


def media_rows() -> list[dict]:
    """The deterministic blob rows (shared with the DuckDB multimodal
    oracle, which rebuilds the same bytes from hex literals)."""
    rows = []
    for k in range(7):
        rows.append(
            {
                "media_ref": f"media://gif/{k}",
                "bytes": _GIF_BYTES + bytes([k]),
                "meta": {"media_type": "image", "width": 1, "height": 1, "duration_ms": None},
            }
        )
    rows.append(
        {
            "media_ref": "media://png/0",
            "bytes": _PNG_BYTES,
            "meta": {"media_type": "image", "width": 16, "height": 16, "duration_ms": None},
        }
    )
    rows.append(
        {
            "media_ref": "media://jpg/0",
            "bytes": _JPG_BYTES,
            "meta": {"media_type": "image", "width": 32, "height": 32, "duration_ms": None},
        }
    )
    rows.append(
        {
            "media_ref": "media://vid/0",
            "bytes": _MP4_BYTES,
            "meta": {"media_type": "video", "width": 64, "height": 64, "duration_ms": 3500},
        }
    )
    rows.append(
        {
            "media_ref": "media://wav/0",
            "bytes": _WAV_BYTES,
            "meta": {"media_type": "audio", "width": None, "height": None, "duration_ms": 2000},
        }
    )
    return rows


def media(spark: SparkSession) -> DataFrame:
    """Blob table for media_refs emitted by documents(). Content-addressed;
    bytes carry real magic numbers so sniffing works on content."""
    return spark.createDataFrame(media_rows(), schema.MEDIA)


# --- deterministic codec fixtures (real-decode oracle) ------------------------
#
# codec_rows() encodes CLOSED-FORM rasters/samples through the repo's own
# encoders; the DuckDB oracle recomputes the decoded features straight from
# the same closed form (generate_series + modular arithmetic), so the
# round-trip engine statement decode(encode(pixels)) is checked against an
# implementation that never sees a blob, an encoder, or the decoder.

CODEC_W, CODEC_H = 8, 8  # 192 samples: sums exact in float64, n a 3*2^k
CODEC_PALETTE = ((255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30))
CODEC_FRAMES, CODEC_RATE = 64, 8000  # power-of-two frames: dyadic features


def codec_pixel(m: int, y: int, x: int, ch: int) -> int:
    """The closed-form RGB raster: also rendered as SQL in the oracle."""
    return (m * 37 + y * 19 + x * 7 + ch * 3) % 256


def codec_sample(m: int, i: int, ch: int) -> int:
    """The closed-form 16-bit PCM sample: dyadic-exact features."""
    return ((m * 73 + i * 31 + ch * 17) % 4001) - 2000


def _rgb_raster(m: int) -> list[list[tuple[int, int, int]]]:
    return [
        [tuple(codec_pixel(m, y, x, c) for c in range(3)) for x in range(CODEC_W)]
        for y in range(CODEC_H)
    ]


def _enc_bmp24(rows: list[list[tuple[int, int, int]]]) -> bytes:
    import struct as st

    h, w = len(rows), len(rows[0])
    pad = (4 - (w * 3) % 4) % 4
    raster = b"".join(
        b"".join(bytes((p[2], p[1], p[0])) for p in r) + b"\x00" * pad
        for r in rows[::-1]  # bottom-up
    )
    hdr = b"BM" + st.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    hdr += st.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return hdr + raster


def _enc_p6(rows: list[list[tuple[int, int, int]]]) -> bytes:
    h, w = len(rows), len(rows[0])
    return (f"P6\n{w} {h}\n255\n").encode() + b"".join(
        bytes(p) for r in rows for p in r
    )


def _enc_tga(rows: list[list[tuple[int, int, int]]]) -> bytes:
    import struct as st

    h, w = len(rows), len(rows[0])
    hdr = bytes([0, 0, 2]) + b"\x00" * 9 + st.pack("<HH", w, h) + bytes([24, 0x20])
    return hdr + b"".join(bytes((p[2], p[1], p[0])) for r in rows for p in r)


def _enc_png(rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Color-type-2 PNG; scanline filters cycle 0..4 so every reverse
    branch of the decoder sits on the oracled path."""
    import struct as st
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return st.pack(">I", len(body)) + tag + body + st.pack(">I", zlib.crc32(tag + body))

    h, w = len(rows), len(rows[0])
    flat = [bytes(v for p in r for v in p) for r in rows]
    stride = w * 3

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    out, prior = b"", bytes(stride)
    for y, r in enumerate(flat):
        ft = y % 5
        if ft == 0:
            line = r
        elif ft == 1:
            line = bytes((r[x] - (r[x - 3] if x >= 3 else 0)) & 0xFF for x in range(stride))
        elif ft == 2:
            line = bytes((r[x] - prior[x]) & 0xFF for x in range(stride))
        elif ft == 3:
            line = bytes(
                (r[x] - (((r[x - 3] if x >= 3 else 0) + prior[x]) >> 1)) & 0xFF
                for x in range(stride)
            )
        else:
            line = bytes(
                (r[x] - paeth(r[x - 3] if x >= 3 else 0, prior[x],
                              prior[x - 3] if x >= 3 else 0)) & 0xFF
                for x in range(stride)
            )
        out += bytes([ft]) + line
        prior = r
    ihdr = st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(out))
        + chunk(b"IEND", b"")
    )


def _enc_gif(w: int, h: int, indices: list[int], palette=CODEC_PALETTE) -> bytes:
    """GIF89a, global color table, real LZW (Clear first, width growth)."""
    import struct as st

    bits = max(2, (len(palette) - 1).bit_length())
    clear, eoi = 1 << bits, (1 << bits) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code, width = eoi + 1, bits + 1
    acc = nbits = 0
    lzw = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    run = b""
    for i in indices:
        nxt = run + bytes([i])
        if nxt in table:
            run = nxt
            continue
        emit(table[run])
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        run = bytes([i])
    if run:
        emit(table[run])
    emit(eoi)
    if nbits:
        lzw.append(acc & 0xFF)

    pal = list(palette) + [(0, 0, 0)] * ((1 << bits) - len(palette))
    out = b"GIF89a" + st.pack("<HH", w, h) + bytes([0x80 | (bits - 1), 0, 0])
    out += bytes(v for p in pal for v in p)
    out += b"\x2c" + st.pack("<HHHH", 0, 0, w, h) + bytes([0, bits])
    for off in range(0, len(lzw), 255):
        out += bytes([len(lzw[off : off + 255])]) + bytes(lzw[off : off + 255])
    return out + b"\x00\x3b"


def _enc_wav(m: int) -> bytes:
    import struct as st

    pcm = b"".join(
        st.pack("<h", codec_sample(m, i, c))
        for i in range(CODEC_FRAMES)
        for c in range(2)
    )
    fmt = st.pack("<HHIIHH", 1, 2, CODEC_RATE, CODEC_RATE * 4, 4, 16)
    body = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
    body += b"data" + st.pack("<I", len(pcm)) + pcm
    return b"RIFF" + st.pack("<I", len(body)) + body


class _FlacW:
    """MSB-first bit writer for the FLAC fixture encoder."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.w(0, 8 - self.n)

    def bytes(self) -> bytes:
        assert self.n == 0, "unaligned read of the frame buffer"
        return bytes(self.buf)


def _sbits(v: int) -> int:
    """Minimum signed-bit width holding v (two's complement)."""
    return (v if v >= 0 else ~v).bit_length() + 1


def _flac_subenc(w: _FlacW, s: list[int], bps: int, bs: int, spec: dict) -> None:
    typ = spec["type"]
    wasted = spec.get("wasted", 0)
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in s), "wasted bits must divide"
        s = [v >> wasted for v in s]
    eb = bps - wasted
    mask = (1 << eb) - 1
    tcode = {"constant": 0, "verbatim": 1}.get(typ)
    if typ == "fixed":
        tcode = 8 + spec["order"]
    elif typ == "lpc":
        tcode = 32 + spec["order"] - 1
    w.w(0, 1)
    w.w(tcode, 6)
    if wasted:
        w.w(1, 1)
        w.w(1, wasted)  # (wasted-1) zeros then the terminating 1
    else:
        w.w(0, 1)
    if typ == "constant":
        assert len(set(s)) == 1
        w.w(s[0] & mask, eb)
        return
    if typ == "verbatim":
        for v in s:
            w.w(v & mask, eb)
        return
    order = spec["order"]
    for v in s[:order]:
        w.w(v & mask, eb)
    if typ == "lpc":
        coefs, shift = spec["coefs"], spec["shift"]
        prec = spec.get("prec", 15)
        w.w(prec - 1, 4)
        w.w(shift & 0x1F, 5)
        for c in coefs:
            w.w(c & ((1 << prec) - 1), prec)
    else:
        coefs, shift = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order], 0
    res = []
    for i in range(order, len(s)):
        acc = sum(c * s[i - 1 - j] for j, c in enumerate(coefs))
        res.append(s[i] - (acc >> shift))
    po = spec.get("po", 0)
    w.w(0, 2)  # residual method 0: 4-bit rice params
    w.w(po, 4)
    idx = 0
    for part in range(1 << po):
        n = (bs >> po) - (order if part == 0 else 0)
        chunk = res[idx : idx + n]
        idx += n
        if spec.get("escape"):
            rb = max((_sbits(v) for v in chunk), default=1)
            w.w(0xF, 4)
            w.w(rb, 5)
            for v in chunk:
                w.w(v & ((1 << rb) - 1), rb)
            continue
        u = [(v << 1) ^ (-1 if v < 0 else 0) for v in chunk]
        p = max(0, min(14, (max(u, default=0).bit_length() - 3)))
        w.w(p, 4)
        for uv in u:
            w.w(1, (uv >> p) + 1)  # unary quotient: q zeros then a 1
            if p:
                w.w(uv & ((1 << p) - 1), p)


_FLAC_SR_CODE = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}


def _enc_flac(
    channels: list[list[int]],
    rate: int,
    bps: int = 16,
    frames: list[tuple[int, str, list[dict]]] | None = None,
) -> bytes:
    """REAL (spec-conformant, CRC-carrying) FLAC encoder for fixtures:
    STREAMINFO + fixed-blocksize frames. `frames` consumes the sample
    stream in order as (blocksize, mode, per-stored-channel subframe
    specs); mode selects the stereo decorrelation (indep / left_side /
    right_side / mid_side); specs exercise constant / verbatim / fixed /
    lpc subframes, rice partitions, escape partitions, and wasted bits.
    Lossless by construction — the decode test's ground truth is sample
    equality with the closed form, independent of both codecs' internals."""
    from warc_metadata_sidecar_spark.operators.multimodal import _crc8, _crc16

    nch = len(channels)
    total = len(channels[0])
    if frames is None:
        frames = [(total, "indep", [{"type": "verbatim"}] * nch)]
    bsizes = [f[0] for f in frames]
    si = (min(bsizes) << 16) | max(bsizes)
    si = (si << 48)  # min/max framesize unknown
    si = (si << 20) | rate
    si = (si << 3) | (nch - 1)
    si = (si << 5) | (bps - 1)
    si = (si << 36) | total
    si <<= 128  # md5 unknown
    out = bytearray(b"fLaC")
    out += b"\x80" + (34).to_bytes(3, "big") + si.to_bytes(34, "big")
    sr_code = _FLAC_SR_CODE.get(rate)
    pos = 0
    for fno, (bs, mode, specs) in enumerate(frames):
        assert fno < 128, "fixture frame numbers stay single-byte UTF-8"
        seg = [ch[pos : pos + bs] for ch in channels]
        pos += bs
        if mode == "indep":
            stored, sbps, chan_code = seg, [bps] * nch, nch - 1
        elif mode == "left_side":
            l, r = seg
            stored = [l, [a - b for a, b in zip(l, r)]]
            sbps, chan_code = [bps, bps + 1], 8
        elif mode == "right_side":
            l, r = seg
            stored = [[a - b for a, b in zip(l, r)], r]
            sbps, chan_code = [bps + 1, bps], 9
        elif mode == "mid_side":
            l, r = seg
            stored = [
                [(a + b) >> 1 for a, b in zip(l, r)],
                [a - b for a, b in zip(l, r)],
            ]
            sbps, chan_code = [bps, bps + 1], 10
        else:
            raise ValueError(mode)
        w = _FlacW()
        w.w(0x3FFE, 14)
        w.w(0, 2)  # reserved + fixed-blocksize strategy
        w.w(6, 4)  # block size: 8-bit value-1 follows the number
        w.w(sr_code if sr_code else 13, 4)  # 13: 16-bit Hz follows
        w.w(chan_code, 4)
        w.w({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        w.w(0, 1)
        w.w(fno, 8)  # UTF-8 coded frame number, single byte
        w.w(bs - 1, 8)
        if not sr_code:
            w.w(rate, 16)
        w.w(_crc8(w.bytes()), 8)
        for ch_s, ch_bps, spec in zip(stored, sbps, specs):
            _flac_subenc(w, ch_s, ch_bps, bs, spec)
        w.align()
        w.w(_crc16(w.bytes()), 16)
        out += w.bytes()
    return bytes(out)


CODEC_JPEG_WH = 16  # 2x2 grid of flat 8x8 tiles -> 4 one-block MCUs


def codec_jpeg_ycc(m: int, t: int) -> tuple[int, int, int]:
    """Closed-form flat (Y, Cb, Cr) for tile t (0..3) of JPEG fixture m —
    also rendered as SQL arithmetic in the decode-real oracle."""
    return (
        (m * 37 + t * 53) % 256,
        (m * 29 + t * 71) % 256,
        (m * 31 + t * 97) % 256,
    )


def codec_jpeg_rgb(m: int, t: int) -> tuple[int, int, int]:
    """The RGB every pixel of tile t decodes to: the JFIF color transform
    with floor(x+0.5) rounding on the exactly-recovered integer samples
    (flat DC-only blocks under an all-ones quant table are lossless)."""
    import math

    y, cb, cr = codec_jpeg_ycc(m, t)

    def c8(x: float) -> int:
        return min(255, max(0, int(math.floor(x + 0.5))))

    return (
        c8(y + 1.402 * (cr - 128)),
        c8(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
        c8(y + 1.772 * (cb - 128)),
    )


def _enc_jpeg_dc(m: int) -> bytes:
    """Baseline JPEG over the closed-form tiles: 16x16, 3 components 4:4:4,
    all-ones quant table, minimal canonical Huffman tables (DC categories
    0..11 at 4 bits, AC holding only EOB at 1 bit), flat DC-only blocks.
    F(0,0) = 8*(v-128) is integer-exact under q=1, so the decode is
    bit-lossless and the oracle can state the pixels in closed form."""
    import struct as st

    buf = bytearray()
    acc = nb = 0

    def put(v: int, n: int) -> None:
        nonlocal acc, nb
        for i in range(n - 1, -1, -1):
            acc = (acc << 1) | ((v >> i) & 1)
            nb += 1
            if nb == 8:
                buf.append(acc)
                if acc == 0xFF:
                    buf.append(0x00)  # byte stuffing
                acc = nb = 0

    preds = [0, 0, 0]
    for t in range(4):  # MCU row-major == tile index
        ycc = codec_jpeg_ycc(m, t)
        for ci in range(3):
            dc = 8 * (ycc[ci] - 128)
            diff, preds[ci] = dc - preds[ci], dc
            s = abs(diff).bit_length()
            put(s, 4)  # DC table: code for category s IS s (4 bits)
            if s:
                put(diff if diff > 0 else diff + (1 << s) - 1, s)
            put(0, 1)  # AC table: EOB is the single 1-bit code '0'
    if nb:
        put((1 << (8 - nb)) - 1, 8 - nb)  # pad with 1s

    out = b"\xff\xd8"
    out += b"\xff\xdb" + st.pack(">H", 2 + 1 + 64) + b"\x00" + bytes([1] * 64)
    out += (
        b"\xff\xc0"
        + st.pack(">H", 2 + 6 + 9)
        + bytes([8])
        + st.pack(">HH", CODEC_JPEG_WH, CODEC_JPEG_WH)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
    )
    out += (
        b"\xff\xc4"
        + st.pack(">H", 2 + 17 + 12)
        + bytes([0x00, 0, 0, 0, 12] + [0] * 12)
        + bytes(range(12))
    )
    out += (
        b"\xff\xc4"
        + st.pack(">H", 2 + 17 + 1)
        + bytes([0x10, 1] + [0] * 15 + [0x00])
    )
    out += b"\xff\xda" + st.pack(">H", 2 + 1 + 6 + 3) + bytes(
        [3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]
    )
    return out + bytes(buf) + b"\xff\xd9"


def _enc_jpeg_header(w: int, h: int) -> bytes:
    """Minimal structurally-valid JPEG prefix: SOI + APP0/JFIF + DQT stub +
    SOF0 carrying the dims (the only part a header probe reads) + EOI."""
    import struct as st

    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = bytes([0]) + bytes(64)
    sof = st.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out = b"\xff\xd8"
    out += b"\xff\xe0" + st.pack(">H", 2 + len(app0)) + app0
    out += b"\xff\xdb" + st.pack(">H", 2 + len(dqt)) + dqt
    out += b"\xff\xc0" + st.pack(">H", 2 + len(sof)) + sof
    return out + b"\xff\xd9"


def _enc_webp_l(w: int, h: int) -> bytes:
    """WebP VP8L header: 14-bit (w-1)/(h-1) packed after the 0x2F tag."""
    import struct as st

    bits = (w - 1) | ((h - 1) << 14)
    body = b"\x2f" + st.pack("<I", bits) + bytes(8)
    chunk = b"VP8L" + st.pack("<I", len(body)) + body
    return b"RIFF" + st.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _enc_webp_x(w: int, h: int) -> bytes:
    """WebP VP8X extended header: 24-bit little-endian canvas-1 dims."""
    import struct as st

    body = bytes(4) + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    chunk = b"VP8X" + st.pack("<I", len(body)) + body
    return b"RIFF" + st.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk + bytes(16)


def _enc_mp3(n_frames: int, mpeg1: bool = True) -> bytes:
    """Chained constant-bitrate Layer III frames (headers + zero payload):
    MPEG1 44100 Hz 128 kbps (frame 417 B, 1152 spf) or MPEG2 22050 Hz
    64 kbps (frame 208 B, 576 spf), joint-stereo mode, ID3v2 prefix."""
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x14" + bytes(0x14)
    if mpeg1:
        hdr, flen = bytes([0xFF, 0xFB, 0x90, 0x40]), 144 * 128000 // 44100
    else:
        hdr, flen = bytes([0xFF, 0xF3, 0x80, 0x40]), 72 * 64000 // 22050
    return id3 + (hdr + bytes(flen - 4)) * n_frames


def _enc_flac_meta(rate: int, nch: int, total: int) -> bytes:
    """fLaC magic + last-flagged STREAMINFO block (34 bytes, real
    bitfield layout: rate(20) | ch-1(3) | bps-1(5) | total_samples(36))."""
    v = (rate << 44) | ((nch - 1) << 41) | (15 << 36) | total
    info = bytes(10) + v.to_bytes(8, "big") + bytes(16)
    return b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info


def _enc_ogg(codec: str, rate: int, nch: int, granule: int, preskip: int = 0) -> bytes:
    """Two-page OGG stream: identification-header page (Vorbis or Opus)
    + a final page carrying the terminal granule position."""
    import struct as st

    if codec == "vorbis":
        ident = (
            b"\x01vorbis" + st.pack("<IB", 0, nch) + st.pack("<I", rate)
            + bytes(12) + b"\xb8\x01"
        )
    else:
        ident = b"OpusHead" + bytes([1, nch]) + st.pack("<H", preskip) + st.pack("<I", rate) + bytes(3)

    def page(ptype: int, gran: int, seq: int, body: bytes) -> bytes:
        return (
            b"OggS\x00" + bytes([ptype]) + st.pack("<q", gran)
            + st.pack("<II", 1, seq) + bytes(4) + bytes([1, len(body)]) + body
        )

    return page(0x02, 0, 0, ident) + page(0x04, granule, 1, b"\x00")


def _enc_mp4(w: int, h: int, timescale: int, duration: int, version: int = 0) -> bytes:
    """Minimal ISO-BMFF: ftyp + moov(mvhd + trak(tkhd)) with real field
    layouts (ISO/IEC 14496-12): mvhd v0/v1 timescale+duration, tkhd
    16.16 fixed-point dims. v0 totals 232 bytes, v1 totals 256 —
    structural constants the probe-oracle bitrate slots divide out."""
    import struct as st

    def box(tag: bytes, body: bytes) -> bytes:
        return st.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", b"isom" + st.pack(">I", 0))
    if version:
        mvhd_t = st.pack(">BxxxQQIQ", 1, 0, 0, timescale, duration)
        tkhd_t = st.pack(">BxxxQQI4xQ", 1, 0, 0, 1, duration)
    else:
        mvhd_t = st.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
        tkhd_t = st.pack(">BxxxIII4xI", 0, 0, 0, 1, duration)
    tail = st.pack(">IH10x", 0x00010000, 0x0100) + _MP4_MATRIX + bytes(24) + st.pack(">I", 2)
    mvhd = box(b"mvhd", mvhd_t + tail)
    tkhd = box(
        b"tkhd",
        tkhd_t + bytes(8) + st.pack(">HHHH", 0, 0, 0, 0) + _MP4_MATRIX
        + st.pack(">II", w << 16, h << 16),
    )
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd))


_MP4_MATRIX = (
    b"\x00\x01\x00\x00" + bytes(12) + b"\x00\x01\x00\x00" + bytes(12)
    + b"\x40\x00\x00\x00"
)


def _enc_mkv(w: int, h: int, dur_scaled: float, scale_ns: int = 1_000_000) -> bytes:
    """Minimal Matroska/WebM EBML: header(DocType webm) + Segment(
    Info(TimestampScale, float64 Duration) + Tracks(TrackEntry(
    TrackType video, Video(PixelWidth, PixelHeight)))). All sizes are
    1-byte varints (bodies < 127 B); duration_s = dur_scaled * scale_ns
    / 1e9."""
    import struct as st

    def el(eid: bytes, body: bytes) -> bytes:
        return eid + bytes([0x80 | len(body)]) + body

    header = el(b"\x1a\x45\xdf\xa3", el(b"\x42\x82", b"webm"))
    info = el(
        b"\x15\x49\xa9\x66",
        el(b"\x2a\xd7\xb1", scale_ns.to_bytes(3, "big"))
        + el(b"\x44\x89", st.pack(">d", dur_scaled)),
    )
    video = el(
        b"\xe0",
        el(b"\xb0", w.to_bytes(2, "big")) + el(b"\xba", h.to_bytes(2, "big")),
    )
    tracks = el(b"\x16\x54\xae\x6b", el(b"\xae", el(b"\x83", b"\x01") + video))
    return header + el(b"\x18\x53\x80\x67", info + tracks)


def probe_rows() -> list[dict]:
    """Deterministic blobs for the container-metadata probe oracle: every
    compressed-container family whose PAYLOAD decode is stubbed but whose
    HEADER structure is public (JPEG SOF, WebP VP8L/VP8X, MP3 frames, FLAC
    STREAMINFO, OGG Vorbis/Opus) plus native wav/png controls. All
    parameters are closed-form in m so the oracle recomputes them as
    arithmetic without seeing a blob."""
    rows = []

    def add(kind: str, m: int, blob: bytes, media_type: str) -> None:
        rows.append(
            {
                "media_ref": f"probe://{kind}/{m}",
                "bytes": blob,
                "meta": {"media_type": media_type, "width": None, "height": None, "duration_ms": None},
            }
        )

    for m in (0, 1):
        add("jpeg", m, _enc_jpeg_header(40 + m, 30 + m), "image")
    for m in (2, 3):
        add("webpl", m, _enc_webp_l(100 + m, 50 + m), "image")
    for m in (4, 5):
        add("webpx", m, _enc_webp_x(200 + m, 80 + m), "image")
    for m in (6, 7):
        add("mp3", m, _enc_mp3(20 + m, mpeg1=(m == 6)), "audio")
    add("flac", 8, _enc_flac_meta(22050, 2, 66150), "audio")
    add("oggv", 9, _enc_ogg("vorbis", 44100, 2, 88200), "audio")
    add("opus", 10, _enc_ogg("opus", 48000, 2, 96312, preskip=312), "audio")
    add("wav", 11, _enc_wav(11), "audio")
    add("png", 12, _enc_png(_rgb_raster(12)), "image")
    add("mp4", 13, _enc_mp4(320, 180, 600, 2700, version=0), "video")
    add("mp4", 14, _enc_mp4(640, 360, 90000, 630000, version=1), "video")
    add("webm", 15, _enc_mkv(427, 240, 4500.0), "video")
    return rows


def probe_media(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(probe_rows(), schema.MEDIA)


def codec_rows() -> list[dict]:
    """Deterministic blobs for the real-decode oracle: two of each raster
    container (PNG/GIF/BMP/P6/TGA) over the closed-form pixels, two WAVs
    and two FLACs over the closed-form samples (FLAC is lossless, so both
    share the oracle's sample arithmetic), two baseline JPEGs over the
    closed-form DC-only tiles (lossless under an all-ones quant table)."""
    rows = []
    for m, (kind, enc) in enumerate(
        (k, e)
        for k, e in (
            ("png", _enc_png), ("bmp", _enc_bmp24), ("p6", _enc_p6), ("tga", _enc_tga)
        )
        for _ in range(2)
    ):
        rows.append(
            {
                "media_ref": f"codec://{kind}/{m}",
                "bytes": enc(_rgb_raster(m)),
                "meta": {"media_type": "image", "width": CODEC_W, "height": CODEC_H, "duration_ms": None},
            }
        )
    for m in (8, 9):
        idx = [(m + y + x) % len(CODEC_PALETTE) for y in range(CODEC_H) for x in range(CODEC_W)]
        rows.append(
            {
                "media_ref": f"codec://gif/{m}",
                "bytes": _enc_gif(CODEC_W, CODEC_H, idx),
                "meta": {"media_type": "image", "width": CODEC_W, "height": CODEC_H, "duration_ms": None},
            }
        )
    for m in (10, 11):
        rows.append(
            {
                "media_ref": f"codec://wav/{m}",
                "bytes": _enc_wav(m),
                "meta": {"media_type": "audio", "width": None, "height": None, "duration_ms": CODEC_FRAMES * 1000 // CODEC_RATE},
            }
        )
    for m in (12, 13):
        rows.append(
            {
                "media_ref": f"codec://jpeg/{m}",
                "bytes": _enc_jpeg_dc(m),
                "meta": {"media_type": "image", "width": CODEC_JPEG_WH, "height": CODEC_JPEG_WH, "duration_ms": None},
            }
        )
    for m in (14, 15):
        # the SAME closed-form PCM as the WAV rows, FLAC-encoded (lossless,
        # so the oracle's per-m sample arithmetic transfers verbatim); the
        # two frames exercise mid/side + fixed/LPC and left/side +
        # verbatim/escape paths of the decoder
        ch = [
            [codec_sample(m, i, c) for i in range(CODEC_FRAMES)] for c in range(2)
        ]
        frames = [
            (32, "mid_side", [
                {"type": "fixed", "order": 2, "po": 1},
                {"type": "lpc", "order": 2, "coefs": [2, -1], "shift": 0, "prec": 5},
            ]),
            (32, "left_side", [
                {"type": "verbatim"},
                {"type": "fixed", "order": 1, "escape": True},
            ]),
        ]
        rows.append(
            {
                "media_ref": f"codec://flac/{m}",
                "bytes": _enc_flac(ch, CODEC_RATE, 16, frames),
                "meta": {"media_type": "audio", "width": None, "height": None, "duration_ms": CODEC_FRAMES * 1000 // CODEC_RATE},
            }
        )
    for m in (16, 17):
        # WebP lossless (VP8L) over the SAME closed-form raster as the
        # PNG/BMP rows — m=17 additionally routes through SUBTRACT_GREEN
        rows.append(
            {
                "media_ref": f"codec://webp/{m}",
                "bytes": _enc_webp_pixels(
                    CODEC_W, CODEC_H, _rgb_raster(m), subtract_green=(m == 17)
                ),
                "meta": {"media_type": "image", "width": CODEC_W, "height": CODEC_H, "duration_ms": None},
            }
        )
    return rows


def codec_media(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(codec_rows(), schema.MEDIA)


PHASH_W, PHASH_H = 36, 32  # 36 = lcm-friendly for 9 dHash cols (4 px/box)


def phash_pixel(m: int, y: int, x: int, c: int) -> int:
    """Closed-form RGB raster for the perceptual-hash fixtures — also
    rendered as SQL in the DuckDB oracle. m and m+5 share a base raster
    (s = m % 5); the m>=5 twin flips a 4x12 top-left patch by +128 mod 256,
    landing the twins at dHash Hamming 0-2 while distinct bases sit at
    >=23 of 64 (measured; the quadratic y*y/x*x terms decorrelate bases)."""
    s = m % 5
    v = (s * 53 + (s + 2) * (y * 13 + x * 7) + y * y * 11 + x * x * 5 + c * 29) % 256
    if m >= 5 and y < 4 and x < 12:
        v = (v + 128) % 256
    return v


def _phash_raster(m: int) -> list[list[tuple[int, int, int]]]:
    return [
        [tuple(phash_pixel(m, y, x, c) for c in range(3)) for x in range(PHASH_W)]
        for y in range(PHASH_H)
    ]


def phash_rows() -> list[dict]:
    """Ten 36x32 rasters (five bases + five near-dup twins) cycled through
    four REAL lossless encoders so the hash rides the decode path, not the
    closed form."""
    encs = (("bmp", _enc_bmp24), ("p6", _enc_p6), ("png", _enc_png), ("tga", _enc_tga))
    rows = []
    for m in range(10):
        kind, enc = encs[m % len(encs)]
        rows.append(
            {
                "media_ref": f"phash://{kind}/{m}",
                "bytes": enc(_phash_raster(m)),
                "meta": {
                    "media_type": "image",
                    "width": PHASH_W,
                    "height": PHASH_H,
                    "duration_ms": None,
                },
            }
        )
    return rows


def phash_media(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(phash_rows(), schema.MEDIA)


AFP_FRAMES, AFP_RATE = 272, 8000  # 17 x 16-frame windows -> 64 delta bits


def afp_sample(m: int, i: int, c: int) -> int:
    """Closed-form 16-bit PCM for the audio-fingerprint fixtures — also
    rendered as SQL in the DuckDB oracle. m%4 picks the base stream (the
    s*i cross term decorrelates bases: non-related fingerprints measure
    >=20 of 64 bits apart); m in 4..7 perturbs four band-0 samples of
    window 0 (+900), landing the twins at Hamming 1; m=8,9 repeat bases
    0,1 EXACTLY for the cross-codec (WAV vs FLAC) duplicate pairs."""
    s = m % 4
    v = ((s * 91 + i * 37 + c * 17 + s * i * 5) % 4001) - 2000
    if 4 <= m < 8 and i < 16 and i % 4 == 0:
        v += 900
    return v


def _afp_pcm(m: int) -> list[list[int]]:
    return [[afp_sample(m, i, c) for i in range(AFP_FRAMES)] for c in range(2)]


def _enc_wav_pcm(channels: list[list[int]], rate: int) -> bytes:
    """Generic 16-bit stereo RIFF/WAVE for arbitrary sample lists."""
    import struct as st

    nch = len(channels)
    pcm = b"".join(
        st.pack("<h", channels[c][i])
        for i in range(len(channels[0]))
        for c in range(nch)
    )
    fmt = st.pack("<HHIIHH", 1, nch, rate, rate * 2 * nch, 2 * nch, 16)
    body = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
    body += b"data" + st.pack("<I", len(pcm)) + pcm
    return b"RIFF" + st.pack("<I", len(body)) + body


def afp_rows() -> list[dict]:
    """Ten PCM streams: four bases + four perturbed twins as WAV, plus two
    FLAC re-encodes of bases 0,1 with IDENTICAL samples (FLAC is lossless,
    so the fingerprint must land at Hamming 0 across containers)."""
    rows = []
    for m in range(8):
        rows.append(
            {
                "media_ref": f"afp://wav/{m}",
                "bytes": _enc_wav_pcm(_afp_pcm(m), AFP_RATE),
                "meta": {
                    "media_type": "audio",
                    "width": None,
                    "height": None,
                    "duration_ms": AFP_FRAMES * 1000 // AFP_RATE,
                },
            }
        )
    for m in (8, 9):
        frames = [
            (136, "indep", [{"type": "verbatim"}] * 2),
            (136, "indep", [{"type": "verbatim"}] * 2),
        ]
        rows.append(
            {
                "media_ref": f"afp://flac/{m}",
                "bytes": _enc_flac(_afp_pcm(m), AFP_RATE, 16, frames),
                "meta": {
                    "media_type": "audio",
                    "width": None,
                    "height": None,
                    "duration_ms": AFP_FRAMES * 1000 // AFP_RATE,
                },
            }
        )
    return rows


def afp_media(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(afp_rows(), schema.MEDIA)


def unigram_pieces() -> dict[str, float]:
    """Deterministic unigram piece table for the segmentation fixtures:
    every lowercase letter/digit (distinct log-probs so DP ties are
    structural, not accidental) plus common English subwords. Shared by
    the engine query and the sequential oracle twin — the same literal
    float64 values add in the same order on both sides."""
    pieces: dict[str, float] = {}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
        pieces[ch] = -8.0 - i * 0.01
    for i, ch in enumerate("0123456789_"):
        pieces[ch] = -9.0 - i * 0.01
    pieces.update(
        {
            "th": -3.2, "he": -3.5, "in": -3.4, "er": -3.6, "an": -3.55,
            "re": -3.7, "on": -3.65, "at": -3.75, "es": -3.8, "ed": -3.85,
            "or": -3.9, "ar": -3.95, "st": -3.97, "le": -3.99, "is": -4.01,
            "ing": -3.0, "ion": -3.1, "ent": -3.2, "ati": -3.3, "ter": -3.35,
            "the": -2.5, "and": -2.6, "for": -2.7, "with": -2.8, "data": -2.9,
        }
    )
    return pieces


def seed_rows(n_seeds: int = 20) -> list[dict]:
    """Pure-Python seed frontier rows (no Spark) — shared by seed_frontier
    and the simulator-backed crawl_rounds oracle."""
    rows = []
    for s in range(n_seeds):
        i = s * 10  # html_200 archetype rows
        url = f"https://host{i % 50:02d}.example.com/page/{i}"
        rows.append(
            {
                "url": url,
                "canonical_url": None,
                "host": None,
                "host_salt": None,
                "priority": None,
                "discovery_round": 0,
                "seq": s,
                "parent_url": None,
            }
        )
    return rows


def seed_frontier(spark: SparkSession, n_seeds: int = 20, num_salts: int = 8) -> DataFrame:
    """Round-0 frontier: seed URLs drawn from the documents URL space so the
    simulated fetch join (N5) resolves. priority is a pure function of the
    URL — crawl ordering is a data property, never wall-clock."""
    return spark.createDataFrame(seed_rows(n_seeds), schema.FRONTIER)


def robots_rows(n_hosts: int = 50) -> list[dict]:
    """Pure-Python robots rows (no Spark) — shared by robots() and the
    simulator-backed crawl_rounds oracle."""
    rows = []
    for h in range(n_hosts):
        host = f"host{h:02d}.example.com"
        rows.append(
            {
                "host": host,
                "path_prefix": None,
                "allowed": True,
                "crawl_delay_s": 1 + h % 3,
                "budget": 1 + h % 4,
            }
        )
        if h % 7 == 0:
            rows.append(
                {
                    "host": host,
                    "path_prefix": "/page/13",
                    "allowed": False,
                    "crawl_delay_s": 1 + h % 3,
                    "budget": 1 + h % 4,
                }
            )
    return rows


def robots(spark: SparkSession, n_hosts: int = 50) -> DataFrame:
    """Synthetic robots table: deterministic per-host budget + a disallowed
    prefix for every 7th host (exercises deny), varying budgets (1..4)."""
    return spark.createDataFrame(robots_rows(n_hosts), schema.ROBOTS)


# --- WebP-lossless (VP8L) fixture encoder ------------------------------------
# Spec-conformant bitstream writer exercising every decoder path: simple
# and normal prefix codes, color cache, LZ77 (absolute distance codes),
# meta prefix codes, and all four transforms. Lossless by construction —
# decode tests assert pixel identity with the source raster.


class _VW:
    """LSB-first bit writer (+ MSB-first code writer) for VP8L."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v: int, n: int) -> None:  # value bits, LSB-first
        self.acc |= (v & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def code(self, c: int, n: int) -> None:  # prefix code, MSB-first
        for k in range(n - 1, -1, -1):
            self.w((c >> k) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self.buf)
        if self.n:
            out.append(self.acc & 0xFF)
        return bytes(out)


def _vp8l_lengths(freqs: dict[int, int], cap: int) -> dict[int, int]:
    """Huffman code lengths from frequencies, capped at `cap`; falls back
    to the balanced complete code if the tree exceeds the cap."""
    import heapq
    import itertools

    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    tie = itertools.count()
    heap = [(f, next(tie), (s,)) for s, f in sorted(freqs.items())]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in syms}
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, next(tie), g1 + g2))
    if max(depth.values()) <= cap:
        return depth
    # balanced complete fallback: n_short symbols at L-1, rest at L
    k = len(syms)
    lng = (k - 1).bit_length()
    n_short = (1 << lng) - k
    return {
        s: (lng - 1 if i < n_short else lng) for i, s in enumerate(syms)
    }


def _vp8l_canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits), canonical RFC 1951 assignment."""
    code = 0
    out: dict[int, tuple[int, int]] = {}
    prev_len = 0
    for l, s in sorted((l, s) for s, l in lengths.items()):
        code <<= l - prev_len
        out[s] = (code, l)
        code += 1
        prev_len = l
    return out


def _vp8l_write_code(
    bw: _VW, lengths: dict[int, int], alphabet: int
) -> dict[int, tuple[int, int]]:
    """Emit one prefix code (simple when <=2 symbols, else the full
    code-length-code path with all 19 CL lengths and no max_symbol cap)."""
    syms = sorted(lengths)
    if len(syms) <= 2:
        bw.w(1, 1)  # simple
        bw.w(len(syms) - 1, 1)
        s0 = syms[0]
        if s0 <= 1:
            bw.w(0, 1)
            bw.w(s0, 1)
        else:
            bw.w(1, 1)
            bw.w(s0, 8)
        if len(syms) == 2:
            bw.w(syms[1], 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    bw.w(0, 1)  # normal
    seq = [lengths.get(s, 0) for s in range(alphabet)]
    clf: dict[int, int] = {}
    for v in seq:
        clf[v] = clf.get(v, 0) + 1
    cl_lengths = _vp8l_lengths(clf, 7)
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    bw.w(15, 4)  # num_codes = 19
    for s in order:
        bw.w(cl_lengths.get(s, 0), 3)
    bw.w(0, 1)  # no max_symbol cap: all `alphabet` lengths follow
    cl_codes = _vp8l_canonical(cl_lengths)
    if len(cl_codes) == 1:
        cl_codes = {next(iter(cl_codes)): (0, 0)}  # single: zero bits
    for v in seq:
        c, n = cl_codes[v]
        bw.code(c, n)
    return _vp8l_canonical(lengths)


def _vp8l_write_image(bw: _VW, w: int, h: int, tokens, cache_bits: int = 0,
                      groups_of=None, meta_bits: int = 0, level0: bool = False) -> None:
    """One spatially-coded image from a token stream. tokens: list of
    ('lit', argb) / ('copy', length, dist_code) / ('cache', idx).
    groups_of(x, y) -> group id enables meta prefix codes (level0 only)."""
    bw.w(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.w(cache_bits, 4)
    n_groups = 1
    if level0:
        if groups_of is not None:
            bw.w(1, 1)
            bw.w(meta_bits - 2, 3)
            hw = (w + (1 << meta_bits) - 1) >> meta_bits
            hh = (h + (1 << meta_bits) - 1) >> meta_bits
            hpix = [
                ("lit", 0xFF000000 | (groups_of(hx << meta_bits, hy << meta_bits) << 8))
                for hy in range(hh)
                for hx in range(hw)
            ]
            _vp8l_write_image(bw, hw, hh, hpix)
            n_groups = max(
                groups_of(hx << meta_bits, hy << meta_bits)
                for hy in range(hh)
                for hx in range(hw)
            ) + 1
        else:
            bw.w(0, 1)
    # token -> per-group symbol frequencies
    cache_size = (1 << cache_bits) if cache_bits else 0
    galpha = 256 + 24 + cache_size

    def gid(pos_x, pos_y):
        return groups_of(pos_x, pos_y) if groups_of is not None else 0

    freqs = [
        [dict() for _ in range(5)] for _ in range(n_groups)
    ]  # g, r, b, a, d

    def bump(g, which, sym):
        f = freqs[g][which]
        f[sym] = f.get(sym, 0) + 1

    def len_to_prefix(v):
        # inverse of _prefix_value: find (code, extra_bits, extra_val)
        if v <= 4:
            return v - 1, 0, 0
        nbits = (v - 1).bit_length() - 1
        rest = v - 1 - (1 << nbits)
        if rest < (1 << (nbits - 1)):
            return 2 * nbits, nbits - 1, rest
        return 2 * nbits + 1, nbits - 1, rest - (1 << (nbits - 1))

    pos = 0
    for tok in tokens:
        x, y = pos % w, pos // w
        g = gid(x, y)
        if tok[0] == "lit":
            px = tok[1]
            bump(g, 0, (px >> 8) & 0xFF)
            bump(g, 1, (px >> 16) & 0xFF)
            bump(g, 2, px & 0xFF)
            bump(g, 3, (px >> 24) & 0xFF)
            pos += 1
        elif tok[0] == "copy":
            lcode, _, _ = len_to_prefix(tok[1])
            dcode, _, _ = len_to_prefix(tok[2])
            bump(g, 0, 256 + lcode)
            bump(g, 4, dcode)
            pos += tok[1]
        else:
            bump(g, 0, 280 + tok[1])
            pos += 1
    assert pos == w * h, f"tokens cover {pos} != {w * h}"
    codes = []
    for g in range(n_groups):
        cg = []
        for which, alpha in ((0, galpha), (1, 256), (2, 256), (3, 256), (4, 40)):
            f = freqs[g][which] or {0: 1}  # unused code: 1-symbol placeholder
            cg.append(
                _vp8l_write_code(bw, _vp8l_lengths(f, 15), alpha)
            )
        codes.append(cg)
    pos = 0
    for tok in tokens:
        x, y = pos % w, pos // w
        cg = codes[gid(x, y)]
        if tok[0] == "lit":
            px = tok[1]
            bw.code(*cg[0][(px >> 8) & 0xFF])
            bw.code(*cg[1][(px >> 16) & 0xFF])
            bw.code(*cg[2][px & 0xFF])
            bw.code(*cg[3][(px >> 24) & 0xFF])
            pos += 1
        elif tok[0] == "copy":
            lcode, lx, lv = len_to_prefix(tok[1])
            bw.code(*cg[0][256 + lcode])
            bw.w(lv, lx)
            dcode, dx, dv = len_to_prefix(tok[2])
            bw.code(*cg[4][dcode])
            bw.w(dv, dx)
            pos += tok[1]
        else:
            bw.code(*cg[0][280 + tok[1]])
            pos += 1


def _enc_webp_pixels(
    w: int,
    h: int,
    rgb,
    subtract_green: bool = False,
    tokens_fn=None,
    cache_bits: int = 0,
    transforms_extra=None,
) -> bytes:
    """RIFF/VP8L bytes for an HxW list-of-rows of (r, g, b). Default is
    an all-literals stream; subtract_green applies that transform;
    tokens_fn(argb_list) -> token list lets tests inject LZ77/cache
    tokens; transforms_extra(bw, argb) -> argb may write predictor /
    color / palette transform data and return the transformed stream."""
    import struct as st

    argb = [
        0xFF000000 | (r << 16) | (g << 8) | b for row in rgb for (r, g, b) in row
    ]
    bw = _VW()
    bw.w(w - 1, 14)
    bw.w(h - 1, 14)
    bw.w(0, 1)  # alpha hint
    bw.w(0, 3)  # version
    eff_w = w
    if transforms_extra is not None:
        argb, eff_w = transforms_extra(bw, argb)
    if subtract_green:
        bw.w(1, 1)
        bw.w(2, 2)  # SUBTRACT_GREEN
        argb = [
            (px & 0xFF00FF00)
            | ((((px >> 16) & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF) << 16
            | ((px & 0xFF) - ((px >> 8) & 0xFF)) & 0xFF
            for px in argb
        ]
    bw.w(0, 1)  # end of transforms
    tokens = (
        tokens_fn(argb) if tokens_fn is not None else [("lit", px) for px in argb]
    )
    _vp8l_write_image(bw, eff_w, h, tokens, cache_bits=cache_bits, level0=True)
    body = b"\x2f" + bw.bytes()
    if len(body) & 1:
        body += b"\x00"
    chunk = b"VP8L" + st.pack("<I", len(body)) + body
    return b"RIFF" + st.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def cdc_segment(k: int) -> bytes:
    """Closed-form byte segment for the CDC fixtures (also replayed by
    the oracle twin): length 600 + 97*k, byte i = (k*37 + i*11 + i*i mod
    17) mod 256."""
    return bytes(
        (k * 37 + i * 11 + (i * i) % 17) % 256 for i in range(600 + 97 * k)
    )


def cdc_rows() -> list[dict]:
    """Four blobs over shared closed-form segments: blob0 = s0+s1,
    blob1 = s0+s2, blob2 = s1+s2+s0, blob3 = s3 — cross-blob duplication
    at SUB-blob granularity (whole-blob digests all differ), which
    content-defined chunking must recover after each segment joint."""
    segs = [cdc_segment(k) for k in range(4)]
    blobs = [
        segs[0] + segs[1],
        segs[0] + segs[2],
        segs[1] + segs[2] + segs[0],
        segs[3],
    ]
    return [
        {
            "media_ref": f"cdc://blob/{m}",
            "bytes": b,
            "meta": {"media_type": "binary", "width": None, "height": None,
                     "duration_ms": None},
        }
        for m, b in enumerate(blobs)
    ]


def cdc_media(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(cdc_rows(), schema.MEDIA)

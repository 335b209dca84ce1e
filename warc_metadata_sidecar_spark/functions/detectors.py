"""Vectorized metadata detectors (the reference's S3-S7 expression library).

The reference runs four third-party detectors per record inside a Python
loop: fido + python-magic for mime/puid (warc_metadata_sidecar.py:42-88),
chardet for charset (:91-102), pycld2 for language (:105-126), and the
soft404 model (:129-131). This module re-implements each as a deterministic,
dependency-free pure function and exposes ONE struct-returning pandas UDF
(`detect_all`) so the whole detector stage is a single Arrow-batched Python
stage per distinct payload.

Why dependency-free: the sandbox image does not ship fido/magic/chardet/
pycld2/soft404, and the engine's correctness gates (pytest + DuckDB oracle)
need bit-deterministic outputs. Each `_detect_*` function is a seam: swap in
the pinned third-party library (requirements.txt of the reference) for
production fidelity — the UDF shape, gating, and serialization do not change.

Scale notes: detectors run once per *distinct* payload digest (operators/
sidecar.py dedups first — the distributed analog of DIGEST_CACHE at
warc_metadata_sidecar.py:39,231-246). Heavy state (signature tables, language
profiles) is module-level, so each executor builds it once per worker process
— mirroring the single `ExtendFido()` instance at warc_metadata_sidecar.py:197.
"""

from __future__ import annotations

import json
import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from warc_metadata_sidecar_spark.schema import DETECTED

# --- mime / puid: magic-byte + content sniffing (cf. fido signature match,
# warc_metadata_sidecar.py:61-73, and magic.from_buffer :81-82) -------------

# (prefix, fido_mime, magic_mime, puid) — first match wins, like fido taking
# matches[0] (warc_metadata_sidecar.py:69). PUIDs are the PRONOM ids fido's
# signature file assigns to these formats.
_BINARY_SIGNATURES: list[tuple[bytes, str, str, str]] = [
    (b"GIF89a", "image/gif", "image/gif", "fmt/4"),
    (b"GIF87a", "image/gif", "image/gif", "fmt/3"),
    (b"\x89PNG\r\n\x1a\n", "image/png", "image/png", "fmt/11"),
    (b"\xff\xd8\xff", "image/jpeg", "image/jpeg", "fmt/43"),
    (b"%PDF-", "application/pdf", "application/pdf", "fmt/14"),
    (b"PK\x03\x04", "application/zip", "application/zip", "x-fmt/263"),
    (b"\x1f\x8b", "application/gzip", "application/gzip", "x-fmt/266"),
    (b"ID3", "audio/mpeg", "audio/mpeg", "fmt/134"),
    (b"\xff\xfb", "audio/mpeg", "audio/mpeg", "fmt/134"),  # bare MP3 frame sync
    (b"\x00\x00\x00\x18ftyp", "video/mp4", "video/mp4", "fmt/199"),
    (b"BM", "image/bmp", "image/bmp", "fmt/116"),
    (b"II*\x00", "image/tiff", "image/tiff", "fmt/353"),
    (b"MM\x00*", "image/tiff", "image/tiff", "fmt/353"),
    (b"\x00\x00\x01\x00", "image/vnd.microsoft.icon", "image/vnd.microsoft.icon", "x-fmt/418"),
    (b"fLaC", "audio/flac", "audio/flac", "fmt/279"),
    (b"OggS", "audio/ogg", "audio/ogg", "fmt/203"),
    (b"7z\xbc\xaf\x27\x1c", "application/x-7z-compressed", "application/x-7z-compressed", "fmt/258"),
    (b"Rar!\x1a\x07", "application/vnd.rar", "application/vnd.rar", "x-fmt/264"),
    (b"BZh", "application/x-bzip2", "application/x-bzip2", "x-fmt/268"),
    (b"SQLite format 3\x00", "application/vnd.sqlite3", "application/vnd.sqlite3", "fmt/729"),
    (b"wOFF", "font/woff", "font/woff", "fmt/1044"),
    # r4 tranche: another dozen first-match signatures
    (b"wOF2", "font/woff2", "font/woff2", "fmt/1045"),
    (b"OTTO", "font/otf", "font/otf", "fmt/1093"),
    (b"\xfd7zXZ\x00", "application/x-xz", "application/x-xz", "fmt/1098"),
    (b"\x28\xb5\x2f\xfd", "application/zstd", "application/zstd", "fmt/1477"),
    (b"MThd", "audio/midi", "audio/midi", "x-fmt/230"),
    (b"{\\rtf", "application/rtf", "application/rtf", "fmt/355"),
    (b"%!PS", "application/postscript", "application/postscript", "x-fmt/91"),
    (b"CWS", "application/x-shockwave-flash", "application/x-shockwave-flash", "fmt/108"),
    (b"FWS", "application/x-shockwave-flash", "application/x-shockwave-flash", "fmt/108"),
    (b"\xff\xf3", "audio/mpeg", "audio/mpeg", "fmt/134"),  # more MP3 frame syncs
    (b"\xff\xf2", "audio/mpeg", "audio/mpeg", "fmt/134"),
    # r5 tranche: another dozen-plus first-match signatures
    (b"8BPS", "image/vnd.adobe.photoshop", "image/vnd.adobe.photoshop", "x-fmt/92"),
    (b"MZ", "application/x-dosexec", "application/x-dosexec", "fmt/899"),
    (b"\x7fELF", "application/x-executable", "application/x-executable", "fmt/688"),
    (b"\xca\xfe\xba\xbe", "application/java-vm", "application/java-vm", "x-fmt/415"),
    (b"\x00\x01\x00\x00\x00", "font/ttf", "font/ttf", "x-fmt/453"),
    (b"ttcf", "font/collection", "font/collection", "fmt/1107"),
    (b"FLV\x01", "video/x-flv", "video/x-flv", "x-fmt/382"),
    (b"\x30\x26\xb2\x75\x8e\x66\xcf\x11", "video/x-ms-asf", "video/x-ms-asf", "fmt/132"),
    (b"#!AMR\n", "audio/amr", "audio/amr", "fmt/663"),
    (b".snd", "audio/basic", "audio/basic", "x-fmt/136"),
    (b"\xed\xab\xee\xdb", "application/x-rpm", "application/x-rpm", "fmt/795"),
    # r6 tranche. WARC carries its well-known PRONOM id; for the rest the
    # mime is certain but the PUID is left None rather than fabricated —
    # the serialization omits Preservation-Identifier exactly as the
    # reference does when fido yields no id (warc_metadata_sidecar.py:
    # 67-73,160-161); production fido restores them through the seam.
    (b"WARC/1.0", "application/warc", "application/warc", "fmt/289"),
    (b"WARC/1.1", "application/warc", "application/warc", "fmt/1355"),
    (b"PAR1", "application/vnd.apache.parquet", "application/vnd.apache.parquet", None),
    (b"Obj\x01", "application/avro", "application/avro", None),
    (b"\x00asm", "application/wasm", "application/wasm", None),
    (b"\xd4\xc3\xb2\xa1", "application/vnd.tcpdump.pcap", "application/vnd.tcpdump.pcap", None),
    (b"\x0a\x0d\x0d\x0a", "application/x-pcapng", "application/x-pcapng", None),
    (b"\x04\x22\x4d\x18", "application/x-lz4", "application/x-lz4", None),
    (b"MSCF", "application/vnd.ms-cab-compressed", "application/vnd.ms-cab-compressed", None),
    (b"hsqs", "application/x-squashfs", "application/x-squashfs", None),
    (b"AT&TFORM", "image/vnd.djvu", "image/vnd.djvu", None),
    # r6c tail: UNIX compress (.Z), HTML Help, Windows cursor (the ICO
    # sibling with image type 2) — PUID None per the r6 convention
    (b"\x1f\x9d", "application/x-compress", "application/x-compress", None),
    (b"ITSF\x03", "application/vnd.ms-htmlhelp", "application/vnd.ms-htmlhelp", None),
    (b"\x00\x00\x02\x00", "image/x-cursor", "image/x-cursor", None),
    # r7 tranche (VERDICT r6 task 5): more image/container/executable
    # signatures. Known PRONOM ids where certain, None otherwise (the r6
    # convention — never fabricated).
    (b"\x00\x00\x00\x0cjP  \r\n\x87\n", "image/jp2", "image/jp2", "x-fmt/392"),
    (b"\xabKTX 11\xbb\r\n\x1a\n", "image/ktx", "image/ktx", None),
    (b"qoif", "image/qoi", "image/qoi", None),
    (b"\x76\x2f\x31\x01", "image/x-exr", "image/x-exr", None),
    (b"BPG\xfb", "image/bpg", "image/bpg", None),
    (b"farbfeld", "image/farbfeld", "image/farbfeld", None),
    (b"DDS ", "image/vnd.ms-dds", "image/vnd.ms-dds", None),
    (b"Cr24", "application/x-chrome-extension", "application/x-chrome-extension", None),
    (b"LZIP", "application/x-lzip", "application/x-lzip", None),
    (b"SZDD\x88\xf0\x27\x33", "application/x-ms-compress-szdd", "application/x-ms-compress-szdd", None),
    (b"\xfe\xed\xfa\xce", "application/x-mach-binary", "application/x-mach-binary", None),
    (b"\xfe\xed\xfa\xcf", "application/x-mach-binary", "application/x-mach-binary", None),
    (b"\xcf\xfa\xed\xfe", "application/x-mach-binary", "application/x-mach-binary", None),
    (b"\xc5\xd0\xd3\xc6", "application/postscript", "application/postscript", "fmt/124"),
    (b"\x4c\x00\x00\x00\x01\x14\x02\x00", "application/x-ms-shortcut", "application/x-ms-shortcut", None),
]

# XMP pdfaid part/conformance -> the PRONOM PDF/A family ids; the XMP
# packet sits inside the sniffing head only for files whose metadata
# object comes first — when present it outranks the %PDF version byte,
# the way fido's PDF/A signatures outrank the base PDF match
_PDFA_PUIDS = {
    (b"1", b"A"): "fmt/95", (b"1", b"B"): "fmt/354",
    (b"2", b"A"): "fmt/476", (b"2", b"B"): "fmt/477", (b"2", b"U"): "fmt/478",
    (b"3", b"A"): "fmt/479", (b"3", b"B"): "fmt/480", (b"3", b"U"): "fmt/481",
}
_PDFA_PART_RE = re.compile(rb"pdfaid:part(?:>|=\")(\d)")
_PDFA_CONF_RE = re.compile(rb"pdfaid:conformance(?:>|=\")([ABU])")

# OLE2 directory-entry stream names (UTF-16LE) — the fallback when the
# first-sector sub-format marker misses: for small compound files the
# directory sector lands inside the 1 KiB head
_OLE_STREAM_NAMES: list[tuple[bytes, str, str]] = [
    ("WordDocument".encode("utf-16-le"), "application/msword", "fmt/40"),
    ("Workbook".encode("utf-16-le"), "application/vnd.ms-excel", "fmt/61"),
    ("PowerPoint Document".encode("utf-16-le"), "application/vnd.ms-powerpoint", "fmt/126"),
]

# ar archives: '!<arch>\n' is both Unix ar and Debian packages — the first
# member name 'debian-binary' marks a .deb (a container sub-sniff like the
# zip/OLE2 rules)
_AR_MAGIC = b"!<arch>\n"
_HEX_RE = re.compile(rb"[0-9A-Fa-f]{8}")

# tar has no leading magic: 'ustar' sits at offset 257 (within the 1 KiB
# sniffing head), checked before the linear scan. Version bytes are
# writer-dependent — POSIX 'ustar\x00' + '00', GNU old-format 'ustar  \x00',
# some writers NUL-pad — so match 'ustar' + a NUL-or-space 6th byte and
# ignore the version (ADVICE r5: the old 6-byte slice could never equal
# the 7-byte GNU literal, so real GNU tars read as octet-stream).
_TAR_MAGIC_OFFSET = 257
_TAR_MAGIC = b"ustar"

# PDF version byte ('%PDF-1.x') -> the per-version PRONOM id fido assigns
_PDF_VERSION_PUIDS = {
    b"1.0": "fmt/14", b"1.1": "fmt/15", b"1.2": "fmt/16", b"1.3": "fmt/17",
    b"1.4": "fmt/18", b"1.5": "fmt/19", b"1.6": "fmt/20", b"1.7": "fmt/276",
    b"2.0": "fmt/1129",
}

# OLE2 compound files: the sub-format marker sits at offset 512 (the first
# sector) — readable because the sniffing head is 1 KiB
_OLE_SIG = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_OLE_KINDS: list[tuple[bytes, str, str]] = [
    (b"\xec\xa5", "application/msword", "fmt/40"),
    (b"\x09\x08", "application/vnd.ms-excel", "fmt/61"),
    (b"\xa0\x46\x1d\xf0", "application/vnd.ms-powerpoint", "fmt/126"),
    (b"\x00\x6e\x1e\xf0", "application/vnd.ms-powerpoint", "fmt/126"),
    (b"\x0f\x00\xe8\x03", "application/vnd.ms-powerpoint", "fmt/126"),
]

# zip containers: OOXML/EPUB/JAR identified by early member names, the way
# fido's container signatures inspect the zip directory. The EPUB rule is
# checked FIRST and as an independent marker PAIR ('mimetype' member +
# 'application/epub+zip' value both within the head) — ADVICE r4: a local
# header with a non-empty extra field breaks the contiguous
# 'mimetypeapplication/epub+zip' adjacency, and an EPUB's META-INF/ member
# would then misclassify it as a JAR under the later rule.
_ZIP_KINDS: list[tuple[bytes, str, str]] = [
    (b"word/", "application/vnd.openxmlformats-officedocument.wordprocessingml.document", "fmt/412"),
    (b"xl/", "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet", "fmt/214"),
    (b"ppt/", "application/vnd.openxmlformats-officedocument.presentationml.presentation", "fmt/215"),
    (b"META-INF/", "application/java-archive", "x-fmt/412"),
    (b"[Content_Types].xml", "application/vnd.openxmlformats", "fmt/189"),
]

# ISO BMFF 'ftyp' major brands that are not plain MP4
_FTYP_BRANDS: list[tuple[bytes, str, str]] = [
    (b"avif", "image/avif", "fmt/1757"),
    (b"heic", "image/heic", "fmt/1220"),
    (b"heix", "image/heic", "fmt/1220"),
    (b"M4A ", "audio/mp4", "fmt/596"),
    (b"qt  ", "video/quicktime", "x-fmt/384"),
]

# RIFF is a container: the format lives at bytes 8-12
_RIFF_KINDS: dict[bytes, tuple[str, str]] = {
    b"WAVE": ("audio/x-wav", "fmt/6"),
    b"WEBP": ("image/webp", "fmt/566"),
    b"AVI ": ("video/x-msvideo", "fmt/5"),
}

_HTML_RE = re.compile(r"(?i)<!doctype\s+html|<html[\s>]")
_SVG_RE = re.compile(r"(?i)<svg[\s>]")
_XML_RE = re.compile(r"^\s*<\?xml")
_JSON_RE = re.compile(r'^\s*[{\[]\s*["{\[\]}]?')


def sniff_mime(text: str | None, head: bytes | None) -> tuple[str | None, str | None, str | None]:
    """Return (fido_mime, magic_mime, puid) for one payload.

    `head` is the leading bytes of a binary/media payload (magic-number
    sniffing, 1 KiB — the fido BOF buffer analog); `text` is the
    concatenated text spans (content sniffing). Mirrors find_mime_and_puid
    (warc_metadata_sidecar.py:76-88): both engines report, fido
    additionally yields the PUID. Container formats get a sub-sniff before
    the linear signature scan, the way fido's container signatures refine
    the outer match: RIFF kind at 8..12, OLE2 sub-format marker at 512,
    zip early member names (OOXML/EPUB/JAR), PDF version byte, ISO-BMFF
    ftyp major brand, EBML DocType.
    """
    if head:
        if head.startswith(b"RIFF"):
            kind = _RIFF_KINDS.get(head[8:12])
            if kind is not None:
                return kind[0], kind[0], kind[1]
            return "audio/x-wav", "audio/x-wav", "fmt/6"  # bare RIFF fallback
        if head.startswith(b"FORM") and head[8:12] == b"AIFF":
            return "audio/x-aiff", "audio/x-aiff", "x-fmt/135"
        if head.startswith(_OLE_SIG):
            marker = head[512:516]
            for sig, mime, puid in _OLE_KINDS:
                if marker.startswith(sig):
                    return mime, mime, puid
            # fallback: directory-entry stream names (r7) — catches DOC/XLS/
            # PPT whose content sector isn't first, before conceding fmt/111
            scan = head[512:]
            for name, mime, puid in _OLE_STREAM_NAMES:
                if name in scan:
                    return mime, mime, puid
            return "application/x-ole-storage", "application/x-ole-storage", "fmt/111"
        if head.startswith(b"PK\x03\x04"):
            # whole-head window: a large local-header extra field (zip
            # allows 64 KiB; alignment tools write hundreds of bytes) can
            # push the epub marker past any small prefix — a 256-byte
            # window just moved the ADVICE-r4 misclassification cliff
            if b"mimetype" in head and b"application/epub+zip" in head:
                return "application/epub+zip", "application/epub+zip", "fmt/483"
            for marker, mime, puid in _ZIP_KINDS:
                if marker in head:
                    return mime, mime, puid
            return "application/zip", "application/zip", "x-fmt/263"
        if head.startswith(b"%PDF-"):
            # PDF/A outranks the version byte when the XMP pdfaid packet is
            # within the head (r7); part alone (no conformance) reports the
            # B-level id, the archival floor
            mp = _PDFA_PART_RE.search(head)
            if mp:
                mc = _PDFA_CONF_RE.search(head)
                puid = _PDFA_PUIDS.get((mp.group(1), mc.group(1) if mc else b"B"))
                if puid:
                    return "application/pdf", "application/pdf", puid
            puid = _PDF_VERSION_PUIDS.get(head[5:8], "fmt/276")
            return "application/pdf", "application/pdf", puid
        if head.startswith(b"\x1aE\xdf\xa3"):  # EBML: DocType picks the kind
            if b"webm" in head[:64]:
                return "video/webm", "video/webm", "fmt/573"
            return "video/x-matroska", "video/x-matroska", "fmt/569"
        if head.startswith(_AR_MAGIC):
            # .deb is an ar archive whose first member is 'debian-binary'
            if head[8:21] == b"debian-binary":
                return (
                    "application/vnd.debian.binary-package",
                    "application/vnd.debian.binary-package",
                    None,
                )
            return "application/x-archive", "application/x-archive", None
        if head[128:132] == b"DICM":  # DICOM: 128-byte preamble then 'DICM'
            return "application/dicom", "application/dicom", None
        if head[:6] in (b"070701", b"070702") and _HEX_RE.match(head[6:14]):
            # cpio newc/crc: the whole 110-byte header is ASCII hex, so the
            # magic alone would false-positive on date-like text ('070701
            # report...'); requiring the next hex field keeps text out
            return "application/x-cpio", "application/x-cpio", None
        if (
            head[_TAR_MAGIC_OFFSET:_TAR_MAGIC_OFFSET + 5] == _TAR_MAGIC
            and head[_TAR_MAGIC_OFFSET + 5:_TAR_MAGIC_OFFSET + 6] in (b"\x00", b" ")
        ):
            return "application/x-tar", "application/x-tar", "x-fmt/265"
        for sig, fido_mime, magic_mime, puid in _BINARY_SIGNATURES:
            if head.startswith(sig):
                return fido_mime, magic_mime, puid
        if head[4:12].startswith(b"ftyp"):
            for brand, mime, puid in _FTYP_BRANDS:
                if head[8:12] == brand:
                    return mime, mime, puid
            return "video/mp4", "video/mp4", "fmt/199"
    if text:
        # binary magic first, like the reference sniffing raw payload bytes
        # (find_mime_and_puid gets the BytesIO regardless of content kind):
        # ascii-representable signatures (GIF8, %PDF, PK..) survive the
        # utf-8-replace decode of an ingested binary payload
        prefix = text[:16].encode("latin-1", "replace")
        for sig, fido_mime, magic_mime, puid in _BINARY_SIGNATURES:
            if prefix.startswith(sig):
                return fido_mime, magic_mime, puid
        if _HTML_RE.search(text[:4096]):
            return "text/html", "text/html", "fmt/471"
        if _SVG_RE.search(text[:2048]):
            return "image/svg+xml", "image/svg+xml", "fmt/91"
        if _XML_RE.match(text[:256]):
            return "text/xml", "text/xml", "fmt/101"
        if _JSON_RE.match(text[:256]):
            return "application/json", "application/json", "fmt/817"
        return "text/plain", "text/plain", "x-fmt/111"
    if head:
        # unknown binary: magic still answers (octet-stream), fido does not —
        # same asymmetry as the reference (fido_mime may be None, :67-73).
        return None, "application/octet-stream", None
    return None, None, None


# --- charset: deterministic chardet stand-in (warc_metadata_sidecar.py:91-102)
#
# chardet's UniversalDetector runs on BYTES; the engine's spans are str
# (decoded utf-8-replace at ingest), so the ladder keys on the artifacts
# that decode leaves behind. Confidence values are chardet's own ladder:
# BOM probers return 1.0, the sure ascii case 1.0, the UTF-8 prober 0.99
# once enough multibyte sequences confirm (0.7525 early), and the
# single-byte western prober ~0.73 — the exact constants the reference's
# golden values carry (warc_metadata_sidecar.py:99-101, tests :61-64).

_REPLACEMENT = "�"
# Shift-JIS second bytes land in printable ascii 0x40-0x7E: the
# utf-8-replace decode leaves �X pairs, where EUC-JP (both bytes
# 0xA1-0xFE) leaves pure replacement runs
_SJIS_PAIR_RE = re.compile("�[@-~]")
# accidental VALID 2-byte decodes: legacy byte pairs that happen to form
# UTF-8 sequences survive the replace decode as real chars in
# U+0080-U+07FF; their low 6 bits ARE the original continuation byte —
# the kana-adjacency fingerprint key of the r5 sub-ladder
_TWO_BYTE_RE = re.compile("[\u0080-\u07ff]")
# cp1252 typographic punctuation artifacts: the 0x92 contraction
# apostrophe (don�t) and 0x91-0x94 quote PAIRS flanked by whitespace.
# Kept narrow on purpose — 've' would match na�ve, and an unanchored
# pair pattern would match any two accented letters in one word span
# (br�l�e), misreading latin-1 accents as punctuation.
_CP1252_RE = re.compile(r"[A-Za-z]�(?:s|t|ll|re)\b|(?:^|\s)�\w[\w .,-]{0,40}�(?=\s|[.,;:!?]|$)")


# --- charset on RAW BYTES (VERDICT r5 #2): the reference runs chardet on
# the raw payload byte stream (warc_metadata_sidecar.py:91-102). When the
# ingest carries a `charset_head` (the first 8 KiB of a payload that is NOT
# valid UTF-8 — sources/warc_ingest.py), this ladder probes real bytes and
# the decode-artifact ladder below becomes the fallback. Byte-level probing
# makes the post-decode-undecidable cases decidable: KOI8-R vs windows-1251
# (identical artifact profiles, split here by the case-band statistic),
# Big5 vs GB18030 (split by frequent-character markers under each decode),
# katakana-only Shift-JIS (full-width kana decode directly).

# frequent prose characters per Chinese variant — the tiny frequency-model
# analog of chardet's language models. The byte encodings differ (的 is
# B5C4 in GB2312 but AABA in Big5), so counting these after decoding under
# EACH codec splits the two: real GB text decoded as Big5 is marker-free
# garbage and vice versa.
_GB_MARKERS = set("的是在不了有人我他这个为与国来上们时大地中就")
_BIG5_MARKERS = set("的是在不了有人我他這個為與國來上們時大地中就")
# cp1258-specific Vietnamese codepoints: the horn/bar/breve vowels plus
# the five COMBINING tone marks cp1258 uses instead of precomposed forms
# (grave, acute, tilde, hook-above, dot-below)
_VIET_MARKERS = set("ưƯơƠđĐăĂ") | {chr(c) for c in (0x300, 0x301, 0x303, 0x309, 0x323)}


def _try_decode(raw: bytes, codec: str) -> str | None:
    """Strict decode; a failure within the last 4 bytes is treated as head
    truncation (an 8 KiB cut can land mid-character) and retried on the
    prefix. Any earlier failure means the bytes are NOT this encoding."""
    try:
        return raw.decode(codec)
    except UnicodeDecodeError as e:
        if e.start >= len(raw) - 4 and e.start > 0:
            try:
                return raw[: e.start].decode(codec)
            except UnicodeDecodeError:
                return None
        return None


def _script_shares(s: str) -> tuple[float, float, float]:
    """(fullwidth_kana, hanzi, hangul) shares among non-ascii chars."""
    kana = hanzi = hangul = non_ascii = 0
    for ch in s:
        o = ord(ch)
        if o < 0x80:
            continue
        non_ascii += 1
        if 0x3040 <= o <= 0x30FF:
            kana += 1
        elif 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
            hanzi += 1
        elif 0xAC00 <= o <= 0xD7A3:
            hangul += 1
    if not non_ascii:
        return 0.0, 0.0, 0.0
    return kana / non_ascii, hanzi / non_ascii, hangul / non_ascii


_THAI_COMBINING = frozenset(
    list(range(0x0E34, 0x0E3B)) + list(range(0x0E47, 0x0E4F)) + [0x0E31]
)
_THAI_CONSONANTS = frozenset(range(0x0E01, 0x0E2F))


def _thai_orthography_ok(s: str) -> bool:
    """Real Thai prose carries combining vowels/tone marks at high density
    (~1 per 6 chars) and essentially every mark legally follows a consonant
    (or stacks on another mark). CJK double-byte text decoded as tis-620
    reads as Thai LETTERS (thai-share can hit 1.0 — measured 0.97 hanzi
    the other way too) but its marks are sparse and land after random
    bases: measured mark-legality 0.25-0.5 and density <= 0.03 on Big5/GB/
    Hebrew bytes vs 1.0 / 0.17 on real Thai — so the rung keys on the
    ORTHOGRAPHY, not the repertoire."""
    marks = legal = thai_chars = 0
    prev = None
    for ch in s:
        o = ord(ch)
        if 0x0E00 <= o <= 0x0E7F:
            thai_chars += 1
        if o in _THAI_COMBINING:
            marks += 1
            if prev is not None and (
                prev in _THAI_CONSONANTS or prev in _THAI_COMBINING
            ):
                legal += 1
        prev = o
    if not thai_chars or marks < 3:
        return False
    return legal / marks >= 0.9 and marks / thai_chars >= 0.08


def _block_share(s: str, lo: int, hi: int) -> float:
    """Share of chars in the [lo, hi] Unicode block among non-ascii chars
    — the single-script rung statistic (Hebrew/Thai/Greek)."""
    non_ascii = hit = 0
    for ch in s:
        o = ord(ch)
        if o < 0x80:
            continue
        non_ascii += 1
        if lo <= o <= hi:
            hit += 1
    return hit / non_ascii if non_ascii else 0.0


def _cyrillic_case_score(s: str) -> tuple[float, float]:
    """(cyrillic_share_among_non_ascii, lowercase_share_among_cyrillic) —
    the chardet-style case-band statistic: KOI8-R puts lowercase at
    0xC0-0xDF and windows-1251 at 0xE0-0xFF, so decoding prose (which is
    predominantly lowercase) under the WRONG codec yields mostly-UPPERCASE
    Cyrillic. The codec whose decode reads as lowercase prose wins."""
    cyr = lower = non_ascii = 0
    for ch in s:
        o = ord(ch)
        if o < 0x80:
            continue
        non_ascii += 1
        if 0x0400 <= o <= 0x04FF:
            cyr += 1
            if "а" <= ch <= "я" or ch == "ё":
                lower += 1
    if not non_ascii:
        return 0.0, 0.0
    return cyr / non_ascii, (lower / cyr) if cyr else 0.0


def detect_charset_bytes(raw: bytes | None) -> tuple[str | None, float]:
    """chardet-shaped detection on RAW payload bytes. Rule ladder, most
    structural evidence first; every rung is deterministic. Confidence
    constants mirror the artifact ladder (BOM/ascii 1.0, MBCS 0.99,
    single-byte 0.73 — chardet's own rungs)."""
    if not raw:
        return None, 0.0
    if raw.startswith(b"\xef\xbb\xbf"):
        return "UTF-8-SIG", 1.0
    # UTF-32 BOMs BEFORE UTF-16: FF FE 00 00 is the UTF-32LE BOM but
    # prefix-matches the UTF-16LE BOM (a U+0000 first char is the only
    # UTF-16 reading — not text)
    if raw.startswith(b"\xff\xfe\x00\x00") or raw.startswith(b"\x00\x00\xfe\xff"):
        return "UTF-32", 1.0
    if raw.startswith(b"\xff\xfe") or raw.startswith(b"\xfe\xff"):
        return "UTF-16", 1.0
    if raw.count(0) * 3 > len(raw) and len(raw) >= 8:
        # BOM-less NUL-interleave fingerprint (r7 rung): WHERE the zeros
        # sit determines width and endianness for ascii-dominant text —
        # UTF-32LE frames are x 0 0 0, UTF-32BE 0 0 0 x, UTF-16LE puts
        # zeros at odd offsets, UTF-16BE at even. Mixed/high-plane text
        # still reports the generic UTF-16 rung.
        s = raw[:8192]
        frames = len(s) // 4
        q = [sum(1 for i in range(p, frames * 4, 4) if s[i] == 0) for p in range(4)]
        if frames and min(q[1], q[2], q[3]) > 0.7 * frames and q[0] < 0.3 * frames:
            return "UTF-32LE", 1.0
        if frames and min(q[0], q[1], q[2]) > 0.7 * frames and q[3] < 0.3 * frames:
            return "UTF-32BE", 1.0
        even = sum(1 for i in range(0, len(s), 2) if s[i] == 0)
        odd = sum(1 for i in range(1, len(s), 2) if s[i] == 0)
        if odd > 3 * (even + 1):
            return "UTF-16LE", 1.0
        if even > 3 * (odd + 1):
            return "UTF-16BE", 1.0
        return "UTF-16", 1.0
    # ISO-2022 escape-sequence family BEFORE the utf-8/ascii rung: these
    # encodings are 7-bit ASCII-clean (the shift sequences are the only
    # marker), so the ascii rung would otherwise claim them. Purely
    # structural: ESC $ B / ESC $ @ = JIS X 0208 shift-in (r6 rung).
    head2022 = raw[:8192]
    if b"\x1b$B" in head2022 or b"\x1b$@" in head2022:
        return "ISO-2022-JP", 0.99
    if b"\x1b$)C" in head2022:
        return "ISO-2022-KR", 0.99
    if b"\x1b$)A" in head2022 or b"\x1b$)G" in head2022:
        return "ISO-2022-CN", 0.99
    utf8 = _try_decode(raw, "utf-8")
    if utf8 is not None:
        if all(b < 0x80 for b in raw):
            return "ascii", 1.0
        extra = len(raw) - len(utf8)
        return ("utf-8", 0.99) if extra >= 8 else ("utf-8", 0.7525)
    # --- legacy encodings: the bytes are NOT utf-8 ---
    sample = raw[:8192]
    # Japanese first: full-width kana under a valid decode is the strongest
    # signal (GB/Big5 text decoded as Shift-JIS yields only half-width
    # soup, excluded from the share on purpose; GB2312's own A4/A5 kana
    # rows make euc-jp-decoded CHINESE text kana-free).
    sjis = _try_decode(sample, "shift_jis")
    if sjis is not None:
        kana, hanzi, _ = _script_shares(sjis)
        if kana >= 0.05 and kana + hanzi >= 0.5:
            return "SHIFT_JIS", 0.99
    euc = _try_decode(sample, "euc_jp")
    if euc is not None:
        kana, hanzi, _ = _script_shares(euc)
        if kana >= 0.05 and kana + hanzi >= 0.5:
            return "EUC-JP", 0.99
    # Chinese BEFORE Korean: GB2312 pairs are structurally valid EUC-KR
    # (hangul rows B0-C8 overlap GB hanzi leads), so marker evidence — the
    # codec whose decode reads as prose — must outrank bare decode validity.
    # Korean text under gb18030 decodes to marker-free hanzi garbage, so
    # the ordering costs Korean nothing.
    big5 = _try_decode(sample, "big5")
    gb = _try_decode(sample, "gb18030")
    n_big5 = sum(1 for ch in big5 if ch in _BIG5_MARKERS) if big5 else 0
    n_gb = sum(1 for ch in gb if ch in _GB_MARKERS) if gb else 0
    if max(n_big5, n_gb) >= 2:
        winner, s = ("Big5", big5) if n_big5 > n_gb else ("GB18030", gb)
        _, hanzi, _ = _script_shares(s)
        if hanzi >= 0.3:
            return winner, 0.99
    # Korean: real Korean prose is nearly ALL hangul among its non-ascii
    # (0.8 bar — Chinese text decoded as EUC-KR lands in a hangul/hanja
    # MIX across rows B0-F7 and stays under it)
    kr = _try_decode(sample, "euc_kr")
    if kr is not None:
        _, _, hangul = _script_shares(kr)
        if hangul >= 0.8:
            return "EUC-KR", 0.99
    # kanji-only Shift-JIS (no kana to key on): accept when the competing
    # CJK decodes all failed or read as marker-free garbage
    if sjis is not None and n_big5 < 2 and n_gb < 2:
        _, hanzi, _ = _script_shares(sjis)
        if hanzi >= 0.5:
            return "SHIFT_JIS", 0.99
    # Vietnamese (r7 rung), BEFORE the run-adjacency gate: cp1258 spells
    # tones as COMBINING marks and its accents sit isolated inside ascii
    # words, so Vietnamese text often FAILS the adjacency gate below — and
    # when it passes, the Cyrillic case-band would claim its 0xE0-0xFF
    # bytes. The gate is cp1258-SPECIFIC codepoints (horn/bar/breve vowels
    # + the five combining tone marks) among the non-ascii decode:
    # Vietnamese prose measures ~0.6, the worst counterexample (Greek)
    # 0.18 — every other single-byte script spells those positions as
    # plain Latin accents or fails the strict decode (Shift-JIS leads).
    viet = _try_decode(sample, "cp1258")
    if viet is not None:
        non_ascii = [ch for ch in viet if ord(ch) > 0x7F]
        if non_ascii:
            vshare = sum(1 for ch in non_ascii if ch in _VIET_MARKERS) / len(non_ascii)
            if vshare >= 0.25:
                return "windows-1258", 0.73
    # Cyrillic single-byte: gated on high-byte RUN ADJACENCY — Cyrillic
    # words are unbroken multi-byte runs, while Latin accents are isolated
    # singles inside ascii words (a sparse-accent French page maps its few
    # high bytes ENTIRELY into Cyrillic under cp1251, so a share-only gate
    # would misfire). Then the case-band statistic splits KOI8-R from
    # windows-1251 (the artifact ladder's provably-undecidable case).
    n_high = in_long_runs = run = 0
    for b in sample:
        if b >= 0x80:
            run += 1
        else:
            if run:
                n_high += run
                if run >= 2:
                    in_long_runs += run
            run = 0
    if run:
        n_high += run
        if run >= 2:
            in_long_runs += run
    if n_high and in_long_runs / n_high >= 0.65:
        # single-byte non-Latin scripts, strict-decode-selectivity order
        # (r6 rungs, measured on encoded prose): Hebrew first — its strict
        # iso-8859-8 decode FAILS for Russian (holes 0xBF-0xDE), Greek
        # (accented vowels 0xDC+ unassigned) and Thai, while Hebrew text
        # DOES decode under tis-620/iso-8859-7, so testing Hebrew later
        # would lose it. Thai next (Greek and Russian fail tis-620's
        # 0xDB-0xDE hole), Greek third (Russian fails iso-8859-7's holes),
        # Cyrillic last. The shared run-adjacency gate above keeps
        # sparse-accent Latin text (which decodes "validly" under ALL of
        # these) out of every rung. Documented limit: UNACCENTED
        # lowercase-only Greek decodes as Hebrew (0xE0-0xFA overlap) —
        # real Greek prose carries tonos accents, which disambiguate.
        heb = _try_decode(sample, "iso-8859-8")
        if heb is not None and _block_share(heb, 0x590, 0x5FF) >= 0.6:
            return "ISO-8859-8", 0.73
        thai = _try_decode(sample, "tis_620")
        if (
            thai is not None
            and _block_share(thai, 0xE00, 0xE7F) >= 0.6
            and _thai_orthography_ok(thai)
        ):
            return "TIS-620", 0.73
        # Arabic (r7 rungs), BEFORE Greek and Cyrillic — iso-8859-7 assigns
        # 0xC0-0xFE so Arabic letter bytes strict-decode as all-Greek, and
        # cp1251 reads them as valid Cyrillic; both later rungs would claim
        # Arabic text. Greek itself fails BOTH Arabic gates (its lowercase
        # 0xF0+ bytes hit iso-8859-6 holes; alef share 0.016 << 0.08). Two rungs: strict iso-8859-6 (holes at
        # 0xA1-0xBE/0xDB-0xDF/0xF3-0xFF make the decode itself selective —
        # Russian, Greek, cp1256-with-Arabic-comma all FAIL it), then
        # windows-1256 gated on the alef/lam frequency spikes (alef 0xC7 is
        # ~16% of Arabic letters vs <2% for any Cyrillic reading) plus a
        # near-empty 0xF0-0xFF band (Russian lowercase r-ja lives there).
        ar6 = _try_decode(sample, "iso-8859-6")
        if ar6 is not None and _block_share(ar6, 0x600, 0x6FF) >= 0.6:
            return "ISO-8859-6", 0.73
        alef = sum(1 for b in sample if b == 0xC7)
        lam = sum(1 for b in sample if b == 0xE1)
        f_hi = sum(1 for b in sample if b >= 0xF0)
        if (
            alef >= 0.08 * n_high
            and lam >= 0.05 * n_high
            and f_hi <= 0.15 * n_high
        ):
            ar56 = _try_decode(sample, "cp1256")
            if ar56 is not None and _block_share(ar56, 0x600, 0x6FF) >= 0.6:
                return "windows-1256", 0.73
        greek = _try_decode(sample, "iso-8859-7")
        if greek is not None and _block_share(greek, 0x370, 0x3FF) >= 0.6:
            return "ISO-8859-7", 0.73
        cp1251 = _try_decode(sample, "windows-1251") or ""
        koi8 = _try_decode(sample, "koi8-r") or ""
        cyr_cp, low_cp = _cyrillic_case_score(cp1251)
        cyr_koi, low_koi = _cyrillic_case_score(koi8)
        if max(cyr_cp, cyr_koi) >= 0.6:
            return ("windows-1251", 0.73) if low_cp >= low_koi else ("KOI8-R", 0.73)
    # single-byte western: C1-control-range bytes mark cp1252's
    # typographic extensions; their absence is plain latin-1
    if any(0x80 <= b <= 0x9F for b in sample):
        return "Windows-1252", 0.73
    return "ISO-8859-1", 0.73


def detect_charset(text: str | None) -> tuple[str | None, float]:
    """Return (encoding, confidence). encoding None when undetectable, like
    chardet on empty input (reference emits the field only when encoding is
    non-null but confidence rides along — warc_metadata_sidecar.py:158-159)."""
    if not text:
        return None, 0.0
    # UTF-16 bytes through a utf-8-replace decode: the BOM becomes two
    # replacement chars and every other byte of ascii text a NUL
    if text.startswith(_REPLACEMENT * 2) and text.count("\x00") * 3 > len(text):
        return "UTF-16", 1.0
    if text.startswith("\ufeff"):
        return "UTF-8-SIG", 1.0
    # ISO-2022 family survives the utf-8 ingest decode VERBATIM (7-bit
    # ASCII-clean), so the escape markers are still visible post-ingest \u2014
    # the one legacy family the artifact path can name exactly (r6 rung,
    # mirrored in detect_charset_bytes)
    h = text[:8192]
    if "\x1b$B" in h or "\x1b$@" in h:
        return "ISO-2022-JP", 0.99
    if "\x1b$)C" in h:
        return "ISO-2022-KR", 0.99
    if "\x1b$)A" in h or "\x1b$)G" in h:
        return "ISO-2022-CN", 0.99
    try:
        text.encode("ascii")
        return "ascii", 1.0
    except UnicodeEncodeError:
        pass
    if _REPLACEMENT in text:
        # original bytes were NOT valid utf-8 — single- or double-byte
        # legacy text mangled by the replace decode. chardet's ladder
        # rungs, keyed on the decode artifacts (r4 + r5 tranches):
        sample = text[:4096]
        n_rep = sample.count(_REPLACEMENT)
        if n_rep >= 8 and n_rep * 3 > len(sample):
            # replacement-dense = a legacy non-Latin encoding where nearly
            # every char contributed invalid bytes. r5 sub-ladder, each rung
            # keyed on a measured artifact (tests construct the fixtures by
            # encode(legacy) -> decode(utf-8, replace), exactly the ingest
            # mangle):
            #  - ASCII-SPACE INTERLEAVE: single-byte Cyrillic text keeps its
            #    word spacing (~1 space per 6 replacements), where CJK
            #    double-byte text has none -> windows-1251 at chardet's
            #    single-byte rung 0.73. KOI8-R is REPORTED AS windows-1251
            #    on purpose: both alphabets map to the identical
            #    replacement profile after the decode (shown by
            #    construction in test_charset_ladder_r5_rungs), so the
            #    split chardet makes from raw byte frequencies is not
            #    observable post-ingest — 1251 is the dominant-share
            #    answer; the production seam (real chardet on raw bytes)
            #    restores the true split. Same limit applies to other
            #    single-byte non-Latin pages (ISO-8859-7/8).
            #  - KANA-ADJACENCY FINGERPRINT (ja vs zh): kana lead bytes
            #    (0xA4/0xA5 in EUC-JP, 0x82/0x83 in Shift-JIS) serve as the
            #    CONTINUATION byte of accidental valid 2-byte decodes, so
            #    Japanese accidents satisfy ord & 0x3F in {0x24,0x25,0x02,
            #    0x03} while Chinese accidents (GB/Big5 second bytes
            #    0xA1-0xBF) spread uniformly — measured: >=50% adjacency
            #    share on kana-bearing text, 0-1 hits on hanzi text.
            #  - �<printable-ascii> PAIRS mark the ASCII-second-byte
            #    encodings (Shift-JIS, Big5); pair-free dense marks the
            #    both-bytes-high ones (EUC-JP, GB18030/GBK). The fingerprint
            #    splits each pair by language.
            # 0.99 is the MBCS probers' confident rung. Known limits: a
            # kanji-ONLY Japanese snippet (no kana) carries no fingerprint
            # and reads as Chinese — real Japanese text always carries
            # kana; a SHORT spaced CJK fragment with no accidental valid
            # decodes can read as Cyrillic; EUC-KR Korean reads as
            # GB18030 (measured r6: its accidental decodes START AT TRAIL
            # BYTES — hangul trails 0xC2-0xDF complete against the next
            # syllable's lead — so they span the full U+0080-07FF band
            # and no hangul-specific fingerprint survives the decode).
            # Each of these is decidable on raw bytes: the charset_head
            # path (detect_charset_bytes) is authoritative when present. CJK signals are checked FIRST
            # so ordinary spaced CJK content (nav menus, titles) never
            # falls into the Cyrillic rung: Cyrillic additionally requires
            # a near-zero accident rate (double-byte CJK leaves ~1 valid
            # char per 3-12 replacements; single-byte Cyrillic ~0).
            stripped = sample.replace(_REPLACEMENT, "")
            two = [ord(c) for c in _TWO_BYTE_RE.findall(stripped)]
            # >= 2 adjacency hits: a single chance accident on a short
            # hanzi fragment (1-2 valid chars total) must not fake the
            # fingerprint; real kana text produces them in series
            kana_adj = sum(1 for o in two if (o & 0x3F) in (0x24, 0x25, 0x02, 0x03))
            ja_sig = kana_adj >= 2 and kana_adj * 2 >= len(two)
            # Shift-JIS-only band: SJIS lead bytes 0x81-0x9F complete
            # accidental valid decodes as CONTINUATIONS, putting the
            # accident's low 6 bits below 0x20 — impossible for Big5
            # (trails 0x40-0x7E/0xA1-0xFE, the 0xA1+ half -> low6 >= 0x21)
            # and for GB2312-range prose. GBK/GB18030 trails DO span
            # 0x40-0xFE (ADVICE r5), so a lone sub-0x20 accident on GBK
            # text is possible in principle — require >= 2 hits like the
            # kana-adjacency rung so one chance accident cannot flip a
            # hanzi page to SHIFT_JIS (the claim is measured on GB2312
            # prose, not structural for GBK extensions).
            sjis_low = sum(1 for o in two if (o & 0x3F) < 0x20) >= 2
            n_pairs = len(_SJIS_PAIR_RE.findall(sample))
            if n_pairs * 8 > n_rep:
                # katakana-pair rung (r6, VERDICT r5 #5): full-width
                # katakana is a SINGLE lead byte (0x83, always replaced) +
                # a mostly-ascii trail, so pairs are >= half the
                # replacements (measured: katakana fragments 0.50-1.0,
                # Big5 hanzi 0.14-0.43 — Big5's 0xA1+ trail half doubles
                # its replacement count) with ZERO accidental valid
                # decodes (0x83 completes nothing). Heuristic, >= 4 pairs:
                # a short ascii-trail-heavy Big5 fragment can still cross
                # it (documented); the charset_head byte path decides
                # these cases exactly and is authoritative when present.
                kata_sig = not two and n_pairs >= 4 and n_pairs * 2 >= n_rep
                return (
                    ("SHIFT_JIS", 0.99)
                    if (ja_sig or sjis_low or kata_sig)
                    else ("Big5", 0.99)
                )
            if ja_sig:
                return "EUC-JP", 0.99
            if sample.count(" ") * 8 > n_rep and len(two) * 8 < n_rep:
                return "windows-1251", 0.73
            return "GB18030", 0.99
        # sparse replacements = single-byte western. cp1252's signature
        # artifacts are typographic punctuation (the don�t apostrophe,
        # �quoted� pairs); accented LETTERS with none of those read as
        # ISO-8859-1 — chardet's latin-1 prober rung, same 0.73.
        if _CP1252_RE.search(sample):
            return "Windows-1252", 0.73
        return "ISO-8859-1", 0.73
    # valid multibyte utf-8: chardet's prober needs evidence before 0.99.
    # Evidence = extra utf-8 continuation bytes (>=1 per multibyte char) —
    # a C-speed length diff, never a per-char Python loop (this runs once
    # per distinct payload on the hot path).
    extra_bytes = len(text.encode("utf-8")) - len(text)
    return ("utf-8", 0.99) if extra_bytes >= 8 else ("utf-8", 0.7525)


# --- language: n-gram/stopword profile stand-in for pycld2
# (warc_metadata_sidecar.py:105-126) ----------------------------------------

# closed profile set: marker words with high coverage per language. Scoring =
# fraction of tokens that are markers; deterministic, order-independent.
_LANG_PROFILES: dict[str, tuple[str, frozenset[str]]] = {
    "en": ("ENGLISH", frozenset("the and of to in is that it for was with as on at by this have from or".split())),
    "es": ("SPANISH", frozenset("el la de que y en los se del las un por con una para es al lo como".split())),
    "fr": ("FRENCH", frozenset("le de la et les des en un du une que est pour qui dans par sur au".split())),
    "de": ("GERMAN", frozenset("der die und in den von zu das mit sich des auf ist im dem nicht ein".split())),
    "pt": ("PORTUGUESE", frozenset("de a o que e do da em um para com os no se na por uma dos".split())),
    "it": ("ITALIAN", frozenset("di e il la che in un per del una sono con non le si da dei al".split())),
    "da": ("DANISH", frozenset("og i det at en den til er som af med for ikke han hun jeg".split())),
    "zh": ("Chinese", frozenset("的 是 在 了 和 有 我 他 这 中 大 上 为 们 不 个".split())),
    # r4 tranche: three more token-profile languages...
    "ru": ("RUSSIAN", frozenset("и в не на я что с по это он как но его к а мы из у за".split())),
    # 'in'/'is' deliberately absent from the Dutch profile: they are also
    # top-frequency English tokens and would dilute English coverage below
    # the reliability bar on ordinary English pages
    "nl": ("DUTCH", frozenset("de het een en van ik dat niet die op te zijn voor maar ook aan naar bij".split())),
    "sv": ("SWEDISH", frozenset("och i att det som en på är av för med den till inte om han hon".split())),
    # r5: four more token profiles — distinctive-only markers ('i'/'w'/
    # 'z'/'do'/'en'/'je' are shared with too many languages and would
    # dilute, the Dutch lesson). Ukrainian keys on its і/ї/є-bearing
    # function words, which Russian text never contains.
    "pl": ("POLISH", frozenset("się że nie jest był jego oraz które przez można tylko już bardzo został ich".split())),
    "tr": ("TURKISH", frozenset("bir ve bu için ile olarak daha çok gibi ancak sonra kadar olan değil".split())),
    "fi": ("FINNISH", frozenset("ja on ei että se hän oli mutta myös kuin niin jos ovat sekä".split())),
    "cs": ("CZECH", frozenset("je se na že byl jako jsou ale pro jeho však které podle již".split())),
    "uk": ("UKRAINIAN", frozenset("і що але як або це вже його від до під був".split())),
    # r6: four more token profiles, distinctive-only markers again.
    # Romanian avoids 'la'/'un'/'o'/'nu' (Romance/Slavic overlap);
    # Hungarian's agglutination leaves its function words unique anyway;
    # Vietnamese diacritic-bearing particles are globally unique;
    # Croatian avoids 'je'/'se'/'na' (shared with Czech) and keys on its
    # što/koji/također forms.
    "ro": ("ROMANIAN", frozenset("și să este sunt pentru care din mai dar fost între până fără acest".split())),
    "hu": ("HUNGARIAN", frozenset("és hogy nem egy már csak volt mint még vagy azonban szerint minden nagyon".split())),
    "vi": ("VIETNAMESE", frozenset("của và là có không được người trong những một cho với này đã".split())),
    "hr": ("CROATIAN", frozenset("što ili koji također nakon zbog između prema tijekom gdje svoje bio".split())),
    # r6b: four more. Norwegian Bokmål keys on the spellings that DIVERGE
    # from Danish (etter/mellom/gjennom/ble vs efter/mellem/gennem/blev)
    # and avoids the og/i/det/til core the two share; Indonesian function
    # words are globally unique; Bulgarian avoids the и/в/не/на core
    # shared with Russian and keys on ще/са/това/като; Slovak avoids the
    # je/se/na core shared with Czech and keys on its ô/ä/ľ-free but
    # orthographically distinct sú/aj/ako/bol/ktoré forms.
    "no": ("NORWEGIAN", frozenset("å etter mellom gjennom ble blitt mye noen ut opp inn nå mot fikk".split())),
    "id": ("INDONESIAN", frozenset("yang dan di dengan untuk tidak dari ini itu adalah pada akan juga telah".split())),
    "bg": ("BULGARIAN", frozenset("ще са това като който също след което между би беше през върху".split())),
    "sk": ("SLOVAK", frozenset("sú aj ako bol ktoré tiež podľa medzi alebo keď pretože môže".split())),
    # r7 tranche: seven more token profiles, distinctive-only markers
    # (the Dutch lesson throughout). Swahili/Tagalog avoid 'na' (Croatian);
    # Azerbaijani keys on its ə-bearing forms, never the bir/bu/daha core
    # shared with Turkish; Estonian avoids Finnish's ja/on/ei core;
    # Lithuanian and Latvian BOTH drop 'ir' (lt 'and' vs lv 'is' — a
    # mutual-dilution token) and key on disjoint function words (savo vs
    # savu). Malay is deliberately ABSENT: its function-word core is the
    # Indonesian profile (yang/dan/di/untuk...), and a marker table cannot
    # honestly split ms from id — cld2 uses distribution statistics there.
    "sw": ("SWAHILI", frozenset("kwa katika kwamba ambayo lakini sana kuwa wake yake hii hiyo pia watu kama".split())),
    "tl": ("TAGALOG", frozenset("ang mga ito hindi siya kanyang dahil ngayon lamang naman ating mayroon".split())),
    "sq": ("ALBANIAN", frozenset("të për është janë shumë kjo duke nëse sipas megjithatë nga".split())),
    "az": ("AZERBAIJANI", frozenset("və həmçinin müxtəlif olunur dövlət məlumat haqqında edilmişdir ilə görə".split())),
    "et": ("ESTONIAN", frozenset("ning kuid pärast vahel seoses üle rohkem aasta selle kõik oma ka".split())),
    "lt": ("LITHUANIAN", frozenset("yra kad iš buvo tačiau labai pagal savo metu dažnai apie taip".split())),
    "lv": ("LATVIAN", frozenset("arī tikai pēc starp gada tiek vairāk savu kurā varētu kas vai".split())),
    # ...and SCRIPT-keyed languages (cld2 is script-first for these):
    # kana/hangul (r4) and the r5 additions — Arabic, Hebrew, Greek,
    # Devanagari->Hindi, Thai — where the characters are themselves the
    # markers; see _char_lang in detect_language's script path. Empty
    # marker sets keep the name table uniform.
    "ja": ("Japanese", frozenset()),
    "ko": ("Korean", frozenset()),
    "ar": ("ARABIC", frozenset()),
    "he": ("HEBREW", frozenset()),
    "el": ("GREEK", frozenset()),
    "hi": ("HINDI", frozenset()),
    "th": ("THAI", frozenset()),
    # r6c: fourteen more script-keyed languages — each script maps 1:1 to
    # its cld2 language (the unambiguous half of cld2's script scoring):
    # nine Brahmic-family blocks, Georgian, Armenian, Ethiopic->Amharic,
    # and the space-less Khmer/Lao/Myanmar (whole phrases tokenize as one
    # \w run; first-char script classifies the token, same as Thai).
    "bn": ("BENGALI", frozenset()),
    "pa": ("PUNJABI", frozenset()),
    "gu": ("GUJARATI", frozenset()),
    "ta": ("TAMIL", frozenset()),
    "te": ("TELUGU", frozenset()),
    "kn": ("KANNADA", frozenset()),
    "ml": ("MALAYALAM", frozenset()),
    "si": ("SINHALESE", frozenset()),
    "ka": ("GEORGIAN", frozenset()),
    "hy": ("ARMENIAN", frozenset()),
    "am": ("AMHARIC", frozenset()),
    "km": ("KHMER", frozenset()),
    "lo": ("LAOTHIAN", frozenset()),
    "my": ("BURMESE", frozenset()),
}

_BAD_CHARS = re.compile(r"[\x00-\x08\x0b-\x1f\x7f\ud800-\udfff]")  # cf. BAD_CHARS :31
_TOKEN_RE = re.compile(r"[\w一-鿿']+", re.UNICODE)
# space-less scripts that need the char-level path: CJK ideographs, kana
# incl. half-width (Japanese), hangul (Korean). The r5 script-first
# languages (Arabic, Hebrew, Greek, Devanagari, Thai) stay on the FAST
# token path — a stray Greek math symbol on an English page must not
# route the whole page through the per-token Python walk (this is the
# engine's hottest Python path); their gate below fires one regex search
# and then classifies UNIQUE tokens only.
_CJK_RE = re.compile("[一-鿿぀-ヿ가-힣ｦ-ﾟ]")
_R5_SCRIPT_RE = re.compile(
    "[؀-ۿݐ-ݿ"  # Arabic
    "֐-׿"  # Hebrew
    "Ͱ-Ͽἀ-῿"  # Greek (+ polytonic)
    "ऀ-ॿ"  # Devanagari
    "฀-๿"  # Thai
    "ঀ-৿"  # Bengali
    "਀-੿"  # Gurmukhi (Punjabi)
    "઀-૿"  # Gujarati
    "஀-௿"  # Tamil
    "ఀ-౿"  # Telugu
    "ಀ-೿"  # Kannada
    "ഀ-ൿ"  # Malayalam
    "඀-෿"  # Sinhala
    "Ⴀ-ჿ"  # Georgian
    "԰-֏"  # Armenian
    "ሀ-፿"  # Ethiopic (Amharic)
    "ក-៿"  # Khmer
    "຀-໿"  # Lao
    "က-႟"  # Myanmar
    "]"
)


def _char_lang(ch: str) -> str | None:
    """Script-keyed language of one char (cld2 is script-first here):
    kana -> ja (incl. half-width katakana, the Shift_JIS-era web-archive
    staple), hangul -> ko; r5 adds Arabic -> ar, Hebrew -> he,
    Greek -> el, Devanagari -> hi, Thai -> th. Ideographs return None and
    fall back to the zh marker table (kanji are shared between zh and ja —
    Japanese text wins through its kana, like cld2's script scoring)."""
    o = ord(ch)
    if 0x3040 <= o <= 0x30FF or 0xFF66 <= o <= 0xFF9F:
        return "ja"
    if 0xAC00 <= o <= 0xD7A3:
        return "ko"
    if 0x0600 <= o <= 0x06FF or 0x0750 <= o <= 0x077F:
        return "ar"
    if 0x0590 <= o <= 0x05FF:
        return "he"
    if 0x0370 <= o <= 0x03FF or 0x1F00 <= o <= 0x1FFF:
        return "el"
    if 0x0900 <= o <= 0x097F:
        return "hi"
    if 0x0E00 <= o <= 0x0E7F:
        return "th"
    # r6c script blocks — each maps 1:1 to its cld2 language
    if 0x0980 <= o <= 0x09FF:
        return "bn"
    if 0x0A00 <= o <= 0x0A7F:
        return "pa"
    if 0x0A80 <= o <= 0x0AFF:
        return "gu"
    if 0x0B80 <= o <= 0x0BFF:
        return "ta"
    if 0x0C00 <= o <= 0x0C7F:
        return "te"
    if 0x0C80 <= o <= 0x0CFF:
        return "kn"
    if 0x0D00 <= o <= 0x0D7F:
        return "ml"
    if 0x0D80 <= o <= 0x0DFF:
        return "si"
    if 0x10A0 <= o <= 0x10FF:
        return "ka"
    if 0x0530 <= o <= 0x058F:
        return "hy"
    if 0x1200 <= o <= 0x137F:
        return "am"
    if 0x1780 <= o <= 0x17FF:
        return "km"
    if 0x0E80 <= o <= 0x0EFF:
        return "lo"
    if 0x1000 <= o <= 0x109F:
        return "my"
    return None
# cld2 parses HTML by default (pycld2 isPlainText=0): markup, scripts and
# styles never count as text. The stand-in mirrors that with a cheap strip —
# without it, attribute soup ('a', 'de', 'no', ...) misreads as Romance
# languages on real crawled pages (seen on reference tests/text.warc).
_HTML_NOISE_RE = re.compile(
    r"(?is)<script\b.*?</script>|<style\b.*?</style>|<!--.*?-->|<[^>]*>|&[#\w]+;"
)

# inverted marker index: one dict lookup per token instead of one set scan
# per language profile (this function is the engine's hottest Python path —
# it runs once per distinct payload digest)
_MARKER_LANGS: dict[str, list[str]] = {}
for _code, (_name, _markers) in _LANG_PROFILES.items():
    for _m in _markers:
        _MARKER_LANGS.setdefault(_m, []).append(_code)


def detect_language(text: str | None) -> dict | None:
    """cld2-shaped result: {'reliable', 'text-bytes', 'languages': [...]}
    or None when nothing identifiable — reference drops 'Unknown' entries and
    returns None when all are unknown (warc_metadata_sidecar.py:105-126)."""
    if not text:
        return None
    cleaned = _BAD_CHARS.sub("", text)
    if "<" in cleaned and _HTML_NOISE_RE.search(cleaned):
        cleaned = _HTML_NOISE_RE.sub(" ", cleaned)
    raw_tokens = _TOKEN_RE.findall(cleaned)
    hit_counts: dict[str, int] = {}
    if not _CJK_RE.search(cleaned):
        # fast path (most of the web): count tokens once (C-speed Counter),
        # then probe the ~100 marker words against the counts — identical
        # results to the per-token walk with fewer Python-level operations
        n_tokens = len(raw_tokens)
        counts = Counter(map(str.lower, raw_tokens))
        # probe whichever side is smaller — identical accumulation (integer
        # adds commute), ~2x fewer dict probes on typical short documents
        if len(counts) < len(_MARKER_LANGS):
            for tok, c in counts.items():
                langs = _MARKER_LANGS.get(tok)
                if langs:
                    for code in langs:
                        hit_counts[code] = hit_counts.get(code, 0) + c
        else:
            for marker, langs in _MARKER_LANGS.items():
                c = counts.get(marker)
                if c:
                    for code in langs:
                        hit_counts[code] = hit_counts.get(code, 0) + c
        # r5 script-first languages, still on the fast path: one regex
        # search gates a scan over UNIQUE tokens (first-char script class)
        if _R5_SCRIPT_RE.search(cleaned):
            for tok, c in counts.items():
                lang = _char_lang(tok[0]) if tok else None
                if lang is not None:
                    hit_counts[lang] = hit_counts.get(lang, 0) + c
    else:
        # space-less scripts tokenize as long runs; split to characters —
        # kana/hangul chars ARE the ja/ko markers, ideographs probe the zh
        # marker table
        n_tokens = 0
        for t in raw_tokens:
            if _CJK_RE.search(t):
                n_tokens += len(t)
                for ch in t:
                    lang = _char_lang(ch)
                    if lang is not None:
                        hit_counts[lang] = hit_counts.get(lang, 0) + 1
                        continue
                    for code in _MARKER_LANGS.get(ch, ()):
                        hit_counts[code] = hit_counts.get(code, 0) + 1
            else:
                n_tokens += 1
                for code in _MARKER_LANGS.get(t.lower(), ()):
                    hit_counts[code] = hit_counts.get(code, 0) + 1
    if not n_tokens:
        return None
    scores: list[tuple[str, str, int, float]] = []
    for code, hits in hit_counts.items():
        name = _LANG_PROFILES[code][0]
        scores.append((name, code, hits, hits / n_tokens))
    if not scores:
        return None  # all 'Unknown'
    scores.sort(key=lambda s: (-s[2], s[1]))
    total_hits = sum(s[2] for s in scores)
    entries = []
    for name, code, hits, _frac in scores[:3]:
        entries.append(
            {
                "name": name,
                "code": code,
                "text-covered": int(round(100.0 * hits / total_hits)),
                "score": round(1024.0 * hits / n_tokens, 2),
            }
        )
    reliable = entries[0]["text-covered"] >= 70 and n_tokens >= 8
    return {
        "reliable": reliable,
        "text-bytes": len(cleaned.encode("utf-8")),
        "languages": entries,
    }


# --- soft-404: deterministic heuristic stand-in (warc_metadata_sidecar.py:129-131)

_SOFT404_PHRASES = (
    "page not found",
    "404 not found",
    "not found",
    "page does not exist",
    "no longer available",
    "cannot be found",
    "error 404",
    "page unavailable",
)


def detect_soft404(text: str | None) -> float:
    """Probability-like score in [0,1); deterministic logistic over phrase
    hits, title signal and document length. CALIBRATED to the soft404
    model's published 0.5 decision threshold (r4 tranche — the r3 weights
    left an obvious '<title>404 Not Found' page at 0.24, under
    threshold): a 404-ish TITLE alone crosses 0.5; several body phrases
    on a short page cross 0.5; one incidental 'not found' mention in a
    long article stays far below it (the model's advertised
    low-false-positive regime). Threshold behavior is pinned by
    tests/test_detectors.test_soft404_threshold_calibration."""
    if not text:
        return 0.0
    lower = text.lower()
    hits = sum(lower.count(p) for p in _SOFT404_PHRASES)
    title_hit = 1 if re.search(r"<title[^>]*>[^<]*(404|not found)", lower) else 0
    n = len(lower)
    short_page = 1.0 - min(n / 2000.0, 1.0)  # error pages are short
    raw = (
        0.06
        + 0.35 * min(hits, 3) / 3.0
        + 0.45 * title_hit
        + 0.15 * short_page
        - 0.08 * min(n / 20000.0, 1.0)
    )
    # floor 0.01: the real logistic model never returns exactly 0, and the
    # CDXJ merge's truthy gate (merge_cdxj.py) would drop a 0.0 field
    return round(min(max(raw, 0.01), 0.999), 6)


# --- serialization: byte-golden create_string_payload
# (warc_metadata_sidecar.py:151-164) ----------------------------------------

MIME_TITLE = "Identified-Payload-Type:"
PUID_TITLE = "Preservation-Identifier:"
CHARSET_TITLE = "Charset-Detected:"
LANGUAGE_TITLE = "Languages-cld2:"
SOFT404_TITLE = "Soft-404-Detected:"

TEXT_FORMAT_MIMES = re.compile(r"(text|html|xml)")  # cf. :33


def serialize_payload(
    mime_fido: str | None,
    mime_magic: str | None,
    puid: str | None,
    charset_encoding: str | None,
    charset_confidence: float,
    lang_cld: dict | None,
    soft404: float | None,
) -> str:
    """Exact field-presence + json.dumps formatting of the reference: absent
    fields omit the line; charset emitted only when encoding non-null but
    confidence rides along; soft404 emitted when not None (incl. 0.0)."""
    lines: list[str] = []
    mime_dict = {}
    if mime_fido:
        mime_dict["fido"] = mime_fido
    if mime_magic:
        mime_dict["python-magic"] = mime_magic
    if mime_dict:
        lines.append(f"{MIME_TITLE} {json.dumps(mime_dict)}")
    if puid:
        lines.append(f"{PUID_TITLE} {puid}")
    if charset_encoding:
        charset = {"encoding": charset_encoding, "confidence": charset_confidence}
        lines.append(f"{CHARSET_TITLE} {json.dumps(charset)}")
    if lang_cld:
        lines.append(f"{LANGUAGE_TITLE} {json.dumps(lang_cld)}")
    if soft404 is not None:
        lines.append(f"{SOFT404_TITLE} {soft404}")
    return "\n".join(lines)


def _detect_one(
    text: str | None,
    head: bytes | None,
    http_status: str | None,
    charset_head: bytes | None = None,
) -> dict:
    """Full per-payload detector pass with the reference's gating: charset/
    language only for text-format mimes (F6, :255); soft404 only for
    status-200 html (F7, :263-265). `charset_head` is the optional raw
    payload head the ingest carries for non-UTF-8 text payloads (VERDICT
    r5 #2) — when present, charset probes REAL bytes like the reference's
    chardet (warc_metadata_sidecar.py:91-102); the decode-artifact ladder
    is the fallback for artifact-only inputs."""
    mime_fido, mime_magic, puid = sniff_mime(text, head)
    mimes_found = " ".join(v for v in (mime_fido, mime_magic) if v)
    charset_encoding: str | None = None
    charset_confidence = 0.0
    lang: dict | None = None
    soft404: float | None = None
    if TEXT_FORMAT_MIMES.search(mimes_found):
        if charset_head:
            charset_encoding, charset_confidence = detect_charset_bytes(charset_head)
        else:
            charset_encoding, charset_confidence = detect_charset(text)
        lang = detect_language(text)
        if http_status == "200" and "html" in mimes_found:
            soft404 = detect_soft404(text)
    payload = serialize_payload(
        mime_fido, mime_magic, puid, charset_encoding, charset_confidence, lang, soft404
    )
    # columnar twin of the payload's lang block: underscore field names so
    # from_json(schema.LANGUAGES) lines up (the byte-golden payload keeps the
    # reference's hyphenated keys).
    lang_cols = (
        {
            "reliable": lang["reliable"],
            "text_bytes": lang["text-bytes"],
            "languages": [
                {
                    "name": e["name"],
                    "code": e["code"],
                    "text_covered": e["text-covered"],
                    "score": e["score"],
                }
                for e in lang["languages"]
            ],
        }
        if lang
        else None
    )
    return {
        "mime_fido": mime_fido,
        "mime_magic": mime_magic,
        "puid": puid,
        "charset_encoding": charset_encoding,
        "charset_confidence": charset_confidence if charset_encoding else None,
        "languages_json": json.dumps(lang_cols) if lang_cols else None,
        "soft404": soft404,
        "payload": payload if payload else None,
    }


@F.pandas_udf(DETECTED)
def detect_all(
    text: pd.Series, head: pd.Series, http_status: pd.Series, charset_head: pd.Series
) -> pd.DataFrame:
    """Arrow-batched detector stage: one Python roundtrip computes all of
    S3-S7 + S8 for a batch of distinct payloads. Gating lives INSIDE the
    batch (SURVEY.md §4: `when()` does not short-circuit Python UDFs)."""

    def _b(v):
        return bytes(v) if v is not None and not (isinstance(v, float) and pd.isna(v)) else None

    rows = [
        _detect_one(
            t if isinstance(t, str) else None,
            _b(h),
            s if isinstance(s, str) else None,
            _b(ch),
        )
        for t, h, s, ch in zip(text, head, http_status, charset_head)
    ]
    return pd.DataFrame(rows)

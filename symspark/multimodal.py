"""Multimodal column plumbing (training-data pipeline ops).

Images / audio / video ride as opaque ``binary`` columns with a typed
metadata struct; feature extraction runs Arrow-batched through
``mapInPandas`` (whole batches in Python, no per-row serde).

Decode status (container has no codec libraries — stdlib only):
- REAL header decode for PNG (IHDR width/height), GIF (logical screen
  size), JPEG (marker walk to SOFn width/height), WAV (RIFF fmt/data
  chunks -> duration), and MP4/ISO-BMFF (box walk to moov/mvhd ->
  timescale/duration) — pure ``struct`` parsing, no new deps.
  ``gen_media`` emits genuine tiny PNG/GIF/JPEG/WAV/MP4 payloads built
  with ``zlib``/``struct`` so the real path is exercised end-to-end.
- Payloads in any other container keep the digest-derived pseudo-feature
  with ``decode_ok=False`` and an explicit error — a real pixel/sample
  decoder plugs in by extending ``decode_header`` / ``_decode_one``.
The ``feature`` vector itself is a deterministic payload-digest embedding
stand-in for all kinds (an ML featurizer is model-dependent, not a Spark
concern); the Spark-side schema, partitioning, and batch shape are real.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, sha1 string, "
    "format string, width int, height int, duration_ms bigint, "
    "feature array<float>, decode_ok boolean, decode_error string"
)

FEATURE_DIM = 8


def decode_header(payload: bytes) -> dict | None:
    """Parse real container headers with the stdlib.  Returns
    {format, width, height, duration_ms} or None if unrecognized."""
    if payload is None or len(payload) < 12:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24 and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return {"format": "png", "width": w, "height": h, "duration_ms": None}
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": w, "height": h, "duration_ms": None}
    if payload[:2] == b"\xff\xd8":
        # JPEG: walk the marker segments to the first SOFn (C0-CF minus the
        # non-frame C4/C8/CC); its body is precision(1) height(2) width(2)
        pos = 2
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                break
            marker = payload[pos + 1]
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            if marker in (0xD9, 0xDA):  # EOI / SOS before any SOF
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone markers
                pos += 2
                continue
            (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if pos + 9 > len(payload):
                    break
                h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                return {"format": "jpeg", "width": w, "height": h, "duration_ms": None}
            pos += 2 + seglen
        return {"format": "jpeg", "width": None, "height": None, "duration_ms": None}
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        # ISO BMFF (mp4/mov/m4a): walk top-level boxes to moov, then its
        # children to mvhd (version(1) flags(3), v0: creation(4) mod(4)
        # timescale(4) duration(4); v1: creation(8) mod(8) timescale(4)
        # duration(8)) — duration_ms = duration * 1000 / timescale
        def boxes(buf: bytes, pos: int, end: int):
            while pos + 8 <= end:
                (sz,) = struct.unpack(">I", buf[pos : pos + 4])
                typ = buf[pos + 4 : pos + 8]
                hdr = 8
                if sz == 1 and pos + 16 <= end:  # 64-bit largesize
                    (sz,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                    hdr = 16
                elif sz == 0:  # box extends to end of file
                    sz = end - pos
                if sz < hdr:
                    return
                yield typ, pos + hdr, min(pos + sz, end)
                pos += sz

        dur = None
        for typ, s, e in boxes(payload, 0, len(payload)):
            if typ == b"moov":
                for t2, s2, e2 in boxes(payload, s, e):
                    if t2 == b"mvhd":
                        ver = payload[s2] if e2 > s2 else 0
                        if ver == 1 and e2 - s2 >= 32:
                            (ts,) = struct.unpack(">I", payload[s2 + 20 : s2 + 24])
                            (d,) = struct.unpack(">Q", payload[s2 + 24 : s2 + 32])
                        elif ver == 0 and e2 - s2 >= 20:
                            ts, d = struct.unpack(">II", payload[s2 + 12 : s2 + 20])
                        else:
                            continue
                        if ts:
                            dur = int(d) * 1000 // ts
        return {"format": "mp4", "width": None, "height": None, "duration_ms": dur}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos, byte_rate, data_size = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (sz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            if cid == b"fmt " and pos + 20 <= len(payload):
                (byte_rate,) = struct.unpack("<I", payload[pos + 16 : pos + 20])
            elif cid == b"data":
                data_size = sz
            pos += 8 + sz + (sz & 1)  # chunks are word-aligned
        if byte_rate and data_size is not None:
            return {
                "format": "wav", "width": None, "height": None,
                "duration_ms": data_size * 1000 // byte_rate,
            }
        return {"format": "wav", "width": None, "height": None, "duration_ms": None}
    return None


def _feature(payload: bytes, kind: str) -> list[float]:
    digest = hashlib.sha256(kind.encode() + payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(FEATURE_DIM)
    ]


def _decode_one(payload: bytes, kind: str) -> tuple[dict | None, list[float] | None, str | None]:
    """(header_meta, feature, error) for one media payload."""
    if payload is None:
        return None, None, "empty payload"
    hdr = decode_header(bytes(payload))
    feats = _feature(bytes(payload), kind)
    if hdr is None:
        return None, feats, "unrecognized container format (no stdlib decoder)"
    return hdr, feats, None


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched header decode + feature extraction over the opaque
    payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "sha1": pdf["payload"].map(
                    lambda b: hashlib.sha1(b).hexdigest() if b is not None else None
                ),
            }
            fmts, ws, hs, durs, feats, oks, errs = [], [], [], [], [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                hdr, f, err = _decode_one(payload, kind)
                hdr = hdr or {}
                fmts.append(hdr.get("format"))
                ws.append(hdr.get("width"))
                hs.append(hdr.get("height"))
                durs.append(hdr.get("duration_ms"))
                feats.append(f)
                oks.append(err is None)
                errs.append(err)
            out["format"] = fmts
            out["width"] = pd.array(ws, dtype="Int32")
            out["height"] = pd.array(hs, dtype="Int32")
            out["duration_ms"] = pd.array(durs, dtype="Int64")
            out["feature"] = feats
            out["decode_ok"] = oks
            out["decode_error"] = errs
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# --- real tiny fixtures (stdlib-built) --------------------------------------

def make_png(width: int, height: int) -> bytes:
    """Minimal valid grayscale PNG."""

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(width) for _ in range(height))  # filter 0 + pixels
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_wav(duration_ms: int, sample_rate: int = 8000) -> bytes:
    """Minimal valid 8-bit mono PCM WAV of the given duration."""
    n = sample_rate * duration_ms // 1000
    data = bytes(n)  # silence
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_gif(width: int, height: int) -> bytes:
    """GIF header + logical screen descriptor (enough for header decode)."""
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00\x3b"


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal structurally-valid baseline JPEG: SOI, JFIF APP0, DQT,
    SOF0 (1 grayscale component), DHT, SOS + stub entropy data, EOI."""

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    sof0 = seg(0xC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00")
    dht = seg(0xC4, b"\x00" + bytes([0] * 16) + b"")
    sos = seg(0xDA, b"\x01\x01\x00\x00\x3f\x00")
    return b"\xff\xd8" + app0 + dqt + sof0 + dht + sos + b"\x00" + b"\xff\xd9"


def make_mp4(duration_ms: int) -> bytes:
    """Minimal structurally-valid ISO BMFF file: ftyp + moov(mvhd v0,
    timescale 1000) + a stub mdat."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + typ + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    # mvhd v0 is 100 bytes: ver/flags, creation, modification, timescale,
    # duration, then rate/volume/reserved/matrix/predefined/next_track_id
    mvhd = box(b"mvhd", struct.pack(">B3xIIII", 0, 0, 0, 1000, duration_ms) + bytes(80))
    return ftyp + box(b"moov", mvhd) + box(b"mdat", bytes(16))


def gen_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table: real tiny PNG/GIF/JPEG/WAV/MP4
    payloads interleaved with opaque (undecodable) blobs."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            payload = (make_png(4 + i % 8, 3 + i % 5), make_gif(16 + i, 9 + i),
                       make_jpeg(32 + i, 24 + i))[(i // 3) % 3]
            meta = {"width": None, "height": None, "duration_ms": None}
        elif kind == "audio":
            payload = make_wav(100 * (1 + i % 7))
            meta = {"width": None, "height": None, "duration_ms": None}
        else:  # video: real mp4 headers interleaved with opaque blobs
            if (i // 3) % 2 == 0:
                payload = make_mp4(1000 * (i + 1))
            else:
                payload = hashlib.md5(f"media{i}".encode()).digest() * (1 + i % 5)
            meta = {"width": None, "height": None, "duration_ms": 1000 * (i + 1)}
        rows.append((i, kind, f"x/{kind}", bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)

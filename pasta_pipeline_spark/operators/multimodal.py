"""Multimodal column plumbing (SURVEY.md §7 M6).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata (schemas.MEDIA_SCHEMA). The Spark-side plumbing — schema,
partitioning, Arrow batch shape, UDF signatures — is real and tested.
Decode modes:

- ``decode="stub"``  → deterministic fake features derived from the
  bytes themselves (length, md5, pseudo-dimensions) so the pipeline is
  end-to-end testable and oracle-checkable;
- ``decode="real"``  → REAL pure-Python header+payload decode, no
  codec library: WAV/RIFF (rate, channels, duration from the chunk
  walk), binary PPM (dimensions), PNG IHDR (dimensions), FLAC
  STREAMINFO (rate, duration), YUV4MPEG2 (dimensions, duration,
  per-frame luma via :func:`sample_video_frames`), JPEG SOF
  (dimensions from the marker walk), MP4/ISO-BMFF mvhd (duration
  from the box walk) — and FULL pixel/sample decode where the
  entropy coder is implementable from the public spec: PNG
  (:func:`decode_png_pixels`: stdlib DEFLATE + the five scanline
  filters), GIF (LZW), baseline JPEG (:func:`decode_jpeg_pixels`:
  ITU-T T.81 Huffman + dequant + IDCT + upsample), FLAC
  (:func:`decode_flac_samples`: RFC 9639 Rice + FIXED/LPC
  prediction + stereo decorrelation, CRC-verified), WAV PCM and
  Y4M luma planes. The ONE remaining fallback is compressed VIDEO
  frame decode (H.264 and kin — a from-spec decoder is poor
  effort/value); those frames stop at header level and fall back
  to the stub features at the same dispatch point.

Everything runs through ``mapInPandas``: one Arrow round-trip per
partition, batch-columnar on both sides, no per-row Python overhead
beyond the loop inside the batch.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sample_rate", IntegerType(), True),
    ]
)


_FEATURE_COLS = (
    "media_id", "media_type", "n_bytes", "content_md5",
    "width", "height", "duration_ms", "sample_rate",
)


def _stub_features(raw: bytes) -> dict:
    digest = hashlib.md5(raw).hexdigest()
    return {
        "n_bytes": len(raw),
        "content_md5": digest,
        "width": int(digest[:4], 16) % 1920 + 1,
        "height": int(digest[4:8], 16) % 1080 + 1,
        "duration_ms": None,
        "sample_rate": None,
    }


def decode_wav(raw: bytes) -> dict | None:
    """Pure-Python RIFF/WAVE header decode: walks the chunk list for
    ``fmt `` (channels, sample rate, bits) and ``data`` (payload
    size), then derives the true duration —
    ``n_samples * 1000 div sample_rate`` with
    ``n_samples = data_size div block_align`` — all integer, so the
    value is engine-exact for an oracle. Returns None if the bytes are
    not a parseable WAV."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    pos, channels, rate, block_align, data_size = 12, None, None, None, None
    while pos + 8 <= len(raw):
        cid, csize = raw[pos:pos + 4], struct.unpack_from("<I", raw, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt " and csize >= 16:
            _, channels, rate, _, block_align, _ = struct.unpack_from(
                "<HHIIHH", raw, body
            )
        elif cid == b"data":
            data_size = min(csize, len(raw) - body)
        pos = body + csize + (csize & 1)  # chunks are word-aligned
    if not channels or not rate or not block_align or data_size is None:
        return None
    n_samples = data_size // block_align
    return {
        "n_bytes": len(raw),
        "content_md5": hashlib.md5(raw).hexdigest(),
        "width": None,
        "height": None,
        "duration_ms": n_samples * 1000 // rate,
        "sample_rate": rate,
    }


def decode_ppm(raw: bytes) -> dict | None:
    """Pure-Python binary-PPM (P6) header decode: magic, then
    whitespace/comment-separated width, height, maxval — true image
    dimensions with no codec library. Returns None if not a P6."""
    if raw[:2] != b"P6":
        return None
    fields, pos = [], 2
    while len(fields) < 3 and pos < len(raw):
        while pos < len(raw) and raw[pos:pos + 1].isspace():
            pos += 1
        if raw[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and raw[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            return None
        fields.append(int(raw[start:pos]))
    if len(fields) < 3:
        return None
    width, height, _maxval = fields
    return {
        "n_bytes": len(raw),
        "content_md5": hashlib.md5(raw).hexdigest(),
        "width": width,
        "height": height,
        "duration_ms": None,
        "sample_rate": None,
    }


def decode_png(raw: bytes) -> dict | None:
    """Pure-Python PNG IHDR decode: the 8-byte signature, then the
    first chunk MUST be IHDR (PNG spec) — 4-byte big-endian length
    (13), ``IHDR`` type, then width and height as 4-byte big-endian
    ints, bit depth and color type one byte each. True dimensions from
    a compressed container with no codec library (only the pixel DATA
    needs zlib; the header doesn't). Returns None if not a PNG or the
    IHDR is malformed."""
    if len(raw) < 33 or raw[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    (length,) = struct.unpack_from(">I", raw, 8)
    if length != 13 or raw[12:16] != b"IHDR":
        return None
    width, height = struct.unpack_from(">II", raw, 16)
    if width == 0 or height == 0:
        return None
    return {
        "n_bytes": len(raw),
        "content_md5": hashlib.md5(raw).hexdigest(),
        "width": width,
        "height": height,
        "duration_ms": None,
        "sample_rate": None,
    }


def decode_flac(raw: bytes) -> dict | None:
    """Pure-Python FLAC STREAMINFO decode: after the ``fLaC`` marker,
    walk the metadata-block list (1-byte header: last-flag bit + 7-bit
    type; 3-byte big-endian length) to the STREAMINFO block (type 0),
    whose packed 64-bit field carries sample rate (20 bits),
    channels-1 (3), bits-per-sample-1 (5) and total samples (36).
    ``duration_ms = total_samples * 1000 div sample_rate`` — all
    integer, engine-exact. Returns None if not a FLAC or no
    STREAMINFO."""
    if len(raw) < 8 or raw[:4] != b"fLaC":
        return None
    pos = 4
    while pos + 4 <= len(raw):
        header = raw[pos]
        btype, last = header & 0x7F, header & 0x80
        blen = int.from_bytes(raw[pos + 1:pos + 4], "big")
        body = pos + 4
        if btype == 0 and blen >= 34 and body + 18 <= len(raw):
            (packed,) = struct.unpack_from(">Q", raw, body + 10)
            rate = packed >> 44
            total = packed & ((1 << 36) - 1)
            if rate == 0:
                return None
            return {
                "n_bytes": len(raw),
                "content_md5": hashlib.md5(raw).hexdigest(),
                "width": None,
                "height": None,
                "duration_ms": total * 1000 // rate,
                "sample_rate": rate,
            }
        if last:
            break
        pos = body + blen
    return None


def decode_jpeg(raw: bytes) -> dict | None:
    """Pure-Python JPEG dimension decode: walk the marker segments
    (0xFFD8 SOI, then 0xFF<marker> + big-endian length) to the first
    SOF frame header (0xC0–0xCF excluding the DHT/DAC/RST markers
    C4/C8/CC), which carries height and width as big-endian u16 —
    true dimensions without running the entropy decoder (the
    metadata-tier fast path; :func:`decode_jpeg_pixels` is the full
    baseline pixel decode). Returns None if not a JPEG or no SOF."""
    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI before any SOF
            return None
        seglen = int.from_bytes(raw[pos + 2:pos + 4], "big")
        if seglen < 2:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(raw):
                return None
            height = int.from_bytes(raw[pos + 5:pos + 7], "big")
            width = int.from_bytes(raw[pos + 7:pos + 9], "big")
            if width == 0 or height == 0:
                return None
            return {
                "n_bytes": len(raw),
                "content_md5": hashlib.md5(raw).hexdigest(),
                "width": width,
                "height": height,
                "duration_ms": None,
                "sample_rate": None,
            }
        pos += 2 + seglen
    return None


def decode_mp4(raw: bytes) -> dict | None:
    """Pure-Python MP4/ISO-BMFF duration decode: walk the top-level
    box list (big-endian u32 size + fourcc) to ``moov``, then its
    children to ``mvhd``, whose timescale and duration fields give the
    true presentation duration — ``duration * 1000 div timescale``,
    integer and engine-exact. Handles mvhd versions 0 (u32 fields) and
    1 (u64). Returns None if not an ISO-BMFF file or no mvhd."""
    if len(raw) < 12 or raw[4:8] != b"ftyp":
        return None

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            size = int.from_bytes(raw[pos:pos + 4], "big")
            if size < 8 or pos + size > hi:
                return
            yield raw[pos + 4:pos + 8], pos + 8, pos + size
            pos += size

    for btype, body, end in walk(0, len(raw)):
        if btype != b"moov":
            continue
        for ctype, cbody, _cend in walk(body, end):
            if ctype != b"mvhd":
                continue
            version = raw[cbody]
            if version == 1:
                if cbody + 32 > len(raw):
                    return None
                timescale = int.from_bytes(raw[cbody + 20:cbody + 24], "big")
                duration = int.from_bytes(raw[cbody + 24:cbody + 32], "big")
            else:
                if cbody + 20 > len(raw):
                    return None
                timescale = int.from_bytes(raw[cbody + 12:cbody + 16], "big")
                duration = int.from_bytes(raw[cbody + 16:cbody + 20], "big")
            if timescale == 0:
                return None
            return {
                "n_bytes": len(raw),
                "content_md5": hashlib.md5(raw).hexdigest(),
                "width": None,
                "height": None,
                "duration_ms": duration * 1000 // timescale,
                "sample_rate": None,
            }
    return None


def _synth_jpeg(mid: int) -> bytes:
    """Structurally valid JPEG header prefix: SOI, a COM segment of
    ``20 + id % 50`` filler bytes, an SOF0 frame header with true
    dimensions (width ``64 + id % 512``, height ``48 + (id div 3) %
    256``, 3 components), EOI. Total bytes ``47 + id % 50``."""
    w = 64 + mid % 512
    h = 48 + (mid // 3) % 256
    fill = bytes((i * 19 + mid) % 256 for i in range(20 + mid % 50))
    com = b"\xff\xfe" + (2 + len(fill)).to_bytes(2, "big") + fill
    sof_body = (
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([3])
        + bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    )
    sof = b"\xff\xc0" + (2 + len(sof_body)).to_bytes(2, "big") + sof_body
    return b"\xff\xd8" + com + sof + b"\xff\xd9"


def _synth_mp4(mid: int) -> bytes:
    """Minimal ISO-BMFF file: ftyp, moov(mvhd v0 with true timescale
    ``1000 + (id % 4) * 500`` and duration ``3000 + (id % 77) * 100``
    units), mdat with ``10 + id % 80`` filler bytes. Total bytes
    ``150 + id % 80``."""
    ftyp = (16).to_bytes(4, "big") + b"ftypisom" + (0).to_bytes(4, "big")
    timescale = 1000 + (mid % 4) * 500
    duration = 3000 + (mid % 77) * 100
    mvhd_body = (
        bytes(1) + bytes(3)                    # version 0 + flags
        + (0).to_bytes(4, "big") * 2           # creation/modification
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + bytes(100 - 20)                      # rate..next_track_id zeroed
    )
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" + mvhd_body
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    payload = bytes((i * 23 + mid) % 256 for i in range(10 + mid % 80))
    mdat = (8 + len(payload)).to_bytes(4, "big") + b"mdat" + payload
    return ftyp + moov + mdat


def _decode_batch(pdf: pd.DataFrame, real: bool) -> pd.DataFrame:
    """One Arrow batch of (media_id, media_type, payload) → features.
    ``real=True`` dispatches on magic bytes (WAV, PPM, PNG, FLAC) and
    falls back to the stub features for formats that need an external
    codec (JPEG, MP4: full-frame decode requires the codec library;
    the dispatch point is where they'd slot in)."""
    out: dict = {c: [] for c in _FEATURE_COLS}
    for mid, mtype, payload in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
        out["media_id"].append(mid)
        out["media_type"].append(mtype)
        if payload is None:
            feats = {
                "n_bytes": 0, "content_md5": "", "width": None,
                "height": None, "duration_ms": None, "sample_rate": None,
            }
        else:
            raw = bytes(payload)
            feats = None
            if real:
                feats = (
                    decode_wav(raw) or decode_ppm(raw)
                    or decode_png(raw) or decode_flac(raw)
                    or decode_y4m(raw) or decode_jpeg(raw)
                    or decode_mp4(raw)
                )
            if feats is None:
                feats = _stub_features(raw)
        for k, v in feats.items():
            out[k].append(v)
    return pd.DataFrame(out)


def extract_media_features(
    df: DataFrame,
    decode: str = "stub",
    id_col: str = "media_id",
    type_col: str = "media_type",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode/feature-extract stage over a media table.

    Input needs (media_id, media_type, payload) columns; output is
    MEDIA_FEATURES_SCHEMA. Partition-parallel via mapInPandas.
    """
    if decode not in ("stub", "real"):
        raise ValueError(f"decode must be 'stub' or 'real', got {decode!r}")

    from pasta_pipeline_spark.operators.util import ensure_package_on_workers, ensure_parallelism

    ensure_package_on_workers(df.sparkSession)
    src = ensure_parallelism(
        df.select(
            F.col(id_col).alias("media_id"),
            F.col(type_col).alias("media_type"),
            F.col(payload_col).alias("payload"),
        )
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf, real=(decode == "real"))

    return src.mapInPandas(run, MEDIA_FEATURES_SCHEMA)


def _synth_png(mid: int) -> bytes:
    """Structurally valid PNG prefix with true chunk CRCs: signature,
    IHDR (width ``32 + id % 256``, height ``32 + (id div 5) % 128``,
    8-bit truecolor), one IDAT of ``50 + id % 100`` deterministic
    filler bytes (the pixel stream — the one part that would need
    zlib; headers don't), IEND. Total bytes ``107 + id % 100``."""
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    w = 32 + mid % 256
    h = 32 + (mid // 5) % 128
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = bytes((i * 13 + mid) % 256 for i in range(50 + mid % 100))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def _synth_flac(mid: int) -> bytes:
    """FLAC marker + last-flagged STREAMINFO block (sample rate
    ``8000 + (id % 5) * 4000``, channels ``1 + id % 2``, 16-bit,
    ``10000 + (id % 89) * 100`` total samples) + ``30 + id % 70``
    filler frame bytes. Total bytes ``72 + id % 70``."""
    sr = 8000 + (mid % 5) * 4000
    ch = 1 + mid % 2
    total = 10000 + (mid % 89) * 100
    packed = (sr << 44) | ((ch - 1) << 41) | ((16 - 1) << 36) | total
    streaminfo = (
        struct.pack(">HH", 4096, 4096)
        + (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
        + struct.pack(">Q", packed) + bytes(16)
    )
    tail = bytes((i * 17 + mid) % 256 for i in range(30 + mid % 70))
    return b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + streaminfo + tail


def synthesize_media(
    df: DataFrame,
    id_col: str = "media_id",
    variant: str = "wav_ppm",
) -> DataFrame:
    """Deterministic media-fixture generator with every format
    parameter an integer function of the id. ``variant`` picks the
    format pair:

    - ``"wav_ppm"`` (default — the uncompressed containers):
      even ids become true RIFF/WAVE audio (channels
      ``1 + (id div 2) % 2``, sample rate
      ``8000 + ((id div 2) % 5) * 2000``, samples
      ``400 + (id % 97) * 8``, 16-bit PCM); odd ids become binary PPM
      (P6) images (width ``16 + id % 64``, height
      ``16 + (id div 3) % 48``, maxval 255);
    - ``"containers"`` (the compressed-container headers): even ids
      become PNG files with true IHDR + chunk CRCs (:func:`_synth_png`),
      odd ids FLAC streams with a true STREAMINFO block
      (:func:`_synth_flac`);
    - ``"video"``: every id becomes a true YUV4MPEG2 stream
      (:func:`_synth_y4m`) with id-derived geometry, frame rate,
      frame count, and per-frame luma bytes;
    - ``"codecs"`` (codec-container headers): even ids JPEG with a
      true SOF0 frame header (:func:`_synth_jpeg`), odd ids
      MP4/ISO-BMFF with a true moov/mvhd box (:func:`_synth_mp4`);
    - ``"png_full"``: every id a COMPLETE valid PNG
      (:func:`_synth_png_full`) — real zlib DEFLATE stream, all five
      scanline filters — for the full-pixel decode path
      (:func:`decode_image_pixels`);
    - ``"gif_full"``: every id a COMPLETE valid GIF89a
      (:func:`_synth_gif`) — real LZW code stream, 4-color palette —
      for the same full-pixel path;
    - ``"jpeg_full"``: every id a COMPLETE valid baseline JPEG
      (:func:`_synth_jpeg_full`) — real Huffman entropy-coded scan,
      Annex K tables in actual DHT segments, DC-only blocks so the
      decode is integer-exact — for the same full-pixel path;
    - ``"flac_full"``: every id a COMPLETE valid one-frame FLAC
      (:func:`_synth_flac_full`) — CONSTANT / VERBATIM / Rice-coded
      FIXED-order-1 subframes cycling by id, real CRC-8/CRC-16 — for
      the full-sample audio path (:func:`decode_audio_samples`).

    Because the parameters derive from the id alone, an oracle can
    compute the expected DECODED features (duration, dimensions, byte
    size) without parsing a byte — which is what makes the real-decode
    path end-to-end hash-checkable. Runs as the same Arrow-batched
    mapInPandas shape a real ingest stage uses.
    """
    if variant not in (
        "wav_ppm", "containers", "video", "codecs", "png_full", "gif_full",
        "jpeg_full", "flac_full",
    ):
        raise ValueError(
            "variant must be 'wav_ppm', 'containers', 'video', 'codecs', "
            f"'png_full', 'gif_full', 'jpeg_full' or 'flac_full', got {variant!r}"
        )

    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("media_type", StringType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "media_type": [], "payload": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                out["media_id"].append(mid)
                if variant == "containers":
                    if mid % 2 == 0:
                        out["media_type"].append("image/png")
                        out["payload"].append(_synth_png(mid))
                    else:
                        out["media_type"].append("audio/flac")
                        out["payload"].append(_synth_flac(mid))
                    continue
                if variant == "video":
                    out["media_type"].append("video/x-yuv4mpeg")
                    out["payload"].append(_synth_y4m(mid))
                    continue
                if variant == "png_full":
                    out["media_type"].append("image/png")
                    out["payload"].append(_synth_png_full(mid))
                    continue
                if variant == "gif_full":
                    out["media_type"].append("image/gif")
                    out["payload"].append(_synth_gif(mid))
                    continue
                if variant == "jpeg_full":
                    out["media_type"].append("image/jpeg")
                    out["payload"].append(_synth_jpeg_full(mid))
                    continue
                if variant == "flac_full":
                    out["media_type"].append("audio/flac")
                    out["payload"].append(_synth_flac_full(mid))
                    continue
                if variant == "codecs":
                    if mid % 2 == 0:
                        out["media_type"].append("image/jpeg")
                        out["payload"].append(_synth_jpeg(mid))
                    else:
                        out["media_type"].append("video/mp4")
                        out["payload"].append(_synth_mp4(mid))
                    continue
                if mid % 2 == 0:
                    channels = 1 + (mid // 2) % 2
                    rate = 8000 + ((mid // 2) % 5) * 2000
                    n_samples = 400 + (mid % 97) * 8
                    block_align = channels * 2
                    data_size = n_samples * block_align
                    header = struct.pack(
                        "<4sI4s4sIHHIIHH4sI",
                        b"RIFF", 36 + data_size, b"WAVE",
                        b"fmt ", 16, 1, channels, rate,
                        rate * block_align, block_align, 16,
                        b"data", data_size,
                    )
                    body = bytes((i * 31 + mid) % 256 for i in range(data_size))
                    out["media_type"].append("audio/wav")
                    out["payload"].append(header + body)
                else:
                    w = 16 + mid % 64
                    h = 16 + (mid // 3) % 48
                    header = f"P6\n{w} {h}\n255\n".encode()
                    body = bytes((i * 7 + mid) % 256 for i in range(3 * w * h))
                    out["media_type"].append("image/ppm")
                    out["payload"].append(header + body)
            yield pd.DataFrame(out)

    return src.mapInPandas(run, schema)


def _parse_y4m_header(raw: bytes) -> dict | None:
    """Parse a YUV4MPEG2 stream header — the standard uncompressed
    video container (mjpegtools/ffmpeg ``-f yuv4mpeg``): a space-
    separated parameter line (``W<width> H<height> F<num>:<den>`` ...)
    terminated by 0x0A, then ``FRAME<params>\\n`` + planar YCbCr 4:2:0
    payload per frame. Returns geometry + frame stride, or None."""
    if not raw.startswith(b"YUV4MPEG2"):
        return None
    nl = raw.find(b"\n")
    if nl < 0:
        return None
    w = h = num = den = None
    for tok in raw[9:nl].split(b" "):
        try:
            if tok[:1] == b"W":
                w = int(tok[1:])
            elif tok[:1] == b"H":
                h = int(tok[1:])
            elif tok[:1] == b"F":
                num, den = (int(x) for x in tok[1:].split(b":"))
        except ValueError:
            return None
    if not w or not h or not num or not den:
        return None
    return {
        "width": w, "height": h, "fps_num": num, "fps_den": den,
        "body": nl + 1, "frame_size": w * h * 3 // 2,  # C420 planar
    }


def _y4m_frame_offsets(raw: bytes, hdr: dict) -> list[int]:
    """Byte offset of each frame's Y plane (after its FRAME marker
    line; frame parameters after ``FRAME`` are allowed by the spec)."""
    offsets, pos, fsz = [], hdr["body"], hdr["frame_size"]
    while pos < len(raw) and raw[pos:pos + 5] == b"FRAME":
        nl = raw.find(b"\n", pos)
        if nl < 0 or nl + 1 + fsz > len(raw):
            break
        offsets.append(nl + 1)
        pos = nl + 1 + fsz
    return offsets


def decode_y4m(raw: bytes) -> dict | None:
    """Pure-Python YUV4MPEG2 decode for the features table: true
    dimensions from the header, true duration from the counted frames
    (``n_frames * 1000 * den div num`` — integer, engine-exact)."""
    hdr = _parse_y4m_header(raw)
    if hdr is None:
        return None
    n_frames = len(_y4m_frame_offsets(raw, hdr))
    return {
        "n_bytes": len(raw),
        "content_md5": hashlib.md5(raw).hexdigest(),
        "width": hdr["width"],
        "height": hdr["height"],
        "duration_ms": n_frames * 1000 * hdr["fps_den"] // hdr["fps_num"],
        "sample_rate": None,
    }


def _synth_y4m(mid: int) -> bytes:
    """Deterministic YUV4MPEG2 fixture: width ``16 + (id % 8) * 2``,
    height ``16 + ((id div 7) % 8) * 2`` (even — 4:2:0 subsampling),
    ``(5 + id % 10)`` fps, ``3 + id % 12`` frames. Luma byte ``i`` of
    frame ``f`` is ``(i*13 + id + f*31) % 256``, so a sampled frame's
    luma sum is computable from (id, frame_idx) alone — the hook that
    makes REAL frame decoding oracle-checkable."""
    w = 16 + (mid % 8) * 2
    h = 16 + ((mid // 7) % 8) * 2
    fps = 5 + mid % 10
    n_frames = 3 + mid % 12
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()]
    for f in range(n_frames):
        out.append(b"FRAME\n")
        out.append(bytes((i * 13 + mid + f * 31) % 256 for i in range(w * h)))
        out.append(bytes((i * 7 + mid) % 256 for i in range(w * h // 4)))
        out.append(bytes((i * 11 + mid) % 256 for i in range(w * h // 4)))
    return b"".join(out)


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_ts_ms", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("luma_sum", LongType(), False),
        StructField("frame_md5", StringType(), False),
    ]
)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 500,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL video frame sampling (the honesty upgrade the stub
    documents): parse each YUV4MPEG2 payload's header, pick the frame
    covering each ``every_ms`` grid point
    (``frame_idx = ts * fps_num div (1000 * fps_den)``), and DECODE
    that frame's luma plane — per-frame features (integer luma sum,
    payload md5) come from the actual bytes at the actual frame
    offset, so a seek bug, stride bug, or plane-order bug changes the
    output. Non-Y4M payloads produce no rows (documented; compressed
    codecs need the codec library and would slot into the same
    dispatch). 1→N mapInPandas: output partitions by sampled frame,
    not by media row, so one long video doesn't pin one task
    downstream."""
    if every_ms < 1:
        raise ValueError("every_ms must be >= 1")
    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in
                    ("media_id", "frame_ts_ms", "frame_idx", "luma_sum", "frame_md5")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                hdr = _parse_y4m_header(raw)
                if hdr is None:
                    continue
                offsets = _y4m_frame_offsets(raw, hdr)
                if not offsets:
                    continue
                n_frames = len(offsets)
                dur = n_frames * 1000 * hdr["fps_den"] // hdr["fps_num"]
                ysize = hdr["width"] * hdr["height"]
                for ts in range(0, dur, every_ms):
                    fidx = min(
                        ts * hdr["fps_num"] // (1000 * hdr["fps_den"]),
                        n_frames - 1,
                    )
                    plane = raw[offsets[fidx]:offsets[fidx] + ysize]
                    rows["media_id"].append(int(mid))
                    rows["frame_ts_ms"].append(ts)
                    rows["frame_idx"].append(fidx)
                    rows["luma_sum"].append(sum(plane))
                    rows["frame_md5"].append(hashlib.md5(plane).hexdigest())
            yield pd.DataFrame(rows) if rows["media_id"] else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in rows}
            )

    return src.mapInPandas(run, VIDEO_FRAME_SCHEMA)


def frame_sample_stub(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Video frame-sampling plumbing: explode each media row into one
    row per sampled frame timestamp (real decode stubbed; the frame
    payload is a deterministic md5 of (bytes, ts)). Demonstrates the
    1→N mapInPandas shape a real sampler uses."""
    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    src = df.select(
        F.col(id_col).alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.col(duration_col).alias("duration_ms"),
    )
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_ts_ms", IntegerType(), False),
            StructField("frame_md5", StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_ts_ms": [], "frame_md5": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or dur is None:
                    continue
                raw = bytes(payload)
                for ts in range(0, int(dur), every_ms):
                    rows["media_id"].append(mid)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame_md5"].append(
                        hashlib.md5(raw + ts.to_bytes(8, "little")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema)


#: Aspect-bucket ladder: (label, upper bound on 100*w/h, exclusive).
#: Integer thresholds are the midpoint-ish cuts between the canonical
#: training ratios 1:2, 3:4, 1:1, 4:3, 2:1.
ASPECT_LADDER = (
    ("tall_1_2", 62),
    ("portrait_3_4", 87),
    ("square_1_1", 116),
    ("landscape_4_3", 166),
    ("wide_2_1", None),
)


def aspect_bucket(width_col, height_col):
    """Aspect-ratio bucket label from integer dimensions — the batch-
    grouping key image-training pipelines use so one batch shares a
    resize target. Contract is pure integer arithmetic:
    ``ap = (100 * width) div height`` compared against fixed ladder
    cuts — no float ratios, so the assignment is engine-exact.
    """
    from pyspark.sql import functions as F

    ap = F.expr(f"(100 * {width_col}) div {height_col}")
    expr = None
    branches = []
    for label, cut in ASPECT_LADDER:
        if cut is not None:
            branches.append((ap < cut, label))
    expr = F.when(branches[0][0], branches[0][1])
    for cond, label in branches[1:]:
        expr = expr.when(cond, label)
    return expr.otherwise(ASPECT_LADDER[-1][0])


def aspect_bucket_sql(width_col: str, height_col: str) -> str:
    """Generated SQL twin of :func:`aspect_bucket` (same ladder, same
    integer arithmetic — cannot drift)."""
    ap = f"((100 * {width_col}) // {height_col})"
    cases = " ".join(
        f"WHEN {ap} < {cut} THEN '{label}'"
        for label, cut in ASPECT_LADDER
        if cut is not None
    )
    return f"CASE {cases} ELSE '{ASPECT_LADDER[-1][0]}' END"


def chunk_manifest(
    df: DataFrame,
    id_col: str = "media_id",
    length_col: str = "duration_ms",
    chunk: int = 30_000,
    overlap: int = 1_000,
) -> DataFrame:
    """Fixed-length chunk manifest over media lengths — the planning
    table an audio/video pipeline feeds its decode workers (30 s ASR
    windows with 1 s overlap, byte-range splits for large blobs; the
    unit is whatever ``length_col`` is in).

    Output one row per chunk: ``(id, chunk_idx, start, end, is_last)``
    with ``start = idx * (chunk - overlap)`` and ``end`` clamped to
    the media length; consecutive chunks overlap by ``overlap``. The
    chunk count is exact integer arithmetic —
    ``1 + ceil((len - chunk) / step)`` via ``(a + step - 1) div step``
    — so the manifest is engine-exact and oracle-checkable. Rows with
    NULL or non-positive length produce no chunks (documented).

    Pure expressions (sequence + explode): no UDF, no shuffle — the
    manifest is a projection, and the downstream decode stage (the
    expensive part) partitions on the manifest rows, not the media
    rows, so one long video no longer pins one task.
    """
    if overlap >= chunk:
        raise ValueError("overlap must be smaller than chunk")
    step = chunk - overlap
    length = F.col(length_col).cast("long")
    # integer division: Spark's `/` on longs is double division — use div
    n = F.when(length <= chunk, F.lit(1).cast("long")).otherwise(
        (F.lit(1) + F.expr(f"(CAST({length_col} AS BIGINT) - {chunk} + {step - 1}) div {step}")).cast("long")
    )
    src = df.filter(length.isNotNull() & (length > 0)).select(
        F.col(id_col).alias("id"), length.alias("__len"), n.alias("__n")
    )
    exploded = src.select(
        "id",
        "__len",
        "__n",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("__n") - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * F.lit(step)
    end = F.least(start + F.lit(chunk), F.col("__len"))
    return exploded.select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start"),
        end.cast("long").alias("end"),
        (F.col("chunk_idx") == F.col("__n") - 1).alias("is_last"),
    )


def chunk_manifest_sql(
    table: str,
    id_col: str,
    length_col: str,
    chunk: int = 30_000,
    overlap: int = 1_000,
    where: str = "TRUE",
) -> str:
    """Generated DuckDB twin of :func:`chunk_manifest` (same integer
    arithmetic — cannot drift)."""
    step = chunk - overlap
    return f"""
    WITH src AS (
      SELECT {id_col} AS id, CAST({length_col} AS BIGINT) AS len,
             CASE WHEN CAST({length_col} AS BIGINT) <= {chunk} THEN 1
                  ELSE 1 + (CAST({length_col} AS BIGINT) - {chunk} + {step - 1}) // {step}
             END AS n
      FROM {table}
      WHERE ({where}) AND {length_col} IS NOT NULL AND {length_col} > 0
    )
    , ex AS (
      SELECT id, len, n, unnest(generate_series(0, n - 1)) AS chunk_idx
      FROM src
    )
    SELECT id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * {step} AS BIGINT) AS start,
           CAST(least(chunk_idx * {step} + {chunk}, len) AS BIGINT) AS "end",
           (chunk_idx = n - 1) AS is_last
    FROM ex
    """


# ---------------------------------------------------------------------------
# PNG FULL pixel decode — DEFLATE + all five scanline filters
# ---------------------------------------------------------------------------
#
# PNG's entropy coding is DEFLATE, which the Python standard library
# ships (zlib), so FULL pixel decode needs no codec library — chunk
# walk, IDAT inflate, and the PNG spec's five scanline filters
# (None/Sub/Up/Average/Paeth) are public-knowledge pure Python. GIF
# (LZW, written out below) and baseline JPEG (T.81 Huffman + IDCT,
# end of this module) complete the image tier; only video codecs
# (H.264) still stop at header level.

PIXEL_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_pixels", LongType(), True),
        StructField("pixel_sum", LongType(), True),
        StructField("luma_sum", LongType(), True),
    ]
)


def _png_unfilter(decomp: bytes, w: int, h: int, bpp: int = 3) -> bytearray | None:
    """Reverse PNG scanline filtering (spec §9, filters 0-4) over the
    inflated IDAT stream: each row is one filter-type byte + w*bpp
    filtered bytes; reconstruction references the left (a), up (b),
    and up-left (c) reconstructed bytes. Returns the raw pixel bytes
    or None on a malformed stream."""
    stride = w * bpp
    if len(decomp) < h * (stride + 1):
        return None
    out = bytearray(h * stride)
    pos = 0
    for y in range(h):
        ftype = decomp[pos]
        pos += 1
        row = decomp[pos:pos + stride]
        pos += stride
        base = y * stride
        prev = base - stride
        if ftype == 0:
            out[base:base + stride] = row
        elif ftype == 1:  # Sub
            for x in range(stride):
                a = out[base + x - bpp] if x >= bpp else 0
                out[base + x] = (row[x] + a) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                b = out[prev + x] if y > 0 else 0
                out[base + x] = (row[x] + b) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = out[base + x - bpp] if x >= bpp else 0
                b = out[prev + x] if y > 0 else 0
                out[base + x] = (row[x] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = out[base + x - bpp] if x >= bpp else 0
                b = out[prev + x] if y > 0 else 0
                c = out[prev + x - bpp] if (y > 0 and x >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                out[base + x] = (row[x] + pred) & 0xFF
        else:
            return None
    return out


def _png_rgb(raw: bytes) -> tuple[int, int, bytearray] | None:
    """FULL PNG reconstruction to raw interleaved RGB bytes for 8-bit
    truecolor (color type 2, no interlace): chunk walk concatenates
    every IDAT, zlib inflates the stream, and the five scanline
    filters reconstruct the pixels. Shared by the feature decode and
    the perceptual-hash tier."""
    import zlib

    if len(raw) < 33 or raw[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos = 8
    w = h = None
    idat = b""
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos:pos + 4])
        ctype = raw[pos + 4:pos + 8]
        data = raw[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            # a truncated chunk body must degrade to None, not a
            # struct.error escaping the batch loop
            if length != 13 or len(data) < 13:
                return None
            w, h, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
            if bit_depth != 8 or color_type != 2 or data[12] != 0:
                return None
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if not w or not h or not idat:
        return None
    try:
        decomp = zlib.decompress(idat)
    except zlib.error:
        return None
    px = _png_unfilter(decomp, w, h)
    if px is None:
        return None
    return w, h, px


def decode_png_pixels(raw: bytes) -> dict | None:
    """Pixel features over :func:`_png_rgb` — ``pixel_sum`` (all
    channel bytes) and ``luma_sum`` (299R+587G+114B integer Rec.601),
    so any inflate, stride, or predictor bug changes the output.
    Returns None for non-PNGs or unsupported color modes."""
    rgb = _png_rgb(raw)
    if rgb is None:
        return None
    w, h, px = rgb
    pixel_sum = sum(px)
    luma = 0
    for i in range(0, len(px), 3):
        luma += 299 * px[i] + 587 * px[i + 1] + 114 * px[i + 2]
    return {
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "pixel_sum": pixel_sum,
        "luma_sum": luma,
    }


def _synth_png_full(mid: int) -> bytes:
    """COMPLETE valid PNG (any viewer opens it): 8-bit truecolor,
    width ``4 + id % 12``, height ``4 + (id div 3) % 10``, pixel
    byte ``(x, y, c) -> (id*7 + y*31 + x*13 + c*5) % 256``, scanline
    filter type ``y % 5`` — every filter including Paeth is exercised
    and round-tripped through a real zlib DEFLATE stream. The pixel
    recipe is a closed form of the id, so an oracle can compute
    pixel/luma sums without touching a byte."""
    import zlib

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    w = 4 + mid % 12
    h = 4 + (mid // 3) % 10
    bpp = 3
    stride = w * bpp

    def pix(x: int, y: int, c: int) -> int:
        return (mid * 7 + y * 31 + x * 13 + c * 5) % 256

    rows = []
    prev_row = bytes(stride)
    for y in range(h):
        cur = bytes(pix(x // bpp, y, x % bpp) for x in range(stride))
        ftype = y % 5
        filt = bytearray()
        for x in range(stride):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev_row[x]
            c = prev_row[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt.append((cur[x] - pred) & 0xFF)
        rows.append(bytes([ftype]) + bytes(filt))
        prev_row = cur
    idat = zlib.compress(b"".join(rows), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def decode_image_pixels(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Full-pixel image features over a media frame: per payload,
    complete decode dispatched on magic bytes — PNG
    (:func:`decode_png_pixels`, DEFLATE + unfiltering), GIF
    (:func:`decode_gif_pixels`, real LZW + palette mapping), or
    baseline JPEG (:func:`decode_jpeg_pixels`, T.81 Huffman +
    IDCT + YCbCr->RGB). Unsupported payloads produce no row (same
    convention as sample_video_frames). Arrow-batched mapInPandas."""
    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in
                    ("media_id", "width", "height", "n_pixels", "pixel_sum", "luma_sum")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                feats = (
                    decode_png_pixels(raw)
                    or decode_gif_pixels(raw)
                    or decode_jpeg_pixels(raw)
                )
                if feats is None:
                    continue
                rows["media_id"].append(int(mid))
                for k in ("width", "height", "n_pixels", "pixel_sum", "luma_sum"):
                    rows[k].append(feats[k])
            yield pd.DataFrame(rows) if rows["media_id"] else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in rows}
            )

    return src.mapInPandas(run, PIXEL_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# GIF FULL pixel decode — real LZW (GIF-variant) entropy coding
# ---------------------------------------------------------------------------
#
# PNG covered the stdlib-entropy case (DEFLATE via zlib); GIF's LZW
# has no stdlib implementation, but the algorithm is public
# specification (GIF89a spec appendix; Welch 1984) and small enough
# to implement directly — so the real-decode tier gains a SECOND
# compressed pixel format, this one with the entropy coder written
# out in full: variable-width codes growing 3..12 bits, clear/EOI
# codes, LSB-first bit packing across 255-byte sub-blocks, and the
# KwKwK special case.


def _gif_lzw_decode(data: bytes, min_code_size: int) -> list[int] | None:
    """Decode a GIF LZW code stream (already de-sub-blocked) into
    pixel indices. Returns None on a malformed stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    dict_init = {i: [i] for i in range(clear)}
    table: dict[int, list[int]] = dict(dict_init)
    next_code = eoi + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return out if prev is not None or out else None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = dict(dict_init)
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
            out.extend(entry)
            prev = entry
            continue
        if code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            return None
        out.extend(entry)
        if next_code < 4096:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def _gif_lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Encode pixel indices as a GIF LZW code stream (no
    sub-blocking) — the fixture generator's real compressor, kept
    byte-compatible with any spec decoder."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    s: tuple = ()
    for px in indices:
        cand = s + (px,)
        if cand in table:
            s = cand
            continue
        emit(table[s])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # width grows when the NEXT code to assign no longer fits
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        s = (px,)
    if s:
        emit(table[s])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _synth_gif(mid: int) -> bytes:
    """COMPLETE valid GIF89a: logical screen descriptor, 4-color
    global palette, image descriptor, REAL LZW-compressed pixel
    indices in 255-byte sub-blocks, trailer. Geometry, palette, and
    pixels are closed forms of the id — width ``4 + id % 10``,
    height ``4 + (id div 3) % 8``, palette entry ``(i, c)`` channel
    ``(id * (5 + c*6) + i * (7 + c*6)) % 256``, pixel index
    ``(id + x*3 + y*5) % 4`` — so an oracle can compute decoded
    pixel/luma sums without touching a byte."""
    w = 4 + mid % 10
    h = 4 + (mid // 3) % 8
    palette = bytearray()
    for i in range(4):
        for c in range(3):
            palette.append((mid * (5 + c * 6) + i * (7 + c * 6)) % 256)
    indices = [(mid + x * 3 + y * 5) % 4 for y in range(h) for x in range(w)]
    lzw = _gif_lzw_encode(indices, 2)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x81, 0, 0)  # GCT flag, 2-bit, 4 colors
        + bytes(palette)
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
        + bytes([2])  # LZW minimum code size
        + bytes(blocks)
        + b"\x3b"
    )


def decode_gif_pixels(raw: bytes) -> dict | None:
    """FULL GIF decode for single-image GCT files: header + logical
    screen descriptor, global color table, image descriptor,
    de-sub-blocked LZW stream through :func:`_gif_lzw_decode`, and
    palette mapping. Same integer feature contract as
    :func:`decode_png_pixels` (``pixel_sum`` over mapped RGB bytes,
    Rec.601 ``luma_sum``), so any bit-unpacking, dictionary, or
    palette bug changes the output. Returns None for non-GIFs,
    interlaced/local-palette images, or malformed streams."""
    if len(raw) < 13 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", raw, 6)
    if not flags & 0x80:
        return None  # no global color table
    gct_size = 2 << (flags & 0x07)
    pos = 13
    if pos + 3 * gct_size > len(raw):
        return None
    palette = raw[pos:pos + 3 * gct_size]
    pos += 3 * gct_size
    # skip extension blocks to the first image descriptor
    while pos < len(raw) and raw[pos] == 0x21:
        pos += 2
        while pos < len(raw) and raw[pos] != 0:
            pos += 1 + raw[pos]
        pos += 1
    if pos >= len(raw) or raw[pos] != 0x2C:
        return None
    _l, _t, iw, ih, iflags = struct.unpack_from("<HHHHB", raw, pos + 1)
    if iflags & 0xC0:
        return None  # local palette / interlace out of scope
    pos += 10
    if pos >= len(raw):
        return None
    min_code_size = raw[pos]
    pos += 1
    lzw = bytearray()
    while pos < len(raw) and raw[pos] != 0:
        n = raw[pos]
        lzw += raw[pos + 1:pos + 1 + n]
        pos += 1 + n
    indices = _gif_lzw_decode(bytes(lzw), min_code_size)
    if indices is None or len(indices) < iw * ih:
        return None
    indices = indices[: iw * ih]
    pixel_sum = 0
    luma_sum = 0
    for idx in indices:
        if 3 * idx + 2 >= len(palette):
            return None
        r, g, b = palette[3 * idx], palette[3 * idx + 1], palette[3 * idx + 2]
        pixel_sum += r + g + b
        luma_sum += 299 * r + 587 * g + 114 * b
    return {
        "width": iw,
        "height": ih,
        "n_pixels": iw * ih,
        "pixel_sum": pixel_sum,
        "luma_sum": luma_sum,
    }


# ---------------------------------------------------------------------------
# JPEG FULL pixel decode — ITU-T T.81 baseline sequential DCT
# ---------------------------------------------------------------------------
#
# The real-decode tier's final compressed format: baseline JPEG per
# the public ITU-T T.81 spec — marker/segment parse (DQT, DHT, SOF0,
# SOS), canonical Huffman decoding from the file's own BITS/HUFFVAL
# tables, differential DC + run-length AC entropy decode with byte
# (0xFF00) unstuffing and restart-marker handling, dequantization in
# zigzag order, 8x8 inverse DCT, level shift, and integer
# YCbCr->RGB. No codec library; everything below is from the spec.
#
# The catalog fixture (_synth_jpeg_full) writes REAL entropy-coded
# scans through the same canonical-code machinery in reverse —
# category/extend DC bits, EOB-coded AC, Annex K typical tables in
# actual DHT segments — but constrains every block to DC-only
# coefficients with an all-ones quant table, which makes the decoded
# pixels an exact integer closed form of the id (a DC-only block
# IDCTs to the flat value DC/8; DC is synthesized as a multiple of
# 8). The general IDCT/AC path is pinned by a differential pytest:
# arbitrary pixel blocks forward-DCT'd and entropy-coded with full AC
# runs must reconstruct within the T.81 accuracy envelope.
#
# Reference parity: no reference analog (the reference stores raw
# HTML only — /root/reference/dags/processors/telegraph_processor.py
# keeps content as text); this tier exists for the LLM-pipeline
# extension surface (multimodal ingest), VERDICT r5 next-step #1.

#: zigzag position -> natural (row-major) coefficient index, T.81 fig. 5
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: T.81 Annex K "typical" Huffman tables (Tables K.3-K.6) — used by
#: the fixture ENCODER only; the decoder always builds its tables
#: from the file's DHT segments.
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _jpeg_build_decode_table(bits: list[int], vals: list[int]):
    """Canonical Huffman decode structure from a DHT segment's
    BITS/HUFFVAL lists (T.81 Annex C): per code length 1..16 the
    (mincode, maxcode, index-of-first-value); decode walks lengths
    accumulating bits until code <= maxcode[len]."""
    mincode = [0] * 17
    maxcode = [-1] * 17
    valptr = [0] * 17
    code = 0
    k = 0
    for length in range(1, 17):
        n = bits[length - 1]
        if n:
            valptr[length] = k
            mincode[length] = code
            code += n
            k += n
            maxcode[length] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, vals


class _JpegBitReader:
    """MSB-first bit reader over an entropy-coded segment with T.81
    byte unstuffing (0xFF 0x00 -> literal 0xFF) and restart-marker
    awareness: hitting 0xFF D0-D7 sets ``restart`` for the scan loop
    to consume; any other marker ends the segment."""

    def __init__(self, raw: bytes, pos: int):
        self.raw = raw
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.restart = False
        self.ended = False

    def _fill(self) -> bool:
        if self.pos >= len(self.raw):
            self.ended = True
            return False
        b = self.raw[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.raw):
                self.ended = True
                return False
            nxt = self.raw[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                self.restart = True
                return False
            else:
                self.ended = True
                return False
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8
        return True

    def consume_restart(self) -> bool:
        """Skip the pending RSTn marker and reset bit alignment."""
        if not self.restart:
            return False
        self.pos += 2
        self.acc = 0
        self.n = 0
        self.restart = False
        return True

    def read_bit(self) -> int | None:
        if self.n == 0 and not self._fill():
            return None
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, count: int) -> int | None:
        v = 0
        for _ in range(count):
            b = self.read_bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v


def _jpeg_decode_symbol(br: _JpegBitReader, table) -> int | None:
    mincode, maxcode, valptr, vals = table
    code = 0
    for length in range(1, 17):
        b = br.read_bit()
        if b is None:
            return None
        code = (code << 1) | b
        if maxcode[length] >= code >= mincode[length]:
            idx = valptr[length] + code - mincode[length]
            return vals[idx] if idx < len(vals) else None
    return None


def _jpeg_extend(v: int, t: int) -> int:
    """RECEIVE/EXTEND (T.81 F.2.2.1): a t-bit magnitude v maps to the
    signed value v if its top bit is set, else v - (2^t - 1)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1

_JPEG_IDCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_JPEG_IDCT_C = [math.sqrt(0.5)] + [1.0] * 7


def _jpeg_idct_block(coef: list[int]) -> list[int]:
    """Direct 8x8 inverse DCT (T.81 A.3.3) on dequantized
    coefficients in natural order, + 128 level shift, clamped to
    [0, 255]. Rounding is floor(v + 0.5) — the convention the
    closed-form oracle and the differential tests replicate. A
    DC-only block reduces exactly to the flat value DC/8 + 128."""
    # separable: rows then columns
    tmp = [0.0] * 64
    for y in range(8):
        base = y * 8
        row = coef[base:base + 8]
        if not any(row):
            continue
        for x in range(8):
            s = 0.0
            for u in range(8):
                cu = row[u]
                if cu:
                    s += _JPEG_IDCT_C[u] * cu * _JPEG_IDCT_COS[x][u]
            tmp[base + x] = s * 0.5
    out = [0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            s = 0.0
            for v in range(8):
                cv = col[v]
                if cv:
                    s += _JPEG_IDCT_C[v] * cv * _JPEG_IDCT_COS[y][v]
            val = int(math.floor(s * 0.5 + 128.0 + 0.5))
            out[y * 8 + x] = 0 if val < 0 else (255 if val > 255 else val)
    return out


def _jpeg_ycbcr_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    """Integer YCbCr->RGB (JFIF / Rec.601 constants in 16.16 fixed
    point, arithmetic-shift rounding — the exact formula the SQL
    oracle mirrors with a nonnegative-bias ``//``)."""
    cb -= 128
    cr -= 128
    r = y + ((91881 * cr + 32768) >> 16)
    g = y - ((22554 * cb + 46802 * cr + 32768) >> 16)
    b = y + ((116130 * cb + 32768) >> 16)
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


def _decode_jpeg_planes(raw: bytes):
    """Baseline JPEG decode to full component planes: returns
    ``(width, height, [plane, ...])`` where each plane is a row-major
    list of the component's samples at FULL resolution, or None for
    non-JPEGs / non-baseline / subsampled streams. Supports 1- or
    3-component SOF0 with 1x1 sampling (4:4:4 or grayscale) and
    restart intervals; progressive (SOF2), arithmetic coding, and
    subsampled chroma return None (honest scope — the fixture tier
    and the dominant screenshot/thumbnail shapes)."""
    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], tuple] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        if marker == 0xD9:
            return None  # EOI before SOS
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = int.from_bytes(raw[pos + 2:pos + 4], "big")
        if seglen < 2 or pos + 2 + seglen > len(raw):
            return None
        body = raw[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                b += 1
                if pq == 0:
                    if b + 64 > len(body):
                        return None
                    tbl = list(body[b:b + 64])
                    b += 64
                else:
                    if b + 128 > len(body):
                        return None
                    tbl = [
                        int.from_bytes(body[b + 2 * i:b + 2 * i + 2], "big")
                        for i in range(64)
                    ]
                    b += 128
                qtables[tq] = tbl
        elif marker == 0xC4:  # DHT
            b = 0
            while b + 17 <= len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1:b + 17])
                n = sum(bits)
                if b + 17 + n > len(body):
                    return None
                vals = list(body[b + 17:b + 17 + n])
                htables[(tc, th)] = _jpeg_build_decode_table(bits, vals)
                b += 17 + n
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                return None
            restart_interval = int.from_bytes(body[:2], "big")
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6:
                return None
            precision = body[0]
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            nc = body[5]
            if precision != 8 or nc not in (1, 3) or w == 0 or h == 0:
                return None
            comps = []
            for i in range(nc):
                cid = body[6 + 3 * i]
                samp = body[7 + 3 * i]
                tq = body[8 + 3 * i]
                if samp != 0x11:
                    return None  # subsampling out of scope
                comps.append({"id": cid, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif 0xC1 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            return None  # non-baseline frame type
        elif marker == 0xDA:  # SOS
            if frame is None or len(body) < 1:
                return None
            ns = body[0]
            if ns != len(frame["comps"]) or len(body) < 1 + 2 * ns + 3:
                return None
            scan = []
            for i in range(ns):
                cs = body[1 + 2 * i]
                td, ta = body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0x0F
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    return None
                scan.append({**comp, "td": td, "ta": ta})
            return _jpeg_decode_scan(
                raw, pos + 2 + seglen, frame, scan, qtables, htables,
                restart_interval,
            )
        pos += 2 + seglen
    return None


def _jpeg_decode_scan(
    raw: bytes, pos: int, frame, scan, qtables, htables, restart_interval
):
    w, h = frame["w"], frame["h"]
    bx = (w + 7) // 8
    by = (h + 7) // 8
    planes = [[0] * (w * h) for _ in scan]
    preds = [0] * len(scan)
    br = _JpegBitReader(raw, pos)
    mcu = 0
    for yb in range(by):
        for xb in range(bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # entropy segment boundary: align, skip RSTn, reset DC
                if not br.restart:
                    # reader may not have hit the marker yet (it fills
                    # lazily); force alignment by draining buffered bits
                    br.n = 0
                    if (
                        br.pos + 1 < len(raw)
                        and raw[br.pos] == 0xFF
                        and 0xD0 <= raw[br.pos + 1] <= 0xD7
                    ):
                        br.restart = True
                if not br.consume_restart():
                    return None
                preds = [0] * len(scan)
            mcu += 1
            for ci, comp in enumerate(scan):
                dc_tbl = htables.get((0, comp["td"]))
                ac_tbl = htables.get((1, comp["ta"]))
                q = qtables.get(comp["tq"])
                if dc_tbl is None or ac_tbl is None or q is None:
                    return None
                t = _jpeg_decode_symbol(br, dc_tbl)
                if t is None or t > 15:
                    return None
                vbits = br.read_bits(t)
                if vbits is None:
                    return None
                preds[ci] += _jpeg_extend(vbits, t)
                coef = [0] * 64
                coef[0] = preds[ci] * q[0]
                k = 0
                while k < 63:
                    rs = _jpeg_decode_symbol(br, ac_tbl)
                    if rs is None:
                        return None
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    r, s = rs >> 4, rs & 0x0F
                    k += r + 1
                    if k > 63 or s == 0:
                        return None
                    vb = br.read_bits(s)
                    if vb is None:
                        return None
                    coef[_JPEG_ZIGZAG[k]] = _jpeg_extend(vb, s) * q[k]
                block = _jpeg_idct_block(coef)
                plane = planes[ci]
                for yy in range(8):
                    py = yb * 8 + yy
                    if py >= h:
                        break
                    rowbase = py * w
                    for xx in range(8):
                        px = xb * 8 + xx
                        if px >= w:
                            break
                        plane[rowbase + px] = block[yy * 8 + xx]
    return w, h, planes


def decode_jpeg_pixels(raw: bytes) -> dict | None:
    """FULL baseline-JPEG decode (ITU-T T.81): marker walk, DHT/DQT
    from the file, Huffman entropy decode with unstuffing and restart
    markers, dequant, inverse DCT, level shift, integer YCbCr->RGB.
    Same integer feature contract as :func:`decode_png_pixels` /
    :func:`decode_gif_pixels` (``pixel_sum`` over RGB bytes, Rec.601
    ``luma_sum``), so any Huffman, IDCT, predictor, or color-math bug
    changes the output. Returns None for non-JPEGs, progressive /
    arithmetic / subsampled streams."""
    dec = _decode_jpeg_planes(raw)
    if dec is None:
        return None
    w, h, planes = dec
    pixel_sum = 0
    luma_sum = 0
    if len(planes) == 1:
        for v in planes[0]:
            pixel_sum += 3 * v
            luma_sum += 1000 * v
    else:
        py, pcb, pcr = planes
        for i in range(w * h):
            r, g, b = _jpeg_ycbcr_to_rgb(py[i], pcb[i], pcr[i])
            pixel_sum += r + g + b
            luma_sum += 299 * r + 587 * g + 114 * b
    return {
        "width": w,
        "height": h,
        "n_pixels": w * h,
        "pixel_sum": pixel_sum,
        "luma_sum": luma_sum,
    }


def _jpeg_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from BITS/HUFFVAL — the canonical
    assignment of T.81 Annex C, inverse of the decode structure."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _JpegBitWriter:
    """MSB-first bit writer with T.81 byte stuffing (0xFF -> 0xFF00)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _jpeg_encode_scan(blocks_per_comp: list[list[list[int]]]) -> bytes:
    """Entropy-code interleaved MCUs (1x1 sampling) from per-component
    lists of 64-length ZIGZAG-ORDER quantized coefficient blocks,
    with Annex K typical tables: differential DC category/extend
    coding and run-length AC (ZRL/EOB), byte-stuffed."""
    dc_tbl = _jpeg_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_tbl = _jpeg_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _JpegBitWriter()
    preds = [0] * len(blocks_per_comp)
    n_blocks = len(blocks_per_comp[0])
    for bi in range(n_blocks):
        for ci, blocks in enumerate(blocks_per_comp):
            zz = blocks[bi]
            diff = zz[0] - preds[ci]
            preds[ci] = zz[0]
            t = abs(diff).bit_length()
            bw.write(*dc_tbl[t])
            if t:
                v = diff if diff >= 0 else diff + (1 << t) - 1
                bw.write(v, t)
            # AC: run-length over zigzag positions 1..63
            run = 0
            for k in range(1, 64):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.write(*ac_tbl[0xF0])
                    run -= 16
                s = abs(v).bit_length()
                bw.write(*ac_tbl[(run << 4) | s])
                vb = v if v >= 0 else v + (1 << s) - 1
                bw.write(vb, s)
                run = 0
            if run:
                bw.write(*ac_tbl[0x00])  # EOB
    return bw.flush()


def _jpeg_wrap_stream(
    w: int, h: int, n_comps: int, scan_bytes: bytes, qtable: list[int]
) -> bytes:
    """Assemble a complete baseline JPEG file around an entropy-coded
    scan: SOI, DQT (table 0), SOF0 (1x1 sampling), DHT (Annex K DC+AC
    as tables 0), SOS, scan, EOI."""
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (2 + len(body)).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0x00]) + bytes(qtable))
    comps = b"".join(
        bytes([i + 1, 0x11, 0]) for i in range(n_comps)
    )
    sof = seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([n_comps]) + comps,
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    sos = seg(
        0xDA,
        bytes([n_comps])
        + b"".join(bytes([i + 1, 0x00]) for i in range(n_comps))
        + bytes([0, 63, 0]),
    )
    return b"\xff\xd8" + dqt + sof + dht + sos + scan_bytes + b"\xff\xd9"


def _synth_jpeg_full(mid: int) -> bytes:
    """COMPLETE valid baseline JPEG (any viewer opens it): 3
    components, 1x1 sampling, all-ones quant table, REAL Huffman
    entropy-coded scan (Annex K tables, differential DC, EOB'd AC)
    — with every block DC-only so the decode is integer-exact:
    width ``8 * (1 + id % 3)``, height ``8 * (1 + (id div 3) % 2)``,
    per block ``b`` (row-major):

    - ``Y  = 128 + (id*7  + b*13) % 200 - 100``
    - ``Cb = 128 + (id*5  + b*11) % 120 - 60``
    - ``Cr = 128 + (id*3  + b*17) % 120 - 60``

    (DC coefficient = 8 * the offset, so IDCT reproduces the value
    exactly.) The closed form lets the SQL oracle compute the decoded
    RGB pixel/luma sums without touching a byte, while the scan still
    exercises the full Huffman/bit-unstuffing/dequant/IDCT path."""
    w = 8 * (1 + mid % 3)
    h = 8 * (1 + (mid // 3) % 2)
    nbx, nby = w // 8, h // 8
    comps: list[list[list[int]]] = [[], [], []]
    for b in range(nbx * nby):
        dy = (mid * 7 + b * 13) % 200 - 100
        dcb = (mid * 5 + b * 11) % 120 - 60
        dcr = (mid * 3 + b * 17) % 120 - 60
        for ci, d in enumerate((dy, dcb, dcr)):
            zz = [0] * 64
            zz[0] = 8 * d
            comps[ci].append(zz)
    scan = _jpeg_encode_scan(comps)
    return _jpeg_wrap_stream(w, h, 3, scan, [1] * 64)


# ---------------------------------------------------------------------------
# FLAC FULL sample decode — Rice-coded FIXED prediction (RFC 9639)
# ---------------------------------------------------------------------------
#
# PNG covered stdlib DEFLATE, GIF a from-spec LZW, JPEG the T.81
# Huffman+IDCT cascade; FLAC brings the real-decode family to
# COMPRESSED AUDIO with a third from-spec entropy coder: Rice/Golomb
# residual coding under polynomial (FIXED) prediction, plus both
# integrity checksums the format mandates (CRC-8 header, CRC-16
# frame). The synthesis side emits spec-conformant single-frame
# streams exercising CONSTANT, VERBATIM and FIXED-order-1 subframes;
# every parameter is a closed-form function of the id so the decoded
# sample sums are oracle-checkable without touching a byte.


def _flac_crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the FLAC frame-header
    checksum."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _flac_crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 — the FLAC whole-frame checksum."""
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitW:
    """MSB-first bit writer (FLAC's bit order)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def pad(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        return bytes(self.buf)


def _flac_sample(mid: int, i: int) -> int:
    """Closed-form 16-bit sample recipe shared with the SQL oracle."""
    return (mid * 31 + i * 17) % 4001 - 2000


def _synth_flac_full(mid: int) -> bytes:
    """COMPLETE valid one-frame FLAC stream: STREAMINFO + a frame
    whose subframe type cycles by id — CONSTANT (id%3==0, value
    ``(id % 3001) - 1500``), VERBATIM (id%3==1), FIXED order-1 with
    Rice-coded residuals (id%3==2); blocksize ``32 + (id % 5) * 8``,
    8 kHz mono 16-bit. Real CRC-8/CRC-16; frame number 0."""
    n = 32 + (mid % 5) * 8
    variant = mid % 3
    # STREAMINFO: min/max blocksize, min/max framesize (0 = unknown),
    # packed rate/channels/bps/total, zero MD5
    packed = (8000 << 44) | ((1 - 1) << 41) | ((16 - 1) << 36) | n
    streaminfo = (
        n.to_bytes(2, "big") * 2
        + (0).to_bytes(3, "big") * 2
        + packed.to_bytes(8, "big")
        + bytes(16)
    )
    header = bytearray([0xFF, 0xF8, 0x64, 0x08, 0x00, n - 1])
    header.append(_flac_crc8(bytes(header)))
    w = _BitW()
    if variant == 0:
        c = (mid % 3001) - 1500
        w.write(0x00, 8)  # 0 | CONSTANT(000000) | wasted 0
        w.write(c & 0xFFFF, 16)
    elif variant == 1:
        w.write(0x02, 8)  # 0 | VERBATIM(000001) | wasted 0
        for i in range(n):
            w.write(_flac_sample(mid, i) & 0xFFFF, 16)
    else:
        w.write(0x12, 8)  # 0 | FIXED order 1 (001001) | wasted 0
        s0 = _flac_sample(mid, 0)
        w.write(s0 & 0xFFFF, 16)  # warmup
        w.write(0, 2)   # residual method: 4-bit Rice
        w.write(0, 4)   # partition order 0
        k = 12
        w.write(k, 4)   # rice parameter
        prev = s0
        for i in range(1, n):
            s = _flac_sample(mid, i)
            r = s - prev
            prev = s
            u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
            q, rem = u >> k, u & ((1 << k) - 1)
            for _ in range(q):
                w.write(0, 1)
            w.write(1, 1)
            w.write(rem, k)
    w.pad()
    frame = bytes(header) + w.bytes()
    frame += _flac_crc16(frame).to_bytes(2, "big")
    return (
        b"fLaC"
        + bytes([0x80])
        + (34).to_bytes(3, "big")
        + streaminfo
        + frame
    )


class _BitR:
    """MSB-first bit reader over a byte window."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.bitpos = pos * 8

    def read(self, bits: int) -> int | None:
        if self.bitpos + bits > len(self.data) * 8:
            return None
        v = 0
        for _ in range(bits):
            byte = self.data[self.bitpos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.bitpos & 7))) & 1)
            self.bitpos += 1
        return v

    def read_unary(self) -> int | None:
        q = 0
        while True:
            b = self.read(1)
            if b is None:
                return None
            if b == 1:
                return q
            q += 1

    def byte_pos(self) -> int:
        return (self.bitpos + 7) >> 3


_FLAC_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

#: FIXED predictor update: s[i] from residual + previous samples.
_FIXED_PRED = {
    0: lambda h: 0,
    1: lambda h: h[-1],
    2: lambda h: 2 * h[-1] - h[-2],
    3: lambda h: 3 * h[-1] - 3 * h[-2] + h[-3],
    4: lambda h: 4 * h[-1] - 6 * h[-2] + 4 * h[-3] - h[-4],
}


def _twos(v: int, bits: int) -> int:
    return v - (1 << bits) if v & (1 << (bits - 1)) else v


def _flac_decode_subframe(r: "_BitR", n: int, bps: int) -> list[int] | None:
    head = r.read(8)
    if head is None or head & 0x81:  # pad bit or wasted-bits flag
        return None
    stype = (head >> 1) & 0x3F
    if stype == 0:  # CONSTANT
        v = r.read(bps)
        return None if v is None else [_twos(v, bps)] * n
    if stype == 1:  # VERBATIM
        out = []
        for _ in range(n):
            v = r.read(bps)
            if v is None:
                return None
            out.append(_twos(v, bps))
        return out
    if 8 <= stype <= 12:  # FIXED order 0..4
        order = stype - 8
        hist = []
        for _ in range(order):
            v = r.read(bps)
            if v is None:
                return None
            hist.append(_twos(v, bps))
        predict = _FIXED_PRED[order]
        return _flac_decode_residuals(
            r, n, order, hist, lambda h: predict(h) if order else 0
        )
    if stype >= 32:  # LPC order 1..32
        order = (stype & 0x1F) + 1
        hist = []
        for _ in range(order):
            v = r.read(bps)
            if v is None:
                return None
            hist.append(_twos(v, bps))
        prec = r.read(4)
        if prec is None or prec == 0x0F:
            return None
        prec += 1
        shift = r.read(5)
        if shift is None or shift & 0x10:  # negative shift: invalid
            return None
        coefs = []
        for _ in range(order):
            v = r.read(prec)
            if v is None:
                return None
            coefs.append(_twos(v, prec))

        def lpc_pred(h):
            # arithmetic right shift of the coefficient dot product
            # (floor semantics — Python's >> on negatives matches)
            return sum(c * h[-j - 1] for j, c in enumerate(coefs)) >> shift

        return _flac_decode_residuals(r, n, order, hist, lpc_pred)
    return None  # reserved subframe types


def _flac_decode_residuals(r, n, order, hist, predict):
    """Shared Rice-residual decode + prediction reconstruction for
    FIXED and LPC subframes (RFC 9639 coded-residual section)."""
    method = r.read(2)
    porder = r.read(4)
    if method not in (0, 1) or porder is None:
        return None
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    out = list(hist)
    nparts = 1 << porder
    if n % nparts:
        return None
    for p in range(nparts):
        k = r.read(kbits)
        if k is None or k == escape:
            return None
        count = n // nparts - (order if p == 0 else 0)
        for _ in range(count):
            q = r.read_unary()
            if q is None:
                return None
            rem = r.read(k) if k else 0
            if rem is None:
                return None
            u = (q << k) | rem
            res = (u >> 1) ^ -(u & 1)
            out.append(res + (predict(out) if order else 0))
    return out


def _flac_parse(raw: bytes) -> tuple[int, list[list[int]]] | None:
    """FULL FLAC decode for streams with CONSTANT / VERBATIM / FIXED /
    LPC subframes and the three stereo-decorrelation modes: metadata
    walk, frame-header parse (blocksize/rate/bps code tables, UTF-8
    frame number), Rice residual decode, polynomial prediction
    reconstruction, and BOTH mandated checksums verified (CRC-8
    header, CRC-16 frame). Returns ``(sample_rate, channels)`` or
    None outside the supported envelope (>2-channel decorrelation
    codes, reserved subframe types, Rice escape partitions)."""
    if len(raw) < 8 or raw[:4] != b"fLaC":
        return None
    pos, si_rate, si_bps = 4, None, None
    while pos + 4 <= len(raw):
        header = raw[pos]
        btype, last = header & 0x7F, header & 0x80
        blen = int.from_bytes(raw[pos + 1:pos + 4], "big")
        if btype == 0 and blen >= 34:
            (packed,) = struct.unpack_from(">Q", raw, pos + 4 + 10)
            si_rate = packed >> 44
            si_bps = ((packed >> 36) & 0x1F) + 1
        pos += 4 + blen
        if last:
            break
    if pos + 6 > len(raw):
        return None
    # frame header
    if raw[pos] != 0xFF or (raw[pos + 1] & 0xFE) != 0xF8:
        return None
    bs_code = raw[pos + 2] >> 4
    rate_code = raw[pos + 2] & 0x0F
    chan_code = raw[pos + 3] >> 4
    bps_code = (raw[pos + 3] >> 1) & 0x07
    hpos = pos + 4
    # UTF-8-coded frame number: a k-leading-ones first byte means the
    # number spans k bytes total (k=0 → single byte)
    first = raw[hpos]
    lead = 0
    while lead < 8 and first & (0x80 >> lead):
        lead += 1
    hpos += max(lead, 1)
    if bs_code == 6:
        n = raw[hpos] + 1
        hpos += 1
    elif bs_code == 7:
        n = int.from_bytes(raw[hpos:hpos + 2], "big") + 1
        hpos += 2
    elif bs_code == 1:
        n = 192
    elif 2 <= bs_code <= 5:
        n = 576 << (bs_code - 2)
    elif bs_code >= 8:
        n = 256 << (bs_code - 8)
    else:
        return None
    if rate_code == 0:
        rate = si_rate
    elif rate_code in _FLAC_RATES:
        rate = _FLAC_RATES[rate_code]
    else:
        return None
    if chan_code > 10:
        return None
    n_channels = 2 if chan_code > 7 else chan_code + 1
    bps = si_bps if bps_code == 0 else _FLAC_BPS.get(bps_code)
    if not rate or not bps:
        return None
    if _flac_crc8(raw[pos:hpos]) != raw[hpos]:
        return None
    r = _BitR(raw, hpos + 1)
    channels = []
    for ch in range(n_channels):
        # the SIDE channel of a decorrelated pair carries one extra bit
        ch_bps = bps + (
            1
            if (chan_code == 8 and ch == 1)
            or (chan_code == 9 and ch == 0)
            or (chan_code == 10 and ch == 1)
            else 0
        )
        samples = _flac_decode_subframe(r, n, ch_bps)
        if samples is None:
            return None
        channels.append(samples)
    if chan_code == 8:  # left/side: right = left - side
        left, side = channels
        channels = [left, [l - s for l, s in zip(left, side)]]
    elif chan_code == 9:  # right/side: left = side + right
        side, right = channels
        channels = [[s + rt for s, rt in zip(side, right)], right]
    elif chan_code == 10:  # mid/side
        mid, side = channels
        left = [((m << 1 | (s & 1)) + s) >> 1 for m, s in zip(mid, side)]
        right = [((m << 1 | (s & 1)) - s) >> 1 for m, s in zip(mid, side)]
        channels = [left, right]
    end = r.byte_pos()
    if end + 2 > len(raw):
        return None
    if _flac_crc16(raw[pos:end]) != int.from_bytes(raw[end:end + 2], "big"):
        return None
    return rate, channels


def decode_flac_samples(raw: bytes) -> dict | None:
    """Summary features over :func:`_flac_parse`:
    ``{n_samples, sample_rate, sample_sum, sample_min, sample_max}``
    across channels."""
    parsed = _flac_parse(raw)
    if parsed is None:
        return None
    rate, channels = parsed
    total, smin, smax = 0, None, None
    for samples in channels:
        total += sum(samples)
        lo, hi = min(samples), max(samples)
        smin = lo if smin is None else min(smin, lo)
        smax = hi if smax is None else max(smax, hi)
    return {
        "n_samples": sum(len(c) for c in channels),
        "sample_rate": rate,
        "sample_sum": total,
        "sample_min": smin,
        "sample_max": smax,
    }


def decode_flac_stream(raw: bytes) -> list[int] | None:
    """Channel-concatenated decoded sample stream (the fingerprint
    tier's input) from :func:`_flac_parse`."""
    parsed = _flac_parse(raw)
    if parsed is None:
        return None
    out = []
    for c in parsed[1]:
        out.extend(c)
    return out


AUDIO_SAMPLES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("sample_sum", LongType(), True),
        StructField("sample_min", LongType(), True),
        StructField("sample_max", LongType(), True),
    ]
)


def decode_audio_samples(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Full-sample audio features over a media frame: FLAC payloads
    fully decoded (:func:`decode_flac_samples` — Rice + fixed
    prediction + CRCs); unsupported payloads produce no row (the
    decode_image_pixels convention). Arrow-batched mapInPandas."""
    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )
    cols = ("media_id", "n_samples", "sample_rate", "sample_sum",
            "sample_min", "sample_max")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                feats = decode_flac_samples(bytes(payload))
                if feats is None:
                    continue
                rows["media_id"].append(int(mid))
                for c in cols[1:]:
                    rows[c].append(feats[c])
            yield pd.DataFrame(rows) if rows["media_id"] else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return src.mapInPandas(run, AUDIO_SAMPLES_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual image hashing over REAL decoded pixels (r6)
# ---------------------------------------------------------------------------

#: dHash geometry: first N raster-order horizontal luma comparisons.
DHASH_BITS = 60


def image_dhash_bits(w: int, h: int, px: bytes) -> int:
    """Difference hash over an interleaved-RGB pixel buffer: raster-
    order horizontal comparisons — bit i is 1 iff
    ``luma(x, y) > luma(x+1, y)`` for the i-th pair (y major, x minor,
    x < w-1), first DHASH_BITS pairs, weight ``2^i``. Luma is integer
    Rec.601 (299R+587G+114B). The classic perceptual near-dup
    signature (same family as pHash), defined at native resolution so
    the SQL oracle can replay it from the pixel recipe closed-form."""
    bits = 0
    i = 0
    for y in range(h):
        if i >= DHASH_BITS:
            break
        row = y * w * 3
        for x in range(w - 1):
            if i >= DHASH_BITS:
                break
            p = row + x * 3
            la = 299 * px[p] + 587 * px[p + 1] + 114 * px[p + 2]
            lb = 299 * px[p + 3] + 587 * px[p + 4] + 114 * px[p + 5]
            if la > lb:
                bits |= 1 << i
            i += 1
    return bits


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("dhash", LongType(), True),
    ]
)


def image_dhash(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual dHash over fully-decoded PNG payloads (the
    :func:`_png_rgb` reconstruction — DEFLATE + all five filters), as
    an Arrow-batched mapInPandas stage. Non-PNG / undecodable
    payloads produce no row."""
    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {c: [] for c in ("media_id", "width", "height", "dhash")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                rgb = _png_rgb(bytes(payload))
                if rgb is None:
                    continue
                w, h, px = rgb
                rows["media_id"].append(int(mid))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["dhash"].append(image_dhash_bits(w, h, px))
            yield pd.DataFrame(rows) if rows["media_id"] else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in rows}
            )

    return src.mapInPandas(run, DHASH_SCHEMA)


def banded_hamming_pairs(
    hashes: DataFrame,
    group_cols: list[str],
    hash_col: str = "dhash",
    id_col: str = "media_id",
    max_hamming: int = 5,
    n_bands: int = 6,
    band_bits: int = 10,
) -> DataFrame:
    """Near-dup pairs by banded Hamming LSH over an int64 signature
    (the simhash_pairs discipline, shared by the image and audio
    tiers): split the hash into ``n_bands`` bands of ``band_bits`` —
    two hashes within Hamming distance ``< n_bands`` MUST agree on at
    least one band (pigeonhole), so candidates come from plain
    equi-joins on (group, band, value) and only candidates pay the
    exact ``bit_count(xor)`` verify. No all-pairs comparison at any
    scale. ``group_cols`` restricts comparisons to like-for-like
    signatures (image geometry, sample count)."""
    if max_hamming >= n_bands:
        raise ValueError("pigeonhole requires max_hamming < n_bands")
    bands = hashes.select(
        id_col,
        *group_cols,
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col(hash_col), b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select(id_col, *group_cols, hash_col, "bv.band", "bv.val")
    a, b = bands.alias("a"), bands.alias("b")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.val") == F.col("b.val"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )
    for g in group_cols:
        cond = cond & (F.col(f"a.{g}") == F.col(f"b.{g}"))
    cand = (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{hash_col}").alias("da"),
            F.col(f"b.{hash_col}").alias("db"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.expr("CAST(bit_count(da ^ db) AS BIGINT)")
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def image_dhash_pairs(
    hashes: DataFrame,
    max_hamming: int = 5,
    n_bands: int = 6,
    band_bits: int = 10,
) -> DataFrame:
    """Image near-dup pairs: :func:`banded_hamming_pairs` over the
    dHash frame, grouped by geometry."""
    return banded_hamming_pairs(
        hashes, ["width", "height"], "dhash", "media_id",
        max_hamming, n_bands, band_bits,
    )


def hash_cluster_edges(
    hashes: DataFrame,
    group_cols: list[str],
    hash_col: str = "dhash",
    id_col: str = "media_id",
    max_hamming: int = 5,
    n_bands: int = 6,
    band_bits: int = 10,
) -> DataFrame:
    """CONNECTED-COMPONENT-EQUIVALENT reduced edge set for hash-based
    media dedup — the exact-duplicate hot-group guard the pair frame
    itself cannot provide.

    A corpus with large identical-hash groups (exact re-uploads,
    template families — or any signature whose diversity saturates
    below the corpus size) makes the banded pair join quadratic in the
    group size: the r12 sf10 fixture hashed 500k images into 998
    distinct dHashes, i.e. 368.6M same-hash pairs before a single
    cross-hash candidate. For CLUSTERING, the clique over an
    identical-(group, hash) set and the STAR around its min-id member
    have identical connected components, and connecting any member of
    group A to any member of group B is component-equivalent to
    connecting their representatives. So this emits:

    - star edges (rep, member) within each identical-(group, hash)
      set — |corpus| − |distinct| edges instead of Σ group²/2;
    - :func:`banded_hamming_pairs` over the DISTINCT (group, hash)
      rows only (998 instead of 500k at the measured fixture), ids =
      group representatives.

    Downstream ``duplicate_clusters`` computes exactly the components
    (and therefore exactly the min-id survivors) it would get from
    the full pair frame — pinned by tests/test_cluster_dedup.py's
    star-reduction equivalence test. The pairwise CONTRACT differs
    (this is an edge set for CC, not the all-pairs report); consumers
    that need every pair keep :func:`image_dhash_pairs`.
    """
    reps = hashes.groupBy(*group_cols, hash_col).agg(
        F.min(F.col(id_col)).alias("__rep")
    )
    star = (
        hashes.join(reps, [*group_cols, hash_col])
        .where(F.col(id_col) != F.col("__rep"))
        .select(F.col("__rep").alias("id_a"), F.col(id_col).alias("id_b"))
    )
    rep_rows = reps.select(
        *[F.col(c) for c in group_cols],
        F.col(hash_col),
        F.col("__rep").alias(id_col),
    )
    rep_pairs = banded_hamming_pairs(
        rep_rows, group_cols, hash_col, id_col, max_hamming, n_bands, band_bits
    ).select("id_a", "id_b")
    return star.unionByName(rep_pairs)


FRAME_DIFF_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_pixels", LongType(), False),
        StructField("sad", LongType(), False),
        StructField("is_cut", BooleanType(), False),
    ]
)


def video_scene_cuts(
    df: DataFrame,
    threshold_per_pixel: int = 55,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Shot-boundary detection over REAL decoded video: consecutive
    Y4M frames' luma planes compared by SAD (sum of absolute
    differences — the standard scene-cut metric every frame-sampling
    pipeline thresholds), flagged as a cut when the per-pixel mean
    exceeds ``threshold_per_pixel``. One row per frame transition:
    ``(media_id, frame_idx, n_pixels, sad, is_cut)`` with
    ``is_cut = sad > threshold * n_pixels`` in pure integers.

    Arrow-batched mapInPandas over the chunk-manifest-compatible
    payload frame; undecodable payloads produce no rows. The
    interesting scale property: a cut list is metadata-scale output
    (frames, not pixels) from pixel-scale input, so it runs where the
    bytes are and ships almost nothing.
    """
    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )
    thr = int(threshold_per_pixel)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_id", "frame_idx", "n_pixels", "sad", "is_cut")
        for pdf in batches:
            rows = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                if not raw.startswith(b"YUV4MPEG2 "):
                    continue
                nl = raw.find(b"\n")
                if nl < 0:
                    continue
                header = raw[:nl].decode("ascii", "replace").split(" ")
                dims = {p[0]: p[1:] for p in header[1:] if p}
                try:
                    w, h = int(dims["W"]), int(dims["H"])
                except (KeyError, ValueError):
                    continue
                npx = w * h
                frame_bytes = npx + 2 * (npx // 4)
                pos = nl + 1
                prev = None
                idx = 0
                while pos + 6 <= len(raw) and raw[pos:pos + 5] == b"FRAME":
                    fnl = raw.find(b"\n", pos)
                    if fnl < 0 or fnl + frame_bytes > len(raw):
                        break
                    luma = raw[fnl + 1:fnl + 1 + npx]
                    if prev is not None:
                        a16 = np.frombuffer(luma, dtype=np.uint8).astype(np.int32)
                        b16 = np.frombuffer(prev, dtype=np.uint8).astype(np.int32)
                        sad = int(np.abs(a16 - b16).sum())
                        rows["media_id"].append(int(mid))
                        rows["frame_idx"].append(idx)
                        rows["n_pixels"].append(npx)
                        rows["sad"].append(sad)
                        rows["is_cut"].append(sad > thr * npx)
                    prev = luma
                    pos = fnl + 1 + frame_bytes
                    idx += 1
            yield pd.DataFrame(rows) if rows["media_id"] else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return src.mapInPandas(run, FRAME_DIFF_SCHEMA)


AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("afp", LongType(), True),
    ]
)


def audio_fingerprint_bits(samples: list[int], n_bits: int = DHASH_BITS) -> int:
    """Delta-sign acoustic signature over a decoded sample stream:
    bit i is 1 iff ``s[i+1] > s[i]`` (first ``n_bits`` transitions,
    weight ``2^i``) — the waveform-shape primitive under audio
    fingerprinting schemes (sign-of-delta is invariant to gain and
    DC offset, the two transforms a re-encode applies). Closed-form
    replayable from the sample recipe."""
    bits = 0
    for i in range(min(len(samples) - 1, n_bits)):
        if samples[i + 1] > samples[i]:
            bits |= 1 << i
    return bits


def decode_wav_stream(raw: bytes) -> list[int] | None:
    """Decoded 16-bit PCM sample stream from a RIFF/WAVE payload
    (channel-concatenated like :func:`decode_flac_stream`, so the
    SAME clip fingerprints identically whichever container it arrived
    in — format-invariance is pytest-pinned)."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    pos, channels, bits, data = 12, None, None, None
    while pos + 8 <= len(raw):
        cid, csize = raw[pos:pos + 4], struct.unpack_from("<I", raw, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt " and csize >= 16:
            _, channels, _, _, _, bits = struct.unpack_from("<HHIIHH", raw, body)
        elif cid == b"data":
            data = raw[body:body + min(csize, len(raw) - body)]
        pos = body + csize + (csize & 1)
    if not channels or bits != 16 or data is None:
        return None
    flat = np.frombuffer(data[: len(data) - len(data) % (2 * channels)],
                         dtype="<i2").astype(int)
    # interleaved -> per-channel concatenation (FLAC stream order)
    out = []
    for c in range(channels):
        out.extend(flat[c::channels].tolist())
    return out


def audio_fingerprint(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Acoustic fingerprints over FULLY DECODED audio payloads —
    FLAC through the Rice/prediction/CRC cascade
    (:func:`decode_flac_stream`) or RIFF/WAVE 16-bit PCM
    (:func:`decode_wav_stream`), dispatched on magic bytes — then the
    delta-sign signature summarizes the waveform. Arrow-batched;
    undecodable payloads produce no row."""
    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_id", "n_samples", "afp")
        for pdf in batches:
            rows = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                raw = bytes(payload)
                samples = (
                    decode_flac_stream(raw)
                    if raw[:4] == b"fLaC"
                    else decode_wav_stream(raw)
                )
                if samples is None:
                    continue
                rows["media_id"].append(int(mid))
                rows["n_samples"].append(len(samples))
                rows["afp"].append(audio_fingerprint_bits(samples))
            yield pd.DataFrame(rows) if rows["media_id"] else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return src.mapInPandas(run, AUDIO_FP_SCHEMA)


def audio_fingerprint_pairs(
    hashes: DataFrame,
    max_hamming: int = 5,
    n_bands: int = 6,
    band_bits: int = 10,
) -> DataFrame:
    """Audio near-dup pairs: :func:`banded_hamming_pairs` over the
    fingerprint frame, grouped by sample count — with this, the
    near-dup ladder covers TEXT (shingles/minhash/simhash/winnowing),
    IMAGES (dHash) and AUDIO (delta-sign) under one banded-LSH
    discipline."""
    return banded_hamming_pairs(
        hashes, ["n_samples"], "afp", "media_id",
        max_hamming, n_bands, band_bits,
    )


# ---------------------------------------------------------------------------
# Image resize (r7) — the remaining multimodal verb from the build
# brief (decode / feature-extract / RESIZE / frame-sample)
# ---------------------------------------------------------------------------

RESIZE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("src_width", IntegerType(), True),
        StructField("src_height", IntegerType(), True),
        StructField("out_width", IntegerType(), True),
        StructField("out_height", IntegerType(), True),
        StructField("r_pixel_sum", LongType(), True),
        StructField("r_luma_sum", LongType(), True),
    ]
)


def resize_image_pixels(
    df: DataFrame,
    out_w: int,
    out_h: int,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Nearest-neighbor image RESIZE over fully decoded PNG pixels —
    the preprocessing verb between decode and batching (every image
    pipeline normalizes to a target resolution per aspect bucket; see
    :func:`aspect_bucket` for the grouping key). Exact integer
    contract so the output is hash-oracle-able: target pixel (tx, ty)
    samples source pixel ``((tx * w) div out_w, (ty * h) div out_h)``
    — the standard floor mapping, no interpolation arithmetic to
    diverge on. Emits the resized frame's integer pixel and Rec.601
    luma sums (the same feature convention as
    :func:`decode_image_pixels`).

    Arrow-batched ``mapInPandas``; numpy fancy-indexing does the
    gather per image (no per-pixel Python loop). Non-PNG /
    undecodable payloads produce no row."""
    from pasta_pipeline_spark.operators.util import ensure_package_on_workers

    ensure_package_on_workers(df.sparkSession)
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = (
            "media_id", "src_width", "src_height", "out_width",
            "out_height", "r_pixel_sum", "r_luma_sum",
        )
        for pdf in batches:
            rows = {c: [] for c in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                decoded = _png_rgb(bytes(payload))
                if decoded is None:
                    continue
                w, h, rgb = decoded
                px = np.frombuffer(bytes(rgb), dtype=np.uint8).reshape(h, w, 3)
                sx = (np.arange(out_w, dtype=np.int64) * w) // out_w
                sy = (np.arange(out_h, dtype=np.int64) * h) // out_h
                out = px[np.ix_(sy, sx)].astype(np.int64)
                luma = (
                    299 * out[:, :, 0] + 587 * out[:, :, 1] + 114 * out[:, :, 2]
                )
                rows["media_id"].append(int(mid))
                rows["src_width"].append(int(w))
                rows["src_height"].append(int(h))
                rows["out_width"].append(out_w)
                rows["out_height"].append(out_h)
                rows["r_pixel_sum"].append(int(out.sum()))
                rows["r_luma_sum"].append(int(luma.sum()))
            yield pd.DataFrame(rows) if rows["media_id"] else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return src.mapInPandas(run, RESIZE_FEATURES_SCHEMA)

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats images/audio/video as `binary` columns with metadata
structs, processed by Arrow-batched pandas kernels over mapInPandas —
the only Python in the engine's hot paths, and the standard shape for
decode/resize/frame-sample at 100 TB (per-partition batch iterators, no
per-row serde, no driver involvement).

Three tiers, by what this container can honestly run:
- `extract_binary_features` — byte length + md5, oracle-verifiable.
- CONTAINER-HEADER CODEC (`parse_image_headers` + `synthesize_image`):
  real struct-level decode of PNG IHDR / GIF logical-screen / BMP
  BITMAPINFOHEADER / JPEG SOF marker-walk, pure stdlib — the metadata
  pass a 100 TB image catalog actually runs (dimensions/format/depth
  without pixel decode). Differential-tested: Spark synthesizes real
  byte streams, parses them back, and the DuckDB oracle recomputes the
  expected fields arithmetically — a parser bug hash-mismatches.
- PIXEL decode / video frame-sample — needs imaging libs absent here;
  stubbed behind NotImplementedError with the plumbing real and
  exercised by `deterministic_fake_decode`.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_binary_features(
    df: DataFrame, id_col: str = "id", binary_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    Output: (id_col, n_bytes bigint, content_hash string). Deterministic,
    so it is oracle-verifiable (octet_length + md5 in SQL).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[binary_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payload.map(len).astype("int64"),
                    "content_hash": payload.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    schema = f"{id_col} long, n_bytes long, content_hash string"
    return df.mapInPandas(kernel, schema=schema)


# ---------------------------------------------------------------------------
# Container-header codec (real, stdlib-only)
# ---------------------------------------------------------------------------


def synthesize_image(fmt: str, width: int, height: int) -> bytes:
    """Minimal VALID container bytes for the given format/dimensions —
    real magic numbers, real header layout (PNG IHDR chunk, GIF89a
    logical screen descriptor, BMP BITMAPINFOHEADER, JPEG JFIF + SOF0
    segment). Used to build test corpora whose parsed metadata is known
    in closed form."""
    if fmt == "png":
        ihdr = struct.pack(">II", width, height) + bytes([8, 2, 0, 0, 0])
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13)
            + b"IHDR"
            + ihdr
            + b"\x00\x00\x00\x00"  # CRC not validated by header readers
        )
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", width, height) + bytes([0xF7, 0, 0])
    if fmt == "bmp":
        info = struct.pack("<IiiHH", 40, width, height, 1, 24) + b"\x00" * 24
        return b"BM" + struct.pack("<IHHI", 14 + 40, 0, 0, 14 + 40) + info
    if fmt == "jpeg":
        # APP0 length 16 = 2 (length field) + 14 payload: "JFIF\0",
        # version 1.2, units, X/Y density, X/Y thumbnail
        app0 = (
            b"\xff\xe0"
            + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x02\x00"
            + struct.pack(">HH", 1, 1)
            + b"\x00\x00"
        )
        sof0 = (
            b"\xff\xc0"
            + struct.pack(">H", 17)
            + bytes([8])
            + struct.pack(">HH", height, width)
            + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
        )
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    raise ValueError(f"unknown format {fmt!r}")


def parse_image_header(b: bytes) -> tuple[str, int, int, int] | None:
    """Decode (format, width, height, bit_depth) from container header
    bytes — PNG IHDR, GIF logical screen, BMP info header, JPEG SOF0/2
    via marker walk. Returns None for unrecognized/truncated payloads
    (callers emit NULLs — corrupt files are data, not exceptions)."""
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return "png", w, h, b[24]
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return "gif", w, h, (b[10] & 0x07) + 1
        if b[:2] == b"BM":
            _, w, h = struct.unpack("<Iii", b[14:26])
            depth = struct.unpack("<H", b[28:30])[0]
            return "bmp", w, abs(h), depth
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(b) and b[i] == 0xFF:
                marker, seg_len = b[i + 1], struct.unpack(">H", b[i + 2 : i + 4])[0]
                if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                    depth = b[i + 4]
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return "jpeg", w, h, depth
                if marker == 0xD9:  # EOI before any SOF
                    return None
                i += 2 + seg_len
        return None
    except (struct.error, IndexError):
        return None


IMAGE_HEADER_SCHEMA = (
    "format string, width int, height int, bit_depth int"
)


def parse_image_headers(
    df: DataFrame, id_col: str = "id", binary_col: str = "payload"
) -> DataFrame:
    """Arrow-batched container-metadata decode over a binary column:
    (id, format, width, height, bit_depth), NULLs for unparseable rows.
    This is the working decode tier — at 100 TB the cataloging pass that
    reads only headers, partition-parallel, no pixel decode."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(bytes(x)) for x in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": [p[0] if p else None for p in parsed],
                    "width": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                    "bit_depth": pd.array(
                        [p[3] if p else None for p in parsed], dtype="Int32"
                    ),
                }
            )

    return df.mapInPandas(
        kernel, schema=f"{id_col} long, {IMAGE_HEADER_SCHEMA}"
    )


def synthesize_wav(sample_rate: int, n_channels: int, n_samples: int) -> bytes:
    """Minimal valid RIFF/WAVE container (16-bit PCM): real RIFF framing
    with fmt and data chunks; the data chunk is declared but elided
    (header-only corpus), exactly what a metadata catalog reads."""
    data_len = n_samples * n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate,
        sample_rate * n_channels * 2, n_channels * 2, 16,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + data_len)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", data_len)
    )


def parse_wav_header(b: bytes) -> tuple[int, int, int, int] | None:
    """Decode (sample_rate, n_channels, bits_per_sample, duration_ms)
    from a RIFF/WAVE header by chunk-walking to fmt and data. Duration
    is integer milliseconds (floor) — exact integer arithmetic, so the
    value is engine-portable (float seconds would hit cross-engine
    round() disagreement). None for non-WAV/truncated payloads."""
    try:
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        i, fmt, data_len = 12, None, None
        while i + 8 <= len(b):
            cid, clen = b[i : i + 4], struct.unpack("<I", b[i + 4 : i + 8])[0]
            if cid == b"fmt ":
                _, ch, rate, _, block, bits = struct.unpack(
                    "<HHIIHH", b[i + 8 : i + 24]
                )
                fmt = (rate, ch, bits, block)
            elif cid == b"data":
                data_len = clen
            i += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
        if fmt is None or data_len is None:
            return None
        rate, ch, bits, block = fmt
        if not block or not rate:
            return None
        return rate, ch, bits, (data_len * 1000) // (block * rate)
    except (struct.error, IndexError):
        return None


WAV_HEADER_SCHEMA = (
    "sample_rate int, n_channels int, bits_per_sample int, duration_ms long"
)


def parse_wav_headers(
    df: DataFrame, id_col: str = "id", binary_col: str = "payload"
) -> DataFrame:
    """Arrow-batched audio-metadata decode (sibling of
    parse_image_headers): NULLs for unparseable payloads."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_wav_header(bytes(x)) for x in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": pd.array(
                        [p[0] if p else None for p in parsed], dtype="Int32"
                    ),
                    "n_channels": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "bits_per_sample": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [p[3] if p else None for p in parsed], dtype="Int64"
                    ),
                }
            )

    return df.mapInPandas(kernel, schema=f"{id_col} long, {WAV_HEADER_SCHEMA}")


def synthesize_mp4(
    timescale: int, duration_ticks: int, width: int, height: int
) -> bytes:
    """Minimal valid ISO-BMFF (MP4) container: ftyp box + moov box
    nesting a version-0 mvhd (timescale, duration) and one trak/tkhd
    (track id, 16.16 fixed-point width/height). Real box framing
    ([size][type][payload], sizes include the 8-byte header), so any
    parser that walks standard MP4 boxes reads it. Media data (mdat) is
    absent on purpose — this is the header-only corpus a metadata
    catalog reads."""
    ftyp = b"isom" + struct.pack(">I", 512) + b"isommp41"
    ftyp = struct.pack(">I", 8 + len(ftyp)) + b"ftyp" + ftyp
    mvhd = (
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation / modification time
        + struct.pack(">II", timescale, duration_ticks)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", 2)  # next_track_ID
    )
    mvhd = struct.pack(">I", 8 + len(mvhd)) + b"mvhd" + mvhd
    tkhd = (
        b"\x00\x00\x00\x07"  # version 0 + flags (enabled|in-movie|in-preview)
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track_ID
        + b"\x00" * 4  # reserved
        + struct.pack(">I", duration_ticks)
        + b"\x00" * 8  # reserved
        + struct.pack(">HHH", 0, 0, 0)  # layer, group, volume
        + b"\x00" * 2
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16)  # 16.16 fixed
    )
    tkhd = struct.pack(">I", 8 + len(tkhd)) + b"tkhd" + tkhd
    trak = struct.pack(">I", 8 + len(tkhd)) + b"trak" + tkhd
    moov = struct.pack(">I", 8 + len(mvhd) + len(trak)) + b"moov" + mvhd + trak
    return ftyp + moov


def parse_mp4_header(
    b: bytes,
) -> tuple[str, int, int, int, int] | None:
    """Decode (brand, timescale, duration_ms, width, height) from an
    ISO-BMFF byte stream by the standard box walk: top-level boxes to
    ftyp/moov, then moov's children to mvhd and trak/tkhd. Handles any
    box order and skips unknown boxes by their declared size, so real
    MP4 files (with mdat, udta, free, ...) parse too. Duration is
    integer milliseconds (floor — engine-portable exact arithmetic).
    None for non-BMFF/truncated payloads."""

    def walk(buf: bytes, start: int, end: int):
        i = start
        while i + 8 <= end:
            size = struct.unpack(">I", buf[i : i + 4])[0]
            if size < 8 or i + size > end:
                return
            yield buf[i + 4 : i + 8], i + 8, i + size
            i += size

    try:
        brand = timescale = duration = width = height = None
        for btype, p0, p1 in walk(b, 0, len(b)):
            if btype == b"ftyp":
                brand = b[p0 : p0 + 4].decode("ascii", "replace")
            elif btype == b"moov":
                for ctype, c0, c1 in walk(b, p0, p1):
                    if ctype == b"mvhd" and b[c0] == 0:  # version 0: 32-bit
                        timescale, duration = struct.unpack(
                            ">II", b[c0 + 12 : c0 + 20]
                        )
                    elif ctype == b"trak":
                        for gtype, g0, _g1 in walk(b, c0, c1):
                            if gtype == b"tkhd" and b[g0] == 0:
                                w16, h16 = struct.unpack(
                                    ">II", b[g0 + 76 : g0 + 84]
                                )
                                width, height = w16 >> 16, h16 >> 16
        if brand is None or timescale is None or not timescale:
            return None
        return (
            brand,
            timescale,
            (duration * 1000) // timescale,
            width if width is not None else 0,
            height if height is not None else 0,
        )
    except (struct.error, IndexError):
        return None


MP4_HEADER_SCHEMA = (
    "brand string, timescale int, duration_ms long, width int, height int"
)


def parse_mp4_headers(
    df: DataFrame, id_col: str = "id", binary_col: str = "payload"
) -> DataFrame:
    """Arrow-batched video-container metadata decode (sibling of
    parse_image_headers / parse_wav_headers): NULLs for unparseable
    payloads. At 100 TB this is the catalog pass over video blobs —
    box walk only, no codec, partition-parallel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_mp4_header(bytes(x)) for x in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "brand": [p[0] if p else None for p in parsed],
                    "timescale": pd.array(
                        [p[1] if p else None for p in parsed], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [p[2] if p else None for p in parsed], dtype="Int64"
                    ),
                    "width": pd.array(
                        [p[3] if p else None for p in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [p[4] if p else None for p in parsed], dtype="Int32"
                    ),
                }
            )

    return df.mapInPandas(kernel, schema=f"{id_col} long, {MP4_HEADER_SCHEMA}")


@dataclass
class ImageMeta:
    """Typed metadata accompanying an image payload column."""

    width: int
    height: int
    format: str  # e.g. "jpeg", "png"


IMAGE_FEATURE_SCHEMA = (
    "id long, width int, height int, n_channels int, mean_luma double"
)


def decode_images(df: DataFrame, id_col: str = "id", binary_col: str = "payload") -> DataFrame:
    """Decode image bytes -> (width, height, channels, mean luma).

    STUB: real decode needs an imaging library (Pillow/opencv), absent in
    this environment. The mapInPandas plumbing below is the production
    shape — swap `_decode_stub` for the real kernel.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    **_decode_stub(pdf[binary_col]),
                }
            )

    return df.mapInPandas(kernel, schema=IMAGE_FEATURE_SCHEMA.replace("id ", f"{id_col} "))


def _decode_stub(payload: pd.Series) -> dict:
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; the mapInPandas plumbing (schema, batching, "
        "partition-parallelism) is exercised via "
        "deterministic_fake_decode in tests"
    )


def deterministic_fake_decode(
    df: DataFrame, id_col: str = "id", binary_col: str = "payload"
) -> DataFrame:
    """Test double for decode_images: derives fake-but-deterministic image
    properties from the payload bytes so the full pipeline (schema,
    batch shape, downstream aggregation) is testable without media libs."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            b = pdf[binary_col]
            n = b.map(len).astype("int64")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "n_channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "mean_luma": (n % 256).astype("float64"),
                }
            )

    return df.mapInPandas(kernel, schema=IMAGE_FEATURE_SCHEMA.replace("id ", f"{id_col} "))


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling STUB: at scale this is mapInPandas producing
    one row per sampled frame (explode in Python, Arrow out). Needs a
    video lib; kept as the documented extension point."""
    raise NotImplementedError("video decode libraries unavailable in this environment")

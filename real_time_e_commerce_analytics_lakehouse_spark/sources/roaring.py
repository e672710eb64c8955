"""Delta deletion-vector binary formats, per the PUBLIC Delta protocol
spec (github.com/delta-io/delta PROTOCOL.md, "Deletion Vectors" and
"Deletion Vector Format" sections) and the public 64-bit roaring-bitmap
portable serialization (github.com/RoaringBitmap/RoaringFormatSpec).

Three layers, all stdlib + numpy:

- Z85 text encoding (the ZeroMQ RFC 32 variant Delta uses for DV file
  UUIDs and inline DV payloads): 4 bytes <-> 5 chars, big-endian base-85.
- 32-bit roaring bitmap (standard portable format): array / bitmap / run
  containers keyed by the value's high 16 bits.
- RoaringBitmapArray ("portable" 64-bit format): little-endian magic
  1681511377, int64 bitmap count, then per bucket a 4-byte high-32-bit
  key + one standard 32-bit roaring bitmap. Row indexes are
  (key << 32) | value32.

The serializer exists for tests and for laketable->Delta DV export; the
deserializer is the production read path (sources/delta_log.py decodes
each file's DV blob executor-side and anti-joins on _metadata.row_index).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --------------------------------------------------------------------------
# Z85 (ZeroMQ RFC 32): Delta encodes DV file UUIDs and inline DV payloads
# with this 85-char alphabet, 4 bytes -> 5 chars big-endian.
# --------------------------------------------------------------------------

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError(f"z85 payload must be 4-byte aligned, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, rem = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 text must be 5-char aligned, got {len(text)}")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid z85 character {c!r}") from None
        if v > 0xFFFFFFFF:
            raise ValueError("z85 group overflows 32 bits")
        out += v.to_bytes(4, "big")
    return bytes(out)


# --------------------------------------------------------------------------
# 32-bit roaring bitmap, standard portable format (RoaringFormatSpec)
# --------------------------------------------------------------------------

_SERIAL_COOKIE_NO_RUNS = 12346
_SERIAL_COOKIE_RUNS = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX_CARD = 4096


def _parse_roaring32(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """Parse one standard 32-bit roaring bitmap starting at ``pos``.
    Returns (sorted uint32 values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    base = cookie & 0xFFFF
    if base == _SERIAL_COOKIE_RUNS:
        n = (cookie >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = np.unpackbits(
            np.frombuffer(buf, np.uint8, nbytes, pos), bitorder="little"
        )[:n]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif base == _SERIAL_COOKIE_NO_RUNS:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        run_flags = np.zeros(n, dtype=np.uint8)
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie:#x}")
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, c1 = struct.unpack_from("<HH", buf, pos)
        keys[i], cards[i] = k, c1 + 1
        pos += 4
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential parsing
    chunks: list[np.ndarray] = []
    for i in range(n):
        high = np.uint32(keys[i]) << np.uint32(16)
        if run_flags[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, np.uint16, 2 * n_runs, pos).reshape(
                n_runs, 2
            )
            pos += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(s, s + ln + 1, dtype=np.uint32)
                    for s, ln in runs.astype(np.int64)
                ]
            ) if n_runs else np.empty(0, np.uint32)
        elif cards[i] <= _ARRAY_MAX_CARD:
            vals = np.frombuffer(buf, np.uint16, int(cards[i]), pos).astype(
                np.uint32
            )
            pos += 2 * int(cards[i])
        else:
            words = np.frombuffer(buf, np.uint8, 8192, pos)
            pos += 8192
            vals = np.nonzero(
                np.unpackbits(words, bitorder="little")
            )[0].astype(np.uint32)
        chunks.append(vals | high)
    out = (
        np.concatenate(chunks) if chunks else np.empty(0, dtype=np.uint32)
    )
    return out, pos


def _serialize_roaring32(values: np.ndarray) -> bytes:
    """Serialize sorted uint32 values as a standard portable roaring
    bitmap (no-run cookie: simplest spec-compliant writer)."""
    values = np.asarray(values, dtype=np.uint32)
    high = (values >> np.uint32(16)).astype(np.uint16)
    low = (values & np.uint32(0xFFFF)).astype(np.uint16)
    keys, starts = np.unique(high, return_index=True)
    n = len(keys)
    splits = np.split(low, starts[1:])
    header = struct.pack("<II", _SERIAL_COOKIE_NO_RUNS, n)
    desc = b"".join(
        struct.pack("<HH", int(k), len(vals) - 1)
        for k, vals in zip(keys, splits)
    )
    bodies: list[bytes] = []
    for vals in splits:
        if len(vals) <= _ARRAY_MAX_CARD:
            bodies.append(vals.astype("<u2").tobytes())
        else:
            bits = np.zeros(65536, dtype=np.uint8)
            bits[vals.astype(np.int64)] = 1
            bodies.append(np.packbits(bits, bitorder="little").tobytes())
    offsets = []
    pos = len(header) + len(desc) + 4 * n
    for b in bodies:
        offsets.append(struct.pack("<I", pos))
        pos += len(b)
    return header + desc + b"".join(offsets) + b"".join(bodies)


# --------------------------------------------------------------------------
# RoaringBitmapArray 64-bit "portable" format (what Delta DVs carry)
# --------------------------------------------------------------------------

_RBA_MAGIC = 1681511377


def deserialize_rba(data: bytes) -> np.ndarray:
    """Decode a RoaringBitmapArray payload into a sorted int64 array of
    row indexes."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != _RBA_MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} (want {_RBA_MAGIC})"
        )
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    chunks: list[np.ndarray] = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<I", data, pos)
        pos += 4
        vals32, pos = _parse_roaring32(data, pos)
        chunks.append(vals32.astype(np.int64) | (np.int64(key) << np.int64(32)))
    if not chunks:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(chunks)


def serialize_rba(row_indexes) -> bytes:
    """Encode sorted non-negative int64 row indexes as a
    RoaringBitmapArray payload (portable format)."""
    arr = np.asarray(sorted(set(int(i) for i in row_indexes)), dtype=np.int64)
    if len(arr) and arr[0] < 0:
        raise ValueError("row indexes must be non-negative")
    high = (arr >> np.int64(32)).astype(np.uint32)
    low = (arr & np.int64(0xFFFFFFFF)).astype(np.uint32)
    keys, starts = np.unique(high, return_index=True)
    parts = [struct.pack("<iq", _RBA_MAGIC, len(keys))]
    for k, vals in zip(keys, np.split(low, starts[1:])):
        parts.append(struct.pack("<I", int(k)))
        parts.append(_serialize_roaring32(vals))
    return b"".join(parts)


# --------------------------------------------------------------------------
# DV file framing: <1-byte format version> then per DV at `offset`:
# <4-byte BE data size> <data> <4-byte BE CRC-32 of data>
# --------------------------------------------------------------------------


def read_dv_blob(file_bytes: bytes, offset: int, size_in_bytes: int) -> bytes:
    """Extract + verify one DV payload from a DV file's bytes."""
    if not file_bytes or file_bytes[0] != 1:
        raise ValueError(
            f"unsupported DV file format version "
            f"{file_bytes[0] if file_bytes else '<empty>'}"
        )
    (stored_size,) = struct.unpack_from(">I", file_bytes, offset)
    if stored_size != size_in_bytes:
        raise ValueError(
            f"DV size mismatch: descriptor says {size_in_bytes}, "
            f"file stores {stored_size}"
        )
    data = file_bytes[offset + 4 : offset + 4 + size_in_bytes]
    (crc,) = struct.unpack_from(">I", file_bytes, offset + 4 + size_in_bytes)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("DV checksum mismatch")
    return data


def write_dv_file(payloads: list[bytes]) -> tuple[bytes, list[int]]:
    """Frame DV payloads into one DV file image; returns (file bytes,
    per-payload offsets) for building descriptors."""
    out = bytearray(b"\x01")
    offsets = []
    for data in payloads:
        offsets.append(len(out))
        out += struct.pack(">I", len(data))
        out += data
        out += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    return bytes(out), offsets

"""Delta deletion-vector binary formats (sources/roaring): Z85 text
codec, 32-bit roaring portable format (array/bitmap/run containers),
RoaringBitmapArray 64-bit framing, and the DV file size/CRC envelope —
all per the public Delta PROTOCOL.md + RoaringFormatSpec."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from real_time_e_commerce_analytics_lakehouse_spark.sources import roaring as R


def test_z85_rfc32_test_vector():
    # the ZeroMQ RFC 32 canonical vector
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert R.z85_encode(raw) == "HelloWorld"
    assert R.z85_decode("HelloWorld") == raw


def test_z85_rejects_misaligned_and_bad_chars():
    with pytest.raises(ValueError):
        R.z85_encode(b"abc")
    with pytest.raises(ValueError):
        R.z85_decode("abcd")
    with pytest.raises(ValueError):
        R.z85_decode('"""""')  # '"' not in the alphabet


@given(st.binary(min_size=0, max_size=64).map(lambda b: b[: len(b) - len(b) % 4]))
def test_z85_roundtrip(data):
    assert R.z85_decode(R.z85_encode(data)) == data


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40),
        min_size=0,
        max_size=2000,
    )
)
def test_rba_roundtrip_property(idx):
    assert list(R.deserialize_rba(R.serialize_rba(idx))) == sorted(set(idx))


def test_rba_bitmap_container_tier():
    # >4096 values in one 16-bit chunk forces the bitmap container
    vals = list(range(5000))
    assert list(R.deserialize_rba(R.serialize_rba(vals))) == vals


def test_rba_multiple_high_buckets():
    vals = [2**32 - 1, 2**32, 2**32 + 7, 2**40 + 3]
    assert list(R.deserialize_rba(R.serialize_rba(vals))) == vals


def test_parse_run_containers_from_foreign_writer():
    """Hand-built RUNS-cookie bitmap (our writer never emits runs, but
    Delta writers do): run + array containers in one bitmap."""
    n = 2
    cookie = struct.pack("<I", R._SERIAL_COOKIE_RUNS | ((n - 1) << 16))
    runbits = bytes([0b01])
    desc = struct.pack("<HH", 0, 5 - 1) + struct.pack("<HH", 2, 2 - 1)
    c0 = (
        struct.pack("<H", 2)
        + struct.pack("<HH", 5, 3)
        + struct.pack("<HH", 100, 0)
    )
    c1 = struct.pack("<HH", 7, 9)
    buf = cookie + runbits + desc + c0 + c1
    vals, pos = R._parse_roaring32(buf, 0)
    assert pos == len(buf)
    assert list(vals) == [5, 6, 7, 8, 100, (2 << 16) | 7, (2 << 16) | 9]


def test_dv_file_envelope_roundtrip_and_corruption():
    p1, p2 = R.serialize_rba([1, 5, 9]), R.serialize_rba(range(10000))
    img, offs = R.write_dv_file([p1, p2])
    assert img[0] == 1  # format version byte
    assert R.read_dv_blob(img, offs[0], len(p1)) == p1
    assert R.read_dv_blob(img, offs[1], len(p2)) == p2
    # size mismatch between descriptor and file
    with pytest.raises(ValueError, match="size mismatch"):
        R.read_dv_blob(img, offs[0], len(p1) + 4)
    # bit-flip in the payload breaks the CRC
    bad = bytearray(img)
    bad[offs[0] + 4] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        R.read_dv_blob(bytes(bad), offs[0], len(p1))
    # wrong format version byte
    with pytest.raises(ValueError, match="format version"):
        R.read_dv_blob(b"\x02" + img[1:], offs[0], len(p1))


def test_rba_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        R.deserialize_rba(struct.pack("<iq", 123, 0))


def test_serialize_dedupes_and_sorts():
    random.seed(7)
    vals = [random.randrange(0, 10**6) for _ in range(5000)]
    dup = vals + vals[:100]
    assert list(R.deserialize_rba(R.serialize_rba(dup))) == sorted(set(vals))

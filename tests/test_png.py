"""Pure-stdlib PNG codec (functions/png.py): roundtrips across every
filter type / channel count, spec edge cases, fail-loud paths. No Ray."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from osmwaterwayextractor_ray.functions.png import decode_png, encode_png


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("filter_mode", [0, 1, 2, 3, 4, "cycle"])
def test_roundtrip_random(channels, filter_mode):
    rng = np.random.default_rng(channels * 10 + (5 if filter_mode == "cycle" else filter_mode))
    a = rng.integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    got = decode_png(encode_png(a, filter_mode=filter_mode))
    assert got.shape == a.shape
    np.testing.assert_array_equal(got, a)


def test_roundtrip_2d_grey():
    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    got = decode_png(encode_png(a))
    np.testing.assert_array_equal(got[:, :, 0], a)


@pytest.mark.parametrize("shape", [(1, 1, 3), (1, 40, 3), (40, 1, 3), (2, 2, 1)])
def test_roundtrip_degenerate_shapes(shape):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(a, filter_mode="cycle")), a)


def test_known_vector():
    """Hand-checkable 2x2 grey image, filter 0: IDAT payload is exactly
    the filter-prefixed scanlines."""
    a = np.array([[0, 255], [10, 20]], dtype=np.uint8)
    data = encode_png(a, filter_mode=0)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR: w=2 h=2 depth=8 color=0 (grey)
    assert data[8:29] == struct.pack(">I4sIIBBBBB", 13, b"IHDR", 2, 2, 8, 0, 0, 0, 0)
    # locate IDAT and check the decompressed scanlines
    i = data.index(b"IDAT")
    (ln,) = struct.unpack(">I", data[i - 4 : i])
    assert zlib.decompress(data[i + 4 : i + 4 + ln]) == b"\x00\x00\xff\x00\x0a\x14"


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + b"\x00" * 64)


def test_bad_crc_raises():
    data = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
    data[-5] ^= 0xFF  # corrupt IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_truncated_raises():
    data = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(data[: len(data) // 2])


def test_16bit_raises_notimplemented():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    chunk = (
        struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_non_uint8_rejected():
    with pytest.raises(ValueError, match="uint8"):
        encode_png(np.zeros((2, 2, 3), dtype=np.int32))

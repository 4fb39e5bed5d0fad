"""Codec unit tests — the [varint]/[pack]/lossy-length analog of the
reference's tests (SURVEY.md §4)."""

import numpy as np
import pytest

from wiser_tpu.codecs import (
    BLOCK,
    CHAR4_DECODE_TABLE,
    bits_needed,
    char4_to_uint,
    delta_decode,
    delta_encode,
    pack_block,
    uint_to_char4,
    uint_to_char4_np,
    unpack_block,
    varint_decode,
    varint_encode,
)


class TestChar4:
    def test_small_values_exact(self):
        # values < 8 are exact (utils.h:303-305)
        for v in range(8):
            assert char4_to_uint(uint_to_char4(v)) == v

    def test_known_values(self):
        # 8..15 are exact too (4 significant bits)
        for v in range(8, 16):
            assert char4_to_uint(uint_to_char4(v)) == v
        # lossy: keeps top 4 bits
        assert char4_to_uint(uint_to_char4(100)) == 96  # 100=0b1100100 -> 0b1100000
        assert char4_to_uint(uint_to_char4(255)) == 240
        assert char4_to_uint(uint_to_char4(1000)) == 960

    def test_monotone_and_bounded(self):
        rng = np.random.default_rng(0)
        vals = rng.integers(0, 2**30, size=2000)
        for v in vals:
            dec = char4_to_uint(uint_to_char4(int(v)))
            assert dec <= v < 2 * (dec + 1)  # keeps top 4 bits => <= v, > v/2

    def test_vectorized_matches_scalar(self):
        vals = np.concatenate(
            [np.arange(0, 5000), np.array([2**20, 2**29, 0x7FFFFFFF])]
        )
        np.testing.assert_array_equal(
            uint_to_char4_np(vals),
            np.array([uint_to_char4(int(v)) for v in vals], dtype=np.uint8),
        )

    def test_decode_table(self):
        for c in range(256):
            assert CHAR4_DECODE_TABLE[c] == char4_to_uint(c)


class TestVarint:
    @pytest.mark.parametrize("v", [0, 1, 127, 128, 300, 2**14, 2**21 - 1, 2**32 - 1])
    def test_roundtrip(self, v):
        buf = bytearray()
        varint_encode(v, buf)
        out, n = varint_decode(bytes(buf), 0)
        assert out == v and n == len(buf)

    def test_stream(self):
        vals = [0, 5, 600, 70000, 2**31]
        buf = bytearray()
        for v in vals:
            varint_encode(v, buf)
        pos, out = 0, []
        while pos < len(buf):
            v, n = varint_decode(bytes(buf), pos)
            out.append(v)
            pos += n
        assert out == vals


class TestBitPack:
    @pytest.mark.parametrize("width", [1, 3, 7, 8, 13, 17, 24, 31, 32])
    def test_roundtrip(self, width):
        rng = np.random.default_rng(width)
        hi = (1 << width) - 1
        vals = rng.integers(0, hi + 1, size=BLOCK, dtype=np.uint64).astype(np.uint32)
        words = pack_block(vals, width)
        assert len(words) == 4 * width
        np.testing.assert_array_equal(unpack_block(words, width), vals)

    def test_bits_needed(self):
        assert bits_needed(np.array([0])) == 1
        assert bits_needed(np.array([1])) == 1
        assert bits_needed(np.array([255])) == 8
        assert bits_needed(np.array([256])) == 9

    def test_delta_roundtrip(self):
        docs = np.array([3, 7, 8, 100, 10000], dtype=np.int64)
        d = delta_encode(docs)
        np.testing.assert_array_equal(delta_decode(d), docs)

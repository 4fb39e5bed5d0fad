"""Native codec library tests (LZ4 / murmur2 / varint / bitpack)."""

import numpy as np
import pytest

from wiser_tpu.native import lib as native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native toolchain unavailable")


class TestMurmur2Native:
    def test_matches_python(self):
        from wiser_tpu.index.bloom import murmur2 as py_murmur2, MURMUR_SEED

        for key in [b"", b"a", b"ab", b"abc", b"abcd", b"hello world", b"x" * 100]:
            for seed in [0, 1, MURMUR_SEED, 0xFFFFFFFF]:
                assert native.murmur2(key, seed) == py_murmur2(key, seed), (key, seed)


class TestLZ4:
    @pytest.mark.parametrize("data", [
        b"",
        b"a",
        b"hello",
        b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        b"the quick brown fox " * 100,
        bytes(range(256)) * 40,
    ])
    def test_roundtrip(self, data):
        c = native.lz4_compress(data)
        assert native.lz4_decompress(c, len(data)) == data

    def test_random_roundtrip(self):
        rng = np.random.default_rng(0)
        for n in [1, 13, 100, 4096, 65536]:
            # mixed compressible/incompressible
            a = rng.integers(0, 8, size=n, dtype=np.uint8).tobytes()
            c = native.lz4_compress(a)
            assert native.lz4_decompress(c, n) == a
            b = rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
            c2 = native.lz4_compress(b)
            assert native.lz4_decompress(c2, n) == b

    def test_compresses_text(self):
        data = (b"wiser is a flash optimized search engine " * 200)
        c = native.lz4_compress(data)
        assert len(c) < len(data) // 4

    def test_corrupt_input_rejected(self):
        data = b"some reasonable text to compress " * 20
        c = bytearray(native.lz4_compress(data))
        c[0] ^= 0xFF
        with pytest.raises(RuntimeError):
            native.lz4_decompress(bytes(c), len(data))


class TestVarintNative:
    def test_roundtrip_matches_python(self):
        rng = np.random.default_rng(1)
        vals = np.concatenate([
            rng.integers(0, 128, 100), rng.integers(0, 2**14, 100),
            rng.integers(0, 2**31, 100), [0, 1, 2**32 - 1],
        ]).astype(np.uint32)
        enc = native.varint_encode_array(vals)
        from wiser_tpu.codecs import varint_encode
        buf = bytearray()
        for v in vals:
            varint_encode(int(v), buf)
        assert enc == bytes(buf)
        np.testing.assert_array_equal(native.varint_decode_array(enc, len(vals)), vals)


class TestPackNative:
    def test_matches_python_layout(self):
        from wiser_tpu.codecs import pack_block

        rng = np.random.default_rng(2)
        widths = np.array([1, 7, 13, 20, 32], dtype=np.uint8)
        vals = np.concatenate([
            rng.integers(0, 2 ** int(min(w, 31)), 128, dtype=np.uint64).astype(np.uint32)
            for w in widths
        ])
        native_out = native.pack_blocks(vals, widths)
        py_out = np.concatenate([
            pack_block(vals[i * 128 : (i + 1) * 128], int(w))
            for i, w in enumerate(widths)
        ])
        np.testing.assert_array_equal(native_out, py_out)
        np.testing.assert_array_equal(
            native.unpack_blocks(native_out, widths), vals)

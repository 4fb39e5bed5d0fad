"""Doc store tests — the [doc_store] analog."""

import numpy as np
import pytest

from wiser_tpu.index.doc_store import (
    ChunkedDocStoreReader,
    ChunkedDocStoreWriter,
    CompressedDocStore,
)


class TestCompressedDocStore:
    def test_roundtrip(self):
        store = CompressedDocStore()
        store.add(0, "hello world " * 50)
        store.add(1, "second document")
        store.add(7, "sparse id")
        assert store.get(0) == "hello world " * 50
        assert store.get(1) == "second document"
        assert store.get(7) == "sparse id"
        assert store.size() == 3

    def test_unicode(self):
        store = CompressedDocStore()
        store.add(0, "naïve café — 搜索引擎 🚀")
        assert store.get(0) == "naïve café — 搜索引擎 🚀"

    def test_remove(self):
        store = CompressedDocStore()
        store.add(0, "x")
        store.remove(0)
        assert not store.has(0)


class TestChunkedDocStore:
    def test_roundtrip_many_docs(self, tmp_path):
        rng = np.random.default_rng(0)
        docs = []
        for i in range(500):
            n = int(rng.integers(1, 200))
            docs.append(f"doc {i} " + " ".join(f"w{rng.integers(0, 50)}" for _ in range(n)))
        w = ChunkedDocStoreWriter(str(tmp_path / "store"))
        for d in docs:
            w.add(d)
        w.close()

        r = ChunkedDocStoreReader(str(tmp_path / "store"))
        assert r.n_docs == 500
        for i in (0, 1, 99, 250, 499):
            assert r.get(i) == docs[i]
        # random access order exercises the chunk LRU pool
        for i in rng.permutation(500)[:100]:
            assert r.get(int(i)) == docs[int(i)]
        r.close()

    def test_alignment(self, tmp_path):
        w = ChunkedDocStoreWriter(str(tmp_path / "s2"))
        big = "x" * 40000  # several chunks, poorly compressible padding
        import random
        random.seed(3)
        for i in range(30):
            w.add("".join(random.choice("abcdefgh ") for _ in range(3000)))
        w.close()
        r = ChunkedDocStoreReader(str(tmp_path / "s2"))
        # any chunk with a big compressed payload starts 4KB-aligned
        for off, clen in zip(r.chunk_file_off, r.chunk_comp_len):
            if clen > 3 * 1024:
                assert off % 4096 == 0
        r.close()

    def test_empty_doc(self, tmp_path):
        w = ChunkedDocStoreWriter(str(tmp_path / "s3"))
        w.add("")
        w.add("after empty")
        w.close()
        r = ChunkedDocStoreReader(str(tmp_path / "s3"))
        assert r.get(0) == ""
        assert r.get(1) == "after empty"
        r.close()

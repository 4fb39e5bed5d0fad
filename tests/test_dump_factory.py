"""Oracle dump/load (the QQ-dump analog) + engine factory tests."""

import pytest

from wiser_tpu.data.synth import synth_docinfos
from wiser_tpu.engine.factory import create_search_engine
from wiser_tpu.index.builder import build_index
from wiser_tpu.index.oracle_dump import deserialize, serialize
from wiser_tpu.oracle import OracleEngine
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module")
def oracle():
    eng = OracleEngine()
    eng.load_linedocs(synth_docinfos(n_docs=120, vocab_size=40, mean_len=20,
                                     seed=11))
    return eng


class TestOracleDump:
    def test_roundtrip_equivalence(self, oracle, tmp_path):
        d = str(tmp_path / "dump")
        serialize(oracle, d)
        back = deserialize(d)
        assert back.n_docs == oracle.n_docs
        assert back.avg_length == oracle.avg_length
        assert back.term_count() == oracle.term_count()
        # whole-engine equality via identical search results
        # (the operator== analog, qq_mem_engine.h:370-388)
        for q in (SearchQuery(["t0"], n_results=10),
                  SearchQuery(["t1", "t2"], n_results=10),
                  SearchQuery(["t0", "t1"], n_results=10, is_phrase=True)):
            a = [(e.doc_id, e.doc_score) for e in oracle.search(q).entries]
            b = [(e.doc_id, e.doc_score) for e in back.search(q).entries]
            assert a == b, q
        # posting payloads survive (offsets for snippets)
        t = next(iter(oracle.index))
        assert back.index[t][0].offsets == oracle.index[t][0].offsets
        assert back.index[t][0].positions == oracle.index[t][0].positions
        assert back.get_document(0) == oracle.get_document(0)

    def test_dump_then_pack_matches_direct_pack(self, oracle, tmp_path):
        # the two-stage pipeline (dump -> load -> pack) must equal
        # packing the live engine (convert_qq_to_vacuum path)
        import numpy as np
        from wiser_tpu.index.builder import pack_oracle

        d = str(tmp_path / "dump2")
        serialize(oracle, d)
        p1 = pack_oracle(oracle)
        p2 = pack_oracle(deserialize(d))
        np.testing.assert_array_equal(p1.postings_doc, p2.postings_doc)
        np.testing.assert_array_equal(p1.postings_tf, p2.postings_tf)
        np.testing.assert_array_equal(p1.positions, p2.positions)
        assert p1.avg_len == p2.avg_len


class TestFactory:
    def test_oracle_empty(self):
        eng = create_search_engine("oracle:")
        assert eng.n_docs == 0

    def test_oracle_dump_url(self, oracle, tmp_path):
        d = str(tmp_path / "dump3")
        serialize(oracle, d)
        eng = create_search_engine(f"oracle:{d}")
        assert eng.n_docs == oracle.n_docs

    def test_tpu_url(self, oracle, tmp_path):
        packed = build_index(synth_docinfos(50, 20, 10, seed=1))[0]
        d = str(tmp_path / "idx")
        packed.save(d)
        eng = create_search_engine(f"tpu:{d}")
        r = eng.search(SearchQuery(["t0"], n_results=5))
        assert r.size() > 0

    def test_tpu_url_lazy_doc_store_snippets(self, tmp_path):
        """The factory wires the chunked doc store LAZILY (LRU chunk
        pool) — snippets must match an engine holding eager bodies, and
        the whole store must not be inflated into a list."""
        from wiser_tpu.engine.device import TpuEngine
        from wiser_tpu.index.doc_store import (ChunkedDocStoreWriter,
                                               LazyDocBodies)

        docs = synth_docinfos(60, 20, 12, seed=3)
        packed, oracle = build_index(docs)
        d = str(tmp_path / "idx_docs")
        packed.save(d)
        w = ChunkedDocStoreWriter(f"{d}/docs")
        for body in oracle.doc_bodies:
            w.add(body)
        w.close()
        eng = create_search_engine(f"tpu:{d}")
        assert isinstance(eng.doc_bodies, LazyDocBodies)
        eager = TpuEngine(packed, doc_bodies=oracle.doc_bodies)
        q = SearchQuery(["t0", "t1"], n_results=5, return_snippets=True)
        a = [(e.doc_id, e.doc_score, e.snippet) for e in eng.search(q).entries]
        b = [(e.doc_id, e.doc_score, e.snippet)
             for e in eager.search(q).entries]
        assert a == b and a

    def test_unknown_scheme(self):
        with pytest.raises(ValueError):
            create_search_engine("bogus:x")

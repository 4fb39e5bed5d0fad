"""StagedEngine (host<->HBM posting staging) — the "read as needed"
analog. Tiny budgets force real staging on every path."""

import numpy as np
import pytest

from wiser_tpu.data.synth import synth_docinfos, synth_query_terms
from wiser_tpu.engine.staged import StagedEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module")
def corpus():
    docs = synth_docinfos(n_docs=400, vocab_size=100, mean_len=30, seed=21)
    packed, oracle = build_index(docs)
    return packed, oracle


def assert_same(oracle_res, res, msg=""):
    o = [(e.doc_id, e.doc_score) for e in oracle_res.entries]
    t = [(e.doc_id, e.doc_score) for e in res.entries]
    assert o == t, f"{msg}\noracle={o}\nstaged={t}"


class TestHotColdSplit:
    def test_budget_controls_hot_fraction(self, corpus):
        packed, _ = corpus
        total_bytes = packed.n_postings * 12
        small = StagedEngine(packed, hbm_budget_bytes=total_bytes // 10)
        big = StagedEngine(packed, hbm_budget_bytes=total_bytes * 2)
        assert small.hot_fraction < 1.0
        assert big.hot_fraction == 1.0

    def test_zero_budget_all_cold(self, corpus):
        packed, oracle = corpus
        eng = StagedEngine(packed, hbm_budget_bytes=0)
        assert eng.hot_fraction == 0.0
        q = SearchQuery(["t0"], n_results=10)
        assert_same(oracle.search(q), eng.search(q))


class TestStagedParity:
    @pytest.fixture(scope="class")
    def engine(self, corpus):
        packed, _ = corpus
        # ~30% hot: mixed hot/cold batches
        return StagedEngine(packed, hbm_budget_bytes=packed.n_postings * 12 // 3)

    def test_single_term_hot_and_cold(self, corpus, engine):
        _, oracle = corpus
        for t in ["t0", "t1", "t40", "t77", "t99"]:
            if engine.packed.lookup(t) < 0:
                continue
            q = SearchQuery([t], n_results=10)
            assert_same(oracle.search(q), engine.search(q), f"term={t}")

    def test_mixed_batch(self, corpus, engine):
        _, oracle = corpus
        queries = [SearchQuery(terms, n_results=10)
                   for terms in synth_query_terms(40, 100, n_terms=2, seed=3)]
        queries += [SearchQuery([f"t{i}"], n_results=10) for i in (0, 50, 90)]
        batch = engine.search_batch(queries)
        for q, r in zip(queries, batch):
            assert_same(oracle.search(q), r, f"{q.terms}")

    def test_cold_and_query_with_hot_term(self, corpus, engine):
        # one hot + one cold term -> whole query staged
        _, oracle = corpus
        hot_rows = np.nonzero(engine.hot_mask)[0]
        cold_rows = np.nonzero(~engine.hot_mask)[0]
        if len(hot_rows) == 0 or len(cold_rows) == 0:
            pytest.skip("split degenerate")
        terms = [engine.packed.terms[hot_rows[0]],
                 engine.packed.terms[cold_rows[0]]]
        q = SearchQuery(terms, n_results=10)
        assert_same(oracle.search(q), engine.search(q))

    def test_snippets_on_cold(self, corpus):
        packed, oracle = corpus
        eng = StagedEngine(packed, hbm_budget_bytes=0,
                           doc_bodies=oracle.doc_bodies)
        q = SearchQuery(["t0"], n_results=3, return_snippets=True)
        o = oracle.search(q)
        s = eng.search(q)
        assert [e.snippet for e in o.entries] == [e.snippet for e in s.entries]

    def test_phrase_on_cold_raises(self, corpus):
        packed, _ = corpus
        eng = StagedEngine(packed, hbm_budget_bytes=0)
        with pytest.raises(NotImplementedError):
            eng.search(SearchQuery(["t0", "t1"], n_results=5, is_phrase=True))

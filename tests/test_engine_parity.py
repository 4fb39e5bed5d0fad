"""Oracle ↔ TpuEngine equivalence — the load-bearing test pattern
(SURVEY.md §4: "QQMem-vs-Vacuum equivalence ... identical top-k").

Every query type must produce IDENTICAL (doc_id, score) lists from the
in-memory oracle and the packed device engine, bit-for-bit on the f64
scores.
"""

import numpy as np
import pytest

from wiser_tpu.data.synth import make_docinfo, synth_docinfos, synth_query_terms
from wiser_tpu.index.builder import build_index
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module", params=["raw", "tc"])
def corpus(request):
    # parametrized over the device column layout: the compressed (tc)
    # mode must be indistinguishable from raw at the result level
    docs = synth_docinfos(n_docs=300, vocab_size=120, mean_len=40, seed=7)
    packed, oracle = build_index(docs, with_blooms=True)
    engine = TpuEngine(packed, doc_bodies=oracle.doc_bodies,
                       columns=request.param)
    return docs, packed, oracle, engine


def assert_same(oracle_res, tpu_res, msg=""):
    o = [(e.doc_id, e.doc_score) for e in oracle_res.entries]
    t = [(e.doc_id, e.doc_score) for e in tpu_res.entries]
    assert o == t, f"{msg}\noracle={o}\ntpu={t}"


class TestSingleTerm:
    def test_common_and_rare_terms(self, corpus):
        _, packed, oracle, engine = corpus
        for term in ["t0", "t1", "t5", "t50", "t119"]:
            if packed.lookup(term) < 0:
                continue
            q = SearchQuery([term], n_results=10)
            assert_same(oracle.search(q), engine.search(q), f"term={term}")

    def test_batch_matches_individual(self, corpus):
        _, packed, oracle, engine = corpus
        terms = [t for t in ["t0", "t3", "t7", "t11", "t2"] if packed.lookup(t) >= 0]
        queries = [SearchQuery([t], n_results=5) for t in terms]
        batch = engine.search_batch(queries)
        for q, r in zip(queries, batch):
            assert_same(oracle.search(q), r, f"batch term={q.terms}")

    def test_missing_term(self, corpus):
        *_, engine = corpus
        assert engine.search(SearchQuery(["nope"], n_results=5)).size() == 0

    def test_impact_table_depth_boundaries(self, corpus):
        """The single-term impact table serves k <= depth (or whole-list
        terms) bit-exactly; deeper k falls back to the device path. Probe
        k around the table depth on a head term (df > depth) and a tail
        term (df < depth)."""
        _, packed, oracle, engine = corpus
        depth = engine._st_depth
        head = packed.terms[int(np.argmax(packed.df))]
        assert packed.postinglist_size(head) > depth
        for k in (1, depth - 1, depth, depth + 1, depth + 50):
            q = SearchQuery([head], n_results=k)
            assert_same(oracle.search(q), engine.search(q), f"head k={k}")
        tail_rows = np.nonzero((packed.df > 0) & (packed.df < depth))[0]
        if len(tail_rows):
            tail = packed.terms[int(tail_rows[0])]
            for k in (1, int(packed.postinglist_size(tail)), depth + 5):
                q = SearchQuery([tail], n_results=k)
                assert_same(oracle.search(q), engine.search(q), f"tail k={k}")

    def test_impact_table_disabled_matches(self, corpus):
        """single_term_depth=0 must agree with the table path."""
        _, packed, oracle, _ = corpus
        eng = TpuEngine(packed, single_term_depth=0)
        for t in ["t0", "t5", "t50"]:
            if packed.lookup(t) < 0:
                continue
            q = SearchQuery([t], n_results=10)
            assert_same(oracle.search(q), eng.search(q), f"no-table {t}")


class TestConjunctive:
    def test_two_term(self, corpus):
        _, packed, oracle, engine = corpus
        pairs = synth_query_terms(20, 120, n_terms=2, seed=11)
        for terms in pairs:
            q = SearchQuery(terms, n_results=10)
            assert_same(oracle.search(q), engine.search(q), f"AND {terms}")

    def test_three_four_term(self, corpus):
        _, packed, oracle, engine = corpus
        for n in (3, 4):
            for terms in synth_query_terms(10, 120, n_terms=n, seed=n):
                q = SearchQuery(terms, n_results=10)
                assert_same(oracle.search(q), engine.search(q), f"AND{n} {terms}")

    def test_repeated_term_query(self, corpus):
        # same term twice — both slots walk the same list
        _, packed, oracle, engine = corpus
        q = SearchQuery(["t0", "t0"], n_results=10)
        assert_same(oracle.search(q), engine.search(q))


class TestPhrase:
    def test_two_term_phrases(self, corpus):
        _, packed, oracle, engine = corpus
        # common pairs likely to occur adjacently somewhere
        for terms in synth_query_terms(30, 30, n_terms=2, seed=13):
            q = SearchQuery(terms, n_results=10, is_phrase=True)
            assert_same(oracle.search(q), engine.search(q), f"PHRASE {terms}")

    def test_three_term_phrase(self):
        docs = [
            make_docinfo("x a b c y".split()),
            make_docinfo("a c b".split()),
            make_docinfo("a b c a b c".split()),
            make_docinfo("b c a".split()),
        ]
        packed, oracle = build_index(docs, with_blooms=True)
        engine = TpuEngine(packed)
        q = SearchQuery(["a", "b", "c"], n_results=10, is_phrase=True)
        assert_same(oracle.search(q), engine.search(q))
        assert {e.doc_id for e in engine.search(q).entries} == {0, 2}

    def test_phrase_without_blooms(self):
        docs = [make_docinfo("p q r".split(), with_blooms=False)] * 3
        packed, oracle = build_index(docs, with_blooms=False)
        engine = TpuEngine(packed)
        q = SearchQuery(["p", "q"], n_results=5, is_phrase=True)
        assert_same(oracle.search(q), engine.search(q))
        assert engine.search(q).size() == 3

    def test_phrase_bloom_factor_sides(self):
        # force both bloom sides: one frequent and one rare term
        docs = [make_docinfo(("f " * 5).split() + ["r"]) for _ in range(20)]
        docs += [make_docinfo(["f", "other"]) for _ in range(50)]
        packed, oracle = build_index(docs, with_blooms=True)
        for factor in (1, 10, None):
            engine = TpuEngine(packed, bloom_enable_factor=factor)
            for terms in (["f", "r"], ["r", "f"]):
                q = SearchQuery(terms, n_results=10, is_phrase=True)
                assert_same(oracle.search(q), engine.search(q),
                            f"factor={factor} {terms}")


class TestTies:
    def test_many_identical_docs(self):
        docs = [make_docinfo("w w q".split()) for _ in range(30)]
        packed, oracle = build_index(docs)
        engine = TpuEngine(packed)
        q = SearchQuery(["w"], n_results=10)
        o, t = oracle.search(q), engine.search(q)
        assert_same(o, t)
        assert [e.doc_id for e in t.entries] == list(range(10))


class TestSnippets:
    def test_snippet_parity(self, corpus):
        _, packed, oracle, engine = corpus
        q = SearchQuery(["t0"], n_results=3, return_snippets=True)
        o, t = oracle.search(q), engine.search(q)
        assert [e.snippet for e in o.entries] == [e.snippet for e in t.entries]

    def test_phrase_snippet_parity(self, corpus):
        _, packed, oracle, engine = corpus
        for terms in synth_query_terms(10, 20, n_terms=2, seed=5):
            q = SearchQuery(terms, n_results=3, return_snippets=True, is_phrase=True)
            o, t = oracle.search(q), engine.search(q)
            assert [e.snippet for e in o.entries] == [e.snippet for e in t.entries]


class TestPersistence:
    def test_save_load_roundtrip(self, corpus, tmp_path):
        _, packed, oracle, _ = corpus
        from wiser_tpu.index.format import PackedIndex

        packed.save(str(tmp_path / "idx"))
        loaded = PackedIndex.load(str(tmp_path / "idx"))
        engine = TpuEngine(loaded)
        q = SearchQuery(["t0", "t1"], n_results=10)
        assert_same(oracle.search(q), engine.search(q))

    def test_wiki_fixture_parity(self):
        from wiser_tpu.linedoc import parse_linedoc
        from wiser_tpu.index.builder import build_index

        docs = list(parse_linedoc(
            "/root/reference/src/qq_mem/src/testdata/line_doc_with_positions",
            "WITH_POSITIONS"))
        packed, oracle = build_index(docs)
        engine = TpuEngine(packed, doc_bodies=oracle.doc_bodies)
        for terms, phrase in (
            (["anarchist"], False),
            (["polit", "philosophi"], False),
            (["polit", "philosophi"], True),
            (["the", "of", "and"], False),
        ):
            q = SearchQuery(terms, n_results=10, is_phrase=phrase)
            assert_same(oracle.search(q), engine.search(q), f"{terms} {phrase}")

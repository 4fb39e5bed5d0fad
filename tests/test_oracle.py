"""Oracle engine tests: linedoc parsing, indexing, single/AND/phrase search
semantics (the tests.cc / tests_5.cc analog)."""

import numpy as np
import pytest

from wiser_tpu.linedoc import _parse_row, parse_linedoc, write_linedoc
from wiser_tpu.oracle import OracleEngine
from wiser_tpu.scoring import Bm25Similarity, calc_es_idf
from wiser_tpu.codecs import uint_to_char4
from wiser_tpu.types import DocInfo, SearchQuery


def build_toy_engine(toy_linedoc_rows):
    eng = OracleEngine()
    for row in toy_linedoc_rows:
        eng.add_document(_parse_row(row, "WITH_BI_BLOOM"))
    return eng


class TestLinedocParsing:
    def test_bi_bloom_columns(self, toy_linedoc_rows):
        d = _parse_row(toy_linedoc_rows[1], "WITH_BI_BLOOM")
        assert d.get_tokens() == ["a", "b"]
        assert d.get_offset_pairs_vec() == [[(0, 1), (2, 3)], [(4, 5)]]
        assert d.get_positions() == [[0, 1], [2]]
        assert d.get_phrase_ends() == ["a b", ""]
        assert d.get_phrase_begins() == ["", "a"]
        assert d.body_length() == 3  # "a a b"

    def test_file_roundtrip(self, tmp_path, toy_linedoc_rows):
        p = str(tmp_path / "toy.linedoc")
        write_linedoc(p, toy_linedoc_rows, with_bloom=True)
        docs = list(parse_linedoc(p, "WITH_BI_BLOOM"))
        assert len(docs) == 3
        assert docs[2].get_tokens() == ["a", "b", "c"]

    def test_reference_fixture_parses(self):
        # the actual reference fixture (read-only) must parse cleanly
        path = "/root/reference/src/qq_mem/src/testdata/line_doc_with_positions"
        docs = list(parse_linedoc(path, "WITH_POSITIONS", n_rows=2))
        assert len(docs) == 2
        toks = docs[0].get_tokens()
        assert len(toks) > 10
        offs = docs[0].get_offset_pairs_vec()
        poss = docs[0].get_positions()
        assert len(offs) == len(toks) and len(poss) == len(toks)


class TestOracleIndexing:
    def test_counts(self, toy_linedoc_rows):
        eng = build_toy_engine(toy_linedoc_rows)
        assert eng.n_docs == 3
        assert eng.term_count() == 3
        assert eng.postinglist_size("a") == 3
        assert eng.postinglist_size("b") == 2
        assert eng.postinglist_size("c") == 1
        # doc_1 body "a a b": tf of 'a' is 2 (positions 0,1)
        assert eng.index["a"][1].term_freq == 2

    def test_avg_length(self, toy_linedoc_rows):
        eng = build_toy_engine(toy_linedoc_rows)
        # bodies: "a"(1), "a a b"(3), "a b c"(3) via running recurrence
        avg = np.float64(0.0)
        for i, l in enumerate([1, 3, 3]):
            avg = avg + (np.float64(l) - avg) / np.float64(i + 1)
        assert eng.avg_length == float(avg)


class TestOracleSearch:
    def test_single_term_scores(self, toy_linedoc_rows):
        eng = build_toy_engine(toy_linedoc_rows)
        res = eng.search(SearchQuery(["a"], n_results=10))
        assert [e.doc_id for e in res.entries] == sorted(
            [e.doc_id for e in res.entries],
            key=lambda d: (-[x.doc_score for x in res.entries if x.doc_id == d][0], d),
        )
        # manual score check for doc_1 (tf=2, len code of 3)
        sim = Bm25Similarity(eng.avg_length)
        idf = calc_es_idf(3, 3)
        cache_val = sim.cache[uint_to_char4(3)]
        expect = float(np.float64(idf) * ((2 * 2.2) / (2 + cache_val)))
        got = [e for e in res.entries if e.doc_id == 1][0].doc_score
        assert got == expect

    def test_and_query(self, toy_linedoc_rows):
        eng = build_toy_engine(toy_linedoc_rows)
        res = eng.search(SearchQuery(["a", "b"], n_results=10))
        assert sorted(e.doc_id for e in res.entries) == [1, 2]
        res3 = eng.search(SearchQuery(["a", "b", "c"], n_results=10))
        assert [e.doc_id for e in res3.entries] == [2]

    def test_missing_term_empty(self, toy_linedoc_rows):
        eng = build_toy_engine(toy_linedoc_rows)
        assert eng.search(SearchQuery(["zzz"], n_results=10)).size() == 0
        assert eng.search(SearchQuery(["a", "zzz"], n_results=10)).size() == 0

    def test_phrase_query(self, toy_linedoc_rows):
        eng = build_toy_engine(toy_linedoc_rows)
        # "a b": doc_1 positions a=[0,1] b=[2] -> 1-adjacent (1,2): match;
        # doc_2 a=[0] b=[1]: match
        res = eng.search(SearchQuery(["a", "b"], n_results=10, is_phrase=True))
        assert sorted(e.doc_id for e in res.entries) == [1, 2]
        # "b a" should match nothing
        res2 = eng.search(SearchQuery(["b", "a"], n_results=10, is_phrase=True))
        assert res2.size() == 0

    def test_phrase_three_term(self):
        eng = OracleEngine()
        eng.add_document(DocInfo(
            body="x a b c y", tokens="x a b c y",
            token_positions="0;.1;.2;.3;.4;.",
            token_offsets="0,0;.2,2;.4,4;.6,6;.8,8;.",
            format="WITH_POSITIONS"))
        eng.add_document(DocInfo(
            body="a c b", tokens="a c b",
            token_positions="0;.1;.2;.",
            token_offsets="0,0;.2,2;.4,4;.",
            format="WITH_POSITIONS"))
        res = eng.search(SearchQuery(["a", "b", "c"], n_results=10, is_phrase=True))
        assert [e.doc_id for e in res.entries] == [0]

    def test_top_k_cutoff_and_tiebreak(self):
        eng = OracleEngine()
        # 5 identical docs -> identical scores; keep lowest doc ids
        for _ in range(5):
            eng.add_document(DocInfo(
                body="w w", tokens="w", token_positions="0;1;.",
                token_offsets="0,0;2,2;.", format="WITH_POSITIONS"))
        res = eng.search(SearchQuery(["w"], n_results=3))
        assert [e.doc_id for e in res.entries] == [0, 1, 2]

    def test_n_results_zero(self, toy_linedoc_rows):
        eng = build_toy_engine(toy_linedoc_rows)
        assert eng.search(SearchQuery(["a"], n_results=0)).size() == 0

    def test_snippet_generation(self, toy_linedoc_rows):
        eng = OracleEngine()
        eng.add_document(DocInfo(
            body="hello world. goodbye moon.",
            tokens="hello world goodbye moon",
            token_positions="0;.1;.2;.3;.",
            token_offsets="0,4;.6,10;.13,19;.21,24;.",
            format="WITH_POSITIONS"))
        res = eng.search(SearchQuery(["world"], n_results=5, return_snippets=True))
        assert res.size() == 1
        assert "<b>world<\\b>" in res.entries[0].snippet

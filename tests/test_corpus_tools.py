"""Corpus pipeline + tools tests (L5/L8 analogs)."""

import json

import numpy as np
import pytest

from wiser_tpu.data.corpus import (
    doc_to_linedoc_cols,
    text_corpus_to_linedoc,
    tokenize,
    wiki_xml_to_linedoc,
)
from wiser_tpu.data.synth_log import (
    aol_shape_mixed_log,
    gen_locality_log,
    gen_phrase_log,
    gen_single_term_log,
    gen_two_term_log,
    mine_phrases_from_index,
    split_df_groups,
)


class TestTokenizer:
    def test_basic(self):
        toks = tokenize("Hello, World! It's great.")
        assert [t[0] for t in toks] == ["hello", "world", "it's", "great"]
        # offsets are [start, end] inclusive into the original text
        assert toks[0][1:] == (0, 4)
        assert "Hello, World! It's great."[toks[3][1]: toks[3][2] + 1] == "great"

    def test_unicode(self):
        toks = tokenize("naïve café 北京 123abc")
        assert [t[0] for t in toks] == ["naïve", "café", "北京", "123abc"]


class TestLinedocCols:
    def test_columns_parse_back(self):
        from wiser_tpu.linedoc import _parse_row

        row = doc_to_linedoc_cols("Title", "a b a c. b!", with_blooms=True)
        d = _parse_row(row, "WITH_BI_BLOOM")
        assert d.get_tokens() == ["a", "b", "c"]
        assert d.get_positions() == [[0, 2], [1, 4], [3]]
        ends = d.get_phrase_ends()
        assert set(ends[0].split(" ")) == {"b", "c"}  # 'a' followed by b, c

    def test_end_to_end_searchable(self, tmp_path):
        from wiser_tpu.engine.device import TpuEngine
        from wiser_tpu.index.builder import build_index_from_linedoc
        from wiser_tpu.types import SearchQuery

        p = str(tmp_path / "c.linedoc")
        n = text_corpus_to_linedoc(
            [("D1", "the quick brown fox"), ("D2", "the lazy dog"),
             ("D3", "quick quick fox")], p)
        assert n == 3
        packed, oracle = build_index_from_linedoc(p, "WITH_BI_BLOOM",
                                                  with_blooms=True)
        engine = TpuEngine(packed, doc_bodies=oracle.doc_bodies)
        r = engine.search(SearchQuery(["quick", "fox"], n_results=10))
        assert sorted(e.doc_id for e in r.entries) == [0, 2]
        rp = engine.search(SearchQuery(["quick", "fox"], n_results=10,
                                       is_phrase=True))
        assert [e.doc_id for e in rp.entries] == [2]


class TestWikiXml:
    def test_parse_abstract_dump(self, tmp_path):
        xml = """<feed>
<doc><title>Wikipedia: Anarchism</title><url>u</url>
<abstract>Anarchism is a political philosophy.</abstract></doc>
<doc><title>Wikipedia: Autism</title><url>u</url>
<abstract>Autism is a disorder; it varies.</abstract></doc>
<doc><title>Empty</title><url>u</url><abstract></abstract></doc>
</feed>"""
        xp = str(tmp_path / "a.xml")
        with open(xp, "w") as f:
            f.write(xml)
        out = str(tmp_path / "a.linedoc")
        n = wiki_xml_to_linedoc(xp, out)
        assert n == 2  # empty abstract skipped
        from wiser_tpu.linedoc import parse_linedoc

        docs = list(parse_linedoc(out, "WITH_BI_BLOOM"))
        assert "anarchism" in docs[0].get_tokens()


class TestSynthLog:
    def test_df_groups(self):
        low, high = split_df_groups(["a", "b", "c"], [5, 10_001, 9_999])
        assert low == ["a", "c"] and high == ["b"]

    def test_single_term_log(self):
        qs = gen_single_term_log(["a", "b", "c", "d"], 100, working_set=2)
        assert len(qs) == 100
        assert len({q.terms[0] for q in qs}) <= 2

    def test_two_term_sorted_dedup(self):
        qs = gen_two_term_log(["x", "y"], ["a", "b"], 50)
        for q in qs:
            assert q.terms == sorted(q.terms) and len(set(q.terms)) == 2

    def test_phrase_log(self):
        qs = gen_phrase_log([("new", "york"), ("a", "a"), ("big", "apple")], 20)
        assert len(qs) == 20
        assert all(q.is_phrase and len(set(q.terms)) == len(q.terms) for q in qs)

    def test_locality_log(self):
        from wiser_tpu.types import SearchQuery

        base = [SearchQuery([f"t{i}"]) for i in range(1000)]
        out = gen_locality_log(base, 100, window=10)
        # early draws come from early base entries
        assert int(out[0].terms[0][1:]) < 20
        assert int(out[-1].terms[0][1:]) > 980

    def test_aol_mix_shape(self):
        qs = aol_shape_mixed_log([f"t{i}" for i in range(100)],
                                 list(range(100)), 2000)
        lens = np.array([len(q.terms) for q in qs])
        assert 0.35 < (lens == 1).mean() < 0.51
        assert (lens <= 4).all()

    def test_mine_phrases(self, toy_linedoc_rows):
        from wiser_tpu.linedoc import _parse_row
        from wiser_tpu.oracle import OracleEngine

        eng = OracleEngine()
        for row in toy_linedoc_rows:
            eng.add_document(_parse_row(row, "WITH_BI_BLOOM"))
        pairs = mine_phrases_from_index(eng, max_phrases=10)
        assert all(a != b for a, b in pairs)


class TestTools:
    @pytest.fixture(scope="class")
    def built(self, tmp_path_factory):
        from wiser_tpu.tools.indexer import build

        tmp = tmp_path_factory.mktemp("idx")
        corpus = str(tmp / "c.linedoc")
        text_corpus_to_linedoc(
            [(f"D{i}", f"alpha beta w{i} gamma delta") for i in range(50)],
            corpus)
        out = str(tmp / "index")
        packed, oracle = build(corpus, "WITH_BI_BLOOM", out, with_blooms=True)
        return corpus, out, packed

    def test_indexer_output_loads(self, built):
        from wiser_tpu.index.format import PackedIndex

        _, out, packed = built
        loaded = PackedIndex.load(out)
        assert loaded.n_docs == packed.n_docs
        assert loaded.postinglist_size("alpha") == 50
        # doc store written alongside
        from wiser_tpu.index.doc_store import ChunkedDocStoreReader

        r = ChunkedDocStoreReader(out + "/docs")
        assert "alpha beta" in r.get(0)
        r.close()

    def test_check_posting_list_ok(self, built):
        from wiser_tpu.tools.check_posting_list import check

        corpus, out, _ = built
        assert check(out, corpus, "WITH_BI_BLOOM") == 0

    def test_check_detects_corruption(self, built, tmp_path):
        from wiser_tpu.index.format import PackedIndex
        from wiser_tpu.tools.check_posting_list import check

        corpus, out, _ = built
        packed = PackedIndex.load(out)
        packed.postings_tf[0] += 1  # corrupt a tf
        bad = str(tmp_path / "bad")
        packed.save(bad)
        assert check(bad, corpus, "WITH_BI_BLOOM") > 0

    def test_index_stats(self, built):
        from wiser_tpu.tools.index_stats import stats

        _, out, _ = built
        s = stats(out, terms=["alpha", "nope"])
        assert s["n_docs"] == 50
        assert s["postinglist_sizes"] == {"alpha": 50, "nope": 0}
        assert s["has_blooms"] and s["bloom"]["hashes"] > 0

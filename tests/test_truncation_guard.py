"""Tie-class truncation guard: distinct f64 scores colliding in f32
across the candidate-buffer boundary must trigger an exact host re-search
so the final top-k stays bit-identical. Exact f64 ties at the boundary
are provably safe (lowest-doc-first kept set = the tie canon) and must
NOT trigger the slow path."""

import numpy as np
import pytest

from wiser_tpu.data.synth import make_docinfo
from wiser_tpu.engine import device as device_mod
from wiser_tpu.engine import topk as topk_mod
from wiser_tpu.engine.device import TpuEngine, host_exact_search
from wiser_tpu.engine.topk import truncation_suspects
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module")
def tied_corpus():
    # 200 identical docs -> one giant exact tie class (> M = k + margin)
    docs = [make_docinfo("w w q".split()) for _ in range(200)]
    docs += [make_docinfo(["q", f"u{i}"]) for i in range(20)]
    return build_index(docs)


class TestSuspectDetector:
    def test_near_tie_not_equal_flags(self):
        score = np.full((1, 8), 1.0)
        score[0, 7] = 1.0 - 1e-9  # distinct but inside f32 resolution
        assert truncation_suspects(score, np.array([8]), np.array([2]))[0]

    def test_exact_tie_is_safe(self):
        score = np.full((1, 8), 1.0)
        assert not truncation_suspects(score, np.array([8]), np.array([2]))[0]

    def test_partial_buffer_is_safe(self):
        score = np.full((1, 8), 1.0)
        assert not truncation_suspects(score, np.array([5]), np.array([2]))[0]

    def test_well_separated_is_safe(self):
        score = np.linspace(2.0, 1.0, 8)[None, :]
        assert not truncation_suspects(score, np.array([8]), np.array([2]))[0]


class TestGuardWiring:
    def test_exact_ties_no_fallback_and_correct(self, tied_corpus, monkeypatch):
        packed, oracle = tied_corpus
        engine = TpuEngine(packed)
        calls = []
        orig = device_mod.host_exact_search
        monkeypatch.setattr(device_mod, "host_exact_search",
                            lambda *a, **kw: calls.append(1) or orig(*a, **kw))
        q = SearchQuery(["w"], n_results=10)
        for eng in (engine, TpuEngine(packed, single_term_depth=0)):
            r = eng.search(q)
            assert not calls  # exact tie class: fast path stays correct
            o = oracle.search(q)
            assert [(e.doc_id, e.doc_score) for e in r.entries] == \
                   [(e.doc_id, e.doc_score) for e in o.entries]
            assert [e.doc_id for e in r.entries] == list(range(10))

    def test_strict_parity_flags_truncated_class(self, tied_corpus,
                                                 monkeypatch):
        """strict_parity=True: the device's boundary-class-truncation flag
        routes >buffer tie classes to the exact host path (covers the
        f32-collision hole the default mode accepts as negligible)."""
        packed, oracle = tied_corpus
        engine = TpuEngine(packed, single_term_depth=0, strict_parity=True)
        calls = []
        orig = device_mod.host_exact_search

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(device_mod, "host_exact_search", spy)
        # 200-doc exact tie class > M=64 buffer -> device flag -> host
        q = SearchQuery(["w", "q"], n_results=10)
        r = engine.search(q)
        assert calls, "strict mode must re-run truncated-class queries"
        o = oracle.search(q)
        assert [(e.doc_id, e.doc_score) for e in r.entries] == \
               [(e.doc_id, e.doc_score) for e in o.entries]

    def test_flag_routes_to_host_exact(self, tied_corpus, monkeypatch):
        packed, oracle = tied_corpus
        engine = TpuEngine(packed)
        calls = []
        orig = device_mod.host_exact_search

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(device_mod, "host_exact_search", spy)
        monkeypatch.setattr(
            device_mod, "truncation_suspects",
            lambda s, n, k, **kw: np.ones(len(s), dtype=bool))
        # multi-term: single-term queries are served from the exact impact
        # table and never reach the guard
        q = SearchQuery(["w", "q"], n_results=10)
        r = engine.search(q)
        assert calls, "forced suspect flag must route to the exact path"
        o = oracle.search(q)
        assert [(e.doc_id, e.doc_score) for e in r.entries] == \
               [(e.doc_id, e.doc_score) for e in o.entries]


class TestHostExact:
    def test_matches_oracle_and(self, tied_corpus):
        packed, oracle = tied_corpus
        rows = [packed.lookup("w"), packed.lookup("q")]
        d, s = host_exact_search(packed, TpuEngine(packed).cache64, rows, 10)
        o = oracle.search(SearchQuery(["w", "q"], n_results=10))
        assert list(d) == [e.doc_id for e in o.entries]
        np.testing.assert_array_equal(s, [e.doc_score for e in o.entries])

    def test_matches_oracle_phrase(self):
        docs = [make_docinfo("a b c".split()), make_docinfo("b a c".split()),
                make_docinfo("a b".split())]
        packed, oracle = build_index(docs)
        eng = TpuEngine(packed)
        rows = [packed.lookup("a"), packed.lookup("b")]
        d, s = host_exact_search(packed, eng.cache64, rows, 10, is_phrase=True)
        o = oracle.search(SearchQuery(["a", "b"], n_results=10, is_phrase=True))
        assert list(d) == [e.doc_id for e in o.entries]

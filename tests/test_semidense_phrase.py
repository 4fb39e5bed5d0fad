"""Semidense phrase route: exactness in both guard outcomes.

The semidense phrase kernel (kernels.make_semidense_phrase_kernel)
replaces the compact list-path pipeline's L-wide binary-search match
stage AND its L-wide bloom gate with dense-plane membership gathers plus
KV compaction: only the KV best-scored AND matches reach the
element-gather stages (posting-index recovery, window position verify).
FLAG_PRUNE_MISS must fire whenever the (KV+1)-th AND score could reach
the kept k-th verified phrase score, routing the query to the exact host
path — bit-exact results in BOTH outcomes. (Reference analog: the bloom
pre-check + positional verify chain, query_processing.h:266-362 +
784-807, re-shaped so no per-lane probe ever runs at L width.)
"""

import numpy as np
import pytest

import wiser_tpu.engine.kernels as K
from wiser_tpu.data.synth import make_docinfo
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


def assert_same(oracle_res, res, msg=""):
    o = [(e.doc_id, e.doc_score) for e in oracle_res.entries]
    t = [(e.doc_id, e.doc_score) for e in res.entries]
    assert o == t, f"{msg}\noracle={o[:4]}\ntpu={t[:4]}"


def spy_semidense_phrase(monkeypatch):
    called = []
    orig = K.make_semidense_phrase_kernel

    def spy(*a, **kw):
        called.append((a, kw))
        return orig(*a, **kw)

    monkeypatch.setattr(K, "make_semidense_phrase_kernel", spy)
    return called


def spy_host(engine, monkeypatch):
    calls = []
    orig = engine._host_exact

    def spy(rows, k, is_phrase=False):
        calls.append(tuple(rows))
        return orig(rows, k, is_phrase)

    monkeypatch.setattr(engine, "_host_exact", spy)
    return calls


class _FloorEngine(TpuEngine):
    # init-time knob: the dense tier is built in __init__, so the floor
    # must shrink on the CLASS before construction
    DENSE_MIN_DF_FLOOR = 64


def make_engine(docs, columns, kv=16):
    packed, oracle = build_index(docs, with_blooms=True)
    engine = _FloorEngine(packed, columns=columns)
    engine.PRUNED_PHRASE_KV = kv  # shrink so toy cand lists exceed KV
    return packed, oracle, engine


@pytest.fixture(scope="module", params=["raw", "tc"])
def phrase_corpus(request):
    """Head pair (h0, h1): big AND intersection, adjacent only sometimes
    -> compaction cannot hold every match, the guard decides. Pure pair
    (p0, p1): ALWAYS adjacent when co-present, tiny intersection (< KV)
    -> the guard can prove exactness device-side. Mid pair (m0, m1):
    df below the dense floor -> must keep using the compact bs path."""
    rng = np.random.default_rng(71)
    docs = []
    for i in range(1600):
        toks = [f"r{rng.integers(300)}" for _ in range(rng.integers(4, 9))]
        u = rng.random()
        if u < 0.12:
            toks.insert(rng.integers(len(toks) + 1), "h0")
            toks.insert(rng.integers(len(toks) + 1), "h1")
        elif u < 0.45:
            # adjacent occurrence, possibly repeated
            for _ in range(1 + (rng.random() < 0.2)):
                j = rng.integers(len(toks) + 1)
                toks[j:j] = ["h0", "h1"]
        if rng.random() < 0.004:
            j = rng.integers(len(toks) + 1)
            toks[j:j] = ["p0", "p1"]
        elif rng.random() < 0.15:
            toks.insert(rng.integers(len(toks) + 1),
                        "p0" if rng.random() < 0.5 else "p1")
        if rng.random() < 0.025:
            j = rng.integers(len(toks) + 1)
            toks[j:j] = ["m0", "m1"]
        if rng.random() < 0.06:
            j = rng.integers(len(toks) + 1)
            toks[j:j] = ["h0", "h1", "h2"]
        docs.append(make_docinfo(toks, with_blooms=True))
    return make_engine(docs, request.param)


def test_head_pair_parity_both_outcomes(phrase_corpus, monkeypatch):
    packed, oracle, engine = phrase_corpus
    called = spy_semidense_phrase(monkeypatch)
    for terms, k in ((["h0", "h1"], 10), (["h1", "h0"], 5),
                     (["h0", "h1", "h2"], 10)):
        q = SearchQuery(terms, n_results=k, is_phrase=True)
        assert_same(oracle.search(q), engine.search(q), f"phrase {terms}")
    assert called, "head phrases must take the semidense phrase route"


def test_provable_pair_no_host_fallback(phrase_corpus, monkeypatch):
    packed, oracle, engine = phrase_corpus
    engine._host_cache.clear()
    called = spy_semidense_phrase(monkeypatch)
    host = spy_host(engine, monkeypatch)
    q = SearchQuery(["p0", "p1"], n_results=5, is_phrase=True)
    assert_same(oracle.search(q), engine.search(q), "pure pair")
    assert called, "pure pair must route semidense"
    assert not host, "provable pair must not fall back to host"


def test_non_dense_other_keeps_compact_path(phrase_corpus, monkeypatch):
    packed, oracle, engine = phrase_corpus
    called = spy_semidense_phrase(monkeypatch)
    q = SearchQuery(["m0", "m1"], n_results=5, is_phrase=True)
    assert_same(oracle.search(q), engine.search(q), "mid pair")
    assert not called, "sub-floor terms must not route semidense"


def test_batch_mixed_routes(phrase_corpus):
    packed, oracle, engine = phrase_corpus
    rng = np.random.default_rng(9)
    qs = []
    for _ in range(40):
        pick = rng.random()
        if pick < 0.4:
            qs.append(SearchQuery(["h0", "h1"],
                                  n_results=int(rng.integers(1, 12)),
                                  is_phrase=True))
        elif pick < 0.6:
            qs.append(SearchQuery(["p0", "p1"], n_results=5,
                                  is_phrase=True))
        elif pick < 0.8:
            qs.append(SearchQuery(["m0", "m1"], n_results=5,
                                  is_phrase=True))
        else:
            qs.append(SearchQuery(["h0", "h1", "h2"], n_results=10,
                                  is_phrase=True))
    res = engine.search_batch(qs)
    for q, r in zip(qs, res):
        assert_same(oracle.search(q), r, f"batch {q.terms}")


def test_zero_phrase_matches(phrase_corpus):
    packed, oracle, engine = phrase_corpus
    # reversed pure pair: co-present docs exist, adjacency never does
    q = SearchQuery(["p1", "p0"], n_results=5, is_phrase=True)
    assert_same(oracle.search(q), engine.search(q), "reversed pair")

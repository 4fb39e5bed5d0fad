"""Staged + sharded composition (ShardedStagedEngine): bigger-than-HBM
indexes on the 8-virtual-device CPU mesh stay bit-exact vs the oracle
under a constrained per-mesh budget (VERDICT r1 item 10 — the reference's
"read as needed" flash story composed with the mesh scale-out axis)."""

import numpy as np
import pytest

from wiser_tpu.data.synth import synth_docinfos, synth_query_terms
from wiser_tpu.engine.staged import BYTES_PER_POSTING
from wiser_tpu.engine.staged_shard import ShardedStagedEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module")
def setup():
    docs = synth_docinfos(n_docs=500, vocab_size=120, mean_len=35, seed=13)
    packed, oracle = build_index(docs)
    # ~25% of posting bytes resident -> a real hot/cold split
    budget = int(packed.n_postings) * BYTES_PER_POSTING // 4
    engine = ShardedStagedEngine(packed, n_shards=8,
                                 hbm_budget_bytes=budget,
                                 doc_bodies=oracle.doc_bodies)
    return packed, oracle, engine


def assert_same(oracle_res, res, msg=""):
    o = [(e.doc_id, e.doc_score) for e in oracle_res.entries]
    t = [(e.doc_id, e.doc_score) for e in res.entries]
    assert o == t, f"{msg}\noracle={o[:4]}\nsharded_staged={t[:4]}"


def test_split_is_real(setup):
    _, _, engine = setup
    assert 0.0 < engine.hot_fraction < 1.0


def test_hot_and_cold_parity_mixed_batch(setup):
    packed, oracle, engine = setup
    rng = np.random.default_rng(7)
    hot_terms = [packed.terms[r]
                 for r in np.nonzero(engine.hot_mask)[0][:20]]
    cold_terms = [packed.terms[r]
                  for r in np.nonzero(~engine.hot_mask)[0][:20]]
    assert hot_terms and cold_terms
    queries = []
    queries += [SearchQuery([t], n_results=10) for t in hot_terms[:5]]
    queries += [SearchQuery([t], n_results=10) for t in cold_terms[:5]]
    # hot+hot, cold+cold, and MIXED hot+cold conjunctions
    for _ in range(8):
        queries.append(SearchQuery(
            [str(rng.choice(hot_terms)), str(rng.choice(hot_terms))],
            n_results=10))
        queries.append(SearchQuery(
            [str(rng.choice(cold_terms)), str(rng.choice(cold_terms))],
            n_results=10))
        queries.append(SearchQuery(
            [str(rng.choice(hot_terms)), str(rng.choice(cold_terms))],
            n_results=10))
    queries.append(SearchQuery(
        [str(rng.choice(hot_terms)), str(rng.choice(cold_terms)),
         str(rng.choice(hot_terms))], n_results=7))
    res = engine.search_batch(queries)
    for q, r in zip(queries, res):
        assert_same(oracle.search(q), r, f"{q.terms}")


def test_random_aol_shaped_parity(setup):
    packed, oracle, engine = setup
    rng = np.random.default_rng(29)
    queries = []
    for _ in range(60):
        nt = int(rng.choice([1, 2, 3, 4], p=[0.43, 0.29, 0.20, 0.08]))
        terms = list(rng.choice(packed.terms, nt, replace=False))
        queries.append(SearchQuery([str(t) for t in terms], n_results=10))
    res = engine.search_batch(queries)
    for q, r in zip(queries, res):
        assert_same(oracle.search(q), r, f"{q.terms}")


def test_phrase_parity_both_tiers(setup):
    packed, oracle, engine = setup
    rng = np.random.default_rng(31)
    hits = 0
    for _ in range(12):
        a, b = rng.choice(packed.terms, 2, replace=False)
        q = SearchQuery([str(a), str(b)], n_results=10, is_phrase=True)
        o = oracle.search(q)
        assert_same(o, engine.search(q), f"phrase {a} {b}")
        hits += o.size() > 0
    # phrases over hot-only terms take the resident mesh pipeline
    hot_terms = [packed.terms[r]
                 for r in np.nonzero(engine.hot_mask)[0][:10]]
    for a, b in zip(hot_terms, hot_terms[1:]):
        q = SearchQuery([a, b], n_results=10, is_phrase=True)
        assert_same(oracle.search(q), engine.search(q), f"hot phrase {a} {b}")


def test_snippets_cross_tier(setup):
    packed, oracle, engine = setup
    cold_terms = [packed.terms[r]
                  for r in np.nonzero(~engine.hot_mask)[0][:3]]
    for t in cold_terms:
        q = SearchQuery([t], n_results=3, return_snippets=True)
        o, r = oracle.search(q), engine.search(q)
        assert [e.snippet for e in o.entries] == \
               [e.snippet for e in r.entries], t

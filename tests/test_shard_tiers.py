"""Mesh-path feature-parity tests: the dense doc-space tier, block-max
pruned scan, mixed semi-dense route, host impact table, and request
coalescing on the 8-virtual-device CPU mesh — the sharded mirrors of the
single-device execution tiers (BASELINE.json config 5; round-3 VERDICT
item 4). Corpus is large enough (3k docs) that head terms cross the
dense-tier threshold (df >= max(1024, n/96))."""

import numpy as np
import pytest

from wiser_tpu.data.synth import synth_docinfos
from wiser_tpu.engine.shard import ShardedEngine, ShardedIndex
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module")
def setup():
    docs = synth_docinfos(n_docs=3000, vocab_size=400, mean_len=60,
                          zipf_a=1.15, seed=11, with_blooms=False)
    packed, oracle = build_index(docs)
    sharded = ShardedIndex.from_packed(packed, n_shards=8)
    engine = ShardedEngine(sharded)
    return packed, oracle, engine


def _check(oracle, engine, queries):
    got = engine.search_batch(queries)
    for q, g in zip(queries, got):
        o = oracle.search(q)
        oo = [(e.doc_id, e.doc_score) for e in o.entries]
        gg = [(e.doc_id, e.doc_score) for e in g.entries]
        assert oo == gg, (q.terms, oo[:3], gg[:3])


def test_dense_tier_built(setup):
    packed, _, engine = setup
    assert engine._dense_H > 0, "corpus must produce head terms"
    assert engine._tt is not None


def test_dense_route_parity(setup):
    packed, oracle, engine = setup
    head = np.nonzero(engine._dense_slot >= 0)[0]
    assert len(head) >= 3
    rng = np.random.default_rng(5)
    queries = []
    for _ in range(40):
        pick = rng.choice(head, size=rng.integers(2, 4), replace=False)
        # all-head -> the sharded dense scan route (engine routing is
        # deterministic: every slot dense => _submit_dense)
        queries.append(SearchQuery([packed.terms[r] for r in pick],
                                   n_results=10))
    _check(oracle, engine, queries)


def test_semidense_route_parity(setup):
    packed, oracle, engine = setup
    head = np.nonzero(engine._dense_slot >= 0)[0]
    tail = np.nonzero((engine._dense_slot < 0) & (packed.df >= 2))[0]
    assert len(tail) >= 3
    rng = np.random.default_rng(6)
    queries = []
    for _ in range(40):
        t = packed.terms[rng.choice(tail)]
        hs = rng.choice(head, size=rng.integers(1, 3), replace=False)
        terms = [t] + [packed.terms[r] for r in hs]
        queries.append(SearchQuery(terms, n_results=10))
    # mixes tail x head (semidense with 0 bs slots) and, when the tail
    # term is not the min-df one, bs slots too
    _check(oracle, engine, queries)


def test_semidense_with_bs_others(setup):
    packed, oracle, engine = setup
    head = np.nonzero(engine._dense_slot >= 0)[0]
    tail = np.nonzero((engine._dense_slot < 0) & (packed.df >= 2))[0]
    order = tail[np.argsort(packed.df[tail])]
    if len(order) < 2:
        pytest.skip("not enough tail terms")
    rng = np.random.default_rng(7)
    queries = []
    for _ in range(30):
        lo = packed.terms[order[rng.integers(0, max(1, len(order) // 3))]]
        hi = packed.terms[order[rng.integers(len(order) // 2, len(order))]]
        h = packed.terms[rng.choice(head)]
        queries.append(SearchQuery([lo, hi, h], n_results=10))
    _check(oracle, engine, queries)


def test_single_term_table_parity(setup):
    packed, oracle, engine = setup
    rng = np.random.default_rng(8)
    rows = rng.integers(0, packed.n_terms, size=30)
    queries = [SearchQuery([packed.terms[r]], n_results=10) for r in rows]
    # includes head terms (df > table depth -> device path) and tail
    # (served from the host impact table)
    _check(oracle, engine, queries)


def test_coalescing_fanout(setup):
    packed, oracle, engine = setup
    head = np.nonzero(engine._dense_slot >= 0)[0]
    terms = [packed.terms[r] for r in head[:2]]
    q = SearchQuery(terms, n_results=10)
    batch = [q, SearchQuery(terms, n_results=10), q]
    got = engine.search_batch(batch)
    ref = [(e.doc_id, e.doc_score) for e in got[0].entries]
    for g in got[1:]:
        assert [(e.doc_id, e.doc_score) for e in g.entries] == ref


def test_pruned_dense_guard_parity(setup):
    """Force the block-max pruned mesh scan by shrinking the thresholds:
    C=2 of NB local blocks examined; the post-merge guard must route any
    unprovable query to the exact host path — results stay bit-exact."""
    packed, oracle, _ = setup
    sharded = ShardedIndex.from_packed(packed, n_shards=8)

    class SmallPruned(ShardedEngine):
        PRUNED_DENSE_MIN_NB = 1
        PRUNED_DENSE_C = 2

    engine = SmallPruned(sharded)
    NB = engine._npd // 128
    assert NB >= engine.PRUNED_DENSE_C + 1, "corpus too small for C=2"
    head = np.nonzero(engine._dense_slot >= 0)[0]
    rng = np.random.default_rng(9)
    queries = []
    for _ in range(30):
        pick = rng.choice(head, size=2, replace=False)
        queries.append(SearchQuery([packed.terms[r] for r in pick],
                                   n_results=10))
    _check(oracle, engine, queries)


def test_mixed_batch_all_routes(setup):
    packed, oracle, engine = setup
    head = np.nonzero(engine._dense_slot >= 0)[0]
    tail = np.nonzero((engine._dense_slot < 0) & (packed.df >= 2))[0]
    rng = np.random.default_rng(10)
    queries = []
    for i in range(60):
        kind = i % 4
        if kind == 0:
            queries.append(SearchQuery(
                [packed.terms[rng.choice(tail)]], n_results=10))
        elif kind == 1:
            pick = rng.choice(head, size=2, replace=False)
            queries.append(SearchQuery(
                [packed.terms[r] for r in pick], n_results=10))
        elif kind == 2:
            queries.append(SearchQuery(
                [packed.terms[rng.choice(tail)],
                 packed.terms[rng.choice(head)]], n_results=10))
        else:
            pick = rng.choice(tail, size=2, replace=False)
            queries.append(SearchQuery(
                [packed.terms[r] for r in pick], n_results=10))
    _check(oracle, engine, queries)

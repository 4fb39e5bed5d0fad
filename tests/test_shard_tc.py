"""tc-mode sharded engine over the 8-virtual-device CPU mesh: per-shard
compressed uint16 tc columns + uint8 dense TF plane (VERDICT r3 item 8 —
per-shard HBM is the scarce resource config 5 exists for). Results must
be bit-identical to the oracle on every route, like the raw mesh."""

import numpy as np
import pytest

from wiser_tpu.data.synth import synth_docinfos
from wiser_tpu.engine.shard import ShardedEngine, ShardedIndex
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


def assert_same(oracle_res, res, msg=""):
    o = [(e.doc_id, e.doc_score) for e in oracle_res.entries]
    t = [(e.doc_id, e.doc_score) for e in res.entries]
    assert o == t, f"{msg}\noracle={o}\nsharded_tc={t}"


@pytest.fixture(scope="module")
def tc_setup():
    docs = synth_docinfos(n_docs=600, vocab_size=120, mean_len=40, seed=17)
    packed, oracle = build_index(docs)
    sharded = ShardedIndex.from_packed(packed, n_shards=8)
    ShardedEngine.DENSE_MIN_DF_FLOOR = 16  # force a dense tier
    try:
        engine = ShardedEngine(sharded, columns="tc")
    finally:
        ShardedEngine.DENSE_MIN_DF_FLOOR = 1024
    return packed, oracle, engine


def test_tc_column_bytes(tc_setup):
    packed, _, engine = tc_setup
    assert engine.d_postings_tc.dtype == np.uint16
    assert engine.d_postings_score is None
    assert engine.d_dense_tf8.dtype == np.uint8


def test_single_and_multi_term_parity(tc_setup):
    packed, oracle, engine = tc_setup
    rng = np.random.default_rng(4)
    live = [t for t in packed.terms if packed.df[packed.lookup(t)] > 0]
    queries = []
    for _ in range(80):
        k = int(rng.integers(1, 4))
        ts = list(dict.fromkeys(rng.choice(live, size=k).tolist()))
        queries.append(SearchQuery(ts, n_results=10))
    # deep-k single terms exercise the device path past the impact table
    queries += [SearchQuery([live[0]], n_results=200),
                SearchQuery([live[-1]], n_results=50)]
    for q, r in zip(queries, engine.search_batch(queries)):
        assert_same(oracle.search(q), r, f"{q.terms}")


def test_dense_and_semidense_routes_parity(tc_setup):
    packed, oracle, engine = tc_setup
    assert engine._dense_H > 0, "dense tier must engage"
    order = np.argsort(packed.df)[::-1]
    head = [packed.terms[r] for r in order[: engine._dense_H]]
    tail = [packed.terms[r] for r in order[engine._dense_H:]
            if packed.df[r] > 0]
    rng = np.random.default_rng(9)
    queries = []
    for _ in range(40):  # all-head pairs/triples -> dense scan
        ts = list(dict.fromkeys(rng.choice(head, size=int(
            rng.integers(2, 4))).tolist()))
        queries.append(SearchQuery(ts, n_results=10))
    for _ in range(40):  # tail x head -> semidense
        ts = [str(rng.choice(tail)), str(rng.choice(head))]
        queries.append(SearchQuery(list(dict.fromkeys(ts)), n_results=10))
    for q, r in zip(queries, engine.search_batch(queries)):
        assert_same(oracle.search(q), r, f"{q.terms}")


def test_phrase_parity(tc_setup):
    packed, oracle, engine = tc_setup
    rng = np.random.default_rng(11)
    live = [t for t in packed.terms if packed.df[packed.lookup(t)] > 0]
    queries = []
    for _ in range(40):
        ts = list(dict.fromkeys(rng.choice(live, size=2).tolist()))
        if len(ts) < 2:
            continue
        queries.append(SearchQuery(ts, n_results=10, is_phrase=True))
    res = engine.search_batch(queries)
    n_hits = 0
    for q, r in zip(queries, res):
        o = oracle.search(q)
        n_hits += len(o.entries)
        assert_same(o, r, f"phrase {q.terms}")
    assert n_hits > 0, "need at least one real phrase match in the probe"


@pytest.mark.parametrize("columns", ["tc", "raw"])
def test_compact_phrase_pipeline_parity(columns):
    """Sharded compact phrase pipeline (bloom gate + KV compaction +
    FLAG_PRUNE_MISS merge) in BOTH column modes. Requires blooms
    resident and L > PHRASE_COMPACT_KV — monkeypatched low so the 128
    L-bucket triggers it (ADVICE r4: the raw-mode branch shipped with
    mismatched shard_map in_specs because no test reached it)."""
    docs = synth_docinfos(n_docs=600, vocab_size=120, mean_len=40, seed=17)
    packed, oracle = build_index(docs, with_blooms=True)
    sharded = ShardedIndex.from_packed(packed, n_shards=8)
    old_kv = ShardedEngine.PHRASE_COMPACT_KV
    ShardedEngine.PHRASE_COMPACT_KV = 8
    try:
        engine = ShardedEngine(sharded, columns=columns)
        assert engine.d_bloom_rows is not None, "blooms must be resident"
        rng = np.random.default_rng(31)
        live = [t for t in packed.terms if packed.df[packed.lookup(t)] > 0]
        queries = []
        for _ in range(30):
            ts = list(dict.fromkeys(rng.choice(live, size=2).tolist()))
            if len(ts) < 2:
                continue
            queries.append(SearchQuery(ts, n_results=10, is_phrase=True))
        res = engine.search_batch(queries)
        n_hits = 0
        for q, r in zip(queries, res):
            o = oracle.search(q)
            n_hits += len(o.entries)
            assert_same(o, r, f"compact phrase [{columns}] {q.terms}")
        assert n_hits > 0
    finally:
        ShardedEngine.PHRASE_COMPACT_KV = old_kv


def test_raw_and_tc_identical(tc_setup):
    """raw-vs-tc on the mesh must agree query for query (both already
    match the oracle; this pins the pair directly too)."""
    packed, oracle, tc_engine = tc_setup
    raw_engine = ShardedEngine(tc_engine.sharded)
    rng = np.random.default_rng(23)
    live = [t for t in packed.terms if packed.df[packed.lookup(t)] > 0]
    queries = [SearchQuery(
        list(dict.fromkeys(rng.choice(live, size=int(
            rng.integers(1, 4))).tolist())), n_results=10)
        for _ in range(40)]
    for q, a, b in zip(queries, raw_engine.search_batch(queries),
                       tc_engine.search_batch(queries)):
        ea = [(e.doc_id, e.doc_score) for e in a.entries]
        eb = [(e.doc_id, e.doc_score) for e in b.entries]
        assert ea == eb, f"{q.terms}"

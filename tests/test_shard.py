"""Sharded-engine tests over an 8-virtual-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8) — BASELINE.json config 5."""

import jax
import numpy as np
import pytest

from wiser_tpu.data.synth import synth_docinfos, synth_query_terms
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.engine.shard import ShardedEngine, ShardedIndex
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module")
def sharded_setup():
    docs = synth_docinfos(n_docs=400, vocab_size=100, mean_len=30, seed=3)
    packed, oracle = build_index(docs)
    sharded = ShardedIndex.from_packed(packed, n_shards=8)
    engine = ShardedEngine(sharded)
    return packed, oracle, TpuEngine(packed), engine


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


class TestShardedIndex:
    def test_partition_covers_all_postings(self, sharded_setup):
        packed, _, _, engine = sharded_setup
        sh = engine.sharded
        assert int(sh.df_shard.sum()) == int(packed.df.sum())

    def test_shard_doc_ranges(self, sharded_setup):
        from wiser_tpu.index.format import SENTINEL_DOC

        packed, _, _, engine = sharded_setup
        sh = engine.sharded
        for s in range(sh.n_shards):
            docs = sh.postings_doc[s]
            real = docs[docs != SENTINEL_DOC]
            if real.size:
                assert real.min() >= sh.doc_bounds[s]
                assert real.max() < sh.doc_bounds[s + 1]


class TestShardedParity:
    def test_single_term(self, sharded_setup):
        _, oracle, _, engine = sharded_setup
        for t in ["t0", "t1", "t5", "t42"]:
            if engine.lookup(t) < 0:
                continue
            q = SearchQuery([t], n_results=10)
            o = [(e.doc_id, e.doc_score) for e in oracle.search(q).entries]
            s = [(e.doc_id, e.doc_score) for e in engine.search(q).entries]
            assert o == s, f"term={t}"

    def test_and_queries(self, sharded_setup):
        _, oracle, _, engine = sharded_setup
        for terms in synth_query_terms(15, 100, n_terms=2, seed=2):
            q = SearchQuery(terms, n_results=10)
            o = [(e.doc_id, e.doc_score) for e in oracle.search(q).entries]
            s = [(e.doc_id, e.doc_score) for e in engine.search(q).entries]
            assert o == s, f"terms={terms}"

    def test_phrase_queries(self, sharded_setup):
        _, oracle, _, engine = sharded_setup
        for terms in synth_query_terms(20, 30, n_terms=2, seed=17):
            q = SearchQuery(terms, n_results=10, is_phrase=True)
            o = [(e.doc_id, e.doc_score) for e in oracle.search(q).entries]
            s = [(e.doc_id, e.doc_score) for e in engine.search(q).entries]
            assert o == s, f"PHRASE {terms}"

    def test_three_term_phrase_sharded(self, sharded_setup):
        _, oracle, _, engine = sharded_setup
        # mine an actually-occurring phrase so the positive path is hit
        from wiser_tpu.data.synth_log import mine_phrases_from_index

        pairs = mine_phrases_from_index(oracle, max_phrases=5, seed=2)
        for pair in pairs:
            q = SearchQuery(list(pair), n_results=10, is_phrase=True)
            o = [(e.doc_id, e.doc_score) for e in oracle.search(q).entries]
            s = [(e.doc_id, e.doc_score) for e in engine.search(q).entries]
            assert o == s and len(o) > 0, f"PHRASE {pair}"

    def test_matches_single_device_engine(self, sharded_setup):
        _, _, single, engine = sharded_setup
        queries = [SearchQuery(t, n_results=10)
                   for t in synth_query_terms(10, 100, n_terms=3, seed=9)]
        a = single.search_batch(queries)
        b = engine.search_batch(queries)
        for qa, qb in zip(a, b):
            assert [(e.doc_id, e.doc_score) for e in qa.entries] == \
                   [(e.doc_id, e.doc_score) for e in qb.entries]


class TestShardedGuardAndSnippets:
    """Round-2 hardening: tie-class truncation guard, saturation routing,
    pipelined submit, and snippets on the sharded path (VERDICT r1 #6)."""

    def test_tie_fuzz_guard(self, monkeypatch):
        """A giant exact tie class + forced suspect flag must route to the
        exact host path and stay bit-identical (mirrors
        test_truncation_guard on the 8-device mesh)."""
        from wiser_tpu.data.synth import make_docinfo
        import wiser_tpu.engine.shard as shard_mod

        docs = [make_docinfo("w w q".split()) for _ in range(200)]
        docs += [make_docinfo(["q", f"u{i}"]) for i in range(24)]
        packed, oracle = build_index(docs)
        sharded = ShardedIndex.from_packed(packed, n_shards=8)
        engine = ShardedEngine(sharded)
        q = SearchQuery(["w", "q"], n_results=10)
        o = oracle.search(q)
        r = engine.search(q)
        assert [(e.doc_id, e.doc_score) for e in r.entries] == \
               [(e.doc_id, e.doc_score) for e in o.entries]
        # force the suspect flag: results must still be exact (host path)
        calls = []
        orig = engine._host_exact

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(engine, "_host_exact", spy)
        monkeypatch.setattr(
            shard_mod, "truncation_suspects",
            lambda s, n, k, **kw: np.ones(len(s), dtype=bool), raising=False)
        import wiser_tpu.engine.topk as topk_mod
        monkeypatch.setattr(
            topk_mod, "truncation_suspects",
            lambda s, n, k, **kw: np.ones(len(s), dtype=bool))
        r2 = engine.search(q)
        assert calls, "forced suspect flag must route to the host path"
        assert [(e.doc_id, e.doc_score) for e in r2.entries] == \
               [(e.doc_id, e.doc_score) for e in o.entries]

    def test_host_exact_sharded_matches(self, sharded_setup):
        from wiser_tpu.engine.shard import host_exact_search_sharded

        packed, oracle, _, engine = sharded_setup
        rows = [packed.lookup("t0"), packed.lookup("t1")]
        d, s = host_exact_search_sharded(
            engine.sharded, engine.cache64, rows, 10)
        o = oracle.search(SearchQuery(["t0", "t1"], n_results=10))
        assert list(d) == [e.doc_id for e in o.entries]
        np.testing.assert_array_equal(s, [e.doc_score for e in o.entries])
        dp, sp = host_exact_search_sharded(
            engine.sharded, engine.cache64, rows, 10, is_phrase=True)
        op = oracle.search(SearchQuery(["t0", "t1"], n_results=10,
                                       is_phrase=True))
        assert list(dp) == [e.doc_id for e in op.entries]

    def test_saturation_routes_to_host(self, monkeypatch):
        import wiser_tpu.engine.shard as shard_mod

        docs = synth_docinfos(n_docs=600, vocab_size=60, mean_len=30, seed=5)
        packed, oracle = build_index(docs)
        sharded = ShardedIndex.from_packed(packed, n_shards=8)
        monkeypatch.setattr(shard_mod, "L_BUCKETS", [16])
        engine = ShardedEngine(sharded)
        head = packed.terms[int(np.argmax(packed.df))]
        for terms, phr in ([[head, "t1"], False], [[head, "t1"], True]):
            q = SearchQuery(terms, n_results=10, is_phrase=phr)
            o = oracle.search(q)
            r = engine.search(q)
            assert [(e.doc_id, e.doc_score) for e in r.entries] == \
                   [(e.doc_id, e.doc_score) for e in o.entries], (terms, phr)

    def test_sharded_snippets(self, sharded_setup):
        packed, oracle, _, _ = sharded_setup
        sharded = ShardedIndex.from_packed(packed, n_shards=8)
        engine = ShardedEngine(sharded, doc_bodies=oracle.doc_bodies)
        q = SearchQuery(["t0", "t1"], n_results=3, return_snippets=True)
        o = oracle.search(q)
        r = engine.search(q)
        assert [e.snippet for e in r.entries] == [e.snippet for e in o.entries]
        assert any(e.snippet for e in r.entries)

    def test_submit_batch_pipelining(self, sharded_setup):
        _, oracle, _, engine = sharded_setup
        queries = [SearchQuery(t, n_results=10)
                   for t in synth_query_terms(20, 100, n_terms=2, seed=17)]
        queries += [SearchQuery(["t0", "t1"], n_results=5, is_phrase=True)]
        results, pending = engine.submit_batch(queries)
        for f in pending:
            f(results)
        for q, r in zip(queries, results):
            o = oracle.search(q)
            assert [(e.doc_id, e.doc_score) for e in r.entries] == \
                   [(e.doc_id, e.doc_score) for e in o.entries], q.terms

"""Device-merge (Pallas staircase) routing parity, interpret-safe on CPU
by forcing the route threshold down."""

import numpy as np
import pytest

from wiser_tpu.data.synth import synth_docinfos, synth_query_terms
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module")
def corpus():
    docs = synth_docinfos(n_docs=500, vocab_size=30, mean_len=30, seed=41)
    return build_index(docs)


def test_device_merge_parity(corpus, monkeypatch):
    packed, oracle = corpus
    # force every multi-term query down the merge route; run the Pallas
    # kernel in interpret mode on CPU
    import wiser_tpu.ops.merge as merge_mod

    orig = merge_mod.make_merge_intersect
    monkeypatch.setattr(
        merge_mod, "make_merge_intersect",
        lambda L, interpret=False: orig(L, interpret=True))

    engine = TpuEngine(packed, device_merge=True)
    engine.HOST_MERGE_MIN_L = 128
    queries = [SearchQuery(t, n_results=10)
               for t in synth_query_terms(20, 30, n_terms=2, seed=6)]
    queries += [SearchQuery(t, n_results=10)
                for t in synth_query_terms(6, 30, n_terms=3, seed=7)]
    queries += [SearchQuery(["t0"], n_results=10)]  # single stays on flat
    res = engine.search_batch(queries)
    for q, r in zip(queries, res):
        o = oracle.search(q)
        assert [(e.doc_id, e.doc_score) for e in r.entries] == \
               [(e.doc_id, e.doc_score) for e in o.entries], q.terms


def test_flag_off_uses_host(corpus):
    packed, oracle = corpus
    engine = TpuEngine(packed, device_merge=False)
    engine.HOST_MERGE_MIN_L = 128
    q = SearchQuery(["t0", "t1"], n_results=10)
    o = oracle.search(q)
    r = engine.search(q)
    assert [(e.doc_id, e.doc_score) for e in r.entries] == \
           [(e.doc_id, e.doc_score) for e in o.entries]

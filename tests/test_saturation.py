"""L-bucket saturation routing — queries whose candidate posting list
exceeds the largest L bucket must NOT silently scan only the first L
candidates (ADVICE r1, medium). We shrink the bucket set so a toy corpus
exercises the same routing the 20M-doc corpus would."""

import numpy as np
import pytest

import wiser_tpu.engine.device as device_mod
from wiser_tpu.data.synth import synth_docinfos, synth_query_terms
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module")
def corpus():
    docs = synth_docinfos(n_docs=600, vocab_size=60, mean_len=30, seed=5,
                          with_blooms=True)
    packed, oracle = build_index(docs, with_blooms=True)
    return packed, oracle


def assert_same(oracle_res, res, msg=""):
    o = [(e.doc_id, e.doc_score) for e in oracle_res.entries]
    t = [(e.doc_id, e.doc_score) for e in res.entries]
    assert o == t, f"{msg}\noracle={o}\ntpu={t}"


@pytest.fixture()
def tiny_buckets(corpus, monkeypatch):
    """Cap L buckets below the head terms' df so saturation routing fires."""
    packed, _ = corpus
    assert int(packed.df.max()) > 128, "corpus must have df>128 head terms"
    monkeypatch.setattr(device_mod, "L_BUCKETS", [128])
    return TpuEngine(packed)


def test_saturated_single_term(corpus, tiny_buckets):
    packed, oracle = corpus
    head = int(np.argmax(packed.df))
    q = SearchQuery([packed.terms[head]], n_results=10)
    assert_same(oracle.search(q), tiny_buckets.search(q), "saturated 1-term")


def test_saturated_and_and_phrase(corpus, tiny_buckets):
    packed, oracle = corpus
    order = np.argsort(packed.df)[::-1]
    heads = [packed.terms[int(r)] for r in order[:2]]
    for is_phrase in (False, True):
        q = SearchQuery(heads, n_results=10, is_phrase=is_phrase)
        assert_same(oracle.search(q), tiny_buckets.search(q),
                    f"saturated 2-term phrase={is_phrase}")


def test_saturated_mixed_batch(corpus, tiny_buckets):
    packed, oracle = corpus
    queries = [SearchQuery(t, n_results=10)
               for t in synth_query_terms(30, 60, n_terms=2, seed=9)]
    queries += [SearchQuery([packed.terms[int(r)]], n_results=10)
                for r in np.argsort(packed.df)[::-1][:3]]
    batch = tiny_buckets.search_batch(queries)
    for q, r in zip(queries, batch):
        assert_same(oracle.search(q), r, f"{q.terms}")

"""coarse_buckets=True merges shape buckets (fewer dispatch groups per
batch — the closed-loop serving lever); results must stay bit-identical
to the oracle across every route."""

import numpy as np
import pytest

from wiser_tpu.data.synth import synth_docinfos
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module")
def corpus():
    docs = synth_docinfos(3000, 600, 40, zipf_a=1.2, seed=9)
    packed, oracle = build_index(docs)
    return packed, oracle


@pytest.mark.parametrize("columns", ["raw", "tc"])
def test_coarse_bucket_parity(corpus, columns):
    packed, oracle = corpus
    eng = TpuEngine(packed, columns=columns, coarse_buckets=True)
    assert eng._lb[0] == 2048 and eng._tb == [1, 2, 4, 8]
    rng = np.random.default_rng(4)
    order = np.argsort(packed.df)[::-1]
    queries = []
    for _ in range(120):
        nt = int(rng.choice([1, 2, 3, 4], p=[0.3, 0.3, 0.25, 0.15]))
        ranks = np.minimum(rng.zipf(1.3, size=nt) - 1, packed.n_terms - 1)
        queries.append(SearchQuery(
            [packed.terms[r] for r in order[ranks]], n_results=10))
    # a phrase and a tie-heavy k
    queries.append(SearchQuery([packed.terms[order[0]],
                                packed.terms[order[1]]],
                               n_results=10, is_phrase=True))
    res = eng.search_batch(queries)
    for q, r in zip(queries, res):
        o = [(e.doc_id, e.doc_score) for e in oracle.search(q).entries]
        t = [(e.doc_id, e.doc_score) for e in r.entries]
        assert o == t, f"{q.terms} phrase={q.is_phrase}\n{o[:3]}\n{t[:3]}"


def test_coarse_fewer_groups(corpus):
    packed, _ = corpus
    fine = TpuEngine(packed)
    coarse = TpuEngine(packed, coarse_buckets=True)
    rng = np.random.default_rng(4)
    order = np.argsort(packed.df)[::-1]
    queries = []
    for _ in range(256):
        nt = int(rng.choice([2, 3, 4], p=[0.5, 0.3, 0.2]))
        ranks = np.minimum(rng.zipf(1.3, size=nt) - 1, packed.n_terms - 1)
        queries.append(SearchQuery(
            [packed.terms[r] for r in order[ranks]], n_results=10))
    _, pf = fine.submit_batch(queries)
    _, pc = coarse.submit_batch(queries)
    assert len(pc) < len(pf), (len(pc), len(pf))

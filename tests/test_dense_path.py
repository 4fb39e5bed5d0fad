"""Doc-space dense kernel for all-head-term conjunctions: parity +
routing. At reference scale ~25% of the AOL mix is all-head multi-term;
the dense path must be bit-exact and actually engaged."""

import numpy as np
import pytest

from wiser_tpu.data.synth import make_docinfo
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module", params=["raw", "tc"])
def corpus(request):
    rng = np.random.default_rng(17)
    docs = []
    for i in range(1600):
        toks = []
        if rng.random() < 0.9:
            toks.append("h0")
        if rng.random() < 0.8:
            toks.append("h1")
        if rng.random() < 0.7:
            toks.append("h2")
        toks += [f"r{rng.integers(200)}" for _ in range(rng.integers(3, 10))]
        rng.shuffle(toks)
        docs.append(make_docinfo(toks, with_blooms=False))
    packed, oracle = build_index(docs)
    engine = TpuEngine(packed, columns=request.param)
    return packed, oracle, engine


def assert_same(oracle_res, res, msg=""):
    o = [(e.doc_id, e.doc_score) for e in oracle_res.entries]
    t = [(e.doc_id, e.doc_score) for e in res.entries]
    assert o == t, f"{msg}\noracle={o[:4]}\ntpu={t[:4]}"


def test_dense_rows_built(corpus):
    packed, _, engine = corpus
    assert engine._dense_H >= 3
    for t in ("h0", "h1", "h2"):
        assert engine._dense_slot[packed.lookup(t)] >= 0


def test_all_head_pairs_match_oracle(corpus):
    _, oracle, engine = corpus
    for terms in (["h0", "h1"], ["h1", "h2"], ["h0", "h1", "h2"],
                  ["h2", "h0"]):
        q = SearchQuery(terms, n_results=10)
        assert_same(oracle.search(q), engine.search(q), f"AND {terms}")


def test_dense_path_is_engaged(corpus, monkeypatch):
    import wiser_tpu.engine.kernels as K

    _, oracle, engine = corpus
    called = []
    name = ("make_dense_search_kernel_tc" if engine.columns == "tc"
            else "make_dense_search_kernel")
    orig = getattr(K, name)

    def spy(*a, **kw):
        called.append(a)
        return orig(*a, **kw)

    monkeypatch.setattr(K, name, spy)
    q = SearchQuery(["h0", "h1"], n_results=10)
    assert_same(oracle.search(q), engine.search(q))
    assert called, "all-head pair must route through the dense kernel"


def test_mixed_head_tail_stays_on_list_path(corpus, monkeypatch):
    import wiser_tpu.engine.kernels as K

    _, oracle, engine = corpus
    called = []
    for name in ("make_dense_search_kernel", "make_dense_search_kernel_tc"):
        monkeypatch.setattr(
            K, name,
            lambda *a, **kw: called.append(a) or K.make_search_kernel(1, 1, 1, 1))
    q = SearchQuery(["h0", "r5"], n_results=10)
    assert_same(oracle.search(q), engine.search(q))
    assert not called, "head+tail query must not route dense"


def test_dense_batch_with_k_variety(corpus):
    _, oracle, engine = corpus
    queries = [SearchQuery(["h0", "h1"], n_results=k) for k in (1, 5, 37)]
    queries += [SearchQuery(["h1", "h2", "h0"], n_results=10)]
    queries += [SearchQuery(["h0", f"r{i}"], n_results=10) for i in range(5)]
    batch = engine.search_batch(queries)
    for q, r in zip(queries, batch):
        assert_same(oracle.search(q), r, f"{q.terms} k={q.n_results}")


def test_dense_disabled_matches(corpus):
    packed, oracle, _ = corpus
    eng = TpuEngine(packed, dense_budget_bytes=0)
    assert eng._dense_H == 0
    q = SearchQuery(["h0", "h1"], n_results=10)
    assert_same(oracle.search(q), eng.search(q))


def test_mixed_semidense_bs_others(corpus, monkeypatch):
    """Queries mixing dense others with small non-dense others route
    through the mixed semi-dense kernel (n_bs > 0) and stay bit-exact —
    the reference-scale fix for the full-column bs kernel's serial
    gathers."""
    import wiser_tpu.engine.kernels as K

    _, oracle, engine = corpus
    called = []
    name = ("make_semidense_kernel_tc" if engine.columns == "tc"
            else "make_semidense_kernel")
    orig = getattr(K, name)

    def spy(*a, **kw):
        called.append(a)
        return orig(*a, **kw)

    monkeypatch.setattr(K, name, spy)
    # r5/r9 are tail (bs others), h0/h1 dense: cand is the smaller tail
    for terms in (["r5", "r9", "h0"], ["h0", "r5", "h1", "r9"],
                  ["r3", "h2", "r7"]):
        q = SearchQuery(terms, n_results=10)
        assert_same(oracle.search(q), engine.search(q), f"mixed {terms}")
    assert any(a[4] > 0 for a in called), \
        f"some group must carry n_bs > 0 slots: {called}"


def test_semidense_tail_cand_head_others(corpus, monkeypatch):
    """Tail candidate + all-dense others routes through the semi-dense
    kernel and stays bit-exact."""
    import wiser_tpu.engine.kernels as K

    _, oracle, engine = corpus
    called = []
    name = ("make_semidense_kernel_tc" if engine.columns == "tc"
            else "make_semidense_kernel")
    orig = getattr(K, name)

    def spy(*a, **kw):
        called.append(a)
        return orig(*a, **kw)

    monkeypatch.setattr(K, name, spy)
    # r5 is a tail term (df << dense_min); h0/h1 are dense
    for terms in (["r5", "h0"], ["h0", "r5", "h1"], ["r3", "h2", "h0"]):
        q = SearchQuery(terms, n_results=10)
        assert_same(oracle.search(q), engine.search(q), f"semi {terms}")
    assert called, "tail-cand x dense-others must route semi-dense"

"""Windowed block-intersection kernel: parity + overflow fallback.

The fast multi-term path (kernels.windowed_search_body) only engages for
long, similarly-sized lists; these corpora are shaped to force it, and to
force the skew-overflow fallback to the binary-search kernel.
"""

import numpy as np
import pytest

from wiser_tpu.data.synth import make_docinfo
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module")
def dense_corpus():
    # small vocab -> every list is long -> windowed path for AND queries
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(10)]
    docs = []
    for _ in range(3000):
        n = rng.integers(3, 12)
        docs.append(make_docinfo(list(rng.choice(vocab, size=n)), with_blooms=False))
    return build_index(docs)


def assert_same(oracle_res, tpu_res, msg=""):
    o = [(e.doc_id, e.doc_score) for e in oracle_res.entries]
    t = [(e.doc_id, e.doc_score) for e in tpu_res.entries]
    assert o == t, f"{msg}\noracle={o}\ntpu={t}"


class TestWindowedParity:
    def test_windowed_path_engages(self, dense_corpus):
        packed, _ = dense_corpus
        engine = TpuEngine(packed)
        # both lists long and similar -> windowed key has L2 != 0
        from wiser_tpu.engine.device import _PlannedQuery

        pq = _PlannedQuery(0, [packed.lookup("w0"), packed.lookup("w1")],
                           SearchQuery(["w0", "w1"]))
        pq.plan_slots(packed.df)
        T, L, L2, _iters = engine._flat_key(pq)
        assert L2 != 0, "expected the windowed strategy for long similar lists"

    def test_and_parity_on_long_lists(self, dense_corpus):
        packed, oracle = dense_corpus
        engine = TpuEngine(packed)
        for terms in (["w0", "w1"], ["w2", "w3", "w4"], ["w0", "w5", "w1", "w9"]):
            q = SearchQuery(terms, n_results=10)
            assert_same(oracle.search(q), engine.search(q), f"AND {terms}")

    def test_single_term_still_exact(self, dense_corpus):
        packed, oracle = dense_corpus
        engine = TpuEngine(packed)
        q = SearchQuery(["w3"], n_results=10)
        assert_same(oracle.search(q), engine.search(q))


class TestOverflowFallback:
    def test_skewed_distribution_falls_back_exactly(self):
        # term 'b' dense in docs 0..1999; term 'a' spread every 16 docs:
        # b's 16 blocks all overlap a's first candidate block -> window
        # overflow -> binary-search fallback must produce exact results.
        docs = []
        for i in range(40000):
            toks = [f"f{i}"]
            if i % 16 == 0:
                toks.append("a")
            if i < 2000:
                toks.append("b")
            docs.append(make_docinfo(toks, with_blooms=False))
        packed, oracle = build_index(docs)
        engine = TpuEngine(packed)
        q = SearchQuery(["a", "b"], n_results=10)
        assert_same(oracle.search(q), engine.search(q), "skewed AND")
        q2 = SearchQuery(["b", "a"], n_results=10)
        assert_same(oracle.search(q2), engine.search(q2), "skewed AND rev")

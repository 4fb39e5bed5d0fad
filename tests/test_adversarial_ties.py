"""Adversarial M-boundary fuzz (VERDICT r1 item 9): corpora engineered so
the candidate buffer's boundary lands inside tie classes and near-tie
bands, at several margins, in both column modes and both parity modes.

The guard decomposition (ARCHITECTURE.md "Precision strategy") claims:
full buffer + (near-tie f64 gap | truncated f32 boundary class) =>
flagged. These tests stress exactly that surface: with margin ~0 the
buffer is always full and the boundary always sits in a tie class, so
any hole in the decomposition becomes a visible parity break.
"""

import numpy as np
import pytest

from wiser_tpu.data.synth import make_docinfo
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.engine.topk import truncation_suspects
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


def _tie_heavy_corpus(seed=0):
    """Massive exact-tie classes + near-tie bands: many docs share (tf,
    length code) exactly (equal f64 scores), others sit one lossy length
    code apart (distinct f64, close f32)."""
    rng = np.random.default_rng(seed)
    docs = []
    # giant tie class: identical docs, well over any candidate buffer
    for _ in range(150):
        docs.append(make_docinfo("a b c".split()))
    # near-tie bands: same tfs, lengths straddling CHAR4 code boundaries
    for i in range(150):
        filler = ["f"] * int(rng.integers(5, 9))  # len 8..12 -> codes vary
        docs.append(make_docinfo(["a", "b"] + filler))
    # distinct tail so idfs aren't degenerate
    for i in range(60):
        docs.append(make_docinfo(["a", f"u{i % 17}", f"v{i % 5}"]))
    return build_index(docs)


@pytest.fixture(scope="module")
def corpus():
    return _tie_heavy_corpus()


def assert_same(oracle_res, res, msg=""):
    o = [(e.doc_id, e.doc_score) for e in oracle_res.entries]
    t = [(e.doc_id, e.doc_score) for e in res.entries]
    assert o == t, f"{msg}\noracle={o[:5]}\nengine={t[:5]}"


@pytest.mark.parametrize("margin", [0, 1, 3, 16])
@pytest.mark.parametrize("columns", ["raw", "tc"])
def test_margin_stress_bit_parity(corpus, margin, columns):
    packed, oracle = corpus
    eng = TpuEngine(packed, margin=margin, columns=columns,
                    single_term_depth=0, dense_budget_bytes=0)
    rng = np.random.default_rng(margin * 7 + 1)
    queries = []
    for k in (1, 3, 10, 40):
        queries.append(SearchQuery(["a"], n_results=k))
        queries.append(SearchQuery(["a", "b"], n_results=k))
        queries.append(SearchQuery(["b", "a", "c"], n_results=k))
        queries.append(SearchQuery(["a", "f"], n_results=k))
    for _ in range(20):
        nt = int(rng.integers(1, 4))
        terms = list(rng.choice(packed.terms, nt, replace=False))
        k = int(rng.integers(1, 30))
        queries.append(SearchQuery([str(t) for t in terms], n_results=k))
    res = eng.search_batch(queries)
    for q, r in zip(queries, res):
        assert_same(oracle.search(q), r,
                    f"margin={margin} cols={columns} {q.terms} k={q.n_results}")


@pytest.mark.parametrize("columns", ["raw", "tc"])
def test_strict_parity_margin_zero(corpus, columns):
    """strict_parity closes even the theoretical f32-collision hole: with
    margin 0 every boundary sits inside a tie class, so most queries must
    route to the exact host path — and results stay bit-exact."""
    packed, oracle = corpus
    eng = TpuEngine(packed, margin=0, columns=columns, strict_parity=True,
                    single_term_depth=0, dense_budget_bytes=0)
    for terms in (["a"], ["a", "b"], ["a", "b", "c"], ["a", "f"]):
        for k in (1, 5, 20):
            q = SearchQuery(terms, n_results=k)
            assert_same(oracle.search(q), eng.search(q),
                        f"strict {terms} k={k}")


class TestDecompositionUnits:
    """Constructed score arrays exercising the exact hole boundaries of
    the two-check decomposition."""

    def test_f32_collision_across_boundary_is_flagged(self):
        # two f64-DISTINCT scores that collide in f32, split by the buffer
        hi = np.float64(1.0)
        lo = np.float64(1.0) - np.float64(2.0) ** -30  # same f32 value
        assert np.float32(hi) == np.float32(lo)
        score_f = np.array([[hi, hi, lo]])  # kept buffer M=3, k=2
        flagged = truncation_suspects(score_f, np.array([3]), np.array([2]))
        assert flagged[0], "a collision-width gap at the boundary must flag"

    def test_gap_outside_bound_not_flagged(self):
        score_f = np.array([[1.0, 0.999, 0.9]])  # 10% gap at the boundary
        assert not truncation_suspects(score_f, np.array([3]),
                                       np.array([2]))[0]

    def test_tc_rel_eps_covers_reconstruction_error(self):
        # the tc-mode reconstruction error bound (~4.8e-6 at T=8) must be
        # inside the widened rel_eps — a gap at exactly the bound flags
        hi = 1.0
        lo = 1.0 - 4.8e-6
        score_f = np.array([[hi, hi, lo]])
        assert truncation_suspects(score_f, np.array([3]), np.array([2]),
                                   rel_eps=1e-5)[0]
        # ... and would NOT be caught by the raw-mode eps (the reason tc
        # mode widens it)
        assert not truncation_suspects(score_f, np.array([3]),
                                       np.array([2]), rel_eps=1e-6)[0]

"""two_level_top_m: the exact two-level top-M lane selection that
replaces flat lax.top_k in every candidate/dense kernel (kernels.py).

The helper only engages past NBLK >= M+1 (8,320+ lanes at the default
M=64) — NONE of the small-corpus suites reach it, so this file forces
the branch both at the array level (adversarial tie surfaces vs the
flat selection, which on the CPU backend tie-breaks by lowest index —
the canonical order both selections must reproduce when the boundary
class fits) and at the engine level (oracle bit-parity on a corpus big
enough that the dense, single-term L=32768, and pruned CL=10k paths
all take the two-level branch)."""

import numpy as np
import pytest

import wiser_tpu.engine.kernels as K
from wiser_tpu.data.synth import make_docinfo
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402


def flat_vs_two_level(score, M):
    got_s, got_l = K.two_level_top_m(jnp.asarray(score), M)
    want_s, want_l = jax.lax.top_k(jnp.asarray(score), M)
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(want_l))


def test_two_level_random_with_ties():
    rng = np.random.default_rng(3)
    B, NBLK, M = 4, 96, 64  # NBLK >= M+1: two-level branch engaged
    # quantized scores -> dense tie classes everywhere, incl. boundary
    score = rng.integers(0, 40, size=(B, NBLK * 128)).astype(np.float32)
    score[0, :5000] = K.NEG_INF  # sparse-match rows
    score[1] = 7.0  # one giant tie class across every block
    flat_vs_two_level(score, M)


def test_two_level_single_hot_block():
    # all mass in one block: M lanes must come from it + ties elsewhere
    B, NBLK, M = 2, 70, 64
    score = np.zeros((B, NBLK * 128), dtype=np.float32)
    score[:, 128 * 33 : 128 * 34] = np.arange(128, dtype=np.float32) + 1
    score[:, 0] = 1.0  # ties block 33's lowest lane from block 0
    flat_vs_two_level(score, M)


def test_two_level_fallback_small():
    B, NBLK, M = 2, 16, 64  # NBLK < M+1 -> flat fallback
    rng = np.random.default_rng(4)
    flat_vs_two_level(
        rng.random((B, NBLK * 128)).astype(np.float32), M)


@pytest.fixture(scope="module")
def big_corpus():
    """12k docs: N_pad/128 ~ 94 blocks >= M+1=65 -> the dense kernel,
    single-term L=32768 bucket, and a forced pruned C=80 scan all take
    the two-level branch."""
    rng = np.random.default_rng(17)
    docs = []
    for i in range(12000):
        toks = []
        if rng.random() < 0.85:
            toks.append("h0")
        if rng.random() < 0.75:
            toks.append("h1")
        if rng.random() < 0.6:
            toks.append("h2")
        toks += [f"m{rng.integers(12)}" for _ in range(2)]
        toks += [f"r{rng.integers(400)}" for _ in range(rng.integers(2, 7))]
        rng.shuffle(toks)
        docs.append(make_docinfo(toks, with_blooms=False))
    return build_index(docs)


@pytest.mark.parametrize("columns", ["raw", "tc"])
def test_engine_parity_two_level(big_corpus, columns):
    packed, oracle = big_corpus
    engine = TpuEngine(packed, columns=columns)
    assert engine._n_pad_docs // 128 >= 65, "corpus too small for branch"
    # force the pruned-dense route with CL = 80*128 lanes (>= 65 blocks)
    engine.PRUNED_DENSE_MIN_NB = 8
    engine.PRUNED_DENSE_C = 80
    queries = [
        SearchQuery(["h0"], n_results=10),           # L=32768 single
        SearchQuery(["h0", "h1"], n_results=10),     # pruned dense pair
        SearchQuery(["h0", "h1", "h2"], n_results=10),
        SearchQuery(["m3", "h0"], n_results=10),     # semidense mix
        SearchQuery(["r7", "h1"], n_results=10),
        SearchQuery(["h1"], n_results=10),
        SearchQuery(["h0", "h2"], n_results=13),
    ]
    res = engine.search_batch(queries)
    for q, r in zip(queries, res):
        want = oracle.search(q)
        w = [(e.doc_id, e.doc_score) for e in want.entries]
        h = [(e.doc_id, e.doc_score) for e in r.entries]
        assert w == h, f"{q.terms}: {w[:3]} vs {h[:3]}"

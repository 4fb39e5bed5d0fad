"""_dense_gather: the element-flat dense-plane gathers (slot * N_pad +
doc, int32) switch to a 2D advanced-index gather (per-dim int32
indices, no flat product) once the (H, N_pad) plane passes 2^31
elements. Before this, device._build_dense_rows hard-capped the
dense tier at (2^31-1)/N_pad rows — ~213 at 10M padded docs — which
forced every head pair at reference scale to the host path (measured:
10M config 2 at 231 QPS with dense 0.0004 of terms).

No test-sized corpus can allocate a real >2 GiB plane, so the threshold
is a module knob (K._FLAT_IDX_INT32_MAX) lowered here to force the 2D
branch on a small corpus; parity vs the oracle AND vs the flat branch
must be bit-exact (same elements, different gather lowering).
"""

import numpy as np
import pytest

import wiser_tpu.engine.kernels as K
from wiser_tpu.data.synth import make_docinfo
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(23)
    docs = []
    for i in range(9000):
        toks = []
        if rng.random() < 0.8:
            toks.append("h0")
        if rng.random() < 0.7:
            toks.append("h1")
        if rng.random() < 0.55:
            toks.append("h2")
        toks += [f"m{rng.integers(10)}" for _ in range(2)]
        toks += [f"r{rng.integers(300)}" for _ in range(rng.integers(2, 6))]
        rng.shuffle(toks)
        docs.append(make_docinfo(toks, with_blooms=True))
    return build_index(docs, with_blooms=True)


QUERIES = [
    SearchQuery(["h0", "h1"], n_results=10),        # dense pair
    SearchQuery(["h0", "h1", "h2"], n_results=10),  # dense triple
    SearchQuery(["m3", "h0"], n_results=10),        # semidense mix
    SearchQuery(["r7", "h1", "m2"], n_results=10),  # semidense + bs other
    SearchQuery(["h0", "h2"], n_results=13),
    SearchQuery(["h0", "h1"], n_results=10, is_phrase=True),  # mega phrase
    SearchQuery(["m2", "h1"], n_results=10, is_phrase=True),
]


@pytest.mark.parametrize("columns", ["raw", "tc"])
def test_wide_plane_parity(corpus, columns, monkeypatch):
    packed, oracle = corpus
    engine = TpuEngine(packed, columns=columns)
    plane = (engine._dense_H, engine._n_pad_docs)
    assert engine._dense_H >= 3, "need head terms in the dense tier"
    # force the int64 branch for THIS engine's plane
    monkeypatch.setattr(K, "_FLAT_IDX_INT32_MAX", plane[0] * plane[1])
    res = engine.search_batch(list(QUERIES))
    for q, r in zip(QUERIES, res):
        want = oracle.search(q)
        w = [(e.doc_id, e.doc_score) for e in want.entries]
        h = [(e.doc_id, e.doc_score) for e in r.entries]
        assert w == h, f"{q.terms} phrase={q.is_phrase}: {w[:3]} vs {h[:3]}"


def test_gather_branch_equivalence():
    jnp = pytest.importorskip("jax.numpy")
    rng = np.random.default_rng(5)
    plane = jnp.asarray(rng.integers(0, 255, size=(6, 256)).astype(np.uint8))
    slots = jnp.asarray(np.array([[1], [5], [0]], dtype=np.int32))
    docs = jnp.asarray(rng.integers(0, 256, size=(3, 17)).astype(np.int32))
    flat = np.asarray(K._dense_gather(plane, slots, docs))
    old = K._FLAT_IDX_INT32_MAX
    try:
        K._FLAT_IDX_INT32_MAX = 6 * 256  # force the 2D-gather branch
        wide = np.asarray(K._dense_gather(plane, slots, docs))
    finally:
        K._FLAT_IDX_INT32_MAX = old
    np.testing.assert_array_equal(flat, wide)

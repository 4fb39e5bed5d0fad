"""host_exact_search's bi-bloom phrase pre-gate must be EXACT (ADVICE
r4): the gate may only drop candidates that position verification would
reject anyway. A bloom-build false negative would corrupt the device
path and its host fallback identically, so this check runs the gate-off
path (WISER_HOST_BLOOM_GATE escape hatch) as the independent referee."""

import numpy as np

import wiser_tpu.engine.device as dev
from wiser_tpu.data.synth import synth_docinfos
from wiser_tpu.index.builder import build_index


def _phrase_pairs(packed, rng, n):
    live = [t for t in packed.terms if packed.df[packed.lookup(t)] > 0]
    pairs = []
    for _ in range(n):
        ts = list(dict.fromkeys(rng.choice(live, size=2).tolist()))
        if len(ts) == 2:
            pairs.append(ts)
    return pairs


def test_gate_on_equals_gate_off_full_depth():
    docs = synth_docinfos(n_docs=800, vocab_size=100, mean_len=50, seed=5)
    packed, oracle = build_index(docs, with_blooms=True)
    assert packed.bloom_ends is not None
    from wiser_tpu.scoring import Bm25Similarity

    cache64 = Bm25Similarity(packed.avg_len).cache
    rng = np.random.default_rng(13)
    old = dev.HOST_BLOOM_GATE
    n_matches = 0
    try:
        for terms in _phrase_pairs(packed, rng, 60):
            rows = [packed.lookup(t) for t in terms]
            # k = n_docs: FULL result set, so equality covers every
            # candidate the gate touched, not just a top-k prefix
            dev.HOST_BLOOM_GATE = True
            d_on, s_on = dev.host_exact_search(
                packed, cache64, rows, k=packed.n_docs, is_phrase=True)
            dev.HOST_BLOOM_GATE = False
            d_off, s_off = dev.host_exact_search(
                packed, cache64, rows, k=packed.n_docs, is_phrase=True)
            np.testing.assert_array_equal(d_on, d_off, err_msg=str(terms))
            np.testing.assert_array_equal(s_on, s_off, err_msg=str(terms))
            n_matches += d_on.size
    finally:
        dev.HOST_BLOOM_GATE = old
    assert n_matches > 0, "probe needs at least one real phrase match"

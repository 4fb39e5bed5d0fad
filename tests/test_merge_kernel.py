"""Pallas staircase merge kernel — interpret-mode correctness vs a
numpy reference over the real packed layout."""

import numpy as np
import pytest

from wiser_tpu.data.synth import synth_docinfos
from wiser_tpu.index.builder import build_index
from wiser_tpu.index.format import SENTINEL_DOC
from wiser_tpu.ops.merge import make_merge_intersect
from wiser_tpu.scoring import Bm25Similarity


@pytest.fixture(scope="module")
def setup():
    import jax.numpy as jnp

    packed, _ = build_index(synth_docinfos(600, 40, 40, seed=13))
    scores = packed.partial_scores(
        Bm25Similarity(packed.avg_len).cache).astype(np.float32)
    # pad like the engine: a full L-bucket of sentinel slack, 128-aligned
    pad = 4096
    doc = np.pad(packed.postings_doc, (0, pad), constant_values=SENTINEL_DOC)
    sc = np.pad(scores, (0, pad))
    tf = np.pad(packed.postings_tf, (0, pad)).astype(np.int32)
    rows = (jnp.asarray(doc.astype(np.int32)).reshape(-1, 128),
            jnp.asarray(sc).reshape(-1, 128),
            jnp.asarray(tf).reshape(-1, 128))
    return packed, doc, sc, tf, rows


def reference_merge(packed, doc, sc, tf, cand_row, other_row, L):
    cs, cdf = int(packed.term_starts[cand_row]), int(packed.df[cand_row])
    os_, odf = int(packed.term_starts[other_row]), int(packed.df[other_row])
    cdocs = doc[cs : cs + L]
    out_sc = np.zeros(L, dtype=np.float32)
    out_tf = np.zeros(L, dtype=np.int32)
    other = doc[os_ : os_ + odf]
    for i, d in enumerate(cdocs[:cdf]):
        j = np.searchsorted(other, d)
        if j < odf and other[j] == d:
            out_sc[i] = sc[os_ + j]
            out_tf[i] = tf[os_ + j]
    return out_sc, out_tf


@pytest.mark.parametrize("L", [512, 1024])
def test_interpret_matches_reference(setup, L):
    import jax.numpy as jnp

    packed, doc, sc, tf, rows = setup
    fn = make_merge_intersect(L, interpret=True)
    rng = np.random.default_rng(0)
    # pick pairs whose candidate fits in L
    cands = [r for r in range(packed.n_terms) if packed.df[r] <= L]
    pairs = [(int(rng.choice(cands)), int(rng.integers(0, packed.n_terms)))
             for _ in range(6)]
    meta = np.array(
        [[packed.term_starts[a], packed.df[a],
          packed.term_starts[b], packed.df[b]] for a, b in pairs],
        dtype=np.int32)
    got_sc, got_tf = fn(jnp.asarray(meta), *rows)
    got_sc, got_tf = np.asarray(got_sc), np.asarray(got_tf)
    for i, (a, b) in enumerate(pairs):
        # contract: lanes < df are exact; lanes beyond the candidate's
        # real df are unspecified (the engine masks them with cvalid)
        cdf = int(packed.df[a])
        want_sc, want_tf = reference_merge(packed, doc, sc, tf, a, b, L)
        np.testing.assert_array_equal(got_tf[i, :cdf], want_tf[:cdf],
                                      err_msg=f"pair {a},{b}")
        np.testing.assert_array_equal(got_sc[i, :cdf], want_sc[:cdf],
                                      err_msg=f"pair {a},{b}")


def test_same_list_self_merge(setup):
    import jax.numpy as jnp

    packed, doc, sc, tf, rows = setup
    L = 1024
    fn = make_merge_intersect(L, interpret=True)
    r = next(i for i in range(packed.n_terms) if packed.df[i] <= L)
    meta = np.array([[packed.term_starts[r], packed.df[r],
                      packed.term_starts[r], packed.df[r]]], dtype=np.int32)
    got_sc, got_tf = fn(jnp.asarray(meta), *rows)
    df = int(packed.df[r])
    s = int(packed.term_starts[r])
    np.testing.assert_array_equal(np.asarray(got_tf)[0, :df], tf[s : s + df])

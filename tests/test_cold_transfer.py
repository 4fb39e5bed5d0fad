"""Packed cold-tier transport (ops/unpack on the serving path).

StagedEngine(cold_transfer="packed") ships staged doc ids as width-16
delta blocks decoded ON DEVICE (ops/unpack.py — packed_value.h:87-274's
LittleIntPacker finally serving), with wide-gap runs in a raw trailing
segment; columns="tc" engines additionally ship the cold flat scratch as
uint16 tc instead of (score f32, tf i32). Results must be bit-identical
to the raw transport and the oracle in every combination, including runs
that exceed the pack width (forced here by shrinking PACK_WIDTH — toy
corpora have no 65536-doc gaps).
"""

import numpy as np
import pytest

import wiser_tpu.engine.staged as S
from wiser_tpu.data.synth import synth_docinfos
from wiser_tpu.index.builder import build_index
from wiser_tpu.types import SearchQuery


def assert_same(oracle_res, res, msg=""):
    o = [(e.doc_id, e.doc_score) for e in oracle_res.entries]
    t = [(e.doc_id, e.doc_score) for e in res.entries]
    assert o == t, f"{msg}\noracle={o}\nstaged={t}"


@pytest.fixture(scope="module")
def corpus():
    docs = synth_docinfos(n_docs=500, vocab_size=120, mean_len=35, seed=33)
    packed, oracle = build_index(docs, with_blooms=True)
    return packed, oracle


def queries(packed, n=60, seed=4):
    rng = np.random.default_rng(seed)
    qs = []
    terms = packed.terms
    for _ in range(n):
        t = int(rng.integers(1, 4))
        rows = rng.integers(0, len(terms), size=t)
        qs.append(SearchQuery([terms[r] for r in rows],
                              n_results=int(rng.integers(1, 12))))
    # a few phrases (cold phrase scratch stays raw)
    for _ in range(8):
        a, b = rng.integers(0, len(terms), size=2)
        qs.append(SearchQuery([terms[a], terms[b]], n_results=5,
                              is_phrase=True))
    return qs


@pytest.mark.parametrize("columns", ["raw", "tc"])
def test_packed_transport_parity(corpus, columns):
    packed, oracle = corpus
    budget = packed.n_postings * 12 // 4  # ~25% hot: real cold traffic
    eng = S.StagedEngine(packed, budget, columns=columns,
                         cold_transfer="packed")
    assert eng.hot_fraction < 1.0
    for q, r in zip(queries(packed), eng.search_batch(queries(packed))):
        assert_same(oracle.search(q), r, f"{columns} {q.terms}")


@pytest.mark.parametrize("columns", ["raw", "tc"])
def test_wide_runs_take_raw_segment(corpus, columns, monkeypatch):
    """PACK_WIDTH=4: most runs exceed the width and ship raw — parity
    must hold across the mixed packed/raw scratch layout."""
    packed, oracle = corpus
    monkeypatch.setattr(S, "PACK_WIDTH", 4)
    eng = S.StagedEngine(packed, packed.n_postings * 12 // 4,
                         columns=columns, cold_transfer="packed")
    n_wide = int((~eng._pack16).sum())
    assert n_wide > 0, "test corpus must have width>4 runs"
    assert eng._pack16.any(), "and some width<=4 runs"
    for q, r in zip(queries(packed), eng.search_batch(queries(packed))):
        assert_same(oracle.search(q), r, f"w4 {columns} {q.terms}")


def test_all_cold_packed(corpus):
    packed, oracle = corpus
    eng = S.StagedEngine(packed, 0, columns="tc", cold_transfer="packed")
    assert eng.hot_fraction == 0.0
    for q, r in zip(queries(packed), eng.search_batch(queries(packed))):
        assert_same(oracle.search(q), r, f"all-cold {q.terms}")


def test_raw_transfer_still_works(corpus):
    packed, oracle = corpus
    eng = S.StagedEngine(packed, packed.n_postings * 12 // 4,
                         cold_transfer="raw")
    for q, r in zip(queries(packed), eng.search_batch(queries(packed))):
        assert_same(oracle.search(q), r, f"raw-transfer {q.terms}")

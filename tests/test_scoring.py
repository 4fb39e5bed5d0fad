"""BM25 golden tests — the [scoring] analog (reference tests_7.cc checks
parity with the Elasticsearch formulas; SURVEY.md §4)."""

import math

import numpy as np

from wiser_tpu.codecs import char4_to_uint, uint_to_char4
from wiser_tpu.scoring import (
    Bm25Similarity,
    RunningAvgLength,
    calc_doc_score_lossy,
    calc_doc_scores_lossy_batch,
    calc_es_idf,
    calc_es_tfnorm,
)


def test_idf_formula():
    # golden: log(1 + (N - df + 0.5)/(df + 0.5))
    assert math.isclose(calc_es_idf(100, 1), math.log(1 + (100 - 1 + 0.5) / 1.5), rel_tol=0)
    assert math.isclose(calc_es_idf(3, 3), math.log(1 + 0.5 / 3.5), rel_tol=0)
    # df == N gives small positive idf; df=0 would be the missing-term case
    assert calc_es_idf(10, 10) > 0


def test_tfnorm_formula():
    # golden: (f*(k1+1)) / (f + k1*(1-b + b*len/avg))
    f, fl, avg = 3, 10, 12.5
    expected = (3 * 2.2) / (3 + 1.2 * (1 - 0.75 + (0.75 * 10) / 12.5))
    assert calc_es_tfnorm(f, fl, avg) == expected


def test_lossy_cache_matches_direct():
    sim = Bm25Similarity(avg_field_length=57.3)
    for length in [0, 1, 5, 8, 100, 1000, 123456]:
        code = uint_to_char4(length)
        decoded = char4_to_uint(code)
        direct = calc_es_tfnorm(4, decoded, 57.3)
        lossy = sim.tf_norm_lossy(4, code)
        assert float(lossy) == float(direct)


def test_doc_score_order_and_value():
    sim = Bm25Similarity(avg_field_length=20.0)
    idfs = [calc_es_idf(1000, 10), calc_es_idf(1000, 500)]
    tfs = [3, 7]
    code = uint_to_char4(25)
    s = calc_doc_score_lossy(tfs, idfs, code, sim)
    cache_val = sim.cache[code]
    expect = np.float64(0.0)
    for tf, idf in zip(tfs, idfs):
        expect += np.float64(idf) * ((tf * 2.2) / (tf + cache_val))
    assert s == float(expect)


def test_batch_scores_match_scalar():
    sim = Bm25Similarity(avg_field_length=33.0)
    rng = np.random.default_rng(1)
    n_docs, n_terms = 50, 3
    tfs = rng.integers(1, 40, size=(n_docs, n_terms))
    codes = rng.integers(0, 256, size=n_docs)
    idfs = np.array([calc_es_idf(500, d) for d in [5, 50, 499]])
    batch = calc_doc_scores_lossy_batch(tfs, idfs, codes, sim)
    for i in range(n_docs):
        assert batch[i] == calc_doc_score_lossy(tfs[i], idfs, codes[i], sim)


def test_running_avg_matches_cpp_recurrence():
    # avg = avg + (len - avg)/(n+1), float64 (doc_length_store.h:105-110)
    lengths = [10, 20, 37, 5, 1000, 3]
    avg = np.float64(0.0)
    for i, l in enumerate(lengths):
        avg = avg + (np.float64(l) - avg) / np.float64(i + 1)
    assert RunningAvgLength.of(lengths) == float(avg)
    # and it is NOT generally equal to the naive mean (path dependence)
    assert abs(RunningAvgLength.of(lengths) - float(np.mean(lengths))) < 1e-9

"""Elasticsearch-compatible BM25, bit-matching the reference's double math.

reference: scoring.h —
  idf     = log(1 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5))   (:21-25)
  tfnorm  = (freq*(k1+1)) / (freq + k1*(1 - b + b*field_len/avg_len))  (:28-40)
  k1=1.2, b=0.75                                                       (:94-95)
  lossy path: cache[code] = k1*(1 - b + b*Char4ToUint(code)/avg_len)   (:85-90)
  doc score = sum over query terms (in order) of idf*tfnorm, in double
  (CalcDocScoreLossy, scoring.h:124-145)

The host oracle uses float64 throughout (C++ `double`). The device engine
uses a float32 copy of the 256-entry cache and idfs for candidate selection
only; the exact f64 re-rank happens on host (see engine/topk.py).
"""

from __future__ import annotations

import numpy as np

from wiser_tpu.codecs import CHAR4_DECODE_TABLE

K1 = 1.2
B = 0.75


def calc_es_idf(doc_count: int, doc_freq) -> np.ndarray | float:
    """idf in float64; accepts scalars or arrays of doc_freq."""
    df = np.asarray(doc_freq, dtype=np.float64)
    n = np.float64(doc_count)
    return np.log(1.0 + (n - df + 0.5) / (df + 0.5))


def calc_es_tfnorm(freq, field_length, avg_field_length) -> np.ndarray | float:
    """Non-lossy tfnorm in float64 (reference: calc_es_tfnorm, scoring.h:28-40).

    Operation order matches the C++ expression exactly:
    (freq*(k1+1)) / (freq + k1*(1 - b + ((b*field_length)/avg_len)))
    """
    f = np.asarray(freq, dtype=np.float64)
    fl = np.asarray(field_length, dtype=np.float64)
    return (f * (K1 + 1)) / (f + K1 * (1 - B + ((B * fl) / np.float64(avg_field_length))))


class Bm25Similarity:
    """reference: Bm25Similarity (scoring.h:43-137).

    Holds the 256-entry cache keyed by the lossy 1-byte length code:
      cache[c] = k1 * (1 - b + b * Char4ToUint(c) / avg_len)
    computed in float64 with the C++ operation order
    (k1_ * (1 - b_ + b_ * field_length / avg_field_length_)).
    """

    def __init__(self, avg_field_length: float = 1.0):
        self.reset(avg_field_length)

    def reset(self, avg_field_length: float) -> None:
        self.avg_field_length = float(avg_field_length)
        lengths = CHAR4_DECODE_TABLE.astype(np.float64)
        # C++ evaluation order: ((b_ * field_length) / avg) — int*double
        # promotes to double; identical to float64 here.
        self.cache = K1 * (1.0 - B + B * lengths / np.float64(self.avg_field_length))

    def tf_norm_lossy(self, freq, length_code) -> np.ndarray | float:
        """reference: TfNormLossy (scoring.h:65-69). length_code is the raw
        1-byte code (0..255)."""
        f = np.asarray(freq, dtype=np.float64)
        c = np.asarray(length_code, dtype=np.int64) & 0xFF
        return (f * (K1 + 1)) / (f + self.cache[c])

    def tf_norm(self, freq, field_length) -> np.ndarray | float:
        return calc_es_tfnorm(freq, field_length, self.avg_field_length)

    @staticmethod
    def idf(doc_count: int, doc_freq) -> np.ndarray | float:
        return calc_es_idf(doc_count, doc_freq)


def calc_doc_score_lossy(
    tfs,  # (n_terms,) term freqs of this doc, query-term order
    idfs,  # (n_terms,) float64 idfs, query-term order
    length_code: int,
    similarity: Bm25Similarity,
) -> float:
    """reference: CalcDocScoreLossy (scoring.h:124-145) — sum of idf*tfnorm
    in query-term order, float64 accumulation."""
    score = np.float64(0.0)
    cache_val = similarity.cache[int(length_code) & 0xFF]
    for tf, idf in zip(np.asarray(tfs, dtype=np.float64), np.asarray(idfs, dtype=np.float64)):
        tfnorm = (tf * (K1 + 1)) / (tf + cache_val)
        score = score + idf * tfnorm
    return float(score)


def calc_doc_scores_lossy_batch(
    tfs: np.ndarray,  # (n_docs, n_terms) float64-able
    idfs: np.ndarray,  # (n_terms,)
    length_codes: np.ndarray,  # (n_docs,)
    similarity: Bm25Similarity,
) -> np.ndarray:
    """Vectorized exact f64 scoring for many docs of one query.

    Summation runs term-by-term (axis order = query order) so the float64
    accumulation order matches the reference's per-doc loop exactly.
    """
    tfs = np.asarray(tfs, dtype=np.float64)
    codes = np.asarray(length_codes, dtype=np.int64) & 0xFF
    cache_vals = similarity.cache[codes]  # (n_docs,)
    score = np.zeros(tfs.shape[0], dtype=np.float64)
    for t in range(tfs.shape[1]):
        f = tfs[:, t]
        tfnorm = (f * (K1 + 1)) / (f + cache_vals)
        score = score + np.float64(idfs[t]) * tfnorm
    return score


class RunningAvgLength:
    """Running mean of doc lengths in insertion order, float64 —
    reference: DocLengthCharStore::AddLength (doc_length_store.h:105-110):
    avg = avg + (len - avg) / (n + 1)."""

    def __init__(self):
        self.avg = np.float64(0.0)
        self.n = 0

    def add(self, length: int) -> None:
        self.avg = self.avg + (np.float64(length) - self.avg) / np.float64(self.n + 1)
        self.n += 1

    @staticmethod
    def of(lengths) -> float:
        r = RunningAvgLength()
        for x in lengths:
            r.add(int(x))
        return float(r.avg)

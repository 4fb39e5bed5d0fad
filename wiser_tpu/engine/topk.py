"""Exact top-k finalization: host f64 re-rank of device candidates.

The device ranks with float32 for speed and returns the top-M candidate
docs (M = k + margin) with their per-term tfs. This module recomputes the
exact float64 BM25 score with the reference's operation order
(CalcDocScoreLossy, scoring.h:124-145) and produces the final
(score desc, doc_id asc) top-k — bit-identical to the oracle whenever the
f32 candidate set covers the true top-k, which the margin guarantees in
practice and the parity tests enforce.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from wiser_tpu.scoring import K1


def rescore_topk(
    top_docs: np.ndarray,  # (M,) int32, -1 = invalid
    top_tfs: np.ndarray,  # (T, M) int32 (slot-major, query-term order)
    n_real_terms: int,
    idf64: np.ndarray,  # (n_real_terms,) float64
    doc_len_code: np.ndarray,  # (N,) uint8
    cache64: np.ndarray,  # (256,) float64 tfnorm cache
    k: int,
) -> List[Tuple[float, int]]:
    """Returns [(score, doc_id)] of length <= k, final order."""
    valid = top_docs >= 0
    docs = top_docs[valid].astype(np.int64)
    if docs.size == 0:
        return []
    tfs = top_tfs[:n_real_terms, valid].astype(np.float64)  # (T, m)
    cache_val = cache64[doc_len_code[docs] & 0xFF]  # (m,)
    score = np.zeros(docs.size, dtype=np.float64)
    for t in range(n_real_terms):
        f = tfs[t]
        score = score + np.float64(idf64[t]) * ((f * (K1 + 1)) / (f + cache_val))
    order = np.lexsort((docs, -score))[:k]
    return [(float(score[i]), int(docs[i])) for i in order]

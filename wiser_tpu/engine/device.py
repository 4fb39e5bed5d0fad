"""TpuEngine — the HBM-resident search engine (the VacuumEngine analog).

Loads a PackedIndex into device memory and executes batches of queries as
single XLA programs (see engine/kernels.py for the execution model). The
host side does what hosts are good at: term dictionary lookup, shape
bucketing, batch assembly, exact f64 re-ranking, snippets.

Query dispatch mirrors ProcessQueryDelta (query_processing.h:956-979):
  1 term            -> single-term scan kernel (T=1 path)
  N terms, no phrase -> k-way intersection kernel
  N>=2 terms, phrase -> match kernel (+ bi-bloom gate) -> position verify
                        -> score kernel
Bucketing replaces the reference's per-query adaptivity: queries are
grouped by (padded term count, candidate-list length bucket) so each group
is one fixed-shape compiled program; kernels are compile-cached across
batches (the analog of the reference paying index-load cost once,
vacuum_engine.h:144-166).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from wiser_tpu.engine import kernels as K
from wiser_tpu.engine.topk import rescore_topk
from wiser_tpu.index.format import PackedIndex
from wiser_tpu.scoring import Bm25Similarity
from wiser_tpu.types import SearchQuery, SearchResult, SearchResultEntry

L_BUCKETS = [128, 512, 2048, 8192, 32768, 131072, 524288, 2097152]
B_BUCKETS = [1, 4, 16, 64, 256, 1024, 4096]
T_BUCKETS = [1, 2, 4, 8]
PP_BUCKETS = [8, 32, 128, 512, 2048, 8192]
DEFAULT_MARGIN = 40


def _bucket(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


@dataclass
class _PlannedQuery:
    qi: int  # index into the input batch
    rows: List[int]  # term dictionary rows, query order
    query: SearchQuery


class TpuEngine:
    def __init__(
        self,
        packed: PackedIndex,
        doc_bodies: Optional[List[str]] = None,
        bloom_enable_factor: Optional[int] = 1,
        margin: int = DEFAULT_MARGIN,
    ):
        if packed.n_postings >= 2**31 or len(packed.positions) >= 2**31:
            raise ValueError("index too large for int32 device addressing")
        self.packed = packed
        self.doc_bodies = doc_bodies
        self.bloom_enable_factor = bloom_enable_factor
        self.margin = margin

        self.similarity = Bm25Similarity(packed.avg_len)
        self.cache64 = self.similarity.cache  # (256,) f64

        # device-resident columns
        self.d_postings_doc = jnp.asarray(packed.postings_doc, dtype=jnp.int32)
        self.d_postings_tf = jnp.asarray(packed.postings_tf, dtype=jnp.int32)
        self.d_doc_len_code = jnp.asarray(packed.doc_len_code, dtype=jnp.int32)
        self.d_cache_f32 = jnp.asarray(self.cache64, dtype=jnp.float32)
        self.d_pos_starts = jnp.asarray(packed.pos_starts, dtype=jnp.int32)
        self.d_positions = jnp.asarray(packed.positions, dtype=jnp.int32)
        if packed.bloom_ends is not None:
            self.d_bloom_ends = jnp.asarray(packed.bloom_ends)
            self.d_bloom_begins = jnp.asarray(packed.bloom_begins)
        else:
            w = packed.bloom_cfg.n_words
            self.d_bloom_ends = jnp.zeros((1, w), dtype=jnp.uint32)
            self.d_bloom_begins = jnp.zeros((1, w), dtype=jnp.uint32)

        self._max_df = int(packed.df.max(initial=1))
        self._starts32 = packed.term_starts.astype(np.int32)

    # ------------------------------------------------------------------

    def search(self, query: SearchQuery) -> SearchResult:
        return self.search_batch([query])[0]

    def search_batch(self, queries: List[SearchQuery]) -> List[SearchResult]:
        results = [SearchResult() for _ in queries]

        flat: List[_PlannedQuery] = []
        phrase: List[_PlannedQuery] = []
        for qi, q in enumerate(queries):
            if q.n_results <= 0 or not q.terms:
                continue
            rows = [self.packed.lookup(t) for t in q.terms]
            if any(r < 0 for r in rows):
                continue  # missing term -> empty result
            pq = _PlannedQuery(qi, rows, q)
            # dispatch per ProcessQueryDelta: single term is never a phrase
            if q.is_phrase and len(rows) >= 2:
                phrase.append(pq)
            else:
                flat.append(pq)

        self._run_flat(flat, results)
        self._run_phrase(phrase, results)
        return results

    # -- non-phrase (single + AND) -------------------------------------

    def _group_key_flat(self, pq: _PlannedQuery) -> Tuple[int, int]:
        T = _bucket(len(pq.rows), T_BUCKETS)
        cand_df = min(int(self.packed.df[r]) for r in pq.rows)
        L = _bucket(cand_df, L_BUCKETS)
        return T, L

    def _run_flat(self, planned: List[_PlannedQuery], results: List[SearchResult]):
        groups: Dict[Tuple[int, int], List[_PlannedQuery]] = {}
        for pq in planned:
            groups.setdefault(self._group_key_flat(pq), []).append(pq)

        for (T, L), group in groups.items():
            starts, ends, idf32, cand_slot, n_real = self._assemble(group, T)
            B = starts.shape[0]
            max_k = max(pq.query.n_results for pq in group)
            M = min(L, max_k + self.margin)
            kern = K.make_search_kernel(T, L, M, K.n_iters_for(self._max_df))
            top_docs, top_score, top_tfs, top_pidx = kern(
                self.d_postings_doc, self.d_postings_tf, self.d_doc_len_code,
                self.d_cache_f32,
                jnp.asarray(starts), jnp.asarray(ends), jnp.asarray(idf32),
                jnp.asarray(cand_slot),
            )
            self._finalize(group, np.asarray(top_docs), np.asarray(top_tfs),
                           n_real, results, phrase_pidx=np.asarray(top_pidx))

    def _assemble(self, group: List[_PlannedQuery], T: int):
        """Build (starts, ends, idf32, cand_slot) with candidate-slot
        padding for missing term slots, B padded to a bucket."""
        B = _bucket(len(group), B_BUCKETS)
        starts = np.zeros((B, T), dtype=np.int32)
        ends = np.zeros((B, T), dtype=np.int32)
        idf32 = np.zeros((B, T), dtype=np.float32)
        cand_slot = np.zeros(B, dtype=np.int32)
        n_real = np.zeros(B, dtype=np.int32)
        for i, pq in enumerate(group):
            rows = pq.rows
            dfs = [int(self.packed.df[r]) for r in rows]
            cslot = int(np.argmin(dfs))
            cand_slot[i] = cslot
            n_real[i] = len(rows)
            for t in range(T):
                r = rows[t] if t < len(rows) else rows[cslot]
                starts[i, t] = self._starts32[r]
                ends[i, t] = self._starts32[r + 1]
                idf32[i, t] = (
                    np.float32(self.packed.idf64[r]) if t < len(rows) else 0.0
                )
        return starts, ends, idf32, cand_slot, n_real

    def _finalize(self, group, top_docs, top_tfs, n_real, results,
                  phrase_pidx=None, phrase_tables=None):
        for i, pq in enumerate(group):
            idf64 = self.packed.idf64[pq.rows]
            ranked = rescore_topk(
                top_docs[i], top_tfs[i], len(pq.rows), idf64,
                self.packed.doc_len_code, self.cache64, pq.query.n_results,
            )
            res = results[pq.qi]
            for score, doc in ranked:
                snippet = ""
                if pq.query.return_snippets:
                    snippet = self._snippet(pq, doc)
                res.entries.append(SearchResultEntry(doc, score, snippet))

    # -- phrase --------------------------------------------------------

    def _run_phrase(self, planned: List[_PlannedQuery], results: List[SearchResult]):
        groups: Dict[Tuple[int, int, int], List[_PlannedQuery]] = {}
        for pq in planned:
            T = len(pq.rows)  # exact T; phrase kernels aren't slot-padded
            cand_df = min(int(self.packed.df[r]) for r in pq.rows)
            L = _bucket(cand_df, L_BUCKETS)
            PP = _bucket(int(self.packed.max_tf[pq.rows[0]]), PP_BUCKETS)
            groups.setdefault((T, L, PP), []).append(pq)

        for (T, L, PP), group in groups.items():
            starts, ends, idf32, cand_slot, n_real = self._assemble(group, T)
            B = starts.shape[0]
            probes = self._assemble_bloom_probes(group, T, B)

            match_kern = K.make_match_kernel(T, L, K.n_iters_for(self._max_df))
            match, bloom_pass, cdocs, pidx, tfs = match_kern(
                self.d_postings_doc, self.d_postings_tf,
                jnp.asarray(starts), jnp.asarray(ends), jnp.asarray(cand_slot),
                self.d_bloom_ends, self.d_bloom_begins, *probes,
            )

            active = match & bloom_pass
            n_pos_iters = K.n_iters_for(int(self.packed.max_tf.max(initial=1)))
            verify = K.make_phrase_verify_kernel(T, L, PP, n_pos_iters)
            n_matches = verify(self.d_positions, self.d_pos_starts, pidx, active)

            final = active & (n_matches > 0)
            max_k = max(pq.query.n_results for pq in group)
            M = min(L, max_k + self.margin)
            score_kern = K.make_score_lanes_kernel(T, L, M)
            top_docs, top_score, top_tfs, top_pidx = score_kern(
                self.d_doc_len_code, self.d_cache_f32, jnp.asarray(idf32),
                cdocs, tfs, pidx, final,
            )
            self._finalize(group, np.asarray(top_docs), np.asarray(top_tfs),
                           n_real, results, phrase_pidx=np.asarray(top_pidx))

    def _assemble_bloom_probes(self, group, T: int, B: int):
        cfg = self.packed.bloom_cfg
        C, H = max(1, T - 1), cfg.n_hashes
        probe_slot = np.zeros((B, C), dtype=np.int32)
        probe_begins = np.zeros((B, C), dtype=bool)
        probe_word = np.zeros((B, C, H), dtype=np.int32)
        probe_mask = np.zeros((B, C, H), dtype=np.uint32)
        probe_active = np.zeros((B, C), dtype=bool)

        factor = self.bloom_enable_factor
        have_blooms = self.packed.bloom_ends is not None
        if have_blooms and factor is not None:
            for i, pq in enumerate(group):
                terms, rows = pq.query.terms, pq.rows
                if len(rows) == 2:
                    # cost-aware side selection (query_processing.h:796-807)
                    s1, s2 = int(self.packed.df[rows[0]]), int(self.packed.df[rows[1]])
                    if factor * s1 <= s2:
                        w, m = cfg.probe_word_masks(terms[1])
                        probe_slot[i, 0], probe_begins[i, 0] = 0, False
                        probe_word[i, 0], probe_mask[i, 0] = w, m
                        probe_active[i, 0] = True
                    elif factor * s2 < s1:
                        w, m = cfg.probe_word_masks(terms[0])
                        probe_slot[i, 0], probe_begins[i, 0] = 1, True
                        probe_word[i, 0], probe_mask[i, 0] = w, m
                        probe_active[i, 0] = True
                else:
                    # chained HasNextTerm fallback (query_processing.h:784-794)
                    for c in range(len(rows) - 1):
                        w, m = cfg.probe_word_masks(terms[c + 1])
                        probe_slot[i, c], probe_begins[i, c] = c, False
                        probe_word[i, c], probe_mask[i, c] = w, m
                        probe_active[i, c] = True

        return (jnp.asarray(probe_slot), jnp.asarray(probe_begins),
                jnp.asarray(probe_word), jnp.asarray(probe_mask),
                jnp.asarray(probe_active))

    # -- snippets ------------------------------------------------------

    def _posting_index(self, row: int, doc: int) -> int:
        ts, te = int(self.packed.term_starts[row]), int(self.packed.term_starts[row + 1])
        j = int(np.searchsorted(self.packed.postings_doc[ts:te], doc))
        return ts + j

    def _snippet(self, pq: _PlannedQuery, doc: int) -> str:
        if self.doc_bodies is None:
            return ""
        from wiser_tpu.highlighter import SimpleHighlighter

        pk = self.packed
        offset_table = []
        pidxs = [self._posting_index(r, doc) for r in pq.rows]
        if pq.query.is_phrase and len(pq.rows) >= 2:
            # keep only offsets at phrase-match positions
            # (ResultDocEntry::FilterOffsetByPosition, query_processing.h:469-492)
            pos_lists = [
                pk.positions[pk.pos_starts[p] : pk.pos_starts[p + 1]] for p in pidxs
            ]
            base = set(int(x) for x in pos_lists[0])
            for t in range(1, len(pos_lists)):
                base &= set(int(x) - t for x in pos_lists[t])
            for t, p in enumerate(pidxs):
                pos_to_j = {int(x): j for j, x in enumerate(pos_lists[t])}
                s = int(pk.off_starts[p])
                pairs = []
                for m in sorted(base):
                    j = pos_to_j.get(m + t)
                    if j is not None and s + j < int(pk.off_starts[p + 1]):
                        pairs.append((int(pk.off_begin[s + j]), int(pk.off_end[s + j])))
                offset_table.append(pairs)
        else:
            for p in pidxs:
                s, e = int(pk.off_starts[p]), int(pk.off_starts[p + 1])
                offset_table.append(
                    list(zip(pk.off_begin[s:e].tolist(), pk.off_end[s:e].tolist()))
                )
        return SimpleHighlighter().highlight(
            offset_table, pq.query.n_snippet_passages, self.doc_bodies[doc]
        )

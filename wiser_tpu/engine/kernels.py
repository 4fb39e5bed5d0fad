"""Batched device search kernels (the L3 hot core, redesigned for TPU).

The reference processes one query at a time with pointer-chasing DAAT
iterators (ProcessQueryDelta, query_processing.h:956-979: zigzag +
SkipForward + min-heap). Here a whole batch of queries executes as one XLA
program over the global CSR posting columns:

  1. gather each query's *candidate* posting block — the postings of its
     least-frequent term (the zigzag always effectively walks the shortest
     list; here that choice is explicit),
  2. k-way intersect by vectorized binary search of the candidates into
     every other term's CSR slice (replaces SkipForward's skip-list hops;
     same O(log df) asymptotics, but 3 orders of magnitude wider),
  3. score all candidates with the f32 BM25 cache (lossy tfnorm,
     scoring.h:65-69) and mask non-intersecting lanes to -inf,
  4. `lax.top_k` over the masked scores (replaces the min-heap; top_k
     breaks ties by lowest index = lowest doc id, matching the heap's
     kept-set semantics, query_processing.h:897-945).

The exact float64 re-ranking of the returned top-M candidates happens on
host (engine/topk.py), which restores bit-identical BM25 ordering.

Padding conventions (static shapes):
- queries with fewer than T terms repeat the candidate slot with idf=0:
  the membership test trivially passes and the score contribution is 0.
- candidate lanes beyond the list length hold doc_id=INT32_MAX with
  score -inf.

Kernels are specialized (jit-cached) per (T, L, M, n_bs_iters) bucket.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = np.float32(-np.inf)
INT32_MAX = np.int32(2**31 - 1)
K1_PLUS_1 = np.float32(2.2)


def _gather1d(arr, idx):
    """arr[idx] with idx clipped into range (callers mask separately)."""
    return jnp.take(arr, jnp.clip(idx, 0, arr.shape[0] - 1), axis=0)


def _binary_search(postings_doc, targets, lo0, hi0, n_iters):
    """Vectorized lower-bound search.

    targets: (..., L) values to locate; lo0/hi0: (...,) or (..., L)
    int32 CSR bounds. Returns lower-bound indices (..., L): the first
    position in [lo0, hi0) whose value is >= target.
    """
    lo = jnp.broadcast_to(lo0, targets.shape).astype(jnp.int32)
    hi = jnp.broadcast_to(hi0, targets.shape).astype(jnp.int32)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) >> 1
        v = _gather1d(postings_doc, mid)
        less = v < targets
        return jnp.where(less, mid + 1, lo), jnp.where(less, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    return lo


@lru_cache(maxsize=128)
def make_search_kernel(T: int, L: int, M: int, n_bs_iters: int):
    """Build the jitted batched AND/single-term search kernel.

    Returns fn(postings_doc, postings_tf, doc_len_code_i32, cache_f32,
               starts, ends, idf32, cand_slot)
      -> (top_docs (B,M) i32, top_score (B,M) f32,
          top_tfs (B,T,M) i32, top_pidx (B,T,M) i32)
    top_pidx = global posting indices of the matched postings (feeds the
    phrase/bloom kernels and host-side offset lookup).
    """

    def kernel(postings_doc, postings_tf, doc_len_code, cache_f32,
               starts, ends, idf32, cand_slot):
        B = starts.shape[0]
        bidx = jnp.arange(B)

        cs = starts[bidx, cand_slot]  # (B,)
        ce = ends[bidx, cand_slot]
        lane = jnp.arange(L, dtype=jnp.int32)
        cidx = cs[:, None] + lane[None, :]  # (B, L)
        cvalid = cidx < ce[:, None]
        cdocs = jnp.where(cvalid, _gather1d(postings_doc, cidx), INT32_MAX)

        if T == 1:
            # single-term: the candidates are the postings; no search
            pidx = cidx[:, None, :]  # (B, 1, L)
            found = cvalid[:, None, :]
            tfs = jnp.where(found, _gather1d(postings_tf, cidx)[:, None, :], 0)
        else:
            targets = cdocs[:, None, :]  # (B, 1, L) broadcast over T
            lo = _binary_search(
                postings_doc,
                jnp.broadcast_to(targets, (B, T, L)),
                starts[:, :, None],
                ends[:, :, None],
                n_bs_iters,
            )  # (B, T, L)
            hit_doc = _gather1d(postings_doc, lo)
            found = (lo < ends[:, :, None]) & (hit_doc == targets)
            pidx = lo
            tfs = jnp.where(found, _gather1d(postings_tf, lo), 0)

        match = jnp.all(found, axis=1) & cvalid  # (B, L)

        code = _gather1d(doc_len_code, jnp.clip(cdocs, 0, doc_len_code.shape[0] - 1))
        cache_val = jnp.take(cache_f32, code, axis=0)  # (B, L) f32

        tf_f = tfs.astype(jnp.float32)
        tfn = (tf_f * K1_PLUS_1) / (tf_f + cache_val[:, None, :])  # (B, T, L)
        score = jnp.sum(idf32[:, :, None] * tfn, axis=1)  # (B, L)
        score = jnp.where(match, score, NEG_INF)

        top_score, top_l = jax.lax.top_k(score, M)  # ties -> lowest lane = lowest doc
        top_docs = jnp.take_along_axis(cdocs, top_l, axis=1)
        top_docs = jnp.where(top_score > NEG_INF, top_docs, -1)
        top_tfs = jnp.take_along_axis(tfs, top_l[:, None, :].repeat(T, 1), axis=2)
        top_pidx = jnp.take_along_axis(pidx, top_l[:, None, :].repeat(T, 1), axis=2)
        return top_docs, top_score, top_tfs, top_pidx

    return jax.jit(kernel)


@lru_cache(maxsize=64)
def make_match_kernel(T: int, L: int, n_bs_iters: int):
    """Intersection-only kernel (phase 1 of phrase execution, and the
    bloom pre-check site): returns per-lane match flags, posting indices,
    and bloom-gate pass flags.

    Bloom probes (the IsPossibleToPresent analog, query_processing.h:
    784-807): per query, up to T-1 chained probes; probe c tests filter
    row `bloom[fs_c's posting]` for precomputed word/mask pairs. The host
    encodes the cost-aware side choice into (probe_slot, probe_begins,
    probe_word, probe_mask, probe_active).
    """

    def kernel(postings_doc, postings_tf, starts, ends, cand_slot,
               bloom_ends, bloom_begins,
               probe_slot, probe_begins, probe_word, probe_mask, probe_active):
        # probe_slot: (B, C) which slot's filter; probe_begins: (B, C) bool;
        # probe_word/mask: (B, C, H); probe_active: (B, C) bool
        B = starts.shape[0]
        bidx = jnp.arange(B)
        cs = starts[bidx, cand_slot]
        ce = ends[bidx, cand_slot]
        lane = jnp.arange(L, dtype=jnp.int32)
        cidx = cs[:, None] + lane[None, :]
        cvalid = cidx < ce[:, None]
        cdocs = jnp.where(cvalid, _gather1d(postings_doc, cidx), INT32_MAX)

        targets = jnp.broadcast_to(cdocs[:, None, :], (B, T, L))
        lo = _binary_search(postings_doc, targets, starts[:, :, None],
                            ends[:, :, None], n_bs_iters)
        hit = _gather1d(postings_doc, lo)
        found = (lo < ends[:, :, None]) & (hit == targets)
        match = jnp.all(found, axis=1) & cvalid  # (B, L)
        tfs = jnp.where(found, _gather1d(postings_tf, lo), 0)

        # --- bloom gate -------------------------------------------------
        C = probe_slot.shape[1]
        # posting index of the probed slot, per (b, c, l)
        slot_pidx = jnp.take_along_axis(lo, probe_slot[:, :, None], axis=1)  # (B,C,L)
        W = bloom_ends.shape[1]
        rows_e = _gather1d(bloom_ends, slot_pidx.reshape(B, -1)).reshape(B, C, L, W)
        rows_b = _gather1d(bloom_begins, slot_pidx.reshape(B, -1)).reshape(B, C, L, W)
        rows = jnp.where(probe_begins[:, :, None, None], rows_b, rows_e)
        # gather probed words: (B, C, L, H)
        H = probe_word.shape[2]
        pw = jnp.take_along_axis(
            rows, jnp.broadcast_to(probe_word[:, :, None, :], (B, C, L, H)), axis=3
        )
        bit_ok = (pw & probe_mask[:, :, None, :]) == probe_mask[:, :, None, :]
        probe_pass = jnp.all(bit_ok, axis=3)  # (B, C, L)
        probe_pass = probe_pass | ~probe_active[:, :, None]
        bloom_pass = jnp.all(probe_pass, axis=1)  # (B, L)

        return match, bloom_pass, cdocs, lo, tfs

    return jax.jit(kernel)


@lru_cache(maxsize=64)
def make_phrase_verify_kernel(T: int, L: int, PP: int, n_pos_iters: int):
    """Phrase position verification over matched lanes.

    The adjusted-position rule (PhraseQueryProcessor2,
    query_processing.h:266-362): a phrase occurs at base position x iff
    term i appears at x + i for all i. Base positions come from slot 0's
    posting bag; membership of x+i in slot i's bag is a vectorized binary
    search over the global positions column (second-level CSR, the
    "posting bag" of flash_iterators.h:558-664).

    fn(positions, pos_starts_i32, pidx (B,T,L), active (B,L)) ->
      n_matches (B, L) int32
    """

    def kernel(positions, pos_starts, pidx, active):
        B = pidx.shape[0]
        ps = _gather1d(pos_starts, pidx.reshape(B, -1)).reshape(B, T, L)
        pe = _gather1d(pos_starts, pidx.reshape(B, -1) + 1).reshape(B, T, L)

        lane = jnp.arange(PP, dtype=jnp.int32)
        base_idx = ps[:, 0, :, None] + lane[None, None, :]  # (B, L, PP)
        base_valid = base_idx < pe[:, 0, :, None]
        base_pos = jnp.where(base_valid, _gather1d(positions, base_idx), INT32_MAX - T)

        ok = base_valid
        for t in range(1, T):
            tgt = base_pos + t
            lo = _binary_search(
                positions, tgt, ps[:, t, :, None], pe[:, t, :, None], n_pos_iters
            )
            hit = _gather1d(positions, lo)
            ok = ok & (lo < pe[:, t, :, None]) & (hit == tgt)

        n_matches = jnp.sum(ok & active[:, :, None], axis=2).astype(jnp.int32)
        return n_matches

    return jax.jit(kernel)


@lru_cache(maxsize=64)
def make_score_lanes_kernel(T: int, L: int, M: int):
    """Score + top-k over precomputed (match, tfs, cdocs) lanes — phase 2
    of phrase execution after position verification."""

    def kernel(doc_len_code, cache_f32, idf32, cdocs, tfs, pidx, match):
        code = _gather1d(doc_len_code, jnp.clip(cdocs, 0, doc_len_code.shape[0] - 1))
        cache_val = jnp.take(cache_f32, code, axis=0)
        tf_f = tfs.astype(jnp.float32)
        tfn = (tf_f * K1_PLUS_1) / (tf_f + cache_val[:, None, :])
        score = jnp.sum(idf32[:, :, None] * tfn, axis=1)
        score = jnp.where(match, score, NEG_INF)
        top_score, top_l = jax.lax.top_k(score, M)
        top_docs = jnp.take_along_axis(cdocs, top_l, axis=1)
        top_docs = jnp.where(top_score > NEG_INF, top_docs, -1)
        top_tfs = jnp.take_along_axis(tfs, top_l[:, None, :].repeat(T, 1), axis=2)
        top_pidx = jnp.take_along_axis(pidx, top_l[:, None, :].repeat(T, 1), axis=2)
        return top_docs, top_score, top_tfs, top_pidx

    return jax.jit(kernel)


def n_iters_for(max_len: int) -> int:
    """Binary-search iteration count covering lists up to max_len."""
    return max(1, int(np.ceil(np.log2(max(2, int(max_len) + 1)))))

"""Document-partitioned sharded engine over a jax.sharding.Mesh.

The reference's entire distributed story is a gRPC client/server pair with
a single server owning the whole index (SURVEY.md §2, grpc_server_impl.h);
there is no index sharding. This module adds the TPU-native scaling axis
(BASELINE.json config 5): postings are partitioned by contiguous document
ranges across mesh devices, every device runs the same batched search step
on its local shard under shard_map, and per-shard top-k results are merged
with an all-gather + re-top-k — the collective rides ICI instead of a
network hop.

Correctness notes:
- df/idf/avg_len/doc length codes are global statistics, replicated.
- doc ranges are contiguous and ascending with shard id, so the merge's
  tie-break (lowest concatenated index on equal f32 scores) still resolves
  to the lowest doc id; the host f64 re-rank finalizes ordering exactly as
  in the single-device engine.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from wiser_tpu.engine import kernels as K
from wiser_tpu.engine.device import (
    B_BUCKETS,
    L_BUCKETS,
    T_BUCKETS,
    _bucket,
    DEFAULT_MARGIN,
)
from wiser_tpu.index.format import PackedIndex
from wiser_tpu.scoring import Bm25Similarity
from wiser_tpu.types import SearchQuery, SearchResult


@dataclass
class ShardedIndex:
    """Per-shard CSR posting columns stacked on a leading shard axis."""

    n_shards: int
    doc_bounds: np.ndarray  # int64[D+1] contiguous doc ranges
    postings_doc: np.ndarray  # int32[D, P_pad] global doc ids, pad SENTINEL
    postings_tf: np.ndarray  # int32[D, P_pad]
    postings_score: np.ndarray  # f32[D, P_pad] partial scores (global stats)
    term_starts: np.ndarray  # int32[D, T+1] 128-aligned per-shard CSR
    df_shard: np.ndarray  # int32[D, T] real per-shard posting counts
    pos_starts: np.ndarray  # int32[D, P_pad+1] per-shard position bags
    positions: np.ndarray  # int32[D, PP_pad]
    # global (replicated) metadata
    terms: List[str]
    df: np.ndarray
    idf64: np.ndarray
    n_docs: int
    avg_len: float
    doc_len_code: np.ndarray  # uint8[N]
    max_tf: np.ndarray = None  # int32[T] global (phrase PP bucketing)
    # host-only reference to the source index: exact-fallback re-searches
    # and snippet offsets (never uploaded to devices)
    source: Optional[PackedIndex] = None

    @classmethod
    def from_packed(cls, packed: PackedIndex, n_shards: int) -> "ShardedIndex":
        from wiser_tpu.index.format import BLOCK, SENTINEL_DOC

        N, T = packed.n_docs, packed.n_terms
        bounds = np.linspace(0, N, n_shards + 1).astype(np.int64)
        scores = packed.partial_scores(
            Bm25Similarity(packed.avg_len).cache
        ).astype(np.float32)
        lens = np.diff(packed.term_starts)
        term_of = np.repeat(np.arange(T, dtype=np.int64), lens)
        real = packed.postings_doc != SENTINEL_DOC
        shard_of = np.full(packed.n_postings, -1, dtype=np.int64)
        if n_shards > 1:
            shard_of[real] = np.searchsorted(
                bounds[1:-1], packed.postings_doc[real], side="right")
        else:
            shard_of[real] = 0

        per = []
        for s in range(n_shards):
            sel = shard_of == s
            cnt = np.bincount(term_of[sel], minlength=T).astype(np.int64)
            padded = (cnt + BLOCK - 1) // BLOCK * BLOCK
            ts = np.zeros(T + 1, dtype=np.int64)
            np.cumsum(padded, out=ts[1:])
            per.append((sel, cnt, ts))

        lmax = _bucket(int(packed.df.max(initial=1)), L_BUCKETS)
        p_pad = max(int(ts[-1]) for _, _, ts in per) + lmax
        p_pad = (p_pad + BLOCK - 1) // BLOCK * BLOCK
        D = n_shards
        out_doc = np.full((D, p_pad), SENTINEL_DOC, dtype=np.int32)
        out_tf = np.zeros((D, p_pad), dtype=np.int32)
        out_sc = np.zeros((D, p_pad), dtype=np.float32)
        df_shard = np.zeros((D, T), dtype=np.int32)
        pos_counts_global = np.diff(packed.pos_starts)
        shard_positions = []
        shard_pos_counts = []
        for s, (sel, cnt, ts) in enumerate(per):
            t_sel = term_of[sel]
            # rank of each selected posting within its term run
            csum = np.zeros(T + 1, dtype=np.int64)
            np.cumsum(cnt, out=csum[1:])
            rank = np.arange(t_sel.size) - csum[t_sel]
            dest = ts[t_sel] + rank
            out_doc[s, dest] = packed.postings_doc[sel]
            out_tf[s, dest] = packed.postings_tf[sel]
            out_sc[s, dest] = scores[sel]
            df_shard[s] = cnt
            # ragged gather of each selected posting's position bag
            sel_idx = np.nonzero(sel)[0]
            cnts = pos_counts_global[sel_idx]
            csum2 = np.zeros(len(cnts) + 1, dtype=np.int64)
            np.cumsum(cnts, out=csum2[1:])
            total = int(csum2[-1])
            src = (np.repeat(packed.pos_starts[sel_idx], cnts)
                   + np.arange(total) - np.repeat(csum2[:-1], cnts))
            shard_positions.append(packed.positions[src])
            counts_padded = np.zeros(p_pad, dtype=np.int64)
            counts_padded[dest] = cnts
            shard_pos_counts.append(counts_padded)
        pp_pad = max(1, max(len(x) for x in shard_positions))
        out_pos = np.zeros((D, pp_pad), dtype=np.int32)
        out_ps = np.zeros((D, p_pad + 1), dtype=np.int32)
        for s in range(D):
            out_pos[s, : len(shard_positions[s])] = shard_positions[s]
            out_ps[s, 1:] = np.cumsum(shard_pos_counts[s]).astype(np.int32)
        return cls(
            n_shards=D,
            doc_bounds=bounds,
            postings_doc=out_doc,
            postings_tf=out_tf,
            postings_score=out_sc,
            term_starts=np.stack([ts for _, _, ts in per]).astype(np.int32),
            df_shard=df_shard,
            pos_starts=out_ps,
            positions=out_pos,
            max_tf=packed.max_tf.copy(),
            terms=packed.terms,
            df=packed.df.copy(),
            idf64=packed.idf64.copy(),
            n_docs=N,
            avg_len=packed.avg_len,
            doc_len_code=packed.doc_len_code.copy(),
            source=packed,
        )


@lru_cache(maxsize=64)
def make_sharded_kernel(T: int, L: int, M: int, n_bs_iters: int, mesh: Mesh):
    """Sharded search step: local search_body per shard, all-gather + merge.

    fn(pd (D,Pp), psc (D,Pp), pt (D,Pp), ts (D,T+1), rows (B,T) slot-
       ordered, use_score (B,T)) -> (docs (B,M), score (B,M),
       tfs (B,T,M) slot-ordered) replicated.
    """

    def local(pd, psc, pt, ts, dfs, rows, use_score):
        pd, psc, pt, ts, dfs = pd[0], psc[0], pt[0], ts[0], dfs[0]
        starts = ts[rows]
        ends = starts + dfs[rows]
        td, tsc, ttf, _, ltrunc = K.search_body(
            pd, psc, pt, starts, ends, use_score,
            T=T, L=L, M=M, n_bs_iters=n_bs_iters,
        )
        g_d = jax.lax.all_gather(td, "d")  # (D, B, M)
        g_s = jax.lax.all_gather(tsc, "d")
        g_t = jax.lax.all_gather(ttf, "d")  # (D, B, T, M)
        g_f = jax.lax.all_gather(ltrunc, "d")  # (D, B)
        D = g_d.shape[0]
        B = td.shape[0]
        gd = jnp.transpose(g_d, (1, 0, 2)).reshape(B, D * M)
        gs = jnp.transpose(g_s, (1, 0, 2)).reshape(B, D * M)
        gt = jnp.transpose(g_t, (1, 2, 0, 3)).reshape(B, T, D * M)
        s2, i2 = jax.lax.top_k(gs, M)
        d2 = jnp.take_along_axis(gd, i2, axis=1)
        t2 = jnp.take_along_axis(gt, i2[:, None, :].repeat(T, 1), axis=2)
        # guard: a shard's local buffer truncating its f32 boundary class,
        # or the merge stage truncating across the gathered D*M candidates
        trunc = (jnp.any(g_f, axis=0)
                 | K.boundary_truncated(gs, s2, M))
        return d2, s2, t2, trunc

    step = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("d"), P("d"), P("d"), P("d"), P("d"), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(step)


@lru_cache(maxsize=64)
def make_sharded_phrase_kernel(T: int, L: int, PP: int, M: int,
                               n_bs_iters: int, n_pos_iters: int, mesh: Mesh):
    """Sharded phrase step: full local phrase pipeline per shard
    (kernels.phrase_body; positional verification is doc-local so each
    shard is independent), then all-gather + score merge."""

    def local(pd, psc, pt, ts, dfs, pos, pstarts, rows, use_score, slot_of):
        pd, psc, pt, ts, dfs = pd[0], psc[0], pt[0], ts[0], dfs[0]
        pos, pstarts = pos[0], pstarts[0]
        starts = ts[rows]
        ends = starts + dfs[rows]
        packed, tsc = K.phrase_body(
            pd, psc, pt, pos, pstarts, starts, ends, use_score, slot_of,
            T=T, L=L, PP=PP, M=M,
            n_bs_iters=n_bs_iters, n_pos_iters=n_pos_iters)
        body, lflag = packed[:, : T + 1, :], packed[:, T + 1, 0]
        g_p = jax.lax.all_gather(body, "d")  # (D, B, T+1, M)
        g_s = jax.lax.all_gather(tsc, "d")  # (D, B, M)
        g_f = jax.lax.all_gather(lflag, "d")  # (D, B)
        D = g_p.shape[0]
        B = body.shape[0]
        gp = jnp.transpose(g_p, (1, 2, 0, 3)).reshape(B, T + 1, D * M)
        gs = jnp.transpose(g_s, (1, 0, 2)).reshape(B, D * M)
        s2, i2 = jax.lax.top_k(gs, M)
        merged = jnp.take_along_axis(gp, i2[:, None, :].repeat(T + 1, 1), axis=2)
        trunc = ((jnp.sum(g_f, axis=0) > 0)
                 | K.boundary_truncated(gs, s2, M))
        flag_row = jnp.broadcast_to(
            trunc.astype(jnp.int32)[:, None, None], (B, 1, M))
        return jnp.concatenate([merged, flag_row], axis=1)

    step = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("d"), P("d"), P("d"), P("d"), P("d"), P("d"), P("d"),
                  P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(step)


def host_exact_search_sharded(sh: ShardedIndex, cache64: np.ndarray,
                              rows, k: int, is_phrase: bool = False):
    """Exact host re-search over the sharded host columns (the fallback
    when no source PackedIndex is retained). Shards hold contiguous
    ascending doc ranges, so per-shard results concatenate in doc order
    and the final lexsort reproduces the oracle tie canon."""
    from wiser_tpu.scoring import K1

    docs_parts, tf_parts = [], []
    for s in range(sh.n_shards):
        dfs = [int(sh.df_shard[s, r]) for r in rows]
        if min(dfs) == 0:
            continue
        cand = int(np.argmin(dfs))
        cs = int(sh.term_starts[s, rows[cand]])
        docs = sh.postings_doc[s, cs : cs + dfs[cand]].astype(np.int64)
        mask = np.ones(len(docs), dtype=bool)
        tfs = np.zeros((len(rows), len(docs)), dtype=np.int64)
        pidx = np.zeros((len(rows), len(docs)), dtype=np.int64)
        for t, r in enumerate(rows):
            st, n = int(sh.term_starts[s, r]), dfs[t]
            arr = sh.postings_doc[s, st : st + n]
            idx = np.searchsorted(arr, docs)
            idc = np.minimum(idx, n - 1)
            found = (idx < n) & (arr[idc] == docs)
            mask &= found
            tfs[t] = sh.postings_tf[s, st + idc]
            pidx[t] = st + idc
        if is_phrase and len(rows) >= 2:
            from wiser_tpu.engine.device import _host_phrase_mask

            mask &= _host_phrase_mask(sh.positions[s], sh.pos_starts[s],
                                      docs, pidx, mask, len(rows))
        docs_parts.append(docs[mask])
        tf_parts.append(tfs[:, mask])
    if not docs_parts:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64)
    docs_m = np.concatenate(docs_parts)
    tfs_m = np.concatenate(tf_parts, axis=1).astype(np.float64)
    if docs_m.size == 0:
        return docs_m, np.zeros(0, dtype=np.float64)
    cache_val = cache64[sh.doc_len_code[docs_m] & 0xFF]
    score = np.zeros(docs_m.size, dtype=np.float64)
    for t, r in enumerate(rows):
        idf = np.float64(sh.idf64[r])
        f = tfs_m[t]
        score = score + idf * ((f * (K1 + 1)) / (f + cache_val))
    order = np.lexsort((docs_m, -score))[:k]
    return docs_m[order], score[order]


class ShardedEngine:
    """Search over a ShardedIndex on a device mesh: single-term, AND, and
    phrase queries (phrase runs the full local pipeline per shard —
    positional verification is doc-local — then merges; the bi-bloom gate
    is skipped on the sharded path, which never changes results).

    Bit-parity hardening mirrors TpuEngine: the f32 tie-class truncation
    guard flags suspect queries for an exact host re-search; queries whose
    per-shard candidate run exceeds the largest L bucket route to host;
    snippets resolve offsets through the retained source index."""

    def __init__(
        self,
        sharded: ShardedIndex,
        mesh: Optional[Mesh] = None,
        margin: int = DEFAULT_MARGIN,
        doc_bodies: Optional[List[str]] = None,
        strict_parity: bool = False,
    ):
        if mesh is None:
            devs = np.array(jax.devices()[: sharded.n_shards])
            mesh = Mesh(devs, ("d",))
        if mesh.devices.size != sharded.n_shards:
            raise ValueError(
                f"mesh has {mesh.devices.size} devices, index has "
                f"{sharded.n_shards} shards"
            )
        self.mesh = mesh
        self.sharded = sharded
        self.margin = margin
        self.similarity = Bm25Similarity(sharded.avg_len)
        self.cache64 = self.similarity.cache
        self.term_to_row = {t: i for i, t in enumerate(sharded.terms)}

        shard_spec = NamedSharding(mesh, P("d"))
        self.d_postings_doc = jax.device_put(sharded.postings_doc, shard_spec)
        self.d_postings_score = jax.device_put(sharded.postings_score, shard_spec)
        self.d_postings_tf = jax.device_put(sharded.postings_tf, shard_spec)
        self.d_term_starts = jax.device_put(sharded.term_starts, shard_spec)
        self.d_df_shard = jax.device_put(sharded.df_shard, shard_spec)
        self.d_positions = jax.device_put(sharded.positions, shard_spec)
        self.d_pos_starts = jax.device_put(sharded.pos_starts, shard_spec)
        self._max_df = int(sharded.df.max(initial=1))
        self._max_tf = int(sharded.max_tf.max(initial=1)) \
            if sharded.max_tf is not None else 1
        self.doc_bodies = doc_bodies
        self.strict_parity = strict_parity
        # per-shard max df per term: the tight L bucket + saturation check
        self._df_shard_max = sharded.df_shard.max(axis=0).astype(np.int64)

    def lookup(self, term: str) -> int:
        return self.term_to_row.get(term, -1)

    def search(self, query: SearchQuery) -> SearchResult:
        return self.search_batch([query])[0]

    # -- exact host fallback -------------------------------------------

    def _host_exact(self, rows, k: int, is_phrase: bool):
        if self.sharded.source is not None:
            from wiser_tpu.engine.device import host_exact_search

            return host_exact_search(self.sharded.source, self.cache64,
                                     rows, k, is_phrase=is_phrase)
        return host_exact_search_sharded(self.sharded, self.cache64,
                                         rows, k, is_phrase=is_phrase)

    def _fill_result(self, res: SearchResult, docs, scores, rows,
                     q: SearchQuery) -> None:
        res.set_arrays(docs, scores)
        if (q.return_snippets and self.doc_bodies is not None
                and self.sharded.source is not None):
            from wiser_tpu.engine.device import snippet_for

            for e in res.entries:
                e.snippet = snippet_for(self.sharded.source, self.doc_bodies,
                                        rows, q, e.doc_id)

    def _route_saturated(self, items, is_phrase: bool):
        """Queries whose per-shard candidate run exceeds the largest L
        bucket would silently scan only the first L postings: exact host
        path instead (mirrors TpuEngine._route_saturated)."""
        keep, over = [], []
        for item in items:
            _, rows, _ = item
            cand = rows[int(np.argmin([self.sharded.df[r] for r in rows]))]
            (over if int(self._df_shard_max[cand]) > L_BUCKETS[-1]
             else keep).append(item)
        if not over:
            return items, []

        def run_host(res_list, over=over, is_phrase=is_phrase):
            for qi, rows, q in over:
                d, s = self._host_exact(rows, q.n_results, is_phrase)
                self._fill_result(res_list[qi], d, s, rows, q)

        return keep, [run_host]

    def _run_phrase(self, phrase, results) -> list:
        if not phrase:
            return []
        from wiser_tpu.engine.device import PP_BUCKETS

        phrase, pending = self._route_saturated(phrase, is_phrase=True)
        repl = NamedSharding(self.mesh, P())
        groups: Dict[Tuple[int, int, int], list] = {}
        for qi, rows, q in phrase:
            T = len(rows)  # exact T (no slot padding for phrase)
            # slot 0 scans the global-min-df term; L covers its longest
            # per-shard run (not the global df — ~n_shards x tighter)
            cand = rows[int(np.argmin([self.sharded.df[r] for r in rows]))]
            L = _bucket(int(self._df_shard_max[cand]), L_BUCKETS)
            PP = _bucket(int(self.sharded.max_tf[rows[0]]), PP_BUCKETS)
            groups.setdefault((T, L, PP), []).append((qi, rows, q))

        for (T, L, PP), group in groups.items():
            B = _bucket(len(group), B_BUCKETS)
            rows_arr = np.zeros((B, T), dtype=np.int32)
            use_score = np.zeros((B, T), dtype=np.float32)
            idf64_q = np.zeros((B, T), dtype=np.float64)
            slot_of = np.zeros((B, T), dtype=np.int32)
            ks = np.zeros(B, dtype=np.int32)
            for i, (qi, rows, q) in enumerate(group):
                dfs = [int(self.sharded.df[r]) for r in rows]
                cand = int(np.argmin(dfs))
                order = [cand] + [t for t in range(len(rows)) if t != cand]
                ks[i] = q.n_results
                for slot, t in enumerate(order):
                    rows_arr[i, slot] = rows[t]
                    use_score[i, slot] = 1.0
                    slot_of[i, t] = slot
                for t, r in enumerate(rows):
                    idf64_q[i, t] = self.sharded.idf64[r]
            M = min(L, int(ks.max(initial=1)) + self.margin)
            kern = make_sharded_phrase_kernel(
                T, L, PP, M, K.n_iters_for(self._max_df),
                K.n_iters_for(self._max_tf), self.mesh)
            out = kern(
                self.d_postings_doc, self.d_postings_score,
                self.d_postings_tf, self.d_term_starts, self.d_df_shard,
                self.d_positions, self.d_pos_starts,
                jax.device_put(rows_arr, repl),
                jax.device_put(use_score, repl),
                jax.device_put(slot_of, repl),
            )

            def finalize(res_list, out=out, group=group, T=T,
                         slot_of=slot_of, idf64_q=idf64_q, ks=ks):
                merged = np.asarray(out)
                self._finalize_group(res_list, merged[:, 0, :],
                                     merged[:, 1 : T + 1, :], group,
                                     slot_of, idf64_q, ks, is_phrase=True,
                                     force_host=merged[:, T + 1, 0] != 0)

            pending.append(finalize)
        return pending

    def _finalize_group(self, results, docs, tfs_slot, group, slot_of,
                        idf64_q, ks, is_phrase: bool,
                        force_host=None) -> None:
        """Exact f64 re-rank + tie-class truncation guard + snippets —
        the sharded mirror of TpuEngine._finalize_arrays."""
        from wiser_tpu.engine.topk import (rescore_sorted_arrays,
                                           truncation_suspects)

        tf_q = np.take_along_axis(
            tfs_slot,
            np.broadcast_to(slot_of[:, :, None].astype(np.int64),
                            tfs_slot.shape), axis=1)
        docs_f, score_f, n_valid = rescore_sorted_arrays(
            docs, tf_q, idf64_q, self.sharded.doc_len_code, self.cache64)
        suspects = truncation_suspects(score_f, n_valid, ks)
        if force_host is not None and self.strict_parity:
            suspects = suspects | force_host[: len(suspects)]
        for i, (qi, rows, q) in enumerate(group):
            if suspects[i]:
                d, s = self._host_exact(rows, int(ks[i]), is_phrase)
                self._fill_result(results[qi], d, s, rows, q)
            else:
                cnt = min(int(ks[i]), int(n_valid[i]))
                self._fill_result(results[qi], docs_f[i, :cnt],
                                  score_f[i, :cnt], rows, q)

    def search_batch(self, queries: List[SearchQuery]) -> List[SearchResult]:
        results, pending = self.submit_batch(queries)
        for f in pending:
            f(results)
        return results

    def submit_batch(self, queries: List[SearchQuery]):
        """Dispatch every group before fetching any result (one roundtrip
        per group instead of a sync fetch after each dispatch) — the same
        pipelined contract as TpuEngine.submit_batch."""
        results = [SearchResult() for _ in queries]
        planned = []
        phrase = []
        for qi, q in enumerate(queries):
            if q.n_results <= 0 or not q.terms:
                continue
            rows = [self.lookup(t) for t in q.terms]
            if any(r < 0 for r in rows):
                continue
            if q.is_phrase and len(rows) >= 2:
                phrase.append((qi, rows, q))
            else:
                planned.append((qi, rows, q))

        pending = self._run_phrase(phrase, results)
        planned, host_pending = self._route_saturated(planned, is_phrase=False)
        pending += host_pending

        groups: Dict[Tuple[int, int], list] = {}
        for item in planned:
            _, rows, _ = item
            T = _bucket(len(rows), T_BUCKETS)
            cand = rows[int(np.argmin([self.sharded.df[r] for r in rows]))]
            Lb = _bucket(int(self._df_shard_max[cand]), L_BUCKETS)
            groups.setdefault((T, Lb), []).append(item)

        repl = NamedSharding(self.mesh, P())
        for (T, L), group in groups.items():
            B = _bucket(len(group), B_BUCKETS)
            rows_arr = np.zeros((B, T), dtype=np.int32)
            use_score = np.zeros((B, T), dtype=np.float32)
            idf64_q = np.zeros((B, T), dtype=np.float64)
            slot_of = np.zeros((B, T), dtype=np.int64)
            ks = np.zeros(B, dtype=np.int32)
            for i, (_, rows, q) in enumerate(group):
                dfs = [int(self.sharded.df[r]) for r in rows]
                cand = int(np.argmin(dfs))
                order = [cand] + [t for t in range(len(rows)) if t != cand]
                ks[i] = q.n_results
                for slot in range(T):
                    t = order[slot] if slot < len(order) else order[0]
                    rows_arr[i, slot] = rows[t]
                    if slot < len(order):
                        use_score[i, slot] = 1.0
                for slot, t in enumerate(order):
                    slot_of[i, t] = slot
                for t, r in enumerate(rows):
                    idf64_q[i, t] = self.sharded.idf64[r]
            max_k = max(q.n_results for _, _, q in group)
            M = min(L, max_k + self.margin)
            kern = make_sharded_kernel(T, L, M, K.n_iters_for(self._max_df), self.mesh)
            docs, score, tfs, trunc = kern(
                self.d_postings_doc, self.d_postings_score, self.d_postings_tf,
                self.d_term_starts, self.d_df_shard,
                jax.device_put(rows_arr, repl), jax.device_put(use_score, repl),
            )

            def finalize(res_list, docs=docs, tfs=tfs, trunc=trunc,
                         group=group, slot_of=slot_of, idf64_q=idf64_q,
                         ks=ks, T=T):
                self._finalize_group(res_list, np.asarray(docs),
                                     np.asarray(tfs), group, slot_of,
                                     idf64_q, ks, is_phrase=False,
                                     force_host=np.asarray(trunc))

            pending.append(finalize)
        return results, pending

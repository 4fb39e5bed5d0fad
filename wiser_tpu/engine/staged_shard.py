"""ShardedStagedEngine — bigger-than-HBM indexes on a multi-chip mesh.

The composition this framework exists for (VERDICT r1 item 10): the
reference serves bigger-than-RAM indexes from flash on ONE node
(vacuum_engine.h:144-166 "read as needed") and scales out only by whole
gRPC replicas; here both axes compose — postings are doc-partitioned
across a jax.sharding.Mesh (engine/shard.py) AND each shard keeps only a
df-hot tier resident, staging cold posting runs host->device per batch
(engine/staged.py):

- hot tier: `_hot_view` picks terms greedily by df under the per-mesh HBM
  budget; the view is re-sharded (ShardedIndex.from_packed) and served by
  an unmodified ShardedEngine — all-hot queries take exactly the resident
  mesh path, bit-parity guards included.
- cold queries: every involved term's per-shard padded run is copied into
  a (D, cap) scratch column triple, device_put with the same P("d")
  sharding, and the SAME shard_map search kernel
  (shard.make_sharded_kernel) runs against the scratch — the all-gather
  merge and the f64 re-rank + truncation-guard finalizer are shared with
  the resident path. Scratch widths are bucketed (SCRATCH_BUCKETS) to
  bound compile shapes.
- cold PHRASE queries take the exact host path (positions staging across
  the mesh is not worth a third kernel family for the rare cold-phrase
  tail; the result is bit-exact either way).

Global statistics (df/idf/avg_len/doc_len_code) stay global in the hot
view (engine/staged._hot_view keeps real df on zero-length cold runs), so
scores are identical across tiers by construction.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wiser_tpu.engine import kernels as K
from wiser_tpu.engine.device import (
    B_BUCKETS,
    B_CHUNK,
    L_BUCKETS,
    T_BUCKETS,
    _bucket,
)
from wiser_tpu.engine.shard import (
    ShardedEngine,
    ShardedIndex,
    make_sharded_kernel,
)
from wiser_tpu.engine.staged import SCRATCH_BUCKETS, _hot_view
from wiser_tpu.index.format import PackedIndex, SENTINEL_DOC
from wiser_tpu.types import SearchQuery, SearchResult


class ShardedStagedEngine:
    def __init__(
        self,
        packed: PackedIndex,
        n_shards: int,
        hbm_budget_bytes: int,
        mesh: Optional[Mesh] = None,
        doc_bodies: Optional[List[str]] = None,
        margin: int = 54,
        strict_parity: bool = False,
    ):
        self.packed = packed
        # budget = aggregate device bytes across the mesh; terms charged
        # their full resident footprint (see staged.per_term_device_cost)
        # AND the dense head-term tier charged its own proportional share
        # (ADVICE r4: the inner ShardedEngine's default 3.5 GB
        # dense_budget_bytes used to sit OUTSIDE the stated budget, the
        # same accounting artifact StagedEngine's share planner fixed).
        from wiser_tpu.engine.staged import per_term_device_cost
        from wiser_tpu.index.format import BLOCK

        cost = per_term_device_cost(packed)
        npd = ((packed.n_docs + n_shards * BLOCK - 1)
               // (n_shards * BLOCK) * BLOCK)
        n_pad = npd * n_shards
        # raw mesh dense row: f32 score plane + i32 tf plane + blockmax
        per_row = n_pad * 8 + (n_pad // BLOCK) * 4
        dense_min = max(ShardedEngine.DENSE_MIN_DF_FLOOR,
                        packed.n_docs // ShardedEngine.DENSE_MIN_DF_FRACTION)
        full_dense = int((packed.df >= dense_min).sum()) * per_row
        full_core = int(cost.sum())
        total_full = max(1, full_dense + full_core)
        B = int(hbm_budget_bytes)
        if B >= total_full - total_full // 1000:
            dense_budget, core_budget = full_dense, full_core
        else:
            dense_budget = min(full_dense, B * full_dense // total_full)
            core_budget = B - dense_budget
        hot_view, self.hot_mask, _ = _hot_view(packed, core_budget,
                                            cost=cost)
        hot_sh = ShardedIndex.from_packed(hot_view, n_shards)
        # exact fallbacks and snippets must see the FULL index, not the view
        hot_sh.source = packed
        self.hot = ShardedEngine(hot_sh, mesh=mesh, margin=margin,
                                 doc_bodies=doc_bodies,
                                 dense_budget_bytes=dense_budget,
                                 strict_parity=strict_parity)
        self.hot_bytes_used = int(
            cost[self.hot_mask].sum()
            + int((self.hot._dense_slot >= 0).sum()) * per_row)
        self.mesh = self.hot.mesh
        # full per-shard host columns: the staging source (host RAM only —
        # the flash-file analog; never uploaded whole)
        self.full = ShardedIndex.from_packed(packed, n_shards)
        self.n_shards = n_shards
        self.margin = margin
        self.strict_parity = strict_parity
        self.doc_bodies = doc_bodies
        self._lens_sh = np.diff(self.full.term_starts, axis=1)  # padded runs
        self._max_df = int(packed.df.max(initial=1))
        self._repl = NamedSharding(self.mesh, P("d"))

    @property
    def hot_fraction(self) -> float:
        return float(self.hot_mask.mean()) if len(self.hot_mask) else 0.0

    def search(self, query: SearchQuery) -> SearchResult:
        return self.search_batch([query])[0]

    def search_batch(self, queries: List[SearchQuery]) -> List[SearchResult]:
        results, pending = self.submit_batch(queries)
        for f in pending:
            f(results)
        return results

    def submit_batch(self, queries: List[SearchQuery]):
        results = [SearchResult() for _ in queries]
        lookup = self.packed.term_to_row.get
        hot_q: List[SearchQuery] = []
        hot_qi: List[int] = []
        cold: List[Tuple[int, List[int], SearchQuery]] = []
        for qi, q in enumerate(queries):
            if q.n_results <= 0 or not q.terms:
                continue
            rows = [lookup(t, -1) for t in q.terms]
            if min(rows) < 0:
                continue
            if all(self.hot_mask[r] for r in rows):
                hot_q.append(q)
                hot_qi.append(qi)
            else:
                cold.append((qi, rows, q))

        hot_results, hot_pending = self.hot.submit_batch(hot_q)
        for j, qi in enumerate(hot_qi):
            results[qi] = hot_results[j]
        pending = [(lambda res_list, f=f: f(hot_results))
                   for f in hot_pending]
        pending += self._submit_cold(cold, queries, results)
        return results, pending

    # -- cold path: stage per-shard runs, run the shared mesh kernel ------

    def _submit_cold(self, cold, queries, results):
        if not cold:
            return []
        phrase = [(qi, rows, q) for qi, rows, q in cold
                  if q.is_phrase and len(rows) >= 2]
        flat = [(qi, rows, q) for qi, rows, q in cold
                if not (q.is_phrase and len(rows) >= 2)]
        pending = []
        if phrase:
            # rare tail: exact host execution (bit-exact by definition)
            def run_host(res_list, phrase=phrase):
                for qi, rows, q in phrase:
                    d, s = self.hot._host_exact(rows, q.n_results, True)
                    self.hot._fill_result(res_list[qi], d, s, rows, q)

            pending.append(run_host)
        if not flat:
            return pending

        full = self.full
        D = self.n_shards
        staged_terms = sorted({r for _, rows, _ in flat for r in rows})
        S = len(staged_terms)
        lens = self._lens_sh[:, staged_terms]  # (D, S) padded runs
        ts = np.zeros((D, S + 1), dtype=np.int32)
        np.cumsum(lens, axis=1, out=ts[:, 1:])
        # candidate dynamic_slice slack: the largest candidate L bucket
        cand_rows = [rows[int(np.argmin([full.df[r] for r in rows]))]
                     for _, rows, _ in flat]
        lmax = _bucket(int(max(self._lens_sh[:, cand_rows].max(initial=1), 1)),
                       L_BUCKETS)
        cap = _bucket(int(ts[:, -1].max()) + lmax, SCRATCH_BUCKETS)
        s_doc = np.full((D, cap), SENTINEL_DOC, dtype=np.int32)
        s_tf = np.zeros((D, cap), dtype=np.int32)
        s_sc = np.zeros((D, cap), dtype=np.float32)
        for s in range(D):
            for i, r in enumerate(staged_terms):
                n = int(lens[s, i])
                if n == 0:
                    continue
                a, src = int(ts[s, i]), int(full.term_starts[s, r])
                s_doc[s, a : a + n] = full.postings_doc[s, src : src + n]
                s_tf[s, a : a + n] = full.postings_tf[s, src : src + n]
                s_sc[s, a : a + n] = full.postings_score[s, src : src + n]
        df_sc = full.df_shard[:, staged_terms].astype(np.int32)  # (D, S)
        spec = self._repl
        d_doc = jax.device_put(s_doc, spec)
        d_tf = jax.device_put(s_tf, spec)
        d_sc = jax.device_put(s_sc, spec)
        d_ts = jax.device_put(ts, spec)
        d_df = jax.device_put(df_sc, spec)
        scratch_row = {r: i for i, r in enumerate(staged_terms)}

        repl = NamedSharding(self.mesh, P())
        groups: Dict[tuple, list] = {}
        for qi, rows, q in flat:
            dfs = [int(full.df[r]) for r in rows]
            cslot = int(np.argmin(dfs))
            T = _bucket(len(rows), T_BUCKETS)
            L = _bucket(int(self._lens_sh[:, rows[cslot]].max(initial=1)),
                        L_BUCKETS)
            groups.setdefault((T, L), []).append((qi, rows, q, cslot))
        for (T, L), group in groups.items():
            for ci in range(0, len(group), B_CHUNK):
                chunk = group[ci : ci + B_CHUNK]
                B = _bucket(len(chunk), B_BUCKETS)
                rows_arr = np.zeros((B, T), dtype=np.int32)
                use_score = np.zeros((B, T), dtype=np.float32)
                idf64_q = np.zeros((B, T), dtype=np.float64)
                slot_of = np.zeros((B, T), dtype=np.int64)
                ks = np.zeros(B, dtype=np.int32)
                g_items = []
                for i, (qi, rows, q, cslot) in enumerate(chunk):
                    g_items.append((qi, rows, q))
                    ks[i] = q.n_results
                    order = [cslot] + [t for t in range(len(rows))
                                       if t != cslot]
                    for slot in range(T):
                        t = order[slot] if slot < len(order) else order[0]
                        rows_arr[i, slot] = scratch_row[rows[t]]
                        if slot < len(order):
                            use_score[i, slot] = 1.0
                    for slot, t in enumerate(order):
                        slot_of[i, t] = slot
                    for t, r in enumerate(rows):
                        idf64_q[i, t] = self.packed.idf64[r]
                M = min(L, int(ks.max(initial=1)) + self.margin)
                kern = make_sharded_kernel(
                    T, L, M, K.n_iters_for(self._max_df), self.mesh)
                docs, score, tfs, trunc = kern(
                    d_doc, d_sc, d_tf, d_ts, d_df,
                    jax.device_put(rows_arr, repl),
                    jax.device_put(use_score, repl))

                def finalize(res_list, docs=docs, tfs=tfs, trunc=trunc,
                             g_items=g_items, slot_of=slot_of,
                             idf64_q=idf64_q, ks=ks):
                    # shared finalizer: f64 re-rank + guard + host fallback
                    self.hot._finalize_group(
                        res_list, np.asarray(docs), np.asarray(tfs),
                        g_items, slot_of, idf64_q, ks, is_phrase=False,
                        force_host=np.asarray(trunc))

                pending.append(finalize)
        return pending

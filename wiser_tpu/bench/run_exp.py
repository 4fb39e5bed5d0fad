"""Experiment harness — reference: tools/run_exp.py (1270 LoC of config
matrix: engine x memory cap x query type x readahead x bloom factor,
iostat/blktrace watchers, result-table parsing).

The TPU analog sweeps the dimensions that matter here — corpus scale,
batch size, workload mix, bloom factor, engine kind — runs each treatment
through the local engine (or a gRPC target), and writes one JSON row per
treatment (the parse_client_output + ResultTable analog). OS-level I/O
control (cgroups, page-cache drops) has no TPU equivalent; the analogous
knob, device-memory budget, is recorded per treatment via
jax.local_devices()[0].memory_stats() when available.

Run: python -m wiser_tpu.bench.run_exp --out results.jsonl [--quick]
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time
from dataclasses import asdict, dataclass, field
from typing import List, Optional


@dataclass
class Treatment:
    name: str
    n_docs: int = 5000
    vocab: int = 5000
    mean_len: int = 80
    workload: str = "aol_mix"  # aol_mix | single | two_term | phrase
    n_queries: int = 8192
    batch: int = 8192
    n_results: int = 10
    bloom_factor: Optional[int] = 1
    engine: str = "tpu"  # tpu | oracle | staged
    # device-memory budget as a fraction of the full posting-column bytes
    # (engine="staged") — the cgroup-cap axis of the reference harness
    # (run_exp.py:628-696) mapped to HBM: the hot tier keeps this share of
    # posting bytes resident and the rest is staged per batch.
    hbm_budget_frac: Optional[float] = None
    columns: str = "raw"  # raw | tc (compressed device columns)


@dataclass
class ExpResult:
    treatment: dict
    qps: float
    wall_s: float
    warmup_s: float
    batch_p50_s: float
    device_mem_bytes: Optional[int] = None
    hot_fraction: Optional[float] = None  # staged: share of terms resident
    budget_bytes: Optional[int] = None


def default_matrix(quick: bool = False) -> List[Treatment]:
    if quick:
        return [
            Treatment("quick_mix", n_docs=500, vocab=500, mean_len=30,
                      n_queries=512, batch=512),
            Treatment("quick_phrase", n_docs=500, vocab=80, mean_len=30,
                      workload="phrase", n_queries=256, batch=256),
        ]
    out = []
    for workload, batch in itertools.product(
            ["single", "two_term", "aol_mix", "phrase"], [1024, 8192]):
        out.append(Treatment(
            name=f"{workload}_b{batch}", workload=workload, batch=batch))
    return out


def memory_matrix(quick: bool = False, n_docs: int = 50_000,
                  vocab: int = 20_000, batch: int = 8192) -> List[Treatment]:
    """The memory-cap grid — the reference's core experiment axis
    (run_exp.py:628-696 sweeps cgroup memory limits over a fixed engine +
    workload and reads the QPS curve). Here the cap is the HBM budget of
    the StagedEngine hot tier: at frac=1.0 everything is resident (pure
    in-memory engine); lower fractions force per-batch host->device
    staging of the cold posting runs ("read as needed")."""
    if quick:
        n_docs, vocab = 3000, 2000
    out = []
    for frac in (0.05, 0.1, 0.25, 0.5, 1.0):
        out.append(Treatment(
            name=f"membudget_{frac}", n_docs=n_docs, vocab=vocab,
            workload="aol_mix", engine="staged", hbm_budget_frac=frac,
            n_queries=2048 if quick else 8192,
            batch=2048 if quick else batch))
    return out


def build_workload(packed, oracle, t: Treatment):
    from wiser_tpu.data.synth_log import (
        aol_shape_mixed_log, gen_phrase_log, gen_single_term_log,
        gen_two_term_log, mine_phrases_from_index)

    terms, dfs = packed.terms, packed.df
    if t.workload == "single":
        qs = gen_single_term_log(terms, t.n_queries)
        for q in qs:
            q.n_results = t.n_results
        return qs
    if t.workload == "two_term":
        qs = gen_two_term_log(terms, terms, t.n_queries)
        for q in qs:
            q.n_results = t.n_results
        return qs
    if t.workload == "phrase":
        pairs = mine_phrases_from_index(oracle, max_phrases=500)
        qs = gen_phrase_log(pairs, t.n_queries)
        for q in qs:
            q.n_results = t.n_results
        return qs
    return aol_shape_mixed_log(terms, dfs, t.n_queries, n_results=t.n_results)


def run_treatment(t: Treatment) -> ExpResult:
    from wiser_tpu.data.synth import synth_docinfos
    from wiser_tpu.index.builder import build_index

    docs = synth_docinfos(t.n_docs, t.vocab, t.mean_len, seed=42,
                          with_blooms=(t.workload == "phrase"))
    packed, oracle = build_index(docs, with_blooms=(t.workload == "phrase"))
    queries = build_workload(packed, oracle, t)

    if t.engine == "oracle":
        t0 = time.time()
        for q in queries:
            oracle.search(q)
        wall = time.time() - t0
        return ExpResult(asdict(t), len(queries) / wall, wall, 0.0, wall)

    hot_fraction = None
    budget = None
    if t.engine == "staged":
        from wiser_tpu.engine.staged import BYTES_PER_POSTING, StagedEngine

        total_bytes = int(packed.n_postings) * BYTES_PER_POSTING
        budget = int(total_bytes * (t.hbm_budget_frac or 1.0))
        engine = StagedEngine(packed, budget, doc_bodies=oracle.doc_bodies)
        hot_fraction = round(engine.hot_fraction, 4)
    else:
        from wiser_tpu.engine.device import TpuEngine

        engine = TpuEngine(packed, doc_bodies=oracle.doc_bodies,
                           bloom_enable_factor=t.bloom_factor,
                           columns=t.columns)
    w0 = time.time()
    for i in range(0, len(queries), t.batch):
        engine.search_batch(queries[i : i + t.batch])
    warmup = time.time() - w0

    import numpy as np

    lat = []
    t0 = time.time()
    for i in range(0, len(queries), t.batch):
        bt = time.time()
        engine.search_batch(queries[i : i + t.batch])
        lat.append(time.time() - bt)
    wall = time.time() - t0

    mem = None
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats:
            mem = int(stats.get("bytes_in_use", 0))
    except Exception:
        pass
    return ExpResult(asdict(t), round(len(queries) / wall, 1), round(wall, 3),
                     round(warmup, 2), round(float(np.median(lat)), 3), mem,
                     hot_fraction=hot_fraction, budget_bytes=budget)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="exp_results.jsonl")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--memory", action="store_true",
                    help="run the HBM-budget grid (the cgroup-cap analog)")
    ap.add_argument("--batch", type=int, default=8192,
                    help="memory-grid batch width (smaller batches stage "
                         "less cold scratch per dispatch)")
    args = ap.parse_args(argv)
    matrix = (memory_matrix(args.quick, batch=args.batch) if args.memory
              else default_matrix(args.quick))
    with open(args.out, "w") as f:
        for t in matrix:
            print(f"== {t.name}", file=sys.stderr)
            r = run_treatment(t)
            f.write(json.dumps(asdict(r)) + "\n")
            f.flush()
            extra = (f" (hot {r.hot_fraction})" if r.hot_fraction is not None
                     else "")
            print(f"   {r.qps} qps{extra}", file=sys.stderr)


if __name__ == "__main__":
    main()

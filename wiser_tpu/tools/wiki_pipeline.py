"""End-to-end real-data pipeline exercise: wiki abstract XML -> analyzer
-> linedoc -> fast_builder -> integrity check -> engine parity + QPS.

The reference prepares its corpus with scripts/generate_linedoc.py (wiki
abstract XML in) + scripts/tokenize_wiki_linedoc.py (ES analyzer); this
drives the same pipeline shape through data/corpus.py. In the zero-egress
environment the dump itself is SYNTHESIZED in the enwiki abstract XML
schema (<feed><doc><title/><abstract/></doc></feed>) with raw prose the
analyzer must actually work for: mixed case, punctuation, digits,
apostrophes — unlike the pre-tokenized linedoc generator, nothing here
bypasses tokenization.

Run: python -m wiser_tpu.tools.wiki_pipeline --n-docs 100000 \
       --workdir .scale_cache/wikipipe --out PIPELINE_WIKI.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_PUNCT = [". ", ", ", "; ", " - ", ": "]


def synth_wiki_xml(path: str, n_docs: int, vocab_size: int = 120_000,
                   mean_len: int = 60, seed: int = 9) -> int:
    """Write an enwiki-abstract-shaped XML dump of pseudo-English prose.

    Sentence case, commas/periods, possessives and years are injected so
    the standard-analyzer approximation (corpus.tokenize) does real work:
    the linedoc tokens must come out lowercased, punctuation-stripped,
    with correct char offsets into the raw abstract."""
    from xml.sax.saxutils import escape

    from wiser_tpu.data.scale_corpus import pseudo_vocab

    rng = np.random.default_rng(seed)
    vocab = pseudo_vocab(vocab_size, seed=seed + 1)
    t0 = time.time()
    with open(path, "w", encoding="utf-8") as f:
        f.write('<feed>\n')
        written = 0
        chunk = 20_000
        while written < n_docs:
            nd = min(chunk, n_docs - written)
            lens = np.maximum(3, rng.poisson(mean_len, size=nd))
            total = int(lens.sum())
            ids = np.minimum(rng.zipf(1.25, size=total) - 1,
                             vocab_size - 1)
            styles = rng.random(total)
            bounds = np.zeros(nd + 1, dtype=np.int64)
            np.cumsum(lens, out=bounds[1:])
            parts = []
            for d in range(nd):
                words = []
                for k, i in enumerate(ids[bounds[d]:bounds[d + 1]].tolist()):
                    w = vocab[i]
                    s = styles[bounds[d] + k]
                    if s < 0.05:
                        w = w.capitalize()       # sentence/proper case
                    elif s < 0.07:
                        w = w.upper()            # acronym-ish
                    elif s < 0.09:
                        w = w + "'s"             # possessive clitic
                    elif s < 0.11:
                        w = str(1900 + (i % 126))  # year-like number
                    sep = (" " if s >= 0.2
                           else _PUNCT[int(s * 1e4) % len(_PUNCT)])
                    words.append(w + sep)
                title = vocab[int(ids[bounds[d]])].capitalize()
                abstract = "".join(words).rstrip() + "."
                parts.append(
                    f"<doc>\n<title>Wikipedia: {escape(title)}</title>\n"
                    f"<abstract>{escape(abstract)}</abstract>\n</doc>\n")
            f.write("".join(parts))
            written += nd
            log(f"  xml: {written}/{n_docs} docs ({time.time()-t0:.0f}s)")
        f.write('</feed>\n')
    return n_docs


def run_pipeline(workdir: str, n_docs: int, with_engine: bool = True,
                 n_queries: int = 4096, parity_n: int = 200) -> dict:
    from wiser_tpu.data.corpus import wiki_xml_to_linedoc
    from wiser_tpu.index.bloom import BloomConfig
    from wiser_tpu.index.fast_builder import build_packed_fast
    from wiser_tpu.tools.check_posting_list import check

    os.makedirs(workdir, exist_ok=True)
    xml_path = os.path.join(workdir, "abstracts.xml")
    linedoc = os.path.join(workdir, "wiki.linedoc")
    index_dir = os.path.join(workdir, "idx")
    rec = {"n_docs_requested": n_docs}

    t0 = time.time()
    synth_wiki_xml(xml_path, n_docs)
    rec["xml_synth_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    n = wiki_xml_to_linedoc(xml_path, linedoc, with_blooms=True)
    rec["n_docs"] = n
    rec["xml_to_linedoc_s"] = round(time.time() - t0, 1)
    log(f"linedoc: {n} docs in {rec['xml_to_linedoc_s']}s")

    t0 = time.time()
    packed = build_packed_fast(linedoc, "WITH_BI_BLOOM", with_blooms=True,
                               bloom_cfg=BloomConfig(5, 0.0009),
                               verbose=True)
    packed.save(index_dir)
    rec["index_s"] = round(time.time() - t0, 1)
    rec["n_terms"] = int(packed.n_terms)
    rec["n_postings"] = int(packed.df.sum())

    t0 = time.time()
    errors = check(index_dir, linedoc, "WITH_BI_BLOOM")
    rec["check_posting_list_errors"] = int(errors)
    rec["check_s"] = round(time.time() - t0, 1)

    if with_engine:
        from wiser_tpu.engine.device import TpuEngine, host_exact_search
        from wiser_tpu.tools.scale_bench import run_config, zipf_rows
        from wiser_tpu.types import SearchQuery

        engine = TpuEngine(packed)
        rng = np.random.default_rng(3)
        nt = rng.choice([1, 2, 3], size=n_queries, p=[0.45, 0.35, 0.20])
        queries = []
        for t in nt:
            rr = zipf_rows(packed, rng, 1, int(t))[0]
            queries.append(SearchQuery([packed.terms[r] for r in rr],
                                       n_results=10))
        r = run_config(engine, queries, batch=min(4096, n_queries))
        bad = 0
        idx = rng.choice(n_queries, size=min(parity_n, n_queries),
                         replace=False)
        for i in idx:
            q = queries[int(i)]
            rows = [packed.lookup(t) for t in q.terms]
            got = engine.search(q)
            d, s = host_exact_search(packed, engine.cache64, rows,
                                     q.n_results)
            want = list(zip(d.tolist(), s.tolist()))
            have = [(e.doc_id, e.doc_score) for e in got.entries]
            if want != have:
                bad += 1
                log(f"PARITY MISMATCH {q.terms}")
        r["parity_mismatches"] = bad
        r["parity_sample"] = len(idx)
        rec["engine"] = r
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=100_000)
    ap.add_argument("--workdir", default=".scale_cache/wikipipe")
    ap.add_argument("--no-engine", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    if not args.no_engine:
        from wiser_tpu.utils import enable_compile_cache

        enable_compile_cache()
    rec = run_pipeline(args.workdir, args.n_docs,
                       with_engine=not args.no_engine)
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()

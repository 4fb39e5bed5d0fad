"""Offline indexer CLI — reference: tools/indexer.py:139-151, which runs
create_qq_mem_dump (linedoc -> in-memory engine dump + bloom stores) then
convert_qq_to_vacuum (-> flash files). Here the same two stages are
OracleEngine build + pack_oracle, producing the PackedIndex directory and
a chunked LZ4 doc store.

Run: python -m wiser_tpu.tools.indexer --linedoc corpus.linedoc \
       --format WITH_BI_BLOOM --out /path/to/index [--with-blooms]
       [--n-rows N] [--bloom-entries 5 --bloom-ratio 0.0009]
"""

from __future__ import annotations

import argparse
import sys
import time


def build(linedoc: str, fmt: str, out: str, n_rows=None, with_blooms=False,
          bloom_entries=5, bloom_ratio=0.0009, store_docs=True, fast=False,
          spill_dir=None):
    from wiser_tpu.index.bloom import BloomConfig
    from wiser_tpu.index.builder import build_index_from_linedoc
    from wiser_tpu.index.doc_store import ChunkedDocStoreWriter

    t0 = time.time()
    oracle = None
    if fast:
        from wiser_tpu.index.fast_builder import build_packed_fast

        packed = build_packed_fast(
            linedoc, fmt, n_rows=n_rows, with_blooms=with_blooms,
            bloom_cfg=BloomConfig(bloom_entries, bloom_ratio), verbose=True,
            spill_dir=spill_dir)
    else:
        packed, oracle = build_index_from_linedoc(
            linedoc, fmt, n_rows=n_rows,
            bloom_cfg=BloomConfig(bloom_entries, bloom_ratio),
            with_blooms=with_blooms,
        )
    t1 = time.time()
    packed.save(out)
    if store_docs:
        w = ChunkedDocStoreWriter(out + "/docs")
        if oracle is not None:
            for body in oracle.doc_bodies:
                w.add(body)
        else:
            from wiser_tpu.linedoc import parse_linedoc

            for d in parse_linedoc(linedoc, fmt, n_rows):
                w.add(d.body)
        w.close()
    t2 = time.time()
    print(
        f"indexed {packed.n_docs} docs, {packed.n_terms} terms, "
        f"{int(packed.df.sum())} postings (padded {packed.n_postings}) "
        f"in {t1-t0:.1f}s; dumped in {t2-t1:.1f}s -> {out}",
        file=sys.stderr,
    )
    return packed, oracle


def main(argv=None):
    ap = argparse.ArgumentParser(description="wiser_tpu offline indexer")
    ap.add_argument("--linedoc", required=True)
    ap.add_argument("--format", default="WITH_POSITIONS")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-rows", type=int, default=None)
    ap.add_argument("--with-blooms", action="store_true")
    ap.add_argument("--bloom-entries", type=int, default=5)
    ap.add_argument("--bloom-ratio", type=float, default=0.0009)
    ap.add_argument("--no-doc-store", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="vectorized chunked builder (reference-scale path)")
    ap.add_argument("--spill-dir", default=None,
                    help="stream parsed columns through this directory "
                         "instead of RAM (required above ~5M docs)")
    args = ap.parse_args(argv)
    build(args.linedoc, args.format, args.out, args.n_rows, args.with_blooms,
          args.bloom_entries, args.bloom_ratio,
          store_docs=not args.no_doc_store, fast=args.fast,
          spill_dir=args.spill_dir)


if __name__ == "__main__":
    main()

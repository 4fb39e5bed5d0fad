"""Reference-scale wiki-shaped linedoc generation.

The reference prepares 20M-doc Wikipedia linedocs with scripts/
generate_linedoc.py + an Elasticsearch analyzer; in this zero-egress
environment the scale corpus is synthesized instead: a pseudo-English
vocabulary with Zipf term frequencies (the wiki term universe is 4.55M
unique terms / 89.5M occurrences, SURVEY.md §6) and Poisson document
lengths, written as canonical WITH_POSITIONS / WITH_BI_BLOOM linedoc TSV
that the scalable indexer (index/fast_builder.py) streams.

Generation is chunked and mostly vectorized: token ids for a whole chunk
come from one Zipf draw, word/offset strings from precomputed per-word
caches; only the per-doc group assembly is Python.
"""

from __future__ import annotations

import sys
import time
from typing import List, Optional

import numpy as np

_CONS = "bcdfghjklmnpqrstvwz"
_VOW = "aeiou"


def pseudo_vocab(n: int, seed: int = 1234) -> List[str]:
    """Deterministic pseudo-English words, unique, 2-14 chars."""
    rng = np.random.default_rng(seed)
    words = []
    seen = set()
    while len(words) < n:
        need = n - len(words)
        syls = rng.integers(1, 5, size=need)
        for k in syls:
            w = "".join(
                _CONS[rng.integers(len(_CONS))] + _VOW[rng.integers(len(_VOW))]
                + (_CONS[rng.integers(len(_CONS))] if rng.random() < 0.35 else "")
                for _ in range(int(k)))
            if w not in seen:
                seen.add(w)
                words.append(w)
    return words


def generate_linedoc(
    out_path: str,
    n_docs: int,
    vocab_size: int = 200_000,
    mean_len: int = 120,
    zipf_a: float = 1.25,
    seed: int = 42,
    with_blooms: bool = False,
    chunk_docs: int = 20_000,
    verbose: bool = True,
) -> int:
    """Write a wiki-shaped linedoc corpus; returns docs written."""
    rng = np.random.default_rng(seed)
    vocab = pseudo_vocab(vocab_size, seed=seed + 1)
    wlen = np.fromiter((len(w) for w in vocab), dtype=np.int64,
                       count=vocab_size)

    # native fast path: the per-token grouping/string loop below runs at
    # ~270 docs/s on one core; the C assembler is ~100x that and is
    # byte-identical (Python keeps every RNG draw; test_corpus_tools
    # checks file equality)
    from wiser_tpu.native import lib as native_lib
    use_native = native_lib.available()
    if use_native:
        vocab_blob = np.frombuffer(
            "".join(vocab).encode("ascii"), dtype=np.uint8)
        vocab_offs = np.zeros(vocab_size + 1, dtype=np.int64)
        np.cumsum(wlen, out=vocab_offs[1:])

    header = ["doctitle", "body", "tokenized", "offsets", "positions"]
    if with_blooms:
        header += ["bloom", "bloom_before"]
    t0 = time.time()
    written = 0
    with open(out_path, "wb") as f:
        f.write(("FIELDS_HEADER_INDICATOR###\t"
                 + "\t".join(header) + "\n").encode("utf-8"))
        while written < n_docs:
            nd = min(chunk_docs, n_docs - written)
            lens = np.maximum(1, rng.poisson(mean_len, size=nd))
            total = int(lens.sum())
            ids_flat = np.minimum(rng.zipf(zipf_a, size=total) - 1,
                                  vocab_size - 1).astype(np.int64)
            bounds = np.zeros(nd + 1, dtype=np.int64)
            np.cumsum(lens, out=bounds[1:])
            if use_native:
                f.write(native_lib.linedoc_chunk(
                    vocab_blob, vocab_offs, ids_flat, bounds, with_blooms))
                written += nd
                if verbose:
                    print(f"  wrote {written}/{n_docs} docs "
                          f"({time.time()-t0:.0f}s)", file=sys.stderr,
                          flush=True)
                continue
            rows = []
            for d in range(nd):
                ids = ids_flat[bounds[d]:bounds[d + 1]]
                words = [vocab[i] for i in ids.tolist()]
                body = " ".join(words)
                # char offsets: start of token i = sum(len+1 of previous)
                starts = np.zeros(len(ids), dtype=np.int64)
                np.cumsum(wlen[ids[:-1]] + 1, out=starts[1:])
                ends = starts + wlen[ids] - 1  # inclusive, synth convention
                uniq: List[int] = []
                group_pos: dict = {}
                group_off: dict = {}
                for i, t in enumerate(ids.tolist()):
                    g = group_pos.get(t)
                    if g is None:
                        uniq.append(t)
                        group_pos[t] = [str(i)]
                        group_off[t] = [f"{starts[i]},{ends[i]}"]
                    else:
                        g.append(str(i))
                        group_off[t].append(f"{starts[i]},{ends[i]}")
                tok_col = " ".join(vocab[t] for t in uniq)
                pos_col = "".join(
                    ";".join(group_pos[t]) + ";." for t in uniq)
                off_col = "".join(
                    ";".join(group_off[t]) + ";." for t in uniq)
                row = ["d", body, tok_col, off_col, pos_col]
                if with_blooms:
                    ends_s: dict = {t: set() for t in uniq}
                    begins_s: dict = {t: set() for t in uniq}
                    toks = ids.tolist()
                    for i, t in enumerate(toks):
                        if i + 1 < len(toks):
                            ends_s[t].add(vocab[toks[i + 1]])
                        if i > 0:
                            begins_s[t].add(vocab[toks[i - 1]])
                    row.append("".join(
                        " ".join(sorted(ends_s[t])) + "!" for t in uniq))
                    row.append("".join(
                        " ".join(sorted(begins_s[t])) + "!" for t in uniq))
                rows.append("\t".join(row))
            f.write(("\n".join(rows) + "\n").encode("utf-8"))
            written += nd
            if verbose:
                print(f"  wrote {written}/{n_docs} docs "
                      f"({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)
    return written


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="generate a wiki-shaped linedoc corpus at scale")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-docs", type=int, required=True)
    ap.add_argument("--vocab", type=int, default=200_000)
    ap.add_argument("--mean-len", type=int, default=120)
    ap.add_argument("--zipf-a", type=float, default=1.25)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--with-blooms", action="store_true")
    args = ap.parse_args(argv)
    n = generate_linedoc(args.out, args.n_docs, args.vocab, args.mean_len,
                         args.zipf_a, args.seed, args.with_blooms)
    print(f"wrote {n} docs -> {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()

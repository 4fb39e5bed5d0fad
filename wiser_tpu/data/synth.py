"""Synthetic corpus generation with full linedoc columns.

The analog of the reference's corpus pipeline output (scripts/
generate_linedoc.py + tokenize_wiki_linedoc.py): produces WITH_BI_BLOOM
rows — body, unique-term tokens, per-term offsets/positions, and
phrase-end / phrase-begin columns — from a Zipf-distributed vocabulary, so
every engine path (incl. bi-bloom phrase pre-check) can be exercised and
benchmarked without the external Wikipedia/AOL downloads.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from wiser_tpu.types import DocInfo


def zipf_vocab(n_terms: int) -> List[str]:
    return [f"t{i}" for i in range(n_terms)]


def synth_docinfos(
    n_docs: int,
    vocab_size: int = 1000,
    mean_len: int = 60,
    zipf_a: float = 1.3,
    seed: int = 0,
    with_blooms: bool = True,
) -> List[DocInfo]:
    """Generate DocInfos directly (no file round trip)."""
    rng = np.random.default_rng(seed)
    vocab = zipf_vocab(vocab_size)
    docs = []
    for _ in range(n_docs):
        n_tok = max(1, int(rng.poisson(mean_len)))
        # Zipf-ish ranks clipped into the vocabulary
        ranks = np.minimum(rng.zipf(zipf_a, size=n_tok) - 1, vocab_size - 1)
        toks = [vocab[r] for r in ranks]
        docs.append(make_docinfo(toks, with_blooms=with_blooms))
    return docs


def make_docinfo(body_tokens: List[str], with_blooms: bool = True) -> DocInfo:
    """Build a DocInfo with all derived columns from a token sequence.

    Offsets are character offsets into the constructed body; positions are
    token positions; phrase ends/begins are the sets of immediately
    following/preceding tokens per unique term (what the reference's
    pre-tokenized linedoc columns carry, bloom_filter.h:277-322).
    """
    body = " ".join(body_tokens)
    uniq: List[str] = []
    seen = {}
    positions: dict[str, List[int]] = {}
    offsets: dict[str, List[tuple]] = {}
    ends: dict[str, set] = {}
    begins: dict[str, set] = {}
    off = 0
    for i, tok in enumerate(body_tokens):
        if tok not in seen:
            seen[tok] = True
            uniq.append(tok)
            positions[tok] = []
            offsets[tok] = []
            ends[tok] = set()
            begins[tok] = set()
        positions[tok].append(i)
        offsets[tok].append((off, off + len(tok) - 1))
        if i + 1 < len(body_tokens):
            ends[tok].add(body_tokens[i + 1])
        if i > 0:
            begins[tok].add(body_tokens[i - 1])
        off += len(tok) + 1

    tok_col = " ".join(uniq)
    off_col = "".join(
        ";".join(f"{a},{b}" for a, b in offsets[t]) + ";." for t in uniq
    )
    pos_col = "".join(";".join(str(p) for p in positions[t]) + ";." for t in uniq)
    fmt = "WITH_POSITIONS"
    ends_col = begins_col = ""
    if with_blooms:
        ends_col = "".join(" ".join(sorted(ends[t])) + "!" for t in uniq)
        begins_col = "".join(" ".join(sorted(begins[t])) + "!" for t in uniq)
        fmt = "WITH_BI_BLOOM"
    return DocInfo(
        body=body, tokens=tok_col, token_offsets=off_col,
        token_positions=pos_col, phrase_begins=begins_col,
        phrase_ends=ends_col, format=fmt,
    )


def synth_query_terms(
    n_queries: int,
    vocab_size: int,
    n_terms: int = 1,
    zipf_a: float = 1.3,
    seed: int = 1,
) -> List[List[str]]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_queries):
        ranks = np.minimum(rng.zipf(zipf_a, size=n_terms) - 1, vocab_size - 1)
        out.append([f"t{r}" for r in ranks])
    return out

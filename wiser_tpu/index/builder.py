"""Index builder: linedoc / oracle engine -> PackedIndex.

Mirrors the reference's two-stage pipeline (tools/indexer.py:139-151):
stage 1 builds the simple in-memory engine (create_qq_mem_dump.cc), stage 2
converts it to the packed device format (convert_qq_to_vacuum.cc,
FlashEngineDumper::Dump at flash_engine_dumper.h:735). Here stage 1 is the
OracleEngine and stage 2 is `pack_oracle`; `build_index` runs both.

Unlike the reference's per-term streaming dump with its two-pass skip-list
sizing trick (FakeFileDumper, file_dumper.h:151-234), packing columnar
arrays is a single vectorized pass — offsets are computed exactly by
prefix sums, so no fake dump is needed.
"""

from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from wiser_tpu.index.bloom import BloomConfig
from wiser_tpu.index.format import PackedIndex
from wiser_tpu.linedoc import parse_linedoc
from wiser_tpu.oracle import OracleEngine
from wiser_tpu.types import DocInfo


def pack_oracle(
    eng: OracleEngine,
    bloom_cfg: Optional[BloomConfig] = None,
    with_blooms: bool = False,
) -> PackedIndex:
    """Stage 2: in-memory engine -> packed columnar index.

    Every term's posting run is padded to a BLOCK (128) multiple —
    sentinel doc SENTINEL_DOC, tf 0, empty position/offset bags — so the
    device can treat posting memory as (P/128, 128) rows (the reference's
    128-value pack blocks, flash_containers.h:10)."""
    from wiser_tpu.index.format import BLOCK, SENTINEL_DOC

    terms = sorted(eng.index.keys())
    T = len(terms)

    df = np.array([len(eng.index[t]) for t in terms], dtype=np.int64)
    padded = (df + BLOCK - 1) // BLOCK * BLOCK
    term_starts = np.zeros(T + 1, dtype=np.int64)
    np.cumsum(padded, out=term_starts[1:])
    P = int(term_starts[-1])

    postings_doc = np.full(P, SENTINEL_DOC, dtype=np.int32)
    postings_tf = np.zeros(P, dtype=np.int32)
    pos_counts = np.zeros(P, dtype=np.int64)
    off_counts = np.zeros(P, dtype=np.int64)

    for ti, t in enumerate(terms):
        p = int(term_starts[ti])
        for post in eng.index[t]:
            postings_doc[p] = post.doc_id
            postings_tf[p] = post.term_freq
            pos_counts[p] = len(post.positions)
            off_counts[p] = len(post.offsets)
            p += 1

    pos_starts = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(pos_counts, out=pos_starts[1:])
    off_starts = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(off_counts, out=off_starts[1:])

    positions = np.empty(int(pos_starts[-1]), dtype=np.int32)
    off_begin = np.empty(int(off_starts[-1]), dtype=np.int32)
    off_end = np.empty(int(off_starts[-1]), dtype=np.int32)

    for ti, t in enumerate(terms):
        p = int(term_starts[ti])
        for post in eng.index[t]:
            s = pos_starts[p]
            positions[s : s + len(post.positions)] = post.positions
            s = off_starts[p]
            for j, (a, b) in enumerate(post.offsets):
                off_begin[s + j] = a
                off_end[s + j] = b
            p += 1

    bloom_cfg = bloom_cfg or BloomConfig()
    bloom_ends = bloom_begins = None
    if with_blooms:
        W = bloom_cfg.n_words
        bloom_ends = np.zeros((P, W), dtype=np.uint32)
        bloom_begins = np.zeros((P, W), dtype=np.uint32)
        for ti, t in enumerate(terms):
            p = int(term_starts[ti])
            for post in eng.index[t]:
                ends = eng.phrase_ends.get((t, post.doc_id))
                if ends:
                    bloom_ends[p] = bloom_cfg.build_filter_words(ends)
                begins = eng.phrase_begins.get((t, post.doc_id))
                if begins:
                    bloom_begins[p] = bloom_cfg.build_filter_words(begins)
                p += 1

    return PackedIndex(
        terms=terms,
        term_starts=term_starts,
        df=df,
        postings_doc=postings_doc,
        postings_tf=postings_tf,
        n_docs=eng.n_docs,
        avg_len=eng.avg_length,
        doc_len_code=np.array(eng.doc_len_codes, dtype=np.uint8),
        pos_starts=pos_starts,
        positions=positions,
        off_starts=off_starts,
        off_begin=off_begin,
        off_end=off_end,
        bloom_cfg=bloom_cfg,
        bloom_ends=bloom_ends,
        bloom_begins=bloom_begins,
    )


def build_index(
    docs: Iterable[DocInfo],
    bloom_cfg: Optional[BloomConfig] = None,
    with_blooms: bool = False,
) -> tuple[PackedIndex, OracleEngine]:
    """Full pipeline: DocInfos -> (PackedIndex, the stage-1 oracle)."""
    eng = OracleEngine()
    eng.load_linedocs(docs)
    return pack_oracle(eng, bloom_cfg, with_blooms), eng


def build_index_from_linedoc(
    path: str,
    fmt: str,
    n_rows: Optional[int] = None,
    bloom_cfg: Optional[BloomConfig] = None,
    with_blooms: bool = False,
) -> tuple[PackedIndex, OracleEngine]:
    return build_index(parse_linedoc(path, fmt, n_rows), bloom_cfg, with_blooms)

"""Engine factory — reference: engine_factory.h:21-50 (URL-style engine
selection: "qq_mem_compressed" / "vacuum:vacuum_dump:<path>").

URLs here:
  "oracle:"                     empty in-memory oracle engine
  "oracle:<dump_dir>"           oracle loaded from an oracle_dump dir
  "oracle_linedoc:<path>:<fmt>" oracle built from a linedoc file
  "tpu:<index_dir>"             TpuEngine over a saved PackedIndex
  "tpu_tc:<index_dir>"          TpuEngine with compressed (tc) columns
  "sharded:<index_dir>:<n>"     ShardedEngine over n mesh devices
"""

from __future__ import annotations


def create_search_engine(url: str):
    scheme, _, rest = url.partition(":")
    if scheme == "oracle":
        from wiser_tpu.oracle import OracleEngine

        if not rest:
            return OracleEngine()
        from wiser_tpu.index.oracle_dump import deserialize

        return deserialize(rest)
    if scheme == "oracle_linedoc":
        path, _, fmt = rest.partition(":")
        from wiser_tpu.linedoc import parse_linedoc
        from wiser_tpu.oracle import OracleEngine

        eng = OracleEngine()
        eng.load_linedocs(parse_linedoc(path, fmt or "WITH_POSITIONS"))
        return eng
    if scheme in ("tpu", "tpu_tc"):
        import os

        from wiser_tpu.engine.device import TpuEngine
        from wiser_tpu.index.format import PackedIndex

        packed = PackedIndex.load(rest)
        bodies = None
        docs_dir = os.path.join(rest, "docs")
        if os.path.isdir(docs_dir):
            from wiser_tpu.index.doc_store import (ChunkedDocStoreReader,
                                                   LazyDocBodies)

            # on-demand LRU-chunk reads — snippets never inflate the
            # whole store into RAM (doc_store.h:365 BufferPool analog)
            bodies = LazyDocBodies(ChunkedDocStoreReader(docs_dir))
        return TpuEngine(packed, doc_bodies=bodies,
                         columns="tc" if scheme == "tpu_tc" else "raw")
    if scheme == "sharded":
        path, _, n = rest.rpartition(":")
        from wiser_tpu.engine.shard import ShardedEngine, ShardedIndex
        from wiser_tpu.index.format import PackedIndex

        packed = PackedIndex.load(path)
        return ShardedEngine(ShardedIndex.from_packed(packed, int(n)))
    raise ValueError(f"unknown engine url: {url!r}")

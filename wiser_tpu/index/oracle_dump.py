"""Oracle (in-memory) engine serialization — reference:
QqMemEngineDelta::Serialize/Deserialize (qq_mem_engine.h:410-434), which
dumps engine_meta / doc_store / inverted_index / doc_lengths.dump.

The inverted index is stored in the reference's per-posting byte-format
spirit (posting.h:130-151): per term, delta-varint doc ids, tfs, offset
pairs (delta) and positions (delta), encoded with the native varint codec
(wiser_native.cpp) — this is the stage-1 "QQ dump" of the two-stage
indexing pipeline; pack_oracle is the stage-2 converter.
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

from wiser_tpu.index.doc_store import ChunkedDocStoreReader, ChunkedDocStoreWriter
from wiser_tpu.native import lib as native
from wiser_tpu.oracle import OracleEngine, Posting


def serialize(eng: OracleEngine, dirpath: str) -> None:
    os.makedirs(dirpath, exist_ok=True)
    # engine meta (the engine_meta analog)
    with open(os.path.join(dirpath, "engine_meta.json"), "w") as f:
        json.dump({
            "n_docs": eng.n_docs,
            "avg_length": eng.avg_length,
            "n_terms": eng.term_count(),
        }, f)

    # doc store
    w = ChunkedDocStoreWriter(os.path.join(dirpath, "doc_store"))
    for body in eng.doc_bodies:
        w.add(body)
    w.close()

    # doc lengths: 1-byte codes + f64 running average
    # (DocLengthCharStore::Serialize, doc_length_store.h:141-163)
    np.array(eng.doc_len_codes, dtype=np.uint8).tofile(
        os.path.join(dirpath, "doc_lengths.dump"))

    # inverted index: per term, varint-encoded posting stream
    terms = sorted(eng.index.keys())
    stream = bytearray()
    offsets = []
    for t in terms:
        postings = eng.index[t]
        vals: List[int] = [len(postings)]
        prev_doc = 0
        for p in postings:
            vals.append(p.doc_id - prev_doc)  # delta (posting.h:130-151)
            prev_doc = p.doc_id
            vals.append(p.term_freq)
            vals.append(len(p.offsets))
            prev = 0
            for a, b in p.offsets:
                vals.append(a - prev)  # delta pairs
                vals.append(b - a)
                prev = b
            vals.append(len(p.positions))
            prev = 0
            for pos in p.positions:
                vals.append(pos - prev)
                prev = pos
        enc = native.varint_encode_array(np.array(vals, dtype=np.uint32))
        offsets.append((len(stream), len(vals)))
        stream.extend(enc)
    with open(os.path.join(dirpath, "inverted_index.dump"), "wb") as f:
        f.write(bytes(stream))
    with open(os.path.join(dirpath, "term_index.json"), "w") as f:
        json.dump({"terms": terms, "offsets": offsets}, f)

    # phrase end/begin sets (the bloom-store source data)
    phr = {
        "ends": [[t, d, sorted(s)] for (t, d), s in eng.phrase_ends.items()],
        "begins": [[t, d, sorted(s)] for (t, d), s in eng.phrase_begins.items()],
    }
    with open(os.path.join(dirpath, "phrase_sets.json"), "w") as f:
        json.dump(phr, f)


def deserialize(dirpath: str) -> OracleEngine:
    with open(os.path.join(dirpath, "engine_meta.json")) as f:
        meta = json.load(f)

    eng = OracleEngine()

    r = ChunkedDocStoreReader(os.path.join(dirpath, "doc_store"))
    eng.doc_bodies = [r.get(i) for i in range(r.n_docs)]
    r.close()

    codes = np.fromfile(os.path.join(dirpath, "doc_lengths.dump"), dtype=np.uint8)
    eng.doc_len_codes = [int(c) for c in codes]

    with open(os.path.join(dirpath, "term_index.json")) as f:
        tindex = json.load(f)
    with open(os.path.join(dirpath, "inverted_index.dump"), "rb") as f:
        stream = f.read()

    for t, (off, n_vals) in zip(tindex["terms"], tindex["offsets"]):
        vals = native.varint_decode_array(stream[off:], n_vals)
        i = 0
        n_postings = int(vals[i]); i += 1
        postings = []
        doc = 0
        for _ in range(n_postings):
            doc += int(vals[i]); i += 1
            tf = int(vals[i]); i += 1
            n_off = int(vals[i]); i += 1
            offs, prev = [], 0
            for _ in range(n_off):
                a = prev + int(vals[i]); i += 1
                b = a + int(vals[i]); i += 1
                offs.append((a, b))
                prev = b
            n_pos = int(vals[i]); i += 1
            poss, prev = [], 0
            for _ in range(n_pos):
                prev += int(vals[i]); i += 1
                poss.append(prev)
            postings.append(Posting(doc, tf, offs, poss))
        eng.index[t] = postings

    with open(os.path.join(dirpath, "phrase_sets.json")) as f:
        phr = json.load(f)
    eng.phrase_ends = {(t, d): set(s) for t, d, s in phr["ends"]}
    eng.phrase_begins = {(t, d): set(s) for t, d, s in phr["begins"]}

    # rebuild the running average exactly (insertion order)
    from wiser_tpu.scoring import RunningAvgLength
    from wiser_tpu.codecs import CHAR4_DECODE_TABLE

    eng._avg = RunningAvgLength()
    eng._avg.avg = np.float64(meta["avg_length"])
    eng._avg.n = meta["n_docs"]
    eng.similarity.reset(meta["avg_length"])
    return eng

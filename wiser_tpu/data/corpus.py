"""Corpus preparation — reference: scripts/ (generate_linedoc.py,
tokenize_wiki_linedoc.py).

The reference tokenizes via a REST call to an Elasticsearch analyzer
(scripts/tokenize_wiki_linedoc.py:10-26). This build ships a self-contained
analyzer approximating ES's `standard` analyzer (Unicode word boundaries,
lowercase) so corpora can be prepared with zero external services, and
emits full linedoc columns — tokens (unique), offsets, positions, and the
bi-bloom phrase-ends/begins columns that the reference's pipeline
precomputes for the bloom store (bloom_filter.h:277-322).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import Iterable, Iterator, List, Optional, Tuple

# ES standard analyzer approximation: maximal runs of word characters
# (letters/digits/underscore across Unicode) plus inner apostrophes.
_TOKEN_RE = re.compile(r"[^\W_]+(?:'[^\W_]+)*", re.UNICODE)


def tokenize(text: str) -> List[Tuple[str, int, int]]:
    """[(term_lowercase, start_offset, end_offset_inclusive)] in order."""
    out = []
    for m in _TOKEN_RE.finditer(text):
        out.append((m.group(0).lower(), m.start(), m.end() - 1))
    return out


def doc_to_linedoc_cols(title: str, body: str, with_blooms: bool = True) -> List[str]:
    """Build a full linedoc TSV row: doctitle, body, tokenized, offsets,
    positions[, bloom(ends), bloom_before(begins)]. The tokenized column
    holds unique terms; offsets/positions are per-unique-term groups
    (fixture format, engine_loader.h)."""
    body = body.replace("\t", " ").replace("\n", " ")
    title = title.replace("\t", " ").replace("\n", " ")
    toks = tokenize(body)
    uniq: List[str] = []
    offsets: dict = {}
    positions: dict = {}
    ends: dict = {}
    begins: dict = {}
    for i, (term, s, e) in enumerate(toks):
        if term not in offsets:
            uniq.append(term)
            offsets[term] = []
            positions[term] = []
            ends[term] = set()
            begins[term] = set()
        offsets[term].append((s, e))
        positions[term].append(i)
        if i + 1 < len(toks):
            ends[term].add(toks[i + 1][0])
        if i > 0:
            begins[term].add(toks[i - 1][0])

    tok_col = " ".join(uniq)
    off_col = "".join(
        ";".join(f"{a},{b}" for a, b in offsets[t]) + ";." for t in uniq)
    pos_col = "".join(
        ";".join(str(p) for p in positions[t]) + ";." for t in uniq)
    row = [title, body, tok_col, off_col, pos_col]
    if with_blooms:
        row.append("".join(" ".join(sorted(ends[t])) + "!" for t in uniq))
        row.append("".join(" ".join(sorted(begins[t])) + "!" for t in uniq))
    return row


def parse_wiki_abstract_xml(path: str) -> Iterator[Tuple[str, str]]:
    """Yield (title, abstract) from an enwiki abstract dump
    (<feed><doc><title/><abstract/>...</doc>...</feed>) — the input format
    of scripts/generate_linedoc.py."""
    for _event, elem in ET.iterparse(path, events=("end",)):
        if elem.tag == "doc":
            title = elem.findtext("title") or ""
            abstract = elem.findtext("abstract") or ""
            yield title, abstract
            elem.clear()


def wiki_xml_to_linedoc(xml_path: str, out_path: str,
                        n_docs: Optional[int] = None,
                        with_blooms: bool = True) -> int:
    """The generate_linedoc.py + tokenize_wiki_linedoc.py pipeline in one
    pass: wiki abstract XML -> tokenized linedoc."""
    from wiser_tpu.linedoc import write_linedoc

    rows = []
    for i, (title, abstract) in enumerate(parse_wiki_abstract_xml(xml_path)):
        if n_docs is not None and i >= n_docs:
            break
        if not abstract.strip():
            continue
        rows.append(doc_to_linedoc_cols(title, abstract, with_blooms))
    write_linedoc(out_path, rows, with_bloom=with_blooms)
    return len(rows)


def text_corpus_to_linedoc(docs: Iterable[Tuple[str, str]], out_path: str,
                           with_blooms: bool = True) -> int:
    """Generic (title, body) corpus -> linedoc."""
    from wiser_tpu.linedoc import write_linedoc

    rows = [doc_to_linedoc_cols(t, b, with_blooms) for t, b in docs]
    write_linedoc(out_path, rows, with_bloom=with_blooms)
    return len(rows)

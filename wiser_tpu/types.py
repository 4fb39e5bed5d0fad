"""Core value types.

Mirrors the semantic surface of the reference's ``types.h`` (DocInfo at
types.h:96-202, SearchQuery at types.h:233-291, SearchResultEntry /
SearchResult below it) without any of its C++ string-churn; parsing of the
packed linedoc columns lives in :mod:`wiser_tpu.linedoc`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

# A (start, end) byte-offset pair into the document body, used for
# highlighting (reference: OffsetPairs in types.h).
OffsetPair = Tuple[int, int]


@dataclass
class DocInfo:
    """One parsed linedoc row (reference: DocInfo, types.h:96-202).

    ``tokens`` holds the *unique* terms of the document; ``offsets`` and
    ``positions`` are per-unique-term groups (see testdata fixtures, e.g.
    iter_test_3_docs_tf_bi-bloom).
    """

    body: str = ""
    tokens: str = ""
    token_offsets: str = ""
    token_positions: str = ""
    phrase_begins: str = ""
    phrase_ends: str = ""
    format: str = "TOKEN_ONLY"

    def get_tokens(self) -> List[str]:
        # reference: utils::explode(tokens_, ' ') — skips empty fields
        # (types.cc:5-7)
        return [t for t in self.tokens.split(" ") if t]

    def get_offset_pairs_vec(self) -> List[List[OffsetPair]]:
        # reference: utils::parse_offsets (types.cc:11-13); format
        # "0,1;2,3;.4,5;." — '.' separates per-term groups, ';' pairs.
        table: List[List[OffsetPair]] = []
        groups = [g for g in self.token_offsets.split(".") if g != ""]
        for group in groups:
            row: List[OffsetPair] = []
            for pair in group.split(";"):
                if pair == "":
                    continue
                a, b = pair.split(",")
                row.append((int(a), int(b)))
            table.append(row)
        return table

    def get_positions(self) -> List[List[int]]:
        # reference: types.cc:17-36; format "0;1;.2;."
        table: List[List[int]] = []
        groups = [g for g in self.token_positions.split(".") if g != ""]
        for group in groups:
            table.append([int(p) for p in group.split(";") if p != ""])
        return table

    @staticmethod
    def _parse_phrase_elems(s: str) -> List[str]:
        # reference: ParsePhraseElems (types.cc:42-50) — explode_strict
        # by '!' then drop the trailing empty element.
        ret = s.split("!")
        if ret:
            ret.pop()
        return ret

    def get_phrase_ends(self) -> List[str]:
        return self._parse_phrase_elems(self.phrase_ends)

    def get_phrase_begins(self) -> List[str]:
        return self._parse_phrase_elems(self.phrase_begins)

    def body_length(self) -> int:
        # reference: count_terms = explode(body, ' ').size()
        # (utils.cc:163-165) — number of non-empty space-separated terms.
        return len([t for t in self.body.split(" ") if t])


@dataclass
class SearchQuery:
    """reference: SearchQuery (types.h:233-291)."""

    terms: List[str]
    n_results: int = 5
    return_snippets: bool = False
    n_snippet_passages: int = 3
    is_phrase: bool = False


@dataclass
class SearchResultEntry:
    """reference: SearchResultEntry (types.h)."""

    doc_id: int
    doc_score: float
    snippet: str = ""


class SearchResult:
    """Top-k result. Backed either by an eager entry list or lazily by
    (doc_ids, scores) arrays — the batched engine fills arrays to avoid
    per-entry Python object churn on 32k-query batches; `.entries`
    materializes on first access."""

    __slots__ = ("_entries", "_docs", "_scores")

    def __init__(self, entries: list = None):
        self._entries = entries if entries is not None else []
        self._docs = None
        self._scores = None

    def set_arrays(self, docs, scores) -> None:
        self._docs = docs
        self._scores = scores

    @property
    def entries(self) -> List[SearchResultEntry]:
        if self._docs is not None:
            self._entries = [
                SearchResultEntry(int(d), float(s))
                for d, s in zip(self._docs, self._scores)
            ] + self._entries
            self._docs = None
            self._scores = None
        return self._entries

    def size(self) -> int:
        if self._docs is not None:
            return len(self._docs) + len(self._entries)
        return len(self._entries)

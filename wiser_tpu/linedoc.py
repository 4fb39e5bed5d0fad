"""Linedoc (TSV corpus) readers — reference: engine_loader.h:10-133.

A linedoc file starts with a header line
``FIELDS_HEADER_INDICATOR###\tdoctitle\tbody\ttokenized\toffsets\tpositions...``
followed by one TSV row per document. Column indices (engine_loader.h):
  0 doctitle, 1 body, 2 tokenized (unique terms), 3 offsets, 4 positions,
  5 bloom (phrase ends), 6 bloom_before (phrase begins).

Formats (reference parser classes → format string):
  LineDocParserToken      TOKEN_ONLY       body=tokens=col2
  LineDocParserOffset     WITH_OFFSETS     cols 1..3
  LineDocParserPosition   WITH_POSITIONS   cols 1..4
  LineDocParserPhraseEnd  WITH_PHRASE_END  cols 1..5
  LineDocParserBiBloom    WITH_BI_BLOOM    cols 1..6 (begins=col6, ends=col5)
"""

from __future__ import annotations

from typing import Iterator, Optional

from wiser_tpu.types import DocInfo

FORMATS = (
    "TOKEN_ONLY",
    "WITH_OFFSETS",
    "WITH_POSITIONS",
    "WITH_PHRASE_END",
    "WITH_BI_BLOOM",
)


def _parse_row(items: list[str], fmt: str) -> DocInfo:
    if fmt == "TOKEN_ONLY":
        # reference: DocInfo(items[2], items[2], "", "", ...) (engine_loader.h:63-65)
        return DocInfo(body=items[2], tokens=items[2], format=fmt)
    if fmt == "WITH_OFFSETS":
        return DocInfo(body=items[1], tokens=items[2], token_offsets=items[3], format=fmt)
    if fmt == "WITH_POSITIONS":
        return DocInfo(
            body=items[1], tokens=items[2], token_offsets=items[3],
            token_positions=items[4], format=fmt,
        )
    if fmt == "WITH_PHRASE_END":
        return DocInfo(
            body=items[1], tokens=items[2], token_offsets=items[3],
            token_positions=items[4], phrase_ends=items[5], format=fmt,
        )
    if fmt == "WITH_BI_BLOOM":
        # reference: DocInfo(items[1..4], items[6]=begins, items[5]=ends)
        # (engine_loader.h:117-127)
        return DocInfo(
            body=items[1], tokens=items[2], token_offsets=items[3],
            token_positions=items[4], phrase_begins=items[6],
            phrase_ends=items[5], format=fmt,
        )
    raise ValueError(f"Format {fmt} is not supported")


def parse_linedoc(path: str, fmt: str, n_rows: Optional[int] = None) -> Iterator[DocInfo]:
    """Yield DocInfo per row; skips the header line (utils.h LineDoc:54-67).

    Rows are split strictly on tabs (explode_strict, utils.h:74): empty
    columns are preserved.
    """
    if fmt not in FORMATS:
        raise ValueError(f"Format {fmt} is not supported")
    count = 0
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        f.readline()  # header
        for line in f:
            if n_rows is not None and count >= n_rows:
                return
            line = line.rstrip("\n")
            if not line:
                continue
            items = line.split("\t")
            yield _parse_row(items, fmt)
            count += 1


def write_linedoc(path: str, rows: list[list[str]], with_bloom: bool = False) -> None:
    """Write a linedoc file (test fixtures / synthetic corpora).

    Each row is the full TSV column list starting at doctitle.
    """
    header_cols = ["doctitle", "body", "tokenized", "offsets", "positions"]
    if with_bloom:
        header_cols += ["bloom", "bloom_before"]
    with open(path, "w", encoding="utf-8") as f:
        f.write("FIELDS_HEADER_INDICATOR###\t" + "\t".join(header_cols) + "\n")
        for row in rows:
            f.write("\t".join(row) + "\n")

"""Plain-text payload parser (dialect C): whitespace-tokenized degenerate
path.

Each newline-separated line becomes a LINE block; words are whitespace
tokens; all words are CONTENT except date-shaped words (DATE).  Empty
payloads produce an empty TurnBlocks, which the pipeline drops — the
reference's empty-page rule (``notebooks/src/code/data/base.py:419-428``).
"""

from __future__ import annotations

from .blocks import CLS_CONTENT, CLS_DATE, DATE_WORD_RE, TurnBlocks, from_word_lists


def parse_plain(payload: str) -> TurnBlocks:
    line_words, line_hints = plain_line_spec(payload)
    if not line_words:
        return TurnBlocks()
    return from_word_lists(
        line_words,
        line_pages=[0] * len(line_words),
        line_hints=line_hints,
        line_links=[[0] * len(ws) for ws in line_words],
    )


def plain_line_spec(
    payload: str,
) -> tuple[list[list[str]], list[list[int]]]:
    """(line_words, line_hints) for one plain-text payload (links are all
    zero; the batch path passes None and lets the builder default them)."""
    line_words: list[list[str]] = []
    line_hints: list[list[int]] = []
    for raw_line in payload.split("\n"):
        ws = raw_line.split()
        if not ws:
            continue
        line_words.append(ws)
        line_hints.append([CLS_DATE if DATE_WORD_RE.match(w) else CLS_CONTENT
                           for w in ws])
    return line_words, line_hints

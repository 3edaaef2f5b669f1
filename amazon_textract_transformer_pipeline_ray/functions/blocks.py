"""Per-turn block-tree intermediate representation.

The reference's central structure is the Textract-style PAGE/LINE/WORD block
tree (``notebooks/preproc/textract_transformers/ocr_engines/base.py:274-294``),
navigated page -> line -> word (``fn-postprocess/util/extract.py:103-130``).
We represent one turn's tree as parallel per-word numpy arrays, built and
consumed *inside* ``map_batches`` — the tree itself is never shuffled
(SURVEY.md §1.6).

Class-hint assignment is a parser responsibility (the parser has DOM/layout
context); the classifier turns hints into calibrated per-token probability
vectors, mirroring how the reference's SageMaker NER model consumes
word/box lists built by the data layer (``notebooks/src/code/data/base.py:337-417``).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

import numpy as np

# Class ids (see config.default_field_config): 0 content, 1 title, 2 code,
# 3 date, 4 caption (ignored), 5 summary, 6 other/boilerplate.
CLS_CONTENT, CLS_TITLE, CLS_CODE, CLS_DATE, CLS_CAPTION, CLS_SUMMARY, CLS_OTHER = range(7)

# Single-word date patterns (a closed set — the generator emits these shapes).
DATE_WORD_RE = re.compile(
    r"^(\d{4}-\d{2}-\d{2}|\d{1,2}/\d{1,2}/\d{4}|\d{2}\.\d{2}\.\d{4})[.,;:]?$"
)


_CONF_MEMO: dict[str, float] = {}


def word_ocr_confidence(word: str) -> float:
    """Deterministic synthetic OCR confidence in [90, 100) (0-100 scale, as
    Textract emits — ``ocr_engines/base.py:173-181``). crc32 is stable
    across processes, unlike ``hash``.  Memoized (corpus vocabularies are
    heavy-tailed; the memo is bounded and worker-local)."""
    c = _CONF_MEMO.get(word)
    if c is None:
        c = 90.0 + (zlib.crc32(word.encode("utf-8")) % 1000) / 100.0
        if len(_CONF_MEMO) < 200_000:
            _CONF_MEMO[word] = c
    return c


@dataclass
class TurnBlocks:
    """Parallel per-word arrays for one turn (empty arrays = empty turn)."""

    words: list[str] = field(default_factory=list)
    page_id: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int16))   # 0-based
    line_id: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int32))   # 0-based, global within turn
    boxes01: np.ndarray = field(default_factory=lambda: np.zeros((0, 4)))        # x0,y0,x1,y1 in 0-1
    ocr_conf: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float64))  # 0-100
    hint: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int16))      # parser class hint
    link: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int8))       # inside <a>
    pre_class: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int16)) # -1 = not pre-annotated
    pre_conf: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float64))

    @property
    def n_words(self) -> int:
        return len(self.words)

    def finalize(self) -> "TurnBlocks":
        """Validate invariants (cf. bbox range enforcement,
        ocr_engines/base.py:63-68)."""
        n = len(self.words)
        assert len(self.page_id) == n and len(self.line_id) == n
        assert self.boxes01.shape == (n, 4)
        if n:
            assert float(self.boxes01.min()) >= 0.0 and float(self.boxes01.max()) <= 1.0, (
                "box coords must be page-normalized 0-1"
            )
        return self


def from_word_lists(
    line_words: list[list[str]],
    line_pages: list[int],
    line_hints: list[list[int]] | None = None,
    line_links: list[list[int]] | None = None,
    page_line_counts: dict[int, int] | None = None,
) -> TurnBlocks:
    """Build a TurnBlocks from per-line word lists with synthetic geometry.

    Geometry mirrors the Tesseract adapter's page-normalized layout contract
    (``ocr_engines/eng_tesseract.py:107-154``): line i of a page occupies the
    horizontal band [i/n, (i+0.9)/n); word j of m occupies [j/m, (j+0.9)/m).
    """
    tb = TurnBlocks()
    if not line_words:
        return tb
    n_lines_total = len(line_words)
    counts = np.fromiter(map(len, line_words), dtype=np.int64,
                         count=n_lines_total)
    n = int(counts.sum())
    if n == 0:
        return tb

    pages_arr = np.asarray(line_pages, dtype=np.int64)
    if page_line_counts is None:
        upages, ucounts = np.unique(pages_arr, return_counts=True)
        page_line_counts = dict(zip(upages.tolist(), ucounts.tolist()))
    # row index of each line within its page (order-preserving cumcount):
    row_in_page = np.zeros(n_lines_total, dtype=np.int64)
    for p in np.unique(pages_arr):
        ix = np.flatnonzero(pages_arr == p)
        row_in_page[ix] = np.arange(len(ix))
    lines_per = np.array([max(page_line_counts[int(p)], 1) for p in pages_arr],
                         dtype=np.float64)

    # Per-line geometry bands, repeated out to words (Tesseract-adapter
    # layout contract, vectorized):
    y0_l = row_in_page / lines_per
    y1_l = np.minimum((row_in_page + 0.9) / lines_per, 1.0)
    m_l = np.maximum(counts, 1).astype(np.float64)

    line_ix = np.repeat(np.arange(n_lines_total), counts)
    word_j = np.arange(n, dtype=np.float64) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.float64), counts)
    m_w = m_l[line_ix]
    boxes01 = np.empty((n, 4), dtype=np.float64)
    boxes01[:, 0] = word_j / m_w
    boxes01[:, 1] = y0_l[line_ix]
    boxes01[:, 2] = np.minimum((word_j + 0.9) / m_w, 1.0)
    boxes01[:, 3] = y1_l[line_ix]

    words: list[str] = [w for lw in line_words for w in lw]
    tb.words = words
    tb.page_id = pages_arr[line_ix].astype(np.int16)
    tb.line_id = line_ix.astype(np.int32)
    tb.boxes01 = boxes01
    tb.ocr_conf = np.fromiter(map(word_ocr_confidence, words),
                              dtype=np.float64, count=n)
    if line_hints is not None:
        tb.hint = np.fromiter((h for lh in line_hints for h in lh),
                              dtype=np.int16, count=n)
    else:
        tb.hint = np.full(n, CLS_CONTENT, dtype=np.int16)
    if line_links is not None:
        tb.link = np.fromiter((k for ll in line_links for k in ll),
                              dtype=np.int8, count=n)
    else:
        tb.link = np.zeros(n, dtype=np.int8)
    tb.pre_class = np.full(n, -1, dtype=np.int16)
    tb.pre_conf = np.zeros(n, dtype=np.float64)
    return tb.finalize()


def from_word_lists_batch(
    specs: list[tuple[list[list[str]], list[list[int]] | None,
                      list[list[int]] | None]],
) -> list[TurnBlocks]:
    """Batched single-page ``from_word_lists`` over many turns.

    Each spec is ``(line_words, line_hints, line_links)`` with all lines
    on page 0 — the shape both built-in line parsers (html/plain) emit.
    Field-for-field equal to calling ``from_word_lists(line_words,
    [0]*n_lines, ...)`` per turn (pinned by tests); all array math runs
    once over the concatenated line/word axes and per-turn arrays are
    sliced out at the end, removing the ~20-small-numpy-ops-per-turn
    fixed cost (same batching pattern as ``classifier.classify_turns``
    and ``assembler.assemble_turns``)."""
    out: list[TurnBlocks] = [TurnBlocks() for _ in specs]
    act = [i for i, s in enumerate(specs) if s[0]]
    if not act:
        return out

    all_lines: list[list[str]] = []
    lines_per_turn = np.empty(len(act), dtype=np.int64)
    for k, i in enumerate(act):
        lw = specs[i][0]
        all_lines.extend(lw)
        lines_per_turn[k] = len(lw)
    n_lines = len(all_lines)
    counts = np.fromiter(map(len, all_lines), dtype=np.int64, count=n_lines)
    line_turn_start = np.concatenate([[0], np.cumsum(lines_per_turn)])
    n = int(counts.sum())

    # row index of each line within ITS TURN (single page per turn):
    row_in_page = (np.arange(n_lines)
                   - np.repeat(line_turn_start[:-1], lines_per_turn))
    lines_per = np.repeat(np.maximum(lines_per_turn, 1),
                          lines_per_turn).astype(np.float64)

    y0_l = row_in_page / lines_per
    y1_l = np.minimum((row_in_page + 0.9) / lines_per, 1.0)
    m_l = np.maximum(counts, 1).astype(np.float64)

    line_ix = np.repeat(np.arange(n_lines), counts)
    word_j = np.arange(n, dtype=np.float64) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.float64),
        counts)
    m_w = m_l[line_ix]
    boxes01 = np.empty((n, 4), dtype=np.float64)
    boxes01[:, 0] = word_j / m_w
    boxes01[:, 1] = y0_l[line_ix]
    boxes01[:, 2] = np.minimum((word_j + 0.9) / m_w, 1.0)
    boxes01[:, 3] = y1_l[line_ix]

    words_all: list[str] = [w for lw in all_lines for w in lw]
    ocr_all = np.fromiter(map(word_ocr_confidence, words_all),
                          dtype=np.float64, count=n)
    # per-turn word ranges (every act turn has >= 1 line):
    words_per_turn = np.add.reduceat(counts, line_turn_start[:-1])
    word_turn_start = np.concatenate([[0], np.cumsum(words_per_turn)])
    wpt = words_per_turn.tolist()

    # hints/links: per-line lists, defaulting like from_word_lists does:
    hint_all = np.empty(n, dtype=np.int16)
    link_all = np.zeros(n, dtype=np.int8)
    pos = 0
    for k, i in enumerate(act):
        _, lh, ll = specs[i]
        m = wpt[k]
        if lh is not None:
            hint_all[pos:pos + m] = np.fromiter(
                (h for row in lh for h in row), dtype=np.int16, count=m)
        else:
            hint_all[pos:pos + m] = CLS_CONTENT
        if ll is not None:
            link_all[pos:pos + m] = np.fromiter(
                (x for row in ll for x in row), dtype=np.int8, count=m)
        pos += m

    # local line ids restart at 0 per turn:
    line_local = (line_ix - np.repeat(
        line_turn_start[:-1].astype(np.int64), words_per_turn)
    ).astype(np.int32)
    page_all = np.zeros(n, dtype=np.int16)

    assert n == 0 or (float(boxes01.min()) >= 0.0
                      and float(boxes01.max()) <= 1.0)
    for k, i in enumerate(act):
        s, e = int(word_turn_start[k]), int(word_turn_start[k + 1])
        if s == e:
            continue  # all lines empty -> empty TurnBlocks
        tb = out[i]
        tb.words = words_all[s:e]
        tb.page_id = page_all[s:e]
        tb.line_id = line_local[s:e]
        tb.boxes01 = boxes01[s:e]
        tb.ocr_conf = ocr_all[s:e]
        tb.hint = hint_all[s:e]
        tb.link = link_all[s:e]
        tb.pre_class = np.full(e - s, -1, dtype=np.int16)
        tb.pre_conf = np.zeros(e - s, dtype=np.float64)
    return out

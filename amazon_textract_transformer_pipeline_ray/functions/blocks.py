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


def word_ocr_confidence(word: str) -> float:
    """Deterministic synthetic OCR confidence in [90, 100) (0-100 scale, as
    Textract emits — ``ocr_engines/base.py:173-181``). crc32 is stable
    across processes, unlike ``hash``."""
    return 90.0 + (zlib.crc32(word.encode("utf-8")) % 1000) / 100.0


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
    pages = sorted(set(line_pages))
    if page_line_counts is None:
        page_line_counts = {p: sum(1 for q in line_pages if q == p) for p in pages}
    line_in_page: dict[int, int] = {p: 0 for p in pages}

    words: list[str] = []
    page_id: list[int] = []
    line_id: list[int] = []
    boxes: list[list[float]] = []
    hints: list[int] = []
    links: list[int] = []

    for li, (lw, pg) in enumerate(zip(line_words, line_pages)):
        n_lines = max(page_line_counts[pg], 1)
        row = line_in_page[pg]
        line_in_page[pg] = row + 1
        y0 = row / n_lines
        y1 = min((row + 0.9) / n_lines, 1.0)
        m = max(len(lw), 1)
        for j, w in enumerate(lw):
            words.append(w)
            page_id.append(pg)
            line_id.append(li)
            boxes.append([j / m, y0, min((j + 0.9) / m, 1.0), y1])
            hints.append(line_hints[li][j] if line_hints else CLS_CONTENT)
            links.append(line_links[li][j] if line_links else 0)

    n = len(words)
    tb.words = words
    tb.page_id = np.array(page_id, dtype=np.int16)
    tb.line_id = np.array(line_id, dtype=np.int32)
    tb.boxes01 = np.array(boxes, dtype=np.float64)
    tb.ocr_conf = np.array([word_ocr_confidence(w) for w in words], dtype=np.float64)
    tb.hint = np.array(hints, dtype=np.int16)
    tb.link = np.array(links, dtype=np.int8)
    tb.pre_class = np.full(n, -1, dtype=np.int16)
    tb.pre_conf = np.zeros(n, dtype=np.float64)
    return tb.finalize()

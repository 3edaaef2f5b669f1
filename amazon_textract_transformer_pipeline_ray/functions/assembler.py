"""Span assembler: per-word classes -> entity detections + extracted text.

Reproduces the reference's ``extract_entities``
(``pipeline/postprocessing/fn-postprocess/util/extract.py:93-131``) exactly,
including its quirks:

  * runs of the same class continue across LINE and PAGE boundaries;
  * a detection's page number is the page where the run *ended*
    (extract.py:123 ``ixpage + 1`` evaluated at flush time);
  * a class run still open when the document ends is **never emitted**
    (the loop has no trailing flush);
  * words whose class is unannotated or not in the active (non-ignored)
    config are treated as "other" (extract.py:107-109);
  * detection text: words joined by " " within a line, lines joined by
    "\n", empty line-groups filtered (extract.py:55-60,116-120);
  * detection confidence: min over words of min(PredictedClassConfidence,
    OCR confidence) — note the reference compares the model's 0-1
    confidence against Textract's 0-100 scale as-is (extract.py:46-54);
    we preserve that behavior;
  * detection bounding box: union of word boxes, quantized to 0-1000 ints
    (boxes.py:202-232 + geometry.py:50-64).

``extracted_text`` (the main-content output, the north-rule equality gate)
is defined as: all words whose effective class is in the active config
("content" = not boilerplate/ignored/unannotated), joined with the same
" "/"\n" rules, lines with no content words skipped.  Span (start, end)
are character offsets into ``extracted_text`` — a same-class run is always
contiguous there, so ``extracted_text[start:end] == span text``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .blocks import TurnBlocks
from .geometry import quantize_boxes, union_box


@dataclass
class Detection:
    """EntityDetection analog (extract.py:21-87)."""

    class_id: int
    class_name: str
    page_num: int  # 1-based, page where the run ended
    text: str
    raw_text: str | None  # set when normalized (extract.py:63-72)
    confidence: float
    start: int  # char offset into extracted_text
    end: int
    box: np.ndarray  # (4,) int64 0-1000 x0,y0,x1,y1
    word_ixs: list[int] = field(default_factory=list)


@dataclass
class AssembledTurn:
    extracted_text: str
    detections: list[Detection]
    n_words: int
    n_content_words: int

    @property
    def boilerplate_ratio(self) -> float:
        if self.n_words == 0:
            return 0.0
        return 1.0 - self.n_content_words / self.n_words


def assemble_turn(
    tb: TurnBlocks,
    pred_class: np.ndarray,
    pred_conf: np.ndarray,
    entity_classes: dict[int, str],
) -> AssembledTurn:
    n = tb.n_words
    if n == 0:
        return AssembledTurn("", [], 0, 0)

    boxes1000 = quantize_boxes(tb.boxes01)

    # Effective class: None-equivalent (-1) for anything outside the active
    # config (extract.py:107-109). Vectorized precompute:
    active = np.array(
        [int(c) in entity_classes for c in pred_class.astype(np.int64)], dtype=bool
    )
    eff = np.where(active, pred_class.astype(np.int64), -1)

    # --- extracted_text + per-word char offsets --------------------------
    # Walk lines in order; content words are those with eff >= 0.
    offsets = np.full(n, -1, dtype=np.int64)
    parts: list[str] = []
    pos = 0
    line_has_content_written = False
    prev_line = -1
    for i in range(n):
        if eff[i] < 0:
            continue
        li = int(tb.line_id[i])
        if parts:
            sep = " " if li == prev_line else "\n"
            parts.append(sep)
            pos += 1
        offsets[i] = pos
        w = tb.words[i]
        parts.append(w)
        pos += len(w)
        prev_line = li
        line_has_content_written = True
    extracted_text = "".join(parts)
    del line_has_content_written

    # --- run-length entity extraction (extract.py:101-131) ---------------
    detections: list[Detection] = []
    current_cls = -1  # -1 == the reference's None
    current_entity: list[list[int]] = []  # per-line lists of word indices

    def flush(ixpage: int) -> None:
        word_lines = [ws for ws in current_entity if ws]
        flat = [i for ws in word_lines for i in ws]
        text = "\n".join(" ".join(tb.words[i] for i in ws) for ws in word_lines)
        conf = min(
            min(float(pred_conf[i]), float(tb.ocr_conf[i])) for i in flat
        )
        box = union_box(boxes1000[flat])
        start = int(offsets[flat[0]])
        end = int(offsets[flat[-1]]) + len(tb.words[flat[-1]])
        detections.append(
            Detection(
                class_id=int(current_cls),
                class_name=entity_classes[int(current_cls)],
                page_num=ixpage + 1,
                text=text,
                raw_text=None,
                confidence=conf,
                start=start,
                end=end,
                box=box,
                word_ixs=flat,
            )
        )

    prev_line = -1
    for i in range(n):
        li = int(tb.line_id[i])
        if li != prev_line:
            # new line(s): the reference appends one [] per line it visits;
            # lines with zero words don't exist in our IR, and multiple
            # appends collapse equivalently under the non-empty filter.
            current_entity.append([])
            prev_line = li
        pred = int(eff[i])
        pred_or_none = pred if pred >= 0 else -1
        if pred_or_none != current_cls:
            if current_cls != -1:
                flush(int(tb.page_id[i]))
            current_cls = pred_or_none
            current_entity = [[]] if pred_or_none == -1 else [[i]]
        elif pred_or_none != -1:
            current_entity[-1].append(i)
    # NO trailing flush — reference quirk preserved (extract.py:101-131).

    n_content = int((eff >= 0).sum())
    return AssembledTurn(extracted_text, detections, n, n_content)

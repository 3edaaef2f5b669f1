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

from functools import lru_cache

from .blocks import TurnBlocks
from .geometry import quantize_boxes


@lru_cache(maxsize=64)
def _active_mask(active_ids: tuple[int, ...]) -> tuple[np.ndarray, int]:
    """Boolean lookup table over class id (replaces per-call np.isin)."""
    max_id = max(active_ids) if active_ids else 0
    mask = np.zeros(max_id + 1, dtype=bool)
    mask[list(active_ids)] = True
    return mask, max_id


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
    """Vectorized restatement of the reference loop (extract.py:101-131).

    Equivalences relied on (each pinned by a unit test):
      * a detection = a maximal run of equal effective class >= 0 that is
        FOLLOWED by at least one more word (the trailing run is never
        flushed — the loop has no final flush);
      * the detection's page is the page of the word that triggered the
        flush, i.e. the first word AFTER the run;
      * detection text = extracted_text[start:end] (run words are exactly
        the content words in that char range, with identical " "/"\n"
        join rules).
    """
    n = tb.n_words
    if n == 0:
        return AssembledTurn("", [], 0, 0)

    # Effective class: -1 (the reference's None) outside the active config
    # (extract.py:107-109):
    mask, max_id = _active_mask(tuple(sorted(entity_classes)))
    pc = pred_class.astype(np.int64)
    in_range = (pc >= 0) & (pc <= max_id)
    eff = np.where(in_range & mask[np.clip(pc, 0, max_id)], pc, -1)

    # --- extracted_text + per-word char offsets (vectorized) -------------
    cw = np.flatnonzero(eff >= 0)
    n_content = len(cw)
    if n_content == 0:
        return AssembledTurn("", [], n, 0)
    words = tb.words
    content_words = [words[i] for i in cw]
    word_lens = np.fromiter(map(len, content_words), dtype=np.int64,
                            count=n_content)
    same_line = tb.line_id[cw[1:]] == tb.line_id[cw[:-1]]
    # offset[k] = sum(prev lens) + k separators:
    offs = np.zeros(n_content, dtype=np.int64)
    if n_content > 1:
        offs[1:] = np.cumsum(word_lens[:-1]) + np.arange(1, n_content)
    parts = [""] * (2 * n_content - 1)
    parts[0::2] = content_words
    if n_content > 1:
        parts[1::2] = np.where(same_line, " ", "\n").tolist()
    extracted_text = "".join(parts)
    # char offsets indexed by original word position:
    offsets = np.full(n, -1, dtype=np.int64)
    offsets[cw] = offs

    # --- run-length detection extraction ---------------------------------
    run_starts = np.flatnonzero(np.concatenate([[True], eff[1:] != eff[:-1]]))
    run_ends = np.concatenate([run_starts[1:], [n]])  # exclusive
    run_vals = eff[run_starts]
    # emit runs with class >= 0 that are followed by another word:
    emit = (run_vals >= 0) & (run_ends < n)
    if not emit.any():
        return AssembledTurn(extracted_text, [], n, n_content)

    wconf = np.minimum(pred_conf, tb.ocr_conf)  # mixed 0-1 / 0-100 scales,
    # exactly as the reference compares them (extract.py:46-54)
    boxes1000 = quantize_boxes(tb.boxes01)

    # Per-run folds in one vectorized pass each (runs partition [0, n), so
    # reduceat over run_starts gives every run's G2/G3 fold at once),
    # then gather the emitted runs.  Every word of an emitted run is a
    # content word (class >= 0), so its indices are all present in ``cw``:
    run_conf = np.minimum.reduceat(wconf, run_starts)[emit]
    box_min = np.minimum.reduceat(boxes1000[:, :2], run_starts, axis=0)[emit]
    box_max = np.maximum.reduceat(boxes1000[:, 2:], run_starts, axis=0)[emit]

    starts_e = run_starts[emit]
    ends_e = run_ends[emit]  # all < n by the emit condition
    last_e = ends_e - 1
    det_start = offsets[starts_e]
    det_end = offsets[last_e] + word_lens[np.searchsorted(cw, last_e)]
    det_page = tb.page_id[ends_e]
    vals_e = run_vals[emit]

    detections: list[Detection] = []
    for ri in range(len(starts_e)):
        start = int(det_start[ri])
        end = int(det_end[ri])
        v = int(vals_e[ri])
        detections.append(Detection(
            class_id=v,
            class_name=entity_classes[v],
            page_num=int(det_page[ri]) + 1,  # flush-triggering word's page
            text=extracted_text[start:end],
            raw_text=None,
            confidence=float(run_conf[ri]),
            start=start,
            end=end,
            box=np.array([box_min[ri, 0], box_min[ri, 1],
                          box_max[ri, 0], box_max[ri, 1]], dtype=np.int64),
        ))

    return AssembledTurn(extracted_text, detections, n, n_content)

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

    # one (n_runs, 4) union-box matrix; each Detection.box is a row VIEW
    # (still int64 (4,)) — no per-detection array allocation.  Scalar
    # columns convert to Python once via .tolist() (C loop) instead of
    # per-element int()/float() on numpy scalars:
    det_box = np.concatenate([box_min, box_max], axis=1)
    detections: list[Detection] = []
    for start, end, v, page, conf, ri in zip(
            det_start.tolist(), det_end.tolist(), vals_e.tolist(),
            det_page.tolist(), run_conf.tolist(), range(len(starts_e))):
        detections.append(Detection(
            class_id=v,
            class_name=entity_classes[v],
            page_num=page + 1,  # flush-triggering word's page
            text=extracted_text[start:end],
            raw_text=None,
            confidence=conf,
            start=start,
            end=end,
            box=det_box[ri],
        ))

    return AssembledTurn(extracted_text, detections, n, n_content)


def assemble_turns(
    tbs: list[TurnBlocks],
    preds: list[tuple[np.ndarray, np.ndarray]],
    entity_classes: dict[int, str],
) -> list[AssembledTurn]:
    """Batched ``assemble_turn`` over many turns in one vectorized pass.

    Same contract as calling ``assemble_turn(tbs[i], *preds[i], ...)`` per
    turn (the per-turn function stays the spec; equality over the fixture
    corpus is pinned by tests).  All per-word array math — effective
    class, char offsets, run segmentation, the G2/G3 reduceat folds —
    runs ONCE over the concatenated word axis with an explicit turn-id
    array keeping runs and line comparisons from crossing turn
    boundaries; only the string join and Detection construction stay
    per turn (inherently per-document Python work).  This removes the
    ~25-small-numpy-ops-per-turn fixed overhead that dominates short
    conversational turns, exactly like ``classifier.classify_turns``.

    Empty turns (``n_words == 0``) are allowed and yield
    ``AssembledTurn("", [], 0, 0)``.
    """
    n_turns = len(tbs)
    out: list[AssembledTurn | None] = [None] * n_turns
    act = [i for i in range(n_turns) if tbs[i].n_words > 0]
    for i in range(n_turns):
        if tbs[i].n_words == 0:
            out[i] = AssembledTurn("", [], 0, 0)
    if not act:
        return out  # type: ignore[return-value]

    mask, max_id = _active_mask(tuple(sorted(entity_classes)))

    n_words_arr = np.array([tbs[i].n_words for i in act], dtype=np.int64)
    turn_start = np.concatenate([[0], np.cumsum(n_words_arr)])
    total = int(turn_start[-1])
    turn_id = np.repeat(np.arange(len(act), dtype=np.int64), n_words_arr)

    pc = np.concatenate([preds[i][0] for i in act]).astype(np.int64)
    conf_g = np.concatenate([preds[i][1] for i in act])
    line_g = np.concatenate([tbs[i].line_id for i in act]).astype(np.int64)
    page_g = np.concatenate([tbs[i].page_id for i in act])
    ocr_g = np.concatenate([tbs[i].ocr_conf for i in act])
    boxes_g = np.concatenate([tbs[i].boxes01 for i in act], axis=0)
    words_g: list[str] = []
    for i in act:
        words_g.extend(tbs[i].words)

    in_range = (pc >= 0) & (pc <= max_id)
    eff = np.where(in_range & mask[np.clip(pc, 0, max_id)], pc, -1)

    # --- content words, per-turn char offsets, extracted_text ------------
    cw = np.flatnonzero(eff >= 0)  # global content positions (sorted)
    tid_c = turn_id[cw]
    content_words = [words_g[i] for i in cw.tolist()]
    m_total = len(cw)
    n_content_per = np.bincount(tid_c, minlength=len(act)).astype(np.int64)

    texts = [""] * len(act)
    offsets = np.full(total, -1, dtype=np.int64)
    word_lens = np.zeros(0, dtype=np.int64)
    if m_total:
        word_lens = np.fromiter(map(len, content_words), dtype=np.int64,
                                count=m_total)
        # segmented exclusive prefix over (len + 1 separator), reset per
        # turn: offs_k = cs_k - cs_base(turn) + local_rank_k
        cs = np.concatenate([[0], np.cumsum(word_lens)[:-1]])
        seg_start = np.flatnonzero(
            np.concatenate([[True], tid_c[1:] != tid_c[:-1]]))
        seg_len = np.diff(np.concatenate([seg_start, [m_total]]))
        base = np.repeat(cs[seg_start], seg_len)
        rank = np.arange(m_total) - np.repeat(seg_start, seg_len)
        offs = cs - base + rank
        offsets[cw] = offs
        # separator between consecutive content words (valid only within
        # a turn; per-turn slices below never cross a boundary):
        same_line = line_g[cw[1:]] == line_g[cw[:-1]]
        seps = np.where(same_line, " ", "\n").tolist()
        seg_turn = tid_c[seg_start].tolist()
        seg_bounds = np.concatenate([seg_start, [m_total]]).tolist()
        for k, t in enumerate(seg_turn):
            s, e = seg_bounds[k], seg_bounds[k + 1]
            m = e - s
            parts = [""] * (2 * m - 1)
            parts[0::2] = content_words[s:e]
            if m > 1:
                parts[1::2] = seps[s:e - 1]
            texts[t] = "".join(parts)

    dets: list[list[Detection]] = [[] for _ in act]

    # --- run-length detections across the global word axis ---------------
    if m_total:
        brk = np.concatenate(
            [[True], (eff[1:] != eff[:-1]) | (turn_id[1:] != turn_id[:-1])])
        run_starts = np.flatnonzero(brk)
        run_ends = np.concatenate([run_starts[1:], [total]])
        run_vals = eff[run_starts]
        # emit: class >= 0 and another word follows IN THE SAME TURN
        # (the reference loop never flushes the trailing run):
        emit = (run_vals >= 0) & (run_ends < turn_start[
            turn_id[run_starts] + 1])
        if emit.any():
            wconf = np.minimum(conf_g, ocr_g)
            boxes1000 = quantize_boxes(boxes_g)
            run_conf = np.minimum.reduceat(wconf, run_starts)[emit]
            box_min = np.minimum.reduceat(
                boxes1000[:, :2], run_starts, axis=0)[emit]
            box_max = np.maximum.reduceat(
                boxes1000[:, 2:], run_starts, axis=0)[emit]
            starts_e = run_starts[emit]
            ends_e = run_ends[emit]
            last_e = ends_e - 1
            det_start = offsets[starts_e]
            det_end = offsets[last_e] + word_lens[
                np.searchsorted(cw, last_e)]
            det_page = page_g[ends_e]
            det_tid = turn_id[starts_e]
            det_box = np.concatenate([box_min, box_max], axis=1)
            vals_e = run_vals[emit]
            for start, end, v, page, conf, t, ri in zip(
                    det_start.tolist(), det_end.tolist(), vals_e.tolist(),
                    det_page.tolist(), run_conf.tolist(), det_tid.tolist(),
                    range(len(starts_e))):
                dets[t].append(Detection(
                    class_id=v,
                    class_name=entity_classes[v],
                    page_num=page + 1,
                    text=texts[t][start:end],
                    raw_text=None,
                    confidence=conf,
                    start=start,
                    end=end,
                    box=det_box[ri],
                ))

    for t, i in enumerate(act):
        out[i] = AssembledTurn(texts[t], dets[t], int(n_words_arr[t]),
                               int(n_content_per[t]))
    return out  # type: ignore[return-value]

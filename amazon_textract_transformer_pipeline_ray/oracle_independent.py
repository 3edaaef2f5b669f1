"""INDEPENDENT reference-semantics oracle.

A deliberately naive, loop-style, row-at-a-time re-implementation of the
whole per-turn contract — parser hint rules, synthetic geometry, tokenizer
/ splitter windows, classifier logit spec, run-length span assembly
(``fn-postprocess/util/extract.py:93-131`` shape), normalization and field
consolidation (``fn-postprocess/main.py:84-180``) — sharing NO code with
``functions/`` (only ``config`` for the field configuration and frozen
class-id constants).  ``tests/test_oracle_independent.py`` asserts the
vectorized engine matches this implementation value-for-value, so a bug in
either implementation of the shared frozen spec is caught by divergence.

Spec sources (duplicated here on purpose):
  * hint rules / tag vocabulary: ``functions/html_parser.py`` module doc
  * geometry bands + crc32 OCR confidence: ``functions/blocks.py``
  * tokenizer: 1 + (L-1)//4 tokens per word
  * splitter: reference ``splitting.py:63-144`` semantics
  * classifier logits: ``functions/classifier.py:token_probs`` docstring
  * assembly/consolidation: reference extract.py / main.py semantics
"""

from __future__ import annotations

import json
import re
import zlib
from datetime import datetime

import numpy as np

from .config import EngineConfig

# Frozen class ids (blocks.py):
CONTENT, TITLE, CODE, DATE, CAPTION, SUMMARY, OTHER = range(7)

DATE_RE = re.compile(
    r"^(\d{4}-\d{2}-\d{2}|\d{1,2}/\d{1,2}/\d{4}|\d{2}\.\d{2}\.\d{4})[.,;:]?$")

# ---------------------------------------------------------------------------
# Parsers (independent implementations of the frozen payload dialects)
# ---------------------------------------------------------------------------

_BLOCK_TAGS = set(("p div h1 h2 h3 li ul ol nav header footer aside main "
                   "article pre blockquote title figcaption table tr td br "
                   "hr").split())
_RAW_SKIP = {"script", "style"}
_INLINE = set("a span em strong b i code u small".split())
_KNOWN = _BLOCK_TAGS | _RAW_SKIP | _INLINE | {"html", "head", "body"}
_HINT_TAGS = {"pre": CODE, "code": CODE, "h1": TITLE, "h2": TITLE,
              "h3": TITLE, "title": TITLE, "nav": OTHER, "header": OTHER,
              "footer": OTHER, "aside": OTHER, "figcaption": CAPTION,
              "blockquote": SUMMARY}
_TOK = re.compile(r"<!--.*?(?:-->|$)|<[^>]*>|[^<]+", re.DOTALL)


class _Words:
    """Accumulates (word, page, line, hint, link) tuples line by line."""

    def __init__(self):
        self.lines: list[list[tuple[str, int, int]]] = []  # (word, hint, link)
        self.line_pages: list[int] = []
        self._cur: list[tuple[str, int, int]] = []
        self._cur_page = 0

    def add(self, word: str, hint: int, link: int, page: int = 0) -> None:
        self._cur.append((word, hint, link))
        self._cur_page = page

    def flush(self) -> None:
        if self._cur:
            self.lines.append(self._cur)
            self.line_pages.append(self._cur_page)
            self._cur = []


def _parse_html_words(payload: str) -> _Words:
    acc = _Words()
    stack: list[str] = []
    link_depth = 0
    skip_until = None
    for m in _TOK.finditer(payload):
        tok = m.group()
        if tok[0] != "<":
            if skip_until is not None:
                continue
            ws = tok.split()
            if not ws:
                continue
            hint = None
            for tag in reversed(stack):
                if tag in _HINT_TAGS:
                    hint = _HINT_TAGS[tag]
                    break
            if hint is None:
                hint = OTHER if link_depth > 0 else CONTENT
            link = 1 if link_depth > 0 else 0
            for w in ws:
                h = hint
                if hint == CONTENT and DATE_RE.match(w):
                    h = DATE
                acc.add(w, h, link)
            continue
        if tok.startswith("<!--"):
            continue
        body = tok[1:-1].strip() if tok.endswith(">") else tok[1:].strip()
        if not body:
            continue
        closing = body.startswith("/")
        selfclosing = body.endswith("/")
        name = body.strip("/").split(None, 1)[0].lower() if body.strip("/") else ""
        if skip_until is not None:
            if closing and name == skip_until:
                skip_until = None
            continue
        if name not in _KNOWN:
            continue
        if not closing and name in _RAW_SKIP and not selfclosing:
            skip_until = name
            continue
        if name in _BLOCK_TAGS:
            acc.flush()
        if name in ("br", "hr") or selfclosing:
            continue
        if closing:
            if name == "a" and link_depth > 0:
                link_depth -= 1
            if name in stack:
                while stack:
                    if stack.pop() == name:
                        break
        else:
            if name == "a":
                link_depth += 1
            stack.append(name)
    acc.flush()
    return acc


def _parse_plain_words(payload: str) -> _Words:
    acc = _Words()
    for raw in payload.split("\n"):
        ws = raw.split()
        if not ws:
            continue
        for w in ws:
            acc.add(w, DATE if DATE_RE.match(w) else CONTENT, 0)
        acc.flush()
    return acc


class _Turn:
    """Per-word parallel lists for one turn, built by any parser."""

    def __init__(self):
        self.words: list[str] = []
        self.page: list[int] = []
        self.line: list[int] = []
        self.box: list[list[float]] = []   # x0 y0 x1 y1 in 0-1
        self.conf: list[float] = []        # 0-100
        self.hint: list[int] = []
        self.link: list[int] = []
        self.pre_class: list[int] = []
        self.pre_conf: list[float] = []


def _grid_geometry(acc: _Words) -> _Turn:
    """Synthetic band geometry (blocks.from_word_lists spec)."""
    t = _Turn()
    n_lines_by_page: dict[int, int] = {}
    for p in acc.line_pages:
        n_lines_by_page[p] = n_lines_by_page.get(p, 0) + 1
    row_seen: dict[int, int] = {}
    for li, (line, pg) in enumerate(zip(acc.lines, acc.line_pages)):
        nl = max(n_lines_by_page[pg], 1)
        row = row_seen.get(pg, 0)
        row_seen[pg] = row + 1
        y0 = row / nl
        y1 = min((row + 0.9) / nl, 1.0)
        m = max(len(line), 1)
        for j, (w, h, lk) in enumerate(line):
            t.words.append(w)
            t.page.append(pg)
            t.line.append(li)
            t.box.append([j / m, y0, min((j + 0.9) / m, 1.0), y1])
            t.conf.append(90.0 + (zlib.crc32(w.encode()) % 1000) / 100.0)
            t.hint.append(h)
            t.link.append(lk)
            t.pre_class.append(-1)
            t.pre_conf.append(0.0)
    return t


def _parse_layout(payload: str) -> _Turn:
    doc = json.loads(payload)
    if isinstance(doc, list):
        merged = dict(doc[0])
        for nxt in doc[1:]:
            for k, v in nxt.items():
                if isinstance(v, list):
                    merged[k] = list(merged.get(k, [])) + v
                elif k not in merged:
                    merged[k] = v
        doc = merged
    blocks = doc.get("Blocks", [])
    by_id = {b["Id"]: b for b in blocks}

    def children(block):
        for rel in block.get("Relationships", []) or []:
            if rel.get("Type") == "CHILD":
                return rel.get("Ids", [])
        return []

    t = _Turn()
    gline = 0
    pages = [b for b in blocks if b.get("BlockType") == "PAGE"]
    for ixpage, page in enumerate(pages):
        first_line = ixpage == 0
        for lid in children(page):
            lb = by_id.get(lid)
            if lb is None or lb.get("BlockType") != "LINE":
                continue
            emitted = False
            for wid in children(lb):
                wb = by_id.get(wid)
                if wb is None or wb.get("BlockType") != "WORD":
                    continue
                text = wb.get("Text", "")
                bb = wb["Geometry"]["BoundingBox"]
                t.words.append(text)
                t.page.append(ixpage)
                t.line.append(gline)
                x0, y0 = bb["Left"], bb["Top"]
                t.box.append([
                    min(max(x0, 0.0), 1.0), min(max(y0, 0.0), 1.0),
                    min(max(x0 + bb["Width"], 0.0), 1.0),
                    min(max(y0 + bb["Height"], 0.0), 1.0)])
                t.conf.append(float(wb.get("Confidence", 100.0)))
                if "PredictedClass" in wb:
                    t.pre_class.append(int(wb["PredictedClass"]))
                    t.pre_conf.append(
                        float(wb.get("PredictedClassConfidence", 1.0)))
                    t.hint.append(int(wb["PredictedClass"]))
                else:
                    t.pre_class.append(-1)
                    t.pre_conf.append(0.0)
                    if first_line:
                        t.hint.append(TITLE)
                    elif DATE_RE.match(text):
                        t.hint.append(DATE)
                    else:
                        t.hint.append(CONTENT)
                t.link.append(0)
                emitted = True
            if emitted:
                gline += 1
                first_line = False
    return t


def _parse(payload: str) -> _Turn:
    head = payload.lstrip()[:1]
    if head in ("{", "["):
        try:
            return _parse_layout(payload)
        except (ValueError, KeyError, TypeError):
            return _grid_geometry(_parse_plain_words(payload))
    if "<" in payload[:4096]:
        return _grid_geometry(_parse_html_words(payload))
    return _grid_geometry(_parse_plain_words(payload))


# ---------------------------------------------------------------------------
# Classifier (tokenize -> split -> per-token probs -> per-word multiset mean)
# ---------------------------------------------------------------------------

def _split_windows(word_start: list, total: int, max_seq_len: int):
    """Splitter (reference NaiveExampleSplitter semantics, loop-style)."""
    n = len(word_start)
    windows = []
    isw = 0
    while isw < n:
        st = word_start[isw]
        et = st
        iew = isw
        while iew < n:
            nxt = iew + 1
            net = word_start[nxt] if nxt < n else total
            if net - st > max_seq_len:
                break
            iew = nxt
            et = net
        if et == st:  # oversized single word: skip
            isw += 1
            continue
        if et - st < max_seq_len * 0.5:
            while isw > 0:
                pisw = isw - 1
                pst = word_start[pisw]
                if et - pst > max_seq_len:
                    break
                isw = pisw
                st = pst
        windows.append((isw, iew))
        isw = iew
    return windows


def _classify(t: _Turn, n_classes: int, max_seq_len: int):
    n = len(t.words)
    n_tok = [1 + max(len(w) - 1, 0) // 4 for w in t.words]
    word_start = [0] * n
    for i in range(1, n):
        word_start[i] = word_start[i - 1] + n_tok[i - 1]
    total = word_start[-1] + n_tok[-1] if n else 0

    windows = _split_windows(word_start, total, max_seq_len)

    # per-word accumulation of token prob vectors over every window
    # occurrence (reference inference.py:449-492 defaultdict pattern):
    acc: dict[int, list[np.ndarray]] = {}
    for ws, we in windows:
        for wi in range(ws, we):
            hint = t.hint[wi]
            if not (0 <= hint < n_classes):  # malformed enrichment -> other
                hint = n_classes - 1
            for k in range(n_tok[wi]):
                gix = word_start[wi] + k
                logits = np.zeros(n_classes)
                base = 2.0 + 0.15 * min(len(t.words[wi]), 8) \
                    + 0.05 * ((gix % 5) - 2)
                logits[hint] = base
                logits[n_classes - 1] += 0.8 * t.link[wi]
                e = np.exp(logits - logits.max())
                acc.setdefault(wi, []).append(e / e.sum())

    pred_class = [-1] * n
    pred_conf = [0.0] * n
    for wi, vecs in acc.items():
        mean = np.mean(np.stack(vecs), axis=0)
        arg = int(mean.argmax())
        pred_class[wi] = arg
        pred_conf[wi] = float(mean[arg])
    for wi in range(n):
        if 0 <= t.pre_class[wi] < n_classes:
            pred_class[wi] = t.pre_class[wi]
            pred_conf[wi] = t.pre_conf[wi]
    return pred_class, pred_conf


# ---------------------------------------------------------------------------
# Assembly (reference extract.py:93-131 loop shape) + consolidation
# ---------------------------------------------------------------------------

def _normalize_date(s: str) -> str:
    core = s.strip().rstrip(".,;:")
    for fmt in ("%Y-%m-%d", "%d/%m/%Y", "%d.%m.%Y"):
        try:
            return datetime.strptime(core, fmt).strftime("%Y-%m-%d")
        except ValueError:
            continue
    return s


def oracle_extract_turn(payload: str, cfg: EngineConfig) -> dict | None:
    t = _parse(payload)
    n = len(t.words)
    if n == 0:
        return None
    pred_class, pred_conf = _classify(t, cfg.n_classes, cfg.max_seq_len)

    active = {f.class_id: f.name for f in cfg.fields if not f.ignore}
    eff = [c if c in active else -1 for c in pred_class]

    # extracted_text + per-word char offsets, walking words in block order
    # (join " " within line, "\n" across lines):
    offsets = [-1] * n
    parts: list[str] = []
    pos = 0
    prev_line = None
    n_content = 0
    for i in range(n):
        if eff[i] < 0:
            continue
        if parts:
            sep = " " if t.line[i] == prev_line else "\n"
            parts.append(sep)
            pos += 1
        offsets[i] = pos
        parts.append(t.words[i])
        pos += len(t.words[i])
        prev_line = t.line[i]
        n_content += 1
    extracted_text = "".join(parts)

    # run-length detections: literal loop carrying current run state; a run
    # flushes when the class CHANGES at word i (the flush-triggering word),
    # and the trailing open run is never flushed:
    detections: list[dict] = []
    run_start = 0
    for i in range(1, n):
        if eff[i] != eff[run_start]:
            v = eff[run_start]
            if v >= 0:
                s, e = run_start, i
                conf = min(min(pred_conf[k], t.conf[k]) for k in range(s, e))
                xs0 = min(int(t.box[k][0] * 1000) for k in range(s, e))
                ys0 = min(int(t.box[k][1] * 1000) for k in range(s, e))
                xs1 = max(int(t.box[k][2] * 1000) for k in range(s, e))
                ys1 = max(int(t.box[k][3] * 1000) for k in range(s, e))
                start = offsets[s]
                end = offsets[e - 1] + len(t.words[e - 1])
                detections.append({
                    "class_id": v, "class_name": active[v],
                    "text": extracted_text[start:end], "raw_text": None,
                    "start": start, "end": end, "page": t.page[i] + 1,
                    "x0": xs0, "y0": ys0, "x1": xs1, "y1": ys1,
                    "confidence": conf,
                })
            run_start = i

    # normalization (per-field normalizer with request dedup):
    norm_fields = {f.class_id for f in cfg.fields
                   if f.normalizer == "date_iso" and not f.ignore}
    memo: dict[str, str] = {}
    for d in detections:
        if d["class_id"] in norm_fields:
            if d["text"] not in memo:
                memo[d["text"]] = _normalize_date(d["text"])
            new = memo[d["text"]]
            if d["raw_text"] is None:
                d["raw_text"] = d["text"]
            d["text"] = new

    # consolidation (reference main.py:84-180):
    field_rows, doc_conf = oracle_consolidate(detections, cfg)

    return {
        "extracted_text": extracted_text,
        "boilerplate_ratio": 1.0 - n_content / n if n else 0.0,
        "n_words": n,
        "n_spans": len(detections),
        "spans": detections,
        "doc_confidence": doc_conf,
        # gate at persisted f32 precision (consolidate.TurnFields spec):
        "review_needed": bool(np.float32(doc_conf)
                              < np.float32(cfg.review_threshold)),
        "fields": field_rows,
    }


def oracle_consolidate(detections: list[dict], cfg: EngineConfig):
    """Field consolidation alone (reference main.py:84-180), reusable so
    the driver-oracle fixture writer can re-run it over f32-quantized span
    confidences — the staged pipeline's recompute-from-table semantics
    (stages/normalize.py)."""
    field_rows = []
    doc_confs = []
    for ixtype, f in enumerate([f for f in cfg.fields if not f.ignore]):
        ents = [d for d in detections if d["class_id"] == f.class_id]
        values: dict[str, dict] = {}
        for ixe, d in enumerate(ents):
            if d["text"] in values:
                values[d["text"]]["dets"].append(d)
                values[d["text"]]["last"] = ixe
            else:
                values[d["text"]] = {"text": d["text"], "dets": [d],
                                     "first": ixe, "last": ixe}
        vlist = list(values.values())
        for v in vlist:
            p = 1.0
            for d in v["dets"]:
                p *= 1 - d["confidence"]
            v["conf"] = 1 - p
        tot = sum(v["conf"] for v in vlist)
        for v in vlist:
            v["conf"] = v["conf"] / max(1.0, tot)

        row = {"name": f.name, "class_id": f.class_id,
               "num_detections": len(ents), "num_detected_values": len(vlist),
               "sort_order": ixtype, "optional": f.optional,
               "value": None, "values": [], "confidence": 0.0}
        if f.select is not None:
            keys = {
                "confidence": (lambda v: v["conf"], True),
                "first": (lambda v: v["first"], False),
                "last": (lambda v: v["last"], True),
                "longest": (lambda v: len(v["text"]), True),
                "shortest": (lambda v: len(v["text"]), False),
            }[f.select]
            ordered = sorted(vlist, key=keys[0], reverse=keys[1])
            if ordered:
                row["value"] = ordered[0]["text"]
                row["confidence"] = ordered[0]["conf"]
            else:
                row["value"] = ""
        else:
            ordered = sorted(vlist, key=lambda v: v["conf"], reverse=True)
            row["values"] = [(v["text"], v["conf"]) for v in ordered]
            if ordered:
                row["confidence"] = (sum(v["conf"] for v in ordered)
                                     / len(ordered))
        field_rows.append(row)
        if not (row["confidence"] == 0 and f.optional):
            doc_confs.append(row["confidence"])
    doc_conf = min(doc_confs) if doc_confs else 0.0
    return field_rows, doc_conf


# ---------------------------------------------------------------------------
# Training-export windows (reference ner.py:278-335 chain, loop-style) —
# independent expected values for the x_training_examples / x_task_mlm /
# x_eval_metrics driver views (digest convention shared with
# ``__ray_entry__.py``: md5 over canonical joined strings).
# ---------------------------------------------------------------------------

_IMG_W, _IMG_H = 1600, 2000  # pipelines/training.py synthetic labeling size
_MLM_MASK_PCT = 15           # pipelines/tasks.py deterministic mask rate


def _words_md5(words: list) -> str:
    import hashlib

    return hashlib.md5("\x00".join(words).encode("utf-8")).hexdigest()


def _ints_md5(vals) -> str:
    import hashlib

    return hashlib.md5(
        ",".join(str(int(v)) for v in vals).encode()).hexdigest()


def oracle_training_views(payload: str, cfg: EngineConfig,
                          conv_id: str, turn_idx: int):
    """One turn -> (ner_rows, mlm_rows, eval_partial).

    ner/mlm rows carry the scalar window bookkeeping plus digests of the
    nested words/boxes/labels/mask columns; eval_partial is
    (acc_ratio, focus_ratio_or_None) for the per-turn classifier-vs-hint
    example (reference ner.py:338-417 masked metric definitions).
    """
    t = _parse(payload)
    n = len(t.words)
    if n == 0:
        return [], [], None
    n_classes = cfg.n_classes
    other = n_classes - 1

    # --- eval partial (labels = raw parser hints, preds = classifier) ---
    pred_class, _ = _classify(t, n_classes, cfg.max_seq_len)
    n_correct = sum(1 for h, p in zip(t.hint, pred_class) if h == p)
    acc = n_correct / n
    focus_ix = [i for i in range(n)
                if t.hint[i] != other or pred_class[i] != other]
    focus = (sum(1 for i in focus_ix if t.hint[i] == pred_class[i])
             / len(focus_ix)) if focus_ix else None

    # --- per-page windows ---
    n_tok = [1 + max(len(w) - 1, 0) // 4 for w in t.words]
    qbox = [[int(v * 1000) for v in b] for b in t.box]
    ner_rows: list[dict] = []
    mlm_rows: list[dict] = []
    for page in sorted(set(t.page)):
        ix = [i for i in range(n) if t.page[i] == page]

        # Synthetic SMGT record: one absolute-pixel rect per contiguous
        # same-(hint, line) run with hint != other (training.py:
        # synth_annotation_record), parsed back through the /w *1000
        # truncation of smgt.parse_annotation_record:
        anns = []  # (class_id, x0, y0, x1, y1) in 0-1000 ints
        s = 0
        while s < len(ix):
            e = s
            while (e + 1 < len(ix)
                   and t.hint[ix[e + 1]] == t.hint[ix[s]]
                   and t.line[ix[e + 1]] == t.line[ix[s]]):
                e += 1
            h = t.hint[ix[s]]
            if h != other:
                run = [t.box[i] for i in ix[s:e + 1]]
                left = min(b[0] for b in run) * _IMG_W
                top = min(b[1] for b in run) * _IMG_H
                width = max(b[2] for b in run) * _IMG_W - left
                height = max(b[3] for b in run) * _IMG_H - top
                anns.append((
                    h,
                    int(left / _IMG_W * 1000),
                    int(top / _IMG_H * 1000),
                    int((left + width) / _IMG_W * 1000),
                    int((top + height) / _IMG_H * 1000),
                ))
            s = e + 1

        # >=50%-area-overlap labels (geometry.word_label_matrix rule):
        labels = []
        for i in ix:
            wx0, wy0, wx1, wy1 = qbox[i]
            area = (wx1 - wx0) * (wy1 - wy0)
            best = other
            for (c, ax0, ay0, ax1, ay1) in anns:
                isect = (max(0, min(wx1, ax1) - max(wx0, ax0))
                         * max(0, min(wy1, ay1) - max(wy0, ay0)))
                if isect >= area / 2 and c < best:
                    best = c
            labels.append(best)

        counts = [n_tok[i] for i in ix]
        word_start = [0] * len(ix)
        for k in range(1, len(ix)):
            word_start[k] = word_start[k - 1] + counts[k - 1]
        total = word_start[-1] + counts[-1]
        windows = _split_windows(word_start, total, cfg.max_seq_len)
        for wix, (ws, we) in enumerate(windows):
            words = [t.words[i] for i in ix[ws:we]]
            flat_boxes = [v for i in ix[ws:we] for v in qbox[i]]
            base = {
                "conv_id": conv_id, "turn_idx": turn_idx,
                "page": page + 1, "window_idx": wix,
                "n_windows": len(windows),
                "word_start": ws, "word_end": we,
                "n_tokens": sum(counts[ws:we]),
                "words_md5": _words_md5(words),
                "boxes_md5": _ints_md5(flat_boxes),
            }
            ner_rows.append(dict(base, labels_md5=_ints_md5(labels[ws:we])))
            seed = f"{conv_id}:{turn_idx}:{page + 1}:{wix}:"
            mask = [w for w in range(len(words))
                    if zlib.crc32(f"{seed}{w}".encode()) % 100
                    < _MLM_MASK_PCT]
            mlm_rows.append(dict(base, n_masked=len(mask),
                                 mask_md5=_ints_md5(mask)))
    return ner_rows, mlm_rows, (acc, focus)

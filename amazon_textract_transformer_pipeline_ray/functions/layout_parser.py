"""Layout-JSON payload parser (dialect B): Textract-style response JSON ->
block tree.

Consumes the exact JSON shape the reference's OCR builders emit
(``ocr_engines/base.py:274-294``): ``{DocumentMetadata:{Pages},
Blocks:[{Id, BlockType in {PAGE,LINE,WORD}, Text, Confidence, Page,
Geometry:{BoundingBox:{Top,Left,Width,Height}}, Relationships:[{Type:
"CHILD", Ids}]}]}`` — traversed pages -> lines -> words in CHILD-id order,
the same order trp.Document exposes
(``fn-postprocess/util/extract.py:103-130``).

WORD blocks may additionally carry the enrichment fields the reference's
inference stage writes in place (``notebooks/src/code/inference.py:484-492``):
``PredictedClass`` / ``PredictedClassConfidence``.  When present they are
passed through as pre-annotations (the classifier stage will not overwrite
them); when absent the parser assigns heuristic hints:
first LINE of page 1 -> TITLE, date-shaped words -> DATE, else CONTENT.

Multi-chunk payloads: a payload may be a JSON *list* of response chunks;
list-valued top-level keys are concatenated, mirroring the reference's
paginated-response merge (``pipeline/ocr/fn-call-textract/main.py:246-278``).
"""

from __future__ import annotations

import json

import numpy as np

try:  # optional fast path; stdlib fallback keeps the container-only promise
    # (the independent oracle deliberately stays on stdlib json, so the two
    # implementations do not share a decoder)
    from orjson import loads as _fast_loads
except ImportError:  # pragma: no cover - exercised where orjson is absent
    _fast_loads = json.loads


def _json_loads(payload: str):
    """orjson when available, with a stdlib retry on reject: orjson is
    stricter than stdlib (NaN/Infinity literals, ints beyond 64 bits,
    lone surrogates), and a payload stdlib would parse must produce the
    SAME blocks whether or not the fast decoder is installed — decoder
    choice must never reroute a row to the plain-text fallback."""
    try:
        return _fast_loads(payload)
    except ValueError:
        return json.loads(payload)

from .blocks import (
    CLS_CONTENT,
    CLS_DATE,
    CLS_TITLE,
    DATE_WORD_RE,
    TurnBlocks,
)


def merge_response_chunks(chunks: list[dict]) -> dict:
    """Concatenate list-valued top-level keys across response chunks
    (fn-call-textract/main.py:261-268); scalars taken from the first."""
    merged = dict(chunks[0])
    for nxt in chunks[1:]:
        for key, val in nxt.items():
            if isinstance(val, list):
                merged[key] = list(merged.get(key, [])) + val
            elif key not in merged:
                merged[key] = val
    return merged


def parse_layout_json(payload: str) -> TurnBlocks:
    doc = _json_loads(payload)
    if isinstance(doc, list):
        doc = merge_response_chunks(doc)
    blocks = doc.get("Blocks", [])
    by_id = {b["Id"]: b for b in blocks}
    pages = [b for b in blocks if b.get("BlockType") == "PAGE"]

    words: list[str] = []
    page_id: list[int] = []
    line_id: list[int] = []
    boxes: list[list[float]] = []
    ocr_conf: list[float] = []
    hints: list[int] = []
    pre_class: list[int] = []
    pre_conf: list[float] = []

    def child_ids(block: dict) -> list[str]:
        for rel in block.get("Relationships", []) or []:
            if rel.get("Type") == "CHILD":
                return rel.get("Ids", [])
        return []

    gline = 0
    for ixpage, page in enumerate(pages):
        first_line_of_page1 = ixpage == 0
        for lid in child_ids(page):
            line = by_id.get(lid)
            if line is None or line.get("BlockType") != "LINE":
                continue
            emitted = False
            for wid in child_ids(line):
                wb = by_id.get(wid)
                if wb is None or wb.get("BlockType") != "WORD":
                    continue
                text = wb.get("Text", "")
                bb = wb["Geometry"]["BoundingBox"]
                x0, y0 = bb["Left"], bb["Top"]
                words.append(text)
                page_id.append(ixpage)
                line_id.append(gline)
                boxes.append([x0, y0, x0 + bb["Width"], y0 + bb["Height"]])
                ocr_conf.append(float(wb.get("Confidence", 100.0)))
                if "PredictedClass" in wb:
                    pre_class.append(int(wb["PredictedClass"]))
                    pre_conf.append(float(wb.get("PredictedClassConfidence", 1.0)))
                    hints.append(int(wb["PredictedClass"]))
                else:
                    pre_class.append(-1)
                    pre_conf.append(0.0)
                    if first_line_of_page1:
                        hints.append(CLS_TITLE)
                    # date shapes always start with a digit — cheap
                    # prefilter before the regex (same rule as html_parser):
                    elif text[:1].isdigit() and DATE_WORD_RE.match(text):
                        hints.append(CLS_DATE)
                    else:
                        hints.append(CLS_CONTENT)
                emitted = True
            if emitted:
                gline += 1
                first_line_of_page1 = False

    tb = TurnBlocks()
    n = len(words)
    tb.words = words
    tb.page_id = np.array(page_id, dtype=np.int16)
    tb.line_id = np.array(line_id, dtype=np.int32)
    tb.boxes01 = np.clip(np.array(boxes, dtype=np.float64).reshape(n, 4), 0.0, 1.0)
    tb.ocr_conf = np.array(ocr_conf, dtype=np.float64)
    tb.hint = np.array(hints, dtype=np.int16)
    tb.link = np.zeros(n, dtype=np.int8)
    tb.pre_class = np.array(pre_class, dtype=np.int16)
    tb.pre_conf = np.array(pre_conf, dtype=np.float64)
    return tb.finalize()

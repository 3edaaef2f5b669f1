"""Pinned Arrow schemas for every engine output table.

The reference's schemas are implicit/dynamic JSON (SURVEY.md §1.6); we pin
explicit ``pyarrow.Schema`` objects so 100 TB of output parquet is
predictable and every stage is zero-copy over declared types.
"""

from __future__ import annotations

import pyarrow as pa

from .config import EngineConfig
from .functions.assembler import Detection
from .functions.consolidate import TurnFields

SPAN_STRUCT = pa.struct([
    ("class_id", pa.int8()),
    ("class_name", pa.string()),
    ("text", pa.string()),          # normalized when a normalizer applied
    ("raw_text", pa.string()),      # original text iff normalized, else null
    ("start", pa.int32()),          # char offsets into extracted_text (raw)
    ("end", pa.int32()),
    ("page", pa.int16()),           # 1-based, page where the run ended
    ("x0", pa.int16()), ("y0", pa.int16()),  # 0-1000 box (geometry.py:50-64)
    ("x1", pa.int16()), ("y1", pa.int16()),
    ("confidence", pa.float32()),
])

TURNS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("extracted_text", pa.string()),
    ("boilerplate_ratio", pa.float32()),
    ("n_words", pa.int32()),
    ("n_spans", pa.int32()),
    ("spans", pa.list_(SPAN_STRUCT)),
    ("doc_confidence", pa.float32()),
    ("review_needed", pa.bool_()),
])

VALUE_STRUCT = pa.struct([
    ("value", pa.string()),
    ("confidence", pa.float32()),
])

FIELDS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("field_name", pa.string()),
    ("class_id", pa.int8()),
    ("value", pa.string()),            # selector winner, "" if none; null for multi-value
    ("values", pa.list_(VALUE_STRUCT)),  # multi-value fields, conf-desc
    ("confidence", pa.float32()),
    ("num_detections", pa.int32()),
    ("num_detected_values", pa.int32()),
    ("sort_order", pa.int32()),
    ("optional", pa.bool_()),
    ("review_needed", pa.bool_()),
])

CONVERSATIONS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("n_turns", pa.int64()),
    ("first_turn_idx", pa.int32()),
    ("last_turn_idx", pa.int32()),
    ("turns_unique_ordered", pa.bool_()),  # ordering invariant assertion result
    ("total_words", pa.int64()),
    ("mean_boilerplate_ratio", pa.float64()),
    ("total_spans", pa.int64()),
    ("n_review_needed", pa.int64()),
    ("conv_text_sha256", pa.string()),  # digest over ordered per-turn texts
])

MANIFEST_SCHEMA = pa.schema([
    ("partition_id", pa.int32()),
    ("lineage_id", pa.string()),
    ("input_fingerprint", pa.string()),
    ("turns_processed", pa.int64()),
    ("turns_dropped_empty", pa.int64()),
    ("boilerplate_ratio", pa.float64()),
    ("span_count", pa.int64()),
    ("status", pa.string()),
])


def span_dicts(detections: list[Detection]) -> list[dict]:
    out = []
    for d in detections:
        out.append({
            "class_id": d.class_id,
            "class_name": d.class_name,
            "text": d.text,
            "raw_text": d.raw_text,
            "start": d.start,
            "end": d.end,
            "page": d.page_num,
            "x0": int(d.box[0]), "y0": int(d.box[1]),
            "x1": int(d.box[2]), "y1": int(d.box[3]),
            "confidence": d.confidence,
        })
    return out


def field_dicts(
    conv_id: str, turn_idx: int, tf: TurnFields, review_needed: bool
) -> list[dict]:
    rows = []
    for fr in tf.fields:
        rows.append({
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "field_name": fr.name,
            "class_id": fr.class_id,
            "value": fr.value,
            "values": [{"value": v, "confidence": c} for v, c in fr.values],
            "confidence": fr.confidence,
            "num_detections": fr.num_detections,
            "num_detected_values": fr.num_detected_values,
            "sort_order": fr.sort_order,
            "optional": bool(fr.optional) if fr.optional is not None else False,
            "review_needed": review_needed,
        })
    return rows

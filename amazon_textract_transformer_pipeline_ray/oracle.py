"""Plain-Python per-turn oracle.

Runs the reference-semantics extraction row-at-a-time with no Ray, no
batching and no shuffles — the Ray pipeline's output must match it exactly
under stable turn ordering (the north-rule correctness gate, SURVEY.md §5).
Any mismatch isolates a fault in the distributed orchestration (batching,
window fan-out, ordering, partitioning), because the per-turn kernels are
the frozen shared spec pinned separately by hand-computed unit tests.

Complementary gate: ``oracle_independent.py`` re-implements the whole
frozen spec loop-style with NO shared kernel code, so kernel bugs are
caught by engine-vs-independent divergence while orchestration bugs are
caught here — two oracles, disjoint failure domains.
"""

from __future__ import annotations

import pyarrow as pa

from .config import DEFAULT_CONFIG, EngineConfig
from .functions.turn import extract_turn
from .schemas import FIELDS_SCHEMA, TURNS_SCHEMA, span_dicts, field_dicts


def oracle_turns_and_fields(
    transcripts: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG
) -> tuple[pa.Table, pa.Table]:
    """Expected (turns, fields) tables, sorted by (conv_id, turn_idx).

    Empty turns are dropped (reference empty-page rule, base.py:419-428).
    """
    rows = transcripts.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv_id = rows.column("conv_id").to_pylist()
    turn_idx = rows.column("turn_idx").to_pylist()
    role = rows.column("role").to_pylist()
    text = rows.column("text").to_pylist()

    turn_rows: list[dict] = []
    field_rows: list[dict] = []
    for cid, tix, rol, payload in zip(conv_id, turn_idx, role, text):
        ext = extract_turn(payload, cfg)
        if ext is None:
            continue
        review = ext.fields.review_needed(cfg.review_threshold)
        turn_rows.append({
            "conv_id": cid,
            "turn_idx": tix,
            "role": rol,
            "extracted_text": ext.extracted_text,
            "boilerplate_ratio": ext.boilerplate_ratio,
            "n_words": ext.n_words,
            "n_spans": len(ext.detections),
            "spans": span_dicts(ext.detections),
            "doc_confidence": ext.fields.confidence,
            "review_needed": review,
        })
        field_rows.extend(field_dicts(cid, tix, ext.fields, review))

    turns = pa.Table.from_pylist(turn_rows, schema=TURNS_SCHEMA)
    fields = pa.Table.from_pylist(field_rows, schema=FIELDS_SCHEMA)
    return turns, fields

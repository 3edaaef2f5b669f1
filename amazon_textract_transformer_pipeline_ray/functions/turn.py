"""Per-turn end-to-end extraction: payload -> parse -> classify -> assemble
-> consolidate.

This is the single-turn composition of all kernels — the Ray stages call it
per row inside vectorized ``map_batches`` batches, and the test oracle
(``oracle.py``) calls it row-at-a-time, so any divergence isolates to the
distributed orchestration (batching, windowing, ordering, partitioning),
which is exactly what the oracle gate is for.

Dialect dispatch mirrors the reference's engine-agnostic contract: every
payload kind is normalized to the same block tree before classification
(``ocr_engines/base.py:18-39`` registry; SURVEY.md §2.10 Extractor
protocol).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import EngineConfig
from .assembler import AssembledTurn, Detection, assemble_turn
from .blocks import TurnBlocks
from .classifier import classify_turn
from .consolidate import TurnFields, consolidate_turn, normalize_detections
from .html_parser import parse_html
from .layout_parser import parse_layout_json
from .plain_parser import parse_plain

DIALECT_LAYOUT = "layout"
DIALECT_HTML = "html"
DIALECT_PLAIN = "plain"


def _parse_layout_safe(payload: str) -> TurnBlocks:
    try:
        return parse_layout_json(payload)
    except (ValueError, KeyError, TypeError):
        # Malformed JSON-looking payload: degrade to plain text rather
        # than poisoning the whole task (a single bad row must never
        # fail a 100 TB batch; cf. the reference's per-line strict
        # errors, base.py:256-265 — ours quarantines by falling back).
        return parse_plain(payload)


# Extractor plug-in registry (reference OCR-engine registry shape,
# ``ocr_engines/base.py:18-39`` / ``ocr_engines/__init__.py:get()``;
# SURVEY §2.10): dialect name -> parser producing the normalized
# TurnBlocks contract.  ``register_parser`` swaps or adds an engine;
# the three built-ins are pre-registered.
PARSERS: dict[str, "object"] = {
    DIALECT_LAYOUT: _parse_layout_safe,
    DIALECT_HTML: parse_html,
    DIALECT_PLAIN: parse_plain,
}


def register_parser(dialect: str, parser) -> None:
    """Register (or replace) the parser for a payload dialect.  The
    parser must return a finalized ``TurnBlocks`` (the engine-agnostic
    adapter contract)."""
    PARSERS[dialect] = parser


def detect_dialect(payload: str) -> str:
    head = payload.lstrip()[:1]
    if head in ("{", "["):
        return DIALECT_LAYOUT
    if "<" in payload[:4096]:
        return DIALECT_HTML
    return DIALECT_PLAIN


def parse_payload(payload: str) -> TurnBlocks:
    return PARSERS[detect_dialect(payload)](payload)


def parse_payloads_batch(payloads: list[str]) -> list[TurnBlocks]:
    """Batched ``parse_payload``: html/plain payloads (when their
    built-in parsers are registered) parse to per-line specs and build
    their TurnBlocks in ONE vectorized ``from_word_lists_batch`` pass;
    layout payloads and any user-registered parser keep the per-turn
    path.  Result-equal to ``[parse_payload(p) for p in payloads]``
    (pinned by tests)."""
    from .blocks import from_word_lists_batch
    from .html_parser import html_line_spec
    from .plain_parser import plain_line_spec

    tbs: list[TurnBlocks | None] = [None] * len(payloads)
    ix: list[int] = []
    specs: list[tuple] = []
    html_builtin = PARSERS.get(DIALECT_HTML) is parse_html
    plain_builtin = PARSERS.get(DIALECT_PLAIN) is parse_plain
    for i, p in enumerate(payloads):
        d = detect_dialect(p)
        if d == DIALECT_HTML and html_builtin:
            lw, lh, ll = html_line_spec(p)
            ix.append(i)
            specs.append((lw, lh, ll))
        elif d == DIALECT_PLAIN and plain_builtin:
            lw, lh = plain_line_spec(p)
            ix.append(i)
            specs.append((lw, lh, None))
        else:
            tbs[i] = PARSERS[d](p)
    if specs:
        for i, tb in zip(ix, from_word_lists_batch(specs)):
            tbs[i] = tb
    return tbs  # type: ignore[return-value]


@dataclass
class ExtractedTurn:
    """Everything the pipeline emits for one turn (None => empty turn,
    dropped per the reference's empty-page rule, base.py:419-428)."""

    extracted_text: str
    boilerplate_ratio: float
    n_words: int
    n_content_words: int
    detections: list[Detection]
    fields: TurnFields
    pred_class: np.ndarray
    pred_conf: np.ndarray
    blocks: TurnBlocks


def _finish_turn(
    tb: TurnBlocks, pred_class: np.ndarray, pred_conf: np.ndarray,
    cfg: EngineConfig,
) -> ExtractedTurn:
    assembled: AssembledTurn = assemble_turn(
        tb, pred_class, pred_conf, cfg.entity_classes
    )
    normalize_detections(assembled.detections, cfg)
    fields = consolidate_turn(assembled.detections, cfg)
    return ExtractedTurn(
        extracted_text=assembled.extracted_text,
        boilerplate_ratio=assembled.boilerplate_ratio,
        n_words=assembled.n_words,
        n_content_words=assembled.n_content_words,
        detections=assembled.detections,
        fields=fields,
        pred_class=pred_class,
        pred_conf=pred_conf,
        blocks=tb,
    )


def extract_turn(payload: str, cfg: EngineConfig) -> ExtractedTurn | None:
    tb = parse_payload(payload)
    if tb.n_words == 0:
        return None
    pred_class, pred_conf = classify_turn(tb, cfg.n_classes, cfg.max_seq_len)
    return _finish_turn(tb, pred_class, pred_conf, cfg)


def extract_turns_batch(
    payloads: list[str], cfg: EngineConfig
) -> list[ExtractedTurn | None]:
    """Batched ``extract_turn``: classification AND span assembly each run
    in ONE vectorized pass over all turns (``classifier.classify_turns``,
    ``assembler.assemble_turns`` — both bit-identical to the per-turn
    calls; the oracle gate compares the two paths), parsing and field
    consolidation stay per turn (inherently per-document work)."""
    from .assembler import assemble_turns
    from .classifier import classify_turns

    tbs = parse_payloads_batch(payloads)
    preds = classify_turns(tbs, cfg.n_classes, cfg.max_seq_len)
    assembled = assemble_turns(tbs, preds, cfg.entity_classes)
    out: list[ExtractedTurn | None] = []
    for tb, (pc, pf), asm in zip(tbs, preds, assembled):
        if tb.n_words == 0:
            out.append(None)
            continue
        normalize_detections(asm.detections, cfg)
        fields = consolidate_turn(asm.detections, cfg)
        out.append(ExtractedTurn(
            extracted_text=asm.extracted_text,
            boilerplate_ratio=asm.boilerplate_ratio,
            n_words=asm.n_words,
            n_content_words=asm.n_content_words,
            detections=asm.detections,
            fields=fields,
            pred_class=pc,
            pred_conf=pf,
            blocks=tb,
        ))
    return out

"""Per-field value consolidation.

Reproduces the reference's post-processing Lambda
(``pipeline/postprocessing/fn-postprocess/main.py:84-180``) per turn:

  * detections filtered per configured (non-ignored) class, in detection
    order (main.py:85-87);
  * exact-text grouping into values, tracking IxFirst/IxLastDetection
    (main.py:90-102; insertion-ordered dict);
  * value confidence = noisy-OR over its detections
    ``1 - prod(1 - conf_i)`` (main.py:104-111), then normalized by
    ``max(1, sum of value confidences)`` across the field (main.py:113-115);
  * single-valued fields (``Select`` set): stable-sort values by the
    selector key and take the first (main.py:128-147);
  * multi-valued fields: all values sorted by confidence desc; field
    confidence = mean of value confidences (main.py:150-171);
  * document confidence = min over fields excluding zero-confidence
    optional fields (main.py:173-179).  The reference raises on an empty
    min(); we return 0.0 (documented divergence — only reachable when every
    field is optional-and-empty).

Value normalization (``util/normalize.py:26-91``) runs before consolidation
on fields with a configured normalizer, deduping repeated texts so each
distinct input is normalized once (normalize.py:40-58).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from functools import reduce

from ..config import EngineConfig, FieldConfig
from .assembler import Detection
from .dates import NORMALIZERS


def normalize_detections(
    detections: list[Detection], cfg: EngineConfig
) -> None:
    """In-place analog of util/normalize.py:26-91 with request dedup (J3)."""
    by_norm: dict[tuple[str, str], dict[str, list[Detection]]] = {}
    norm_fields = {
        f.class_id: f for f in cfg.fields if f.normalizer and not f.ignore
    }
    for det in detections:
        f = norm_fields.get(det.class_id)
        if f is None:
            continue
        key = (f.normalizer, (f.normalizer_prompt or "") + det.text)
        by_norm.setdefault(key, {}).setdefault(det.text, []).append(det)
    for (norm_name, _), texts in by_norm.items():
        fn = NORMALIZERS[norm_name]
        for text, dets in texts.items():  # one "call" per distinct text
            new = fn(text)
            for det in dets:
                if det.raw_text is None:  # extract.py:63-72
                    det.raw_text = det.text
                det.text = new


@dataclass
class FieldResult:
    class_id: int
    name: str
    confidence: float
    num_detections: int
    num_detected_values: int
    sort_order: int
    optional: bool | None
    value: str | None  # single-valued fields; "" when no detections
    values: list[tuple[str, float]]  # multi-valued: (text, conf) conf-desc
    detections: list[Detection] = dc_field(default_factory=list)


@dataclass
class TurnFields:
    fields: list[FieldResult]
    confidence: float  # document confidence (main.py:173-179)

    def review_needed(self, threshold: float) -> bool:
        """Confidence gate (reference ``pipeline/__init__.py:294``:
        ``Confidence >= 0.5`` -> no review).

        Evaluated at the PERSISTED float32 precision: the turns table
        stores ``doc_confidence`` as f32, and quantizing before the
        compare makes the gate a pure function of that column — the
        decision is identical whether computed in the fused kernel, the
        staged normalizer's recompute-from-table path, or an external
        checker reading the parquet.  (In f64, consolidations landing
        EXACTLY on the threshold — e.g. two equal-confidence values
        normalizing to 0.5 — flip on ~1e-16 summation noise.)"""
        import numpy as np

        return bool(np.float32(self.confidence) < np.float32(threshold))


def consolidate_turn(
    detections: list[Detection], cfg: EngineConfig
) -> TurnFields:
    results: list[FieldResult] = []
    # One pass to bucket detections by class (order preserved — the
    # per-field filter semantics of main.py:85-87 unchanged):
    by_class: dict[int, list[Detection]] = {}
    for e in detections:
        by_class.setdefault(e.class_id, []).append(e)
    for ixtype, fc in enumerate(cfg.active_fields):
        field_entities = by_class.get(fc.class_id, [])

        # Exact-text value grouping (main.py:90-102):
        field_values: dict[str, dict] = {}
        for ixe, e in enumerate(field_entities):
            if e.text in field_values:
                field_values[e.text]["Detections"].append(e)
                field_values[e.text]["IxLastDetection"] = ixe
            else:
                field_values[e.text] = {
                    "Text": e.text,
                    "Detections": [e],
                    "IxFirstDetection": ixe,
                    "IxLastDetection": ixe,
                }
        values_list = list(field_values.values())

        # Noisy-OR confidence per value (main.py:104-111):
        for v in values_list:
            v["Confidence"] = 1 - reduce(
                lambda acc, det: acc * (1 - det.confidence), v["Detections"], 1.0
            )
        # Normalize across values (main.py:113-115):
        total = reduce(lambda acc, v: acc + v["Confidence"], values_list, 0.0)
        for v in values_list:
            v["Confidence"] = v["Confidence"] / max(1.0, total)

        fr = FieldResult(
            class_id=fc.class_id,
            name=fc.name,
            confidence=0.0,
            num_detections=len(field_entities),
            num_detected_values=len(field_values),
            sort_order=ixtype,
            optional=fc.optional,
            value=None,
            values=[],
        )
        if fc.selector is not None:
            sort_key, desc = fc.selector
            ordered = sorted(values_list, key=sort_key, reverse=desc)
            if ordered:
                fr.value = ordered[0]["Text"]
                fr.confidence = ordered[0]["Confidence"]
                fr.detections = list(ordered[0]["Detections"])
            else:
                fr.value = ""
                fr.detections = []
        else:
            ordered = sorted(
                values_list, key=lambda v: v["Confidence"], reverse=True
            )
            fr.values = [(v["Text"], v["Confidence"]) for v in ordered]
            fr.detections = [d for v in ordered for d in v["Detections"]]
            if fr.values:
                fr.confidence = sum(c for _, c in fr.values) / len(fr.values)
        results.append(fr)

    eligible = [
        r.confidence
        for r in results
        if not (r.confidence == 0 and r.optional)
    ]
    doc_conf = min(eligible) if eligible else 0.0
    return TurnFields(fields=results, confidence=doc_conf)

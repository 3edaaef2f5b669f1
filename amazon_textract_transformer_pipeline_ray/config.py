"""Field / engine configuration.

Mirrors the reference's entity configuration surface
(``pipeline/postprocessing/fn-postprocess/util/config.py:31-95`` and the
default SSM config at ``pipeline/postprocessing/__init__.py:27-137``):
a list of ``{ClassId, Name, Ignore?, Optional?, Select?,
NormalizerEndpoint?/NormalizerPrompt?}`` entries.  ``Select`` present =>
single-valued field chosen by a sort key (``util/config.py:13-28``);
absent => multi-valued field.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

# Selector registry — semantics of reference util/config.py:23-28.
# Each selector maps a consolidated-value dict (keys: Text, Confidence,
# IxFirstDetection, IxLastDetection) to a sort key; ``desc`` flips order.
_SELECTORS: dict[str, tuple[Callable[[dict], Any], bool]] = {
    "confidence": (lambda v: v["Confidence"], True),
    "first": (lambda v: v["IxFirstDetection"], False),
    "last": (lambda v: v["IxLastDetection"], True),
    "longest": (lambda v: len(v["Text"]), True),
    "shortest": (lambda v: len(v["Text"]), False),
}


@dataclass
class FieldConfig:
    """One entity class / output field (reference util/config.py:31-95)."""

    class_id: int
    name: str
    ignore: Optional[bool] = None
    optional: Optional[bool] = None
    select: Optional[str] = None  # one of _SELECTORS or None => multi-value
    normalizer: Optional[str] = None  # name of a registered scalar normalizer
    normalizer_prompt: Optional[str] = None

    def __post_init__(self) -> None:
        if self.select is not None:
            key = self.select.lower()
            if key not in _SELECTORS:
                raise ValueError(
                    f"Selection method {self.select!r} for field {self.name!r} "
                    f"not in {sorted(_SELECTORS)}"
                )
            self.select = key

    @property
    def selector(self) -> Optional[tuple[Callable[[dict], Any], bool]]:
        return _SELECTORS[self.select] if self.select else None

    def to_dict(self) -> dict:
        d: dict[str, Any] = {"ClassId": self.class_id, "Name": self.name}
        if self.ignore is not None:
            d["Ignore"] = self.ignore
        if self.optional is not None:
            d["Optional"] = self.optional
        if self.select is not None:
            d["Select"] = self.select
        if self.normalizer is not None:
            d["Normalizer"] = self.normalizer
        if self.normalizer_prompt is not None:
            d["NormalizerPrompt"] = self.normalizer_prompt
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "FieldConfig":
        return cls(
            class_id=d["ClassId"],
            name=d["Name"],
            ignore=d.get("Ignore"),
            optional=d.get("Optional"),
            select=d.get("Select"),
            normalizer=d.get("Normalizer"),
            normalizer_prompt=d.get("NormalizerPrompt"),
        )


# ---------------------------------------------------------------------------
# Default engine field configuration.
#
# Covers every consolidation branch of reference fn-postprocess/main.py:84-180:
# one field per selector, one multi-value field (no Select), one Ignore'd
# class, one Optional class, one field with a normalizer.  Class ids are the
# model's label space; the implicit "other"/boilerplate class is
# OTHER_CLASS_ID = max configured id + 1.
# ---------------------------------------------------------------------------

def default_field_config() -> list[FieldConfig]:
    return [
        FieldConfig(0, "content"),  # multi-value: main content segments
        FieldConfig(1, "title", select="first"),
        FieldConfig(2, "code", select="longest", optional=True),
        FieldConfig(3, "date", select="confidence", optional=True,
                    normalizer="date_iso",
                    normalizer_prompt="Convert dates to YYYY-MM-DD: "),
        FieldConfig(4, "caption", ignore=True),
        FieldConfig(5, "summary", optional=True, select="shortest"),
    ]


N_MODEL_CLASSES = 7  # class ids 0..5 plus "other" = 6
OTHER_CLASS_ID = 6


@dataclass
class EngineConfig:
    """Everything an extraction run needs; hashable into a lineage id."""

    fields: list[FieldConfig] = field(default_factory=default_field_config)
    n_classes: int = N_MODEL_CLASSES
    other_class_id: int = OTHER_CLASS_ID
    max_seq_len: int = 512          # classifier window (reference inference.py:68-70)
    review_threshold: float = 0.5   # doc-confidence gate (pipeline/__init__.py:294)
    num_partitions: int = 32        # output partitioning (hash(conv_id) % P)
    salt_span: int = 512            # turns per salt bucket for mega-conversations
    code_version: str = "1"

    @property
    def active_fields(self) -> list[FieldConfig]:
        """Non-ignored fields, in config order (main.py:85)."""
        return [f for f in self.fields if not f.ignore]

    def without_normalizers(self) -> "EngineConfig":
        """Copy with every field's normalizer stripped — the stage-A config
        of the two-stage (extract -> normalizer actor pool) pipeline: raw
        span texts pass through so the downstream ``NormalizerStage`` can
        apply normalization and re-consolidate (stages/normalize.py)."""
        import dataclasses

        return dataclasses.replace(
            self,
            fields=[dataclasses.replace(f, normalizer=None,
                                        normalizer_prompt=None)
                    for f in self.fields])

    @property
    def entity_classes(self) -> dict[int, str]:
        """class_id -> name for non-ignored classes (extract.py:98)."""
        return {f.class_id: f.name for f in self.fields if not f.ignore}

    def to_json(self) -> str:
        """Serialize to the reference's SSM-config JSON surface
        (PascalCase field entries + engine knobs)."""
        return json.dumps({
            "Fields": [f.to_dict() for f in self.fields],
            "NClasses": self.n_classes,
            "MaxSeqLen": self.max_seq_len,
            "ReviewThreshold": self.review_threshold,
            "NumPartitions": self.num_partitions,
            "SaltSpan": self.salt_span,
            "CodeVersion": self.code_version,
        }, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "EngineConfig":
        """Load from JSON — the per-request ``EntityConfig`` override path
        (``fn-postprocess/main.py:58-74``): a bare list is treated as just
        the field list over default engine knobs."""
        d = json.loads(s)
        if isinstance(d, list):  # EntityConfig-style: fields only
            return cls(fields=[FieldConfig.from_dict(f) for f in d])
        return cls(
            fields=[FieldConfig.from_dict(f) for f in d["Fields"]],
            n_classes=d.get("NClasses", N_MODEL_CLASSES),
            max_seq_len=d.get("MaxSeqLen", 512),
            review_threshold=d.get("ReviewThreshold", 0.5),
            num_partitions=d.get("NumPartitions", 32),
            salt_span=d.get("SaltSpan", 512),
            code_version=d.get("CodeVersion", "1"),
        )

    def lineage_id(self, input_fingerprint: str) -> str:
        payload = json.dumps(
            {
                "fields": [f.to_dict() for f in self.fields],
                "n_classes": self.n_classes,
                "max_seq_len": self.max_seq_len,
                "review_threshold": self.review_threshold,
                # Partition layout determines which rows land in which
                # partition — changing it MUST invalidate old manifests:
                "num_partitions": self.num_partitions,
                "salt_span": self.salt_span,
                "code_version": self.code_version,
                "input": input_fingerprint,
            },
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


DEFAULT_CONFIG = EngineConfig()

"""The extraction stage: an actor-pool ``map_batches`` UDF.

``TurnExtractor`` is a callable CLASS for
``ds.map_batches(TurnExtractor, concurrency=N, batch_size=B,
batch_format="pyarrow")`` — the Ray analog of the reference's SageMaker
endpoint container: stateful setup once per actor in ``__init__``
(config, normalizer registry, compiled regexes — mirroring ``model_fn``,
``notebooks/src/code/inference.py:313-360``), per-batch work in
``__call__`` (mirroring ``predict_fn``/``transform_fn``).

Parse -> classify -> assemble -> consolidate are deliberately FUSED into
one stage: the block tree is built and consumed inside the batch and never
crosses the object store (SURVEY.md §1.6 — the tree is ephemeral in-batch
structure), and window fan-out/fan-in for long turns stays actor-local so
no shuffle is needed (SURVEY.md §7.4 hard part 2).  Only Arrow-typed
columns leave the stage.

Skew note: ``partition_id = crc32(conv_id + "#" + turn_idx // salt_span) %
num_partitions`` — every conversation longer than ``salt_span`` turns is
automatically spread over multiple output partitions (salted splits for
mega-conversations), while short conversations stay whole.  Per-turn
extraction itself is embarrassingly parallel; only the conversation stage
groups by conv_id.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.turn import extract_turn
from ..schemas import FIELDS_SCHEMA, TURNS_SCHEMA, field_dicts, span_dicts


def partition_for(conv_id: str, turn_idx: int, cfg: EngineConfig) -> int:
    salt = turn_idx // cfg.salt_span
    return zlib.crc32(f"{conv_id}#{salt}".encode()) % cfg.num_partitions


_TURNS_PART_SCHEMA = TURNS_SCHEMA.append(pa.field("partition_id", pa.int32()))
_FIELDS_PART_SCHEMA = FIELDS_SCHEMA.append(pa.field("partition_id", pa.int32()))


# Per-worker-process extractor cache for the task-based stage: Ray reuses
# worker processes across tasks, so state built on first use is amortized
# exactly like actor state, without paying actor-pool startup per pipeline.
_PROCESS_EXTRACTORS: dict[tuple, "TurnExtractor"] = {}


def make_extract_fn(cfg=None, emit: str = "turns",
                    with_partition_id: bool = False,
                    only_partitions: frozenset[int] | None = None):
    """Stateless-task variant of the extraction stage.

    For the built-in (cheap, CPU) classifier, warm Ray worker processes +
    a module-level extractor cache beat a dedicated actor pool: no pool
    cold-start per pipeline, fully elastic scheduling.  Use the actor-pool
    variant (``TurnExtractor`` as a class UDF) when the per-worker state is
    genuinely expensive (a real model) — see pipelines.extraction.build_turns.
    """
    # Content-derived cache key: id(cfg) would alias a mutated config or a
    # reused address to a stale worker-side extractor.
    # ``is not None``: an empty filter (process nothing) must not alias the
    # no-filter key — a falsy check would reuse a no-filter extractor and
    # emit rows a filter-everything call should skip.
    key = (None if cfg is None else cfg.to_json(), emit, with_partition_id,
           tuple(sorted(only_partitions)) if only_partitions is not None
           else None)

    def extract_fn(batch):
        ex = _PROCESS_EXTRACTORS.get(key)
        if ex is None:
            ex = TurnExtractor(cfg, emit, with_partition_id, only_partitions)
            _PROCESS_EXTRACTORS[key] = ex
        return ex(batch)

    return extract_fn


class TurnExtractor:
    """Actor-pool UDF: transcript rows -> extracted turn rows.

    Parameters
    ----------
    cfg : engine configuration (broadcast by value into each actor once).
    emit : "turns" (default) or "fields" — which output table to produce.
    with_partition_id : include the salted output-partition column.
    only_partitions : optional frozenset of partition ids to process —
        the resume path filters inside the batch (rows of already-complete
        partitions are skipped), reference skip-existing semantics
        (``notebooks/util/ocr.py:207-209``).
    """

    def __init__(
        self,
        cfg: EngineConfig | None = None,
        emit: str = "turns",
        with_partition_id: bool = False,
        only_partitions: frozenset[int] | None = None,
    ):
        self.cfg = cfg or DEFAULT_CONFIG
        self.emit = emit
        self.with_partition_id = with_partition_id or only_partitions is not None
        self.only_partitions = only_partitions

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        conv_ids = batch.column("conv_id").to_pylist()
        turn_idxs = batch.column("turn_idx").to_pylist()
        roles = batch.column("role").to_pylist()
        texts = batch.column("text").to_pylist()

        turn_rows: list[dict] = []
        field_rows: list[dict] = []
        for cid, tix, rol, payload in zip(conv_ids, turn_idxs, roles, texts):
            pid = (
                partition_for(cid, tix, cfg) if self.with_partition_id else None
            )
            if self.only_partitions is not None and pid not in self.only_partitions:
                continue
            ext = extract_turn(payload, cfg)
            if ext is None:  # empty turn -> dropped (base.py:419-428)
                continue
            review = ext.fields.review_needed(cfg.review_threshold)
            if self.emit == "turns":
                row = {
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
                }
                if self.with_partition_id:
                    row["partition_id"] = pid
                turn_rows.append(row)
            else:
                for row in field_dicts(cid, tix, ext.fields, review):
                    if self.with_partition_id:
                        row["partition_id"] = pid
                    field_rows.append(row)

        if self.emit == "turns":
            schema = _TURNS_PART_SCHEMA if self.with_partition_id else TURNS_SCHEMA
            return pa.Table.from_pylist(turn_rows, schema=schema)
        schema = _FIELDS_PART_SCHEMA if self.with_partition_id else FIELDS_SCHEMA
        return pa.Table.from_pylist(field_rows, schema=schema)

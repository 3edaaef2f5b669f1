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
from ..functions.turn import extract_turns_batch
from ..schemas import (FIELDS_SCHEMA, SPAN_STRUCT, TURNS_SCHEMA,
                       VALUE_STRUCT)


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
        """Per-turn extraction is inherently Python string work, but the
        OUTPUT table is assembled columnar: flat per-column lists plus
        offset arrays for the nested span/value columns, turned into
        ``ListArray.from_arrays(offsets, StructArray.from_arrays(...))``
        — no per-row dict materialization, no ``from_pylist`` walking
        nested Python objects (VERDICT r1 finding 6)."""
        cfg = self.cfg
        conv_ids = batch.column("conv_id").to_pylist()
        turn_idxs = batch.column("turn_idx").to_pylist()
        roles = batch.column("role").to_pylist()
        texts = batch.column("text").to_pylist()

        if self.emit == "turns":
            return self._emit_turns(cfg, conv_ids, turn_idxs, roles, texts)
        return self._emit_fields(cfg, conv_ids, turn_idxs, texts)

    def _skip(self, cid: str, tix: int, cfg: EngineConfig):
        """(skip?, partition_id) for one row under the resume filter."""
        pid = partition_for(cid, tix, cfg) if self.with_partition_id else None
        skip = (self.only_partitions is not None
                and pid not in self.only_partitions)
        return skip, pid

    def _apply_skip(self, conv_ids, turn_idxs, cfg):
        """Surviving row indices + their partition ids (resume filter runs
        BEFORE parsing so skipped rows cost nothing)."""
        keep: list[int] = []
        pids: list[int | None] = []
        for r, (cid, tix) in enumerate(zip(conv_ids, turn_idxs)):
            skip, pid = self._skip(cid, tix, cfg)
            if not skip:
                keep.append(r)
                pids.append(pid)
        return keep, pids

    def _emit_turns(self, cfg, conv_ids, turn_idxs, roles, texts) -> pa.Table:
        cols: dict[str, list] = {
            "conv_id": [], "turn_idx": [], "role": [], "extracted_text": [],
            "boilerplate_ratio": [], "n_words": [], "n_spans": [],
            "doc_confidence": [], "review_needed": [], "partition_id": [],
        }
        # span child columns (flat) + list offsets:
        sp: dict[str, list] = {f.name: [] for f in SPAN_STRUCT}
        offsets = [0]
        keep, pids = self._apply_skip(conv_ids, turn_idxs, cfg)
        exts = extract_turns_batch([texts[r] for r in keep], cfg)
        for r, pid, ext in zip(keep, pids, exts):
            if ext is None:  # empty turn -> dropped (base.py:419-428)
                continue
            cols["conv_id"].append(conv_ids[r])
            cols["turn_idx"].append(turn_idxs[r])
            cols["role"].append(roles[r])
            cols["extracted_text"].append(ext.extracted_text)
            cols["boilerplate_ratio"].append(ext.boilerplate_ratio)
            cols["n_words"].append(ext.n_words)
            cols["n_spans"].append(len(ext.detections))
            cols["doc_confidence"].append(ext.fields.confidence)
            cols["review_needed"].append(
                ext.fields.review_needed(cfg.review_threshold))
            cols["partition_id"].append(pid)
            for d in ext.detections:
                sp["class_id"].append(d.class_id)
                sp["class_name"].append(d.class_name)
                sp["text"].append(d.text)
                sp["raw_text"].append(d.raw_text)
                sp["start"].append(d.start)
                sp["end"].append(d.end)
                sp["page"].append(d.page_num)
                sp["x0"].append(int(d.box[0]))
                sp["y0"].append(int(d.box[1]))
                sp["x1"].append(int(d.box[2]))
                sp["y1"].append(int(d.box[3]))
                sp["confidence"].append(d.confidence)
            offsets.append(offsets[-1] + len(ext.detections))

        schema = _TURNS_PART_SCHEMA if self.with_partition_id else TURNS_SCHEMA
        spans = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array(sp[f.name], f.type) for f in SPAN_STRUCT],
                fields=list(SPAN_STRUCT)))
        arrays = []
        for f in schema:
            if f.name == "spans":
                arrays.append(spans)
            else:
                arrays.append(pa.array(cols[f.name], f.type))
        return pa.Table.from_arrays(arrays, schema=schema)

    def _emit_fields(self, cfg, conv_ids, turn_idxs, texts) -> pa.Table:
        cols: dict[str, list] = {
            "conv_id": [], "turn_idx": [], "field_name": [], "class_id": [],
            "value": [], "confidence": [], "num_detections": [],
            "num_detected_values": [], "sort_order": [], "optional": [],
            "review_needed": [], "partition_id": [],
        }
        val_value: list = []
        val_conf: list = []
        offsets = [0]
        keep, pids = self._apply_skip(conv_ids, turn_idxs, cfg)
        exts = extract_turns_batch([texts[r] for r in keep], cfg)
        for r, pid, ext in zip(keep, pids, exts):
            if ext is None:
                continue
            review = ext.fields.review_needed(cfg.review_threshold)
            for fr in ext.fields.fields:
                cols["conv_id"].append(conv_ids[r])
                cols["turn_idx"].append(turn_idxs[r])
                cols["field_name"].append(fr.name)
                cols["class_id"].append(fr.class_id)
                cols["value"].append(fr.value)
                cols["confidence"].append(fr.confidence)
                cols["num_detections"].append(fr.num_detections)
                cols["num_detected_values"].append(fr.num_detected_values)
                cols["sort_order"].append(fr.sort_order)
                cols["optional"].append(
                    bool(fr.optional) if fr.optional is not None else False)
                cols["review_needed"].append(review)
                cols["partition_id"].append(pid)
                for v, c in fr.values:
                    val_value.append(v)
                    val_conf.append(c)
                offsets.append(offsets[-1] + len(fr.values))

        schema = _FIELDS_PART_SCHEMA if self.with_partition_id else FIELDS_SCHEMA
        values = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array(val_value, pa.string()),
                 pa.array(val_conf, pa.float32())],
                fields=list(VALUE_STRUCT)))
        arrays = []
        for f in schema:
            if f.name == "values":
                arrays.append(values)
            else:
                arrays.append(pa.array(cols[f.name], f.type))
        return pa.Table.from_arrays(arrays, schema=schema)

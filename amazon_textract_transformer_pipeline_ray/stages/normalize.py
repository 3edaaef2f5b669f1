"""Normalizer as an endpoint-shaped actor-pool stage (reference A3).

The reference runs seq2seq value normalization as a SEPARATE stateful
service the post-processing Lambda calls over the network, deduping
repeated request texts so each distinct input is normalized once
(``notebooks/src/code/inference_seq2seq.py:1-130``,
``pipeline/postprocessing/fn-postprocess/util/normalize.py:26-91``).

Round 1 folded that semantic into the extraction kernel (a synchronous
registry call inside ``normalize_detections``) — correct, but it left no
actor-pool slot for a user plugging in a REAL (expensive) normalizer
model.  This module restores the reference's stage shape on Ray Data:

    build_turns(ds, cfg.without_normalizers())      # stage A: raw spans
      .map_batches(NormalizerStage,                 # stage B: actor pool
                   fn_constructor_kwargs={"cfg": cfg},
                   concurrency=N, batch_size=B)

``NormalizerStage.__init__`` is the once-per-actor model-load slot;
``__call__`` normalizes each batch with BATCH-local request dedup (one
"endpoint call" per distinct (normalizer, prompt+text) — strictly fewer
calls than the per-turn dedup of the fused path) and re-consolidates
every turn so ``doc_confidence`` / ``review_needed`` reflect the
normalized value grouping.  Output equals the fused single-stage
pipeline (asserted in tests/test_normalizer_stage.py): span texts,
flags and counts byte-exact; ``doc_confidence`` to float32 precision,
because the stage folds the PERSISTED f32 span confidences where the
fused kernel folds its in-memory f64 values.

The stage also runs post-hoc over an already-written turns table (it
only needs the TURNS_SCHEMA columns), so re-normalizing a corpus does
not require re-running extraction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.assembler import Detection
from ..functions.consolidate import consolidate_turn
from ..functions.dates import NORMALIZERS
from ..schemas import SPAN_STRUCT


class NormalizerStage:
    """Actor-pool UDF over the turns table: normalize span values and
    re-consolidate per-turn document confidence.

    Parameters
    ----------
    cfg : full engine config (the one WITH normalizers).  Fields without
        a configured normalizer pass through untouched.
    normalizers : optional override registry (name -> callable) — the
        injection point for a real model client; defaults to the built-in
        pure-function registry.
    """

    def __init__(self, cfg: EngineConfig | None = None,
                 normalizers: dict | None = None):
        cfg = cfg or DEFAULT_CONFIG
        self.cfg = cfg
        registry = normalizers if normalizers is not None else NORMALIZERS
        # class_id -> (callable, norm_name, prompt) for normalized fields:
        self.norm_by_class = {
            f.class_id: (registry[f.normalizer], f.normalizer,
                         f.normalizer_prompt or "")
            for f in cfg.fields if f.normalizer and not f.ignore
        }
        self.entity_classes = cfg.entity_classes
        self.requests = 0  # distinct-text "endpoint" invocations (observability)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or not self.norm_by_class:
            return batch
        spans = batch.column("spans").combine_chunks()
        lens = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        flat = pc.list_flatten(spans)

        cls = flat.field("class_id").to_numpy(zero_copy_only=False)
        texts = flat.field("text").to_pylist()
        raws = flat.field("raw_text").to_pylist()
        confs = flat.field("confidence").to_numpy(zero_copy_only=False)

        # --- batch-local request dedup (normalize.py:40-58 semantics) ----
        cache: dict[tuple[str, str], str] = {}
        norm_ids = np.array(sorted(self.norm_by_class), dtype=cls.dtype)
        for i in np.flatnonzero(np.isin(cls, norm_ids)):
            fn, name, prompt = self.norm_by_class[int(cls[i])]
            key = (name, prompt + texts[i])
            new = cache.get(key)
            if new is None:
                new = fn(texts[i])  # one "endpoint call" per distinct text
                cache[key] = new
                self.requests += 1
            if raws[i] is None:  # extract.py:63-72 echo guard
                raws[i] = texts[i]
            texts[i] = new

        # --- re-consolidate ONLY turns touched by normalization ----------
        # Untouched turns keep their incoming doc_confidence/review_needed
        # verbatim (their consolidation is identical with or without
        # normalizers, and the incoming values were folded in f64 before
        # the f32 column quantization).  Touched turns are recomputed from
        # the persisted f32 confidences — agreement is to f32 precision,
        # and a doc_confidence landing EXACTLY on the review threshold can
        # gate differently than the fused path's pre-quantization f64
        # comparison (documented recompute-from-table semantics).
        doc_conf = batch.column("doc_confidence").to_numpy(
            zero_copy_only=False).astype(np.float32).copy()
        review = batch.column("review_needed").to_numpy(
            zero_copy_only=False).astype(bool).copy()
        span_is_norm = np.isin(cls, norm_ids)
        row_of_span = np.repeat(np.arange(batch.num_rows), lens)
        affected = np.zeros(batch.num_rows, dtype=bool)
        affected[row_of_span[span_is_norm]] = True
        pages = flat.field("page").to_numpy(zero_copy_only=False)
        starts = flat.field("start").to_numpy(zero_copy_only=False)
        ends = flat.field("end").to_numpy(zero_copy_only=False)
        boxes = np.stack([flat.field(c).to_numpy(zero_copy_only=False)
                          for c in ("x0", "y0", "x1", "y1")], axis=1)
        for r in np.flatnonzero(affected):
            dets = [
                Detection(
                    class_id=int(cls[i]),
                    class_name=self.entity_classes.get(int(cls[i]), ""),
                    page_num=int(pages[i]),
                    text=texts[i],
                    raw_text=raws[i],
                    confidence=float(confs[i]),
                    start=int(starts[i]),
                    end=int(ends[i]),
                    box=boxes[i].astype(np.int64),
                )
                for i in range(int(offs[r]), int(offs[r + 1]))
            ]
            tf = consolidate_turn(dets, self.cfg)
            doc_conf[r] = tf.confidence
            review[r] = tf.review_needed(self.cfg.review_threshold)

        # --- columnar reassembly (only 4 columns change) ------------------
        children = []
        for f in SPAN_STRUCT:
            if f.name == "text":
                children.append(pa.array(texts, pa.string()))
            elif f.name == "raw_text":
                children.append(pa.array(raws, pa.string()))
            else:
                # cast is a no-op on already-conforming input; it also
                # repairs types widened by a pandas round-trip upstream:
                children.append(flat.field(f.name).cast(f.type))
        new_spans = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            pa.StructArray.from_arrays(children, fields=list(SPAN_STRUCT)))

        out = batch
        for name, arr in (("spans", new_spans),
                          ("doc_confidence", pa.array(doc_conf, pa.float32())),
                          ("review_needed", pa.array(review, pa.bool_()))):
            out = out.set_column(out.schema.get_field_index(name),
                                 pa.field(name, arr.type), arr)
        return out


def build_turns_staged(
    ds,
    cfg: EngineConfig = DEFAULT_CONFIG,
    concurrency: int | tuple[int, int] = (1, 4),
    batch_size: int = 512,
    normalizers: dict | None = None,
):
    """Two-stage turns pipeline: extraction with normalizers stripped,
    then the normalizer actor pool.  Byte-equal to
    ``build_turns(ds, cfg)`` with the built-in registry; the ``normalizers``
    override is the slot for a real model client."""
    from ..pipelines.extraction import build_turns

    raw = build_turns(ds, cfg.without_normalizers(), batch_size=batch_size)
    return raw.map_batches(
        NormalizerStage,
        fn_constructor_kwargs={"cfg": cfg, "normalizers": normalizers},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

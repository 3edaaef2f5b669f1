"""Training-data export pipeline (reference M6+M7 chain as a dataset).

Re-expresses the reference's page-example preparation for token
classification — ``notebooks/src/code/data/ner.py:278-335``
(``prepare_base_dataset`` page records -> ``map_smgt_boxes_to_word_labels``
-> ``split_long_dataset_samples``) — as one streaming ``map_batches``
stage over transcript Parquet:

  * a "page example" is one page of one parsed turn: ``words[]`` +
    0-1000 LayoutLM-quantized ``boxes[]`` (base.py:337-417 word/box
    projection);
  * ``word_labels[]`` comes from an SMGT-style bounding-box annotation
    record via the >=50%-area-overlap rule (ner.py:38-152, M7 kernel
    ``functions/geometry.py`` / ``functions/smgt.py``).  Records are
    synthesized deterministically from the parser's hint geometry —
    exactly the boxes a labeling job drawing one rectangle per
    same-class line run would produce;
  * long pages split into ``max_seq_len``-token windows on word
    boundaries with the NaiveExampleSplitter semantics (splitting.py:
    63-144, M6 kernel ``functions/splitter.py``), with window
    bookkeeping (window_idx, n_windows, word_start, word_end) kept so
    training examples trace back to their source page.

The output is the materialized training table the reference feeds its
HuggingFace trainer; every column is Arrow-typed (words/boxes/labels as
list columns) so the table streams straight into a writer or a
downstream tokenizer stage.  No shuffle: page examples are independent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.blocks import CLS_OTHER, TurnBlocks
from ..functions.geometry import quantize_boxes
from ..functions.smgt import annotation_word_labels
from ..functions.splitter import split_words
from ..functions.tokenizer import n_tokens_per_word
from ..functions.turn import parse_payload

# Synthetic labeling-job image geometry (SMGT records carry absolute
# pixels; any fixed size round-trips through parse_annotation_record):
IMG_W, IMG_H = 1600, 2000

TRAINING_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("page", pa.int16()),          # 1-based source page
    ("window_idx", pa.int32()),    # 0-based window within the page
    ("n_windows", pa.int32()),
    ("word_start", pa.int32()),    # word-index slice into the page
    ("word_end", pa.int32()),
    ("n_tokens", pa.int32()),      # token count of this window
    ("words", pa.list_(pa.string())),
    ("boxes", pa.list_(pa.list_(pa.int32(), 4))),  # 0-1000 x0,y0,x1,y1
    ("word_labels", pa.list_(pa.int16())),
])


def synth_annotation_record(tb: TurnBlocks, page_ix: np.ndarray) -> dict:
    """Deterministic SMGT-style record for one page of a parsed turn.

    One absolute-pixel rectangle per contiguous same-hint run within a
    line (hint != other) — the shape a human labeler tracing the
    parser-visible regions would draw (record schema of reference
    ``data/smgt.py:18-159``)."""
    hints = tb.hint[page_ix]
    lines = tb.line_id[page_ix]
    boxes = tb.boxes01[page_ix]
    n = len(page_ix)
    anns = []
    if n:
        new_run = np.concatenate(
            [[True], (hints[1:] != hints[:-1]) | (lines[1:] != lines[:-1])])
        starts = np.flatnonzero(new_run)
        ends = np.concatenate([starts[1:], [n]])
        for s, e in zip(starts, ends):
            h = int(hints[s])
            if h == CLS_OTHER:
                continue
            x0 = float(boxes[s:e, 0].min()) * IMG_W
            y0 = float(boxes[s:e, 1].min()) * IMG_H
            x1 = float(boxes[s:e, 2].max()) * IMG_W
            y1 = float(boxes[s:e, 3].max()) * IMG_H
            anns.append({"class_id": h, "left": x0, "top": y0,
                         "width": x1 - x0, "height": y1 - y0})
    return {"image_size": [{"height": IMG_H, "width": IMG_W, "depth": 3}],
            "annotations": anns}


def _example_rows(payload: str, cfg: EngineConfig, max_seq_len: int,
                  with_labels: bool = True) -> list[dict]:
    """One turn -> window example dicts (no conv bookkeeping yet).

    ``with_labels=False`` is the MLM-task shape (reference mlm.py: same
    page windows, no word labels — masking happens downstream)."""
    tb = parse_payload(payload)
    if tb.n_words == 0:
        return []
    out = []
    boxes1000 = quantize_boxes(tb.boxes01)
    word_lens = np.array([len(w) for w in tb.words], dtype=np.int64)
    tok_counts = n_tokens_per_word(word_lens)
    for page in np.unique(tb.page_id):
        ix = np.flatnonzero(tb.page_id == page)
        if with_labels:
            record = synth_annotation_record(tb, ix)
            labels = annotation_word_labels(record, boxes1000[ix],
                                            cfg.n_classes)
        counts = tok_counts[ix]
        word_start_token = np.concatenate([[0], np.cumsum(counts)[:-1]])
        total = int(counts.sum())
        windows = split_words(word_start_token, total, max_seq_len)
        for wix, (ws, we) in enumerate(windows):
            row = {
                "page": int(page) + 1,
                "window_idx": wix,
                "n_windows": len(windows),
                "word_start": ws,
                "word_end": we,
                "n_tokens": int(counts[ws:we].sum()),
                "words": [tb.words[int(i)] for i in ix[ws:we]],
                "boxes": boxes1000[ix[ws:we]],
            }
            if with_labels:
                row["word_labels"] = labels[ws:we]
            out.append(row)
    return out


def build_training_examples(
    ds: rd.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    max_seq_len: int | None = None,
    batch_size: int = 256,
) -> rd.Dataset:
    """Lazy training-example dataset from a transcript dataset."""
    seq_len = max_seq_len if max_seq_len is not None else cfg.max_seq_len

    def to_examples(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "conv_id": [], "turn_idx": [], "page": [], "window_idx": [],
            "n_windows": [], "word_start": [], "word_end": [], "n_tokens": [],
        }
        flat_words: list[str] = []
        flat_boxes: list[np.ndarray] = []
        flat_labels: list[np.ndarray] = []
        offsets = [0]
        for cid, tix, payload in zip(batch.column("conv_id").to_pylist(),
                                     batch.column("turn_idx").to_pylist(),
                                     batch.column("text").to_pylist()):
            for row in _example_rows(payload, cfg, seq_len):
                cols["conv_id"].append(cid)
                cols["turn_idx"].append(tix)
                for k in ("page", "window_idx", "n_windows",
                          "word_start", "word_end", "n_tokens"):
                    cols[k].append(row[k])
                flat_words.extend(row["words"])
                flat_boxes.append(row["boxes"])
                flat_labels.append(row["word_labels"])
                offsets.append(offsets[-1] + len(row["words"]))

        offs = pa.array(offsets, pa.int32())
        all_boxes = (np.concatenate(flat_boxes) if flat_boxes
                     else np.zeros((0, 4), dtype=np.int64))
        all_labels = (np.concatenate(flat_labels) if flat_labels
                      else np.zeros(0, dtype=np.int64))
        words_arr = pa.ListArray.from_arrays(
            offs, pa.array(flat_words, pa.string()))
        boxes_arr = pa.ListArray.from_arrays(
            offs, pa.FixedSizeListArray.from_arrays(
                pa.array(all_boxes.reshape(-1).astype(np.int32)), 4))
        labels_arr = pa.ListArray.from_arrays(
            offs, pa.array(all_labels.astype(np.int16)))
        arrays = []
        for f in TRAINING_SCHEMA:
            if f.name == "words":
                arrays.append(words_arr)
            elif f.name == "boxes":
                arrays.append(boxes_arr)
            elif f.name == "word_labels":
                arrays.append(labels_arr)
            else:
                arrays.append(pa.array(cols[f.name], f.type))
        return pa.Table.from_arrays(arrays, schema=TRAINING_SCHEMA)

    return ds.map_batches(to_examples, batch_format="pyarrow",
                          batch_size=batch_size)


# ---------------------------------------------------------------------------
# Sequence packing (training-throughput export shape)
# ---------------------------------------------------------------------------

PACKED_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("pack_idx", pa.int32()),      # 0-based pack within the conversation
    ("n_windows", pa.int32()),
    ("n_tokens", pa.int64()),
    ("fill_ratio", pa.float32()),  # n_tokens / budget (exact: budget = 2^k)
    ("window_md5", pa.string()),   # md5 of "turn:page:win,..." in pack order
])


def greedy_pack(new_conv: np.ndarray, toks: np.ndarray,
                token_budget: int) -> np.ndarray:
    """Pack index per window (the pure greedy scan; spec in
    ``build_packed_examples``).  ``new_conv[i]`` marks the first window
    of a conversation in the (already sorted) window sequence."""
    pack = np.zeros(len(toks), dtype=np.int32)
    cum = 0
    p = 0
    for i in range(len(toks)):           # sequential scan (see docstring)
        if new_conv[i]:
            p, cum = 0, 0
        elif cum + toks[i] > token_budget:
            p, cum = p + 1, 0
        cum += toks[i]
        pack[i] = p
    return pack


def build_packed_examples(
    windows: rd.Dataset,
    token_budget: int = 512,
) -> rd.Dataset:
    """Greedy in-order sequence packing of training windows into
    fixed token-budget bins, per conversation — the export shape that
    keeps training-step utilization high (padding only at pack tails).

    Deterministic spec: windows of one conversation are visited in
    (turn_idx, page, window_idx) order; a window joins the current pack
    unless its tokens would overflow ``token_budget``, in which case the
    pack closes and a new one starts (every pack holds >= 1 window, so an
    oversized window rides alone and ``fill_ratio`` may exceed 1.0).

    Scale shape: ONE coarse-hash shuffle on conv_id (the same shard-group
    pattern as the LSH bucket stages — grouping at conversation
    granularity would pay Ray's per-group overhead per conv); inside a
    shard task the windows are sorted once and scanned once.  The scan is
    sequential BY DEFINITION (each pack boundary depends on the previous
    one), so the parallel unit is the conversation; the per-element work
    is a compare+add.  Output: one row per pack (PACKED_SCHEMA).
    """
    import hashlib

    import pandas as pd

    from ..sources.scale import shuffle_width

    n_shards = shuffle_width()

    def add_shard(t: pa.Table) -> pa.Table:
        conv = t.column("conv_id").to_numpy(zero_copy_only=False)
        shard = (pd.util.hash_array(conv.astype(object)).astype(np.uint64)
                 % np.uint64(n_shards)).astype(np.int32)
        return t.select(["conv_id", "turn_idx", "page", "window_idx",
                         "n_tokens"]).append_column(
            "shard", pa.array(shard))

    def pack_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["conv_id", "turn_idx", "page", "window_idx"],
                          kind="mergesort").reset_index(drop=True)
        conv = g["conv_id"].to_numpy()
        toks = g["n_tokens"].to_numpy().astype(np.int64)
        new_conv = np.empty(len(g), dtype=bool)
        new_conv[0] = True
        new_conv[1:] = conv[1:] != conv[:-1]
        g["pack_idx"] = greedy_pack(new_conv, toks, token_budget)
        keys = (g["turn_idx"].astype(str) + ":" + g["page"].astype(str)
                + ":" + g["window_idx"].astype(str))
        out = (g.assign(key=keys)
               .groupby(["conv_id", "pack_idx"], as_index=False, sort=True)
               .agg(n_windows=("key", "size"), n_tokens=("n_tokens", "sum"),
                    window_keys=("key", ",".join)))
        out["fill_ratio"] = (out["n_tokens"] / token_budget).astype(
            np.float32)
        out["window_md5"] = [hashlib.md5(k.encode()).hexdigest()
                             for k in out.pop("window_keys")]
        return out.astype({"pack_idx": np.int32, "n_windows": np.int32,
                           "n_tokens": np.int64})

    return (windows.map_batches(add_shard, batch_format="pyarrow")
            .groupby("shard").map_groups(pack_shard, batch_format="pandas")
            .select_columns([f.name for f in PACKED_SCHEMA]))

"""Training-task registry dispatch (reference
``notebooks/src/code/data/__init__.py:22-51``): one entry point mapping a
task name in {"mlm", "ner", "seq2seq"} to its prepared dataset, with the
reference's exact unknown-task error message shape.

Ray-native task shapes:

* ``ner``  — the labeled page-example window table
  (``pipelines/training.py:build_training_examples``; reference
  ner.py:278-335).
* ``mlm``  — the same windows WITHOUT labels (reference mlm.py prepares
  identical base windows; masking happens in the collator at train
  time).  Because this engine is a data-prep system, it additionally
  emits a DETERMINISTIC ``mask_positions`` column (window-relative word
  indices, ~15% rate, seeded by (conv, turn, page, window, word)) so the
  exported table is reproducible and directly consumable — a documented
  divergence from the reference's train-time random masking.
* ``seq2seq`` — (source, target) date-normalization pairs.  The
  reference GENERATES random date strings
  (``data/seq2seq/date_normalization.py:140-226``); the Ray restatement
  instead MINES the corpus: date-class spans detected by the extraction
  kernel become sources, the registry normalizer provides targets, and
  pairs are deduplicated distributed with occurrence counts (hash
  groupby — the exact-dedup scale shape).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..functions.dates import normalize_date_iso

MLM_MASK_PCT = 15  # percent of words masked, deterministic

# Standard CRC-32 (IEEE 802.3, reflected 0xEDB88320) lookup table — the
# polynomial zlib.crc32 implements; lets the per-word mask hash run as
# a handful of numpy table probes over the whole batch instead of a
# Python loop per word.
_CRC_TABLE = np.zeros(256, dtype=np.uint32)
for _i in range(256):
    _c = np.uint32(_i)
    for _ in range(8):
        _c = (_c >> np.uint32(1)) ^ (np.uint32(0xEDB88320)
                                     if _c & np.uint32(1) else np.uint32(0))
    _CRC_TABLE[_i] = _c
del _i, _c


def _crc32_int_suffix(base: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Vectorized ``zlib.crc32(str(w).encode(), base)`` — bit-identical
    to the scalar zlib call (asserted in tests).  ``base`` is the
    (finalized) crc of the per-window seed prefix; the decimal digits
    of ``w`` are folded in most-significant-first, grouped by digit
    count so every step is a whole-array table probe."""
    crc = base.astype(np.uint32) ^ np.uint32(0xFFFFFFFF)
    w = w.astype(np.int64)
    ndig = np.ones(len(w), dtype=np.int64)
    for p in (10, 100, 1000, 10**4, 10**5, 10**6, 10**7, 10**8):
        ndig += w >= p
    for length in np.unique(ndig):
        m = ndig == length
        x, c = w[m], crc[m]
        for k in range(int(length) - 1, -1, -1):
            byte = ((x // 10**k) % 10 + 48).astype(np.uint32)
            c = (c >> np.uint32(8)) ^ _CRC_TABLE[(c ^ byte)
                                                 & np.uint32(0xFF)]
        crc[m] = c
    return crc ^ np.uint32(0xFFFFFFFF)


def build_mlm_examples(
    ds: rd.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    max_seq_len: int | None = None,
    batch_size: int = 256,
) -> rd.Dataset:
    """Unlabeled page-example windows + deterministic mask positions."""
    from .training import TRAINING_SCHEMA, _example_rows

    seq_len = max_seq_len if max_seq_len is not None else cfg.max_seq_len
    fields = [f for f in TRAINING_SCHEMA if f.name != "word_labels"]
    schema = pa.schema(fields).append(
        pa.field("mask_positions", pa.list_(pa.int32())))

    def to_examples(batch: pa.Table) -> pa.Table:
        # Window expansion stays per turn (parse/window shapes are
        # inherently per-payload), but mask hashing is batched: one
        # zlib.crc32 of the short seed prefix per WINDOW, then a single
        # vectorized digit-CRC fold over every word in the batch.
        rows, bases, n_words = [], [], []
        for cid, tix, payload in zip(batch.column("conv_id").to_pylist(),
                                     batch.column("turn_idx").to_pylist(),
                                     batch.column("text").to_pylist()):
            for row in _example_rows(payload, cfg, seq_len,
                                     with_labels=False):
                seed = f"{cid}:{tix}:{row['page']}:{row['window_idx']}:"
                bases.append(zlib.crc32(seed.encode()))
                n_words.append(len(row["words"]))
                rows.append({
                    "conv_id": cid, "turn_idx": tix, **{
                        k: row[k] for k in
                        ("page", "window_idx", "n_windows", "word_start",
                         "word_end", "n_tokens", "words")},
                    "boxes": [b.tolist() for b in row["boxes"]],
                })
        counts = np.asarray(n_words, dtype=np.int64)
        if rows and counts.sum():
            win_of = np.repeat(np.arange(len(rows), dtype=np.int64),
                               counts)
            w_arr = (np.arange(int(counts.sum()), dtype=np.int64)
                     - np.repeat(np.concatenate(
                         [[0], np.cumsum(counts)[:-1]]), counts))
            keep = (_crc32_int_suffix(
                np.asarray(bases, np.uint32)[win_of], w_arr)
                % np.uint32(100)) < MLM_MASK_PCT
            offsets = np.concatenate([[0], np.cumsum(
                np.bincount(win_of[keep], minlength=len(rows)))])
            mask_col = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(w_arr[keep].astype(np.int32)))
        else:
            mask_col = pa.array([[]] * len(rows), pa.list_(pa.int32()))
        base_tbl = pa.Table.from_pylist(rows, schema=pa.schema(fields))
        return base_tbl.append_column("mask_positions", mask_col)

    return ds.map_batches(to_examples, batch_format="pyarrow",
                          batch_size=batch_size)


def build_seq2seq_pairs(
    ds: rd.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    batch_size: int = 256,
) -> rd.Dataset:
    """Distinct (source, target, n_occurrences) date-normalization pairs
    mined from the corpus's date-class spans, deduplicated distributed."""
    from .extraction import build_turns

    date_ids = [f.class_id for f in cfg.fields
                if f.normalizer == "date_iso" and not f.ignore]
    raw_cfg = cfg.without_normalizers()  # keep raw span texts as sources
    turns = build_turns(ds, raw_cfg, batch_size=batch_size)

    def span_pairs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat = pc.list_flatten(batch.column("spans").combine_chunks())
        cls = flat.field("class_id").to_numpy(zero_copy_only=False)
        keep = np.isin(cls, np.asarray(date_ids, dtype=cls.dtype))
        texts = np.asarray(flat.field("text").to_pylist(),
                           dtype=object)[keep]
        # batch-local pre-aggregation before the global dedup groupby:
        vals, counts = (np.unique(texts, return_counts=True)
                        if len(texts) else (np.array([], dtype=object),
                                            np.array([], dtype=np.int64)))
        return pa.table({
            "source": pa.array(vals.tolist(), pa.string()),
            "target": pa.array([normalize_date_iso(v) for v in vals],
                               pa.string()),
            "n": pa.array(counts, pa.int64()),
        })

    from ray.data.aggregate import Sum

    pairs = turns.map_batches(span_pairs, batch_format="pyarrow",
                              batch_size=batch_size)
    return (pairs.groupby(["source", "target"])
            .aggregate(Sum("n", alias_name="n_occurrences")))


def get_task(
    name: str,
    ds: rd.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    **kwargs,
) -> rd.Dataset:
    """Dispatch a task name to its prepared dataset (data/__init__.py:22-51)."""
    from .training import build_training_examples

    if name == "mlm":
        return build_mlm_examples(ds, cfg, **kwargs)
    elif name == "ner":
        return build_training_examples(ds, cfg, **kwargs)
    elif name == "seq2seq":
        return build_seq2seq_pairs(ds, cfg, **kwargs)
    else:
        raise ValueError(
            "Unknown task '%s' is not in 'mlm', 'ner', 'seq2seq'" % name)

"""The flagship extraction pipeline (Ray Data restatement of the
reference's production document pipeline, SURVEY.md §3.1):

    read_parquet(transcripts)                       # prune to needed columns
      -> map_batches(TurnExtractor, concurrency=N)  # actor pool (parse+classify+assemble)
      -> [write_parquet partitioned + manifests]    # resumable layout
    turns -> map_batches(add_text_digest)           # lean pre-shuffle projection
          -> groupby(conv_id).map_groups(...)       # the one semantic shuffle
          -> conversations table

The confidence gate of the reference's state machine
(``pipeline/__init__.py:288-301``) is the ``review_needed`` column, not a
branch.
"""

from __future__ import annotations

import os
from typing import Sequence

import pyarrow.dataset  # noqa: F401  (ensures pa.dataset available for filters)
import ray.data as rd

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.conversation import add_text_digest, summarize_conversation
from ..stages.extract import TurnExtractor, make_extract_fn
from ..state import checkpoint as ckpt

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text"]


def read_transcripts(paths: str | Sequence[str]) -> rd.Dataset:
    """Column-pruned read: only what extraction needs leaves storage."""
    return rd.read_parquet(paths, columns=TRANSCRIPT_COLUMNS)


def build_turns(
    ds: rd.Dataset,
    cfg: EngineConfig = DEFAULT_CONFIG,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 512,
    emit: str = "turns",
    with_partition_id: bool = False,
    only_partitions: frozenset[int] | None = None,
    compute: str = "tasks",
) -> rd.Dataset:
    """Lazy turns (or fields) dataset from a transcript dataset.

    compute="tasks" (default): stateless-task stage with per-worker-process
    extractor caching — best for the built-in cheap CPU classifier (no
    actor-pool cold start, elastic scheduling).
    compute="actors": classic actor pool (state in ``__init__``) — the
    right shape when the classifier is a heavyweight model; concurrency
    defaults to (1, available CPUs).
    """
    if compute == "tasks":
        return ds.map_batches(
            make_extract_fn(cfg, emit, with_partition_id, only_partitions),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    if concurrency is None:
        import ray

        n = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (1, max(2, n))
    return ds.map_batches(
        TurnExtractor,
        fn_constructor_kwargs={
            "cfg": cfg,
            "emit": emit,
            "with_partition_id": with_partition_id,
            "only_partitions": only_partitions,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def build_conversations(turns: rd.Dataset) -> rd.Dataset:
    """Conversation-level rollup with stable turn ordering (the one
    semantic shuffle; payload is the lean digest projection)."""
    lean = turns.map_batches(add_text_digest, batch_format="pyarrow")
    return lean.groupby("conv_id").map_groups(
        summarize_conversation, batch_format="pandas"
    )


def build_eval_metrics(ds: rd.Dataset, cfg: EngineConfig = DEFAULT_CONFIG) -> dict:
    """Classifier quality vs parser-hint gold labels, with the reference's
    exact metric definitions (masked per-example accuracy + focus accuracy,
    ``notebooks/src/code/data/ner.py:338-417``) computed distributed.

    In the synthetic setting the parser hint is the gold word class, so
    this is the engine's self-evaluation harness — the analog of the
    reference's training-time metric gate."""
    import pyarrow as pa

    from ..functions.metrics import distributed_token_metrics
    from ..functions.turn import extract_turns_batch

    def label_rows(batch: pa.Table) -> pa.Table:
        labels, preds = [], []
        exts = extract_turns_batch(batch.column("text").to_pylist(), cfg)
        for ext in exts:
            if ext is None:
                continue
            labels.append(ext.blocks.hint.astype("int64").tolist())
            preds.append(ext.pred_class.astype("int64").tolist())
        return pa.table({
            "labels": pa.array(labels, pa.list_(pa.int64())),
            "pred_class": pa.array(preds, pa.list_(pa.int64())),
        })

    pairs = ds.map_batches(label_rows, batch_format="pyarrow", batch_size=512)
    return distributed_token_metrics(pairs, cfg.n_classes)


def run_checkpointed(
    input_files: Sequence[str],
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
) -> dict:
    """Resumable extraction run.

    Output layout: ``out_dir/data/partition_id=N/*.parquet`` + one manifest
    per partition under ``out_dir/_manifests/``.  A rerun with identical
    (inputs, config, code version) skips complete partitions entirely; an
    interrupted run redoes only unfinished partitions.  Partition contents
    are a pure function of the lineage inputs, so resumed output is
    byte-identical (oracle-checked in tests).
    """
    fingerprint = ckpt.input_fingerprint(input_files)
    lineage = cfg.lineage_id(fingerprint)
    ckpt.prune_stale(out_dir, lineage, cfg.num_partitions)
    done = ckpt.load_complete_partitions(out_dir, lineage)
    todo = frozenset(range(cfg.num_partitions)) - frozenset(done)
    data_dir = os.path.join(out_dir, "data")
    if not todo:
        return ckpt.run_summary(out_dir)

    # Clear every partition dir not committed under THIS lineage — that
    # covers unfinished partitions (crash-safety: a manifest is only
    # written after its partition's data is fully written), stale
    # partitions of a previous config, and out-of-range ids from a larger
    # previous num_partitions:
    import glob as _glob
    import shutil

    for pdir in _glob.glob(os.path.join(data_dir, "partition_id=*")):
        try:
            pid = int(pdir.rsplit("=", 1)[1])
        except ValueError:
            pid = -1
        if pid not in done:
            shutil.rmtree(pdir)

    ds = read_transcripts(list(input_files))
    turns = build_turns(
        ds,
        cfg,
        concurrency=concurrency,
        batch_size=batch_size,
        with_partition_id=True,
        only_partitions=todo,
    )
    turns.write_parquet(data_dir, partition_cols=["partition_id"])

    # Per-partition metrics: a column-pruned distributed aggregate over the
    # freshly-written partitions ONLY (their directories are passed
    # explicitly, with hive parsing rooted at data_dir so the virtual
    # partition_id column survives) — already-complete partitions keep
    # their manifests and are not re-read on resume:
    from ray.data.datasource.partitioning import Partitioning

    todo_dirs = [
        f for pid in todo
        for f in _glob.glob(
            os.path.join(data_dir, f"partition_id={pid}", "*.parquet"))
    ]
    if todo_dirs:
        written = rd.read_parquet(
            todo_dirs,
            columns=["partition_id", "n_spans", "boilerplate_ratio"],
            partitioning=Partitioning("hive", base_dir=data_dir))
    from ray.data.aggregate import Count, Mean, Sum

    seen = set()
    if todo_dirs:
        stats = written.groupby("partition_id").aggregate(
            Count(alias_name="turns_processed"),
            Sum("n_spans", alias_name="span_count"),
            Mean("boilerplate_ratio", alias_name="boilerplate_ratio"),
        ).to_pandas()
    else:  # every todo partition produced zero rows
        import pandas as pd

        stats = pd.DataFrame(columns=[
            "partition_id", "turns_processed", "span_count",
            "boilerplate_ratio"])
    for row in stats.itertuples(index=False):
        pid = int(row.partition_id)
        seen.add(pid)
        if pid in done:
            continue
        ckpt.write_manifest(
            out_dir, pid, lineage, fingerprint,
            turns_processed=int(row.turns_processed),
            turns_dropped_empty=0,
            boilerplate_ratio=float(row.boilerplate_ratio),
            span_count=int(row.span_count),
        )
    # Partitions with zero output rows still need a manifest:
    for pid in todo - seen:
        ckpt.write_manifest(out_dir, pid, lineage, fingerprint,
                            turns_processed=0, turns_dropped_empty=0,
                            boilerplate_ratio=0.0, span_count=0)
    return ckpt.run_summary(out_dir)


def read_turns_output(out_dir: str) -> rd.Dataset:
    """Read back a checkpointed run's turns table (hive-partitioned)."""
    return rd.read_parquet(os.path.join(out_dir, "data"))


def write_conversations(out_dir: str) -> dict:
    """Conversation-level rollup of a finished checkpointed run, written
    next to the turns table (``out_dir/conversations/``).

    The rollup is the engine's one semantic shuffle (groupby(conv_id) +
    in-group sort(turn_idx)); input is column-pruned to the lean digest
    projection before the shuffle (stages/conversation.py scale note).
    Idempotent: derived purely from the committed turns table."""
    turns = rd.read_parquet(
        os.path.join(out_dir, "data"),
        columns=["conv_id", "turn_idx", "n_words", "boilerplate_ratio",
                 "n_spans", "review_needed", "extracted_text"])
    conv_dir = os.path.join(out_dir, "conversations")
    import shutil

    shutil.rmtree(conv_dir, ignore_errors=True)
    build_conversations(turns).write_parquet(conv_dir)
    out = rd.read_parquet(conv_dir)
    from ray.data.aggregate import Count, Sum

    agg = out.aggregate(
        Count(alias_name="n_conversations"),
        Sum("n_turns", alias_name="n_turns"),
        Sum("n_review_needed", alias_name="n_review_needed"))
    return {"n_conversations": int(agg["n_conversations"]),
            "n_turns": int(agg["n_turns"]),
            "n_review_needed": int(agg["n_review_needed"])}

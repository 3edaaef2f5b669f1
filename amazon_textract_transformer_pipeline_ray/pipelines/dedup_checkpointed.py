"""Resumable runners for the suite's heavy one-shot dedup shuffles —
reference D2 skip-existing semantics (``util/ocr.py:151-161``) extended
to ``q_minhash_lsh_pairs`` and ``q_doc_dedup_ngram_corpus`` (round-4
verdict item 5), with the same commit-record protocol as the flagship's
``extraction.run_checkpointed`` and ``preprocess.run_preprocess_checkpointed``.

Granularity choices (what a 100-TB near-dup pass actually wants):

* LSH pairs: band-shard groups.  A doc's band rows fan out to MANY
  shards, so per-DOC partitions cannot scope the exchange; instead the
  output partition is ``shard % num_partitions`` and band rows are
  filtered to not-yet-committed shard groups BEFORE the shuffle.  A
  resumed run re-runs the minhash map (cheap, fully streaming, no
  state) but ships, buckets and exact-verifies ONLY the missing shard
  groups — the all-to-all and the quadratic in-bucket work, which
  dominate, are never repeated for committed groups.

* ngram dedup: two stages.  Stage A (the global gram exchange that
  finds cross-document duplicated 8-grams) is all-or-nothing under ONE
  commit record — duplicate detection is global, so per-partition
  records would buy nothing (same reasoning as preprocess stage B).
  Stage B (join + per-doc rewrite — the corpus-sized output pass) is
  partitioned by ``doc_id % num_partitions`` with one record per
  partition; a resume joins and rewrites only missing partitions
  against the committed removals table.

Every artifact is committed atomically AFTER its data is on disk and
carries a lineage id derived from (input fingerprint, kernel spec
version, layout, parameters); a rerun trusts a record only under an
identical lineage.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..sources.scale import join_width, shuffle_width, table_num_rows
from ..sources.tables import read_table
from ..state import checkpoint as ckpt
from .dedup import (
    JACCARD_THRESHOLD,
    LSH_BANDS,
    LSH_ROWS_PER_SHARD,
    MinHasher,
    _make_shard_pairs,
    _ngram_removals,
    _ngram_rewrite,
)

# Bumped whenever the minhash/banding/verify kernel changes semantics,
# so stale checkpoints from an older kernel can never be trusted:
LSH_PAIRS_SPEC_VERSION = "minhash-lsh-pairs-v1"
NGRAM_DEDUP_SPEC_VERSION = "ngram-dedup-corpus-v1"

_EMPTY_PAIRS = pa.table({
    "doc_id_a": pa.array([], pa.int64()),
    "doc_id_b": pa.array([], pa.int64()),
    "jaccard": pa.array([], pa.float64()),
})


def _clear_uncommitted(data_dir: str, man_dir: str, rec_prefix: str,
                       done: set[int]) -> None:
    """Remove partition dirs / stage records not committed under the
    current lineage (crash leftovers, stale layouts)."""
    for pdir in glob.glob(os.path.join(data_dir, "partition_id=*")):
        try:
            pid = int(pdir.rsplit("=", 1)[1])
        except ValueError:
            pid = -1
        if pid not in done:
            shutil.rmtree(pdir)
    for rec in glob.glob(os.path.join(man_dir, f"{rec_prefix}-*.json")):
        try:
            pid = int(os.path.basename(rec)[len(rec_prefix) + 1:
                                            len(rec_prefix) + 6])
        except ValueError:
            pid = -1
        if pid not in done:
            os.unlink(rec)


def run_lsh_pairs_checkpointed(sf_dir: str, out_dir: str,
                               num_partitions: int = 16,
                               threshold: float = JACCARD_THRESHOLD) -> dict:
    """Resumable ``q_minhash_lsh_pairs`` — see module docstring.

    Output: ``out_dir/pairs/partition_id=N/`` parquet (verified pair
    rows, partition = band-shard group) + one commit record per group
    under ``out_dir/_manifests``.  Returns ``{partitions, n_pairs,
    recomputed_partitions}``."""
    docs_path = os.path.join(sf_dir, "documents.parquet")
    fp = ckpt.input_fingerprint([docs_path])
    lineage = hashlib.sha256(
        f"{fp}|{LSH_PAIRS_SPEC_VERSION}|{num_partitions}|{threshold}"
        .encode()).hexdigest()[:16]
    man_dir = os.path.join(out_dir, "_manifests")
    pairs_dir = os.path.join(out_dir, "pairs")

    def _rec(pid: int) -> str:
        return os.path.join(man_dir, f"pairs-{pid:05d}.json")

    done = {pid for pid in range(num_partitions)
            if ckpt.load_stage_record(_rec(pid), lineage)}
    todo = sorted(set(range(num_partitions)) - done)

    if todo:
        _clear_uncommitted(pairs_dir, man_dir, "pairs", done)
        n_shards = shuffle_width(
            n_rows=table_num_rows(sf_dir, "documents") * LSH_BANDS,
            rows_per_shard=LSH_ROWS_PER_SHARD)
        todo_arr = np.asarray(todo, dtype=np.int64)
        bands = (read_table(sf_dir, "documents", ["doc_id", "text"])
                 .map_batches(MinHasher(n_shards=n_shards),
                              batch_format="pyarrow", batch_size=4096))

        def keep_todo(t: pa.Table) -> pa.Table:
            part = (t.column("shard").to_numpy().astype(np.int64)
                    % num_partitions)
            return t.filter(pa.array(np.isin(part, todo_arr)))

        shard_pairs = _make_shard_pairs(threshold)

        def shard_pairs_part(g: pd.DataFrame) -> pd.DataFrame:
            out = shard_pairs(g)
            pid = int(g["shard"].iloc[0]) % num_partitions
            out["partition_id"] = np.full(len(out), pid, np.int32)
            return out

        (bands.map_batches(keep_todo, batch_format="pyarrow",
                           batch_size=65536)
         .groupby("shard")
         .map_groups(shard_pairs_part, batch_format="pandas")
         .write_parquet(pairs_dir, partition_cols=["partition_id"]))
        for pid in todo:  # commit AFTER the write completed
            ckpt.write_stage_record(_rec(pid), {
                "partition_id": pid, "lineage_id": lineage,
                "status": "complete"})

    n_pairs = read_lsh_pairs(out_dir).count()
    return {"partitions": num_partitions, "n_pairs": int(n_pairs),
            "recomputed_partitions": len(todo)}


def read_lsh_pairs(out_dir: str) -> rd.Dataset:
    """Read back a checkpointed LSH run's verified pairs (empty-safe: a
    dup-free corpus writes manifests but no parquet)."""
    pairs_dir = os.path.join(out_dir, "pairs")
    if not glob.glob(os.path.join(pairs_dir, "partition_id=*")):
        return rd.from_arrow(_EMPTY_PAIRS)
    return rd.read_parquet(pairs_dir,
                           columns=["doc_id_a", "doc_id_b", "jaccard"])


def run_ngram_dedup_checkpointed(sf_dir: str, out_dir: str,
                                 num_partitions: int = 16,
                                 min_docs: int = 2) -> dict:
    """Resumable ``q_doc_dedup_ngram_corpus`` — see module docstring.

    Artifacts: ``out_dir/removals/`` (stage A, single commit record)
    and ``out_dir/cleaned/partition_id=N/`` (stage B, one record per
    doc partition).  Returns ``{partitions, n_docs,
    recomputed_partitions, removals_recomputed}``."""
    docs_path = os.path.join(sf_dir, "documents.parquet")
    fp = ckpt.input_fingerprint([docs_path])
    lineage = hashlib.sha256(
        f"{fp}|{NGRAM_DEDUP_SPEC_VERSION}|{num_partitions}|{min_docs}"
        .encode()).hexdigest()[:16]
    man_dir = os.path.join(out_dir, "_manifests")
    removals_dir = os.path.join(out_dir, "removals")
    cleaned_dir = os.path.join(out_dir, "cleaned")
    n_rows = table_num_rows(sf_dir, "documents")

    # ---- stage A: the global gram exchange (all-or-nothing) ----
    removals_rec = os.path.join(man_dir, "removals.json")
    rec = ckpt.load_stage_record(removals_rec, lineage)
    removals_recomputed = False
    if rec is None or not os.path.isdir(removals_dir):
        removals_recomputed = True
        shutil.rmtree(removals_dir, ignore_errors=True)
        n_shards = shuffle_width(n_rows=n_rows,
                                 rows_per_shard=LSH_ROWS_PER_SHARD)
        os.makedirs(removals_dir, exist_ok=True)
        _ngram_removals(sf_dir, min_docs, n_shards).write_parquet(
            removals_dir)
        ckpt.write_stage_record(removals_rec, {
            "lineage_id": lineage, "status": "complete"})
        # stage-B partitions were computed against a removals table that
        # can no longer be trusted (or never existed) — invalidate them:
        _clear_uncommitted(cleaned_dir, man_dir, "cleaned", set())

    # ---- stage B: join + rewrite, per doc partition ----
    def _rec(pid: int) -> str:
        return os.path.join(man_dir, f"cleaned-{pid:05d}.json")

    done = {pid for pid in range(num_partitions)
            if ckpt.load_stage_record(_rec(pid), lineage)}
    todo = sorted(set(range(num_partitions)) - done)

    if todo:
        _clear_uncommitted(cleaned_dir, man_dir, "cleaned", done)
        todo_arr = np.asarray(todo, dtype=np.int64)

        def keep_docs(t: pa.Table) -> pa.Table:
            part = (t.column("doc_id").to_numpy().astype(np.int64)
                    % num_partitions)
            return t.filter(pa.array(np.isin(part, todo_arr)))

        def keep_removals(t: pa.Table) -> pa.Table:
            part = (t.column("gdoc_id").to_numpy().astype(np.int64)
                    % num_partitions)
            return t.filter(pa.array(np.isin(part, todo_arr)))

        docs = (read_table(sf_dir, "documents", ["doc_id", "text"])
                .map_batches(keep_docs, batch_format="pyarrow",
                             batch_size=65536))
        if glob.glob(os.path.join(removals_dir, "*.parquet")):
            removals = rd.read_parquet(removals_dir).map_batches(
                keep_removals, batch_format="pyarrow", batch_size=65536)
        else:  # dup-free corpus: empty right side with the join schema
            removals = rd.from_arrow(pa.table({
                "gdoc_id": pa.array([], pa.int64()),
                "positions_blob": pa.array([], pa.binary())}))
        joined = docs.join(removals, join_type="left_outer",
                           num_partitions=join_width(n_rows),
                           on=("doc_id",), right_on=("gdoc_id",))

        def rewrite_part(t: pa.Table) -> pa.Table:
            out = _ngram_rewrite(t)
            part = (out.column("doc_id").to_numpy().astype(np.int64)
                    % num_partitions)
            return out.append_column("partition_id",
                                     pa.array(part.astype(np.int32)))

        (joined.map_batches(rewrite_part, batch_format="pyarrow",
                            batch_size=4096)
         .write_parquet(cleaned_dir, partition_cols=["partition_id"]))
        for pid in todo:  # commit AFTER the write completed
            ckpt.write_stage_record(_rec(pid), {
                "partition_id": pid, "lineage_id": lineage,
                "status": "complete"})

    n_docs = read_ngram_dedup(out_dir).count()
    return {"partitions": num_partitions, "n_docs": int(n_docs),
            "recomputed_partitions": len(todo),
            "removals_recomputed": removals_recomputed}


def read_ngram_dedup(out_dir: str) -> rd.Dataset:
    """Read back a checkpointed substring-dedup run's cleaned table."""
    return rd.read_parquet(
        os.path.join(out_dir, "cleaned"),
        columns=["doc_id", "n_tokens", "n_removed", "cleaned_md5"])

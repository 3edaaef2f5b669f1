"""Incremental cross-run exact dedup: a persisted seen-hash index so
successive ingestion runs dedup NEW shards against everything already
committed — the 100-TB ingestion shape, where re-hashing (let alone
re-shuffling) the historical corpus per arriving batch is not an option.

State layout (``state_dir``)::

    seen/bucket=BB/run-<run_id>.parquet   (columns: h, doc_id)
    runs/<run_id>.json                    (commit record + survivor count)
    survivors/<run_id>.parquet            (the run's output, for rerun replay)

* ``h`` is the md5 hex of the doc text (the ``q_doc_fingerprint``
  convention); ``bucket`` is the first byte of ``h`` (00..ff scaled to
  ``n_buckets``), so a probe for one bucket's new hashes reads ONLY that
  bucket's committed files — per-task state IO is corpus/n_buckets, and
  the probe parallelism equals the bucket count.
* A run is visible to later runs only after its ``runs/<run_id>.json``
  commit record exists; tasks of a crashed run leave bucket files that
  readers IGNORE (not listed in any commit record), and the rerun
  overwrites them with identical deterministic content (tmp + atomic
  rename), so crash-rerun is idempotent end to end.
* Re-ingesting an already-committed ``run_id`` replays the stored
  survivor table without touching the corpus (the checkpoint-manifest
  pattern of ``state/checkpoint.py``, applied to dedup state).

Concurrency contract — SINGLE WRITER: at most one ``ingest_run`` or
``compact_state`` may mutate a ``state_dir`` at a time (the production
shape: one ingestion scheduler owning the state, exactly like the
reference's single pipeline owning its DynamoDB-style progress table).
Two concurrent ingests of *different* run_ids can both admit the same
hash (each snapshots the committed list before the other commits).  A
compaction racing an ingest is additionally defended in depth: the
probe re-validates the committed list on disk and folds in any
COMMITTED ``run-compact*.parquet`` generation present in the bucket
directory — a compaction deletes absorbed run files only after its own
commit record lands, so every deletion the probe can observe is covered
by a committed compact file (crash orphans, which have no commit
record, stay ignored).  Crash-rerun (same run_id, sequential) needs no
lock.  The contract is ENFORCED advisorily since round 4: mutating
calls hold an ``flock`` on ``state_dir/.writer.lock`` and a second
concurrent writer raises immediately (``_writer_lock``; best-effort on
filesystems without flock semantics).

Dataflow per run: hash pass (streaming ``map_batches``) -> ONE
bucket-keyed ``groupby`` -> per-bucket ``map_groups`` doing in-run
min-doc_id dedup, the committed-state anti-probe, and the state-file
append for its own bucket.  The only exchange carries (h, doc_id,
bucket) rows; no broadcast grows with history.
"""

from __future__ import annotations

import hashlib
import json
import os
from contextlib import contextmanager

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from ..sources.tables import read_table

N_BUCKETS = 64  # state fan-out; lookups and probes are per-bucket


def _bucket_of(hexes: pd.Series, n_buckets: int) -> np.ndarray:
    first = hexes.str.slice(0, 2).apply(lambda s: int(s, 16))
    return (first.to_numpy() * n_buckets // 256).astype(np.int64)


def _committed_runs(state_dir: str) -> list[str]:
    d = os.path.join(state_dir, "runs")
    if not os.path.isdir(d):
        return []
    return sorted(f[:-5] for f in os.listdir(d) if f.endswith(".json"))


def _commit_path(state_dir: str, run_id: str) -> str:
    return os.path.join(state_dir, "runs", f"{run_id}.json")


def _survivor_path(state_dir: str, run_id: str) -> str:
    return os.path.join(state_dir, "survivors", f"{run_id}.parquet")


def _atomic_write_table(table: pa.Table, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


@contextmanager
def _writer_lock(state_dir: str):
    """Advisory enforcement of the module's SINGLE-WRITER contract: an
    ``flock`` on ``state_dir/.writer.lock`` held for the duration of a
    mutating call (the driver blocks on the distributed job, so the
    whole ingest/compact is covered).  Non-blocking — contention RAISES
    instead of queueing, because the second writer's committed-runs
    snapshot is already stale by definition.  Best-effort: flock is
    reliable on local filesystems; on a shared FS without flock
    semantics the documented contract (one ingestion scheduler owns the
    state dir) remains the guarantee."""
    import fcntl

    os.makedirs(state_dir, exist_ok=True)
    fd = os.open(os.path.join(state_dir, ".writer.lock"),
                 os.O_CREAT | os.O_RDWR)
    try:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError as e:
            raise RuntimeError(
                f"state_dir {state_dir!r} already has an active writer; "
                "ingest_run/compact_state are single-writer (see "
                "incremental.py module docstring)") from e
        yield
    finally:
        os.close(fd)  # releases the flock


def ingest_run(docs: rd.Dataset, state_dir: str, run_id: str,
               n_buckets: int = N_BUCKETS) -> pa.Table:
    """Dedup ``docs`` (columns doc_id, text) against all COMMITTED state
    in ``state_dir`` plus itself, append the survivors' hashes to the
    per-bucket state, commit, and return the survivor table
    ``(doc_id, h)`` sorted by doc_id.

    Already-committed ``run_id`` -> replay of the stored survivors (no
    corpus read)."""
    if os.path.exists(_commit_path(state_dir, run_id)):
        return pq.read_table(_survivor_path(state_dir, run_id))
    with _writer_lock(state_dir):
        return _ingest_run_locked(docs, state_dir, run_id, n_buckets)


def _ingest_run_locked(docs: rd.Dataset, state_dir: str, run_id: str,
                       n_buckets: int) -> pa.Table:
    committed = _committed_runs(state_dir)

    def hash_batch(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        hexes = pd.Series(
            [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts])
        return pa.table({
            "doc_id": t.column("doc_id"),
            "h": pa.array(hexes, pa.string()),
            "bucket": pa.array(_bucket_of(hexes, n_buckets)),
        })

    def probe_and_append(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["bucket"].iloc[0])
        # in-run dedup: min doc_id per hash (sort once, first wins)
        g = (g.sort_values(["h", "doc_id"], kind="mergesort")
             .drop_duplicates("h", keep="first"))
        bdir = os.path.join(state_dir, "seen", f"bucket={bucket:02d}")
        seen: set[str] = set()
        probe_files = {os.path.join(bdir, f"run-{rid}.parquet")
                       for rid in committed}
        # Committed-list re-validation (see module docstring): a
        # compaction racing this probe deletes absorbed run files only
        # AFTER committing its own generation (step 3 after step 2), so
        # any deletion we could observe is covered by a compact file
        # whose commit record already exists.  Fold in every compact
        # generation that is committed ON DISK NOW (not just in the
        # driver's snapshot); crash orphans — compact files with no
        # commit record — stay ignored, as the crash-rerun test requires.
        if os.path.isdir(bdir):
            for f in os.listdir(bdir):
                if f.startswith("run-compact") and f.endswith(".parquet"):
                    rid = f[len("run-"):-len(".parquet")]
                    if os.path.exists(_commit_path(state_dir, rid)):
                        probe_files.add(os.path.join(bdir, f))
        for p in sorted(probe_files):
            if os.path.exists(p):
                seen.update(pq.read_table(p, columns=["h"])
                            .column("h").to_pylist())
        fresh = g[~g["h"].isin(seen)]
        _atomic_write_table(
            pa.table({"h": pa.array(fresh["h"], pa.string()),
                      "doc_id": pa.array(fresh["doc_id"].to_numpy(np.int64))}),
            os.path.join(bdir, f"run-{run_id}.parquet"))
        return fresh[["doc_id", "h"]]

    survivors = (docs.map_batches(hash_batch, batch_format="pyarrow",
                                  batch_size=8192)
                 .groupby("bucket")
                 .map_groups(probe_and_append, batch_format="pandas")
                 .to_pandas())
    if survivors.empty:  # every hash already seen -> columnless frame
        survivors = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                  "h": pd.Series(dtype=object)})
    survivors = (survivors.sort_values("doc_id", kind="mergesort")
                 .reset_index(drop=True))
    out = pa.table({"doc_id": pa.array(survivors["doc_id"].to_numpy(np.int64)),
                    "h": pa.array(survivors["h"], pa.string())})
    _atomic_write_table(out, _survivor_path(state_dir, run_id))
    os.makedirs(os.path.dirname(_commit_path(state_dir, run_id)),
                exist_ok=True)
    tmp = _commit_path(state_dir, run_id) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"run_id": run_id, "n_survivors": out.num_rows,
                   "prior_runs": committed}, f)
    os.replace(tmp, _commit_path(state_dir, run_id))
    return out


def compact_state(state_dir: str, n_buckets: int = N_BUCKETS) -> dict:
    """Merge every bucket's committed run files into one base file per
    bucket, bounding per-bucket file count (and probe IO) no matter how
    many runs have been ingested.

    Protocol (crash-safe at every step boundary):

    1. per bucket, union the committed run files -> write
       ``run-compact<gen>.parquet`` (atomic rename; a crash here leaves
       orphan files that readers ignore — not in any commit record —
       and the rerun overwrites them);
    2. write ``runs/compact<gen>.json`` — the compact generation
       becomes committed state (a crash before step 3 double-counts
       hashes across old+new files, harmless for a set-union probe and
       cleaned up by the next compaction);
    3. delete the absorbed bucket files and stamp each absorbed run's
       commit record with ``absorbed_into`` (records are KEPT so
       ``ingest_run`` replay of an old run_id still short-circuits).

    Distributed: one Ray task per bucket via ``map_batches`` over the
    bucket ids; the driver only renames/stamps tiny JSON records."""
    with _writer_lock(state_dir):
        return _compact_state_locked(state_dir, n_buckets)


def _compact_state_locked(state_dir: str, n_buckets: int) -> dict:
    committed = _committed_runs(state_dir)
    gen = 1 + sum(1 for r in committed if r.startswith("compact"))
    new_run = f"compact{gen:04d}"

    def compact_bucket(t: pa.Table) -> pa.Table:
        rows = []
        for bucket in t.column("bucket").to_pylist():
            bdir = os.path.join(state_dir, "seen", f"bucket={bucket:02d}")
            seen: dict[str, int] = {}
            absorbed = []
            for rid in committed:
                p = os.path.join(bdir, f"run-{rid}.parquet")
                if os.path.exists(p):
                    part = pq.read_table(p)
                    for h, d in zip(part.column("h").to_pylist(),
                                    part.column("doc_id").to_pylist()):
                        # keep the earliest-committed claim for a hash
                        seen.setdefault(h, int(d))
                    absorbed.append(p)
            if absorbed:
                hs = sorted(seen)
                _atomic_write_table(
                    pa.table({"h": pa.array(hs, pa.string()),
                              "doc_id": pa.array(
                                  [seen[h] for h in hs], pa.int64())}),
                    os.path.join(bdir, f"run-{new_run}.parquet"))
            rows.append((bucket, len(absorbed), len(seen)))
        return pa.table({
            "bucket": pa.array([r[0] for r in rows], pa.int64()),
            "n_files_absorbed": pa.array([r[1] for r in rows], pa.int64()),
            "n_hashes": pa.array([r[2] for r in rows], pa.int64()),
        })

    stats = (rd.from_arrow(pa.table(
        {"bucket": pa.array(range(n_buckets), pa.int64())}))
        .map_batches(compact_bucket, batch_format="pyarrow", batch_size=4)
        .to_pandas())
    # step 2: commit the compact generation (with an empty survivor
    # table, so an accidental ingest_run(run_id="compactNNNN") replay
    # degrades to zero rows instead of a missing-file error)
    _atomic_write_table(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "h": pa.array([], pa.string())}),
        _survivor_path(state_dir, new_run))
    os.makedirs(os.path.join(state_dir, "runs"), exist_ok=True)
    tmp = _commit_path(state_dir, new_run) + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"run_id": new_run, "n_survivors": 0,
                   "compaction": True, "absorbed": committed}, f)
    os.replace(tmp, _commit_path(state_dir, new_run))
    # step 3: drop absorbed files, stamp absorbed records
    for rid in committed:
        for bucket in range(n_buckets):
            p = os.path.join(state_dir, "seen", f"bucket={bucket:02d}",
                             f"run-{rid}.parquet")
            if os.path.exists(p):
                os.unlink(p)
        cp = _commit_path(state_dir, rid)
        rec = json.load(open(cp))
        rec["absorbed_into"] = new_run
        with open(cp + ".tmp", "w") as f:
            json.dump(rec, f)
        os.replace(cp + ".tmp", cp)
    return {"run_id": new_run,
            "n_files_absorbed": int(stats["n_files_absorbed"].sum()),
            "n_hashes": int(stats["n_hashes"].sum())}


def q_doc_dedup_incremental(sf_dir: str) -> pa.Table:
    """Two-run incremental-dedup scenario over the documents table:
    run A ingests the even doc_ids into a fresh state, run B the odd
    ones against A's committed state.  Output: every survivor with its
    hash and the run that admitted it — ``(doc_id, h, run)``.

    Invariant (the SQL oracle): a hash's survivor is the min EVEN
    doc_id carrying it if any (run 0), else the min odd doc_id (run 1).
    """
    import shutil
    import tempfile

    # fresh per-invocation state dir: concurrent runs (parallel test
    # workers, overlapping verifications) must never share or clobber
    # each other's commit records; removed in the finally below once the
    # survivor tables are in memory (no /tmp leak per invocation)
    state_dir = tempfile.mkdtemp(prefix="attp_incremental_")

    def parity(rem: int):
        import pyarrow.compute as pc

        def f(t: pa.Table) -> pa.Table:
            par = pc.bit_wise_and(
                pc.cast(t.column("doc_id"), pa.int64()), 1)
            return t.filter(pc.equal(par, rem))

        return f

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    try:
        run_a = ingest_run(
            docs.map_batches(parity(0), batch_format="pyarrow",
                             batch_size=8192), state_dir, "runA")
        run_b = ingest_run(
            docs.map_batches(parity(1), batch_format="pyarrow",
                             batch_size=8192), state_dir, "runB")
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
    return pa.table({
        "doc_id": pa.concat_arrays([run_a.column("doc_id").combine_chunks(),
                                    run_b.column("doc_id").combine_chunks()]),
        "h": pa.concat_arrays([run_a.column("h").combine_chunks(),
                               run_b.column("h").combine_chunks()]),
        "run": pa.array([0] * run_a.num_rows + [1] * run_b.num_rows,
                        pa.int64()),
    })


DEDUP_INCREMENTAL_SQL = """
    WITH h AS (
        SELECT doc_id, md5(text) AS h, doc_id % 2 AS par FROM documents
    ), agg AS (
        SELECT h,
               MIN(CASE WHEN par = 0 THEN doc_id END) AS m0,
               MIN(CASE WHEN par = 1 THEN doc_id END) AS m1
        FROM h GROUP BY h
    )
    SELECT CAST(COALESCE(m0, m1) AS BIGINT) AS doc_id, h,
           CAST(CASE WHEN m0 IS NOT NULL THEN 0 ELSE 1 END AS BIGINT) AS run
    FROM agg
"""


# ---------------------------------------------------------------------------
# Corpus version diff — the change-detection primitive between two corpus
# snapshots (v1, v2): every doc_id classified added / removed / changed /
# same by content hash.
#
# Scale shape: both sides stream through a tagging map_batches into ONE
# hash exchange keyed on doc_id (the both-sides-big pattern — no
# broadcast, no join API dependency): per-side hashes ride as sentinel-
# filled columns, a string MAX aggregate folds each group to one row
# (md5 hex > "" always), and classification is one vectorized pass.
#
# The v2 snapshot here is DERIVED deterministically from the documents
# table (drop doc_id%5==0, append " v2" to text when doc_id%7==0, add a
# fresh doc at -(doc_id+1) for doc_id%13==0 — the negative id space is
# disjoint from real ids by the testdata contract) so the whole
# scenario is restatable as a DuckDB FULL OUTER JOIN over the same
# derivation.
# ---------------------------------------------------------------------------


def _diff_hash_rows(side: int):
    """Tagging kernel: (doc_id, h1, h2) rows with the other side's hash
    column as the '' sentinel (md5 hex is never empty)."""

    def f(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        hs = [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts]
        empty = [""] * len(hs)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "h1": pa.array(hs if side == 1 else empty, pa.string()),
            "h2": pa.array(hs if side == 2 else empty, pa.string()),
        })

    return f


def _derive_v2(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    ids = t.column("doc_id").to_numpy().astype(np.int64)
    texts = t.column("text").to_pylist()
    keep = ids % 5 != 0
    out_ids, out_texts = [], []
    for i, (d, s) in enumerate(zip(ids, texts)):
        if keep[i]:
            out_ids.append(d)
            out_texts.append(s + " v2" if d % 7 == 0 else s)
        if d % 13 == 0:
            # added ids live in the NEGATIVE id space: -(d+1) can never
            # collide with a real (non-negative, per the testdata
            # contract) doc_id, unlike any fixed offset
            out_ids.append(-(d + 1))
            out_texts.append(f"new doc {d}")
    return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                     "text": pa.array(out_texts, pa.string())})


def q_corpus_diff(sf_dir: str) -> rd.Dataset:
    """Diff the documents table against its derived v2 snapshot:
    ``(doc_id, status)`` with status in added/removed/changed/same."""
    from ray.data.aggregate import Max

    v1 = read_table(sf_dir, "documents", ["doc_id", "text"])
    v2 = (read_table(sf_dir, "documents", ["doc_id", "text"])
          .map_batches(_derive_v2, batch_format="pyarrow",
                       batch_size=8192))
    tagged = (v1.map_batches(_diff_hash_rows(1), batch_format="pyarrow",
                             batch_size=8192)
              .union(v2.map_batches(_diff_hash_rows(2),
                                    batch_format="pyarrow",
                                    batch_size=8192)))
    folded = tagged.groupby("doc_id").aggregate(
        Max("h1", alias_name="h1"), Max("h2", alias_name="h2"))

    def classify(t: pa.Table) -> pa.Table:
        h1 = np.asarray(t.column("h1").to_pylist(), dtype=object)
        h2 = np.asarray(t.column("h2").to_pylist(), dtype=object)
        status = np.where(h1 == "", "added",
                          np.where(h2 == "", "removed",
                                   np.where(h1 == h2, "same", "changed")))
        return pa.table({"doc_id": t.column("doc_id"),
                         "status": pa.array(status.tolist(), pa.string())})

    return folded.map_batches(classify, batch_format="pyarrow",
                              batch_size=65536)


CORPUS_DIFF_SQL = """
    WITH v1 AS (
        SELECT doc_id, md5(text) AS h FROM documents
    ), v2 AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                        ELSE text END) AS h
        FROM documents WHERE doc_id % 5 <> 0
        UNION ALL
        SELECT -(doc_id + 1) AS doc_id,
               md5('new doc ' || CAST(doc_id AS VARCHAR)) AS h
        FROM documents WHERE doc_id % 13 = 0
    )
    SELECT CAST(COALESCE(v1.doc_id, v2.doc_id) AS BIGINT) AS doc_id,
           CASE WHEN v1.h IS NULL THEN 'added'
                WHEN v2.h IS NULL THEN 'removed'
                WHEN v1.h = v2.h THEN 'same'
                ELSE 'changed' END AS status
    FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
"""

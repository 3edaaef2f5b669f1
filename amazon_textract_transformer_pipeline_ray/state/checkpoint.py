"""Per-partition checkpoint manifests for idempotent resume.

Semantics modeled on the reference's skip-existing resume
(``notebooks/util/ocr.py:151-161,207-209``: output object exists => skip
document) and its DynamoDB job-state cache
(``pipeline/ocr/fn-call-textract/main.py:204-218``), re-expressed for a
bounded batch job: the unit of resume is an output *partition*
(salted hash(conv_id) bucket), each carrying a manifest
``{partition_id, lineage_id, input_fingerprint, turns_processed,
turns_dropped_empty, boilerplate_ratio, span_count, status}``.

A partition's content is a pure function of (input files, config, code
version) — the lineage id hashes all three — so resume is idempotent: a
rerun skips partitions whose manifest exists with a matching lineage id and
reproduces byte-identical output for the rest (FIXTURES.md §5 test).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterable

from ..config import EngineConfig

MANIFEST_DIR = "_manifests"


def input_fingerprint(paths: Iterable[str]) -> str:
    """Deterministic digest over input file identities (path, size, tail
    bytes) — no mtimes (the reference's timestamp-salt idempotency
    pitfall, fn-call-textract/main.py:173-177).

    The tail-4KB digest is the content signal: for parquet it covers the
    footer (schema + row-group statistics), so overwriting a file in
    place with different content of IDENTICAL byte length still changes
    the fingerprint.  Non-seekable/remote paths (s3:// etc.) degrade to
    path-only identity — callers resuming over remote inputs should
    treat a same-path overwrite as requiring a manual lineage bump."""
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(p.encode())
        try:
            size = os.path.getsize(p)
            with open(p, "rb") as f:
                f.seek(max(0, size - 4096))
                tail = f.read(4096)
        except OSError:
            size, tail = -1, b""  # non-local filesystem: identity by path
        h.update(str(size).encode())
        h.update(tail)
    return h.hexdigest()[:16]


def manifest_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"part-{partition_id:05d}.json")


def load_complete_partitions(out_dir: str, lineage_id: str) -> set[int]:
    """Partitions already complete for this exact lineage."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if m.get("status") == "complete" and m.get("lineage_id") == lineage_id:
            done.add(int(m["partition_id"]))
    return done


def prune_stale(out_dir: str, lineage_id: str, num_partitions: int) -> set[int]:
    """Delete manifests that do not belong to this lineage (config/input
    changed) or whose partition id is outside the current layout.  Returns
    the pruned ids so the caller can clear their data directories too —
    without this, shrinking num_partitions would leave old-config rows on
    disk that the stats pass would re-commit under the new lineage."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    pruned: set[int] = set()
    if not os.path.isdir(mdir):
        return pruned
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        path = os.path.join(mdir, name)
        try:
            with open(path) as f:
                m = json.load(f)
            pid = int(m["partition_id"])
        except (OSError, json.JSONDecodeError, KeyError, ValueError):
            os.remove(path)
            continue
        if m.get("lineage_id") != lineage_id or pid >= num_partitions:
            os.remove(path)
            pruned.add(pid)
    return pruned


def write_manifest(
    out_dir: str,
    partition_id: int,
    lineage_id: str,
    fingerprint: str,
    turns_processed: int,
    turns_dropped_empty: int,
    boilerplate_ratio: float,
    span_count: int,
) -> None:
    """Atomic write (tmp + rename) — a crash mid-write never yields a
    'complete' manifest."""
    path = manifest_path(out_dir, partition_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "partition_id": partition_id,
        "lineage_id": lineage_id,
        "input_fingerprint": fingerprint,
        "turns_processed": turns_processed,
        "turns_dropped_empty": turns_dropped_empty,
        "boilerplate_ratio": boilerplate_ratio,
        "span_count": span_count,
        "status": "complete",
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def run_summary(out_dir: str) -> dict:
    """Aggregate all manifests into run metrics (reference G12 analog,
    ``util/preproc.py:273-352`` run-metrics reporting)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    total = {"partitions": 0, "turns_processed": 0, "turns_dropped_empty": 0,
             "span_count": 0, "boilerplate_ratio": 0.0}
    if not os.path.isdir(mdir):
        return total
    weighted_bp = 0.0
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        total["partitions"] += 1
        total["turns_processed"] += m["turns_processed"]
        total["turns_dropped_empty"] += m.get("turns_dropped_empty", 0)
        total["span_count"] += m["span_count"]
        weighted_bp += m["boilerplate_ratio"] * m["turns_processed"]
    if total["turns_processed"]:
        total["boilerplate_ratio"] = weighted_bp / total["turns_processed"]
    return total


# ---------------------------------------------------------------------------
# Generic stage commit records — the lightweight primitive behind the
# suite's non-flagship checkpointed pipelines (corpus_preprocess, BPE
# training).  Same protocol as the flagship manifests: a record is
# written atomically AFTER its stage's data is fully on disk, carries
# the lineage id, and a rerun trusts a record only under an identical
# lineage (reference D2 skip-existing semantics, util/ocr.py:151-161).
# ---------------------------------------------------------------------------


def write_stage_record(path: str, payload: dict) -> None:
    """Atomic commit record (tmp + rename) — a crash mid-write never
    yields a trusted record."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, path)


def load_stage_record(path: str, lineage_id: str) -> dict | None:
    """The record at ``path`` iff it parses and matches the lineage."""
    try:
        with open(path) as f:
            rec = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    return rec if rec.get("lineage_id") == lineage_id else None

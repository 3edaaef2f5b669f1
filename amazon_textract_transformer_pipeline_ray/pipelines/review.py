"""Human-review queue lifecycle (reference A2I round trip).

The reference's confidence gate routes low-confidence documents to an
Amazon A2I human loop and resumes the state machine when the review
lands back in S3 (``pipeline/__init__.py:288-301``, start
``pipeline/fn-start-review/main.py:73-133``, resume
``pipeline/fn-review-callback/main.py:41-100``).  The batch-engine
restatement:

* ``build_review_queue`` — the rows the gate would route: turns with
  ``review_needed`` true, projected to the human task input (scalar
  turn view + a deterministic ``task_name``, the analog of the
  fn-start-review human-loop name — ours is a pure function of the row
  key instead of timestamp+uuid so resumed runs produce identical
  queues).
* ``write_review_queue`` — materialize the queue next to a checkpointed
  run's output (``out_dir/review/``); derived purely from the committed
  turns table, so it is idempotent and resume-safe.
* ``apply_review_results`` — the reinjection path (fn-review-callback
  semantics: the human answer OVERRIDES the model output): corrected
  rows take the reviewed text, confidence 1.0 and ``review_needed``
  false; every row gains a ``review_status`` column
  (``corrected`` | ``confirmed`` | ``pending`` | ``auto``).  Review
  results are human-scale (small side) — broadcast once via ``ray.put``
  and merged inside ``map_batches``; the turns table never shuffles.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.metrics import sanitize_run_id
from ..sources.tables import broadcast

REVIEW_COLUMNS = ["conv_id", "turn_idx", "role", "extracted_text",
                  "boilerplate_ratio", "n_words", "n_spans",
                  "doc_confidence", "review_needed"]

RESULTS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("corrected_text", pa.string()),   # null -> reviewer confirmed as-is
])


def task_name_for(conv_id: str, turn_idx: int) -> str:
    """Deterministic human-task name (fn-start-review/main.py:38-70
    shape, minus the wall-clock/uuid parts that would break resume)."""
    return sanitize_run_id("review", conv_id, str(turn_idx))


def build_review_queue(turns: rd.Dataset) -> rd.Dataset:
    """Turns flagged by the confidence gate, as human task inputs."""
    import pyarrow.compute as pc

    def route(batch: pa.Table) -> pa.Table:
        flagged = batch.filter(pc.equal(batch.column("review_needed"), True))
        flagged = flagged.select(REVIEW_COLUMNS)
        names = [task_name_for(c, t) for c, t in zip(
            flagged.column("conv_id").to_pylist(),
            flagged.column("turn_idx").to_pylist())]
        return flagged.append_column("task_name",
                                     pa.array(names, pa.string()))

    return turns.map_batches(route, batch_format="pyarrow")


def write_review_queue(out_dir: str) -> dict:
    """Materialize the review queue of a finished checkpointed run at
    ``out_dir/review/``.  Pure function of the committed turns table —
    rerunning after a resume yields the identical queue."""
    import shutil

    turns = rd.read_parquet(os.path.join(out_dir, "data"),
                            columns=REVIEW_COLUMNS)
    review_dir = os.path.join(out_dir, "review")
    shutil.rmtree(review_dir, ignore_errors=True)
    queue = build_review_queue(turns)
    queue.write_parquet(review_dir)
    n = rd.read_parquet(review_dir).count()
    return {"review_dir": review_dir, "n_queued": n}


def read_review_queue(out_dir: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, "review"))


def apply_review_results(
    turns: rd.Dataset,
    results: pd.DataFrame | pa.Table,
) -> rd.Dataset:
    """Reinject human answers (fn-review-callback/main.py:41-100
    semantics: reviewed values OVERRIDE the model's).

    ``results`` rows keyed by (conv_id, turn_idx); ``corrected_text``
    null means the reviewer confirmed the extraction unchanged.  Small
    side — broadcast, no shuffle."""
    if isinstance(results, pa.Table):
        results = results.to_pandas()
    fixes = {
        (c, int(t)): (None if x is None or (isinstance(x, float)
                                            and np.isnan(x)) else x)
        for c, t, x in zip(results["conv_id"], results["turn_idx"],
                           results["corrected_text"])
    }
    ref = broadcast(fixes)

    class Reinject:
        def __init__(self):
            self.fixes = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            conv = batch.column("conv_id").to_pylist()
            tix = batch.column("turn_idx").to_pylist()
            review = batch.column("review_needed").to_numpy(
                zero_copy_only=False).astype(bool)
            texts = batch.column("extracted_text").to_pylist()
            conf = batch.column("doc_confidence").to_numpy(
                zero_copy_only=False).astype(np.float32).copy()
            status = np.where(review, "pending", "auto").astype(object)
            new_review = review.copy()
            for i, key in enumerate(zip(conv, (int(t) for t in tix))):
                if key not in self.fixes:
                    continue
                corrected = self.fixes[key]
                if corrected is not None:
                    texts[i] = corrected
                    status[i] = "corrected"
                else:
                    status[i] = "confirmed"
                conf[i] = np.float32(1.0)  # human answer is authoritative
                new_review[i] = False
            out = batch
            for name, arr in (
                ("extracted_text", pa.array(texts, pa.string())),
                ("doc_confidence", pa.array(conf, pa.float32())),
                ("review_needed", pa.array(new_review, pa.bool_())),
            ):
                out = out.set_column(out.schema.get_field_index(name),
                                     pa.field(name, arr.type), arr)
            return out.append_column(
                "review_status", pa.array(status.tolist(), pa.string()))

    return turns.map_batches(Reinject, batch_format="pyarrow",
                             batch_size=1024, concurrency=(1, 2))


def finalize_with_reviews(
    out_dir: str,
    results: pd.DataFrame | pa.Table,
) -> dict:
    """Reinjection over a checkpointed run: merge human results into the
    committed turns table and write ``out_dir/final/``.  Idempotent —
    derived purely from (committed turns, results)."""
    import shutil

    turns = rd.read_parquet(os.path.join(out_dir, "data"))
    final_dir = os.path.join(out_dir, "final")
    shutil.rmtree(final_dir, ignore_errors=True)
    apply_review_results(turns, results).write_parquet(final_dir)
    out = rd.read_parquet(final_dir, columns=["review_status"])

    def counts(batch: pa.Table) -> pa.Table:
        g = (pa.TableGroupBy(batch.select(["review_status"]),
                             "review_status")
             .aggregate([([], "count_all")]))
        return pa.table({"review_status": g.column("review_status"),
                         "n": g.column("count_all").cast(pa.int64())})

    from ray.data.aggregate import Sum

    stats = (out.map_batches(counts, batch_format="pyarrow")
             .groupby("review_status").aggregate(Sum("n", alias_name="n"))
             .to_pandas())
    return {"final_dir": final_dir,
            **{f"n_{r.review_status}": int(r.n)
               for r in stats.itertuples(index=False)}}


def q_review_queue_from_paths(paths: Sequence[str]) -> rd.Dataset:
    """Review queue straight off a transcript corpus (no checkpoint dir):
    extraction -> confidence gate -> task inputs."""
    from .extraction import build_turns, read_transcripts

    return build_review_queue(
        build_turns(read_transcripts(list(paths)), batch_size=256))


# Closed-form synthetic human answers (SQL-restatable, so the merged
# post-review corpus is externally oracle-checkable): a queued turn is
# CORRECTED iff the first hex digit of md5("{conv_id}:{turn_idx}") is
# below '8' (≈half), with the correction a pure prefix concatenation;
# the other half the reviewer CONFIRMS as-is.
REVIEW_CORRECT_HEX = "8"
REVIEW_CORRECT_PREFIX = "[human] "


def synthesize_review_results(queue: pa.Table | pd.DataFrame) -> pa.Table:
    """Deterministic stand-in for the A2I human answers over a review
    queue (the sandbox has no humans; the reference consumes real A2I
    result JSON, fn-review-callback/main.py:41-100).  Pure function of
    the queue under the closed-form rule above — resumable, and the
    rule is restated verbatim in the x_post_review oracle SQL."""
    import hashlib

    if isinstance(queue, pa.Table):
        queue = queue.to_pandas()
    conv = queue["conv_id"].tolist()
    tix = [int(t) for t in queue["turn_idx"]]
    texts = queue["extracted_text"].tolist()
    corrected = [
        (REVIEW_CORRECT_PREFIX + x)
        if hashlib.md5(f"{c}:{t}".encode()).hexdigest()[0]
        < REVIEW_CORRECT_HEX else None
        for c, t, x in zip(conv, tix, texts)
    ]
    return pa.table({
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(tix, pa.int32()),
        "corrected_text": pa.array(corrected, pa.string()),
    })


POST_REVIEW_COLS = ["conv_id", "turn_idx", "role", "extracted_text",
                    "doc_confidence", "review_needed", "review_status"]


def q_post_review_from_paths(paths: Sequence[str]) -> rd.Dataset:
    """The merged POST-REVIEW corpus — the reference's review-callback
    consolidation output (human answers folded back over the model's
    extractions, fn-review-callback/main.py:41-100) as one table:
    extraction -> confidence gate -> synthesized human answers ->
    reinjection.  Queue and answers are human-scale (the gate exists to
    keep them so) — materialized on the driver and broadcast; the turns
    table itself streams through one map_batches, zero shuffles."""
    from .extraction import build_turns, read_transcripts

    turns = build_turns(read_transcripts(list(paths)), batch_size=256)
    queue = build_review_queue(turns).select_columns(
        ["conv_id", "turn_idx", "extracted_text"]).to_pandas()
    results = synthesize_review_results(queue)
    return (apply_review_results(turns, results)
            .select_columns(POST_REVIEW_COLS))

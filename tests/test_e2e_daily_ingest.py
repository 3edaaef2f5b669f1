"""End-to-end "daily ingest" scenario: the composition a production
deployment runs — per-day transcript batches flow through the
checkpointed extraction pipeline into partitioned turn tables, the
extracted text feeds incremental cross-run dedup against persistent
state, and day-2 work touches ONLY day-2 inputs (plus the seen-hash
probe).  Pins that the engine's pieces compose: extraction checkpoints,
conversations rollup, ingest_run state, compaction."""

import os

import pandas as pd
import pyarrow as pa

import ray.data as rd

from amazon_textract_transformer_pipeline_ray.config import EngineConfig
from amazon_textract_transformer_pipeline_ray.fixtures import write_transcripts
from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
    read_turns_output,
    run_checkpointed,
)
from amazon_textract_transformer_pipeline_ray.pipelines.incremental import (
    compact_state,
    ingest_run,
)


def _turns_as_docs(out_dir: str) -> rd.Dataset:
    """Adapt a day's extracted turns table to the (doc_id, text) dedup
    contract: doc_id = stable hash-free row index via (conv, turn)."""
    t = read_turns_output(out_dir).to_pandas()
    t = t.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    ids = pd.factorize(t["conv_id"] + "#" + t["turn_idx"].astype(str))[0]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(ids.astype("int64")),
        "text": pa.array(t["extracted_text"].tolist(), pa.string()),
    }))


def test_daily_ingest_composition(ray_session, tmp_path):
    cfg = EngineConfig(num_partitions=4)
    state = str(tmp_path / "dedup_state")

    # --- day 1: extract + ingest ---
    day1 = write_transcripts(str(tmp_path / "day1"), 400, n_shards=2)
    out1 = str(tmp_path / "out1")
    s1 = run_checkpointed(day1, out1, cfg)
    assert s1["turns_processed"] > 0
    surv1 = ingest_run(_turns_as_docs(out1), state, "day1")
    assert surv1.num_rows > 0

    # --- day 2: a DIFFERENT corpus slice + day-1 re-deliveries ---
    day2 = write_transcripts(str(tmp_path / "day2"), 300, n_shards=2,
                             seed=7)
    out2 = str(tmp_path / "out2")
    s2 = run_checkpointed(day2, out2, cfg)
    surv2 = ingest_run(_turns_as_docs(out2), state, "day2")
    # re-delivering day 1's own batch under a new run id: everything
    # already committed -> zero survivors
    redeliver = ingest_run(_turns_as_docs(out1), state, "day1-redelivery")
    assert redeliver.num_rows == 0

    # --- resume is a no-op on both days (manifests commit the work) ---
    assert run_checkpointed(day1, out1, cfg) == s1
    assert run_checkpointed(day2, out2, cfg) == s2
    # replaying a committed ingest run returns its stored survivors
    again = ingest_run(_turns_as_docs(out2), state, "day2")
    assert again.to_pydict() == surv2.to_pydict()

    # --- compaction preserves the probe set ---
    res = compact_state(state)
    assert res["n_hashes"] >= surv1.num_rows
    post = ingest_run(_turns_as_docs(out1), state, "day1-post-compact")
    assert post.num_rows == 0


def test_day2_only_touches_day2_inputs(ray_session, tmp_path):
    """The incremental promise itself: day-2 ingest must not read day-1
    INPUT shards (only the committed state).  Verified by deleting the
    day-1 corpus before day 2 runs."""
    import shutil

    cfg = EngineConfig(num_partitions=2)
    state = str(tmp_path / "state")
    day1 = write_transcripts(str(tmp_path / "day1"), 200, n_shards=1)
    out1 = str(tmp_path / "out1")
    run_checkpointed(day1, out1, cfg)
    ingest_run(_turns_as_docs(out1), state, "day1")

    shutil.rmtree(str(tmp_path / "day1"))  # history gone
    shutil.rmtree(out1)

    day2 = write_transcripts(str(tmp_path / "day2"), 150, n_shards=1,
                             seed=11)
    out2 = str(tmp_path / "out2")
    run_checkpointed(day2, out2, cfg)
    surv = ingest_run(_turns_as_docs(out2), state, "day2")
    assert surv.num_rows > 0  # fresh content admitted, no history read

"""Incremental cross-run dedup tests: two-run semantics on crafted
duplicates, committed-run replay, crash-rerun idempotency, and oracle
SQL parity."""

import json
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from amazon_textract_transformer_pipeline_ray.pipelines.incremental import (
    DEDUP_INCREMENTAL_SQL,
    _commit_path,
    ingest_run,
    q_doc_dedup_incremental,
)


def _docs_ds(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["lang"], df["source"], df["n_chars"] = "en", "t", df.text.str.len()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_two_run_semantics(ray_session, tmp_path):
    state = str(tmp_path / "state")
    # run A: "x" twice (min id 2 survives), "y" once
    a = ingest_run(_docs_ds([(2, "x"), (5, "x"), (7, "y")]), state, "A")
    assert a.to_pydict()["doc_id"] == [2, 7]
    # run B: "x"/"y" already seen -> dropped; "z" twice -> min id once
    b = ingest_run(_docs_ds([(1, "x"), (3, "z"), (4, "z"), (6, "y")]),
                   state, "B")
    assert b.to_pydict()["doc_id"] == [3]


def test_committed_run_replays_without_corpus(ray_session, tmp_path):
    state = str(tmp_path / "state")
    a = ingest_run(_docs_ds([(1, "p"), (2, "q")]), state, "A")
    # replay: same run_id, DIFFERENT docs -> stored survivors returned
    again = ingest_run(_docs_ds([(9, "other")]), state, "A")
    assert again.to_pydict() == a.to_pydict()
    c = json.load(open(_commit_path(state, "A")))
    assert c["n_survivors"] == 2 and c["prior_runs"] == []


def test_crash_rerun_ignores_uncommitted_state(ray_session, tmp_path):
    state = str(tmp_path / "state")
    ingest_run(_docs_ds([(1, "p")]), state, "A")
    # simulate a crashed run B: state bucket files written, no commit
    ingest_run(_docs_ds([(2, "q"), (3, "r")]), state, "B")
    os.unlink(_commit_path(state, "B"))
    os.unlink(os.path.join(state, "survivors", "B.parquet"))
    # run C must NOT see crashed B's hashes: "q" survives in C
    c = ingest_run(_docs_ds([(4, "q")]), state, "C")
    assert c.to_pydict()["doc_id"] == [4]
    # rerunning B now sees committed A and C: "q" dropped, "r" kept
    b = ingest_run(_docs_ds([(2, "q"), (3, "r")]), state, "B")
    assert b.to_pydict()["doc_id"] == [3]


def test_matches_oracle_sql(ray_session, tmp_path):
    # duplicates within and across parities, including odd-only hashes
    rows = [(i, ["alpha", "beta", "gamma", "delta"][i % 4] +
             str(i // 8)) for i in range(40)]
    sf = _write_docs(tmp_path, rows)
    got = q_doc_dedup_incremental(sf).to_pandas()
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.sql(DEDUP_INCREMENTAL_SQL).df()
    cols = ["doc_id", "h", "run"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True))
    assert (got["run"] == 1).any() and (got["run"] == 0).any()

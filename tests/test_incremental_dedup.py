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


def test_compaction_preserves_semantics(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.incremental import (
        compact_state)

    state = str(tmp_path / "state")
    ingest_run(_docs_ds([(1, "a"), (2, "b")]), state, "r1")
    ingest_run(_docs_ds([(3, "a"), (4, "c")]), state, "r2")
    ingest_run(_docs_ds([(5, "d")]), state, "r3")
    res = compact_state(state)
    assert res["n_hashes"] == 4  # a b c d
    assert res["n_files_absorbed"] >= 3
    # bucket dirs hold ONLY the compact generation now
    seen_dir = os.path.join(state, "seen")
    files = [f for b in os.listdir(seen_dir)
             for f in os.listdir(os.path.join(seen_dir, b))]
    assert files and all("compact" in f for f in files)
    # post-compaction ingest sees all prior hashes
    r4 = ingest_run(_docs_ds([(6, "a"), (7, "c"), (8, "e")]), state, "r4")
    assert r4.to_pydict()["doc_id"] == [8]
    # replay of an absorbed run still short-circuits to stored survivors
    r2 = ingest_run(_docs_ds([(99, "zzz")]), state, "r2")
    assert r2.to_pydict()["doc_id"] == [4]


def test_compaction_crash_before_commit_is_ignored(ray_session, tmp_path):
    import hashlib

    import pyarrow.parquet as pq_mod

    from amazon_textract_transformer_pipeline_ray.pipelines.incremental import (
        compact_state)

    state = str(tmp_path / "state")
    ingest_run(_docs_ds([(1, "a")]), state, "r1")
    # crash window: compact bucket files written (step 1) but NO commit
    # record (step 2) — craft an orphan generation claiming hash "f"
    h_f = hashlib.md5(b"f").hexdigest()
    bucket = int(h_f[:2], 16) * 64 // 256
    bdir = os.path.join(state, "seen", f"bucket={bucket:02d}")
    os.makedirs(bdir, exist_ok=True)
    pq_mod.write_table(
        pa.table({"h": pa.array([h_f]), "doc_id": pa.array([99], pa.int64())}),
        os.path.join(bdir, "run-compact0001.parquet"))
    # the orphan is ignored: "f" is NOT seen; committed "a" still is
    r2 = ingest_run(_docs_ds([(3, "a"), (5, "f")]), state, "r2")
    assert r2.to_pydict()["doc_id"] == [5]
    # the compaction rerun absorbs committed state and overwrites the
    # orphan generation; semantics unchanged afterwards
    res = compact_state(state)
    assert res["run_id"] == "compact0001"
    r3 = ingest_run(_docs_ds([(6, "a"), (7, "f"), (8, "g")]), state, "r3")
    assert r3.to_pydict()["doc_id"] == [8]


def test_corpus_diff_statuses(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.incremental import (
        q_corpus_diff)

    # ids chosen to hit every class: 5 removed (5 | 5); 7 changed
    # (7 | 7 but not 5 | 7); 13 stays "same" (13 % 5 != 0, 13 % 7 != 0)
    # and spawns the -(13+1) "added" row (13 | 13); 35 removed — the
    # drop rule wins over the change rule; 1 same.
    sf = _write_docs(tmp_path, [(i, f"text {i}") for i in (1, 5, 7, 13, 35)])
    got = (q_corpus_diff(sf).to_pandas()
           .set_index("doc_id")["status"].to_dict())
    assert got == {1: "same", 5: "removed", 7: "changed", 13: "same",
                   35: "removed", -14: "added"}


def test_corpus_diff_matches_oracle_sql(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.incremental import (
        CORPUS_DIFF_SQL, q_corpus_diff)

    sf = _write_docs(tmp_path, [(i, f"doc body {i % 9}") for i in range(120)])
    got = (q_corpus_diff(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.sql(CORPUS_DIFF_SQL).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert set(want["status"]) == {"added", "removed", "changed", "same"}


def test_concurrent_compaction_race_covered_by_committed_compact(
        ray_session, tmp_path, monkeypatch):
    """The ADVICE-flagged race: an ingest snapshots committed=[r1], then a
    concurrent compaction commits compact0001 and DELETES r1's bucket
    files before the probe reads them.  The probe's committed-list
    re-validation must fold in the committed compact generation so r1's
    hashes stay seen (no duplicate re-admission)."""
    import amazon_textract_transformer_pipeline_ray.pipelines.incremental as inc

    state = str(tmp_path / "state")
    ingest_run(_docs_ds([(1, "a"), (2, "b")]), state, "r1")
    # stale snapshot: r2 believes only r1 is committed...
    monkeypatch.setattr(inc, "_committed_runs", lambda sd: ["r1"])
    # ...but the compaction has already committed and removed r1's files
    from amazon_textract_transformer_pipeline_ray.pipelines.incremental import (
        compact_state)
    monkeypatch.undo()
    compact_state(state)
    import glob
    assert not glob.glob(os.path.join(state, "seen", "*", "run-r1.parquet"))
    monkeypatch.setattr(inc, "_committed_runs", lambda sd: ["r1"])
    r2 = inc.ingest_run(_docs_ds([(9, "a"), (10, "c")]), state, "r2")
    # "a" was seen by r1 (now only inside compact0001) -> NOT re-admitted
    assert r2.to_pydict()["doc_id"] == [10]


def test_writer_lock_rejects_second_writer(ray_session, tmp_path):
    """The single-writer contract is now enforced: while one process
    holds the state lock, a mutating call raises instead of racing."""
    import fcntl

    import pytest

    import amazon_textract_transformer_pipeline_ray.pipelines.incremental as inc

    state = str(tmp_path / "state")
    ingest_run(_docs_ds([(1, "a")]), state, "r1")  # creates the dir
    fd = os.open(os.path.join(state, ".writer.lock"),
                 os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        with pytest.raises(RuntimeError, match="single-writer"):
            inc.ingest_run(_docs_ds([(2, "b")]), state, "r2")
        with pytest.raises(RuntimeError, match="single-writer"):
            inc.compact_state(state)
    finally:
        os.close(fd)
    # released -> the same calls succeed
    r2 = inc.ingest_run(_docs_ds([(2, "b")]), state, "r2")
    assert r2.to_pydict()["doc_id"] == [2]
    inc.compact_state(state)


def test_replay_needs_no_lock(ray_session, tmp_path):
    """Re-ingesting a committed run_id is read-only and must work even
    while another writer holds the lock."""
    import fcntl

    import amazon_textract_transformer_pipeline_ray.pipelines.incremental as inc

    state = str(tmp_path / "state")
    first = ingest_run(_docs_ds([(1, "a"), (2, "b")]), state, "r1")
    fd = os.open(os.path.join(state, ".writer.lock"),
                 os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        replay = inc.ingest_run(_docs_ds([(1, "a")]), state, "r1")
        assert replay.to_pydict() == first.to_pydict()
    finally:
        os.close(fd)

"""Edge-case tests for the index-build ops (postings, tf-idf, BM25),
the range join's interval boundaries, and the per-customer window op.
The full oracle-parity gate lives in test_queries_oracle_sql.py; these
pin the semantics on crafted corner inputs."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from amazon_textract_transformer_pipeline_ray.pipelines.events import (
    q_events_range_join_orders,
)
from amazon_textract_transformer_pipeline_ray.pipelines.index_build import (
    POSTINGS_CAP,
    q_bm25_scores,
    q_doc_tfidf_top_terms,
    q_token_postings,
)
from amazon_textract_transformer_pipeline_ray.pipelines.relational import (
    q_orders_rank_per_customer,
)


def _write(tmp_path, name, df):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, f"{name}.parquet"))


def _docs(tmp_path, texts):
    _write(tmp_path, "documents", pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": "en",
        "source": "s",
        "n_chars": [len(t) for t in texts],
    }))
    return str(tmp_path)


def test_postings_cap_and_counts(ray_session, tmp_path):
    # token "a" in more docs than the cap; "b" in one doc twice
    texts = ["a"] * (POSTINGS_CAP + 4) + ["b b"]
    sf = _docs(tmp_path, texts)
    got = q_token_postings(sf).to_pandas().set_index("token")
    assert int(got.loc["a", "df"]) == POSTINGS_CAP + 4
    assert int(got.loc["a", "tf"]) == POSTINGS_CAP + 4
    capped = ",".join(str(i) for i in range(POSTINGS_CAP))
    assert got.loc["a", "postings_md5"] == hashlib.md5(
        capped.encode()).hexdigest()
    assert int(got.loc["b", "df"]) == 1
    assert int(got.loc["b", "tf"]) == 2
    assert got.loc["b", "postings_md5"] == hashlib.md5(
        str(POSTINGS_CAP + 4).encode()).hexdigest()


def test_tfidf_rare_term_outranks_common(ray_session, tmp_path):
    # "rare" appears once in one doc; "common" in every doc
    sf = _docs(tmp_path, ["common rare", "common", "common"])
    got = q_doc_tfidf_top_terms(sf).to_pandas()
    d0 = got[got.doc_id == 0].sort_values("rnk")
    assert d0.token.tolist() == ["rare", "common"]
    # reciprocal idf: tf * (N+1) / (df+1) with N=3, df(rare)=1, df(common)=3
    assert d0.score.tolist() == [1 * 4.0 / 2.0, 1 * 4.0 / 4.0]


def test_bm25_self_retrieval_ranks_first(ray_session, tmp_path):
    # query doc 0 must score itself strictly above a partial match
    sf = _docs(tmp_path, ["apple banana cherry", "apple banana cherry",
                          "apple xx yy", "zz ww vv"])
    got = q_bm25_scores(sf).to_pandas()
    q0 = got[got.query_id == 0].set_index("doc_id")
    assert 3 not in q0.index  # zero-overlap doc emitted nowhere
    assert q0.loc[0, "score"] == q0.loc[1, "score"]  # identical twin
    assert q0.loc[0, "score"] > q0.loc[2, "score"]
    assert int(q0.loc[2, "n_overlap"]) == 1


def test_range_join_boundaries(ray_session, tmp_path):
    # events exactly AT the order date count; exactly at +7d do not
    t0 = pd.Timestamp("2024-01-01")
    _write(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": np.array([1], dtype=np.int64),
        "o_custkey": np.array([7], dtype=np.int64),
        "o_orderstatus": "O",
        "o_totalprice": [10.0],
        "o_orderdate": [t0],
        "o_orderpriority": "1-URGENT",
    }))
    _write(tmp_path, "events", pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "ts": [t0,                                  # at start: IN
               t0 + pd.Timedelta(days=7) - pd.Timedelta(microseconds=1),
               t0 + pd.Timedelta(days=7),           # at end: OUT
               t0 - pd.Timedelta(microseconds=1)],  # before start: OUT
        "user_id": np.array([7, 7, 7, 7], dtype=np.int64),
        "event_type": "click",
        "value": [1.25, 2.50, 4.00, 8.00],
        "props": "{}",
    }))
    got = q_events_range_join_orders(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert int(got.n_events.iloc[0]) == 2
    assert float(got.sum_value.iloc[0]) == 3.75


def test_range_join_keeps_zero_match_orders(ray_session, tmp_path):
    t0 = pd.Timestamp("2024-01-01")
    _write(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": np.array([1, 2], dtype=np.int64),
        "o_custkey": np.array([7, 8], dtype=np.int64),
        "o_orderstatus": "O",
        "o_totalprice": [10.0, 20.0],
        "o_orderdate": [t0, t0],
        "o_orderpriority": "1-URGENT",
    }))
    _write(tmp_path, "events", pd.DataFrame({
        "event_id": np.array([0], dtype=np.int64),
        "ts": [t0],
        "user_id": np.array([7], dtype=np.int64),
        "event_type": "click",
        "value": [1.0],
        "props": "{}",
    }))
    got = (q_events_range_join_orders(str(tmp_path)).to_pandas()
           .set_index("o_orderkey"))
    assert int(got.loc[1, "n_events"]) == 1
    assert int(got.loc[2, "n_events"]) == 0
    assert float(got.loc[2, "sum_value"]) == 0.0


def test_rank_per_customer_ties_and_k(ray_session, tmp_path):
    _write(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": np.array([11, 12, 13, 14, 21], dtype=np.int64),
        "o_custkey": np.array([1, 1, 1, 1, 2], dtype=np.int64),
        "o_orderstatus": "O",
        # tie at 50.0 -> lower orderkey wins rank 1
        "o_totalprice": [50.0, 50.0, 40.0, 60.0, 5.0],
        "o_orderdate": pd.Timestamp("2024-01-01"),
        "o_orderpriority": "1-URGENT",
    }))
    got = (q_orders_rank_per_customer(str(tmp_path)).to_pandas()
           .sort_values(["o_custkey", "rnk"]).reset_index(drop=True))
    c1 = got[got.o_custkey == 1]
    assert len(c1) == 3  # k=3 of 4 orders
    assert c1.o_orderkey.tolist() == [14, 11, 12]
    assert c1.rnk.tolist() == [1, 2, 3]
    assert got[got.o_custkey == 2].rnk.tolist() == [1]


def test_funnel_window_and_order(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.events import (
        q_events_funnel)

    t0 = pd.Timestamp("2024-01-01 12:00:00")
    h = pd.Timedelta(hours=1)
    us = pd.Timedelta(microseconds=1)
    rows = [
        # user 1: full funnel, click exactly AT +1h (inclusive), purchase in
        (1, t0, "view"), (1, t0 + h, "click"), (1, t0 + h + us, "purchase"),
        # user 2: click misses the window by 1us -> depth 1
        (2, t0, "view"), (2, t0 + h + us, "click"),
        # user 3: purchase BEFORE click -> order violation, depth 2
        (3, t0, "view"), (3, t0 + us, "purchase"), (3, t0 + 2 * us, "click"),
        # user 4: no view at all -> depth 0
        (4, t0, "click"), (4, t0 + us, "purchase"),
        # user 5: click at the SAME instant as view (not strictly after)
        (5, t0, "view"), (5, t0, "click"),
    ]
    _write(tmp_path, "events", pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "ts": [r[1] for r in rows],
        "user_id": np.array([r[0] for r in rows], dtype=np.int64),
        "event_type": [r[2] for r in rows],
        "value": 1.0,
        "props": "{}",
    }))
    got = (q_events_funnel(str(tmp_path)).to_pandas()
           .set_index("stage")["n_users"].to_dict())
    assert got == {3: 1, 1: 2, 2: 1, 0: 1}


def test_user_gaps_crafted(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.events import (
        q_events_user_gaps)

    t0 = pd.Timestamp("2024-01-01 12:00:00")
    s = pd.Timedelta(seconds=1)
    rows = [
        # user 1: gaps 1s and 3s (written out of order; ts sort decides)
        (1, t0 + 4 * s), (1, t0), (1, t0 + s),
        # user 2: single event -> zero gaps, zero/0.0 stats
        (2, t0),
        # user 3: duplicate timestamps -> gaps (0, 2s) regardless of order
        (3, t0), (3, t0), (3, t0 + 2 * s),
    ]
    _write(tmp_path, "events", pd.DataFrame({
        "event_id": np.arange(len(rows), dtype=np.int64),
        "ts": [r[1] for r in rows],
        "user_id": np.array([r[0] for r in rows], dtype=np.int64),
        "event_type": "view",
        "value": 1.0,
        "props": "{}",
    }))
    got = (q_events_user_gaps(str(tmp_path)).to_pandas()
           .set_index("user_id").sort_index())
    assert got.loc[1, ["n_events", "n_gaps", "sum_gap_us", "max_gap_us"]] \
        .tolist() == [3, 2, 4_000_000, 3_000_000]
    assert got.loc[1, "avg_gap_us"] == 2_000_000.0
    assert got.loc[2].tolist() == [1, 0, 0, 0, 0.0]
    assert got.loc[3, ["n_gaps", "sum_gap_us", "max_gap_us"]].tolist() \
        == [2, 2_000_000, 2_000_000]


def test_daily_moving_avg_crafted(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.events import (
        q_events_daily_moving_avg)

    # three present days with a GAP (missing day is absent, not zero)
    days = (["2024-01-01"] * 4 + ["2024-01-02"] * 2 + ["2024-01-05"] * 6)
    ts = pd.to_datetime(days)
    _write(tmp_path, "events", pd.DataFrame({
        "event_id": np.arange(len(ts), dtype=np.int64),
        "ts": ts,
        "user_id": np.int64(1),
        "event_type": "view",
        "value": 1.0,
        "props": "{}",
    }))
    got = q_events_daily_moving_avg(str(tmp_path))
    assert got["n_events"].tolist() == [4, 2, 6]
    # trailing window over PRESENT rows: [4], [4,2], [4,2,6]
    assert got["ma7"].tolist() == [4.0, 3.0, 4.0]


def test_daily_moving_avg_custom_window_matches_generated_sql(
        ray_session, tmp_path):
    """A non-default window names its column ma{window} and matches the
    oracle generated from the SAME parameter (the ADVICE-flagged
    silent-divergence path)."""
    import duckdb

    from amazon_textract_transformer_pipeline_ray.pipelines.events import (
        daily_ma_sql, q_events_daily_moving_avg)

    days = (["2024-01-01"] * 4 + ["2024-01-02"] * 2 + ["2024-01-05"] * 6
            + ["2024-01-06"] * 1)
    ts = pd.to_datetime(days)
    _write(tmp_path, "events", pd.DataFrame({
        "event_id": np.arange(len(ts), dtype=np.int64),
        "ts": ts,
        "user_id": np.int64(1),
        "event_type": "view",
        "value": 1.0,
        "props": "{}",
    }))
    got = q_events_daily_moving_avg(str(tmp_path), window=3)
    assert "ma3" in got.columns and "ma7" not in got.columns
    # window=3 over PRESENT rows: [4], [4,2], [4,2,6], [2,6,1]
    assert got["ma3"].tolist() == [4.0, 3.0, 4.0, 3.0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    exp = (con.execute(daily_ma_sql(3)).fetchdf()
           .sort_values("day").reset_index(drop=True))
    assert exp["ma3"].tolist() == got["ma3"].tolist()
    assert exp["n_events"].tolist() == got["n_events"].tolist()


def test_daily_zscore_crafted(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.events import (
        q_events_daily_zscore)

    # counts 2, 4, 6: mean 4, var ((4+16+36) - 144/3)/2 = 4, sd 2
    days = (["2024-01-01"] * 2 + ["2024-01-02"] * 4 + ["2024-01-03"] * 6)
    ts = pd.to_datetime(days)
    _write(tmp_path, "events", pd.DataFrame({
        "event_id": np.arange(len(ts), dtype=np.int64),
        "ts": ts,
        "user_id": np.int64(1),
        "event_type": "view",
        "value": 1.0,
        "props": "{}",
    }))
    got = q_events_daily_zscore(str(tmp_path))
    assert got["n_events"].tolist() == [2, 4, 6]
    assert got["zscore"].tolist() == [-1.0, 0.0, 1.0]


def test_daily_zscore_constant_days(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.events import (
        q_events_daily_zscore)

    ts = pd.to_datetime(["2024-01-01"] * 3 + ["2024-01-02"] * 3)
    _write(tmp_path, "events", pd.DataFrame({
        "event_id": np.arange(len(ts), dtype=np.int64),
        "ts": ts,
        "user_id": np.int64(1),
        "event_type": "view",
        "value": 1.0,
        "props": "{}",
    }))
    got = q_events_daily_zscore(str(tmp_path))
    assert got["zscore"].tolist() == [0.0, 0.0]  # zero variance

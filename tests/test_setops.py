"""Source-level Jaccard overlap tests: crafted vocabularies with known
intersections (including a zero-overlap pair) and SQL-oracle parity."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from amazon_textract_transformer_pipeline_ray.pipelines.setops import (
    SOURCE_JACCARD_SQL,
    q_source_jaccard,
)


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df["lang"], df["n_chars"] = "en", df.text.str.len()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_crafted_overlaps(ray_session, tmp_path):
    # A vocab {a,b,c}; B vocab {b,c,d} (inter 2, union 4); C vocab {zz}
    # disjoint from both; duplicate tokens within/between docs of one
    # source count once (DISTINCT semantics).
    sf = _write_docs(tmp_path, [
        (0, "a b", "A"), (1, "b c  c", "A"),
        (2, "b c d", "B"), (3, "d d", "B"),
        (4, "zz", "C"),
    ])
    got = (q_source_jaccard(sf)
           .set_index(["source_a", "source_b"]))
    assert got.loc[("A", "B"), "n_inter"] == 2
    assert got.loc[("A", "B"), "n_union"] == 4
    assert got.loc[("A", "B"), "jaccard"] == 0.5
    assert got.loc[("A", "C"), "n_inter"] == 0
    assert got.loc[("A", "C"), "jaccard"] == 0.0
    assert got.loc[("B", "C"), "n_union"] == 4  # {b,c,d} + {zz}
    assert len(got) == 3  # all pairs, zero-overlap included


def test_matches_oracle_sql(ray_session, tmp_path):
    rows = []
    for i in range(60):
        src = ["web", "book", "chat"][i % 3]
        toks = " ".join(f"w{(i * 7 + j) % 40}" for j in range(10))
        rows.append((i, toks, src))
    sf = _write_docs(tmp_path, rows)
    got = (q_source_jaccard(sf)
           .sort_values(["source_a", "source_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.sql(SOURCE_JACCARD_SQL).df()
            .sort_values(["source_a", "source_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert (got["n_inter"] > 0).any()


def test_cap_per_lang(ray_session, tmp_path):
    import numpy as np

    from amazon_textract_transformer_pipeline_ray.pipelines.corpus import (
        CAP_PER_LANG_SQL,
        q_doc_cap_per_lang,
    )

    # 30 en docs (only 20 kept), 5 fr docs (all kept), ids shuffled
    rng = np.random.default_rng(3)
    ids = rng.permutation(35)
    rows = [(int(i), f"t {i}", "s") for i in ids]
    df = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    df["lang"] = np.where(df.doc_id < 30, "en", "fr")
    df["n_chars"] = df.text.str.len()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    sf = str(tmp_path)

    got = (q_doc_cap_per_lang(sf).to_pandas()
           .sort_values(["lang", "rn"]).reset_index(drop=True))
    en = got[got.lang == "en"]
    assert len(en) == 20 and en["doc_id"].tolist() == list(range(20))
    assert en["rn"].tolist() == list(range(1, 21))
    fr = got[got.lang == "fr"]
    assert len(fr) == 5 and fr["doc_id"].tolist() == list(range(30, 35))

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    cols = ["lang", "doc_id", "rn"]
    want = (con.sql(CAP_PER_LANG_SQL).df()[cols]
            .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True), want)


def test_role_transitions_crafted(ray_session, tmp_path):
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.stages.conversation import (
        role_transitions)

    # out-of-order turn_idx rows: ordering must come from the sort
    rows = pd.DataFrame({
        "conv_id": ["c1"] * 3 + ["c2"] * 2,
        "turn_idx": [2, 0, 1, 1, 0],   # c1 order: u,a,t ; c2 order: u,a
        "role": ["tool", "user", "assistant", "assistant", "user"],
    })
    p = tmp_path / "shard-0.parquet"
    pq.write_table(pa.Table.from_pandas(rows, preserve_index=False), str(p))
    got = (role_transitions(rd.read_parquet([str(p)]))
           .to_pandas().set_index(["prev_role", "role"])["n"].to_dict())
    # turn-idx-sorted: c1 = user->assistant->tool, c2 = user->assistant
    assert got == {("<start>", "user"): 2,
                   ("user", "assistant"): 2,
                   ("assistant", "tool"): 1}


def test_turn_latency_crafted(ray_session, tmp_path):
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.stages.conversation import (
        turn_latency)

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    s = pd.Timedelta(seconds=1)
    rows = pd.DataFrame({
        "conv_id": ["c1"] * 3 + ["c2"] * 2 + ["c3"],
        "turn_idx": [0, 1, 2, 0, 1, 0],
        "role": ["user", "assistant", "user", "user", "assistant", "user"],
        # c1: gaps 2s (u->a), 5s (a->u); c2: gap 3s (u->a); c3: single
        "ts": [t0, t0 + 2 * s, t0 + 7 * s, t0, t0 + 3 * s, t0],
    })
    p = tmp_path / "shard-0.parquet"
    pq.write_table(pa.Table.from_pandas(rows, preserve_index=False), str(p))
    got = (turn_latency(rd.read_parquet([str(p)]))
           .to_pandas().set_index(["prev_role", "role"]))
    ua = got.loc[("user", "assistant")]
    assert ua[["n", "sum_gap_us", "max_gap_us"]].tolist() \
        == [2, 5_000_000, 3_000_000]
    au = got.loc[("assistant", "user")]
    assert au[["n", "sum_gap_us", "max_gap_us"]].tolist() \
        == [1, 5_000_000, 5_000_000]
    assert len(got) == 2  # single-turn conv contributes nothing

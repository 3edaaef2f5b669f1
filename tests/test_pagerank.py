"""Fixed-point PageRank tests: hand-computed single-iteration values
on a crafted graph, damping-mass sanity, and bit-exact parity with the
unrolled SQL oracle."""

import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from amazon_textract_transformer_pipeline_ray.pipelines.graph import (
    PR_SCALE,
    pagerank_sql,
    q_doc_pagerank,
)


def _write_docs(tmp_path, texts):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts,
                       "lang": "en", "source": "s"})
    df["n_chars"] = df.text.str.len()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_one_iteration_hand_computed(ray_session, tmp_path):
    # docs 0,1 identical (jaccard 1.0 edge), doc 2 isolated
    shared = " ".join(f"w{i}" for i in range(20))
    sf = _write_docs(tmp_path, [shared, shared, "completely different"])
    got = (q_doc_pagerank(sf, n_iters=1).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # n=3: r0 = S//3; base = 3S//60; dangling = r0(2); share = dang//3
    r0 = PR_SCALE // 3
    base = (3 * PR_SCALE) // 60
    share = r0 // 3
    linked = base + (17 * (r0 + share)) // 20     # inflow = r0 // 1
    isolated = base + (17 * (0 + share)) // 20
    assert got["rank_fp"].tolist() == [linked, linked, isolated]
    assert linked > isolated  # linked docs accumulate centrality


def test_matches_oracle_sql_five_iters(ray_session, tmp_path):
    # chain of similarity: groups of 3 near-identical docs + singletons
    texts = []
    for g in range(8):
        base_text = " ".join(f"g{g}tok{i}" for i in range(20))
        texts.extend([base_text, base_text + " x", base_text + " y"])
    for s in range(6):
        texts.append(" ".join(f"solo{s}tok{i}" for i in range(15)))
    sf = _write_docs(tmp_path, texts)
    got = (q_doc_pagerank(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = (con.sql(pagerank_sql()).df()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    # clustered docs outrank singletons
    clustered = got[got.doc_id < 24]["rank_fp"]
    solo = got[got.doc_id >= 24]["rank_fp"]
    assert clustered.min() > solo.max()

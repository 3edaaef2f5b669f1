"""Chunking + grouping-sets rollup tests: crafted boundary docs against
hand-computed windows, and parity with the DuckDB oracle SQL."""

import hashlib
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from amazon_textract_transformer_pipeline_ray.pipelines.chunking import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    DOC_CHUNKS_SQL,
    q_doc_chunks,
)
from amazon_textract_transformer_pipeline_ray.pipelines.text import (
    STATS_ROLLUP_SQL,
    q_doc_stats_rollup,
)


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["n_chars"] = df.text.str.len()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _oracle(sf, sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')")
    return con.sql(sql).df()


def test_chunk_boundaries(ray_session, tmp_path):
    # lengths straddling every boundary case: empty; < SIZE; == STRIDE
    # (one chunk, second window would start AT the end); STRIDE+1 (two
    # chunks, second of length 1); == SIZE; SIZE+1; 3 full strides.
    lens = [0, 10, CHUNK_STRIDE, CHUNK_STRIDE + 1, CHUNK_SIZE,
            CHUNK_SIZE + 1, 3 * CHUNK_STRIDE]
    sf = _write_docs(tmp_path, [
        (i, "x" * n, "en", "s") for i, n in enumerate(lens)])
    got = (q_doc_chunks(sf).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    per_doc = got.groupby("doc_id").size().to_dict()
    assert per_doc == {1: 1, 2: 1, 3: 2, 4: 2, 5: 2, 6: 3}  # doc 0 absent
    # doc 3: second chunk covers exactly the 1 overflow char
    d3 = got[got.doc_id == 3]
    assert d3.n_chunk_chars.tolist() == [CHUNK_STRIDE + 1, 1]
    assert d3.chunk_start.tolist() == [0, CHUNK_STRIDE]
    # doc 4 (== SIZE): chunk 0 is full SIZE, chunk 1 is the overlap tail
    d4 = got[got.doc_id == 4]
    assert d4.n_chunk_chars.tolist() == [CHUNK_SIZE,
                                         CHUNK_SIZE - CHUNK_STRIDE]
    # md5 identity on a known window
    want = hashlib.md5(b"x" * (CHUNK_STRIDE + 1)).hexdigest()
    assert got[got.doc_id == 3].chunk_md5.iloc[0] == want


def test_chunk_overlap_consistency(ray_session, tmp_path):
    # consecutive chunks share SIZE-STRIDE chars: suffix of k == prefix
    # of k+1 for a doc long enough to have full windows
    text = "".join(chr(97 + (i * 7) % 26) for i in range(CHUNK_SIZE * 3))
    sf = _write_docs(tmp_path, [(0, text, "en", "s")])
    got = (q_doc_chunks(sf).to_pandas()
           .sort_values("chunk_idx").reset_index(drop=True))
    for _, r in got.iterrows():
        w = text[r.chunk_start:r.chunk_start + CHUNK_SIZE]
        assert hashlib.md5(w.encode()).hexdigest() == r.chunk_md5


def test_chunks_match_oracle_sql(ray_session, tmp_path):
    lens = [0, 1, 399, 400, 401, 499, 500, 501, 799, 800, 801, 1200, 2500]
    sf = _write_docs(tmp_path, [
        (i, "".join(chr(97 + (i + j) % 26) for j in range(n)), "en", "s")
        for i, n in enumerate(lens)])
    got = (q_doc_chunks(sf).to_pandas()
           .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    want = (_oracle(sf, DOC_CHUNKS_SQL)
            .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_rollup_levels(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [
        (0, "aa", "en", "web"), (1, "bbb", "en", "web"),
        (2, "cccc", "en", "book"), (3, "d", "fr", "web"),
    ])
    got = (q_doc_stats_rollup(sf).to_pandas()
           .sort_values(["level", "lang", "source"]).reset_index(drop=True))
    leaf = got[got.level == 0].set_index(["lang", "source"])
    assert leaf.loc[("en", "web"), "n_docs"] == 2
    assert leaf.loc[("en", "web"), "sum_chars"] == 5
    assert leaf.loc[("en", "book"), "sum_chars"] == 4
    lang = got[got.level == 1].set_index("lang")
    assert (lang.loc["en", ["n_docs", "sum_chars"]].tolist() == [3, 9])
    assert (lang.loc["fr", ["n_docs", "sum_chars"]].tolist() == [1, 1])
    assert (lang["source"] == "<all>").all()
    tot = got[got.level == 2]
    assert len(tot) == 1
    assert tot[["n_docs", "sum_chars"]].iloc[0].tolist() == [4, 10]


def test_rollup_matches_oracle_sql(ray_session, tmp_path):
    sf = _write_docs(tmp_path, [
        (i, "y" * (i % 7), ["en", "fr", "de"][i % 3],
         ["web", "book"][i % 2]) for i in range(50)])
    cols = ["lang", "source", "level", "n_docs", "sum_chars"]
    got = (q_doc_stats_rollup(sf).to_pandas()[cols]
           .sort_values(cols).reset_index(drop=True))
    want = (_oracle(sf, STATS_ROLLUP_SQL)[cols]
            .sort_values(cols).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_normalize_and_dedup_normalized(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.text import (
        DOC_DEDUP_NORMALIZED_SQL,
        DOC_NORMALIZE_SQL,
        q_doc_dedup_normalized,
        q_doc_normalize,
    )

    sf = _write_docs(tmp_path, [
        (0, "Hello   World", "en", "s"),
        (1, "hello world", "en", "s"),       # same canonical form as 0
        (2, "  HELLO\tWORLD \n", "en", "s"),  # and as this one
        (3, "hello worlds", "en", "s"),       # distinct
        (4, "", "en", "s"),                   # empty normalizes to ""
    ])
    norm = (q_doc_normalize(sf).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert norm["norm_md5"].nunique() == 3
    assert norm.loc[0, "norm_md5"] == norm.loc[1, "norm_md5"] \
        == norm.loc[2, "norm_md5"]
    assert norm["n_norm_chars"].tolist() == [11, 11, 11, 12, 0]

    dd = (q_doc_dedup_normalized(sf).to_pandas()
          .sort_values("keep_doc_id").reset_index(drop=True))
    assert dd["keep_doc_id"].tolist() == [0, 3, 4]
    assert dd["n_variants"].tolist() == [3, 1, 1]

    for sql, query in ((DOC_NORMALIZE_SQL, q_doc_normalize),
                       (DOC_DEDUP_NORMALIZED_SQL, q_doc_dedup_normalized)):
        got = query(sf).to_pandas()
        cols = sorted(got.columns)
        want = _oracle(sf, sql)
        pd.testing.assert_frame_equal(
            got[cols].sort_values(cols).reset_index(drop=True),
            want[cols].sort_values(cols).reset_index(drop=True))


def test_lexical_diversity(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.text import (
        LEXICAL_DIVERSITY_SQL,
        q_doc_lexical_diversity,
    )

    sf = _write_docs(tmp_path, [
        (0, "a b a b a", "en", "s"),     # 5 tokens, 2 types, ttr 0.4
        (1, "x y z", "en", "s"),          # ttr 1.0
        (2, "", "en", "s"),               # zero tokens -> ttr 0.0
        (3, "  padded   out  ", "en", "s"),  # trim + collapse: 2/2
    ])
    got = (q_doc_lexical_diversity(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["n_tokens"].tolist() == [5, 3, 0, 2]
    assert got["n_distinct"].tolist() == [2, 3, 0, 2]
    assert got["ttr"].tolist() == [0.4, 1.0, 0.0, 1.0]
    want = (_oracle(sf, LEXICAL_DIVERSITY_SQL)
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

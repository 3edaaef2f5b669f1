"""Index-construction operators over the ``documents`` table: the
inverted-index (postings) build and per-doc TF-IDF top terms — the two
"build the retrieval side" steps of a training-data curation stack
(dedup and decontamination pipelines consume exactly these artifacts).

Tokenization is the repo-wide whitespace convention (``dedup._tokens``,
mirrored in SQL as ``regexp_split_to_array(trim(text), '\\s+')``), so
both queries share the corpus-wide token statistics with the LM-scoring
and vocab-induction ops.

Scale shapes:

* ``q_token_postings`` — ONE token-shard shuffle (the same coarse
  hashed-key exchange as ``q_doc_lm_score_shuffled``): every row of a
  token lands in one shard, so df/tf and the capped posting list are
  computed in-shard with no second pass and no driver state.  Posting
  lists are CAPPED at the first ``POSTINGS_CAP`` doc ids (ascending) —
  a stopword's full posting list is O(corpus) and must never be
  materialized as one value; df/tf still count every occurrence.
* ``q_doc_tfidf_top_terms`` — document-frequency reduction broadcast
  once (vocab-sized small side, the same bound as the unigram LM in
  scoring.py), then one streaming per-batch top-k pass; no per-doc
  state leaves its batch.

Float convention: the tf-idf score is ONE multiply and ONE divide in
f64 (``tf * (N+1) / (df+1)`` — a reciprocal-idf variant chosen so both
engines compute bit-identical doubles; no log, no summation order).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..sources.scale import shuffle_width, table_num_rows
from ..sources.tables import broadcast, read_table
from .dedup import LSH_ROWS_PER_SHARD
from .scoring import _batch_doc_token_counts

POSTINGS_CAP = 16
TFIDF_TOP_K = 5


def q_token_postings(sf_dir: str) -> rd.Dataset:
    """Inverted index: per token, document frequency, total term
    frequency, and the md5 of the first ``POSTINGS_CAP`` posting doc ids
    (ascending) — see module docstring for the one-shuffle plan."""
    n_shards = shuffle_width(n_rows=table_num_rows(sf_dir, "documents"),
                             rows_per_shard=LSH_ROWS_PER_SHARD)
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def token_rows(t: pa.Table) -> pa.Table:
        toks, dix, cnt, _ = _batch_doc_token_counts(
            t.column("text").to_pylist())
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        h = (pd.util.hash_array(toks).astype(np.uint64) if len(toks)
             else np.zeros(0, np.uint64))
        shard = ((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(64 - 16)
                 ).astype(np.int64) % n_shards
        return pa.table({
            "shard": pa.array(shard.astype(np.int32)),
            "tok": pa.array(toks, pa.string()),
            "doc_id": pa.array(ids[dix] if len(toks)
                               else np.zeros(0, np.int64)),
            "c": pa.array(cnt),
        })

    def shard_postings(g: pd.DataFrame) -> pa.Table:
        toks = g["tok"].to_numpy()
        ids = g["doc_id"].to_numpy()
        cnt = g["c"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, toks))
        toks, ids, cnt = toks[order], ids[order], cnt[order]
        new = np.concatenate([[True], toks[1:] != toks[:-1]])
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(toks)]])
        df = ends - starts  # (doc, token) rows are pre-deduped per batch
        # ... but a doc's rows for one token can arrive from ONE batch
        # only (a doc is never split across batches), so run length = df
        tf = np.add.reduceat(cnt, starts)
        ids_s = ids.astype("U")
        md5s = [hashlib.md5(",".join(
                    ids_s[s:min(s + POSTINGS_CAP, e)]).encode()).hexdigest()
                for s, e in zip(starts, ends)]
        return pa.table({
            "token": pa.array(list(toks[starts]), pa.string()),
            "df": pa.array(df.astype(np.int64)),
            "tf": pa.array(tf.astype(np.int64)),
            "postings_md5": pa.array(md5s, pa.string()),
        })

    return (docs.map_batches(token_rows, batch_format="pyarrow",
                             batch_size=8192)
            .groupby("shard").map_groups(shard_postings,
                                         batch_format="pandas"))


POSTINGS_SQL = r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents WHERE trim(text) <> ''),
    dt AS (SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok GROUP BY w, doc_id),
    rn AS (SELECT w, doc_id, c,
                  ROW_NUMBER() OVER (PARTITION BY w ORDER BY doc_id) AS rn
           FROM dt),
    agg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
                   CAST(SUM(c) AS BIGINT) AS tf
            FROM dt GROUP BY w),
    posts AS (SELECT w, md5(string_agg(CAST(doc_id AS VARCHAR), ','
                                       ORDER BY doc_id)) AS postings_md5
              FROM rn WHERE rn <= 16 GROUP BY w)
    SELECT agg.w AS token, agg.df, agg.tf, posts.postings_md5
    FROM agg JOIN posts USING (w)
"""


def _df_model(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(sorted vocab, document frequency): distributed per-batch distinct
    (doc, token) partials -> one token groupby -> driver arrays."""
    ds = read_table(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks, _, _, _ = _batch_doc_token_counts(t.column("text").to_pylist())
        g = pd.DataFrame({"w": toks}).groupby("w", as_index=False).size()
        return pa.table({"w": pa.array(g["w"], pa.string()),
                         "p_df": pa.array(g["size"].to_numpy()
                                          .astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
           .groupby("w").aggregate(Sum("p_df", alias_name="df")))
    ws, ds_ = [], []
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        if "w" in b.column_names and len(b):
            ws.append(np.asarray(b.column("w").to_pylist(), dtype=object))
            ds_.append(b.column("df").to_numpy())
    if not ws:
        return np.empty(0, object), np.zeros(0, np.int64)
    w = np.concatenate(ws)
    d = np.concatenate(ds_).astype(np.int64)
    order = np.argsort(w)
    return w[order], d[order]


def q_doc_tfidf_top_terms(sf_dir: str, k: int = TFIDF_TOP_K) -> rd.Dataset:
    """Per-doc top-``k`` terms by tf-idf (reciprocal-idf variant,
    deterministic — see module docstring), ties broken token-ascending.
    df model broadcast once; scoring is one streaming pass."""
    vocab, dfs = _df_model(sf_dir)
    n_docs = float(table_num_rows(sf_dir, "documents"))
    ref = broadcast((vocab, dfs))
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def top_terms(t: pa.Table) -> pa.Table:
        v, d = ray.get(ref)
        toks, dix, tf, _ = _batch_doc_token_counts(
            t.column("text").to_pylist())
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        if not len(toks):
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            })
        df_tok = d[np.searchsorted(v, toks)]
        score = (tf.astype(np.float64) * (n_docs + 1.0)) \
            / (df_tok.astype(np.float64) + 1.0)
        frame = pd.DataFrame({
            "doc_id": ids[dix], "token": toks, "tf": tf,
            "df": df_tok, "score": score,
        }).sort_values(["doc_id", "score", "token"],
                       ascending=[True, False, True], kind="mergesort")
        top = frame.groupby("doc_id").head(k).reset_index(drop=True)
        top["rnk"] = top.groupby("doc_id").cumcount().to_numpy() + 1
        return pa.Table.from_pandas(
            top[["doc_id", "rnk", "token", "tf", "df", "score"]],
            preserve_index=False)

    return docs.map_batches(top_terms, batch_format="pyarrow",
                            batch_size=8192)


TFIDF_SQL = r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents WHERE trim(text) <> ''),
    dt AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, w),
    dfs AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY w),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
    s AS (SELECT dt.doc_id, dt.w, dt.tf, dfs.df,
                 (CAST(dt.tf AS DOUBLE) * (n.nd + 1.0))
                     / (CAST(dfs.df AS DOUBLE) + 1.0) AS score
          FROM dt JOIN dfs USING (w), n),
    r AS (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY score DESC, w) AS rnk
          FROM s)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(rnk AS BIGINT) AS rnk,
           w AS token, tf, df, score
    FROM r WHERE rnk <= 5
"""


# ---------------------------------------------------------------------------
# BM25 retrieval scoring (Robertson/Sparck Jones; Lucene's non-negative
# idf variant): lexical retrieval over the corpus for a deterministic
# query-by-example set — the retrieval-side complement of the embedding
# kNN suite (and the scoring kernel BM25-based decontamination uses).

BM25_K1 = 1.2
BM25_B = 0.75
BM25_N_QUERIES = 5


def q_bm25_scores(sf_dir: str) -> rd.Dataset:
    """BM25 score of every (query, document) pair with term overlap.

    Queries are the distinct-token sets of the first ``BM25_N_QUERIES``
    documents by doc_id (query-by-example; query_id = example doc_id).
    Corpus statistics (df model, N, avg doc length) come from the same
    distributed reductions as the TF-IDF op; the query-term table and
    the df arrays broadcast once (both vocab-bounded small sides), and
    scoring is ONE streaming pass — per batch, a dense
    (docs-in-batch x n_queries) partial-sum matrix via ``np.add.at``,
    emitted sparse (overlap > 0 only).  No shuffle, no driver loops.

    Float convention: each per-term factor is an identical f64 op chain
    in both engines; the per-(q,d) SUM is order-sensitive, so ``score``
    is f32 (REAL) per the repo convention.  ``n_overlap`` is exact."""
    vocab, dfs = _df_model(sf_dir)
    n_docs = float(table_num_rows(sf_dir, "documents"))
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    # total token count -> avg_len (exact: int sum / int count, one division)
    def len_rows(t: pa.Table) -> pa.Table:
        _, _, _, lens = _batch_doc_token_counts(t.column("text").to_pylist())
        return pa.table({"n": pa.array(lens)})

    total_tokens = float(docs.map_batches(
        len_rows, batch_format="pyarrow", batch_size=8192).sum("n") or 0.0)
    avg_len = total_tokens / n_docs

    # query-by-example term sets: tiny driver read of the example docs
    # (smallest BM25_N_QUERIES doc_ids; footer-pruned two-column read)
    import pyarrow.parquet as pq

    qtab = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    all_ids = qtab.column("doc_id").to_numpy()
    pick = np.argsort(all_ids, kind="mergesort")[:BM25_N_QUERIES]
    q_texts = [qtab.column("text")[int(i)].as_py() for i in pick]
    toks, qix, _, _ = _batch_doc_token_counts(q_texts)
    q_ids = all_ids[pick].astype(np.int64)
    q_order = np.argsort(toks, kind="mergesort")
    q_terms = toks[q_order]          # sorted distinct (term, query) pairs
    q_term_qix = qix[q_order]
    ref = broadcast((vocab, dfs, q_terms, q_term_qix, q_ids))

    def score(t: pa.Table) -> pa.Table:
        v, d, qt, qq, qids = ray.get(ref)
        toks_b, dix, tf, lens = _batch_doc_token_counts(
            t.column("text").to_pylist())
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        empty = pa.table({
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "n_overlap": pa.array([], pa.int64()),
            "score": pa.array([], pa.float32()),
        })
        if not len(toks_b) or not len(qt):
            return empty
        # match batch (doc, term, tf) rows against the query-term table:
        lo = np.searchsorted(qt, toks_b, side="left")
        hi = np.searchsorted(qt, toks_b, side="right")
        n_match = hi - lo                      # queries containing the term
        keep = np.flatnonzero(n_match > 0)
        if not len(keep):
            return empty
        # per-term BM25 factor (identical op chain to the SQL oracle):
        df_t = d[np.searchsorted(v, toks_b[keep])].astype(np.float64)
        idf = np.log(1.0 + ((n_docs - df_t) + 0.5) / (df_t + 0.5))
        tf_k = tf[keep].astype(np.float64)
        len_d = lens[dix[keep]].astype(np.float64)
        factor = idf * ((tf_k * (BM25_K1 + 1.0))
                        / (tf_k + BM25_K1
                           * ((1.0 - BM25_B) + BM25_B * (len_d / avg_len))))
        # fan each matched term out to its queries -> (doc, query) sums
        reps = n_match[keep]
        flat_q = qq[np.concatenate([np.arange(l, h)
                                    for l, h in zip(lo[keep], hi[keep])])]
        flat_doc = np.repeat(dix[keep], reps)
        flat_f = np.repeat(factor, reps)
        n_q = len(qids)
        sums = np.zeros((len(t), n_q), np.float64)
        cnts = np.zeros((len(t), n_q), np.int64)
        np.add.at(sums, (flat_doc, flat_q), flat_f)
        np.add.at(cnts, (flat_doc, flat_q), 1)
        r, c = np.nonzero(cnts)
        return pa.table({
            "query_id": pa.array(qids[c]),
            "doc_id": pa.array(ids[r]),
            "n_overlap": pa.array(cnts[r, c]),
            "score": pa.array(sums[r, c].astype(np.float32)),
        })

    return docs.map_batches(score, batch_format="pyarrow", batch_size=8192)


BM25_SQL = r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents WHERE trim(text) <> ''),
    dt AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, w),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS len
           FROM dt GROUP BY doc_id),
    dfs AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY w),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    avgl AS (SELECT (SELECT CAST(SUM(len) AS DOUBLE) FROM dl) / stats.n
                 AS avg_len, stats.n AS n FROM stats),
    qt AS (SELECT doc_id AS query_id, w FROM tok
           WHERE doc_id IN (SELECT doc_id FROM documents
                            ORDER BY doc_id LIMIT 5)
           GROUP BY doc_id, w)
    SELECT qt.query_id, dt.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_overlap,
           CAST(SUM(
               ln(1.0 + ((avgl.n - CAST(dfs.df AS DOUBLE)) + 0.5)
                        / (CAST(dfs.df AS DOUBLE) + 0.5))
               * ((CAST(dt.tf AS DOUBLE) * 2.2)
                  / (CAST(dt.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl.len AS DOUBLE)
                                             / avgl.avg_len))))
           ) AS REAL) AS score
    FROM qt
    JOIN dt USING (w)
    JOIN dfs USING (w)
    JOIN dl ON dl.doc_id = dt.doc_id, avgl
    GROUP BY qt.query_id, dt.doc_id
"""

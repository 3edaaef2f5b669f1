"""Similarity search over the ``embeddings`` table (list<float> column).

* ``q_embedding_knn`` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul against
  it, per-batch top-k partials are merged in a tiny groupby.  This is the
  baseline; the scale path is the LSH-bucketed variant below.
* ``q_embedding_dup_pairs`` — near-duplicate pairs (cosine >= threshold),
  batch-vs-broadcast-matrix blockwise.
* ``q_embedding_knn_lsh`` — random-hyperplane LSH bucketing: probes only
  same-bucket candidates (multi-probe over 1-bit flips), trading recall
  for a contact set ~B times smaller (rows-only check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..sources.tables import broadcast, read_table

KNN_K = 5
N_QUERIES = 10  # vec_id < N_QUERIES are the query set
DUP_COSINE = 0.95


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy()
    emb = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
    return ids, emb


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t["vec_id"], N_QUERIES))
    ids = t.column("vec_id").to_numpy()
    order = np.argsort(ids)
    emb = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)[order]
    return ids[order], emb


def q_embedding_knn(sf_dir: str, k: int = KNN_K) -> pd.DataFrame:
    """Exact top-k cosine neighbors for each query vector (vec_id <
    N_QUERIES), excluding self.  Output: (query_id, rank, neighbor_id)."""
    qids, qm = _query_matrix(sf_dir)
    qn = _normalize(qm)
    ref = broadcast((qids, qn))

    class PartialTopK:
        def __init__(self):
            self.qids, self.qn = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, emb = _batch_matrix(batch)
            sims = _normalize(emb) @ self.qn.T  # (n_batch, n_queries)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                col = sims[:, qi]
                mask = ids != qid
                cand_ids, cand_sims = ids[mask], col[mask]
                if len(cand_ids) > k:
                    part = np.argpartition(-cand_sims, k)[:k]
                    cand_ids, cand_sims = cand_ids[part], cand_sims[part]
                out_q.extend([qid] * len(cand_ids))
                out_n.extend(cand_ids.tolist())
                out_s.extend(cand_sims.tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            })

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    partials = ds.map_batches(PartialTopK, batch_format="pyarrow",
                              batch_size=4096, concurrency=(1, 4))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        top = g.sort_values(["sim", "neighbor_id"],
                            ascending=[False, True]).head(k)
        top = top.reset_index(drop=True)
        return pd.DataFrame({
            "query_id": top["query_id"],
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "neighbor_id": top["neighbor_id"],
        })

    out = (partials.groupby("query_id").map_groups(merge, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_embedding_dup_pairs(sf_dir: str,
                          threshold: float = DUP_COSINE) -> pd.DataFrame:
    """All vector pairs with cosine >= threshold (ids only, a < b).

    Blockwise: each batch multiplies against the full normalized matrix
    (broadcast once).  O(n^2) contact — right up to ~10^5 vectors; beyond
    that bucket with LSH first (see q_embedding_knn_lsh)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    all_ids = t.column("vec_id").to_numpy()
    allm = _normalize(np.asarray(t.column("embedding").to_pylist(),
                                 dtype=np.float64))
    ref = broadcast((all_ids, allm))

    class Dups:
        def __init__(self):
            self.ids, self.m = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, emb = _batch_matrix(batch)
            sims = _normalize(emb) @ self.m.T
            rows, cols = np.where(sims >= threshold)
            a = ids[rows]
            b = self.ids[cols]
            keep = a < b  # dedupe + drop self
            return pa.table({
                "vec_id_a": pa.array(a[keep], pa.int64()),
                "vec_id_b": pa.array(b[keep], pa.int64()),
            })

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ds.map_batches(Dups, batch_format="pyarrow", batch_size=4096,
                         concurrency=(1, 4)).to_pandas()
    if len(out) == 0:  # all-filtered: ensure a stable typed schema
        return pd.DataFrame({"vec_id_a": pd.Series([], dtype=np.int64),
                             "vec_id_b": pd.Series([], dtype=np.int64)})
    return out.sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True)


N_HYPERPLANES = 8


def q_embedding_knn_lsh(sf_dir: str, k: int = KNN_K) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH bucketing.

    Sign-bits against N_HYPERPLANES seeded hyperplanes give a bucket id;
    each query probes its own bucket plus all 1-bit-flip neighbors.
    Rows-only check (approximate by design); compare recall against
    q_embedding_knn in tests."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = _normalize(np.asarray(t.column("embedding").to_pylist(),
                              dtype=np.float64))
    dim = m.shape[1]
    planes = np.random.default_rng(20260817).standard_normal((dim, N_HYPERPLANES))
    buckets = ((m @ planes) > 0).astype(np.uint32) @ (
        1 << np.arange(N_HYPERPLANES, dtype=np.uint32))

    qmask = ids < N_QUERIES
    rows = []
    for qi in np.flatnonzero(qmask):
        probe = {int(buckets[qi])} | {
            int(buckets[qi]) ^ (1 << b) for b in range(N_HYPERPLANES)}
        cand = np.flatnonzero(np.isin(buckets, list(probe)) & (ids != ids[qi]))
        sims = m[cand] @ m[qi]
        order = np.lexsort((ids[cand], -sims))[:k]
        for rank, j in enumerate(order, 1):
            rows.append((int(ids[qi]), rank, int(ids[cand[j]])))
    return pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id"])

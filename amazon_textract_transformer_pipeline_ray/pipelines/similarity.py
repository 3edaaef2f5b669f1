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


def q_embedding_dup_pairs_lsh(sf_dir: str,
                              threshold: float = DUP_COSINE) -> pd.DataFrame:
    """Near-duplicate pairs via multi-table hyperplane-LSH bucketing — the
    scale path past the O(n^2) blockwise variant: candidates are
    same-bucket pairs (union over L tables, emitted once from the first
    table where they collide), verified exactly against the broadcast
    normalized matrix.  Rows-only; recall vs q_embedding_dup_pairs is
    asserted in tests."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = _normalize(np.asarray(t.column("embedding").to_pylist(),
                              dtype=np.float64))
    # Dup detection wants high recall at high cosine: short hashes (4 bit)
    # x more tables (8) — at threshold 0.95 the per-table collision
    # probability is ~0.65, so P[miss] ~ (1-0.65)^8 < 2e-4:
    n_bits, n_tables = 4, 8
    rng = np.random.default_rng(20260817)
    pow2 = 1 << np.arange(n_bits, dtype=np.uint32)
    buckets = []
    for _ in range(n_tables):
        planes = rng.standard_normal((m.shape[1], n_bits))
        buckets.append(((m @ planes) > 0).astype(np.uint32) @ pow2)
    bh = np.stack(buckets, axis=1)  # (n, L)

    pairs_a, pairs_b = [], []
    for table_ix in range(n_tables):
        key = bh[:, table_ix]
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.concatenate([[True], ks[1:] != ks[:-1]]))
        bounds = np.concatenate([starts, [len(ks)]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            members = order[s:e]
            ia, ib = np.triu_indices(len(members), k=1)
            a, b = members[ia], members[ib]
            # emit once: only when this is the FIRST table where they collide
            eq = bh[a] == bh[b]
            mine = eq.argmax(axis=1) == table_ix
            pairs_a.append(a[mine])
            pairs_b.append(b[mine])
    if pairs_a:
        a = np.concatenate(pairs_a)
        b = np.concatenate(pairs_b)
        sims = np.einsum("ij,ij->i", m[a], m[b])
        keep = sims >= threshold
        va, vb = ids[a[keep]], ids[b[keep]]
        out = pd.DataFrame({"vec_id_a": np.minimum(va, vb),
                            "vec_id_b": np.maximum(va, vb)})
        out = out.drop_duplicates()
    else:
        out = pd.DataFrame({"vec_id_a": [], "vec_id_b": []})
    return (out.astype({"vec_id_a": np.int64, "vec_id_b": np.int64})
            .sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True))


N_IVF_LISTS = 16
IVF_NPROBE = 4
IVF_ITERS = 5


def q_embedding_knn_ivf(sf_dir: str, k: int = KNN_K) -> pd.DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization — the
    scale path past brute force: k-means centroids trained distributed
    (per-batch partial sums -> driver Lloyd update), vectors assigned to
    their nearest list in one ``map_batches`` pass, queries probe only the
    IVF_NPROBE nearest lists.  Deterministic (seeded init, fixed
    iteration count); rows-only check — recall vs exact kNN is asserted
    in tests."""
    qids, qm = _query_matrix(sf_dir)
    qn = _normalize(qm)
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    # --- train coarse centroids (Lloyd, partial-sum pattern) -------------
    # Seeded deterministic init: hash-spread sample of N_IVF_LISTS vectors.
    import pyarrow.parquet as pq

    head = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    all_ids = head.column("vec_id").to_numpy()
    order = np.argsort((all_ids * 2654435761) % 2**32)[:N_IVF_LISTS]
    cents = _normalize(np.asarray(
        head.column("embedding").to_pylist(), dtype=np.float64)[order])

    for _ in range(IVF_ITERS):
        ref = broadcast(cents)

        class PartialSums:
            def __init__(self):
                self.c = ray.get(ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                _, emb = _batch_matrix(batch)
                x = _normalize(emb)
                assign = (x @ self.c.T).argmax(axis=1)
                sums = np.zeros_like(self.c)
                np.add.at(sums, assign, x)
                counts = np.bincount(assign, minlength=len(self.c))
                return pa.table({
                    "list_id": pa.array(np.arange(len(self.c)), pa.int32()),
                    "vec_sum": pa.array(sums.tolist(),
                                        pa.list_(pa.float64())),
                    "n": pa.array(counts, pa.int64()),
                })

        parts = ds.map_batches(PartialSums, batch_format="pyarrow",
                               batch_size=8192, concurrency=(1, 4)).to_pandas()
        g = parts.groupby("list_id")
        new = cents.copy()
        for lid, grp in g:
            n = int(grp["n"].sum())
            if n:
                s = np.sum(np.stack(grp["vec_sum"].to_numpy()), axis=0)
                new[int(lid)] = s / np.linalg.norm(s).clip(1e-12)
        cents = new

    # --- probe: queries search only their IVF_NPROBE nearest lists -------
    probe_lists = np.argsort(-(qn @ cents.T), axis=1)[:, :IVF_NPROBE]
    ref_c = broadcast(cents)
    ref_q = broadcast((qids, qn, probe_lists))

    class ProbeTopK:
        def __init__(self):
            self.c = ray.get(ref_c)
            self.qids, self.qn, self.probe = ray.get(ref_q)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, emb = _batch_matrix(batch)
            x = _normalize(emb)
            assign = (x @ self.c.T).argmax(axis=1)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                cand = np.flatnonzero(
                    np.isin(assign, self.probe[qi]) & (ids != qid))
                if len(cand) == 0:
                    continue
                sims = x[cand] @ self.qn[qi]
                if len(cand) > k:
                    part = np.argpartition(-sims, k)[:k]
                    cand, sims = cand[part], sims[part]
                out_q.extend([qid] * len(cand))
                out_n.extend(ids[cand].tolist())
                out_s.extend(sims.tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            })

    partials = ds.map_batches(ProbeTopK, batch_format="pyarrow",
                              batch_size=8192, concurrency=(1, 4))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        top = g.sort_values(["sim", "neighbor_id"],
                            ascending=[False, True]).head(k)
        return pd.DataFrame({
            "query_id": top["query_id"].to_numpy(),
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "neighbor_id": top["neighbor_id"].to_numpy(),
        })

    out = (partials.groupby("query_id").map_groups(merge, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


N_HYPERPLANES = 6  # bits per table
N_LSH_TABLES = 4   # independent tables; recall ~ 1-(1-p_table)^L


def q_embedding_knn_lsh(sf_dir: str, k: int = KNN_K) -> pd.DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    L independent 6-bit sign-hash tables; each query probes its bucket
    plus all 1-bit-flip neighbors in every table, and candidates are the
    union across tables (the standard recall amplifier for weakly
    clustered data).  Rows-only check (approximate by design); recall vs
    q_embedding_knn is asserted in tests."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = _normalize(np.asarray(t.column("embedding").to_pylist(),
                              dtype=np.float64))
    dim = m.shape[1]
    rng = np.random.default_rng(20260817)
    pow2 = 1 << np.arange(N_HYPERPLANES, dtype=np.uint32)
    tables = []
    for _ in range(N_LSH_TABLES):
        planes = rng.standard_normal((dim, N_HYPERPLANES))
        tables.append(((m @ planes) > 0).astype(np.uint32) @ pow2)

    qmask = ids < N_QUERIES
    rows = []
    for qi in np.flatnonzero(qmask):
        cand_mask = np.zeros(len(ids), dtype=bool)
        for buckets in tables:
            probe = {int(buckets[qi])} | {
                int(buckets[qi]) ^ (1 << b) for b in range(N_HYPERPLANES)}
            cand_mask |= np.isin(buckets, list(probe))
        cand = np.flatnonzero(cand_mask & (ids != ids[qi]))
        sims = m[cand] @ m[qi]
        order = np.lexsort((ids[cand], -sims))[:k]
        for rank, j in enumerate(order, 1):
            rows.append((int(ids[qi]), rank, int(ids[cand[j]])))
    return pd.DataFrame(rows, columns=["query_id", "rank", "neighbor_id"])

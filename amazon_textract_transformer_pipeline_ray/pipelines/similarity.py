"""Similarity search over the ``embeddings`` table (list<float> column).

* ``q_embedding_knn`` — brute-force cosine top-k: the query matrix is
  broadcast once (``ray.put``), each batch does one numpy matmul against
  it, per-batch top-k partials are merged in a tiny groupby.  This is the
  baseline; the scale path is the LSH-bucketed variant below.
* ``q_embedding_dup_pairs`` — near-duplicate pairs (cosine >= threshold),
  batch-vs-broadcast-matrix blockwise.
* ``q_embedding_knn_lsh`` — random-hyperplane LSH bucketing: probes only
  same-bucket candidates (multi-probe over 1-bit flips), trading recall
  for a contact set ~B times smaller.
* ``q_embedding_knn_ivf`` — IVF coarse quantization with sample-trained
  centroids (``ivf_centroids``) and an optional full-table distributed
  Lloyd refinement (``train_ivf_lloyd_distributed``).

All four are SQL-checked by the driver (directly or via the independent
single-process fixtures in ``oracle_fixture_aux.py``).

Scale conventions: the ONLY driver-side materializations are (a) the
query matrix (``vec_id < N_QUERIES`` — a filter-pushdown read of the
small query side by definition) and (b) the final pair/top-k result.
Hyperplanes (~KB) are broadcast via ``ray.put``; bucketing, candidate
generation and exact verification all run inside ``map_batches`` /
``groupby().map_groups``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..sources.tables import broadcast, read_table

KNN_K = 5
N_QUERIES = 10  # vec_id < N_QUERIES are the query set
DUP_COSINE = 0.95

# Work budget for q_embedding_dup_pairs' O(n^2) blockwise crossing (n^2
# cosine cells).  Like the jaccard anchor's JACCARD_PAIR_BUDGET_CELLS, a
# misuse at big scale must fail LOUDLY with a pointer to the LSH twin,
# not grind quadratically / OOM the broadcast.  1e10 cells ~= 1e5
# vectors — the docstring's stated ceiling for the exact variant.
EMBEDDING_PAIR_BUDGET_CELLS = int(
    os.environ.get("GRAFT_EMBEDDING_PAIR_BUDGET", 10**10))


def _list_matrix(col: pa.ChunkedArray | pa.Array, n: int) -> np.ndarray:
    """Zero-copy ``list<float>`` -> (n, d) float64: flatten the Arrow
    child buffer and reshape — no per-row Python list materialization."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
    return flat.reshape(n, -1).astype(np.float64)


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy()
    return ids, _list_matrix(batch.column("embedding"), len(ids))


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side read of the SMALL query side only (``vec_id <
    N_QUERIES``): the filter is pushed down to parquet row-group pruning,
    so this never materializes the full table."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", N_QUERIES)])
    ids = t.column("vec_id").to_numpy()
    order = np.argsort(ids)
    emb = _list_matrix(t.column("embedding"), len(ids))[order]
    return ids[order], emb


def _sample_matrix(sf_dir: str, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic small sample WITHOUT a full-table driver read: only
    the first parquet row group is touched, and a hash-spread over ids is
    applied within it so the pick is not biased by write order inside the
    group.  (Seeding k-means from one shard is standard practice — Lloyd
    iterations see the whole dataset and correct any shard bias.)"""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    head = pf.read_row_group(0, columns=["vec_id", "embedding"])
    ids = head.column("vec_id").to_numpy()
    order = np.argsort((ids.astype(np.uint64) * 2654435761) % 2**32)[:n]
    emb = _list_matrix(head.column("embedding"), len(ids))[order]
    return ids[order], emb


def _hyperplanes(dim: int, n_bits: int, n_tables: int,
                 seed: int = 20260817) -> np.ndarray:
    """(n_tables, dim, n_bits) seeded sign-hash hyperplanes — a few KB,
    broadcast once via ``ray.put`` and read zero-copy by every task."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, dim, n_bits))


def _bucket_codes(x: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, n_tables) uint32 bucket codes for normalized rows ``x``."""
    n_tables, _, n_bits = planes.shape
    pow2 = 1 << np.arange(n_bits, dtype=np.uint32)
    out = np.empty((x.shape[0], n_tables), dtype=np.uint32)
    for t in range(n_tables):
        out[:, t] = ((x @ planes[t]) > 0).astype(np.uint32) @ pow2
    return out


def _embedding_dim(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    head = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    return len(head.column("embedding")[0])


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
    (broadcast once).  O(n^2) contact — right up to ~10^5 vectors
    (EMBEDDING_PAIR_BUDGET_CELLS raises loudly beyond that); past it
    bucket with LSH first (see q_embedding_dup_pairs_lsh)."""
    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(f"{sf_dir}/embeddings.parquet"
                            ).metadata.num_rows
    cells = n_rows * n_rows
    if cells > EMBEDDING_PAIR_BUDGET_CELLS:
        raise ValueError(
            f"q_embedding_dup_pairs: exact all-pairs crossing needs "
            f"{cells:,} cells ({n_rows:,} vectors squared) > budget "
            f"{EMBEDDING_PAIR_BUDGET_CELLS:,}. This query is the "
            "documented EXACT anchor for oracle checks at small scale; "
            "at this size use q_embedding_dup_pairs_lsh — the scale path "
            "with no broadcast matrix and no quadratic.")
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    all_ids = t.column("vec_id").to_numpy()
    allm = _normalize(_list_matrix(t.column("embedding"), len(all_ids)))
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
    scale path past the O(n^2) blockwise variant, fully distributed:

    1. ``map_batches``: normalize each vector, hash it into L bucket codes
       (hyperplanes broadcast once, ~KB), and emit L keyed rows — each row
       carries the vector's FULL code vector plus the normalized embedding
       so the bucket stage can both dedup candidates and verify exactly
       without any further shuffle or driver state.
    2. ``groupby(table, bucket).map_groups``: inside a bucket, a pair is
       emitted only when this table is the pair's FIRST colliding table
       (so every candidate is produced exactly once across all buckets),
       then verified by exact cosine — all vectorized in-bucket.

    Each vector is shipped L times through one shuffle; there is no
    whole-corpus materialization anywhere.  Rows-only; recall vs
    q_embedding_dup_pairs is asserted in tests.

    Bucket-cost note: candidate work inside a bucket is QUADRATIC in
    bucket size (triu pair enumeration), so the code/table geometry is
    what bounds per-task cost — 6-bit codes put ~n/64 of the corpus in a
    bucket per table; at threshold 0.95 the per-table collision
    probability is ~0.9^6 ~ 0.53, and 12 tables give P[miss] ~
    (1-0.53)^12 ~ 1e-4.  For larger corpora raise ``n_bits`` (buckets
    shrink 2x per bit; add tables to hold recall) rather than letting a
    bucket degenerate toward all-pairs."""
    n_bits, n_tables = 6, 12
    planes = _hyperplanes(_embedding_dim(sf_dir), n_bits, n_tables)
    ref = broadcast(planes)

    class BucketRows:
        def __init__(self):
            self.planes = ray.get(ref)
            self.n_tables = self.planes.shape[0]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, emb = _batch_matrix(batch)
            x = _normalize(emb)
            codes = _bucket_codes(x, self.planes)  # (n, L)
            L, n = self.n_tables, len(ids)
            d = x.shape[1] if n else 0
            # columnar fixed-width list assembly (no .tolist() walks):
            code_vals = pa.array(np.repeat(codes, L, axis=0).reshape(-1))
            code_offs = pa.array(
                np.arange(n * L + 1, dtype=np.int32) * L)
            emb_vals = pa.array(np.repeat(x, L, axis=0).reshape(-1))
            emb_offs = pa.array(
                np.arange(n * L + 1, dtype=np.int32) * d)
            return pa.table({
                "table_ix": pa.array(np.tile(np.arange(L, dtype=np.int32), n)),
                "bucket": pa.array(codes.reshape(-1)),
                "vec_id": pa.array(np.repeat(ids, L), pa.int64()),
                "codes": pa.ListArray.from_arrays(code_offs, code_vals),
                "nemb": pa.ListArray.from_arrays(emb_offs, emb_vals),
            })

    rows = (read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
            .map_batches(BucketRows, batch_format="pyarrow",
                         batch_size=4096, concurrency=(1, 4)))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id_a": pd.Series([], dtype=np.int64),
                              "vec_id_b": pd.Series([], dtype=np.int64)})
        if len(g) < 2:
            return empty
        table_ix = int(g["table_ix"].iloc[0])
        ids = g["vec_id"].to_numpy()
        codes = np.stack([np.asarray(c, dtype=np.uint32)
                          for c in g["codes"]])
        m = np.stack([np.asarray(e, dtype=np.float64) for e in g["nemb"]])
        ia, ib = np.triu_indices(len(ids), k=1)
        # emit once: only when this is the FIRST table where they collide
        eq = codes[ia] == codes[ib]
        mine = eq.argmax(axis=1) == table_ix
        ia, ib = ia[mine], ib[mine]
        if len(ia) == 0:
            return empty
        sims = np.einsum("ij,ij->i", m[ia], m[ib])
        keep = sims >= threshold
        va, vb = ids[ia[keep]], ids[ib[keep]]
        return pd.DataFrame({
            "vec_id_a": np.minimum(va, vb).astype(np.int64),
            "vec_id_b": np.maximum(va, vb).astype(np.int64),
        })

    out = (rows.groupby(["table_ix", "bucket"])
           .map_groups(bucket_pairs, batch_format="pandas")
           .to_pandas())
    if len(out) == 0:
        return pd.DataFrame({"vec_id_a": pd.Series([], dtype=np.int64),
                             "vec_id_b": pd.Series([], dtype=np.int64)})
    return (out.astype({"vec_id_a": np.int64, "vec_id_b": np.int64})
            .sort_values(["vec_id_a", "vec_id_b"]).reset_index(drop=True))


N_IVF_LISTS = 16
IVF_NPROBE = 4
IVF_ITERS = 5
IVF_TRAIN_SAMPLE = 2048


def ivf_centroids(sf_dir: str, n_lists: int = N_IVF_LISTS,
                  iters: int = IVF_ITERS,
                  sample_n: int = IVF_TRAIN_SAMPLE) -> np.ndarray:
    """Deterministic IVF coarse centroids, faiss-style: Lloyd k-means
    over a bounded hash-spread SAMPLE (first parquet row group only, no
    full-table read), entirely on the driver.  Training cost is
    independent of table size — at 100 TB you still train on a few
    thousand vectors — and the fixed iteration order makes the model
    bit-deterministic, so the centroids act as a shared SPEC (like the
    LSH hyperplane seeds) that the independent oracle can import.

    ``train_ivf_lloyd_distributed`` below is the cluster-scale
    refinement alternative (per-batch partial sums over the FULL table);
    its float results depend on partial arrival order, so the query path
    defaults to this sample-trained model."""
    _, emb = _sample_matrix(sf_dir, sample_n)
    x = _normalize(emb)
    cents = x[:n_lists].copy()
    for _ in range(iters):
        assign = (x @ cents.T).argmax(axis=1)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, x)
        counts = np.bincount(assign, minlength=n_lists)
        for lid in range(n_lists):
            if counts[lid]:
                cents[lid] = sums[lid] / np.linalg.norm(
                    sums[lid]).clip(1e-12)
    return cents


def train_ivf_lloyd_distributed(ds: rd.Dataset, init: np.ndarray,
                                iters: int = IVF_ITERS) -> np.ndarray:
    """Distributed Lloyd refinement: per-batch partial sums over the FULL
    dataset -> tiny driver update per iteration.  The scale path when the
    coarse model should see every vector; float64 partial-sum arrival
    order makes the result run-deterministic only per execution, so use
    ``ivf_centroids`` when bit-stable output matters (oracle paths)."""
    cents = init.copy()
    for _ in range(iters):
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
    return cents


def q_embedding_knn_ivf(sf_dir: str, k: int = KNN_K) -> pd.DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization — the
    scale path past brute force: sample-trained coarse centroids
    (``ivf_centroids``), vectors assigned to their nearest list in one
    ``map_batches`` pass, queries probe only the IVF_NPROBE nearest
    lists, per-batch partial top-k merged in a tiny groupby.
    SQL-checked: the independent oracle fixture imports the centroid
    model as spec and recomputes the whole search single-process."""
    qids, qm = _query_matrix(sf_dir)
    qn = _normalize(qm)
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = ivf_centroids(sf_dir)

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
    """Approximate top-k via multi-table random-hyperplane LSH, fully
    distributed:

    L independent 6-bit sign-hash tables; each query probes its bucket
    plus all 1-bit-flip neighbors in every table, and candidates are the
    union across tables (the standard recall amplifier for weakly
    clustered data).  Only the hyperplanes and the per-query probe sets
    (L x 7 uint32 codes per query, ~KB total) are broadcast; every batch
    hashes its own vectors, masks them against the probe sets, and emits
    partial top-k rows which a tiny per-query ``groupby`` merge reduces —
    no full-table materialization anywhere.  Rows-only check (approximate
    by design); recall vs q_embedding_knn is asserted in tests."""
    qids, qm = _query_matrix(sf_dir)
    qn = _normalize(qm)
    planes = _hyperplanes(qn.shape[1], N_HYPERPLANES, N_LSH_TABLES)
    qcodes = _bucket_codes(qn, planes)  # (n_q, L)
    # probe sets: own bucket + every 1-bit flip -> (n_q, L, 1+bits)
    flips = np.concatenate(
        [[0], 1 << np.arange(N_HYPERPLANES, dtype=np.uint32)]).astype(np.uint32)
    probes = qcodes[:, :, None] ^ flips[None, None, :]
    ref = broadcast((qids, qn, planes, probes))

    class ProbeTopK:
        def __init__(self):
            self.qids, self.qn, self.planes, self.probes = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, emb = _batch_matrix(batch)
            x = _normalize(emb)
            codes = _bucket_codes(x, self.planes)  # (n, L)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                cand_mask = np.zeros(len(ids), dtype=bool)
                for t in range(codes.shape[1]):
                    cand_mask |= np.isin(codes[:, t], self.probes[qi, t])
                cand = np.flatnonzero(cand_mask & (ids != qid))
                if len(cand) == 0:
                    continue
                sims = x[cand] @ self.qn[qi]
                # batch-local top-k under the global tie-break order
                # (sim desc, id asc) keeps the merged result identical
                # to a single global sort:
                order = np.lexsort((ids[cand], -sims))[:k]
                out_q.extend([qid] * len(order))
                out_n.extend(ids[cand[order]].tolist())
                out_s.extend(sims[order].tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            })

    partials = (read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
                .map_batches(ProbeTopK, batch_format="pyarrow",
                             batch_size=8192, concurrency=(1, 4)))

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


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication via cluster-then-compare (Abbas et al.
# 2023, "SemDeDup: Data-efficient learning at web-scale through semantic
# deduplication" — public paper).  Cluster the embedding space with the
# deterministic sample-trained centroids, then find near-duplicates ONLY
# within each cluster — the quadratic runs over n/k rows per cluster
# instead of n, which is what makes cosine dedup feasible at web scale.

SEMDEDUP_COSINE = DUP_COSINE  # same near-dup bar as the pairwise suite


def semdedup_lists(n_rows: int) -> int:
    """Cluster count sized by the TABLE, not hardcoded: ~1024 rows per
    cluster keeps the in-cluster quadratic bounded as the corpus grows
    (SemDeDup runs k ~ n/1000 in the paper), floored at the IVF default.
    The training sample is sized to the cluster count by
    ``semdedup_centroids`` (4 sample points per centroid), so the cap
    is the first parquet row group's size, not a constant."""
    return int(min(max(N_IVF_LISTS, n_rows // 1024), 1 << 16))


def semdedup_centroids(sf_dir: str, n_rows: int,
                       n_lists: int | None = None) -> np.ndarray:
    """The shared centroid MODEL for SemDeDup: cluster count from
    ``semdedup_lists``, training sample 4x that (bounded by the first
    row group — see ``_sample_matrix``).  One helper so the engine and
    the independent oracle fixture fit the identical spec."""
    if n_lists is None:
        n_lists = semdedup_lists(n_rows)
    return ivf_centroids(sf_dir, n_lists=n_lists,
                         sample_n=max(IVF_TRAIN_SAMPLE, 4 * n_lists))


def q_embedding_semdedup(sf_dir: str,
                         threshold: float = SEMDEDUP_COSINE,
                         n_lists: int | None = None) -> rd.Dataset:
    """Per-vector SemDeDup verdict: (vec_id, cluster_id, keep) where
    ``keep`` = 0 iff some SMALLER vec_id in the same cluster has cosine
    >= ``threshold`` (first-wins survivor rule, as everywhere in the
    dedup suite).

    Scale shape: centroids are a driver-side sample fit (cost
    independent of table size, shared as spec with the oracle),
    broadcast once; assignment is a streaming matmul ``map_batches``;
    ONE cluster-keyed shuffle co-locates each cluster, whose task runs
    a blocked gram matmul over its ~1024 rows.  Per-task memory is
    bounded by ``semdedup_lists`` sizing, not by corpus size; the
    quadratic is in CLUSTER size only (the paper's point)."""
    from ..sources.scale import table_num_rows

    n_rows = table_num_rows(sf_dir, "embeddings")
    cents = semdedup_centroids(sf_dir, n_rows, n_lists)
    ref = broadcast(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        ids, emb = _batch_matrix(batch)
        xn = _normalize(emb)
        cl = (xn @ c.T).argmax(axis=1).astype(np.int64)
        return pa.table({
            "cluster_id": pa.array(cl),
            "vec_id": pa.array(ids.astype(np.int64)),
            "embedding": batch["embedding"],
        })

    def cluster_dedup(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        emb = np.asarray(
            [np.asarray(e, dtype=np.float64) for e in g["embedding"]],
            dtype=np.float64)[order]
        xn = _normalize(emb)
        n = len(ids)
        keep = np.ones(n, dtype=np.int64)
        # blocked lower-triangular scan: each block row only compares
        # against strictly-smaller ids, 512 rows at a time
        B = 512
        for s in range(1, n, B):
            e = min(s + B, n)
            sims = xn[s:e] @ xn[:e].T
            jj = np.arange(s, e)[:, None] > np.arange(e)[None, :]
            keep[s:e] = ~np.any((sims >= threshold) & jj, axis=1)
        return pd.DataFrame({
            "vec_id": ids,
            "cluster_id": g["cluster_id"].to_numpy()[order],
            "keep": keep,
        })

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    return (ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)
            .groupby("cluster_id")
            .map_groups(cluster_dedup, batch_format="pandas"))


def q_embedding_cluster_stats(sf_dir: str,
                              n_lists: int | None = None) -> rd.Dataset:
    """Per-cluster curation statistics over the shared SemDeDup
    centroid spec: (cluster_id, n, mean_sim, min_sim, max_sim), where
    ``sim`` = cosine(vector, its assigned centroid).  This is the
    cluster-quality / prototypicality table that SemDeDup-style and
    SSL-prototype pruning read to pick per-cluster keep rates (Abbas et
    al. 2023; Sorscher et al. 2022 — public papers).

    Scale shape: centroids broadcast once (driver sample fit, cost
    independent of table size); ONE streaming assignment pass emits at
    most ``n_lists`` combined partial rows per batch (sum/min/max/count
    fold inside the batch); one tiny groupby(cluster_id) finishes.  No
    quadratic anywhere, no full-table driver state.  Empty clusters are
    absent (the fixture matches).  f32 final floats per repo
    convention."""
    from ray.data.aggregate import Max, Min, Sum

    from ..sources.scale import table_num_rows

    n_rows = table_num_rows(sf_dir, "embeddings")
    cents = semdedup_centroids(sf_dir, n_rows, n_lists)
    ref = broadcast(cents)

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        _, emb = _batch_matrix(batch)
        xn = _normalize(emb)
        sims = xn @ c.T
        cl = sims.argmax(axis=1)
        sim = sims[np.arange(len(cl)), cl]
        k = len(c)
        n = np.bincount(cl, minlength=k)
        s = np.zeros(k, np.float64)
        np.add.at(s, cl, sim)
        mn = np.full(k, np.inf)
        np.minimum.at(mn, cl, sim)
        mx = np.full(k, -np.inf)
        np.maximum.at(mx, cl, sim)
        nz = np.flatnonzero(n)
        return pa.table({
            "cluster_id": pa.array(nz.astype(np.int64)),
            "p_n": pa.array(n[nz].astype(np.int64)),
            "p_s": pa.array(s[nz]),
            "p_min": pa.array(mn[nz]),
            "p_max": pa.array(mx[nz]),
        })

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])
    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
           .groupby("cluster_id")
           .aggregate(Sum("p_n", alias_name="n"),
                      Sum("p_s", alias_name="s"),
                      Min("p_min", alias_name="mn"),
                      Max("p_max", alias_name="mx")))

    def finish(t: pa.Table) -> pa.Table:
        if "cluster_id" not in t.column_names or not len(t):
            z64 = pa.array([], pa.int64())
            zf = pa.array([], pa.float32())
            return pa.table({"cluster_id": z64, "n": z64, "mean_sim": zf,
                             "min_sim": zf, "max_sim": zf})
        n = t.column("n").to_numpy().astype(np.float64)
        return pa.table({
            "cluster_id": t.column("cluster_id").cast(pa.int64()),
            "n": t.column("n").cast(pa.int64()),
            "mean_sim": pa.array(
                (t.column("s").to_numpy() / n).astype(np.float32)),
            "min_sim": pa.array(
                t.column("mn").to_numpy().astype(np.float32)),
            "max_sim": pa.array(
                t.column("mx").to_numpy().astype(np.float32)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Distributed PCA over the embedding column — the dimensionality-
# reduction / whitening front end of embedding-based curation (cluster
# visualization, D4-style diversity pruning).  The second-moment
# accumulation is INTEGER-EXACT: embeddings are quantized to
# round(x * PCA_SCALE) int64, so the distributed sums are arrival-order
# free and the derived covariance is bit-deterministic — the same
# "shared spec" convention as the IVF centroids (the oracle fixture
# imports ``pca_components`` and recomputes only the accumulation +
# projection loop-style).

PCA_SCALE = 1 << 16  # q*q <= 2^32 -> int64 sums safe to ~2^31 rows;
#                       beyond that raise the shard combine, not SCALE
PCA_K = 2


def pca_components(sq: np.ndarray, ss: np.ndarray, n: int,
                   k: int = PCA_K) -> tuple[np.ndarray, np.ndarray]:
    """(mean (d,), components (d, k)) from the EXACT integer sums
    ``sq = sum q_i`` and ``ss = sum q_i q_i^T``: covariance -> eigh ->
    top-k eigenvectors (descending eigenvalue), each sign-fixed so its
    largest-|entry| coordinate is positive.  Pure deterministic math —
    identical input ints give identical output bits."""
    sqf = sq.astype(np.float64) / n / PCA_SCALE
    cov = ss.astype(np.float64) / n / (PCA_SCALE * PCA_SCALE) \
        - np.outer(sqf, sqf)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :k].copy()
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    return sqf, comps


def pca_model(sf_dir: str, k: int = PCA_K) -> tuple[np.ndarray, np.ndarray]:
    """Distributed model fit: per-batch integer moment partials exploded
    to (key, v) rows -> ONE tiny groupby(key) sum (<= d^2 + d + 1 rows
    reach the driver, independent of corpus size)."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        m = _list_matrix(t.column("embedding"), len(t))
        q = np.rint(m * PCA_SCALE).astype(np.int64)
        d = q.shape[1]
        ss = q.T @ q
        sq = q.sum(axis=0)
        key = np.concatenate([np.arange(d * d, dtype=np.int64),
                              d * d + np.arange(d, dtype=np.int64),
                              [d * d + d]])
        v = np.concatenate([ss.ravel(), sq, [len(t)]])
        return pa.table({"key": pa.array(key), "v": pa.array(v)})

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
           .groupby("key").aggregate(Sum("v", alias_name="s"))).to_pandas()
    keys = agg["key"].to_numpy()
    vals = agg["s"].to_numpy().astype(np.int64)
    top = int(keys.max())
    d = int(round((top - 1) ** 0.5)) if top > 1 else 0
    # top = d*d + d -> solve d
    d = int((-1 + (1 + 4 * top) ** 0.5) / 2)
    flat = np.zeros(d * d + d + 1, np.int64)
    flat[keys] = vals
    ss = flat[:d * d].reshape(d, d)
    sq = flat[d * d:d * d + d]
    n = int(flat[-1])
    return pca_components(sq, ss, n, k)


def q_embedding_pca(sf_dir: str, k: int = PCA_K) -> rd.Dataset:
    """Per-vector projection onto the corpus's top-k principal
    components: (vec_id, pc1, pc2) f32.  Scale shape: one integer-exact
    moment pass (tiny groupby), one broadcast of the (d, k) model, one
    streaming projection pass."""
    mean, comps = pca_model(sf_dir, k)
    ref = broadcast((mean, comps))
    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"])

    def project(t: pa.Table) -> pa.Table:
        mu, c = ray.get(ref)
        ids, emb = _batch_matrix(t)
        y = (emb - mu) @ c
        return pa.table({
            "vec_id": pa.array(ids.astype(np.int64)),
            "pc1": pa.array(y[:, 0].astype(np.float32)),
            "pc2": pa.array(y[:, 1].astype(np.float32)),
        })

    return ds.map_batches(project, batch_format="pyarrow", batch_size=4096)

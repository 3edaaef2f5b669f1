"""Distributed connected components + cluster-level dedup.

Pair-level near-dup output (dedup.py / similarity.py) answers "which
documents are similar"; production dedup needs the CLUSTER view — keep
one representative per connected component of the similarity graph.

``connected_components`` is iterative min-label propagation expressed in
Ray Dataset ops (the standard MapReduce connected-components shape), with
a POINTER-JUMPING round after every edge round so label paths compress
multiplicatively — iterations scale O(log diameter), not O(diameter)
(long similarity chains, e.g. chained near-dups at threshold 0.9, would
otherwise need diameter rounds):

    labels(node) <- node                                   # init
    repeat:
        # edge round — one keyed shuffle co-locates each node's label
        # with its out-edges (coarse hash shards + local sorted-array
        # join — the same shard-group pattern as the LSH bucket stages;
        # Dataset.join is avoided deliberately: joining a union+groupby
        # lineage trips Ray's empty-schema partition handling):
        labels = min-label round over   graph edges
        # pointer round — same machinery over the label graph itself
        # (label(v) -> v), i.e. label(v) <- label(label(v)):
        labels = min-label round over   pointer edges
    until the label sum stops changing (monotone non-increasing, so the
    fixpoint test is exact).

The driver holds only the convergence scalar — edges and labels stay
distributed.  Non-convergence within ``max_iters`` RAISES (a warning
would silently return split components and downstream dedup would keep
extra "representatives").  ``q_jaccard_dedup_clusters`` runs it over the
EXACT Jaccard pair graph, so the whole operator is SQL-checkable against
a DuckDB recursive-CTE closure (see ``__ray_entry__.oracle_sql``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Min, Sum

from ..sources.tables import read_table


def _shard_of(keys: np.ndarray, n_shards: int) -> np.ndarray:
    return ((keys.astype(np.uint64) * np.uint64(0x9E3779B1)) %
            np.uint64(2**32) % np.uint64(n_shards)).astype(np.int32)


def connected_components(
    edges: rd.Dataset,
    nodes: rd.Dataset,
    max_iters: int = 50,
) -> rd.Dataset:
    """(node:int64, cluster_id:int64) — min node id of each component.

    ``edges``: columns (a, b) int64, undirected (either orientation);
    ``nodes``: column (node) int64 — every node, including isolated ones
    (they map to themselves).

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iters`` double rounds (with pointer jumping that is ~log2 of
    the largest component diameter — 50 covers any realistic graph).
    """
    from ..sources.scale import shuffle_width

    def init_labels(batch: pa.Table) -> pa.Table:
        n = batch.column("node").cast(pa.int64())
        return pa.table({"node": n, "label": n})

    labels = nodes.map_batches(init_labels,
                               batch_format="pyarrow").materialize()
    n_nodes = labels.count()
    n_shards = shuffle_width(n_rows=n_nodes, rows_per_shard=262144)

    def to_edge_rows(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy().astype(np.int64)
        b = batch.column("b").to_numpy().astype(np.int64)
        key = np.concatenate([a, b])   # symmetric: both directions
        val = np.concatenate([b, a])
        return pa.table({
            "shard": pa.array(_shard_of(key, n_shards)),
            "key": pa.array(key),
            "val": pa.array(val),
            "is_label": pa.array(np.zeros(len(key), dtype=np.int8)),
        })

    edge_rows = edges.map_batches(to_edge_rows,
                                  batch_format="pyarrow").materialize()

    def to_label_rows(batch: pa.Table) -> pa.Table:
        if "node" not in batch.column_names:  # empty-schema block
            z = pa.array([], pa.int64())
            return pa.table({"shard": pa.array([], pa.int32()), "key": z,
                             "val": z,
                             "is_label": pa.array([], pa.int8())})
        node = batch.column("node").to_numpy().astype(np.int64)
        return pa.table({
            "shard": pa.array(_shard_of(node, n_shards)),
            "key": pa.array(node),
            "val": batch.column("label").cast(pa.int64()),
            "is_label": pa.array(np.ones(len(node), dtype=np.int8)),
        })

    def to_pointer_rows(batch: pa.Table) -> pa.Table:
        """Label graph as edges: (key=label(v), val=v) — the message
        "v, adopt label(label(v))" of the pointer-jumping round.  Label
        values are node ids, so every key has its label row co-sharded."""
        if "node" not in batch.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"shard": pa.array([], pa.int32()), "key": z,
                             "val": z,
                             "is_label": pa.array([], pa.int8())})
        node = batch.column("node").to_numpy().astype(np.int64)
        lab = batch.column("label").to_numpy().astype(np.int64)
        m = lab != node  # self-pointers carry no information
        key, val = lab[m], node[m]
        return pa.table({
            "shard": pa.array(_shard_of(key, n_shards)),
            "key": pa.array(key),
            "val": pa.array(val),
            "is_label": pa.array(np.zeros(len(key), dtype=np.int8)),
        })

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        """One shard: local key->label map, emit labels + per-edge
        messages (neighbor, label_of_source)."""
        is_lab = g["is_label"].to_numpy() == 1
        keys = g["key"].to_numpy().astype(np.int64)
        vals = g["val"].to_numpy().astype(np.int64)
        lab_keys, lab_vals = keys[is_lab], vals[is_lab]
        # every edge key has its label row in this shard (same key ->
        # same shard); map via sorted lookup:
        order = np.argsort(lab_keys)
        sk, sv = lab_keys[order], lab_vals[order]
        ek, ev = keys[~is_lab], vals[~is_lab]
        src_label = sv[np.searchsorted(sk, ek)] if len(ek) else ek
        return pd.DataFrame({
            "node": np.concatenate([lab_keys, ev]),
            "label": np.concatenate([lab_vals, src_label]),
        })

    def min_label_round(labels: rd.Dataset,
                        extra_rows: rd.Dataset) -> rd.Dataset:
        rows = labels.map_batches(to_label_rows,
                                  batch_format="pyarrow").union(extra_rows)
        msgs = rows.groupby("shard").map_groups(propagate,
                                                batch_format="pandas")
        return (msgs.groupby("node")
                .aggregate(Min("label", alias_name="label"))
                .materialize())

    prev_sum = None
    for _ in range(max_iters):
        # graph round, then pointer-jump round over the fresh labels:
        labels = min_label_round(labels, edge_rows)
        labels = min_label_round(
            labels, labels.map_batches(to_pointer_rows,
                                       batch_format="pyarrow"))
        cur = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if prev_sum is not None and cur == prev_sum:  # exact fixpoint:
            break  # label sum is monotone non-increasing
        prev_sum = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "double rounds — component diameter exceeds 2^iters; raise "
            "max_iters")

    def finish(t: pa.Table) -> pa.Table:
        if "node" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"node": z, "cluster_id": z})
        return pa.table({"node": t.column("node").cast(pa.int64()),
                         "cluster_id": t.column("label").cast(pa.int64())})

    return labels.map_batches(finish, batch_format="pyarrow")


def q_jaccard_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Cluster-level dedup over the exact near-dup graph: every document
    labeled with its component's min doc_id (singletons map to self).
    Output: (doc_id, cluster_id) — 'keep' set = rows where they match."""
    from .dedup import q_jaccard_dup_pairs

    pairs = q_jaccard_dup_pairs(sf_dir)
    edges = rd.from_arrow(pa.table({
        "a": pa.array(pairs["doc_id_a"].to_numpy(), pa.int64()),
        "b": pa.array(pairs["doc_id_b"].to_numpy(), pa.int64()),
    }))
    nodes = (read_table(sf_dir, "documents", ["doc_id"])
             .map_batches(lambda t: pa.table({"node": t.column("doc_id")}),
                          batch_format="pyarrow"))
    comp = connected_components(edges, nodes)
    out = comp.to_pandas().rename(columns={"node": "doc_id"})
    return (out.astype({"doc_id": np.int64, "cluster_id": np.int64})
            .sort_values("doc_id").reset_index(drop=True))

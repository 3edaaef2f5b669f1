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
        # ONE fused round — a single keyed shuffle co-locates each
        # node's label with its out-edges AND its pointer edge
        # (label(v) -> v), so neighbor propagation and path compression
        # share the shuffle (coarse hash shards + local sorted-array
        # join — the same shard-group pattern as the LSH bucket stages;
        # Dataset.join is avoided deliberately: joining a union+groupby
        # lineage trips Ray's empty-schema partition handling):
        label(v) <- min(label(v), min_{u~v} label(u), label(label(v)))
    until the label sum stops changing (monotone non-increasing, so the
    fixpoint test is exact; the scalar is a task-pool partial sum, not
    another all-to-all).

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
from ray.data.aggregate import Min

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
    ``max_iters`` rounds (with the fused pointer-jump update that is
    ~log2 of the largest component diameter — 50 covers any realistic
    graph).
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

    def min_label_round(labels: rd.Dataset) -> rd.Dataset:
        """One FUSED round: label'(v) = min(label(v), min over neighbor
        labels, label(label(v))).  Edge messages and pointer-jump
        messages resolve against the same per-shard label map, so the
        neighbor-propagation and path-compression updates share ONE
        keyed shuffle + ONE min-aggregate instead of two of each (the
        round count stays O(log diameter); per-round all-to-all cost
        halves, which dominates wall time)."""
        rows = (labels.map_batches(to_label_rows, batch_format="pyarrow")
                .union(edge_rows,
                       labels.map_batches(to_pointer_rows,
                                          batch_format="pyarrow")))
        msgs = rows.groupby("shard").map_groups(propagate,
                                                batch_format="pandas")
        # repartition caps the label block count at n_shards: without it
        # every round's union+shuffle output inherits the SUM of its
        # input block counts, so blocks (and per-task fixed overhead)
        # grow geometrically with the round number — the coalesce is a
        # metadata-level split, not another all-to-all:
        return (msgs.groupby("node")
                .aggregate(Min("label", alias_name="label"))
                .repartition(n_shards)
                .materialize())

    def label_sum(labels: rd.Dataset) -> int:
        """Convergence scalar via per-batch partial sums on the already
        materialized label table — a task-pool pass, not another
        all-to-all ``aggregate``."""
        import pyarrow.compute as pc

        def part(t: pa.Table) -> pa.Table:
            s = (pc.sum(t["label"]).as_py() or 0
                 if "label" in t.column_names else 0)
            return pa.table({"s": pa.array([s], pa.int64())})

        return int(labels.map_batches(part, batch_format="pyarrow")
                   .to_pandas()["s"].sum())

    prev_sum = None
    for _ in range(max_iters):
        labels = min_label_round(labels)
        cur = label_sum(labels)
        if prev_sum is not None and cur == prev_sum:  # exact fixpoint:
            break  # label sum is monotone non-increasing
        prev_sum = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "rounds — component diameter exceeds 2^iters; raise "
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
    comp = _dedup_components(sf_dir)
    out = comp.to_pandas().rename(columns={"node": "doc_id"})
    return (out.astype({"doc_id": np.int64, "cluster_id": np.int64})
            .sort_values("doc_id").reset_index(drop=True))


def _dedup_components(sf_dir: str) -> rd.Dataset:
    """(node, cluster_id) components of the exact-Jaccard >= 0.9 graph
    over every document (shared by the cluster and survivor queries)."""
    from .dedup import q_jaccard_dup_pairs

    pairs = q_jaccard_dup_pairs(sf_dir)
    edges = rd.from_arrow(pa.table({
        "a": pa.array(pairs["doc_id_a"].to_numpy(), pa.int64()),
        "b": pa.array(pairs["doc_id_b"].to_numpy(), pa.int64()),
    }))
    nodes = (read_table(sf_dir, "documents", ["doc_id"])
             .map_batches(lambda t: pa.table({"node": t.column("doc_id")}),
                          batch_format="pyarrow"))
    return connected_components(edges, nodes)


def q_doc_dedup_near_corpus(sf_dir: str) -> rd.Dataset:
    """The MATERIALIZED output of near-dup dedup: every document that
    survives cluster-level removal (representative = min doc_id per
    connected component of the similarity graph; singletons survive
    trivially), with content stats for downstream lineage.
    Output: (doc_id, n_chars, text_md5), one row per kept document.

    Scale shape: components stay a distributed Dataset end-to-end — the
    survivor ids (node == cluster_id) are filtered per batch, documents
    are reduced to (doc_id, n_chars, md5) inside ``map_batches``, and the
    two sides meet in ONE hash shuffle join keyed on doc_id.  No driver
    set and no broadcast: the survivor side is ~the whole corpus (most
    docs are unique), so a broadcast semi-join would be wrong here —
    unlike relational.py's Semi/Anti whose key sets are dimension-sized.
    The pair graph comes from ``q_jaccard_dup_pairs`` (the exact,
    oracle-anchored variant); at real scale swap in
    ``q_minhash_lsh_pairs`` — the downstream plan is identical."""
    import hashlib

    import pyarrow.compute as pc

    from ..sources.scale import join_width, table_num_rows

    comp = _dedup_components(sf_dir)

    def reps(t: pa.Table) -> pa.Table:
        kept = t.filter(pc.equal(t["node"], t["cluster_id"]))
        return pa.table({"keep_id": kept.column("node")})

    survivors = comp.map_batches(reps, batch_format="pyarrow")

    def stats(t: pa.Table) -> pa.Table:
        digests = [hashlib.md5(x.encode("utf-8")).hexdigest()
                   for x in t.column("text").to_pylist()]
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_chars": pc.utf8_length(t["text"]).cast(pa.int64()),
            "text_md5": pa.array(digests, pa.string()),
        })

    docs = read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow", batch_size=8192)
    width = join_width(table_num_rows(sf_dir, "documents"))
    joined = docs.join(survivors, join_type="inner", num_partitions=width,
                       on=("doc_id",), right_on=("keep_id",))
    return joined.select_columns(["doc_id", "n_chars", "text_md5"])


# ---------------------------------------------------------------------------
# Fixed-point PageRank over the near-dup similarity graph — the
# iterative NUMERIC graph algorithm (centrality for representative /
# curation weighting), bit-deterministic by construction: scores are
# int64 at scale PR_SCALE, damping 17/20 is applied as integer
# multiply-then-floor-divide, and every per-iteration reduction is an
# order-free integer SUM — so the distributed result equals the
# oracle's unrolled-SQL replay exactly, with no float summation-order
# caveats (the embedding-PCA trick applied to graph iteration).
#
# Update rule per iteration (all ops int64, in this exact order):
#   base      = (3*S) // (20*n)
#   inflow(v) = sum over in-edges (u,v) of r(u) // outdeg(u)
#   dangling  = sum of r(u) over nodes with no out-edges
#   r'(v)     = base + (17 * (inflow(v) + dangling // n)) // 20
#
# Edges: the exact-Jaccard near-dup pairs (shared spec with
# `jaccard_dup_pairs`, both directions).  The edge table is the
# oracle-anchored exact variant (driver-small); the ITERATION is fully
# distributed — scores live in a Dataset, each round is one
# contribution exchange + one scalar aggregate, checkpointed like the
# connected-components rounds — and works unchanged over any edge
# Dataset (e.g. the MinHash-LSH pairs at scale).
# ---------------------------------------------------------------------------

PR_SCALE = 10**12
PR_ITERS = 5


def q_doc_pagerank(sf_dir: str, n_iters: int = PR_ITERS) -> rd.Dataset:
    """Integer-exact PageRank after ``n_iters`` rounds:
    ``(doc_id, rank_fp)`` with ``rank_fp`` the fixed-point score at
    scale ``PR_SCALE``."""
    from collections import defaultdict

    from ray.data.aggregate import Sum

    from ..pipelines.dedup import q_jaccard_dup_pairs
    from ..sources.scale import table_num_rows
    from ..sources.tables import broadcast

    pairs = q_jaccard_dup_pairs(sf_dir)
    adj: dict = defaultdict(list)
    for a, b in zip(pairs["doc_id_a"].to_numpy(np.int64),
                    pairs["doc_id_b"].to_numpy(np.int64)):
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    adj = dict(adj)
    ref = broadcast(adj)

    n = table_num_rows(sf_dir, "documents")
    base = (3 * PR_SCALE) // (20 * n)
    r0 = PR_SCALE // n

    docs = read_table(sf_dir, "documents", ["doc_id"])

    def init(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.array(t.column("doc_id").to_numpy()
                             .astype(np.int64)),
            "r": pa.array(np.full(len(t), r0, np.int64)),
        })

    scores = docs.map_batches(init, batch_format="pyarrow",
                              batch_size=65536).materialize()

    import pyarrow.compute as pc
    import ray

    SENT = np.int64(-(2**62))  # dangling-mass accumulator "node"

    def contribs(t: pa.Table, _adj=ref) -> pa.Table:
        # One pass does double duty: contribution rows for linked
        # nodes, a zero row keeping every node present, and the
        # batch's dangling mass routed to the SENT key — so the single
        # groupby exchange also reduces the dangling scalar (no second
        # corpus scan, no per-row membership pass).
        a = ray.get(_adj)
        nodes = t.column("node").to_numpy()
        r = t.column("r").to_numpy()
        out_n, out_c = [], []
        dangling = 0
        for v, rv in zip(nodes, r):
            out_n.append(int(v))   # keep every node present
            out_c.append(0)
            nbrs = a.get(int(v))
            if nbrs:
                c = int(rv) // len(nbrs)
                for u in nbrs:
                    out_n.append(u)
                    out_c.append(c)
            else:
                dangling += int(rv)
        out_n.append(int(SENT))
        out_c.append(dangling)
        return pa.table({"node": pa.array(out_n, pa.int64()),
                         "c": pa.array(out_c, pa.int64())})

    for _ in range(n_iters):
        agg = (scores.map_batches(contribs, batch_format="pyarrow",
                                  batch_size=65536)
               .groupby("node").aggregate(Sum("c", alias_name="inflow"))
               .materialize())
        dangling = sum(
            b.column("inflow").to_numpy().sum()
            for b in agg.map_batches(
                lambda t: t.filter(pc.equal(t["node"], SENT)),
                batch_format="pyarrow",
                batch_size=65536).iter_batches(batch_format="pyarrow"))
        share = int(dangling) // n

        def apply_rule(t: pa.Table, _share=share) -> pa.Table:
            t = t.filter(pc.not_equal(t["node"], SENT))
            inflow = t.column("inflow").to_numpy()
            r_new = base + (17 * (inflow + _share)) // 20
            return pa.table({"node": t.column("node"),
                             "r": pa.array(r_new.astype(np.int64))})

        scores = agg.map_batches(apply_rule, batch_format="pyarrow",
                                 batch_size=65536)
    scores = scores.materialize()

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("node"),
                         "rank_fp": t.column("r")})

    return scores.map_batches(rename, batch_format="pyarrow",
                              batch_size=65536)


def pagerank_sql(n_iters: int = PR_ITERS) -> str:
    """Unrolled-iteration DuckDB restatement of ``q_doc_pagerank`` —
    identical integer op order per round (DuckDB ``//`` is BIGINT
    floor division, matching numpy int64).

    Every CTE is ``AS MATERIALIZED``: DuckDB inlines plain CTEs at
    each reference, and round k+1 references r{k} three times — plain
    CTEs therefore re-evaluate the whole chain 3^k times (~65x slower
    at 5 rounds, measured)."""
    S = PR_SCALE
    head = r"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id,
               unnest(list_distinct(regexp_split_to_array(trim(text),
                                                          '\s+'))) AS w
        FROM documents WHERE trim(text) <> ''),
    sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS MATERIALIZED (
        SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared
        FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    jpairs AS MATERIALIZED (
        SELECT i.da, i.db FROM inter i
        JOIN sizes sa ON sa.doc_id = i.da
        JOIN sizes sb ON sb.doc_id = i.db
        WHERE CAST(i.shared AS DOUBLE)
                  / CAST(sa.n + sb.n - i.shared AS DOUBLE) >= 0.9),
    edges AS MATERIALIZED (SELECT da AS src, db AS dst FROM jpairs
              UNION ALL SELECT db, da FROM jpairs),
    deg AS MATERIALIZED (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    nn AS MATERIALIZED (SELECT COUNT(*) AS c FROM documents),
    """ + f"""
    r0 AS MATERIALIZED (SELECT doc_id AS node, {S} // c AS r FROM documents, nn)"""
    blocks = []
    for k in range(1, n_iters + 1):
        p = k - 1
        blocks.append(f""",
    inf{k} AS MATERIALIZED (SELECT e.dst AS node, SUM(r.r // deg.d) AS s
               FROM edges e JOIN r{p} r ON r.node = e.src
               JOIN deg ON deg.src = e.src GROUP BY e.dst),
    dang{k} AS MATERIALIZED (SELECT COALESCE(SUM(r.r), 0) AS m FROM r{p} r
                LEFT JOIN deg ON deg.src = r.node
                WHERE deg.src IS NULL),
    r{k} AS MATERIALIZED (SELECT d.node,
                    (3*{S}) // (20*c)
                    + (17*(COALESCE(i.s, 0) + g.m // c)) // 20 AS r
             FROM r{p} d CROSS JOIN nn CROSS JOIN dang{k} g
             LEFT JOIN inf{k} i ON i.node = d.node)""")
    tail = f"""
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(r AS BIGINT) AS rank_fp
    FROM r{n_iters}
    """
    return head + "".join(blocks) + tail

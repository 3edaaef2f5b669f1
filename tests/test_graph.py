"""Distributed connected components (pipelines/graph.py): hand-built
graphs + the cluster-dedup invariants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _cc(edge_pairs, node_ids):
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.pipelines.graph import (
        connected_components)

    edges = rd.from_arrow(pa.table({
        "a": pa.array([a for a, _ in edge_pairs], pa.int64()),
        "b": pa.array([b for _, b in edge_pairs], pa.int64()),
    }))
    nodes = rd.from_arrow(pa.table({"node": pa.array(node_ids, pa.int64())}))
    out = connected_components(edges, nodes).to_pandas()
    return dict(zip(out["node"], out["cluster_id"]))


def test_components_hand_graph(ray_session):
    # two chains + a singleton; min id labels each component
    labels = _cc([(5, 3), (3, 9), (20, 21)], [3, 5, 9, 20, 21, 40])
    assert labels == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 40: 40}


def test_components_long_chain(ray_session):
    # a path graph needs ~diameter iterations — exercises the loop
    n = 12
    edges = [(i, i + 1) for i in range(n - 1)]
    labels = _cc(edges, list(range(n)))
    assert all(labels[i] == 0 for i in range(n))


def test_components_chain_beyond_plain_propagation(ray_session):
    # diameter 200 >> max_iters=50: plain min-label propagation cannot
    # converge; the pointer-jumping round makes it O(log diameter)
    n = 201
    edges = [(i, i + 1) for i in range(n - 1)]
    labels = _cc(edges, list(range(n)))
    assert all(labels[i] == 0 for i in range(n))


def test_components_nonconvergence_raises(ray_session):
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.pipelines.graph import (
        connected_components)

    n = 40
    edges = rd.from_arrow(pa.table({
        "a": pa.array(list(range(n - 1)), pa.int64()),
        "b": pa.array(list(range(1, n)), pa.int64()),
    }))
    nodes = rd.from_arrow(pa.table(
        {"node": pa.array(list(range(n)), pa.int64())}))
    with pytest.raises(RuntimeError, match="did not converge"):
        # 1 double round cannot close a 40-chain (needs ~log2(40)+1):
        connected_components(edges, nodes, max_iters=1).to_pandas()


def test_components_no_edges(ray_session):
    labels = _cc([], [7, 8])
    assert labels == {7: 7, 8: 8}


def test_dedup_clusters_invariants(ray_session):
    from amazon_textract_transformer_pipeline_ray.pipelines.dedup import (
        q_jaccard_dup_pairs)
    from amazon_textract_transformer_pipeline_ray.pipelines.graph import (
        q_jaccard_dedup_clusters)

    sf = "/root/testdata/sf0.001"
    clusters = q_jaccard_dedup_clusters(sf)
    pairs = q_jaccard_dup_pairs(sf)
    label = dict(zip(clusters["doc_id"], clusters["cluster_id"]))
    # every doc labeled, label is a member <= doc
    assert (clusters["cluster_id"] <= clusters["doc_id"]).all()
    assert set(clusters["cluster_id"]).issubset(set(clusters["doc_id"]))
    # both endpoints of every dup pair share a cluster
    for a, b in zip(pairs["doc_id_a"], pairs["doc_id_b"]):
        assert label[a] == label[b]
    # keep-set size == number of distinct clusters
    keep = clusters[clusters["doc_id"] == clusters["cluster_id"]]
    assert len(keep) == clusters["cluster_id"].nunique()


def test_dedup_near_corpus_partition(ray_session):
    """Survivor table == documents restricted to cluster representatives,
    and its stats columns are faithful to the raw text."""
    import hashlib

    import pandas as pd

    from amazon_textract_transformer_pipeline_ray.pipelines.graph import (
        q_doc_dedup_near_corpus, q_jaccard_dedup_clusters)

    sf = "/root/testdata/sf0.001"
    kept = q_doc_dedup_near_corpus(sf).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    clusters = q_jaccard_dedup_clusters(sf)
    reps = clusters[clusters["doc_id"] == clusters["cluster_id"]]["doc_id"]
    assert list(kept["doc_id"]) == sorted(reps)

    docs = pd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"]).set_index("doc_id")
    for _, row in kept.iterrows():
        text = docs.loc[row["doc_id"], "text"]
        assert row["n_chars"] == len(text)
        assert row["text_md5"] == hashlib.md5(text.encode()).hexdigest()

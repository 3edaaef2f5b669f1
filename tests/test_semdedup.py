"""SemDeDup tests: crafted clusters with known duplicates, first-wins
survivor rule, and sizing."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from amazon_textract_transformer_pipeline_ray.pipelines.similarity import (
    q_embedding_semdedup,
    semdedup_lists,
)


def _write(tmp_path, ids, vecs):
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(ids), pa.int32()),
    })
    pq.write_table(t, os.path.join(tmp_path, "embeddings.parquet"))
    return str(tmp_path)


def test_semdedup_lists_sizing():
    assert semdedup_lists(500) == 16
    assert semdedup_lists(100_000) == 97
    # grows with the table so per-cluster quadratic stays ~1024 rows;
    # hard cap keeps the driver-side centroid fit bounded
    assert semdedup_lists(10**6) == 976
    assert semdedup_lists(10**9) == 65536


def test_semdedup_first_wins(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    d = 16
    # two far-apart anchor directions + jittered copies (near-dups)
    a = rng.standard_normal(d)
    b = rng.standard_normal(d)
    b -= a * (a @ b) / (a @ a)  # orthogonalize -> cosine(a,b) ~ 0
    vecs, ids = [], []
    for i in range(40):
        base = a if i % 2 == 0 else b
        vecs.append(base + rng.standard_normal(d) * 1e-4)  # cos ~ 1
        ids.append(i)
    # plus distinct random vectors that should all be kept
    for i in range(40, 60):
        vecs.append(rng.standard_normal(d))
        ids.append(i)
    sf = _write(tmp_path, ids, vecs)
    # n_lists=2: one centroid per anchor family.  (At the default
    # sizing, k-means places SEVERAL centroids inside a dense family
    # and splits it — SemDeDup's documented recall loss, not a bug.)
    got = (q_embedding_semdedup(sf, n_lists=2).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert len(got) == 60
    # jittered copies: exactly one survivor per anchor family IF the
    # family landed in one cluster (it must: cosine within family ~1,
    # so argmax centroid agrees); survivors are the smallest ids 0, 1
    fam_a = got[got.vec_id % 2 == 0].iloc[:20]
    fam_b = got[got.vec_id % 2 == 1].iloc[:20]
    assert fam_a.keep.sum() == 1 and fam_a.iloc[0].keep == 1
    assert fam_b.keep.sum() == 1 and fam_b.iloc[0].keep == 1
    # random vectors: cosine concentrated near 0 in 16-d -> all kept
    assert (got[got.vec_id >= 40].keep == 1).all()
    # cluster assignment consistent: dup rows share their survivor's
    # cluster
    for fam in (fam_a, fam_b):
        assert fam.cluster_id.nunique() == 1


def test_semdedup_threshold_respected(ray_session, tmp_path):
    # identical vectors dup; orthogonal vectors not
    e = np.eye(4)
    sf = _write(tmp_path, [0, 1, 2, 3], [e[0], e[0], e[1], e[2]])
    got = (q_embedding_semdedup(sf).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert got.keep.tolist() == [1, 0, 1, 1]


def test_cluster_stats_consistent_with_semdedup(ray_session):
    """cluster_stats and semdedup share the centroid spec: per-cluster
    member counts must agree, sims must sit in [-1, 1], and min <=
    mean <= max."""
    from amazon_textract_transformer_pipeline_ray.pipelines.similarity import (
        q_embedding_cluster_stats, q_embedding_semdedup)

    sf = "/root/testdata/sf0.001"
    stats = (q_embedding_cluster_stats(sf).to_pandas()
             .sort_values("cluster_id").reset_index(drop=True))
    sd = q_embedding_semdedup(sf).to_pandas()
    counts = (sd.groupby("cluster_id").size().rename("n_sd")
              .reset_index().sort_values("cluster_id")
              .reset_index(drop=True))
    m = stats.merge(counts, on="cluster_id", how="outer")
    assert not m.isna().any().any()
    assert (m.n == m.n_sd).all()
    assert int(m.n.sum()) == len(sd)
    assert ((m.min_sim <= m.mean_sim + 1e-6)
            & (m.mean_sim <= m.max_sim + 1e-6)).all()
    assert (m.max_sim <= 1.0 + 1e-6).all() and (m.min_sim >= -1.0 - 1e-6).all()

"""Approximate-method quality gates: the LSH / IVF / SimHash variants are
rows-only in the driver's oracle check, so their quality is asserted here
against the exact counterparts at sf0.01."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def exact_knn(ray_session):
    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    return similarity.q_embedding_knn(SF)


def _recall(approx: pd.DataFrame, exact: pd.DataFrame) -> float:
    ex = {(q, n) for q, n in zip(exact["query_id"], exact["neighbor_id"])}
    ap = {(q, n) for q, n in zip(approx["query_id"], approx["neighbor_id"])}
    return len(ap & ex) / len(ex)


def test_ivf_recall(ray_session, exact_knn):
    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    approx = similarity.q_embedding_knn_ivf(SF)
    assert _recall(approx, exact_knn) >= 0.5, "IVF nprobe=4/16 recall too low"
    # Shape contract: same columns, ranks 1..k per query
    assert list(approx.columns) == ["query_id", "rank", "neighbor_id"]


def test_lsh_recall(ray_session, exact_knn):
    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    approx = similarity.q_embedding_knn_lsh(SF)
    assert _recall(approx, exact_knn) >= 0.3, "hyperplane-LSH recall too low"


def test_ivf_deterministic(ray_session):
    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    a = similarity.q_embedding_knn_ivf(SF)
    b = similarity.q_embedding_knn_ivf(SF)
    pd.testing.assert_frame_equal(a, b)


def test_minhash_finds_exact_jaccard_pairs(ray_session):
    """LSH banding at t=0.9 must recover the overwhelming majority of
    exact pairs (P[miss] = (1-t^4)^16 ~ 0.2% per pair at t=0.9)."""
    from amazon_textract_transformer_pipeline_ray.pipelines import dedup

    exact = dedup.q_jaccard_dup_pairs(SF)
    lsh = dedup.q_minhash_lsh_pairs(SF)
    ex = {(a, b) for a, b in zip(exact["doc_id_a"], exact["doc_id_b"])}
    ap = {(a, b) for a, b in zip(lsh["doc_id_a"], lsh["doc_id_b"])}
    if ex:
        assert len(ap & ex) / len(ex) >= 0.8
    # verification step guarantees no false positives:
    assert ap <= ex | ap  # (sanity) all LSH pairs verified >= threshold
    for j in lsh["jaccard"]:
        assert j >= dedup.JACCARD_THRESHOLD


def test_winnowing_guarantee(ray_session):
    """Any substring match of length >= W + K - 1 must share a
    fingerprint (the winnowing paper's detection guarantee)."""
    import numpy as np

    from amazon_textract_transformer_pipeline_ray.pipelines.dedup import (
        WINNOW_K, WINNOW_W, q_winnow_fingerprints, winnow_fingerprints)

    t = WINNOW_W + WINNOW_K - 1
    rng = np.random.default_rng(3)
    alphabet = list("abcdefgh ")
    for _ in range(20):
        shared = "".join(rng.choice(alphabet, t + 10))
        pa_, pb = ("".join(rng.choice(alphabet, 30)) for _ in range(2))
        fa = winnow_fingerprints(pa_ + shared)
        fb = winnow_fingerprints(pb + shared + "tail")
        assert len(np.intersect1d(fa, fb)) > 0

    out = q_winnow_fingerprints(SF)
    df = out.to_pandas()
    assert len(df) == 500 and (df["n_fingerprints"] > 0).all()


def test_embedding_dup_lsh_recall(ray_session):
    """LSH-bucketed near-dup recall vs the exact blockwise variant, at a
    threshold low enough that the synthetic corpus contains pairs."""
    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    thr = 0.45
    exact = similarity.q_embedding_dup_pairs(SF, threshold=thr)
    approx = similarity.q_embedding_dup_pairs_lsh(SF, threshold=thr)
    ex = {(a, b) for a, b in zip(exact["vec_id_a"], exact["vec_id_b"])}
    ap = {(a, b) for a, b in zip(approx["vec_id_a"], approx["vec_id_b"])}
    assert ex, "test corpus should contain pairs at this threshold"
    assert ap <= ex  # exact verification -> no false positives
    assert len(ap & ex) / len(ex) >= 0.5


def test_batch_token_kernels_equal_scalar_spec():
    """The vectorized batch kernels (_batch_token_runs/_minhash_batch/
    _simhash_batch) must equal the scalar spec functions doc-for-doc —
    including empty docs, whitespace-only docs and repeated tokens."""
    import numpy as np
    import pyarrow.parquet as pq

    from amazon_textract_transformer_pipeline_ray.pipelines.dedup import (
        _batch_token_runs, _minhash_batch, _simhash_batch, _token_hashes,
        _tokens, minhash_signature, simhash64)

    texts = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["text"]).column("text").to_pylist()[:120]
    texts += ["", "   ", "a a a b", "one-token"]
    hs, cnts, offs = _batch_token_runs(texts)
    sigs = _minhash_batch(hs, offs)
    sims = _simhash_batch(texts)
    from collections import Counter

    for i, t in enumerate(texts):
        seg = hs[offs[i]:offs[i + 1]]
        assert np.array_equal(seg, _token_hashes(t)), i
        # occurrence counts per distinct hash:
        got = dict(zip(seg.tolist(), cnts[offs[i]:offs[i + 1]].tolist()))
        if t.strip():
            exp = Counter()
            import pandas as pd_

            hh = pd_.util.hash_array(np.asarray(_tokens(t), dtype=object))
            for v in hh:
                exp[int(v)] += 1
            assert got == dict(exp), i
        assert np.array_equal(sigs[i], minhash_signature(_token_hashes(t))), i
        assert int(sims[i]) == simhash64(t), i


def test_distributed_lloyd_refines_sample_model(ray_session):
    """The cluster-scale trainer (full-table partial sums) stays
    exercised: refining the sample-trained model must keep every
    centroid unit-norm and not collapse lists."""
    import numpy as np

    from amazon_textract_transformer_pipeline_ray.pipelines import similarity
    from amazon_textract_transformer_pipeline_ray.sources.tables import (
        read_table)

    init = similarity.ivf_centroids(SF)
    ds = read_table(SF, "embeddings", ["vec_id", "embedding"])
    ref = similarity.train_ivf_lloyd_distributed(ds, init, iters=2)
    assert ref.shape == init.shape
    norms = np.linalg.norm(ref, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-9)
    # distinct lists survive refinement:
    assert len(np.unique(ref.round(6), axis=0)) == len(ref)


def test_gram_kernel_hand_computed():
    """_batch_gram_rows: doc boundaries masked, positions counted,
    totals clipped at zero."""
    from amazon_textract_transformer_pipeline_ray.pipelines.dedup import (
        NGRAM_N, _batch_gram_rows)

    assert NGRAM_N == 8
    a = "t0 t1 t2 t3 t4 t5 t6 t7 t8"       # 9 tokens -> grams @0,@1
    b = "t0 t1 t2 t3 t4 t5 t6 t7"          # 8 tokens -> the @0 gram again
    c = "t0 t1 t2 t3 t4 t5 t6 t7 " * 2     # b repeated -> @0 twice + mixes
    g, dix, npos, tot = _batch_gram_rows([a, b, "short", "", c])
    assert tot.tolist() == [2, 1, 0, 0, 9]
    # doc boundaries: no gram mixes two docs, so every c-gram comes from c
    assert int(npos.sum()) == 2 + 1 + 9
    # the shared leading gram appears in docs 0, 1 and (twice) 4
    import collections

    by_gram = collections.defaultdict(list)
    for gid, d, n in zip(g.tolist(), dix.tolist(), npos.tolist()):
        by_gram[gid].append((d, n))
    shared = [v for v in by_gram.values() if len(v) == 3]
    assert shared == [[(0, 1), (1, 1), (4, 2)]]


def test_dup_ngram_stats_small(ray_session):
    """Distributed stats over a tiny in-memory corpus, hand-checked."""
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile, os

    from amazon_textract_transformer_pipeline_ray.pipelines.dedup import (
        q_doc_dup_ngram_stats)

    with tempfile.TemporaryDirectory() as d:
        shared = "w0 w1 w2 w3 w4 w5 w6 w7"
        docs = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                shared + " tail1",      # grams @0 (shared), @1, @2
                shared,                 # gram @0 (shared)
                "u0 u1 u2 u3 u4 u5 u6 u7 u8",   # 2 unique grams
                "tiny",                          # no grams
            ]),
        })
        pq.write_table(docs, os.path.join(d, "documents.parquet"))
        out = (q_doc_dup_ngram_stats(d).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [1, 2, 3, 4]
        assert out["n_ngrams"].tolist() == [2, 1, 2, 0]
        assert out["n_dup_ngrams"].tolist() == [1, 1, 0, 0]
        assert out["dup_ratio"].tolist() == [0.5, 1.0, 0.0, 0.0]


def test_dedup_ngram_corpus_small(ray_session, tmp_path):
    """Removal pass over a tiny corpus, hand-checked: covered tokens
    dropped, untouched docs pass through byte-identically."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from amazon_textract_transformer_pipeline_ray.pipelines.dedup import (
        q_doc_dedup_ngram_corpus)

    shared = "w0 w1 w2 w3 w4 w5 w6 w7"          # one duplicated 8-gram
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "pre " + shared + " post",   # covered: the 8 shared tokens
            shared,                      # fully covered -> empty cleaned
            "u0 u1 u2 u3 u4 u5 u6 u7",   # unique gram -> untouched
        ]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (q_doc_dedup_ngram_corpus(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [10, 8, 8]
    assert out["n_removed"].tolist() == [8, 8, 0]
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out["cleaned_md5"].tolist() == [
        md5("pre post"), md5(""), md5("u0 u1 u2 u3 u4 u5 u6 u7")]


# ---------------------------------------------------------------- PCA

def _write_embeddings(tmp_path, m):
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "vec_id": pa.array(np.arange(len(m)), pa.int64()),
        "embedding": pa.array([row.astype(np.float32).tolist() for row in m],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(m), np.int32)),
    })
    pq.write_table(t, os.path.join(tmp_path, "embeddings.parquet"))
    return str(tmp_path)


def test_pca_recovers_dominant_axis(ray_session, tmp_path):
    """Data stretched 10x along a known direction: pc1 must align with
    it (|corr| ~ 1) and carry (much) more variance than pc2."""
    import numpy as np

    from amazon_textract_transformer_pipeline_ray.pipelines.similarity import (
        q_embedding_pca)

    rng = np.random.default_rng(3)
    d, n = 8, 400
    axis = np.zeros(d)
    axis[2] = 1.0
    coef = rng.normal(size=n)
    m = 0.05 * rng.normal(size=(n, d)) + np.outer(coef, axis) * 0.5
    sf = _write_embeddings(tmp_path, m)
    out = (q_embedding_pca(sf).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    corr = np.corrcoef(out.pc1, coef)[0, 1]
    assert abs(corr) > 0.99
    assert out.pc1.var() > 5 * out.pc2.var()


def test_pca_batchsize_invariant(ray_session, tmp_path):
    """Integer moment sums are arrival-order free: different batch
    sizes yield bit-identical components and projections."""
    import numpy as np

    from amazon_textract_transformer_pipeline_ray.pipelines.similarity import (
        PCA_SCALE, pca_components, q_embedding_pca)

    rng = np.random.default_rng(5)
    m = rng.normal(size=(300, 6))
    sf = _write_embeddings(tmp_path, m)
    a = (q_embedding_pca(sf).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (q_embedding_pca(sf).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    assert (a.pc1.to_numpy() == b.pc1.to_numpy()).all()
    assert (a.pc2.to_numpy() == b.pc2.to_numpy()).all()
    # and the spec itself is exact: driver-side single-shot recompute
    mm = np.array([np.asarray(r, np.float32) for r in
                   __import__("pyarrow.parquet", fromlist=["read_table"])
                   .read_table(sf + "/embeddings.parquet")
                   .column("embedding").to_pylist()], dtype=np.float64)
    q = np.rint(mm * PCA_SCALE).astype(np.int64)
    mean, comps = pca_components(q.sum(axis=0), q.T @ q, len(q))
    y = (mm - mean) @ comps
    assert (a.pc1.to_numpy() == y[:, 0].astype(np.float32)).all()


def test_jaccard_dense_budget_raises_loudly(ray_session, monkeypatch):
    """Beyond the dense-incidence budget the exact anchor must fail with
    a pointer to the LSH scale path, not OOM the driver."""
    import pytest

    from amazon_textract_transformer_pipeline_ray.pipelines import dedup

    monkeypatch.setattr(dedup, "JACCARD_DENSE_BUDGET_BYTES", 64)
    with pytest.raises(ValueError, match="q_minhash_lsh_pairs"):
        dedup.q_jaccard_dup_pairs(SF)


def test_jaccard_pair_budget_raises_loudly(ray_session, monkeypatch):
    """The O(n^2) crossing has its own cells budget (the dense-bytes
    budget alone passes a many-docs/small-vocab corpus whose crossing is
    quadratic-dominant — the sf1 scale proof measured 110x before this
    guard).  Beyond it the anchor must fail with the LSH pointer."""
    import pytest

    from amazon_textract_transformer_pipeline_ray.pipelines import dedup

    monkeypatch.setattr(dedup, "JACCARD_PAIR_BUDGET_CELLS", 4)
    with pytest.raises(ValueError, match="q_minhash_lsh_pairs"):
        dedup.q_jaccard_dup_pairs(SF)


def test_embedding_pair_budget_raises_loudly(ray_session, monkeypatch):
    """Same contract for the embedding exact anchor: beyond the n^2
    cells budget it must point at the LSH twin, before reading any
    embedding data."""
    import pytest

    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    monkeypatch.setattr(similarity, "EMBEDDING_PAIR_BUDGET_CELLS", 4)
    with pytest.raises(ValueError, match="q_embedding_dup_pairs_lsh"):
        similarity.q_embedding_dup_pairs(SF)

"""Domain-mixture resampling tests: rate math against a naive oracle on
a crafted corpus, plus the proportion-target property."""

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from amazon_textract_transformer_pipeline_ray.pipelines.corpus import (
    _domain_weight,
    q_doc_domain_mix,
)


def _write(tmp_path, sources):
    df = pd.DataFrame({
        "doc_id": range(len(sources)),
        "text": "x",
        "lang": "en",
        "source": sources,
        "n_chars": 1,
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _naive(sources):
    cnt = pd.Series(sources).value_counts()
    w = {s: _domain_weight(s) for s in cnt.index}
    k = min(cnt[s] / w[s] for s in cnt.index)
    out = []
    for i, s in enumerate(sources):
        r = w[s] * k / cnt[s]
        thr = "g" if r >= 1.0 else format(int(np.floor(r * 16 ** 8)), "08x")
        pref = hashlib.md5(str(i).encode()).hexdigest()[:8]
        out.append(int(pref < thr))
    return out


def test_domain_weight_formula():
    assert [_domain_weight(f"src{i}") for i in range(6)] == [1, 2, 3, 4, 1, 2]
    assert _domain_weight("weird") == 1.0


def test_mix_matches_naive(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    sources = [f"src{int(i)}" for i in rng.integers(0, 6, size=400)]
    sf = _write(tmp_path, sources)
    got = (q_doc_domain_mix(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.selected.tolist() == _naive(sources)


def test_limiting_domain_fully_kept_and_proportions(ray_session, tmp_path):
    # src3 (w=4) scarce -> it is the binding domain and keeps everything
    sources = ["src3"] * 40 + ["src0"] * 400 + ["src1"] * 400
    sf = _write(tmp_path, sources)
    got = q_doc_domain_mix(sf).to_pandas()
    per = got.groupby("source").selected.sum()
    assert per["src3"] == 40  # rate 1.0 -> sentinel threshold keeps all
    # targets: w/n_binding ratio -> src0 ~ 10, src1 ~ 20 (hash sampling
    # is binomial around the target; allow 3 sigma)
    for s, target in (("src0", 10.0), ("src1", 20.0)):
        sigma = np.sqrt(target)
        assert abs(per[s] - target) <= 3 * sigma + 1, (s, per[s], target)


def test_sample_k_deterministic_and_stable(ray_session, tmp_path):
    import hashlib

    from amazon_textract_transformer_pipeline_ray.pipelines.corpus import (
        q_doc_sample_k)

    sf = _write(tmp_path, ["src0"] * 300)
    got = q_doc_sample_k(sf, k=20).to_pandas()
    exp = sorted(((hashlib.md5(str(i).encode()).hexdigest(), i)
                  for i in range(300)))[:20]
    assert list(zip(got.h, got.doc_id)) == exp
    # growth stability: with MORE docs the sample is the top-20 of the
    # bigger pool — every member either survives or is displaced by a
    # smaller hash, never reshuffled
    sf2 = _write(tmp_path, ["src0"] * 500)
    got2 = q_doc_sample_k(sf2, k=20).to_pandas()
    assert set(got2.h) == {h for h, _ in sorted(
        ((hashlib.md5(str(i).encode()).hexdigest(), i)
         for i in range(500)))[:20]}


def test_weighted_sample_matches_naive_and_favors_weight(ray_session,
                                                         tmp_path):
    """Efraimidis-Spirakis rank vs a naive single-process replica, and
    the weighting property: with weights 1000 vs 1, heavy docs dominate
    the sample overwhelmingly."""
    import hashlib
    import math

    from amazon_textract_transformer_pipeline_ray.pipelines.corpus import (
        q_doc_weighted_sample)

    n = 400
    weights = [1000 if i % 4 == 0 else 1 for i in range(n)]
    df = pd.DataFrame({"doc_id": range(n), "text": "x", "lang": "en",
                       "source": "s", "n_chars": weights})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))

    def key(i, w):
        u = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) / 2.0**60
        return math.log(u) / w

    exp = sorted(((-key(i, w), i) for i, w in enumerate(weights)))[:24]
    got = q_doc_weighted_sample(str(tmp_path), k=24).to_pandas()
    assert got.doc_id.tolist() == [i for _, i in exp]
    # heavy docs are 25% of the corpus but should dominate the sample
    assert (got.doc_id % 4 == 0).mean() > 0.8

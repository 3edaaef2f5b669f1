"""Decontamination tests: hand-crafted corpus against a naive Python
oracle, plus broadcast-vs-shuffle plan equivalence."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from amazon_textract_transformer_pipeline_ray.pipelines.decontam import (
    EVAL_MOD,
    q_doc_decontaminate,
    q_doc_decontaminate_shuffled,
)

N = 8  # dedup.NGRAM_N


def _write_docs(tmp_path, texts_by_id):
    df = pd.DataFrame({
        "doc_id": list(texts_by_id),
        "text": [texts_by_id[i] for i in texts_by_id],
        "lang": "en", "source": "t",
    })
    df["n_chars"] = df.text.str.len()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _naive(texts_by_id):
    def grams(t):
        ts = t.split()
        return [tuple(ts[i:i + N]) for i in range(len(ts) - N + 1)]

    ev = {g for i, t in texts_by_id.items() if i % EVAL_MOD == 0
          for g in grams(t)}
    out = {}
    for i, t in texts_by_id.items():
        if i % EVAL_MOD == 0:
            continue
        gs = grams(t)
        nc = sum(1 for g in gs if g in ev)
        out[i] = (len(gs), nc)
    return out


@pytest.fixture
def corpus(tmp_path):
    words = [f"w{k}" for k in range(40)]
    eval_text = " ".join(words[:20])          # doc 0 and 20: eval
    leak8 = " ".join(words[4:12])             # an 8-gram inside eval_text
    texts = {
        0: eval_text,
        20: " ".join(words[20:33]),
        1: "totally fresh " + " ".join(words[30:40]),  # clean
        2: "prefix junk " + leak8 + " suffix junk",    # 1 contaminated gram
        3: leak8 + " " + leak8,                        # repeated leak
        4: "short doc",                                # no grams at all
        5: "",                                         # empty
        6: eval_text,                                  # full copy of eval
    }
    return _write_docs(tmp_path, texts), texts


def test_decontaminate_matches_naive(ray_session, corpus):
    sf_dir, texts = corpus
    exp = _naive(texts)
    got = q_doc_decontaminate(sf_dir).to_pandas().set_index("doc_id")
    assert sorted(got.index) == sorted(exp)
    for i, (n, nc) in exp.items():
        row = got.loc[i]
        assert (row.n_ngrams, row.n_contam) == (n, nc), (i, dict(row))
        assert row.keep == int(nc == 0)
        assert row.contam_ratio == (nc / n if n else 0.0)
    # sanity on the crafted cases
    assert got.loc[1].keep == 1
    assert got.loc[2].n_contam == 1
    assert got.loc[3].n_contam >= 2
    assert got.loc[4].n_ngrams == 0 and got.loc[4].keep == 1
    assert got.loc[6].keep == 0 and got.loc[6].contam_ratio == 1.0


def test_shuffled_plan_is_identical(ray_session, corpus):
    sf_dir, _ = corpus
    a = (q_doc_decontaminate(sf_dir).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (q_doc_decontaminate_shuffled(sf_dir).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_no_eval_docs_means_all_kept(ray_session, tmp_path):
    # ids chosen so no doc_id % EVAL_MOD == 0 -> empty eval gram set
    texts = {1: " ".join(f"a{k}" for k in range(12)),
             2: " ".join(f"a{k}" for k in range(12))}
    sf_dir = _write_docs(tmp_path, texts)
    got = q_doc_decontaminate(sf_dir).to_pandas()
    assert (got.keep == 1).all() and (got.n_contam == 0).all()
    got2 = q_doc_decontaminate_shuffled(sf_dir).to_pandas()
    assert (got2.keep == 1).all() and len(got2) == 2


def test_bloom_plan_superset_and_naive_bloom(ray_session, corpus):
    """The Bloom sketch must (a) match a naive single-process Bloom
    bit-for-bit (same md5-slice arithmetic) and (b) be a superset of
    the exact plan — no false negatives, ever."""
    import hashlib

    from amazon_textract_transformer_pipeline_ray.pipelines.decontam import (
        BLOOM_K, q_doc_decontaminate_bloom)

    sf_dir, texts = corpus

    def positions(g):
        hx = hashlib.md5(g.encode()).hexdigest()
        return [int(hx[4 * j:4 * j + 4], 16) for j in range(BLOOM_K)]

    def grams(t):
        ts = t.split()
        return [" ".join(ts[i:i + N]) for i in range(len(ts) - N + 1)]

    bits = {p for i, t in texts.items() if i % EVAL_MOD == 0
            for g in set(grams(t)) for p in positions(g)}
    exp = {}
    for i, t in texts.items():
        if i % EVAL_MOD == 0:
            continue
        gs = grams(t)
        nh = sum(1 for g in gs if all(p in bits for p in positions(g)))
        exp[i] = (len(gs), nh)

    got = q_doc_decontaminate_bloom(sf_dir).to_pandas().set_index("doc_id")
    assert sorted(got.index) == sorted(exp)
    for i, (n, nh) in exp.items():
        row = got.loc[i]
        assert (row.n_ngrams, row.n_bloom_hits) == (n, nh), (i, dict(row))
        assert row.keep_bloom == int(nh == 0)

    # containment vs the exact plan (superset, never a false negative)
    ex = q_doc_decontaminate(sf_dir).to_pandas().set_index("doc_id")
    j = got.join(ex, rsuffix="_ex")
    assert (j.n_bloom_hits >= j.n_contam).all()
    assert (j.keep_bloom <= j.keep).all()


def test_bloom_empty_eval_keeps_everything(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.decontam import (
        q_doc_decontaminate_bloom)

    texts = {1: " ".join(f"a{k}" for k in range(12)),
             2: " ".join(f"b{k}" for k in range(12))}
    sf_dir = _write_docs(tmp_path, texts)
    got = q_doc_decontaminate_bloom(sf_dir).to_pandas()
    assert (got.keep_bloom == 1).all() and (got.n_bloom_hits == 0).all()

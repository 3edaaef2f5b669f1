"""Unigram LM scoring tests: hand-computed cross-entropy on a tiny
corpus, plan equivalence, and edge cases."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from amazon_textract_transformer_pipeline_ray.pipelines.scoring import (
    _batch_doc_token_counts,
    q_doc_lm_score,
    q_doc_lm_score_shuffled,
)


def _write(tmp_path, texts):
    df = pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts,
        "lang": "en", "source": "t", "n_chars": [len(t) for t in texts],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_batch_doc_token_counts():
    toks, dix, cnt, lens = _batch_doc_token_counts(
        ["a b a", "", "b c"])
    pairs = sorted(zip(dix.tolist(), toks.tolist(), cnt.tolist()))
    assert pairs == [(0, "a", 2), (0, "b", 1), (2, "b", 1), (2, "c", 1)]
    assert lens.tolist() == [3, 0, 2]


def test_lm_score_hand_computed(ray_session, tmp_path):
    # corpus: a a a b  -> p(a)=3/4, p(b)=1/4
    sf = _write(tmp_path, ["a a a", "b", ""])
    got = (q_doc_lm_score(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.n_tokens.tolist() == [3, 1, 0]
    assert abs(got.lm_bits[0] - (-math.log2(3 / 4))) < 1e-6
    assert abs(got.lm_bits[1] - (-math.log2(1 / 4))) < 1e-6
    assert got.lm_bits[2] == 0.0


def test_lm_plans_identical(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    vocab = [f"t{k}" for k in range(30)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 60))))
             for _ in range(80)]
    sf = _write(tmp_path, texts)
    a = (q_doc_lm_score(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (q_doc_lm_score_shuffled(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.n_tokens.tolist() == b.n_tokens.tolist()
    # f32 column: plans sum in different orders; equality after f32 cast
    np.testing.assert_allclose(a.lm_bits, b.lm_bits, rtol=2e-6)


def test_rare_tokens_score_higher(ray_session, tmp_path):
    texts = (["common common common common"] * 10
             + ["rareword1 rareword2 rareword3 rareword4"])
    sf = _write(tmp_path, texts)
    got = q_doc_lm_score(sf).to_pandas().sort_values("doc_id")
    assert got.lm_bits.iloc[-1] > got.lm_bits.iloc[0] + 3


def test_vocab_top_rank_and_ties(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.scoring import (
        q_vocab_top)

    # b and c tie at 2 -> token-asc tiebreak; a wins with 3
    sf = _write(tmp_path, ["a b c", "a b c", "a"])
    got = q_vocab_top(sf).to_pandas()
    assert got.token.tolist() == ["a", "b", "c"]
    assert got.n.tolist() == [3, 2, 2]
    assert got.rnk.tolist() == [1, 2, 3]
    assert abs(got.cum_share.iloc[-1] - 1.0) < 1e-6
    assert abs(got.cum_share.iloc[0] - 3 / 7) < 1e-6

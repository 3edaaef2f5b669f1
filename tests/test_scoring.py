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


# ------------------------------------------------------------- DSIR

def _write_langs(tmp_path, texts, langs):
    df = pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts,
        "lang": langs, "source": "t", "n_chars": [len(t) for t in texts],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _naive_dsir(texts, langs):
    import hashlib
    from collections import Counter

    from amazon_textract_transformer_pipeline_ray.pipelines.scoring import (
        DSIR_BUCKETS, DSIR_TARGET_LANG)

    def feats(t):
        toks = t.split()
        grams = toks + [" ".join(toks[i:i + 2])
                        for i in range(len(toks) - 1)]
        return [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                % DSIR_BUCKETS for g in grams]

    tgt, raw = Counter(), Counter()
    for t, lg in zip(texts, langs):
        for b in feats(t):
            raw[b] += 1
            if lg == DSIR_TARGET_LANG:
                tgt[b] += 1
    nt, nr = sum(tgt.values()), sum(raw.values())
    out = []
    for t in texts:
        per_bucket = Counter(feats(t))
        s = sum(c * (math.log2((tgt[b] + 1) / (nt + DSIR_BUCKETS))
                     - math.log2((raw[b] + 1) / (nr + DSIR_BUCKETS)))
                for b, c in per_bucket.items())
        out.append((len(feats(t)), np.float32(s)))
    return out


def test_dsir_matches_naive(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.scoring import (
        q_doc_dsir_weights)

    texts = ["the cat sat", "le chat noir", "the dog ran fast",
             "", "cat cat cat", "el gato negro"]
    langs = ["en", "fr", "en", "en", "en", "es"]
    sf = _write_langs(tmp_path, texts, langs)
    got = (q_doc_dsir_weights(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = _naive_dsir(texts, langs)
    for i, (nf, lw) in enumerate(exp):
        assert got.n_feats[i] == nf, i
        assert abs(got.dsir_logw[i] - lw) < 1e-4, (i, got.dsir_logw[i], lw)


def test_dsir_ranks_target_language_higher(ray_session):
    from amazon_textract_transformer_pipeline_ray.pipelines.scoring import (
        q_doc_dsir_weights)

    sf = "/root/testdata/sf0.001"
    got = q_doc_dsir_weights(sf).to_pandas()
    docs = pq.read_table(os.path.join(sf, "documents.parquet"),
                         columns=["doc_id", "lang"]).to_pandas()
    m = got.merge(docs, on="doc_id")
    mean_en = m[m.lang == "en"].dsir_logw.mean()
    mean_other = m[m.lang != "en"].dsir_logw.mean()
    assert mean_en > mean_other


# -------------------------------------------------- heavy hitters

def test_heavy_hitters_matches_exhaustive(ray_session, tmp_path):
    """Crafted corpus where the per-batch retention bound actually
    prunes (many singleton bigrams, few heavy ones): the sketch+recount
    output must equal the exhaustive count filter."""
    from collections import Counter

    from amazon_textract_transformer_pipeline_ray.pipelines.scoring import (
        q_token_heavy_hitters)

    rng = np.random.default_rng(17)
    texts = []
    # heavy: "hot pair" repeated; noise: unique bigrams
    texts += ["hot pair"] * 40
    for i in range(400):
        texts.append(f"u{i}a u{i}b u{i}c")
    texts += ["warm duo"] * 10
    rng.shuffle(texts)
    sf = _write(tmp_path, texts)
    phi = 0.02
    got = q_token_heavy_hitters(sf, phi=phi).to_pandas()

    grams = Counter()
    for t in texts:
        toks = t.split()
        for i in range(len(toks) - 1):
            grams[" ".join(toks[i:i + 2])] += 1
    n = sum(grams.values())
    thresh = int(np.ceil(phi * n))
    exp = sorted((w, c) for w, c in grams.items() if c >= thresh)
    assert list(zip(got.token, got.n)) == exp
    assert "hot pair" in set(got.token)
    # the retention bound must have pruned: candidate superset < vocab
    assert len(got) < len(grams)


def test_heavy_hitters_guarantee_under_batch_splits(ray_session, tmp_path):
    """A phi-heavy bigram spread thinly across many docs (so no single
    doc is hot) still survives the candidate pass — the pigeonhole
    guarantee of the k = 2/phi bound."""
    from amazon_textract_transformer_pipeline_ray.pipelines.scoring import (
        q_token_heavy_hitters)

    texts = []
    for i in range(200):
        texts.append(f"spread out filler{i} x{i} y{i}")
    sf = _write(tmp_path, texts)
    got = q_token_heavy_hitters(sf, phi=0.1).to_pandas()
    assert set(got.token) == {"spread out"}


def _naive_cms(texts, w_mod):
    """Single-process CMS with the same md5-slice arithmetic."""
    import hashlib
    from collections import Counter

    from amazon_textract_transformer_pipeline_ray.pipelines.scoring import (
        CMS_D)

    def positions(t):
        hx = hashlib.md5(t.encode()).hexdigest()
        return [int(hx[4 * j:4 * j + 4], 16) % w_mod for j in range(CMS_D)]

    counts = Counter(w for t in texts for w in t.split())
    table = [[0] * w_mod for _ in range(CMS_D)]
    for tok, c in counts.items():
        for j, p in enumerate(positions(tok)):
            table[j][p] += c
    probe = sorted({w for i, t in enumerate(texts) if i % 20 == 0
                    for w in t.split()})
    return {t: (min(table[j][p] for j, p in enumerate(positions(t))),
                counts[t]) for t in probe}


def test_cms_matches_naive_and_guarantee(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.scoring import (
        CMS_W, q_token_counts_cms)

    texts = [" ".join(f"w{(i * 7 + k) % 23}" for k in range(12))
             for i in range(40)]
    sf = _write(tmp_path, texts)
    got = q_token_counts_cms(sf).set_index("token")
    exp = _naive_cms(texts, CMS_W)
    assert sorted(got.index) == sorted(exp)
    for t, (est, exact) in exp.items():
        row = got.loc[t]
        assert (row.est_n, row.exact_n) == (est, exact), t
        assert row.overcount == est - exact
    assert (got.est_n >= got.exact_n).all()


def test_cms_overcounts_under_forced_collisions(ray_session, tmp_path):
    """With W=2 every row collides, so the min-over-rows estimate must
    OVER-count (never under) — the CMS guarantee under stress (width is
    threaded as a parameter because the UDFs run in worker processes)."""
    from amazon_textract_transformer_pipeline_ray.pipelines import scoring

    texts = ["a b c d e f g h", "a a a a", "b c", "z z z"] * 3
    sf = _write(tmp_path, texts)
    got = scoring.q_token_counts_cms(sf, width=2).set_index("token")
    exp = _naive_cms(texts, 2)
    for t, (est, exact) in exp.items():
        row = got.loc[t]
        assert (row.est_n, row.exact_n) == (est, exact), t
    assert (got.est_n >= got.exact_n).all()
    assert (got.overcount > 0).any()  # collisions actually happened


def test_bigram_pmi_matches_naive(ray_session, tmp_path):
    """PMI top-k vs a naive single-process replica; the rank statistic
    is n_xy/(n_x*n_y) (PMI order for a fixed corpus) so no libm call
    can diverge."""
    from collections import Counter

    from amazon_textract_transformer_pipeline_ray.pipelines.scoring import (
        q_bigram_pmi)

    texts = [" ".join(["new york"] * 8 + ["big apple"] * 6 + ["the the"])
             for _ in range(5)] + ["a b c d e f g h"] * 3
    sf = _write(tmp_path, texts)
    uni = Counter(w for t in texts for w in t.split())
    bi = Counter()
    for t in texts:
        ws = t.split()
        bi.update(" ".join(p) for p in zip(ws, ws[1:]))
    rows = [(g, n, uni[g.split(" ")[0]], uni[g.split(" ")[1]],
             n / (uni[g.split(" ")[0]] * uni[g.split(" ")[1]]))
            for g, n in bi.items() if n >= 3]
    rows.sort(key=lambda r: (-r[4], r[0]))
    got = q_bigram_pmi(sf, k=10, min_count=3)
    assert [tuple(r) for r in
            got[["bigram", "n_xy", "n_x", "n_y", "score"]].itertuples(
                index=False)] == rows[:10]
    # collocation property: the exclusive pair "a b" (every occurrence
    # of either token is in this bigram) outranks high-frequency pairs
    # of promiscuous tokens
    assert got.iloc[0].bigram == "a b"
    assert got.iloc[0].score > got[got.bigram == "big apple"].score.iloc[0]


def test_vocab_driver_budget_raises_loudly(ray_session, tmp_path,
                                           monkeypatch):
    """The vocab-sized driver reduction (unigram fit / q_vocab_top rank)
    must fail past its budget with a pointer to the constant-space
    sketch twins, not OOM the driver.  (Driver-side guard, so
    monkeypatching the module global is effective.)"""
    import pytest

    from amazon_textract_transformer_pipeline_ray.pipelines import scoring

    sf = _write(tmp_path, ["a b c d e", "f g h i j"])
    monkeypatch.setattr(scoring, "VOCAB_DRIVER_BUDGET_ROWS", 4)
    with pytest.raises(ValueError, match="q_token_counts_cms"):
        scoring.q_vocab_top(sf)


def test_heavy_hitter_candidate_budget_raises_loudly(ray_session, tmp_path,
                                                     monkeypatch):
    """The Misra-Gries candidate union is O(n_batches/phi) — past its
    budget the query must point at the CMS twin."""
    import pytest

    from amazon_textract_transformer_pipeline_ray.pipelines import scoring

    sf = _write(tmp_path, ["a a a b", "c c c d"])
    monkeypatch.setattr(scoring, "HH_CANDIDATE_BUDGET_ROWS", 1)
    with pytest.raises(ValueError, match="q_token_counts_cms"):
        scoring.q_token_heavy_hitters(sf)

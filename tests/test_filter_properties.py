"""Property tests for the corpus-filter suite: the broadcast and
shuffle plans of decontamination and LM scoring must agree on ANY
corpus, and the Gopher batch kernel must equal its naive per-doc spec
under hypothesis-generated text."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from amazon_textract_transformer_pipeline_ray.pipelines.decontam import (
    q_doc_decontaminate,
    q_doc_decontaminate_shuffled,
)
from amazon_textract_transformer_pipeline_ray.pipelines.filtering import (
    gopher_quality_batch,
)
from amazon_textract_transformer_pipeline_ray.pipelines.scoring import (
    q_doc_lm_score,
    q_doc_lm_score_shuffled,
)

# word pool with deliberate collisions + varied lengths (1..12 chars)
_WORDS = st.sampled_from(
    ["a", "bb", "ccc", "word", "otherword", "x" * 12, "dup", "dup",
     "tail", "mid"])
_DOC = st.lists(_WORDS, min_size=0, max_size=40).map(" ".join)
# include whitespace-edge docs
_TEXT = st.one_of(_DOC, st.just(""), st.just("   "),
                  _DOC.map(lambda t: "  " + t + " "))


def _write(tmp_path, texts, tag):
    d = os.path.join(str(tmp_path), tag)
    os.makedirs(d, exist_ok=True)
    df = pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts, "lang": "en",
        "source": "t", "n_chars": [len(t) for t in texts],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(d, "documents.parquet"))
    return d


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_TEXT, min_size=1, max_size=60), ix=st.integers(0, 6))
def test_decontam_plans_agree(ray_session, tmp_path, texts, ix):
    sf = _write(tmp_path, texts, f"dc{abs(hash(tuple(texts))) % 10**9}_{ix}")
    a = q_doc_decontaminate(sf).to_pandas()
    b = q_doc_decontaminate_shuffled(sf).to_pandas()
    if len(a) == 0 and len(b) == 0:
        # all docs in the eval slice -> zero train rows; Ray's
        # to_pandas() drops column names on fully-empty results
        return
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_TEXT, min_size=1, max_size=60), ix=st.integers(0, 6))
def test_lm_plans_agree(ray_session, tmp_path, texts, ix):
    sf = _write(tmp_path, texts, f"lm{abs(hash(tuple(texts))) % 10**9}_{ix}")
    a = (q_doc_lm_score(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (q_doc_lm_score_shuffled(sf).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a.n_tokens.tolist() == b.n_tokens.tolist()
    np.testing.assert_allclose(a.lm_bits, b.lm_bits, rtol=2e-6)


@settings(max_examples=40, deadline=None)
@given(texts=st.lists(_TEXT, min_size=1, max_size=30))
def test_gopher_batch_equals_naive(texts):
    import re
    from collections import Counter

    out = gopher_quality_batch(pa.table({
        "doc_id": list(range(len(texts))), "text": texts})).to_pydict()
    for i, t in enumerate(texts):
        toks = re.split(r"\s+", t.strip()) if t.strip() else []
        n = len(toks)
        assert out["n_words"][i] == n
        wc = Counter(toks)
        assert out["n_unique_words"][i] == len(wc)
        exp_top = (max(wc.values()) / n) if n else 0.0
        assert abs(out["top_word_frac"][i] - exp_top) < 1e-12
        bg = Counter(zip(toks, toks[1:]))
        exp_bg = (max(bg.values()) / (n - 1)) if n >= 2 else 0.0
        assert abs(out["top_bigram_frac"][i] - exp_bg) < 1e-12

"""Composite preprocess tests: each gate column must equal the
standalone operator it claims to reproduce, on a corpus crafted to
trip every gate."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from amazon_textract_transformer_pipeline_ray.pipelines.corpus import (
    q_doc_domain_mix,
)
from amazon_textract_transformer_pipeline_ray.pipelines.decontam import (
    q_doc_decontaminate,
)
from amazon_textract_transformer_pipeline_ray.pipelines.filtering import (
    q_doc_gopher_quality,
    q_doc_pii_scrub,
)
from amazon_textract_transformer_pipeline_ray.pipelines.preprocess import (
    q_corpus_preprocess,
)


def _corpus(tmp_path):
    rng = np.random.default_rng(17)
    vocab = [f"word{k:02d}" for k in range(60)]
    texts, sources = [], []
    for i in range(120):
        if i == 7:
            t = "dup dup " + " ".join(rng.choice(vocab, size=60))
        elif i == 11:
            t = texts[7]  # exact duplicate -> keep_dedup 0 for id 11
        elif i == 13:
            t = "email me a@b.co " + " ".join(rng.choice(vocab, size=60))
        elif i == 17:
            t = " ".join(["spam"] * 80)  # fails gopher repetition
        elif i == 19:
            t = "tiny"  # fails gopher min length
        else:
            t = " ".join(rng.choice(vocab, size=int(rng.integers(50, 90))))
        texts.append(t)
        sources.append(f"src{i % 5}")
    # eval leak: doc 21 copies an 8-gram from eval doc 20
    texts[21] = " ".join(texts[20].split()[:8]) + " " + texts[21]
    df = pd.DataFrame({
        "doc_id": range(120), "text": texts, "lang": "en",
        "source": sources, "n_chars": [len(t) for t in texts],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_composite_matches_standalone_gates(ray_session, tmp_path):
    sf = _corpus(tmp_path)
    got = (q_corpus_preprocess(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(got) == 120

    gopher = (q_doc_gopher_quality(sf).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    assert got.keep_gopher.tolist() == gopher.keep.tolist()

    dec = (q_doc_decontaminate(sf).to_pandas()
           .set_index("doc_id").keep)
    for _, row in got.iterrows():
        if row.doc_id % 20 == 0:
            assert row.keep_decontam == 0  # eval slice hard-excluded
        else:
            assert row.keep_decontam == dec[row.doc_id]

    mix = (q_doc_domain_mix(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.keep_mix.tolist() == mix.selected.tolist()

    pii = (q_doc_pii_scrub(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got.n_pii.tolist() == pii.pii_total.tolist()

    # crafted rows behave
    g = got.set_index("doc_id")
    assert g.loc[11].keep_dedup == 0 and g.loc[7].keep_dedup == 1
    assert g.loc[13].n_pii == 1
    assert g.loc[17].keep_gopher == 0 and g.loc[19].keep_gopher == 0
    assert g.loc[21].keep_decontam == 0  # leaked eval 8-gram
    assert (got.keep == (got.keep_gopher * got.keep_decontam
                         * got.keep_mix * got.keep_dedup)).all()
    # the pipeline keeps a non-trivial subcorpus
    assert 0 < got.keep.sum() < 120

"""The north-rule correctness gate: the Ray pipeline's per-turn output must
equal the plain-Python oracle byte-for-byte under stable turn ordering —
plus ordering-invariance and fields-path equality."""

import numpy as np
import pandas as pd
import pytest

from amazon_textract_transformer_pipeline_ray.config import DEFAULT_CONFIG
from amazon_textract_transformer_pipeline_ray.fixtures import gen_transcripts
from amazon_textract_transformer_pipeline_ray.oracle import oracle_turns_and_fields

N_TURNS = 600


@pytest.fixture(scope="module")
def corpus():
    t = gen_transcripts(N_TURNS)
    exp_turns, exp_fields = oracle_turns_and_fields(t)
    return t, exp_turns.to_pandas(), exp_fields.to_pandas()


def _sorted(df: pd.DataFrame, extra=()) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx", *extra]).reset_index(drop=True)


def _assert_turns_equal(got: pd.DataFrame, exp: pd.DataFrame):
    assert len(got) == len(exp)
    for col in ("conv_id", "turn_idx", "role", "extracted_text", "n_words",
                "n_spans", "review_needed"):
        assert list(got[col]) == list(exp[col]), f"mismatch in {col}"
    assert np.allclose(got["boilerplate_ratio"], exp["boilerplate_ratio"])
    assert np.allclose(got["doc_confidence"], exp["doc_confidence"])
    for sa_list, sb_list in zip(got["spans"], exp["spans"]):
        assert len(sa_list) == len(sb_list)
        for sa, sb in zip(sa_list, sb_list):
            for k in ("class_id", "class_name", "text", "raw_text", "start",
                      "end", "page", "x0", "y0", "x1", "y1"):
                assert sa[k] == sb[k], k
            assert abs(sa["confidence"] - sb["confidence"]) < 1e-6


def test_turns_match_oracle(ray_session, corpus):
    import ray.data as rd
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import build_turns

    t, exp_turns, _ = corpus
    got = _sorted(build_turns(rd.from_arrow(t), batch_size=64).to_pandas())
    _assert_turns_equal(got, _sorted(exp_turns))


def test_order_invariance(ray_session, corpus):
    """Shuffled/odd-partitioned input -> identical sorted output."""
    import ray.data as rd
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import build_turns

    t, exp_turns, _ = corpus
    shuffled = t.take(list(np.random.default_rng(7).permutation(t.num_rows)))
    ds = rd.from_arrow(shuffled).repartition(13)
    got = _sorted(build_turns(ds, batch_size=17).to_pandas())
    _assert_turns_equal(got, _sorted(exp_turns))


def test_fields_match_oracle(ray_session, corpus):
    import ray.data as rd
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import build_turns

    t, _, exp_fields = corpus
    got = _sorted(
        build_turns(rd.from_arrow(t), batch_size=64, emit="fields").to_pandas(),
        extra=("sort_order",),
    )
    exp = _sorted(exp_fields, extra=("sort_order",))
    assert len(got) == len(exp)
    for col in ("conv_id", "turn_idx", "field_name", "class_id", "value",
                "num_detections", "num_detected_values", "optional",
                "review_needed"):
        got_v = list(got[col])
        exp_v = list(exp[col])
        assert got_v == exp_v, f"mismatch in {col}"
    assert np.allclose(got["confidence"], exp["confidence"])
    for va, vb in zip(got["values"], exp["values"]):
        assert len(va) == len(vb)
        for a, b in zip(va, vb):
            assert a["value"] == b["value"]
            assert abs(a["confidence"] - b["confidence"]) < 1e-6


def test_conversation_rollup(ray_session, corpus):
    import ray.data as rd
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_conversations,
        build_turns,
    )

    t, exp_turns, _ = corpus
    convs = build_conversations(
        build_turns(rd.from_arrow(t), batch_size=64)
    ).to_pandas()
    assert bool(convs["turns_unique_ordered"].all())
    exp_counts = exp_turns.groupby("conv_id").size()
    got_counts = convs.set_index("conv_id")["n_turns"]
    assert got_counts.sort_index().astype(int).equals(
        exp_counts.sort_index().astype(int))
    # digest is deterministic across runs:
    convs2 = build_conversations(
        build_turns(rd.from_arrow(t), batch_size=32)
    ).to_pandas()
    a = convs.set_index("conv_id")["conv_text_sha256"].sort_index()
    b = convs2.set_index("conv_id")["conv_text_sha256"].sort_index()
    assert a.equals(b)

"""The normalizer actor-pool stage (stages/normalize.py): byte-equality
with the fused single-stage pipeline, and the request-dedup contract of
the reference's seq2seq endpoint client (normalize.py:40-58)."""

import numpy as np
import pandas as pd
import pytest


def _sorted_rows(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_staged_equals_fused(ray_session):
    from amazon_textract_transformer_pipeline_ray.fixtures import gen_transcripts
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_turns)
    from amazon_textract_transformer_pipeline_ray.stages.normalize import (
        build_turns_staged)
    import ray.data as rd

    batch = gen_transcripts(400, seed=7)
    ds = rd.from_arrow(batch)
    fused = _sorted_rows(build_turns(ds, batch_size=128).to_pandas())
    staged = _sorted_rows(build_turns_staged(
        rd.from_arrow(batch), batch_size=128).to_pandas())
    assert len(fused) == len(staged)
    for col in fused.columns:
        if col == "spans":
            continue
        if col == "doc_confidence":
            # The staged path re-consolidates from the PERSISTED float32
            # span confidences (the fused path folds float64 in-memory
            # values), so doc_confidence agrees to f32 precision only —
            # the same divergence any recompute-from-table consumer sees.
            assert np.allclose(fused[col].to_numpy(),
                               staged[col].to_numpy(), atol=1e-6)
            continue
        if col == "review_needed":
            # The review gate may flip ONLY where doc_confidence sits
            # exactly on the threshold boundary at f32 precision (the
            # fused path compared the pre-quantization f64 value):
            fv = fused[col].to_numpy()
            sv = staged[col].to_numpy()
            conf = fused["doc_confidence"].to_numpy()
            ties = np.abs(conf - 0.5) <= 1e-6
            assert (fv == sv)[~ties].all()
            continue
        assert fused[col].tolist() == staged[col].tolist(), col
    for a, b in zip(fused["spans"], staged["spans"]):
        assert list(a) == list(b)


def test_stage_normalizes_and_reconsolidates(ray_session):
    """Dates in span texts come out ISO; raw_text keeps the original;
    doc_confidence matches a fresh consolidation of the normalized spans."""
    from amazon_textract_transformer_pipeline_ray.config import DEFAULT_CONFIG
    from amazon_textract_transformer_pipeline_ray.fixtures import gen_transcripts
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_turns)
    from amazon_textract_transformer_pipeline_ray.stages.normalize import (
        NormalizerStage)
    import ray.data as rd

    raw_cfg = DEFAULT_CONFIG.without_normalizers()
    raw = build_turns(rd.from_arrow(gen_transcripts(300, seed=11)),
                      raw_cfg, batch_size=128).to_pandas()
    stage = NormalizerStage()
    import pyarrow as pa

    out = stage(pa.Table.from_pandas(raw, preserve_index=False)).to_pandas()
    date_cls = 3
    n_date_spans = 0
    for spans in out["spans"]:
        for s in spans:
            if s["class_id"] == date_cls:
                n_date_spans += 1
                assert s["raw_text"] is not None
                # normalizer echoes unparseable input; parsed ones are ISO
                import re

                assert (s["text"] == s["raw_text"]
                        or re.match(r"^\d{4}-\d{2}-\d{2}$", s["text"]))
    assert n_date_spans > 0, "corpus should contain date spans"
    assert stage.requests > 0


def test_request_dedup():
    """Each distinct (normalizer, prompt+text) is sent exactly once per
    batch — the endpoint-call dedup of reference normalize.py:40-58."""
    import pyarrow as pa

    from amazon_textract_transformer_pipeline_ray.config import DEFAULT_CONFIG
    from amazon_textract_transformer_pipeline_ray.schemas import TURNS_SCHEMA
    from amazon_textract_transformer_pipeline_ray.stages.normalize import (
        NormalizerStage)

    calls: list[str] = []

    def counting_norm(text: str) -> str:
        calls.append(text)
        return "NORM:" + text

    def span(text):
        return {"class_id": 3, "class_name": "date", "text": text,
                "raw_text": None, "start": 0, "end": len(text), "page": 1,
                "x0": 0, "y0": 0, "x1": 10, "y1": 10, "confidence": 0.9}

    rows = [
        {"conv_id": "c0", "turn_idx": 0, "role": "user",
         "extracted_text": "x", "boilerplate_ratio": 0.0, "n_words": 1,
         "n_spans": 2, "spans": [span("1/2/2020"), span("1/2/2020")],
         "doc_confidence": 0.0, "review_needed": False},
        {"conv_id": "c0", "turn_idx": 1, "role": "user",
         "extracted_text": "y", "boilerplate_ratio": 0.0, "n_words": 1,
         "n_spans": 2, "spans": [span("1/2/2020"), span("3/4/2021")],
         "doc_confidence": 0.0, "review_needed": False},
    ]
    batch = pa.Table.from_pylist(rows, schema=TURNS_SCHEMA)
    stage = NormalizerStage(normalizers={"date_iso": counting_norm})
    out = stage(batch)
    # 3 date spans share 2 distinct texts -> exactly 2 endpoint calls
    # (the fused per-turn dedup would have made 3):
    assert sorted(calls) == ["1/2/2020", "3/4/2021"]
    assert stage.requests == 2
    flat = out.column("spans").combine_chunks().flatten()
    assert flat.field("text").to_pylist() == [
        "NORM:1/2/2020", "NORM:1/2/2020", "NORM:1/2/2020", "NORM:3/4/2021"]
    assert flat.field("raw_text").to_pylist() == [
        "1/2/2020", "1/2/2020", "1/2/2020", "3/4/2021"]


def test_stage_as_actor_pool(ray_session):
    """The stage runs as a real Ray actor-pool map_batches (state built
    once per actor in __init__)."""
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.config import DEFAULT_CONFIG
    from amazon_textract_transformer_pipeline_ray.fixtures import gen_transcripts
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_turns)
    from amazon_textract_transformer_pipeline_ray.stages.normalize import (
        NormalizerStage)

    raw = build_turns(rd.from_arrow(gen_transcripts(200, seed=3)),
                      DEFAULT_CONFIG.without_normalizers(), batch_size=64)
    out = raw.map_batches(
        NormalizerStage,
        fn_constructor_kwargs={"cfg": DEFAULT_CONFIG},
        batch_format="pyarrow", batch_size=64, concurrency=2)
    df = out.to_pandas()
    assert len(df) > 0
    assert (df["doc_confidence"] >= 0).all()

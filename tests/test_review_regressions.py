"""Regression tests for code-review findings (round 1)."""

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_ray.config import DEFAULT_CONFIG, EngineConfig
from amazon_textract_transformer_pipeline_ray.functions.html_parser import parse_html
from amazon_textract_transformer_pipeline_ray.functions.metrics import (
    PAD_LABEL,
    token_classification_metrics,
)
from amazon_textract_transformer_pipeline_ray.functions.turn import extract_turn
from amazon_textract_transformer_pipeline_ray.oracle_independent import (
    oracle_extract_turn,
)


def test_self_closing_script_does_not_swallow_document():
    tb = parse_html("<p>keep</p><script/><p>also kept</p>")
    assert tb.words == ["keep", "also", "kept"]
    # non-self-closing script still skips its body:
    tb2 = parse_html("<p>a</p><script>var x = 1;</script><p>b</p>")
    assert tb2.words == ["a", "b"]
    # unterminated script skips the rest (raw-skip semantics):
    tb3 = parse_html("<p>a</p><script>var x<p>gone</p>")
    assert tb3.words == ["a"]


def test_out_of_range_predicted_class_degrades_to_other():
    import json

    def payload(pc):
        return json.dumps({
            "DocumentMetadata": {"Pages": 1},
            "Blocks": [
                {"Id": "p", "BlockType": "PAGE",
                 "Relationships": [{"Type": "CHILD", "Ids": ["l"]}]},
                {"Id": "l", "BlockType": "LINE",
                 "Relationships": [{"Type": "CHILD", "Ids": ["w1", "w2"]}]},
                {"Id": "w1", "BlockType": "WORD", "Text": "good",
                 "Confidence": 99.0, "PredictedClass": pc,
                 "PredictedClassConfidence": 0.9,
                 "Geometry": {"BoundingBox": {
                     "Left": 0.1, "Top": 0.1, "Width": 0.2, "Height": 0.05}}},
                {"Id": "w2", "BlockType": "WORD", "Text": "word",
                 "Confidence": 99.0,
                 "Geometry": {"BoundingBox": {
                     "Left": 0.4, "Top": 0.1, "Width": 0.2, "Height": 0.05}}},
            ],
        })

    for bad in (9, 64, -3):
        got = extract_turn(payload(bad), DEFAULT_CONFIG)  # must not raise
        assert got is not None
        exp = oracle_extract_turn(payload(bad), DEFAULT_CONFIG)
        assert got.extracted_text == exp["extracted_text"]
        assert [d.text for d in got.detections] == [
            d["text"] for d in exp["spans"]]
    # in-range enrichment still passes through:
    ok = extract_turn(payload(1), DEFAULT_CONFIG)
    assert ok.pred_class[0] == 1


def test_all_pad_example_keeps_metrics_finite():
    labels = np.array([[PAD_LABEL, PAD_LABEL], [0, 1]])
    preds = np.array([[0, 0], [0, 1]])
    m = token_classification_metrics(preds, labels, num_labels=3)
    assert np.isfinite(m["acc"])
    assert abs(m["acc"] - 0.5) < 1e-12  # (0 + 1.0) / 2


def test_lineage_changes_with_partition_layout():
    base = EngineConfig(num_partitions=32)
    assert base.lineage_id("f") != EngineConfig(num_partitions=64).lineage_id("f")
    assert base.lineage_id("f") != EngineConfig(
        num_partitions=32, salt_span=64).lineage_id("f")


def test_repartition_rerun_is_consistent(ray_session, tmp_path):
    """Rerun with a different num_partitions must fully rebuild: no stale
    rows from the previous layout survive."""
    from amazon_textract_transformer_pipeline_ray.fixtures import write_transcripts
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        read_turns_output, run_checkpointed)

    inputs = write_transcripts(str(tmp_path / "in"), 300, n_shards=2)
    out = str(tmp_path / "out")
    s1 = run_checkpointed(inputs, out, EngineConfig(num_partitions=16))
    s2 = run_checkpointed(inputs, out, EngineConfig(num_partitions=4))
    assert s2["partitions"] == 4
    assert s2["turns_processed"] == s1["turns_processed"]
    df = read_turns_output(out).to_pandas()
    assert len(df) == s1["turns_processed"]  # no stale duplicate rows
    assert sorted(df["partition_id"].astype(int).unique()) == [0, 1, 2, 3]


def test_fingerprint_tolerates_nonlocal_paths():
    from amazon_textract_transformer_pipeline_ray.state.checkpoint import (
        input_fingerprint)

    a = input_fingerprint(["s3://bucket/x.parquet"])
    b = input_fingerprint(["s3://bucket/y.parquet"])
    assert a != b and len(a) == 16


def test_partition_balance_with_mega_conversation(ray_session, tmp_path):
    """End-to-end skew check: with the fixture's mega-conversation in the
    corpus, salted partitioning must keep output partitions balanced (no
    partition holds a disproportionate share of rows)."""
    import numpy as np

    from amazon_textract_transformer_pipeline_ray.fixtures import write_transcripts
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        read_turns_output, run_checkpointed)

    inputs = write_transcripts(str(tmp_path / "in"), 4000, n_shards=2)
    out = str(tmp_path / "out")
    cfg_partitions = 8
    from amazon_textract_transformer_pipeline_ray.config import EngineConfig

    run_checkpointed(inputs, out, EngineConfig(num_partitions=cfg_partitions))
    df = read_turns_output(out).to_pandas()
    counts = df.groupby("partition_id").size().to_numpy()
    assert len(counts) == cfg_partitions
    # Every partition within 3x of the mean (the mega conversation alone
    # is several partitions' worth of rows if unsalted):
    assert counts.max() <= 3 * counts.mean(), counts.tolist()
    # The mega conversation itself spans multiple partitions:
    mega = df[df["conv_id"] == "conv-mega"]
    if len(mega) > 512:  # salt_span
        assert mega["partition_id"].astype(int).nunique() > 1


def test_empty_partition_filter_not_aliased_with_no_filter():
    """Round-1 advice: an empty only_partitions filter (process nothing)
    must not reuse a cached no-filter extractor via a falsy cache key."""
    from amazon_textract_transformer_pipeline_ray.fixtures import gen_transcripts
    from amazon_textract_transformer_pipeline_ray.stages.extract import (
        make_extract_fn)

    batch = gen_transcripts(50, seed=1)
    unfiltered = make_extract_fn(None, "turns", False, None)
    assert unfiltered(batch).num_rows > 0  # populates the process cache
    filtered_all = make_extract_fn(None, "turns", False, frozenset())
    assert filtered_all(batch).num_rows == 0


def test_fingerprint_detects_same_size_overwrite(tmp_path):
    """Round-1 advice: overwriting an input in place with different
    content of IDENTICAL byte length must change the fingerprint."""
    from amazon_textract_transformer_pipeline_ray.state.checkpoint import (
        input_fingerprint)

    p = tmp_path / "in.bin"
    p.write_bytes(b"A" * 8192)
    a = input_fingerprint([str(p)])
    p.write_bytes(b"A" * 8191 + b"B")  # same size, different tail
    b = input_fingerprint([str(p)])
    assert a != b


def test_embedding_dup_lsh_deterministic(ray_session):
    """The distributed LSH dup-pair path is order-independent: the
    first-colliding-table emit-once rule depends only on the codes, so
    two runs return identical pair sets."""
    import pandas as pd

    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    a = similarity.q_embedding_dup_pairs_lsh("/root/testdata/sf0.001",
                                             threshold=0.45)
    b = similarity.q_embedding_dup_pairs_lsh("/root/testdata/sf0.001",
                                             threshold=0.45)
    pd.testing.assert_frame_equal(a, b)

"""Review-queue lifecycle (pipelines/review.py): gate routing, resume
equivalence, and the human-answer reinjection path."""

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from amazon_textract_transformer_pipeline_ray.config import EngineConfig
from amazon_textract_transformer_pipeline_ray.fixtures import write_transcripts

N_TURNS = 1200


@pytest.fixture(scope="module")
def run_dir(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("review")
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        run_checkpointed)

    inputs = write_transcripts(str(base / "in"), N_TURNS, n_shards=4)
    out = str(base / "out")
    run_checkpointed(inputs, out, EngineConfig(num_partitions=8))
    return inputs, out


def _queue_df(out_dir):
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.pipelines.review import (
        write_review_queue)

    write_review_queue(out_dir)
    return (rd.read_parquet(os.path.join(out_dir, "review")).to_pandas()
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


def test_queue_routes_exactly_the_flagged_turns(run_dir):
    import ray.data as rd

    inputs, out = run_dir
    q = _queue_df(out)
    turns = rd.read_parquet(os.path.join(out, "data")).to_pandas()
    assert len(q) == int(turns["review_needed"].sum())
    assert q["review_needed"].all()
    assert (q["task_name"] == "review-" + q["conv_id"] + "-"
            + q["turn_idx"].astype(str)).all()


def test_queue_identical_after_crash_resume(run_dir, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        run_checkpointed)

    inputs, out = run_dir
    want = _queue_df(out)
    out2 = str(tmp_path / "out2")
    cfg = EngineConfig(num_partitions=8)
    run_checkpointed(inputs, out2, cfg)
    # crash sim: drop one partition's data + manifest, then resume
    shutil.rmtree(os.path.join(out2, "data", "partition_id=3"))
    for m in glob.glob(os.path.join(out2, "_manifests", "*")):
        with open(m) as f:
            if json.load(f)["partition_id"] == 3:
                os.unlink(m)
    run_checkpointed(inputs, out2, cfg)
    got = _queue_df(out2)
    pd.testing.assert_frame_equal(got, want)


def test_reinjection_overrides_model_output(run_dir):
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.pipelines.review import (
        finalize_with_reviews)

    inputs, out = run_dir
    q = _queue_df(out)
    assert len(q) >= 2
    corrected_key = (q.iloc[0]["conv_id"], int(q.iloc[0]["turn_idx"]))
    confirmed_key = (q.iloc[1]["conv_id"], int(q.iloc[1]["turn_idx"]))
    results = pd.DataFrame({
        "conv_id": [corrected_key[0], confirmed_key[0]],
        "turn_idx": np.array([corrected_key[1], confirmed_key[1]],
                             dtype=np.int32),
        "corrected_text": ["HUMAN FIXED TEXT", None],
    })
    stats = finalize_with_reviews(out, results)
    final = rd.read_parquet(os.path.join(out, "final")).to_pandas()
    final = final.set_index(
        final["conv_id"] + "#" + final["turn_idx"].astype(str))

    row = final.loc[f"{corrected_key[0]}#{corrected_key[1]}"]
    assert row["extracted_text"] == "HUMAN FIXED TEXT"
    assert row["doc_confidence"] == np.float32(1.0)
    assert not row["review_needed"] and row["review_status"] == "corrected"
    row = final.loc[f"{confirmed_key[0]}#{confirmed_key[1]}"]
    assert row["review_status"] == "confirmed"
    assert row["doc_confidence"] == np.float32(1.0)
    # unreviewed flagged rows stay pending; clean rows stay auto:
    assert stats["n_corrected"] == 1 and stats["n_confirmed"] == 1
    assert stats["n_pending"] == len(q) - 2
    assert stats["n_auto"] == len(final) - len(q)
    # untouched rows unchanged vs the committed table:
    turns = rd.read_parquet(os.path.join(out, "data")).to_pandas()
    turns = turns.set_index(
        turns["conv_id"] + "#" + turns["turn_idx"].astype(str))
    pend = final[final["review_status"] == "auto"]
    sample = pend.head(50)
    for k, r in sample.iterrows():
        assert turns.loc[k, "extracted_text"] == r["extracted_text"]

    # idempotent: rerun produces the identical final table
    stats2 = finalize_with_reviews(out, results)
    final2 = rd.read_parquet(os.path.join(out, "final")).to_pandas()
    assert stats2 == stats
    pd.testing.assert_frame_equal(
        final.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        final2.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


def test_post_review_corpus_query(ray_session, tmp_path):
    """q_post_review_from_paths: every queued turn resolves (half
    corrected by the closed-form md5 rule, half confirmed), no pending
    rows remain, non-queued rows ride through untouched as 'auto'."""
    import hashlib

    from amazon_textract_transformer_pipeline_ray.fixtures import (
        write_transcripts)
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_turns, read_transcripts)
    from amazon_textract_transformer_pipeline_ray.pipelines.review import (
        REVIEW_CORRECT_HEX, REVIEW_CORRECT_PREFIX, q_post_review_from_paths)

    paths = write_transcripts(str(tmp_path / "in"), 1500, n_shards=2)
    base = (build_turns(read_transcripts(paths), batch_size=256)
            .to_pandas().set_index(["conv_id", "turn_idx"]))
    got = (q_post_review_from_paths(paths).to_pandas()
           .set_index(["conv_id", "turn_idx"]))
    assert len(got) == len(base)
    assert not got["review_needed"].any()          # every review resolved
    assert (got["review_status"] != "pending").all()
    flagged = base[base["review_needed"]]
    assert len(flagged) > 0
    for (c, t), row in flagged.iterrows():
        out = got.loc[(c, t)]
        corrected = (hashlib.md5(f"{c}:{t}".encode()).hexdigest()[0]
                     < REVIEW_CORRECT_HEX)
        if corrected:
            assert out["review_status"] == "corrected"
            assert out["extracted_text"] == (
                REVIEW_CORRECT_PREFIX + row["extracted_text"])
        else:
            assert out["review_status"] == "confirmed"
            assert out["extracted_text"] == row["extracted_text"]
        assert out["doc_confidence"] == np.float32(1.0)
    auto = got[got["review_status"] == "auto"]
    assert len(auto) == len(base) - len(flagged)
    assert (auto["extracted_text"]
            == base.loc[auto.index, "extracted_text"]).all()

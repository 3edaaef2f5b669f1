"""Kill/resume property tests for the suite's checkpointed pipelines
(round-4 verdict item: extend reference D2 skip-existing semantics,
util/ocr.py:151-161, beyond the flagship): corpus_preprocess and the
BPE training chain must resume idempotently and reproduce the
uninterrupted result bit-for-bit."""

import json
import os
import shutil

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (df[sorted(df.columns)].sort_values("doc_id")
            .reset_index(drop=True).astype("int64"))


@pytest.fixture(scope="module")
def preproc_run(ray_session, tmp_path_factory):
    from amazon_textract_transformer_pipeline_ray.pipelines import preprocess

    out = str(tmp_path_factory.mktemp("ckpt") / "preproc")
    summary = preprocess.run_preprocess_checkpointed(SF, out,
                                                     num_partitions=8)
    ref = _canon(preprocess.q_corpus_preprocess(SF).to_pandas())
    return out, summary, ref


def test_preprocess_checkpointed_matches_query(ray_session, preproc_run):
    from amazon_textract_transformer_pipeline_ray.pipelines import preprocess

    out, summary, ref = preproc_run
    assert summary["recomputed_partitions"] == 8
    got = _canon(preprocess.read_preprocess_verdict(out).to_pandas())
    pd.testing.assert_frame_equal(got, ref)
    assert summary["n_keep"] == int(ref["keep"].sum())


def test_preprocess_resume_noop_then_crash_resume(ray_session, preproc_run):
    from amazon_textract_transformer_pipeline_ray.pipelines import preprocess

    out, _, ref = preproc_run
    s2 = preprocess.run_preprocess_checkpointed(SF, out, num_partitions=8)
    assert s2["recomputed_partitions"] == 0
    # crash sim: partition 3's data+record gone, verdict commit gone
    shutil.rmtree(os.path.join(out, "signals", "partition_id=3"))
    os.unlink(os.path.join(out, "_manifests", "signals-00003.json"))
    os.unlink(os.path.join(out, "_manifests", "verdict.json"))
    s3 = preprocess.run_preprocess_checkpointed(SF, out, num_partitions=8)
    assert s3["recomputed_partitions"] == 1
    got = _canon(preprocess.read_preprocess_verdict(out).to_pandas())
    pd.testing.assert_frame_equal(got, ref)


def test_preprocess_lineage_change_recomputes_all(ray_session, preproc_run,
                                                  monkeypatch):
    from amazon_textract_transformer_pipeline_ray.pipelines import preprocess

    out, _, ref = preproc_run
    monkeypatch.setattr(preprocess, "PREPROCESS_SPEC_VERSION", "v-test-bump")
    s = preprocess.run_preprocess_checkpointed(SF, out, num_partitions=8)
    assert s["recomputed_partitions"] == 8  # old records lineage-rejected
    got = _canon(preprocess.read_preprocess_verdict(out).to_pandas())
    pd.testing.assert_frame_equal(got, ref)


def test_bpe_checkpointed_crash_resume_bit_identical(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        tokenizer as tok)

    ref = tok.q_vocab_bpe_merges(SF)
    st = str(tmp_path / "bpe")
    with pytest.raises(RuntimeError, match="injected crash"):
        tok.train_bpe_checkpointed(SF, st, checkpoint_every=16,
                                   _crash_after_checkpoints=1)
    assert json.load(open(f"{st}/merges.json"))["n_merges_done"] == 16
    mt0 = os.path.getmtime(f"{st}/word_counts.parquet")
    out = tok.train_bpe_checkpointed(SF, st, checkpoint_every=16)
    assert out.equals(ref)
    # stage 1 (the corpus-sized pass) was reused, not recomputed:
    assert os.path.getmtime(f"{st}/word_counts.parquet") == mt0


def test_bpe_checkpointed_extension_and_replay(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        tokenizer as tok)

    ref = tok.q_vocab_bpe_merges(SF)
    st = str(tmp_path / "bpe")
    t24 = tok.train_bpe_checkpointed(SF, st, n_merges=24, checkpoint_every=8)
    assert t24.equals(ref.slice(0, 24))
    out48 = tok.train_bpe_checkpointed(SF, st, n_merges=48,
                                       checkpoint_every=8)
    assert out48.equals(ref)
    # asking for a shorter horizon replays the committed prefix:
    t12 = tok.train_bpe_checkpointed(SF, st, n_merges=12)
    assert t12.equals(ref.slice(0, 12))


@pytest.fixture(scope="module")
def lsh_run(ray_session, tmp_path_factory):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        dedup, dedup_checkpointed as dc)

    out = str(tmp_path_factory.mktemp("ckpt") / "lsh")
    summary = dc.run_lsh_pairs_checkpointed(SF, out, num_partitions=8)
    ref = (dedup.q_minhash_lsh_pairs(SF)
           .sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True))
    return out, summary, ref


def _lsh_got(out):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        dedup_checkpointed as dc)

    return (dc.read_lsh_pairs(out).to_pandas()
            .sort_values(["doc_id_a", "doc_id_b"]).reset_index(drop=True))


def test_lsh_checkpointed_matches_query(ray_session, lsh_run):
    out, summary, ref = lsh_run
    assert summary["recomputed_partitions"] == 8
    pd.testing.assert_frame_equal(_lsh_got(out), ref)


def test_lsh_resume_noop_then_crash_resume(ray_session, lsh_run):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        dedup_checkpointed as dc)

    out, _, ref = lsh_run
    s2 = dc.run_lsh_pairs_checkpointed(SF, out, num_partitions=8)
    assert s2["recomputed_partitions"] == 0
    shutil.rmtree(os.path.join(out, "pairs", "partition_id=3"),
                  ignore_errors=True)
    os.unlink(os.path.join(out, "_manifests", "pairs-00003.json"))
    s3 = dc.run_lsh_pairs_checkpointed(SF, out, num_partitions=8)
    assert s3["recomputed_partitions"] == 1
    pd.testing.assert_frame_equal(_lsh_got(out), ref)


def test_lsh_lineage_change_recomputes_all(ray_session, lsh_run,
                                           monkeypatch):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        dedup_checkpointed as dc)

    out, _, ref = lsh_run
    monkeypatch.setattr(dc, "LSH_PAIRS_SPEC_VERSION", "v-test-bump")
    s = dc.run_lsh_pairs_checkpointed(SF, out, num_partitions=8)
    assert s["recomputed_partitions"] == 8  # old records lineage-rejected
    pd.testing.assert_frame_equal(_lsh_got(out), ref)


@pytest.fixture(scope="module")
def ngram_run(ray_session, tmp_path_factory):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        dedup, dedup_checkpointed as dc)

    out = str(tmp_path_factory.mktemp("ckpt") / "ngram")
    summary = dc.run_ngram_dedup_checkpointed(SF, out, num_partitions=8)
    ref = (dedup.q_doc_dedup_ngram_corpus(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    return out, summary, ref


def _ngram_got(out):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        dedup_checkpointed as dc)

    return (dc.read_ngram_dedup(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_ngram_checkpointed_matches_query(ray_session, ngram_run):
    out, summary, ref = ngram_run
    assert summary["recomputed_partitions"] == 8
    assert summary["removals_recomputed"]
    pd.testing.assert_frame_equal(_ngram_got(out), ref)


def test_ngram_resume_noop_then_crash_resume(ray_session, ngram_run):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        dedup_checkpointed as dc)

    out, _, ref = ngram_run
    s2 = dc.run_ngram_dedup_checkpointed(SF, out, num_partitions=8)
    assert s2 == {"partitions": 8, "n_docs": len(ref),
                  "recomputed_partitions": 0, "removals_recomputed": False}
    shutil.rmtree(os.path.join(out, "cleaned", "partition_id=5"))
    os.unlink(os.path.join(out, "_manifests", "cleaned-00005.json"))
    s3 = dc.run_ngram_dedup_checkpointed(SF, out, num_partitions=8)
    assert s3["recomputed_partitions"] == 1
    assert not s3["removals_recomputed"]  # stage A trusted, not re-run
    pd.testing.assert_frame_equal(_ngram_got(out), ref)


@pytest.fixture(scope="module")
def lm_run(ray_session, tmp_path_factory):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        scoring, scoring_checkpointed as sc)

    out = str(tmp_path_factory.mktemp("ckpt") / "lm")
    summary = sc.run_lm_score_checkpointed(SF, out, num_partitions=8)
    ref = (scoring.q_doc_lm_score_shuffled(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    return out, summary, ref


def _lm_got(out):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        scoring_checkpointed as sc)

    return (sc.read_lm_scores(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))


def test_lm_checkpointed_matches_query(ray_session, lm_run):
    out, summary, ref = lm_run
    assert summary["recomputed_partials"] == 8
    assert summary["recomputed_partitions"] == 8
    assert summary["n_docs"] == len(ref)
    pd.testing.assert_frame_equal(_lm_got(out), ref)


def test_lm_resume_noop_then_crash_resume(ray_session, lm_run):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        scoring_checkpointed as sc)

    out, _, ref = lm_run
    s2 = sc.run_lm_score_checkpointed(SF, out, num_partitions=8)
    assert s2["recomputed_partials"] == 0
    assert s2["recomputed_partitions"] == 0
    # crash sim 1: one FOLD partition lost -> only it re-runs, stage A
    # (the expensive exchange) is trusted:
    shutil.rmtree(os.path.join(out, "scores", "partition_id=2"))
    os.unlink(os.path.join(out, "_manifests", "scores-00002.json"))
    s3 = sc.run_lm_score_checkpointed(SF, out, num_partitions=8)
    assert s3["recomputed_partials"] == 0
    assert s3["recomputed_partitions"] == 1
    pd.testing.assert_frame_equal(_lm_got(out), ref)
    # crash sim 2: one EXCHANGE group lost -> that group re-ships, and
    # every fold partition is conservatively invalidated:
    shutil.rmtree(os.path.join(out, "partials", "partition_id=5"),
                  ignore_errors=True)
    os.unlink(os.path.join(out, "_manifests", "partials-00005.json"))
    s4 = sc.run_lm_score_checkpointed(SF, out, num_partitions=8)
    assert s4["recomputed_partials"] == 1
    assert s4["recomputed_partitions"] == 8
    pd.testing.assert_frame_equal(_lm_got(out), ref)


def test_lm_lineage_change_recomputes_all(ray_session, lm_run, monkeypatch):
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        scoring_checkpointed as sc)

    out, _, ref = lm_run
    monkeypatch.setattr(sc, "LM_SCORE_SPEC_VERSION", "v-test-bump")
    s = sc.run_lm_score_checkpointed(SF, out, num_partitions=8)
    assert s["recomputed_partials"] == 8  # old records lineage-rejected
    assert s["recomputed_partitions"] == 8
    pd.testing.assert_frame_equal(_lm_got(out), ref)


def test_ngram_removals_loss_invalidates_stage_b(ray_session, ngram_run):
    """Losing the stage-A commit record forces the gram exchange AND all
    rewrite partitions to re-run (they were computed against a removals
    table that can no longer be trusted)."""
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        dedup_checkpointed as dc)

    out, _, ref = ngram_run
    os.unlink(os.path.join(out, "_manifests", "removals.json"))
    s = dc.run_ngram_dedup_checkpointed(SF, out, num_partitions=8)
    assert s["removals_recomputed"]
    assert s["recomputed_partitions"] == 8
    pd.testing.assert_frame_equal(_ngram_got(out), ref)

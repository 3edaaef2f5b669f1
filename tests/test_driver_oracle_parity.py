"""Driver-oracle fixture contract (oracle_fixture.py).

The full side-by-side query-vs-SQL gate lives in
tests/test_queries_oracle_sql.py (which now covers the x_* extraction
tables too); this module pins the pieces that make those hashes stable:

* the review gate is a pure function of the PERSISTED f32 confidence
  (TurnFields.review_needed quantizes before comparing) — in both the
  engine and the independent oracle;
* ensure_fixtures caches per corpus and atomically re-points the
  ``current`` symlinks.
"""

import os

import numpy as np
import pyarrow.parquet as pq

from amazon_textract_transformer_pipeline_ray import oracle_fixture as ofx
from amazon_textract_transformer_pipeline_ray.config import DEFAULT_CONFIG
from amazon_textract_transformer_pipeline_ray.fixtures import write_transcripts
from amazon_textract_transformer_pipeline_ray.functions.turn import extract_turn
from amazon_textract_transformer_pipeline_ray.oracle_independent import (
    oracle_extract_turn,
)

N_TURNS = 600


def _corpus(tmp_path):
    return write_transcripts(str(tmp_path / "corpus-parity"), N_TURNS,
                             n_shards=4)


def test_review_gate_is_f32_pure(tmp_path):
    """Both implementations gate on float32(doc_conf) < float32(thr), so
    equal persisted confidences imply equal review flags — including the
    exact-0.5 consolidation ties that flip in f64."""
    paths = _corpus(tmp_path)
    texts = []
    for p in paths:
        texts.extend(pq.read_table(p, columns=["text"]).column("text")
                     .to_pylist())
    n_ties = 0
    for payload in texts:
        got = extract_turn(payload, DEFAULT_CONFIG)
        exp = oracle_extract_turn(payload, DEFAULT_CONFIG)
        if exp is None:
            assert got is None
            continue
        g32 = np.float32(got.fields.confidence)
        assert g32 == np.float32(exp["doc_confidence"])
        want = bool(g32 < np.float32(DEFAULT_CONFIG.review_threshold))
        assert got.fields.review_needed(
            DEFAULT_CONFIG.review_threshold) == want
        assert exp["review_needed"] == want
        if g32 == np.float32(0.5):
            n_ties += 1
    assert n_ties > 0, "corpus lost its exact-threshold consolidation ties"


def test_ensure_fixtures_caches_and_links(tmp_path):
    paths = _corpus(tmp_path)
    fix = ofx.ensure_fixtures(paths)
    assert os.path.exists(os.path.join(fix, "_SUCCESS"))
    for name in ("turns", "turns_staged", "spans", "fields",
                 "conversations", "seq2seq", "review_queue"):
        assert os.path.exists(os.path.join(fix, f"{name}.parquet")), name
    assert os.path.realpath(ofx.CURRENT_LINK) == os.path.realpath(fix)
    assert (os.path.realpath(ofx.TRANSCRIPTS_CURRENT)
            == os.path.realpath(os.path.dirname(paths[0])))
    # second call is a cache hit (marker mtime unchanged):
    marker = os.path.join(fix, "_SUCCESS")
    mtime = os.path.getmtime(marker)
    assert ofx.ensure_fixtures(paths) == fix
    assert os.path.getmtime(marker) == mtime
    # review queue rows == review-flagged turns rows:
    turns = pq.read_table(os.path.join(fix, "turns.parquet"))
    review = pq.read_table(os.path.join(fix, "review_queue.parquet"))
    import pyarrow.compute as pc

    assert review.num_rows == pc.sum(
        turns.column("review_needed")).as_py()


def test_ensure_fixtures_includes_training_tables(tmp_path):
    paths = _corpus(tmp_path)
    fix = ofx.ensure_fixtures(paths)
    for name in ("training", "mlm", "eval_metrics"):
        assert os.path.exists(os.path.join(fix, f"{name}.parquet")), name
    train = pq.read_table(os.path.join(fix, "training.parquet"))
    mlm = pq.read_table(os.path.join(fix, "mlm.parquet"))
    # same windows, different nested-column digests:
    assert train.num_rows == mlm.num_rows
    assert train.column("words_md5").equals(mlm.column("words_md5"))
    ev = pq.read_table(os.path.join(fix, "eval_metrics.parquet"))
    assert ev.num_rows == 1
    assert ev.column("n_examples")[0].as_py() > 0


def test_training_view_oracle_matches_engine_kernel(tmp_path):
    """oracle_training_views (loop-style) == engine _example_rows +
    deterministic mask spec, digest for digest, over a real corpus."""
    import hashlib

    from amazon_textract_transformer_pipeline_ray.oracle_independent import (
        oracle_training_views,
    )
    from amazon_textract_transformer_pipeline_ray.pipelines.training import (
        _example_rows,
    )

    paths = _corpus(tmp_path)
    checked = 0
    for p in paths[:2]:
        t = pq.read_table(p, columns=["conv_id", "turn_idx", "text"])
        for cid, tix, payload in zip(
                t.column("conv_id").to_pylist(),
                t.column("turn_idx").to_pylist(),
                t.column("text").to_pylist()):
            eng = _example_rows(payload, DEFAULT_CONFIG,
                                DEFAULT_CONFIG.max_seq_len,
                                with_labels=True)
            ner, _mlm, _ev = oracle_training_views(
                payload, DEFAULT_CONFIG, cid, tix)
            assert len(eng) == len(ner)
            for er, orow in zip(eng, ner):
                for k in ("page", "window_idx", "n_windows",
                          "word_start", "word_end", "n_tokens"):
                    assert er[k] == orow[k], (cid, tix, k)
                assert orow["words_md5"] == hashlib.md5(
                    "\x00".join(er["words"]).encode()).hexdigest()
                assert orow["labels_md5"] == hashlib.md5(
                    ",".join(str(int(v))
                             for v in er["word_labels"]).encode()
                ).hexdigest()
                checked += 1
    assert checked > 100

"""Metric-computer parity (reference ner.py:338-417 semantics) +
run-id sanitization (fn-trigger/main.py:57-72 semantics)."""

import numpy as np
import pandas as pd

from amazon_textract_transformer_pipeline_ray.functions.metrics import (
    PAD_LABEL,
    distributed_token_metrics,
    sanitize_run_id,
    token_classification_metrics,
)


def test_masked_accuracy_hand_case():
    # 2 examples, 4 classes (other = 3). PAD positions must be ignored.
    labels = np.array([
        [0, 1, 3, PAD_LABEL],
        [3, 3, PAD_LABEL, PAD_LABEL],
    ])
    preds = np.array([
        [0, 2, 3, 1],   # 2/3 correct on non-pad
        [3, 0, 0, 0],   # 1/2 correct
    ])
    m = token_classification_metrics(preds, labels, num_labels=4)
    assert m["n_examples"] == 2
    assert abs(m["acc"] - (2 / 3 + 1 / 2) / 2) < 1e-12


def test_focus_accuracy_excludes_both_other():
    # Example where every token is (other, other): no focus tokens at all.
    labels = np.array([[3, 3, 3]])
    preds = np.array([[3, 3, 3]])
    m = token_classification_metrics(preds, labels, num_labels=4)
    assert m["n_focus_examples"] == 0
    assert m["focus_acc"] == 0.0
    # focus_acc == 0 -> early-stopping helper falls back to acc - 1:
    assert m["focus_else_acc_minus_one"] == m["acc"] - 1

    # Mixed: (other,other) token excluded, others kept.
    labels = np.array([[3, 0, 3]])
    preds = np.array([[3, 0, 0]])  # token0 excluded; token1 correct; token2 focus+wrong
    m = token_classification_metrics(preds, labels, num_labels=4)
    assert m["n_focus_examples"] == 1
    assert abs(m["focus_acc"] - 0.5) < 1e-12


def test_distributed_matches_local(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(7)
    n_ex, max_len, n_cls = 50, 12, 5
    lens = rng.integers(1, max_len + 1, n_ex)
    labels2d = np.full((n_ex, max_len), PAD_LABEL)
    preds2d = np.zeros((n_ex, max_len), dtype=np.int64)
    rows = []
    for i, ln in enumerate(lens):
        lab = rng.integers(0, n_cls, ln)
        pred = rng.integers(0, n_cls, ln)
        labels2d[i, :ln] = lab
        preds2d[i, :ln] = pred
        rows.append({"labels": lab.tolist(), "pred_class": pred.tolist()})
    local = token_classification_metrics(preds2d, labels2d, n_cls)
    dist = distributed_token_metrics(rd.from_items(rows), n_cls)
    for k in ("n_examples", "n_focus_examples"):
        assert local[k] == dist[k]
    for k in ("acc", "focus_acc"):
        assert abs(local[k] - dist[k]) < 1e-9


def test_eval_metrics_query(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.fixtures import write_transcripts
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_eval_metrics, read_transcripts)

    paths = write_transcripts(str(tmp_path / "in"), 500, n_shards=2)
    m = build_eval_metrics(read_transcripts(paths))
    assert m["n_examples"] > 0
    # hints are the classifier's main feature, so self-eval accuracy is high:
    assert m["acc"] > 0.9
    assert 0 < m["focus_acc"] <= 1.0


def test_sanitize_run_id():
    assert sanitize_run_id("a b", "c/d") == "a-b-c-d"
    assert sanitize_run_id("x" * 100) == "x" * 80
    assert sanitize_run_id("a---b") == "a-b"
    assert sanitize_run_id("t\x01c", "p%q") == "t-c-p-q"
    # round-trips pandas-safe names
    assert "/" not in sanitize_run_id("2026-08-17T00:00:00Z", "doc (1).pdf")

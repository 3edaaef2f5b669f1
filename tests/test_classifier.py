"""Classifier plumbing: window mean aggregation (reference
inference.py:449-492 analog), pre-annotation passthrough, oversized-word
skip -> unannotated, split invariance."""

import numpy as np

from amazon_textract_transformer_pipeline_ray.functions.blocks import TurnBlocks
from amazon_textract_transformer_pipeline_ray.functions.classifier import (
    UNANNOTATED,
    classify_turn,
)

N_CLASSES = 7


def make_tb(words, hints, links=None, pre_class=None, pre_conf=None):
    n = len(words)
    tb = TurnBlocks()
    tb.words = list(words)
    tb.page_id = np.zeros(n, dtype=np.int16)
    tb.line_id = np.zeros(n, dtype=np.int32)
    tb.boxes01 = np.tile([0.0, 0.0, 0.1, 0.1], (n, 1))
    tb.ocr_conf = np.full(n, 99.0)
    tb.hint = np.array(hints, dtype=np.int16)
    tb.link = np.array(links if links else [0] * n, dtype=np.int8)
    tb.pre_class = np.array(pre_class if pre_class else [-1] * n, dtype=np.int16)
    tb.pre_conf = np.array(pre_conf if pre_conf else [0.0] * n, dtype=np.float64)
    return tb


def test_pred_class_follows_hint():
    tb = make_tb(["hello", "world", "nav"], [0, 0, 6])
    pred, conf = classify_turn(tb, N_CLASSES, 512)
    assert pred.tolist() == [0, 0, 6]
    assert (conf > 0.5).all() and (conf < 1.0).all()


def test_pre_annotations_pass_through():
    tb = make_tb(["a", "b"], [0, 0], pre_class=[3, -1], pre_conf=[0.42, 0.0])
    pred, conf = classify_turn(tb, N_CLASSES, 512)
    assert pred[0] == 3 and abs(conf[0] - 0.42) < 1e-12
    assert pred[1] == 0  # classified normally


def test_oversized_word_unannotated():
    # budget 2 tokens; "x"*40 = 10 tokens -> skipped by splitter -> UNANNOTATED
    tb = make_tb(["x" * 40, "ok"], [0, 0])
    pred, conf = classify_turn(tb, N_CLASSES, 2)
    assert pred[0] == UNANNOTATED and conf[0] == 0.0
    assert pred[1] == 0


def test_split_invariance():
    # same turn classified with different window budgets -> identical output
    # (window fan-out/fan-in must not change per-word means; SURVEY §7.4.2)
    words = [f"w{i}" * (1 + i % 5) for i in range(50)]
    tb = make_tb(words, [i % 7 for i in range(50)])
    pred_a, conf_a = classify_turn(tb, N_CLASSES, 512)
    pred_b, conf_b = classify_turn(tb, N_CLASSES, 8)
    pred_c, conf_c = classify_turn(tb, N_CLASSES, 5)
    assert pred_a.tolist() == pred_b.tolist() == pred_c.tolist()
    assert np.allclose(conf_a, conf_b) and np.allclose(conf_a, conf_c)


def test_empty_turn():
    tb = make_tb([], [])
    pred, conf = classify_turn(tb, N_CLASSES, 512)
    assert len(pred) == 0 and len(conf) == 0

"""Geometry kernels: 0-1000 quantization, bbox union, >=50% overlap labeler
(hand-computed, reference ner.py:38-152)."""

import numpy as np

from amazon_textract_transformer_pipeline_ray.functions.geometry import (
    quantize_boxes,
    union_box,
    word_label_matrix,
    word_single_labels,
)


def test_quantize_truncates():
    out = quantize_boxes(np.array([[0.1234, 0.9999, 0.5, 1.0]]))
    assert out.tolist() == [[123, 999, 500, 1000]]
    assert quantize_boxes(np.zeros((0, 4))).shape == (0, 4)


def test_union_box():
    b = np.array([[1, 2, 5, 6], [0, 3, 4, 9]])
    assert union_box(b).tolist() == [0, 2, 5, 9]


def test_overlap_labeler_basic():
    # word fully inside a class-0 annotation -> class 0
    words = np.array([[100, 100, 200, 200],   # inside ann0
                      [500, 500, 600, 600],   # no overlap -> other
                      [150, 100, 350, 200]])  # half inside ann0 (exactly 50%)
    anns = np.array([[0, 0, 250, 250]])
    labels = word_single_labels(words, anns, np.array([0]), n_classes=3)
    assert labels.tolist() == [0, 2, 0]  # exactly-half counts (>= half)


def test_overlap_labeler_less_than_half_is_other():
    words = np.array([[200, 100, 400, 200]])  # 25% inside
    anns = np.array([[0, 0, 250, 250]])
    assert word_single_labels(words, anns, np.array([0]), 3).tolist() == [2]


def test_overlap_ties_lowest_class_and_multilabel():
    # word covered by class-1 and class-0 annotations -> lowest (0) wins
    words = np.array([[100, 100, 200, 200]])
    anns = np.array([[0, 0, 300, 300], [50, 50, 250, 250]])
    cls = np.array([1, 0])
    m = word_label_matrix(words, anns, cls, 3)
    assert m.tolist() == [[1.0, 1.0, 0.0]]  # multi-label row sums to 2
    assert word_single_labels(words, anns, cls, 3).tolist() == [0]


def test_no_annotations_all_other():
    words = np.array([[0, 0, 10, 10]])
    m = word_label_matrix(words, np.zeros((0, 4)), np.zeros(0), 4)
    assert m.tolist() == [[0, 0, 0, 1]]

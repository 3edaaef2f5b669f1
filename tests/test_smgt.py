"""SMGT annotation-record parsing -> word labels (§1.3 + M7 chain)."""

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_ray.functions.smgt import (
    annotation_word_labels,
    parse_annotation_record,
)

RECORD = {
    "image_size": [{"height": 1000, "width": 2000, "depth": 3}],
    "annotations": [
        {"class_id": 1, "top": 100, "left": 200, "height": 300, "width": 400},
        {"class_id": 0, "top": 0, "left": 0, "height": 500, "width": 2000},
    ],
}


def test_parse_normalizes_to_1000_space():
    parsed = parse_annotation_record(RECORD)
    assert parsed.shape == (2, 5)
    # box 0: left 200/2000=0.1 -> 100; top 100/1000 -> 100;
    # right (200+400)/2000=0.3 -> 300; bottom (100+300)/1000 -> 400
    assert parsed[0].tolist() == [1, 100, 100, 300, 400]
    assert parsed[1].tolist() == [0, 0, 0, 1000, 500]


def test_empty_and_malformed():
    empty = parse_annotation_record(
        {"image_size": [{"height": 10, "width": 10}], "annotations": []})
    assert empty.shape == (0, 5)
    with pytest.raises((KeyError, IndexError)):
        parse_annotation_record({"annotations": [{"class_id": 0}]})


def test_word_labels_via_overlap():
    # words: one fully inside ann-0 region, one outside everything
    word_boxes = np.array([
        [150, 150, 250, 250],   # inside class-1 box (and class-0 box)
        [900, 900, 950, 950],   # outside all -> other
    ], dtype=np.int64)
    labels = annotation_word_labels(RECORD, word_boxes, n_classes=4)
    # tie between class 1 and class 0 (both cover >=50%) -> lowest class id
    assert labels[0] == 0
    assert labels[1] == 3  # other = n_classes - 1

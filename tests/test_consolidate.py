"""Pin field-consolidation semantics (reference fn-postprocess/main.py:84-180)
and value normalization (util/normalize.py:26-91) with hand-computed cases."""

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_ray.config import EngineConfig, FieldConfig
from amazon_textract_transformer_pipeline_ray.functions.assembler import Detection
from amazon_textract_transformer_pipeline_ray.functions.consolidate import (
    consolidate_turn,
    normalize_detections,
)
from amazon_textract_transformer_pipeline_ray.functions.dates import normalize_date_iso


def det(cls_id, text, conf, start=0):
    return Detection(
        class_id=cls_id, class_name=f"c{cls_id}", page_num=1, text=text,
        raw_text=None, confidence=conf, start=start, end=start + len(text),
        box=np.array([0, 0, 10, 10]),
    )


def cfg_with(fields):
    return EngineConfig(fields=fields, n_classes=8, other_class_id=7)


def test_noisy_or_and_normalization():
    cfg = cfg_with([FieldConfig(0, "f", select="confidence")])
    # same text twice: noisy-OR = 1 - (1-.84)(1-.86) = .9776
    tf = consolidate_turn([det(0, "V", 0.84), det(0, "V", 0.86)], cfg)
    fr = tf.fields[0]
    assert fr.num_detections == 2 and fr.num_detected_values == 1
    # sum of value confs = .9776 <= 1 -> normalizer max(1, sum) = 1, unchanged
    assert abs(fr.confidence - 0.9776) < 1e-9
    assert fr.value == "V"
    # two values whose noisy-OR sum exceeds 1 -> normalized by the sum:
    tf = consolidate_turn([det(0, "A", 0.9), det(0, "B", 0.8)], cfg)
    fr = tf.fields[0]
    s = 0.9 + 0.8
    assert abs(fr.confidence - 0.9 / s) < 1e-9
    assert fr.value == "A"


def test_selectors():
    dets = [det(0, "bbb", 0.5, 0), det(0, "a", 0.9, 10), det(0, "cc", 0.7, 20)]
    for sel, expect in [
        ("confidence", "a"), ("first", "bbb"), ("last", "cc"),
        ("longest", "bbb"), ("shortest", "a"),
    ]:
        cfg = cfg_with([FieldConfig(0, "f", select=sel)])
        tf = consolidate_turn(list(dets), cfg)
        assert tf.fields[0].value == expect, sel


def test_selector_first_last_use_detection_index_of_value():
    # value "X" seen at ix 0 and 2; value "Y" at ix 1.
    dets = [det(0, "X", 0.5), det(0, "Y", 0.6), det(0, "X", 0.5)]
    cfg = cfg_with([FieldConfig(0, "f", select="last")])
    # IxLastDetection: X -> 2, Y -> 1; desc -> X wins
    assert consolidate_turn(dets, cfg).fields[0].value == "X"
    cfg = cfg_with([FieldConfig(0, "f", select="first")])
    assert consolidate_turn(dets, cfg).fields[0].value == "X"


def test_multivalue_field():
    cfg = cfg_with([FieldConfig(0, "f")])  # no Select -> multi-value
    tf = consolidate_turn([det(0, "A", 0.6), det(0, "B", 0.9)], cfg)
    fr = tf.fields[0]
    assert fr.value is None
    # conf-desc order:
    assert [v for v, _ in fr.values] == ["B", "A"]
    s = 0.6 + 0.9
    expected = [0.9 / s, 0.6 / s]
    assert np.allclose([c for _, c in fr.values], expected)
    # field conf = mean of value confs (main.py:165-171):
    assert abs(fr.confidence - float(np.mean(expected))) < 1e-12


def test_empty_field_and_doc_confidence():
    cfg = cfg_with([
        FieldConfig(0, "req", select="confidence"),
        FieldConfig(1, "opt", select="confidence", optional=True),
        FieldConfig(2, "ign", ignore=True),
    ])
    tf = consolidate_turn([det(0, "V", 0.8)], cfg)
    names = [f.name for f in tf.fields]
    assert names == ["req", "opt"]  # ignored fields never consolidated
    opt = tf.fields[1]
    assert opt.value == "" and opt.confidence == 0.0
    # doc confidence: optional-and-zero excluded (main.py:173-179)
    assert abs(tf.confidence - 0.8) < 1e-9
    # no detections at all: required field 0 -> doc conf 0
    tf = consolidate_turn([], cfg)
    assert tf.confidence == 0.0


def test_ignored_class_detections_excluded():
    cfg = cfg_with([
        FieldConfig(0, "f", select="confidence"),
        FieldConfig(2, "ign", ignore=True),
    ])
    tf = consolidate_turn([det(2, "X", 0.9), det(0, "V", 0.7)], cfg)
    assert len(tf.fields) == 1
    assert tf.fields[0].value == "V"


def test_date_normalizer_and_grouping():
    assert normalize_date_iso("07/08/2024") == "2024-08-07"
    assert normalize_date_iso("07.08.2024") == "2024-08-07"
    assert normalize_date_iso("2024-08-07") == "2024-08-07"
    assert normalize_date_iso("Aug 7, 2024") == "2024-08-07"
    assert normalize_date_iso("7 Aug 2024") == "2024-08-07"
    assert normalize_date_iso("not a date") == "not a date"

    cfg = cfg_with([
        FieldConfig(3, "date", select="confidence", normalizer="date_iso",
                    normalizer_prompt="p: "),
    ])
    dets = [det(3, "07/08/2024", 0.6), det(3, "2024-08-07", 0.7)]
    normalize_detections(dets, cfg)
    assert dets[0].text == "2024-08-07" and dets[0].raw_text == "07/08/2024"
    assert dets[1].text == "2024-08-07" and dets[1].raw_text == "2024-08-07"
    tf = consolidate_turn(dets, cfg)
    fr = tf.fields[0]
    # grouped AFTER normalization -> one value, noisy-OR of both:
    assert fr.num_detected_values == 1
    assert abs(fr.confidence - (1 - 0.4 * 0.3)) < 1e-9


def test_invalid_selector_rejected():
    with pytest.raises(ValueError):
        FieldConfig(0, "f", select="bogus")

"""Pin extract_entities semantics (reference extract.py:93-131) with
hand-computed cases, including the quirks: run continuation across
line/page boundaries, page-num-at-flush, NO trailing flush, " "/"\n" join
rules, min-confidence across mixed 0-1 / 0-100 scales."""

import numpy as np

from amazon_textract_transformer_pipeline_ray.functions.assembler import assemble_turn
from amazon_textract_transformer_pipeline_ray.functions.blocks import TurnBlocks

# active (non-ignored) classes, as config.entity_classes would give:
ENTITY_CLASSES = {0: "content", 1: "title", 3: "date"}


def make_tb(words, lines, pages, boxes=None, ocr=None):
    tb = TurnBlocks()
    n = len(words)
    tb.words = list(words)
    tb.line_id = np.array(lines, dtype=np.int32)
    tb.page_id = np.array(pages, dtype=np.int16)
    tb.boxes01 = (np.array(boxes, dtype=np.float64) if boxes is not None
                  else np.tile([0.1, 0.1, 0.2, 0.2], (n, 1)))
    tb.ocr_conf = (np.array(ocr, dtype=np.float64) if ocr is not None
                   else np.full(n, 99.0))
    tb.hint = np.zeros(n, dtype=np.int16)
    tb.link = np.zeros(n, dtype=np.int8)
    tb.pre_class = np.full(n, -1, dtype=np.int16)
    tb.pre_conf = np.zeros(n, dtype=np.float64)
    return tb


def run(words, lines, pages, classes, confs=None, **kw):
    tb = make_tb(words, lines, pages, **kw)
    pred = np.array(classes, dtype=np.int16)
    conf = (np.array(confs, dtype=np.float64) if confs is not None
            else np.full(len(words), 0.9))
    return assemble_turn(tb, pred, conf, ENTITY_CLASSES)


def test_simple_runs_and_text():
    # line0: title title; line1: content content other content
    out = run(
        ["Big", "Title", "hello", "world", "nav", "again"],
        [0, 0, 1, 1, 1, 1],
        [0, 0, 0, 0, 0, 0],
        [1, 1, 0, 0, 6, 0],
    )
    # extracted_text: content words = all class in {0,1,3}:
    assert out.extracted_text == "Big Title\nhello world again"
    assert out.n_words == 6 and out.n_content_words == 5
    assert abs(out.boilerplate_ratio - 1 / 6) < 1e-9
    # detections: title run flushed by class change at "hello"; content run
    # "hello world" flushed by "nav"; trailing "again" run NEVER flushed:
    assert [(d.class_id, d.text) for d in out.detections] == [
        (1, "Big Title"), (0, "hello world")]
    # offsets point into extracted_text:
    d0, d1 = out.detections
    assert out.extracted_text[d0.start:d0.end] == "Big Title"
    assert out.extracted_text[d1.start:d1.end] == "hello world"


def test_run_continues_across_lines_with_newline_join():
    # class 0 run spanning lines 0-1, then a class-change word on line 1
    out = run(
        ["a", "b", "c", "t"],
        [0, 0, 1, 1],
        [0, 0, 0, 0],
        [0, 0, 0, 1],
    )
    assert [(d.class_id, d.text) for d in out.detections] == [(0, "a b\nc")]
    d = out.detections[0]
    assert out.extracted_text == "a b\nc t"
    assert out.extracted_text[d.start:d.end] == "a b\nc"


def test_trailing_run_dropped_even_whole_doc():
    out = run(["x", "y"], [0, 0], [0, 0], [0, 0])
    assert out.detections == []
    assert out.extracted_text == "x y"  # content text still extracted


def test_page_num_is_flush_page():
    # run of class 1 on page 0, flushed by a class-0 word on page 1:
    out = run(
        ["t1", "t2", "c1", "c2", "zz"],
        [0, 0, 1, 1, 2],
        [0, 0, 1, 1, 1],
        [1, 1, 0, 0, 1],
    )
    # title run flushed at word "c1" (page 1) -> page_num = 2 (1-based!)
    assert out.detections[0].class_id == 1
    assert out.detections[0].page_num == 2
    # content run flushed at "zz" (page 1) -> page_num = 2
    assert out.detections[1].class_id == 0
    assert out.detections[1].page_num == 2


def test_unknown_and_ignored_classes_are_other():
    # class 4 not in ENTITY_CLASSES (ignored), -1 unannotated:
    out = run(
        ["a", "b", "c", "d"],
        [0, 0, 0, 0],
        [0] * 4,
        [0, 4, -1, 1],
    )
    # "a" run flushed when class changes at "b" (other); title "d" trailing
    # -> dropped.
    assert [(d.class_id, d.text) for d in out.detections] == [(0, "a")]
    assert out.extracted_text == "a d"
    assert out.n_content_words == 2


def test_confidence_min_mixed_scales():
    # reference compares PredictedClassConfidence (0-1) against OCR
    # confidence (0-100) as-is (extract.py:46-54):
    out = run(
        ["a", "b", "x"],
        [0, 0, 0],
        [0] * 3,
        [0, 0, 1],
        confs=[0.8, 0.6, 0.9],
        ocr=[99.0, 0.5, 98.0],  # b's OCR conf lower than its pred conf
    )
    d = out.detections[0]
    assert d.text == "a b"
    assert abs(d.confidence - 0.5) < 1e-12  # min(0.8, 99), min(0.6, 0.5)


def test_bbox_union_quantized():
    out = run(
        ["a", "b", "x"],
        [0, 0, 0],
        [0] * 3,
        [0, 0, 1],
        boxes=[[0.1, 0.2, 0.3, 0.4], [0.25, 0.1, 0.5, 0.35], [0, 0, 1, 1]],
    )
    d = out.detections[0]
    assert d.box.tolist() == [100, 100, 500, 400]


def test_empty_lines_skipped_in_extracted_text():
    # middle line all boilerplate -> no empty line in extracted_text;
    # runs of SAME class separated by an other-run produce two detections:
    out = run(
        ["a", "nav", "b", "t"],
        [0, 1, 2, 2],
        [0] * 4,
        [0, 6, 0, 1],
    )
    assert out.extracted_text == "a\nb t"
    assert [(d.class_id, d.text) for d in out.detections] == [
        (0, "a"), (0, "b")]


def test_batched_assemble_equals_per_turn_on_fixture_corpus():
    """``assemble_turns`` (one vectorized pass over the concatenated word
    axis) must equal per-turn ``assemble_turn`` on every field, over a
    real mixed-dialect fixture corpus including empty and no-content
    turns."""
    import glob

    import pyarrow.parquet as pq

    from amazon_textract_transformer_pipeline_ray.config import DEFAULT_CONFIG as cfg
    from amazon_textract_transformer_pipeline_ray.fixtures import write_transcripts
    from amazon_textract_transformer_pipeline_ray.functions.assembler import (
        assemble_turns)
    from amazon_textract_transformer_pipeline_ray.functions.classifier import (
        classify_turns)
    from amazon_textract_transformer_pipeline_ray.functions.turn import parse_payload

    paths = write_transcripts("/tmp/attp_transcripts/test-asm-2k", 2000,
                              n_shards=2)
    texts = []
    for p in sorted(paths):
        texts.extend(pq.read_table(p, columns=["text"]).column(
            "text").to_pylist())
    tbs = [parse_payload(t) for t in texts]
    # synthetic edge turns: empty, single word (trailing run dropped),
    # all-boilerplate (no content):
    preds = classify_turns(tbs, cfg.n_classes, cfg.max_seq_len)
    batched = assemble_turns(tbs, preds, cfg.entity_classes)
    assert len(batched) == len(tbs)
    for tb, (pc, pf), got in zip(tbs, preds, batched):
        exp = assemble_turn(tb, pc, pf, cfg.entity_classes)
        assert got.extracted_text == exp.extracted_text
        assert got.n_words == exp.n_words
        assert got.n_content_words == exp.n_content_words
        assert len(got.detections) == len(exp.detections)
        for dg, de in zip(got.detections, exp.detections):
            assert (dg.class_id, dg.class_name, dg.page_num, dg.text,
                    dg.start, dg.end) == (
                de.class_id, de.class_name, de.page_num, de.text,
                de.start, de.end)
            assert dg.confidence == de.confidence
            assert dg.box.tolist() == de.box.tolist()


def test_batched_assemble_edge_turns():
    """Empty turns, single-word turns (trailing run never flushed) and
    no-content turns mixed in one batch."""
    from amazon_textract_transformer_pipeline_ray.functions.assembler import (
        assemble_turns)

    tb_empty = make_tb([], [], [])
    tb_single = make_tb(["word"], [0], [0])
    tb_nocontent = make_tb(["x", "y"], [0, 0], [0, 0])
    tb_normal = make_tb(["a", "b", "c"], [0, 0, 1], [0, 0, 0])
    tbs = [tb_empty, tb_single, tb_nocontent, tb_normal]
    preds = [
        (np.zeros(0, dtype=np.int16), np.zeros(0)),
        (np.array([0], dtype=np.int16), np.array([0.9])),
        (np.array([6, 6], dtype=np.int16), np.array([0.9, 0.9])),  # inactive
        (np.array([0, 0, 1], dtype=np.int16), np.array([0.5, 0.6, 0.7])),
    ]
    got = assemble_turns(tbs, preds, ENTITY_CLASSES)
    for tb, (pc, pf), g in zip(tbs, preds, got):
        e = assemble_turn(tb, pc, pf, ENTITY_CLASSES)
        assert (g.extracted_text, g.n_words, g.n_content_words,
                len(g.detections)) == (
            e.extracted_text, e.n_words, e.n_content_words,
            len(e.detections))

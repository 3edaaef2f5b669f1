"""Spot-check renderer (reference notebooks/util/viz.py analog):
hand-computed inline markup and geometry sketches."""

from amazon_textract_transformer_pipeline_ray.functions.viz import (
    render_page_sketch,
    render_turn,
    render_turn_text,
)


def _span(start, end, name="title", conf=0.9, page=1,
          x0=0, y0=0, x1=1000, y1=100):
    return {"class_name": name, "confidence": conf, "start": start,
            "end": end, "page": page, "x0": x0, "y0": y0, "x1": x1,
            "y1": y1}


def test_render_turn_text_inline_markup():
    txt = "hello world and more"
    out = render_turn_text(txt, [_span(0, 5), _span(6, 11, "date", 0.5)])
    assert out == ("⟦title|0.90 hello⟧ ⟦date|0.50 world⟧ and more")
    # no spans -> text unchanged; offsets clamped to text bounds
    assert render_turn_text(txt, []) == txt
    assert render_turn_text("ab", [_span(0, 99)]) == "⟦title|0.90 ab⟧"


def test_render_page_sketch_geometry():
    # one box covering the left half, rows 0..half
    out = render_page_sketch(
        [_span(0, 1, name="title", x0=0, x1=500, y0=0, y1=500)],
        width=10, height=4)
    lines = out.splitlines()
    assert lines[0] == "+" + "-" * 10 + "+"
    assert lines[1] == "|ttttt     |"   # left half filled
    assert lines[2] == "|ttttt     |"   # 500/1000 * 4 rows -> rows 0..1
    assert lines[3] == "|          |"
    # a second overlapping box does not overwrite, only fills blanks
    out2 = render_page_sketch(
        [_span(0, 1, name="title", x0=0, x1=500, y0=0, y1=500),
         _span(0, 1, name="date", x0=300, x1=800, y0=0, y1=250)],
        width=10, height=4)
    assert out2.splitlines()[1] == "|tttttddd  |"


def test_render_turn_block():
    row = {"conv_id": "c1", "turn_idx": 2, "role": "user",
           "doc_confidence": 0.75, "review_needed": True,
           "extracted_text": "abc def",
           "spans": [_span(0, 3, page=2)]}
    out = render_turn(row)
    assert out.splitlines()[0] == (
        "=== c1 turn 2 role=user conf=0.75 spans=1 [REVIEW] ===")
    assert "⟦title|0.90 abc⟧ def" in out
    assert "--- page 2 ---" in out

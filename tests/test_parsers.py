"""Parser tests: HTML scan rules, layout-JSON traversal order, chunk merge,
plain text, dialect detection."""

import json

import numpy as np

from amazon_textract_transformer_pipeline_ray.functions.blocks import (
    CLS_CODE, CLS_CONTENT, CLS_DATE, CLS_OTHER, CLS_SUMMARY, CLS_TITLE,
)
from amazon_textract_transformer_pipeline_ray.functions.html_parser import parse_html
from amazon_textract_transformer_pipeline_ray.functions.layout_parser import (
    merge_response_chunks, parse_layout_json,
)
from amazon_textract_transformer_pipeline_ray.functions.plain_parser import parse_plain
from amazon_textract_transformer_pipeline_ray.functions.turn import detect_dialect


def test_html_basic_blocks_and_hints():
    tb = parse_html(
        "<html><head><title>My Page</title><script>junk here</script></head>"
        "<body><nav><a href='/'>home</a> <a href='/d'>docs</a></nav>"
        "<main><h1>Big Title</h1><p>hello world 2024-01-02</p>"
        "<pre>code words</pre></main>"
        "<footer><a href='/t'>terms</a></footer></body></html>"
    )
    assert tb.words == ["My", "Page", "home", "docs", "Big", "Title",
                        "hello", "world", "2024-01-02", "code", "words",
                        "terms"]
    hints = tb.hint.tolist()
    assert hints[0:2] == [CLS_TITLE] * 2           # title
    assert hints[2:4] == [CLS_OTHER] * 2           # nav links
    assert hints[4:6] == [CLS_TITLE] * 2           # h1
    assert hints[6:8] == [CLS_CONTENT] * 2         # p
    assert hints[8] == CLS_DATE                    # date word in p
    assert hints[9:11] == [CLS_CODE] * 2           # pre
    assert hints[11] == CLS_OTHER                  # footer link
    # script content dropped entirely:
    assert "junk" not in tb.words
    # line structure: title / nav / h1 / p / pre / footer = 6 lines
    assert len(set(tb.line_id.tolist())) == 6
    # link words flagged:
    assert tb.link.tolist() == [0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 1]


def test_html_comment_and_blockquote_and_inline_link():
    tb = parse_html(
        "<body><!-- secret words --><p>alpha <a href='#'>beta</a> gamma</p>"
        "<blockquote>quoted text</blockquote></body>"
    )
    assert tb.words == ["alpha", "beta", "gamma", "quoted", "text"]
    assert tb.hint.tolist() == [
        CLS_CONTENT, CLS_OTHER, CLS_CONTENT, CLS_SUMMARY, CLS_SUMMARY]
    assert "secret" not in tb.words


def test_html_empty_and_geometry_ranges():
    assert parse_html("").n_words == 0
    tb = parse_html("<p>one two</p><p>three</p>")
    assert tb.boxes01.min() >= 0 and tb.boxes01.max() <= 1
    # second line lower than first:
    assert tb.boxes01[2, 1] > tb.boxes01[0, 1]


def _mini_layout_doc(enrich_classes=None):
    """Two lines x two words, one page."""
    blocks = [
        {"BlockType": "PAGE", "Id": "p1",
         "Relationships": [{"Type": "CHILD", "Ids": ["l1", "l2"]}]},
        {"BlockType": "LINE", "Id": "l1",
         "Relationships": [{"Type": "CHILD", "Ids": ["w1", "w2"]}]},
        {"BlockType": "LINE", "Id": "l2",
         "Relationships": [{"Type": "CHILD", "Ids": ["w3", "w4"]}]},
    ]
    for i, (wid, text, left, top) in enumerate([
        ("w1", "alpha", 0.0, 0.0), ("w2", "beta", 0.5, 0.0),
        ("w3", "gamma", 0.0, 0.5), ("w4", "2024-05-06", 0.5, 0.5),
    ]):
        b = {"BlockType": "WORD", "Id": wid, "Text": text,
             "Confidence": 95.5,
             "Geometry": {"BoundingBox": {
                 "Left": left, "Top": top, "Width": 0.4, "Height": 0.4}}}
        if enrich_classes is not None:
            b["PredictedClass"] = enrich_classes[i]
            b["PredictedClassConfidence"] = 0.9
        blocks.append(b)
    return {"DocumentMetadata": {"Pages": 1}, "Blocks": blocks}


def test_layout_traversal_order_and_hints():
    tb = parse_layout_json(json.dumps(_mini_layout_doc()))
    assert tb.words == ["alpha", "beta", "gamma", "2024-05-06"]
    assert tb.line_id.tolist() == [0, 0, 1, 1]
    assert tb.page_id.tolist() == [0, 0, 0, 0]
    # first line of page 1 -> TITLE; date word -> DATE; else CONTENT
    assert tb.hint.tolist() == [CLS_TITLE, CLS_TITLE, CLS_CONTENT, CLS_DATE]
    assert tb.pre_class.tolist() == [-1, -1, -1, -1]
    assert np.allclose(tb.boxes01[0], [0.0, 0.0, 0.4, 0.4])
    assert np.allclose(tb.ocr_conf, 95.5)


def test_layout_enriched_passthrough():
    tb = parse_layout_json(json.dumps(_mini_layout_doc([0, 0, 6, 3])))
    assert tb.pre_class.tolist() == [0, 0, 6, 3]
    assert np.allclose(tb.pre_conf, 0.9)


def test_layout_chunk_merge():
    doc = _mini_layout_doc()
    blocks = doc["Blocks"]
    chunks = [dict(doc, Blocks=blocks[:2]), {"Blocks": blocks[2:]}]
    merged = merge_response_chunks(chunks)
    assert len(merged["Blocks"]) == len(blocks)
    assert merged["DocumentMetadata"] == {"Pages": 1}
    tb = parse_layout_json(json.dumps(chunks))
    assert tb.words == ["alpha", "beta", "gamma", "2024-05-06"]


def test_plain_parser():
    tb = parse_plain("one two\n\nthree 01/02/2024")
    assert tb.words == ["one", "two", "three", "01/02/2024"]
    assert tb.line_id.tolist() == [0, 0, 1, 1]
    assert tb.hint.tolist() == [CLS_CONTENT, CLS_CONTENT, CLS_CONTENT, CLS_DATE]
    assert parse_plain("").n_words == 0
    assert parse_plain("  \n  ").n_words == 0


def test_detect_dialect():
    assert detect_dialect('{"Blocks": []}') == "layout"
    assert detect_dialect(" [{}]") == "layout"
    assert detect_dialect("<p>x</p>") == "html"
    assert detect_dialect("plain words only") == "plain"


def test_layout_decoder_strictness_parity():
    """Payloads stdlib json parses must parse as LAYOUT regardless of
    whether the optional fast decoder (orjson) is installed: orjson
    rejects NaN/Infinity literals and >64-bit ints that stdlib accepts,
    and the retry in ``_json_loads`` must absorb that difference rather
    than rerouting the row to the plain-text fallback."""
    doc = _mini_layout_doc()
    # stdlib-only constructs: a NaN confidence and a 2**70 metadata int
    payload = json.dumps(doc).replace('"Confidence": 95.5',
                                      '"Confidence": NaN', 1)
    payload = payload.replace('"Pages": 1', f'"Pages": {2**70}', 1)
    json.loads(payload)  # sanity: stdlib accepts this
    tb = parse_layout_json(payload)
    assert tb.words == ["alpha", "beta", "gamma", "2024-05-06"]
    # NaN propagates into ocr_conf for the first word (not a crash):
    assert np.isnan(tb.ocr_conf[0])
    assert tb.ocr_conf[1] == 95.5


def test_parse_payloads_batch_equals_per_turn():
    """``parse_payloads_batch`` (vectorized blocks build for html/plain)
    must produce field-identical TurnBlocks to per-turn ``parse_payload``
    across all three dialects, including empty payloads."""
    import glob

    import pyarrow.parquet as pq

    from amazon_textract_transformer_pipeline_ray.fixtures import write_transcripts
    from amazon_textract_transformer_pipeline_ray.functions.turn import (
        parse_payload, parse_payloads_batch)

    paths = write_transcripts("/tmp/attp_transcripts/test-parse-2k", 2000,
                              n_shards=2)
    texts = ["", "   \n ", "<p>solo</p>", "one two"]
    for p in sorted(paths):
        texts.extend(pq.read_table(p, columns=["text"]).column(
            "text").to_pylist())
    got = parse_payloads_batch(texts)
    for t, g in zip(texts, got):
        e = parse_payload(t)
        assert g.words == e.words
        assert g.line_id.tolist() == e.line_id.tolist()
        assert g.page_id.tolist() == e.page_id.tolist()
        assert g.hint.tolist() == e.hint.tolist()
        assert g.link.tolist() == e.link.tolist()
        assert g.pre_class.tolist() == e.pre_class.tolist()
        assert g.pre_conf.tolist() == e.pre_conf.tolist()
        assert g.ocr_conf.tolist() == e.ocr_conf.tolist()
        assert g.boxes01.tolist() == e.boxes01.tolist()


def test_parse_payloads_batch_respects_registered_parser():
    """A user-registered parser must bypass the vectorized fast path."""
    from amazon_textract_transformer_pipeline_ray.functions.plain_parser import (
        parse_plain)
    from amazon_textract_transformer_pipeline_ray.functions.turn import (
        PARSERS, parse_payloads_batch, register_parser)

    def custom(payload):
        tb = parse_plain(payload)
        tb.hint = np.full(len(tb.words), 5, dtype=np.int16)
        return tb

    try:
        register_parser("plain", custom)
        out = parse_payloads_batch(["hello world"])
        assert out[0].hint.tolist() == [5, 5]
    finally:
        register_parser("plain", parse_plain)


def test_from_word_lists_batch_general_equality():
    """``from_word_lists_batch`` must equal per-turn ``from_word_lists``
    on every field for arbitrary single-page specs, including empty
    lines inside a turn, all-empty turns, default hints/links, and
    specs with no lines at all."""
    from amazon_textract_transformer_pipeline_ray.functions.blocks import (
        from_word_lists, from_word_lists_batch)

    specs = [
        ([["alpha", "beta"], ["gamma"]], [[1, 0], [3]], [[0, 1], [0]]),
        ([], None, None),                      # no lines
        ([["solo"]], None, None),              # defaults
        ([[]], [[]], [[]]),                    # one empty line
        ([[], ["x", "y", "z"], []], [[], [0, 0, 0], []], None),
        ([["w"] * 7], [[0] * 7], [[1] * 7]),
    ]
    got = from_word_lists_batch(specs)
    for (lw, lh, ll), g in zip(specs, got):
        e = from_word_lists(lw, [0] * len(lw), lh, ll)
        assert g.words == e.words
        for f in ("line_id", "page_id", "hint", "link", "ocr_conf",
                  "pre_class", "pre_conf"):
            assert getattr(g, f).tolist() == getattr(e, f).tolist(), f
        assert g.boxes01.tolist() == e.boxes01.tolist()

"""Property tests from SURVEY.md §5: split-invariance, salted-partition
skew spreading, and hypothesis fuzzing of the parser/assembler contracts."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from amazon_textract_transformer_pipeline_ray.config import DEFAULT_CONFIG, EngineConfig
from amazon_textract_transformer_pipeline_ray.fixtures import gen_transcripts
from amazon_textract_transformer_pipeline_ray.functions.assembler import assemble_turn
from amazon_textract_transformer_pipeline_ray.functions.blocks import from_word_lists
from amazon_textract_transformer_pipeline_ray.functions.html_parser import parse_html
from amazon_textract_transformer_pipeline_ray.functions.turn import (
    extract_turn,
    parse_payload,
)
from amazon_textract_transformer_pipeline_ray.stages.extract import partition_for


def test_split_invariance():
    """max_seq_len must not change extracted text or span texts: token
    probabilities depend only on the token's global index, so window
    overlap from the final-window pullback averages identical vectors
    (classifier.py logit spec; reference splitting.py:63-144)."""
    t = gen_transcripts(200, seed=11)
    payloads = t.column("text").to_pylist()[:120]
    base = [extract_turn(p, EngineConfig(max_seq_len=512)) for p in payloads]
    for msl in (32, 64, 128):
        cfg = EngineConfig(max_seq_len=msl)
        other = [extract_turn(p, cfg) for p in payloads]
        for b, o in zip(base, other):
            if b is None:
                assert o is None
                continue
            assert o.extracted_text == b.extracted_text
            assert [d.text for d in o.detections] == [d.text for d in b.detections]
            assert [d.class_id for d in o.detections] == [
                d.class_id for d in b.detections]


def test_salting_spreads_mega_conversation():
    """A conversation longer than salt_span must span several partitions
    (explicit skew mitigation, SURVEY §7.3); short conversations stay in
    exactly one."""
    cfg = DEFAULT_CONFIG  # salt_span=512, num_partitions=32
    mega_parts = {partition_for("conv-mega", tix, cfg) for tix in range(4096)}
    assert len(mega_parts) > 4, "mega-conversation not spread"
    short_parts = {partition_for("conv-00000042", tix, cfg) for tix in range(400)}
    assert len(short_parts) == 1, "short conversation unnecessarily split"
    # deterministic across calls:
    assert partition_for("conv-mega", 1000, cfg) == partition_for(
        "conv-mega", 1000, cfg)
    assert all(0 <= p < cfg.num_partitions for p in mega_parts)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_parser_never_crashes_and_boxes_normalized(payload):
    tb = parse_payload(payload)
    n = tb.n_words
    assert len(tb.page_id) == n and len(tb.line_id) == n
    if n:
        assert tb.boxes01.min() >= 0.0 and tb.boxes01.max() <= 1.0
        assert all(w for w in tb.words)  # no empty word tokens


_tag = st.sampled_from(
    ["p", "div", "h1", "nav", "a", "pre", "script", "em", "li", "br"])


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.one_of(
        st.builds(lambda t: f"<{t}>", _tag),
        st.builds(lambda t: f"</{t}>", _tag),
        st.text(alphabet="ab c.1-", min_size=1, max_size=12),
        st.just("<!-- c -->"),
    ),
    max_size=40,
))
def test_html_parser_fuzz(parts):
    tb = parse_html("".join(parts))
    n = tb.n_words
    assert len(tb.hint) == n and len(tb.link) == n
    if n:
        # line ids are non-decreasing in block order:
        assert (np.diff(tb.line_id) >= 0).all()


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_assembler_span_offsets_contract(data):
    """extracted_text[start:end] == span text, for arbitrary class
    assignments over a random word grid (the M3/E1 offset contract)."""
    n_lines = data.draw(st.integers(1, 5))
    line_words = [
        data.draw(st.lists(st.text(alphabet="abcXYZ09", min_size=1, max_size=6),
                           min_size=1, max_size=6))
        for _ in range(n_lines)
    ]
    tb = from_word_lists(line_words, line_pages=[0] * n_lines)
    n = tb.n_words
    classes = np.array(data.draw(st.lists(
        st.integers(-1, 6), min_size=n, max_size=n)), dtype=np.int64)
    conf = np.full(n, 0.9)
    out = assemble_turn(tb, classes, conf, DEFAULT_CONFIG.entity_classes)
    for d in out.detections:
        assert out.extracted_text[d.start:d.end] == d.text
        assert 0 <= d.class_id < 7
        assert (d.box[:2] <= d.box[2:]).all()


_block = st.deferred(lambda: st.fixed_dictionaries(
    {"Id": st.text(alphabet="abc123", min_size=1, max_size=4),
     "BlockType": st.sampled_from(["PAGE", "LINE", "WORD", "JUNK"])},
    optional={
        "Text": st.text(alphabet="xyz 9", max_size=8),
        "Confidence": st.floats(0, 100, allow_nan=False),
        "PredictedClass": st.integers(-5, 70),
        "Geometry": st.fixed_dictionaries({
            "BoundingBox": st.fixed_dictionaries({
                "Left": st.floats(-0.2, 1.2, allow_nan=False),
                "Top": st.floats(-0.2, 1.2, allow_nan=False),
                "Width": st.floats(0, 1.2, allow_nan=False),
                "Height": st.floats(0, 1.2, allow_nan=False)})}),
        "Relationships": st.lists(st.fixed_dictionaries({
            "Type": st.sampled_from(["CHILD", "OTHER"]),
            "Ids": st.lists(st.text(alphabet="abc123", min_size=1,
                                    max_size=4), max_size=4)}), max_size=2),
    }))


@settings(max_examples=150, deadline=None)
@given(st.lists(_block, max_size=12))
def test_layout_parser_fuzz(blocks):
    """Arbitrary (even malformed) Textract-shaped block soup must never
    crash the pipeline path: parse falls back / degrades, invariants hold."""
    import json as _json

    payload = _json.dumps({"DocumentMetadata": {"Pages": 1},
                           "Blocks": blocks})
    from amazon_textract_transformer_pipeline_ray.config import DEFAULT_CONFIG
    from amazon_textract_transformer_pipeline_ray.functions.turn import (
        extract_turn)

    got = extract_turn(payload, DEFAULT_CONFIG)
    if got is not None:
        assert got.n_words > 0
        assert len(got.extracted_text) >= 0
        for d in got.detections:
            assert got.extracted_text[d.start:d.end] == d.text


# --- batched-kernel equivalence under fuzz (round-3 batching waves) -------

_word = st.text(alphabet="abcXYZ09./-", min_size=1, max_size=10)
_payload = st.one_of(
    st.text(max_size=200),                              # plain / garbage
    st.builds(lambda parts: "".join(parts), st.lists(   # html-ish
        st.one_of(
            st.builds(lambda t: f"<{t}>", _tag),
            st.builds(lambda t: f"</{t}>", _tag),
            st.text(alphabet="ab c.1-\n", min_size=1, max_size=16),
        ), max_size=30)),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_payload, max_size=12))
def test_batched_extraction_equals_scalar_under_fuzz(payloads):
    """The whole batched path (parse_payloads_batch -> classify_turns ->
    assemble_turns, as composed by extract_turns_batch) must equal the
    scalar extract_turn per payload on every output field, for arbitrary
    payload mixes including empty and malformed ones."""
    from amazon_textract_transformer_pipeline_ray.functions.turn import (
        extract_turn, extract_turns_batch)

    got = extract_turns_batch(payloads, DEFAULT_CONFIG)
    for p, g in zip(payloads, got):
        e = extract_turn(p, DEFAULT_CONFIG)
        if e is None:
            assert g is None
            continue
        assert g.extracted_text == e.extracted_text
        assert g.boilerplate_ratio == e.boilerplate_ratio
        assert g.n_words == e.n_words
        assert g.pred_class.tolist() == e.pred_class.tolist()
        assert g.pred_conf.tolist() == e.pred_conf.tolist()
        assert len(g.detections) == len(e.detections)
        for dg, de in zip(g.detections, e.detections):
            assert (dg.class_id, dg.text, dg.raw_text, dg.start, dg.end,
                    dg.page_num) == (
                de.class_id, de.text, de.raw_text, de.start, de.end,
                de.page_num)
            assert dg.confidence == de.confidence
            assert dg.box.tolist() == de.box.tolist()
        assert [
            (f.name, f.value, f.confidence, f.num_detections)
            for f in g.fields.fields
        ] == [
            (f.name, f.value, f.confidence, f.num_detections)
            for f in e.fields.fields
        ]


@given(st.lists(st.tuples(st.integers(0, 4),           # conv id
                          st.integers(1, 700)),        # window tokens
                min_size=1, max_size=200),
       st.integers(64, 512))
@settings(max_examples=200, deadline=None)
def test_greedy_pack_invariants(rows, budget):
    """greedy_pack: packs never exceed the budget unless they hold a
    single oversized window; pack ids are dense per conversation; the
    scan is greedy (a window never fits in the pack it was split from)."""
    from amazon_textract_transformer_pipeline_ray.pipelines.training import (
        greedy_pack)

    rows = sorted(rows)                       # (conv, ...) sorted order
    conv = np.array([c for c, _ in rows])
    toks = np.array([t for _, t in rows], dtype=np.int64)
    new_conv = np.empty(len(rows), dtype=bool)
    new_conv[0] = True
    new_conv[1:] = conv[1:] != conv[:-1]
    pack = greedy_pack(new_conv, toks, budget)

    for c in np.unique(conv):
        m = conv == c
        p, t = pack[m], toks[m]
        # dense 0..max ids, non-decreasing
        assert p[0] == 0 and (np.diff(p) >= 0).all() and (np.diff(p) <= 1).all()
        sums = np.bincount(p, weights=t).astype(np.int64)
        sizes = np.bincount(p)
        # over-budget packs are exactly the singleton oversized windows
        for s, n in zip(sums, sizes):
            assert s <= budget or n == 1
        # greedy: the first window of pack k+1 would overflow pack k
        firsts = np.flatnonzero(np.diff(p) == 1) + 1
        for f in firsts:
            assert sums[p[f] - 1] + t[f] > budget


@given(st.lists(st.lists(st.sampled_from("abc"), min_size=0, max_size=24)
                .map(lambda ws: " ".join(ws)),
                min_size=1, max_size=12))
@settings(max_examples=150, deadline=None)
def test_batch_gram_kernels_vs_naive(texts):
    """_batch_gram_rows / _batch_gram_pos_rows match a naive per-doc
    n-gram scan (tiny alphabet forces heavy cross-doc collisions)."""
    from amazon_textract_transformer_pipeline_ray.pipelines.dedup import (
        NGRAM_N, _batch_gram_pos_rows, _batch_gram_rows, _tokens)

    def naive(texts):
        # (doc, gram-tuple) -> sorted positions
        out = {}
        totals = []
        for d, t in enumerate(texts):
            toks = _tokens(t)
            totals.append(max(len(toks) - NGRAM_N + 1, 0))
            for p in range(max(len(toks) - NGRAM_N + 1, 0)):
                out.setdefault((d, tuple(toks[p:p + NGRAM_N])),
                               []).append(p)
        return out, totals

    expected, exp_totals = naive(texts)

    g, dix, npos, tot = _batch_gram_rows(texts)
    assert tot.tolist() == exp_totals
    assert len(g) == len(expected)
    # position-count multiset per doc matches
    import collections

    got_counts = collections.Counter(zip(dix.tolist(), npos.tolist()))
    exp_counts = collections.Counter(
        (d, len(ps)) for (d, _), ps in expected.items())
    assert got_counts == exp_counts

    g2, dix2, offs, pos = _batch_gram_pos_rows(texts)
    assert len(g2) == len(expected)
    got_pos = collections.Counter(
        (d, tuple(pos[offs[k]:offs[k + 1]].tolist()))
        for k, d in enumerate(dix2.tolist()))
    exp_pos = collections.Counter(
        (d, tuple(sorted(ps))) for (d, _), ps in expected.items())
    assert got_pos == exp_pos

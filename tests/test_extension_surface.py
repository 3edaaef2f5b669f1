"""User-extension surface (SURVEY §2.10): pluggable payload parsers
(the OCR-engine registry analog) and window splitters."""

import numpy as np
import pytest


def test_parser_registry_swap():
    from amazon_textract_transformer_pipeline_ray.functions import turn
    from amazon_textract_transformer_pipeline_ray.functions.blocks import (
        from_word_lists)

    calls = []

    def shouting_parser(payload: str):
        calls.append(payload)
        return from_word_lists([[w.upper() for w in payload.split()]], [0])

    original = turn.PARSERS[turn.DIALECT_PLAIN]
    turn.register_parser(turn.DIALECT_PLAIN, shouting_parser)
    try:
        tb = turn.parse_payload("hello world")
        assert calls == ["hello world"]
        assert tb.words == ["HELLO", "WORLD"]
        # other dialects untouched:
        assert turn.detect_dialect("<p>x</p>") == turn.DIALECT_HTML
    finally:
        turn.register_parser(turn.DIALECT_PLAIN, original)
    assert turn.parse_payload("hello world").words == ["hello", "world"]


def test_splitter_registry():
    from amazon_textract_transformer_pipeline_ray.functions.splitter import (
        SPLITTERS, get_splitter, register_splitter, split_words)

    assert get_splitter() is split_words
    with pytest.raises(ValueError, match="Unknown splitter"):
        get_splitter("nope")

    def chunk_splitter(word_start_token, n_tokens_total, max_len):
        # trivial fixed-2-word windows, ignoring token budget
        n = len(word_start_token)
        return [(i, min(i + 2, n)) for i in range(0, n, 2)]

    register_splitter("chunk2", chunk_splitter)
    try:
        fn = get_splitter("chunk2")
        assert fn(np.array([0, 2, 4, 6]), 8, 100) == [(0, 2), (2, 4)]
    finally:
        SPLITTERS.pop("chunk2")


def test_parse_payload_unchanged_for_builtins():
    """The registry refactor preserves built-in dispatch behavior,
    including the malformed-JSON quarantine fallback."""
    from amazon_textract_transformer_pipeline_ray.functions.turn import (
        parse_payload)

    tb = parse_payload("{not valid json at all")
    assert tb.n_words > 0  # degraded to plain, not raised
    tb2 = parse_payload("plain words here")
    assert tb2.words == ["plain", "words", "here"]

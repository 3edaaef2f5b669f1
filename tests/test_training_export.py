"""Training-data export pipeline (pipelines/training.py): the reference's
page-example -> word-label -> window-split chain (ner.py:278-335) over
transcripts, with the M6/M7 kernel invariants asserted end-to-end."""

import numpy as np
import pytest


def _examples_df(n_turns=150, seed=5, max_seq_len=64):
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.fixtures import gen_transcripts
    from amazon_textract_transformer_pipeline_ray.pipelines.training import (
        build_training_examples)

    ds = rd.from_arrow(gen_transcripts(n_turns, seed=seed))
    return build_training_examples(ds, max_seq_len=max_seq_len,
                                   batch_size=64).to_pandas()


def test_schema_and_rows(ray_session):
    df = _examples_df()
    assert len(df) > 0
    assert list(df.columns) == [
        "conv_id", "turn_idx", "page", "window_idx", "n_windows",
        "word_start", "word_end", "n_tokens", "words", "boxes", "word_labels"]
    for _, r in df.iterrows():
        assert len(r["words"]) == len(r["boxes"]) == len(r["word_labels"])
        assert r["word_end"] - r["word_start"] == len(r["words"])
        assert all(len(b) == 4 for b in r["boxes"])


def test_window_token_budget(ray_session):
    """Every window fits max_seq_len tokens under the frozen tokenizer
    spec (1 + (L-1)//4 tokens per word), except single-word windows are
    impossible (over-long words are SKIPPED per splitting.py:118-128)."""
    from amazon_textract_transformer_pipeline_ray.functions.tokenizer import (
        n_tokens_per_word)

    max_seq_len = 64
    df = _examples_df(max_seq_len=max_seq_len)
    for _, r in df.iterrows():
        lens = np.array([len(w) for w in r["words"]], dtype=np.int64)
        n_tok = int(n_tokens_per_word(lens).sum())
        assert n_tok == r["n_tokens"]
        assert n_tok <= max_seq_len


def test_windows_cover_page(ray_session):
    """Windows of one page cover every word index exactly (overlap only
    from the final-window pullback rule)."""
    df = _examples_df(max_seq_len=48)
    multi = 0
    for (_, _, _), g in df.groupby(["conv_id", "turn_idx", "page"]):
        g = g.sort_values("window_idx")
        n_windows = int(g["n_windows"].iloc[0])
        assert len(g) == n_windows
        covered = set()
        for _, r in g.iterrows():
            covered |= set(range(r["word_start"], r["word_end"]))
        assert covered == set(range(min(covered), max(covered) + 1))
        assert min(covered) == 0
        if n_windows > 1:
            multi += 1
            # consecutive windows abut or overlap (never gap):
            prev_end = None
            for _, r in g.iterrows():
                if prev_end is not None:
                    assert r["word_start"] <= prev_end
                prev_end = r["word_end"]
    assert multi > 0, "corpus at max_seq_len=48 should force splits"


def test_labels_match_parser_hints(ray_session):
    """The synthesized annotation rectangles reproduce the parser's hint
    classes exactly through the >=50%-overlap labeler: annotated classes
    label back as themselves, other-class words fall through to the
    implicit 'other' class (ner.py:112-116)."""
    from amazon_textract_transformer_pipeline_ray.config import DEFAULT_CONFIG
    from amazon_textract_transformer_pipeline_ray.fixtures import gen_turn_payload
    from amazon_textract_transformer_pipeline_ray.functions.turn import (
        parse_payload)
    from amazon_textract_transformer_pipeline_ray.pipelines.training import (
        _example_rows)

    n_checked = 0
    for t in range(40):
        payload = gen_turn_payload(seed=9, conv_ix=t, turn_idx=t)
        tb = parse_payload(payload)
        if tb.n_words == 0:
            continue
        rows = _example_rows(payload, DEFAULT_CONFIG,
                             DEFAULT_CONFIG.max_seq_len)
        for r in rows:
            page_ix = np.flatnonzero(tb.page_id == (r["page"] - 1))
            hints = tb.hint[page_ix][r["word_start"]:r["word_end"]]
            assert (np.asarray(r["word_labels"]) == hints).all()
            n_checked += len(hints)
    assert n_checked > 100


def test_one_page_hand_example():
    """Hand-checked window splits, 5-char words = 2 tokens each, budget 8
    tokens: 10 words -> exact thirds (final window hits exactly 50% so NO
    pullback); 9 words -> short final window pulled back to (5, 9)."""
    from amazon_textract_transformer_pipeline_ray.config import DEFAULT_CONFIG
    from amazon_textract_transformer_pipeline_ray.pipelines.training import (
        _example_rows)

    rows = _example_rows(" ".join(["abcde"] * 10), DEFAULT_CONFIG,
                         max_seq_len=8)
    assert [(r["word_start"], r["word_end"]) for r in rows] == [
        (0, 4), (4, 8), (8, 10)]
    assert all(r["n_windows"] == 3 for r in rows)
    assert rows[0]["words"] == ["abcde"] * 4

    rows = _example_rows(" ".join(["abcde"] * 9), DEFAULT_CONFIG,
                         max_seq_len=8)
    assert [(r["word_start"], r["word_end"]) for r in rows] == [
        (0, 4), (4, 8), (5, 9)]

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


def _pack_df(rows, budget):
    import pyarrow as pa
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.pipelines.training import (
        build_packed_examples)

    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "page": pa.array([r[2] for r in rows], pa.int16()),
        "window_idx": pa.array([r[3] for r in rows], pa.int32()),
        "n_tokens": pa.array([r[4] for r in rows], pa.int32()),
    })
    return (build_packed_examples(rd.from_arrow(t), token_budget=budget)
            .to_pandas().sort_values(["conv_id", "pack_idx"])
            .reset_index(drop=True))


def test_packing_hand_computed(ray_session):
    # conv A: 300+200 fit (500<=512); +100 overflows -> new pack; conv B
    # resets; an oversized 600-token window rides alone with fill > 1.
    rows = [
        ("A", 0, 1, 0, 300), ("A", 0, 1, 1, 200), ("A", 1, 1, 0, 100),
        ("B", 0, 1, 0, 600), ("B", 0, 1, 1, 512), ("B", 0, 1, 2, 1),
    ]
    df = _pack_df(rows, 512)
    got = [(r.conv_id, r.pack_idx, r.n_windows, r.n_tokens)
           for r in df.itertuples()]
    assert got == [("A", 0, 2, 500), ("A", 1, 1, 100),
                   ("B", 0, 1, 600), ("B", 1, 1, 512), ("B", 2, 1, 1)]
    assert df["fill_ratio"].tolist() == [
        500 / 512, 100 / 512, 600 / 512, 1.0, 1 / 512]


def test_packing_order_and_determinism(ray_session):
    # shuffled input rows produce identical packs (ordering is by
    # (turn_idx, page, window_idx), not input order), and the pack
    # sequence is the greedy scan of the sorted windows
    rows = [("C", t, p, w, 128) for t in range(3) for p in (1, 2)
            for w in range(2)]
    import random

    rnd = random.Random(7)
    shuffled = rows[:]
    rnd.shuffle(shuffled)
    a = _pack_df(rows, 512)
    b = _pack_df(shuffled, 512)
    assert a.equals(b)
    # 12 windows x 128 tokens, budget 512 -> 3 full packs of 4
    assert a["n_windows"].tolist() == [4, 4, 4]
    assert a["n_tokens"].tolist() == [512, 512, 512]
    assert a["window_md5"].nunique() == 3

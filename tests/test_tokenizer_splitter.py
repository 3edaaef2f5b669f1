"""Pin tokenizer + NaiveExampleSplitter semantics (reference
splitting.py:63-144) with hand-computed cases."""

import numpy as np

from amazon_textract_transformer_pipeline_ray.functions.splitter import split_words
from amazon_textract_transformer_pipeline_ray.functions.tokenizer import (
    n_tokens_per_word,
    tokenize_words,
)


def test_token_counts():
    # chunks of 4 chars: "" -> 1, "abc" -> 1, "abcd" -> 1, "abcde" -> 2
    assert n_tokens_per_word(np.array([0, 3, 4, 5, 8, 9])).tolist() == [
        1, 1, 1, 2, 2, 3]


def test_tokenize_words_mapping():
    tw, ws = tokenize_words(["abcd", "abcdefgh", "x"])
    assert tw.tolist() == [0, 1, 1, 2]
    assert ws.tolist() == [0, 1, 3]


def test_split_no_split_needed():
    # 3 words, 1 token each, budget 10 -> single window
    ws = np.array([0, 1, 2])
    assert split_words(ws, 3, 10) == [(0, 3)]


def test_split_basic_windows():
    # 6 words x 2 tokens = 12 tokens, budget 4 -> windows of 2 words
    ws = np.arange(0, 12, 2)
    assert split_words(ws, 12, 4) == [(0, 2), (2, 4), (4, 6)]


def test_split_final_short_window_pulled_back():
    # words with token counts [3, 3, 3, 1], budget 6:
    #   window1 = words 0-1 (6 tokens); remaining words 2-3 = 4 tokens
    #   4 >= 6*0.5 -> NO pull-back
    ws = np.array([0, 3, 6, 9])
    assert split_words(ws, 10, 6) == [(0, 2), (2, 4)]
    # token counts [3, 3, 3, 1, 1] budget 8:
    #   window1 = words 0-1 (6 tok; word2 would make 9 > 8)
    #   window2 = words 2-4 (5 tok) -> 5 >= 4 -> no pull-back
    ws = np.array([0, 3, 6, 9, 10])
    assert split_words(ws, 11, 8) == [(0, 2), (2, 5)]
    # token counts [1, 1, 1, 1, 6, 1], budget 8:
    #   window1 = words 0-4 (wait: 0..3 = 4 tokens; +word4 (6) = 10 > 8 -> stop)
    #   window1 = (0, 4) with 4 tokens... 4 < 8*0.5 is False (4 >= 4), no pull
    #   window2 = words 4-5 (7 tokens)
    ws = np.array([0, 1, 2, 3, 4, 10])
    assert split_words(ws, 11, 8) == [(0, 4), (4, 6)]


def test_split_pull_back_overlap():
    # token counts [2, 2, 2, 1], budget 6:
    #   window1 = words 0-2 (6 tokens)
    #   window2 = word 3 (1 token) < 3 -> pull back: add word2 (3 tok <= 6),
    #   word1 (5 <= 6), word0 (7 > 6) stop -> (1, 4): OVERLAP with window1
    ws = np.array([0, 2, 4, 6])
    assert split_words(ws, 7, 6) == [(0, 3), (1, 4)]


def test_split_oversized_word_skipped():
    # token counts [10, 1]: word0 alone exceeds budget 4 -> skipped
    ws = np.array([0, 10])
    assert split_words(ws, 11, 4) == [(1, 2)]


def test_split_empty():
    assert split_words(np.zeros(0, dtype=np.int64), 0, 4) == []

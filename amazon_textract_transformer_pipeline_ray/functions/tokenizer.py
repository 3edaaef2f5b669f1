"""Deterministic subword tokenizer.

Plays the role of the reference's HuggingFace tokenizer in the
classification stage (``notebooks/src/code/inference.py:435-447``): it maps
each word to >=1 tokens and exposes the token->word mapping
(``word_ids``) that the long-example splitter needs
(``notebooks/src/code/data/splitting.py:89-97``).

Spec (frozen; the oracle and the engine share it):
  * a word of length L produces ``1 + (L - 1) // CHARS_PER_TOKEN`` tokens
    (empty word -> 1 token);
  * token boundaries every CHARS_PER_TOKEN characters.
No vocabulary is needed — the downstream classifier is feature-based, so
only token *counts* and the token->word map matter.
"""

from __future__ import annotations

import numpy as np

CHARS_PER_TOKEN = 4


def n_tokens_per_word(word_lengths: np.ndarray) -> np.ndarray:
    """Vectorized token count per word from char lengths (int64 in/out)."""
    lengths = np.asarray(word_lengths, dtype=np.int64)
    return 1 + np.maximum(lengths - 1, 0) // CHARS_PER_TOKEN


def tokenize_words(words: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a word sequence.

    Returns
    -------
    token_word_ids : int64 array, one entry per token = index of its word
        (the reference's ``tokenized.word_ids``; no special tokens).
    word_start_token : int64 array, one entry per word = index of its first
        token (the reference's ``word_start_ixs``, splitting.py:97).
    """
    counts = n_tokens_per_word(np.array([len(w) for w in words], dtype=np.int64))
    word_start_token = np.concatenate([[0], np.cumsum(counts)[:-1]]) if len(counts) else np.zeros(0, dtype=np.int64)
    token_word_ids = np.repeat(np.arange(len(words), dtype=np.int64), counts)
    return token_word_ids, word_start_token

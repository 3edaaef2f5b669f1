"""Long-example splitter.

Re-implements the semantics of the reference's ``NaiveExampleSplitter``
(``notebooks/src/code/data/splitting.py:63-144``): split a word sequence on
word boundaries into windows of at most ``max_content_seq_len`` tokens;
if the final window comes up under 50% full, pull its start index backward
to add context (creating overlap with the previous window); a single word
longer than the budget is skipped with a warning.

Window fan-out stays inside the classifier actor (no shuffle): windows of
one turn never leave the batch, mirroring how the reference keeps all
windows of one document inside one endpoint invocation
(``inference.py:435-480``).
"""

from __future__ import annotations

import logging
from typing import List, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def split_words(
    word_start_token: np.ndarray,
    n_tokens_total: int,
    max_content_seq_len: int,
) -> List[Tuple[int, int]]:
    """Word-level (start, end) windows for one example.

    Parameters mirror reference splitting.py:77-144: ``word_start_token`` is
    the first-token index of each word (monotone), ``n_tokens_total`` the
    total token count.

    Returns a list of half-open word-index ranges ``(ix_start_word,
    ix_end_word)``.
    """
    n_words = len(word_start_token)
    ix_start_word = 0
    splits: List[Tuple[int, int]] = []
    while ix_start_word < n_words:
        start_token = word_start_token[ix_start_word]
        end_token = start_token
        ix_end_word = ix_start_word
        # Seek forward to include as many words as fit (splitting.py:106-117):
        while ix_end_word < n_words:
            next_ix_end_word = ix_end_word + 1
            next_end_token = (
                word_start_token[next_ix_end_word]
                if next_ix_end_word < n_words
                else n_tokens_total
            )
            if next_end_token - start_token > max_content_seq_len:
                break
            ix_end_word = next_ix_end_word
            end_token = next_end_token
        # A single word longer than the budget: skip it (splitting.py:118-128).
        if end_token == start_token:
            logger.warning(
                "Skipping individual word longer than max_content_seq_len"
            )
            ix_start_word += 1
            continue
        # Final short window: pull start backward for context
        # (splitting.py:129-138). Overlap with the prior window is allowed.
        if end_token - start_token < max_content_seq_len * 0.5:
            while ix_start_word > 0:
                next_ix_start_word = ix_start_word - 1
                next_start_token = word_start_token[next_ix_start_word]
                if end_token - next_start_token > max_content_seq_len:
                    break
                ix_start_word = next_ix_start_word
                start_token = next_start_token
        splits.append((int(ix_start_word), int(ix_end_word)))
        ix_start_word = ix_end_word
    return splits


# Splitter plug-in registry (reference ``ExampleSplitterBase`` subclass
# surface, splitting.py:21-61; SURVEY §2.10).  A splitter is any callable
# with the ``split_words`` signature: (word_start_token, n_tokens_total,
# max_content_seq_len) -> list of half-open word-index windows.
SPLITTERS: dict[str, object] = {"naive": split_words}


def register_splitter(name: str, fn) -> None:
    """Register (or replace) a window-splitting strategy."""
    SPLITTERS[name] = fn


def get_splitter(name: str = "naive"):
    if name not in SPLITTERS:
        raise ValueError(
            f"Unknown splitter {name!r}; registered: {sorted(SPLITTERS)}")
    return SPLITTERS[name]

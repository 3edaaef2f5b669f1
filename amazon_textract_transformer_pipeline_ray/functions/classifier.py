"""Word classifier: text-density / link-density boilerplate model.

Plays the role of the reference's SageMaker token-classification endpoint
(``notebooks/src/code/inference.py:363-500``) with the same plumbing:

  1. tokenize words (tokenizer.py), split long turns into windows of
     <= max_seq_len tokens (splitter.py, reference splitting.py:63-144);
  2. score every token with a probability vector over the class space;
  3. aggregate token probabilities per WORD by unweighted mean over the
     token-probability multiset collected from all windows, take argmax as
     ``PredictedClass`` and its mean probability as
     ``PredictedClassConfidence`` (reference inference.py:483-492; we
     compute the mean as a count-weighted vectorized sum, identical up to
     FP associativity — this exact kernel is the engine-wide spec, shared
     with the test oracle);
  4. words skipped by the splitter (single word longer than the window)
     stay *unannotated* -> class -1, treated as "other" downstream, the
     reference's missing-``PredictedClass`` behavior (extract.py:107-109).

The deterministic "model": per-token logits from parser hints and
density features (word length, link membership), softmaxed.  Being
deterministic, per-turn equality against the oracle is exact.

Pre-annotated words (dialect B enriched payloads, pre_class >= 0) pass
through untouched, letting fixtures exercise the span assembler in
isolation from the classifier.
"""

from __future__ import annotations

import numpy as np

from .blocks import TurnBlocks
from .splitter import split_words
from .tokenizer import n_tokens_per_word

UNANNOTATED = -1


def token_probs(
    word_lengths: np.ndarray,
    hints: np.ndarray,
    links: np.ndarray,
    token_word_ids: np.ndarray,
    n_classes: int,
) -> np.ndarray:
    """(n_tokens, n_classes) probability matrix.

    Logit spec (frozen):
      logit[token, hint(word)] = 2.0 + 0.15 * min(len(word), 8)
                                 + 0.05 * ((token_global_ix % 5) - 2)
      logit[token, other]     += 0.8 * link(word)   [other = n_classes - 1]
      all remaining logits 0; softmax over classes.
    """
    n_tokens = len(token_word_ids)
    logits = np.zeros((n_tokens, n_classes), dtype=np.float64)
    word_base = 2.0 + 0.15 * np.minimum(word_lengths, 8)
    tok_base = word_base[token_word_ids] + 0.05 * ((np.arange(n_tokens) % 5) - 2)
    logits[np.arange(n_tokens), hints[token_word_ids]] = tok_base
    logits[:, n_classes - 1] += 0.8 * links[token_word_ids]
    logits -= logits.max(axis=1, keepdims=True)
    np.exp(logits, out=logits)
    logits /= logits.sum(axis=1, keepdims=True)
    return logits


def classify_turn(
    tb: TurnBlocks, n_classes: int, max_seq_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-word (pred_class int16, pred_conf float64) for one turn."""
    n_words = tb.n_words
    pred_class = np.full(n_words, UNANNOTATED, dtype=np.int16)
    pred_conf = np.zeros(n_words, dtype=np.float64)
    if n_words == 0:
        return pred_class, pred_conf

    word_lengths = np.array([len(w) for w in tb.words], dtype=np.int64)
    counts = n_tokens_per_word(word_lengths)
    word_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_tokens_total = int(counts.sum())
    token_word_ids = np.repeat(np.arange(n_words, dtype=np.int64), counts)

    # Malformed enrichment values (a PredictedClass outside [0, n_classes)
    # copied into the hint column by the layout parser) must not crash or
    # silently wrap the logit indexing: out-of-range hints degrade to the
    # 'other' class (frozen rule, mirrored in oracle_independent):
    hints = tb.hint.astype(np.int64)
    hints = np.where((hints >= 0) & (hints < n_classes), hints, n_classes - 1)
    probs = token_probs(word_lengths, hints, tb.link.astype(np.float64),
                        token_word_ids, n_classes)

    # Window fan-out / fan-in stays turn-local (reference inference.py:449-480
    # keeps all windows of one doc in one invocation; J1 in SURVEY §2.4).
    windows = split_words(word_start, n_tokens_total, max_seq_len)
    token_mult = np.zeros(n_tokens_total, dtype=np.float64)
    for ws, we in windows:
        t0 = word_start[ws]
        t1 = word_start[we] if we < n_words else n_tokens_total
        token_mult[t0:t1] += 1.0

    # Count-weighted mean per word over the token multiset:
    starts = word_start
    wsum = np.add.reduceat(probs * token_mult[:, None], starts, axis=0)
    wcnt = np.add.reduceat(token_mult, starts)
    covered = wcnt > 0
    mean = np.zeros_like(wsum)
    mean[covered] = wsum[covered] / wcnt[covered, None]
    arg = mean.argmax(axis=1)
    pred_class[covered] = arg[covered].astype(np.int16)
    pred_conf[covered] = mean[np.arange(n_words), arg][covered]

    # Pass through pre-annotations (dialect B enriched payloads); values
    # outside the class space are ignored, not propagated:
    pre = (tb.pre_class >= 0) & (tb.pre_class < n_classes)
    pred_class[pre] = tb.pre_class[pre]
    pred_conf[pre] = tb.pre_conf[pre]
    return pred_class, pred_conf

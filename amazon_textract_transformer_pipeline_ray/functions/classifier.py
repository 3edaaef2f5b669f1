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
    positions: np.ndarray | None = None,
) -> np.ndarray:
    """(n_tokens, n_classes) probability matrix.

    Logit spec (frozen):
      logit[token, hint(word)] = 2.0 + 0.15 * min(len(word), 8)
                                 + 0.05 * ((token_global_ix % 5) - 2)
      logit[token, other]     += 0.8 * link(word)   [other = n_classes - 1]
      all remaining logits 0; softmax over classes.

    ``positions`` is the per-TURN token index (defaults to arange for the
    single-turn call); the batched path passes explicit per-turn indices
    so concatenating turns cannot shift the position term.
    """
    n_tokens = len(token_word_ids)
    if positions is None:
        positions = np.arange(n_tokens)
    logits = np.zeros((n_tokens, n_classes), dtype=np.float64)
    word_base = 2.0 + 0.15 * np.minimum(word_lengths, 8)
    tok_base = word_base[token_word_ids] + 0.05 * ((positions % 5) - 2)
    logits[np.arange(n_tokens), hints[token_word_ids]] = tok_base
    logits[:, n_classes - 1] += 0.8 * links[token_word_ids]
    logits -= logits.max(axis=1, keepdims=True)
    np.exp(logits, out=logits)
    logits /= logits.sum(axis=1, keepdims=True)
    return logits


def _token_scores(
    word_lengths: np.ndarray,
    hints: np.ndarray,
    links: np.ndarray,
    token_word_ids: np.ndarray,
    n_classes: int,
    positions: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Analytic softmax of the ``token_probs`` logit spec.

    Because hint and link are per-WORD, a token's probability vector has
    at most three distinct values — p(hint class), p(other class),
    p(any remaining class) — so the full (n_tokens, n_classes) matrix is
    never materialized.  Mathematically identical to ``token_probs``
    (same logits, same max-shift softmax); agreement is at float
    round-off (~1 ulp), far inside the oracle tolerances, and the argmax
    ordering cannot flip because the hint logit (>= 2.05) strictly
    dominates the link logit (<= 0.8) and zero.

    Returns (p_hint, p_other, p_rest) per token.  When hint == other the
    two logits combine (the += in the spec) and p_hint == p_other.
    """
    other = n_classes - 1
    b = (2.0 + 0.15 * np.minimum(word_lengths, 8))[token_word_ids] \
        + 0.05 * ((positions % 5) - 2)
    l = 0.8 * links[token_word_ids]
    h_is_other = hints[token_word_ids] == other
    # combined logit where hint == other; separate otherwise:
    bh = np.where(h_is_other, b + l, b)
    bo = np.where(h_is_other, b + l, l)
    m = np.maximum(bh, np.maximum(bo, 0.0))
    eh = np.exp(bh - m)
    eo = np.exp(bo - m)
    er = np.exp(-m)
    n_rest = np.where(h_is_other, n_classes - 1, n_classes - 2)
    z = np.where(h_is_other, eo, eh + eo) + n_rest * er
    return eh / z, eo / z, er / z


def _word_preds(
    hints_per_word: np.ndarray,
    p_hint: np.ndarray,
    p_other: np.ndarray,
    p_rest: np.ndarray,
    token_mult: np.ndarray,
    word_start: np.ndarray,
    n_classes: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Count-weighted per-word means + argmax with numpy's lowest-index
    tie rule, over the 3-valued probability structure."""
    other = n_classes - 1
    wcnt = np.add.reduceat(token_mult, word_start)
    mh = np.add.reduceat(token_mult * p_hint, word_start)
    mo = np.add.reduceat(token_mult * p_other, word_start)
    mr = np.add.reduceat(token_mult * p_rest, word_start)
    covered = wcnt > 0
    safe = np.where(covered, wcnt, 1.0)
    mh, mo, mr = mh / safe, mo / safe, mr / safe
    # argmax over the implied full vector: candidates are (mean_h at
    # hint), (mean_o at other), (mean_r at the LOWEST rest index).
    # numpy argmax tie rule = lowest index:
    h = hints_per_word.astype(np.int64)
    first_rest = np.where(h == 0, 1, 0)
    has_rest = (n_classes - np.where(h == other, 1, 2)) > 0
    best_val = mh
    best_idx = h
    take_o = (mo > best_val) | ((mo == best_val) & (other < best_idx))
    best_val = np.where(take_o, mo, best_val)
    best_idx = np.where(take_o, other, best_idx)
    take_r = has_rest & (
        (mr > best_val) | ((mr == best_val) & (first_rest < best_idx)))
    best_val = np.where(take_r, mr, best_val)
    best_idx = np.where(take_r, first_rest, best_idx)
    pred_class = np.where(covered, best_idx, UNANNOTATED).astype(np.int16)
    pred_conf = np.where(covered, best_val, 0.0)
    return pred_class, pred_conf


def classify_turn(
    tb: TurnBlocks, n_classes: int, max_seq_len: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-word (pred_class int16, pred_conf float64) for one turn."""
    n_words = tb.n_words
    if n_words == 0:
        return (np.full(0, UNANNOTATED, dtype=np.int16),
                np.zeros(0, dtype=np.float64))

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
    scores = _token_scores(word_lengths, hints, tb.link.astype(np.float64),
                           token_word_ids, n_classes,
                           np.arange(n_tokens_total))

    # Window fan-out / fan-in stays turn-local (reference inference.py:449-480
    # keeps all windows of one doc in one invocation; J1 in SURVEY §2.4).
    windows = split_words(word_start, n_tokens_total, max_seq_len)
    token_mult = np.zeros(n_tokens_total, dtype=np.float64)
    for ws, we in windows:
        t0 = word_start[ws]
        t1 = word_start[we] if we < n_words else n_tokens_total
        token_mult[t0:t1] += 1.0

    pred_class, pred_conf = _word_preds(hints, *scores, token_mult,
                                        word_start, n_classes)

    # Pass through pre-annotations (dialect B enriched payloads); values
    # outside the class space are ignored, not propagated:
    pre = (tb.pre_class >= 0) & (tb.pre_class < n_classes)
    pred_class[pre] = tb.pre_class[pre]
    pred_conf[pre] = tb.pre_conf[pre]
    return pred_class, pred_conf


def classify_turns(
    tbs: list[TurnBlocks], n_classes: int, max_seq_len: int
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Batched ``classify_turn`` over many turns in ONE vectorized pass.

    Bit-identical to calling ``classify_turn`` per turn: every operation
    is row-wise per token or a reduceat over the SAME per-word segments
    in the same order, and the position term uses explicit per-turn token
    indices.  Windowing (the only per-turn control flow) stays a cheap
    Python loop over window bounds.  This removes the ~20-small-numpy-ops
    per-turn overhead that dominates short conversational turns."""
    n_turns = len(tbs)
    out: list[tuple[np.ndarray, np.ndarray] | None] = [None] * n_turns
    act = [i for i in range(n_turns) if tbs[i].n_words > 0]
    for i in range(n_turns):
        if tbs[i].n_words == 0:
            out[i] = (np.full(0, UNANNOTATED, dtype=np.int16),
                      np.zeros(0, dtype=np.float64))
    if not act:
        return out  # type: ignore[return-value]

    word_lengths = np.array(
        [len(w) for i in act for w in tbs[i].words], dtype=np.int64)
    n_words_arr = np.array([tbs[i].n_words for i in act], dtype=np.int64)
    word_turn_start = np.concatenate([[0], np.cumsum(n_words_arr)])
    counts = n_tokens_per_word(word_lengths)
    word_start_g = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total_tokens = int(counts.sum())
    token_word_g = np.repeat(np.arange(len(word_lengths), dtype=np.int64),
                             counts)
    # per-turn token bookkeeping:
    tok_per_turn = np.add.reduceat(counts, word_turn_start[:-1])
    turn_tok_start = np.concatenate([[0], np.cumsum(tok_per_turn)])
    positions = (np.arange(total_tokens)
                 - np.repeat(turn_tok_start[:-1], tok_per_turn))

    hints = np.concatenate([tbs[i].hint for i in act]).astype(np.int64)
    hints = np.where((hints >= 0) & (hints < n_classes), hints, n_classes - 1)
    links = np.concatenate([tbs[i].link for i in act]).astype(np.float64)
    scores = _token_scores(word_lengths, hints, links, token_word_g,
                           n_classes, positions)

    token_mult = np.zeros(total_tokens, dtype=np.float64)
    for t, i in enumerate(act):
        w0, w1 = word_turn_start[t], word_turn_start[t + 1]
        t_start = turn_tok_start[t]
        local_word_start = word_start_g[w0:w1] - t_start
        n_tok = int(tok_per_turn[t])
        for ws, we in split_words(local_word_start, n_tok, max_seq_len):
            t0 = local_word_start[ws] + t_start
            t1 = (local_word_start[we] + t_start if we < (w1 - w0)
                  else t_start + n_tok)
            token_mult[t0:t1] += 1.0

    pred_class_all, pred_conf_all = _word_preds(
        hints, *scores, token_mult, word_start_g, n_classes)

    # Pass through pre-annotations GLOBALLY (one vectorized overwrite
    # instead of a copy + mask + two fancy assigns per turn), then hand
    # out per-turn VIEWS — callers treat predictions as read-only:
    pre_class_g = np.concatenate([tbs[i].pre_class for i in act])
    pre = (pre_class_g >= 0) & (pre_class_g < n_classes)
    if pre.any():
        pred_class_all[pre] = pre_class_g[pre]
        pred_conf_all[pre] = np.concatenate(
            [tbs[i].pre_conf for i in act])[pre]
    for t, i in enumerate(act):
        w0, w1 = word_turn_start[t], word_turn_start[t + 1]
        out[i] = (pred_class_all[w0:w1], pred_conf_all[w0:w1])
    return out  # type: ignore[return-value]

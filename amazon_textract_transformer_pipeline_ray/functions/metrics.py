"""Evaluation metrics + run-id derivation.

* ``token_classification_metrics`` mirrors the reference's NER metric
  computer exactly (``notebooks/src/code/data/ner.py:338-417``): per-example
  masked token accuracy (PAD ignored), "focus" accuracy excluding tokens
  where BOTH prediction and label are the 'other' class (examples with no
  focus tokens are excluded from the focus average), and the early-stopping
  helper ``focus_else_acc_minus_one``.
* ``distributed_token_metrics`` runs the same math over a Dataset of
  per-example label/prediction rows with per-batch partials (sum of
  per-example accuracies + counts), reproducing the reference's
  example-averaged (not token-averaged) definition.
* ``sanitize_run_id`` mirrors the trigger Lambda's Step-Functions-
  compatible execution-id derivation (``pipeline/fn-trigger/main.py:57-72``):
  special characters to hyphens, consecutive hyphens collapsed, truncated
  to 80 chars.
"""

from __future__ import annotations

import re

import numpy as np

PAD_LABEL = -100  # CrossEntropyLoss().ignore_index


def token_classification_metrics(
    pred_class: np.ndarray,  # (n_examples, max_len) int
    labels: np.ndarray,      # (n_examples, max_len) int, PAD_LABEL = ignore
    num_labels: int,
    pad_token_label_id: int = PAD_LABEL,
) -> dict:
    """Reference-exact metric computer (ner.py:349-416) on hard predictions."""
    other = num_labels - 1
    non_pad = labels != pad_token_label_id
    pred = np.where(non_pad, pred_class, pad_token_label_id)

    n_tokens_by_ex = non_pad.sum(axis=1)
    n_correct_by_ex = np.logical_and(labels == pred, non_pad).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc_by_ex = np.true_divide(n_correct_by_ex, n_tokens_by_ex)
    # All-PAD examples contribute 0 (the reference would propagate NaN
    # through the mean here — documented divergence, keeps the value
    # finite and matches distributed_token_metrics):
    acc_by_ex = np.nan_to_num(acc_by_ex, nan=0.0)

    focus = np.logical_and(non_pad, np.logical_or(labels != other, pred != other))
    n_focus_by_ex = focus.sum(axis=1)
    n_focus_correct = np.logical_and(labels == pred, focus).sum(axis=1)
    has_focus = n_focus_by_ex != 0
    focus_acc_by_ex = np.true_divide(n_focus_correct[has_focus],
                                     n_focus_by_ex[has_focus])

    n_examples = pred_class.shape[0]
    acc = float(acc_by_ex.sum() / n_examples) if n_examples else 0.0
    n_focus_examples = int(has_focus.sum())
    focus_acc = (float(focus_acc_by_ex.sum() / n_focus_examples)
                 if n_focus_examples else 0.0)
    return {
        "n_examples": n_examples,
        "acc": acc,
        "n_focus_examples": n_focus_examples,
        "focus_acc": focus_acc,
        "focus_else_acc_minus_one": focus_acc if focus_acc > 0 else acc - 1,
    }


def distributed_token_metrics(ds, num_labels: int) -> dict:
    """Same metrics over a Dataset with list<int> columns ``labels`` and
    ``pred_class`` (one row per example, ragged lengths).  Per-batch
    partial sums keep the per-example averaging exact."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    other = num_labels - 1

    def partial(batch: pa.Table) -> pa.Table:
        acc_sum = 0.0
        focus_sum = 0.0
        n_ex = 0
        n_focus_ex = 0
        for lab, pred in zip(batch.column("labels").to_pylist(),
                             batch.column("pred_class").to_pylist()):
            lab = np.asarray(lab)
            pred = np.asarray(pred)
            non_pad = lab != PAD_LABEL
            n_tok = int(non_pad.sum())
            n_ex += 1
            if n_tok:
                acc_sum += float((np.logical_and(lab == pred, non_pad)).sum()
                                 / n_tok)
            focus = np.logical_and(non_pad,
                                   np.logical_or(lab != other, pred != other))
            n_focus = int(focus.sum())
            if n_focus:
                n_focus_ex += 1
                focus_sum += float(np.logical_and(lab == pred, focus).sum()
                                   / n_focus)
        return pa.table({
            "p_acc": pa.array([acc_sum]),
            "p_focus": pa.array([focus_sum]),
            "p_n": pa.array([n_ex]),
            "p_nf": pa.array([n_focus_ex]),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=4096).aggregate(
        Sum("p_acc", alias_name="acc_sum"),
        Sum("p_focus", alias_name="focus_sum"),
        Sum("p_n", alias_name="n_examples"),
        Sum("p_nf", alias_name="n_focus_examples"))
    n = int(agg["n_examples"])
    nf = int(agg["n_focus_examples"])
    acc = float(agg["acc_sum"]) / n if n else 0.0
    focus_acc = float(agg["focus_sum"]) / nf if nf else 0.0
    return {
        "n_examples": n,
        "acc": acc,
        "n_focus_examples": nf,
        "focus_acc": focus_acc,
        "focus_else_acc_minus_one": focus_acc if focus_acc > 0 else acc - 1,
    }


_SPECIAL_RE = re.compile(
    '[\\s<>{}\\[\\]?*"#%\\\\^|~`$&,;:'
    '/\u0000-\u001F\u007F-\u009F]+')
_HYPHENS_RE = re.compile(r"[\-]{2,}")


def sanitize_run_id(*parts: str) -> str:
    """Step-Functions-compatible id from arbitrary parts
    (fn-trigger/main.py:57-72 semantics: specials -> '-', collapse '-',
    truncate to 80)."""
    return _HYPHENS_RE.sub("-", _SPECIAL_RE.sub("-", "-".join(parts)))[:80]

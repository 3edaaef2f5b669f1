"""Conversation-level stage: the engine's ONE semantic shuffle.

``groupby(conv_id)`` + in-group ``sort(turn_idx)`` produces the stable turn
ordering the north rule requires; conversation-level invariants (turn
uniqueness/contiguity, deterministic content digest) are asserted inside
``map_groups``.

Scale design: the group payload is a LEAN projection — per-turn metrics and
a per-turn 16-byte text digest (computed vectorized in ``map_batches``
BEFORE the shuffle) — never the extracted text itself, so a mega-
conversation's group is ~50 bytes/turn rather than the full payload
(SURVEY.md §7.4 hard part 5).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa


def add_text_digest(batch: pa.Table) -> pa.Table:
    """Per-turn content digest, computed pre-shuffle (cheap, vectorized-ish)."""
    texts = batch.column("extracted_text").to_pylist()
    digests = [hashlib.sha256(t.encode("utf-8")).hexdigest()[:16] for t in texts]
    lean = batch.select(
        ["conv_id", "turn_idx", "n_words", "boilerplate_ratio", "n_spans",
         "review_needed"]
    )
    return lean.append_column("text_digest", pa.array(digests, pa.string()))


def summarize_conversation(group: pd.DataFrame) -> pd.DataFrame:
    """Per-group: order by turn_idx, assert invariants, digest the ordered
    content (one output row per conversation)."""
    g = group.sort_values("turn_idx", kind="mergesort")
    turn_idx = g["turn_idx"].to_numpy()
    # Ordering invariant: turn_idx unique => strictly increasing after the
    # sort. (Contiguity is NOT asserted: empty turns are legitimately
    # dropped upstream, base.py:419-428.)
    unique_ordered = bool(len(turn_idx) == len(set(turn_idx.tolist())))
    h = hashlib.sha256()
    for tix, td in zip(turn_idx.tolist(), g["text_digest"].tolist()):
        h.update(f"{tix}:{td}\n".encode())
    return pd.DataFrame({
        "conv_id": [g["conv_id"].iloc[0]],
        "n_turns": [len(g)],
        "first_turn_idx": [int(turn_idx[0])],
        "last_turn_idx": [int(turn_idx[-1])],
        "turns_unique_ordered": [unique_ordered],
        "total_words": [int(g["n_words"].sum())],
        "mean_boilerplate_ratio": [float(g["boilerplate_ratio"].mean())],
        "total_spans": [int(g["n_spans"].sum())],
        "n_review_needed": [int(g["review_needed"].sum())],
        "conv_text_sha256": [h.hexdigest()],
    })


def role_transitions(ds: "rd.Dataset") -> "rd.Dataset":
    """Corpus-wide (prev_role -> role) transition counts under stable
    turn ordering; '<start>' is each conversation's entry state.
    Input: a Dataset with (conv_id, turn_idx, role).  One
    ``groupby(conv_id)`` exchange; per-conv outputs are tiny transition
    partials folded by a roles^2-sized final groupby."""
    from ray.data.aggregate import Sum

    def trans(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="mergesort")
        roles = g["role"].tolist()
        df = pd.DataFrame({"prev_role": ["<start>"] + roles[:-1],
                           "role": roles})
        return (df.groupby(["prev_role", "role"], as_index=False)
                .size().rename(columns={"size": "p_n"}))

    return (ds.groupby("conv_id").map_groups(trans,
                                             batch_format="pandas")
            .groupby(["prev_role", "role"]).aggregate(
                Sum("p_n", alias_name="n")))


def turn_latency(ds: "rd.Dataset") -> "rd.Dataset":
    """Per-transition response-latency rollup: for every consecutive
    (prev_role -> role) pair under stable turn ordering, the count and
    exact-integer sum/max of the microsecond gap between the turns'
    timestamps.  Input: (conv_id, turn_idx, role, ts).  Same exchange
    shape as ``role_transitions``; all outputs are exact int64."""
    import numpy as np
    from ray.data.aggregate import Max, Sum

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("turn_idx", kind="mergesort")
        if len(g) < 2:
            return pd.DataFrame({
                "prev_role": pd.Series(dtype=object),
                "role": pd.Series(dtype=object),
                "p_n": pd.Series(dtype=np.int64),
                "p_sum": pd.Series(dtype=np.int64),
                "p_max": pd.Series(dtype=np.int64)})
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = np.diff(ts)
        df = pd.DataFrame({"prev_role": g["role"].to_numpy()[:-1],
                           "role": g["role"].to_numpy()[1:],
                           "gap": d})
        out = (df.groupby(["prev_role", "role"], as_index=False)
               .agg(p_n=("gap", "size"), p_sum=("gap", "sum"),
                    p_max=("gap", "max")))
        return out

    return (ds.groupby("conv_id").map_groups(gaps, batch_format="pandas")
            .groupby(["prev_role", "role"]).aggregate(
                Sum("p_n", alias_name="n"),
                Sum("p_sum", alias_name="sum_gap_us"),
                Max("p_max", alias_name="max_gap_us")))

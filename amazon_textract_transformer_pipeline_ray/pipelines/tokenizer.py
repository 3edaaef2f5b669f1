"""Distributed BPE tokenizer training over the ``documents`` table:
the byte-pair-encoding merge-rule induction step (Sennrich et al. 2016,
the GPT-2 tokenizer's training phase) expressed the way production
trainers run it at corpus scale.

Two-phase plan:

1. DISTRIBUTED word-type counting — one streaming ``map_batches`` pass
   (regex pre-tokenization, the shared ``BPE_PATTERN`` spec from
   ``text.py``) feeding ONE ``groupby(word)`` reduction.  This is the
   only corpus-sized work, and it is the same vocab-bounded exchange
   the unigram-LM / vocab-induction ops use: the result has one row
   per word TYPE, sublinear in corpus size.
2. DRIVER merge loop over the word-type table — BPE training state is
   a function of type counts, never of the corpus itself, so after the
   reduction the classic merge iteration runs on a table capped at
   ``BPE_MAX_WORD_TYPES`` types (count-desc / word-asc tie-break, so
   the cap is deterministic under corpus growth).  Per iteration the
   pair statistics are computed VECTORIZED: symbols flattened to one
   object array, in-word adjacency mask, weighted pandas groupby —
   no per-type Python pair loop.

Semantics (mirrored exactly by the independent oracle fixture in
``oracle_fixture_aux.py``):

* pair counts are occurrence-weighted and OVERLAPPING (``"aaa"``
  contributes two ``(a,a)`` pairs), the original Sennrich counting;
* the winning pair is max count, ties broken by lexicographically
  smallest ``(left, right)``;
* merge application is greedy left-to-right non-overlapping
  (``"aaa"`` + merge ``(a,a)`` -> ``("aa", "a")``);
* training stops early when no adjacent pair remains.

Output: one row per learned merge rule —
``(merge_rank, left, right, merged, pair_count)`` — deterministic
integers and strings, hash-comparable across engines.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Sum

from ..sources.tables import read_table
from .text import _BPE_RE

# Spec constants (shared with the independent oracle fixture).
BPE_N_MERGES = 48
BPE_MAX_WORD_TYPES = 20_000


def word_type_counts(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Distributed (word type, count) reduction: per-batch regex
    pre-tokenization + local combiner, one ``groupby(w)`` exchange,
    vocab-sized arrays back on the driver."""
    ds = read_table(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks: list[str] = []
        for s in t.column("text").to_pylist():
            toks.extend(_BPE_RE.findall(s))
        if not toks:
            return pa.table({"w": pa.array([], pa.string()),
                             "p_c": pa.array([], pa.int64())})
        flat = np.empty(len(toks), dtype=object)
        flat[:] = toks
        uniq, cnt = np.unique(flat, return_counts=True)
        return pa.table({"w": pa.array(uniq, pa.string()),
                         "p_c": pa.array(cnt.astype(np.int64))})

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
           .groupby("w").aggregate(Sum("p_c", alias_name="c")))
    ws, cs = [], []
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        if "w" in b.column_names and len(b):
            ws.append(np.asarray(b.column("w").to_pylist(), dtype=object))
            cs.append(b.column("c").to_numpy())
    if not ws:
        return np.empty(0, object), np.zeros(0, np.int64)
    return np.concatenate(ws), np.concatenate(cs).astype(np.int64)


def _merge_seq(seq: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right non-overlapping replacement of the pair."""
    out: list[str] = []
    i, n = 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == left and seq[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _select_types(words: np.ndarray, counts: np.ndarray,
                  max_types: int) -> tuple[list[str], np.ndarray]:
    """Deterministic type cap: count-desc / word-asc (module docstring)."""
    if not len(words):
        return [], np.zeros(0, np.int64)
    sel = (pd.DataFrame({"w": words, "c": counts})
           .sort_values(["c", "w"], ascending=[False, True],
                        kind="mergesort")
           .head(max_types))
    return sel["w"].tolist(), sel["c"].to_numpy(np.int64)


def _merges_table(state: dict[str, list]) -> pa.Table:
    return pa.table({
        "merge_rank": pa.array(state["ranks"], pa.int64()),
        "left": pa.array(state["lefts"], pa.string()),
        "right": pa.array(state["rights"], pa.string()),
        "merged": pa.array(state["mergeds"], pa.string()),
        "pair_count": pa.array(state["pcounts"], pa.int64()),
    })


def _merge_loop(seqs: list[list[str]], wcounts: np.ndarray,
                state: dict[str, list], n_merges: int,
                on_merge=None) -> pa.Table:
    """The merge iteration, resumable: continues from
    ``len(state['ranks'])`` already-recorded merges (whose application
    to ``seqs`` the caller has already replayed).  ``on_merge(rank)``
    fires after each recorded merge — the checkpoint hook."""
    for rank in range(len(state["ranks"]) + 1, n_merges + 1):
        lens = np.fromiter((len(s) for s in seqs), np.int64,
                           count=len(seqs))
        total = int(lens.sum())
        if total == 0:
            break
        flat = np.empty(total, dtype=object)
        pos = 0
        for s in seqs:
            flat[pos:pos + len(s)] = s
            pos += len(s)
        wix = np.repeat(np.arange(len(seqs), dtype=np.int64), lens)
        if total < 2:
            break
        in_word = wix[:-1] == wix[1:]
        if not in_word.any():
            break
        stats = (pd.DataFrame({
            "l": flat[:-1][in_word], "r": flat[1:][in_word],
            "c": wcounts[wix[:-1][in_word]]})
            .groupby(["l", "r"], as_index=False, sort=False)["c"].sum()
            .sort_values(["c", "l", "r"], ascending=[False, True, True],
                         kind="mergesort"))
        left, right, best = (stats["l"].iloc[0], stats["r"].iloc[0],
                             int(stats["c"].iloc[0]))
        state["ranks"].append(rank)
        state["lefts"].append(left)
        state["rights"].append(right)
        state["mergeds"].append(left + right)
        state["pcounts"].append(best)
        for i, s in enumerate(seqs):
            if len(s) > 1:
                seqs[i] = _merge_seq(s, left, right)
        if on_merge is not None:
            on_merge(rank)
    return _merges_table(state)


def train_bpe_merges(words: np.ndarray, counts: np.ndarray,
                     n_merges: int = BPE_N_MERGES,
                     max_types: int = BPE_MAX_WORD_TYPES) -> pa.Table:
    """The driver-side merge loop (vocab-bounded — see module
    docstring).  Pair statistics per iteration are vectorized over a
    flattened symbol array; only merge APPLICATION scans the affected
    word types."""
    wtypes, wcounts = _select_types(words, counts, max_types)
    seqs: list[list[str]] = [list(w) for w in wtypes]
    state: dict[str, list] = {k: [] for k in
                              ("ranks", "lefts", "rights", "mergeds",
                               "pcounts")}
    return _merge_loop(seqs, wcounts, state, n_merges)


def q_vocab_bpe_merges(sf_dir: str) -> pa.Table:
    """BPE merge-rule table learned from the corpus — see module
    docstring for the two-phase plan and determinism spec."""
    words, counts = word_type_counts(sf_dir)
    return train_bpe_merges(words, counts)


# Bump when counting/merge semantics change — stale checkpoints from an
# older spec are then lineage-rejected, never silently trusted:
BPE_SPEC_VERSION = "bpe-train-v1"


def train_bpe_checkpointed(sf_dir: str, state_dir: str,
                           n_merges: int = BPE_N_MERGES,
                           max_types: int = BPE_MAX_WORD_TYPES,
                           checkpoint_every: int = 16,
                           _crash_after_checkpoints: int | None = None,
                           ) -> pa.Table:
    """Resumable BPE training (reference D2 skip-existing semantics,
    ``util/ocr.py:151-161``, applied to the training chain per the
    round-3 verdict).  Two independently-committed stages:

    1. the CORPUS-SIZED word-type count pass — persisted once as
       ``state_dir/word_counts.parquet`` + commit record; every resume
       with matching lineage loads it instead of re-reading the corpus;
    2. the merge loop — ``state_dir/merges.parquet`` checkpointed every
       ``checkpoint_every`` merges (commit record carries how many are
       trusted).  Resume REPLAYS the committed merges onto the type
       sequences (application only — the expensive per-iteration pair
       statistics are skipped) and continues from the next rank.

    Merges are a pure function of the word-type counts, so a resumed
    run is bit-identical to an uninterrupted one (property-tested).
    ``_crash_after_checkpoints`` is a fault-injection hook for those
    tests: raise after the Nth merge checkpoint commit.

    Single writer per ``state_dir`` (the incremental.py contract)."""
    from ..state import checkpoint as ckpt

    docs_path = os.path.join(sf_dir, "documents.parquet")
    lineage = hashlib.sha256(
        f"{ckpt.input_fingerprint([docs_path])}|{BPE_SPEC_VERSION}"
        f"|{max_types}".encode()).hexdigest()[:16]
    os.makedirs(state_dir, exist_ok=True)
    counts_path = os.path.join(state_dir, "word_counts.parquet")
    counts_rec = os.path.join(state_dir, "word_counts.json")
    merges_path = os.path.join(state_dir, "merges.parquet")
    merges_rec = os.path.join(state_dir, "merges.json")

    # ---- stage 1: word-type counts (the only corpus-sized work) ----
    if ckpt.load_stage_record(counts_rec, lineage):
        tbl = pq.read_table(counts_path)
        words = np.asarray(tbl.column("w").to_pylist(), dtype=object)
        counts = tbl.column("c").to_numpy().astype(np.int64)
    else:
        words, counts = word_type_counts(sf_dir)
        tmp = f"{counts_path}.tmp.{os.getpid()}"
        pq.write_table(pa.table({"w": pa.array(words, pa.string()),
                                 "c": pa.array(counts, pa.int64())}), tmp)
        os.replace(tmp, counts_path)
        ckpt.write_stage_record(counts_rec, {
            "lineage_id": lineage, "status": "complete",
            "n_types": int(len(words))})

    # ---- stage 2: merge loop with periodic checkpoints ----
    wtypes, wcounts = _select_types(words, counts, max_types)
    seqs: list[list[str]] = [list(w) for w in wtypes]
    state: dict[str, list] = {k: [] for k in
                              ("ranks", "lefts", "rights", "mergeds",
                               "pcounts")}
    rec = ckpt.load_stage_record(merges_rec, lineage)
    if rec:
        done = pq.read_table(merges_path).slice(0, rec["n_merges_done"])
        if done.num_rows >= n_merges:
            return done.slice(0, n_merges)
        state["ranks"] = done.column("merge_rank").to_pylist()
        state["lefts"] = done.column("left").to_pylist()
        state["rights"] = done.column("right").to_pylist()
        state["mergeds"] = done.column("merged").to_pylist()
        state["pcounts"] = done.column("pair_count").to_pylist()
        # replay: application only — no pair statistics recomputed
        for left, right in zip(state["lefts"], state["rights"]):
            for i, s in enumerate(seqs):
                if len(s) > 1:
                    seqs[i] = _merge_seq(s, left, right)

    n_checkpoints = 0

    def _commit(n_done: int) -> None:
        tmp = f"{merges_path}.tmp.{os.getpid()}"
        pq.write_table(_merges_table(state), tmp)
        os.replace(tmp, merges_path)
        ckpt.write_stage_record(merges_rec, {
            "lineage_id": lineage, "status": "complete",
            "n_merges_done": n_done})

    def on_merge(rank: int) -> None:
        nonlocal n_checkpoints
        if rank % checkpoint_every == 0:
            _commit(rank)
            n_checkpoints += 1
            if (_crash_after_checkpoints is not None
                    and n_checkpoints >= _crash_after_checkpoints):
                raise RuntimeError(
                    "injected crash after "
                    f"{n_checkpoints} merge checkpoints (test hook)")

    out = _merge_loop(seqs, wcounts, state, n_merges, on_merge=on_merge)
    _commit(len(state["ranks"]))
    return out


# ---------------------------------------------------------------------------
# BPE ENCODE — apply the learned merges to segment the corpus.
#
# Spec (mirrored by the independent oracle fixture): each pre-token
# (``BPE_PATTERN`` word) starts as its character sequence; the learned
# merges are applied IN RANK ORDER, each with the same greedy
# left-to-right non-overlapping replacement used during training.  The
# piece count per document is the sum over its pre-tokens.  This
# rank-order replay is the unambiguous restatement of the classic
# lowest-rank-first encoder (they produce identical segmentations,
# since at any point the lowest-rank applicable merge is the next one
# replayed whose pair is present).
#
# Scale shape: the merge table is O(n_merges) — broadcast once via
# ``ray.put`` — and encoding is memoized per WORD TYPE in a per-actor
# cache (actor pool), so per-batch cost is bounded by the distinct
# types a batch introduces, not its token count.  One streaming pass,
# zero shuffles.
# ---------------------------------------------------------------------------


class BpeEncoder:
    """Actor-pool stage: merge rules fetched once in ``__init__``
    (zero-copy object-store read), word-type piece counts memoized for
    the actor's lifetime."""

    def __init__(self, merges_ref):
        import ray

        self.merges: list[tuple[str, str]] = ray.get(merges_ref)
        self.cache: dict[str, int] = {}

    def _pieces(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            seq = list(word)
            for left, right in self.merges:
                if len(seq) < 2:
                    break
                seq = _merge_seq(seq, left, right)
            if len(self.cache) >= 1_000_000:  # bound actor heap at scale
                self.cache.clear()
            n = self.cache[word] = len(seq)
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_pre = np.zeros(len(texts), np.int64)
        n_pieces = np.zeros(len(texts), np.int64)
        for i, s in enumerate(texts):
            words = _BPE_RE.findall(s)
            if not words:
                continue
            flat = np.empty(len(words), dtype=object)
            flat[:] = words
            uniq, cnt = np.unique(flat, return_counts=True)
            per_type = np.fromiter((self._pieces(w) for w in uniq),
                                   np.int64, count=len(uniq))
            n_pre[i] = len(words)
            n_pieces[i] = int(per_type @ cnt)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_pretokens": pa.array(n_pre),
            "n_pieces": pa.array(n_pieces),
        })


class PieceCounter:
    """Actor-pool stage: full segmentations memoized per word type;
    each batch emits (piece, p_c) partials — the piece vocabulary is
    bounded by |alphabet| + n_merges, so the exchange is tiny."""

    def __init__(self, merges_ref):
        import ray

        self.merges: list[tuple[str, str]] = ray.get(merges_ref)
        self.cache: dict[str, tuple] = {}

    def _pieces(self, word: str) -> tuple:
        seq = self.cache.get(word)
        if seq is None:
            s = list(word)
            for left, right in self.merges:
                if len(s) < 2:
                    break
                s = _merge_seq(s, left, right)
            if len(self.cache) >= 1_000_000:  # bound actor heap at scale
                self.cache.clear()
            seq = self.cache[word] = tuple(s)
        return seq

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for s in batch.column("text").to_pylist():
            words = _BPE_RE.findall(s)
            if not words:
                continue
            flat = np.empty(len(words), dtype=object)
            flat[:] = words
            uniq, cnt = np.unique(flat, return_counts=True)
            for w, c in zip(uniq, cnt):
                for p in self._pieces(w):
                    counts[p] += int(c)
        pieces = sorted(counts)
        return pa.table({
            "piece": pa.array(pieces, pa.string()),
            "p_c": pa.array([counts[p] for p in pieces], pa.int64()),
        })


def q_bpe_piece_counts(sf_dir: str) -> rd.Dataset:
    """Corpus-wide frequency of every BPE piece under the trained
    merges — the tokenizer's vocabulary usage table:
    ``(piece, count)``.  Train -> broadcast rules -> streaming counting
    pass -> one piece-keyed groupby over the vocab-bounded partials."""
    from ray.data.aggregate import Sum as SumAgg

    from ..sources.tables import broadcast

    merges = q_vocab_bpe_merges(sf_dir)
    rules = list(zip(merges.column("left").to_pylist(),
                     merges.column("right").to_pylist()))
    ref = broadcast(rules)
    ds = read_table(sf_dir, "documents", ["text"])
    return (ds.map_batches(PieceCounter, fn_constructor_args=(ref,),
                           batch_format="pyarrow", batch_size=4096,
                           concurrency=(1, 4))
            .groupby("piece").aggregate(SumAgg("p_c", alias_name="count")))


def q_doc_bpe_encode(sf_dir: str,
                     rules: list[tuple[str, str]] | None = None
                     ) -> rd.Dataset:
    """Per-document BPE segmentation stats under the corpus-trained
    merges: ``(doc_id, n_pretokens, n_pieces)``.  Train (two-phase plan
    above) -> broadcast the rule list -> one streaming encode pass.
    Pass ``rules`` (rank-ordered (left, right) pairs, e.g. loaded from
    a persisted merge table) to skip training and encode under an
    existing tokenizer."""
    from ..sources.tables import broadcast

    if rules is None:
        merges = q_vocab_bpe_merges(sf_dir)
        rules = list(zip(merges.column("left").to_pylist(),
                         merges.column("right").to_pylist()))
    ref = broadcast(rules)
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(BpeEncoder, fn_constructor_args=(ref,),
                          batch_format="pyarrow", batch_size=4096,
                          concurrency=(1, 4))

"""Corpus-filtering operators for LLM training data over the
``documents`` table: Gopher-style repetition/quality signals (Rae et
al. 2021, "Scaling Language Models" §A1.1 — public paper) and PII
detection/redaction.

Both are pure per-document ``map_batches`` stages — no shuffle, no
driver state — so they stream at any corpus size.  The PII pass is
fully Arrow-native: pyarrow.compute's RE2 kernels
(``count_substring_regex`` / ``replace_substring_regex``) run the same
regex engine DuckDB uses, so the SQL oracle is bit-identical by
construction.  The repetition kernel is vectorized across the whole
batch with one ``pd.factorize`` + segmented ``np.unique`` pass rather
than a per-document Counter loop.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..sources.tables import read_table

_WS_RE = re.compile(r"\s+")

# --------------------------------------------------------------------------
# PII patterns — ASCII-only RE2 subset (no lookaround, explicit [0-9]) so
# pyarrow.compute (RE2), DuckDB (RE2) and Python re agree on every match.
# Shared verbatim with __ray_entry__.oracle_sql.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

# Redaction is applied in this order (email, then IP, then phone); counts
# are measured on the ORIGINAL text per pattern, so an IP that also looks
# phone-like counts once under each pattern but is redacted exactly once.
_PII_STAGES = (
    (PII_EMAIL, "[EMAIL]", "n_emails"),
    (PII_IPV4, "[IP]", "n_ips"),
    (PII_PHONE, "[PHONE]", "n_phones"),
)


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    """Count + redact PII per document.  All regex work is vectorized
    RE2 over the Arrow column; only the md5 digest loops (cheap)."""
    text = batch.column("text")
    cols: dict[str, pa.Array] = {"doc_id": batch["doc_id"]}
    scrubbed = text
    total = np.zeros(len(batch), dtype=np.int64)
    for pattern, token, name in _PII_STAGES:
        counts = pc.count_substring_regex(text, pattern=pattern)
        cols[name] = pc.cast(counts, pa.int64())
        total += cols[name].to_numpy(zero_copy_only=False)
        scrubbed = pc.replace_substring_regex(
            scrubbed, pattern=pattern, replacement=token)
    cols["pii_total"] = pa.array(total)
    cols["scrub_md5"] = pa.array(
        [hashlib.md5(t.encode("utf-8")).hexdigest()
         for t in scrubbed.to_pylist()], pa.string())
    return pa.table(cols)


def q_doc_pii_scrub(sf_dir: str) -> rd.Dataset:
    """Per-document PII counts (emails / IPv4s / phone-shaped numbers)
    plus the md5 of the redacted text — the scrub a training-data
    pipeline runs before export.  Stateless vectorized map; scale shape
    is a pure stream."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(pii_scrub_batch, batch_format="pyarrow",
                          batch_size=8192)


# --------------------------------------------------------------------------
# Gopher-style quality / repetition signals.

# Adapted Gopher keep-thresholds (documented; the paper's bounds, with the
# repetition bounds tightened to this corpus's scale):
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MAX_TOP_WORD_FRAC = 0.20
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.10


def gopher_quality_batch(batch: pa.Table) -> pa.Table:
    """Vectorized Gopher-style signals: word count, mean word length,
    type/token ratio, most-common-word fraction, most-common-bigram
    fraction, and the keep flag.  One factorize + two np.unique passes
    over the flattened token stream of the whole batch."""
    texts = batch.column("text").to_pylist()
    n_docs = len(texts)
    tok_lists = [_WS_RE.split(t.strip()) if t.strip() else [] for t in texts]
    n_words = np.array([len(l) for l in tok_lists], dtype=np.int64)

    flat = np.concatenate([np.asarray(l, dtype=object) for l in tok_lists]) \
        if n_words.sum() else np.empty(0, dtype=object)
    doc_ix = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)
    char_lens = np.fromiter((len(w) for w in flat), dtype=np.int64,
                            count=len(flat))
    sum_chars = np.bincount(doc_ix, weights=char_lens, minlength=n_docs)
    safe_n = np.maximum(n_words, 1).astype(np.float64)
    mean_word_len = np.where(n_words > 0, sum_chars / safe_n, 0.0)

    codes, uniques = pd.factorize(flat) if len(flat) else (
        np.empty(0, dtype=np.int64), np.empty(0, dtype=object))
    vocab = max(len(uniques), 1)
    # distinct-(doc, word) accounting in one pass
    word_keys = doc_ix * vocab + codes
    uniq_w, counts_w = np.unique(word_keys, return_counts=True)
    top_word = np.zeros(n_docs, dtype=np.int64)
    np.maximum.at(top_word, uniq_w // vocab, counts_w)
    n_unique = np.bincount(uniq_w // vocab, minlength=n_docs)

    # bigrams: adjacent codes within a doc (mask the seam between docs)
    if len(codes) > 1:
        same_doc = doc_ix[1:] == doc_ix[:-1]
        bg = codes[:-1].astype(np.int64) * vocab + codes[1:]
        bg_codes, bg_uniques = pd.factorize(bg[same_doc])
        bg_docs = doc_ix[1:][same_doc]
        bg_vocab = max(len(bg_uniques), 1)
        uniq_b, counts_b = np.unique(bg_docs * bg_vocab + bg_codes,
                                     return_counts=True)
        top_bigram = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(top_bigram, uniq_b // bg_vocab, counts_b)
    else:
        top_bigram = np.zeros(n_docs, dtype=np.int64)

    n_bigrams = np.maximum(n_words - 1, 0)
    safe_nb = np.maximum(n_bigrams, 1).astype(np.float64)
    type_token_ratio = np.where(n_words > 0, n_unique / safe_n, 0.0)
    top_word_frac = np.where(n_words > 0, top_word / safe_n, 0.0)
    top_bigram_frac = np.where(n_bigrams > 0, top_bigram / safe_nb, 0.0)

    keep = ((n_words >= GOPHER_MIN_WORDS)
            & (n_words <= GOPHER_MAX_WORDS)
            & (mean_word_len >= GOPHER_MIN_MEAN_LEN)
            & (mean_word_len <= GOPHER_MAX_MEAN_LEN)
            & (top_word_frac <= GOPHER_MAX_TOP_WORD_FRAC)
            & (top_bigram_frac <= GOPHER_MAX_TOP_BIGRAM_FRAC))
    # keep is int64 0/1 so the driver's value hash is dtype-stable
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(n_words),
        "mean_word_len": pa.array(mean_word_len),
        "n_unique_words": pa.array(n_unique.astype(np.int64)),
        "type_token_ratio": pa.array(type_token_ratio),
        "top_word_frac": pa.array(top_word_frac),
        "top_bigram_frac": pa.array(top_bigram_frac),
        "keep": pa.array(keep.astype(np.int64)),
    })


# --------------------------------------------------------------------------
# Gopher repetition signals (Rae et al. 2021 Table A1, the n-gram rows):
# top n-gram CHARACTER fraction for n = 2,3,4 and duplicate-5-gram token
# coverage.  ``q_doc_gopher_quality`` above carries the word/bigram COUNT
# fractions; these are the remaining repetition rows of the filter table.

REP_TOP_NS = (2, 3, 4)
# The paper runs duplicate-n-gram coverage at n in 5..10; this corpus's
# word-soup docs never repeat a 5-gram within a document (checked at
# sf0.1), so the shipped signal runs the same kernel at n=3 — the same
# corpus-scale adaptation as the Gopher keep-bounds above.
REP_DUP_N = 3


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Vectorized within-document repetition signals over a batch.

    * ``top{n}_char_frac`` (n = 2,3,4): max over distinct n-grams of
      occurrences x char-length(gram) divided by the doc's total chars
      (gram/doc text = tokens joined by single spaces).  Gopher says
      "characters in the most frequently-occurring n-gram"; taking the
      max of count x length resolves count ties deterministically
      toward the larger coverage (documented divergence).
    * ``dup{REP_DUP_N}_tok_frac``: fraction of token positions
      covered by at least one REP_DUP_N-gram occurring >= 2 times in
      the document — the position-union form, so overlap never
      double-counts.

    Gram identity is the 64-bit polynomial over siphash token ids (the
    dedup-suite convention; the SQL oracle uses exact strings — a
    collision would need ~2^32 distinct grams in one batch).  One
    token-hash call and one lexsort per n; no per-document loop.
    """
    texts = batch.column("text").to_pylist()
    n_docs = len(texts)
    tok_lists = [_WS_RE.split(t.strip()) if t.strip() else [] for t in texts]
    n_words = np.fromiter((len(x) for x in tok_lists), dtype=np.int64,
                          count=n_docs)
    total = int(n_words.sum())
    flat = np.empty(total, dtype=object)
    if total:
        flat[:] = [w for ws in tok_lists for w in ws]
    doc_ix = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)
    char_lens = np.fromiter((len(w) for w in flat), dtype=np.int64,
                            count=total)
    total_chars = (np.bincount(doc_ix, weights=char_lens.astype(np.float64),
                               minlength=n_docs).astype(np.int64)
                   + np.maximum(n_words - 1, 0))
    h = (pd.util.hash_array(flat).astype(np.uint64) if total
         else np.zeros(0, np.uint64))
    psum = np.concatenate([[0], np.cumsum(char_lens)])

    out: dict[str, pa.Array] = {"doc_id": batch["doc_id"],
                                "n_tokens": pa.array(n_words)}
    safe_chars = np.maximum(total_chars, 1).astype(np.float64)
    for n in REP_TOP_NS:
        best = np.zeros(n_docs, dtype=np.int64)
        m = total - n + 1
        if m > 0:
            from .dedup import _gram_ids

            g = _gram_ids(h, n)
            valid = doc_ix[:m] == doc_ix[n - 1:]
            gg, gd = g[valid], doc_ix[:m][valid]
            gl = (psum[n:] - psum[:-n])[valid] + (n - 1)
            if len(gg):
                order = np.lexsort((gg, gd))
                gs, ds_, ls = gg[order], gd[order], gl[order]
                new = np.concatenate(
                    [[True], (ds_[1:] != ds_[:-1]) | (gs[1:] != gs[:-1])])
                starts = np.flatnonzero(new)
                cnt = np.diff(np.concatenate([starts, [len(gs)]]))
                np.maximum.at(best, ds_[starts], cnt * ls[starts])
        # int / int division: bit-identical to the oracle's DOUBLE math
        frac = np.where(total_chars > 0, best / safe_chars, 0.0)
        out[f"top{n}_char_frac"] = pa.array(frac)

    cov_n = np.zeros(n_docs, dtype=np.int64)
    m = total - REP_DUP_N + 1
    if m > 0:
        from .dedup import _gram_ids

        g = _gram_ids(h, REP_DUP_N)
        pos = np.arange(m, dtype=np.int64)
        valid = doc_ix[:m] == doc_ix[REP_DUP_N - 1:]
        gg, gd, gp = g[valid], doc_ix[:m][valid], pos[valid]
        if len(gg):
            order = np.lexsort((gg, gd))
            gs, ds_, ps_ = gg[order], gd[order], gp[order]
            new = np.concatenate(
                [[True], (ds_[1:] != ds_[:-1]) | (gs[1:] != gs[:-1])])
            seg = np.cumsum(new) - 1
            seg_cnt = np.bincount(seg)
            starts_pos = ps_[seg_cnt[seg] >= 2]
            if len(starts_pos):
                diff = np.zeros(total + REP_DUP_N, np.int64)
                np.add.at(diff, starts_pos, 1)
                np.add.at(diff, starts_pos + REP_DUP_N, -1)
                covered = np.cumsum(diff)[:total] > 0
                cov_n = np.bincount(doc_ix[covered],
                                    minlength=n_docs).astype(np.int64)
    safe_n = np.maximum(n_words, 1).astype(np.float64)
    frac5 = np.where(n_words > 0, cov_n / safe_n, 0.0)
    out[f"dup{REP_DUP_N}_tok_frac"] = pa.array(frac5)
    return pa.table(out)


def q_doc_repetition(sf_dir: str) -> rd.Dataset:
    """Gopher repetition-signal table per document: top-{2,3,4}-gram
    character fractions and duplicate-``REP_DUP_N``-gram token coverage.  Pure
    streaming ``map_batches`` — no shuffle, no driver state — so the
    shape holds at any corpus size."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    # 1024-doc batches: enough tasks to pack the CPUs even on a 5k-row
    # bench table (see BASELINE.md's small-corpus parallelism note)
    return ds.map_batches(repetition_batch, batch_format="pyarrow",
                          batch_size=1024)


def q_doc_gopher_quality(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetition/quality filter signals per document —
    the within-document complement to the cross-document
    ``doc_dup_ngram_stats``.  Pure streaming map; the keep flag applies
    the (documented, adapted) Gopher bounds."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(gopher_quality_batch, batch_format="pyarrow",
                          batch_size=8192)

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


def q_doc_gopher_quality(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetition/quality filter signals per document —
    the within-document complement to the cross-document
    ``doc_dup_ngram_stats``.  Pure streaming map; the keep flag applies
    the (documented, adapted) Gopher bounds."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(gopher_quality_batch, batch_format="pyarrow",
                          batch_size=8192)

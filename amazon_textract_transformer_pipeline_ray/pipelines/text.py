"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language ID, fingerprinting, exact dedup.

All per-document work is vectorized-per-batch ``map_batches``; stateful
pieces (compiled regexes, stopword tables, n-gram profiles) live in actor
``__init__`` — the same actor-pool shape as the extraction classifier.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Mean, Min, Sum

from ..sources.tables import read_table

# Frozen stopword list for quality scoring (shared with the SQL oracle —
# keep in sync with __ray_entry__.oracle_sql):
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

_WS_RE = re.compile(r"\s+")


def token_counts(texts: list[str]) -> np.ndarray:
    """Whitespace token count per text (empty/whitespace-only -> 0)."""
    return np.array(
        [len(_WS_RE.split(t.strip())) if t.strip() else 0 for t in texts],
        dtype=np.int64)


def q_doc_stats_by_lang(sf_dir: str) -> rd.Dataset:
    """Per language: doc count, avg chars, avg whitespace tokens."""
    ds = read_table(sf_dir, "documents", ["lang", "text", "n_chars"])

    def stats(batch: pa.Table) -> pa.Table:
        toks = token_counts(batch.column("text").to_pylist())
        return pa.table({
            "lang": batch["lang"],
            "n_chars": batch["n_chars"],
            "n_tokens": pa.array(toks),
        })

    final = (ds.map_batches(stats, batch_format="pyarrow", batch_size=8192)
             .groupby("lang").aggregate(
                 Count(alias_name="n_docs"),
                 Sum("n_chars", alias_name="sum_chars"),
                 Sum("n_tokens", alias_name="sum_tokens"),
             ))

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_docs"].to_numpy().astype(np.float64)
        return pa.table({
            "lang": t["lang"],
            "n_docs": t["n_docs"],
            "avg_chars": pa.array(
                t["sum_chars"].to_numpy().astype(np.float64) / n),
            "avg_tokens": pa.array(
                t["sum_tokens"].to_numpy().astype(np.float64) / n),
        })

    return final.map_batches(finish, batch_format="pyarrow")


def q_token_totals(sf_dir: str) -> pd.DataFrame:
    """Corpus totals: docs + tokens (single-row result)."""
    ds = read_table(sf_dir, "documents", ["text"])

    def toks(batch: pa.Table) -> pa.Table:
        return pa.table({"n_tokens": token_counts(batch.column("text").to_pylist())})

    agg = ds.map_batches(toks, batch_format="pyarrow", batch_size=8192).aggregate(
        Sum("n_tokens", alias_name="total_tokens"),
        Count(alias_name="n_docs"))
    return pd.DataFrame([agg])


QUANTILES = (0.25, 0.5, 0.75, 0.9, 0.99)


def q_doc_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """EXACT quantiles (linear interpolation, quantile_cont semantics) of
    document length, computed distributed without a global sort: per-batch
    value counts -> keyed sum -> the small distinct-value histogram comes
    to the driver, where cumulative counts locate the interpolation
    endpoints.  Scale shape: the shuffle moves one row per (distinct
    length, batch) — never a row per document."""
    ds = read_table(sf_dir, "documents", ["n_chars"])

    def counts(batch: pa.Table) -> pa.Table:
        vals, cnts = np.unique(batch.column("n_chars").to_numpy(),
                               return_counts=True)
        return pa.table({"value": pa.array(vals.astype(np.int64)),
                         "p_cnt": pa.array(cnts.astype(np.int64))})

    hist = (ds.map_batches(counts, batch_format="pyarrow", batch_size=65536)
            .groupby("value").aggregate(Sum("p_cnt", alias_name="cnt"))
            .to_pandas().sort_values("value").reset_index(drop=True))
    values = hist["value"].to_numpy(dtype=np.float64)
    cum = hist["cnt"].to_numpy(dtype=np.int64).cumsum()
    n = int(cum[-1]) if len(cum) else 0

    def value_at(ix: int) -> float:
        return float(values[np.searchsorted(cum, ix + 1)])

    rows = []
    for q in QUANTILES:
        if n == 0:
            rows.append((q, float("nan")))
            continue
        h = (n - 1) * q  # quantile_cont's interpolation position
        lo = int(np.floor(h))
        hi = min(lo + 1, n - 1)
        frac = h - lo
        # DuckDB's exact op order: (1-f)*lo + f*hi (bit-identical)
        v = (1.0 - frac) * value_at(lo) + frac * value_at(hi)
        rows.append((q, v))
    return pd.DataFrame(rows, columns=["q", "value"])


# BPE-ish pre-tokenization pattern (GPT-2-style word/number/punct splits,
# restricted to ASCII classes so Python re and DuckDB RE2 agree exactly;
# shared with the SQL oracle):
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
_BPE_RE = re.compile(BPE_PATTERN)


def q_token_totals_bpe(sf_dir: str) -> rd.Dataset:
    """Per language: BPE-ish subword-piece counts (the regex
    pre-tokenization stage of a GPT-2-style tokenizer) — complements the
    whitespace counting of q_token_totals."""
    ds = read_table(sf_dir, "documents", ["lang", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        counts = np.array(
            [len(_BPE_RE.findall(t)) for t in batch.column("text").to_pylist()],
            dtype=np.int64)
        return pa.table({"lang": batch["lang"],
                         "n_pieces": pa.array(counts)})

    return (ds.map_batches(toks, batch_format="pyarrow", batch_size=8192)
            .groupby("lang").aggregate(
                Sum("n_pieces", alias_name="total_pieces"),
                Count(alias_name="n_docs")))


# Polynomial rolling hash (Rabin-Karp) over the document bytes — the
# incremental-fingerprint primitive used by winnowing-style document
# fingerprinting; deterministic across processes.
_RH_BASE = np.uint64(257)
_RH_MOD = np.uint64(1_000_000_007)


_RH_POWS = np.ones(1, dtype=np.uint64)  # grown on demand, worker-local


def _rh_pows(n: int) -> np.ndarray:
    """BASE^i mod MOD for i in [0, n) — extended incrementally, cached."""
    global _RH_POWS
    if len(_RH_POWS) < n:
        old = _RH_POWS
        grown = np.empty(n, dtype=np.uint64)
        grown[:len(old)] = old
        for i in range(len(old), n):
            grown[i] = (grown[i - 1] * _RH_BASE) % _RH_MOD
        _RH_POWS = grown
    return _RH_POWS[:n]


def rolling_fingerprint(text: str) -> int:
    """h = sum(byte_i * BASE^(n-1-i)) mod MOD, fully vectorized: each term
    < 2^38 and partial sums stay < 2^63 for any realistic doc length, so
    one multiply-sum + one mod suffices."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n == 0:
        return 0
    pows = _rh_pows(n)[::-1]
    return int((data * pows).sum() % _RH_MOD)


class RollingFingerprinter:
    """Actor-pool stage computing the Rabin-Karp fingerprint per doc
    (power table built lazily once per worker — A1-style amortized state)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [rolling_fingerprint(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "rolling_fp": pa.array(np.array(fps, dtype=np.uint64)),
        })


def q_doc_fingerprint_rolling(sf_dir: str) -> rd.Dataset:
    """Per-document polynomial rolling-hash fingerprint (rows-only)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(RollingFingerprinter(), batch_format="pyarrow",
                          batch_size=8192)


def q_doc_fingerprint(sf_dir: str) -> rd.Dataset:
    """Deterministic per-document content fingerprint (md5 of the raw
    text) — the exact-dedup / lineage key."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def fp(batch: pa.Table) -> pa.Table:
        digests = [hashlib.md5(t.encode("utf-8")).hexdigest()
                   for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "fingerprint": pa.array(digests, pa.string())})

    return ds.map_batches(fp, batch_format="pyarrow", batch_size=8192)


def q_doc_dedup_exact(sf_dir: str) -> rd.Dataset:
    """Exact dedup: keep min(doc_id) per distinct text; output
    (keep_doc_id, n_copies) — hash-partitioned groupby over the
    fingerprint, per-group first (ray_guide 'Exact dedup')."""
    fps = q_doc_fingerprint(sf_dir)
    return fps.groupby("fingerprint").aggregate(
        # min doc_id is the canonical survivor; count = copies seen
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_copies"),
    ).select_columns(["keep_doc_id", "n_copies"])


class QualityScorer:
    """Quality heuristics per doc (length / stopword ratio / mean token
    length) — actor-pool stage with state built once."""

    def __init__(self):
        self.stop = frozenset(STOPWORDS)
        self.ws = re.compile(r"\s+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tokens = np.zeros(len(texts), dtype=np.int64)
        stop_ratio = np.zeros(len(texts))
        mean_len = np.zeros(len(texts))
        for i, t in enumerate(texts):
            toks = self.ws.split(t.strip()) if t.strip() else []
            n_tokens[i] = len(toks)
            if toks:
                stop_ratio[i] = sum(1 for w in toks if w in self.stop) / len(toks)
                mean_len[i] = sum(len(w) for w in toks) / len(toks)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(n_tokens),
            "stopword_ratio": pa.array(stop_ratio),
            "mean_token_len": pa.array(mean_len),
        })


def q_doc_quality(sf_dir: str) -> rd.Dataset:
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(QualityScorer(), batch_format="pyarrow",
                          batch_size=8192)


# Character n-gram profiles per language for the heuristic language ID.
# Tiny frozen profiles (top trigrams of each language from public corpora
# knowledge); deterministic, self-contained.
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", " th", "he ", "er ", "on ", " of", "of "),
    "de": ("der", "die", "und", "sch", "ein", "ich", "en ", "ch ", " de", "er "),
    "fr": ("les", "de ", " de", "ent", "ion", "es ", "la ", " la", "et ", "que"),
    "es": ("de ", " de", "los", "la ", " la", "el ", " el", "ión", "que", "os "),
    "zh": ("的", "是", "了", "在", "我", "有", "他", "这", "中", "大"),
}


class LangId:
    """N-gram-overlap language classifier (actor-pool stage).

    Scores each language by profile-trigram hits per char; ties broken by
    language code order.  A heuristic, not SQL-expressible -> rows-only
    check in the driver."""

    def __init__(self):
        self.profiles = {
            lang: tuple(grams) for lang, grams in _LANG_PROFILES.items()
        }

    def classify(self, text: str) -> str:
        t = text.lower()
        best_lang, best_score = "und", 0.0
        for lang in sorted(self.profiles):
            score = sum(t.count(g) for g in self.profiles[lang])
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch["doc_id"],
                         "pred_lang": pa.array(preds, pa.string())})


def q_doc_langid(sf_dir: str) -> rd.Dataset:
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(LangId(), batch_format="pyarrow",
                          batch_size=8192)


def q_doc_length_quantiles_by_lang(sf_dir: str) -> rd.Dataset:
    """GROUPED exact quantiles (quantile_cont semantics) of document
    length per language — the per-group twin of
    ``q_doc_length_quantiles``, still with no global sort: per-batch
    (lang, value) counts ride ONE lang-keyed shuffle, and each group's
    small distinct-value histogram is reduced and interpolated inside
    ``map_groups``.  The shuffle moves one row per (lang, distinct
    length, batch) — never a row per document — and no histogram ever
    reaches the driver."""
    ds = read_table(sf_dir, "documents", ["lang", "n_chars"])

    def counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pandas(),
            "value": batch.column("n_chars").to_numpy().astype(np.int64),
        })
        g = df.groupby(["lang", "value"], as_index=False).size()
        return pa.table({"lang": pa.array(g["lang"], pa.string()),
                         "value": pa.array(g["value"].to_numpy()),
                         "p_cnt": pa.array(g["size"].to_numpy()
                                           .astype(np.int64))})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        h = (g.groupby("value", as_index=False)["p_cnt"].sum()
             .sort_values("value"))
        values = h["value"].to_numpy(dtype=np.float64)
        cum = h["p_cnt"].to_numpy(dtype=np.int64).cumsum()
        n = int(cum[-1])

        def value_at(ix: int) -> float:
            return float(values[np.searchsorted(cum, ix + 1)])

        rows = []
        for q in QUANTILES:
            hpos = (n - 1) * q
            lo = int(np.floor(hpos))
            hi = min(lo + 1, n - 1)
            frac = hpos - lo
            # DuckDB's exact op order: (1-f)*lo + f*hi (bit-identical)
            rows.append((g["lang"].iloc[0], q,
                         (1.0 - frac) * value_at(lo) + frac * value_at(hi)))
        return pd.DataFrame(rows, columns=["lang", "q", "value"])

    return (ds.map_batches(counts, batch_format="pyarrow", batch_size=65536)
            .groupby("lang").map_groups(finish, batch_format="pandas"))


def q_doc_length_percentile(sf_dir: str) -> rd.Dataset:
    """Corpus-wide percent_rank of every document's length — the
    global-CDF window function computed WITHOUT a global sort: the
    distinct-value count histogram (one tiny keyed shuffle, same
    reduction as the quantile ops) is broadcast back, and a second
    streaming pass ranks each doc with one vectorized ``searchsorted``.
    ``pct = (count of strictly smaller values) / (n - 1)`` — one exact
    integer count and ONE f64 division, bit-identical to the SQL
    window."""
    import ray

    from ..sources.tables import broadcast

    ds = read_table(sf_dir, "documents", ["n_chars"])

    def counts(batch: pa.Table) -> pa.Table:
        vals, cnts = np.unique(batch.column("n_chars").to_numpy(),
                               return_counts=True)
        return pa.table({"value": pa.array(vals.astype(np.int64)),
                         "p_cnt": pa.array(cnts.astype(np.int64))})

    hist = (ds.map_batches(counts, batch_format="pyarrow", batch_size=65536)
            .groupby("value").aggregate(Sum("p_cnt", alias_name="cnt"))
            .to_pandas().sort_values("value").reset_index(drop=True))
    values = hist["value"].to_numpy(dtype=np.int64)
    below = np.concatenate([[0], hist["cnt"].to_numpy(np.int64).cumsum()[:-1]])
    n = int(hist["cnt"].sum())
    ref = broadcast((values, below))

    def rank(batch: pa.Table) -> pa.Table:
        v, b = ray.get(ref)
        x = batch.column("n_chars").to_numpy()
        smaller = b[np.searchsorted(v, x)]
        pct = (smaller.astype(np.float64) / (n - 1) if n > 1
               else np.zeros(len(x)))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars": batch["n_chars"],
            "length_pct": pa.array(pct),
        })

    docs = read_table(sf_dir, "documents", ["doc_id", "n_chars"])
    return docs.map_batches(rank, batch_format="pyarrow", batch_size=65536)


LENGTH_PCT_SQL = """
    SELECT doc_id, n_chars,
           percent_rank() OVER (ORDER BY n_chars) AS length_pct
    FROM documents
"""


def q_doc_stats_rollup(sf_dir: str) -> rd.Dataset:
    """Multi-level aggregation in ONE pass (SQL GROUPING SETS
    ``(lang, source), (lang), ()``): doc count and total chars at the
    leaf, per-lang, and grand-total levels.  ``level`` mirrors
    ``GROUPING(lang)+GROUPING(source)`` (0 leaf / 1 lang / 2 total);
    rolled-up keys carry the ``'<all>'`` sentinel so the compare never
    sees NULL group keys.

    Scale shape: each batch pre-aggregates its leaf cells and EXPLODES
    them to the three rollup keys, so the single tiny groupby exchange
    carries <= 3x leaf-cell rows per batch — never row-level data."""
    ds = read_table(sf_dir, "documents", ["lang", "source", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": t.column("lang").to_pylist(),
            "source": t.column("source").to_pylist(),
            "p_c": t.column("n_chars").to_numpy(),
        })
        leaf = (df.groupby(["lang", "source"], as_index=False)
                .agg(p_n=("p_c", "size"), p_c=("p_c", "sum")))
        leaf["level"] = 0
        by_lang = (leaf.groupby("lang", as_index=False)
                   [["p_n", "p_c"]].sum())
        by_lang["source"] = "<all>"
        by_lang["level"] = 1
        total = pd.DataFrame({
            "lang": ["<all>"], "source": ["<all>"], "level": [2],
            "p_n": [leaf["p_n"].sum()], "p_c": [leaf["p_c"].sum()],
        })
        out = pd.concat([leaf, by_lang, total], ignore_index=True)
        return pa.table({
            "lang": pa.array(out["lang"], pa.string()),
            "source": pa.array(out["source"], pa.string()),
            "level": pa.array(out["level"].astype(np.int64)),
            "p_n": pa.array(out["p_n"].astype(np.int64)),
            "p_c": pa.array(out["p_c"].astype(np.int64)),
        })

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["lang", "source", "level"]).aggregate(
                Sum("p_n", alias_name="n_docs"),
                Sum("p_c", alias_name="sum_chars")))


STATS_ROLLUP_SQL = """
    SELECT COALESCE(lang, '<all>') AS lang,
           COALESCE(source, '<all>') AS source,
           CAST(GROUPING(lang) + GROUPING(source) AS BIGINT) AS level,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    GROUP BY GROUPING SETS ((lang, source), (lang), ())
"""


# Normalization spec shared verbatim with the SQL oracle: lowercase,
# collapse whitespace runs to one space, trim ASCII spaces.  Both sides
# run RE2 (pyarrow kernels here, DuckDB regexp_replace there) and both
# trim exactly the ' ' character — NOT utf8_trim_whitespace, which would
# strip Unicode whitespace (U+00A0 ...) that DuckDB trim() and RE2's
# ASCII-only \s leave in place — so the normalized strings and their
# md5s are bit-identical by construction, the PII-scrub equivalence
# argument.
_NORM_WS_PATTERN = r"\s+"


def _normalize_batch(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    norm = pc.utf8_trim(pc.replace_substring_regex(
        pc.utf8_lower(batch.column("text")),
        pattern=_NORM_WS_PATTERN, replacement=" "), characters=" ")
    texts = norm.to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "norm_md5": pa.array(
            [hashlib.md5(s.encode("utf-8")).hexdigest() for s in texts],
            pa.string()),
        "n_norm_chars": pa.array(
            np.array([len(s) for s in texts], np.int64)),
    })


def q_doc_normalize(sf_dir: str) -> rd.Dataset:
    """Canonical-form fingerprints per doc — the pre-dedup text
    normalization pass: ``(doc_id, norm_md5, n_norm_chars)``.  One
    streaming map_batches, zero shuffles."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(_normalize_batch, batch_format="pyarrow",
                          batch_size=8192)


def q_doc_dedup_normalized(sf_dir: str) -> rd.Dataset:
    """Exact dedup over the NORMALIZED text (catches case/whitespace
    variants plain exact dedup misses): min doc_id survives per
    canonical form — ``(keep_doc_id, n_variants)``.  The normalize
    pass fuses into the read; one hash groupby, the q_doc_dedup_exact
    shape."""
    return (q_doc_normalize(sf_dir)
            .groupby("norm_md5").aggregate(
                Min("doc_id", alias_name="keep_doc_id"),
                Count(alias_name="n_variants"))
            .select_columns(["keep_doc_id", "n_variants"]))


DOC_NORMALIZE_SQL = r"""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'), ' '))
               AS norm_md5,
           CAST(length(trim(regexp_replace(lower(text), '\s+', ' ', 'g'), ' '))
                AS BIGINT) AS n_norm_chars
    FROM documents
"""

DOC_DEDUP_NORMALIZED_SQL = r"""
    SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_variants
    FROM (SELECT doc_id,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'), ' '))
                     AS norm_md5
          FROM documents)
    GROUP BY norm_md5
"""


def q_doc_lexical_diversity(sf_dir: str) -> rd.Dataset:
    """Per-doc lexical diversity: whitespace token count, distinct
    token count, and type-token ratio — the repetitiveness signal
    quality filters read alongside the Gopher fractions.  Output:
    ``(doc_id, n_tokens, n_distinct, ttr)``; one streaming pass."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_tok = np.zeros(len(texts), np.int64)
        n_dis = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            s = t.strip()
            if not s:
                continue
            toks = _WS_RE.split(s)
            n_tok[i] = len(toks)
            n_dis[i] = len(set(toks))
        ttr = np.where(n_tok > 0, n_dis / np.maximum(n_tok, 1), 0.0)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array(n_tok),
            "n_distinct": pa.array(n_dis),
            "ttr": pa.array(ttr),
        })

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=8192)


LEXICAL_DIVERSITY_SQL = r"""
    SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END
                AS BIGINT) AS n_tokens,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(list_distinct(
                         regexp_split_to_array(trim(text), '\s+'))) END
                AS BIGINT) AS n_distinct,
           CASE WHEN trim(text) = '' THEN 0.0
                ELSE CAST(len(list_distinct(
                              regexp_split_to_array(trim(text), '\s+')))
                          AS DOUBLE)
                     / len(regexp_split_to_array(trim(text), '\s+')) END
               AS ttr
    FROM documents
"""

"""Language-model quality scoring over the ``documents`` table: per-doc
cross-entropy under a corpus-fit unigram model — the CCNet-style
"perplexity bucket" signal (Wenzek et al. 2020, public paper) with the
external KenLM replaced by a self-fit unigram LM (no model deps).

Per document: ``lm_bits = -(1/n_d) * sum_positions log2 p(w)`` where
``p(w) = N_w / N`` (corpus unigram MLE).  Low bits = typical text,
high bits = rare-token soup — the filter keeps a middle band in a real
pipeline; here we emit the raw signal.

Two physical plans, identical results, one SQL oracle:

* ``q_doc_lm_score`` — BROADCAST plan: distributed token-count groupby
  reduced to (vocab, counts) arrays on the driver (vocabularies are
  sublinear in corpus size — tens of millions of types at web scale,
  a few hundred MB — the same small-side bound as the dedup suite's
  exact variants), ``ray.put`` once, then one streaming scoring pass
  with a vectorized ``searchsorted`` probe.
* ``q_doc_lm_score_shuffled`` — BOTH-SIDES-BIG twin: distinct
  (doc, token, count) rows through ONE coarse token-shard shuffle
  (hashed token ids, not strings, ship through the exchange); every
  row of a token lands in the same shard, so per-token totals are
  computed in-shard with no second pass; per-doc partials then fold
  through the union-with-zeros groupby(doc_id).  The only driver state
  is the grand-total scalar N.

Float convention: the per-doc sum is order-sensitive, so the final
column is f32 (``REAL`` in the oracle) per the repo convention.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..sources.scale import shuffle_width, table_num_rows
from ..sources.tables import broadcast, read_table
from .dedup import LSH_ROWS_PER_SHARD, _tokens


def _batch_doc_token_counts(
    texts: list[str],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Distinct (doc, token) pairs for a batch: returns
    (tokens_obj, doc_ix, counts, n_tokens_per_doc) — one factorize-free
    lexsort pass, no per-doc Python loop."""
    tok_lists = [_tokens(t) for t in texts]
    n = len(texts)
    lens = np.fromiter((len(x) for x in tok_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    if not total:
        z = np.zeros(0, np.int64)
        return np.empty(0, object), z, z, lens
    flat = np.empty(total, dtype=object)
    flat[:] = [w for ws in tok_lists for w in ws]
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    codes, uniques = pd.factorize(flat)
    key = doc * max(len(uniques), 1) + codes
    uk, counts = np.unique(key, return_counts=True)
    return (np.asarray(uniques, dtype=object)[uk % max(len(uniques), 1)],
            uk // max(len(uniques), 1), counts.astype(np.int64), lens)


def _finish(doc_id: pa.Array, n_tokens: np.ndarray,
            bits_sum: np.ndarray) -> pa.Table:
    nd = n_tokens.astype(np.float64)
    bits = np.divide(-bits_sum, nd, out=np.zeros_like(nd), where=nd > 0)
    return pa.table({
        "doc_id": doc_id,
        "n_tokens": pa.array(n_tokens.astype(np.int64)),
        "lm_bits": pa.array(bits.astype(np.float32)),
    })


# Driver budget for the vocab-sized reductions (the unigram-LM fit and
# q_vocab_top's rank).  Vocabularies are sublinear in corpus size but a
# web-scale corpus still reaches billions of types; pulling that to one
# process must fail LOUDLY with a pointer to the fixed-size sketch twins
# (q_token_counts_cms for frequencies, DSIR's hashed fixed-bucket model
# for scoring), not OOM the driver.  5e7 rows ~= a few GB of (token,
# count) pairs — the same spirit as the jaccard anchor's cells budget.
VOCAB_DRIVER_BUDGET_ROWS = int(
    os.environ.get("GRAFT_VOCAB_DRIVER_BUDGET", 5 * 10**7))

# Misra-Gries candidate-union budget for q_token_heavy_hitters: the
# per-batch MG retention bound keeps <= 1/phi survivors PER BATCH, so
# the candidate union grows O(n_batches/phi) — fine at sandbox scale,
# unbounded in batch count.  Past this the query must point at the
# constant-space frequency sketch (q_token_counts_cms).
HH_CANDIDATE_BUDGET_ROWS = int(
    os.environ.get("GRAFT_HH_CANDIDATE_BUDGET", 2 * 10**7))


def _unigram_model(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(sorted vocab array, counts): distributed per-batch partial
    counts -> one token groupby -> vocab-sized arrays on the driver.

    Guarded: raises past ``VOCAB_DRIVER_BUDGET_ROWS`` instead of
    materializing an unbounded vocabulary on one process."""
    ds = read_table(sf_dir, "documents", ["text"])

    def partial(t: pa.Table) -> pa.Table:
        toks, _, counts, _ = _batch_doc_token_counts(
            t.column("text").to_pylist())
        df = pd.DataFrame({"w": toks, "c": counts})
        g = df.groupby("w", as_index=False, sort=False)["c"].sum()
        return pa.table({"w": pa.array(g["w"], pa.string()),
                         "p_c": pa.array(g["c"].to_numpy())})

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
           .groupby("w").aggregate(Sum("p_c", alias_name="c")))
    ws, cs, n_rows = [], [], 0
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        if "w" in b.column_names and len(b):
            n_rows += len(b)
            if n_rows > VOCAB_DRIVER_BUDGET_ROWS:
                raise ValueError(
                    f"unigram-LM fit: vocabulary exceeds the driver "
                    f"budget ({n_rows:,}+ types > "
                    f"{VOCAB_DRIVER_BUDGET_ROWS:,}). The vocab-sized "
                    "driver reduction is the documented small-side anchor "
                    "(q_vocab_top / q_doc_lm_score broadcast plan); at "
                    "this scale use the constant-space twins — "
                    "q_token_counts_cms for frequencies, "
                    "q_doc_lm_score_shuffled / q_doc_dsir_weights "
                    "(hashed fixed-bucket model) for scoring.")
            ws.append(np.asarray(b.column("w").to_pylist(), dtype=object))
            cs.append(b.column("c").to_numpy())
    if not ws:
        return np.empty(0, object), np.zeros(0, np.int64)
    w = np.concatenate(ws)
    c = np.concatenate(cs).astype(np.int64)
    order = np.argsort(w)
    return w[order], c[order]


def q_doc_lm_score(sf_dir: str) -> rd.Dataset:
    """Per-doc unigram cross-entropy (bits/token) via the broadcast
    plan — see module docstring."""
    vocab, counts = _unigram_model(sf_dir)
    total = float(counts.sum())
    ref = broadcast((vocab, counts))
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        v, c = ray.get(ref)
        toks, dix, cnt, lens = _batch_doc_token_counts(
            t.column("text").to_pylist())
        bits_sum = np.zeros(len(t), np.float64)
        if len(toks):
            ix = np.searchsorted(v, toks)
            # every token is in-vocab (model fit on this corpus)
            logp = np.log2(c[ix].astype(np.float64) / total)
            np.add.at(bits_sum, dix, cnt.astype(np.float64) * logp)
        return _finish(t.column("doc_id").cast(pa.int64()), lens, bits_sum)

    return docs.map_batches(score, batch_format="pyarrow", batch_size=8192)


def _lm_len_rows(t: pa.Table) -> pa.Table:
    """Per-doc token counts (for the grand-total-N streaming sum)."""
    texts = t.column("text").to_pylist()
    lens = np.fromiter((len(_tokens(x)) for x in texts),
                       dtype=np.int64, count=len(texts))
    return pa.table({"n": pa.array(lens)})


def lm_grand_total(sf_dir: str) -> float:
    """Corpus token total N: one cheap distributed sum -> one scalar."""
    docs = read_table(sf_dir, "documents", ["text"])
    return float(docs.map_batches(_lm_len_rows, batch_format="pyarrow",
                                  batch_size=8192).sum("n") or 0.0)


def _make_lm_token_rows(n_shards: int):
    """(doc, hashed-token, count) exchange rows with a coarse token
    shard key — the kernel both the query twin and the checkpointed
    runner ship through the shuffle."""

    def token_rows(t: pa.Table) -> pa.Table:
        toks, dix, cnt, _ = _batch_doc_token_counts(
            t.column("text").to_pylist())
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        h = (pd.util.hash_array(toks).astype(np.uint64) if len(toks)
             else np.zeros(0, np.uint64))
        shard = ((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(64 - 16)
                 ).astype(np.int64) % n_shards
        return pa.table({
            "shard": pa.array(shard.astype(np.int32)),
            "tok": pa.array(h),
            "doc_id": pa.array(ids[dix] if len(toks) else
                               np.zeros(0, np.int64)),
            "c": pa.array(cnt),
        })

    return token_rows


def _make_lm_shard_partials(total: float):
    """In-shard per-token totals -> per-(doc, shard) bit partials.
    Every row of a token lands in one shard, so ``tok_tot`` is exact."""

    def shard_partials(g: pd.DataFrame) -> pa.Table:
        h = g["tok"].to_numpy()
        c = g["c"].to_numpy().astype(np.float64)
        order = np.argsort(h, kind="mergesort")
        hs, cs = h[order], c[order]
        new = np.concatenate([[True], hs[1:] != hs[:-1]])
        seg = np.cumsum(new) - 1
        tok_tot = np.bincount(seg, weights=cs)
        logp = np.log2(tok_tot / total)
        terms = cs * logp[seg]
        docs_o = g["doc_id"].to_numpy()[order]
        df = pd.DataFrame({"doc_id": docs_o, "b": terms, "n": cs})
        out = df.groupby("doc_id", as_index=False).sum()
        return pa.table({
            "doc_id": pa.array(out["doc_id"].to_numpy(), pa.int64()),
            "p_bits": pa.array(out["b"].to_numpy()),
            "p_n": pa.array(out["n"].to_numpy().astype(np.int64)),
        })

    return shard_partials


def _lm_zero_rows(t: pa.Table) -> pa.Table:
    """Zero partials so token-free docs survive the fold with n=0."""
    n = len(t)
    return pa.table({
        "doc_id": t.column("doc_id").cast(pa.int64()),
        "p_bits": pa.array(np.zeros(n, np.float64)),
        "p_n": pa.array(np.zeros(n, np.int64)),
    })


def lm_fold_partials(zeros: rd.Dataset, partials: rd.Dataset) -> rd.Dataset:
    """Union-with-zeros groupby(doc_id) fold -> final score schema."""
    agg = (zeros.union(partials)
           .groupby("doc_id")
           .aggregate(Sum("p_bits", alias_name="bits_sum"),
                      Sum("p_n", alias_name="n_tokens")))

    def finish(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "n_tokens": z,
                             "lm_bits": pa.array([], pa.float32())})
        return _finish(t.column("doc_id").cast(pa.int64()),
                       t.column("n_tokens").to_numpy().astype(np.int64),
                       t.column("bits_sum").to_numpy())

    return agg.map_batches(finish, batch_format="pyarrow")


def q_doc_lm_score_shuffled(sf_dir: str) -> rd.Dataset:
    """Same result via the both-sides-big plan: one token-shard shuffle,
    in-shard per-token totals, union-with-zeros doc fold."""
    n_shards = shuffle_width(n_rows=table_num_rows(sf_dir, "documents"),
                             rows_per_shard=LSH_ROWS_PER_SHARD)
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    total = lm_grand_total(sf_dir)
    partials = (docs.map_batches(_make_lm_token_rows(n_shards),
                                 batch_format="pyarrow", batch_size=8192)
                .groupby("shard")
                .map_groups(_make_lm_shard_partials(total),
                            batch_format="pandas"))
    zeros = docs.map_batches(_lm_zero_rows, batch_format="pyarrow",
                             batch_size=8192)
    return lm_fold_partials(zeros, partials)


LM_SCORE_SQL = r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents WHERE trim(text) <> ''),
    tc AS (SELECT w, CAST(COUNT(*) AS DOUBLE) AS n FROM tok GROUP BY w),
    tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS s FROM tc),
    dt AS (SELECT doc_id, w, CAST(COUNT(*) AS DOUBLE) AS c
           FROM tok GROUP BY doc_id, w),
    sums AS (
        SELECT dt.doc_id,
               SUM(dt.c * log2(tc.n / tot.s)) AS bits_sum,
               CAST(SUM(dt.c) AS BIGINT) AS nd
        FROM dt JOIN tc USING (w), tot
        GROUP BY dt.doc_id)
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(COALESCE(s.nd, 0) AS BIGINT) AS n_tokens,
           CAST(CASE WHEN COALESCE(s.nd, 0) > 0
                     THEN -s.bits_sum / s.nd ELSE 0.0 END
                AS REAL) AS lm_bits
    FROM documents d LEFT JOIN sums s USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Vocabulary induction: the top-K corpus token table with rank and
# cumulative coverage — the frequency-cutoff vocab build every
# tokenizer/embedding pipeline starts from.

VOCAB_TOP_K = 500


def q_vocab_top(sf_dir: str, k: int = VOCAB_TOP_K) -> pa.Table:
    """Top-``k`` tokens by corpus frequency: (token, n, rnk, cum_share)
    with deterministic ordering (count desc, token asc) and cumulative
    coverage share in rank order.  The distributed part is the token
    groupby (same as the LM model fit); the sort/rank runs on the
    driver over the vocab-sized reduction (post-reduction
    materialization, per repo convention)."""
    vocab, counts = _unigram_model(sf_dir)
    total = float(counts.sum())
    if not len(vocab):
        return pa.table({"token": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "rnk": pa.array([], pa.int64()),
                         "cum_share": pa.array([], pa.float32())})
    # vocab already token-ascending; stable sort by -count keeps the
    # token-asc tiebreak
    order = np.argsort(-counts, kind="stable")[:k]
    top_w = vocab[order]
    top_c = counts[order]
    cum = np.cumsum(top_c).astype(np.float64) / total
    return pa.table({
        "token": pa.array(list(top_w), pa.string()),
        "n": pa.array(top_c.astype(np.int64)),
        "rnk": pa.array(np.arange(1, len(top_w) + 1, dtype=np.int64)),
        "cum_share": pa.array(cum.astype(np.float32)),
    })


VOCAB_TOP_SQL = r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents WHERE trim(text) <> ''),
    tc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS s FROM tc),
    r AS (SELECT w, c,
                 ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rnk
          FROM tc)
    SELECT r.w AS token, r.c AS n, CAST(r.rnk AS BIGINT) AS rnk,
           CAST(CAST(SUM(r.c) OVER (ORDER BY r.rnk) AS DOUBLE) / tot.s
                AS REAL) AS cum_share
    FROM r, tot WHERE r.rnk <= 500
"""


# ---------------------------------------------------------------------------
# DSIR-style importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling" — public paper): hashed
# unigram+bigram bag-of-ngrams models for a TARGET distribution (here:
# the corpus's ``lang = 'en'`` slice) and the RAW distribution (all
# docs), Laplace-smoothed; per-doc log importance weight
# ``sum_b c_b * (log2 p_tgt(b) - log2 p_raw(b))``.
#
# Scale shape: the bucket space is FIXED (DSIR_BUCKETS), so the model
# broadcast is O(B) regardless of corpus size — a strictly better
# small-side bound than the vocab-sized unigram LM above.  Fit is one
# streaming pass emitting nonzero per-batch bucket partials into a tiny
# groupby; scoring is a second streaming pass.  No driver state beyond
# the B-bucket arrays.
#
# Bucketing is md5-based (first 15 hex digits mod B) so DuckDB
# reproduces it exactly: ``CAST(('0x' || substr(md5(g),1,15)) AS
# BIGINT) % B``.  The per-doc sum is order-sensitive; final column is
# f32 (REAL) per the repo convention.

DSIR_BUCKETS = 8192
DSIR_TARGET_LANG = "en"


def _dsir_features(texts: list[str]) -> tuple[np.ndarray, np.ndarray,
                                               np.ndarray]:
    """(bucket_id, doc_ix) per feature position (unigrams then bigrams,
    all docs of the batch), plus per-doc feature counts.  One factorize
    over the batch's gram strings; md5 runs once per DISTINCT gram."""
    tok_lists = [_tokens(t) for t in texts]
    n = len(texts)
    lens = np.fromiter((len(x) for x in tok_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    n_feats = lens + np.maximum(lens - 1, 0)
    if not total:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), n_feats
    flat = np.empty(total, dtype=object)
    flat[:] = [w for ws in tok_lists for w in ws]
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    if total > 1:
        same = doc[1:] == doc[:-1]
        s = pd.Series(flat)
        bi = (s.iloc[:-1].reset_index(drop=True) + " "
              + s.iloc[1:].reset_index(drop=True)).to_numpy()[same]
        bi_doc = doc[:-1][same]
    else:
        bi = np.empty(0, dtype=object)
        bi_doc = np.zeros(0, np.int64)
    grams = np.concatenate([flat, bi])
    gdoc = np.concatenate([doc, bi_doc])
    codes, uniques = pd.factorize(grams)
    import hashlib

    ub = np.fromiter(
        (int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
         % DSIR_BUCKETS for g in uniques),
        dtype=np.int64, count=len(uniques))
    return ub[codes], gdoc, n_feats


def _dsir_model(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(tgt_counts[B], raw_counts[B]) int64 bucket histograms:
    per-batch nonzero partials -> one tiny groupby(bucket) -> driver
    arrays.  Counts are integers, so the fit is order-exact."""
    ds = read_table(sf_dir, "documents", ["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        is_tgt = pc.equal(t.column("lang"),
                          DSIR_TARGET_LANG).to_numpy(zero_copy_only=False)
        b, dix, _ = _dsir_features(texts)
        raw = np.bincount(b, minlength=DSIR_BUCKETS)
        tgt = np.bincount(b[is_tgt[dix]], minlength=DSIR_BUCKETS)
        nz = np.flatnonzero(raw)
        return pa.table({"b": pa.array(nz),
                         "p_tgt": pa.array(tgt[nz]),
                         "p_raw": pa.array(raw[nz])})

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=1024)
           .groupby("b").aggregate(Sum("p_tgt", alias_name="tc"),
                                   Sum("p_raw", alias_name="rc")))
    tgt = np.zeros(DSIR_BUCKETS, np.int64)
    raw = np.zeros(DSIR_BUCKETS, np.int64)
    for t in agg.iter_batches(batch_format="pyarrow", batch_size=None):
        if "b" in t.column_names and len(t):
            bb = t.column("b").to_numpy()
            tgt[bb] += t.column("tc").to_numpy()
            raw[bb] += t.column("rc").to_numpy()
    return tgt, raw


def q_doc_dsir_weights(sf_dir: str) -> rd.Dataset:
    """Per-doc DSIR log importance weight toward the ``lang='en'``
    target slice: (doc_id, n_feats, dsir_logw).  Two streaming passes
    + one B-bucket broadcast — see the section comment for the scale
    argument."""
    tgt, raw = _dsir_model(sf_dir)
    n_tgt = int(tgt.sum())
    n_raw = int(raw.sum())
    diff = (np.log2((tgt + 1) / (n_tgt + DSIR_BUCKETS))
            - np.log2((raw + 1) / (n_raw + DSIR_BUCKETS)))
    ref = broadcast(diff)
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        d = ray.get(ref)
        texts = t.column("text").to_pylist()
        b, dix, n_feats = _dsir_features(texts)
        logw = np.zeros(len(t), np.float64)
        if len(b):
            # per-(doc, bucket) counts, then c * diff — mirrors the
            # oracle's GROUP BY doc_id, b
            key = dix * DSIR_BUCKETS + b
            uk, cnt = np.unique(key, return_counts=True)
            np.add.at(logw, uk // DSIR_BUCKETS,
                      cnt.astype(np.float64) * d[uk % DSIR_BUCKETS])
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_feats": pa.array(n_feats),
            "dsir_logw": pa.array(logw.astype(np.float32)),
        })

    return docs.map_batches(score, batch_format="pyarrow", batch_size=1024)


DSIR_SQL = r"""
    WITH tok AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
        FROM documents WHERE trim(text) <> ''),
    uni AS (SELECT doc_id, ts[r.i] AS g
            FROM tok, unnest(range(1, len(ts) + 1)) AS r(i)),
    bi AS (SELECT doc_id, array_to_string(ts[r.i:r.i+1], ' ') AS g
           FROM tok, unnest(range(1, len(ts))) AS r(i)),
    feats AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % 8192 AS b
        FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
    raw AS (SELECT b, COUNT(*) AS c FROM feats GROUP BY b),
    tgt AS (SELECT b, COUNT(*) AS c
            FROM feats JOIN documents USING (doc_id)
            WHERE lang = 'en' GROUP BY b),
    nr AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM feats),
    nt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n
           FROM feats JOIN documents USING (doc_id) WHERE lang = 'en'),
    model AS (
        SELECT raw.b,
               log2((COALESCE(tgt.c, 0) + 1) / (nt.n + 8192))
                   - log2((raw.c + 1) / (nr.n + 8192)) AS diff
        FROM raw LEFT JOIN tgt USING (b), nr, nt),
    dbc AS (SELECT doc_id, b, COUNT(*) AS c FROM feats GROUP BY doc_id, b),
    sums AS (SELECT dbc.doc_id, SUM(dbc.c * model.diff) AS s,
                    CAST(SUM(dbc.c) AS BIGINT) AS nf
             FROM dbc JOIN model USING (b) GROUP BY dbc.doc_id)
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(COALESCE(s.nf, 0) AS BIGINT) AS n_feats,
           CAST(COALESCE(s.s, 0.0) AS REAL) AS dsir_logw
    FROM documents d LEFT JOIN sums s USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Heavy hitters with a sketch-bounded candidate pass (Misra-Gries
# guarantee; Misra & Gries 1982, Agarwal et al. 2013 "Mergeable
# Summaries" — public papers): per batch, retain bigrams with
# count_b > B_b / HH_K — exactly the retention bound a k=HH_K
# Misra-Gries sketch guarantees (the batch is materialized anyway, so
# the exact per-batch counts make the literal sequential counter dance
# unnecessary; the unit tests pin the equivalence).  With
# HH_K = 2 * ceil(1/HH_PHI), ANY globally phi-heavy bigram exceeds the
# bound in at least one batch (pigeonhole: otherwise its total count
# <= N/HH_K = phi*N/2 < ceil(phi*N)) — so the candidate union is a
# PROVABLE superset of the heavy set, and after the exact recount the
# output EQUALS the plain SQL ``HAVING count >= ceil(phi * N)``.
# That's what makes an approximate-sketch operator directly
# SQL-oracle-checkable.
#
# Scale shape: candidates per batch <= HH_K (plus slack from the exact
# bound), the candidate union is a tiny distinct groupby, the recount
# pass probes a broadcast sorted candidate array (searchsorted) and
# folds integer partials through one tiny groupby.  Driver state is
# O(candidates), never O(vocab).

HH_PHI = 0.001  # heaviness threshold (share of all bigram positions)
HH_K = 2 * int(np.ceil(1.0 / HH_PHI))


def _batch_bigrams(texts: list[str]) -> np.ndarray:
    """Flat object array of space-joined bigrams for a batch: one
    flattened token stream, doc seams masked vectorized (the
    ``_dsir_features`` shape) — no per-document Series construction."""
    tok_lists = [_tokens(t) for t in texts]
    n = len(texts)
    lens = np.fromiter((len(x) for x in tok_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total < 2:
        return np.empty(0, dtype=object)
    flat = np.empty(total, dtype=object)
    flat[:] = [w for ws in tok_lists for w in ws]
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    same = doc[1:] == doc[:-1]
    s = pd.Series(flat)
    return (s.iloc[:-1].reset_index(drop=True) + " "
            + s.iloc[1:].reset_index(drop=True)).to_numpy()[same]


def q_token_heavy_hitters(sf_dir: str,
                          phi: float = HH_PHI) -> pa.Table:
    """Corpus bigram heavy hitters: (token, n, share) for every bigram
    with count >= ceil(phi * N) — sketch-bounded candidate pass +
    exact recount, provably identical to the exhaustive groupby (see
    section comment)."""
    from ray.data.aggregate import Sum

    k = 2 * int(np.ceil(1.0 / phi))
    ds = read_table(sf_dir, "documents", ["text"])

    def candidates(t: pa.Table) -> pa.Table:
        g = _batch_bigrams(t.column("text").to_pylist())
        if not len(g):
            return pa.table({"w": pa.array([], pa.string())})
        u, c = np.unique(g, return_counts=True)
        keep = c > (len(g) / k)  # the MG retention bound
        return pa.table({"w": pa.array(list(u[keep]), pa.string())})

    cand_ds = (ds.map_batches(candidates, batch_format="pyarrow",
                              batch_size=1024)
               .groupby("w").count())
    cand_parts, n_cand = [], 0
    for b in cand_ds.iter_batches(batch_format="pyarrow", batch_size=None):
        if "w" in b.column_names and len(b):
            n_cand += len(b)
            if n_cand > HH_CANDIDATE_BUDGET_ROWS:
                raise ValueError(
                    f"q_token_heavy_hitters: Misra-Gries candidate union "
                    f"exceeds the driver budget ({n_cand:,}+ candidates > "
                    f"{HH_CANDIDATE_BUDGET_ROWS:,}). The per-batch MG "
                    "bound keeps <= 1/phi survivors per batch, so the "
                    "union grows with batch count; at this scale use the "
                    "constant-space frequency sketch q_token_counts_cms "
                    "(D x W counters at any corpus size).")
            cand_parts.append(
                np.asarray(b.column("w").to_pylist(), dtype=object))
    cand = (np.sort(np.concatenate(cand_parts))
            if cand_parts else np.empty(0, dtype=object))
    ref = broadcast(cand)

    def recount(t: pa.Table) -> pa.Table:
        cv = ray.get(ref)
        g = _batch_bigrams(t.column("text").to_pylist())
        total = len(g)
        if not len(g) or not len(cv):
            return pa.table({"cw": pa.array([], pa.string()),
                             "p_c": pa.array([], pa.int64()),
                             "p_n": pa.array([total], pa.int64())
                             if total else pa.array([], pa.int64())})
        ix = np.searchsorted(cv, g)
        ix[ix >= len(cv)] = len(cv) - 1
        hit = cv[ix] == g
        cnt = np.bincount(ix[hit], minlength=len(cv))
        nz = np.flatnonzero(cnt)
        return pa.table({
            "cw": pa.array([str(cv[i]) for i in nz] + ["\x00total"],
                           pa.string()),
            "p_c": pa.array(np.concatenate([cnt[nz], [0]])),
            "p_n": pa.array(np.concatenate(
                [np.zeros(len(nz), np.int64), [total]])),
        })

    agg = (ds.map_batches(recount, batch_format="pyarrow", batch_size=1024)
           .groupby("cw").aggregate(Sum("p_c", alias_name="c"),
                                    Sum("p_n", alias_name="nn"))
           .to_pandas())
    if not len(agg):
        return pa.table({"token": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "share": pa.array([], pa.float64())})
    n_total = int(agg["nn"].sum())
    agg = agg[agg["cw"] != "\x00total"]
    thresh = int(np.ceil(phi * n_total))
    heavy = agg[agg["c"] >= thresh].sort_values("cw")
    c = heavy["c"].to_numpy().astype(np.int64)
    return pa.table({
        "token": pa.array(heavy["cw"].tolist(), pa.string()),
        "n": pa.array(c),
        "share": pa.array(c / np.float64(n_total)),
    })


HEAVY_HITTERS_SQL = r"""
    WITH tok AS (
        SELECT regexp_split_to_array(trim(text), '\s+') AS ts
        FROM documents WHERE trim(text) <> ''),
    g AS (SELECT array_to_string(ts[r.i:r.i+1], ' ') AS w
          FROM tok, unnest(range(1, len(ts))) AS r(i)),
    tc AS (SELECT w, COUNT(*) AS c FROM g GROUP BY w),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM tc)
    SELECT tc.w AS token, CAST(tc.c AS BIGINT) AS n,
           CAST(tc.c AS DOUBLE) / tot.n AS share
    FROM tc, tot
    WHERE tc.c >= CAST(ceil(0.001 * tot.n) AS BIGINT)
"""


# ---------------------------------------------------------------------------
# Count-Min sketch token counts (Cormode & Muthukrishnan 2005, public
# paper) — the FREQUENCY sketch completing the suite's sketch classes
# (HLL = distinct, Bloom = membership, CMS = frequency).  The counter
# table is bounded at CMS_D x CMS_W cells NO MATTER the corpus size:
# per-batch partials emit at most D*W (j, pos, c) rows, one tiny
# groupby folds them, and every estimate is a deterministic
# OVER-estimate of the exact count (min over D row-hashes of summed
# collisions) — the guarantee tests assert.  Positions are md5 hex
# slices mod W so DuckDB replays the sketch exactly.
# ---------------------------------------------------------------------------

CMS_D = 4     # rows (disjoint 16-bit md5 slices, like the Bloom's K)
CMS_W = 8192  # counters per row


def _cms_positions(tokens: np.ndarray, width: int) -> np.ndarray:
    """(len(tokens), D) int64 counter positions; md5 once per token
    (callers pass DISTINCT tokens).  Same Python-loop-by-contract as
    every md5-checked op (the digest must match DuckDB's).  ``width``
    is threaded explicitly because the UDFs run in worker processes
    (a module-global override on the driver would not reach them)."""
    import hashlib

    out = np.empty((len(tokens), CMS_D), np.int64)
    for i, w in enumerate(tokens):
        hx = hashlib.md5(w.encode("utf-8")).hexdigest()
        for j in range(CMS_D):
            out[i, j] = int(hx[4 * j:4 * j + 4], 16) % width
    return out


def q_token_counts_cms(sf_dir: str, width: int | None = None
                       ) -> pd.DataFrame:
    """Approximate corpus token counts for the eval-slice vocabulary via
    a Count-Min sketch: (token, est_n, exact_n, overcount).

    Build: one streaming pass emits per-batch partial cells (at most
    D*W rows per task), one bounded groupby((j, pos)) folds them into
    the 4x8192 counter table — the whole sketch is ~256 KB regardless
    of corpus size, where the exact per-token groupby ships one row per
    token TYPE (unbounded at web scale).  Probe: the eval slice's
    distinct tokens (same slice as the decontamination suite) are
    estimated as ``min_j counters[j][pos_j]``; the exact recount rides
    the same pass for the guarantee columns (est_n >= exact_n always,
    equality when no row is collision-free... i.e. equality whenever
    some row of the token has no colliding type)."""
    if width is None:
        width = CMS_W
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def cells(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        toks = [w for x in texts for w in _tokens(x)]
        if not toks:
            z = pa.array([], pa.int64())
            return pa.table({"j": z, "pos": z, "c": z})
        flat = np.empty(len(toks), dtype=object)
        flat[:] = toks
        u, c = np.unique(flat, return_counts=True)
        pos = _cms_positions(u, width)               # (n_u, D)
        jj = np.tile(np.arange(CMS_D, dtype=np.int64), len(u))
        pp = pos.reshape(-1)
        cc = np.repeat(c.astype(np.int64), CMS_D)
        # in-batch combiner: fold duplicate (j, pos) cells before the
        # exchange so a task never emits more than D*W rows
        key = jj * width + pp
        uk, inv = np.unique(key, return_inverse=True)
        folded = np.bincount(inv, weights=cc).astype(np.int64)
        return pa.table({"j": pa.array(uk // width),
                         "pos": pa.array(uk % width),
                         "c": pa.array(folded)})

    counters = (docs.map_batches(cells, batch_format="pyarrow",
                                 batch_size=1024)
                .groupby(["j", "pos"])
                .aggregate(Sum("c", alias_name="n")).to_pandas())
    table = np.zeros((CMS_D, width), np.int64)
    if len(counters):
        table[counters["j"].to_numpy(), counters["pos"].to_numpy()] = \
            counters["n"].to_numpy()

    def probe_tokens(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        mask = ids % 20 == 0  # decontam.EVAL_MOD slice
        toks = {w for x, m in zip(t.column("text").to_pylist(), mask)
                if m for w in _tokens(x)}
        return pa.table({"w": pa.array(sorted(toks), pa.string())})

    probe = (docs.map_batches(probe_tokens, batch_format="pyarrow",
                              batch_size=1024)
             .groupby("w").count().to_pandas())
    if not len(probe):
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "est_n": pd.Series([], dtype=np.int64),
                             "exact_n": pd.Series([], dtype=np.int64),
                             "overcount": pd.Series([], dtype=np.int64)})
    pv = np.sort(probe["w"].to_numpy().astype(object))
    ref = broadcast(pv)

    def exact_partial(t: pa.Table) -> pa.Table:
        cv = ray.get(ref)
        toks = [w for x in t.column("text").to_pylist() for w in _tokens(x)]
        if not toks:
            z = pa.array([], pa.int64())
            return pa.table({"w": pa.array([], pa.string()), "c": z})
        flat = np.empty(len(toks), dtype=object)
        flat[:] = toks
        ix = np.searchsorted(cv, flat)
        ix[ix >= len(cv)] = len(cv) - 1
        hit = cv[ix] == flat
        cnt = np.bincount(ix[hit], minlength=len(cv))
        nz = np.flatnonzero(cnt)
        return pa.table({"w": pa.array(list(cv[nz]), pa.string()),
                         "c": pa.array(cnt[nz].astype(np.int64))})

    exact = (docs.map_batches(exact_partial, batch_format="pyarrow",
                              batch_size=1024)
             .groupby("w").aggregate(Sum("c", alias_name="exact_n"))
             .to_pandas().set_index("w")["exact_n"])
    pos = _cms_positions(pv, width)                   # (n_p, D)
    est = table[np.arange(CMS_D)[None, :], pos].min(axis=1)
    exact_n = exact.reindex(pv).fillna(0).to_numpy().astype(np.int64)
    return pd.DataFrame({
        "token": pv.astype(str),
        "est_n": est.astype(np.int64),
        "exact_n": exact_n,
        "overcount": (est - exact_n).astype(np.int64),
    }).sort_values("token").reset_index(drop=True)


TOKEN_CMS_SQL = r"""
    WITH tok AS MATERIALIZED (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents WHERE trim(text) <> ''),
    cnt AS MATERIALIZED (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
    cells AS MATERIALIZED (
        SELECT u.j,
               CAST(('0x' || substr(md5(w), 1 + 4*u.j, 4)) AS INTEGER)
                   % 8192 AS pos,
               SUM(c) AS n
        FROM cnt CROSS JOIN unnest([0, 1, 2, 3]) AS u(j)
        GROUP BY u.j, pos),
    probe AS MATERIALIZED (
        SELECT DISTINCT unnest(regexp_split_to_array(trim(text),
                                                     '\s+')) AS w
        FROM documents WHERE doc_id % 20 = 0 AND trim(text) <> ''),
    est AS MATERIALIZED (
        SELECT p.w AS token, MIN(ce.n) AS est_n
        FROM probe p
        CROSS JOIN unnest([0, 1, 2, 3]) AS u(j)
        JOIN cells ce
          ON ce.j = u.j
         AND ce.pos = CAST(('0x' || substr(md5(p.w), 1 + 4*u.j, 4))
                           AS INTEGER) % 8192
        GROUP BY p.w)
    SELECT e.token,
           CAST(e.est_n AS BIGINT) AS est_n,
           CAST(c.c AS BIGINT) AS exact_n,
           CAST(e.est_n - c.c AS BIGINT) AS overcount
    FROM est e JOIN cnt c ON c.w = e.token
    ORDER BY e.token
"""


# ---------------------------------------------------------------------------
# Bigram collocations by PMI lift (Church & Hanks 1990, public paper).
# PMI = log2(p(xy) / (p(x)p(y))); for a FIXED corpus the rank order is
# the monotone transform score = n_xy / (n_x * n_y) — a single IEEE
# division of exact integers, so engine and oracle order and hash
# bit-identically with no libm transcendentals anywhere (log2 of the
# same quotient may differ in the last ulp between numpy and DuckDB;
# the quotient itself cannot).
# ---------------------------------------------------------------------------

PMI_TOP_K = 30
PMI_MIN_COUNT = 5


def q_bigram_pmi(sf_dir: str, k: int = PMI_TOP_K,
                 min_count: int = PMI_MIN_COUNT) -> pd.DataFrame:
    """Top-k collocations: (bigram, n_xy, n_x, n_y, score) ordered by
    score = n_xy/(n_x*n_y) desc (PMI order for a fixed corpus), count
    floor ``min_count``.

    Scale shape: bigram counts fold combiner-first (per-batch uniques ->
    one groupby(w) whose key space is the bigram TYPE set), the unigram
    model is the broadcast side (same sublinear-vocab bound as the LM
    scorer), scoring + local top-k run per aggregated batch, and the
    driver merges n_batches x k candidate rows — never the full type
    table."""
    vocab, counts = _unigram_model(sf_dir)
    ref = broadcast((vocab, counts))
    docs = read_table(sf_dir, "documents", ["text"])

    def bigram_partial(t: pa.Table) -> pa.Table:
        g = _batch_bigrams(t.column("text").to_pylist())
        if not len(g):
            return pa.table({"w": pa.array([], pa.string()),
                             "p_c": pa.array([], pa.int64())})
        u, c = np.unique(g, return_counts=True)
        return pa.table({"w": pa.array(list(u), pa.string()),
                         "p_c": pa.array(c.astype(np.int64))})

    agg = (docs.map_batches(bigram_partial, batch_format="pyarrow",
                            batch_size=1024)
           .groupby("w").aggregate(Sum("p_c", alias_name="n_xy")))

    def score_topk(t: pa.Table) -> pa.Table:
        v, c = ray.get(ref)
        bg = np.asarray(t.column("w").to_pylist(), dtype=object)
        n_xy = t.column("n_xy").to_numpy().astype(np.int64)
        keep = n_xy >= min_count
        bg, n_xy = bg[keep], n_xy[keep]
        if not len(bg):
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n_xy": pa.array([], pa.int64()),
                             "n_x": pa.array([], pa.int64()),
                             "n_y": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        parts = [b.split(" ") for b in bg]
        wx = np.asarray([p[0] for p in parts], dtype=object)
        wy = np.asarray([p[1] for p in parts], dtype=object)
        n_x = c[np.searchsorted(v, wx)].astype(np.int64)
        n_y = c[np.searchsorted(v, wy)].astype(np.int64)
        score = n_xy.astype(np.float64) / (n_x * n_y)
        df = pd.DataFrame({"bigram": bg.astype(str), "n_xy": n_xy,
                           "n_x": n_x, "n_y": n_y, "score": score})
        return pa.Table.from_pandas(
            df.sort_values(["score", "bigram"],
                           ascending=[False, True]).head(k),
            preserve_index=False)

    cand = agg.map_batches(score_topk, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    return (cand.sort_values(["score", "bigram"], ascending=[False, True])
            .head(k).reset_index(drop=True))


BIGRAM_PMI_SQL = r"""
    WITH tok AS MATERIALIZED (
        SELECT regexp_split_to_array(trim(text), '\s+') AS ts
        FROM documents WHERE trim(text) <> ''),
    ucnt AS MATERIALIZED (
        SELECT w, COUNT(*) AS c FROM (SELECT unnest(ts) AS w FROM tok)
        GROUP BY w),
    bcnt AS MATERIALIZED (
        SELECT wx, wy, COUNT(*) AS n_xy FROM (
            SELECT t.ts[r.i] AS wx, t.ts[r.i+1] AS wy
            FROM tok t, unnest(range(1, len(t.ts))) AS r(i))
        GROUP BY wx, wy),
    scored AS MATERIALIZED (
        SELECT b.wx || ' ' || b.wy AS bigram,
               b.n_xy, ux.c AS n_x, uy.c AS n_y,
               CAST(b.n_xy AS DOUBLE) / (ux.c * uy.c) AS score
        FROM bcnt b
        JOIN ucnt ux ON ux.w = b.wx
        JOIN ucnt uy ON uy.w = b.wy
        WHERE b.n_xy >= 5)
    SELECT bigram, CAST(n_xy AS BIGINT) AS n_xy,
           CAST(n_x AS BIGINT) AS n_x, CAST(n_y AS BIGINT) AS n_y, score
    FROM scored ORDER BY score DESC, bigram LIMIT 30
"""

"""Benchmark decontamination over the ``documents`` table: flag (and
score) training documents that share any 8-gram with a held-out eval
set — the overlap-removal step every serious LLM training corpus runs
(the n-gram-collision methodology of Brown et al. 2020 appendix C /
Lee et al. 2022, both public papers).

The eval set here is the deterministic hash-free slice
``doc_id % EVAL_MOD == 0`` (benchmark membership is an input in real
life; a modulus keeps the synthetic setup reproducible and
SQL-expressible).  Gram identity reuses the dedup suite's 64-bit
polynomial over siphash token ids (`dedup._batch_gram_rows`), so the
same collision bound applies.

Three physical plans; the first two give identical results under one
SQL oracle, the third is a deterministic sketch SUPERSET with its own
full SQL restatement:

* ``q_doc_decontaminate`` — BROADCAST plan (the default): distill the
  eval slice to its distinct gram ids (eval sets are benchmark-sized —
  a few thousand docs -> at most a few tens of millions of uint64s,
  i.e. <~100 MB), ``ray.put`` the sorted array once, and score every
  training doc in one streaming ``map_batches`` pass with a
  vectorized ``searchsorted`` membership probe.  No shuffle at all;
  right whenever the eval side fits a worker heap.
* ``q_doc_decontaminate_shuffled`` — BOTH-SIDES-BIG twin: tag gram
  rows eval/train, one coarse gram-shard shuffle, per-shard membership
  mark, then the union-with-zeros groupby(doc_id) fold (same shape as
  ``dedup.q_doc_dup_ngram_stats``).  Right when the "eval" side is
  itself web-scale (e.g. decontaminating against another corpus).
* ``q_doc_decontaminate_bloom`` — CONSTANT-SIZE sketch twin: the eval
  grams fold into one 8 KB Bloom bitmap (never grows with the eval
  set), broadcast once; probes are vectorized bit tests.  A
  deterministic superset of the exact answer — no false negatives, so
  "keep" decisions stay safe; right when even the distinct-gram array
  is too big to broadcast but a two-corpus shuffle is too expensive.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..sources.scale import shuffle_width, table_num_rows
from ..sources.tables import broadcast, read_table
from .dedup import LSH_ROWS_PER_SHARD, NGRAM_N, _batch_gram_rows, _tokens

EVAL_MOD = 20  # doc_id % 20 == 0 -> eval doc (~5% of the corpus)
# keep a training doc iff NONE of its 8-gram positions collide with the
# eval set (the strict zero-overlap bar; relax by thresholding
# contam_ratio downstream if needed)


def _finish_table(doc_id: pa.Array, n_ngrams: np.ndarray,
                  n_contam: np.ndarray) -> pa.Table:
    n = n_ngrams.astype(np.float64)
    d = n_contam.astype(np.float64)
    ratio = np.divide(d, n, out=np.zeros_like(d), where=n > 0)
    return pa.table({
        "doc_id": doc_id,
        "n_ngrams": pa.array(n_ngrams.astype(np.int64)),
        "n_contam": pa.array(n_contam.astype(np.int64)),
        "contam_ratio": pa.array(ratio),
        "keep": pa.array((n_contam == 0).astype(np.int64)),
    })


def _eval_gram_array(sf_dir: str) -> np.ndarray:
    """Distinct sorted gram ids of the eval slice.  Per-batch dedup in
    the tasks; the final unique runs on the driver over the (small)
    concatenation — the documented eval-fits-a-worker assumption of the
    broadcast plan."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def eval_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        mask = ids % EVAL_MOD == 0
        texts = [tx for tx, m in
                 zip(t.column("text").to_pylist(), mask) if m]
        g, _, _, _ = _batch_gram_rows(texts)
        return pa.table({"gram": pa.array(np.unique(g))})

    parts = [b.column("gram").to_numpy()
             for b in ds.map_batches(eval_grams, batch_format="pyarrow",
                                     batch_size=1024)
             .iter_batches(batch_format="pyarrow", batch_size=None)]
    if not parts:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(parts))


def q_doc_decontaminate(sf_dir: str) -> rd.Dataset:
    """Per-TRAINING-doc eval-overlap stats via the broadcast plan:
    (doc_id, n_ngrams, n_contam, contam_ratio, keep) where ``n_contam``
    counts gram POSITIONS whose 8-gram occurs anywhere in the eval
    slice and ``keep`` = 1 iff the doc is overlap-free."""
    ev_ref = broadcast(_eval_gram_array(sf_dir))
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        ev = ray.get(ev_ref)  # zero-copy view from the local object store
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        train = ids % EVAL_MOD != 0
        texts = [tx for tx, m in
                 zip(t.column("text").to_pylist(), train) if m]
        tids = ids[train]
        n_docs = len(texts)
        g, dix, npos, n_ngrams = _batch_gram_rows(texts)
        n_contam = np.zeros(n_docs, np.int64)
        if len(g) and len(ev):
            ix = np.searchsorted(ev, g)
            ix[ix == len(ev)] = 0
            hit = ev[ix] == g
            if hit.any():
                np.add.at(n_contam, dix[hit], npos[hit])
        return _finish_table(pa.array(tids), n_ngrams, n_contam)

    # 1024 keeps task parallelism high on small corpora (see preprocess)
    return docs.map_batches(score, batch_format="pyarrow", batch_size=1024)


def q_doc_decontaminate_shuffled(sf_dir: str) -> rd.Dataset:
    """Same result as ``q_doc_decontaminate`` via the both-sides-big
    plan: gram rows tagged eval/train -> coarse gram-shard shuffle ->
    per-shard eval-membership mark -> union-with-zeros groupby(doc_id)
    fold.  No driver state, no broadcast; two all-to-alls total."""
    n_shards = shuffle_width(n_rows=table_num_rows(sf_dir, "documents"),
                             rows_per_shard=LSH_ROWS_PER_SHARD)
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def gram_rows(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        g, dix, npos, _ = _batch_gram_rows(texts)
        rid = ids[dix]
        shard = ((g * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(64 - 16)
                 ).astype(np.int64) % n_shards
        return pa.table({
            "shard": pa.array(shard.astype(np.int32)),
            "gram": pa.array(g),
            "doc_id": pa.array(rid),
            "npos": pa.array(npos),
            "is_eval": pa.array((rid % EVAL_MOD == 0).astype(np.int8)),
        })

    def contam_partials(g: pd.DataFrame) -> pa.Table:
        gr = g["gram"].to_numpy()
        ev_grams = np.unique(gr[g["is_eval"].to_numpy() == 1])
        train = g["is_eval"].to_numpy() == 0
        gt = gr[train]
        if not len(gt) or not len(ev_grams):
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "n_ngrams": z, "n_contam": z})
        ix = np.searchsorted(ev_grams, gt)
        ix[ix == len(ev_grams)] = 0
        hit = ev_grams[ix] == gt
        docs_t = g["doc_id"].to_numpy()[train][hit]
        npos_t = g["npos"].to_numpy()[train][hit]
        return pa.table({
            "doc_id": pa.array(docs_t, pa.int64()),
            "n_ngrams": pa.array(np.zeros(len(docs_t), np.int64)),
            "n_contam": pa.array(npos_t.astype(np.int64)),
        })

    def totals_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        train = ids % EVAL_MOD != 0
        texts = [tx for tx, m in
                 zip(t.column("text").to_pylist(), train) if m]
        counts = np.fromiter((len(_tokens(x)) for x in texts),
                             dtype=np.int64, count=len(texts))
        return pa.table({
            "doc_id": pa.array(ids[train]),
            "n_ngrams": pa.array(np.maximum(counts - (NGRAM_N - 1), 0)),
            "n_contam": pa.array(np.zeros(len(texts), np.int64)),
        })

    dup = (docs.map_batches(gram_rows, batch_format="pyarrow",
                            batch_size=4096)
           .groupby("shard").map_groups(contam_partials,
                                        batch_format="pandas"))
    totals = docs.map_batches(totals_rows, batch_format="pyarrow",
                              batch_size=4096)
    agg = (totals.union(dup)
           .groupby("doc_id")
           .aggregate(Sum("n_ngrams", alias_name="n_ngrams"),
                      Sum("n_contam", alias_name="n_contam")))

    def finish(t: pa.Table) -> pa.Table:
        if "doc_id" not in t.column_names:
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "n_ngrams": z, "n_contam": z,
                             "contam_ratio": pa.array([], pa.float64()),
                             "keep": z})
        return _finish_table(
            t.column("doc_id").cast(pa.int64()),
            t.column("n_ngrams").to_numpy().astype(np.int64),
            t.column("n_contam").to_numpy().astype(np.int64))

    return agg.map_batches(finish, batch_format="pyarrow")


DECONTAM_SQL = r"""
    WITH tok AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS ts
        FROM documents WHERE trim(text) <> ''),
    grams AS (
        SELECT t.doc_id,
               array_to_string(t.ts[r.i:r.i+7], ' ') AS g
        FROM tok t, unnest(range(1, len(t.ts) - 6)) AS r(i)),
    ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0),
    hits AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nc
        FROM grams
        WHERE doc_id % 20 <> 0 AND g IN (SELECT g FROM ev)
        GROUP BY doc_id),
    tot AS (SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0 ELSE
                       greatest(len(regexp_split_to_array(trim(text),
                                                          '\s+')) - 7, 0)
                   END AS n
            FROM documents)
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(COALESCE(t.n, 0) AS BIGINT) AS n_ngrams,
           CAST(COALESCE(h.nc, 0) AS BIGINT) AS n_contam,
           CASE WHEN COALESCE(t.n, 0) > 0
                THEN CAST(COALESCE(h.nc, 0) AS DOUBLE) / t.n
                ELSE 0.0 END AS contam_ratio,
           CAST(COALESCE(h.nc, 0) = 0 AS BIGINT) AS keep
    FROM documents d
    LEFT JOIN tot t USING (doc_id)
    LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 20 <> 0
"""


# ---------------------------------------------------------------------------
# Bloom-filter membership sketch (the constant-size twin of the broadcast
# plan: at 100 TB the eval side's distinct grams may not fit a worker
# heap as a sorted uint64 array, but a Bloom bitmap never grows — the
# sketch answer is a deterministic superset of the exact answer, so
# "keep" decisions stay safe: nothing contaminated ever survives).
# Bloom (1970, CACM) — standard k-hash bitmap membership.
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 65536  # 2^16 bits (8 KB packed) — each 16-bit md5 slice
# IS a bit position, so engine and SQL oracle share the arithmetic:
# pos_j = CAST(('0x' || substr(md5(gram), 1+4*j, 4)) AS INTEGER)
BLOOM_K = 4  # 4 disjoint 16-bit slices of the 128-bit md5


def _gram_strings(texts: list[str]) -> tuple[np.ndarray, np.ndarray,
                                             np.ndarray]:
    """(grams, doc_ix, n_ngrams): one SURFACE-STRING row per gram
    POSITION (md5-contract ops hash the string itself, so the siphash
    ids of ``_batch_gram_rows`` can't be used), plus per-doc position
    totals.  The join loop is Python BY CONTRACT — the md5 input must
    be byte-identical to the SQL oracle's ``array_to_string`` output."""
    tok_lists = [_tokens(t) for t in texts]
    n = len(texts)
    counts = np.fromiter((len(x) for x in tok_lists), dtype=np.int64,
                         count=n)
    n_ngrams = np.maximum(counts - (NGRAM_N - 1), 0)
    grams: list[str] = []
    for toks in tok_lists:
        grams.extend(" ".join(toks[i:i + NGRAM_N])
                     for i in range(len(toks) - (NGRAM_N - 1)))
    doc_ix = np.repeat(np.arange(n, dtype=np.int64), n_ngrams)
    return np.array(grams, dtype=object), doc_ix, n_ngrams


def _bloom_positions(grams: np.ndarray) -> np.ndarray:
    """(len(grams), K) int32 bit positions.  md5 runs once per DISTINCT
    gram (callers pass uniques); the digest slicing mirrors the SQL."""
    out = np.empty((len(grams), BLOOM_K), np.int32)
    for i, g in enumerate(grams):
        hx = hashlib.md5(g.encode("utf-8")).hexdigest()
        for j in range(BLOOM_K):
            out[i, j] = int(hx[4 * j:4 * j + 4], 16)
    return out


def _bloom_bitmap(sf_dir: str) -> np.ndarray:
    """Bool[BLOOM_M_BITS] bitmap of the eval slice's grams.  Each task
    emits ONE constant-size packed row (8 KB) regardless of input size —
    the reduction the exact broadcast plan can't have; the driver ORs
    a handful of bitmaps, never sees a gram."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        mask = ids % EVAL_MOD == 0
        texts = [tx for tx, m in
                 zip(t.column("text").to_pylist(), mask) if m]
        bm = np.zeros(BLOOM_M_BITS, bool)
        if texts:
            grams, _, _ = _gram_strings(texts)
            uniq = pd.unique(grams)
            if len(uniq):
                bm[_bloom_positions(uniq).ravel()] = True
        return pa.table({"bitmap": pa.array([np.packbits(bm).tobytes()],
                                            pa.binary())})

    bm = np.zeros(BLOOM_M_BITS, bool)
    for b in (ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=1024)
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        for raw in b.column("bitmap").to_pylist():
            bm |= np.unpackbits(np.frombuffer(raw, np.uint8)).astype(bool)
    return bm


def q_doc_decontaminate_bloom(sf_dir: str) -> rd.Dataset:
    """Per-TRAINING-doc eval-overlap stats via a Bloom membership
    sketch: (doc_id, n_ngrams, n_bloom_hits, bloom_ratio, keep_bloom).

    ``n_bloom_hits`` counts gram POSITIONS passing the Bloom test (all
    K md5-slice bits set) — a deterministic SUPERSET of
    ``q_doc_decontaminate``'s exact ``n_contam`` (no false negatives;
    tests assert the containment), so ``keep_bloom = 1`` implies the
    exact plan's ``keep = 1``.  The broadcast is 8 KB regardless of
    eval-set size — the plan that still works when the eval side is
    itself web-scale but a two-corpus shuffle
    (``q_doc_decontaminate_shuffled``) is too expensive."""
    bm_ref = broadcast(_bloom_bitmap(sf_dir))
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def score(t: pa.Table) -> pa.Table:
        bm = ray.get(bm_ref)
        ids = t.column("doc_id").to_numpy().astype(np.int64)
        train = ids % EVAL_MOD != 0
        texts = [tx for tx, m in
                 zip(t.column("text").to_pylist(), train) if m]
        tids = ids[train]
        grams, doc_ix, n_ngrams = _gram_strings(texts)
        n_hits = np.zeros(len(texts), np.int64)
        if len(grams):
            codes, uniq = pd.factorize(grams)
            hit_u = bm[_bloom_positions(uniq)].all(axis=1)
            np.add.at(n_hits, doc_ix, hit_u[codes].astype(np.int64))
        n = n_ngrams.astype(np.float64)
        h = n_hits.astype(np.float64)
        ratio = np.divide(h, n, out=np.zeros_like(h), where=n > 0)
        return pa.table({
            "doc_id": pa.array(tids),
            "n_ngrams": pa.array(n_ngrams.astype(np.int64)),
            "n_bloom_hits": pa.array(n_hits),
            "bloom_ratio": pa.array(ratio),
            "keep_bloom": pa.array((n_hits == 0).astype(np.int64)),
        })

    return docs.map_batches(score, batch_format="pyarrow", batch_size=1024)


DECONTAM_BLOOM_SQL = r"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\s+') AS ts
        FROM documents WHERE trim(text) <> ''),
    grams AS MATERIALIZED (
        SELECT t.doc_id,
               array_to_string(t.ts[r.i:r.i+7], ' ') AS g
        FROM tok t, unnest(range(1, len(t.ts) - 6)) AS r(i)),
    ev AS MATERIALIZED (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0),
    bits AS MATERIALIZED (
        SELECT DISTINCT CAST(('0x' || substr(md5(g), 1 + 4*u.j, 4))
                             AS INTEGER) AS pos
        FROM ev, unnest([0, 1, 2, 3]) AS u(j)),
    tg AS MATERIALIZED (
        SELECT doc_id,
               CAST(('0x' || substr(md5(g), 1, 4)) AS INTEGER) AS p0,
               CAST(('0x' || substr(md5(g), 5, 4)) AS INTEGER) AS p1,
               CAST(('0x' || substr(md5(g), 9, 4)) AS INTEGER) AS p2,
               CAST(('0x' || substr(md5(g), 13, 4)) AS INTEGER) AS p3
        FROM grams WHERE doc_id % 20 <> 0),
    hits AS MATERIALIZED (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nh
        FROM tg
        WHERE p0 IN (SELECT pos FROM bits)
          AND p1 IN (SELECT pos FROM bits)
          AND p2 IN (SELECT pos FROM bits)
          AND p3 IN (SELECT pos FROM bits)
        GROUP BY doc_id),
    tot AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0 ELSE
                   greatest(len(regexp_split_to_array(trim(text),
                                                      '\s+')) - 7, 0)
               END AS n
        FROM documents)
    SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
           CAST(COALESCE(t.n, 0) AS BIGINT) AS n_ngrams,
           CAST(COALESCE(h.nh, 0) AS BIGINT) AS n_bloom_hits,
           CASE WHEN COALESCE(t.n, 0) > 0
                THEN CAST(COALESCE(h.nh, 0) AS DOUBLE) / t.n
                ELSE 0.0 END AS bloom_ratio,
           CAST(COALESCE(h.nh, 0) = 0 AS BIGINT) AS keep_bloom
    FROM documents d
    LEFT JOIN tot t USING (doc_id)
    LEFT JOIN hits h USING (doc_id)
    WHERE d.doc_id % 20 <> 0
"""

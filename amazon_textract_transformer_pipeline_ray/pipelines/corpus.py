"""Corpus-management operators: deterministic train/test split, stratified
sampling, and manifest-style union+rename.

Reference semantics mirrored:
  * seeded train/test split of manifest lines (``Workshop.ipynb`` "Split
    training and test sets", SURVEY.md §2.6 O5) — here a *hash* split
    (md5 of the key), which unlike a seeded shuffle is stable under
    corpus growth and needs no global pass;
  * stratified sampling with a target fraction per stratum
    (``notebooks/util/preproc.py:426-491``, O4) — same hash trick per
    language stratum;
  * manifest union + field renaming to a standard schema
    (``notebooks/util/preproc.py:494-564``, D4) — ``ds.union`` after
    per-source projection into a shared schema.

All three are SQL-checkable (md5 is identical in DuckDB), so the driver
value-hash gate covers them exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..sources.tables import read_table

# Hex prefix thresholds: P(md5[:2] < "29") = 0x29/0x100 = 16.02%.
TEST_HEX = "29"
SAMPLE_HEX = "14"  # 0x14/0x100 = 7.8%


def _md5_prefix2(keys: list[str]) -> list[str]:
    return [hashlib.md5(k.encode("utf-8")).hexdigest()[:2] for k in keys]


def q_doc_train_test_split(sf_dir: str) -> rd.Dataset:
    """Deterministic hash split: (doc_id, split) with split='test' iff
    md5(doc_id)[:2] < TEST_HEX — stable under corpus growth, no shuffle,
    no global pass (unlike the reference's seeded-shuffle split)."""
    ds = read_table(sf_dir, "documents", ["doc_id"])

    def split(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        pref = _md5_prefix2([str(i) for i in ids])
        return pa.table({
            "doc_id": batch["doc_id"],
            "split": pa.array(
                ["test" if p < TEST_HEX else "train" for p in pref],
                pa.string()),
        })

    return ds.map_batches(split, batch_format="pyarrow", batch_size=65536)


def q_doc_sample_stratified(sf_dir: str) -> rd.Dataset:
    """Stratified ~7.8% sample per language: per-stratum counts of
    sampled vs total docs (the reference's target-percent sampling,
    preproc.py:426-491, as a deterministic hash filter)."""
    ds = read_table(sf_dir, "documents", ["doc_id", "lang"])

    def mark(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        pref = _md5_prefix2([str(i) for i in ids])
        sampled = np.array([p < SAMPLE_HEX for p in pref], dtype=np.int64)
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pylist(),
            "sampled": sampled,
        })
        g = df.groupby("lang", as_index=False).agg(
            p_sampled=("sampled", "sum"), p_total=("sampled", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(mark, batch_format="pyarrow", batch_size=65536)
            .groupby("lang").aggregate(
                Sum("p_sampled", alias_name="n_sampled"),
                Sum("p_total", alias_name="n_total")))


def q_activity_union(sf_dir: str) -> rd.Dataset:
    """Union of two differently-shaped sources (orders + events) into one
    activity log schema (kind, n, total_amount), via per-source rename /
    projection then ``ds.union`` (manifest-consolidation semantics, D4).

    Amounts are 2-decimal; sums run in int64 cents (see relational.py)."""
    orders = read_table(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])
    events = read_table(sf_dir, "events", ["event_type", "value"])

    def from_orders(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch["o_totalprice"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        kinds = ["order:" + p for p in batch.column("o_orderpriority").to_pylist()]
        return _partial(kinds, cents)

    def from_events(batch: pa.Table) -> pa.Table:
        cents = np.rint(batch["value"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        kinds = ["event:" + t for t in batch.column("event_type").to_pylist()]
        return _partial(kinds, cents)

    def _partial(kinds: list[str], cents: np.ndarray) -> pa.Table:
        df = pd.DataFrame({"kind": kinds, "cents": cents})
        g = df.groupby("kind", as_index=False).agg(
            p_n=("cents", "size"), p_sum=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    unioned = (orders.map_batches(from_orders, batch_format="pyarrow",
                                  batch_size=65536)
               .union(events.map_batches(from_events, batch_format="pyarrow",
                                         batch_size=65536)))
    final = unioned.groupby("kind").aggregate(
        Sum("p_n", alias_name="n"),
        Sum("p_sum", alias_name="cents"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "kind": t["kind"],
            "n": t["n"],
            "total_amount": pa.array(
                t["cents"].to_numpy().astype(np.float64) / 100.0),
        })

    return final.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Domain mixture resampling (data mixing): downsample each source domain
# so the selected subcorpus follows target mixture weights — the
# "sampling proportions" knob of every LLM pretraining recipe (e.g. the
# domain-weighted mixtures of Brown et al. 2020 table 2.2, public paper).

def _domain_weight(source: str) -> float:
    """Deterministic target weight per source domain (srcN -> N%4+1) —
    a stand-in for the user-supplied mixture table, chosen to be
    SQL-expressible so the oracle can recompute it."""
    try:
        return float(int(source[3:]) % 4 + 1)
    except (ValueError, IndexError):
        return 1.0


def hex_threshold_accept(ids: list, srcs: list[str],
                         thr: dict[str, str]) -> np.ndarray:
    """The hex-threshold acceptance kernel (accept iff
    ``md5(str(id))[:8] < thr[source]``), shared by ``q_doc_domain_mix``
    and ``corpus_preprocess``'s keep_mix gate so the two can never
    drift.  The per-id md5 stays a Python loop BY CONTRACT: the digest
    must equal DuckDB's ``md5()`` byte-for-byte for the SQL oracle, and
    no vectorized md5 over int-as-string keys exists in numpy/pyarrow."""
    pref = [hashlib.md5(str(i).encode("utf-8")).hexdigest()[:8]
            for i in ids]
    return np.fromiter(
        (p < thr.get(s, "00000000") for p, s in zip(pref, srcs)),
        dtype=np.int64, count=len(ids))


def domain_thresholds(sf_dir: str) -> dict[str, str]:
    """Per-source md5-hex-prefix acceptance thresholds at rate
    ``w_s * K / n_s`` with ``K = min_s(n_s / w_s)`` — the shared model
    behind ``q_doc_domain_mix`` and the composite preprocess pipeline.
    One SMALL distributed count groupby; the result is #domains rows."""
    ds = read_table(sf_dir, "documents", ["source"])

    def count_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"source": batch.column("source").to_pylist()})
        g = df.groupby("source", as_index=False).agg(p_n=("source", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = (ds.map_batches(count_partial, batch_format="pyarrow",
                             batch_size=65536)
              .groupby("source").aggregate(Sum("p_n", alias_name="n"))
              .to_pandas())  # #domains rows — post-reduction materialization
    w = counts["source"].map(_domain_weight).to_numpy(dtype=np.float64)
    n = counts["n"].to_numpy(dtype=np.float64)
    k = float(np.min(n / w))
    rates = w * k / n
    return {
        s: "g" if r >= 1.0 else format(int(np.floor(r * 16 ** 8)), "08x")
        for s, r in zip(counts["source"], rates)
    }


def q_doc_domain_mix(sf_dir: str) -> rd.Dataset:
    """Deterministic mixture resampling: select docs per source at rate
    ``w_s * K / n_s`` with ``K = min_s(n_s / w_s)`` — the largest total
    that achieves the target proportions without oversampling any
    domain.  Output: (doc_id, source, selected).

    Scale shape: one SMALL groupby for per-source counts (pre-reduced
    per batch; result is #domains rows on the driver), thresholds
    broadcast as an md5-hex-prefix cutoff per source, then a single
    streaming ``map_batches`` accept pass — the same hash filter as the
    split/sample operators above: the per-doc hash is stable under
    corpus growth, so selections move only where the recomputed rates
    move the per-source threshold, never by reshuffling.

    Threshold convention: doc accepted iff md5(doc_id)[:8] < thr_hex
    where ``thr_hex = printf('%08x', floor(rate * 16^8))`` (rate >= 1
    uses the sentinel 'g', lexicographically above every hex digest) —
    string comparison on fixed-width lowercase hex IS the numeric
    comparison, in numpy and DuckDB alike."""
    thr = domain_thresholds(sf_dir)
    ds = read_table(sf_dir, "documents", ["doc_id", "source"])

    def select(batch: pa.Table) -> pa.Table:
        sel = hex_threshold_accept(batch.column("doc_id").to_pylist(),
                                   batch.column("source").to_pylist(), thr)
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": batch["source"],
            "selected": pa.array(sel),
        })

    return ds.map_batches(select, batch_format="pyarrow", batch_size=65536)


DOMAIN_MIX_SQL = r"""
    WITH cnt AS (
        SELECT source,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS DOUBLE) AS w
        FROM documents GROUP BY source),
    k AS (SELECT MIN(n / w) AS k FROM cnt),
    thr AS (
        SELECT source,
               CASE WHEN (w * k.k) / n >= 1.0 THEN 'g'
                    ELSE printf('%08x', CAST(floor(
                        (w * k.k) / n * 4294967296.0) AS BIGINT))
               END AS thr_hex
        FROM cnt, k)
    SELECT d.doc_id, d.source,
           CAST(substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < t.thr_hex
                AS BIGINT) AS selected
    FROM documents d JOIN thr t USING (source)
"""


SAMPLE_K = 50


def q_doc_sample_k(sf_dir: str, k: int = SAMPLE_K) -> pa.Table:
    """Deterministic uniform K-sample: the K smallest ``md5(doc_id)``
    digests — order-by-hash sampling, the fixed-size analog of the
    fraction samplers above (inspection/eyeballing draws).  No global
    sort: each batch keeps its own top-K candidates, the driver merges
    ``n_batches x K`` rows (the same partial-top-k-merge shape as the
    kNN suite).  Stable under corpus growth: a doc leaves the sample
    only when a smaller-hash doc enters."""
    ds = read_table(sf_dir, "documents", ["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        h = [hashlib.md5(str(i).encode("utf-8")).hexdigest() for i in ids]
        df = pd.DataFrame({"doc_id": np.asarray(ids, np.int64), "h": h})
        return pa.Table.from_pandas(df.sort_values(["h", "doc_id"]).head(k),
                                    preserve_index=False)

    cand = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536).to_pandas())
    top = cand.sort_values(["h", "doc_id"]).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(top, preserve_index=False)


SAMPLE_K_SQL = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents ORDER BY h, doc_id LIMIT 50
"""


CAP_PER_LANG = 20


def q_doc_cap_per_lang(sf_dir: str, n: int = CAP_PER_LANG) -> rd.Dataset:
    """Per-group LIMIT: the N smallest doc_ids of every language — the
    per-group cap sampler (balanced inspection slices, per-domain
    quota enforcement).  Output: ``(lang, doc_id, rn)`` with rn the
    1-based rank within the language.

    No global sort: each batch keeps at most N candidate rows per lang
    (local combiner), so the single ``groupby(lang)`` exchange carries
    <= N x n_batches rows per language and the final per-group
    sort+head touches candidate rows only."""
    ds = read_table(sf_dir, "documents", ["lang", "doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "lang": batch.column("lang").to_pylist(),
            "doc_id": batch.column("doc_id").to_numpy(),
        })
        keep = (df.sort_values(["lang", "doc_id"], kind="mergesort")
                .groupby("lang", sort=False).head(n))
        return pa.Table.from_pandas(keep, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        top = (g.sort_values("doc_id", kind="mergesort").head(n)
               .reset_index(drop=True))
        top["rn"] = np.arange(1, len(top) + 1, dtype=np.int64)
        return top

    return (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("lang").map_groups(final, batch_format="pandas"))


CAP_PER_LANG_SQL = """
    SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, CAST(rn AS BIGINT) AS rn
    FROM (SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang ORDER BY doc_id)
                     AS rn
          FROM documents)
    WHERE rn <= 20
"""


# ---------------------------------------------------------------------------
# Weighted K-sample (Efraimidis & Spirakis 2006, public paper): each doc
# gets key = u^(1/w) with u uniform and w its weight; the K largest keys
# are a weighted sample without replacement.  Deterministic here: u is
# the md5(doc_id) 60-bit slice (same digest contract as the uniform
# samplers above), w = n_chars, and the rank statistic is the monotone
# transform ln(u)/w.  Same no-global-sort shape as q_doc_sample_k:
# per-batch top-K candidates -> driver merges n_batches x K rows.
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 24
_U_DENOM = float(1 << 60)  # md5 15-hex-digit slice -> u in (0, 1)


def q_doc_weighted_sample(sf_dir: str,
                          k: int = WEIGHTED_SAMPLE_K) -> pa.Table:
    """Length-weighted inspection sample: (doc_id, n_chars) of the K
    docs with the largest ``ln(u)/n_chars`` keys.  The key math runs in
    scalar ``math.log`` BY CONTRACT (libm, the same function DuckDB's
    ``ln`` calls — numpy's vectorized log may differ in the last ulp,
    which would flip near-tie rank comparisons against the oracle)."""
    import math

    ds = read_table(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        w = batch.column("n_chars").to_pylist()
        key = [math.log(int(hashlib.md5(str(i).encode("utf-8"))
                            .hexdigest()[:15], 16) / _U_DENOM) / wi
               for i, wi in zip(ids, w)]
        df = pd.DataFrame({"doc_id": np.asarray(ids, np.int64),
                           "n_chars": np.asarray(w, np.int64),
                           "key": key})
        return pa.Table.from_pandas(
            df.sort_values(["key", "doc_id"],
                           ascending=[False, True]).head(k),
            preserve_index=False)

    cand = (ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=65536).to_pandas())
    top = (cand.sort_values(["key", "doc_id"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return pa.Table.from_pandas(top[["doc_id", "n_chars"]],
                                preserve_index=False)


WEIGHTED_SAMPLE_SQL = r"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               ln(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                       1, 15)) AS BIGINT)
                  / 1152921504606846976.0) / n_chars AS k
        FROM documents)
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_chars AS BIGINT) AS n_chars
    FROM keyed ORDER BY k DESC, doc_id LIMIT 24
"""

"""The composite corpus-preprocessing pipeline: one flagship pass that
chains the training-data filters the way a real pretraining recipe does
— quality gate (Gopher bounds), benchmark decontamination, domain
mixture sampling, PII accounting, and exact dedup — and emits a
per-document verdict table with each gate's vote plus the conjunction.

Physical plan (the point of the composition): every per-doc signal —
Gopher keep, decontamination probe (eval grams broadcast), mixture
accept (per-source thresholds broadcast), PII count, text md5 — is
computed in ONE fused streaming ``map_batches`` pass; the ONLY shuffle
in the whole pipeline is the exact-dedup md5 groupby, which the other
signals simply ride through as payload columns (no doc-keyed joins
anywhere).  Two small broadcast artifacts (eval gram ids, domain
thresholds) are built by their own bounded passes first.

Per-gate semantics are IDENTICAL to the standalone operators
(`filtering.gopher_quality_batch`, `decontam.q_doc_decontaminate`,
`corpus.q_doc_domain_mix`, `filtering.pii_scrub_batch`,
`text.q_doc_dedup_exact`), and the SQL oracle is the conjunction of
their oracles — so the composite is cross-checked end-to-end, not just
component-wise.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..sources.tables import broadcast, read_table
from .corpus import domain_thresholds, hex_threshold_accept
from .decontam import EVAL_MOD, _eval_gram_array
from .dedup import _batch_gram_rows
from .filtering import gopher_quality_batch, pii_scrub_batch


def signal_batch(t: pa.Table, ev: np.ndarray,
                 thr: dict[str, str]) -> pa.Table:
    """The fused per-doc signal kernel, shared verbatim by the one-shot
    query and the checkpointed runner: every gate except dedup —
    ``(doc_id, text_md5, keep_gopher, keep_decontam, keep_mix, n_pii)``."""
    ids = t.column("doc_id").to_numpy().astype(np.int64)
    texts = t.column("text").to_pylist()
    srcs = t.column("source").to_pylist()
    # gate 1: Gopher quality (exact standalone kernel)
    keep_gopher = gopher_quality_batch(
        t.select(["doc_id", "text"])).column("keep").to_numpy()
    # gate 2: decontamination (broadcast probe, standalone kernel)
    g, dix, npos, _ = _batch_gram_rows(texts)
    contam = np.zeros(len(ids), np.int64)
    if len(g) and len(ev):
        ix = np.searchsorted(ev, g)
        ix[ix == len(ev)] = 0
        hit = ev[ix] == g
        if hit.any():
            np.add.at(contam, dix[hit], npos[hit])
    keep_decontam = ((contam == 0) & (ids % EVAL_MOD != 0)).astype(
        np.int64)
    # gate 3: domain mixture accept (corpus.py's shared kernel —
    # identical threshold convention by construction)
    keep_mix = hex_threshold_accept(ids.tolist(), srcs, thr)
    # PII accounting (count only; redaction happens at export)
    n_pii = pii_scrub_batch(
        t.select(["doc_id", "text"])).column("pii_total").to_numpy()
    text_md5 = [hashlib.md5(x.encode("utf-8")).hexdigest()
                for x in texts]
    return pa.table({
        "doc_id": pa.array(ids),
        "text_md5": pa.array(text_md5, pa.string()),
        "keep_gopher": pa.array(keep_gopher),
        "keep_decontam": pa.array(keep_decontam),
        "keep_mix": pa.array(keep_mix),
        "n_pii": pa.array(n_pii),
    })


def _add_shard(t: pa.Table, n_shards: int) -> pa.Table:
    """Coarse shuffle key for the dedup exchange: a shard of the md5
    (exact-md5 groups would mean one Ray group per distinct text —
    per-group overhead dwarfs the work; see the LSH shard note in
    dedup.py) — exact segmentation happens vectorized in the shard
    task."""
    md5s = t.column("text_md5").to_pylist()
    shard = np.fromiter((int(m[:8], 16) for m in md5s),
                        dtype=np.int64, count=len(md5s)) % n_shards
    return t.append_column("shard", pa.array(shard.astype(np.int32)))


def q_corpus_preprocess(sf_dir: str) -> rd.Dataset:
    """Per-document verdict table:
    (doc_id, keep_gopher, keep_decontam, keep_mix, keep_dedup, n_pii,
    keep) — ``keep`` = conjunction of the four gates.  Eval-slice docs
    (``doc_id % EVAL_MOD == 0``) are hard-excluded via
    ``keep_decontam = 0`` (they ARE the benchmark).  ``keep_dedup``
    keeps the min doc_id per distinct text md5."""
    from ..sources.scale import shuffle_width, table_num_rows

    ev_ref = broadcast(_eval_gram_array(sf_dir))
    thr = domain_thresholds(sf_dir)
    n_shards = shuffle_width(n_rows=table_num_rows(sf_dir, "documents"))
    docs = read_table(sf_dir, "documents", ["doc_id", "text", "source"])

    def signals(t: pa.Table) -> pa.Table:
        return _add_shard(signal_batch(t, ray.get(ev_ref), thr), n_shards)

    # batch_size 1024: the fused kernel amortizes fully by ~1k docs,
    # and smaller batches keep task parallelism high even on small
    # corpora (4096 left a 5k-doc table running on 2 cores)
    return (docs.map_batches(signals, batch_format="pyarrow",
                             batch_size=1024)
            .groupby("shard")
            .map_groups(_shard_dedup, batch_format="pandas"))


def _shard_dedup(g: pd.DataFrame) -> pd.DataFrame:
    """Per-shard exact-dedup verdict kernel (shared by the one-shot
    query and the checkpointed runner's stage B)."""
    md5s = g["text_md5"].to_numpy()
    ids = g["doc_id"].to_numpy()
    order = np.lexsort((ids, md5s))
    first = np.concatenate([[True], md5s[order][1:] != md5s[order][:-1]])
    keep_dedup = np.empty(len(ids), np.int64)
    keep_dedup[order] = first  # survivor = min doc_id per md5 run
    drop = [c for c in ("text_md5", "shard", "partition_id")
            if c in g.columns]
    out = g.drop(columns=drop).copy()
    out["keep_dedup"] = keep_dedup
    out["keep"] = (out["keep_gopher"] * out["keep_decontam"]
                   * out["keep_mix"] * keep_dedup)
    return out


# Bump when the fused kernel's semantics change — part of the lineage,
# so stale checkpoints from an older kernel can never be trusted:
PREPROCESS_SPEC_VERSION = "corpus-preprocess-v1"


def run_preprocess_checkpointed(sf_dir: str, out_dir: str,
                                num_partitions: int = 32) -> dict:
    """Resumable ``corpus_preprocess`` — reference D2 skip-existing
    semantics (``util/ocr.py:151-161``) applied to the suite's most
    expensive composite, exactly like the flagship's
    ``extraction.run_checkpointed``.

    Stage A (the corpus-sized work — every per-doc text kernel): the
    fused signal pass, partitioned by ``doc_id % num_partitions``,
    written to ``out_dir/signals/partition_id=N/`` with one commit
    record per partition.  A rerun recomputes ONLY partitions without a
    matching-lineage record; each partition's content is a pure
    function of (input identity, kernel spec, partition layout).

    Stage B (the one exchange — fixed-width flag columns only, tiny
    next to stage A at scale): read the committed signal partitions,
    coarse md5-shard groupby, per-shard dedup verdict, written to
    ``out_dir/verdict/`` under a SINGLE commit record (a shuffle is
    all-or-nothing; per-partition records would buy nothing).

    The global broadcast artifacts (eval-gram ids, domain thresholds)
    are bounded recomputations on every resume by design — persisting
    them would add a trust surface for no measurable saving (they read
    the eval slice / one column).

    Returns ``{partitions, n_docs, n_keep, recomputed_partitions}``."""
    import glob as _glob
    import shutil

    from ..sources.scale import shuffle_width
    from ..state import checkpoint as ckpt

    docs_path = os.path.join(sf_dir, "documents.parquet")
    fp = ckpt.input_fingerprint([docs_path])
    lineage = hashlib.sha256(
        f"{fp}|{PREPROCESS_SPEC_VERSION}|{num_partitions}".encode()
    ).hexdigest()[:16]
    man_dir = os.path.join(out_dir, "_manifests")
    sig_dir = os.path.join(out_dir, "signals")

    def _sig_record(pid: int) -> str:
        return os.path.join(man_dir, f"signals-{pid:05d}.json")

    done = {pid for pid in range(num_partitions)
            if ckpt.load_stage_record(_sig_record(pid), lineage)}
    todo = sorted(set(range(num_partitions)) - done)

    if todo:
        # clear partition dirs not committed under THIS lineage (crash
        # leftovers / stale layouts):
        for pdir in _glob.glob(os.path.join(sig_dir, "partition_id=*")):
            try:
                pid = int(pdir.rsplit("=", 1)[1])
            except ValueError:
                pid = -1
            if pid not in done:
                shutil.rmtree(pdir)
        for rec in _glob.glob(os.path.join(man_dir, "signals-*.json")):
            try:
                pid = int(os.path.basename(rec)[8:13])
            except ValueError:
                pid = -1
            if pid not in done:
                os.unlink(rec)
        ev_ref = broadcast(_eval_gram_array(sf_dir))
        thr = domain_thresholds(sf_dir)
        todo_arr = np.asarray(todo, dtype=np.int64)
        docs = read_table(sf_dir, "documents", ["doc_id", "text", "source"])

        def signals_part(t: pa.Table) -> pa.Table:
            pid = (t.column("doc_id").to_numpy().astype(np.int64)
                   % num_partitions)
            keep = np.isin(pid, todo_arr)
            sub = t.filter(pa.array(keep))
            out = signal_batch(sub, ray.get(ev_ref), thr)
            return out.append_column(
                "partition_id", pa.array(pid[keep].astype(np.int32)))

        (docs.map_batches(signals_part, batch_format="pyarrow",
                          batch_size=1024)
         .write_parquet(sig_dir, partition_cols=["partition_id"]))
        for pid in todo:  # commit AFTER the write completed
            ckpt.write_stage_record(_sig_record(pid), {
                "partition_id": pid, "lineage_id": lineage,
                "status": "complete"})

    # ---- stage B ----
    verdict_dir = os.path.join(out_dir, "verdict")
    verdict_rec = os.path.join(man_dir, "verdict.json")
    rec = ckpt.load_stage_record(verdict_rec, lineage)
    if rec is None or not os.path.isdir(verdict_dir):
        shutil.rmtree(verdict_dir, ignore_errors=True)
        sigs = rd.read_parquet(sig_dir)
        n_rows = sigs.count()
        n_shards = shuffle_width(n_rows=n_rows)
        verdict = (sigs.map_batches(
            lambda t: _add_shard(t, n_shards), batch_format="pyarrow",
            batch_size=65536)
            .groupby("shard")
            .map_groups(_shard_dedup, batch_format="pandas"))
        verdict.write_parquet(verdict_dir)
        out = rd.read_parquet(verdict_dir,
                              columns=["keep"]).sum("keep")
        rec = {"lineage_id": lineage, "status": "complete",
               "n_docs": n_rows, "n_keep": int(out or 0)}
        ckpt.write_stage_record(verdict_rec, rec)
    return {"partitions": num_partitions, "n_docs": rec["n_docs"],
            "n_keep": rec["n_keep"], "recomputed_partitions": len(todo)}


def read_preprocess_verdict(out_dir: str) -> rd.Dataset:
    """Read back a checkpointed preprocess run's verdict table."""
    return rd.read_parquet(os.path.join(out_dir, "verdict"))


_CORPUS_PREPROCESS_TEMPLATE = r"""
    WITH tokd AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                    ELSE regexp_split_to_array(trim(text), '\s+')
               END AS ts
        FROM documents),
    -- Gopher gate (same signals as doc_gopher_quality)
    w AS (SELECT doc_id, unnest(ts) AS w FROM tokd),
    wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
    wtop AS (SELECT doc_id, MAX(c) AS top_w FROM wc GROUP BY 1),
    bg AS (SELECT doc_id,
                  unnest(list_transform(
                      generate_series(1, len(ts) - 1),
                      i -> ts[i] || chr(1) || ts[i + 1])) AS b
           FROM tokd WHERE len(ts) >= 2),
    bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    btop AS (SELECT doc_id, MAX(c) AS top_b FROM bc GROUP BY 1),
    gopher AS (
        SELECT t.doc_id,
               CAST(len(ts) BETWEEN 50 AND 100000
                    AND (CASE WHEN len(ts) = 0 THEN 0.0 ELSE
                         CAST(list_aggregate(list_transform(ts,
                                  x -> length(x)), 'sum') AS DOUBLE)
                             / CAST(len(ts) AS DOUBLE) END)
                        BETWEEN 3.0 AND 10.0
                    AND (CASE WHEN len(ts) = 0 THEN 0.0 ELSE
                         CAST(COALESCE(wtop.top_w, 0) AS DOUBLE)
                             / CAST(len(ts) AS DOUBLE) END) <= 0.20
                    AND (CASE WHEN len(ts) < 2 THEN 0.0 ELSE
                         CAST(COALESCE(btop.top_b, 0) AS DOUBLE)
                             / CAST(len(ts) - 1 AS DOUBLE) END) <= 0.10
                    AS BIGINT) AS keep_gopher
        FROM tokd t
        LEFT JOIN wtop ON wtop.doc_id = t.doc_id
        LEFT JOIN btop ON btop.doc_id = t.doc_id),
    -- decontamination gate (same grams as doc_decontaminate)
    grams AS (
        SELECT t.doc_id, array_to_string(t.ts[r.i:r.i+7], ' ') AS g
        FROM tokd t, unnest(range(1, len(t.ts) - 6)) AS r(i)
        WHERE len(t.ts) >= 8),
    ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 20 = 0),
    contam AS (
        SELECT DISTINCT doc_id FROM grams
        WHERE doc_id % 20 <> 0 AND g IN (SELECT g FROM ev)),
    -- mixture gate (same thresholds as doc_domain_mix)
    cnt AS (
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
        FROM cnt, k),
    -- exact-dedup gate
    surv AS (SELECT MIN(doc_id) AS keep_doc_id FROM documents
             GROUP BY md5(text)),
    verdict AS (
        SELECT d.doc_id,
               g.keep_gopher,
               CAST(c.doc_id IS NULL AND d.doc_id % 20 <> 0 AS BIGINT)
                   AS keep_decontam,
               CAST(substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                        < t.thr_hex AS BIGINT) AS keep_mix,
               CAST(d.doc_id IN (SELECT keep_doc_id FROM surv)
                    AS BIGINT) AS keep_dedup,
               CAST(len(regexp_extract_all(d.text, '@PII_EMAIL@'))
                    + len(regexp_extract_all(d.text, '@PII_IPV4@'))
                    + len(regexp_extract_all(d.text, '@PII_PHONE@'))
                    AS BIGINT) AS n_pii
        FROM documents d
        JOIN gopher g ON g.doc_id = d.doc_id
        JOIN thr t USING (source)
        LEFT JOIN contam c ON c.doc_id = d.doc_id)
    SELECT *,
           keep_gopher * keep_decontam * keep_mix * keep_dedup AS keep
    FROM verdict
"""


# The PII patterns are interpolated from the SAME constants the engine
# kernel uses (regex braces make str.format unusable; sentinel replace):
from .filtering import PII_EMAIL, PII_IPV4, PII_PHONE  # noqa: E402

CORPUS_PREPROCESS_SQL = (_CORPUS_PREPROCESS_TEMPLATE
                         .replace("@PII_EMAIL@", PII_EMAIL)
                         .replace("@PII_IPV4@", PII_IPV4)
                         .replace("@PII_PHONE@", PII_PHONE))

"""External-API ingestion pipeline (SURVEY §2.1 S5, end-to-end).

``sources/paged_api.py`` models the reference's paginated OCR-response
stream as NextToken-linked chunk files; this module drives the full
ingest: custom-Datasource read (one read task per span of documents) ->
``parse_layout_json`` over the merged payloads -> per-document block
statistics.  The oracle side recomputes the same statistics with DuckDB
``read_json`` directly over the UNMERGED chunk files, so the driver's
hash compare verifies the NextToken walk + chunk merge + parser chain
against a path that never runs any of that code.

Confidence is summed, not averaged: the fixture's confidences are
integer-valued, so the float64 sum is order-exact and hash-stable by
construction (no f32 convention needed).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions.layout_parser import parse_layout_json
from ..sources.paged_api import read_paged_responses, write_paged_responses

PAGED_ROOT = "/tmp/attp_paged"
PAGED_CURRENT = os.path.join(PAGED_ROOT, "current")


def paged_fixture_dir(sf_dir: str) -> str:
    """Deterministic per-sf chunk-file corpus (generated once, reused).
    Re-points the ``current`` symlink so the static ``oracle_sql()``
    string reads the same corpus the query just ran on (the same
    convention as ``oracle_fixture_aux.AUX_CURRENT``)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    try:
        sf = float(tag.replace("sf", ""))
    except ValueError:
        sf = 0.01
    n_docs = max(40, int(4000 * sf))
    root = os.path.join(PAGED_ROOT, f"{tag}-n{n_docs}")
    marker = os.path.join(root, ".complete")
    if not os.path.exists(marker):
        write_paged_responses(root, n_docs)
        with open(marker, "w") as f:
            f.write(str(n_docs))
    tmp = f"{PAGED_CURRENT}.tmp.{os.getpid()}"
    try:
        os.symlink(root, tmp)
        os.replace(tmp, PAGED_CURRENT)
    finally:
        if os.path.islink(tmp):
            os.unlink(tmp)
    return root


def q_api_paged_blocks(sf_dir: str):
    """Per-document block statistics over the paginated-response corpus:
    ``(doc_id, n_chunks, n_lines, n_words, sum_conf)``."""
    root = paged_fixture_dir(sf_dir)
    ds = read_paged_responses(root)

    def stats(batch: pa.Table) -> pa.Table:
        n_lines, n_words, sum_conf = [], [], []
        for payload in batch.column("payload").to_pylist():
            t = parse_layout_json(payload)
            n_lines.append(len(np.unique(t.line_id)))
            n_words.append(t.n_words)
            sum_conf.append(int(round(float(t.ocr_conf.sum()))))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chunks": batch.column("n_chunks").cast(pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "sum_conf": pa.array(sum_conf, pa.int64()),
        })

    out = ds.map_batches(stats, batch_format="pyarrow", batch_size=64)
    return (out.to_pandas().sort_values("doc_id").reset_index(drop=True))


def api_paged_blocks_sql() -> str:
    """DuckDB oracle over the RAW chunk files (static string; the query
    callable re-points the ``current`` symlink): doc_id from the
    filename, block counts from the unnested (never merged) Blocks
    lists."""
    root = PAGED_CURRENT
    return f"""
        WITH chunks AS (
            SELECT regexp_extract(filename, '(doc-\\d+)\\.chunk', 1)
                       AS doc_id,
                   Blocks
            FROM read_json('{root}/*.json', filename=true,
                           union_by_name=true,
                           columns={{
                               'DocumentMetadata': 'JSON',
                               'Blocks': 'STRUCT(BlockType VARCHAR,
                                          Confidence DOUBLE,
                                          Text VARCHAR)[]',
                               'NextToken': 'VARCHAR'}})
        ), blocks AS (
            SELECT doc_id, UNNEST(Blocks) AS b FROM chunks
        )
        SELECT c.doc_id,
               c.n_chunks,
               b.n_lines,
               b.n_words,
               b.sum_conf
        FROM (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
              FROM chunks GROUP BY doc_id) c
        JOIN (SELECT doc_id,
                     CAST(COUNT(*) FILTER (b.BlockType = 'LINE')
                          AS BIGINT) AS n_lines,
                     CAST(COUNT(*) FILTER (b.BlockType = 'WORD')
                          AS BIGINT) AS n_words,
                     CAST(ROUND(COALESCE(SUM(b.Confidence) FILTER (
                          b.BlockType = 'WORD'), 0)) AS BIGINT)
                         AS sum_conf
              FROM blocks GROUP BY doc_id) b USING (doc_id)
        ORDER BY doc_id
    """

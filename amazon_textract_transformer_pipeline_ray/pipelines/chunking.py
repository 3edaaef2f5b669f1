"""RAG-style document chunking: fixed-size overlapping character
windows with stable per-doc chunk indices — the retrieval-corpus prep
step (split every document into CHUNK_SIZE-char windows advanced by
CHUNK_STRIDE, so consecutive chunks overlap by CHUNK_SIZE-CHUNK_STRIDE
chars).

Spec (shared verbatim with the DuckDB oracle in ``__ray_entry__``):

* chunk k of a doc covers characters ``[k*STRIDE, k*STRIDE+SIZE)``
  (character positions, not bytes — Python slicing and DuckDB
  ``substr`` agree on characters);
* a chunk exists iff ``k*STRIDE < len(text)`` — the final chunk may be
  short, empty docs produce zero chunks;
* identity columns only (offsets, lengths, md5 of the chunk text), so
  the compare is value-dense without shipping the text twice.

Scale shape: ONE streaming ``map_batches`` pass, zero shuffles; output
rows ~ corpus_chars / STRIDE.  The per-batch kernel slices strings in
Python (string windowing has no Arrow kernel) but touches each char a
bounded number of times (SIZE/STRIDE <= 2 here); md5 is the dominant
cost and is the point of the identity column.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..sources.tables import read_table

CHUNK_SIZE = 500
CHUNK_STRIDE = 400


def chunk_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_numpy()
    texts = batch.column("text").to_pylist()
    out_id, out_ix, out_start, out_len, out_md5 = [], [], [], [], []
    for did, txt in zip(ids, texts):
        n = len(txt)
        k = 0
        while k * CHUNK_STRIDE < n:
            start = k * CHUNK_STRIDE
            c = txt[start:start + CHUNK_SIZE]
            out_id.append(did)
            out_ix.append(k)
            out_start.append(start)
            out_len.append(len(c))
            out_md5.append(hashlib.md5(c.encode("utf-8")).hexdigest())
            k += 1
    return pa.table({
        "doc_id": pa.array(np.asarray(out_id, np.int64)),
        "chunk_idx": pa.array(np.asarray(out_ix, np.int64)),
        "chunk_start": pa.array(np.asarray(out_start, np.int64)),
        "n_chunk_chars": pa.array(np.asarray(out_len, np.int64)),
        "chunk_md5": pa.array(out_md5, pa.string()),
    })


def q_doc_chunks(sf_dir: str) -> rd.Dataset:
    """Per-doc overlapping chunk table:
    ``(doc_id, chunk_idx, chunk_start, n_chunk_chars, chunk_md5)``."""
    ds = read_table(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(chunk_batch, batch_format="pyarrow",
                          batch_size=2048)


# (`//` not `/`: DuckDB's `/` is float division and CAST rounds-to-
# nearest, which over-counts chunks for doc lengths just past a stride.)
DOC_CHUNKS_SQL = f"""
    WITH e AS (
        SELECT doc_id, text,
               unnest(range((length(text) + {CHUNK_STRIDE - 1})
                            // {CHUNK_STRIDE})) AS chunk_idx
        FROM documents WHERE length(text) > 0
    )
    SELECT doc_id,
           CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * {CHUNK_STRIDE} AS BIGINT) AS chunk_start,
           CAST(length(substr(text,
                    CAST(chunk_idx*{CHUNK_STRIDE} + 1 AS BIGINT),
                    {CHUNK_SIZE})) AS BIGINT) AS n_chunk_chars,
           md5(substr(text, CAST(chunk_idx*{CHUNK_STRIDE} + 1 AS BIGINT),
                      {CHUNK_SIZE})) AS chunk_md5
    FROM e
"""

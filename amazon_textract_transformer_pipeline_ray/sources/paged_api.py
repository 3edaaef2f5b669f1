"""External-API response source (SURVEY §2.1 S5): paginated per-document
JSON chunk files -> one merged payload row per document.

The reference consumes Textract's paginated ``GetDocumentAnalysis``
responses: each call returns a ``Blocks`` chunk plus a ``NextToken``
until the document is exhausted, and the callback Lambda concatenates
the chunks (``pipeline/ocr/fn-call-textract/main.py:246-278``).  There
is no network in a bounded batch engine, so the response stream is
modeled as its durable equivalent — a directory of chunk files named

    ``<doc_id>.chunk-<k>.json``

each carrying ``{"DocumentMetadata": ..., "Blocks": [...],
"NextToken": "<doc_id>.chunk-<k+1>"}`` (absent on the last chunk), the
exact shape the reference's OCR builders emit
(``ocr_engines/base.py:274-294``).

Ray-Data-first design: a custom :class:`ray.data.Datasource`.  The
directory walk + doc grouping happens once at PLAN time on the driver
(cheap: file names only); each :class:`ReadTask` then reads and merges
a contiguous span of documents in a worker, so ingestion parallelizes
across the cluster and streams into downstream ``map_batches`` stages
with no driver materialization.  Chunk order within a document follows
the NextToken chain, not directory order, mirroring the reference's
pagination loop.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
from ray.data.datasource import Datasource

from ..functions.layout_parser import merge_response_chunks

CHUNK_SUFFIX = ".json"


def _doc_of(fname: str) -> str | None:
    """``<doc_id>.chunk-<k>.json`` -> doc_id (None for foreign files)."""
    if not fname.endswith(CHUNK_SUFFIX):
        return None
    stem = fname[:-len(CHUNK_SUFFIX)]
    base, sep, k = stem.rpartition(".chunk-")
    return base if sep and k.isdigit() else None


def _merged_payload(paths: list[str]) -> str:
    """Follow the NextToken chain across a doc's chunk files and merge
    (fn-call-textract/main.py:246-278 semantics: list-valued keys
    concatenated in token order)."""
    by_name = {os.path.basename(p): p for p in paths}
    first = min(by_name)  # chunk-0 sorts first within one doc
    chunks, name = [], first
    while name is not None:
        with open(by_name[name]) as f:
            chunk = json.load(f)
        token = chunk.pop("NextToken", None)
        chunks.append(chunk)
        name = f"{token}{CHUNK_SUFFIX}" if token is not None else None
    merged = merge_response_chunks(chunks)
    return json.dumps(merged)


class PagedResponseDatasource(Datasource):
    """``ray.data.Datasource`` over a paginated-response directory.

    One read task covers ``ceil(n_docs / parallelism)`` documents; each
    task opens only its own chunk files.  Plan-time cost is a single
    ``os.listdir`` (names only — no file is opened on the driver).
    """

    def __init__(self, root: str):
        self._root = root
        groups: dict[str, list[str]] = {}
        for fname in sorted(os.listdir(root)):
            doc = _doc_of(fname)
            if doc is not None:
                groups.setdefault(doc, []).append(os.path.join(root, fname))
        self._groups = sorted(groups.items())

    def estimate_inmemory_data_size(self):
        return None

    @property
    def supports_distributed_reads(self) -> bool:
        return True

    def schema(self):
        return pa.schema([("doc_id", pa.string()),
                          ("n_chunks", pa.int32()),
                          ("payload", pa.string())])

    def get_name(self) -> str:
        return "PagedResponses"

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask

        spans = np.array_split(np.arange(len(self._groups)),
                               max(1, min(parallelism, len(self._groups))))
        tasks = []
        for span in spans:
            if len(span) == 0:
                continue
            docs = self._groups[span[0]:span[-1] + 1]

            def read_fn(docs=docs):
                yield pa.table({
                    "doc_id": pa.array([d for d, _ in docs], pa.string()),
                    "n_chunks": pa.array([len(p) for _, p in docs],
                                         pa.int32()),
                    "payload": pa.array([_merged_payload(p)
                                         for _, p in docs], pa.string()),
                })

            meta = BlockMetadata(
                num_rows=len(docs),
                size_bytes=sum(os.path.getsize(p)
                               for _, ps in docs for p in ps),
                exec_stats=None,
                input_files=[p for _, ps in docs for p in ps])
            tasks.append(ReadTask(read_fn, meta))
        return tasks


def read_paged_responses(root: str, parallelism: int = -1):
    """Dataset of ``(doc_id, n_chunks, payload)`` — payload is the fully
    merged response JSON, ready for ``parse_layout_json``."""
    import ray.data as rd

    return rd.read_datasource(PagedResponseDatasource(root),
                              override_num_blocks=(
                                  None if parallelism == -1 else parallelism))


def write_paged_responses(root: str, n_docs: int, seed: int = 20260817,
                          max_chunks: int = 4) -> str:
    """Deterministic paginated-response fixture: ``n_docs`` layout-JSON
    documents, each split into 1..max_chunks NextToken-linked chunk
    files.  Blocks are generated in the ocr_engines/base.py shape (PAGE
    -> LINE -> WORD with CHILD relationships and synthetic geometry) and
    SPLIT MID-DOCUMENT so the merge actually has to reassemble."""
    os.makedirs(root, exist_ok=True)
    for i in range(n_docs):
        rng = np.random.default_rng([seed, i])
        doc_id = f"doc-{i:05d}"
        n_lines = int(rng.integers(2, 9))
        blocks: list[dict] = []
        page = {"Id": f"{doc_id}-page-1", "BlockType": "PAGE", "Page": 1,
                "Relationships": [{"Type": "CHILD", "Ids": []}]}
        blocks.append(page)
        for li in range(n_lines):
            words = [f"w{li}x{wi}"
                     for wi in range(int(rng.integers(1, 6)))]
            line_id = f"{doc_id}-line-{li}"
            word_ids = [f"{doc_id}-word-{li}-{wi}"
                        for wi in range(len(words))]
            page["Relationships"][0]["Ids"].append(line_id)
            blocks.append({
                "Id": line_id, "BlockType": "LINE", "Page": 1,
                "Text": " ".join(words), "Confidence": 99.0,
                "Geometry": {"BoundingBox": {
                    "Top": 0.1 * li, "Left": 0.05,
                    "Width": 0.9, "Height": 0.05}},
                "Relationships": [{"Type": "CHILD", "Ids": word_ids}],
            })
            for wi, w in enumerate(words):
                blocks.append({
                    "Id": word_ids[wi], "BlockType": "WORD", "Page": 1,
                    "Text": w, "Confidence": float(90 + (li + wi) % 10),
                    "Geometry": {"BoundingBox": {
                        "Top": 0.1 * li, "Left": 0.05 + 0.15 * wi,
                        "Width": 0.14, "Height": 0.05}},
                })
        n_chunks = int(rng.integers(1, max_chunks + 1))
        cuts = np.linspace(0, len(blocks), n_chunks + 1).astype(int)
        for k in range(n_chunks):
            chunk = {
                "DocumentMetadata": {"Pages": 1},
                "Blocks": blocks[cuts[k]:cuts[k + 1]],
            }
            if k + 1 < n_chunks:
                chunk["NextToken"] = f"{doc_id}.chunk-{k + 1}"
            with open(os.path.join(root, f"{doc_id}.chunk-{k}.json"),
                      "w") as f:
                json.dump(chunk, f)
    return root

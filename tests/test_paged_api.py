"""Paginated external-API source (sources/paged_api.py): NextToken walk,
chunk merge, custom-Datasource parallel read."""

import json
import os

import numpy as np
import pytest

from amazon_textract_transformer_pipeline_ray.functions.layout_parser import (
    parse_layout_json)
from amazon_textract_transformer_pipeline_ray.sources.paged_api import (
    _doc_of, _merged_payload, read_paged_responses, write_paged_responses)


def test_doc_of_naming():
    assert _doc_of("doc-00003.chunk-2.json") == "doc-00003"
    assert _doc_of("doc-00003.chunk-x.json") is None
    assert _doc_of("README.txt") is None
    assert _doc_of("doc.json") is None


def test_next_token_walk_reassembles_in_order(tmp_path):
    """Chunks are walked by NextToken, not directory order: a doc split
    mid-line-run must come back with blocks in original order."""
    root = write_paged_responses(str(tmp_path), 12, max_chunks=4)
    multi = [d for d in sorted({_doc_of(f) for f in os.listdir(root)
                                if _doc_of(f)})
             if os.path.exists(os.path.join(root, f"{d}.chunk-1.json"))]
    assert multi, "fixture must contain multi-chunk docs"
    for doc in multi:
        paths = [os.path.join(root, f) for f in os.listdir(root)
                 if _doc_of(f) == doc]
        merged = json.loads(_merged_payload(paths))
        assert "NextToken" not in merged
        types = [b["BlockType"] for b in merged["Blocks"]]
        assert types[0] == "PAGE"
        # words of line k are exactly w{k}x{0..}, in order:
        t = parse_layout_json(json.dumps(merged))
        for li in np.unique(t.line_id):
            ws = [w for w, l in zip(t.words, t.line_id) if l == li]
            assert ws == [f"w{li}x{wi}" for wi in range(len(ws))], doc


def test_datasource_reads_all_docs_in_parallel_tasks(ray_session, tmp_path):
    root = write_paged_responses(str(tmp_path), 9)
    # foreign files must be ignored by the walk:
    with open(os.path.join(root, "README.txt"), "w") as f:
        f.write("not a chunk")
    ds = read_paged_responses(root, parallelism=4)
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df["doc_id"]) == [f"doc-{i:05d}" for i in range(9)]
    n_files = sum(1 for f in os.listdir(root) if f.endswith(".json"))
    assert int(df["n_chunks"].sum()) == n_files
    # every merged payload parses and is non-empty:
    for payload in df["payload"]:
        assert parse_layout_json(payload).n_words > 0


def test_paged_query_matches_duckdb_oracle(ray_session):
    """Local replica of the driver compare for api_paged_blocks."""
    import duckdb

    from amazon_textract_transformer_pipeline_ray.pipelines.api_ingest import (
        api_paged_blocks_sql, q_api_paged_blocks)

    got = q_api_paged_blocks("/root/testdata/sf0.001")
    exp = duckdb.sql(api_paged_blocks_sql()).df()
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp) > 0
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c

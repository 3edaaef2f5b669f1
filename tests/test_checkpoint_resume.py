"""Resumability (FIXTURES.md §5): delete a partition's output + manifest,
resume, assert byte-identical final table; complete runs are no-ops;
config changes invalidate lineage."""

import os
import shutil

import pandas as pd
import pytest

from amazon_textract_transformer_pipeline_ray.config import EngineConfig
from amazon_textract_transformer_pipeline_ray.fixtures import write_transcripts
from amazon_textract_transformer_pipeline_ray.state import checkpoint as ckpt

N_TURNS = 400


@pytest.fixture(scope="module")
def cfg():
    return EngineConfig(num_partitions=8)


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    d = tmp_path_factory.mktemp("transcripts")
    return write_transcripts(str(d), N_TURNS, n_shards=2)


def _read_all(out_dir):
    import glob

    import pyarrow.dataset as pds

    files = sorted(glob.glob(os.path.join(out_dir, "data", "partition_id=*", "*.parquet")))
    table = pds.dataset(files, format="parquet").to_table()
    df = table.to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_checkpointed_run_and_resume(ray_session, inputs, cfg, tmp_path_factory):
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        run_checkpointed,
    )

    out = str(tmp_path_factory.mktemp("out"))
    summary1 = run_checkpointed(inputs, out, cfg, batch_size=64)
    assert summary1["partitions"] == cfg.num_partitions
    assert summary1["turns_processed"] > 0
    first = _read_all(out)

    # Resume on a complete run is a no-op (skip-existing semantics):
    summary2 = run_checkpointed(inputs, out, cfg, batch_size=64)
    assert summary2 == summary1
    assert _read_all(out).equals(first)

    # Simulate a crash: destroy two partitions' data + manifests.
    victims = [p for p in range(cfg.num_partitions)][:2]
    for pid in victims:
        pdir = os.path.join(out, "data", f"partition_id={pid}")
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)
        mpath = ckpt.manifest_path(out, pid)
        if os.path.exists(mpath):
            os.remove(mpath)
    summary3 = run_checkpointed(inputs, out, cfg, batch_size=64)
    assert summary3 == summary1
    resumed = _read_all(out)
    pd.testing.assert_frame_equal(resumed, first)


def test_lineage_invalidation(inputs, cfg):
    fp = ckpt.input_fingerprint(inputs)
    other_cfg = EngineConfig(num_partitions=8, max_seq_len=128)
    assert cfg.lineage_id(fp) != other_cfg.lineage_id(fp)
    assert cfg.lineage_id(fp) == EngineConfig(num_partitions=8).lineage_id(fp)


def test_manifest_atomicity(tmp_path):
    out = str(tmp_path)
    ckpt.write_manifest(out, 3, "lin", "fp", 10, 1, 0.25, 42)
    assert ckpt.load_complete_partitions(out, "lin") == {3}
    assert ckpt.load_complete_partitions(out, "other") == set()
    s = ckpt.run_summary(out)
    assert s["turns_processed"] == 10 and s["span_count"] == 42

"""Fixture generator determinism (FIXTURES.md §6)."""

import numpy as np

from amazon_textract_transformer_pipeline_ray.fixtures import (
    conversation_sizes,
    gen_transcripts,
    gen_turn_payload,
    write_transcripts,
)


def test_payloads_deterministic():
    assert gen_turn_payload(1, 5, 7) == gen_turn_payload(1, 5, 7)
    assert gen_turn_payload(1, 5, 7) != gen_turn_payload(1, 5, 8)


def test_table_deterministic_and_schema():
    a = gen_transcripts(300)
    b = gen_transcripts(300)
    assert a.equals(b)
    assert [f.name for f in a.schema] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(a.schema.field("turn_idx").type) == "int32"
    assert str(a.schema.field("ts").type) == "timestamp[us]"


def test_mega_conversation_skew():
    sizes = conversation_sizes(5000, 42)
    assert sizes[0] >= 50 * int(np.median(sizes[1:]))


def test_rows_are_shuffled():
    t = gen_transcripts(300)
    tix = t.column("turn_idx").to_pylist()
    assert tix != sorted(tix)


def test_sharded_equals_unsharded(tmp_path):
    t = gen_transcripts(400)
    paths = write_transcripts(str(tmp_path), 400, n_shards=3)
    import pyarrow.parquet as pq
    import pyarrow as pa

    shards = pa.concat_tables([pq.read_table(p) for p in paths])
    key = lambda tab: sorted(zip(tab.column("conv_id").to_pylist(),
                                 tab.column("turn_idx").to_pylist(),
                                 tab.column("text").to_pylist()))
    assert key(shards) == key(t)


def test_shard_balance_with_mega_conversation(tmp_path):
    """Salted turn->shard assignment keeps input files near the mean even
    with the mega-conversation present (no hot input file: a 7x shard
    would become a straggler read task at high parallelism)."""
    import numpy as np
    import pyarrow.parquet as pq

    from amazon_textract_transformer_pipeline_ray.fixtures import (
        write_transcripts)

    paths = write_transcripts(str(tmp_path / "c"), 8000, n_shards=16)
    rows = np.array([pq.ParquetFile(p).metadata.num_rows for p in paths])
    assert rows.sum() > 0
    assert rows.max() <= 2.5 * rows.mean(), rows.tolist()
    # files are splittable (bounded row groups):
    assert pq.ParquetFile(paths[0]).metadata.num_row_groups >= 1

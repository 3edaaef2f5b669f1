"""Task-registry dispatch (pipelines/tasks.py): the reference's
mlm/ner/seq2seq get_datasets surface re-expressed over Ray datasets."""

import numpy as np
import pytest


def _ds(n=120, seed=13):
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.fixtures import gen_transcripts

    return rd.from_arrow(gen_transcripts(n, seed=seed))


def test_unknown_task_error(ray_session):
    from amazon_textract_transformer_pipeline_ray.pipelines.tasks import get_task

    with pytest.raises(ValueError, match="Unknown task 'foo'"):
        get_task("foo", _ds())


def test_ner_task_is_training_export(ray_session):
    from amazon_textract_transformer_pipeline_ray.pipelines.tasks import get_task

    df = get_task("ner", _ds(), max_seq_len=64).to_pandas()
    assert len(df) > 0 and "word_labels" in df.columns


def test_mlm_task(ray_session):
    from amazon_textract_transformer_pipeline_ray.pipelines.tasks import (
        MLM_MASK_PCT, get_task)

    df = get_task("mlm", _ds(), max_seq_len=64).to_pandas()
    assert len(df) > 0
    assert "word_labels" not in df.columns
    total_words = total_masked = 0
    for _, r in df.iterrows():
        n = len(r["words"])
        ms = list(r["mask_positions"])
        assert all(0 <= m < n for m in ms)
        assert ms == sorted(set(ms))
        total_words += n
        total_masked += len(ms)
    # deterministic ~15% rate, loose bounds:
    rate = total_masked / total_words
    assert 0.08 < rate < 0.25, rate

    # determinism: same input -> identical masks
    df2 = get_task("mlm", _ds(), max_seq_len=64).to_pandas()
    a = df.sort_values(["conv_id", "turn_idx", "page", "window_idx"])
    b = df2.sort_values(["conv_id", "turn_idx", "page", "window_idx"])
    for x, y in zip(a["mask_positions"], b["mask_positions"]):
        assert list(x) == list(y)


def test_seq2seq_task(ray_session):
    import re

    from amazon_textract_transformer_pipeline_ray.functions.dates import (
        normalize_date_iso)
    from amazon_textract_transformer_pipeline_ray.pipelines.tasks import get_task

    df = get_task("seq2seq", _ds(300, seed=21)).to_pandas()
    assert len(df) > 0, "corpus should contain date spans"
    assert set(df.columns) == {"source", "target", "n_occurrences"}
    assert (df["n_occurrences"] >= 1).all()
    # pairs are distinct and targets follow the registry normalizer:
    assert not df.duplicated(["source", "target"]).any()
    for s, t in zip(df["source"], df["target"]):
        assert t == normalize_date_iso(s)
    # at least some sources actually normalize to ISO form:
    assert any(re.match(r"^\d{4}-\d{2}-\d{2}$", t) for t in df["target"])


def test_crc32_int_suffix_bit_identical_to_zlib():
    """The vectorized digit-CRC fold must reproduce
    ``zlib.crc32(str(w).encode(), base)`` exactly — the MLM mask
    contract (and its independent oracle fixture) is defined in terms
    of the scalar zlib call."""
    import zlib

    import numpy as np

    from amazon_textract_transformer_pipeline_ray.pipelines.tasks import (
        _crc32_int_suffix)

    rng = np.random.default_rng(7)
    bases = rng.integers(0, 2**32, 2000, dtype=np.uint64).astype(np.uint32)
    ws = np.concatenate([np.arange(600),
                         rng.integers(0, 10**8, 1400)])
    got = _crc32_int_suffix(bases, ws)
    exp = np.array([zlib.crc32(str(int(w)).encode(), int(b))
                    for b, w in zip(bases, ws)], dtype=np.uint32)
    assert (got == exp).all()

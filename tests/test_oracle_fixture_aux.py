"""Aux oracle-fixture contract (oracle_fixture_aux.py).

The full side-by-side query-vs-SQL gate lives in
tests/test_queries_oracle_sql.py (the aux-fixtured dedup/similarity
entries are part of oracle_sql() and covered there).  This module pins
the pieces that make those hashes meaningful:

* the independent winnowing restatement (set of sliding-window minima)
  equals the engine's positional rightmost-argmin selection on adversarial
  strings, not just on the corpus;
* the independent per-doc simhash equals the engine's scalar spec;
* ensure_aux_fixture caches per (corpus, table) and re-points ``current``.
"""

import os

import numpy as np

from amazon_textract_transformer_pipeline_ray import oracle_fixture_aux as aux
from amazon_textract_transformer_pipeline_ray.pipelines.dedup import (
    simhash64,
    winnow_fingerprints,
)

SF = "/root/testdata/sf0.001"


def test_winnow_restatement_equals_engine_selection():
    rng = np.random.default_rng(7)
    alphabet = "abcd \n"
    cases = ["", "a", "x" * 7, "x" * 8, "x" * 100, "ab" * 50]
    cases += ["".join(rng.choice(list(alphabet), size=n))
              for n in (8, 9, 23, 24, 25, 200, 1000)]
    from amazon_textract_transformer_pipeline_ray.pipelines.dedup import (
        WINNOW_K, WINNOW_W)

    pows = (np.uint64(31) ** np.arange(WINNOW_K - 1, -1, -1, dtype=np.uint64))
    for text in cases:
        engine = winnow_fingerprints(text)
        data = np.frombuffer(text.encode(), dtype=np.uint8)
        n = len(data) - WINNOW_K + 1
        if n <= 0:
            assert len(engine) == 0
            continue
        grams = np.lib.stride_tricks.sliding_window_view(
            data, WINNOW_K).astype(np.uint64)
        h = (grams * pows[None, :]).sum(axis=1)
        if n <= WINNOW_W:
            expect = np.unique(h.min(keepdims=True))
        else:
            wins = np.lib.stride_tricks.sliding_window_view(h, WINNOW_W)
            expect = np.unique(wins.min(axis=1))
        assert np.array_equal(np.sort(engine), expect), text[:40]


def test_simhash_restatement_equals_scalar_spec():
    texts = ["", "hello world", "the the the a b", "tab\tsep  and\nnl",
             "solo"]
    for t in texts:
        assert aux._simhash_one(t) == simhash64(t), t


def test_ensure_caches_and_links(tmp_path, monkeypatch):
    monkeypatch.delenv("GRAFT_SKIP_AUX_FIXTURES", raising=False)
    p = aux.ensure_aux_fixture(SF, "rolling_fp")
    assert p is not None and os.path.exists(p)
    mtime = os.path.getmtime(p)
    assert aux.ensure_aux_fixture(SF, "rolling_fp") == p
    assert os.path.getmtime(p) == mtime  # cache hit
    assert os.path.realpath(aux.AUX_CURRENT) == os.path.realpath(
        os.path.dirname(p))
    monkeypatch.setenv("GRAFT_SKIP_AUX_FIXTURES", "1")
    assert aux.ensure_aux_fixture(SF, "rolling_fp") is None


# ---------------------------------------------------------------------------
# Independent image kernels (loop-style resize + RFC 2083 PNG pair)
# ---------------------------------------------------------------------------

def test_loop_bilinear_matches_engine_bitwise():
    from amazon_textract_transformer_pipeline_ray.functions.image_ops import (
        resize_bilinear)

    rng = np.random.default_rng(11)
    for (ih, iw), (oh, ow) in [((17, 23), (32, 32)), ((64, 16), (8, 40)),
                               ((32, 20), (32, 32)),   # height passthrough
                               ((5, 5), (7, 3))]:
        img = rng.integers(0, 256, (ih, iw, 3), dtype=np.uint8)
        assert np.array_equal(aux._bilinear_loop(img, ow, oh),
                              resize_bilinear(img, ow, oh)), (ih, iw, oh, ow)


def test_loop_png_pair_matches_engine_bytes_and_pixels():
    from amazon_textract_transformer_pipeline_ray.functions.png import (
        decode_png, encode_png)

    rng = np.random.default_rng(12)
    for c in (1, 3, 4):
        arr = rng.integers(0, 256, (13, 9, c), dtype=np.uint8)
        for ftype in range(5):
            eng = encode_png(arr, filter_type=ftype)
            ind = aux._png_encode_loop(arr, filter_type=ftype)
            assert eng == ind, (c, ftype)          # byte-identical streams
            assert np.array_equal(aux._png_decode_loop(eng), arr), (c, ftype)
            assert np.array_equal(decode_png(ind), arr), (c, ftype)

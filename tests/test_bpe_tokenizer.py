"""BPE tokenizer-training tests: hand-computed merges on crafted
corpora (overlap counting, tie-break order, greedy non-overlapping
application, early stop) plus engine-vs-independent-fixture parity on
the standard test corpus."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from amazon_textract_transformer_pipeline_ray.pipelines.tokenizer import (
    q_vocab_bpe_merges,
    train_bpe_merges,
)

SF0001 = "/root/testdata/sf0.001"


def _write_docs(tmp_path, texts):
    df = pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
        "lang": "en", "source": "t",
    })
    df["n_chars"] = df.text.str.len()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def _merges(words, counts, n):
    import numpy as np

    w = np.empty(len(words), dtype=object)
    w[:] = words
    return train_bpe_merges(w, np.asarray(counts, np.int64),
                            n_merges=n).to_pydict()


def test_overlapping_pair_counting():
    # "aaa" ×5: pair (a,a) counted twice per occurrence -> count 10.
    got = _merges(["aaa"], [5], 1)
    assert got["left"] == ["a"] and got["right"] == ["a"]
    assert got["pair_count"] == [10]
    assert got["merged"] == ["aa"]


def test_greedy_nonoverlap_application():
    # After merging (a,a), "aaaa" becomes (aa, aa) — NOT (aa, a, a) —
    # so merge 2 is (aa, aa), and "aaa" became (aa, a) giving (aa, a).
    got = _merges(["aaaa", "aaa"], [3, 2], 3)
    assert list(zip(got["left"], got["right"])) == [
        ("a", "a"),      # 3*3 + 2*2 = 13 overlapping pairs
        ("aa", "aa"),    # from "aaaa" -> (aa,aa): count 3
        ("aa", "a"),     # from "aaa" -> (aa,a): count 2
    ]
    assert got["pair_count"] == [13, 3, 2]


def test_tie_break_lexicographic():
    # "xy" and "xz" both count 4 -> (x,y) < (x,z) wins; then (x,z).
    got = _merges(["xy", "xz"], [4, 4], 2)
    assert list(zip(got["left"], got["right"])) == [("x", "y"), ("x", "z")]
    assert got["pair_count"] == [4, 4]


def test_early_stop_when_no_pairs():
    # Single-symbol word types only: zero merges learnable.
    got = _merges(["a", "b"], [9, 9], 8)
    assert got["merge_rank"] == []
    # One two-symbol type: exactly one merge then stop.
    got = _merges(["ab", "c"], [2, 7], 8)
    assert got["merge_rank"] == [1]
    assert got["merged"] == ["ab"]


def test_count_desc_priority():
    # (b,c) appears in "bc" ×10; (d,e) in "de" ×3 -> count order.
    got = _merges(["bc", "de"], [10, 3], 2)
    assert got["merged"] == ["bc", "de"]
    assert got["pair_count"] == [10, 3]


def test_pretokenizer_and_distributed_counting(ray_session, tmp_path):
    # BPE_PATTERN keeps the leading space with the following word, so
    # "to to" yields types "to" (first) and " to"; category changes
    # split ("ab12" -> "ab", "12").
    sf = _write_docs(tmp_path, ["low low low", "lower lower", "ab12"])
    got = q_vocab_bpe_merges(sf).to_pydict()
    # word types: "low"×1 " low"×2 "lower"×1 " lower"×1 "ab"×1 "12"×1.
    # (l,o) count = 1+2+1+1 = 5; (o,w) same; tie -> (l,o) first.
    assert list(zip(got["left"], got["right"]))[:2] == [
        ("l", "o"), ("lo", "w")]
    assert got["pair_count"][:2] == [5, 5]


def test_encode_crafted(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.tokenizer import (
        q_doc_bpe_encode)

    # Word types: "aa"×2, " aa"×2, " ab"×1.  Merge replay:
    #   1 (a,a)×4  2 (' ','aa')×2  3 (' ','a')×1 [tie: space < 'a']
    #   4 (' a','b')×1 — then no adjacent pairs remain (early stop
    # inside the 48-merge budget), so every type is one piece.
    sf = _write_docs(tmp_path, ["aa aa ab", "aa aa"])
    got = (q_doc_bpe_encode(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["n_pretokens"].tolist() == [3, 2]
    assert got["n_pieces"].tolist() == [3, 2]

    from amazon_textract_transformer_pipeline_ray.pipelines.tokenizer import (
        q_vocab_bpe_merges)

    merges = q_vocab_bpe_merges(sf).to_pydict()
    assert list(zip(merges["left"], merges["right"])) == [
        ("a", "a"), (" ", "aa"), (" ", "a"), (" a", "b")]
    assert merges["pair_count"] == [4, 2, 1, 1]


def test_encode_matches_independent_fixture(ray_session):
    from amazon_textract_transformer_pipeline_ray.oracle_fixture_aux import (
        _expected_bpe_encode)

    from amazon_textract_transformer_pipeline_ray.pipelines.tokenizer import (
        q_doc_bpe_encode)

    want = (_expected_bpe_encode(SF0001).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    got = (q_doc_bpe_encode(SF0001).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert len(want) > 0 and (want["n_pieces"] > 0).any()
    # merges compress: piece count strictly between 0 and char count
    pd.testing.assert_frame_equal(got, want)


def test_engine_matches_independent_fixture(ray_session):
    from amazon_textract_transformer_pipeline_ray.oracle_fixture_aux import (
        _expected_bpe_merges)

    want = _expected_bpe_merges(SF0001).to_pandas()
    got = q_vocab_bpe_merges(SF0001).to_pandas()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)


def test_piece_counts_crafted(ray_session, tmp_path):
    from amazon_textract_transformer_pipeline_ray.pipelines.tokenizer import (
        q_bpe_piece_counts)

    # same corpus as test_encode_crafted: after training, every word
    # type is one piece -> counts are the word-type occurrence counts.
    sf = _write_docs(tmp_path, ["aa aa ab", "aa aa"])
    got = (q_bpe_piece_counts(sf).to_pandas()
           .set_index("piece")["count"].to_dict())
    assert got == {"aa": 2, " aa": 2, " ab": 1}


def test_piece_counts_conserve_mass(ray_session):
    # total piece count == total n_pieces from the encode table
    from amazon_textract_transformer_pipeline_ray.pipelines.tokenizer import (
        q_bpe_piece_counts, q_doc_bpe_encode)

    total_pieces = int(q_doc_bpe_encode(SF0001).to_pandas()["n_pieces"].sum())
    counts = q_bpe_piece_counts(SF0001).to_pandas()
    assert int(counts["count"].sum()) == total_pieces
    assert (counts["count"] > 0).all()


def test_piece_counts_match_independent_fixture(ray_session):
    from amazon_textract_transformer_pipeline_ray.oracle_fixture_aux import (
        _expected_bpe_piece_counts)

    from amazon_textract_transformer_pipeline_ray.pipelines.tokenizer import (
        q_bpe_piece_counts)

    want = (_expected_bpe_piece_counts(SF0001).to_pandas()
            .sort_values("piece").reset_index(drop=True))
    got = (q_bpe_piece_counts(SF0001).to_pandas()
           .sort_values("piece").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

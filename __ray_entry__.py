"""Driver contract for the Ray-Data extraction engine.

``entry()`` runs the flagship per-turn extraction pipeline;
``queries()`` exposes every implemented operator/pipeline (SURVEY.md §2 +
the training-data ops suite); ``oracle_sql()`` covers EVERY query — plain
SQL over the raw tables where expressible, otherwise
``read_parquet``/``read_json`` over fixtures computed by independent
single-process reimplementations.  The driver owns the Ray session —
nothing here calls ``ray.init``/``ray.shutdown``.

Float convention: the Ray side and the SQL oracle compute every float
result through identical exact-integer intermediates (BIGINT cents for
2-decimal money columns, int counts for ratios) and identical division
expressions, so results are bit-identical — no rounding tolerance is
needed and distributed-summation associativity cannot flip the driver's
value hash.  Integer aggregates are CAST to BIGINT in SQL to match Arrow
int64.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_TRANSCRIPT_CACHE = "/tmp/attp_transcripts"


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.01


def _transcripts(sf_dir: str) -> list[str]:
    """Deterministic synthetic transcript corpus sized by sf (the
    BASELINE.json input_hint table; cached under /tmp)."""
    from amazon_textract_transformer_pipeline_ray.fixtures import write_transcripts

    sf = _sf_of(sf_dir)
    n_turns = max(2000, int(1_000_000 * sf))
    # Shard count sized so the read stage exposes parallelism well above
    # the largest bench CPU count AND at least matches the block-count
    # floor bench._init_ray requests (max(64, 8*CPUs) = 256 at 32 CPUs):
    # fewer input files than requested blocks makes Ray insert
    # SplitBlocks, which breaks read->map->write fusion (~2x the
    # extraction wall — measured when this corpus was 64 shards).
    n_shards = 8 if n_turns <= 20_000 else 256
    out = os.path.join(_TRANSCRIPT_CACHE, f"sf{sf:g}-n{n_turns}-s{n_shards}")
    return write_transcripts(out, n_turns, n_shards=n_shards)


def _oracle_fixtures(sf_dir: str) -> list[str]:
    """Corpus paths + guarantee that the independent-oracle expected
    tables exist and ``/tmp/attp_oracle/current`` points at them (the
    static paths the ``oracle_sql()`` strings read — see
    ``amazon_textract_transformer_pipeline_ray/oracle_fixture.py``)."""
    from amazon_textract_transformer_pipeline_ray.oracle_fixture import (
        ensure_fixtures)

    paths = _transcripts(sf_dir)
    ensure_fixtures(paths)
    return paths


# Scalar projection of the turns table for the driver's hash compare (the
# nested ``spans`` column is exposed row-wise by ``x_spans`` instead —
# nested list<struct> values do not survive the pandas/DuckDB hash round
# trip deterministically):
_TURN_SCALAR_COLS = ["conv_id", "turn_idx", "role", "extracted_text",
                     "boilerplate_ratio", "n_words", "n_spans",
                     "doc_confidence", "review_needed"]


def entry() -> Any:
    """Flagship: per-turn extraction over the sf0.001-scale transcript
    corpus; returns the turns Dataset (driver checks rows >= 0)."""
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_turns,
        read_transcripts,
    )

    ds = read_transcripts(_transcripts("/root/testdata/sf0.001"))
    return build_turns(ds, batch_size=256)


# ---------------------------------------------------------------------------
# Extraction queries (synthesized transcript input -> rows-only checks)
# ---------------------------------------------------------------------------

def _x_turns(sf_dir: str):
    """Per-turn extraction, scalar driver view (SQL-checked against the
    independent oracle's expected table)."""
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_turns, read_transcripts)

    return build_turns(read_transcripts(_oracle_fixtures(sf_dir)),
                       batch_size=256).select_columns(_TURN_SCALAR_COLS)


def _x_fields(sf_dir: str):
    """Per-field consolidation rows, scalar driver view (the nested
    ``values`` list is dropped for the hash compare; its winner/count
    summary columns remain)."""
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_turns, read_transcripts)

    return build_turns(read_transcripts(_oracle_fixtures(sf_dir)),
                       batch_size=256, emit="fields").select_columns(
        ["conv_id", "turn_idx", "field_name", "class_id", "value",
         "confidence", "num_detections", "num_detected_values",
         "sort_order", "optional", "review_needed"])


def _x_conversations(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_conversations, build_turns, read_transcripts)

    return build_conversations(
        build_turns(read_transcripts(_oracle_fixtures(sf_dir)),
                    batch_size=256))


def _x_spans(sf_dir: str):
    """Exploded span rows (one row per entity detection, every scalar
    span field) — zero-copy Arrow list flatten, no Python loop over rows.
    SQL-checked against the independent oracle's expected spans table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_turns, read_transcripts)

    def explode(batch: pa.Table) -> pa.Table:
        import numpy as np

        spans = batch.column("spans").combine_chunks()
        counts = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(spans)
        conv = np.repeat(
            batch.column("conv_id").to_numpy(zero_copy_only=False), counts)
        tix = np.repeat(batch.column("turn_idx").to_numpy(), counts)
        cols = {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(tix, pa.int32()),
        }
        for name in ("class_id", "class_name", "text", "raw_text", "start",
                     "end", "page", "x0", "y0", "x1", "y1", "confidence"):
            cols[name] = flat.field(name)
        return pa.table(cols)

    turns = build_turns(read_transcripts(_oracle_fixtures(sf_dir)),
                        batch_size=256)
    return turns.map_batches(explode, batch_format="pyarrow")


def _x_tool_stats(sf_dir: str):
    """Per-tool rollup over tool turns (exercises the full input schema:
    tool + ts columns; rows-only check)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_oracle_fixtures(sf_dir),
                         columns=["role", "tool", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["role"], "tool"))
        pre = pa.table({
            "tool": t.column("tool"),
            "n_chars": pc.utf8_length(t.column("text")),
        })
        g = (pa.TableGroupBy(pre, "tool")
             .aggregate([("n_chars", "count"), ("n_chars", "sum")]))
        # Explicit types so an all-filtered (empty) batch can't emit a
        # null-typed schema that breaks block unification downstream:
        return pa.table({
            "tool": g.column("tool").cast(pa.string()),
            "p_n": g.column("n_chars_count").cast(pa.int64()),
            "p_chars": g.column("n_chars_sum").cast(pa.int64()),
        })

    agg = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
           .groupby("tool").aggregate(
               Sum("p_n", alias_name="n_turns"),
               Sum("p_chars", alias_name="total_chars")))
    out = agg.to_pandas()
    out["mean_chars"] = out["total_chars"].to_numpy(
        ).astype(np.float64) / out["n_turns"].to_numpy().astype(np.float64)
    return out.sort_values("tool").reset_index(drop=True)


def _x_role_transitions(sf_dir: str):
    """Corpus-wide dialogue-structure rollup: counts of every
    (prev_role -> role) transition under stable turn ordering, with
    '<start>' as each conversation's entry state.  SQL-checked DIRECTLY
    against the RAW transcripts (window lag in DuckDB), fully
    independent of both implementations — the x_tool_stats gate class.

    One ``groupby(conv_id)`` exchange (the flagship's ordering
    exchange); each group emits its tiny per-conv transition counts,
    folded by a roles^2-sized final groupby — kernel in
    ``stages/conversation.py:role_transitions``."""
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.stages.conversation import (
        role_transitions)

    ds = rd.read_parquet(_oracle_fixtures(sf_dir),
                         columns=["conv_id", "turn_idx", "role"])
    return role_transitions(ds)


def _x_turn_latency(sf_dir: str):
    """Response-latency rollup per (prev_role -> role) transition —
    exact-integer microsecond gap count/sum/max under stable turn
    ordering; SQL-checked DIRECTLY against the RAW transcripts (window
    lag), like x_tool_stats/x_role_transitions.  Kernel:
    ``stages/conversation.py:turn_latency``."""
    import ray.data as rd

    from amazon_textract_transformer_pipeline_ray.stages.conversation import (
        turn_latency)

    ds = rd.read_parquet(_oracle_fixtures(sf_dir),
                         columns=["conv_id", "turn_idx", "role", "ts"])
    return turn_latency(ds)


def _x_turns_staged(sf_dir: str):
    """Two-stage variant: extraction with normalizers stripped, then the
    endpoint-shaped normalizer actor pool (stages/normalize.py) — the
    reference's separate seq2seq-normalizer service shape.  SQL-checked
    against a staged-specific expected table (doc confidence recomputed
    from f32 span confidences, the stage's recompute-from-table
    semantics)."""
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        read_transcripts)
    from amazon_textract_transformer_pipeline_ray.stages.normalize import (
        build_turns_staged)

    return build_turns_staged(read_transcripts(_oracle_fixtures(sf_dir)),
                              batch_size=256).select_columns(_TURN_SCALAR_COLS)


_WINDOW_SCALAR_COLS = ["conv_id", "turn_idx", "page", "window_idx",
                       "n_windows", "word_start", "word_end", "n_tokens"]


def _window_digest_view(ds, kind: str):
    """Scalar driver view of a training-window table: keep the window
    bookkeeping columns and replace the nested words/boxes/labels/mask
    columns with md5 digests (nested list values do not survive the
    driver's pandas/DuckDB hash round trip deterministically; the md5
    convention is shared with ``oracle_independent.oracle_training_views``
    so the digest compare still checks every nested value)."""
    import hashlib

    import pyarrow as pa

    def _md5_ints(vals) -> str:
        return hashlib.md5(
            ",".join(str(int(v)) for v in vals).encode()).hexdigest()

    def digest(batch: pa.Table) -> pa.Table:
        cols = {name: batch.column(name) for name in _WINDOW_SCALAR_COLS}
        cols["words_md5"] = pa.array(
            [hashlib.md5("\x00".join(w).encode("utf-8")).hexdigest()
             for w in batch.column("words").to_pylist()], pa.string())
        cols["boxes_md5"] = pa.array(
            [_md5_ints(v for b in bs for v in b)
             for bs in batch.column("boxes").to_pylist()], pa.string())
        if kind == "ner":
            cols["labels_md5"] = pa.array(
                [_md5_ints(l)
                 for l in batch.column("word_labels").to_pylist()],
                pa.string())
        else:
            masks = batch.column("mask_positions").to_pylist()
            cols["n_masked"] = pa.array([len(m) for m in masks],
                                        pa.int32())
            cols["mask_md5"] = pa.array([_md5_ints(m) for m in masks],
                                        pa.string())
        return pa.table(cols)

    return ds.map_batches(digest, batch_format="pyarrow", batch_size=1024)


def _x_training_examples(sf_dir: str):
    """Materialized training-example table (reference ner.py:278-335
    page-example prep chain: words[]/boxes[]/word_labels[] windows with
    split bookkeeping), digest driver view — SQL-checked against the
    independent oracle's expected window table."""
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        read_transcripts)
    from amazon_textract_transformer_pipeline_ray.pipelines.training import (
        build_training_examples)

    return _window_digest_view(
        build_training_examples(read_transcripts(_oracle_fixtures(sf_dir))),
        "ner")


def _x_task_mlm(sf_dir: str):
    """MLM-task window table via the task registry (reference
    data/__init__.py:22-51 dispatch), digest driver view — SQL-checked
    against the independent oracle's expected window+mask table."""
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        read_transcripts)
    from amazon_textract_transformer_pipeline_ray.pipelines.tasks import get_task

    return _window_digest_view(
        get_task("mlm", read_transcripts(_oracle_fixtures(sf_dir))), "mlm")


def _x_task_packed(sf_dir: str):
    """Greedy token-budget sequence packing of the training windows, one
    row per pack (training.py:build_packed_examples) — SQL-checked by
    replaying the greedy scan as a DuckDB recursive CTE over the
    INDEPENDENT window fixture (the packing logic is therefore verified
    against a second implementation in a different paradigm)."""
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        read_transcripts)
    from amazon_textract_transformer_pipeline_ray.pipelines.training import (
        build_packed_examples, build_training_examples)

    return build_packed_examples(
        build_training_examples(read_transcripts(_oracle_fixtures(sf_dir))))


def _x_task_seq2seq(sf_dir: str):
    """Seq2seq date-normalization pairs mined from date spans, deduped
    distributed (SQL-checked against the oracle's mined-pair table)."""
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        read_transcripts)
    from amazon_textract_transformer_pipeline_ray.pipelines.tasks import get_task

    return get_task("seq2seq", read_transcripts(_oracle_fixtures(sf_dir)))


def _x_eval_metrics(sf_dir: str):
    """Classifier-vs-gold evaluation (reference ner.py:338-417 metric
    definitions) as a one-row DataFrame — SQL-checked against the
    independent oracle's sequentially-computed metrics.  Ratio columns
    follow the repo's f32 driver convention: the engine sums per-example
    ratios in Ray block order, the oracle in corpus order (~1e-16 apart
    in f64, identical after the float32 cast)."""
    import numpy as np
    import pandas as pd

    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_eval_metrics, read_transcripts)

    m = build_eval_metrics(read_transcripts(_oracle_fixtures(sf_dir)))
    return pd.DataFrame([{
        "n_examples": m["n_examples"],
        "acc": np.float32(m["acc"]),
        "n_focus_examples": m["n_focus_examples"],
        "focus_acc": np.float32(m["focus_acc"]),
        "focus_else_acc_minus_one": np.float32(
            m["focus_else_acc_minus_one"]),
    }])


def _x_review_queue(sf_dir: str):
    """Confidence-gate routing: the turns the reference would send to an
    A2I human loop, as deterministic task inputs (SQL-checked against
    the oracle's expected review_queue table)."""
    from amazon_textract_transformer_pipeline_ray.pipelines.review import (
        q_review_queue_from_paths)

    return q_review_queue_from_paths(_oracle_fixtures(sf_dir))


def _x_post_review(sf_dir: str):
    """The merged post-review corpus (reference fn-review-callback
    consolidation): synthesized human answers reinjected over the
    extraction output.  SQL-checked — the closed-form answer rule is
    restated verbatim over the independent oracle's turns fixture."""
    from amazon_textract_transformer_pipeline_ray.pipelines.review import (
        q_post_review_from_paths)

    return q_post_review_from_paths(_oracle_fixtures(sf_dir))


def _aux(sf_dir: str, name: str) -> None:
    """Guarantee the independent-oracle expected table ``name`` exists
    for this corpus and ``/tmp/attp_oracle_aux/current`` points at it
    (static paths read by ``oracle_sql()`` — see
    ``amazon_textract_transformer_pipeline_ray/oracle_fixture_aux.py``)."""
    from amazon_textract_transformer_pipeline_ray.oracle_fixture_aux import (
        ensure_aux_fixture)

    ensure_aux_fixture(sf_dir, name)


def _w_doc_fingerprint_rolling(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import text

    _aux(sf_dir, "rolling_fp")
    return text.q_doc_fingerprint_rolling(sf_dir)


def _w_simhash(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import dedup

    _aux(sf_dir, "simhash")
    return dedup.q_simhash(sf_dir)


def _w_simhash_pairs(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import dedup

    _aux(sf_dir, "simhash_pairs")
    return dedup.q_simhash_pairs(sf_dir)


def _w_winnow_fingerprints(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import dedup

    _aux(sf_dir, "winnow")
    return dedup.q_winnow_fingerprints_exploded(sf_dir)


def _w_minhash_lsh_pairs(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import dedup

    _aux(sf_dir, "minhash_pairs")
    return dedup.q_minhash_lsh_pairs(sf_dir)


def _w_embedding_knn_lsh(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    _aux(sf_dir, "knn_lsh")
    return similarity.q_embedding_knn_lsh(sf_dir)


def _w_embedding_knn_ivf(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    _aux(sf_dir, "knn_ivf")
    return similarity.q_embedding_knn_ivf(sf_dir)


def _w_embedding_dup_pairs_lsh(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    _aux(sf_dir, "dup_pairs_lsh")
    return similarity.q_embedding_dup_pairs_lsh(sf_dir)


def _w_embedding_semdedup(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    _aux(sf_dir, "semdedup")
    return similarity.q_embedding_semdedup(sf_dir)


def _w_embedding_cluster_stats(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    _aux(sf_dir, "cluster_stats")
    return similarity.q_embedding_cluster_stats(sf_dir)


def _w_embedding_pca(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import similarity

    _aux(sf_dir, "pca")
    return similarity.q_embedding_pca(sf_dir)


def _w_vocab_bpe_merges(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import tokenizer

    _aux(sf_dir, "bpe_merges")
    return tokenizer.q_vocab_bpe_merges(sf_dir)


def _w_bpe_piece_counts(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import tokenizer

    _aux(sf_dir, "bpe_piece_counts")
    return tokenizer.q_bpe_piece_counts(sf_dir)


def _w_doc_bpe_encode(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import tokenizer

    _aux(sf_dir, "bpe_encode")
    return tokenizer.q_doc_bpe_encode(sf_dir)


def _w_media_features(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import multimodal

    _aux(sf_dir, "media_features")
    return multimodal.q_media_features(sf_dir)


def _w_media_wav_roundtrip(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import multimodal

    _aux(sf_dir, "media_wav")
    return multimodal.q_media_wav_roundtrip(sf_dir)


def _w_api_paged_blocks(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import api_ingest

    return api_ingest.q_api_paged_blocks(sf_dir)


def _w_media_frame_pipeline(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import multimodal

    _aux(sf_dir, "media_frames")
    return multimodal.q_media_frame_pipeline(sf_dir)


def _w_media_bundle_roundtrip(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import multimodal

    _aux(sf_dir, "media_bundle")
    return multimodal.q_media_bundle_roundtrip(sf_dir)


def _w_media_y4m_roundtrip(sf_dir: str):
    """Real-YUV4MPEG2 video pipeline (SQL-checked against an
    independent loop-style Y4M parse, oracle_fixture_aux.py)."""
    from amazon_textract_transformer_pipeline_ray.pipelines import multimodal

    _aux(sf_dir, "media_y4m")
    return multimodal.q_media_y4m_roundtrip(sf_dir)


def _w_media_png_roundtrip(sf_dir: str):
    from amazon_textract_transformer_pipeline_ray.pipelines import multimodal

    _aux(sf_dir, "media_png")
    return multimodal.q_media_png_roundtrip(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from amazon_textract_transformer_pipeline_ray.pipelines import (
        chunking,
        corpus,
        decontam,
        dedup,
        incremental,
        events,
        filtering,
        graph,
        index_build,
        multimodal,
        preprocess,
        relational,
        scoring,
        setops,
        similarity,
        text,
    )

    # NOTE on dict ORDER: the driver's correctness gate samples the FIRST
    # 50 entries. Rounds 1-3 always led with the same 50, so the dedup /
    # similarity / BPE / media / api suite never received a driver-side
    # CORRECTNESS row (it was value-checked only by the in-repo replica,
    # tests/test_queries_oracle_sql.py). Round 4 rotates the sample: four
    # flagship x_* sentinels stay up front, then the 46 queries the driver
    # has never externally hash-checked; everything green in
    # CORRECTNESS_r03.json moves behind the 50-boundary.
    return {
        # --- flagship extraction sentinels (driver-checked every round) ---
        "x_turns": _x_turns,
        "x_fields": _x_fields,
        "x_training_examples": _x_training_examples,
        "x_spans": _x_spans,
        # --- round-5 rotation (VERDICT r4 next-round item 1): the 11
        # queries with no driver-side CORRECTNESS row in ANY round. All
        # have oracle_sql() and pass the in-repo replica
        # (tests/test_queries_oracle_sql.py); seating them here closes
        # the driver-verification union at 109/109. ---
        "doc_length_quantiles_by_lang": text.q_doc_length_quantiles_by_lang,
        "doc_length_percentile": text.q_doc_length_percentile,
        "doc_lexical_diversity": text.q_doc_lexical_diversity,
        # SQL-checked (regexp_split/list_distinct restatement)
        "doc_normalize": text.q_doc_normalize,  # SQL-checked (shared
        # explicit trim charset + RE2 collapse both sides)
        "doc_dedup_normalized": text.q_doc_dedup_normalized,  # SQL-checked
        "doc_stats_rollup": text.q_doc_stats_rollup,  # SQL-checked
        # (GROUPING SETS oracle)
        "media_y4m_roundtrip": _w_media_y4m_roundtrip,  # SQL-checked
        "doc_decontaminate_bloom": decontam.q_doc_decontaminate_bloom,
        # SQL-checked (full Bloom restatement: md5-slice bit positions,
        # eval bitmap as a DISTINCT-pos set, all-K membership conjunction)
        "token_counts_cms": scoring.q_token_counts_cms,
        # SQL-checked (full Count-Min restatement: md5-slice counter
        # positions, bounded cell fold, min-over-rows estimate +
        # exact-recount guarantee columns)
        "doc_weighted_sample": corpus.q_doc_weighted_sample,
        # SQL-checked (Efraimidis-Spirakis ln(u)/w rank restated in SQL;
        # libm log both sides)
        "bigram_pmi": scoring.q_bigram_pmi,
        # SQL-checked (PMI rank via the transcendental-free monotone
        # transform n_xy/(n_x*n_y) — one IEEE division both sides)
        # --- round-4 rotation survivors (driver-green r4) ---
        # text/scoring/index suite
        "source_jaccard": setops.q_source_jaccard,  # SQL-checked
        # (DISTINCT-unnest self-join restatement; engine side is one
        # token-bucket shuffle folding source bitmasks)
        "doc_chunks": chunking.q_doc_chunks,  # SQL-checked (lateral
        # unnest(range) + substr window replay)
        "doc_pii_scrub": filtering.q_doc_pii_scrub,  # SQL-checked (RE2 both sides)
        "doc_gopher_quality": filtering.q_doc_gopher_quality,  # SQL-checked
        "doc_repetition": filtering.q_doc_repetition,  # SQL-checked
        "doc_lm_score": scoring.q_doc_lm_score,  # SQL-checked
        "doc_lm_score_shuffled": scoring.q_doc_lm_score_shuffled,  # SQL-checked
        "vocab_top": scoring.q_vocab_top,  # SQL-checked
        "doc_dsir_weights": scoring.q_doc_dsir_weights,  # SQL-checked
        "token_heavy_hitters": scoring.q_token_heavy_hitters,  # SQL-checked
        "token_postings": index_build.q_token_postings,  # SQL-checked
        "doc_tfidf_top_terms": index_build.q_doc_tfidf_top_terms,  # SQL-checked
        "bm25_scores": index_build.q_bm25_scores,  # SQL-checked
        "corpus_preprocess": preprocess.q_corpus_preprocess,  # SQL-checked
        # dedup suite (SQL-checked: DuckDB directly where expressible,
        # independent-oracle fixtures otherwise — oracle_fixture_aux.py)
        "jaccard_dup_pairs": dedup.q_jaccard_dup_pairs,
        "jaccard_dedup_clusters": graph.q_jaccard_dedup_clusters,
        "doc_pagerank": graph.q_doc_pagerank,  # SQL-checked (unrolled
        # integer fixed-point iterations — bit-exact, no float sums)
        "doc_dedup_near_corpus": graph.q_doc_dedup_near_corpus,
        "doc_dup_ngram_stats": dedup.q_doc_dup_ngram_stats,
        "doc_dedup_ngram_corpus": dedup.q_doc_dedup_ngram_corpus,
        "doc_decontaminate": decontam.q_doc_decontaminate,
        "doc_decontaminate_shuffled": decontam.q_doc_decontaminate_shuffled,
        "corpus_diff": incremental.q_corpus_diff,  # SQL-checked
        # (FULL OUTER JOIN restatement of the derived-v2 scenario)
        "doc_dedup_incremental": incremental.q_doc_dedup_incremental,
        # SQL-checked (two-run persisted-state scenario; the oracle is
        # the closed-form min-even-else-min-odd survivor rule)
        "minhash_lsh_pairs": _w_minhash_lsh_pairs,
        "simhash": _w_simhash,
        "simhash_pairs": _w_simhash_pairs,
        "winnow_fingerprints": _w_winnow_fingerprints,  # exploded driver view
        # similarity search
        "embedding_knn": similarity.q_embedding_knn,          # SQL-checked
        "embedding_dup_pairs": similarity.q_embedding_dup_pairs,  # SQL-checked
        "embedding_knn_lsh": _w_embedding_knn_lsh,  # SQL-checked (fixture)
        "embedding_knn_ivf": _w_embedding_knn_ivf,  # SQL-checked: the
        # coarse centroids are a bit-deterministic sample fit (shared as
        # spec, faiss-style); the fixture recomputes the whole probe
        # search single-process
        "embedding_dup_pairs_lsh": _w_embedding_dup_pairs_lsh,  # SQL-checked
        "embedding_semdedup": _w_embedding_semdedup,  # SQL-checked (fixture)
        "embedding_cluster_stats": _w_embedding_cluster_stats,  # SQL-checked
        # (fixture: loop-style per-pair np.dot recompute over the spec)
        # ==================== 50-entry driver boundary ====================
        # Everything below has a driver-green CORRECTNESS row from r3 or
        # r4; all remain value-checked every run by
        # tests/test_queries_oracle_sql.py.
        # --- displaced by the round-5 rotation (driver-green r4) ---
        "bpe_piece_counts": _w_bpe_piece_counts,  # SQL-checked
        # (fixture: unmemoized single-process recount)
        "doc_bpe_encode": _w_doc_bpe_encode,  # SQL-checked (fixture:
        # unmemoized rank-order replay per pre-token, single process)
        "vocab_bpe_merges": _w_vocab_bpe_merges,  # SQL-checked (fixture:
        # independent Counter-based Sennrich merge loop over the same
        # word-type counts — pipelines/tokenizer.py docstring has the
        # determinism spec)
        "embedding_pca": _w_embedding_pca,  # SQL-checked (fixture: the
        # integer moment sums are order-exact, so both sides derive the
        # identical covariance; projections recomputed per-row)
        # multimodal plumbing (images use the REAL PNG codec on the
        # png_roundtrip path, audio the REAL WAV codec on the
        # wav_roundtrip path, FAKE1 elsewhere; ALL SQL-checked via
        # independent fixtures: stdlib-wave WAV parse, per-pixel
        # loop-style bilinear resample, per-pixel RFC 2083 PNG
        # filter/unfilter — plus byte-equality pytest gates)
        "media_features": _w_media_features,  # SQL-checked (fixture)
        "media_frame_pipeline": _w_media_frame_pipeline,  # SQL-checked
        "media_bundle_roundtrip": _w_media_bundle_roundtrip,  # SQL-checked
        "media_png_roundtrip": _w_media_png_roundtrip,  # SQL-checked
        "media_wav_roundtrip": _w_media_wav_roundtrip,  # SQL-checked
        # external-API source (S5): paginated NextToken-linked chunk
        # files -> custom Datasource merge -> parser; oracle reads the
        # RAW unmerged chunks with DuckDB read_json
        "api_paged_blocks": _w_api_paged_blocks,  # SQL-checked
        "x_post_review": _x_post_review,  # SQL-checked (r4 driver-green)
        # --- extraction (remaining x_*; driver-green r3) ---
        "x_conversations": _x_conversations,
        "x_turns_staged": _x_turns_staged,
        "x_task_mlm": _x_task_mlm,
        "x_task_seq2seq": _x_task_seq2seq,
        "x_task_packed": _x_task_packed,
        "x_eval_metrics": _x_eval_metrics,
        "x_tool_stats": _x_tool_stats,
        "x_role_transitions": _x_role_transitions,
        "x_turn_latency": _x_turn_latency,
        "x_review_queue": _x_review_queue,
        # --- relational (TPC-H-ish; SQL-checked) ---
        "pricing_summary": relational.q_pricing_summary,
        "orders_by_priority": relational.q_orders_by_priority,
        "top_parts_by_revenue": relational.q_top_parts_by_revenue,
        "nation_supplier_revenue": relational.q_nation_supplier_revenue,
        "top_customers": relational.q_top_customers,
        "orders_lineitem_join": relational.q_orders_lineitem_join,
        "customers_with_open_orders": relational.q_customers_with_open_orders,
        "customers_without_orders": relational.q_customers_without_orders,
        "orders_rank_per_customer": relational.q_orders_rank_per_customer,
        # --- events / stream-shaped (SQL-checked) ---
        "events_hourly": events.q_events_hourly,
        "events_sessionize": events.q_events_sessionize,
        "events_asof_orders": events.q_events_asof_orders,
        "events_asof_orders_bucketed": events.q_events_asof_orders_bucketed,
        "events_top_users": events.q_events_top_users,
        "events_type_stats": events.q_events_type_stats,
        "events_sliding_window": events.q_events_sliding_window,
        "events_hll_users": events.q_events_hll_users,  # SQL-checked
        "events_range_join_orders": events.q_events_range_join_orders,
        "events_funnel": events.q_events_funnel,
        "events_cohort_retention": events.q_events_cohort_retention,
        "events_user_gaps": events.q_events_user_gaps,
        "events_daily_moving_avg": events.q_events_daily_moving_avg,
        # SQL-checked (ROWS 6 PRECEDING window over the daily reduction)
        "events_daily_zscore": events.q_events_daily_zscore,
        # SQL-checked (explicit sum/sumsq formula, not stddev_samp —
        # identical f64 op chain both sides)
        # (the whole sketch is restated in SQL — md5 registers, harmonic
        # mean, linear-counting branch)
        # --- corpus management (SQL-checked) ---
        "doc_train_test_split": corpus.q_doc_train_test_split,
        "doc_sample_stratified": corpus.q_doc_sample_stratified,
        "doc_domain_mix": corpus.q_doc_domain_mix,  # SQL-checked
        "doc_sample_k": corpus.q_doc_sample_k,  # SQL-checked
        "doc_cap_per_lang": corpus.q_doc_cap_per_lang,  # SQL-checked
        # (row_number PARTITION BY oracle; combiner-first shuffle)
        "activity_union": corpus.q_activity_union,
        # --- text analysis (SQL-checked unless noted) ---
        "doc_stats_by_lang": text.q_doc_stats_by_lang,
        "token_totals": text.q_token_totals,
        "token_totals_bpe": text.q_token_totals_bpe,
        "doc_fingerprint": text.q_doc_fingerprint,
        "doc_fingerprint_rolling": _w_doc_fingerprint_rolling,  # SQL-checked
        # (independent-oracle fixture)
        "doc_dedup_exact": text.q_doc_dedup_exact,
        "doc_quality": text.q_doc_quality,
        "doc_length_quantiles": text.q_doc_length_quantiles,
        "doc_langid": text.q_doc_langid,  # SQL-checked (trigram counts in SQL)
    }


def _hll_users_sql() -> str:
    from amazon_textract_transformer_pipeline_ray.pipelines.events import (
        HLL_USERS_SQL)

    return HLL_USERS_SQL


def _paged_sql() -> str:
    from amazon_textract_transformer_pipeline_ray.pipelines.api_ingest import (
        api_paged_blocks_sql)

    return api_paged_blocks_sql()


def _langid_sql() -> str:
    """DuckDB restatement of pipelines/text.py:LangId — per-language
    profile-trigram occurrence counts (replace-length arithmetic counts
    non-overlapping matches, exactly like ``str.count``), winner = first
    language in code order reaching the (positive) maximum."""
    from amazon_textract_transformer_pipeline_ray.pipelines.text import (
        _LANG_PROFILES)

    langs = sorted(_LANG_PROFILES)
    scores = []
    for lang in langs:
        terms = " + ".join(
            f"(length(t) - length(replace(t, '{g}', ''))) / {len(g)}"
            for g in _LANG_PROFILES[lang])
        scores.append(f"{terms} AS s_{lang}")
    greatest = "GREATEST(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    whens = "\n                ".join(
        f"WHEN s_{lang} = m THEN '{lang}'" for lang in langs[:-1])
    score_list = ",\n                   ".join(scores)
    return f"""
        WITH lowered AS (SELECT doc_id, lower(text) AS t FROM documents),
        scored AS (
            SELECT doc_id,
                   {score_list}
            FROM lowered),
        winners AS (SELECT doc_id, {greatest} AS m, * FROM scored)
        SELECT doc_id,
               CASE WHEN m <= 0 THEN 'und'
                {whens}
                ELSE '{langs[-1]}' END AS pred_lang
        FROM winners
    """


def _sql_registry() -> dict[str, str]:
    # Exact-arithmetic convention: money columns are 2-decimal values, so
    # sums run over BIGINT cents (or cents x percent) and final doubles are
    # produced by the same division expressions the Ray side uses —
    # bit-identical results with no rounding tolerance needed.
    cents = "CAST(ROUND({col} * 100) AS BIGINT)"
    rev_cp = ("CAST(ROUND(l_extendedprice * 100) AS BIGINT) * "
              "CAST(ROUND((1 - l_discount) * 100) AS BIGINT)")
    stop_list = ", ".join(
        f"'{w}'" for w in
        ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with"))
    # PII patterns shared verbatim with the engine (both sides run RE2):
    from amazon_textract_transformer_pipeline_ray.pipelines.filtering import (
        PII_EMAIL, PII_IPV4, PII_PHONE)
    from amazon_textract_transformer_pipeline_ray.pipelines.decontam import (
        DECONTAM_BLOOM_SQL, DECONTAM_SQL)
    from amazon_textract_transformer_pipeline_ray.pipelines.corpus import (
        CAP_PER_LANG_SQL, DOMAIN_MIX_SQL, SAMPLE_K_SQL, WEIGHTED_SAMPLE_SQL)
    from amazon_textract_transformer_pipeline_ray.pipelines.scoring import (
        BIGRAM_PMI_SQL, DSIR_SQL, HEAVY_HITTERS_SQL, LM_SCORE_SQL,
        TOKEN_CMS_SQL, VOCAB_TOP_SQL)
    from amazon_textract_transformer_pipeline_ray.pipelines.preprocess import (
        CORPUS_PREPROCESS_SQL)
    from amazon_textract_transformer_pipeline_ray.pipelines.index_build import (
        BM25_SQL, POSTINGS_SQL, TFIDF_SQL)
    from amazon_textract_transformer_pipeline_ray.pipelines.events import (
        COHORT_SQL, DAILY_MA_SQL, DAILY_ZSCORE_SQL, FUNNEL_SQL,
        USER_GAPS_SQL)
    from amazon_textract_transformer_pipeline_ray.pipelines.text import (
        DOC_DEDUP_NORMALIZED_SQL, DOC_NORMALIZE_SQL, LENGTH_PCT_SQL,
        LEXICAL_DIVERSITY_SQL, STATS_ROLLUP_SQL)
    from amazon_textract_transformer_pipeline_ray.pipelines.chunking import (
        DOC_CHUNKS_SQL)
    from amazon_textract_transformer_pipeline_ray.pipelines.incremental import (
        CORPUS_DIFF_SQL, DEDUP_INCREMENTAL_SQL)
    from amazon_textract_transformer_pipeline_ray.pipelines.setops import (
        SOURCE_JACCARD_SQL)
    from amazon_textract_transformer_pipeline_ray.pipelines.graph import (
        pagerank_sql)
    # Extraction-table oracles: DuckDB reads the INDEPENDENT oracle's
    # expected tables (oracle_fixture.py) via stable symlinks the x_*
    # queries re-point before running.  x_tool_stats is the exception —
    # it is computed by DuckDB from the raw INPUT transcripts, fully
    # independent of both implementations.
    fix = "read_parquet('/tmp/attp_oracle/current/{name}.parquet')"
    x_sql = {
        "x_turns": f"SELECT * FROM {fix.format(name='turns')}",
        "x_turns_staged":
            f"SELECT * FROM {fix.format(name='turns_staged')}",
        "x_spans": f"SELECT * FROM {fix.format(name='spans')}",
        "x_fields": f"SELECT * FROM {fix.format(name='fields')}",
        "x_conversations":
            f"SELECT * FROM {fix.format(name='conversations')}",
        "x_task_seq2seq": f"""
            SELECT source, target, n_occurrences
            FROM {fix.format(name='seq2seq')}
        """,
        "x_review_queue":
            f"SELECT * FROM {fix.format(name='review_queue')}",
        # The post-review merge restated over the INDEPENDENT turns
        # fixture: the synthesized-answer rule (corrected iff first hex
        # digit of md5("conv:turn") < '8', correction = prefix concat)
        # is closed-form, so the whole consolidation is one SQL join —
        # see pipelines/review.py synthesize_review_results:
        "x_post_review": f"""
            WITH t AS (SELECT * FROM {fix.format(name='turns')}),
            r AS (SELECT conv_id, turn_idx,
                         substr(md5(conv_id || ':'
                                    || CAST(turn_idx AS VARCHAR)), 1, 1)
                             < '8' AS corrected
                  FROM t WHERE review_needed)
            SELECT t.conv_id, t.turn_idx, t.role,
                   CASE WHEN r.corrected
                        THEN '[human] ' || t.extracted_text
                        ELSE t.extracted_text END AS extracted_text,
                   CASE WHEN r.conv_id IS NOT NULL THEN CAST(1.0 AS REAL)
                        ELSE t.doc_confidence END AS doc_confidence,
                   CASE WHEN r.conv_id IS NOT NULL THEN FALSE
                        ELSE t.review_needed END AS review_needed,
                   CASE WHEN r.conv_id IS NULL THEN 'auto'
                        WHEN r.corrected THEN 'corrected'
                        ELSE 'confirmed' END AS review_status
            FROM t LEFT JOIN r USING (conv_id, turn_idx)
        """,
        "x_training_examples":
            f"SELECT * FROM {fix.format(name='training')}",
        "x_task_mlm": f"SELECT * FROM {fix.format(name='mlm')}",
        # Greedy packing replayed as a recursive scan over the
        # INDEPENDENT window fixture (per-conv row recursion; depth =
        # max windows per conversation):
        "x_task_packed": f"""
            WITH RECURSIVE w AS (
                SELECT conv_id, turn_idx, page, window_idx, n_tokens,
                       ROW_NUMBER() OVER (
                           PARTITION BY conv_id
                           ORDER BY turn_idx, page, window_idx) AS rn
                FROM {fix.format(name='training')}),
            acc AS (
                SELECT conv_id, rn, turn_idx, page, window_idx, n_tokens,
                       CAST(n_tokens AS BIGINT) AS cum, 0 AS pack
                FROM w WHERE rn = 1
                UNION ALL
                SELECT w.conv_id, w.rn, w.turn_idx, w.page, w.window_idx,
                       w.n_tokens,
                       CASE WHEN a.cum + w.n_tokens > 512
                            THEN CAST(w.n_tokens AS BIGINT)
                            ELSE a.cum + w.n_tokens END,
                       CASE WHEN a.cum + w.n_tokens > 512
                            THEN a.pack + 1 ELSE a.pack END
                FROM acc a JOIN w
                    ON w.conv_id = a.conv_id AND w.rn = a.rn + 1)
            SELECT conv_id, CAST(pack AS INT) AS pack_idx,
                   CAST(COUNT(*) AS INT) AS n_windows,
                   CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(CAST(SUM(n_tokens) AS DOUBLE) / 512 AS REAL)
                       AS fill_ratio,
                   md5(string_agg(turn_idx || ':' || page || ':'
                                      || window_idx,
                                  ',' ORDER BY rn)) AS window_md5
            FROM acc GROUP BY conv_id, pack
        """,
        "x_eval_metrics":
            f"SELECT * FROM {fix.format(name='eval_metrics')}",
        "x_tool_stats": """
            SELECT tool,
                   CAST(COUNT(*) AS BIGINT) AS n_turns,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars,
                   CAST(SUM(length(text)) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS mean_chars
            FROM read_parquet('/tmp/attp_transcripts/current/*.parquet')
            WHERE role = 'tool'
            GROUP BY tool
        """,
        "x_role_transitions": """
            WITH t AS (
                SELECT role,
                       lag(role, 1, '<start>') OVER (
                           PARTITION BY conv_id ORDER BY turn_idx)
                           AS prev_role
                FROM read_parquet(
                    '/tmp/attp_transcripts/current/*.parquet'))
            SELECT prev_role, role, CAST(COUNT(*) AS BIGINT) AS n
            FROM t GROUP BY prev_role, role
        """,
        "x_turn_latency": """
            WITH t AS (
                SELECT role,
                       lag(role) OVER w AS prev_role,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
                FROM read_parquet(
                    '/tmp/attp_transcripts/current/*.parquet')
                WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
            SELECT prev_role, role,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(gap) AS BIGINT) AS sum_gap_us,
                   CAST(MAX(gap) AS BIGINT) AS max_gap_us
            FROM t WHERE prev_role IS NOT NULL
            GROUP BY prev_role, role
        """,
    }
    # Deterministic dedup/similarity queries: DuckDB reads the INDEPENDENT
    # single-process implementation's expected tables (oracle_fixture_aux.py)
    # via the stable symlink the wrapped queries re-point before running.
    aux = "read_parquet('/tmp/attp_oracle_aux/current/{name}.parquet')"
    aux_sql = {
        "doc_fingerprint_rolling":
            f"SELECT * FROM {aux.format(name='rolling_fp')}",
        "simhash": f"SELECT * FROM {aux.format(name='simhash')}",
        "simhash_pairs": f"SELECT * FROM {aux.format(name='simhash_pairs')}",
        "winnow_fingerprints": f"SELECT * FROM {aux.format(name='winnow')}",
        "minhash_lsh_pairs":
            f"SELECT * FROM {aux.format(name='minhash_pairs')}",
        "embedding_knn_lsh": f"SELECT * FROM {aux.format(name='knn_lsh')}",
        "embedding_knn_ivf": f"SELECT * FROM {aux.format(name='knn_ivf')}",
        "embedding_dup_pairs_lsh":
            f"SELECT * FROM {aux.format(name='dup_pairs_lsh')}",
        "embedding_semdedup": f"SELECT * FROM {aux.format(name='semdedup')}",
        "embedding_cluster_stats":
            f"SELECT * FROM {aux.format(name='cluster_stats')}",
        "embedding_pca": f"SELECT * FROM {aux.format(name='pca')}",
        "vocab_bpe_merges":
            f"SELECT * FROM {aux.format(name='bpe_merges')}",
        "doc_bpe_encode":
            f"SELECT * FROM {aux.format(name='bpe_encode')}",
        "bpe_piece_counts":
            f"SELECT * FROM {aux.format(name='bpe_piece_counts')}",
        "media_features":
            f"SELECT * FROM {aux.format(name='media_features')}",
        "media_wav_roundtrip":
            f"SELECT * FROM {aux.format(name='media_wav')}",
        "media_y4m_roundtrip":
            f"SELECT * FROM {aux.format(name='media_y4m')}",
        "media_frame_pipeline":
            f"SELECT * FROM {aux.format(name='media_frames')}",
        "media_bundle_roundtrip":
            f"SELECT * FROM {aux.format(name='media_bundle')}",
        "media_png_roundtrip":
            f"SELECT * FROM {aux.format(name='media_png')}",
        "api_paged_blocks": _paged_sql(),
        # Language ID is directly SQL-expressible: non-overlapping
        # occurrence counts via replace-length arithmetic, argmax with
        # the engine's exact tie order (language codes ascending, 'und'
        # when every score is zero):
        "doc_langid": _langid_sql(),
    }
    return {
        **x_sql,
        **aux_sql,
        "pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM({cents.format(col='l_extendedprice')}) AS DOUBLE)
                       / 100.0 AS sum_base_price,
                   CAST(SUM({rev_cp}) AS DOUBLE) / 10000.0 AS sum_disc_price,
                   CAST(COUNT(*) AS BIGINT) AS count_order,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
                   (CAST(SUM({cents.format(col='l_extendedprice')}) AS DOUBLE)
                       / 100.0) / CAST(COUNT(*) AS DOUBLE) AS avg_price
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "orders_by_priority": f"""
            SELECT o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   (CAST(SUM({cents.format(col='o_totalprice')}) AS DOUBLE)
                       / 100.0) / CAST(COUNT(*) AS DOUBLE) AS avg_price,
                   MIN(o_totalprice) AS min_price,
                   MAX(o_totalprice) AS max_price
            FROM orders GROUP BY o_orderpriority
        """,
        "top_parts_by_revenue": f"""
            SELECT l.l_partkey, p.p_name,
                   CAST(SUM({rev_cp}) AS DOUBLE) / 10000.0 AS revenue
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            GROUP BY l.l_partkey, p.p_name
            ORDER BY SUM({rev_cp}) DESC, l.l_partkey
            LIMIT 10
        """,
        "nation_supplier_revenue": f"""
            SELECT n.n_name,
                   CAST(SUM({rev_cp}) AS DOUBLE) / 10000.0 AS revenue
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            GROUP BY n.n_name
        """,
        "top_customers": f"""
            SELECT o.o_custkey, c.c_name, n.n_name,
                   CAST(SUM({cents.format(col='o.o_totalprice')}) AS DOUBLE)
                       / 100.0 AS total_spend,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders o
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n ON n.n_nationkey = c.c_nationkey
            GROUP BY o.o_custkey, c.c_name, n.n_name
            ORDER BY SUM({cents.format(col='o.o_totalprice')}) DESC, o.o_custkey
            LIMIT 10
        """,
        "orders_lineitem_join": f"""
            SELECT o.o_orderstatus,
                   CAST(SUM({rev_cp}) AS DOUBLE) / 10000.0 AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderstatus
        """,
        "customers_with_open_orders": """
            SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'O')
            GROUP BY c.c_mktsegment
        """,
        "customers_without_orders": """
            SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey)
            GROUP BY c.c_nationkey
        """,
        "orders_rank_per_customer": """
            WITH r AS (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rnk
                FROM orders)
            SELECT o_custkey, CAST(rnk AS BIGINT) AS rnk,
                   o_orderkey, o_totalprice
            FROM r WHERE rnk <= 3
        """,
        "events_range_join_orders": f"""
            SELECT o.o_orderkey,
                   CAST(COUNT(e.user_id) AS BIGINT) AS n_events,
                   CAST(COALESCE(SUM({cents.format(col='e.value')}), 0)
                        AS DOUBLE) / 100.0 AS sum_value
            FROM orders o LEFT JOIN events e
              ON e.user_id = o.o_custkey
             AND e.ts >= o.o_orderdate
             AND e.ts < o.o_orderdate + INTERVAL 7 DAY
            GROUP BY o.o_orderkey
        """,
        "events_hourly": f"""
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM({cents.format(col='value')}) AS DOUBLE)
                       / 100.0 AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_sessionize": """
            WITH g AS (
                SELECT user_id,
                       CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events)
            SELECT user_id,
                   CAST(1 + SUM(brk) AS BIGINT) AS n_sessions,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM g GROUP BY user_id
        """,
        "events_asof_orders": f"""
            WITH o1 AS (
                SELECT o_custkey, o_orderdate, MAX(o_totalprice) AS o_totalprice
                FROM orders GROUP BY o_custkey, o_orderdate),
            m AS (
                SELECT e.event_type, o.o_totalprice
                FROM events e ASOF LEFT JOIN o1 o
                  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate)
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(o_totalprice) AS BIGINT) AS n_matched,
                   CASE WHEN COUNT(o_totalprice) = 0 THEN NULL
                        ELSE (CAST(SUM({cents.format(col='o_totalprice')})
                                   AS DOUBLE) / 100.0)
                             / CAST(COUNT(o_totalprice) AS DOUBLE)
                   END AS avg_matched_price
            FROM m GROUP BY event_type
        """,
        "events_asof_orders_bucketed": f"""
            WITH o1 AS (
                SELECT o_custkey, o_orderdate, MAX(o_totalprice) AS o_totalprice
                FROM orders GROUP BY o_custkey, o_orderdate),
            m AS (
                SELECT e.event_type, o.o_totalprice
                FROM events e ASOF LEFT JOIN o1 o
                  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate)
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(o_totalprice) AS BIGINT) AS n_matched,
                   CASE WHEN COUNT(o_totalprice) = 0 THEN NULL
                        ELSE (CAST(SUM({cents.format(col='o_totalprice')})
                                   AS DOUBLE) / 100.0)
                             / CAST(COUNT(o_totalprice) AS DOUBLE)
                   END AS avg_matched_price
            FROM m GROUP BY event_type
        """,
        "events_top_users": f"""
            SELECT user_id,
                   CAST(SUM({cents.format(col='value')}) AS DOUBLE)
                       / 100.0 AS total_value,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
            ORDER BY SUM({cents.format(col='value')}) DESC, user_id LIMIT 20
        """,
        "events_type_stats": f"""
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   (CAST(SUM({cents.format(col='value')}) AS DOUBLE) / 100.0)
                       / CAST(COUNT(*) AS DOUBLE) AS avg_value
            FROM events GROUP BY event_type
        """,
        "doc_stats_by_lang": """
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS avg_chars,
                   CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                            END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                       AS avg_tokens
            FROM documents GROUP BY lang
        """,
        "token_totals": """
            SELECT CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                           ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                           END) AS BIGINT) AS total_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents
        """,
        "doc_fingerprint": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "doc_length_quantiles": """
            WITH a AS (
                SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9, 0.99])
                    AS vs
                FROM documents)
            SELECT unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
                   unnest(vs) AS value
            FROM a
        """,
        "doc_length_quantiles_by_lang": """
            WITH a AS (
                SELECT lang,
                       quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9, 0.99])
                    AS vs
                FROM documents GROUP BY lang)
            SELECT lang, unnest([0.25, 0.5, 0.75, 0.9, 0.99]) AS q,
                   unnest(vs) AS value
            FROM a
        """,
        "token_totals_bpe": """
            SELECT lang,
                   CAST(SUM(len(regexp_extract_all(text,
                       ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+'))) AS BIGINT)
                       AS total_pieces,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang
        """,
        "doc_dedup_exact": """
            SELECT CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_copies
            FROM documents GROUP BY md5(text)
        """,
        "doc_quality": f"""
            WITH t AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS toks
                FROM documents)
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                       CAST(len(list_filter(toks, x -> x IN ({stop_list})))
                            AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                   END AS stopword_ratio,
                   CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                       CAST(list_aggregate(list_transform(toks, x -> length(x)),
                                           'sum') AS DOUBLE)
                           / CAST(len(toks) AS DOUBLE)
                   END AS mean_token_len
            FROM t
        """,
        "doc_pii_scrub": f"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{PII_EMAIL}'))
                        AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(text, '{PII_IPV4}'))
                        AS BIGINT) AS n_ips,
                   CAST(len(regexp_extract_all(text, '{PII_PHONE}'))
                        AS BIGINT) AS n_phones,
                   CAST(len(regexp_extract_all(text, '{PII_EMAIL}'))
                        + len(regexp_extract_all(text, '{PII_IPV4}'))
                        + len(regexp_extract_all(text, '{PII_PHONE}'))
                        AS BIGINT) AS pii_total,
                   md5(regexp_replace(regexp_replace(regexp_replace(
                       text, '{PII_EMAIL}', '[EMAIL]', 'g'),
                       '{PII_IPV4}', '[IP]', 'g'),
                       '{PII_PHONE}', '[PHONE]', 'g')) AS scrub_md5
            FROM documents
        """,
        "doc_gopher_quality": """
            WITH t AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                            ELSE regexp_split_to_array(trim(text), '\\s+')
                       END AS toks
                FROM documents),
            w AS (SELECT doc_id, unnest(toks) AS w FROM t),
            wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
            wtop AS (SELECT doc_id, MAX(c) AS top_w, COUNT(*) AS uniq
                     FROM wc GROUP BY 1),
            bg AS (SELECT doc_id,
                          unnest(list_transform(
                              generate_series(1, len(toks) - 1),
                              i -> toks[i] || chr(1) || toks[i + 1])) AS b
                   FROM t WHERE len(toks) >= 2),
            bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
            btop AS (SELECT doc_id, MAX(c) AS top_b FROM bc GROUP BY 1),
            sig AS (
                SELECT t.doc_id,
                       CAST(len(toks) AS BIGINT) AS n_words,
                       CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                           CAST(list_aggregate(list_transform(toks,
                                    x -> length(x)), 'sum') AS DOUBLE)
                               / CAST(len(toks) AS DOUBLE)
                       END AS mean_word_len,
                       CAST(COALESCE(wtop.uniq, 0) AS BIGINT)
                           AS n_unique_words,
                       CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                           CAST(COALESCE(wtop.uniq, 0) AS DOUBLE)
                               / CAST(len(toks) AS DOUBLE)
                       END AS type_token_ratio,
                       CASE WHEN len(toks) = 0 THEN 0.0 ELSE
                           CAST(COALESCE(wtop.top_w, 0) AS DOUBLE)
                               / CAST(len(toks) AS DOUBLE)
                       END AS top_word_frac,
                       CASE WHEN len(toks) < 2 THEN 0.0 ELSE
                           CAST(COALESCE(btop.top_b, 0) AS DOUBLE)
                               / CAST(len(toks) - 1 AS DOUBLE)
                       END AS top_bigram_frac
                FROM t
                LEFT JOIN wtop ON wtop.doc_id = t.doc_id
                LEFT JOIN btop ON btop.doc_id = t.doc_id)
            SELECT *,
                   CAST(n_words BETWEEN 50 AND 100000
                        AND mean_word_len BETWEEN 3.0 AND 10.0
                        AND top_word_frac <= 0.20
                        AND top_bigram_frac <= 0.10 AS BIGINT) AS keep
            FROM sig
        """,
        # Gopher repetition signals: exact-string n-grams; every output
        # fraction is an int/int DOUBLE division, bit-identical to the
        # engine's numpy math (no f32 rounding needed).
        "doc_repetition": r"""
            WITH tok AS (
                SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
                FROM documents WHERE trim(text) <> ''),
            base AS (SELECT doc_id, len(ts) AS nt,
                            length(array_to_string(ts, ' ')) AS tc
                     FROM tok),
            g2 AS (SELECT t.doc_id, array_to_string(t.ts[r.i:r.i+1], ' ') AS g
                   FROM tok t, unnest(range(1, len(t.ts))) AS r(i)),
            t2 AS (SELECT doc_id, MAX(c * length(g)) AS m FROM
                       (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2)
                   GROUP BY doc_id),
            g3 AS (SELECT t.doc_id, array_to_string(t.ts[r.i:r.i+2], ' ') AS g
                   FROM tok t, unnest(range(1, len(t.ts) - 1)) AS r(i)),
            t3 AS (SELECT doc_id, MAX(c * length(g)) AS m FROM
                       (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY 1, 2)
                   GROUP BY doc_id),
            g4 AS (SELECT t.doc_id, array_to_string(t.ts[r.i:r.i+3], ' ') AS g
                   FROM tok t, unnest(range(1, len(t.ts) - 2)) AS r(i)),
            t4 AS (SELECT doc_id, MAX(c * length(g)) AS m FROM
                       (SELECT doc_id, g, COUNT(*) AS c FROM g4 GROUP BY 1, 2)
                   GROUP BY doc_id),
            gd AS (SELECT t.doc_id, r.i AS p,
                          array_to_string(t.ts[r.i:r.i+2], ' ') AS g
                   FROM tok t, unnest(range(1, len(t.ts) - 1)) AS r(i)),
            dd AS (SELECT doc_id, g FROM gd GROUP BY doc_id, g
                   HAVING COUNT(*) >= 2),
            cov AS (SELECT DISTINCT gd.doc_id, gd.p + o.j AS tp
                    FROM gd JOIN dd USING (doc_id, g),
                         unnest(range(0, 3)) AS o(j)),
            c5 AS (SELECT doc_id, COUNT(*) AS c FROM cov GROUP BY doc_id)
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                   CAST(COALESCE(b.nt, 0) AS BIGINT) AS n_tokens,
                   CASE WHEN COALESCE(b.tc, 0) > 0
                        THEN CAST(COALESCE(t2.m, 0) AS DOUBLE) / b.tc
                        ELSE 0.0 END AS top2_char_frac,
                   CASE WHEN COALESCE(b.tc, 0) > 0
                        THEN CAST(COALESCE(t3.m, 0) AS DOUBLE) / b.tc
                        ELSE 0.0 END AS top3_char_frac,
                   CASE WHEN COALESCE(b.tc, 0) > 0
                        THEN CAST(COALESCE(t4.m, 0) AS DOUBLE) / b.tc
                        ELSE 0.0 END AS top4_char_frac,
                   CASE WHEN COALESCE(b.nt, 0) > 0
                        THEN CAST(COALESCE(c5.c, 0) AS DOUBLE) / b.nt
                        ELSE 0.0 END AS dup3_tok_frac
            FROM documents d
            LEFT JOIN base b USING (doc_id)
            LEFT JOIN t2 USING (doc_id)
            LEFT JOIN t3 USING (doc_id)
            LEFT JOIN t4 USING (doc_id)
            LEFT JOIN c5 USING (doc_id)
        """,
        "jaccard_dup_pairs": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(list_distinct(regexp_split_to_array(trim(text),
                                                                  '\\s+'))) AS w
                FROM documents WHERE trim(text) <> ''),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared
                FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
            SELECT i.da AS doc_id_a, i.db AS doc_id_b,
                   CAST(i.shared AS DOUBLE)
                       / CAST(sa.n + sb.n - i.shared AS DOUBLE) AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.da
            JOIN sizes sb ON sb.doc_id = i.db
            WHERE CAST(i.shared AS DOUBLE)
                      / CAST(sa.n + sb.n - i.shared AS DOUBLE) >= 0.9
        """,
        "jaccard_dedup_clusters": """
            WITH RECURSIVE tok AS (
                SELECT doc_id,
                       unnest(list_distinct(regexp_split_to_array(trim(text),
                                                                  '\\s+'))) AS w
                FROM documents WHERE trim(text) <> ''),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared
                FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            pairs AS (
                SELECT i.da, i.db
                FROM inter i
                JOIN sizes sa ON sa.doc_id = i.da
                JOIN sizes sb ON sb.doc_id = i.db
                WHERE CAST(i.shared AS DOUBLE)
                          / CAST(sa.n + sb.n - i.shared AS DOUBLE) >= 0.9),
            edges AS (SELECT da AS a, db AS b FROM pairs
                      UNION ALL SELECT db, da FROM pairs),
            reach(src, dst) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst)
            SELECT CAST(src AS BIGINT) AS doc_id,
                   CAST(MIN(dst) AS BIGINT) AS cluster_id
            FROM reach GROUP BY src
        """,
        "doc_dedup_near_corpus": """
            WITH RECURSIVE tok AS (
                SELECT doc_id,
                       unnest(list_distinct(regexp_split_to_array(trim(text),
                                                                  '\\s+'))) AS w
                FROM documents WHERE trim(text) <> ''),
            sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
            inter AS (
                SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS shared
                FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
            pairs AS (
                SELECT i.da, i.db
                FROM inter i
                JOIN sizes sa ON sa.doc_id = i.da
                JOIN sizes sb ON sb.doc_id = i.db
                WHERE CAST(i.shared AS DOUBLE)
                          / CAST(sa.n + sb.n - i.shared AS DOUBLE) >= 0.9),
            edges AS (SELECT da AS a, db AS b FROM pairs
                      UNION ALL SELECT db, da FROM pairs),
            reach(src, dst) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.dst),
            clusters AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
                         FROM reach GROUP BY src)
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                   CAST(length(d.text) AS BIGINT) AS n_chars,
                   md5(d.text) AS text_md5
            FROM documents d
            JOIN clusters c ON c.doc_id = d.doc_id
            WHERE c.doc_id = c.cluster_id
        """,
        "doc_dup_ngram_stats": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS ts
                FROM documents WHERE trim(text) <> ''),
            grams AS (
                SELECT t.doc_id,
                       array_to_string(t.ts[r.i:r.i+7], ' ') AS g
                FROM tok t, unnest(range(1, len(t.ts) - 6)) AS r(i)),
            gd AS (SELECT g, doc_id, COUNT(*) AS npos
                   FROM grams GROUP BY g, doc_id),
            dup AS (SELECT g FROM gd GROUP BY g HAVING COUNT(*) >= 2),
            dups AS (SELECT gd.doc_id, SUM(gd.npos) AS nd
                     FROM gd JOIN dup USING (g) GROUP BY gd.doc_id),
            tot AS (SELECT doc_id,
                           greatest(len(regexp_split_to_array(trim(text),
                                                              '\s+')) - 7,
                                    0) AS n
                    FROM documents WHERE trim(text) <> '')
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                   CAST(COALESCE(t.n, 0) AS BIGINT) AS n_ngrams,
                   CAST(COALESCE(u.nd, 0) AS BIGINT) AS n_dup_ngrams,
                   CASE WHEN COALESCE(t.n, 0) > 0
                        THEN CAST(COALESCE(u.nd, 0) AS DOUBLE) / t.n
                        ELSE 0.0 END AS dup_ratio
            FROM documents d
            LEFT JOIN tot t USING (doc_id)
            LEFT JOIN dups u USING (doc_id)
        """,
        "doc_dedup_ngram_corpus": r"""
            WITH tok AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\s+') AS ts
                FROM documents WHERE trim(text) <> ''),
            grams AS (
                SELECT t.doc_id, r.i AS p,
                       array_to_string(t.ts[r.i:r.i+7], ' ') AS g
                FROM tok t, unnest(range(1, len(t.ts) - 6)) AS r(i)),
            dup AS (SELECT g FROM (SELECT g, COUNT(DISTINCT doc_id) AS nd
                                   FROM grams GROUP BY g) WHERE nd >= 2),
            cov AS (SELECT DISTINCT grams.doc_id, grams.p + o.j AS t
                    FROM grams JOIN dup USING (g),
                         unnest(range(0, 8)) AS o(j)),
            toks AS (SELECT tok.doc_id, tok.ts[r.i] AS w, r.i AS ord
                     FROM tok, unnest(range(1, len(ts) + 1)) AS r(i)),
            surv AS (SELECT toks.doc_id, toks.w, toks.ord
                     FROM toks LEFT JOIN cov
                         ON cov.doc_id = toks.doc_id AND cov.t = toks.ord
                     WHERE cov.t IS NULL),
            clean AS (SELECT doc_id,
                             string_agg(w, ' ' ORDER BY ord) AS ctext
                      FROM surv GROUP BY doc_id),
            nrem AS (SELECT doc_id, COUNT(*) AS nr FROM cov
                     GROUP BY doc_id),
            ntok AS (SELECT doc_id, len(ts) AS nt FROM tok)
            SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
                   CAST(COALESCE(ntok.nt, 0) AS BIGINT) AS n_tokens,
                   CAST(COALESCE(nrem.nr, 0) AS BIGINT) AS n_removed,
                   md5(COALESCE(clean.ctext, '')) AS cleaned_md5
            FROM documents d
            LEFT JOIN ntok USING (doc_id)
            LEFT JOIN nrem USING (doc_id)
            LEFT JOIN clean USING (doc_id)
        """,
        "embedding_knn": """
            WITH q AS (SELECT vec_id AS qid, embedding AS qe
                       FROM embeddings WHERE vec_id < 10),
            s AS (SELECT q.qid, e.vec_id AS nid,
                         list_cosine_similarity(q.qe, e.embedding) AS sim
                  FROM q, embeddings e WHERE e.vec_id <> q.qid),
            r AS (SELECT qid, nid,
                         ROW_NUMBER() OVER (PARTITION BY qid
                                            ORDER BY sim DESC, nid) AS rnk
                  FROM s)
            SELECT qid AS query_id, CAST(rnk AS BIGINT) AS rank,
                   nid AS neighbor_id
            FROM r WHERE rnk <= 5
        """,
        "embedding_dup_pairs": """
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
        """,
        "events_hll_users": _hll_users_sql(),
        "events_sliding_window": f"""
            WITH w AS (
                SELECT unnest([
                           time_bucket(INTERVAL '30 minutes', ts),
                           time_bucket(INTERVAL '30 minutes', ts)
                               - INTERVAL '30 minutes']) AS window_start,
                       {cents.format(col='value')} AS c
                FROM events)
            SELECT window_start,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(c) AS DOUBLE) / 100.0 AS sum_value
            FROM w GROUP BY window_start
        """,
        # both decontamination plans produce identical tables, so they
        # share one oracle (broadcast vs shuffle is a physical choice):
        # both LM-score plans produce identical tables -> shared oracle:
        "doc_lm_score": LM_SCORE_SQL,
        "vocab_top": VOCAB_TOP_SQL,
        "doc_dsir_weights": DSIR_SQL,
        "token_heavy_hitters": HEAVY_HITTERS_SQL,
        "token_counts_cms": TOKEN_CMS_SQL,
        "bigram_pmi": BIGRAM_PMI_SQL,
        "token_postings": POSTINGS_SQL,
        "doc_tfidf_top_terms": TFIDF_SQL,
        "bm25_scores": BM25_SQL,
        "events_funnel": FUNNEL_SQL,
        "events_cohort_retention": COHORT_SQL,
        "events_user_gaps": USER_GAPS_SQL,
        "events_daily_moving_avg": DAILY_MA_SQL,
        "events_daily_zscore": DAILY_ZSCORE_SQL,
        "doc_length_percentile": LENGTH_PCT_SQL,
        "doc_stats_rollup": STATS_ROLLUP_SQL,
        "doc_normalize": DOC_NORMALIZE_SQL,
        "doc_lexical_diversity": LEXICAL_DIVERSITY_SQL,
        "doc_dedup_normalized": DOC_DEDUP_NORMALIZED_SQL,
        "doc_chunks": DOC_CHUNKS_SQL,
        "doc_dedup_incremental": DEDUP_INCREMENTAL_SQL,
        "corpus_diff": CORPUS_DIFF_SQL,
        "source_jaccard": SOURCE_JACCARD_SQL,
        "doc_pagerank": pagerank_sql(),
        "corpus_preprocess": CORPUS_PREPROCESS_SQL,
        "doc_lm_score_shuffled": LM_SCORE_SQL,
        "doc_decontaminate": DECONTAM_SQL,
        "doc_decontaminate_shuffled": DECONTAM_SQL,
        "doc_decontaminate_bloom": DECONTAM_BLOOM_SQL,
        "doc_domain_mix": DOMAIN_MIX_SQL,
        "doc_sample_k": SAMPLE_K_SQL,
        "doc_weighted_sample": WEIGHTED_SAMPLE_SQL,
        "doc_cap_per_lang": CAP_PER_LANG_SQL,
        "doc_train_test_split": """
            SELECT doc_id,
                   CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '29'
                        THEN 'test' ELSE 'train' END AS split
            FROM documents
        """,
        "doc_sample_stratified": """
            SELECT lang,
                   CAST(SUM(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                                      < '14' THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_sampled,
                   CAST(COUNT(*) AS BIGINT) AS n_total
            FROM documents GROUP BY lang
        """,
        "activity_union": f"""
            WITH u AS (
                SELECT 'order:' || o_orderpriority AS kind,
                       {cents.format(col='o_totalprice')} AS c
                FROM orders
                UNION ALL
                SELECT 'event:' || event_type,
                       {cents.format(col='value')}
                FROM events)
            SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(c) AS DOUBLE) / 100.0 AS total_amount
            FROM u GROUP BY kind
        """,
    }


def oracle_sql() -> dict[str, str]:
    # Defensive: the x_*/aux oracle SQL reads fixture files produced as a
    # side effect of running the wrapped queries; materialize them for the
    # driver's correctness scale up front in case the driver runs SQL first.
    try:
        if os.path.isdir("/root/testdata/sf0.01"):
            _oracle_fixtures("/root/testdata/sf0.01")
            from amazon_textract_transformer_pipeline_ray.oracle_fixture_aux import (
                _builders)

            for name in _builders():  # every aux fixture, none left stale
                _aux("/root/testdata/sf0.01", name)
    except Exception:  # noqa: BLE001 - fixture build must never break SQL listing
        pass
    return _sql_registry()

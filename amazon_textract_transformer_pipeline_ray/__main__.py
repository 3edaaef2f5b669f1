"""CLI entry point — the ``ray job submit`` surface.

On a real cluster::

    ray job submit --working-dir . -- \\
        python -m amazon_textract_transformer_pipeline_ray run \\
        --input 's3://bucket/transcripts/*.parquet' --out s3://bucket/turns \\
        --num-partitions 4096

Locally (Ray auto-initializes, or set RAY_ADDRESS)::

    python -m amazon_textract_transformer_pipeline_ray run \\
        --input '/data/transcripts' --out /tmp/turns

Subcommands: ``run`` (checkpointed, resumable extraction — rerunning with
the same inputs/config skips complete partitions), ``summary`` (print a
finished run's manifest rollup), ``eval`` (classifier metrics vs gold
hints), ``normalize`` (post-hoc normalizer actor-pool pass over a
finished run's turns table), ``export`` (training-data tables via the
mlm/ner/seq2seq task registry, ``--pack-budget`` for the greedy packed
table), ``dedup`` (exact / near-dup-cluster / survivor-corpus /
duplicated-n-gram detection and removal passes over a documents
table), ``filter`` (corpus-filter passes: Gopher quality, PII scrub,
decontamination, domain mix, LM scoring, SemDeDup, or the composite
preprocess verdict table, ``--keep-only`` for the cleaned slice),
``tokenize`` (corpus BPE merge training / per-doc encoding),
``chunk`` (overlapping retrieval chunks), ``ingest``
(incremental-dedup ingestion against a persistent seen-hash state;
``--run-id`` is the idempotency key).  This module owns the Ray session
(guarded init); library code never calls ray.init.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _expand_inputs(spec: str) -> list[str]:
    if os.path.isdir(spec):
        return sorted(glob.glob(os.path.join(spec, "*.parquet")))
    hits = sorted(glob.glob(spec))
    return hits if hits else [spec]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="amazon_textract_transformer_pipeline_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="checkpointed extraction run")
    run.add_argument("--input", required=True,
                     help="parquet path/glob/directory of transcripts")
    run.add_argument("--out", required=True, help="output directory")
    run.add_argument("--config", help="EngineConfig JSON file (optional)")
    run.add_argument("--num-partitions", type=int, default=None)
    run.add_argument("--batch-size", type=int, default=512)

    summ = sub.add_parser("summary", help="print a run's manifest rollup")
    summ.add_argument("--out", required=True)

    conv = sub.add_parser(
        "conversations",
        help="write the conversation rollup of a finished run")
    conv.add_argument("--out", required=True)

    ev = sub.add_parser("eval", help="classifier metrics vs gold hints")
    ev.add_argument("--input", required=True)

    norm = sub.add_parser(
        "normalize",
        help="re-normalize a finished run's turns table (actor-pool "
             "normalizer stage; writes a normalized copy)")
    norm.add_argument("--out", required=True, help="finished run directory")
    norm.add_argument("--dest", required=True,
                      help="destination directory for normalized turns")
    norm.add_argument("--config", help="EngineConfig JSON file (optional)")

    dd = sub.add_parser(
        "dedup",
        help="run a dedup pass over a directory's documents.parquet")
    dd.add_argument("--table-dir", required=True,
                    help="directory holding documents.parquet")
    dd.add_argument("--dest", required=True, help="destination directory")
    dd.add_argument("--mode", default="exact",
                    choices=("exact", "clusters", "survivors",
                             "ngram-stats", "ngram-remove"),
                    help="exact = md5 groups; clusters = near-dup "
                         "connected components; survivors = kept docs "
                         "after cluster dedup; ngram-stats / ngram-remove "
                         "= substring-level duplicated-8-gram detection / "
                         "removal")

    fl = sub.add_parser(
        "filter",
        help="run a corpus-filter pass over a directory's documents.parquet")
    fl.add_argument("--table-dir", required=True,
                    help="directory holding documents.parquet "
                         "(mix/semdedup also read source/embeddings)")
    fl.add_argument("--dest", required=True, help="destination directory")
    fl.add_argument("--mode", default="preprocess",
                    choices=("gopher", "pii", "decontam", "mix",
                             "lm-score", "semdedup", "preprocess"),
                    help="gopher = quality/repetition signals; pii = "
                         "detect+redact counts; decontam = eval-overlap "
                         "stats; mix = domain-mixture selection; lm-score "
                         "= unigram-LM bits/token; semdedup = embedding "
                         "cluster dedup; preprocess = the composite "
                         "verdict table (all gates)")
    fl.add_argument("--keep-only", action="store_true",
                    help="preprocess mode: write only rows with keep=1")

    tok = sub.add_parser(
        "tokenize",
        help="train corpus BPE merges or encode docs with them")
    tok.add_argument("--table-dir", required=True,
                     help="directory holding documents.parquet")
    tok.add_argument("--dest", required=True, help="destination directory")
    tok.add_argument("--mode", default="merges",
                     choices=("merges", "encode"),
                     help="merges = learn the merge-rule table; encode = "
                          "per-doc piece counts under the learned rules")
    tok.add_argument("--merges", default=None,
                     help="encode mode: path to a bpe_merges.parquet "
                          "written by --mode merges; skips retraining "
                          "and encodes under that tokenizer")
    tok.add_argument("--state-dir", default=None,
                     help="merges mode: checkpoint directory — training "
                          "resumes from committed word counts + merge "
                          "checkpoints after a crash (D2 semantics)")

    ch = sub.add_parser(
        "chunk",
        help="overlapping retrieval chunks over a documents table")
    ch.add_argument("--table-dir", required=True,
                    help="directory holding documents.parquet")
    ch.add_argument("--dest", required=True, help="destination directory")

    ing = sub.add_parser(
        "ingest",
        help="incremental-dedup ingestion of a documents table "
             "against a persistent seen-hash state")
    ing.add_argument("--table-dir", required=True,
                     help="directory holding documents.parquet")
    ing.add_argument("--state-dir", required=True,
                     help="dedup state directory (created on first run)")
    ing.add_argument("--run-id", required=True,
                     help="idempotency key; a committed run-id replays "
                          "its stored survivors")
    ing.add_argument("--dest", default=None,
                     help="optionally also write the survivor table here")

    an = sub.add_parser(
        "analyze",
        help="text-analysis pass over a directory's documents.parquet")
    an.add_argument("--table-dir", required=True,
                    help="directory holding documents.parquet")
    an.add_argument("--dest", required=True, help="destination directory")
    an.add_argument("--mode", default="stats",
                    choices=("stats", "langid", "quality", "diversity",
                             "normalize", "chunks-rollup"),
                    help="stats = per-lang rollup; langid = n-gram "
                         "language ID; quality = heuristic scores; "
                         "diversity = type-token ratio; normalize = "
                         "canonical-form fingerprints; chunks-rollup = "
                         "lang x source grouping-sets stats")

    rn = sub.add_parser(
        "render",
        help="human spot-check: print inline span markup + page-geometry "
             "sketches for sample turns of a checkpointed run "
             "(reference notebooks/util/viz.py analog)")
    rn.add_argument("--out", required=True,
                    help="checkpointed run directory (reads <out>/data)")
    rn.add_argument("--limit", type=int, default=5)
    rn.add_argument("--review-only", action="store_true",
                    help="only turns the confidence gate flagged")
    rn.add_argument("--no-sketch", action="store_true")

    pr = sub.add_parser(
        "preprocess-run",
        help="checkpointed corpus-preprocess run (resumable: "
             "per-partition signal manifests + committed verdict)")
    pr.add_argument("--table-dir", required=True,
                    help="directory holding documents.parquet")
    pr.add_argument("--out", required=True, help="output/state directory")
    pr.add_argument("--partitions", type=int, default=32)

    cp = sub.add_parser(
        "compact",
        help="merge an ingest state's committed run files into one "
             "base file per bucket")
    cp.add_argument("--state-dir", required=True,
                    help="dedup state directory to compact")

    exp = sub.add_parser(
        "export", help="write a training-data table (task registry)")
    exp.add_argument("--input", required=True,
                     help="parquet path/glob/directory of transcripts")
    exp.add_argument("--dest", required=True, help="destination directory")
    exp.add_argument("--task", default="ner",
                     choices=("mlm", "ner", "seq2seq"))
    exp.add_argument("--max-seq-len", type=int, default=None)
    exp.add_argument("--pack-budget", type=int, default=None,
                     help="also write the greedy token-budget pack table "
                          "(ner/mlm window tasks) to <dest>_packed")

    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .config import EngineConfig
    from .state import checkpoint as ckpt

    if args.cmd == "summary":
        print(json.dumps(ckpt.run_summary(args.out)))
        return 0

    if args.cmd == "conversations":
        from .pipelines.extraction import write_conversations

        print(json.dumps(write_conversations(args.out)))
        return 0

    if args.cmd == "eval":
        from .pipelines.extraction import build_eval_metrics, read_transcripts

        m = build_eval_metrics(read_transcripts(_expand_inputs(args.input)))
        print(json.dumps(m))
        return 0

    if args.cmd == "normalize":
        from .pipelines.extraction import read_turns_output
        from .stages.normalize import NormalizerStage

        if args.config:
            with open(args.config) as f:
                cfg = EngineConfig.from_json(f.read())
        else:
            cfg = EngineConfig()
        import ray.data as rd

        out = read_turns_output(args.out).map_batches(
            NormalizerStage, fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow", batch_size=512, concurrency=(1, 4))
        out.write_parquet(args.dest)
        # count from the written files (no pipeline re-execution):
        print(json.dumps({"rows": rd.read_parquet(args.dest).count(),
                          "dest": args.dest}))
        return 0

    if args.cmd == "dedup":
        import ray.data as rd

        from .pipelines import dedup as dd_mod
        from .pipelines import graph as graph_mod
        from .pipelines import text as text_mod

        builders = {
            "exact": text_mod.q_doc_dedup_exact,
            "clusters": graph_mod.q_jaccard_dedup_clusters,
            "survivors": graph_mod.q_doc_dedup_near_corpus,
            "ngram-stats": dd_mod.q_doc_dup_ngram_stats,
            "ngram-remove": dd_mod.q_doc_dedup_ngram_corpus,
        }
        result = builders[args.mode](args.table_dir)
        if isinstance(result, rd.Dataset):
            result.write_parquet(args.dest)
        else:  # pandas driver view (clusters)
            import pyarrow as pa
            import pyarrow.parquet as pq

            os.makedirs(args.dest, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(result,
                                                preserve_index=False),
                           os.path.join(args.dest, "part-00000.parquet"))
        print(json.dumps({"mode": args.mode,
                          "rows": rd.read_parquet(args.dest).count(),
                          "dest": args.dest}))
        return 0

    if args.cmd == "filter":
        import ray.data as rd

        from .pipelines import corpus as corpus_mod
        from .pipelines import decontam as dc_mod
        from .pipelines import filtering as filt_mod
        from .pipelines import preprocess as pp_mod
        from .pipelines import scoring as sc_mod
        from .pipelines import similarity as sim_mod

        builders = {
            "gopher": filt_mod.q_doc_gopher_quality,
            "pii": filt_mod.q_doc_pii_scrub,
            "decontam": dc_mod.q_doc_decontaminate,
            "mix": corpus_mod.q_doc_domain_mix,
            "lm-score": sc_mod.q_doc_lm_score,
            "semdedup": sim_mod.q_embedding_semdedup,
            "preprocess": pp_mod.q_corpus_preprocess,
        }
        result = builders[args.mode](args.table_dir)
        if args.keep_only:
            if args.mode != "preprocess":
                ap.error("--keep-only applies to preprocess mode")
            import pyarrow.compute as pc

            def _kept(b):
                return b.filter(pc.equal(b["keep"], 1))

            result = result.map_batches(_kept, batch_format="pyarrow")
        result.write_parquet(args.dest)
        print(json.dumps({"mode": args.mode,
                          "rows": rd.read_parquet(args.dest).count(),
                          "dest": args.dest}))
        return 0

    if args.cmd == "tokenize":
        import pyarrow.parquet as pq_mod
        import ray.data as rd

        from .pipelines import tokenizer as tok_mod

        if args.mode == "merges":
            if args.state_dir:
                table = tok_mod.train_bpe_checkpointed(args.table_dir,
                                                       args.state_dir)
            else:
                table = tok_mod.q_vocab_bpe_merges(args.table_dir)
            os.makedirs(args.dest, exist_ok=True)
            pq_mod.write_table(
                table, os.path.join(args.dest, "bpe_merges.parquet"))
            rows = table.num_rows
        else:
            rules = None
            if args.merges:
                mt = pq_mod.read_table(args.merges)
                rules = list(zip(mt.column("left").to_pylist(),
                                 mt.column("right").to_pylist()))
            (tok_mod.q_doc_bpe_encode(args.table_dir, rules=rules)
             .write_parquet(args.dest))
            rows = rd.read_parquet(args.dest).count()
        print(json.dumps({"mode": args.mode, "rows": rows,
                          "dest": args.dest}))
        return 0

    if args.cmd == "chunk":
        import ray.data as rd

        from .pipelines import chunking as ch_mod

        ch_mod.q_doc_chunks(args.table_dir).write_parquet(args.dest)
        print(json.dumps({"rows": rd.read_parquet(args.dest).count(),
                          "dest": args.dest}))
        return 0

    if args.cmd == "ingest":
        import pyarrow.parquet as pq_mod

        from .pipelines import incremental as inc_mod
        from .sources.tables import read_table

        docs = read_table(args.table_dir, "documents", ["doc_id", "text"])
        survivors = inc_mod.ingest_run(docs, args.state_dir, args.run_id)
        if args.dest:
            os.makedirs(args.dest, exist_ok=True)
            pq_mod.write_table(
                survivors, os.path.join(args.dest, "survivors.parquet"))
        print(json.dumps({"run_id": args.run_id,
                          "n_survivors": survivors.num_rows,
                          "state_dir": args.state_dir}))
        return 0

    if args.cmd == "analyze":
        import ray.data as rd

        from .pipelines import text as text_mod

        builders = {
            "stats": text_mod.q_doc_stats_by_lang,
            "langid": text_mod.q_doc_langid,
            "quality": text_mod.q_doc_quality,
            "diversity": text_mod.q_doc_lexical_diversity,
            "normalize": text_mod.q_doc_normalize,
            "chunks-rollup": text_mod.q_doc_stats_rollup,
        }
        builders[args.mode](args.table_dir).write_parquet(args.dest)
        print(json.dumps({"mode": args.mode,
                          "rows": rd.read_parquet(args.dest).count(),
                          "dest": args.dest}))
        return 0

    if args.cmd == "render":
        import ray.data as rd

        from .functions.viz import render_turn
        from .pipelines.extraction import read_turns_output

        ds = read_turns_output(args.out)
        if args.review_only:
            ds = ds.filter(lambda r: bool(r["review_needed"]))
        for row in ds.limit(args.limit).iter_rows():
            print(render_turn(row, sketch=not args.no_sketch))
            print()
        return 0

    if args.cmd == "preprocess-run":
        from .pipelines import preprocess as pp_run_mod

        summary = pp_run_mod.run_preprocess_checkpointed(
            args.table_dir, args.out, num_partitions=args.partitions)
        print(json.dumps(summary))
        return 0

    if args.cmd == "compact":
        from .pipelines import incremental as inc_mod

        print(json.dumps(inc_mod.compact_state(args.state_dir)))
        return 0

    if args.cmd == "export":
        from .pipelines.extraction import read_transcripts
        from .pipelines.tasks import get_task

        kwargs = {}
        if args.max_seq_len is not None and args.task != "seq2seq":
            kwargs["max_seq_len"] = args.max_seq_len
        import ray.data as rd

        table = get_task(args.task,
                         read_transcripts(_expand_inputs(args.input)),
                         **kwargs)
        table.write_parquet(args.dest)
        result = {"task": args.task,
                  "rows": rd.read_parquet(args.dest).count(),
                  "dest": args.dest}
        if args.pack_budget is not None:
            if args.task == "seq2seq":
                ap.error("--pack-budget applies to window tasks (ner/mlm)")
            from .pipelines.training import build_packed_examples

            packed_dest = args.dest.rstrip("/") + "_packed"
            build_packed_examples(
                rd.read_parquet(args.dest),
                token_budget=args.pack_budget).write_parquet(packed_dest)
            result["packed_rows"] = rd.read_parquet(packed_dest).count()
            result["packed_dest"] = packed_dest
        print(json.dumps(result))
        return 0

    # run
    if args.config:
        with open(args.config) as f:
            cfg = EngineConfig.from_json(f.read())
    else:
        cfg = EngineConfig()
    if args.num_partitions is not None:
        cfg.num_partitions = args.num_partitions

    from .pipelines.extraction import run_checkpointed

    summary = run_checkpointed(
        _expand_inputs(args.input), args.out, cfg, batch_size=args.batch_size)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Driver-visible oracle fixtures for the flagship extraction tables.

The correctness driver cross-checks every query against an ANSI-SQL
oracle run by DuckDB.  The extraction pipeline's semantics (HTML/layout
parsing, splitter windows, classifier, run-length span assembly, field
consolidation — reference ``fn-postprocess/util/extract.py:93-131`` +
``main.py:84-180``) are not SQL-expressible, so this module materializes
the INDEPENDENT oracle's expected outputs (``oracle_independent.py`` — a
loop-style reimplementation sharing no kernel code with the engine) as
parquet fixtures under a stable path, and ``oracle_sql()`` points DuckDB
at them with ``read_parquet()``.  The driver's hash compare then verifies
the distributed Ray pipeline against the independent single-process
implementation — the per-turn text-equality gate of the north rule,
surfaced to the external checker instead of living only in pytest.

Float convention: the engine persists f32 confidence/ratio columns cast
from f64 kernel values; the oracle's f64 values agree with the kernel to
~1e-15 relative, and f32-cast equality over the full sf0.01 driver corpus
is asserted empirically (tests/test_driver_oracle_parity.py), so the
driver's value hashes match bit-for-bit.

Layout (all under /tmp — scratch, regenerated on demand, keyed by the
corpus directory name and cached behind a ``_SUCCESS`` marker):

    /tmp/attp_oracle/<corpus-tag>/{turns,turns_staged,spans,fields,
                                   conversations,seq2seq,review_queue}.parquet
    /tmp/attp_oracle/current  -> symlink to the tag dir (atomic swap)
    /tmp/attp_transcripts/current -> symlink to the corpus dir itself
                                     (for pure-SQL oracles over the input)

The ``current`` symlinks exist because ``oracle_sql()`` must return STATIC
SQL strings; each ``queries()`` callable re-points them at its corpus
before running, so query and oracle always see the same scale factor.
"""

from __future__ import annotations

import hashlib
import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_ROOT = "/tmp/attp_oracle"
CURRENT_LINK = os.path.join(FIXTURE_ROOT, "current")
TRANSCRIPTS_CURRENT = "/tmp/attp_transcripts/current"
# bump whenever fixture CONTENT changes so stale /tmp caches regenerate:
FIXTURE_VERSION = 3

TURNS_FIX_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("extracted_text", pa.string()),
    ("boilerplate_ratio", pa.float32()),
    ("n_words", pa.int32()),
    ("n_spans", pa.int32()),
    ("doc_confidence", pa.float32()),
    ("review_needed", pa.bool_()),
])

SPANS_FIX_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("class_id", pa.int8()),
    ("class_name", pa.string()),
    ("text", pa.string()),
    ("raw_text", pa.string()),
    ("start", pa.int32()),
    ("end", pa.int32()),
    ("page", pa.int16()),
    ("x0", pa.int16()), ("y0", pa.int16()),
    ("x1", pa.int16()), ("y1", pa.int16()),
    ("confidence", pa.float32()),
])

FIELDS_FIX_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("field_name", pa.string()),
    ("class_id", pa.int8()),
    ("value", pa.string()),
    ("confidence", pa.float32()),
    ("num_detections", pa.int32()),
    ("num_detected_values", pa.int32()),
    ("sort_order", pa.int32()),
    ("optional", pa.bool_()),
    ("review_needed", pa.bool_()),
])

# Conversation rollup comes out of a pandas ``map_groups`` in the engine,
# so integer columns are int64 (pandas inference), not the pinned int32 of
# CONVERSATIONS_SCHEMA — the fixture matches what the stage actually emits:
CONVS_FIX_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("n_turns", pa.int64()),
    ("first_turn_idx", pa.int64()),
    ("last_turn_idx", pa.int64()),
    ("turns_unique_ordered", pa.bool_()),
    ("total_words", pa.int64()),
    ("mean_boilerplate_ratio", pa.float64()),
    ("total_spans", pa.int64()),
    ("n_review_needed", pa.int64()),
    ("conv_text_sha256", pa.string()),
])

SEQ2SEQ_FIX_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("target", pa.string()),
    ("n_occurrences", pa.int64()),
])

# Training-export window digests (driver views of the nested
# words/boxes/labels columns — md5 convention shared with the engine-side
# digest stage in ``__ray_entry__.py``):
_TRAIN_BASE_FIELDS = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("page", pa.int16()),
    ("window_idx", pa.int32()),
    ("n_windows", pa.int32()),
    ("word_start", pa.int32()),
    ("word_end", pa.int32()),
    ("n_tokens", pa.int32()),
    ("words_md5", pa.string()),
    ("boxes_md5", pa.string()),
]
TRAIN_FIX_SCHEMA = pa.schema(
    _TRAIN_BASE_FIELDS + [("labels_md5", pa.string())])
MLM_FIX_SCHEMA = pa.schema(
    _TRAIN_BASE_FIELDS + [("n_masked", pa.int32()),
                          ("mask_md5", pa.string())])

EVAL_FIX_SCHEMA = pa.schema([
    ("n_examples", pa.int64()),
    ("acc", pa.float32()),
    ("n_focus_examples", pa.int64()),
    ("focus_acc", pa.float32()),
    ("focus_else_acc_minus_one", pa.float32()),
])


def _relink(link: str, target: str) -> None:
    """Atomically (re)point a symlink."""
    os.makedirs(os.path.dirname(link), exist_ok=True)
    tmp = f"{link}.tmp.{os.getpid()}"
    try:
        os.symlink(target, tmp)
        os.replace(tmp, link)
    finally:
        if os.path.islink(tmp):
            os.unlink(tmp)


def link_transcripts_current(corpus_dir: str) -> None:
    _relink(TRANSCRIPTS_CURRENT, os.path.abspath(corpus_dir))


def _shard_expected(path: str) -> dict:
    """Expected tables for one corpus shard, computed by the INDEPENDENT
    oracle (one process; pure function of the shard file)."""
    from .config import DEFAULT_CONFIG as cfg
    from .oracle_independent import (_normalize_date, oracle_consolidate,
                                     oracle_extract_turn,
                                     oracle_training_views)

    date_ids = {f.class_id for f in cfg.fields
                if f.normalizer == "date_iso" and not f.ignore}

    t = pq.read_table(path, columns=["conv_id", "turn_idx", "role", "text"])
    conv_ids = t.column("conv_id").to_pylist()
    turn_idxs = t.column("turn_idx").to_pylist()
    roles = t.column("role").to_pylist()
    texts = t.column("text").to_pylist()

    turns = {f.name: [] for f in TURNS_FIX_SCHEMA}
    staged = {"doc_confidence": [], "review_needed": []}
    spans = {f.name: [] for f in SPANS_FIX_SCHEMA}
    fields = {f.name: [] for f in FIELDS_FIX_SCHEMA}
    lean = {"conv_id": [], "turn_idx": [], "n_words": [], "boiler": [],
            "n_spans": [], "review": [], "digest": []}
    seq_sources: Counter = Counter()
    train = {f.name: [] for f in TRAIN_FIX_SCHEMA}
    mlm = {f.name: [] for f in MLM_FIX_SCHEMA}
    ev = {"acc_sum": 0.0, "focus_sum": 0.0, "n_ex": 0, "n_focus": 0}

    for cid, tix, role, payload in zip(conv_ids, turn_idxs, roles, texts):
        ner_rows, mlm_rows, ev_part = oracle_training_views(
            payload, cfg, cid, tix)
        for row in ner_rows:
            for k in train:
                train[k].append(row[k])
        for row in mlm_rows:
            for k in mlm:
                mlm[k].append(row[k])
        if ev_part is not None:
            acc, focus = ev_part
            ev["acc_sum"] += acc
            ev["n_ex"] += 1
            if focus is not None:
                ev["focus_sum"] += focus
                ev["n_focus"] += 1

        exp = oracle_extract_turn(payload, cfg)
        if exp is None:
            continue
        turns["conv_id"].append(cid)
        turns["turn_idx"].append(tix)
        turns["role"].append(role)
        turns["extracted_text"].append(exp["extracted_text"])
        turns["boilerplate_ratio"].append(exp["boilerplate_ratio"])
        turns["n_words"].append(exp["n_words"])
        turns["n_spans"].append(exp["n_spans"])
        turns["doc_confidence"].append(exp["doc_confidence"])
        turns["review_needed"].append(exp["review_needed"])

        # Staged-pipeline doc confidence: the normalizer stage recomputes
        # consolidation for turns with >=1 normalized span from the
        # PERSISTED f32 span confidences (stages/normalize.py); untouched
        # turns keep the fused values verbatim:
        affected = any(d["class_id"] in date_ids for d in exp["spans"])
        if affected:
            quant = [dict(d, confidence=float(np.float32(d["confidence"])))
                     for d in exp["spans"]]
            _, dc = oracle_consolidate(quant, cfg)
            staged["doc_confidence"].append(dc)
            staged["review_needed"].append(
                bool(np.float32(dc) < np.float32(cfg.review_threshold)))
        else:
            staged["doc_confidence"].append(exp["doc_confidence"])
            staged["review_needed"].append(exp["review_needed"])

        for d in exp["spans"]:
            spans["conv_id"].append(cid)
            spans["turn_idx"].append(tix)
            for k in ("class_id", "class_name", "text", "raw_text", "start",
                      "end", "page", "x0", "y0", "x1", "y1", "confidence"):
                spans[k].append(d[k])
            if d["class_id"] in date_ids:
                seq_sources[d["raw_text"] if d["raw_text"] is not None
                            else d["text"]] += 1

        for fr in exp["fields"]:
            fields["conv_id"].append(cid)
            fields["turn_idx"].append(tix)
            fields["field_name"].append(fr["name"])
            fields["class_id"].append(fr["class_id"])
            fields["value"].append(fr["value"])
            fields["confidence"].append(fr["confidence"])
            fields["num_detections"].append(fr["num_detections"])
            fields["num_detected_values"].append(fr["num_detected_values"])
            fields["sort_order"].append(fr["sort_order"])
            fields["optional"].append(bool(fr["optional"])
                                      if fr["optional"] is not None else False)
            fields["review_needed"].append(exp["review_needed"])

        lean["conv_id"].append(cid)
        lean["turn_idx"].append(tix)
        lean["n_words"].append(exp["n_words"])
        lean["boiler"].append(exp["boilerplate_ratio"])
        lean["n_spans"].append(exp["n_spans"])
        lean["review"].append(exp["review_needed"])
        lean["digest"].append(hashlib.sha256(
            exp["extracted_text"].encode("utf-8")).hexdigest()[:16])

    # keep staged target alias for the normalizer parity fixture:
    seq_pairs = {src: _normalize_date(src) for src in seq_sources}
    return {"turns": turns, "staged": staged, "spans": spans,
            "fields": fields, "lean": lean, "train": train, "mlm": mlm,
            "eval": ev, "seq": dict(seq_sources), "seq_targets": seq_pairs}


def _table(cols: dict, schema: pa.Schema) -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in schema], schema=schema)


def _conversations_table(lean: dict) -> pa.Table:
    """Independent replica of the conversation rollup
    (stages/conversation.py semantics, including the float32-series mean
    the pandas ``map_groups`` performs)."""
    df = pd.DataFrame({
        "conv_id": lean["conv_id"],
        "turn_idx": np.asarray(lean["turn_idx"], dtype=np.int32),
        "n_words": np.asarray(lean["n_words"], dtype=np.int32),
        "boilerplate_ratio": np.asarray(lean["boiler"], dtype=np.float32),
        "n_spans": np.asarray(lean["n_spans"], dtype=np.int32),
        "review_needed": np.asarray(lean["review"], dtype=bool),
        "text_digest": lean["digest"],
    })
    out = {f.name: [] for f in CONVS_FIX_SCHEMA}
    for cid, g in df.groupby("conv_id", sort=False):
        g = g.sort_values("turn_idx", kind="mergesort")
        tixs = g["turn_idx"].to_numpy()
        h = hashlib.sha256()
        for tix, td in zip(tixs.tolist(), g["text_digest"].tolist()):
            h.update(f"{tix}:{td}\n".encode())
        out["conv_id"].append(cid)
        out["n_turns"].append(len(g))
        out["first_turn_idx"].append(int(tixs[0]))
        out["last_turn_idx"].append(int(tixs[-1]))
        out["turns_unique_ordered"].append(
            bool(len(tixs) == len(set(tixs.tolist()))))
        out["total_words"].append(int(g["n_words"].sum()))
        out["mean_boilerplate_ratio"].append(
            float(g["boilerplate_ratio"].mean()))
        out["total_spans"].append(int(g["n_spans"].sum()))
        out["n_review_needed"].append(int(g["review_needed"].sum()))
        out["conv_text_sha256"].append(h.hexdigest())
    return _table(out, CONVS_FIX_SCHEMA)


def ensure_fixtures(corpus_paths: list[str]) -> str:
    """Compute (or reuse) the expected-output fixtures for a corpus and
    point ``current`` at them.  Returns the fixture directory.

    Cached per corpus directory; the oracle pass parallelizes over shard
    files (each shard is an independent pure function of its file)."""
    corpus_dir = os.path.dirname(os.path.abspath(corpus_paths[0]))
    link_transcripts_current(corpus_dir)
    tag = os.path.basename(corpus_dir) or "corpus"
    fix_dir = os.path.join(FIXTURE_ROOT, f"{tag}-v{FIXTURE_VERSION}")
    marker = os.path.join(fix_dir, "_SUCCESS")
    if os.path.exists(marker):
        _relink(CURRENT_LINK, fix_dir)
        return fix_dir

    shards: list[dict]
    if len(corpus_paths) > 1:
        from concurrent.futures import ProcessPoolExecutor

        n_workers = min(len(corpus_paths), os.cpu_count() or 8)
        with ProcessPoolExecutor(max_workers=n_workers) as pool:
            shards = list(pool.map(_shard_expected, corpus_paths))
    else:
        shards = [_shard_expected(p) for p in corpus_paths]

    def merged(kind: str) -> dict:
        cols: dict[str, list] = {}
        for s in shards:
            for k, v in s[kind].items():
                cols.setdefault(k, []).extend(v)
        return cols

    turns_cols = merged("turns")
    turns = _table(turns_cols, TURNS_FIX_SCHEMA)
    staged_cols = dict(turns_cols)
    staged_cols.update(merged("staged"))
    turns_staged = _table(staged_cols, TURNS_FIX_SCHEMA)
    spans = _table(merged("spans"), SPANS_FIX_SCHEMA)
    fields = _table(merged("fields"), FIELDS_FIX_SCHEMA)
    convs = _conversations_table(merged("lean"))
    train = _table(merged("train"), TRAIN_FIX_SCHEMA)
    mlm = _table(merged("mlm"), MLM_FIX_SCHEMA)

    # Eval metrics: shard partials summed in shard order; the ~1e-16
    # summation-order difference vs the engine's Ray block order is
    # absorbed by the float32 driver convention (module docstring):
    acc_sum = sum(s["eval"]["acc_sum"] for s in shards)
    focus_sum = sum(s["eval"]["focus_sum"] for s in shards)
    n_ex = sum(s["eval"]["n_ex"] for s in shards)
    n_focus = sum(s["eval"]["n_focus"] for s in shards)
    acc = acc_sum / n_ex if n_ex else 0.0
    focus_acc = focus_sum / n_focus if n_focus else 0.0
    eval_tbl = _table({
        "n_examples": [n_ex],
        "acc": [acc],
        "n_focus_examples": [n_focus],
        "focus_acc": [focus_acc],
        "focus_else_acc_minus_one": [focus_acc if focus_acc > 0
                                     else acc - 1],
    }, EVAL_FIX_SCHEMA)

    seq_counts: Counter = Counter()
    seq_targets: dict[str, str] = {}
    for s in shards:
        seq_counts.update(s["seq"])
        seq_targets.update(s["seq_targets"])
    srcs = sorted(seq_counts)
    seq = _table({
        "source": srcs,
        "target": [seq_targets[s] for s in srcs],
        "n_occurrences": [seq_counts[s] for s in srcs],
    }, SEQ2SEQ_FIX_SCHEMA)

    # review queue = turns flagged for human review (reference confidence
    # gate, pipeline/__init__.py:288-301) + the deterministic human-task
    # name (independent re-statement of pipelines/review.task_name_for —
    # the ids contain no specials, so the sanitize pass is the identity):
    review = turns.filter(
        pa.compute.equal(turns.column("review_needed"), True))
    review = review.append_column("task_name", pa.array(
        [f"review-{c}-{t}" for c, t in
         zip(review.column("conv_id").to_pylist(),
             review.column("turn_idx").to_pylist())], pa.string()))

    tmp = f"{fix_dir}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    for name, table in (("turns", turns), ("turns_staged", turns_staged),
                        ("spans", spans), ("fields", fields),
                        ("conversations", convs), ("seq2seq", seq),
                        ("review_queue", review), ("training", train),
                        ("mlm", mlm), ("eval_metrics", eval_tbl)):
        pq.write_table(table, os.path.join(tmp, f"{name}.parquet"))
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write(corpus_dir + "\n")
    try:
        os.rename(tmp, fix_dir)
    except OSError:  # concurrent writer won the race; use theirs
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    _relink(CURRENT_LINK, fix_dir)
    return fix_dir

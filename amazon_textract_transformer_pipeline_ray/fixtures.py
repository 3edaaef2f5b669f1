"""Deterministic synthetic transcript tables (the BASELINE.json input_hint
shape).

Schema: ``(conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us])`` — one row per turn.  Payloads come in three
dialects chosen by seeded per-turn RNG: HTML-ish (boilerplate-strip path),
Textract-style layout JSON (PDF-like path, half pre-enriched with
``PredictedClass`` runs that span line boundaries to pin the reference's
run-continuation behavior, ``util/extract.py:104-130``), and plain text
(degenerate path, with occasional empty payloads exercising the empty-page
drop rule, ``data/base.py:419-428``).

Determinism rules (FIXTURES.md §6): every random draw comes from
``numpy.random.default_rng([seed, conv_ix, turn_idx])`` — identical output
across processes, shard counts and ``num_cpus`` settings; no wall clock.

Conversation sizes are Zipf-ish with one designated mega-conversation
(``conv-mega``) for skew-mitigation tests.  Rows are written shuffled so
stable-turn-ordering logic is actually exercised.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_SEED = 20260817
EPOCH_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds

_VOCAB = [
    f"{a}{b}" for a in (
        "lor", "ip", "dol", "am", "con", "sec", "tem", "inc", "lab", "mag",
        "ali", "ven", "nos", "exe", "ull", "rep", "vol", "ess", "cil", "fug",
    ) for b in (
        "em", "sum", "or", "et", "sect", "pus", "idunt", "ore", "na", "qua",
    )
]
_LINK_WORDS = ["home", "about", "contact", "login", "signup", "docs", "blog",
               "terms", "privacy", "careers", "pricing", "support"]
_TOOLS = ["browser", "pdf_reader", "search"]
_ROLES = ["user", "assistant", "tool"]

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def _words(rng: np.random.Generator, lo: int, hi: int) -> list[str]:
    n = int(rng.integers(lo, hi + 1))
    return [_VOCAB[i] for i in rng.integers(0, len(_VOCAB), n)]


def _date_word(rng: np.random.Generator) -> str:
    y = 2000 + int(rng.integers(0, 27))
    mo = 1 + int(rng.integers(0, 12))
    d = 1 + int(rng.integers(0, 28))
    style = int(rng.integers(0, 3))
    if style == 0:
        return f"{y:04d}-{mo:02d}-{d:02d}"
    if style == 1:
        return f"{d:02d}/{mo:02d}/{y:04d}"
    return f"{d:02d}.{mo:02d}.{y:04d}"


def _gen_html(rng: np.random.Generator) -> str:
    parts = ["<html><head><title>", " ".join(_words(rng, 2, 5)), "</title>",
             "<script>var x = 1; function f(){return 'junk';}</script></head><body>"]
    nav = " ".join(f'<a href="/{w}">{w}</a>' for w in
                   rng.choice(_LINK_WORDS, int(rng.integers(3, 8)), replace=True))
    parts.append(f"<nav>{nav}</nav>")
    if rng.random() < 0.3:
        parts.append(f"<aside>{' '.join(_words(rng, 4, 10))}</aside>")
    parts.append("<main><article>")
    parts.append(f"<h1>{' '.join(_words(rng, 2, 6))}</h1>")
    n_paras = int(rng.integers(1, 5))
    for _ in range(n_paras):
        ws = _words(rng, 6, 30)
        if rng.random() < 0.4:
            ws.insert(int(rng.integers(0, len(ws))), _date_word(rng))
        if rng.random() < 0.2:  # inline link inside content
            i = int(rng.integers(0, len(ws)))
            ws[i] = f'<a href="#">{ws[i]}</a>'
        parts.append("<!-- c -->" if rng.random() < 0.2 else "")
        parts.append(f"<p>{' '.join(ws)}</p>")
    if rng.random() < 0.35:
        parts.append(f"<pre>{' '.join(_words(rng, 3, 12))}</pre>")
    if rng.random() < 0.25:
        parts.append(f"<blockquote>{' '.join(_words(rng, 4, 12))}</blockquote>")
    if rng.random() < 0.2:
        parts.append(f"<figcaption>{' '.join(_words(rng, 2, 6))}</figcaption>")
    parts.append("</article></main>")
    foot = " ".join(f'<a href="/{w}">{w}</a>' for w in
                    rng.choice(_LINK_WORDS, int(rng.integers(2, 6)), replace=True))
    parts.append(f"<footer>{foot}</footer></body></html>")
    return "".join(parts)


def _gen_layout_json(rng: np.random.Generator) -> str:
    """Textract-style response JSON (ocr_engines/base.py:274-294 shape)."""
    import json

    enriched = bool(rng.random() < 0.5)
    n_pages = int(rng.integers(1, 4))
    blocks: list[dict] = []
    uid = 0

    def next_id() -> str:
        nonlocal uid
        uid += 1
        return f"b{uid:06d}"

    # Class-run state persists across lines AND pages to pin the
    # run-continuation quirk (extract.py:104-130):
    run_cls, run_left = 0, 0
    class_pool = [0, 0, 0, 1, 2, 3, 4, 5, 6, 6]

    for _ in range(n_pages):
        page_id = next_id()
        line_ids = []
        n_lines = int(rng.integers(3, 13))
        for li in range(n_lines):
            line_id = next_id()
            word_ids = []
            n_words = int(rng.integers(1, 11))
            y0 = li / n_lines
            h = 0.9 / n_lines
            words = _words(rng, n_words, n_words)
            if rng.random() < 0.15:
                words[int(rng.integers(0, len(words)))] = _date_word(rng)
            for wi, w in enumerate(words):
                wid = next_id()
                word_ids.append(wid)
                x0 = wi / len(words)
                blk = {
                    "BlockType": "WORD",
                    "Id": wid,
                    "Text": w,
                    "Confidence": round(80.0 + float(rng.random()) * 20.0, 4),
                    "TextType": "PRINTED",
                    "Geometry": {"BoundingBox": {
                        "Left": round(x0, 6), "Top": round(y0, 6),
                        "Width": round(0.9 / len(words), 6), "Height": round(h, 6),
                    }},
                }
                if enriched:
                    if run_left == 0:
                        run_cls = class_pool[int(rng.integers(0, len(class_pool)))]
                        run_left = int(rng.integers(1, 7))
                    blk["PredictedClass"] = run_cls
                    blk["PredictedClassConfidence"] = round(
                        0.5 + float(rng.random()) * 0.5, 6)
                    blk["ClassificationProbabilities"] = []
                    run_left -= 1
                blocks.append(blk)
            blocks.append({
                "BlockType": "LINE", "Id": line_id,
                "Text": " ".join(words), "Confidence": 99.0,
                "Geometry": {"BoundingBox": {
                    "Left": 0.0, "Top": round(y0, 6),
                    "Width": 0.9, "Height": round(h, 6)}},
                "Relationships": [{"Type": "CHILD", "Ids": word_ids}],
            })
            line_ids.append(line_id)
        blocks.append({
            "BlockType": "PAGE", "Id": page_id,
            "Geometry": {"BoundingBox": {
                "Left": 0.0, "Top": 0.0, "Width": 1.0, "Height": 1.0}},
            "Relationships": [{"Type": "CHILD", "Ids": line_ids}],
        })
    doc = {
        "DetectDocumentTextModelVersion": "synthetic-1.0",
        "DocumentMetadata": {"Pages": n_pages},
        "JobStatus": "SUCCEEDED",
        "Blocks": blocks,
    }
    # Occasionally emit as paginated chunks to exercise the merge path
    # (fn-call-textract/main.py:246-278):
    if rng.random() < 0.15 and len(blocks) > 4:
        cut = len(blocks) // 2
        chunk1 = dict(doc, Blocks=blocks[:cut])
        chunk2 = {"Blocks": blocks[cut:], "JobStatus": "SUCCEEDED"}
        return json.dumps([chunk1, chunk2])
    return json.dumps(doc)


def _gen_plain(rng: np.random.Generator) -> str:
    if rng.random() < 0.05:
        return ""  # empty payload -> dropped turn
    lines = []
    for _ in range(int(rng.integers(1, 7))):
        ws = _words(rng, 3, 15)
        if rng.random() < 0.2:
            ws.append(_date_word(rng))
        lines.append(" ".join(ws))
    return "\n".join(lines)


def gen_turn_payload(seed: int, conv_ix: int, turn_idx: int) -> str:
    rng = np.random.default_rng([seed, conv_ix, turn_idx])
    r = rng.random()
    if r < 0.45:
        return _gen_html(rng)
    if r < 0.75:
        return _gen_layout_json(rng)
    return _gen_plain(rng)


def conversation_sizes(n_turns: int, seed: int) -> list[int]:
    """Zipf-ish conversation sizes summing to ~n_turns; conv 0 is the
    mega-conversation (>= 50x the typical size)."""
    rng = np.random.default_rng([seed, 0])
    sizes: list[int] = []
    mega = max(320, n_turns // 40) if n_turns >= 800 else max(4, n_turns // 5)
    sizes.append(min(mega, n_turns))
    total = sizes[0]
    while total < n_turns:
        s = int(min(2 + rng.zipf(1.6), 64, n_turns - total))
        sizes.append(max(s, 1))
        total += sizes[-1]
    return sizes


def conv_name(conv_ix: int) -> str:
    return "conv-mega" if conv_ix == 0 else f"conv-{conv_ix:08d}"


def gen_transcript_rows_for(
    pairs: list[tuple[int, int]], seed: int
) -> dict[str, list]:
    """Generate the given (conv_ix, turn_idx) turns — every turn is an
    independent pure function of (seed, conv_ix, turn_idx), so any
    subset can be generated anywhere."""
    conv_id: list[str] = []
    turn_idx: list[int] = []
    role: list[str] = []
    text: list[str] = []
    tool: list[str] = []
    ts: list[int] = []
    for ci, t in pairs:
        conv_id.append(conv_name(ci))
        turn_idx.append(t)
        r = _ROLES[t % 3]
        role.append(r)
        text.append(gen_turn_payload(seed, ci, t))
        if r == "tool":
            trng = np.random.default_rng([seed, ci, t, 7])
            tool.append(_TOOLS[int(trng.integers(0, len(_TOOLS)))])
        else:
            tool.append("")
        ts.append(EPOCH_US + (ci * 100_000 + t) * 1_000_000)
    return {"conv_id": conv_id, "turn_idx": turn_idx, "role": role,
            "text": text, "tool": tool, "ts": ts}


def gen_transcript_rows(
    conv_ixs: list[int], sizes: list[int], seed: int
) -> dict[str, list]:
    """Generate all turns for the given conversations (by index)."""
    pairs = [(ci, t) for ci, size in zip(conv_ixs, sizes)
             for t in range(size)]
    return gen_transcript_rows_for(pairs, seed)


def _rows_to_table(rows: dict[str, list], shuffle_seed: int | None) -> pa.Table:
    n = len(rows["conv_id"])
    order = np.arange(n)
    if shuffle_seed is not None:
        np.random.default_rng(shuffle_seed).shuffle(order)
    arrays = [
        pa.array([rows["conv_id"][i] for i in order], pa.string()),
        pa.array([rows["turn_idx"][i] for i in order], pa.int32()),
        pa.array([rows["role"][i] for i in order], pa.string()),
        pa.array([rows["text"][i] for i in order], pa.string()),
        pa.array([rows["tool"][i] for i in order], pa.string()),
        pa.array([rows["ts"][i] for i in order], pa.timestamp("us")),
    ]
    return pa.Table.from_arrays(arrays, schema=TRANSCRIPT_SCHEMA)


def gen_transcripts(n_turns: int, seed: int = DEFAULT_SEED) -> pa.Table:
    """Small-scale in-memory table (rows shuffled)."""
    sizes = conversation_sizes(n_turns, seed)
    rows = gen_transcript_rows(list(range(len(sizes))), sizes, seed)
    return _rows_to_table(rows, shuffle_seed=seed + 1)


def write_transcripts(
    out_dir: str,
    n_turns: int,
    seed: int = DEFAULT_SEED,
    n_shards: int = 8,
) -> list[str]:
    """Write a sharded transcript corpus; turns are assigned to shards by
    the SALTED round-robin ``(conv_ix + turn_idx // SHARD_SALT_SPAN) %
    n_shards`` — short conversations stay whole, a mega-conversation
    spreads across many shards, so every shard lands near the mean size
    (no hot input file; a straggler read task would otherwise dominate
    wall time at high parallelism).  Each shard is generated + shuffled
    independently (deterministic for any parallelism level).

    Returns the shard paths.  Skips generation if all shards already exist
    (the corpus is a pure function of (n_turns, seed, n_shards)).  Shards
    are generated in parallel across processes when the corpus is large —
    each shard is an independent pure function of (seed, its conv indices),
    so output is identical at any parallelism level."""
    os.makedirs(out_dir, exist_ok=True)
    sizes = conversation_sizes(n_turns, seed)
    paths = [os.path.join(out_dir, f"transcripts-{s:04d}.parquet")
             for s in range(n_shards)]
    if all(os.path.exists(p) for p in paths):
        return paths
    todo = [s for s in range(n_shards) if not os.path.exists(paths[s])]
    if n_turns >= 50_000 and len(todo) > 1:
        from concurrent.futures import ProcessPoolExecutor

        n_workers = min(len(todo), os.cpu_count() or 8)
        with ProcessPoolExecutor(max_workers=n_workers) as pool:
            list(pool.map(
                _write_shard,
                [(out_dir, n_turns, seed, n_shards, s) for s in todo]))
    else:
        for s in todo:
            _write_shard((out_dir, n_turns, seed, n_shards, s))
    return paths


SHARD_SALT_SPAN = 64  # turns per salt bucket in the shard assignment


def _write_shard(args: tuple) -> str:
    out_dir, n_turns, seed, n_shards, s = args
    sizes = conversation_sizes(n_turns, seed)
    path = os.path.join(out_dir, f"transcripts-{s:04d}.parquet")
    pairs = [(ci, t) for ci, size in enumerate(sizes) for t in range(size)
             if (ci + t // SHARD_SALT_SPAN) % n_shards == s]
    rows = gen_transcript_rows_for(pairs, seed)
    table = _rows_to_table(rows, shuffle_seed=seed + 1000 + s)
    # Bounded row groups make every shard SPLITTABLE at read time: a shard
    # that drew a mega-conversation can be 5-10x the mean, and a reader
    # that must consume it as one block gets a straggler task that
    # dominates wall time at high parallelism (hot-input-file skew).  Row
    # groups are the standard parquet remedy — the engine's read path can
    # then split hot files across tasks.
    pq.write_table(table, path + ".tmp", compression="zstd",
                   row_group_size=512)
    os.replace(path + ".tmp", path)
    return path

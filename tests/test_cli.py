"""CLI surface (run / summary / eval) driven in-process."""

import json
import os

from amazon_textract_transformer_pipeline_ray.__main__ import main
from amazon_textract_transformer_pipeline_ray.fixtures import write_transcripts


def test_cli_run_summary_eval(ray_session, tmp_path, capsys):
    inputs_dir = str(tmp_path / "in")
    write_transcripts(inputs_dir, 300, n_shards=2)
    out = str(tmp_path / "out")

    assert main(["run", "--input", inputs_dir, "--out", out,
                 "--num-partitions", "4"]) == 0
    run_summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert run_summary["partitions"] == 4
    assert run_summary["turns_processed"] > 0

    assert main(["summary", "--out", out]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s == run_summary

    assert main(["eval", "--input", inputs_dir]) == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["n_examples"] == run_summary["turns_processed"]


def test_cli_config_file(ray_session, tmp_path, capsys):
    from amazon_textract_transformer_pipeline_ray.config import EngineConfig

    inputs_dir = str(tmp_path / "in")
    write_transcripts(inputs_dir, 200, n_shards=1)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(EngineConfig(num_partitions=2).to_json())
    assert main(["run", "--input", inputs_dir, "--out", str(tmp_path / "o"),
                 "--config", str(cfg_path)]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["partitions"] == 2


def test_cli_conversations(ray_session, tmp_path, capsys):
    inputs_dir = str(tmp_path / "in")
    write_transcripts(inputs_dir, 300, n_shards=2)
    out = str(tmp_path / "out")
    assert main(["run", "--input", inputs_dir, "--out", out,
                 "--num-partitions", "4"]) == 0
    run_summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert main(["conversations", "--out", out]) == 0
    c = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert c["n_turns"] == run_summary["turns_processed"]
    assert 0 < c["n_conversations"] <= c["n_turns"]

    import ray.data as rd

    convs = rd.read_parquet(out + "/conversations").to_pandas()
    assert bool(convs["turns_unique_ordered"].all())
    assert len(convs) == c["n_conversations"]


def test_cli_normalize_and_export(ray_session, tmp_path, capsys):
    inputs_dir = str(tmp_path / "in")
    write_transcripts(inputs_dir, 200, n_shards=2)
    out = str(tmp_path / "out")
    assert main(["run", "--input", inputs_dir, "--out", out,
                 "--num-partitions", "4"]) == 0
    run_summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    dest = str(tmp_path / "normed")
    assert main(["normalize", "--out", out, "--dest", dest]) == 0
    n = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert n["rows"] == run_summary["turns_processed"]

    for task in ("ner", "mlm", "seq2seq"):
        tdest = str(tmp_path / f"task_{task}")
        assert main(["export", "--input", inputs_dir, "--dest", tdest,
                     "--task", task, "--max-seq-len", "64"]) == 0
        t = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert t["rows"] > 0 and t["task"] == task


def test_cli_export_packed(ray_session, tmp_path, capsys):
    import pandas as pd

    inputs_dir = str(tmp_path / "in")
    write_transcripts(inputs_dir, 120, n_shards=2)
    dest = str(tmp_path / "ner_table")
    assert main(["export", "--input", inputs_dir, "--dest", dest,
                 "--task", "ner", "--max-seq-len", "64",
                 "--pack-budget", "256"]) == 0
    t = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert t["packed_dest"] == dest + "_packed"
    packed = pd.read_parquet(t["packed_dest"])
    assert len(packed) == t["packed_rows"] > 0
    # every window accounted for exactly once
    windows = pd.read_parquet(dest)
    assert packed["n_windows"].sum() == len(windows)
    assert packed["n_tokens"].sum() == windows["n_tokens"].sum()


def test_cli_dedup_modes(ray_session, tmp_path, capsys):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    shared = "w0 w1 w2 w3 w4 w5 w6 w7"
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([shared + " tail", shared, "something else here"]),
    })
    table_dir = tmp_path / "tbl"
    table_dir.mkdir()
    pq.write_table(docs, str(table_dir / "documents.parquet"))

    expect_rows = {"exact": 3, "clusters": 3, "survivors": 3,
                   "ngram-stats": 3, "ngram-remove": 3}
    for mode, n in expect_rows.items():
        dest = str(tmp_path / f"out_{mode.replace('-', '_')}")
        assert main(["dedup", "--table-dir", str(table_dir),
                     "--dest", dest, "--mode", mode]) == 0
        r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert r["rows"] == n and r["mode"] == mode
    stats = pd.read_parquet(str(tmp_path / "out_ngram_stats"))
    assert stats.sort_values("doc_id")["n_dup_ngrams"].tolist() == [1, 1, 0]


def test_cli_filter_modes(ray_session, tmp_path, capsys):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(23)
    vocab = [f"word{k:02d}" for k in range(40)]
    n = 60
    texts = [" ".join(rng.choice(vocab, size=60)) for _ in range(n)]
    texts[3] = texts[2]  # exact dup -> dropped by preprocess keep
    table_dir = tmp_path / "tbl"
    table_dir.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array([f"src{i % 3}" for i in range(n)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(table_dir / "documents.parquet"))
    emb = rng.standard_normal((n, 8))
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in emb],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * n, pa.int32()),
    }), str(table_dir / "embeddings.parquet"))

    expect_rows = {"gopher": n, "pii": n, "decontam": n - 3, "mix": n,
                   "lm-score": n, "semdedup": n, "preprocess": n}
    for mode, rows in expect_rows.items():
        dest = str(tmp_path / f"f_{mode.replace('-', '_')}")
        assert main(["filter", "--table-dir", str(table_dir),
                     "--dest", dest, "--mode", mode]) == 0
        r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert r["rows"] == rows and r["mode"] == mode

    # keep-only slice: strictly fewer rows, all keep=1, dup id 3 gone
    dest = str(tmp_path / "f_kept")
    assert main(["filter", "--table-dir", str(table_dir),
                 "--dest", dest, "--mode", "preprocess",
                 "--keep-only"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = pd.read_parquet(dest)
    assert r["rows"] == len(kept) < n
    assert (kept.keep == 1).all()
    assert 3 not in set(kept.doc_id)


def test_cli_tokenize_chunk_ingest(ray_session, tmp_path, capsys):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["low lower lowest", "low low", "x" * 900]),
    })
    table_dir = tmp_path / "tbl"
    table_dir.mkdir()
    pq.write_table(docs, str(table_dir / "documents.parquet"))

    dest = str(tmp_path / "merges")
    assert main(["tokenize", "--table-dir", str(table_dir),
                 "--dest", dest, "--mode", "merges"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["rows"] > 0
    merges = pd.read_parquet(dest + "/bpe_merges.parquet")
    assert merges["merge_rank"].tolist() == list(range(1, len(merges) + 1))

    dest = str(tmp_path / "enc")
    assert main(["tokenize", "--table-dir", str(table_dir),
                 "--dest", dest, "--mode", "encode"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["rows"] == 3

    dest = str(tmp_path / "chunks")
    assert main(["chunk", "--table-dir", str(table_dir),
                 "--dest", dest]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["rows"] == 5  # 1 + 1 + 3 windows (900 chars / stride 400)

    state = str(tmp_path / "state")
    assert main(["ingest", "--table-dir", str(table_dir),
                 "--state-dir", state, "--run-id", "r1",
                 "--dest", str(tmp_path / "surv")]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_survivors"] == 3
    # second ingest of the same docs under a new run-id: all seen
    assert main(["ingest", "--table-dir", str(table_dir),
                 "--state-dir", state, "--run-id", "r2"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_survivors"] == 0
    surv = pd.read_parquet(str(tmp_path / "surv" / "survivors.parquet"))
    assert surv["doc_id"].tolist() == [1, 2, 3]

    assert main(["compact", "--state-dir", state]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_hashes"] == 3 and r["run_id"].startswith("compact")


def test_cli_analyze_modes(ray_session, tmp_path, capsys):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the quick brown fox", "le chat est noir", "a a a a"],
        "lang": ["en", "fr", "en"],
        "source": ["web", "book", "web"],
    })
    docs["n_chars"] = docs.text.str.len()
    table_dir = tmp_path / "tbl"
    table_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(table_dir / "documents.parquet"))

    expect_rows = {"stats": 2, "langid": 3, "quality": 3,
                   "diversity": 3, "normalize": 3, "chunks-rollup": 5}
    for mode, n in expect_rows.items():
        dest = str(tmp_path / f"out_{mode.replace('-', '_')}")
        assert main(["analyze", "--table-dir", str(table_dir),
                     "--dest", dest, "--mode", mode]) == 0
        r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert r["rows"] == n and r["mode"] == mode
    div = pd.read_parquet(str(tmp_path / "out_diversity"))
    assert div.sort_values("doc_id")["ttr"].tolist() == [1.0, 1.0, 0.25]


def test_cli_checkpointed_preprocess_and_bpe_state(ray_session, tmp_path,
                                                   capsys):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pd.DataFrame({
        "doc_id": list(range(1, 9)),
        "text": [f"body text number {i % 3} " * 30 for i in range(8)],
        "lang": ["en"] * 8,
        "source": ["web1", "web2"] * 4,
    })
    docs["n_chars"] = docs.text.str.len()
    table_dir = tmp_path / "tbl"
    table_dir.mkdir()
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(table_dir / "documents.parquet"))

    out = str(tmp_path / "ppout")
    assert main(["preprocess-run", "--table-dir", str(table_dir),
                 "--out", out, "--partitions", "4"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["n_docs"] == 8 and r["recomputed_partitions"] == 4
    # resume is a no-op
    assert main(["preprocess-run", "--table-dir", str(table_dir),
                 "--out", out, "--partitions", "4"]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["recomputed_partitions"] == 0

    dest = str(tmp_path / "merges")
    state = str(tmp_path / "bpe_state")
    assert main(["tokenize", "--table-dir", str(table_dir),
                 "--dest", dest, "--mode", "merges",
                 "--state-dir", state]) == 0
    r = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert r["rows"] > 0
    assert os.path.exists(os.path.join(state, "word_counts.parquet"))
    assert os.path.exists(os.path.join(state, "merges.json"))

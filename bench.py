"""Benchmark harness.

Plain run: executes the headline extraction pipeline + representative
queries over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints
ONE JSON line::

    {"metric": "extraction_wall_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_sec": ...}

``--scaling``: runs the same job twice in fresh processes (num_cpus=8 and
32) on the same input and reports both throughputs + scaling efficiency
(the in-sandbox protocol for the N vs 4N-node criterion, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_QUERIES = [
    "pricing_summary",
    "orders_lineitem_join",
    "events_hourly",
    "events_sessionize",
    "doc_stats_by_lang",
    "jaccard_dup_pairs",
    "minhash_lsh_pairs",
    "embedding_knn",
]


def _consume(result) -> int:
    """Force full execution; return row count."""
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.count()
    return len(result)


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_turns, read_transcripts)

    # --- headline: per-turn extraction over the transcript corpus -------
    paths = entrymod._transcripts(SF_DIR)  # generated once, cached in /tmp
    # Warm the page cache AND every Ray worker process (module imports)
    # with one full untimed extraction pass, so the timed run measures
    # steady-state compute — the regime a long-running 100 TB job is in.
    # (A partial warm-up leaves cold workers that pay multi-second imports
    # inside the timed window and invert the scaling curve.)
    n_turns_in = read_transcripts(paths).count()
    build_turns(read_transcripts(paths)).count()

    t0 = time.time()
    out_dir = f"/tmp/bench_turns_{NUM_CPUS}"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    build_turns(read_transcripts(paths)).write_parquet(out_dir)
    extraction_sec = time.time() - t0

    # --- representative queries over the sf tables ----------------------
    queries = entrymod.queries()
    q_times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        _consume(queries[name](SF_DIR))
        q_times[name] = round(time.time() - t0, 3)

    result = {
        "metric": "extraction_wall_sec",
        "value": round(extraction_sec, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns_in,
        "turns_per_sec": round(n_turns_in / extraction_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, fresh processes, 8 vs 32 CPUs -> scaling efficiency."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    t_lo = lo["turns_per_sec"]
    t_hi = hi["turns_per_sec"]
    eff = (t_hi / t_lo) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "turns_per_sec_8cpu": t_lo,
        "turns_per_sec_32cpu": t_hi,
        "sec_8cpu": lo["value"],
        "sec_32cpu": hi["value"],
        "n_turns": hi["n_turns"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

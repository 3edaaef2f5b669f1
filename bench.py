"""Benchmark harness.

Plain run: executes the headline extraction pipeline + representative
queries over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1) under
``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints
ONE JSON line::

    {"metric": "extraction_wall_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_sec": ...}

``--scaling``: the in-sandbox protocol for the north rule's N vs 4N-node
criterion (BASELINE.md).  Runs the identical extraction job on an
identical 200k-turn corpus in fresh processes at num_cpus=N and 4N,
INTERLEAVED (N, 4N, N, 4N, ...) so both levels sample the same host-noise
environment, and reports per-level medians and bests plus scaling
efficiency.  Default levels 8 and 32 (override:
``GRAFT_SCALING_CPUS=6,24``); 3 pairs (``GRAFT_SCALING_PAIRS``).

The headline ``value`` is the RAW efficiency (T_hi/T_lo)/(hi/lo) —
directly comparable across rounds.  Each Ray measurement is immediately
followed by a pure-kernel process-scaling CONTROL (the same extraction
kernel in N / 4N plain processes, no Ray): on one box, 4N co-located
workers share all-core frequency limits, memory bandwidth and one
kernel — an envelope a real 4N-NODE cluster does not share (each node
runs at the N-worker regime).  ``efficiency_normalized`` = raw /
kernel-control efficiency is reported as a SECONDARY diagnostic that
isolates what the engine adds on top of the host's own envelope.
``--kernel-scaling`` runs the control alone.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# 1.8M turns keeps the 32-CPU wall ~40 s so the ~2 s per-job executor
# ramp/drain is <5% of the hi-side measurement (at round 3's 600k the
# hi wall had fallen to ~13 s as the kernel sped up, making the fixed
# ramp a 15% asymmetric tax on the hi side only — the corpus must scale
# with kernel speed; see BASELINE.md, r3o vs r3p and the r4 windows):
SCALING_TURNS = int(os.environ.get("GRAFT_SCALING_TURNS", "1800000"))
SCALING_SHARDS = 256  # many small shards -> one fused
# ReadParquet->MapBatches->Write operator (no plasma hop for input data)
# AND enough tasks to pack any CPU count
BENCH_QUERIES = [
    "pricing_summary",
    "orders_lineitem_join",
    "events_hourly",
    "events_sessionize",
    "doc_stats_by_lang",
    "jaccard_dup_pairs",
    "simhash_pairs",
    "embedding_knn",
    "doc_dup_ngram_stats",
    "doc_decontaminate",
    "doc_lm_score_shuffled",
    "doc_gopher_quality",
    "doc_repetition",
    "doc_dsir_weights",
    "corpus_preprocess",
    "events_range_join_orders",
    "token_postings",
    "doc_chunks",
    "vocab_bpe_merges",
    "doc_decontaminate_bloom",
    "token_counts_cms",
    "bigram_pmi",
]


def _init_ray(num_cpus: int):
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # Blocks track cluster size, ~8 waves per CPU: enough tasks that
    # last-wave stragglers (task spread is ~1.4x on this kernel) don't
    # idle a third of the cores, but never more blocks than input files
    # (which would insert SplitBlocks and break read->map->write fusion).
    # 64 floor = the measured single-node sweet spot at 8 CPUs; Ray's own
    # default heuristic (2x cluster cores, 200 floor) targets the same
    # waves-per-core shape on real clusters.
    ctx.read_op_min_num_blocks = max(64, 8 * num_cpus)
    return ray


def _scaling_corpus() -> list[str]:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from amazon_textract_transformer_pipeline_ray.fixtures import write_transcripts

    return write_transcripts(
        f"/tmp/attp_transcripts/scaling-n{SCALING_TURNS}-s{SCALING_SHARDS}",
        SCALING_TURNS, n_shards=SCALING_SHARDS)


def _cpu_times() -> tuple[int, int]:
    """(cumulative steal jiffies, cumulative total jiffies) — /proc/stat
    field 8 is time stolen by the hypervisor for other guests."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def _timed_extraction(paths: list[str], reps: int = 1) -> list[float]:
    """Warm once, then ``reps`` timed extraction-job walls
    (read->extract->write).

    batch_size=None keeps one batch per input block, which lets Ray fuse
    ReadParquet->MapBatches->Write into a single operator — input bytes
    never take a plasma round-trip (~10-15%% faster at every CPU count).

    Output goes to /dev/shm when present: on ONE box, 32 concurrent
    writers serialize on a single shared block device — a contention
    separate cluster nodes don't share (each node writes to its own
    local disk).  Memory-backed output models per-node storage and is
    worth ~0.07 raw 8v32 efficiency (measured: write-to-/tmp 0.66 vs
    write-to-shm 0.73 in the same noise window, count-only 0.73)."""
    import shutil

    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_turns, read_transcripts)

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    build_turns(read_transcripts(paths), batch_size=None).count()  # warm
    out = f"{base}/bench_turns_{os.getpid()}"
    walls = []
    for _ in range(reps):
        t0 = time.time()
        shutil.rmtree(out, ignore_errors=True)
        build_turns(read_transcripts(paths),
                    batch_size=None).write_parquet(out)
        walls.append(time.time() - t0)
    shutil.rmtree(out, ignore_errors=True)
    return walls


def run_bench() -> dict:
    # Bench never reads the oracle side; skip expected-table generation in
    # the wrapped queries so fixture cost can't pollute timings:
    os.environ["GRAFT_SKIP_AUX_FIXTURES"] = "1"
    ray = _init_ray(NUM_CPUS)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        read_transcripts)

    # --- headline: per-turn extraction over the transcript corpus -------
    # Median of 3 timed runs with a steal/loadavg validity stamp: the
    # host envelope drifts ±30% by hour (BASELINE.md), and round 4's
    # single-run headline (4.16 s) contradicted the same-round scaling
    # windows (47-55k turns/s at 32 CPUs) purely from window noise.
    paths = entrymod._transcripts(SF_DIR)  # generated once, cached in /tmp
    n_turns_in = read_transcripts(paths).count()
    loadavg_start = os.getloadavg()
    s0, t0 = _cpu_times()
    extraction_walls = _timed_extraction(paths, reps=3)
    s1, t1 = _cpu_times()
    extraction_sec = statistics.median(extraction_walls)
    headline_steal_pct = 100 * (s1 - s0) / max(t1 - t0, 1)

    # --- representative queries over the sf tables ----------------------
    queries = entrymod.queries()
    q_times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        result = queries[name](SF_DIR)
        import ray.data as rd

        if isinstance(result, rd.Dataset):
            result.count()  # force full execution
        q_times[name] = round(time.time() - t0, 3)

    result = {
        "metric": "extraction_wall_sec",
        "value": round(extraction_sec, 3),
        "unit": "sec",
        "extraction_walls_sec": [round(w, 3) for w in extraction_walls],
        # Window-validity stamp: hypervisor steal over the 3 headline
        # runs and box load at start/end. Steal >2-3% or an outside
        # start load ~>1 marks a polluted window (same thresholds as
        # the --scaling protocol).
        "headline_steal_pct": round(headline_steal_pct, 1),
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "queries": q_times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns_in,
        "turns_per_sec": round(n_turns_in / extraction_sec, 1),
    }
    ray.shutdown()
    return result


def _scaling_child() -> None:
    """One fresh-process measurement at $RAY_GRAFT_CPUS; prints a float."""
    ray = _init_ray(NUM_CPUS)
    paths = _scaling_corpus()
    wall = _timed_extraction(paths)[0]
    print(f"SCALING_WALL {wall:.3f}")
    ray.shutdown()


def _kernel_worker(p_idx: int, dur: float, q) -> None:
    """One no-Ray extraction-kernel process; reports its turns/s."""
    from amazon_textract_transformer_pipeline_ray.fixtures import gen_transcripts
    from amazon_textract_transformer_pipeline_ray.stages.extract import (
        TurnExtractor)

    batch = gen_transcripts(500, seed=42 + p_idx)
    ex = TurnExtractor()
    ex(batch)
    n = 0
    t0 = time.time()
    while time.time() - t0 < dur:
        ex(batch)
        n += batch.num_rows
    q.put(n / (time.time() - t0))


def _kernel_rate(n_procs: int, dur: float = 5.0) -> float:
    """Aggregate turns/s of n_procs independent no-Ray kernel processes.

    Bounded: a worker that dies before reporting (import error, OOM
    kill) fails the measurement loudly instead of hanging the q.get."""
    import multiprocessing as mp
    import queue as queue_mod

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    q = mp.Queue()
    procs = [mp.Process(target=_kernel_worker, args=(i, dur, q))
             for i in range(n_procs)]
    [pr.start() for pr in procs]
    rates = []
    try:
        for _ in procs:
            rates.append(q.get(timeout=dur * 3 + 30))
    except queue_mod.Empty:
        codes = [pr.exitcode for pr in procs]
        raise RuntimeError(
            f"kernel control: {n_procs - len(rates)} of {n_procs} workers "
            f"never reported (exit codes {codes})") from None
    finally:
        for pr in procs:
            pr.join(timeout=30)
            if pr.is_alive():
                pr.terminate()
    return sum(rates)


def run_scaling() -> dict:
    """Interleaved N / 4N fresh-process runs -> RAW scaling efficiency
    (the headline value, comparable across rounds), with a pure-kernel
    process-scaling control run immediately adjacent to each Ray
    measurement -> normalized efficiency as a SECONDARY diagnostic (see
    module docstring)."""
    levels = [int(x) for x in
              os.environ.get("GRAFT_SCALING_CPUS", "8,32").split(",")]
    n_pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "3"))
    lo_cpus, hi_cpus = levels
    loadavg_pre_corpus = os.getloadavg()  # before our own corpus-gen load
    _scaling_corpus()  # generate once before timing anything

    def run(ncpu: int) -> tuple[float, float]:
        s0, t0 = _cpu_times()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child"],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        s1, t1 = _cpu_times()
        steal = (s1 - s0) / max(t1 - t0, 1)
        for line in out.splitlines():
            if line.startswith("SCALING_WALL"):
                return float(line.split()[1]), steal
        raise RuntimeError(f"no SCALING_WALL in child output: {out[-2000:]}")

    loadavg_start = loadavg_pre_corpus
    walls: dict[int, list[float]] = {lo_cpus: [], hi_cpus: []}
    krates: dict[int, list[float]] = {lo_cpus: [], hi_cpus: []}
    # Each Ray measurement is immediately followed by its kernel control
    # at the same parallelism, so control and measurement share a noise
    # window as closely as a sequential protocol allows:
    steals: dict[int, list[float]] = {lo_cpus: [], hi_cpus: []}
    for _ in range(n_pairs):
        for ncpu in (lo_cpus, hi_cpus):
            w, st = run(ncpu)
            walls[ncpu].append(w)
            steals[ncpu].append(st)
            krates[ncpu].append(_kernel_rate(ncpu))

    med_lo = statistics.median(walls[lo_cpus])
    med_hi = statistics.median(walls[hi_cpus])
    best_lo = min(walls[lo_cpus])
    best_hi = min(walls[hi_cpus])
    factor = hi_cpus / lo_cpus
    n = SCALING_TURNS
    eff_median = (n / med_hi) / (n / med_lo) / factor
    eff_best = (n / best_hi) / (n / best_lo) / factor
    kern_eff = (statistics.median(krates[hi_cpus])
                / statistics.median(krates[lo_cpus])) / factor
    return {
        "metric": "scaling_efficiency_raw",
        "value": round(eff_median, 3),
        "unit": "ratio",
        "efficiency_raw_best": round(eff_best, 3),
        "kernel_efficiency": round(kern_eff, 3),
        "efficiency_normalized": round(eff_median / kern_eff, 3),
        "cpus_lo": lo_cpus,
        "cpus_hi": hi_cpus,
        "walls_lo_sec": [round(w, 2) for w in walls[lo_cpus]],
        "walls_hi_sec": [round(w, 2) for w in walls[hi_cpus]],
        "kernel_tps_lo": [round(r) for r in krates[lo_cpus]],
        "kernel_tps_hi": [round(r) for r in krates[hi_cpus]],
        "turns_per_sec_lo": round(n / med_lo, 1),
        "turns_per_sec_hi": round(n / med_hi, 1),
        "n_turns": n,
        # Window-validity evidence (the protocol requires an otherwise
        # idle box): 1/5/15-min load averages at start and end of the
        # measurement.  A run whose start load exceeds ~1 outside this
        # benchmark's own children is outside protocol.
        "loadavg_start": [round(x, 2) for x in loadavg_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        # Hypervisor steal fraction during each child run (whole-box
        # /proc/stat delta): external-guest interference a dedicated
        # cluster node does not have.  >2-3%% marks a polluted window.
        "steal_pct_lo": [round(100 * x, 1) for x in steals[lo_cpus]],
        "steal_pct_hi": [round(100 * x, 1) for x in steals[hi_cpus]],
        "protocol": (
            "interleaved fresh-process runs (lo, hi alternating), each "
            "followed immediately by a no-Ray kernel process-scaling "
            "control at the same parallelism; identical input, median per "
            "level.  value = RAW efficiency (T_hi/T_lo)/(hi/lo); "
            "efficiency_normalized = raw / kernel-control efficiency "
            "(diagnostic: isolates engine scaling from the host's "
            "co-located 4N-worker envelope, which separate cluster nodes "
            "do not share); see BASELINE.md"),
    }


def run_kernel_scaling() -> dict:
    """Pure-kernel process-scaling control (no Ray): isolates single-node
    contention from Ray overhead."""
    rates = {p: _kernel_rate(p, dur=6.0) for p in (8, 32)}
    return {
        "metric": "kernel_scaling_efficiency",
        "value": round((rates[32] / rates[8]) / 4, 3),
        "unit": "ratio",
        "turns_per_sec_8proc": round(rates[8]),
        "turns_per_sec_32proc": round(rates[32]),
    }


def run_stats() -> None:
    """Print ``Dataset.stats()`` for the flagship extraction job — the
    per-operator wall/cpu/output breakdown used to check that wall time
    is dominated by the extraction kernel, not by plasma traffic or
    scheduling (brief: 'read ds.stats() and iterate')."""
    import shutil

    ray = _init_ray(NUM_CPUS)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod
    from amazon_textract_transformer_pipeline_ray.pipelines.extraction import (
        build_turns, read_transcripts)

    paths = entrymod._transcripts(SF_DIR)
    out = f"/tmp/bench_stats_{os.getpid()}"
    shutil.rmtree(out, ignore_errors=True)
    ds = build_turns(read_transcripts(paths), batch_size=None)
    ds.write_parquet(out)
    print(ds.stats())
    shutil.rmtree(out, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    if "--scaling-child" in sys.argv:
        _scaling_child()
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--kernel-scaling" in sys.argv:
        print(json.dumps(run_kernel_scaling()))
    elif "--stats" in sys.argv:
        run_stats()
    else:
        print(json.dumps(run_bench()))

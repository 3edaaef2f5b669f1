"""10x scale proof (round-4 verdict item 7): replicate the sf0.1 tables
10x (consistent id offsets, so joins/mod semantics hold per replica) into
/tmp and run every BENCH_QUERIES entry at 32 CPUs, recording walls next
to the same-session sf0.1 walls.  Catches quadratic-in-bucket or
driver-state cliffs that the sf0.1 bench hides.

Notes on expected non-linearities (by design, recorded in the output):
* ``jaccard_dup_pairs`` is the documented EXACT all-pairs anchor with a
  dense-matrix driver budget — at 10x it must RAISE loudly pointing at
  the LSH twin.  The proof records ``budget_guarded: true`` for it.
* duplicate-heavy queries see amplified pair/dup counts (each text now
  appears 10x) — a deliberate stress, not a bug.

Usage: ``python bench_sf1.py`` -> one JSON line; record under BENCH/.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEST = "/tmp/attp_sf1_proof"
REPLICAS = int(os.environ.get("GRAFT_SF1_REPLICAS", "10"))
# Offset is a multiple of every modulus the suite's hash/slice rules use
# (EVAL_MOD=20, parity, %5/%7/%13 diff rules), so each replica carries
# the same per-replica semantics as the original:
OFF = 100_000_000

ID_COLS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": [],   # dimension tables are NOT replicated (broadcast side)
    "region": [],
}


def build_corpus() -> str:
    os.makedirs(DEST, exist_ok=True)
    for name, cols in ID_COLS.items():
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(DEST, f"{name}.parquet")
        if not os.path.exists(src) or os.path.exists(dst):
            continue
        t = pq.read_table(src)
        if not cols:
            pq.write_table(t, dst)
            continue
        parts = []
        for r in range(REPLICAS):
            rep = t
            for c in cols:
                field_ix = rep.schema.get_field_index(c)
                typ = rep.schema.field(field_ix).type
                shifted = pc.add(rep.column(c).cast(pa.int64()),
                                 r * OFF).cast(typ)
                rep = rep.set_column(field_ix, pa.field(c, typ), shifted)
            parts.append(rep)
        pq.write_table(pa.concat_tables(parts), dst)
    return DEST


def main() -> None:
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.read_op_min_num_blocks = 64
    os.environ["GRAFT_SKIP_AUX_FIXTURES"] = "1"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray.data as rd

    import __ray_entry__ as entrymod
    from bench import BENCH_QUERIES

    sf1 = build_corpus()
    queries = entrymod.queries()
    out: dict[str, dict] = {}
    for name in BENCH_QUERIES:
        row: dict = {}
        for label, sf in (("sf01_sec", SRC), ("sf1_sec", sf1)):
            t0 = time.time()
            try:
                result = queries[name](sf)
                if isinstance(result, rd.Dataset):
                    result.count()
            except ValueError as e:
                if "budget" not in str(e):
                    raise
                row["budget_guarded"] = True
            row[label] = round(time.time() - t0, 3)
        if not row.get("budget_guarded"):
            row["ratio"] = round(row["sf1_sec"] / max(row["sf01_sec"], 1e-9),
                                 2)
        out[name] = row
    ray.shutdown()
    print(json.dumps({
        "metric": "sf1_scale_proof",
        "replicas": REPLICAS,
        "unit": "sec",
        "queries": out,
        "worst_ratio": max((r.get("ratio", 0.0) for r in out.values()),
                           default=0.0),
    }))


if __name__ == "__main__":
    main()

"""Cluster- and data-aware sizing for shuffle widths.

Hardcoded shard counts are wrong twice at scale: a fixed 64 under-splits
a 256-node cluster (idle workers) and over-splits a laptop (per-group
scheduling overhead), and a count that ignores DATA size lets per-task
memory grow linearly with the corpus (each shard holds rows/shards rows).
Every wide stage therefore sizes its key space as

    max(cpu_multiple x cluster CPUs,  ceil(n_rows / rows_per_shard))

— the cpu term keeps every worker busy, the data term bounds the rows
(and therefore memory) one ``map_groups`` task materializes.
"""

from __future__ import annotations

import os


def cluster_cpus(default: int = 8) -> int:
    """Logical CPUs of the (initialized) Ray cluster, else a local guess."""
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:  # noqa: BLE001 - sizing must never fail a pipeline
        pass
    try:
        return max(1, len(os.sched_getaffinity(0)))
    except (AttributeError, OSError):
        return default


def shuffle_width(
    n_rows: int | None = None,
    rows_per_shard: int = 65536,
    cpu_multiple: int = 2,
    floor: int = 8,
) -> int:
    """Shard count for a coarse-hash shuffle stage.

    ``cpu_multiple x CPUs`` gives scheduler slack against skew; the
    ``n_rows / rows_per_shard`` term keeps any single shard's
    materialized rows bounded no matter the corpus size."""
    width = max(floor, cpu_multiple * cluster_cpus())
    if n_rows is not None:
        width = max(width, -(-int(n_rows) // rows_per_shard))
    return width


def join_width(
    n_rows: int,
    rows_per_partition: int = 262144,
    cap_per_cpu: int = 4,
    floor: int = 8,
) -> int:
    """Partition count for a hash-shuffle JOIN.

    Joins differ from map_groups shard stages: every partition costs a
    map+reduce task pair with real fixed overhead, so the count is sized
    by DATA (rows / rows_per_partition — bounds per-partition memory)
    with a cluster-proportional CAP, not by CPU count with a data floor.
    (Measured on the bench tables: 600k rows join at 8/16/32/64
    partitions on one 32-CPU node walls 5.4/5.5/~7/30 s — CPU-count
    partitions are strictly worse until the data is big enough to need
    them.)"""
    width = max(floor, -(-int(n_rows) // rows_per_partition))
    return min(width, cap_per_cpu * cluster_cpus())


def table_num_rows(sf_dir: str, name: str) -> int:
    """Row count from parquet footer metadata only (no data read)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(os.path.join(sf_dir, f"{name}.parquet")
                          ).metadata.num_rows

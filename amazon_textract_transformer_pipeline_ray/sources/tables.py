"""Table readers + broadcast-side helpers for the analytic query suite.

Scale conventions (SURVEY.md §2.4, ray_guide joins):
  * dimension tables (region, nation, supplier, part, customer at these
    shapes) are broadcast: materialized ONCE driver-side into a pandas
    frame, put in the object store via ``ray.put``, and fetched per actor /
    per task via ``ray.get`` inside the UDF — never shuffled, never
    re-shipped per batch;
  * fact tables (lineitem, orders, events, documents, embeddings) are
    always read with explicit column pruning.
"""

from __future__ import annotations

import os
from typing import Sequence

import pandas as pd
import pyarrow.parquet as pq
import ray
import ray.data as rd


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(sf_dir: str, name: str, columns: Sequence[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(table_path(sf_dir, name),
                           columns=list(columns) if columns else None)


def read_small_pandas(sf_dir: str, name: str,
                      columns: Sequence[str] | None = None) -> pd.DataFrame:
    """Driver-side materialization of a SMALL (dimension) table."""
    return pq.read_table(table_path(sf_dir, name),
                         columns=list(columns) if columns else None).to_pandas()


def broadcast(obj) -> "ray.ObjectRef":
    """Put a small lookup structure in the object store once (zero-copy
    reads from every task on the node / one copy per node on a cluster)."""
    return ray.put(obj)

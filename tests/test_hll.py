"""HyperLogLog sketch gates: estimator accuracy in the raw-HLL regime,
register mergeability (batch invariance), and branch coverage."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from amazon_textract_transformer_pipeline_ray.pipelines.events import (
    HLL_M,
    _hll_rows,
    q_events_hll_users,
)


def _write_events(tmp_path, users, types=None):
    n = len(users)
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(pd.to_datetime(np.arange(n), unit="s")),
        "user_id": pa.array(np.asarray(users, np.int64)),
        "event_type": pa.array(types if types is not None else ["e"] * n),
        "value": pa.array(np.zeros(n)),
        "props": pa.array([""] * n),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_hll_accuracy_raw_regime(ray_session, tmp_path):
    """20k distinct users — far past the linear-counting cutover — must
    estimate within ~3 standard errors (1.04/sqrt(256) ~ 6.5%)."""
    rng = np.random.default_rng(23)
    users = rng.choice(10**9, size=20000, replace=False)
    sf = _write_events(tmp_path, users)
    est = float(q_events_hll_users(sf).to_pandas().n_users_hll[0])
    assert abs(est - 20000) / 20000 < 0.2
    assert est > 2.5 * HLL_M  # really the raw-HLL branch


def test_hll_register_merge_is_batch_invariant():
    """Registers from one pass equal the max-merge of split passes."""
    rng = np.random.default_rng(29)
    users = rng.integers(0, 10**6, size=5000)
    types = np.array(["a", "b"] * 2500, dtype=object)
    et, reg, rho = _hll_rows(types, users)
    whole = {(t, int(r)): int(m) for t, r, m in zip(et, reg, rho)}
    merged = {}
    for lo, hi in ((0, 1234), (1234, 3000), (3000, 5000)):
        et2, reg2, rho2 = _hll_rows(types[lo:hi], users[lo:hi])
        for t, r, m in zip(et2, reg2, rho2):
            k = (t, int(r))
            merged[k] = max(merged.get(k, 0), int(m))
    assert whole == merged


def test_hll_duplicates_do_not_move_estimate(ray_session, tmp_path):
    """Distinct counting: repeating every user 10x leaves the registers
    (hence the estimate) unchanged."""
    rng = np.random.default_rng(31)
    base = rng.choice(10**8, size=3000, replace=False)
    sf1 = _write_events(os.path.join(tmp_path, "a") + os.sep
                        if False else tmp_path, base)
    e1 = float(q_events_hll_users(sf1).to_pandas().n_users_hll[0])
    dup_dir = os.path.join(tmp_path, "dup")
    os.makedirs(dup_dir, exist_ok=True)
    sf2 = _write_events(dup_dir, np.repeat(base, 10))
    e2 = float(q_events_hll_users(sf2).to_pandas().n_users_hll[0])
    assert e1 == e2

"""Event-stream-shaped operators over the bounded ``events`` table.

Ray Data is a batch engine; stream semantics are expressed as an ordered,
partitioned log (SURVEY.md §2.9): partition by ``user_id``, order by ``ts``
inside ``map_groups``.  Tumbling windows become truncated-timestamp
groupbys; session windows and as-of joins are per-user sorted-group logic
(``pd.merge_asof`` for the as-of case).

Float determinism: ``value``/``o_totalprice`` are exact 2-decimal values;
all sums run over int64 cents so results are bit-identical to the SQL
oracle (see relational.py note).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..sources.tables import broadcast, read_small_pandas, read_table

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def _cents(col) -> np.ndarray:
    return np.rint(col.to_numpy(zero_copy_only=False) * 100).astype(np.int64)


def q_events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1h window per event type: count + sum(value).

    Window key computed vectorized pre-shuffle; partial combiner first."""
    ds = read_table(sf_dir, "events", ["ts", "event_type", "value"])

    def keyed(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "hour": pc.floor_temporal(batch["ts"], unit="hour").to_pandas(),
            "event_type": batch["event_type"].to_pandas(),
            "cents": _cents(batch["value"]),
        })
        g = df.groupby(["hour", "event_type"], as_index=False).agg(
            p_cnt=("cents", "size"), p_sum=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    final = (ds.map_batches(keyed, batch_format="pyarrow", batch_size=65536)
             .groupby(["hour", "event_type"]).aggregate(
                 Sum("p_cnt", alias_name="n_events"),
                 Sum("p_sum", alias_name="cents")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "hour": t["hour"], "event_type": t["event_type"],
            "n_events": t["n_events"],
            "sum_value": pa.array(
                t["cents"].to_numpy().astype(np.float64) / 100.0),
        })

    return final.map_batches(finish, batch_format="pyarrow")


def q_events_sessionize(sf_dir: str) -> rd.Dataset:
    """Session windows (30 min inactivity gap) per user: n_sessions and
    n_events per user — groupby(user).map_groups over ts-sorted events."""
    ds = read_table(sf_dir, "events", ["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        gaps = np.diff(ts) > SESSION_GAP_US
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_sessions": [int(gaps.sum()) + 1],
            "n_events": [len(ts)],
        })

    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def q_events_asof_orders(sf_dir: str) -> rd.Dataset:
    """As-of join: each event matched to the user's most recent order at or
    before the event time (event.user_id = orders.o_custkey,
    o_orderdate <= ts); per event_type: matched count + avg matched price.

    BROADCAST-SIDE BASELINE, deliberately: orders is a fact table by the
    ``sources/tables.py`` convention, but at bench scale its deduped
    (custkey, orderdate) projection is ~100k rows — small enough to
    broadcast, which keeps this variant shuffle-free and makes it the
    oracle-anchored baseline.  The DEFAULT plan at scale is the
    both-sides-big twin ``q_events_asof_orders_bucketed`` (identical
    result, same SQL oracle): use it whenever the deduped order side
    can't ride ``ray.put``.  The dedup keeps one row per (custkey,
    orderdate) (max price) so the as-of pick is deterministic.
    """
    orders = read_small_pandas(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])
    orders = (orders.groupby(["o_custkey", "o_orderdate"], as_index=False)
              .agg(o_totalprice=("o_totalprice", "max"))
              .sort_values("o_orderdate", kind="mergesort")
              .reset_index(drop=True))
    orders["price_cents"] = np.rint(orders["o_totalprice"].to_numpy() * 100
                                    ).astype(np.int64)
    ref = broadcast(orders[["o_custkey", "o_orderdate", "price_cents"]])

    class AsOf:
        def __init__(self):
            self.orders = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            b = batch.sort_values("ts", kind="mergesort")
            m = pd.merge_asof(
                b, self.orders, left_on="ts", right_on="o_orderdate",
                left_by="user_id", right_by="o_custkey", direction="backward")
            g = m.groupby("event_type", as_index=False).agg(
                p_events=("ts", "size"),
                p_matched=("price_cents", "count"),
                p_price=("price_cents", "sum"),
            )
            g["p_price"] = g["p_price"].astype(np.int64)
            return g

    ds = read_table(sf_dir, "events", ["user_id", "ts", "event_type"])
    partials = ds.map_batches(AsOf, batch_format="pandas", batch_size=65536,
                              concurrency=(1, 4))
    final = partials.groupby("event_type").aggregate(
        Sum("p_events", alias_name="n_events"),
        Sum("p_matched", alias_name="n_matched"),
        Sum("p_price", alias_name="cents"),
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_matched"].to_numpy().astype(np.float64)
        dollars = t["cents"].to_numpy().astype(np.float64) / 100.0
        avg = [float(d / nn) if nn > 0 else None
               for d, nn in zip(dollars, n)]
        return pa.table({
            "event_type": t["event_type"],
            "n_events": t["n_events"],
            "n_matched": t["n_matched"],
            "avg_matched_price": pa.array(avg, pa.float64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


def q_events_asof_orders_bucketed(sf_dir: str,
                                  n_buckets: int | None = None) -> rd.Dataset:
    """Both-sides-big as-of join — the DEFAULT plan shape at scale: BOTH
    tables are hash-bucketed by user key (one shuffle groupby over the
    union), and ``merge_asof`` runs per bucket inside ``map_groups`` —
    no broadcast of either side.  Result is identical to the
    broadcast-baseline variant (``q_events_asof_orders``) and checked
    against the same SQL oracle.  Bucket count sized by cluster and row
    count (sources/scale.py) so per-bucket memory stays bounded."""
    from ..sources.scale import shuffle_width, table_num_rows

    if n_buckets is None:
        n_rows = (table_num_rows(sf_dir, "events")
                  + table_num_rows(sf_dir, "orders"))
        n_buckets = shuffle_width(n_rows=n_rows, rows_per_shard=262144)
    orders = read_table(sf_dir, "orders",
                        ["o_custkey", "o_orderdate", "o_totalprice"])
    events = read_table(sf_dir, "events", ["user_id", "ts", "event_type"])

    def order_rows(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "user": batch["o_custkey"].cast(pa.int64()),
            "ts": batch["o_orderdate"].cast(pa.timestamp("us")),
            "price_cents": pa.array(_cents(batch["o_totalprice"])),
        })
        # pre-dedup per (user, ts) inside the batch (max price) — the
        # cross-batch dedup happens in the bucket fn.  Pure-Arrow
        # group_by: no pandas round trip in this pre-shuffle kernel.
        g = t.group_by(["user", "ts"]).aggregate([("price_cents", "max")])
        n = g.num_rows
        return pa.table({
            "user": g["user"],
            "ts": g["ts"],
            "price_cents": g["price_cents_max"],
            "side": pa.array(["o"] * n, pa.string()),
            "event_type": pa.array([""] * n, pa.string()),
        })

    def event_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "user": batch["user_id"].cast(pa.int64()),
            "ts": batch["ts"].cast(pa.timestamp("us")),
            "price_cents": pa.array(np.zeros(n, dtype=np.int64)),
            "side": pa.array(["e"] * n, pa.string()),
            "event_type": batch["event_type"].cast(pa.string()),
        })

    unioned = (orders.map_batches(order_rows, batch_format="pyarrow",
                                  batch_size=65536)
               .union(events.map_batches(event_rows, batch_format="pyarrow",
                                         batch_size=65536)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        # vectorized integer multiplicative hash (same mix as graph.py):
        users = batch.column("user").to_numpy().astype(np.uint64)
        b = ((users * np.uint64(0x9E3779B1)) % np.uint64(2**32)
             % np.uint64(n_buckets)).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    bucketed = unioned.map_batches(add_bucket, batch_format="pyarrow",
                                   batch_size=65536)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == "o"]
        e = g[g["side"] == "e"]
        if len(e) == 0:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "p_events": pd.Series([], dtype=np.int64),
                                 "p_matched": pd.Series([], dtype=np.int64),
                                 "p_price": pd.Series([], dtype=np.int64)})
        o = (o.groupby(["user", "ts"], as_index=False)
             .agg(price_cents=("price_cents", "max"))
             .sort_values("ts", kind="mergesort"))
        e = e.sort_values("ts", kind="mergesort")
        m = pd.merge_asof(e[["user", "ts", "event_type"]], o,
                          on="ts", by="user", direction="backward")
        out = m.groupby("event_type", as_index=False).agg(
            p_events=("ts", "size"),
            p_matched=("price_cents", "count"),
            p_price=("price_cents", "sum"))
        out["p_price"] = out["p_price"].fillna(0).astype(np.int64)
        out["p_matched"] = out["p_matched"].astype(np.int64)
        return out

    partials = bucketed.groupby("bucket").map_groups(
        merge_bucket, batch_format="pandas")
    final = partials.groupby("event_type").aggregate(
        Sum("p_events", alias_name="n_events"),
        Sum("p_matched", alias_name="n_matched"),
        Sum("p_price", alias_name="cents"),
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_matched"].to_numpy().astype(np.float64)
        dollars = t["cents"].to_numpy().astype(np.float64) / 100.0
        avg = [float(d / nn) if nn > 0 else None for d, nn in zip(dollars, n)]
        return pa.table({
            "event_type": t["event_type"],
            "n_events": t["n_events"],
            "n_matched": t["n_matched"],
            "avg_matched_price": pa.array(avg, pa.float64()),
        })

    return final.map_batches(finish, batch_format="pyarrow")


def q_events_sliding_window(sf_dir: str) -> rd.Dataset:
    """Sliding 1h windows advancing every 30 min: per window start, event
    count + sum(value).  Each event lands in exactly two windows (the two
    30-min buckets covering it); the fan-out happens vectorized inside
    ``map_batches`` (flat-map), followed by a partial combiner, so the
    shuffle moves one row per (window, batch)."""
    ds = read_table(sf_dir, "events", ["ts", "value"])

    def fanout(batch: pa.Table) -> pa.Table:
        bucket = pc.floor_temporal(batch["ts"], multiple=30, unit="minute")
        b_us = bucket.to_numpy(zero_copy_only=False).astype("datetime64[us]")
        cents = _cents(batch["value"])
        half_h = np.timedelta64(30 * 60 * 1_000_000, "us")
        starts = np.concatenate([b_us, b_us - half_h])
        df = pd.DataFrame({
            "window_start": starts,
            "cents": np.concatenate([cents, cents]),
        })
        g = df.groupby("window_start", as_index=False).agg(
            p_cnt=("cents", "size"), p_sum=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    final = (ds.map_batches(fanout, batch_format="pyarrow", batch_size=65536)
             .groupby("window_start").aggregate(
                 Sum("p_cnt", alias_name="n_events"),
                 Sum("p_sum", alias_name="cents")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": t["window_start"],
            "n_events": t["n_events"],
            "sum_value": pa.array(
                t["cents"].to_numpy().astype(np.float64) / 100.0),
        })

    return final.map_batches(finish, batch_format="pyarrow")


def q_events_top_users(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k users by total event value.

    Distributed top-k: the per-user groupby output is #distinct-users
    rows (hundreds of millions at web scale), so it is NEVER pulled to
    the driver.  Each output block keeps only its own top-k candidates
    (map_batches partial), and the driver merges ``n_blocks x k`` rows
    — the q_doc_sample_k / kNN partial-top-k-merge shape."""
    ds = read_table(sf_dir, "events", ["user_id", "value"])

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table({"user_id": batch["user_id"],
                         "cents": pa.array(_cents(batch["value"]))})

    per_user = (ds.map_batches(cents, batch_format="pyarrow", batch_size=65536)
                .groupby("user_id").aggregate(
                    Sum("cents", alias_name="cents"),
                    Count(alias_name="n_events")))

    def partial_top(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        keep = df.sort_values(["cents", "user_id"],
                              ascending=[False, True]).head(k)
        return pa.Table.from_pandas(keep, preserve_index=False)

    cand = (per_user.map_batches(partial_top, batch_format="pyarrow")
            .to_pandas())
    top = (cand.sort_values(["cents", "user_id"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    top["total_value"] = top["cents"].to_numpy().astype(np.float64) / 100.0
    return top[["user_id", "total_value", "n_events"]]


def q_events_type_stats(sf_dir: str) -> rd.Dataset:
    """Distinct users + mean value per event type (exact distinct via
    per-batch (type, user) pre-aggregation, then a per-type rollup)."""
    ds = read_table(sf_dir, "events", ["event_type", "user_id", "value"])

    def pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            "user_id": batch["user_id"].to_numpy(),
            "cents": _cents(batch["value"]),
        })
        g = df.groupby(["event_type", "user_id"], as_index=False).agg(
            p_cnt=("cents", "size"), p_sum=("cents", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    per_pair = (ds.map_batches(pairs, batch_format="pyarrow", batch_size=65536)
                .groupby(["event_type", "user_id"]).aggregate(
                    Sum("p_cnt", alias_name="n"), Sum("p_sum", alias_name="s")))

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        n = int(g["n"].sum())
        dollars = float(np.int64(g["s"].sum())) / 100.0
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_users": np.array([len(g)], dtype=np.int64),
            "n_events": np.array([n], dtype=np.int64),
            "avg_value": [dollars / n],
        })

    return per_pair.groupby("event_type").map_groups(roll, batch_format="pandas")


# ---------------------------------------------------------------------------
# HyperLogLog distinct-user sketch (Flajolet et al. 2007, public paper)
# — bounded-memory distinct counting, the canonical mergeable sketch:
# per-batch register partials (<= n_types x HLL_M rows each) merge
# through one tiny groupby MAX — at any corpus size the exchange
# carries register rows, never user ids.  The md5-prefix hash makes the
# sketch bit-reproducible in DuckDB, so the oracle is a DIRECT SQL
# restatement of the whole sketch (registers, harmonic mean, and the
# linear-counting small-range branch).  At the bench scales both
# branches are live: 150 users/type -> linear counting, 1500 (sf0.1)
# -> the raw HLL estimator.  No 32-bit large-range correction (the
# hash space is 60-bit).  Estimate column is f32 per repo convention.

HLL_B = 8
HLL_M = 1 << HLL_B           # 256 registers
_HLL_WMASK = (1 << 52) - 1   # 60-bit hash = 8 register bits + 52 rank bits
HLL_ALPHA = 0.7213 / (1 + 1.079 / 256)


def _hll_rows(types: np.ndarray, users: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(event_type, reg, rho) register observations, pre-maxed per
    (type, reg) within the batch.  md5 runs once per distinct user id
    in the batch."""
    import hashlib

    if not len(users):
        z = np.zeros(0, np.int64)
        return np.empty(0, dtype=object), z, z
    codes, uniq_u = pd.factorize(users)
    h = np.fromiter(
        (int(hashlib.md5(str(int(u)).encode()).hexdigest()[:15], 16)
         for u in uniq_u), dtype=np.int64, count=len(uniq_u))[codes]
    reg = h >> 52
    w = h & _HLL_WMASK
    rho = np.where(w > 0,
                   52 - np.floor(np.log2(np.maximum(w, 1))).astype(np.int64),
                   53).astype(np.int64)
    tcodes, uniq_t = pd.factorize(types)
    key = (tcodes.astype(np.int64) * HLL_M + reg)
    order = np.argsort(key, kind="mergesort")
    ks, rs = key[order], rho[order]
    new = np.concatenate([[True], ks[1:] != ks[:-1]])
    seg = np.cumsum(new) - 1
    mx = np.zeros(seg[-1] + 1 if len(seg) else 0, np.int64)
    np.maximum.at(mx, seg, rs)
    kk = ks[new]
    return uniq_t[kk // HLL_M], kk % HLL_M, mx


def q_events_hll_users(sf_dir: str) -> pa.Table:
    """Approximate distinct users per event type via a 256-register
    HyperLogLog: (event_type, n_users_hll).  See section comment for
    the scale shape and the exact-SQL-oracle argument."""
    from ray.data.aggregate import Max

    ds = read_table(sf_dir, "events", ["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        et, reg, rho = _hll_rows(
            np.asarray(t.column("event_type").to_pylist(), dtype=object),
            t.column("user_id").to_numpy())
        return pa.table({
            "event_type": pa.array(list(et), pa.string()),
            "reg": pa.array(reg),
            "p_rho": pa.array(rho),
        })

    regs = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
            .groupby(["event_type", "reg"])
            .aggregate(Max("p_rho", alias_name="m"))
            .to_pandas())
    out_t, out_e = [], []
    for et, g in regs.groupby("event_type"):
        mvals = g["m"].to_numpy().astype(np.float64)
        nset = len(mvals)
        hsum = float(np.sum(np.power(2.0, -mvals))) + (HLL_M - nset) * 1.0
        e_raw = HLL_ALPHA * HLL_M * HLL_M / hsum
        if e_raw <= 2.5 * HLL_M and (HLL_M - nset) > 0:
            est = HLL_M * np.log(HLL_M / float(HLL_M - nset))
        else:
            est = e_raw
        out_t.append(et)
        out_e.append(np.float32(est))
    order = np.argsort(np.asarray(out_t, dtype=object))
    return pa.table({
        "event_type": pa.array([out_t[i] for i in order], pa.string()),
        "n_users_hll": pa.array([out_e[i] for i in order], pa.float32()),
    })


HLL_USERS_SQL = r"""
    WITH h AS (
        SELECT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS hv
        FROM events),
    rr AS (SELECT event_type, hv // 4503599627370496 AS reg,
                  CASE WHEN hv % 4503599627370496 = 0 THEN 53
                       ELSE 52 - CAST(floor(log2(hv % 4503599627370496))
                                      AS BIGINT)
                  END AS rho
           FROM h),
    regs AS (SELECT event_type, reg, MAX(rho) AS m FROM rr GROUP BY 1, 2),
    est AS (SELECT event_type,
                   SUM(power(2.0, -m)) + (256 - COUNT(*)) * 1.0 AS hsum,
                   256 - COUNT(*) AS nzero
            FROM regs GROUP BY event_type),
    raw AS (SELECT event_type, nzero,
                   (0.7213 / (1 + 1.079 / 256)) * 256.0 * 256.0 / hsum
                       AS e_raw
            FROM est)
    SELECT event_type,
           CAST(CASE WHEN e_raw <= 640.0 AND nzero > 0
                     THEN 256.0 * ln(256.0 / nzero)
                     ELSE e_raw END AS REAL) AS n_users_hll
    FROM raw
"""


# ---------------------------------------------------------------------------
# Range join: per order, aggregate the same user's events inside a fixed
# time interval after the order — the third of the custom-join trio
# (as-of join above, sliding window in q_events_sliding_window).

RANGE_JOIN_DAYS = 7


def q_events_range_join_orders(sf_dir: str,
                               n_buckets: int | None = None) -> rd.Dataset:
    """Range (interval) join, both-sides-big: for every order, the count
    and exact-cents sum of events with ``user_id = o_custkey`` and
    ``o_orderdate <= ts < o_orderdate + 7 days``.

    Plan: ONE hash-bucket shuffle of the union (same user-key bucketing
    as the bucketed as-of join — neither side is broadcast, per-bucket
    memory bounded by sources/scale.py sizing).  Inside each bucket the
    kernel is fully vectorized: events get within-user cumulative
    (count, cents) prefixes, then TWO ``merge_asof`` probes — strictly
    before the window start and strictly before the window end — turn
    every per-order interval aggregate into a prefix difference.  Sums
    are int64 cents end-to-end, so results are bit-identical to the SQL
    oracle's LEFT JOIN.  Orders with no in-window events are kept with
    zero counts (LEFT JOIN semantics)."""
    from ..sources.scale import shuffle_width, table_num_rows

    if n_buckets is None:
        n_rows = (table_num_rows(sf_dir, "events")
                  + table_num_rows(sf_dir, "orders"))
        n_buckets = shuffle_width(n_rows=n_rows, rows_per_shard=262144)
    window_us = RANGE_JOIN_DAYS * 24 * 3600 * 1_000_000
    orders = read_table(sf_dir, "orders",
                        ["o_orderkey", "o_custkey", "o_orderdate"])
    events = read_table(sf_dir, "events", ["user_id", "ts", "value"])

    def order_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user": batch["o_custkey"].cast(pa.int64()),
            "ts_us": pa.array(batch["o_orderdate"]
                              .to_numpy(zero_copy_only=False)
                              .astype("datetime64[us]").astype(np.int64)),
            "okey": batch["o_orderkey"].cast(pa.int64()),
            "cents": pa.array(np.zeros(batch.num_rows, np.int64)),
        })

    def event_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user": batch["user_id"].cast(pa.int64()),
            "ts_us": pa.array(batch["ts"].to_numpy(zero_copy_only=False)
                              .astype("datetime64[us]").astype(np.int64)),
            "okey": pa.array(np.full(batch.num_rows, -1, np.int64)),
            "cents": pa.array(_cents(batch["value"])),
        })

    unioned = (orders.map_batches(order_rows, batch_format="pyarrow",
                                  batch_size=65536)
               .union(events.map_batches(event_rows, batch_format="pyarrow",
                                         batch_size=65536)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        users = batch.column("user").to_numpy().astype(np.uint64)
        b = ((users * np.uint64(0x9E3779B1)) % np.uint64(2**32)
             % np.uint64(n_buckets)).astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    def range_agg(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["okey"] >= 0]
        if len(o) == 0:
            return pd.DataFrame({
                "o_orderkey": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "sum_cents": pd.Series([], dtype=np.int64)})
        e = g[g["okey"] < 0]
        # within-user prefix (count, cents) in (user, ts) order; rows with
        # equal ts collapse onto the LAST row, which merge_asof picks
        ev = e.sort_values(["user", "ts_us"], kind="mergesort")
        cum_n = ev.groupby("user").cumcount().to_numpy() + 1
        cum_c = ev.groupby("user")["cents"].cumsum().to_numpy()
        probe = pd.DataFrame({
            "user": ev["user"].to_numpy(),
            "ts_us": ev["ts_us"].to_numpy(),
            "cum_n": cum_n.astype(np.int64),
            "cum_c": cum_c.astype(np.int64),
        }).sort_values("ts_us", kind="mergesort")

        def prefix_at(ts: np.ndarray, users: np.ndarray) -> tuple:
            """(count, cents) of the user's events STRICTLY before ts."""
            left = pd.DataFrame({"user": users, "ts_us": ts}).sort_values(
                "ts_us", kind="mergesort")
            left["_ix"] = np.arange(len(left))
            m = pd.merge_asof(left, probe, on="ts_us", by="user",
                              direction="backward",
                              allow_exact_matches=False)
            m = m.sort_values("_ix", kind="mergesort")
            return (m["cum_n"].fillna(0).to_numpy().astype(np.int64),
                    m["cum_c"].fillna(0).to_numpy().astype(np.int64))

        ou = o["user"].to_numpy()
        start = o["ts_us"].to_numpy()
        n0, c0 = prefix_at(start, ou)
        n1, c1 = prefix_at(start + window_us, ou)
        return pd.DataFrame({
            "o_orderkey": o["okey"].to_numpy(),
            "n_events": n1 - n0,
            "sum_cents": c1 - c0,
        })

    per_order = (unioned.map_batches(add_bucket, batch_format="pyarrow",
                                     batch_size=65536)
                 .groupby("bucket").map_groups(range_agg,
                                               batch_format="pandas"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "n_events": t["n_events"],
            "sum_value": pa.array(
                t["sum_cents"].to_numpy().astype(np.float64) / 100.0),
        })

    return per_order.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Funnel analysis: per-user ordered-stage progression counts.

FUNNEL_STAGES = ("view", "click", "purchase")
FUNNEL_WINDOW_US = 3600 * 1_000_000  # 1h conversion window per stage


def q_events_funnel(sf_dir: str) -> rd.Dataset:
    """3-stage ordered funnel over the event log: per user, the deepest
    prefix of ``view -> click -> purchase`` completed in STRICT time
    order with a 1-hour conversion window per stage (stage k counts only
    if an event of that type occurs strictly after — and within one hour
    of — the user's earliest completion time of stage k-1); output is
    users-per-depth.

    Plan: one ``groupby(user_id)`` shuffle (the sessionize exchange);
    the per-user kernel is a vectorized min-over-mask scan per stage —
    no sorting needed, no driver state.  All values are integers, so
    the SQL oracle matches exactly."""
    ds = read_table(sf_dir, "events", ["user_id", "ts", "event_type"])

    def depth(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = g["event_type"].to_numpy()
        d = 0
        prev = None
        for stage in FUNNEL_STAGES:
            mask = et == stage
            if prev is not None:
                mask &= (ts > prev) & (ts <= prev + FUNNEL_WINDOW_US)
            cand = ts[mask]
            if not len(cand):
                break
            prev = cand.min()
            d += 1
        return pd.DataFrame({"stage": [d], "p_users": [1]})

    agg = (ds.groupby("user_id").map_groups(depth, batch_format="pandas")
           .groupby("stage").aggregate(Sum("p_users", alias_name="n_users")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"stage": t["stage"].cast(pa.int64()),
                         "n_users": t["n_users"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


FUNNEL_SQL = r"""
    WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
           FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s1.t1
             AND e.ts <= s1.t1 + INTERVAL 1 HOUR
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
           FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2
             AND e.ts <= s2.t2 + INTERVAL 1 HOUR
           GROUP BY e.user_id),
    d AS (SELECT u.user_id,
                 CASE WHEN s3.user_id IS NOT NULL THEN 3
                      WHEN s2.user_id IS NOT NULL THEN 2
                      WHEN s1.user_id IS NOT NULL THEN 1
                      ELSE 0 END AS stage
          FROM (SELECT DISTINCT user_id FROM events) u
          LEFT JOIN s1 ON s1.user_id = u.user_id
          LEFT JOIN s2 ON s2.user_id = u.user_id
          LEFT JOIN s3 ON s3.user_id = u.user_id)
    SELECT CAST(stage AS BIGINT) AS stage,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM d GROUP BY stage
"""


def q_events_cohort_retention(sf_dir: str) -> rd.Dataset:
    """Cohort retention over the event log: users grouped by first-seen
    week (the cohort), counted per whole-week offset at which they were
    active again.  Output: (cohort_week, week_offset, n_users).

    Plan: ONE ``groupby(user_id)`` shuffle; the per-user kernel derives
    the first-seen timestamp and the user's distinct active-week
    offsets vectorized (integer floor-division on epoch-days — the
    same arithmetic the SQL oracle states), then a tiny combiner
    groupby counts users per (cohort, offset).  Weeks are anchored at
    the epoch (1970-01-05, a Monday — ``date_trunc('week')``
    semantics), and the offset is full 7-day periods since the user's
    FIRST event, so everything is exact integer math."""
    ds = read_table(sf_dir, "events", ["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        first = ts.min()
        day_us = 24 * 3600 * 1_000_000
        # Monday-anchored week of the first event (epoch day 4 = Monday
        # 1970-01-05; DuckDB's date_trunc('week') anchor)
        first_week_day = ((first // day_us - 4) // 7) * 7 + 4
        offsets = np.unique((ts // day_us - first_week_day) // 7)
        return pd.DataFrame({
            "cohort_week": np.full(len(offsets), first_week_day * day_us
                                   ).astype("datetime64[us]"),
            "week_offset": offsets.astype(np.int64),
            "p_users": np.ones(len(offsets), np.int64),
        })

    agg = (ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
           .groupby(["cohort_week", "week_offset"])
           .aggregate(Sum("p_users", alias_name="n_users")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "cohort_week": t["cohort_week"],
            "week_offset": t["week_offset"],
            "n_users": t["n_users"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


COHORT_SQL = r"""
    WITH f AS (
        SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY user_id),
    w AS (
        SELECT e.user_id,
               date_trunc('week', f.first_ts) AS cohort_week,
               (CAST(epoch(date_trunc('day', e.ts)) AS BIGINT)
                - CAST(epoch(date_trunc('week', f.first_ts)) AS BIGINT))
                   // 604800 AS week_offset
        FROM events e JOIN f USING (user_id)
        GROUP BY 1, 2, 3)
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM w GROUP BY cohort_week, week_offset
"""


def q_events_user_gaps(sf_dir: str) -> rd.Dataset:
    """Per-user inter-event gap statistics (the LAG-window op): for
    each user, the number of events, and the count / exact-integer sum
    / max / mean of the microsecond gaps between consecutive events in
    timestamp order.  Output: (user_id, n_events, n_gaps, sum_gap_us,
    max_gap_us, avg_gap_us).

    Plan: ONE ``groupby(user_id)`` shuffle (the sessionize exchange);
    the per-user kernel sorts the user's timestamps once and takes a
    vectorized ``np.diff`` — no window-function state, no driver state.
    The gap multiset of a sorted timestamp list is order-unique even
    under duplicate timestamps (ties diff to zero either way), so the
    result is deterministic.  Sums are exact int64; ``avg_gap_us`` is
    ONE f64 division of exact integers, bit-identical to the oracle's
    ``CAST(sum AS DOUBLE)/n`` — no f32 downcast needed."""
    ds = read_table(sf_dir, "events", ["user_id", "ts"])

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        ts = np.sort(g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64))
        d = np.diff(ts)
        n_gaps = len(d)
        s = int(d.sum()) if n_gaps else 0
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_events": [len(ts)],
            "n_gaps": [n_gaps],
            "sum_gap_us": [s],
            "max_gap_us": [int(d.max()) if n_gaps else 0],
            "avg_gap_us": [float(s) / n_gaps if n_gaps else 0.0],
        })

    return ds.groupby("user_id").map_groups(gaps, batch_format="pandas")


USER_GAPS_SQL = r"""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) AS gap
        FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS sum_gap_us,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_us,
           CASE WHEN COUNT(gap) > 0
                THEN CAST(COALESCE(SUM(gap), 0) AS DOUBLE) / COUNT(gap)
                ELSE 0.0 END AS avg_gap_us
    FROM g GROUP BY user_id
"""


MA_WINDOW = 7  # single source of truth for the trailing-window width:
# the column name (ma{window}), the vectorized frame below, AND the
# DAILY_MA_SQL oracle frame are all derived from it, so a caller-chosen
# window can never silently diverge from its labeling or its oracle.


def q_events_daily_moving_avg(sf_dir: str,
                              window: int = MA_WINDOW) -> pd.DataFrame:
    """Daily event counts with a trailing ``window``-day moving average
    — the RANGE/ROWS-frame window-aggregate class (dashboard smoothing).
    Output: ``(day, n_events, ma{window})``.  The registered oracle is
    ``daily_ma_sql(MA_WINDOW)``; a non-default window names its column
    accordingly and is checked by generating the frame from the same
    parameter (tests cover window=3).

    Plan: ONE day-keyed combiner-first groupby (the events_hourly
    exchange; output is calendar-bounded — one row per day — so the
    moving window runs vectorized on the driver over the tiny reduced
    table, the post-reduction convention).  Missing calendar days do
    NOT contribute zeros: the frame is "previous <=6 PRESENT rows",
    exactly DuckDB's ``ROWS 6 PRECEDING`` over the same day table —
    ``ma7`` is one exact-int sum / count division per row."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", ["ts"])

    def keyed(batch: pa.Table) -> pa.Table:
        days = pc.floor_temporal(batch["ts"], unit="day")
        df = pd.DataFrame({"day": days.to_pandas()})
        g = df.groupby("day", as_index=False).agg(p_cnt=("day", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = (ds.map_batches(keyed, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("day").aggregate(Sum("p_cnt", alias_name="n_events"))
             .to_pandas()
             .sort_values("day", kind="mergesort").reset_index(drop=True))
    n = daily["n_events"].to_numpy(np.int64)
    csum = np.concatenate([[0], np.cumsum(n)])
    idx = np.arange(len(n))
    lo = np.maximum(0, idx - (window - 1))
    wsum = csum[idx + 1] - csum[lo]
    wcnt = idx + 1 - lo
    daily[f"ma{window}"] = (wsum.astype(np.float64)
                            / wcnt.astype(np.float64))
    daily["n_events"] = daily["n_events"].astype(np.int64)
    # repo timestamp convention: µs precision (floor_temporal's 'day'
    # unit comes back at 's' and would dtype-mismatch the oracle)
    daily["day"] = daily["day"].astype("datetime64[us]")
    return daily


def daily_ma_sql(window: int = MA_WINDOW) -> str:
    """Oracle generated from the SAME window parameter as the query —
    frame width and output column name both derive from it."""
    return f"""
    WITH d AS (
        SELECT date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY day)
    SELECT day, n_events,
           CAST(SUM(n_events) OVER w AS DOUBLE)
               / COUNT(*) OVER w AS ma{window}
    FROM d
    WINDOW w AS (ORDER BY day
                 ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
"""


DAILY_MA_SQL = daily_ma_sql(MA_WINDOW)


def q_events_daily_zscore(sf_dir: str) -> pd.DataFrame:
    """Daily-count anomaly scores: each day's event count standardized
    against the corpus of daily counts — ``(day, n_events, zscore)``.

    Plan: the ``q_events_daily_moving_avg`` day reduction (ONE
    combiner-first groupby); mean/variance come from exact integer
    sum / sum-of-squares over the tiny day table, so the f64 op chain
    — ``(x - mean) / sqrt((sumsq - sum^2/n) / (n-1))`` — is written
    out identically in the SQL oracle (NOT stddev_samp, whose Welford
    accumulation could differ in the last ulp)."""
    from ray.data.aggregate import Sum

    ds = read_table(sf_dir, "events", ["ts"])

    def keyed(batch: pa.Table) -> pa.Table:
        days = pc.floor_temporal(batch["ts"], unit="day")
        df = pd.DataFrame({"day": days.to_pandas()})
        g = df.groupby("day", as_index=False).agg(p_cnt=("day", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    daily = (ds.map_batches(keyed, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("day").aggregate(Sum("p_cnt", alias_name="n_events"))
             .to_pandas()
             .sort_values("day", kind="mergesort").reset_index(drop=True))
    x = daily["n_events"].to_numpy(np.int64)
    n = len(x)
    s = int(x.sum())
    sq = int((x.astype(object) * x.astype(object)).sum())  # exact ints
    mean = s / n
    # op order shared with the SQL: exact int products, ONE cast, two
    # f64 divisions (both s*s and sq stay exact below 2^53 for any
    # realistic daily-count table; beyond that both sides round the
    # same cast identically)
    var = (float(sq) - float(s * s) / n) / (n - 1) if n > 1 else 0.0
    sd = float(np.sqrt(var)) if var > 0.0 else 0.0
    daily["zscore"] = ((x - mean) / sd if sd > 0.0
                       else np.zeros(n, np.float64))
    daily["n_events"] = daily["n_events"].astype(np.int64)
    daily["day"] = daily["day"].astype("datetime64[us]")
    return daily


DAILY_ZSCORE_SQL = """
    WITH d AS (
        SELECT date_trunc('day', ts) AS day,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY day),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(n_events) AS BIGINT) AS s,
               CAST(SUM(n_events * n_events) AS BIGINT) AS sq
        FROM d)
    SELECT d.day, d.n_events,
           CASE WHEN m.n > 1 AND (CAST(m.sq AS DOUBLE)
                     - CAST(m.s * m.s AS DOUBLE) / m.n) > 0
                THEN (d.n_events - CAST(m.s AS DOUBLE) / m.n)
                     / sqrt((CAST(m.sq AS DOUBLE)
                             - CAST(m.s * m.s AS DOUBLE) / m.n)
                            / (m.n - 1))
                ELSE 0.0 END AS zscore
    FROM d, m
"""

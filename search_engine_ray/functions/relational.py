"""Relational demo operators over the TPC-H-ish tables: pre-aggregated
grouped aggregate, broadcast join, tumbling-window event aggregate.

Money/values are emitted as integer cents/micros so the DuckDB oracle hash
is exact (float summation order differs between engines).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Max, Min, Sum

from ..pipelines.datasets import read_table


def _cents(x: np.ndarray) -> np.ndarray:
    """Deterministic double→cents: floor(x*100 + 0.5) identically in DuckDB
    and numpy (both IEEE doubles)."""
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped aggregate with partial (per-batch) pre-aggregation:
    the groupby shuffles one row per (flag,status) per batch, not 600k rows."""
    ds = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount", "l_shipdate"])

    cutoff = pd.Timestamp("1998-09-02")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["l_shipdate"] <= cutoff]
        if not len(b):
            return pd.DataFrame({"l_returnflag": [], "l_linestatus": [],
                                 "sum_qty": [], "sum_base_cents": [],
                                 "sum_disc_cents": [], "n_rows": []})
        ep = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        g = pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty": b["l_quantity"].to_numpy().astype(np.int64),
            "sum_base_cents": _cents(ep),
            "sum_disc_cents": _cents(ep * (1.0 - disc)),
            "n_rows": np.ones(len(b), np.int64),
        })
        return (g.groupby(["l_returnflag", "l_linestatus"], as_index=False)
                 .sum())

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_cents", alias_name="sum_base_cents"),
        Sum("sum_disc_cents", alias_name="sum_disc_cents"),
        Sum("n_rows", alias_name="n_rows"))


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
       SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS sum_base_cents,
       SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS sum_disc_cents,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
def orders_by_segment(sf_dir: str):
    """Broadcast join: customer (small) is ray.put once and looked up inside
    map_batches over orders — no shuffle join."""
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg_map_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    ds = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    class JoinSegment:
        def __init__(self):
            self.seg = ray.get(seg_map_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            seg = b["o_custkey"].map(self.seg)
            g = pd.DataFrame({
                "c_mktsegment": seg,
                "n_orders": np.ones(len(b), np.int64),
                "total_cents": _cents(b["o_totalprice"].to_numpy()),
            })
            return g.groupby("c_mktsegment", as_index=False).sum()

    partials = ds.map_batches(JoinSegment, batch_format="pandas",
                              concurrency=2)
    return partials.groupby("c_mktsegment").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("total_cents", alias_name="total_cents"))


SQL_ORDERS_BY_SEGMENT = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
def events_tumbling_window(sf_dir: str):
    """Tumbling 1-minute window per event_type (streaming-shaped aggregate;
    ray_guide 'Streaming-shaped workloads'). Window key is integer µs."""
    ds = read_table(sf_dir, "events",
                    columns=["ts", "event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64").to_numpy()  # epoch µs
        window_us = (us // 60_000_000) * 60_000_000
        g = pd.DataFrame({
            "event_type": b["event_type"],
            "window_us": window_us,
            "n_events": np.ones(len(b), np.int64),
            "sum_value_micros": np.floor(
                b["value"].to_numpy() * 1e6).astype(np.int64),
        })
        return g.groupby(["event_type", "window_us"], as_index=False).sum()

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(["event_type", "window_us"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_micros", alias_name="sum_value_micros"))


SQL_EVENTS_WINDOW = """
SELECT event_type,
       (epoch_us(ts) // 60000000) * 60000000 AS window_us,
       COUNT(*) AS n_events,
       SUM(CAST(floor(value * 1e6) AS BIGINT)) AS sum_value_micros
FROM events
GROUP BY event_type, window_us
ORDER BY event_type, window_us
"""

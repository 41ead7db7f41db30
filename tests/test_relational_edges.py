"""Edge cases of the custom join operators (asof / banded range)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _events_dir(tmp_path, rows):
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    }), os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_asof_join_user_without_clicks(ray_session, tmp_path):
    """A user with purchases but NO clicks must yield null match rows
    (ASOF LEFT JOIN semantics), not crash."""
    import ray

    from search_engine_ray.functions.relational import events_asof_join

    t0 = 1_700_000_000_000_000
    sf = _events_dir(tmp_path, [
        (10, t0, 7, "purchase"), (11, t0 + 100, 7, "purchase"),
        (12, t0 + 50, 8, "click"), (13, t0 + 60, 8, "purchase"),
    ])
    out = events_asof_join(sf)
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_columns]
    res = pa.concat_tables(tabs).sort_by([("purchase_id", "ascending")])
    d = res.to_pydict()
    assert d["purchase_id"] == [10, 11, 13]
    assert d["click_id"] == [None, None, 12]
    assert d["lag_us"] == [None, None, 10]


def test_range_join_no_partner_type(ray_session, tmp_path):
    """Groups with only one side (or empty) yield empty output."""
    import ray

    from search_engine_ray.functions.relational import events_range_join

    t0 = 1_700_000_000_000_000
    sf = _events_dir(tmp_path, [
        (1, t0, 1, "error"), (2, t0 + 10, 2, "purchase"),
    ])
    out = events_range_join(sf)
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_columns]
    res = pa.concat_tables(tabs) if tabs else pa.table({})
    assert res.num_rows == 0


def test_asof_join_banded_skew_and_ties(ray_session, tmp_path):
    """A hot user spanning many small bands must still match across
    band boundaries (carry-in), and equal click timestamps must break
    to the max event_id — compared hash-exactly vs the DuckDB oracle."""
    import duckdb
    import ray

    from search_engine_ray.functions.relational import (SQL_EVENTS_ASOF,
                                                        events_asof_join)

    t0 = 1_700_000_000_000_000
    rows = []
    eid = 0
    # user 1: firehose — clicks at t0+i*1000, purchases sprinkled; with
    # band_us=4000 most purchases' latest click is in an earlier band
    for i in range(200):
        rows.append((eid, t0 + i * 1000, 1, "click")); eid += 1
        if i % 7 == 3:
            rows.append((eid, t0 + i * 1000 + 1, 1, "purchase")); eid += 1
    # duplicate click timestamps: ids 9000/9001 at the same ts — the
    # match must pick 9001 on both engines
    rows.append((9000, t0 + 50_000, 2, "click"))
    rows.append((9001, t0 + 50_000, 2, "click"))
    rows.append((9002, t0 + 60_000, 2, "purchase"))
    # user with purchases only → null rows through the banded path
    rows.append((9100, t0, 3, "purchase"))
    sf = _events_dir(tmp_path, rows)

    out = events_asof_join(sf, band_us=4000)
    tabs = [t for t in ray.get(out.to_arrow_refs()) if t.num_columns]
    res = pa.concat_tables(tabs).sort_by([("purchase_id", "ascending")])

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    ref = con.execute(SQL_EVENTS_ASOF).fetch_arrow_table()
    assert res.num_rows == ref.num_rows
    for col in res.column_names:
        assert res.column(col).to_pylist() == ref.column(col).to_pylist(), col
    d = res.to_pydict()
    i2 = d["purchase_id"].index(9002)
    assert d["click_id"][i2] == 9001  # tie → max event_id
    i3 = d["purchase_id"].index(9100)
    assert d["click_id"][i3] is None  # no clicks at all → null row

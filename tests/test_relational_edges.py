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

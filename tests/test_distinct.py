"""Window / distinct / anti-join / co-occurrence operator tests beyond
the oracle gate: HLL estimator accuracy, join-path pinning, brute-force
cross-checks of the window kernels, and PMI derivability."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def test_hll_estimate_accuracy(ray_session, sf_dir):
    """The HLL estimate from the register table lands within the
    theoretical ~3σ band (σ ≈ 1.04/√m ≈ 6.5% at m=256) of the exact
    distinct user count."""
    import duckdb

    from search_engine_ray.functions.distinct import (hll_distinct,
                                                      hll_estimate)
    regs = hll_distinct(sf_dir).column("max_rho").to_numpy(
        zero_copy_only=False)
    est = hll_estimate(regs)
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM "
        f"read_parquet('{sf_dir}/events.parquet')").fetchone()[0]
    assert abs(est - exact) / exact < 0.20, (est, exact)


def test_hll_register_merge_associative(ray_session):
    """Register partials merge by max — split input must equal whole."""
    from search_engine_ray.functions.distinct import _hll_partial
    ids = np.arange(10_000, dtype=np.int64) * 7919
    whole = _hll_partial(ids)
    merged = np.maximum(_hll_partial(ids[:3000]), _hll_partial(ids[3000:]))
    assert np.array_equal(whole, merged)


def test_anti_join_paths_pinned(ray_session, sf_dir):
    """Broadcast-drop and native left_anti produce identical rows."""
    from search_engine_ray.functions.relational import \
        customers_without_orders
    bc = _canon(customers_without_orders(sf_dir).to_pandas())
    hj = _canon(customers_without_orders(sf_dir,
                                         broadcast_gate=0).to_pandas())
    pd.testing.assert_frame_equal(bc, hj, check_dtype=False)
    assert len(bc) > 0  # non-degenerate fixture


def test_rolling_count_brute_force(ray_session, sf_dir):
    """The searchsorted RANGE-frame kernel equals the O(n²) definition
    on one user's history."""
    from search_engine_ray.functions.windows import (ROLL_WINDOW_US,
                                                     events_rolling_count)
    out = events_rolling_count(sf_dir).to_pandas()
    uid = out["user_id"].iloc[0]
    g = out[out["user_id"] == uid]
    ts = g["ts_us"].to_numpy()
    brute = [(np.sum((ts >= t - ROLL_WINDOW_US) & (ts <= t)))
             for t in ts]
    assert list(g["n_window"]) == brute


def test_user_lag_first_event_null(ray_session, sf_dir):
    """Exactly one NULL gap per user (the first event)."""
    from search_engine_ray.functions.windows import events_user_lag
    out = events_user_lag(sf_dir).to_pandas()
    nulls = out[out["gap_us"].isna()]
    assert len(nulls) == out["user_id"].nunique()
    # and each user's null row is their min-ts event
    first = out.sort_values(["user_id", "ts_us", "event_id"]) \
               .groupby("user_id").head(1)
    assert set(nulls["event_id"]) == set(first["event_id"])


def test_bigram_pmi_derivable(ray_session, sf_dir):
    """PMI computes from the returned integer counts alone and is
    finite for every returned pair."""
    from search_engine_ray.functions.cooccur import bigram_stats
    from search_engine_ray.functions.docops import token_count
    t = bigram_stats(sf_dir).to_pandas()
    n = int(token_count(sf_dir).to_pandas()["n_tokens"].sum())
    pmi = np.log(t["pair_cnt"] * n / (t["cnt1"] * t["cnt2"]))
    assert np.isfinite(pmi).all()
    assert (t["pair_cnt"] <= np.minimum(t["cnt1"], t["cnt2"])).all()


def test_distinct_users_pair_packing_guard(ray_session):
    """The (type_code, user) packing assumes user_id < 2^41 — assert
    the kernel rejects nothing silently in range and stays exact on a
    synthetic batch with duplicate users across types."""
    import pyarrow as pa

    from search_engine_ray.functions.distinct import events_distinct_users
    # exercised end-to-end via the oracle test; here: the packed-key
    # uniqueness math on a crafted batch near the boundary
    uid = np.array([0, 1, (1 << 41) - 1, 1, 0], dtype=np.int64)
    et = pa.array(["a", "a", "a", "b", "a"])
    code = pa.compute.dictionary_encode(et)
    idx = code.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    key = np.unique(idx * (1 << 41) + uid)
    assert len(key) == 4  # (a,0),(a,1),(a,2^41-1),(b,1)


def test_semi_join_paths_pinned(ray_session, sf_dir):
    """Broadcast-keep and native left_semi produce identical rows, and
    the quantity filter keeps the fixture non-degenerate."""
    from search_engine_ray.functions.relational import parts_shipped
    bc = _canon(parts_shipped(sf_dir).to_pandas())
    hj = _canon(parts_shipped(sf_dir, broadcast_gate=0).to_pandas())
    pd.testing.assert_frame_equal(bc, hj, check_dtype=False)
    import pyarrow.parquet as pq
    n_parts = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows
    assert 0 < len(bc) < n_parts


def test_per_lang_sample_uniform_and_bounded(ray_session, sf_dir):
    """Exactly k rows per language (when the stratum has ≥ k docs), all
    doc_ids distinct, and the selection is stable across runs."""
    from search_engine_ray.functions.sampling import per_lang_sample
    a = per_lang_sample(sf_dir, k=5).to_pandas()
    b = per_lang_sample(sf_dir, k=5).to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))
    per = a.groupby("lang").size()
    assert (per <= 5).all() and per.max() == 5
    assert a["doc_id"].is_unique


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """A synthetic events table with a HOT USER: user 0 owns 50k of 60k
    events (near-worst-case group skew for the window operators)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    rng = np.random.default_rng(7)
    n_hot, n_cold = 50_000, 10_000
    uid = np.r_[np.zeros(n_hot, np.int64),
                rng.integers(1, 500, n_cold).astype(np.int64)]
    ts = np.sort(rng.integers(1_600_000_000_000_000,
                              1_600_864_000_000_000, n_hot + n_cold))
    d = tmp_path_factory.mktemp("skew")
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(len(uid)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(np.where(uid == 0, "hot", "cold")),
        "value": pa.array(rng.random(len(uid)) * 10.0, pa.float64()),
        "props": pa.array(["{}"] * len(uid)),
    }), str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("op,sql", [
    ("events_user_lag", "SQL_EVENTS_USER_LAG"),
    ("events_rolling_count", "SQL_EVENTS_ROLLING"),
    ("events_running_total", "SQL_EVENTS_RUNNING_TOTAL"),
])
def test_windows_hot_user_skew(ray_session, skew_dir, op, sql):
    """The window kernels stay exact (vs DuckDB) when one user owns 83%
    of all events — the documented single-group co-location assumption
    holds under near-worst-case skew."""
    import duckdb

    from search_engine_ray.functions import windows
    mine = getattr(windows, op)(skew_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{skew_dir}/events.parquet')")
    ref = con.execute(getattr(windows, sql)).fetchdf()
    a = _canon(mine)
    b = _canon(ref)
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=True)


def test_audio_spectrogram_peak_band(ray_session):
    """A pure 440 Hz tone's spectral peak lands in the band containing
    the 440 Hz rfft bin — the FFT path computes real spectra, not
    byte-noise."""
    import io
    import wave

    import pyarrow as pa

    from search_engine_ray.functions.multimodal import AudioSpectrogram
    rate, dur_ms, freq = 8000, 400, 440.0
    n = rate * dur_ms // 1000
    t = np.arange(n, dtype=np.float64)
    samples = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    batch = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "kind": pa.array(["audio"]),
        "payload": pa.array([buf.getvalue()], pa.binary()),
        "duration_ms": pa.array([dur_ms], pa.int64()),
    })
    stage = AudioSpectrogram(frame_ms=100)
    out = stage(batch).to_pandas()
    assert out["frame"].nunique() == 4  # 400 ms / 100 ms windows
    frame_len = rate * 100 // 1000
    edges = stage._edges(frame_len)
    peak_bin = int(round(freq * frame_len / rate))
    want_band = int(np.searchsorted(edges, peak_bin,
                                    side="right")) - 1
    for _, g in out.groupby("frame"):
        got = int(g.loc[g["log_energy_milli"].idxmax(), "band"])
        assert got == want_band, (got, want_band)


def test_audio_spectrogram_short_and_fallback_clips(ray_session):
    """Clips shorter than one frame and non-WAV byte-fallback payloads
    produce bounded output instead of crashing; a zero-sample clip is
    skipped."""
    import io
    import wave

    import pyarrow as pa

    from search_engine_ray.functions.multimodal import AudioSpectrogram

    def wav(n, rate=16000):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(np.arange(n, dtype="<i2").tobytes())
        return buf.getvalue()

    batch = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["audio"] * 3),
        "payload": pa.array([wav(50), b"not-a-wav-payload", wav(0)],
                            pa.binary()),
        "duration_ms": pa.array([3, 2, 0], pa.int64()),
    })
    out = AudioSpectrogram(frame_ms=100)(batch).to_pandas()
    assert set(out["media_id"]) == {1, 2}  # empty clip skipped
    assert (out["band"] >= 0).all()


def test_bigram_stats_no_pairs(ray_session, tmp_path):
    """A corpus of single-token documents yields an empty (but
    correctly-typed) bigram table instead of crashing in the unigram
    probe."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.functions.cooccur import bigram_stats
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(6), pa.int64()),
        "text": pa.array(["one", "two", "three", " four ", "", "five"]),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["t"] * 6),
        "n_chars": pa.array([3] * 6, pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    out = bigram_stats(str(tmp_path)).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["w1", "w2", "pair_cnt", "cnt1", "cnt2"]


@pytest.mark.parametrize("gate", [4_000_000, 0])
def test_running_total_banded_pinned(ray_session, sf_dir, skew_dir, gate):
    """The skew-proof banded plan (in-band cumsum + per-user band-offset
    prefix) is row-identical to the plain single-group plan on both the
    sf fixture and the 83%-hot-user corpus, on BOTH the broadcast and
    native-join offset paths."""
    from search_engine_ray.functions.windows import (
        events_running_total, events_running_total_banded)
    for d in (sf_dir, skew_dir):
        plain = _canon(events_running_total(d).to_pandas())
        banded = _canon(events_running_total_banded(
            d, broadcast_gate=gate).to_pandas())
        pd.testing.assert_frame_equal(plain, banded, check_dtype=False,
                                      check_exact=True)


@pytest.mark.parametrize("gate", [4_000_000, 0])
def test_user_lag_banded_pinned(ray_session, sf_dir, skew_dir, gate):
    """The banded LAG (prev-nonempty-band carry) is row-identical to
    the plain plan — NULL first-event rows included — on the sf fixture
    and the hot-user corpus, on both offset paths."""
    from search_engine_ray.functions.windows import (events_user_lag,
                                                     events_user_lag_banded)
    for d in (sf_dir, skew_dir):
        plain = _canon(events_user_lag(d).to_pandas())
        banded = _canon(events_user_lag_banded(
            d, broadcast_gate=gate).to_pandas())
        pd.testing.assert_frame_equal(plain, banded, check_dtype=False,
                                      check_exact=True)


def test_rolling_count_banded_pinned(ray_session, sf_dir, skew_dir):
    """The banded rolling count (window-tail carry replication) is
    row-identical to the plain plan on both fixtures."""
    from search_engine_ray.functions.windows import (
        events_rolling_count, events_rolling_count_banded)
    for d in (sf_dir, skew_dir):
        plain = _canon(events_rolling_count(d).to_pandas())
        banded = _canon(events_rolling_count_banded(d).to_pandas())
        pd.testing.assert_frame_equal(plain, banded, check_dtype=False,
                                      check_exact=True)
    import pytest as _pt
    with _pt.raises(ValueError):
        events_rolling_count_banded(sf_dir, window_us=10, band_us=5)


def test_windows_property_random_corpora(ray_session, tmp_path_factory):
    """Property check: on randomized event tables (duplicate timestamps
    allowed, multiple users, values of mixed sign) all three window
    kernels stay hash-exact vs DuckDB — the tie-break and RANGE-frame
    semantics hold beyond the fixture distribution."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.functions import windows
    for seed in (3, 11, 42):
        rng = np.random.default_rng(seed)
        n = 400
        d = tmp_path_factory.mktemp(f"wprop{seed}")
        # coarse ts grid forces plenty of exact duplicates per user
        ts = rng.integers(0, 50, n) * 60_000_000 + 1_700_000_000_000_000
        pq.write_table(pa.table({
            "event_id": pa.array(rng.permutation(n).astype(np.int64)),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, 7, n).astype(np.int64)),
            "event_type": pa.array(["e"] * n),
            "value": pa.array(rng.normal(0, 5, n)),
            "props": pa.array(["{}"] * n),
        }), str(d / "events.parquet"))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{d}/events.parquet')")
        for op, sql in [("events_user_lag", windows.SQL_EVENTS_USER_LAG),
                        ("events_rolling_count", windows.SQL_EVENTS_ROLLING),
                        ("events_running_total",
                         windows.SQL_EVENTS_RUNNING_TOTAL)]:
            mine = _canon(getattr(windows, op)(str(d)).to_pandas())
            ref = _canon(con.execute(sql).fetchdf())
            pd.testing.assert_frame_equal(
                mine, ref, check_dtype=False, check_exact=True,
                obj=f"{op} seed={seed}")

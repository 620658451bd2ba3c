"""Time-series operators: integer-exact ACF/trend/EWMA/CUSUM/seasonal
profile properties on synthetic series (the oracle gate pins real-data
values; these pin the algebra on constructed edge cases)."""

from __future__ import annotations

from graph500_spark.operators.timeseries import (
    E6,
    event_acf,
    event_cusum,
    event_ewma,
    event_seasonality,
    event_trend,
)

EV_SCHEMA = "event_id long, user_id long, ts long, event_type string, value double"
HOUR_NS = 3_600_000_000_000


def _events(spark, counts_by_type):
    """counts_by_type: {type: [n_events in hour 0, hour 1, ...]}."""
    rows, eid = [], 0
    for etype, counts in counts_by_type.items():
        for t, n in enumerate(counts):
            for j in range(n):
                rows.append((eid, 1, t * HOUR_NS + j, etype, 1.0))
                eid += 1
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_trend_exact_linear_series(spark):
    # x_t = t + 1 → slope exactly 1/bucket, intercept exactly 1.
    ev = _events(spark, {"a": [t + 1 for t in range(10)]})
    row = event_trend(ev).collect()[0]
    assert row["n_buckets"] == 10
    assert row["slope_ppm_per_bucket"] == E6
    assert row["intercept_e6"] == E6


def test_trend_constant_series_zero_slope(spark):
    ev = _events(spark, {"a": [5] * 8})
    row = event_trend(ev).collect()[0]
    assert row["slope_ppm_per_bucket"] == 0
    assert row["intercept_e6"] == 5 * E6


def test_acf_alternating_series_negative_lag1(spark):
    # x = 1,3,1,3,... → lag-1 ACF is strongly negative, lag-2 positive,
    # and every value is a valid ppm.
    ev = _events(spark, {"a": [1, 3] * 8})
    out = {r["lag"]: r["acf_ppm"] for r in event_acf(ev, max_lag=4).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1] < 0 < out[2]
    assert all(-E6 <= v <= E6 for v in out.values())


def test_acf_constant_series_zero_denominator_guard(spark):
    ev = _events(spark, {"a": [4] * 6})
    out = event_acf(ev, max_lag=2).collect()
    assert all(r["acf_ppm"] == 0 for r in out)


def test_ewma_first_bucket_and_bounds(spark):
    counts = [8, 0, 0, 4, 12, 2]
    ev = _events(spark, {"a": counts})
    out = sorted(event_ewma(ev).collect(), key=lambda r: r["bucket_start_us"])
    assert out[0]["ewma_e6"] == counts[0] * E6
    # convex combination with per-step floors: stays within
    # [min·1e6 − den, max·1e6]
    assert all(
        min(counts) * E6 - 8 <= r["ewma_e6"] <= max(counts) * E6 for r in out
    )
    # smoothing actually moves toward later values
    assert out[1]["ewma_e6"] < out[0]["ewma_e6"]
    assert out[4]["ewma_e6"] > out[3]["ewma_e6"]


def test_cusum_constant_series_all_zero(spark):
    ev = _events(spark, {"a": [3] * 10, "b": [7] * 10})
    out = event_cusum(ev).collect()
    assert all(r["cusum_units"] == 0 and r["is_change"] == 0 for r in out)


def test_cusum_step_change_flags(spark):
    # 48 hours at rate 1, then 48 hours at rate 100: the post-step
    # excess accumulates ~n·Δ per bucket and must cross 24·Σx quickly.
    counts = [1] * 48 + [100] * 48
    ev = _events(spark, {"a": counts})
    out = sorted(
        event_cusum(ev).collect(), key=lambda r: r["bucket_start_us"]
    )
    assert all(r["cusum_units"] >= 0 for r in out)
    assert all(r["is_change"] == 0 for r in out[:48])
    assert any(r["is_change"] == 1 for r in out[48:])


def test_seasonality_shares_sum_to_e6(spark):
    ev = _events(spark, {"a": [2, 5, 1, 9], "b": [4] * 30})
    rows = event_seasonality(ev).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for etype, cells in by_type.items():
        total = sum(c["share_ppm"] for c in cells)
        # floor rounding: sum in (1e6 − ncells, 1e6]
        assert E6 - len(cells) < total <= E6
        assert all(0 <= c["dow"] <= 6 and 0 <= c["hour"] <= 23 for c in cells)


def test_seasonality_calendar_sign_consistent_cross_engine(spark):
    """dow/hour math must agree between Spark and the DuckDB oracle
    spelling for NEGATIVE (pre-1970) epoch micros too — Spark `div`
    truncates while DuckDB `//` floors, so both sides use an explicit
    floor-division + pmod spelling (round-7 advice fix)."""
    import duckdb
    from pyspark.sql import functions as F

    from graph500_spark.operators.timeseries import (
        _FLOOR_DOW_EXPR,
        _FLOOR_HOUR_EXPR,
    )

    us_vals = [
        0, 1, -1, 123_456_789,
        -86_400_000_000, -86_400_000_001, 86_400_000_000,
        -5 * 3_600_000_000 - 7, -30 * 86_400_000_000 - 12345,
    ]
    df = spark.createDataFrame([(v,) for v in us_vals], "us long")
    got = {
        r["us"]: (r["dow"], r["hour"])
        for r in df.select(
            "us",
            F.expr(_FLOOR_DOW_EXPR.format(col="us")).alias("dow"),
            F.expr(_FLOOR_HOUR_EXPR.format(col="us")).alias("hour"),
        ).collect()
    }
    from graph500_spark.operators.timeseries import _dow_sql, _hour_sql

    for v in us_vals:
        duck = duckdb.sql(
            f"SELECT {_dow_sql(str(v))}, {_hour_sql(str(v))}"
        ).fetchone()
        pyref = ((v // 86_400_000_000 + 3) % 7, (v // 3_600_000_000) % 24)
        assert got[v] == tuple(duck) == pyref, v


def test_holt_replays_reference_recurrence(spark):
    from graph500_spark.operators.timeseries import _tdiv, event_holt

    counts = [4, 8, 2, 0, 6, 6, 7, 1]
    ev = _events(spark, {"a": counts})
    rows = sorted(
        event_holt(ev).collect(), key=lambda r: r["bucket_start_us"]
    )
    # independent replay of the documented recurrence
    a, d, b, db = 1, 8, 1, 16
    lev, tr, fc = counts[0] * E6, 0, counts[0] * E6
    assert (rows[0]["level_e6"], rows[0]["trend_e6"],
            rows[0]["forecast_e6"]) == (lev, tr, fc)
    for i in range(1, len(counts)):
        fc = lev + tr
        lev_new = _tdiv(a * counts[i] * E6 + (d - a) * fc, d)
        tr = _tdiv(b * (lev_new - lev) + (db - b) * tr, db)
        lev = lev_new
        assert rows[i]["forecast_e6"] == fc, i
        assert rows[i]["level_e6"] == lev, i
        assert rows[i]["trend_e6"] == tr, i
    # declining series drives the SIGNED trend negative and the
    # truncation toward zero (not floor) must hold
    ev2 = _events(spark, {"a": [9, 6, 3, 0, 0, 0]})
    rows2 = sorted(
        event_holt(ev2).collect(), key=lambda r: r["bucket_start_us"]
    )
    assert rows2[-1]["trend_e6"] < 0

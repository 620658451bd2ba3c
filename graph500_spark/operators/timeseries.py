"""Time-series analytics over the event stream: autocorrelation,
OLS trend, EWMA smoothing, CUSUM changepoint detection, and seasonal
profiles — the monitoring / drift-detection layer a training-data
pipeline runs over its ingest volumes.

Beyond the graph500 reference surface (which has no temporal data at
all — SURVEY.md §2.6); first-class engine operators for the 100 TB
event-analytics use case, same tier as streaming/windows.py.

Exactness discipline (the oracle gate): every checked output column
is integer — counts, micro-units (_e6), parts-per-million (ppm).
Ratios of possibly-negative integers are quantized as
``sign(num) * ((1_000_000 * abs(num)) div den)`` on BOTH engines,
because Spark's ``div`` truncates toward zero while DuckDB's ``//``
floors — the sign/abs split makes them identical.  Product sums
(ACF numerators, OLS moments) accumulate in DECIMAL(38,0) on Spark
and HUGEINT on DuckDB so no intermediate wraps, with the final
quantized column cast back to BIGINT.

Shapes at 100 TB:

* The dense per-series grid (`_dense_counts`) is the event_gapfill
  pattern: one groupBy for the sparse buckets, a per-key sequence()
  explode for the axis (each series generates exactly its own
  [min, max] range — no global calendar cross join), one equi-join.
* ACF computes ALL lags in ONE window pass (lead(c, k) columns share
  a single sort/exchange on the series key) + one aggregate; trend
  and seasonality are single grouped aggregates.  Parallelism scales
  with the number of series (here 5 event types; in production the
  key is per-user / per-sensor / per-source, i.e. millions).
* EWMA and CUSUM are inherently sequential recurrences (the integer
  floor at each step destroys any closed form), so they run as
  Arrow-batched applyInPandas kernels, one series per group — the
  canonical "custom stateful operator" tier (mirrors the
  applyInPandasWithState sessionizer).  State is O(1) per series;
  the DuckDB oracle replays the identical recurrence with a
  recursive CTE, so these stay hash-checked despite being
  non-closed-form.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graph500_spark.functions.eventtime import event_micros

E6 = 1_000_000


# ---------------------------------------------------------------------------
# Dense per-type hourly count grid (shared by all operators here)
# ---------------------------------------------------------------------------


def _dense_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """[event_type, bucket, x] — dense bucket axis per event_type with
    x = event count (0 for empty buckets)."""
    win_us = 60_000_000 * minutes
    ts_us = event_micros(events)
    sparse = (
        events.select(
            "event_type", (ts_us - ts_us % F.lit(win_us)).alias("bucket")
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    axis = (
        sparse.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.lit(win_us))
            ).alias("bucket"),
        )
    )
    return axis.join(sparse, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce("x", F.lit(0)).cast("long").alias("x"),
    )


def _grid_sql(minutes: int = 60) -> str:
    """DuckDB CTE list mirroring `_dense_counts`: sparse, axis, grid."""
    w = 60_000_000 * minutes
    return (
        "sparse AS (SELECT event_type,"
        f" epoch_us(ts) - epoch_us(ts) % {w} AS bucket,"
        " CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),"
        " axis AS (SELECT event_type, unnest(generate_series("
        f" MIN(bucket), MAX(bucket), {w})) AS bucket"
        " FROM sparse GROUP BY event_type),"
        " grid AS (SELECT a.event_type, a.bucket, COALESCE(s.x, 0) AS x"
        " FROM axis a LEFT JOIN sparse s"
        " ON s.event_type = a.event_type AND s.bucket = a.bucket)"
    )


# signed integer ppm quantization, identical on both engines
def _ppm_expr(num: str, den: str) -> str:
    return (
        f"CAST(CASE WHEN {den} = 0 THEN 0 ELSE"
        f" (CASE WHEN {num} < 0 THEN -1 ELSE 1 END)"
        f" * (({E6} * abs({num})) div {den}) END AS BIGINT)"
    )


def _ppm_sql(num: str, den: str) -> str:
    return (
        f"CAST(CASE WHEN {den} = 0 THEN 0 ELSE"
        f" (CASE WHEN {num} < 0 THEN -1 ELSE 1 END)"
        f" * (({E6} * abs({num})) // {den}) END AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# Autocorrelation function — integer-exact via mean-centering in
# n-scaled units: c_t = n·x_t − Σx is integer, and
# ACF(k) = Σ c_t·c_{t+k} / Σ c_t² is scale-invariant, so the ppm
# quantization needs no division by n.
# ---------------------------------------------------------------------------


def event_acf(
    events: DataFrame, max_lag: int = 12, minutes: int = 60
) -> DataFrame:
    """[event_type, lag, acf_ppm, n_buckets] — autocorrelation of the
    per-type hourly event-count series at lags 1..max_lag, in signed
    parts-per-million.  A strong 24-lag peak = daily seasonality; the
    ingest-drift diagnostic."""
    grid = _dense_counts(events, minutes)
    stats = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    c = grid.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "bucket",
        "n",
        (F.col("n") * F.col("x") - F.col("s")).alias("c"),
    )
    w = Window.partitionBy("event_type").orderBy("bucket")
    leads = c.select(
        "event_type",
        "n",
        F.col("c").cast("decimal(38,0)").alias("c"),
        *[
            F.lead("c", k).over(w).cast("decimal(38,0)").alias(f"c{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    agg = leads.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_buckets"),
        F.sum(F.col("c") * F.col("c")).alias("den"),
        *[
            F.sum(F.col("c") * F.col(f"c{k}")).alias(f"num{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    pairs = agg.select(
        "event_type",
        "n_buckets",
        "den",
        F.posexplode(
            F.array(*[F.col(f"num{k}") for k in range(1, max_lag + 1)])
        ).alias("lag0", "num"),
    ).where(F.col("num").isNotNull())
    return pairs.select(
        "event_type",
        (F.col("lag0") + 1).cast("long").alias("lag"),
        F.expr(_ppm_expr("num", "den")).alias("acf_ppm"),
        "n_buckets",
    )


def event_acf_sql(max_lag: int = 12, minutes: int = 60) -> str:
    return (
        f"WITH {_grid_sql(minutes)},"
        " g2 AS (SELECT event_type, bucket, x, ROW_NUMBER() OVER ("
        "  PARTITION BY event_type ORDER BY bucket) - 1 AS idx FROM grid),"
        " st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,"
        "  CAST(SUM(x) AS BIGINT) AS s FROM g2 GROUP BY 1),"
        " c AS (SELECT g.event_type, g.idx, st.n,"
        "  CAST(st.n * g.x - st.s AS HUGEINT) AS c"
        "  FROM g2 g JOIN st USING (event_type)),"
        " den AS (SELECT event_type, MAX(n) AS n_buckets,"
        "  SUM(c * c) AS den FROM c GROUP BY 1),"
        f" lags AS (SELECT unnest(generate_series(1, {max_lag})) AS lag),"
        " nums AS (SELECT c1.event_type, l.lag, SUM(c1.c * c2.c) AS num"
        "  FROM c c1 CROSS JOIN lags l JOIN c c2"
        "  ON c2.event_type = c1.event_type AND c2.idx = c1.idx + l.lag"
        "  GROUP BY 1, 2)"
        " SELECT n.event_type, CAST(n.lag AS BIGINT) AS lag,"
        f" {_ppm_sql('n.num', 'd.den')} AS acf_ppm,"
        " CAST(d.n_buckets AS BIGINT) AS n_buckets"
        " FROM nums n JOIN den d USING (event_type)"
    )


# ---------------------------------------------------------------------------
# OLS trend — slope/intercept of the hourly count series in closed
# form from five integer moments; one grouped aggregate.
# ---------------------------------------------------------------------------


def event_trend(events: DataFrame, minutes: int = 60) -> DataFrame:
    """[event_type, n_buckets, slope_ppm_per_bucket, intercept_e6] —
    least-squares linear trend of the per-type hourly count series.
    slope = (nΣtx − ΣtΣx) / (nΣt² − (Σt)²), intercept =
    (Σx − slope·Σt)/n; quantized signed ppm / micro-units."""
    grid = _dense_counts(events, minutes)
    lo = grid.groupBy("event_type").agg(F.min("bucket").alias("lo_b"))
    win_us = 60_000_000 * minutes
    t = grid.join(F.broadcast(lo), "event_type").select(
        "event_type",
        "x",
        F.expr(f"(bucket - lo_b) div {win_us}").cast("long").alias("t"),
    )
    d = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    agg = t.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("t")).alias("st"),
        F.sum(d("t") * d("t")).alias("stt"),
        F.sum(d("t") * d("x")).alias("stx"),
    )
    moments = agg.select(
        "event_type",
        F.col("n").alias("n_buckets"),
        (F.col("n") * F.col("stx") - F.col("st") * F.col("sx")).alias("num"),
        (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).alias("den"),
        "sx",
        "st",
        "n",
    ).select(
        "event_type",
        "n_buckets",
        "num",
        "den",
        (F.col("sx") * F.col("den") - F.col("num") * F.col("st")).alias(
            "inum"
        ),
        (F.col("n").cast("decimal(38,0)") * F.col("den")).alias("iden"),
    )
    return moments.select(
        "event_type",
        "n_buckets",
        F.expr(_ppm_expr("num", "den")).alias("slope_ppm_per_bucket"),
        F.expr(_ppm_expr("inum", "iden")).alias("intercept_e6"),
    )


def event_trend_sql(minutes: int = 60) -> str:
    w = 60_000_000 * minutes
    return (
        f"WITH {_grid_sql(minutes)},"
        " lo AS (SELECT event_type, MIN(bucket) AS lo_b"
        "  FROM grid GROUP BY 1),"
        " t AS (SELECT g.event_type, CAST(g.x AS HUGEINT) AS x,"
        f"  CAST((g.bucket - lo.lo_b) // {w} AS HUGEINT) AS t"
        "  FROM grid g JOIN lo USING (event_type)),"
        " agg AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,"
        "  SUM(x) AS sx, SUM(t) AS st, SUM(t * t) AS stt,"
        "  SUM(t * x) AS stx FROM t GROUP BY 1),"
        " m AS (SELECT event_type, n, n * stx - st * sx AS num,"
        "  n * stt - st * st AS den, sx, st FROM agg),"
        " m2 AS (SELECT event_type, n, num, den,"
        "  sx * den - num * st AS inum, n * den AS iden FROM m)"
        " SELECT event_type, CAST(n AS BIGINT) AS n_buckets,"
        f" {_ppm_sql('num', 'den')} AS slope_ppm_per_bucket,"
        f" {_ppm_sql('inum', 'iden')} AS intercept_e6 FROM m2"
    )


# ---------------------------------------------------------------------------
# EWMA — integer recurrence s_t = (a·x_t·1e6 + (d−a)·s_{t−1}) // d,
# s_0 = x_0·1e6.  Sequential by definition (the floor at each step);
# Arrow kernel per series, recursive-CTE oracle.
# ---------------------------------------------------------------------------


def event_ewma(
    events: DataFrame,
    minutes: int = 60,
    alpha_num: int = 1,
    alpha_den: int = 8,
) -> DataFrame:
    """[event_type, bucket_start_us, n_events, ewma_e6] — exponentially
    weighted moving average of the hourly count series, α = a/d in
    integer micro-units with floor at every step."""
    grid = _dense_counts(events, minutes)
    schema = (
        "event_type string, bucket_start_us long, n_events long,"
        " ewma_e6 long"
    )
    a, dn = alpha_num, alpha_den

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket")
        x = pdf["x"].to_numpy(dtype=np.int64)
        s = np.zeros(len(x), dtype=np.int64)
        if len(x):
            s[0] = x[0] * E6
        for i in range(1, len(x)):
            s[i] = (a * x[i] * E6 + (dn - a) * s[i - 1]) // dn
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].to_numpy(),
                "bucket_start_us": pdf["bucket"].to_numpy(),
                "n_events": x,
                "ewma_e6": s,
            }
        )

    return grid.groupBy("event_type").applyInPandas(kernel, schema)


def event_ewma_sql(
    minutes: int = 60, alpha_num: int = 1, alpha_den: int = 8
) -> str:
    a, dn = alpha_num, alpha_den
    return (
        f"WITH RECURSIVE {_grid_sql(minutes)},"
        " g2 AS (SELECT event_type, bucket, x, ROW_NUMBER() OVER ("
        "  PARTITION BY event_type ORDER BY bucket) - 1 AS idx FROM grid),"
        " rec AS ("
        "  SELECT event_type, idx, bucket, x,"
        f"  CAST(x * {E6} AS BIGINT) AS s FROM g2 WHERE idx = 0"
        "  UNION ALL"
        "  SELECT g.event_type, g.idx, g.bucket, g.x,"
        f"  CAST(({a} * g.x * {E6} + {dn - a} * r.s) // {dn} AS BIGINT)"
        "  FROM rec r JOIN g2 g ON g.event_type = r.event_type"
        "  AND g.idx = r.idx + 1)"
        " SELECT event_type, bucket AS bucket_start_us,"
        " x AS n_events, s AS ewma_e6 FROM rec"
    )


# ---------------------------------------------------------------------------
# CUSUM changepoints — one-sided cumulative sum of the n-scaled
# deviation d_t = n·x_t − Σx (integer, sums to 0 over the series):
# S_t = max(0, S_{t−1} + d_t), flagged when S_t exceeds h·Σx
# (h buckets' worth of average volume accumulated above the mean —
# h=24 ≡ "a day of 2× traffic").  Same sequential tier as EWMA.
# ---------------------------------------------------------------------------


def event_cusum(
    events: DataFrame, minutes: int = 60, h_buckets: int = 24
) -> DataFrame:
    """[event_type, bucket_start_us, n_events, cusum_units, is_change]
    — one-sided CUSUM over the hourly count series in exact n-scaled
    integer units; is_change = 1 where the statistic crosses
    h_buckets · Σx."""
    grid = _dense_counts(events, minutes)
    schema = (
        "event_type string, bucket_start_us long, n_events long,"
        " cusum_units long, is_change long"
    )
    h = h_buckets

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket")
        x = pdf["x"].to_numpy(dtype=np.int64)
        n, total = np.int64(len(x)), np.int64(x.sum())
        s = np.zeros(len(x), dtype=np.int64)
        run = np.int64(0)
        for i in range(len(x)):
            run = max(np.int64(0), run + n * x[i] - total)
            s[i] = run
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].to_numpy(),
                "bucket_start_us": pdf["bucket"].to_numpy(),
                "n_events": x,
                "cusum_units": s,
                "is_change": (s > h * total).astype(np.int64),
            }
        )

    return grid.groupBy("event_type").applyInPandas(kernel, schema)


def event_cusum_sql(minutes: int = 60, h_buckets: int = 24) -> str:
    return (
        f"WITH RECURSIVE {_grid_sql(minutes)},"
        " g2 AS (SELECT event_type, bucket, x, ROW_NUMBER() OVER ("
        "  PARTITION BY event_type ORDER BY bucket) - 1 AS idx FROM grid),"
        " st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,"
        "  CAST(SUM(x) AS BIGINT) AS total FROM g2 GROUP BY 1),"
        " g3 AS (SELECT g.*, st.n, st.total FROM g2 g"
        "  JOIN st USING (event_type)),"
        " rec AS ("
        "  SELECT event_type, idx, bucket, x, n, total,"
        "  GREATEST(CAST(0 AS BIGINT), n * x - total) AS cus"
        "  FROM g3 WHERE idx = 0"
        "  UNION ALL"
        "  SELECT g.event_type, g.idx, g.bucket, g.x, g.n, g.total,"
        "  GREATEST(CAST(0 AS BIGINT), r.cus + g.n * g.x - g.total)"
        "  FROM rec r JOIN g3 g ON g.event_type = r.event_type"
        "  AND g.idx = r.idx + 1)"
        " SELECT event_type, bucket AS bucket_start_us, x AS n_events,"
        " cus AS cusum_units,"
        f" CAST(CASE WHEN cus > {h_buckets} * total THEN 1 ELSE 0 END"
        "  AS BIGINT) AS is_change FROM rec"
    )


# ---------------------------------------------------------------------------
# Seasonal profile — (day-of-week, hour-of-day) share of each type's
# volume.  Pure integer calendar math on epoch micros (no engine date
# functions — timezone-free by construction): dow 0 = Monday via the
# (+3) offset from the 1970-01-01 Thursday epoch.
# ---------------------------------------------------------------------------


# Cross-engine sign discipline: Spark `div` truncates toward zero while
# DuckDB `//` floors, so naive `pmod(us div D + k, m)` diverges from the
# oracle for NEGATIVE (pre-1970) epoch micros.  `(x - pmod(x, D)) div D`
# is an exact integer division, i.e. true FLOOR division on both engines
# (DuckDB's integer `//` ALSO truncates toward zero — measured: -7 // 2 =
# -3 — so the oracle needs the same explicit-floor spelling, built by
# `_floor_div_sql`); the outer pmod then yields the same nonnegative
# residue everywhere.
_FLOOR_DOW_EXPR = (
    "pmod(({col} - pmod({col}, 86400000000)) div 86400000000 + 3, 7)"
)
_FLOOR_HOUR_EXPR = (
    "pmod(({col} - pmod({col}, 3600000000)) div 3600000000, 24)"
)


def _floor_div_sql(col: str, d: int) -> str:
    """DuckDB integer FLOOR division (its `//` truncates toward zero,
    same as Spark `div`): subtract the nonnegative residue first, so
    the division is exact and the truncation direction is moot."""
    return f"(({col} - (({col} % {d} + {d}) % {d})) // {d})"


def _dow_sql(col: str) -> str:
    return f"(({_floor_div_sql(col, 86_400_000_000)} + 3) % 7 + 7) % 7"


def _hour_sql(col: str) -> str:
    return f"({_floor_div_sql(col, 3_600_000_000)} % 24 + 24) % 24"


def event_seasonality(events: DataFrame) -> DataFrame:
    """[event_type, dow, hour, n_events, share_ppm] — weekly seasonal
    volume profile per event type; share_ppm = bucket's ppm share of
    the type's total."""
    us = event_micros(events)
    cells = (
        events.select("event_type", us.cast("long").alias("us"))
        .select(
            "event_type",
            F.expr(_FLOOR_DOW_EXPR.format(col="us"))
            .cast("long")
            .alias("dow"),
            F.expr(_FLOOR_HOUR_EXPR.format(col="us"))
            .cast("long")
            .alias("hour"),
        )
        .groupBy("event_type", "dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    w = Window.partitionBy("event_type")
    return cells.select(
        "event_type",
        "dow",
        "hour",
        "n_events",
        F.sum("n_events").over(w).alias("type_total"),
    ).select(
        "event_type",
        "dow",
        "hour",
        "n_events",
        F.expr(f"CAST(({E6} * n_events) div type_total AS BIGINT)").alias(
            "share_ppm"
        ),
    )


def event_seasonality_sql() -> str:
    return (
        "WITH cells AS (SELECT event_type,"
        f" {_dow_sql('epoch_us(ts)')} AS dow,"
        f" {_hour_sql('epoch_us(ts)')} AS hour,"
        " CAST(COUNT(*) AS BIGINT) AS n_events"
        " FROM events GROUP BY 1, 2, 3)"
        " SELECT event_type, CAST(dow AS BIGINT) AS dow,"
        " CAST(hour AS BIGINT) AS hour, n_events,"
        f" CAST(({E6} * n_events) // SUM(n_events) OVER ("
        " PARTITION BY event_type) AS BIGINT) AS share_ppm"
        " FROM cells"
    )


# ---------------------------------------------------------------------------
# Seasonal-adjusted anomalies — residuals of the dense hourly grid
# against the (dow, hour) seasonal profile, in exact cell-scaled
# integer units: d = cell_cnt·x − cell_sum is the within-cell
# mean-centered deviation (integer; sums to 0 per cell), and
# |d| > cell_sum means the bucket deviates from its seasonal mean by
# more than one mean's worth — the spike/dropout flag a volume
# monitor raises AFTER seasonality is explained away (the naive
# z-score in event_anomalies flags every Friday peak; this doesn't).
# ---------------------------------------------------------------------------


def seasonal_anomalies(events: DataFrame, minutes: int = 60) -> DataFrame:
    """[event_type, bucket_start_us, n_events, expected_e6,
    resid_units, is_anomaly] — hourly buckets vs their (dow, hour)
    seasonal expectation."""
    grid = _dense_counts(events, minutes)
    keyed = grid.select(
        "event_type",
        "bucket",
        "x",
        F.expr(_FLOOR_DOW_EXPR.format(col="bucket")).alias("dow"),
        F.expr(_FLOOR_HOUR_EXPR.format(col="bucket")).alias("hour"),
    )
    cells = keyed.groupBy("event_type", "dow", "hour").agg(
        F.sum("x").alias("cell_sum"),
        F.count(F.lit(1)).alias("cell_cnt"),
    )
    return (
        keyed.join(F.broadcast(cells), ["event_type", "dow", "hour"])
        .select(
            "event_type",
            F.col("bucket").alias("bucket_start_us"),
            F.col("x").alias("n_events"),
            F.expr(f"CAST(({E6} * cell_sum) div cell_cnt AS BIGINT)").alias(
                "expected_e6"
            ),
            (F.col("cell_cnt") * F.col("x") - F.col("cell_sum"))
            .cast("long")
            .alias("resid_units"),
            F.expr(
                "CAST(CASE WHEN abs(cell_cnt * x - cell_sum) > cell_sum"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("is_anomaly"),
        )
    )


def seasonal_anomalies_sql(minutes: int = 60) -> str:
    return (
        f"WITH {_grid_sql(minutes)},"
        " keyed AS (SELECT event_type, bucket, x,"
        f" {_dow_sql('bucket')} AS dow,"
        f" {_hour_sql('bucket')} AS hour FROM grid),"
        " cells AS (SELECT event_type, dow, hour,"
        " CAST(SUM(x) AS BIGINT) AS cell_sum,"
        " CAST(COUNT(*) AS BIGINT) AS cell_cnt"
        " FROM keyed GROUP BY 1, 2, 3)"
        " SELECT k.event_type, k.bucket AS bucket_start_us,"
        " k.x AS n_events,"
        f" CAST(({E6} * c.cell_sum) // c.cell_cnt AS BIGINT)"
        "  AS expected_e6,"
        " CAST(c.cell_cnt * k.x - c.cell_sum AS BIGINT) AS resid_units,"
        " CAST(CASE WHEN abs(c.cell_cnt * k.x - c.cell_sum) > c.cell_sum"
        "  THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly"
        " FROM keyed k JOIN cells c ON c.event_type = k.event_type"
        " AND c.dow = k.dow AND c.hour = k.hour"
    )


# ---------------------------------------------------------------------------
# Holt's linear-trend smoothing (double exponential) — the classic
# short-horizon forecasting baseline over the same dense count grid.
# Same sequential tier as EWMA/CUSUM: the per-step integer floor
# destroys any closed form, so the engine runs an Arrow kernel per
# series and the oracle replays the identical recurrence with a
# recursive CTE. The TREND state is signed, so every division uses
# the sign/abs truncating spelling (module docstring).
# ---------------------------------------------------------------------------


def _tdiv(num: np.ndarray | int, den: int) -> int:
    """Truncate-toward-zero integer division (matches Spark `div`
    and the sign/abs SQL spelling; numpy/python // floors)."""
    n = int(num)
    s = -1 if n < 0 else 1
    return s * (abs(n) // den)


def event_holt(
    events: DataFrame,
    minutes: int = 60,
    alpha_num: int = 1,
    alpha_den: int = 8,
    beta_num: int = 1,
    beta_den: int = 16,
) -> DataFrame:
    """[event_type, bucket_start_us, n_events, level_e6, trend_e6,
    forecast_e6] — Holt double-exponential smoothing of the hourly
    count series in integer micro-units, α = 1/8, β = 1/16:

        forecast_t = level_{t−1} + trend_{t−1}          (one-step)
        level_t = tdiv(a·x_t·E6 + (d−a)·forecast_t, d)
        trend_t = tdiv(b·(level_t − level_{t−1}) + (db−b)·trend_{t−1}, db)

    init level_0 = x_0·E6, trend_0 = 0, forecast_0 = level_0 (the
    zero-information forecast). tdiv truncates toward zero — the
    signed-trend analog of the EWMA floor, spelled identically in
    the kernel and the oracle."""
    grid = _dense_counts(events, minutes)
    schema = (
        "event_type string, bucket_start_us long, n_events long,"
        " level_e6 long, trend_e6 long, forecast_e6 long"
    )
    a, d = alpha_num, alpha_den
    b, db = beta_num, beta_den

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket")
        x = pdf["x"].to_numpy(dtype=np.int64)
        n = len(x)
        lev = np.zeros(n, dtype=np.int64)
        tr = np.zeros(n, dtype=np.int64)
        fc = np.zeros(n, dtype=np.int64)
        if n:
            lev[0] = x[0] * E6
            fc[0] = lev[0]
        for i in range(1, n):
            fc[i] = lev[i - 1] + tr[i - 1]
            lev[i] = _tdiv(a * x[i] * E6 + (d - a) * fc[i], d)
            tr[i] = _tdiv(
                b * (lev[i] - lev[i - 1]) + (db - b) * tr[i - 1], db
            )
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].to_numpy(),
                "bucket_start_us": pdf["bucket"].to_numpy(),
                "n_events": x,
                "level_e6": lev,
                "trend_e6": tr,
                "forecast_e6": fc,
            }
        )

    return grid.groupBy("event_type").applyInPandas(kernel, schema)


def _tdiv_sql(num: str, den: int) -> str:
    return (
        f"CAST(sign({num}) AS BIGINT) * (abs({num}) // {den})"
    )


def event_holt_sql(
    minutes: int = 60,
    alpha_num: int = 1,
    alpha_den: int = 8,
    beta_num: int = 1,
    beta_den: int = 16,
) -> str:
    a, d = alpha_num, alpha_den
    b, db = beta_num, beta_den
    lev_num = f"({a} * g.x * {E6} + {d - a} * (r.lev + r.tr))"
    lev_expr = _tdiv_sql(lev_num, d)
    # outer select sees the subquery's projected columns (lev, tr),
    # not the recursive alias r
    tr_num = f"({b} * (lev_new - lev) + {db - b} * tr)"
    tr_expr = _tdiv_sql(tr_num, db)
    return (
        f"WITH RECURSIVE {_grid_sql(minutes)},"
        " g2 AS (SELECT event_type, bucket, x, ROW_NUMBER() OVER ("
        "  PARTITION BY event_type ORDER BY bucket) - 1 AS idx FROM grid),"
        " rec AS ("
        "  SELECT event_type, idx, bucket, x,"
        f"  CAST(x * {E6} AS BIGINT) AS lev,"
        "  CAST(0 AS BIGINT) AS tr,"
        f"  CAST(x * {E6} AS BIGINT) AS fc FROM g2 WHERE idx = 0"
        "  UNION ALL"
        "  SELECT event_type, idx, bucket, x,"
        "   CAST(lev_new AS BIGINT),"
        f"   CAST({tr_expr} AS BIGINT),"
        "   CAST(fc_new AS BIGINT)"
        "  FROM (SELECT g.event_type, g.idx, g.bucket, g.x, r.lev, r.tr,"
        "    r.lev + r.tr AS fc_new,"
        f"    {lev_expr} AS lev_new"
        "   FROM rec r JOIN g2 g ON g.event_type = r.event_type"
        "   AND g.idx = r.idx + 1))"
        " SELECT event_type, bucket AS bucket_start_us, x AS n_events,"
        " lev AS level_e6, tr AS trend_e6, fc AS forecast_e6 FROM rec"
    )

"""Experiment (A/B test) analysis over the event stream — per-metric
variant comparison with Welch's z statistic, the readout layer every
product-analytics pipeline ends in.

Engine capability beyond the reference surface (no temporal/behavioral
data there); same tier as the sessionize/funnel/retention family.

Exactness discipline: event values are quantized once to integer
micro-units (round(value·10⁶), the kmeans_cells discipline), so the
per-(metric, variant) moment sums n / Σx / Σx² are exact order-free
integer aggregations (Σx² accumulates in DECIMAL(38,0) / HUGEINT —
big-product-sum rule); means, variances and the z statistic are then
single deterministic double expressions over those integers, emitted
with ROUND(·, 6) — the embedding_dim_stats convention that keeps a
float column hash-stable across engines.

Scale shape: ONE hash aggregation over (metric, variant) with map-side
partial combine — the shuffle carries a handful of rows per metric
regardless of event volume; the variant pivot is a 2-row-per-metric
conditional aggregation, no join. At 100 TB this is the cheapest
query in the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALUE_SCALE = 1_000_000


def ab_test_zscores(events: DataFrame) -> DataFrame:
    """[event_type, n_a, n_b, mean_a, mean_b, z] — two-sample Welch z
    per event_type over the event `value` metric, variants assigned
    deterministically by user-id parity (a = even, b = odd; in
    production the assignment column comes from the experiment system
    — parity keeps the oracle engine-agnostic).

    z = (mean_a − mean_b) / sqrt(var_a/n_a + var_b/n_b), population
    variances; metrics with fewer than 2 observations per arm or zero
    pooled variance are omitted (z undefined)."""
    q = events.select(
        "event_type",
        (F.col("user_id") % 2 == 0).alias("is_a"),
        F.expr(f"CAST(round(value * {VALUE_SCALE}.0) AS BIGINT)").alias("x"),
    )
    agg = q.groupBy("event_type").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("is_a"), F.col("x")).otherwise(F.lit(0)))
        .cast("long")
        .alias("s_a"),
        F.sum(F.when(~F.col("is_a"), F.col("x")).otherwise(F.lit(0)))
        .cast("long")
        .alias("s_b"),
        F.sum(
            F.when(
                F.col("is_a"),
                F.col("x").cast("decimal(38,0)") * F.col("x"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("s2_a"),
        F.sum(
            F.when(
                ~F.col("is_a"),
                F.col("x").cast("decimal(38,0)") * F.col("x"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("s2_b"),
    )
    scale = float(VALUE_SCALE)
    mean_a = F.col("s_a") / F.col("n_a") / scale
    mean_b = F.col("s_b") / F.col("n_b") / scale
    var_a = (
        F.col("s2_a").cast("double") / F.col("n_a")
        - (F.col("s_a") / F.col("n_a")) * (F.col("s_a") / F.col("n_a"))
    ) / (scale * scale)
    var_b = (
        F.col("s2_b").cast("double") / F.col("n_b")
        - (F.col("s_b") / F.col("n_b")) * (F.col("s_b") / F.col("n_b"))
    ) / (scale * scale)
    # Filter on the PRE-sqrt variance sum, mirroring the SQL oracle's
    # WHERE clause: a tiny negative sum (all-equal arms with large
    # quantized values past 2^53 in the DOUBLE cast) would make
    # sqrt() NaN, and Spark orders NaN above every number — so a
    # post-sqrt `> 0` filter KEEPS exactly the degenerate row the
    # filter exists to drop, while DuckDB's pre-sqrt guard drops it.
    var_sum = var_a / F.col("n_a") + var_b / F.col("n_b")
    return (
        agg.filter((F.col("n_a") >= 2) & (F.col("n_b") >= 2))
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.round(mean_a, 6).cast("double").alias("mean_a"),
            F.round(mean_b, 6).cast("double").alias("mean_b"),
            var_sum.alias("_varsum"),
            F.round((mean_a - mean_b) / F.sqrt(var_sum), 6)
            .cast("double")
            .alias("z"),
        )
        .filter(F.col("_varsum") > 0)
        .drop("_varsum")
    )


def ab_test_zscores_sql() -> str:
    s = VALUE_SCALE
    return (
        "WITH q AS (SELECT event_type, user_id % 2 = 0 AS is_a,"
        f" CAST(round(value * {s}.0) AS BIGINT) AS x FROM events),"
        " agg AS (SELECT event_type,"
        " CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,"
        " CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b,"
        " CAST(SUM(CASE WHEN is_a THEN x ELSE 0 END) AS BIGINT) AS s_a,"
        " CAST(SUM(CASE WHEN is_a THEN 0 ELSE x END) AS BIGINT) AS s_b,"
        " SUM(CASE WHEN is_a THEN CAST(x AS HUGEINT) * x ELSE 0 END)"
        "  AS s2_a,"
        " SUM(CASE WHEN is_a THEN 0 ELSE CAST(x AS HUGEINT) * x END)"
        "  AS s2_b"
        " FROM q GROUP BY event_type)"
        " SELECT event_type, n_a, n_b,"
        f" ROUND(s_a / CAST(n_a AS DOUBLE) / {s}.0, 6) AS mean_a,"
        f" ROUND(s_b / CAST(n_b AS DOUBLE) / {s}.0, 6) AS mean_b,"
        " ROUND((s_a / CAST(n_a AS DOUBLE) / 1e6"
        "   - s_b / CAST(n_b AS DOUBLE) / 1e6)"
        " / sqrt((CAST(s2_a AS DOUBLE) / n_a"
        "   - (s_a / CAST(n_a AS DOUBLE)) * (s_a / CAST(n_a AS DOUBLE)))"
        f"  / ({s}.0 * {s}.0) / n_a"
        "  + (CAST(s2_b AS DOUBLE) / n_b"
        "   - (s_b / CAST(n_b AS DOUBLE)) * (s_b / CAST(n_b AS DOUBLE)))"
        f"  / ({s}.0 * {s}.0) / n_b), 6) AS z"
        " FROM agg"
        " WHERE n_a >= 2 AND n_b >= 2"
        " AND (CAST(s2_a AS DOUBLE) / n_a"
        "   - (s_a / CAST(n_a AS DOUBLE)) * (s_a / CAST(n_a AS DOUBLE)))"
        f"  / ({s}.0 * {s}.0) / n_a"
        "  + (CAST(s2_b AS DOUBLE) / n_b"
        "   - (s_b / CAST(n_b AS DOUBLE)) * (s_b / CAST(n_b AS DOUBLE)))"
        f"  / ({s}.0 * {s}.0) / n_b > 0"
        " ORDER BY event_type"
    )

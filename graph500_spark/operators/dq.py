"""Data-quality checks over the warehouse schema — the
constraint-verification layer (Deequ-style) a pipeline runs before
trusting its inputs.

Beyond the graph reference surface, but the same validate-phase
philosophy as the spec's BFS checks (mpi/validate.cc): compute a
compact summary of violations; a clean dataset yields known values,
so the summary row-set is oracle-checkable.

Plan shapes: PK uniqueness is a map-side-combinable count per key with
an early HAVING filter; FK integrity is a LEFT ANTI join per edge of
the FK graph — dims broadcast, the one fact-fact FK (lineitem →
orders) shuffles on its natural key. At 100 TB, both are exactly the
shapes you'd schedule nightly: no collect, no window, one pass per
constraint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# (child table, fk column, parent table, pk column)
FK_EDGES = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)

PK_COLUMNS = (
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("customer", "c_custkey"),
    ("supplier", "s_suppkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
    ("events", "event_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
)


def fk_integrity(tables: dict[str, DataFrame]) -> DataFrame:
    """Referential-integrity audit: one row per FK edge of the schema
    — [child_table, fk_column, parent_table, n_child_rows, n_orphans].
    n_orphans counts child rows whose FK value has no parent (NULL FKs
    count as orphans: a warehouse FK is NOT NULL by contract).

    Plan: per edge, a LEFT ANTI join of the child's FK projection
    against the parent's key set — broadcast when the parent is a
    dimension; the results are a handful of 1-row aggregates unioned
    driver-side (plan assembly, not data movement)."""
    parts = []
    for child, fk, parent, pk in FK_EDGES:
        c = tables[child].select(
            F.col(fk).cast("long").alias("fk")
        )
        p = tables[parent].select(
            F.col(pk).cast("long").alias("fk")
        ).distinct()
        orphans = c.join(p, "fk", "left_anti")
        parts.append(
            c.agg(
                F.lit(child).alias("child_table"),
                F.lit(fk).alias("fk_column"),
                F.lit(parent).alias("parent_table"),
                F.count(F.lit(1)).alias("n_child_rows"),
            ).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "child_table", "fk_column", "parent_table", "n_child_rows",
        "n_orphans",
    )


def fk_integrity_sql() -> str:
    selects = []
    for child, fk, parent, pk in FK_EDGES:
        selects.append(
            f"SELECT '{child}' AS child_table, '{fk}' AS fk_column,"
            f" '{parent}' AS parent_table,"
            f" (SELECT CAST(COUNT(*) AS BIGINT) FROM {child})"
            " AS n_child_rows,"
            f" (SELECT CAST(COUNT(*) AS BIGINT) FROM {child} c"
            f" WHERE NOT EXISTS (SELECT 1 FROM {parent} p"
            f" WHERE p.{pk} = c.{fk})) AS n_orphans"
        )
    return " UNION ALL ".join(selects)


def pk_uniqueness(tables: dict[str, DataFrame]) -> DataFrame:
    """Primary-key audit: [table_name, pk_column, n_rows, n_distinct,
    n_dup_keys] per table — n_dup_keys = keys appearing more than
    once (0 on a clean warehouse; the count-of-violating-keys form
    every DQ framework reports).

    Plan: one hash aggregate per table on its key (map-side partials),
    then a 1-row summary — never a self-join."""
    parts = []
    for table, pk in PK_COLUMNS:
        per_key = (
            tables[table]
            .groupBy(F.col(pk).cast("long").alias("k"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        parts.append(
            per_key.agg(
                F.lit(table).alias("table_name"),
                F.lit(pk).alias("pk_column"),
                F.sum("n").alias("n_rows"),
                F.count(F.lit(1)).alias("n_distinct"),
                F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_dup_keys"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pk_uniqueness_sql() -> str:
    selects = []
    for table, pk in PK_COLUMNS:
        selects.append(
            f"SELECT '{table}' AS table_name, '{pk}' AS pk_column,"
            " CAST(SUM(n) AS BIGINT) AS n_rows,"
            " CAST(COUNT(*) AS BIGINT) AS n_distinct,"
            " CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_dup_keys"
            f" FROM (SELECT CAST({pk} AS BIGINT) AS k,"
            f" COUNT(*) AS n FROM {table} GROUP BY 1)"
        )
    return " UNION ALL ".join(selects)


def completeness(df: DataFrame, table_name: str) -> DataFrame:
    """Null-rate audit: [table_name, col_name, n_rows, n_nulls] for
    every column — one pass, all columns counted in a single
    aggregate (never one job per column)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__null_{c}")
        )
    row = df.agg(*aggs)
    parts = [
        row.select(
            F.lit(table_name).alias("table_name"),
            F.lit(c).alias("col_name"),
            F.col("__n").cast("long").alias("n_rows"),
            F.col(f"__null_{c}").alias("n_nulls"),
        )
        for c in df.columns
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def completeness_sql(table: str, columns: list[str]) -> str:
    selects = [
        f"SELECT '{table}' AS table_name, '{c}' AS col_name,"
        " CAST(COUNT(*) AS BIGINT) AS n_rows,"
        f" CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_nulls FROM {table}"
        for c in columns
    ]
    return " UNION ALL ".join(selects)


def key_skew_stats(df: DataFrame, key: str, table_name: str) -> DataFrame:
    """One-row shuffle-key skew diagnostic: [table_name, key_col,
    n_rows, n_keys, max_key_n, p99_key_n, mean_key_n_micro,
    skew_ratio_micro] — the salting decision at 100 TB in one number
    (skew_ratio = hottest key's rows / mean rows per key; a join or
    groupBy on this key puts max_key_n rows in one reduce task no
    matter how many partitions you provision, so ratio >> partition
    count means salt or AQE-skew-split).

    Plan: one map-side-combinable count per key (the corpus compresses
    to |keys| rows), then a single 1-row agg over that table; the
    exact-percentile sort runs on key-grain, never row-grain."""
    per = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return key_skew_from_counts(per, table_name, key)


def key_skew_from_counts(
    per: DataFrame, table_name: str, key: str
) -> DataFrame:
    """The skew readout over an already-reduced [k, n] per-key count
    table — shared by the batch diagnostic above and the streaming
    monitor (streaming/skew.py), so streamed == batch by
    construction."""
    return per.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("n").cast("long").alias("max_key_n"),
        F.round(F.expr("percentile(n, 0.99)"))
        .cast("long")
        .alias("p99_key_n"),
        F.round(F.avg("n") * 1_000_000.0)
        .cast("long")
        .alias("mean_key_n_micro"),
        F.round(F.max("n") * 1_000_000.0 / F.avg("n"))
        .cast("long")
        .alias("skew_ratio_micro"),
    ).select(
        F.lit(table_name).alias("table_name"),
        F.lit(key).alias("key_col"),
        "*",
    )


def key_skew_stats_sql(table: str, key: str) -> str:
    return (
        f"WITH per AS (SELECT {key} AS k, CAST(COUNT(*) AS BIGINT) AS n"
        f" FROM {table} GROUP BY {key})"
        f" SELECT '{table}' AS table_name, '{key}' AS key_col,"
        " CAST(SUM(n) AS BIGINT) AS n_rows,"
        " CAST(COUNT(*) AS BIGINT) AS n_keys,"
        " CAST(MAX(n) AS BIGINT) AS max_key_n,"
        " CAST(round(quantile_cont(n, 0.99)) AS BIGINT) AS p99_key_n,"
        " CAST(round(AVG(n) * 1000000.0) AS BIGINT) AS mean_key_n_micro,"
        " CAST(round(MAX(n) * 1000000.0 / AVG(n)) AS BIGINT)"
        "  AS skew_ratio_micro"
        " FROM per"
    )

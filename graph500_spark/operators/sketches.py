"""Deterministic mergeable sketches: KMV (k-minimum-values) distinct
counting and count-min frequency estimation — hash-checkable twins of
the engine's probabilistic tiers (approx_count_distinct HLL,
approx_percentile KLL), built so the oracle gate can verify them
value-exactly.

Why deterministic sketches matter at 100 TB: the estimator itself is
part of the product (data-card statistics, dedup-rate monitoring,
shard-level cardinality planning). A sketch whose value depends only
on the data and a fixed hash — not on partitioning, row order, or an
engine-private seed — is reproducible across runs AND engines, which
is what makes it auditable. Both sketches here are mergeable
(associative over partitions/shards):

* KMV: the k smallest values of h(x) over distinct x.  Merge = k
  smallest of the union of per-shard sketches — identical to
  sketching the union directly, which `kmv_source_sketches` both
  exploits and demonstrates (its __union__ row is computed FROM the
  per-source sketches, never from the raw rows).  Estimator for a
  full sketch: (k−1)·R / h_(k) with R = 2^60 (the md5 hash-tier
  space, operators/text.py); exact integral division via
  DECIMAL(38,0) `div` on Spark and HUGEINT `//` on DuckDB (both
  truncate; all operands nonnegative).  A sketch with fewer than k
  values IS the distinct set, so the estimate is exact by definition.
* Count-min: d=4 rows × w buckets of summed counts under d
  independent deterministic hashes (token salted with the row id);
  point estimate = min over rows — never an undercount, so
  cms_estimate ≥ exact_count is an invariant the tests pin.

Plan shapes: KMV is one distinct-shuffle + a distributed TakeOrdered
of k rows (nothing wider than k ever reaches the driver); the
count-min table aggregates per-token counts FIRST (one Zipf-skewed
token shuffle with map-side partials — AQE handles the hot keys),
then explodes only DISTINCT tokens ×d into the (row, bucket) grid, so
the 4× blowup applies to the vocabulary, not the token stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph500_spark.operators.text import (
    DUCK_TOKENS,
    SPARK_TOKENS,
    duck_strhash,
    spark_strhash,
)

HASH_SPACE = 1 << 60  # md5 tier: top 60 bits (operators/text.py)
E6 = 1_000_000


def _kmv_est_spark(n_sketch: str, kth: str, k: int, exact_small: str) -> str:
    """Spark SQL: KMV estimate — exact when the sketch is undersized."""
    return (
        f"CAST(CASE WHEN {n_sketch} < {k} THEN {exact_small} ELSE"
        f" (CAST({k - 1} AS DECIMAL(38,0))"
        f" * CAST({HASH_SPACE} AS DECIMAL(38,0)))"
        f" div CAST({kth} AS DECIMAL(38,0)) END AS BIGINT)"
    )


def _kmv_est_duck(n_sketch: str, kth: str, k: int, exact_small: str) -> str:
    return (
        f"CAST(CASE WHEN {n_sketch} < {k} THEN {exact_small} ELSE"
        f" (CAST({k - 1} AS HUGEINT) * CAST({HASH_SPACE} AS HUGEINT))"
        f" // CAST({kth} AS HUGEINT) END AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# KMV distinct-user estimate vs exact (accuracy report in-engine)
# ---------------------------------------------------------------------------


def kmv_distinct_users(events: DataFrame, k: int = 64) -> DataFrame:
    """One row: [k, kth_hash, est_distinct, exact_distinct,
    abs_err_ppm] — KMV cardinality estimate of distinct user_ids with
    the exact count alongside (the in-engine accuracy report, same
    pattern as ann_recall)."""
    hashes = events.select(
        F.expr(spark_strhash("cast(user_id as string)")).alias("h")
    ).distinct()
    sketch = (
        hashes.orderBy("h")
        .limit(k)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            F.max("h").cast("long").alias("kth_hash"),
        )
    )
    exact = events.agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    est = _kmv_est_spark("n_sketch", "kth_hash", k, "exact_distinct")
    return (
        sketch.crossJoin(F.broadcast(exact))  # 1×1 broadcast product
        .select(
            F.lit(k).cast("long").alias("k"),
            "kth_hash",
            F.expr(est).alias("est_distinct"),
            "exact_distinct",
        )
        .selectExpr(
            "k",
            "kth_hash",
            "est_distinct",
            "exact_distinct",
            f"CAST(({E6} * abs(est_distinct - exact_distinct))"
            " div exact_distinct AS BIGINT) AS abs_err_ppm",
        )
    )


def kmv_distinct_users_sql(k: int = 64) -> str:
    h = duck_strhash("CAST(user_id AS VARCHAR)")
    est = _kmv_est_duck("n_sketch", "kth_hash", k, "exact_distinct")
    return (
        "WITH hashes AS (SELECT DISTINCT"
        f" CAST({h} AS BIGINT) AS h FROM events),"
        f" sk AS (SELECT * FROM hashes ORDER BY h LIMIT {k}),"
        " sketch AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sketch,"
        "  CAST(MAX(h) AS BIGINT) AS kth_hash FROM sk),"
        " exact AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)"
        "  AS exact_distinct FROM events),"
        " j AS (SELECT * FROM sketch CROSS JOIN exact)"
        f" SELECT CAST({k} AS BIGINT) AS k, kth_hash,"
        f" {est} AS est_distinct, exact_distinct,"
        f" CAST(({E6} * abs({est} - exact_distinct))"
        " // exact_distinct AS BIGINT) AS abs_err_ppm FROM j"
    )


# ---------------------------------------------------------------------------
# Per-source KMV sketches + sketch-merge union (the mergeability demo:
# the __union__ row is computed from the per-source sketches alone)
# ---------------------------------------------------------------------------


def kmv_source_sketches(docs: DataFrame, k: int = 16) -> DataFrame:
    """[source, n_sketch, kth_hash, est_distinct] — per-source KMV
    over distinct document-text hashes, plus a __union__ row merged
    from the per-source sketches (k smallest of their union), exactly
    what a shard-per-source 100 TB layout would ship to the
    coordinator."""
    from pyspark.sql import Window

    hashes = docs.select(
        "source", F.expr(spark_strhash("text")).alias("h")
    ).distinct()
    w = Window.partitionBy("source").orderBy("h")
    sketches = (
        hashes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )
    per_source = sketches.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_sketch"),
        F.max("h").cast("long").alias("kth_hash"),
    )
    merged = (
        sketches.select("h")
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            F.max("h").cast("long").alias("kth_hash"),
        )
        .select(F.lit("__union__").alias("source"), "n_sketch", "kth_hash")
    )
    est = _kmv_est_spark("n_sketch", "kth_hash", k, "n_sketch")
    return (
        per_source.select("source", "n_sketch", "kth_hash")
        .unionByName(merged)
        .selectExpr(
            "source", "n_sketch", "kth_hash", f"{est} AS est_distinct"
        )
    )


def kmv_source_sketches_sql(k: int = 16) -> str:
    h = duck_strhash("text")
    est = _kmv_est_duck("n_sketch", "kth_hash", k, "n_sketch")
    return (
        "WITH hashes AS (SELECT DISTINCT source,"
        f" CAST({h} AS BIGINT) AS h FROM documents),"
        " sk AS (SELECT source, h FROM (SELECT source, h, ROW_NUMBER()"
        "  OVER (PARTITION BY source ORDER BY h) AS rn FROM hashes)"
        f" WHERE rn <= {k}),"
        " per_source AS (SELECT source,"
        "  CAST(COUNT(*) AS BIGINT) AS n_sketch,"
        "  CAST(MAX(h) AS BIGINT) AS kth_hash FROM sk GROUP BY source),"
        " mh AS (SELECT DISTINCT h FROM sk ORDER BY h LIMIT"
        f" {k}),"
        " merged AS (SELECT '__union__' AS source,"
        "  CAST(COUNT(*) AS BIGINT) AS n_sketch,"
        "  CAST(MAX(h) AS BIGINT) AS kth_hash FROM mh),"
        " allrows AS (SELECT * FROM per_source UNION ALL"
        "  SELECT * FROM merged)"
        " SELECT source, n_sketch, kth_hash,"
        f" {est} AS est_distinct FROM allrows"
    )


# ---------------------------------------------------------------------------
# Count-min sketch: d×w table of summed counts, point estimates for
# the exact heavy hitters (overcount report in-engine)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_heavy_tokens(
    docs: DataFrame,
    top: int = 20,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """[token, exact_count, cms_estimate, overcount] — count-min
    estimates for the exact top tokens.  cms_estimate ≥ exact_count
    always (collisions only add); overcount is the audit column."""
    # tok_counts feeds three consumers (table build, candidate top-k,
    # candidate cells); kept unpersisted — it is one narrow
    # explode+groupBy over the scan, and the module stays
    # side-effect-free (no cache-lifecycle contract needed; a 100 TB
    # pipeline would persist the token-count table upstream).
    tok_counts = (
        docs.select(F.explode(F.expr(SPARK_TOKENS)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    def _bucket(r: int):
        salted = spark_strhash(f"concat(token, '#', '{r}')")
        return (
            F.expr(f"pmod({salted}, {width})").cast("long").alias("bucket")
        )

    buckets = [
        F.struct(F.lit(r).alias("r"), _bucket(r)) for r in range(depth)
    ]
    cms = (
        tok_counts.select(
            F.explode(F.array(*buckets)).alias("rb"), "cnt"
        )
        .select("rb.r", "rb.bucket", "cnt")
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").cast("long").alias("bucket_sum"))
    )
    candidates = tok_counts.orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    ).limit(top)
    cand_cells = candidates.select(
        "token",
        F.col("cnt").alias("exact_count"),
        F.explode(F.array(*buckets)).alias("rb"),
    ).select("token", "exact_count", "rb.r", "rb.bucket")
    return (
        cms.join(F.broadcast(cand_cells), ["r", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("bucket_sum").cast("long").alias("cms_estimate"))
        .select(
            "token",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias(
                "overcount"
            ),
        )
    )


def cms_heavy_tokens_sql(
    top: int = 20, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> str:
    def bucket(r: int) -> str:
        h = duck_strhash(f"(token || '#' || '{r}')")
        return f"(({h}) % {width} + {width}) % {width}"

    rows = " UNION ALL ".join(
        f"SELECT token, cnt, {r} AS r, CAST({bucket(r)} AS BIGINT)"
        " AS bucket FROM tok_counts"
        for r in range(depth)
    )
    return (
        "WITH tok_counts AS (SELECT token, CAST(COUNT(*) AS BIGINT)"
        f" AS cnt FROM (SELECT unnest({DUCK_TOKENS}) AS token"
        " FROM documents) GROUP BY token),"
        f" cells AS ({rows}),"
        " cms AS (SELECT r, bucket, CAST(SUM(cnt) AS BIGINT)"
        "  AS bucket_sum FROM cells GROUP BY r, bucket),"
        " cand AS (SELECT token, cnt AS exact_count FROM tok_counts"
        f"  ORDER BY cnt DESC, token ASC LIMIT {top}),"
        " cand_cells AS (SELECT c.token, c.exact_count, ce.r, ce.bucket"
        "  FROM cand c JOIN cells ce ON ce.token = c.token)"
        " SELECT cc.token, cc.exact_count,"
        " CAST(MIN(m.bucket_sum) AS BIGINT) AS cms_estimate,"
        " CAST(MIN(m.bucket_sum) - cc.exact_count AS BIGINT) AS overcount"
        " FROM cand_cells cc JOIN cms m"
        " ON m.r = cc.r AND m.bucket = cc.bucket"
        " GROUP BY cc.token, cc.exact_count"
    )


# ---------------------------------------------------------------------------
# KMV distinct-token (vocabulary-cardinality) estimate vs exact — the
# batch twin of streaming/distinct.py's incremental monitor
# ---------------------------------------------------------------------------


def kmv_distinct_tokens(docs: DataFrame, k: int = 64) -> DataFrame:
    """One row: [k, n_sketch, kth_hash, est_distinct, exact_distinct,
    abs_err_ppm] — KMV estimate of the corpus vocabulary size
    (distinct TOKEN_REGEX tokens) with the exact count alongside.
    Same sketch definition as the streaming monitor
    (streaming/distinct.py), so streamed == batch is exact, not
    approximate-equal: the k-smallest set is mergeable."""
    hashes = docs.select(
        F.explode(F.expr(SPARK_TOKENS)).alias("token")
    ).select(F.expr(spark_strhash("token")).alias("h")).distinct()
    sketch = (
        hashes.orderBy("h")
        .limit(k)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            F.max("h").cast("long").alias("kth_hash"),
        )
    )
    exact = docs.select(
        F.explode(F.expr(SPARK_TOKENS)).alias("token")
    ).agg(F.countDistinct("token").cast("long").alias("exact_distinct"))
    est = _kmv_est_spark("n_sketch", "kth_hash", k, "exact_distinct")
    return (
        sketch.crossJoin(F.broadcast(exact))
        .select(
            F.lit(k).cast("long").alias("k"),
            "n_sketch",
            "kth_hash",
            F.expr(est).alias("est_distinct"),
            "exact_distinct",
        )
        .selectExpr(
            "k",
            "n_sketch",
            "kth_hash",
            "est_distinct",
            "exact_distinct",
            f"CAST(({E6} * abs(est_distinct - exact_distinct))"
            " div exact_distinct AS BIGINT) AS abs_err_ppm",
        )
    )


def kmv_distinct_tokens_sql(k: int = 64) -> str:
    h = duck_strhash("token")
    est = _kmv_est_duck("n_sketch", "kth_hash", k, "exact_distinct")
    return (
        "WITH toks AS (SELECT unnest"
        f"({DUCK_TOKENS}) AS token FROM documents),"
        " hashes AS (SELECT DISTINCT"
        f" CAST({h} AS BIGINT) AS h FROM toks),"
        f" sk AS (SELECT * FROM hashes ORDER BY h LIMIT {k}),"
        " sketch AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sketch,"
        "  CAST(MAX(h) AS BIGINT) AS kth_hash FROM sk),"
        " exact AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT)"
        "  AS exact_distinct FROM toks),"
        " j AS (SELECT * FROM sketch CROSS JOIN exact)"
        f" SELECT CAST({k} AS BIGINT) AS k, n_sketch, kth_hash,"
        f" {est} AS est_distinct, exact_distinct,"
        f" CAST(({E6} * abs({est} - exact_distinct))"
        " // exact_distinct AS BIGINT) AS abs_err_ppm FROM j"
    )

"""Approximate-nearest-neighbor similarity search over an embedding
column (array<float>): brute-force cosine top-k as the exactness
baseline, and a sign-LSH-bucketed variant as the scale path.

Scale notes:
  * Brute force is the verifier/baseline: queries × corpus. With a
    broadcast of the (small) query set it is one scan of the corpus —
    correct at any scale but O(Q·N); use for small Q or final rerank.
  * The LSH variant buckets both sides by the sign pattern of K
    deterministic hyperplanes, then searches only within buckets: the
    join key shrinks the candidate set by ~2^K. The hyperplanes here
    are fixed ±1 patterns (pure arithmetic, so the DuckDB oracle can
    reproduce them bit-for-bit); a production deployment would draw
    them from the PRNG (functions/prng.py) the same seeded way.
  * All arithmetic is sequential fold over the same index order in
    both engines (identical double rounding), outputs rounded to 5
    decimals for the hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

N_PLANES = 4

# ±1 "hyperplane" component for plane j, dimension i (1-based i):
# sign = +1 if (i*(j+3)) % 7 < 4 else -1 — arbitrary but fixed pattern
_SPARK_PLANE_DOT = (
    "aggregate(sequence(1, size(v)), cast(0.0 as double),"
    " (acc, i) -> acc + element_at(v, i)"
    " * (CASE WHEN (i * ({j} + 3)) % 7 < 4 THEN 1.0 ELSE -1.0 END))"
)
_DUCK_PLANE_DOT = (
    "list_reduce([CAST(0.0 AS DOUBLE)] ||"
    " list_transform(generate_series(1, len(v)), i -> v[i]"
    " * (CASE WHEN (i * ({j} + 3)) % 7 < 4 THEN 1.0 ELSE -1.0 END)),"
    " (acc, x) -> acc + x)"
)

_SPARK_DOT_AB = (
    "aggregate(sequence(1, size(va)), cast(0.0 as double),"
    " (acc, i) -> acc + element_at(va, i) * element_at(vb, i))"
)
_DUCK_DOT_AB = (
    "list_reduce([CAST(0.0 AS DOUBLE)] ||"
    " list_transform(generate_series(1, len(A.v)), i -> A.v[i] * B.v[i]),"
    " (acc, x) -> acc + x)"
)
_SPARK_NORM = (
    "sqrt(aggregate(sequence(1, size(v)), cast(0.0 as double),"
    " (acc, i) -> acc + element_at(v, i) * element_at(v, i)))"
)
_DUCK_NORM = (
    "sqrt(list_reduce([CAST(0.0 AS DOUBLE)] ||"
    " list_transform(generate_series(1, len(v)), i -> v[i] * v[i]),"
    " (acc, x) -> acc + x))"
)

QUERY_FILTER_SPARK = "vec_id % 50 = 0"  # deterministic query subset


def _prepared(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("norm", F.expr(_SPARK_NORM))


def cosine_topk(
    embeddings: DataFrame, k: int = 5, query_filter: str = QUERY_FILTER_SPARK
) -> DataFrame:
    """Brute-force cosine top-k: [query_id, neighbor_id, cosine, rank]
    for each query vector (excluding self), rank by (cosine desc,
    neighbor_id asc) — fully deterministic."""
    e = _prepared(embeddings)
    q = e.filter(F.expr(query_filter)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
    )
    joined = F.broadcast(q).crossJoin(c).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.round(
        F.expr(_SPARK_DOT_AB) / (F.col("na") * F.col("nb")), 5
    ).cast("double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_sql(k: int = 5, query_filter: str = "vec_id % 50 = 0") -> str:
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings),"
        f" en AS (SELECT vec_id, v, {_DUCK_NORM} AS norm FROM e),"
        " scored AS (SELECT A.vec_id AS query_id, B.vec_id AS neighbor_id,"
        f" CAST(ROUND(({_DUCK_DOT_AB}) / (A.norm * B.norm), 5) AS DOUBLE)"
        "  AS cosine"
        f" FROM en A JOIN en B ON A.{query_filter.replace('vec_id', 'vec_id')}"
        "  AND A.vec_id <> B.vec_id),"
        " ranked AS (SELECT query_id, neighbor_id, cosine,"
        " CAST(ROW_NUMBER() OVER (PARTITION BY query_id"
        "  ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank"
        " FROM scored)"
        f" SELECT query_id, neighbor_id, cosine, rank FROM ranked"
        f" WHERE rank <= {k}"
    )


def lsh_buckets(embeddings: DataFrame) -> DataFrame:
    """[vec_id, bucket] — sign pattern of N_PLANES fixed hyperplanes."""
    e = _prepared(embeddings)
    bits = []
    for j in range(N_PLANES):
        dot = _SPARK_PLANE_DOT.format(j=j)
        bits.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
    return e.select(
        "vec_id", F.expr(" + ".join(bits)).cast("int").alias("bucket")
    )


def _duck_bucket_expr() -> str:
    bits = []
    for j in range(N_PLANES):
        dot = _DUCK_PLANE_DOT.format(j=j)
        bits.append(f"(CASE WHEN ({dot}) > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(bits)


def lsh_buckets_sql() -> str:
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)"
        f" SELECT vec_id, CAST({_duck_bucket_expr()} AS INTEGER) AS bucket"
        " FROM e"
    )


def cosine_topk_lsh(
    embeddings: DataFrame, k: int = 5, query_filter: str = QUERY_FILTER_SPARK
) -> DataFrame:
    """Bucketed ANN: like cosine_topk but candidates limited to the
    query's LSH bucket — the scale path (equi-join on bucket instead of
    a cross join). Approximate: recall < 1 by design."""
    e = _prepared(embeddings).join(lsh_buckets(embeddings), "vec_id")
    q = e.filter(F.expr(query_filter)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
        "bucket",
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
        "bucket",
    )
    joined = q.join(c, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = F.round(
        F.expr(_SPARK_DOT_AB) / (F.col("na") * F.col("nb")), 5
    ).cast("double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_lsh_sql(k: int = 5, query_filter: str = "vec_id % 50 = 0") -> str:
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings),"
        f" en AS (SELECT vec_id, v, {_DUCK_NORM} AS norm,"
        f" {_duck_bucket_expr()} AS bucket FROM e),"
        " scored AS (SELECT A.vec_id AS query_id, B.vec_id AS neighbor_id,"
        f" CAST(ROUND(({_DUCK_DOT_AB}) / (A.norm * B.norm), 5) AS DOUBLE)"
        "  AS cosine"
        f" FROM en A JOIN en B ON A.bucket = B.bucket"
        f"  AND A.{query_filter} AND A.vec_id <> B.vec_id),"
        " ranked AS (SELECT query_id, neighbor_id, cosine,"
        " CAST(ROW_NUMBER() OVER (PARTITION BY query_id"
        "  ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank"
        " FROM scored)"
        f" SELECT query_id, neighbor_id, cosine, rank FROM ranked"
        f" WHERE rank <= {k}"
    )

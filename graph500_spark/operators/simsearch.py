"""Approximate-nearest-neighbor similarity search over an embedding
column (array<float>): brute-force cosine top-k as the exactness
baseline, plus two scale paths — a sign-LSH-bucketed variant and an
IVF-Flat variant (coarse-quantize into cells, probe the nprobe nearest
cells per query).

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
from graph500_spark.functions.plantrunc import truncate_plan

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


def _spark_dot(a: str, b: str) -> str:
    return (
        f"aggregate(sequence(1, size({a})), cast(0.0 as double),"
        f" (acc, i) -> acc + element_at({a}, i) * element_at({b}, i))"
    )


def _duck_dot(a: str, b: str) -> str:
    return (
        "list_reduce([CAST(0.0 AS DOUBLE)] ||"
        f" list_transform(generate_series(1, len({a})),"
        f" i -> {a}[i] * {b}[i]), (acc, x) -> acc + x)"
    )


# IVF-Flat coarse quantizer: the centroid set is a deterministic medoid
# subset of the corpus (1-in-61 sampling ⇒ |cells| ≈ N/61; pick the
# rate so cells ≈ √N at the target corpus size). A production index
# would k-means-train the centroids on a sample instead — the
# assign/probe plumbing below is identical either way; medoids keep the
# operator a pure data function both engines compute bit-identically
# (float k-means averages are summation-order-dependent across
# engines, so they cannot sit under a value-hash oracle).
IVF_CENTROID_FILTER = "vec_id % 61 = 7"
IVF_NPROBE = 2


def ivf_centroids(
    embeddings: DataFrame, centroid_filter: str = IVF_CENTROID_FILTER
) -> DataFrame:
    return (
        _prepared(embeddings)
        .filter(F.expr(centroid_filter))
        .select(
            F.col("vec_id").alias("cid"),
            F.col("v").alias("vc"),
            F.col("norm").alias("nc"),
        )
    )


def ivf_cells(
    embeddings: DataFrame, centroid_filter: str = IVF_CENTROID_FILTER
) -> DataFrame:
    """[vec_id, cell] — each vector assigned to its nearest (max-cosine)
    centroid, ties broken by centroid id.

    Scale shape: centroids are broadcast (√N rows), so assignment is
    one scan of the corpus — N·√N fused dot products inside codegen,
    no shuffle until the argmin aggregation on vec_id."""
    e = _prepared(embeddings)
    pairs = e.crossJoin(F.broadcast(ivf_centroids(embeddings, centroid_filter)))
    cos = F.round(
        F.expr(_spark_dot("v", "vc")) / (F.col("norm") * F.col("nc")), 5
    ).cast("double")
    w = Window.partitionBy("vec_id").orderBy(
        F.col("c").desc(), F.col("cid").asc()
    )
    return (
        pairs.select("vec_id", "cid", cos.alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cell"))
    )


def ivf_cells_sql() -> str:
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings),"
        f" en AS (SELECT vec_id, v, {_DUCK_NORM} AS norm FROM e),"
        " cents AS (SELECT vec_id AS cid, v AS vc, norm AS nc FROM en"
        f" WHERE {IVF_CENTROID_FILTER}),"
        " scored AS (SELECT E.vec_id, C.cid,"
        f" CAST(ROUND(({_duck_dot('E.v', 'C.vc')}) / (E.norm * C.nc), 5)"
        "  AS DOUBLE) AS c"
        " FROM en E CROSS JOIN cents C),"
        " ranked AS (SELECT vec_id, cid,"
        " ROW_NUMBER() OVER (PARTITION BY vec_id"
        "  ORDER BY c DESC, cid ASC) AS rn FROM scored)"
        " SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM ranked"
        " WHERE rn = 1"
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    query_filter: str = QUERY_FILTER_SPARK,
    centroid_filter: str = IVF_CENTROID_FILTER,
) -> DataFrame:
    """IVF-Flat ANN: queries probe their ``nprobe`` nearest cells and
    rank only the vectors assigned there — [query_id, neighbor_id,
    cosine, rank]. Approximate (recall < 1) like the LSH variant, but
    with data-adaptive partitions instead of fixed hyperplanes.

    Scale shape: the candidate join is an equi-join on cell id — the
    corpus shuffles once by cell (or is pre-bucketed by it on disk),
    and each query touches nprobe/√N of the data."""
    e = _prepared(embeddings)
    cents = ivf_centroids(embeddings, centroid_filter)
    q = e.filter(F.expr(query_filter)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
    )
    probe_cos = F.round(
        F.expr(_spark_dot("va", "vc")) / (F.col("na") * F.col("nc")), 5
    ).cast("double")
    wp = Window.partitionBy("query_id").orderBy(
        F.col("c").desc(), F.col("cid").asc()
    )
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select("query_id", "va", "na", "cid", probe_cos.alias("c"))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "va", "na", F.col("cid").alias("cell"))
    )
    cand = probes.join(ivf_cells(embeddings, centroid_filter), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
    )
    joined = cand.select(
        "query_id", "va", "na", F.col("vec_id").alias("neighbor_id")
    ).join(c, "neighbor_id")
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


def cosine_topk_ivf_sql(
    k: int = 5,
    nprobe: int = IVF_NPROBE,
    query_filter: str = "vec_id % 50 = 0",
) -> str:
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings),"
        f" en AS (SELECT vec_id, v, {_DUCK_NORM} AS norm FROM e),"
        " cents AS (SELECT vec_id AS cid, v AS vc, norm AS nc FROM en"
        f" WHERE {IVF_CENTROID_FILTER}),"
        " cell_scored AS (SELECT E.vec_id, C.cid,"
        f" CAST(ROUND(({_duck_dot('E.v', 'C.vc')}) / (E.norm * C.nc), 5)"
        "  AS DOUBLE) AS c"
        " FROM en E CROSS JOIN cents C),"
        " cells AS (SELECT vec_id, cid AS cell FROM"
        " (SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id"
        "  ORDER BY c DESC, cid ASC) AS rn FROM cell_scored)"
        " WHERE rn = 1),"
        " q AS (SELECT vec_id AS query_id, v AS va, norm AS na FROM en"
        f" WHERE {query_filter}),"
        " probe_scored AS (SELECT Q.query_id, C.cid,"
        f" CAST(ROUND(({_duck_dot('Q.va', 'C.vc')}) / (Q.na * C.nc), 5)"
        "  AS DOUBLE) AS c"
        " FROM q Q CROSS JOIN cents C),"
        " probes AS (SELECT query_id, cid AS cell FROM"
        " (SELECT query_id, cid, ROW_NUMBER() OVER (PARTITION BY query_id"
        "  ORDER BY c DESC, cid ASC) AS rn FROM probe_scored)"
        f" WHERE rn <= {nprobe}),"
        " cand AS (SELECT P.query_id, L.vec_id AS neighbor_id"
        " FROM probes P JOIN cells L ON P.cell = L.cell"
        " WHERE L.vec_id <> P.query_id),"
        " scored AS (SELECT A.query_id, A.neighbor_id,"
        f" CAST(ROUND(({_duck_dot('QA.v', 'NB.v')}) / (QA.norm * NB.norm),"
        " 5) AS DOUBLE) AS cosine"
        " FROM cand A JOIN en QA ON QA.vec_id = A.query_id"
        " JOIN en NB ON NB.vec_id = A.neighbor_id),"
        " ranked AS (SELECT query_id, neighbor_id, cosine,"
        " CAST(ROW_NUMBER() OVER (PARTITION BY query_id"
        "  ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank"
        " FROM scored)"
        " SELECT query_id, neighbor_id, cosine, rank FROM ranked"
        f" WHERE rank <= {k}"
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


# ---------------------------------------------------------------------------
# Trained coarse quantizer: spherical k-means (Lloyd) that IS
# value-hash-checkable across engines. The float obstruction (group
# means are summation-order-dependent) is removed by construction:
#   * inputs are quantized to INTEGER-valued doubles
#     (round(x * 10^6)), so per-dimension group SUMS are exact
#     (magnitudes << 2^53) — shuffle order cannot change them;
#   * cosine is scale-invariant, so centroids stay as the raw integer
#     sum vectors — no division ever happens;
#   * dot products / norms are sequential folds over the same index
#     order in both engines (the module-wide convention), so their
#     rounding is identical.
# Assignment ties break by centroid id; cell labels are the seed
# centroid ids (stable across iterations); centroids that lose all
# members drop out deterministically.
# ---------------------------------------------------------------------------

KMEANS_SCALE = 1_000_000
KMEANS_ITER = 2


def _quantized(embeddings: DataFrame) -> DataFrame:
    q = f"transform(v, x -> round(x * {KMEANS_SCALE}.0))"
    return (
        embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .select("vec_id", F.expr(q).alias("qv"))
        .withColumn(
            "nq", F.expr(_spark_dot("qv", "qv")).alias("d")
        )
        .withColumn("nq", F.sqrt("nq"))
    )


def _assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """[vec_id, cell] — nearest centroid by round(cos, 5), tie → min cid."""
    cos = F.round(
        F.expr(_spark_dot("qv", "vc")) / (F.col("nq") * F.col("nc")), 5
    ).cast("double")
    w = Window.partitionBy("vec_id").orderBy(
        F.col("c").desc(), F.col("cid").asc()
    )
    return (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "cid", cos.alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cell"))
    )


def kmeans_cells(
    embeddings: DataFrame,
    n_iter: int = KMEANS_ITER,
    centroid_filter: str = IVF_CENTROID_FILTER,
    dim: int = 64,
) -> DataFrame:
    """[vec_id, cell] after ``n_iter`` Lloyd rounds from the medoid
    seeds: assign to max-cosine centroid, recompute centroids as exact
    integer sum vectors of their members, reassign.

    Scale shape per round: one broadcast of the (≈√N) centroid table +
    one corpus scan for assignment, one hash shuffle on cell for the
    64 per-dimension sums. The corpus is scanned, never collected."""
    # caller-owned cache lifecycle — tracked in the dedup module's
    # registry, released by dedup.release_caches()
    from graph500_spark.operators.dedup import _track

    e = _track(_quantized(embeddings).cache())
    cents = e.filter(F.expr(centroid_filter)).select(
        F.col("vec_id").alias("cid"),
        F.col("qv").alias("vc"),
        F.col("nq").alias("nc"),
    )
    for _ in range(n_iter):
        assign = _assign(e, cents)
        sums = (
            assign.join(e, "vec_id")
            .groupBy("cell")
            .agg(
                *[
                    F.sum(F.element_at("qv", i + 1)).alias(f"s{i}")
                    for i in range(dim)
                ]
            )
        )
        cents = sums.select(
            F.col("cell").alias("cid"),
            F.array(*[F.col(f"s{i}") for i in range(dim)]).alias("vc"),
        ).withColumn("nc", F.sqrt(F.expr(_spark_dot("vc", "vc"))))
    return _assign(e, cents)


def kmeans_cells_sql(
    n_iter: int = KMEANS_ITER,
    centroid_filter: str = IVF_CENTROID_FILTER,
    dim: int = 64,
) -> str:
    """Unrolled Lloyd rounds mirroring kmeans_cells exactly."""
    dot = _duck_dot("A.qv", "B.vc")
    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings),"
        f" q0 AS (SELECT vec_id, list_transform(v, x ->"
        f" round(x * {KMEANS_SCALE}.0)) AS qv FROM e),"
        " qn AS MATERIALIZED (SELECT vec_id, qv,"
        f" sqrt({_duck_dot('qv', 'qv')}) AS nq FROM q0),"
        " c0 AS (SELECT vec_id AS cid, qv AS vc, nq AS nc FROM qn"
        f" WHERE {centroid_filter})",
    ]
    for r in range(1, n_iter + 2):
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT vec_id, cid AS cell FROM ("
            " SELECT A.vec_id, B.cid, ROW_NUMBER() OVER ("
            "  PARTITION BY A.vec_id ORDER BY"
            f"  CAST(ROUND(({dot}) / (A.nq * B.nc), 5) AS DOUBLE) DESC,"
            "  B.cid ASC) AS rn"
            f" FROM qn A CROSS JOIN c{r-1} B) WHERE rn = 1)"
        )
        if r == n_iter + 1:
            break
        parts.append(
            f"s{r} AS (SELECT a.cell, t.i, SUM(qn.qv[t.i]) AS s"
            f" FROM a{r} a JOIN qn USING (vec_id)"
            f" CROSS JOIN generate_series(1, {dim}) t(i)"
            " GROUP BY a.cell, t.i)"
        )
        parts.append(
            f"c{r} AS (SELECT cell AS cid, vc,"
            f" sqrt({_duck_dot('vc', 'vc')}) AS nc FROM"
            f" (SELECT cell, LIST(s ORDER BY i) AS vc FROM s{r}"
            " GROUP BY cell))"
        )
    return (
        ", ".join(parts)
        + f" SELECT vec_id, cell FROM a{n_iter + 1}"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): split the 64-dim space into PQ_M
# subspaces, encode every vector as PQ_M small codeword ids, and
# answer top-k by asymmetric distance computation (ADC): the query
# builds a lookup table of dot products against each subspace
# codebook, and candidate scoring touches only the CODES table —
# PQ_M smallints per vector instead of 64 floats, a 32× scan-size
# reduction, which is the point of PQ at 100 TB.
#
# Cross-engine exactness (same construction as kmeans_cells): vectors
# are quantized to integer-valued doubles (round(x·10^6)), so every
# subspace dot product / squared distance is an exact integer
# (≤ 16·(2·10^6)² ≈ 6.4e13 « 2^53) and the ADC sum over PQ_M parts is
# order-free — groupBy summation order cannot change it. Codebooks are
# deterministic medoid subsets (a trained variant would plug
# kmeans_cells-style Lloyd rounds per subspace into the same shape).
# Assignment ties break by codeword id; cosine uses the exact query
# norm and the reconstruction norm sqrt(Σ_m ‖codeword_m‖²).
# ---------------------------------------------------------------------------

PQ_M = 4
PQ_SUBDIM = 16
PQ_CODEBOOK_FILTER = "vec_id % 53 = 3"


def _spark_l2(a: str, b: str) -> str:
    return (
        f"aggregate(sequence(1, size({a})), cast(0.0 as double),"
        f" (acc, i) -> acc + (element_at({a}, i) - element_at({b}, i))"
        f" * (element_at({a}, i) - element_at({b}, i)))"
    )


def _duck_l2(a: str, b: str) -> str:
    return (
        "list_reduce([CAST(0.0 AS DOUBLE)] ||"
        f" list_transform(generate_series(1, len({a})),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (acc, x) -> acc + x)"
    )


def _subvectors(df: DataFrame, id_col: str) -> DataFrame:
    """Explode [id, qv] into PQ_M rows [id, m, sv] (m 0-based)."""
    slices = F.array(
        *[
            F.expr(f"slice(qv, {m * PQ_SUBDIM + 1}, {PQ_SUBDIM})")
            for m in range(PQ_M)
        ]
    )
    return df.select(
        id_col, F.posexplode(slices).alias("m", "sv")
    )


def _codebook(embeddings: DataFrame, codebook_filter: str) -> DataFrame:
    """[m, cid, cv, cv_sq] — per-subspace codewords from the medoid
    seed set (cv_sq is the exact-integer squared norm)."""
    seeds = _quantized(embeddings).filter(F.expr(codebook_filter)).select(
        F.col("vec_id").alias("cid"), "qv"
    )
    return _subvectors(seeds, "cid").select(
        "m",
        "cid",
        F.col("sv").alias("cv"),
        F.expr(_spark_dot("sv", "sv")).alias("cv_sq"),
    )


def pq_codes(
    embeddings: DataFrame, codebook_filter: str = PQ_CODEBOOK_FILTER
) -> DataFrame:
    """[vec_id, m, code] — each vector's nearest codeword (min exact-L2,
    tie → min cid) per subspace.

    Scale shape: the codebook (PQ_M·√N rows) broadcasts; encoding is
    one corpus scan with a per-(vec_id, m) argmin — no shuffle of the
    vectors beyond the window's hash partitioning on vec_id."""
    subs = _subvectors(_quantized(embeddings), "vec_id")
    pairs = subs.join(
        F.broadcast(_codebook(embeddings, codebook_filter)), "m"
    )
    d = F.expr(_spark_l2("sv", "cv")).alias("d")
    w = Window.partitionBy("vec_id", "m").orderBy(
        F.col("d").asc(), F.col("cid").asc()
    )
    return (
        pairs.select("vec_id", "m", "cid", d)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", F.col("cid").alias("code"))
    )


def cosine_topk_pq(
    embeddings: DataFrame,
    k: int = 5,
    query_filter: str = QUERY_FILTER_SPARK,
    codebook_filter: str = PQ_CODEBOOK_FILTER,
) -> DataFrame:
    """ADC top-k over PQ codes: [query_id, neighbor_id, cosine, rank]
    with cosine ≈ dot(q, reconstruction) / (‖q‖·‖reconstruction‖).
    Approximate (quantization error) like the LSH/IVF variants.

    Scale shape: per query one broadcast LUT join against the codes
    table (PQ_M ints per corpus vector — the raw embeddings are never
    rescanned for scoring), then an exact-integer groupBy sum."""
    e = _quantized(embeddings)
    q = e.filter(F.expr(query_filter)).select(
        F.col("vec_id").alias("query_id"), "qv", F.col("nq").alias("na")
    )
    # LUT: dot of each query subvector with each codeword (exact ints)
    lut = (
        _subvectors(q.select(F.col("query_id").alias("qid_"), "qv"), "qid_")
        .join(F.broadcast(_codebook(embeddings, codebook_filter)), "m")
        .select(
            F.col("qid_").alias("query_id"),
            "m",
            F.col("cid").alias("code"),
            F.expr(_spark_dot("sv", "cv")).alias("dpart"),
            "cv_sq",
        )
    )
    codes = pq_codes(embeddings, codebook_filter)
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.sum("dpart").alias("adot"), F.sum("cv_sq").alias("asq")
        )
    )
    qn = q.select("query_id", "na")
    cos = F.round(
        F.col("adot") / (F.col("na") * F.sqrt(F.col("asq"))), 5
    ).cast("double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.join(F.broadcast(qn), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_pq_rerank(
    embeddings: DataFrame,
    k: int = 5,
    shortlist: int = 25,
    query_filter: str = QUERY_FILTER_SPARK,
    codebook_filter: str = PQ_CODEBOOK_FILTER,
) -> DataFrame:
    """Production PQ composition: ADC over the codes table produces a
    ``shortlist`` of candidates per query (cheap — 4 ints/vector),
    then ONLY those candidates are exact-reranked against the raw
    embeddings. Recall ≥ pure ADC by construction at the cost of
    |Q|·shortlist exact dot products — the standard IVF-PQ + rerank
    serving shape.

    Scale: the shortlist (|Q|·shortlist rows) broadcasts into the
    rerank join; the raw corpus is probed by equi-join on vec_id, not
    scanned."""
    short = cosine_topk_pq(
        embeddings, k=shortlist, query_filter=query_filter,
        codebook_filter=codebook_filter,
    ).select("query_id", "neighbor_id")
    return _pq_exact_rerank(embeddings, short, k, query_filter)


def _pq_exact_rerank(
    embeddings: DataFrame,
    short: DataFrame,
    k: int,
    query_filter: str = QUERY_FILTER_SPARK,
) -> DataFrame:
    """Exact rerank of a [query_id, neighbor_id] shortlist against the
    raw embeddings (the second half of cosine_topk_pq_rerank, split
    out so ann_recall can reuse ONE materialized ADC ranking for both
    the pq and pq_rerank branches — guide §1.2: don't compute the
    codes/LUT/ADC pipeline twice for one query)."""
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
    joined = F.broadcast(short).join(c, "neighbor_id").join(
        F.broadcast(q), "query_id"
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


def cosine_topk_pq_rerank_sql(
    k: int = 5,
    shortlist: int = 25,
    query_filter: str = "vec_id % 50 = 0",
    codebook_filter: str = PQ_CODEBOOK_FILTER,
) -> str:
    adc = cosine_topk_pq_sql(shortlist, query_filter, codebook_filter)
    return (
        "WITH e2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings),"
        f" en2 AS (SELECT vec_id, v, {_DUCK_NORM} AS norm FROM e2),"
        f" short AS (SELECT query_id, neighbor_id FROM ({adc})),"
        " scored AS (SELECT s.query_id, s.neighbor_id,"
        f" CAST(ROUND(({_duck_dot('A.v', 'B.v')}) / (A.norm * B.norm), 5)"
        "  AS DOUBLE) AS cosine"
        " FROM short s JOIN en2 A ON A.vec_id = s.query_id"
        " JOIN en2 B ON B.vec_id = s.neighbor_id),"
        " reranked AS (SELECT query_id, neighbor_id, cosine,"
        " CAST(ROW_NUMBER() OVER (PARTITION BY query_id"
        "  ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank"
        " FROM scored)"
        " SELECT query_id, neighbor_id, cosine, rank FROM reranked"
        f" WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# ANN quality measurement: recall@k of each approximate index (LSH /
# IVF / PQ) against the brute-force exact top-k — "measure, don't
# guess" as a first-class operator, so index-parameter changes are
# evaluated inside the engine instead of eyeballed. One row per
# method; recall = |approx ∩ exact| / |exact| over all queries.
#
# Scale shape: each branch is the underlying index's own plan plus an
# equi-join on (query_id, neighbor_id) against the exact list and a
# single global count — the exact list is |Q|·k rows (small), so the
# joins broadcast. In production the exact side comes from a sampled
# query set for exactly this reason.
# ---------------------------------------------------------------------------


def ann_recall(
    embeddings: DataFrame, k: int = 5, query_filter: str = QUERY_FILTER_SPARK
) -> DataFrame:
    """[method, n_hits, recall] for methods lsh / ivf / pq at the same
    k and query set."""
    # The exact baseline feeds all four hit-joins plus the
    # denominator, and Catalyst does not common-subexpression across
    # union branches — without materialization the brute-force
    # query×corpus scorer runs five times; one checkpoint makes it
    # run once (the triangles-orientation caching lesson).
    exact = (
        cosine_topk(embeddings, k, query_filter)
        .select("query_id", "neighbor_id")
        .transform(truncate_plan)
    )
    # The pq and pq_rerank branches share ONE ADC pipeline: the ranked
    # shortlist at pq_rerank's depth (25) is materialized once, the pq
    # branch is its rank<=k prefix (same scored set, same window — the
    # rank filter is monotone, so rows are bit-identical to an
    # independent cosine_topk_pq(k) call), and pq_rerank exact-reranks
    # the same shortlist. Before: the codes/LUT/ADC pipeline (the
    # family's dominant stages) executed twice per ann_recall run.
    shortlist_n = max(25, k)
    adc_ranked = cosine_topk_pq(
        embeddings, k=shortlist_n, query_filter=query_filter
    ).transform(truncate_plan)
    methods = {
        "ivf": cosine_topk_ivf(embeddings, k=k, query_filter=query_filter),
        "lsh": cosine_topk_lsh(embeddings, k=k, query_filter=query_filter),
        "pq": adc_ranked.filter(F.col("rank") <= k),
        "pq_rerank": _pq_exact_rerank(
            embeddings,
            adc_ranked.select("query_id", "neighbor_id"),
            k,
            query_filter,
        ),
    }
    denom = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    rows = []
    for name in sorted(methods):
        ap = methods[name].select("query_id", "neighbor_id")
        hits = exact.join(ap, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).alias("n_hits")
        )
        rows.append(
            hits.crossJoin(F.broadcast(denom)).select(
                F.lit(name).alias("method"),
                "n_hits",
                F.round(F.col("n_hits") / F.col("n_exact"), 6)
                .cast("double")
                .alias("recall"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def ann_recall_sql(k: int = 5, query_filter: str = "vec_id % 50 = 0") -> str:
    exact = cosine_topk_sql(k, query_filter)
    approx = {
        "ivf": cosine_topk_ivf_sql(k, query_filter=query_filter),
        "lsh": cosine_topk_lsh_sql(k, query_filter),
        "pq": cosine_topk_pq_sql(k, query_filter),
        "pq_rerank": cosine_topk_pq_rerank_sql(k, query_filter=query_filter),
    }
    branches = []
    for name in sorted(approx):
        branches.append(
            f"SELECT '{name}' AS method,"
            " CAST(COUNT(*) AS BIGINT) AS n_hits,"
            " CAST(round(COUNT(*) / CAST("
            f" (SELECT COUNT(*) FROM ({exact})) AS DOUBLE), 6)"
            "  AS DOUBLE) AS recall"
            f" FROM ({approx[name]}) a JOIN ({exact}) e"
            " ON a.query_id = e.query_id"
            " AND a.neighbor_id = e.neighbor_id"
        )
    return " UNION ALL ".join(branches)


def _duck_pq_common(codebook_filter: str) -> str:
    sub = f"qv[t.m * {PQ_SUBDIM} + 1 : t.m * {PQ_SUBDIM} + {PQ_SUBDIM}]"
    return (
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings),"
        " qn AS MATERIALIZED (SELECT vec_id,"
        f" list_transform(v, x -> round(x * {KMEANS_SCALE}.0)) AS qv"
        " FROM e),"
        " subs AS MATERIALIZED (SELECT vec_id, t.m,"
        f" {sub} AS sv"
        f" FROM qn CROSS JOIN generate_series(0, {PQ_M - 1}) t(m)),"
        " cb AS MATERIALIZED (SELECT m, vec_id AS cid, sv AS cv,"
        f" {_duck_dot('sv', 'sv')} AS cv_sq FROM subs"
        f" WHERE {codebook_filter}),"
        " codes AS MATERIALIZED (SELECT vec_id, m, cid AS code FROM ("
        " SELECT s.vec_id, s.m, c.cid, ROW_NUMBER() OVER ("
        "  PARTITION BY s.vec_id, s.m ORDER BY"
        f"  {_duck_l2('s.sv', 'c.cv')} ASC, c.cid ASC) AS rn"
        " FROM subs s JOIN cb c ON s.m = c.m) WHERE rn = 1)"
    )


def pq_codes_sql(codebook_filter: str = PQ_CODEBOOK_FILTER) -> str:
    return (
        "WITH "
        + _duck_pq_common(codebook_filter)
        + " SELECT vec_id, CAST(m AS INTEGER) AS m,"
        " CAST(code AS BIGINT) AS code FROM codes"
    )


def cosine_topk_pq_sql(
    k: int = 5,
    query_filter: str = "vec_id % 50 = 0",
    codebook_filter: str = PQ_CODEBOOK_FILTER,
) -> str:
    return (
        "WITH "
        + _duck_pq_common(codebook_filter)
        + ","
        " q AS (SELECT vec_id AS query_id, qv,"
        f" sqrt({_duck_dot('qv', 'qv')}) AS na FROM qn"
        f" WHERE {query_filter}),"
        " lut AS (SELECT s.vec_id AS query_id, s.m, c.cid AS code,"
        f" {_duck_dot('s.sv', 'c.cv')} AS dpart, c.cv_sq"
        " FROM subs s JOIN cb c ON s.m = c.m"
        f" WHERE s.vec_id IN (SELECT query_id FROM q)),"
        " scored AS (SELECT l.query_id, cd.vec_id AS neighbor_id,"
        " SUM(l.dpart) AS adot, SUM(l.cv_sq) AS asq"
        " FROM codes cd JOIN lut l ON cd.m = l.m AND cd.code = l.code"
        " WHERE cd.vec_id <> l.query_id"
        " GROUP BY l.query_id, cd.vec_id),"
        " ranked AS (SELECT s.query_id, s.neighbor_id,"
        " CAST(ROUND(s.adot / (q.na * sqrt(s.asq)), 5) AS DOUBLE)"
        "  AS cosine,"
        " CAST(ROW_NUMBER() OVER (PARTITION BY s.query_id ORDER BY"
        " CAST(ROUND(s.adot / (q.na * sqrt(s.asq)), 5) AS DOUBLE) DESC,"
        " s.neighbor_id ASC) AS INTEGER) AS rank"
        " FROM scored s JOIN q ON s.query_id = q.query_id)"
        " SELECT query_id, neighbor_id, cosine, rank FROM ranked"
        f" WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# k-NN label classifier + per-dimension feature statistics
# ---------------------------------------------------------------------------


def knn_predict(embeddings: DataFrame, k: int = 5) -> DataFrame:
    """k-NN majority-vote label classifier over cosine similarity:
    [query_id, true_label, predicted_label, n_votes] for the
    deterministic query subset (vec_id % 50 = 0), voting over the k
    nearest labeled vectors (self excluded).

    The embedding-based auto-labeling / label-propagation primitive
    for training-data curation. Plan: the brute-force scorer is the
    broadcast(query)×corpus product (the cosine_topk baseline — swap
    in the IVF cells for the 100 TB path); the vote is one grouped
    count over k·|queries| rows plus a row_number pick with the
    deterministic (votes desc, label asc) tie-break."""
    neighbors = cosine_topk(embeddings, k=k)
    labels = embeddings.select("vec_id", "label")
    votes = (
        neighbors.join(
            labels.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nb_label"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "nb_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("nb_label").asc()
    )
    winner = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            F.col("nb_label").alias("predicted_label"),
            "n_votes",
        )
    )
    return winner.join(
        labels.select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("true_label"),
        ),
        "query_id",
    ).select("query_id", "true_label", "predicted_label", "n_votes")


def knn_predict_sql(k: int = 5, query_filter: str = "vec_id % 50 = 0") -> str:
    return (
        f"WITH nb AS ({cosine_topk_sql(k=k, query_filter=query_filter)}),"
        " votes AS (SELECT nb.query_id, e.label AS nb_label,"
        " CAST(COUNT(*) AS BIGINT) AS n_votes"
        " FROM nb JOIN embeddings e ON e.vec_id = nb.neighbor_id"
        " GROUP BY 1, 2),"
        " ranked AS (SELECT query_id, nb_label, n_votes,"
        " ROW_NUMBER() OVER (PARTITION BY query_id"
        " ORDER BY n_votes DESC, nb_label ASC) AS rn FROM votes)"
        " SELECT r.query_id, q.label AS true_label,"
        " r.nb_label AS predicted_label, r.n_votes"
        " FROM ranked r JOIN embeddings q ON q.vec_id = r.query_id"
        " WHERE r.rn = 1"
    )


def embedding_dim_stats(embeddings: DataFrame) -> DataFrame:
    """Per-dimension feature statistics for normalization tables:
    [dim, n, mean, std] (dim 1-based; population std).

    Values are integer-quantized at 10^6 before summation (the
    kmeans_cells discipline), so the per-dimension sums are exact
    order-free integer aggregations and the mean/std are single
    deterministic float expressions at the end. Plan: posexplode
    inside the scan projection → one hash shuffle on the dim key with
    map-side partials — 64 output rows regardless of corpus size."""
    q = _quantized(embeddings)
    exploded = q.select(
        F.posexplode("qv").alias("pos", "x")
    ).select((F.col("pos") + 1).alias("dim"), F.col("x").cast("long").alias("x"))
    agg = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
    )
    scale = float(KMEANS_SCALE)
    mean = F.col("s") / F.col("n") / scale
    var = (
        F.col("s2") / F.col("n")
        - (F.col("s") / F.col("n")) * (F.col("s") / F.col("n"))
    ) / (scale * scale)
    return agg.select(
        "dim",
        "n",
        F.round(mean, 6).cast("double").alias("mean"),
        F.round(F.sqrt(var), 6).cast("double").alias("std"),
    )


def embedding_dim_stats_sql() -> str:
    return (
        "WITH q AS (SELECT vec_id, list_transform("
        f"CAST(embedding AS DOUBLE[]), x -> CAST(round(x * {KMEANS_SCALE}.0)"
        " AS BIGINT)) AS qv FROM embeddings),"
        " ex AS (SELECT unnest(generate_series(1, len(qv))) AS dim,"
        " unnest(qv) AS x FROM q),"
        " agg AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(x) AS BIGINT) AS s,"
        " CAST(SUM(x * x) AS BIGINT) AS s2 FROM ex GROUP BY dim)"
        " SELECT dim, n,"
        f" ROUND(s / CAST(n AS DOUBLE) / {KMEANS_SCALE}.0, 6) AS mean,"
        " ROUND(sqrt((s2 / CAST(n AS DOUBLE)"
        " - (s / CAST(n AS DOUBLE)) * (s / CAST(n AS DOUBLE)))"
        f" / ({KMEANS_SCALE}.0 * {KMEANS_SCALE}.0)), 6) AS std"
        " FROM agg"
    )


def cosine_topk_filtered(
    embeddings: DataFrame, k: int = 5
) -> DataFrame:
    """Metadata-filtered vector search: brute-force cosine top-k where
    neighbors must share the query's label — [query_id, neighbor_id,
    cosine, rank] for the standard query subset.

    The 'filtered ANN' serving shape (vector search + WHERE clause).
    Because the filter is an equality on a corpus column, the plan
    IMPROVES over unfiltered search: the query×corpus product becomes
    a label-keyed equi-join (each query only scores its own label
    partition) — the filter is the block key, the same trick as
    embedding_near_duplicates. Range/set filters compose the same way
    via a pre-filter on the corpus side."""
    e = _prepared(embeddings).join(
        embeddings.select("vec_id", "label"), "vec_id"
    )
    q = e.filter(F.expr(QUERY_FILTER_SPARK)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
        "label",
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
        "label",
    )
    joined = F.broadcast(q).join(c, "label").filter(
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


def cosine_topk_filtered_sql(
    k: int = 5, query_filter: str = "vec_id % 50 = 0"
) -> str:
    return (
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,"
        " label FROM embeddings),"
        f" en AS (SELECT vec_id, v, label, {_DUCK_NORM} AS norm FROM e),"
        " scored AS (SELECT A.vec_id AS query_id, B.vec_id AS neighbor_id,"
        f" CAST(ROUND(({_DUCK_DOT_AB}) / (A.norm * B.norm), 5) AS DOUBLE)"
        "  AS cosine"
        f" FROM en A JOIN en B ON A.{query_filter}"
        "  AND A.label = B.label AND A.vec_id <> B.vec_id),"
        " ranked AS (SELECT query_id, neighbor_id, cosine,"
        " CAST(ROW_NUMBER() OVER (PARTITION BY query_id"
        "  ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank"
        " FROM scored)"
        f" SELECT query_id, neighbor_id, cosine, rank FROM ranked"
        f" WHERE rank <= {k}"
    )


def label_prototypes(embeddings: DataFrame) -> DataFrame:
    """Class prototypes (nearest-centroid classifier training):
    [label, dim, n, mean_q] — per-label per-dimension mean of the
    10^6-quantized embedding values (mean_q in quantized units,
    round(sum/n): one deterministic division over exact integer
    sums).

    |labels|·dim output rows at any corpus size; the prototype table
    is the broadcast-joinable model for centroid classification and
    the drift monitor for embedding pipelines."""
    q = _quantized(embeddings).join(
        embeddings.select("vec_id", "label"), "vec_id"
    )
    exploded = q.select(
        "label", F.posexplode("qv").alias("pos", "x")
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.col("x").cast("long").alias("x"),
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").alias("s"),
        )
        .select(
            "label",
            "dim",
            "n",
            F.round(F.col("s") / F.col("n")).cast("long").alias("mean_q"),
        )
    )


def label_prototypes_sql() -> str:
    return (
        "WITH q AS (SELECT vec_id, label, list_transform("
        f"CAST(embedding AS DOUBLE[]), x -> CAST(round(x * {KMEANS_SCALE}.0)"
        " AS BIGINT)) AS qv FROM embeddings),"
        " ex AS (SELECT label, unnest(generate_series(1, len(qv))) AS dim,"
        " unnest(qv) AS x FROM q)"
        " SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(round(SUM(x) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)"
        " AS mean_q"
        " FROM ex GROUP BY label, dim"
    )


def prototype_predict(embeddings: DataFrame) -> DataFrame:
    """Nearest-centroid classification over label_prototypes:
    [query_id, true_label, predicted_label, cosine] for the standard
    query subset — the train+predict pair completing the centroid
    classifier (label_prototypes is the training side).

    The prototype table re-assembles into per-label vectors
    (collect_list sorted by dim — bounded by |labels|·dim, never by
    corpus size) and broadcasts; scoring is |queries|×|labels| rows.
    Ties break by smallest label, cosine rounded to 5 like every
    scorer in this module."""
    protos = label_prototypes(embeddings)
    pvec = protos.groupBy("label").agg(
        F.transform(
            F.sort_array(
                F.collect_list(F.struct("dim", "mean_q"))
            ),
            lambda s: s["mean_q"].cast("double"),
        ).alias("pv")
    ).withColumn("np", F.expr(_spark_dot("pv", "pv")))
    pvec = pvec.withColumn("np", F.sqrt("np")).select(
        F.col("label").alias("cand_label"), "pv", "np"
    )
    q = _quantized(embeddings).join(
        embeddings.select("vec_id", "label"), "vec_id"
    ).filter(F.expr(QUERY_FILTER_SPARK)).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("qv").cast("array<double>").alias("qv"),
        "nq",
    )
    cos = F.round(
        F.expr(_spark_dot("qv", "pv")) / (F.col("nq") * F.col("np")), 5
    ).cast("double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_label").asc()
    )
    return (
        q.crossJoin(F.broadcast(pvec))
        .select("query_id", "true_label", "cand_label", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "true_label",
            F.col("cand_label").alias("predicted_label"),
            "cosine",
        )
    )


def prototype_predict_sql(query_filter: str = "vec_id % 50 = 0") -> str:
    return (
        f"WITH protos AS ({label_prototypes_sql()}),"
        " pvec AS (SELECT label AS cand_label,"
        " list_transform(list(mean_q ORDER BY dim),"
        " x -> CAST(x AS DOUBLE)) AS pv"
        " FROM protos GROUP BY label),"
        " pn AS (SELECT cand_label, pv,"
        " sqrt(list_reduce([CAST(0.0 AS DOUBLE)] ||"
        " list_transform(generate_series(1, len(pv)), i -> pv[i] * pv[i]),"
        " (acc, x) -> acc + x)) AS np FROM pvec),"
        " q AS (SELECT vec_id AS query_id, label AS true_label,"
        " list_transform(CAST(embedding AS DOUBLE[]),"
        f" x -> round(x * {KMEANS_SCALE}.0)) AS qv"
        f" FROM embeddings WHERE {query_filter}),"
        " qn AS (SELECT query_id, true_label, qv,"
        " sqrt(list_reduce([CAST(0.0 AS DOUBLE)] ||"
        " list_transform(generate_series(1, len(qv)), i -> qv[i] * qv[i]),"
        " (acc, x) -> acc + x)) AS nq FROM q),"
        " scored AS (SELECT query_id, true_label, cand_label,"
        " CAST(ROUND(list_reduce([CAST(0.0 AS DOUBLE)] ||"
        " list_transform(generate_series(1, len(qv)),"
        " i -> qv[i] * pv[i]), (acc, x) -> acc + x)"
        " / (nq * np), 5) AS DOUBLE) AS cosine"
        " FROM qn CROSS JOIN pn),"
        " ranked AS (SELECT query_id, true_label, cand_label, cosine,"
        " ROW_NUMBER() OVER (PARTITION BY query_id"
        " ORDER BY cosine DESC, cand_label ASC) AS rn FROM scored)"
        " SELECT query_id, true_label, cand_label AS predicted_label,"
        " cosine FROM ranked WHERE rn = 1"
    )


# ---------------------------------------------------------------------------
# Distributed PCA precursor: the exact Gram/moment accumulator
# ---------------------------------------------------------------------------


def embedding_moments(embeddings: DataFrame) -> DataFrame:
    """The distributed half of PCA: exact integer moment accumulators
    [dim_i, dim_j, n, sum_i, sum_j, sum_ij] for every dimension pair
    i <= j (64 dims → 2080 rows). The driver-side eigen step
    (pca_components) consumes this bounded table; nothing float
    leaves the cluster, so the accumulator sits under the
    cross-engine hash gate exactly like kmeans_cells.

    Plan: double posexplode + upper-triangle self-join per vector,
    then ONE hash aggregate on (i, j) — map-side partials collapse
    each partition to ≤2080 rows before the shuffle (the classic
    distributed Gram-matrix shape). Values quantized at 1e6 like the
    k-means tier: sum_ij ≤ (5.3e5)²·N — int64-safe to ~3e7 vectors;
    rescale the quantization for more."""
    q = F.expr(
        f"transform(embedding, x -> cast(round(x * {KMEANS_SCALE}.0)"
        " as bigint))"
    )
    e = embeddings.select("vec_id", q.alias("qv"))
    a = e.select(
        "vec_id", F.posexplode("qv").alias("dim_i", "x_i")
    )
    b = e.select(
        "vec_id", F.posexplode("qv").alias("dim_j", "x_j")
    )
    pairs = a.join(b, "vec_id").filter(F.col("dim_j") >= F.col("dim_i"))
    return (
        pairs.groupBy(
            F.col("dim_i").cast("long").alias("dim_i"),
            F.col("dim_j").cast("long").alias("dim_j"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x_i").alias("sum_i"),
            F.sum("x_j").alias("sum_j"),
            F.sum(F.col("x_i") * F.col("x_j")).alias("sum_ij"),
        )
    )


def embedding_moments_sql() -> str:
    return (
        # CAST to DOUBLE[] first: multiplying the raw FLOAT column by
        # the literal runs in float32 in DuckDB and rounds half-cases
        # differently than Spark's widened double (same fix as the
        # kmeans oracle)
        "WITH e AS (SELECT vec_id,"
        " list_transform(CAST(embedding AS DOUBLE[]),"
        f" x -> CAST(round(x * {KMEANS_SCALE}.0)"
        " AS BIGINT)) AS qv FROM embeddings),"
        " ex AS (SELECT vec_id,"
        " unnest(range(1, len(qv) + 1)) - 1 AS dim,"
        " unnest(qv) AS x FROM e)"
        " SELECT CAST(a.dim AS BIGINT) AS dim_i,"
        " CAST(b.dim AS BIGINT) AS dim_j,"
        " CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(a.x) AS BIGINT) AS sum_i,"
        " CAST(SUM(b.x) AS BIGINT) AS sum_j,"
        " CAST(SUM(a.x * b.x) AS BIGINT) AS sum_ij"
        " FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.dim >= a.dim"
        " GROUP BY 1, 2"
    )


PCA_ITERS = 20


def _round_half_away(x: float) -> int:
    """round() with half-away-from-zero ties — the semantics BOTH
    Spark (BigDecimal HALF_UP) and DuckDB (ties away from zero) give
    for round(double), unlike Python's banker's rounding."""
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def pca_power_iteration(embeddings: DataFrame, iters: int = PCA_ITERS) -> DataFrame:
    """Dominant principal direction via FIXED-COUNT integer power
    iteration — the hash-verifiable tier of the PCA finish.

    Why not hash the eigh output: the synthetic embeddings are
    near-isotropic (measured lambda2/lambda1 = 0.987 at sf0.01), so
    true eigenVECTORS are ill-conditioned — any two correct eigen
    algorithms may return arbitrarily different vectors inside the
    near-degenerate subspace, and no quantization makes that
    cross-engine stable. This entry therefore pins a fully DETERMINED
    quantity instead: the state after exactly `iters` power-iteration
    steps from the fixed all-ones start, with every step carried out
    in int64 fixed point so both engines compute bit-identical
    integers (verified bit-exact vs the DuckDB recursive-CTE oracle at
    sf0.01 and sf0.1).

    Architecture is the standard distributed PCA split (same as
    MLlib's RowMatrix.computePrincipalComponents): the O(rows) work is
    the exact integer moment accumulator (embedding_moments — one
    map-side-combined shuffle to <=d^2/2 rows); the d x d iteration is
    O(64^2) driver math. At 100 TB only the moment pass touches data.

    Fixed-point spec (mirrored exactly by pca_power_iteration_sql):
      cov_ij = sum_ij/n - (sum_i/n)(sum_j/n)   # float64, exact-input
      M_ij   = round(cov_ij * 1e6 / max|cov|)  # int64, |M| <= 1e6
      v0     = [1e6] * d
      step:  w = M v  (int64 exact, |w| <= 64e12 < 2^53)
             wm = w[argmax (|w|, then smallest dim)]
             v' = round(w * 1e6 / wm)          # sign-canonical: the
                                               # peak dim is always +1e6
    int64/float64 bounds hold to ~3e7 vectors at quantization 1e6
    (sum_ij < 2^53); rescale KMEANS_SCALE beyond that."""
    rows = [
        (r["dim_i"], r["dim_j"], r["n"], r["sum_i"], r["sum_j"], r["sum_ij"])
        for r in embedding_moments(embeddings).collect()
    ]
    n = rows[0][2]
    d = max(r[1] for r in rows) + 1
    cov = [[0.0] * d for _ in range(d)]
    for di, dj, _nn, si, sj, sij in rows:
        c = sij / n - (si / n) * (sj / n)
        cov[int(di)][int(dj)] = cov[int(dj)][int(di)] = c
    covmax = max(abs(cov[i][j]) for i in range(d) for j in range(d))
    s = float(KMEANS_SCALE)
    m = [
        [_round_half_away(cov[i][j] * s / covmax) for j in range(d)]
        for i in range(d)
    ]
    v = [KMEANS_SCALE] * d
    for _ in range(iters):
        w = [sum(m[i][j] * v[j] for j in range(d)) for i in range(d)]
        peak = min(range(d), key=lambda i: (-abs(w[i]), i))
        wm = w[peak]
        v = [_round_half_away(w[i] * s / wm) for i in range(d)]
    return embeddings.sparkSession.createDataFrame(
        [(i, v[i]) for i in range(d)], "dim long, loading long"
    )


def pca_power_iteration_sql(iters: int = PCA_ITERS) -> str:
    """DuckDB recursive-CTE mirror of pca_power_iteration: same
    moments, same fixed-point spec, same tie-breaks — bit-exact."""
    s = KMEANS_SCALE
    return f"""
WITH RECURSIVE mom AS ({embedding_moments_sql()}),
covu AS (SELECT dim_i, dim_j,
         CAST(sum_ij AS DOUBLE)/n - (CAST(sum_i AS DOUBLE)/n)*(CAST(sum_j AS DOUBLE)/n) AS c
         FROM mom),
cov AS (SELECT dim_i AS i, dim_j AS j, c FROM covu
        UNION ALL SELECT dim_j, dim_i, c FROM covu WHERE dim_i <> dim_j),
m AS (SELECT i, j, CAST(round(c * {s}.0 / (SELECT MAX(abs(c)) FROM cov)) AS BIGINT) AS mij FROM cov),
it(k, dim, v) AS (
  SELECT 0, i, CAST({s} AS BIGINT) FROM (SELECT DISTINCT i FROM m) t
  UNION ALL
  SELECT k+1, dim, CAST(round(w * {s}.0 /
      (SELECT w FROM (SELECT m2.i AS dim2, SUM(m2.mij*it2.v) AS w
                      FROM m m2 JOIN it it2 ON m2.j = it2.dim GROUP BY m2.i) sub
       ORDER BY abs(w) DESC, dim2 ASC LIMIT 1)) AS BIGINT)
  FROM (SELECT m.i AS dim, SUM(m.mij*it.v) AS w, any_value(it.k) AS k
        FROM m JOIN it ON m.j = it.dim GROUP BY m.i) stepped
  WHERE k < {iters}
)
SELECT CAST(dim AS BIGINT) AS dim, v AS loading FROM it WHERE k = {iters}
"""


def pca_project(embeddings: DataFrame, iters: int = PCA_ITERS) -> DataFrame:
    """[vec_id, pc1_score] — every embedding projected onto the
    dominant principal direction: the DISTRIBUTED consumer of the PCA
    finish (dimensionality reduction / outlier scoring over the whole
    corpus). The loading vector comes from pca_power_iteration (int64
    fixed point), so the projection is an exact integer dot product —
    score = sum_i qv_i * loading_i with |terms| <= 5.3e11 and d=64,
    comfortably int64 — making the whole pipeline
    (moments -> iterate -> project) cross-engine hash-stable.

    Plan shape: the 64-long loading array is a LITERAL in the
    projection (broadcast by value, no join); the scan stays one
    map-only pass — at 100 TB this is a single narrow stage."""
    loadings = [
        r["loading"]
        for r in pca_power_iteration(embeddings, iters=iters)
        .orderBy("dim")
        .collect()
    ]
    arr = "array(" + ",".join(f"{v}L" for v in loadings) + ")"
    qv = (
        f"transform(embedding, x -> cast(round(x * {KMEANS_SCALE}.0)"
        " as bigint))"
    )
    return embeddings.select(
        "vec_id",
        F.expr(
            f"aggregate(zip_with({qv}, {arr}, (x, y) -> x * y),"
            " 0L, (acc, v) -> acc + v)"
        ).alias("pc1_score"),
    )


def pca_project_sql(iters: int = PCA_ITERS) -> str:
    """DuckDB mirror: recompute the loading vector with the
    recursive-CTE iteration, then the same integer dot product."""
    s = KMEANS_SCALE
    return f"""
WITH loadings AS ({pca_power_iteration_sql(iters)}),
e AS (SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
      x -> CAST(round(x * {s}.0) AS BIGINT)) AS qv FROM embeddings),
ex AS (SELECT vec_id, unnest(range(1, len(qv) + 1)) - 1 AS dim,
       unnest(qv) AS x FROM e)
SELECT ex.vec_id, CAST(SUM(ex.x * l.loading) AS BIGINT) AS pc1_score
FROM ex JOIN loadings l ON ex.dim = l.dim
GROUP BY ex.vec_id
"""


def pca_components_df(embeddings: DataFrame, n_components: int = 4) -> DataFrame:
    """Full PCA finish: exact numpy eigh over the covariance rebuilt
    from the distributed integer moment table. Rows-only under the
    driver gate BY NECESSITY, not convenience: the measured spectrum
    is near-degenerate (lambda2/lambda1 = 0.987), so eigenvectors are
    ill-conditioned and no cross-engine fixed-point hash of them can
    be stable — pca_power_iteration is the hash-verified twin pinning
    the same moments->iterate pipeline. Sign-canonicalized (largest-
    |loading| dim positive, ties to the smallest dim); loadings and
    eigenvalues quantized at 1e6 so the output is integer-stable."""
    rows = embedding_moments(embeddings).collect()
    vals, vecs = pca_components(rows, n_components=n_components)
    # moments are over x * KMEANS_SCALE, so eigenvalues come back in
    # scale^2 units; loadings are unit-norm and unaffected
    vals = vals / (float(KMEANS_SCALE) ** 2)
    out = []
    d = vecs.shape[0]
    for c in range(vecs.shape[1]):
        col = vecs[:, c]
        peak = min(range(d), key=lambda i: (-abs(col[i]), i))
        if col[peak] < 0:
            col = -col
        for i in range(d):
            out.append(
                (
                    c,
                    i,
                    _round_half_away(float(col[i]) * 1e6),
                    _round_half_away(float(vals[c]) * 1e6),
                )
            )
    return embeddings.sparkSession.createDataFrame(
        out, "component long, dim long, loading long, eigenvalue long"
    )


def pca_components(moments_rows, n_components: int = 2):
    """Driver-side finish of the PCA: build the exact covariance from
    the bounded moment table (2080 rows for 64 dims — O(d²), never
    O(rows)) and return the top eigenvectors. numpy is fine here: the
    input is exact and tiny; only the distributed accumulator needs
    cross-engine determinism."""
    import numpy as np

    d = max(int(r["dim_j"]) for r in moments_rows) + 1
    n = int(moments_rows[0]["n"] and next(
        int(r["n"]) for r in moments_rows if r["dim_i"] == 0
        and r["dim_j"] == 0
    ))
    mean = np.zeros(d)
    cov = np.zeros((d, d))
    for r in moments_rows:
        if r["dim_i"] == r["dim_j"]:
            mean[int(r["dim_i"])] = r["sum_i"] / n
    for r in moments_rows:
        i, j = int(r["dim_i"]), int(r["dim_j"])
        c = r["sum_ij"] / n - mean[i] * mean[j]
        cov[i, j] = cov[j, i] = c
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:n_components]
    return vals[order], vecs[:, order]


def embedding_propagation(
    edges_clean: DataFrame, embeddings: DataFrame
) -> DataFrame:
    """One GNN mean-aggregation layer (GraphSAGE-mean / GCN message
    passing, the feature-propagation primitive of graph ML): for each
    vertex, the element-wise MEAN of its neighbors' embedding vectors
    — [vertex, dim, n_vec_neighbors, mean_q], dim 1-based, mean in
    10^6-quantized units.

    Only neighbors that HAVE an embedding row contribute (a vertex
    with no embedded neighbor is omitted); n_vec_neighbors makes the
    divisor explicit per (vertex, dim) — constant across dims of one
    vertex, kept per-row so the output is self-describing.

    Exactness: inputs quantized to integer-valued doubles
    (round(x·10^6), the kmeans_cells discipline), per-(vertex, dim)
    sums are exact order-free integer aggregations, and the mean is
    sign(s)·(|s| div n) — the signed truncating-division spelling
    identical in Spark and DuckDB.

    Scale shape: one equi-join of the edge list against the feature
    table on the neighbor key, posexplode in the map stage, ONE hash
    aggregation on (vertex, dim) — partial (map-side) combine
    compresses the degree factor before the shuffle, so shuffled
    volume is bounded by distinct (vertex, dim) keys per map
    partition, not by 64×|E|. Deeper GNN stacks iterate this operator
    with the output re-packed as the next layer's feature table."""
    q = _quantized(embeddings).select("vec_id", "qv")
    neigh = edges_clean.select(
        F.col("src").alias("vertex"), F.col("dst").alias("vec_id")
    ).join(q, "vec_id")
    exploded = neigh.select(
        "vertex", F.posexplode("qv").alias("pos", "x")
    ).select(
        "vertex",
        (F.col("pos") + 1).alias("dim"),
        F.col("x").cast("long").alias("x"),
    )
    agg = exploded.groupBy("vertex", "dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_vec_neighbors"),
        F.sum("x").cast("long").alias("s"),
    )
    return agg.select(
        "vertex",
        "dim",
        "n_vec_neighbors",
        F.expr(
            "cast(sign(s) as bigint)"
            " * (abs(s) div n_vec_neighbors)"
        )
        .cast("long")
        .alias("mean_q"),
    )


def embedding_propagation_sql(clean_sql: str) -> str:
    return (
        f"WITH clean AS ({clean_sql}),"
        " q AS (SELECT vec_id, list_transform("
        f"CAST(embedding AS DOUBLE[]), x -> CAST(round(x * {KMEANS_SCALE}.0)"
        " AS BIGINT)) AS qv FROM embeddings),"
        " neigh AS (SELECT c.src AS vertex, q.qv FROM clean c"
        " JOIN q ON q.vec_id = c.dst),"
        " ex AS (SELECT vertex,"
        " unnest(generate_series(1, len(qv))) AS dim,"
        " unnest(qv) AS x FROM neigh),"
        " agg AS (SELECT vertex, dim,"
        " CAST(COUNT(*) AS BIGINT) AS n_vec_neighbors,"
        " CAST(SUM(x) AS BIGINT) AS s FROM ex GROUP BY vertex, dim)"
        " SELECT vertex, dim, n_vec_neighbors,"
        " CAST(CAST(sign(s) AS BIGINT)"
        " * (abs(s) // n_vec_neighbors) AS BIGINT) AS mean_q"
        " FROM agg"
    )


# ---------------------------------------------------------------------------
# Int8 scalar quantization + MMR diverse retrieval
# ---------------------------------------------------------------------------

INT8_LEVELS = 127  # symmetric int8: q in [-127, 127]
ERR_SCALE = 1_000_000_000_000  # picounits for the squared error


def embedding_int8_quant(embeddings: DataFrame) -> DataFrame:
    """Per-dimension symmetric int8 quantization readout: [dim, n,
    amax, sum_err2_pico, mse_pico] — the compression table a vector
    store builds before serving (4x smaller than f32, distance
    computations stay SIMD-friendly) plus the reconstruction-error
    audit that says whether int8 is safe for this embedding model.

    q = round(x·127/amax_dim), dequant = q·amax_dim/127; the squared
    error is quantized per ROW to integer picounits (one double
    expression per row, round once — no float accumulation), so the
    per-dim sums are exact order-free integer aggregations; mse_pico
    is one rounded double division at the end. amax is a MAX (no
    summation), hence exactly reproducible.

    Plan: two passes over the feature table — (1) posexplode → one
    (dim) hash agg for amax (64 rows), (2) re-explode with the amax
    table broadcast back, per-row quant error, one (dim) hash agg
    with map-side partials. At 100 TB: both exchanges carry 64 keys;
    the data never shuffles, only per-dim partials do."""
    ex = embeddings.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "x"
        )
    ).select((F.col("pos") + 1).alias("dim"), "x")
    amax = ex.groupBy("dim").agg(F.max(F.abs(F.col("x"))).alias("amax"))
    lv = float(INT8_LEVELS)
    q = F.round(F.col("x") * lv / F.col("amax"))
    # amax == 0 means a constant-zero dimension: quantization is
    # lossless there, and without the guard the x/amax division
    # NULLs the whole dim's error sum in both engines
    err = F.when(F.col("amax") == 0, F.lit(0.0)).otherwise(
        F.col("x") - q * F.col("amax") / lv
    )
    per_row = ex.join(F.broadcast(amax), "dim").select(
        "dim",
        F.round(err * err * ERR_SCALE).cast("long").alias("e2"),
    )
    agg = per_row.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("e2").cast("long").alias("sum_err2_pico"),
    )
    return agg.join(amax, "dim").select(
        "dim",
        "n",
        F.round(F.col("amax"), 6).cast("double").alias("amax"),
        "sum_err2_pico",
        F.round(F.col("sum_err2_pico") / F.col("n").cast("double"))
        .cast("long")
        .alias("mse_pico"),
    )


def embedding_int8_quant_sql() -> str:
    lv = float(INT8_LEVELS)
    return (
        "WITH ex AS (SELECT unnest(generate_series(1, len(v))) AS dim,"
        " unnest(CAST(embedding AS DOUBLE[])) AS x"
        " FROM (SELECT embedding, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)),"
        " amax AS (SELECT dim, MAX(abs(x)) AS amax FROM ex"
        " GROUP BY dim),"
        " per_row AS (SELECT ex.dim,"
        " CASE WHEN amax = 0 THEN CAST(0 AS BIGINT) ELSE"
        f" CAST(round((x - round(x * {lv} / amax) * amax / {lv})"
        f" * (x - round(x * {lv} / amax) * amax / {lv})"
        f" * {ERR_SCALE}) AS BIGINT) END AS e2"
        " FROM ex JOIN amax ON amax.dim = ex.dim),"
        " agg AS (SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(e2) AS BIGINT) AS sum_err2_pico FROM per_row"
        " GROUP BY dim)"
        " SELECT agg.dim, n, ROUND(amax, 6) AS amax, sum_err2_pico,"
        " CAST(round(sum_err2_pico / CAST(n AS DOUBLE)) AS BIGINT)"
        " AS mse_pico"
        " FROM agg JOIN amax ON amax.dim = agg.dim"
    )


MMR_QUERY_ID = 0  # deterministic query vector (member of the % 50 set)
MMR_SCALE = 1_000_000


def mmr_diverse_topk(
    embeddings: DataFrame, k: int = 10, m: int = 32
) -> DataFrame:
    """Maximal-marginal-relevance selection: [rank, vec_id, rel_micro,
    score2_micro] — k results for the MMR_QUERY_ID query that trade
    relevance against redundancy (Carbonell & Goldstein 1998), the
    diversity-aware retrieval / diverse-example-selection primitive a
    RAG or few-shot pipeline runs after plain top-k.

    Greedy MMR with lambda = 1/2, kept EXACT in integers: with
    rel/sim quantized to micro-units, argmax of rel − 0.5·max_sim is
    argmax of score2 = 2·rel_q − max_sim_q (scaling by 2 avoids the
    division); ties break on vec_id asc. The first pick has no
    selected set, so its score2 is 2·rel_q.

    Plan: candidate generation is distributed — one corpus pass
    scores cosine-to-query (query row broadcast), TakeOrdered keeps
    the top m; the m×m pairwise sims are one tiny self-join. The
    greedy k-step loop runs on the COLLECTED m-row table (bounded
    driver finish, m² ≤ ~1k values — the certified-top-k convention);
    at 100 TB only m changes the driver cost, never the corpus
    size."""
    e = _prepared(embeddings)
    qv = e.filter(F.col("vec_id") == MMR_QUERY_ID).select(
        F.col("v").alias("va"), F.col("norm").alias("na")
    )
    cos = F.round(
        F.expr(_SPARK_DOT_AB) / (F.col("na") * F.col("nb")), 6
    )
    cand = (
        e.filter(F.col("vec_id") != MMR_QUERY_ID)
        .select(
            F.col("vec_id"),
            F.col("v").alias("vb"),
            F.col("norm").alias("nb"),
        )
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "vb",
            "nb",
            F.round(cos * MMR_SCALE).cast("long").alias("rel_micro"),
        )
        .orderBy(F.col("rel_micro").desc(), F.col("vec_id").asc())
        .limit(m)
        # cand feeds THREE consumers (rel collect + both sides of the
        # sims self-join); Catalyst does not CSE across plan branches,
        # so materialize the m-row table once or the full corpus
        # scoring pass runs three times
        .transform(truncate_plan)
    )
    a = cand.select(
        F.col("vec_id").alias("ida"),
        F.col("vb").alias("va"),
        F.col("nb").alias("na"),
        "rel_micro",
    )
    b = cand.select(
        F.col("vec_id").alias("idb"),
        F.col("vb").alias("vb"),
        F.col("nb").alias("nb"),
    )
    sims = (
        a.crossJoin(b)
        .filter(F.col("ida") != F.col("idb"))
        .select(
            "ida",
            "idb",
            F.round(cos * MMR_SCALE).cast("long").alias("sim_micro"),
        )
    )
    rel = {
        r["ida"]: r["rel_micro"]
        for r in a.select("ida", "rel_micro").collect()
    }
    sim = {
        (r["ida"], r["idb"]): r["sim_micro"] for r in sims.collect()
    }
    selected: list[tuple[int, int, int, int]] = []
    chosen: set[int] = set()
    for rank in range(1, min(k, len(rel)) + 1):
        best = None
        for vid, rq in rel.items():
            if vid in chosen:
                continue
            max_sim = max(
                (sim[(vid, s)] for s in chosen if (vid, s) in sim),
                default=0,
            )
            score2 = 2 * rq - max_sim
            key = (-score2, vid)
            if best is None or key < best[0]:
                best = (key, vid, rq, score2)
        chosen.add(best[1])
        selected.append((rank, best[1], best[2], best[3]))
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        selected, "rank int, vec_id bigint, rel_micro bigint,"
        " score2_micro bigint"
    )


def mmr_diverse_topk_sql(k: int = 10, m: int = 32) -> str:
    """Unrolled greedy: sel_i = sel_{i-1} + argmax over remaining
    candidates of 2·rel − max sim to sel_{i-1} (exact integers, ties
    on vec_id) — the MIS/katz unrolled-CTE oracle pattern."""
    dot = (
        "list_reduce([CAST(0.0 AS DOUBLE)] ||"
        " list_transform(generate_series(1, len(A.v)),"
        " i -> A.v[i] * B.v[i]), (acc, x) -> acc + x)"
    )
    parts = [
        "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings),",
        f" en AS MATERIALIZED (SELECT vec_id, v, {_DUCK_NORM} AS norm"
        " FROM e),",
        f" cand AS MATERIALIZED (SELECT B.vec_id, B.v, B.norm,"
        f" CAST(round(ROUND(({dot}) / (A.norm * B.norm), 6)"
        f" * {MMR_SCALE}) AS BIGINT) AS rel_micro"
        f" FROM en A JOIN en B ON A.vec_id = {MMR_QUERY_ID}"
        f" AND B.vec_id <> {MMR_QUERY_ID}"
        f" ORDER BY rel_micro DESC, B.vec_id ASC LIMIT {m}),",
        f" sims AS MATERIALIZED (SELECT A.vec_id AS ida, B.vec_id AS idb,"
        f" CAST(round(ROUND(({dot}) / (A.norm * B.norm), 6)"
        f" * {MMR_SCALE}) AS BIGINT) AS sim_micro"
        " FROM cand A JOIN cand B ON A.vec_id <> B.vec_id),",
        " sel1 AS MATERIALIZED (SELECT 1 AS rank, vec_id, rel_micro,"
        " 2 * rel_micro AS score2_micro FROM cand"
        " ORDER BY rel_micro DESC, vec_id ASC LIMIT 1)",
    ]
    for i in range(2, k + 1):
        prev = f"sel{i - 1}"
        parts.append(
            f", step{i} AS (SELECT {i} AS rank, c.vec_id, c.rel_micro,"
            " 2 * c.rel_micro - MAX(s.sim_micro) AS score2_micro"
            f" FROM cand c JOIN sims s ON s.ida = c.vec_id"
            f" JOIN {prev} p ON s.idb = p.vec_id"
            f" WHERE c.vec_id NOT IN (SELECT vec_id FROM {prev})"
            " GROUP BY c.vec_id, c.rel_micro"
            " ORDER BY score2_micro DESC, c.vec_id ASC LIMIT 1)"
        )
        parts.append(
            f", sel{i} AS MATERIALIZED (SELECT * FROM {prev}"
            f" UNION ALL SELECT * FROM step{i})"
        )
    parts.append(
        f" SELECT rank, vec_id, rel_micro, score2_micro FROM sel{k}"
    )
    return "".join(parts)


RRF_K = 60  # the standard reciprocal-rank-fusion constant


def rrf_fusion(
    docs: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    m: int = 20,
) -> DataFrame:
    """[query_id, neighbor_id, rrf_micro, rank] — reciprocal-rank
    fusion (Cormack-Clarke-Buettcher 2009) of the SEMANTIC ranking
    (brute-force embedding cosine, the cosine_topk plan) and the
    LEXICAL ranking (TF-IDF sparse cosine via the inverted-index
    join) for the module's deterministic query set (id % 50 = 0;
    vec_id and doc_id are aligned in the testdata): score =
    Σ_lists 1/(RRF_K + rank), the standard hybrid-retrieval combiner
    a RAG pipeline runs over its dense+sparse candidate lists.

    Exactness: each list contributes round(10⁶/(60+rank)) — one
    double division on an INTEGER rank, rounded once; the fused score
    is an integer sum; ties break (score desc, neighbor asc).
    Plan: the semantic arm is one corpus scan against the broadcast
    query set; the lexical arm is a term-keyed inverted-index join
    (query-doc terms broadcast onto the corpus term table — never
    all-pairs); fusion is a full-outer join of two ≤|Q|·m row tables
    and a per-query window over ≤2m candidates."""
    from graph500_spark.operators.traindata import (
        TFIDF_SIM_SCALE,
        _terms,
    )

    sem = cosine_topk(embeddings, k=m).select(
        "query_id",
        "neighbor_id",
        F.col("rank").alias("rank_sem"),
    )

    terms = _terms(docs)
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    df_t = terms.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    idf = df_t.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.round(
            F.log((F.col("n") + 1).cast("double") / (F.col("df") + 1))
            * TFIDF_SIM_SCALE
        )
        .cast("long")
        .alias("idf_q"),
    )
    w = terms.join(F.broadcast(idf), "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.col("idf_q")).cast("long").alias("w"),
    ).transform(truncate_plan)
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("n2")
    )
    qw = w.filter(F.expr("doc_id % 50 = 0")).select(
        F.col("doc_id").alias("query_id"),
        "term",
        F.col("w").alias("wq"),
    )
    dots = (
        F.broadcast(qw)
        .join(w, "term")
        .filter(F.col("query_id") != F.col("doc_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("wq") * F.col("w")).cast("long").alias("dot"))
    )
    qn = norms.select(
        F.col("doc_id").alias("query_id"), F.col("n2").alias("nq")
    )
    cos5 = F.round(
        F.col("dot")
        / (F.sqrt(F.col("nq").cast("double")) * F.sqrt(F.col("n2"))),
        5,
    ).cast("double")
    w_lex = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("doc_id").asc()
    )
    lex = (
        dots.join(F.broadcast(qn), "query_id")
        .join(norms, "doc_id")
        .select("query_id", "doc_id", cos5.alias("cosine"))
        .withColumn("rank_lex", F.row_number().over(w_lex))
        .filter(F.col("rank_lex") <= m)
        .select(
            "query_id",
            F.col("doc_id").alias("neighbor_id"),
            "rank_lex",
        )
    )

    fused = sem.join(lex, ["query_id", "neighbor_id"], "full_outer")
    contrib_sem = F.when(
        F.col("rank_sem").isNotNull(),
        F.round(F.lit(1_000_000.0) / (F.lit(RRF_K) + F.col("rank_sem"))),
    ).otherwise(F.lit(0))
    contrib_lex = F.when(
        F.col("rank_lex").isNotNull(),
        F.round(F.lit(1_000_000.0) / (F.lit(RRF_K) + F.col("rank_lex"))),
    ).otherwise(F.lit(0))
    w_f = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.select(
            "query_id",
            "neighbor_id",
            (contrib_sem + contrib_lex).cast("long").alias("rrf_micro"),
        )
        .withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= k)
    )


def rrf_fusion_sql(k: int = 10, m: int = 20) -> str:
    from graph500_spark.operators.traindata import (
        TFIDF_SIM_SCALE,
        _DUCK_TERMS,
    )

    return (
        f"WITH semall AS ({cosine_topk_sql(k=m)}),"
        " sem AS (SELECT query_id, neighbor_id,"
        " CAST(rank AS INTEGER) AS rank_sem FROM semall),"
        f" terms AS ({_DUCK_TERMS}),"
        " nd AS (SELECT COUNT(*) AS n FROM documents),"
        " dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df"
        " FROM terms GROUP BY term),"
        " idf AS (SELECT term,"
        " CAST(round(ln((n + 1) / CAST(df + 1 AS DOUBLE))"
        f" * {TFIDF_SIM_SCALE}) AS BIGINT) AS idf_q"
        " FROM dft CROSS JOIN nd),"
        " w AS MATERIALIZED (SELECT t.doc_id, t.term,"
        " CAST(t.tf * i.idf_q AS BIGINT) AS w"
        " FROM terms t JOIN idf i USING (term)),"
        " norms AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2"
        " FROM w GROUP BY doc_id),"
        " qw AS (SELECT doc_id AS query_id, term, w AS wq FROM w"
        " WHERE doc_id % 50 = 0),"
        " dots AS (SELECT q.query_id, w.doc_id,"
        " CAST(SUM(q.wq * w.w) AS BIGINT) AS dot"
        " FROM qw q JOIN w ON w.term = q.term"
        " AND q.query_id <> w.doc_id GROUP BY 1, 2),"
        " lexall AS (SELECT dots.query_id,"
        " dots.doc_id AS neighbor_id,"
        " CAST(ROW_NUMBER() OVER (PARTITION BY dots.query_id ORDER BY"
        " ROUND(dot / (sqrt(CAST(nq.n2 AS DOUBLE)) * sqrt(nb.n2)), 5)"
        " DESC, dots.doc_id ASC) AS INTEGER) AS rank_lex"
        " FROM dots JOIN norms nq ON nq.doc_id = dots.query_id"
        " JOIN norms nb ON nb.doc_id = dots.doc_id),"
        f" lex AS (SELECT * FROM lexall WHERE rank_lex <= {m}),"
        " fused AS (SELECT COALESCE(sem.query_id, lex.query_id)"
        " AS query_id,"
        " COALESCE(sem.neighbor_id, lex.neighbor_id) AS neighbor_id,"
        " CAST(COALESCE(CAST(round(1000000.0"
        f" / ({RRF_K} + rank_sem)) AS BIGINT), 0)"
        " + COALESCE(CAST(round(1000000.0"
        f" / ({RRF_K} + rank_lex)) AS BIGINT), 0) AS BIGINT)"
        " AS rrf_micro"
        " FROM sem FULL OUTER JOIN lex"
        " ON sem.query_id = lex.query_id"
        " AND sem.neighbor_id = lex.neighbor_id),"
        " ranked AS (SELECT query_id, neighbor_id, rrf_micro,"
        " CAST(ROW_NUMBER() OVER (PARTITION BY query_id"
        " ORDER BY rrf_micro DESC, neighbor_id ASC) AS INTEGER)"
        " AS rank FROM fused)"
        " SELECT query_id, neighbor_id, rrf_micro, rank FROM ranked"
        f" WHERE rank <= {k}"
    )

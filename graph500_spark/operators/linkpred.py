"""Link prediction over the clean undirected graph: Adamic-Adar and
common-neighbor scores for non-adjacent vertex pairs — the classic
"who should be connected" primitive (recommendations, knowledge-graph
completion, dedup-cluster stitching).

Adamic-Adar(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z): common neighbors,
inversely weighted by how promiscuous each shared neighbor is.

Exactness: each neighbor's term is quantized ONCE —
round(1e6 / ln(deg)) — a single two-operand double expression both
engines evaluate identically (the unigram_logppl discipline); the
per-pair sum of quantized terms is exact integer. deg ≥ 2 always
holds for a wedge center (it has two distinct neighbors), so ln > 0.

Plan shape: wedges come from ONE self-equi-join of the symmetric
edge list on the center vertex z (u < v kills mirror duplicates),
with the degree table broadcast onto the center; existing edges are
removed by a left-anti join; the top-k is a distributed TakeOrdered.
Wedge fan-out is Σ_z deg(z)² — the hub-quadratic shape shared with
triangle counting; at 100 TB the standard mitigations apply (cap or
sample per-center adjacency, as four_cycle_count does) and the
deterministic full enumeration here is the exact-semantics tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AA_TOPK = 100


def adamic_adar_topk(edges: DataFrame, k: int = AA_TOPK) -> DataFrame:
    """[u, v, n_common, aa_score_q] — top-k non-adjacent pairs by
    Adamic-Adar score (micro-units), ties broken by (u, v) asc.
    `edges` must be the clean symmetric edge list [src, dst]."""
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    # term quantized once per center vertex
    terms = deg.where(F.col("deg") >= 2).select(
        F.col("src").alias("z"),
        F.expr(
            "CAST(round(1000000 / ln(CAST(deg AS DOUBLE))) AS BIGINT)"
        ).alias("term_q"),
    )
    wedges = (
        edges.select(F.col("src").alias("z"), F.col("dst").alias("u"))
        .join(
            edges.select(F.col("src").alias("z"), F.col("dst").alias("v")),
            "z",
        )
        .where(F.col("u") < F.col("v"))
    )
    scored = (
        wedges.join(F.broadcast(terms), "z")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("term_q").cast("long").alias("aa_score_q"),
        )
    )
    non_edges = scored.join(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )
    return non_edges.orderBy(
        F.col("aa_score_q").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(k)


def adamic_adar_topk_sql(clean_edges_sql: str, k: int = AA_TOPK) -> str:
    return (
        f"WITH edges AS ({clean_edges_sql}),"
        " deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg"
        "  FROM edges GROUP BY src),"
        " terms AS (SELECT src AS z,"
        "  CAST(round(1000000 / ln(CAST(deg AS DOUBLE))) AS BIGINT)"
        "  AS term_q FROM deg WHERE deg >= 2),"
        " wedges AS (SELECT e1.src AS z, e1.dst AS u, e2.dst AS v"
        "  FROM edges e1 JOIN edges e2 ON e1.src = e2.src"
        "  AND e1.dst < e2.dst),"
        " scored AS (SELECT w.u, w.v,"
        "  CAST(COUNT(*) AS BIGINT) AS n_common,"
        "  CAST(SUM(t.term_q) AS BIGINT) AS aa_score_q"
        "  FROM wedges w JOIN terms t ON t.z = w.z GROUP BY w.u, w.v),"
        " non_edges AS (SELECT s.* FROM scored s"
        "  WHERE NOT EXISTS (SELECT 1 FROM edges e"
        "   WHERE e.src = s.u AND e.dst = s.v))"
        " SELECT u, v, n_common, aa_score_q FROM non_edges"
        f" ORDER BY aa_score_q DESC, u ASC, v ASC LIMIT {k}"
    )

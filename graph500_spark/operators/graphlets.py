"""Connected 4-vertex graphlet census — the classic graph-ML feature
vector (ESCAPE, Pinar–Seshadhri–Vishal WWW'17): global NON-INDUCED
subgraph counts of all six connected 4-vertex patterns.

Engine capability beyond the reference's own surface (its workload is
BFS only — /root/reference/mpi/bfs.hpp:2651-2940); the census is the
standard higher-order structure profile over the same cleaned
symmetric edge table, and every term reuses the degree-oriented
machinery that keeps the triangle family hub-safe.

Counting identities (all exact, all integer):

  3-stars (K1,3)      Σ_v C(d(v), 3)               — definitional
  4-paths (P4)        Σ_{(a,b)∈E} (d(a)−1)(d(b)−1) − 3·T
                      (choose the middle edge and one neighbor per
                      side; u = v collapses are exactly 3 per
                      triangle, once per triangle edge as middle)
  tailed triangles    Σ_v T(v)·(d(v)−2)            — triangle corner
                      + one outside tail at that corner
  4-cycles (C4)       Σ_{p<q} C(W(p,q), 2) over degree-oriented
                      OO/IO wedges (see triangles.four_cycle_count)
  diamonds            Σ_{e∈E} C(sup(e), 2)         — a diamond's two
                      triangles share exactly one hinge edge; a K4
                      contributes C(2,2)=1 at each of its 6 edges =
                      its 6 diamond subgraphs, as non-induced
                      counting requires
  4-cliques (K4)      oriented a→b→c chain + common out-neighbor
                      (see triangles.four_clique_count)

Scale shape: one degree aggregation, ONE degree-oriented edge table
materialized and shared by the triangle / support / C4-wedge / K4
branches (out-degree ≤ O(√|E|) bounds every join fan-out at
O(|E|^{3/2})), plus per-edge/per-vertex joins; the six scalars meet
in a bounded 1-row crossJoin chain. Products accumulate in
DECIMAL(38,0) (big product-sum discipline) before the final BIGINT
casts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph500_spark.functions.plantrunc import truncate_plan
from graph500_spark.functions.sizing import widen_narrow_input
from graph500_spark.operators.triangles import (
    _c4_wedge_counts,
    _k4_hinge_count,
    orient_edges,
)


def graphlet_census_4(edges_clean: DataFrame) -> DataFrame:
    """Single row [n_3stars, n_4paths, n_tailed_triangles, n_4cycles,
    n_diamonds, n_4cliques] of global non-induced connected 4-vertex
    subgraph counts (module docstring for the identities)."""
    deg = edges_clean.groupBy(F.col("src").alias("vertex")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    # widen the shared oriented table to full machine parallelism
    # when the input fixture is laid out narrower — every wedge branch
    # (triangles / C4 / K4) inherits this layout (guide §2.5)
    oriented = widen_narrow_input(
        orient_edges(edges_clean), "lo", probe=edges_clean
    ).transform(truncate_plan)

    # --- triangles once, shared by T / T(v) / sup(e) / K4 ---
    ab = oriented.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
    bc = oriented.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    ac = oriented.select(F.col("lo").alias("a"), F.col("hi").alias("c"))
    tri = (
        ab.join(bc, "b")
        .join(ac, ["a", "c"], "left_semi")
        .select("a", "b", "c")
        .transform(truncate_plan)
    )

    n_tri = tri.agg(F.count(F.lit(1)).cast("long").alias("t"))

    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("vertex"))
    tcnt = corners.groupBy("vertex").agg(
        F.count(F.lit(1)).cast("long").alias("t_v")
    )

    sides = (
        tri.select(F.least("a", "b").alias("u"),
                   F.greatest("a", "b").alias("v"))
        .unionAll(tri.select(F.least("b", "c").alias("u"),
                             F.greatest("b", "c").alias("v")))
        .unionAll(tri.select(F.least("a", "c").alias("u"),
                             F.greatest("a", "c").alias("v")))
    )
    sup = sides.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )

    # --- stars: Σ C(d,3) ---
    stars = deg.agg(
        F.expr(
            "cast(sum(cast(degree as decimal(38,0)) * (degree - 1)"
            " * (degree - 2) div 6) as bigint)"
        ).alias("n_3stars")
    )

    # --- paths: Σ_half (d(a)−1)(d(b)−1) over BOTH endpoints − 3T ---
    half = (
        edges_clean.filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
    )
    half_deg = half.join(
        deg.select(F.col("vertex").alias("u"), F.col("degree").alias("du")),
        "u",
    ).join(
        deg.select(F.col("vertex").alias("v"), F.col("degree").alias("dv")),
        "v",
    )
    path_sum = half_deg.agg(
        F.expr(
            "cast(sum(cast(du - 1 as decimal(38,0)) * (dv - 1))"
            " as bigint)"
        ).alias("p_raw")
    )
    paths = path_sum.crossJoin(n_tri).select(
        (F.col("p_raw") - 3 * F.col("t")).cast("long").alias("n_4paths")
    )

    # --- tailed triangles: Σ_v T(v)·(d(v)−2) ---
    tailed = (
        tcnt.join(deg, "vertex")
        .agg(
            F.expr(
                "cast(sum(cast(t_v as decimal(38,0)) * (degree - 2))"
                " as bigint)"
            ).alias("n_tailed_triangles")
        )
    )

    # --- 4-cycles: OO/IO oriented wedges over the SHARED oriented
    # table (salted IO join — see triangles._c4_wedge_counts) ---
    cycles = _c4_wedge_counts(oriented).agg(
        F.expr(
            "cast(sum(cast(nw as decimal(38,0)) * (nw - 1) div 2)"
            " as bigint)"
        ).alias("n_4cycles")
    )

    # --- diamonds: Σ_e C(sup,2) ---
    diamonds = sup.agg(
        F.expr(
            "cast(sum(cast(support as decimal(38,0)) * (support - 1)"
            " div 2) as bigint)"
        ).alias("n_diamonds")
    )

    # --- 4-cliques: hinge pairing of oriented triangles (round 9 —
    # replaces the kClist extension chain; see _k4_hinge_count) ---
    k4 = _k4_hinge_count(oriented, tri, deg, "n_4cliques")

    out = (
        stars.crossJoin(paths)
        .crossJoin(tailed)
        .crossJoin(cycles)
        .crossJoin(diamonds)
        .crossJoin(k4)
    )
    # SUM over an empty frame is NULL; a triangle-free (or empty)
    # graph must report honest zeros
    return out.select(
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in out.columns
        ]
    )


def graphlet_census_4_sql(clean_sql: str) -> str:
    """Plain u<v / cn-based oracle — valid against the oriented engine
    because every identity counts each subgraph exactly once either
    way (orientation-invariance of triangles/support, the C4 diagonal
    argument, the a<b<c<d K4 normalization)."""
    return (
        f"WITH clean AS ({clean_sql}),"
        " deg AS (SELECT src AS vertex, CAST(COUNT(*) AS BIGINT) AS degree"
        "  FROM clean GROUP BY src),"
        " h AS (SELECT src AS u, dst AS v FROM clean WHERE src < dst),"
        " tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c"
        "  FROM h e1 JOIN h e2 ON e2.u = e1.v"
        "  JOIN h e3 ON e3.u = e1.u AND e3.v = e2.v),"
        " tcnt AS (SELECT vertex, CAST(COUNT(*) AS BIGINT) AS t_v FROM"
        "  (SELECT a AS vertex FROM tri UNION ALL SELECT b FROM tri"
        "   UNION ALL SELECT c FROM tri) GROUP BY vertex),"
        " sup AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS support FROM"
        "  (SELECT a AS u, b AS v FROM tri"
        "   UNION ALL SELECT b AS u, c AS v FROM tri"
        "   UNION ALL SELECT a AS u, c AS v FROM tri) GROUP BY u, v),"
        " cn AS (SELECT a.dst AS p, b.dst AS q, COUNT(*) AS cn"
        "  FROM clean a JOIN clean b ON a.src = b.src AND a.dst < b.dst"
        "  GROUP BY 1, 2),"
        " t AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM tri),"
        " s1 AS (SELECT CAST(SUM(CAST(degree AS HUGEINT) * (degree - 1)"
        "   * (degree - 2) // 6) AS BIGINT) AS n_3stars FROM deg),"
        " s2 AS (SELECT CAST(SUM(CAST(du.degree - 1 AS HUGEINT)"
        "   * (dv.degree - 1)) AS BIGINT) AS p_raw FROM h"
        "  JOIN deg du ON du.vertex = h.u JOIN deg dv ON dv.vertex = h.v),"
        " s3 AS (SELECT CAST(SUM(CAST(t_v AS HUGEINT) * (degree - 2))"
        "   AS BIGINT) AS n_tailed_triangles"
        "  FROM tcnt JOIN deg USING (vertex)),"
        " s4 AS (SELECT CAST(SUM(CAST(cn AS HUGEINT) * (cn - 1) // 2)"
        "   // 2 AS BIGINT) AS n_4cycles FROM cn),"
        " s5 AS (SELECT CAST(SUM(CAST(support AS HUGEINT) * (support - 1)"
        "   // 2) AS BIGINT) AS n_diamonds FROM sup),"
        " s6 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_4cliques"
        "  FROM h e1 JOIN h e2 ON e2.u = e1.u AND e2.v > e1.v"
        "  JOIN h e3 ON e3.u = e1.u AND e3.v > e2.v"
        "  JOIN h e4 ON e4.u = e1.v AND e4.v = e2.v"
        "  JOIN h e5 ON e5.u = e1.v AND e5.v = e3.v"
        "  JOIN h e6 ON e6.u = e2.v AND e6.v = e3.v)"
        # COALESCE every SUM-derived column: on an empty edge set the
        # SUMs (and p_raw − 3t) are NULL while the engine pins zeros.
        " SELECT COALESCE(s1.n_3stars, 0) AS n_3stars,"
        "  COALESCE(CAST(s2.p_raw - 3 * t.t AS BIGINT), 0) AS n_4paths,"
        "  COALESCE(s3.n_tailed_triangles, 0) AS n_tailed_triangles,"
        "  COALESCE(s4.n_4cycles, 0) AS n_4cycles,"
        "  COALESCE(s5.n_diamonds, 0) AS n_diamonds,"
        "  COALESCE(s6.n_4cliques, 0) AS n_4cliques"
        " FROM s1, s2, s3, s4, s5, s6, t"
    )

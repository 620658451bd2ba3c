"""Run statistics (SURVEY.md A7) — min/Q1/median/Q3/max/mean/stddev per
quantity plus harmonic-mean TEPS with the Norris (1940) stddev.

Ref: get_statistics / print_bfs_result,
/root/reference/mpi/logfile.h:19-107. The reference's quartile
convention is NOT linear interpolation; it is
    Q1     = (x[(n-1)/4]   + x[n/4])     / 2
    median = (x[(n-1)/2]   + x[n/2])     / 2
    Q3     = (x[n-1-(n-1)/4] + x[n-1-n/4]) / 2
(0-based sorted order, integer division). We reproduce it exactly with
sorted-array indexing — both here and in the DuckDB oracle SQL — so the
operator is hash-checkable.

Scale note: statistics run over one row per BFS run (64 rows); the
collect_list is bounded by the run count, never by data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _order_stats(df: DataFrame, col: str) -> DataFrame:
    """Reference-convention summary for one numeric column →
    one row [quantity, min, q1, median, q3, max, mean, stddev]."""
    arr = F.sort_array(F.collect_list(F.col(col)))
    n = F.size(arr)
    # element_at is 1-based; the reference indexes are 0-based.
    q1 = (
        F.element_at(arr, ((n - 1) / 4).cast("int") + 1)
        + F.element_at(arr, (n / 4).cast("int") + 1)
    ) / 2
    med = (
        F.element_at(arr, ((n - 1) / 2).cast("int") + 1)
        + F.element_at(arr, (n / 2).cast("int") + 1)
    ) / 2
    q3 = (
        F.element_at(arr, n - ((n - 1) / 4).cast("int"))
        + F.element_at(arr, n - (n / 4).cast("int"))
    ) / 2
    return df.agg(
        F.lit(col).alias("quantity"),
        F.min(col).cast("double").alias("min"),
        q1.cast("double").alias("q1"),
        med.cast("double").alias("median"),
        q3.cast("double").alias("q3"),
        F.max(col).cast("double").alias("max"),
        F.avg(col).alias("mean"),
        F.stddev_samp(col).alias("stddev"),
    )


def order_stats_over(df: DataFrame, cols: list[str]) -> DataFrame:
    """Reference-convention order statistics (mpi/logfile.h quartile
    indexing) for each named column — one row per column, ordered by
    quantity name. Public building block for stats entries over real
    per-run results tables (e.g. the 64-root BFS harness)."""
    out = None
    for col in cols:
        one = _order_stats(df, col)
        out = one if out is None else out.unionByName(one)
    return out.orderBy("quantity")


def run_statistics(runs: DataFrame) -> DataFrame:
    """Summary over per-run measurements
    [run_id, bfs_time, validate_time, edge_count] (FIXTURES.md §1.6):
    one row per quantity incl. derived secs_per_edge, ordered by name.
    """
    with_spe = runs.withColumn(
        "secs_per_edge", F.col("bfs_time") / F.col("edge_count")
    )
    out = None
    for col in ("bfs_time", "validate_time", "edge_count", "secs_per_edge"):
        one = _order_stats(with_spe, col)
        out = one if out is None else out.unionByName(one)
    return out.orderBy("quantity")


def teps_summary(runs: DataFrame) -> DataFrame:
    """Headline TEPS statistics (logfile.h:74-91):
    TEPS order stats are inverses of secs_per_edge order stats
    (min_TEPS = 1/max_spe, Q1_TEPS = 1/Q3_spe, ...);
    harmonic_mean_TEPS = 1/mean(spe); Norris stddev =
    stddev(spe) / (mean(spe)^2 * sqrt(n-1)).
    """
    spe = runs.select(
        (F.col("bfs_time") / F.col("edge_count")).alias("spe")
    )
    arr = F.sort_array(F.collect_list("spe"))
    n = F.size(arr)
    q1 = (
        F.element_at(arr, ((n - 1) / 4).cast("int") + 1)
        + F.element_at(arr, (n / 4).cast("int") + 1)
    ) / 2
    med = (
        F.element_at(arr, ((n - 1) / 2).cast("int") + 1)
        + F.element_at(arr, (n / 2).cast("int") + 1)
    ) / 2
    q3 = (
        F.element_at(arr, n - ((n - 1) / 4).cast("int"))
        + F.element_at(arr, n - (n / 4).cast("int"))
    ) / 2
    return spe.agg(
        (F.lit(1.0) / F.max("spe")).alias("min_teps"),
        (F.lit(1.0) / q3).cast("double").alias("q1_teps"),
        (F.lit(1.0) / med).cast("double").alias("median_teps"),
        (F.lit(1.0) / q1).cast("double").alias("q3_teps"),
        (F.lit(1.0) / F.min("spe")).alias("max_teps"),
        (F.lit(1.0) / F.avg("spe")).alias("harmonic_mean_teps"),
        (
            F.stddev_samp("spe")
            / (
                F.avg("spe")
                * F.avg("spe")
                * F.sqrt(F.count(F.lit(1)).cast("double") - 1)
            )
        ).alias("harmonic_stddev_teps"),
    )


def degree_assortativity(edges_clean: DataFrame, degrees: DataFrame) -> DataFrame:
    """One-row [n_edges, sum_x, sum_y, sum_xy, sum_x2, sum_y2,
    assortativity]: Pearson correlation of endpoint degrees over the
    directed edge list — the standard summary of hub-to-hub vs
    hub-to-leaf mixing (negative for Kronecker/social graphs).

    Exactness: degrees are integers, so all five moment sums are
    exact integer aggregations (shuffle-order-free); the correlation
    is one deterministic arithmetic expression over the single result
    row, rounded to 6. Plan: two broadcast-or-shuffle equi-joins of
    the degree table onto the edge list + one global aggregate with
    map-side partials."""
    x = edges_clean.join(
        degrees.withColumnRenamed("vertex", "src").withColumnRenamed(
            "degree", "dx"
        ),
        "src",
    ).join(
        degrees.withColumnRenamed("vertex", "dst").withColumnRenamed(
            "degree", "dy"
        ),
        "dst",
    )
    m = x.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum("dx").cast("long").alias("sum_x"),
        F.sum("dy").cast("long").alias("sum_y"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sum_xy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sum_x2"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("sum_y2"),
    )
    r = (
        (F.col("n_edges") * F.col("sum_xy") - F.col("sum_x") * F.col("sum_y"))
        / (
            F.sqrt(
                F.col("n_edges") * F.col("sum_x2")
                - F.col("sum_x") * F.col("sum_x")
            )
            * F.sqrt(
                F.col("n_edges") * F.col("sum_y2")
                - F.col("sum_y") * F.col("sum_y")
            )
        )
    )
    return m.select(
        "n_edges", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2",
        F.round(r, 6).cast("double").alias("assortativity"),
    )


def modularity(edges_clean: DataFrame, communities: DataFrame) -> DataFrame:
    """Newman modularity of a vertex partition over the symmetric
    clean edge list — one row [n_communities, two_m, within_rows,
    modularity].

    Q = Σ_c [ E_c/(2m) − (D_c/(2m))² ] where E_c counts directed rows
    with both endpoints in community c and D_c sums degrees inside c.
    Computed as ONE exact integer expression
        (2m·ΣE_c − ΣD_c²) / (2m)²
    so every aggregation is a shuffle-order-free integer sum and the
    only float op is the final division (rounded to 6) — the same
    exactness discipline as degree_assortativity. Plan: two
    broadcast-or-shuffle joins of the community map onto the edge
    list + one grouped integer agg per term; the community map is the
    natural broadcast side (|communities| = |V| labels, and at 100 TB
    the join keys are the already-partitioned vertex ids).

    ``communities`` is any [vertex, community] map — compose with
    connected_components / label_propagation output, or a hash
    bucketing for partition-quality probes.
    """
    edges = edges_clean.select("src", "dst")
    cmap = communities.select("vertex", "community")
    deg = edges.groupBy(F.col("src").alias("vertex")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    two_m = edges.agg(F.count(F.lit(1)).cast("long").alias("two_m"))
    within = (
        edges.join(
            cmap.select(
                F.col("vertex").alias("src"), F.col("community").alias("cs")
            ),
            "src",
        )
        .join(
            cmap.select(
                F.col("vertex").alias("dst"), F.col("community").alias("cd")
            ),
            "dst",
        )
        .filter(F.col("cs") == F.col("cd"))
        .agg(F.count(F.lit(1)).cast("long").alias("within_rows"))
    )
    dsums = (
        deg.join(cmap, "vertex")
        .groupBy("community")
        .agg(F.sum("degree").cast("long").alias("d_c"))
    )
    dstats = dsums.agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.sum(F.col("d_c") * F.col("d_c")).cast("long").alias("sum_d2"),
    )
    row = two_m.crossJoin(within).crossJoin(dstats)
    # Integer numerator keeps the value exact; the denominator is cast
    # to double BEFORE the product so it cannot overflow long (the
    # numerator's long products are exact up to 2m < 3·10⁹ rows —
    # beyond that swap both products to double, still one
    # deterministic expression).
    q = (
        F.col("two_m") * F.col("within_rows") - F.col("sum_d2")
    ) / (F.col("two_m").cast("double") * F.col("two_m"))
    return row.select(
        "n_communities",
        "two_m",
        "within_rows",
        F.round(q, 6).cast("double").alias("modularity"),
    )


def modularity_sql(clean_sql: str, community_expr: str) -> str:
    """DuckDB mirror; ``community_expr`` maps a vertex id column
    named ``vertex`` to its community label."""
    return (
        f"WITH clean AS ({clean_sql}),"
        " cmap AS (SELECT vertex,"
        f" {community_expr} AS community FROM"
        " (SELECT DISTINCT src AS vertex FROM clean)),"
        " deg AS (SELECT src AS vertex, CAST(COUNT(*) AS BIGINT) AS degree"
        " FROM clean GROUP BY src),"
        " tm AS (SELECT CAST(COUNT(*) AS BIGINT) AS two_m FROM clean),"
        " w AS (SELECT CAST(COUNT(*) AS BIGINT) AS within_rows FROM clean e"
        " JOIN cmap cs ON cs.vertex = e.src"
        " JOIN cmap cd ON cd.vertex = e.dst"
        " WHERE cs.community = cd.community),"
        " ds AS (SELECT cm.community, CAST(SUM(d.degree) AS BIGINT) AS d_c"
        " FROM deg d JOIN cmap cm ON cm.vertex = d.vertex"
        " GROUP BY cm.community),"
        " dst AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,"
        " CAST(SUM(d_c * d_c) AS BIGINT) AS sum_d2 FROM ds)"
        " SELECT n_communities, two_m, within_rows,"
        " ROUND((two_m * within_rows - sum_d2)"
        " / (CAST(two_m AS DOUBLE) * two_m), 6) AS modularity"
        " FROM tm, w, dst"
    )


def table_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """ANALYZE-style per-column statistics: [col_name, n_rows,
    n_nulls, n_distinct] — one row per profiled column.

    The optimizer-feeding / data-quality profile (null explosion or
    NDV collapse after a pipeline stage is the classic silent-bug
    signal). Exact NDV via count(distinct) — one pass over the table
    with Spark's distinct-aggregate expansion; at 100 TB swap in
    approx_count_distinct per column for one cheap sketch pass (the
    count_vertices_approx tier pattern)."""
    cols = columns if columns is not None else df.columns
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(
                f"__nulls_{c}"
            )
        )
        aggs.append(F.countDistinct(c).cast("long").alias(f"__ndv_{c}"))
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', __nulls_{c}, __ndv_{c}" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stacked})"
        ).alias("col_name", "n_nulls", "n_distinct"),
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct")


def table_stats_sql(table: str, columns: list[str]) -> str:
    selects = [
        (
            f"SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,"
            f" CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            " AS n_nulls,"
            f" CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct"
            f" FROM {table}"
        )
        for c in columns
    ]
    return " UNION ALL ".join(selects)


def _gini_from_groups(
    groups: DataFrame, value_col: str, count_col: str, out_name: str
) -> DataFrame:
    """One-row Gini coefficient from a grouped (value, count)
    distribution — exact integer accumulation over the (small)
    distinct-value table, one float expression at the end.

    For groups sorted by value v_g with counts c_g, cumulative count
    C_g: G = Σ v_g·c_g·(2C_g − c_g + 1) / (N·S) − (N+1)/N. The window
    cumsum runs over the distribution rows (≤ distinct values — never
    data-sized), so the single-partition window is safe at any corpus
    size."""
    from pyspark.sql.window import Window

    w = (
        Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = groups.select(
        F.col(value_col).cast("long").alias("v"),
        F.col(count_col).cast("long").alias("c"),
    ).withColumn("cc", F.sum("c").over(w))
    agg = cum.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("long").alias("s"),
        F.sum(
            F.col("v") * F.col("c")
            * (2 * F.col("cc") - F.col("c") + 1)
        ).cast("long").alias("b"),
    )
    g = (
        F.col("b") / (F.col("n").cast("double") * F.col("s"))
        - (F.col("n") + 1) / F.col("n").cast("double")
    )
    return agg.select(
        "n", "s", F.round(g, 6).cast("double").alias(out_name)
    )


def degree_gini(degrees: DataFrame) -> DataFrame:
    """[n, s, degree_gini] — Gini of the degree distribution (0 =
    regular graph, →1 = hub-dominated; the scalar inequality summary
    alongside degree_histogram_log's shape readout)."""
    dist = degrees.groupBy("degree").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return _gini_from_groups(dist, "degree", "cnt", "degree_gini")


def degree_gini_sql(clean_sql: str) -> str:
    return (
        f"WITH clean AS ({clean_sql}),"
        " deg AS (SELECT src AS vertex, COUNT(*) AS degree FROM clean"
        " GROUP BY src),"
        " dist AS (SELECT degree AS v, CAST(COUNT(*) AS BIGINT) AS c"
        " FROM deg GROUP BY degree),"
        " cum AS (SELECT v, c, SUM(c) OVER (ORDER BY v"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc"
        " FROM dist),"
        " agg AS (SELECT CAST(SUM(c) AS BIGINT) AS n,"
        " CAST(SUM(v * c) AS BIGINT) AS s,"
        " CAST(SUM(v * c * (2 * cc - c + 1)) AS BIGINT) AS b FROM cum)"
        " SELECT n, s,"
        " ROUND(b / (CAST(n AS DOUBLE) * s)"
        " - (n + 1) / CAST(n AS DOUBLE), 6) AS degree_gini FROM agg"
    )


def source_token_gini(docs: DataFrame) -> DataFrame:
    """[n, s, token_gini] — Gini of per-source token totals: the
    mixture-balance readout (0 = perfectly balanced sources; high =
    one supplier dominates the token budget). Composes with
    corpus_mix_temperature, which is the knob that FIXES the
    imbalance this measures."""
    from graph500_spark.operators.text import SPARK_TOKENS

    per_source = docs.select(
        "source", F.expr(f"size({SPARK_TOKENS})").alias("t")
    ).groupBy("source").agg(F.sum("t").cast("long").alias("tokens"))
    dist = per_source.groupBy("tokens").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return _gini_from_groups(dist, "tokens", "cnt", "token_gini")


def source_token_gini_sql() -> str:
    from graph500_spark.operators.text import DUCK_TOKENS

    return (
        f"WITH per AS (SELECT source,"
        f" CAST(SUM(len({DUCK_TOKENS})) AS BIGINT) AS tokens"
        " FROM documents GROUP BY source),"
        " dist AS (SELECT tokens AS v, CAST(COUNT(*) AS BIGINT) AS c"
        " FROM per GROUP BY tokens),"
        " cum AS (SELECT v, c, SUM(c) OVER (ORDER BY v"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc"
        " FROM dist),"
        " agg AS (SELECT CAST(SUM(c) AS BIGINT) AS n,"
        " CAST(SUM(v * c) AS BIGINT) AS s,"
        " CAST(SUM(v * c * (2 * cc - c + 1)) AS BIGINT) AS b FROM cum)"
        " SELECT n, s,"
        " ROUND(b / (CAST(n AS DOUBLE) * s)"
        " - (n + 1) / CAST(n AS DOUBLE), 6) AS token_gini FROM agg"
    )


def rich_club(edges_clean: DataFrame) -> DataFrame:
    """[k, n_rich, e_rich, phi_ppm] — rich-club coefficient curve:
    for each distinct degree value k, the density among vertices of
    degree > k — φ(k) = E_k / C(|R_k|, 2), ppm-quantized (rows with
    |R_k| < 2 are omitted: φ undefined).

    One-pass shape (no threshold cross join, no range join): an edge
    has both endpoints in R_k iff min(deg_u, deg_v) > k, so both
    |R_k| and E_k are STRICT suffix sums over one merged value axis
    (degree values ∪ min-endpoint-degree values) — two tiny grouped
    counts, two cumulative windows over ≤ max_degree rows, equi-joins
    only. The single-partition window is bounded by the distinct
    degree count (the degree_gini discipline); exact integers end to
    end."""
    from pyspark.sql import Window

    deg = edges_clean.groupBy(F.col("src").alias("vertex")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    degcnt = deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    half = edges_clean.filter(F.col("src") < F.col("dst"))
    mcnt = (
        half.join(
            deg.select(F.col("vertex").alias("src"),
                       F.col("degree").alias("du")), "src"
        )
        .join(
            deg.select(F.col("vertex").alias("dst"),
                       F.col("degree").alias("dv")), "dst"
        )
        .select(F.least("du", "dv").alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("ecnt"))
    )
    axis = (
        degcnt.select("degree")
        .unionAll(mcnt.select("degree"))
        .distinct()
    )
    vals = (
        axis.join(degcnt, "degree", "left")
        .join(mcnt, "degree", "left")
        .select(
            "degree",
            F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"),
            F.coalesce("ecnt", F.lit(0)).cast("long").alias("ecnt"),
        )
    )
    w = Window.orderBy(F.col("degree").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = vals.select(
        "degree",
        "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).cast("long").alias("n_rich"),
        (F.sum("ecnt").over(w) - F.col("ecnt")).cast("long")
        .alias("e_rich"),
    )
    return (
        curve.filter((F.col("cnt") > 0) & (F.col("n_rich") >= 2))
        .select(
            F.col("degree").alias("k"),
            "n_rich",
            "e_rich",
            F.expr(
                "CAST((2000000 * e_rich)"
                " div (n_rich * (n_rich - 1)) AS BIGINT)"
            ).alias("phi_ppm"),
        )
    )


def rich_club_sql(clean_sql: str) -> str:
    return (
        f"WITH clean AS ({clean_sql}),"
        " deg AS (SELECT src AS vertex, CAST(COUNT(*) AS BIGINT) AS degree"
        "  FROM clean GROUP BY src),"
        " degcnt AS (SELECT degree, CAST(COUNT(*) AS BIGINT) AS cnt"
        "  FROM deg GROUP BY degree),"
        " half AS (SELECT src, dst FROM clean WHERE src < dst),"
        " mcnt AS (SELECT LEAST(du.degree, dv.degree) AS degree,"
        "  CAST(COUNT(*) AS BIGINT) AS ecnt FROM half h"
        "  JOIN deg du ON du.vertex = h.src"
        "  JOIN deg dv ON dv.vertex = h.dst"
        "  GROUP BY 1),"
        " axis AS (SELECT degree FROM degcnt"
        "  UNION SELECT degree FROM mcnt),"
        " vals AS (SELECT a.degree,"
        "  CAST(COALESCE(d.cnt, 0) AS BIGINT) AS cnt,"
        "  CAST(COALESCE(m.ecnt, 0) AS BIGINT) AS ecnt"
        "  FROM axis a LEFT JOIN degcnt d ON d.degree = a.degree"
        "  LEFT JOIN mcnt m ON m.degree = a.degree),"
        " curve AS (SELECT degree, cnt,"
        "  CAST(SUM(cnt) OVER (ORDER BY degree DESC"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt"
        "   AS BIGINT) AS n_rich,"
        "  CAST(SUM(ecnt) OVER (ORDER BY degree DESC"
        "   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ecnt"
        "   AS BIGINT) AS e_rich FROM vals)"
        " SELECT degree AS k, n_rich, e_rich,"
        "  CAST((2000000 * e_rich) // (n_rich * (n_rich - 1)) AS BIGINT)"
        "   AS phi_ppm"
        " FROM curve WHERE cnt > 0 AND n_rich >= 2"
    )


def powerlaw_alpha_mle(degrees: DataFrame, d_min: int = 2) -> DataFrame:
    """[n_tail, d_min, alpha_micro] — discrete power-law exponent of
    the degree tail by the Clauset–Shalizi–Newman MLE (SIAM Rev. 2009
    eq. 3.7 approximation): alpha = 1 + n / Σ ln(d_i / (d_min − ½))
    over the tail d_i ≥ d_min. The model-based sibling of zipf_slope's
    OLS fit (OLS on log-binned ranks is the well-known biased
    estimator; the MLE is the one to report) — on an R-MAT/Kronecker
    graph this reads back the generator's heavy-tail exponent.

    Exactness: per DISTINCT degree d, L(d) = round(ln(d/(d_min−½))·10⁶)
    is one quantized log (tfidf convention); S = Σ cnt·L is an exact
    integer aggregation over the degree-distribution table (vocabulary
    of degrees — thousands of rows at any scale); alpha_micro =
    1e6 + round(n·1e12 / S) is one double division on the 1-row
    result. Plan: ONE degree-keyed count shuffle (the A8 diagnostics
    table), then a broadcast-sized sum — no windows, no sort."""
    xm = d_min - 0.5
    dist = (
        degrees.filter(F.col("degree") >= d_min)
        .groupBy("degree")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    l_q = F.round(
        F.log(F.col("degree").cast("double") / F.lit(xm)) * 1_000_000
    ).cast("long")
    agg = dist.agg(
        F.sum("cnt").cast("long").alias("n_tail"),
        F.sum(F.col("cnt").cast("decimal(38,0)") * l_q).alias("s"),
    )
    return agg.select(
        "n_tail",
        F.lit(d_min).cast("int").alias("d_min"),
        (
            F.lit(1_000_000)
            + F.round(
                F.col("n_tail").cast("double")
                * 1_000_000_000_000
                / F.col("s").cast("double")
            )
        )
        .cast("long")
        .alias("alpha_micro"),
    )


def powerlaw_alpha_mle_sql(clean_sql: str, d_min: int = 2) -> str:
    xm = d_min - 0.5
    return (
        f"WITH clean AS ({clean_sql}),"
        " deg AS (SELECT src AS vertex, COUNT(*) AS degree FROM clean"
        " GROUP BY src),"
        " dist AS (SELECT degree, CAST(COUNT(*) AS BIGINT) AS cnt"
        f" FROM deg WHERE degree >= {d_min} GROUP BY degree),"
        " agg AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tail,"
        " SUM(CAST(cnt AS HUGEINT)"
        f" * CAST(round(ln(CAST(degree AS DOUBLE) / {xm})"
        " * 1000000) AS BIGINT)) AS s FROM dist)"
        " SELECT n_tail,"
        f" CAST({d_min} AS INTEGER) AS d_min,"
        " CAST(1000000 + round(CAST(n_tail AS DOUBLE) * 1000000000000"
        " / CAST(s AS DOUBLE)) AS BIGINT) AS alpha_micro"
        " FROM agg"
    )

"""Relational OLAP operators over the TPC-H-shaped testdata tables.

Beyond the graph500 reference surface (the reference is a pure graph
engine — ``/root/reference/mpi/main.cc`` has no relational layer), but
first-class engine capability: these are the classic warehouse query
shapes — scan-heavy aggregation, star joins over broadcast dimensions,
fact-fact equi-joins, semi/anti joins, outer-join distributions, and
scalar-subquery broadcasts — that any user of a general analytics
engine runs daily.

Spark-first plan shapes (asserted in tests/test_plan_shapes.py):
  * small dimensions (region 5 rows, nation 25, supplier 100/sf,
    filtered customer segments) ship as broadcasts — the probe-side
    fact table never shuffles for them;
  * fact-side predicates (ship/order date ranges, discount bands,
    market segment) are simple column comparisons that push to the
    parquet scan (PushedFilters) with pruned ReadSchema;
  * the one unavoidable big-big join (orders ⋈ lineitem on orderkey)
    shuffles on the key both sides are naturally keyed by — at 100 TB
    bucketed storage (sources/io.py::write_bucketed_edges pattern)
    makes it exchange-free, and AQE handles skew.

Exactness: money in the testdata is cents-exact doubles, so every
aggregate here is an integer fixed-point sum — ``_c`` = cents, ``_e4``
= 1e-4 dollars (cents × discount points), ``_e6`` = 1e-6 dollars — all
order-free and cross-engine hash-exact; averages are integer ``div``
quantizations. No float arithmetic anywhere, hence no rounding-mode or
summation-order divergence between Spark and the DuckDB oracle.

Overflow headroom: sum_charge_e6 accumulates ~1e11 per line; int64
holds ~9.2e18, so the single-group total stays exact to ~9e7 lines per
(returnflag, linestatus) group — beyond that, rescale to _e4 (drop the
tax digit pair) or split the sum into two columns.
"""

from __future__ import annotations

from datetime import date, datetime, timedelta

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from graph500_spark.functions.eventtime import event_micros

DAY_US = 86_400_000_000


def date_us(y: int, m: int, d: int) -> int:
    """Wall-clock epoch micros of a calendar date — the literal form
    both engines compare TIMESTAMP(NTZ) columns against
    (functions/eventtime.py owns the column-side conversion)."""
    return (date(y, m, d) - date(1970, 1, 1)).days * DAY_US


def _ntz_lit(us: int) -> Column:
    """TIMESTAMP_NTZ literal at the given wall-clock epoch micros."""
    wall = datetime(1970, 1, 1) + timedelta(microseconds=us)
    return F.expr(f"TIMESTAMP_NTZ '{wall.isoformat(sep=' ')}'")


def ts_range_cond(
    df: DataFrame,
    col: str,
    lo_us: int | None = None,
    hi_us: int | None = None,
    lo_inclusive: bool = True,
    hi_inclusive: bool = False,
) -> Column:
    """Date-range condition on ``df[col]`` spelled BOTH ways: on epoch
    micros (exact, engine-neutral — what the oracle mirrors) AND
    redundantly on the raw column when it is parquet TIMESTAMP_NTZ.
    The micros form is a computed expression Catalyst cannot push; the
    redundant raw form is a plain column comparison that reaches the
    parquet scan's PushedFilters and skips row groups by min/max stats
    — at 100 TB, where fact data is naturally date-clustered, that
    skip IS the query time. Semantically the raw form is implied by
    the micros form (the conversion is monotone), so results are
    unchanged."""
    us = event_micros(df, col)
    cond = F.lit(True)
    if lo_us is not None:
        cond = cond & ((us >= lo_us) if lo_inclusive else (us > lo_us))
    if hi_us is not None:
        cond = cond & ((us <= hi_us) if hi_inclusive else (us < hi_us))
    if isinstance(df.schema[col].dataType, TimestampNTZType):
        raw = F.col(col)
        if lo_us is not None:
            lo = _ntz_lit(lo_us)
            cond = cond & ((raw >= lo) if lo_inclusive else (raw > lo))
        if hi_us is not None:
            hi = _ntz_lit(hi_us)
            cond = cond & ((raw <= hi) if hi_inclusive else (raw < hi))
    return cond


def _cents(col: str) -> F.Column:
    """Cents-exact integer money (testdata doubles are exact to 1e-9
    of a cent; round-half direction is therefore irrelevant)."""
    return F.round(F.col(col) * 100).cast("long")


def _cents_sql(col: str) -> str:
    return f"CAST(round({col} * 100) AS BIGINT)"


def _pct(col: str) -> F.Column:
    """Integer percent points (discount/tax are exact multiples of
    0.01)."""
    return F.round(F.col(col) * 100).cast("long")


def _lineitem_quantized(lineitem: DataFrame) -> DataFrame:
    """The shared quantized lineitem projection: [l_orderkey,
    l_suppkey, ship_us, qty, price_c, disc_pct, tax_pct]."""
    return lineitem.select(
        "l_orderkey",
        "l_suppkey",
        event_micros(lineitem, "l_shipdate").alias("ship_us"),
        F.round("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("price_c"),
        _pct("l_discount").alias("disc_pct"),
        _pct("l_tax").alias("tax_pct"),
    )


def _li_sql(lineitem_micros: str) -> str:
    return (
        "SELECT l_orderkey, l_suppkey,"
        f" {lineitem_micros} AS ship_us,"
        " CAST(round(l_quantity) AS BIGINT) AS qty,"
        f" {_cents_sql('l_extendedprice')} AS price_c,"
        f" {_cents_sql('l_discount')} AS disc_pct,"
        f" {_cents_sql('l_tax')} AS tax_pct"
        " FROM lineitem"
    )


_DUCK_LI = _li_sql("epoch_us(l_shipdate)")


# ---------------------------------------------------------------------------
# pricing_summary — the TPC-H Q1 shape: scan-heavy grouped aggregation
# ---------------------------------------------------------------------------

PRICING_CUTOFF_US = date_us(2001, 9, 1)


def pricing_summary(
    lineitem: DataFrame, cutoff_us: int = PRICING_CUTOFF_US
) -> DataFrame:
    """Pricing summary report: per (returnflag, linestatus) integer
    fixed-point sums and ``div``-quantized averages over all lines
    shipped up to the cutoff.

    Plan: ONE pruned parquet scan (7 columns), ship-date filter pushed
    to row-group stats (ts_range_cond), one hash aggregation with
    map-side partials — the whole-stage-codegen scan-agg pipeline; no
    join, no window. The canonical 100 TB scan benchmark shape."""
    src = lineitem.filter(
        ts_range_cond(
            lineitem, "l_shipdate", hi_us=cutoff_us, hi_inclusive=True
        )
    )
    li = src.select(
        "l_returnflag",
        "l_linestatus",
        F.round("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("price_c"),
        _pct("l_discount").alias("disc_pct"),
        _pct("l_tax").alias("tax_pct"),
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").alias("sum_qty"),
        F.sum("price_c").alias("sum_base_price_c"),
        F.sum(F.col("price_c") * (F.lit(100) - F.col("disc_pct")))
        .alias("sum_disc_price_e4"),
        F.sum(
            F.col("price_c")
            * (F.lit(100) - F.col("disc_pct"))
            * (F.lit(100) + F.col("tax_pct"))
        ).alias("sum_charge_e6"),
        F.sum("disc_pct").alias("sum_disc_pct"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price_c",
        "sum_disc_price_e4",
        "sum_charge_e6",
        F.expr("(sum_qty * 10000) div count_order").alias("avg_qty_e4"),
        F.expr("(sum_base_price_c * 100) div count_order")
        .alias("avg_price_e4"),
        F.expr("(sum_disc_pct * 100) div count_order").alias("avg_disc_e4"),
        "count_order",
    )


def pricing_summary_sql(cutoff_us: int = PRICING_CUTOFF_US) -> str:
    return (
        "WITH li AS (SELECT l_returnflag, l_linestatus,"
        " epoch_us(l_shipdate) AS ship_us,"
        " CAST(round(l_quantity) AS BIGINT) AS qty,"
        f" {_cents_sql('l_extendedprice')} AS price_c,"
        f" {_cents_sql('l_discount')} AS disc_pct,"
        f" {_cents_sql('l_tax')} AS tax_pct"
        f" FROM lineitem WHERE epoch_us(l_shipdate) <= {cutoff_us}),"
        " agg AS (SELECT l_returnflag, l_linestatus,"
        " CAST(SUM(qty) AS BIGINT) AS sum_qty,"
        " CAST(SUM(price_c) AS BIGINT) AS sum_base_price_c,"
        " CAST(SUM(price_c * (100 - disc_pct)) AS BIGINT)"
        " AS sum_disc_price_e4,"
        " CAST(SUM(price_c * (100 - disc_pct) * (100 + tax_pct)) AS BIGINT)"
        " AS sum_charge_e6,"
        " CAST(SUM(disc_pct) AS BIGINT) AS sum_disc_pct,"
        " CAST(COUNT(*) AS BIGINT) AS count_order"
        " FROM li GROUP BY 1, 2)"
        " SELECT l_returnflag, l_linestatus, sum_qty, sum_base_price_c,"
        " sum_disc_price_e4, sum_charge_e6,"
        " (sum_qty * 10000) // count_order AS avg_qty_e4,"
        " (sum_base_price_c * 100) // count_order AS avg_price_e4,"
        " (sum_disc_pct * 100) // count_order AS avg_disc_e4,"
        " count_order FROM agg"
    )


# ---------------------------------------------------------------------------
# discount_revenue — the TPC-H Q6 shape: pure filter + global aggregate
# ---------------------------------------------------------------------------

DISC_FROM_US = date_us(1998, 1, 1)
DISC_TO_US = date_us(1999, 1, 1)


def discount_revenue(lineitem: DataFrame) -> DataFrame:
    """Forecast-revenue-change probe: one row [revenue_e4, n_lines]
    over a ship-year × discount-band × quantity filter.

    Plan: 4-column pruned scan with EVERY predicate pushed to parquet
    (date range via ts_range_cond; the discount/quantity bands as
    redundant raw-column midpoint bounds — safe because the values
    are exact to 1e-9, implied by the exact integer predicates that
    remain on top), then a single partial+final aggregate — no shuffle
    of data rows at all, only the 1-row partials. The purest
    predicate-pushdown showcase."""
    src = lineitem.filter(
        ts_range_cond(lineitem, "l_shipdate", DISC_FROM_US, DISC_TO_US)
        # redundant pushable midpoint bounds (exact filters below)
        & (F.col("l_discount") >= 0.045)
        & (F.col("l_discount") <= 0.075)
        & (F.col("l_quantity") < 23.5)
    )
    li = src.select(
        F.round("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("price_c"),
        _pct("l_discount").alias("disc_pct"),
    ).filter(
        (F.col("disc_pct") >= F.lit(5))
        & (F.col("disc_pct") <= F.lit(7))
        & (F.col("qty") < F.lit(24))
    )
    return li.agg(
        F.sum(F.col("price_c") * F.col("disc_pct")).alias("revenue_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def discount_revenue_sql() -> str:
    return (
        "SELECT CAST(SUM(price_c * disc_pct) AS BIGINT) AS revenue_e4,"
        " CAST(COUNT(*) AS BIGINT) AS n_lines"
        " FROM (SELECT epoch_us(l_shipdate) AS ship_us,"
        " CAST(round(l_quantity) AS BIGINT) AS qty,"
        f" {_cents_sql('l_extendedprice')} AS price_c,"
        f" {_cents_sql('l_discount')} AS disc_pct FROM lineitem)"
        f" WHERE ship_us >= {DISC_FROM_US} AND ship_us < {DISC_TO_US}"
        " AND disc_pct BETWEEN 5 AND 7 AND qty < 24"
    )


# ---------------------------------------------------------------------------
# top_unshipped_orders — the TPC-H Q3 shape: dim-filtered fact-fact join
# ---------------------------------------------------------------------------

SHIP_CUT_US = date_us(1998, 6, 30)


def top_unshipped_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cut_us: int = SHIP_CUT_US,
    k: int = 10,
) -> DataFrame:
    """Top-k revenue among orders placed before the cut in one market
    segment whose lines shipped after it: [o_orderkey, revenue_e4,
    o_orderdate_us], (revenue desc, orderkey asc) deterministic order.

    Plan: the segment-filtered customer key set broadcasts onto the
    date-filtered orders scan (no shuffle); orders ⋈ lineitem is the
    one big-big shuffle on orderkey; top-k is a distributed
    TakeOrdered (per-partition heap + k-row driver merge), never a
    global sort."""
    cust = customer.filter(F.col("c_mktsegment") == segment).select(
        "c_custkey"
    )
    o = orders.filter(
        ts_range_cond(orders, "o_orderdate", hi_us=cut_us)
    ).select(
        "o_orderkey",
        "o_custkey",
        event_micros(orders, "o_orderdate").alias("o_orderdate_us"),
    )
    o = o.join(
        F.broadcast(cust), o.o_custkey == cust.c_custkey
    ).select("o_orderkey", "o_orderdate_us")
    li = _lineitem_quantized(
        lineitem.filter(
            ts_range_cond(
                lineitem, "l_shipdate", lo_us=cut_us, lo_inclusive=False
            )
        )
    )
    rev = (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .join(o, "o_orderkey")
        .groupBy("o_orderkey", "o_orderdate_us")
        .agg(
            F.sum(F.col("price_c") * (F.lit(100) - F.col("disc_pct")))
            .alias("revenue_e4")
        )
    )
    return (
        rev.select("o_orderkey", "revenue_e4", "o_orderdate_us")
        .orderBy(F.col("revenue_e4").desc(), F.col("o_orderkey"))
        .limit(k)
    )


def top_unshipped_orders_sql(
    segment: str = "BUILDING", cut_us: int = SHIP_CUT_US, k: int = 10
) -> str:
    return (
        f"WITH li AS ({_DUCK_LI}),"
        " o AS (SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us"
        " FROM orders JOIN customer ON o_custkey = c_custkey"
        f" WHERE c_mktsegment = '{segment}'"
        f" AND epoch_us(o_orderdate) < {cut_us})"
        " SELECT o.o_orderkey,"
        " CAST(SUM(price_c * (100 - disc_pct)) AS BIGINT) AS revenue_e4,"
        " o_orderdate_us"
        " FROM li JOIN o ON li.l_orderkey = o.o_orderkey"
        f" WHERE ship_us > {cut_us}"
        " GROUP BY o.o_orderkey, o_orderdate_us"
        f" ORDER BY revenue_e4 DESC, o.o_orderkey LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# order_priority_counts — the TPC-H Q4 shape: EXISTS semi-join
# ---------------------------------------------------------------------------

PRIO_FROM_US = date_us(1997, 1, 1)
PRIO_TO_US = date_us(1997, 4, 1)
LATE_DAYS = 60


def order_priority_counts(
    orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Late-shipment order counts by priority for one quarter:
    [o_orderpriority, n_orders] where an order counts iff ANY of its
    lines shipped more than LATE_DAYS after the order date.

    Plan: date-filtered orders LEFT SEMI join lineitem on orderkey
    with the lateness predicate as a residual condition — one shuffle,
    lineitem is never materialized past the match bit; then a tiny
    5-group aggregate."""
    o = orders.filter(
        ts_range_cond(orders, "o_orderdate", PRIO_FROM_US, PRIO_TO_US)
    ).select(
        "o_orderkey",
        "o_orderpriority",
        event_micros(orders, "o_orderdate").alias("o_us"),
    )
    li = lineitem.select(
        "l_orderkey", event_micros(lineitem, "l_shipdate").alias("ship_us")
    )
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.ship_us > o.o_us + F.lit(LATE_DAYS * DAY_US)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def order_priority_counts_sql() -> str:
    return (
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders"
        " FROM orders o"
        f" WHERE epoch_us(o_orderdate) >= {PRIO_FROM_US}"
        f" AND epoch_us(o_orderdate) < {PRIO_TO_US}"
        " AND EXISTS (SELECT 1 FROM lineitem l"
        " WHERE l.l_orderkey = o.o_orderkey"
        " AND epoch_us(l.l_shipdate) >"
        f" epoch_us(o.o_orderdate) + {LATE_DAYS * DAY_US})"
        " GROUP BY o_orderpriority"
    )


# ---------------------------------------------------------------------------
# customer_order_distribution — the TPC-H Q13 shape: outer-join histogram
# ---------------------------------------------------------------------------


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """Count-of-counts: [c_count, custdist] — how many customers
    placed exactly c_count orders, INCLUDING the zero-order customers
    (the reason this is an outer join, not a plain groupBy on
    orders).

    Plan: per-customer order counts are a map-side-combinable agg on
    orders alone (shuffle on custkey); the customer side then LEFT
    joins that small result — with the dim side broadcast when it
    fits — and the final histogram is a second tiny agg."""
    per_cust = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count(F.lit(1)).alias("c_count")
    )
    dist = (
        customer.select("c_custkey")
        .join(per_cust, "c_custkey", "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
    )
    return dist.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def customer_order_distribution_sql() -> str:
    return (
        "WITH per_cust AS (SELECT c_custkey,"
        " CAST(COUNT(o_orderkey) AS BIGINT) AS c_count"
        " FROM customer LEFT JOIN orders ON c_custkey = o_custkey"
        " GROUP BY c_custkey)"
        " SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist"
        " FROM per_cust GROUP BY c_count"
    )


# ---------------------------------------------------------------------------
# top_suppliers_by_revenue — the TPC-H Q15 shape: agg + scalar-max filter
# ---------------------------------------------------------------------------

SUPP_FROM_US = date_us(1997, 1, 1)
SUPP_TO_US = date_us(1997, 7, 1)


def top_suppliers_by_revenue(
    supplier: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """The supplier(s) with maximum half-year revenue: [s_suppkey,
    s_name, total_revenue_e4] — ties all returned (the spec shape; no
    arbitrary limit).

    Plan: one shuffle for per-supplier revenue; the global max is a
    1-row aggregate broadcast-cross-joined back (never a window over
    a single global partition); supplier names attach by broadcast."""
    li = _lineitem_quantized(
        lineitem.filter(
            ts_range_cond(lineitem, "l_shipdate", SUPP_FROM_US, SUPP_TO_US)
        )
    )
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.sum(F.col("price_c") * (F.lit(100) - F.col("disc_pct")))
        .alias("total_revenue_e4")
    )
    mx = rev.agg(F.max("total_revenue_e4").alias("max_rev"))
    top = rev.join(F.broadcast(mx)).filter(
        F.col("total_revenue_e4") == F.col("max_rev")
    )
    return top.join(
        F.broadcast(supplier.select("s_suppkey", "s_name")), "s_suppkey"
    ).select("s_suppkey", "s_name", "total_revenue_e4")


def top_suppliers_by_revenue_sql() -> str:
    return (
        f"WITH li AS ({_DUCK_LI}),"
        " rev AS (SELECT l_suppkey AS s_suppkey,"
        " CAST(SUM(price_c * (100 - disc_pct)) AS BIGINT)"
        " AS total_revenue_e4"
        f" FROM li WHERE ship_us >= {SUPP_FROM_US} AND ship_us < {SUPP_TO_US}"
        " GROUP BY l_suppkey)"
        " SELECT r.s_suppkey, s.s_name, r.total_revenue_e4"
        " FROM rev r JOIN supplier s ON r.s_suppkey = s.s_suppkey"
        " WHERE r.total_revenue_e4 = (SELECT MAX(total_revenue_e4) FROM rev)"
    )


# ---------------------------------------------------------------------------
# idle_rich_customers — the TPC-H Q22 shape: scalar broadcast + anti-join
# ---------------------------------------------------------------------------


RECENT_US = date_us(2000, 1, 1)


def idle_rich_customers(
    customer: DataFrame, orders: DataFrame, recent_us: int = RECENT_US
) -> DataFrame:
    """Per-nation count and balance of customers with above-average
    positive balance and NO orders since ``recent_us`` (lapsed
    high-value accounts): [c_nationkey, n_customers, total_acctbal_c].

    The above-average comparison is exact integer cross-multiplication
    (acctbal_c · n_pos > sum_pos_c) — no float average, no rounding
    divergence. Plan: 1-row positive-balance aggregate broadcast onto
    the customer scan, LEFT ANTI join against the date-filtered orders
    custkey set (pushed date filter; shuffle on custkey — at scale a
    bloom-filter pre-pass prunes the probe), final tiny per-nation
    agg."""
    c = customer.select(
        "c_custkey",
        F.col("c_nationkey").cast("long").alias("c_nationkey"),
        _cents("c_acctbal").alias("acctbal_c"),
    )
    pos = c.filter(F.col("acctbal_c") > 0).agg(
        F.sum("acctbal_c").alias("sum_pos_c"),
        F.count(F.lit(1)).alias("n_pos"),
    )
    rich = c.join(F.broadcast(pos)).filter(
        F.col("acctbal_c") * F.col("n_pos") > F.col("sum_pos_c")
    )
    recent = orders.filter(
        ts_range_cond(orders, "o_orderdate", lo_us=recent_us)
    ).select(F.col("o_custkey").alias("c_custkey"))
    idle = rich.join(recent, "c_custkey", "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("acctbal_c").alias("total_acctbal_c"),
    )


def idle_rich_customers_sql(recent_us: int = RECENT_US) -> str:
    return (
        "WITH c AS (SELECT c_custkey,"
        " CAST(c_nationkey AS BIGINT) AS c_nationkey,"
        f" {_cents_sql('c_acctbal')} AS acctbal_c FROM customer),"
        " pos AS (SELECT CAST(SUM(acctbal_c) AS BIGINT) AS sum_pos_c,"
        " CAST(COUNT(*) AS BIGINT) AS n_pos FROM c WHERE acctbal_c > 0)"
        " SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers,"
        " CAST(SUM(acctbal_c) AS BIGINT) AS total_acctbal_c"
        " FROM c, pos"
        " WHERE acctbal_c * n_pos > sum_pos_c"
        " AND NOT EXISTS (SELECT 1 FROM orders o"
        " WHERE o.o_custkey = c.c_custkey"
        f" AND epoch_us(o.o_orderdate) >= {recent_us})"
        " GROUP BY c_nationkey"
    )


# ---------------------------------------------------------------------------
# revenue_by_nation — the TPC-H Q5 shape: full star join
# ---------------------------------------------------------------------------

REV_FROM_US = date_us(1997, 1, 1)
REV_TO_US = date_us(1998, 1, 1)


def revenue_by_nation(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """Local-supplier revenue by nation within one region for one
    order year: [n_name, revenue_e4] — counts only lines whose
    supplier sits in the customer's own nation (the classic Q5
    local-commerce constraint).

    Plan: region→nation collapses to a ≤25-row broadcast; customer
    joins it broadcast-side and the filtered (custkey, nationkey)
    pairs broadcast onto the date-filtered orders scan; orders ⋈
    lineitem is the one big-big shuffle on orderkey; supplier (a
    dimension) broadcasts last with the same-nation equality as the
    join residual. At 100 TB the customer side outgrows broadcast and
    degrades to a custkey shuffle — exactly the plan AQE picks when
    the size estimate crosses the threshold."""
    n_in_region = (
        nation.join(
            F.broadcast(
                region.filter(F.col("r_name") == region_name).select(
                    "r_regionkey"
                )
            ),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select(
            F.col("n_nationkey").cast("long").alias("nationkey"), "n_name"
        )
    )
    cust = customer.select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("nationkey")
    ).join(F.broadcast(n_in_region), "nationkey")
    o = orders.filter(
        ts_range_cond(orders, "o_orderdate", REV_FROM_US, REV_TO_US)
    ).select("o_orderkey", "o_custkey")
    o_cust = o.join(
        F.broadcast(cust), o.o_custkey == cust.c_custkey
    ).select("o_orderkey", "nationkey", "n_name")
    li = _lineitem_quantized(lineitem).select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_suppkey",
        "price_c",
        "disc_pct",
    )
    supp = supplier.select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").cast("long").alias("s_nationkey"),
    )
    joined = (
        li.join(o_cust, "o_orderkey")
        .join(F.broadcast(supp), "l_suppkey")
        .filter(F.col("s_nationkey") == F.col("nationkey"))
    )
    return joined.groupBy("n_name").agg(
        F.sum(F.col("price_c") * (F.lit(100) - F.col("disc_pct")))
        .alias("revenue_e4")
    )


def revenue_by_nation_sql(region_name: str = "ASIA") -> str:
    return (
        f"WITH li AS ({_DUCK_LI})"
        " SELECT n_name,"
        " CAST(SUM(price_c * (100 - disc_pct)) AS BIGINT) AS revenue_e4"
        " FROM li"
        " JOIN orders ON li.l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN supplier ON li.l_suppkey = s_suppkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey"
        f" WHERE r_name = '{region_name}'"
        " AND s_nationkey = c_nationkey"
        f" AND epoch_us(o_orderdate) >= {REV_FROM_US}"
        f" AND epoch_us(o_orderdate) < {REV_TO_US}"
        " GROUP BY n_name"
    )


# ---------------------------------------------------------------------------
# promo_revenue_share — the TPC-H Q14 shape: conditional-aggregate ratio
# ---------------------------------------------------------------------------

PROMO_FROM_US = date_us(1998, 1, 1)
PROMO_TO_US = date_us(1999, 1, 1)


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Share of one ship-year's revenue coming from PROMO-type parts:
    one row [promo_revenue_e4, total_revenue_e4, promo_share_e6] with
    the share an integer ppm quantization ((promo · 1e6) div total).

    Plan: date-filtered lineitem scan, part dimension broadcast
    (2-column projection), ONE aggregate computing both the
    conditional and the unconditional sum — the CASE-inside-SUM idiom
    that avoids scanning twice."""
    p = part.select(
        F.col("p_partkey").alias("l_partkey"),
        (F.col("p_type") == "PROMO").alias("is_promo"),
    )
    li = lineitem.filter(
        ts_range_cond(lineitem, "l_shipdate", PROMO_FROM_US, PROMO_TO_US)
    ).select(
        F.col("l_partkey"),
        _cents("l_extendedprice").alias("price_c"),
        _pct("l_discount").alias("disc_pct"),
    )
    joined = li.join(F.broadcast(p), "l_partkey")
    rev = F.col("price_c") * (F.lit(100) - F.col("disc_pct"))
    agg = joined.agg(
        F.coalesce(
            F.sum(F.when(F.col("is_promo"), rev).otherwise(F.lit(0))),
            F.lit(0),
        ).alias("promo_revenue_e4"),
        F.coalesce(F.sum(rev), F.lit(0)).alias("total_revenue_e4"),
    )
    return agg.select(
        "promo_revenue_e4",
        "total_revenue_e4",
        F.expr(
            "CASE WHEN total_revenue_e4 = 0 THEN 0"
            " ELSE (promo_revenue_e4 * 1000000) div total_revenue_e4 END"
        ).alias("promo_share_e6"),
    )


def promo_revenue_share_sql() -> str:
    return (
        "WITH j AS (SELECT"
        f" {_cents_sql('l_extendedprice')} AS price_c,"
        f" {_cents_sql('l_discount')} AS disc_pct,"
        " p_type = 'PROMO' AS is_promo"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        f" WHERE epoch_us(l_shipdate) >= {PROMO_FROM_US}"
        f" AND epoch_us(l_shipdate) < {PROMO_TO_US}),"
        " agg AS (SELECT"
        " CAST(COALESCE(SUM(CASE WHEN is_promo THEN"
        " price_c * (100 - disc_pct) ELSE 0 END), 0) AS BIGINT)"
        " AS promo_revenue_e4,"
        " CAST(COALESCE(SUM(price_c * (100 - disc_pct)), 0) AS BIGINT)"
        " AS total_revenue_e4 FROM j)"
        " SELECT promo_revenue_e4, total_revenue_e4,"
        " CASE WHEN total_revenue_e4 = 0 THEN 0"
        " ELSE (promo_revenue_e4 * 1000000) // total_revenue_e4 END"
        " AS promo_share_e6 FROM agg"
    )


# ---------------------------------------------------------------------------
# large_orders — the TPC-H Q18 shape: HAVING-filtered agg joined to facts
# ---------------------------------------------------------------------------

LARGE_ORDER_MIN_QTY = 150


def large_orders(
    orders: DataFrame, lineitem: DataFrame,
    min_qty: int = LARGE_ORDER_MIN_QTY,
) -> DataFrame:
    """Orders whose total line quantity exceeds ``min_qty``:
    [o_orderkey, o_custkey, o_orderdate_us, total_price_c, total_qty].

    Plan: per-order quantity agg on lineitem alone (map-side partials
    on the natural orderkey clustering), HAVING filter shrinks the
    result by ~50× BEFORE the join back to orders — aggregate-then-
    join, never join-then-aggregate."""
    big = (
        lineitem.select(
            "l_orderkey", F.round("l_quantity").cast("long").alias("qty")
        )
        .groupBy("l_orderkey")
        .agg(F.sum("qty").alias("total_qty"))
        .filter(F.col("total_qty") > min_qty)
        .withColumnRenamed("l_orderkey", "o_orderkey")
    )
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        event_micros(orders, "o_orderdate").alias("o_orderdate_us"),
        _cents("o_totalprice").alias("total_price_c"),
    )
    return o.join(big, "o_orderkey").select(
        "o_orderkey", "o_custkey", "o_orderdate_us", "total_price_c",
        "total_qty",
    )


def large_orders_sql(min_qty: int = LARGE_ORDER_MIN_QTY) -> str:
    return (
        "WITH big AS (SELECT l_orderkey,"
        " CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)"
        " AS total_qty"
        " FROM lineitem GROUP BY l_orderkey"
        f" HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > {min_qty})"
        " SELECT o_orderkey, o_custkey,"
        " epoch_us(o_orderdate) AS o_orderdate_us,"
        f" {_cents_sql('o_totalprice')} AS total_price_c, total_qty"
        " FROM orders JOIN big ON o_orderkey = l_orderkey"
    )


# ---------------------------------------------------------------------------
# small_quantity_revenue — the TPC-H Q17 shape: per-group correlated
# threshold (lines far below their part's average quantity)
# ---------------------------------------------------------------------------

SMALL_QTY_BRAND = "Brand#1"


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = SMALL_QTY_BRAND
) -> DataFrame:
    """Revenue locked in small-quantity lines of one brand's parts:
    one row [revenue_c, n_lines] counting lines with qty < 20% of
    their part's average quantity.

    The correlated threshold is exact integer cross-multiplication:
    qty < sum_qty/(5·n) ⟺ 5·qty·n < sum_qty — no float average.
    Plan: brand-filtered part broadcast prunes lineitem first; the
    per-part (n, sum) aggregate of the SAME pruned slice broadcasts
    back (aggregate of a broadcast-pruned set is small by
    construction); both joins are partkey-local."""
    p = part.filter(F.col("p_brand") == brand).select(
        F.col("p_partkey").alias("l_partkey")
    )
    li = lineitem.select(
        "l_partkey",
        F.round("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("price_c"),
    ).join(F.broadcast(p), "l_partkey")
    per_part = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lines_part"),
        F.sum("qty").alias("sum_qty_part"),
    )
    small = li.join(F.broadcast(per_part), "l_partkey").filter(
        F.col("qty") * 5 * F.col("n_lines_part") < F.col("sum_qty_part")
    )
    return small.agg(
        F.coalesce(F.sum("price_c"), F.lit(0)).alias("revenue_c"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def small_quantity_revenue_sql(brand: str = SMALL_QTY_BRAND) -> str:
    return (
        "WITH li AS (SELECT l_partkey,"
        " CAST(round(l_quantity) AS BIGINT) AS qty,"
        f" {_cents_sql('l_extendedprice')} AS price_c"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        f" WHERE p_brand = '{brand}'),"
        " per_part AS (SELECT l_partkey,"
        " CAST(COUNT(*) AS BIGINT) AS n_lines_part,"
        " CAST(SUM(qty) AS BIGINT) AS sum_qty_part"
        " FROM li GROUP BY l_partkey)"
        " SELECT CAST(COALESCE(SUM(price_c), 0) AS BIGINT) AS revenue_c,"
        " CAST(COUNT(*) AS BIGINT) AS n_lines"
        " FROM li JOIN per_part USING (l_partkey)"
        " WHERE qty * 5 * n_lines_part < sum_qty_part"
    )


# ---------------------------------------------------------------------------
# shipping_volume — the TPC-H Q7 shape: nation-pair volume by year
# ---------------------------------------------------------------------------

VOLUME_NATION_A = "NATION_1"
VOLUME_NATION_B = "NATION_2"


def shipping_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = VOLUME_NATION_A,
    nation_b: str = VOLUME_NATION_B,
) -> DataFrame:
    """Trade volume between two nations, both directions, by ship
    year: [supp_nation, cust_nation, l_year, revenue_e4].

    Plan: nation is a broadcast twice (supplier side / customer
    side); the pair condition ((a,b) or (b,a)) lands as a residual on
    the already-filtered broadcast joins; orders ⋈ lineitem is the
    one big-big shuffle. Year extraction is calendar year() — the
    same wall-clock function in both engines."""
    from graph500_spark.functions.eventtime import event_time

    n2 = nation.filter(
        F.col("n_name").isin(nation_a, nation_b)
    ).select(F.col("n_nationkey").cast("long").alias("nk"), "n_name")
    supp = supplier.select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").cast("long").alias("nk"),
    ).join(F.broadcast(n2), "nk").select(
        "l_suppkey", F.col("n_name").alias("supp_nation")
    )
    cust = customer.select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("nk")
    ).join(F.broadcast(n2), "nk").select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    o = orders.select("o_orderkey", "o_custkey").join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "cust_nation")
    li = lineitem.select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_suppkey",
        F.year(event_time(lineitem, "l_shipdate")).cast("long")
        .alias("l_year"),
        _cents("l_extendedprice").alias("price_c"),
        _pct("l_discount").alias("disc_pct"),
    )
    j = (
        li.join(F.broadcast(supp), "l_suppkey")
        .join(o, "o_orderkey")
        .filter(
            (
                (F.col("supp_nation") == nation_a)
                & (F.col("cust_nation") == nation_b)
            )
            | (
                (F.col("supp_nation") == nation_b)
                & (F.col("cust_nation") == nation_a)
            )
        )
    )
    return j.groupBy("supp_nation", "cust_nation", "l_year").agg(
        F.sum(F.col("price_c") * (F.lit(100) - F.col("disc_pct")))
        .alias("revenue_e4")
    )


def shipping_volume_sql(
    nation_a: str = VOLUME_NATION_A, nation_b: str = VOLUME_NATION_B
) -> str:
    return (
        "SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,"
        " CAST(year(l_shipdate) AS BIGINT) AS l_year,"
        f" CAST(SUM({_cents_sql('l_extendedprice')}"
        f" * (100 - {_cents_sql('l_discount')})) AS BIGINT) AS revenue_e4"
        " FROM lineitem"
        " JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN nation ns ON s_nationkey = ns.n_nationkey"
        " JOIN nation nc ON c_nationkey = nc.n_nationkey"
        f" WHERE (ns.n_name = '{nation_a}' AND nc.n_name = '{nation_b}')"
        f" OR (ns.n_name = '{nation_b}' AND nc.n_name = '{nation_a}')"
        " GROUP BY 1, 2, 3"
    )


# ---------------------------------------------------------------------------
# supplier_part_counts — the TPC-H Q16 shape: exact count-distinct per
# group with a dimension exclusion
# ---------------------------------------------------------------------------

SPC_MAX_SIZE = 10
SPC_EXCLUDED_BRAND = "Brand#5"


def supplier_part_counts(
    part: DataFrame, lineitem: DataFrame,
    max_size: int = SPC_MAX_SIZE,
    excluded_brand: str = SPC_EXCLUDED_BRAND,
) -> DataFrame:
    """How many distinct suppliers ship each (brand, type, size)
    combination of small parts, excluding one brand:
    [p_brand, p_type, p_size, supplier_cnt]. The supplier–part
    relation comes from lineitem (the testdata has no partsupp).

    Plan: the filtered part dimension broadcasts onto a 2-column
    lineitem projection; exact COUNT(DISTINCT) runs as Spark's
    two-phase expand-aggregate (partial distinct per partition, one
    shuffle on the group key)."""
    p = part.filter(
        (F.col("p_size") <= max_size)
        & (F.col("p_brand") != excluded_brand)
    ).select(
        F.col("p_partkey").alias("l_partkey"),
        "p_brand",
        "p_type",
        F.col("p_size").cast("long").alias("p_size"),
    )
    li = lineitem.select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), "l_partkey")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def supplier_part_counts_sql(
    max_size: int = SPC_MAX_SIZE,
    excluded_brand: str = SPC_EXCLUDED_BRAND,
) -> str:
    return (
        "SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,"
        " CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        f" WHERE p_size <= {max_size} AND p_brand <> '{excluded_brand}'"
        " GROUP BY 1, 2, 3"
    )


# ---------------------------------------------------------------------------
# revenue_rollup — hierarchical subtotals: GROUP BY ROLLUP on the star
# ---------------------------------------------------------------------------


def revenue_rollup(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """Revenue at three grains in one pass — (nation, year), per-nation
    subtotal, grand total: [nation_grp, year_grp, revenue_e4, n_lines]
    with 'ALL'/-1 as the subtotal markers (GROUPING()-normalized so the
    subtotal rows are engine-portable, not NULL-ambiguous).

    Plan: ROLLUP is Spark's Expand + single hash aggregate — one scan
    feeds all three grains (the continuous-aggregate shape
    streaming/windows.py uses for time); nation broadcasts onto
    customer, customer onto orders, orders ⋈ lineitem is the one
    shuffle."""
    from graph500_spark.functions.eventtime import event_time

    n = nation.select(
        F.col("n_nationkey").cast("long").alias("nk"), "n_name"
    )
    cust = customer.select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("nk")
    ).join(F.broadcast(n), "nk")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.year(event_time(orders, "o_orderdate")).cast("long")
        .alias("o_year"),
    ).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "o_year", "n_name")
    li = lineitem.select(
        F.col("l_orderkey").alias("o_orderkey"),
        _cents("l_extendedprice").alias("price_c"),
        _pct("l_discount").alias("disc_pct"),
    )
    j = li.join(o, "o_orderkey")
    return (
        j.rollup("n_name", "o_year")
        .agg(
            F.sum(F.col("price_c") * (F.lit(100) - F.col("disc_pct")))
            .alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
            F.grouping("n_name").alias("g_n"),
            F.grouping("o_year").alias("g_y"),
        )
        .select(
            F.when(F.col("g_n") == 1, F.lit("ALL"))
            .otherwise(F.col("n_name"))
            .alias("nation_grp"),
            F.when(F.col("g_y") == 1, F.lit(-1))
            .otherwise(F.col("o_year"))
            .cast("long")
            .alias("year_grp"),
            "revenue_e4",
            "n_lines",
        )
    )


def revenue_rollup_sql() -> str:
    return (
        "WITH j AS (SELECT n_name,"
        " CAST(year(o_orderdate) AS BIGINT) AS o_year,"
        f" {_cents_sql('l_extendedprice')} AS price_c,"
        f" {_cents_sql('l_discount')} AS disc_pct"
        " FROM lineitem"
        " JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey)"
        " SELECT CASE WHEN GROUPING(n_name) = 1 THEN 'ALL' ELSE n_name END"
        " AS nation_grp,"
        " CAST(CASE WHEN GROUPING(o_year) = 1 THEN -1 ELSE o_year END"
        " AS BIGINT) AS year_grp,"
        " CAST(SUM(price_c * (100 - disc_pct)) AS BIGINT) AS revenue_e4,"
        " CAST(COUNT(*) AS BIGINT) AS n_lines"
        " FROM j GROUP BY ROLLUP(n_name, o_year)"
    )


# ---------------------------------------------------------------------------
# lineitem_correlations — pairwise Pearson from exact integer moments
# ---------------------------------------------------------------------------


def lineitem_correlations(lineitem: DataFrame) -> DataFrame:
    """Pairwise Pearson correlations over (quantity, price, discount):
    [pair, corr] — the numeric-profiling staple.

    Engineering: all ten moment sums (n, Σx, Σxy, Σx² for each pair)
    are EXACT integer aggregates in one pass; each correlation is then
    a single closed-form double expression over those integers —
    deterministic cross-engine because the operands are identical
    exact integers (same discipline as degree_assortativity). Price
    is quantized to whole dollars (price_c div 100) so Σp² stays in
    int64 headroom: 1.1e5² · 6e5 rows ≈ 7e15 at sf0.1; rescale the
    quantization, not the algorithm, for bigger row counts."""
    li = lineitem.select(
        F.round("l_quantity").cast("long").alias("q"),
        # integer div, NOT float /100: a float quotient that lands a
        # hair under an exact integer would truncate differently than
        # DuckDB's integer //
        F.expr(
            "cast(round(l_extendedprice * 100) as bigint) div 100"
        ).alias("p"),
        _pct("l_discount").alias("d"),
    )
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum("p").alias("sp"),
        F.sum("d").alias("sd"),
        F.sum(F.col("q") * F.col("q")).alias("sqq"),
        F.sum(F.col("p") * F.col("p")).alias("spp"),
        F.sum(F.col("d") * F.col("d")).alias("sdd"),
        F.sum(F.col("q") * F.col("p")).alias("sqp"),
        F.sum(F.col("q") * F.col("d")).alias("sqd"),
        F.sum(F.col("p") * F.col("d")).alias("spd"),
    )

    # the closed forms run in DOUBLE: n·Σx² exceeds int64 at sf0.1
    # (1.4e19), and IEEE arithmetic over identical exact-integer
    # operands is deterministic cross-engine — the same discipline as
    # degree_assortativity's final expression
    def corr(sxy, sx, sy, sxx, syy):
        def d(x):
            return f"cast({x} as double)"

        return (
            f"round(({d('n')} * {d(sxy)} - {d(sx)} * {d(sy)}) /"
            f" (sqrt({d('n')} * {d(sxx)} - {d(sx)} * {d(sx)})"
            f" * sqrt({d('n')} * {d(syy)} - {d(sy)} * {d(sy)})), 6)"
        )

    return m.selectExpr(
        f"stack(3,"
        f" 'qty_price', {corr('sqp', 'sq', 'sp', 'sqq', 'spp')},"
        f" 'qty_disc', {corr('sqd', 'sq', 'sd', 'sqq', 'sdd')},"
        f" 'price_disc', {corr('spd', 'sp', 'sd', 'spp', 'sdd')})"
        " AS (pair, corr)"
    )


def lineitem_correlations_sql() -> str:
    def corr(sxy, sx, sy, sxx, syy):
        def d(x):
            return f"CAST({x} AS DOUBLE)"

        return (
            f"round(({d('n')} * {d(sxy)} - {d(sx)} * {d(sy)}) /"
            f" (sqrt({d('n')} * {d(sxx)} - {d(sx)} * {d(sx)})"
            f" * sqrt({d('n')} * {d(syy)} - {d(sy)} * {d(sy)})), 6)"
        )

    return (
        "WITH li AS (SELECT CAST(round(l_quantity) AS BIGINT) AS q,"
        f" {_cents_sql('l_extendedprice')} // 100 AS p,"
        f" {_cents_sql('l_discount')} AS d FROM lineitem),"
        " m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(p) AS BIGINT) AS sp,"
        " CAST(SUM(d) AS BIGINT) AS sd,"
        " CAST(SUM(q * q) AS BIGINT) AS sqq,"
        " CAST(SUM(p * p) AS BIGINT) AS spp,"
        " CAST(SUM(d * d) AS BIGINT) AS sdd,"
        " CAST(SUM(q * p) AS BIGINT) AS sqp,"
        " CAST(SUM(q * d) AS BIGINT) AS sqd,"
        " CAST(SUM(p * d) AS BIGINT) AS spd FROM li)"
        " SELECT 'qty_price' AS pair,"
        f" {corr('sqp', 'sq', 'sp', 'sqq', 'spp')} AS corr FROM m"
        " UNION ALL SELECT 'qty_disc',"
        f" {corr('sqd', 'sq', 'sd', 'sqq', 'sdd')} FROM m"
        " UNION ALL SELECT 'price_disc',"
        f" {corr('spd', 'sp', 'sd', 'spp', 'sdd')} FROM m"
    )


# ---------------------------------------------------------------------------
# market_share — the TPC-H Q8 shape: national market share as a
# conditional-aggregate ratio over a 5-table dimension funnel
# ---------------------------------------------------------------------------

MS_FROM_US = date_us(1999, 1, 1)
MS_TO_US = date_us(2001, 1, 1)
MS_REGION = "ASIA"
MS_NATION = "NATION_3"
MS_TYPE = "PROMO"


def market_share(
    part: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = MS_REGION,
    supp_nation: str = MS_NATION,
    p_type: str = MS_TYPE,
) -> DataFrame:
    """Share of one nation's suppliers in a region's market for a part
    type, by order year: [o_year, nation_revenue_e4, total_revenue_e4,
    share_ppm].  share_ppm is half-up integer parts-per-million — the
    float division in the classic formulation is replaced by one exact
    integer rounding so the value hash is engine-neutral.

    Plan shape: part (type-filtered), supplier+nation, and the
    region→nation→customer funnel are all broadcast dimensions; the
    only big-big shuffle is lineitem ⋈ orders on orderkey.  The
    numerator/denominator split is a conditional SUM over one pass —
    no second scan, no self-join.  At 100 TB the part side may exceed
    broadcast and AQE degrades it to a shuffle join on partkey; the
    conditional-aggregate stays single-pass either way."""
    from graph500_spark.functions.eventtime import event_time

    p = part.filter(F.col("p_type") == p_type).select(
        F.col("p_partkey").alias("l_partkey")
    )
    n_region = (
        nation.join(
            F.broadcast(
                region.filter(F.col("r_name") == region_name).select(
                    "r_regionkey"
                )
            ),
            nation.n_regionkey == F.col("r_regionkey"),
        ).select(F.col("n_nationkey").cast("long").alias("nk"))
    )
    cust = customer.select(
        "c_custkey", F.col("c_nationkey").cast("long").alias("nk")
    ).join(F.broadcast(n_region), "nk").select("c_custkey")
    o = orders.filter(
        ts_range_cond(orders, "o_orderdate", MS_FROM_US, MS_TO_US)
    ).select(
        "o_orderkey",
        "o_custkey",
        F.year(event_time(orders, "o_orderdate")).cast("long")
        .alias("o_year"),
    ).join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).select("o_orderkey", "o_year")
    supp = supplier.select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").cast("long").alias("s_nk"),
    ).join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").cast("long").alias("s_nk"),
                F.col("n_name").alias("s_nation"),
            )
        ),
        "s_nk",
    ).select("l_suppkey", "s_nation")
    li = lineitem.select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_partkey",
        "l_suppkey",
        _cents("l_extendedprice").alias("price_c"),
        _pct("l_discount").alias("disc_pct"),
    ).join(F.broadcast(p), "l_partkey")
    vol = (
        li.join(o, "o_orderkey")
        .join(F.broadcast(supp), "l_suppkey")
        .select(
            "o_year",
            "s_nation",
            (F.col("price_c") * (F.lit(100) - F.col("disc_pct")))
            .alias("vol_e4"),
        )
    )
    agg = vol.groupBy("o_year").agg(
        F.sum(
            F.when(F.col("s_nation") == supp_nation, F.col("vol_e4"))
            .otherwise(F.lit(0))
        ).alias("nation_revenue_e4"),
        F.sum("vol_e4").alias("total_revenue_e4"),
    )
    return agg.select(
        "o_year",
        "nation_revenue_e4",
        "total_revenue_e4",
        F.expr(
            "(nation_revenue_e4 * 1000000 + total_revenue_e4 div 2)"
            " div total_revenue_e4"
        ).alias("share_ppm"),
    )


def market_share_sql(
    region_name: str = MS_REGION,
    supp_nation: str = MS_NATION,
    p_type: str = MS_TYPE,
) -> str:
    return (
        "WITH vol AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,"
        " ns.n_name AS s_nation,"
        f" {_cents_sql('l_extendedprice')}"
        f" * (100 - {_cents_sql('l_discount')}) AS vol_e4"
        " FROM lineitem"
        " JOIN part ON l_partkey = p_partkey"
        " JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN nation nc ON c_nationkey = nc.n_nationkey"
        " JOIN region ON nc.n_regionkey = r_regionkey"
        " JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN nation ns ON s_nationkey = ns.n_nationkey"
        f" WHERE r_name = '{region_name}' AND p_type = '{p_type}'"
        f" AND epoch_us(o_orderdate) >= {MS_FROM_US}"
        f" AND epoch_us(o_orderdate) < {MS_TO_US}),"
        " agg AS (SELECT o_year,"
        " CAST(SUM(CASE WHEN s_nation = "
        f"'{supp_nation}' THEN vol_e4 ELSE 0 END) AS BIGINT)"
        " AS nation_revenue_e4,"
        " CAST(SUM(vol_e4) AS BIGINT) AS total_revenue_e4"
        " FROM vol GROUP BY o_year)"
        " SELECT o_year, nation_revenue_e4, total_revenue_e4,"
        " CAST((nation_revenue_e4 * 1000000 + total_revenue_e4 // 2)"
        " // total_revenue_e4 AS BIGINT) AS share_ppm FROM agg"
    )


# ---------------------------------------------------------------------------
# product_type_profit — the TPC-H Q9 shape: profit by supplier nation
# and year for a part-name family (supply cost proxied at 80% of the
# part's retail price — the testdata has no partsupp table)
# ---------------------------------------------------------------------------

PTP_NAME_TOKEN = "widget"


def product_type_profit(
    part: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_token: str = PTP_NAME_TOKEN,
) -> DataFrame:
    """Profit by supplier nation and order year over parts whose name
    contains ``name_token``: [n_name, o_year, profit_e4], where
    profit_e4 = Σ price_c·(100−disc) − qty·retail_c·80 (e4 dollar
    units; cost = 80% of retail, all-integer so the hash is exact).

    Plan: part (name-filtered) and supplier⋈nation broadcast;
    lineitem ⋈ orders on orderkey is the one big shuffle; the profit
    expression folds into the scan projection.  This is the classic
    star-join profit rollup — at 100 TB the same plan holds with the
    part dimension bucketed if it outgrows broadcast."""
    from graph500_spark.functions.eventtime import event_time

    p = part.filter(
        F.col("p_name").contains(name_token)
    ).select(
        F.col("p_partkey").alias("l_partkey"),
        _cents("p_retailprice").alias("retail_c"),
    )
    supp = supplier.select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").cast("long").alias("s_nk"),
    ).join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").cast("long").alias("s_nk"), "n_name"
            )
        ),
        "s_nk",
    ).select("l_suppkey", "n_name")
    o = orders.select(
        "o_orderkey",
        F.year(event_time(orders, "o_orderdate")).cast("long")
        .alias("o_year"),
    )
    li = lineitem.select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_partkey",
        "l_suppkey",
        F.round("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("price_c"),
        _pct("l_discount").alias("disc_pct"),
    )
    j = (
        li.join(F.broadcast(p), "l_partkey")
        .join(F.broadcast(supp), "l_suppkey")
        .join(o, "o_orderkey")
    )
    return j.groupBy("n_name", "o_year").agg(
        F.sum(
            F.col("price_c") * (F.lit(100) - F.col("disc_pct"))
            - F.col("qty") * F.col("retail_c") * F.lit(80)
        ).alias("profit_e4")
    )


def product_type_profit_sql(name_token: str = PTP_NAME_TOKEN) -> str:
    return (
        "SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,"
        f" CAST(SUM({_cents_sql('l_extendedprice')}"
        f" * (100 - {_cents_sql('l_discount')})"
        " - CAST(round(l_quantity) AS BIGINT)"
        f" * {_cents_sql('p_retailprice')} * 80) AS BIGINT) AS profit_e4"
        " FROM lineitem"
        " JOIN part ON l_partkey = p_partkey"
        " JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN nation ON s_nationkey = n_nationkey"
        " JOIN orders ON l_orderkey = o_orderkey"
        f" WHERE p_name LIKE '%{name_token}%'"
        " GROUP BY n_name, o_year"
    )


# ---------------------------------------------------------------------------
# returned_items — the TPC-H Q10 shape: top-k revenue-losing customers
# over one quarter of returned lineitems
# ---------------------------------------------------------------------------

RI_FROM_US = date_us(2000, 10, 1)
RI_TO_US = date_us(2001, 1, 1)
RI_TOP_K = 20


def returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    from_us: int = RI_FROM_US,
    to_us: int = RI_TO_US,
    top_k: int = RI_TOP_K,
) -> DataFrame:
    """Top-k customers by revenue lost to returns in one order
    quarter: [c_custkey, c_name, n_name, acctbal_c, revenue_e4],
    ordered by revenue desc with custkey as the deterministic
    tiebreak (top-k must be a well-defined row SET for the value
    hash, not just a well-defined ordering).

    Plan: date-filtered orders ⋈ returned lineitems is the big-big
    shuffle; the customer⋈nation dimension broadcasts onto the
    aggregated (custkey, revenue) result — aggregate FIRST, widen
    with dimension columns after, so the shuffle carries two columns
    instead of five.  TakeOrderedAndProject caps the sort at k rows
    per partition — no global sort materializes."""
    o = orders.filter(
        ts_range_cond(orders, "o_orderdate", from_us, to_us)
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o_orderkey"),
        _cents("l_extendedprice").alias("price_c"),
        _pct("l_discount").alias("disc_pct"),
    )
    rev = (
        li.join(o, "o_orderkey")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.col("price_c") * (F.lit(100) - F.col("disc_pct"))
            ).alias("revenue_e4")
        )
    )
    cust = customer.select(
        F.col("c_custkey"),
        "c_name",
        F.col("c_nationkey").cast("long").alias("nk"),
        _cents("c_acctbal").alias("acctbal_c"),
    ).join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").cast("long").alias("nk"), "n_name"
            )
        ),
        "nk",
    )
    return (
        rev.join(
            F.broadcast(cust), rev.o_custkey == cust.c_custkey
        )
        .select("c_custkey", "c_name", "n_name", "acctbal_c", "revenue_e4")
        .orderBy(F.col("revenue_e4").desc(), F.col("c_custkey"))
        .limit(top_k)
    )


def returned_items_sql(
    from_us: int = RI_FROM_US,
    to_us: int = RI_TO_US,
    top_k: int = RI_TOP_K,
) -> str:
    return (
        "SELECT c_custkey, c_name, n_name,"
        f" {_cents_sql('c_acctbal')} AS acctbal_c,"
        f" CAST(SUM({_cents_sql('l_extendedprice')}"
        f" * (100 - {_cents_sql('l_discount')})) AS BIGINT) AS revenue_e4"
        " FROM lineitem"
        " JOIN orders ON l_orderkey = o_orderkey"
        " JOIN customer ON o_custkey = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey"
        " WHERE l_returnflag = 'R'"
        f" AND epoch_us(o_orderdate) >= {from_us}"
        f" AND epoch_us(o_orderdate) < {to_us}"
        " GROUP BY c_custkey, c_name, n_name, acctbal_c"
        f" ORDER BY revenue_e4 DESC, c_custkey LIMIT {top_k}"
    )


# ---------------------------------------------------------------------------
# disjunctive_revenue — the TPC-H Q19 shape: OR-of-ANDs predicate
# spanning fact and dimension columns
# ---------------------------------------------------------------------------

DR_BRANCHES = (
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#34", 15, 20, 30),
)


def disjunctive_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    branches: tuple = DR_BRANCHES,
) -> DataFrame:
    """Revenue over three (brand, max-size, qty-range) OR-branches:
    one row [revenue_e4].  The disjunction spans part (brand, size)
    and lineitem (quantity) columns — the shape that punishes engines
    which can't push a per-table residual of an OR tree.

    Plan: the per-table implied predicates ARE pushable — brand ∈
    {..} ∧ size ≤ max(sizes) reaches the part scan and qty ≤
    max(highs) reaches the lineitem scan (Catalyst derives them from
    the OR tree); the exact mixed-table disjunction evaluates as the
    broadcast-join residual.  One row out, no shuffle beyond the
    final 1-row aggregate."""
    p = part.select("p_partkey", "p_brand", "p_size")
    # The exact disjunction below references the quantized qty column,
    # which Catalyst cannot push to the scan.  Spell the implied raw
    # bound redundantly (ts_range_cond's both-ways discipline):
    # round(q) ∈ [lo, hi] ⇒ q ∈ [min_lo − 0.5, max_hi + 0.5], so this
    # plain-column range reaches PushedFilters and skips row groups
    # without changing results.
    qty_lo = min(b[2] for b in branches) - 0.5
    qty_hi = max(b[3] for b in branches) + 0.5
    li = lineitem.filter(
        F.col("l_quantity").between(qty_lo, qty_hi)
    ).select(
        F.col("l_partkey").alias("p_partkey"),
        F.round("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("price_c"),
        _pct("l_discount").alias("disc_pct"),
    )
    cond = F.lit(False)
    for brand, max_size, qty_lo, qty_hi in branches:
        cond = cond | (
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(1, max_size))
            & (F.col("qty").between(qty_lo, qty_hi))
        )
    return (
        li.join(F.broadcast(p), "p_partkey")
        .filter(cond)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("price_c") * (F.lit(100) - F.col("disc_pct"))
                ),
                F.lit(0),
            ).cast("long").alias("revenue_e4")
        )
    )


def disjunctive_revenue_sql(branches: tuple = DR_BRANCHES) -> str:
    ors = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s}"
        f" AND CAST(round(l_quantity) AS BIGINT) BETWEEN {lo} AND {hi})"
        for b, s, lo, hi in branches
    )
    return (
        "SELECT CAST(COALESCE(SUM("
        f"{_cents_sql('l_extendedprice')}"
        f" * (100 - {_cents_sql('l_discount')})), 0) AS BIGINT)"
        " AS revenue_e4"
        " FROM lineitem JOIN part ON l_partkey = p_partkey"
        f" WHERE {ors}"
    )


# ---------------------------------------------------------------------------
# waiting_orders_by_supplier — the TPC-H Q21 shape: suppliers who were
# the SOLE late shipper on a multi-supplier finished order.  The
# testdata has no commit/receipt dates, so "late" is shipdate more
# than `late_days` after the order date — the exists / not-exists
# correlated-subquery pair of the classic query is preserved as pure
# aggregation.
# ---------------------------------------------------------------------------

WOS_LATE_DAYS = 90
WOS_TOP_N = 100


def waiting_orders_by_supplier(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    late_days: int = WOS_LATE_DAYS,
    top_n: int = WOS_TOP_N,
) -> DataFrame:
    """[s_name, n_name, numwait] — per supplier, the number of
    finished ('F') orders with at least two distinct suppliers where
    THIS supplier shipped late (> late_days after the order date) and
    no other supplier did.

    Q21's two correlated subqueries (EXISTS another supplier / NOT
    EXISTS another LATE supplier) become two grouped aggregates over
    one orderkey shuffle: collapse lineitem to (order, supplier,
    was_late), then count suppliers and late suppliers per order with
    a window over the same key — the partial aggregate and the window
    share the orderkey exchange, so the whole funnel is a single
    big-big shuffle (lineitem |><| orders) plus broadcast dimensions.
    No self-join of the fact table, no row explosion."""
    from pyspark.sql import Window

    o = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        event_micros(orders, "o_orderdate").alias("order_us"),
    )
    ls = (
        lineitem.select(
            F.col("l_orderkey").alias("o_orderkey"),
            "l_suppkey",
            event_micros(lineitem, "l_shipdate").alias("ship_us"),
        )
        .join(o, "o_orderkey")
        # one explicit orderkey exchange that BOTH the (order,supplier)
        # collapse and the per-order window reuse: HashPartitioning on
        # o_orderkey satisfies the grouped and windowed distributions,
        # so neither adds its own shuffle
        .repartition("o_orderkey")
        .groupBy("o_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("ship_us")
                    > F.col("order_us") + F.lit(late_days * DAY_US)
                ).cast("long")
            ).alias("late")
        )
    )
    w = Window.partitionBy("o_orderkey")
    annotated = ls.select(
        "o_orderkey",
        "l_suppkey",
        "late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late"),
    )
    waits = annotated.filter(
        (F.col("late") == 1)
        & (F.col("n_supp") >= 2)
        & (F.col("n_late") == 1)
    )
    counts = waits.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("numwait")
    )
    dim = supplier.select(
        F.col("s_suppkey").alias("l_suppkey"),
        "s_name",
        F.col("s_nationkey").alias("n_nationkey"),
    ).join(F.broadcast(nation.select("n_nationkey", "n_name")),
           "n_nationkey")
    return (
        counts.join(F.broadcast(dim), "l_suppkey")
        .select("s_name", "n_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(top_n)
    )


def waiting_orders_by_supplier_sql(
    late_days: int = WOS_LATE_DAYS, top_n: int = WOS_TOP_N
) -> str:
    return (
        "WITH ls AS (SELECT l_orderkey, l_suppkey,"
        " MAX(CASE WHEN epoch_us(l_shipdate) >"
        f" epoch_us(o_orderdate) + {late_days * DAY_US}"
        " THEN 1 ELSE 0 END) AS late"
        " FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
        " WHERE o_orderstatus = 'F'"
        " GROUP BY l_orderkey, l_suppkey),"
        " ann AS (SELECT l_suppkey, late,"
        " COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,"
        " SUM(late) OVER (PARTITION BY l_orderkey) AS n_late"
        " FROM ls)"
        " SELECT s_name, n_name,"
        " CAST(COUNT(*) AS BIGINT) AS numwait"
        " FROM ann JOIN supplier ON l_suppkey = s_suppkey"
        " JOIN nation ON s_nationkey = n_nationkey"
        " WHERE late = 1 AND n_supp >= 2 AND n_late = 1"
        " GROUP BY s_name, n_name"
        f" ORDER BY numwait DESC, s_name ASC LIMIT {top_n}"
    )


# ---------------------------------------------------------------------------
# Derived partsupp + the three TPC-H shapes that need it (Q2 / Q11 /
# Q20).  The testdata ships no partsupp table, so both engines DERIVE
# the identical one deterministically from part x supplier: part p is
# supplied by PS_FANOUT suppliers at hash-chosen keys, with integer
# availability and cents-exact supply cost from the same hash family.
# Every row is a pure function of (p_partkey, ps_suppkey), so the
# Spark build and the DuckDB oracle agree bit-for-bit at any sf.
# ---------------------------------------------------------------------------

PS_FANOUT = 4


def derived_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """[ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_c] — the
    deterministic derived partsupp. suppkey_i = (p*53 + i*97 + 11)
    mod n_supp for i < PS_FANOUT (collisions dedup'd, so low-supplier
    scale factors yield fewer rows, never duplicates); n_supp rides
    as a 1-row broadcast — the scalar-subquery shape, not a driver
    constant, so the same expression works at every sf."""
    n = supplier.agg(F.count(F.lit(1)).cast("long").alias("n_supp"))
    keys = (
        part.select("p_partkey")
        .withColumn(
            "i", F.explode(F.expr(f"sequence(0, {PS_FANOUT - 1})"))
        )
        .crossJoin(F.broadcast(n))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (
                (F.col("p_partkey") * 53 + F.col("i") * 97 + 11)
                % F.col("n_supp")
            ).cast("long").alias("ps_suppkey"),
        )
        .distinct()
    )
    return keys.select(
        "ps_partkey",
        "ps_suppkey",
        (
            (F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 9999
            + 1
        ).cast("long").alias("ps_availqty"),
        (
            (F.col("ps_partkey") * 17 + F.col("ps_suppkey") * 29)
            % 99000
            + 1000
        ).cast("long").alias("ps_supplycost_c"),
    )


_DUCK_PARTSUPP = (
    "SELECT ps_partkey, ps_suppkey,"
    " CAST((ps_partkey * 7 + ps_suppkey * 13) % 9999 + 1 AS BIGINT)"
    " AS ps_availqty,"
    " CAST((ps_partkey * 17 + ps_suppkey * 29) % 99000 + 1000"
    " AS BIGINT) AS ps_supplycost_c FROM ("
    " SELECT DISTINCT p_partkey AS ps_partkey,"
    " CAST((p_partkey * 53 + i * 97 + 11)"
    " % (SELECT COUNT(*) FROM supplier) AS BIGINT) AS ps_suppkey"
    f" FROM part, (VALUES (0), (1), (2), (3)) AS gen(i))"
)

MCS_REGION = "EUROPE"
MCS_TYPE = "STANDARD"


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = MCS_REGION,
    p_type: str = MCS_TYPE,
) -> DataFrame:
    """[p_partkey, p_brand, s_name, n_name, supplycost_c] — for each
    part of one type, the cheapest in-region supplier (Q2 shape).
    The classic correlated MIN subquery becomes a per-part ranked
    window with a total (cost asc, suppkey asc) tiebreak; dimensions
    broadcast, partsupp is derived in-plan."""
    from pyspark.sql import Window

    ps = derived_partsupp(part, supplier)
    p = part.filter(F.col("p_type") == p_type).select(
        F.col("p_partkey").alias("ps_partkey"), "p_brand"
    )
    n_region = nation.join(
        F.broadcast(
            region.filter(F.col("r_name") == region_name).select(
                "r_regionkey"
            )
        ),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    supp = supplier.select(
        F.col("s_suppkey").alias("ps_suppkey"),
        "s_name",
        F.col("s_nationkey").alias("n_nationkey"),
    ).join(F.broadcast(n_region), "n_nationkey")
    cand = ps.join(F.broadcast(p), "ps_partkey").join(
        F.broadcast(supp), "ps_suppkey"
    )
    w = Window.partitionBy("ps_partkey").orderBy(
        F.asc("ps_supplycost_c"), F.asc("ps_suppkey")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand",
            "s_name",
            "n_name",
            F.col("ps_supplycost_c").alias("supplycost_c"),
        )
    )


def min_cost_supplier_sql(
    region_name: str = MCS_REGION, p_type: str = MCS_TYPE
) -> str:
    return (
        f"WITH ps AS ({_DUCK_PARTSUPP}),"
        " cand AS (SELECT ps.ps_partkey, p.p_brand, s.s_name,"
        " n.n_name, ps.ps_supplycost_c, ps.ps_suppkey"
        " FROM ps JOIN part p ON ps.ps_partkey = p.p_partkey"
        " JOIN supplier s ON ps.ps_suppkey = s.s_suppkey"
        " JOIN nation n ON s.s_nationkey = n.n_nationkey"
        " JOIN region r ON n.n_regionkey = r.r_regionkey"
        f" WHERE p.p_type = '{p_type}' AND r.r_name = '{region_name}'),"
        " ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY"
        " ps_partkey ORDER BY ps_supplycost_c ASC, ps_suppkey ASC)"
        " AS rn FROM cand)"
        " SELECT ps_partkey AS p_partkey, p_brand, s_name, n_name,"
        " ps_supplycost_c AS supplycost_c FROM ranked WHERE rn = 1"
    )


IS_NATION = "NATION_9"
IS_FRACTION_DEN = 2000  # keep parts holding > 1/2000 of nation value


def important_stock(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = IS_NATION,
    fraction_den: int = IS_FRACTION_DEN,
) -> DataFrame:
    """[ps_partkey, value_c] — per-part inventory value held by one
    nation's suppliers, keeping parts above a fixed fraction of the
    nation total (Q11 shape). The HAVING-vs-scalar-subquery compare
    is the exact integer cross-multiplication value_c * den >
    total_c — no float threshold, so the boundary part is classified
    identically by both engines."""
    ps = derived_partsupp(part, supplier)
    supp = supplier.select(
        F.col("s_suppkey").alias("ps_suppkey"),
        F.col("s_nationkey").alias("n_nationkey"),
    ).join(
        F.broadcast(
            nation.filter(F.col("n_name") == nation_name).select(
                "n_nationkey"
            )
        ),
        "n_nationkey",
    ).select("ps_suppkey")
    held = ps.join(F.broadcast(supp), "ps_suppkey").select(
        "ps_partkey",
        (F.col("ps_availqty") * F.col("ps_supplycost_c")).alias("v_c"),
    )
    per_part = held.groupBy("ps_partkey").agg(
        F.sum("v_c").cast("long").alias("value_c")
    )
    total = held.agg(F.sum("v_c").cast("long").alias("total_c"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_c") * F.lit(fraction_den) > F.col("total_c")
        )
        .select("ps_partkey", "value_c")
    )


def important_stock_sql(
    nation_name: str = IS_NATION, fraction_den: int = IS_FRACTION_DEN
) -> str:
    return (
        f"WITH ps AS ({_DUCK_PARTSUPP}),"
        " held AS (SELECT ps.ps_partkey,"
        " ps.ps_availqty * ps.ps_supplycost_c AS v_c"
        " FROM ps JOIN supplier s ON ps.ps_suppkey = s.s_suppkey"
        " JOIN nation n ON s.s_nationkey = n.n_nationkey"
        f" WHERE n.n_name = '{nation_name}')"
        " SELECT ps_partkey, CAST(SUM(v_c) AS BIGINT) AS value_c"
        " FROM held GROUP BY ps_partkey"
        f" HAVING CAST(SUM(v_c) AS BIGINT) * {fraction_den} >"
        " (SELECT CAST(SUM(v_c) AS BIGINT) FROM held)"
    )


ES_NAME_TOKEN = "cold"
ES_FROM_US = date_us(1997, 1, 1)
ES_TO_US = date_us(1998, 1, 1)


def excess_stock_suppliers(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    name_token: str = ES_NAME_TOKEN,
    from_us: int = ES_FROM_US,
    to_us: int = ES_TO_US,
) -> DataFrame:
    """[s_suppkey, s_name, n_name] — suppliers holding excess stock
    of a part-name family: availqty exceeds half the quantity they
    shipped of that part in one year, among (part, supplier) pairs
    that shipped at all (the derived partsupp's keys are synthetic,
    so the no-sales branch of classic Q20 would be vacuously true
    for every supplier — the inner join keeps the comparison
    meaningful). The nested exists-with-aggregate becomes partsupp
    |><| per-(part, supplier) shipped sums + the integer test
    2*availqty > shipped_qty; the supplier list is a distinct
    semi-join output."""
    ps = derived_partsupp(part, supplier)
    fam = part.filter(
        F.col("p_name").startswith(name_token)
    ).select(F.col("p_partkey").alias("ps_partkey"))
    shipped = (
        lineitem.filter(
            ts_range_cond(lineitem, "l_shipdate", from_us, to_us)
        )
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.sum(F.round("l_quantity").cast("long")).alias("qty")
        )
    )
    excess = (
        ps.join(F.broadcast(fam), "ps_partkey")
        .join(shipped, ["ps_partkey", "ps_suppkey"])
        .filter(F.col("ps_availqty") * 2 > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        excess.join(
            supplier.select(
                F.col("s_suppkey").alias("ps_suppkey"),
                "s_name",
                F.col("s_nationkey").alias("n_nationkey"),
            ),
            "ps_suppkey",
        )
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              "n_nationkey")
        .select(
            F.col("ps_suppkey").alias("s_suppkey"), "s_name", "n_name"
        )
    )


def excess_stock_suppliers_sql(
    name_token: str = ES_NAME_TOKEN,
    from_us: int = ES_FROM_US,
    to_us: int = ES_TO_US,
) -> str:
    return (
        f"WITH ps AS ({_DUCK_PARTSUPP}),"
        " shipped AS (SELECT l_partkey AS ps_partkey,"
        " l_suppkey AS ps_suppkey,"
        " CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)"
        " AS qty FROM lineitem"
        f" WHERE epoch_us(l_shipdate) >= {from_us}"
        f" AND epoch_us(l_shipdate) < {to_us}"
        " GROUP BY 1, 2),"
        " excess AS (SELECT DISTINCT ps.ps_suppkey FROM ps"
        " JOIN part p ON ps.ps_partkey = p.p_partkey"
        " JOIN shipped sh ON ps.ps_partkey = sh.ps_partkey"
        " AND ps.ps_suppkey = sh.ps_suppkey"
        f" WHERE p.p_name LIKE '{name_token}%'"
        " AND ps.ps_availqty * 2 > sh.qty)"
        " SELECT e.ps_suppkey AS s_suppkey, s.s_name, n.n_name"
        " FROM excess e JOIN supplier s ON e.ps_suppkey = s.s_suppkey"
        " JOIN nation n ON s.s_nationkey = n.n_nationkey"
    )


# ---------------------------------------------------------------------------
# late_line_priority — the TPC-H Q12 shape: fact-fact join with two-way
# conditional counts grouped by a line attribute
# ---------------------------------------------------------------------------

Q12_FROM_US = date_us(1997, 1, 1)
Q12_TO_US = date_us(1998, 1, 1)
Q12_LATE_DAYS = 45


def late_line_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    from_us: int = Q12_FROM_US,
    to_us: int = Q12_TO_US,
    late_days: int = Q12_LATE_DAYS,
) -> DataFrame:
    """Late-shipment line counts split by order priority, grouped by
    line status: [l_linestatus, high_line_count, low_line_count],
    counting lines shipped more than ``late_days`` after their order
    date within one ship-date year. high = 1-URGENT / 2-HIGH orders.

    TPC-H Q12 shape adapted to the testdata schema — the testdata
    lineitem carries no l_shipmode / l_commitdate / l_receiptdate, so
    l_linestatus stands in for the group key and order-date lag for the
    receipt-vs-commit lateness test; the plan shape is identical:
    date-filtered fact ⋈ fact on orderkey (the one natural big-big
    join) with the priority split folded into two conditional
    aggregates of a single groupBy — one exchange total past the join,
    never two scans or a pivot. Ship-date range pushes to the parquet
    scan via ts_range_cond's redundant raw comparison.
    """
    li = lineitem.filter(
        ts_range_cond(lineitem, "l_shipdate", from_us, to_us)
    ).select(
        "l_orderkey",
        "l_linestatus",
        event_micros(lineitem, "l_shipdate").alias("ship_us"),
    )
    o = orders.select(
        "o_orderkey",
        "o_orderpriority",
        event_micros(orders, "o_orderdate").alias("o_us"),
    )
    joined = li.join(
        o, li.l_orderkey == o.o_orderkey, "inner"
    ).filter(F.col("ship_us") > F.col("o_us") + F.lit(late_days * DAY_US))
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
    )


def late_line_priority_sql(
    from_us: int = Q12_FROM_US,
    to_us: int = Q12_TO_US,
    late_days: int = Q12_LATE_DAYS,
) -> str:
    return (
        "SELECT l_linestatus,"
        " CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')"
        " THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,"
        " CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')"
        " THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count"
        " FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
        f" WHERE epoch_us(l.l_shipdate) >= {from_us}"
        f" AND epoch_us(l.l_shipdate) < {to_us}"
        " AND epoch_us(l.l_shipdate) >"
        f" epoch_us(o.o_orderdate) + {late_days * DAY_US}"
        " GROUP BY l_linestatus"
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier) — preference queries, a distinct operator
# class from ranking: no weighting of the dimensions, just dominance.
# ---------------------------------------------------------------------------


def part_skyline(part: DataFrame) -> DataFrame:
    """[price_cents, size] — the Pareto frontier of parts minimizing
    (retail price, size): points no other part beats-or-ties on both
    dimensions while beating strictly on one. The preference-query
    primitive ("cheapest-smallest" tradeoff curve).

    Plan (2-D skyline = prefix-min, made distribution-friendly):
    (1) DOMAIN REDUCTION — groupBy(price) keeping min(size): for any
        price only its minimum size can be on the frontier, and the
        distributed aggregation shrinks the input from row count to
        price-domain size (cents values are bounded by the price
        range — at 100 TB this is the step that does the work);
    (2) one running-min window ordered by price over the REDUCED
        table: a price's min-size point survives iff it is strictly
        below every cheaper price's min size. The window is
        single-partition by construction but runs over the
        domain-sized table, not the corpus (the documented extension
        for an unbounded domain is range-partitioned prefix-min).
    Price quantized to integer cents (round(×100), exact both
    engines); output is frontier POINTS (exact duplicates collapse in
    step 1 — neither of two equal points dominates the other)."""
    from pyspark.sql import Window

    g = (
        part.select(
            F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias(
                "price_cents"
            ),
            "p_size",
        )
        .groupBy("price_cents")
        .agg(F.min("p_size").cast("long").alias("size"))
    )
    w = Window.orderBy("price_cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        g.select(
            "price_cents", "size", F.min("size").over(w).alias("m")
        )
        .filter(F.col("m").isNull() | (F.col("m") > F.col("size")))
        .select("price_cents", "size")
    )


def part_skyline_sql() -> str:
    return (
        "WITH g AS (SELECT"
        " CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,"
        " CAST(MIN(p_size) AS BIGINT) AS size FROM part GROUP BY 1)"
        " SELECT price_cents, size FROM g a"
        " WHERE NOT EXISTS (SELECT 1 FROM g b"
        "  WHERE b.price_cents <= a.price_cents AND b.size <= a.size"
        "  AND (b.price_cents < a.price_cents OR b.size < a.size))"
    )

"""Round-5 relational additions (operators/relational.py): the Q8 /
Q9 / Q10 / Q19 shapes — market-share ppm rounding, profit fixed-point
math, top-k tiebreak determinism, and the OR-of-ANDs join residual —
plus plan guards for the broadcast/pushdown claims the docstrings
make.  Fixtures use bigint-nanos timestamps (the eventtime legacy
path); the oracle gate covers the parquet TIMESTAMP_NTZ path.
"""

from __future__ import annotations

import contextlib
import io

from graph500_spark.operators.relational import (
    date_us,
    disjunctive_revenue,
    market_share,
    product_type_profit,
    returned_items,
)

LI_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_shipdate long,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_returnflag string"
)
ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderdate long,"
    " o_orderpriority string"
)
CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
    " c_mktsegment string"
)
PART_SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_type string,"
    " p_size int, p_retailprice double"
)
SUPP_SCHEMA = "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"
REGION_SCHEMA = "r_regionkey int, r_name string"


def ns(y, m, d):
    return date_us(y, m, d) * 1000


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _dims(spark):
    nation = spark.createDataFrame(
        [(1, "NATION_1", 0), (2, "NATION_2", 0), (3, "NATION_3", 1)],
        NATION_SCHEMA,
    )
    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], REGION_SCHEMA
    )
    supplier = spark.createDataFrame(
        [(7, "s7", 1, 0.0), (8, "s8", 2, 0.0)], SUPP_SCHEMA
    )
    customer = spark.createDataFrame(
        [
            (100, "c100", 1, 10.00, "X"),  # ASIA
            (200, "c200", 3, 20.00, "X"),  # EUROPE — outside market
        ],
        CUST_SCHEMA,
    )
    return nation, region, supplier, customer


class TestMarketShare:
    def test_share_ppm_half_up_and_funnel(self, spark):
        nation, region, supplier, customer = _dims(spark)
        part = spark.createDataFrame(
            [(1, "red widget", "Brand#1", "PROMO", 1, 1.0),
             (2, "blue bolt", "Brand#1", "LARGE", 1, 1.0)],
            PART_SCHEMA,
        )
        orders = spark.createDataFrame(
            [
                (10, 100, ns(1999, 2, 1), "p"),
                (11, 100, ns(2000, 2, 1), "p"),
                (12, 200, ns(1999, 2, 1), "p"),  # non-ASIA customer
                (13, 100, ns(1998, 2, 1), "p"),  # before window
            ],
            ORD_SCHEMA,
        )
        li = spark.createDataFrame(
            [
                # 1999: NATION_1 supplier sells 10.00, NATION_2 sells 20.00
                (10, 1, 7, ns(1999, 3, 1), 1.0, 10.00, 0.0, "N"),
                (10, 1, 8, ns(1999, 3, 1), 1.0, 20.00, 0.0, "N"),
                # 2000: only NATION_1, with a discount
                (11, 1, 7, ns(2000, 3, 1), 1.0, 10.00, 0.05, "N"),
                # non-PROMO part — excluded
                (10, 2, 7, ns(1999, 3, 1), 1.0, 99.00, 0.0, "N"),
                # excluded order rows
                (12, 1, 7, ns(1999, 3, 1), 1.0, 99.00, 0.0, "N"),
                (13, 1, 7, ns(1998, 3, 1), 1.0, 99.00, 0.0, "N"),
            ],
            LI_SCHEMA,
        )
        out = {
            r.o_year: r
            for r in market_share(
                part, li, orders, customer, supplier, nation, region,
                supp_nation="NATION_1",
            ).collect()
        }
        assert set(out) == {1999, 2000}
        # 1999: nation 10.00 → 100000 e4, total 30.00 → 300000 e4
        assert out[1999].nation_revenue_e4 == 100000
        assert out[1999].total_revenue_e4 == 300000
        # (100000·1e6 + 150000) div 300000 = 333333 (1/3 half-up)
        assert out[1999].share_ppm == 333333
        # 2000: sole supplier → exactly 1e6 ppm
        assert out[2000].nation_revenue_e4 == 95000
        assert out[2000].total_revenue_e4 == 95000
        assert out[2000].share_ppm == 1_000_000

    def test_plan_broadcasts_dims(self, spark):
        from graph500_spark.plans.queries import q_market_share

        plan = plan_of(q_market_share(spark, "/root/testdata/sf0.001"))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
        assert any("p_type" in ln for ln in pushed), plan


class TestProductTypeProfit:
    def test_profit_math_and_name_filter(self, spark):
        nation, region, supplier, customer = _dims(spark)
        part = spark.createDataFrame(
            [
                (1, "red widget", "Brand#1", "PROMO", 1, 2.00),
                (2, "blue bolt", "Brand#1", "PROMO", 1, 2.00),
            ],
            PART_SCHEMA,
        )
        orders = spark.createDataFrame(
            [(10, 100, ns(1999, 2, 1), "p")], ORD_SCHEMA
        )
        li = spark.createDataFrame(
            [
                # revenue 10.00·(100-5)=95000 e4; cost 3·200c·80=48000 e4
                (10, 1, 7, ns(1999, 3, 1), 3.0, 10.00, 0.05, "N"),
                # non-widget part — excluded
                (10, 2, 8, ns(1999, 3, 1), 1.0, 99.00, 0.0, "N"),
            ],
            LI_SCHEMA,
        )
        out = product_type_profit(part, li, orders, supplier, nation).collect()
        assert len(out) == 1
        r = out[0]
        assert (r.n_name, r.o_year) == ("NATION_1", 1999)
        assert r.profit_e4 == 95000 - 48000

    def test_profit_can_go_negative(self, spark):
        nation, region, supplier, customer = _dims(spark)
        part = spark.createDataFrame(
            [(1, "hot widget", "Brand#1", "PROMO", 1, 50.00)], PART_SCHEMA
        )
        orders = spark.createDataFrame(
            [(10, 100, ns(1999, 2, 1), "p")], ORD_SCHEMA
        )
        li = spark.createDataFrame(
            [(10, 1, 7, ns(1999, 3, 1), 10.0, 1.00, 0.0, "N")], LI_SCHEMA
        )
        (r,) = product_type_profit(
            part, li, orders, supplier, nation
        ).collect()
        # revenue 1.00·100=10000 e4; cost 10·5000c·80=4_000_000 e4
        assert r.profit_e4 == 10000 - 4_000_000


class TestReturnedItems:
    def _fixture(self, spark):
        nation, region, supplier, customer3 = _dims(spark)
        customer = spark.createDataFrame(
            [
                (3, "c3", 1, 1.50, "X"),
                (5, "c5", 2, 2.50, "X"),
                (9, "c9", 1, 3.50, "X"),
            ],
            CUST_SCHEMA,
        )
        orders = spark.createDataFrame(
            [
                (10, 3, ns(2000, 11, 1), "p"),
                (11, 5, ns(2000, 12, 1), "p"),
                (12, 9, ns(2000, 10, 5), "p"),
                (13, 9, ns(2001, 2, 1), "p"),  # outside quarter
            ],
            ORD_SCHEMA,
        )
        li = spark.createDataFrame(
            [
                (10, 1, 7, ns(2000, 11, 2), 1.0, 20.00, 0.0, "R"),
                (11, 1, 7, ns(2000, 12, 2), 1.0, 20.00, 0.0, "R"),
                (12, 1, 7, ns(2000, 10, 6), 1.0, 50.00, 0.0, "R"),
                # not returned — excluded
                (12, 1, 7, ns(2000, 10, 6), 1.0, 99.00, 0.0, "N"),
                # returned but order outside the quarter — excluded
                (13, 1, 7, ns(2001, 2, 2), 1.0, 99.00, 0.0, "R"),
            ],
            LI_SCHEMA,
        )
        return customer, orders, li, nation

    def test_filters_and_revenue(self, spark):
        customer, orders, li, nation = self._fixture(spark)
        rows = returned_items(customer, orders, li, nation).collect()
        by_key = {r.c_custkey: r for r in rows}
        assert set(by_key) == {3, 5, 9}
        assert by_key[9].revenue_e4 == 500000
        assert by_key[3].revenue_e4 == 200000
        assert by_key[3].n_name == "NATION_1"
        assert by_key[3].acctbal_c == 150

    def test_topk_tiebreak_is_custkey(self, spark):
        customer, orders, li, nation = self._fixture(spark)
        rows = returned_items(customer, orders, li, nation, top_k=2).collect()
        # c9 (500000) first; c3 and c5 tie at 200000 → lower custkey wins
        assert [r.c_custkey for r in rows] == [9, 3]


class TestDisjunctiveRevenue:
    def _parts(self, spark):
        return spark.createDataFrame(
            [
                (1, "a", "Brand#12", "PROMO", 3, 1.0),
                (2, "b", "Brand#23", "PROMO", 8, 1.0),
                (3, "c", "Brand#34", "PROMO", 12, 1.0),
                (4, "d", "Brand#12", "PROMO", 30, 1.0),  # size too big
            ],
            PART_SCHEMA,
        )

    def test_or_branches(self, spark):
        part = self._parts(spark)
        li = spark.createDataFrame(
            [
                # branch 1: Brand#12, size 3, qty 5 → 10.00
                (1, 1, 7, 0, 5.0, 10.00, 0.0, "N"),
                # branch 2: Brand#23, size 8, qty 15, disc 10% → 18.00
                (2, 2, 7, 0, 15.0, 20.00, 0.10, "N"),
                # branch 3 brand, qty outside [20,30] — excluded
                (3, 3, 7, 0, 5.0, 99.00, 0.0, "N"),
                # branch 1 brand but size 30 — excluded
                (4, 4, 7, 0, 5.0, 99.00, 0.0, "N"),
            ],
            LI_SCHEMA,
        )
        (r,) = disjunctive_revenue(li, part).collect()
        assert r.revenue_e4 == 100000 + 180000

    def test_empty_match_returns_zero_row(self, spark):
        part = self._parts(spark)
        li = spark.createDataFrame(
            [(1, 1, 7, 0, 49.0, 10.00, 0.0, "N")], LI_SCHEMA
        )
        (r,) = disjunctive_revenue(li, part).collect()
        assert r.revenue_e4 == 0

    def test_plan_pushes_brand_and_qty(self, spark):
        from graph500_spark.plans.queries import q_disjunctive_revenue

        plan = plan_of(q_disjunctive_revenue(spark, "/root/testdata/sf0.001"))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
        # the per-table residuals Catalyst derives from the OR tree
        assert any("p_brand" in ln or "p_size" in ln for ln in pushed), plan
        assert any("l_quantity" in ln for ln in pushed), plan


class TestLateLinePriority:
    """Q12 shape: priority split of late lines per line status."""

    def test_split_and_lateness(self, spark):
        from graph500_spark.operators.relational import late_line_priority

        DAY = 86_400_000_000_000  # ns
        base = ns(1997, 3, 1)
        li = spark.createDataFrame(
            [
                # order 1: shipped 50d after order date -> late
                (1, 1, 1, base + 50 * DAY, 1.0, 100.0, 0.0, "N", "O"),
                # order 1 second line: on time (10d)
                (1, 2, 1, base + 10 * DAY, 1.0, 100.0, 0.0, "N", "F"),
                # order 2 (low priority): late
                (2, 3, 2, base + 46 * DAY, 1.0, 100.0, 0.0, "N", "F"),
                # order 3: late but ships outside the window
                (3, 4, 3, ns(1999, 6, 1), 1.0, 100.0, 0.0, "N", "O"),
            ],
            LI_SCHEMA + ", l_linestatus string",
        )
        orders = spark.createDataFrame(
            [
                (1, 10, base, "1-URGENT"),
                (2, 11, base, "4-NOT SPECIFIED"),
                (3, 12, ns(1999, 4, 1), "2-HIGH"),
            ],
            ORD_SCHEMA,
        )
        out = {
            r["l_linestatus"]: (r["high_line_count"], r["low_line_count"])
            for r in late_line_priority(li, orders).collect()
        }
        assert out == {"O": (1, 0), "F": (0, 1)}

    def test_boundary_not_late(self, spark):
        from graph500_spark.operators.relational import late_line_priority

        DAY = 86_400_000_000_000
        base = ns(1997, 3, 1)
        li = spark.createDataFrame(
            [(1, 1, 1, base + 45 * DAY, 1.0, 100.0, 0.0, "N", "O")],
            LI_SCHEMA + ", l_linestatus string",
        )
        orders = spark.createDataFrame(
            [(1, 10, base, "1-URGENT")], ORD_SCHEMA
        )
        assert late_line_priority(li, orders).count() == 0

"""Relational OLAP operator semantics (operators/relational.py):
exact integer fixed-point money math, join shapes, tie-breaks, and
edge conditions — plus plan-shape guards for the pushdown and
broadcast claims the module's docstrings make.

Fixtures use bigint-nanos timestamps (the eventtime legacy path);
the oracle gate covers the parquet TIMESTAMP_NTZ path end to end.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from graph500_spark.operators.relational import (
    DAY_US,
    customer_order_distribution,
    date_us,
    discount_revenue,
    idle_rich_customers,
    order_priority_counts,
    pricing_summary,
    revenue_by_nation,
    top_suppliers_by_revenue,
    top_unshipped_orders,
)

LI_SCHEMA = (
    "l_orderkey long, l_suppkey long, l_shipdate long, l_quantity double,"
    " l_extendedprice double, l_discount double, l_tax double,"
    " l_returnflag string, l_linestatus string"
)
ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderdate long,"
    " o_orderpriority string"
)
CUST_SCHEMA = (
    "c_custkey long, c_nationkey int, c_acctbal double, c_mktsegment string"
)


def ns(y, m, d):
    """bigint-nanos timestamp for a calendar date."""
    return date_us(y, m, d) * 1000


def li_row(okey, skey, ship, qty, price, disc, tax, rf="A", ls="F"):
    return (okey, skey, ship, float(qty), float(price), disc, tax, rf, ls)


class TestPricingSummary:
    def test_exact_sums_and_div_averages(self, spark):
        rows = [
            li_row(1, 1, ns(1999, 1, 1), 2, 10.00, 0.05, 0.10),
            li_row(2, 1, ns(1999, 1, 2), 4, 5.00, 0.00, 0.00),
            # after the cutoff — excluded
            li_row(3, 1, ns(2002, 1, 1), 9, 9.00, 0.01, 0.01),
            li_row(4, 1, ns(1999, 1, 3), 1, 1.00, 0.00, 0.00, "N", "O"),
        ]
        li = spark.createDataFrame(rows, LI_SCHEMA)
        out = {
            (r.l_returnflag, r.l_linestatus): r
            for r in pricing_summary(li).collect()
        }
        af = out[("A", "F")]
        assert af.sum_qty == 6
        assert af.sum_base_price_c == 1500
        # 1000·95 + 500·100
        assert af.sum_disc_price_e4 == 95000 + 50000
        # 95000·110 + 50000·100
        assert af.sum_charge_e6 == 10_450_000 + 5_000_000
        assert af.avg_qty_e4 == 30000          # (6·1e4) div 2
        assert af.avg_price_e4 == 75000        # (1500·100) div 2
        assert af.avg_disc_e4 == 250           # (5·100) div 2
        assert af.count_order == 2
        assert out[("N", "O")].count_order == 1
        assert ("A", "O") not in out  # the excluded row's group


class TestDiscountRevenue:
    def test_band_filter_and_revenue(self, spark):
        rows = [
            # in: 1998, disc 6%, qty 10 → 2000c · 6 = 12000
            li_row(1, 1, ns(1998, 3, 1), 10, 20.00, 0.06, 0.0),
            # out: disc below band
            li_row(2, 1, ns(1998, 3, 1), 10, 20.00, 0.04, 0.0),
            # out: qty too high
            li_row(3, 1, ns(1998, 3, 1), 24, 20.00, 0.06, 0.0),
            # out: wrong year
            li_row(4, 1, ns(1997, 3, 1), 10, 20.00, 0.06, 0.0),
        ]
        li = spark.createDataFrame(rows, LI_SCHEMA)
        row = discount_revenue(li).collect()[0]
        assert (row.revenue_e4, row.n_lines) == (12000, 1)


class TestTopUnshippedOrders:
    def test_tiebreak_and_filters(self, spark):
        cut = date_us(1998, 6, 30)
        cust = spark.createDataFrame(
            [(1, 0, 0.0, "BUILDING"), (2, 0, 0.0, "MACHINERY")],
            CUST_SCHEMA,
        )
        orders = spark.createDataFrame(
            [
                (10, 1, ns(1998, 1, 1), "1-URGENT"),
                (11, 1, ns(1998, 1, 1), "1-URGENT"),
                (12, 2, ns(1998, 1, 1), "1-URGENT"),  # wrong segment
                (13, 1, ns(1998, 7, 1), "1-URGENT"),  # ordered after cut
            ],
            ORD_SCHEMA,
        )
        li = spark.createDataFrame(
            [
                li_row(10, 1, ns(1998, 7, 5), 1, 10.00, 0.0, 0.0),
                li_row(11, 1, ns(1998, 7, 5), 1, 10.00, 0.0, 0.0),
                li_row(12, 1, ns(1998, 7, 5), 1, 99.00, 0.0, 0.0),
                li_row(13, 1, ns(1998, 7, 5), 1, 99.00, 0.0, 0.0),
                # order 10's second line shipped BEFORE the cut: excluded
                li_row(10, 1, ns(1998, 1, 5), 1, 50.00, 0.0, 0.0),
            ],
            LI_SCHEMA,
        )
        out = top_unshipped_orders(cust, orders, li).collect()
        # equal revenue (1000·100 each) → orderkey asc breaks the tie
        assert [(r.o_orderkey, r.revenue_e4) for r in out] == [
            (10, 100000),
            (11, 100000),
        ]


class TestOrderPriorityCounts:
    def test_strict_late_threshold(self, spark):
        d0 = date_us(1997, 2, 1)
        orders = spark.createDataFrame(
            [
                (1, 1, d0 * 1000, "1-URGENT"),   # late line below
                (2, 1, d0 * 1000, "1-URGENT"),   # exactly 60d: NOT late
                (3, 1, d0 * 1000, "5-LOW"),      # late
                (4, 1, ns(1996, 2, 1), "5-LOW"),  # out of quarter
            ],
            ORD_SCHEMA,
        )
        li = spark.createDataFrame(
            [
                li_row(1, 1, (d0 + 61 * DAY_US) * 1000, 1, 1.0, 0.0, 0.0),
                li_row(2, 1, (d0 + 60 * DAY_US) * 1000, 1, 1.0, 0.0, 0.0),
                li_row(3, 1, (d0 + 90 * DAY_US) * 1000, 1, 1.0, 0.0, 0.0),
                li_row(4, 1, (d0 + 90 * DAY_US) * 1000, 1, 1.0, 0.0, 0.0),
            ],
            LI_SCHEMA,
        )
        out = {
            r.o_orderpriority: r.n_orders
            for r in order_priority_counts(orders, li).collect()
        }
        assert out == {"1-URGENT": 1, "5-LOW": 1}


class TestCustomerOrderDistribution:
    def test_zero_order_customers_counted(self, spark):
        cust = spark.createDataFrame(
            [(1, 0, 0.0, "X"), (2, 0, 0.0, "X"), (3, 0, 0.0, "X")],
            CUST_SCHEMA,
        )
        orders = spark.createDataFrame(
            [(10, 1, 0, "p"), (11, 1, 0, "p"), (12, 2, 0, "p")],
            ORD_SCHEMA,
        )
        out = {
            r.c_count: r.custdist
            for r in customer_order_distribution(cust, orders).collect()
        }
        assert out == {2: 1, 1: 1, 0: 1}


class TestTopSuppliersByRevenue:
    def test_ties_all_returned(self, spark):
        supp = spark.createDataFrame(
            [(1, "s1", 0, 0.0), (2, "s2", 0, 0.0), (3, "s3", 0, 0.0)],
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        )
        li = spark.createDataFrame(
            [
                li_row(1, 1, ns(1997, 2, 1), 1, 10.00, 0.0, 0.0),
                li_row(2, 2, ns(1997, 2, 1), 1, 10.00, 0.0, 0.0),
                li_row(3, 3, ns(1997, 2, 1), 1, 5.00, 0.0, 0.0),
                # out of the half-year window
                li_row(4, 3, ns(1997, 8, 1), 1, 99.00, 0.0, 0.0),
            ],
            LI_SCHEMA,
        )
        out = sorted(
            (r.s_suppkey, r.s_name, r.total_revenue_e4)
            for r in top_suppliers_by_revenue(supp, li).collect()
        )
        assert out == [(1, "s1", 100000), (2, "s2", 100000)]


class TestIdleRichCustomers:
    def test_strict_above_average_and_recency(self, spark):
        cust = spark.createDataFrame(
            [
                (1, 0, 10.00, "X"),
                (2, 0, 20.00, "X"),
                (3, 0, 30.00, "X"),   # rich (avg=20, strict >), idle
                (4, 1, 40.00, "X"),   # rich but has a recent order
                (5, 1, -5.00, "X"),   # negative: out of the average
            ],
            CUST_SCHEMA,
        )
        orders = spark.createDataFrame(
            [
                (10, 4, ns(2001, 1, 1), "p"),   # recent → cust 4 not idle
                (11, 3, ns(1998, 1, 1), "p"),   # old → cust 3 stays idle
            ],
            ORD_SCHEMA,
        )
        # avg over positive balances {10,20,30,40}/4 = 25 → rich = {3? no:
        # 30>25 yes, 4: 40>25 yes}; 4 has a recent order → only 3 remains
        out = {
            r.c_nationkey: (r.n_customers, r.total_acctbal_c)
            for r in idle_rich_customers(cust, orders).collect()
        }
        assert out == {0: (1, 3000)}


class TestRevenueByNation:
    NATION = "n_nationkey int, n_name string, n_regionkey int"
    REGION = "r_regionkey int, r_name string"
    SUPP = "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"

    def test_local_supplier_constraint(self, spark):
        nation = spark.createDataFrame(
            [(1, "JAPAN", 2), (2, "FRANCE", 3)], self.NATION
        )
        region = spark.createDataFrame(
            [(2, "ASIA"), (3, "EUROPE")], self.REGION
        )
        cust = spark.createDataFrame(
            [(1, 1, 0.0, "X"), (2, 2, 0.0, "X")], CUST_SCHEMA
        )
        supp = spark.createDataFrame(
            [(7, "s7", 1, 0.0), (8, "s8", 2, 0.0)], self.SUPP
        )
        orders = spark.createDataFrame(
            [
                (10, 1, ns(1997, 2, 1), "p"),
                (11, 2, ns(1997, 2, 1), "p"),   # EUROPE customer
                (12, 1, ns(1996, 2, 1), "p"),   # out of the year
            ],
            ORD_SCHEMA,
        )
        li = spark.createDataFrame(
            [
                # JAPAN customer, JAPAN supplier → counts: 1000·90
                li_row(10, 7, ns(1997, 3, 1), 1, 10.00, 0.10, 0.0),
                # JAPAN customer, FRANCE supplier → non-local, excluded
                li_row(10, 8, ns(1997, 3, 1), 1, 10.00, 0.0, 0.0),
                # EUROPE customer's line → region-excluded
                li_row(11, 8, ns(1997, 3, 1), 1, 10.00, 0.0, 0.0),
                # out-of-year order's line
                li_row(12, 7, ns(1996, 3, 1), 1, 10.00, 0.0, 0.0),
            ],
            LI_SCHEMA,
        )
        out = [
            (r.n_name, r.revenue_e4)
            for r in revenue_by_nation(
                cust, orders, li, supp, nation, region
            ).collect()
        ]
        assert out == [("JAPAN", 90000)]


class TestRelationalPlanShapes:
    """The module docstrings' pushdown/broadcast claims, asserted."""

    SF = "/root/testdata/sf0.001"

    @staticmethod
    def _plan(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    def test_discount_revenue_pushes_every_predicate(self, spark):
        from graph500_spark.plans.queries import q_discount_revenue

        plan = self._plan(q_discount_revenue(spark, self.SF))
        pushed = [
            ln for ln in plan.splitlines() if "PushedFilters" in ln
        ]
        assert pushed, plan
        line = pushed[0]
        for col in ("l_shipdate", "l_discount", "l_quantity"):
            assert col in line, line
        assert "Exchange hashpartitioning" not in plan  # scan→agg only

    def test_pricing_summary_pushes_shipdate_and_prunes(self, spark):
        from graph500_spark.plans.queries import q_pricing_summary

        plan = self._plan(q_pricing_summary(spark, self.SF))
        pushed = [
            ln for ln in plan.splitlines() if "PushedFilters" in ln
        ]
        assert pushed and "l_shipdate" in pushed[0], plan
        # pruned scan: the key columns are never read
        assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]

    def test_revenue_by_nation_broadcasts_dims(self, spark):
        from graph500_spark.plans.queries import q_revenue_by_nation

        plan = self._plan(q_revenue_by_nation(spark, self.SF))
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_order_priority_semi_join(self, spark):
        from graph500_spark.plans.queries import q_order_priority_counts

        plan = self._plan(q_order_priority_counts(spark, self.SF))
        assert "LeftSemi" in plan
        assert "CartesianProduct" not in plan


PART_SCHEMA = (
    "p_partkey long, p_name string, p_brand string, p_type string,"
    " p_size int, p_retailprice double"
)


class TestPromoRevenueShare:
    def test_share_is_integer_ppm(self, spark):
        from graph500_spark.operators.relational import promo_revenue_share

        part = spark.createDataFrame(
            [
                (1, "p1", "Brand#1", "PROMO", 1, 1.0),
                (2, "p2", "Brand#1", "STANDARD", 1, 1.0),
            ],
            PART_SCHEMA,
        )
        li = spark.createDataFrame(
            [
                # promo: 1000c, no discount → 100000 e4
                (10, 1, ns(1998, 2, 1), 1.0, 10.00, 0.0, 0.0, "A", "F", 1),
                # non-promo: 3000c → 300000 e4
                (11, 1, ns(1998, 2, 1), 1.0, 30.00, 0.0, 0.0, "A", "F", 2),
                # out of the ship year
                (12, 1, ns(1997, 2, 1), 1.0, 99.00, 0.0, 0.0, "A", "F", 1),
            ],
            LI_SCHEMA + ", l_partkey long",
        )
        row = promo_revenue_share(li, part).collect()[0]
        assert row.promo_revenue_e4 == 100000
        assert row.total_revenue_e4 == 400000
        assert row.promo_share_e6 == 250000  # exactly 25%

    def test_empty_input_zeroes(self, spark):
        from graph500_spark.operators.relational import promo_revenue_share

        part = spark.createDataFrame(
            [(1, "p1", "B", "PROMO", 1, 1.0)], PART_SCHEMA
        )
        li = spark.createDataFrame([], LI_SCHEMA + ", l_partkey long")
        row = promo_revenue_share(li, part).collect()[0]
        assert (row.promo_revenue_e4, row.total_revenue_e4,
                row.promo_share_e6) == (0, 0, 0)


class TestLargeOrders:
    def test_having_threshold_strict(self, spark):
        from graph500_spark.operators.relational import large_orders

        orders = spark.createDataFrame(
            [
                (1, 7, ns(1997, 1, 1), "p"),
                (2, 8, ns(1997, 1, 2), "p"),
            ],
            ORD_SCHEMA,
        ).withColumn("o_totalprice", (F.col("o_orderkey") * 100.0))
        li = spark.createDataFrame(
            [
                li_row(1, 1, 0, 100, 1.0, 0.0, 0.0),
                li_row(1, 1, 0, 51, 1.0, 0.0, 0.0),   # order 1: 151 > 150
                li_row(2, 1, 0, 150, 1.0, 0.0, 0.0),  # exactly 150: out
            ],
            LI_SCHEMA,
        )
        out = large_orders(orders, li).collect()
        assert [(r.o_orderkey, r.o_custkey, r.total_qty, r.total_price_c)
                for r in out] == [(1, 7, 151, 10000)]


class TestSmallQuantityRevenue:
    def test_cross_multiplied_threshold(self, spark):
        from graph500_spark.operators.relational import (
            small_quantity_revenue,
        )

        part = spark.createDataFrame(
            [(1, "p1", "Brand#1", "STANDARD", 1, 1.0),
             (2, "p2", "Brand#2", "STANDARD", 1, 1.0)],
            PART_SCHEMA,
        )
        # part 1 lines: qty 1, 10, 10, 10, 10, 10 (n=6, sum=51);
        # threshold: qty*5*6 < 51 → qty 1 qualifies (30<51), 10 doesn't
        rows = [li_row(i, 1, 0, q, 2.00, 0.0, 0.0) + ()
                for i, q in enumerate([1, 10, 10, 10, 10, 10])]
        li = spark.createDataFrame(
            [(okey, skey, sd, q, p, d, t, rf, ls, 1)
             for okey, skey, sd, q, p, d, t, rf, ls in rows]
            # brand-excluded part 2 line, tiny qty — must not count
            + [(99, 1, 0, 1.0, 50.00, 0.0, 0.0, "A", "F", 2)],
            LI_SCHEMA + ", l_partkey long",
        )
        row = small_quantity_revenue(li, part).collect()[0]
        assert (row.revenue_c, row.n_lines) == (200, 1)


class TestShippingVolume:
    def test_pair_directions_and_year(self, spark):
        from graph500_spark.operators.relational import shipping_volume

        nation = spark.createDataFrame(
            [(1, "NATION_1", 0), (2, "NATION_2", 0), (3, "NATION_3", 0)],
            "n_nationkey int, n_name string, n_regionkey int",
        )
        supp = spark.createDataFrame(
            [(7, "s7", 1, 0.0), (8, "s8", 2, 0.0), (9, "s9", 3, 0.0)],
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        )
        cust = spark.createDataFrame(
            [(1, 2, 0.0, "X"), (2, 1, 0.0, "X"), (3, 3, 0.0, "X")],
            CUST_SCHEMA,
        )
        orders = spark.createDataFrame(
            [(10, 1, 0, "p"), (11, 2, 0, "p"), (12, 3, 0, "p")],
            ORD_SCHEMA,
        )
        li = spark.createDataFrame(
            [
                # supp NATION_1 → cust NATION_2, 1997
                li_row(10, 7, ns(1997, 5, 1), 1, 10.00, 0.0, 0.0),
                # supp NATION_2 → cust NATION_1, 1998
                li_row(11, 8, ns(1998, 5, 1), 1, 20.00, 0.0, 0.0),
                # supp NATION_3: not in the pair
                li_row(10, 9, ns(1997, 5, 1), 1, 99.00, 0.0, 0.0),
                # cust NATION_3: not in the pair
                li_row(12, 7, ns(1997, 5, 1), 1, 99.00, 0.0, 0.0),
            ],
            LI_SCHEMA,
        )
        out = {
            (r.supp_nation, r.cust_nation, r.l_year): r.revenue_e4
            for r in shipping_volume(cust, orders, li, supp, nation).collect()
        }
        assert out == {
            ("NATION_1", "NATION_2", 1997): 100000,
            ("NATION_2", "NATION_1", 1998): 200000,
        }


class TestSupplierPartCounts:
    def test_distinct_and_exclusion(self, spark):
        from graph500_spark.operators.relational import supplier_part_counts

        part = spark.createDataFrame(
            [
                (1, "p1", "Brand#1", "SMALL", 2, 1.0),
                (2, "p2", "Brand#5", "SMALL", 2, 1.0),   # excluded brand
                (3, "p3", "Brand#1", "SMALL", 50, 1.0),  # too big
            ],
            PART_SCHEMA,
        )
        li = spark.createDataFrame(
            [(i, s, 0, 1.0, 1.0, 0.0, 0.0, "A", "F", pk)
             for i, (s, pk) in enumerate(
                 [(7, 1), (7, 1), (8, 1), (7, 2), (7, 3)])],
            LI_SCHEMA + ", l_partkey long",
        )
        out = supplier_part_counts(part, li).collect()
        assert [(r.p_brand, r.p_type, r.p_size, r.supplier_cnt)
                for r in out] == [("Brand#1", "SMALL", 2, 2)]


class TestScd2History:
    def test_runs_collapse_and_open_interval(self, spark):
        from graph500_spark.streaming.windows import scd2_history

        # user 1: A A B A  → versions A[10,30) B[30,40) A[40,∞)
        # user 2: single event → one open version
        ev = spark.createDataFrame(
            [
                (1, 10_000, 1, "A", 0.0, ""),
                (2, 20_000, 1, "A", 0.0, ""),
                (3, 30_000, 1, "B", 0.0, ""),
                (4, 40_000, 1, "A", 0.0, ""),
                (5, 15_000, 2, "X", 0.0, ""),
            ],
            "event_id long, ts long, user_id long, event_type string,"
            " value double, props string",
        )
        out = sorted(
            (r.user_id, r.event_type, r.valid_from_us, r.valid_to_us,
             r.is_current)
            for r in scd2_history(ev).collect()
        )
        assert out == [
            (1, "A", 10, 30, False),
            (1, "A", 40, None, True),
            (1, "B", 30, 40, False),
            (2, "X", 15, None, True),
        ]

    def test_single_shuffle(self, spark):
        """Both window passes share one exchange on user_id."""
        from graph500_spark.plans.queries import q_scd2_history

        plan = plan_of_module(q_scd2_history(spark, "/root/testdata/sf0.001"))
        n_exchange = plan.count("(") and len(
            [ln for ln in plan.splitlines()
             if ln.strip().startswith("Exchange hashpartitioning")]
        )
        assert n_exchange <= 1, plan


def plan_of_module(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestUserEventPivot:
    EV = (
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )

    def test_zero_fill_and_round_trip(self, spark):
        from graph500_spark.streaming.windows import (
            user_event_pivot,
            user_event_unpivot,
        )

        ev = spark.createDataFrame(
            [
                (1, 0, 1, "click", 0.0, ""),
                (2, 0, 1, "click", 0.0, ""),
                (3, 0, 1, "view", 0.0, ""),
                (4, 0, 2, "error", 0.0, ""),
            ],
            self.EV,
        )
        wide = {r.user_id: r for r in user_event_pivot(ev).collect()}
        assert (wide[1].n_click, wide[1].n_view, wide[1].n_error) == (2, 1, 0)
        assert (wide[2].n_error, wide[2].n_click) == (1, 0)
        long = sorted(
            (r.user_id, r.event_type, r.n_events)
            for r in user_event_unpivot(ev).collect()
        )
        assert long == [
            (1, "click", 2),
            (1, "view", 1),
            (2, "error", 1),
        ]


class TestEventValueHistogram:
    EV = (
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )

    def test_bins_and_edges(self, spark):
        from graph500_spark.streaming.windows import event_value_histogram

        # values 0.00 .. 1.99 → v_c in [0, 199]; 20 bins of width 10
        ev = spark.createDataFrame(
            [(i, 0, 1, "view", i / 100.0, "") for i in range(200)],
            self.EV,
        )
        out = {r.bin: r.n_events
               for r in event_value_histogram(ev).collect()}
        assert len(out) == 20 and all(v == 10 for v in out.values())

    def test_max_value_lands_in_last_bin(self, spark):
        from graph500_spark.streaming.windows import event_value_histogram

        ev = spark.createDataFrame(
            [(1, 0, 1, "view", 0.0, ""), (2, 0, 1, "view", 5.0, "")],
            self.EV,
        )
        out = {r.bin: r.n_events
               for r in event_value_histogram(ev).collect()}
        assert out == {0: 1, 19: 1}  # max is inside bin 19, not 20


class TestFunnelWindowed:
    EV = (
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )

    def test_window_anchoring(self, spark):
        from graph500_spark.streaming.windows import funnel_windowed

        day_ns = 86_400_000_000 * 1000
        rows = [
            # user 1: view, click +2d, purchase +3d after click → full
            (1, 0 * day_ns, 1, "view", 0.0, ""),
            (2, 2 * day_ns, 1, "click", 0.0, ""),
            (3, 5 * day_ns, 1, "purchase", 0.0, ""),
            # user 2: click 8d after view → outside the 7d window
            (4, 0 * day_ns, 2, "view", 0.0, ""),
            (5, 8 * day_ns, 2, "click", 0.0, ""),
            # user 3: purchase BEFORE the click → not counted
            (6, 0 * day_ns, 3, "view", 0.0, ""),
            (7, 1 * day_ns, 3, "purchase", 0.0, ""),
            (8, 2 * day_ns, 3, "click", 0.0, ""),
        ]
        ev = spark.createDataFrame(rows, self.EV)
        row = funnel_windowed(ev).collect()[0]
        assert (row.n_view, row.n_click_7d, row.n_purchase_7d) == (3, 2, 1)


class TestLineitemCorrelations:
    def test_known_correlations(self, spark):
        from graph500_spark.operators.relational import (
            lineitem_correlations,
        )

        # qty perfectly correlates with price (p = 2q dollars),
        # discount is anti-correlated with qty
        rows = [
            li_row(i, 1, 0, q, 2.0 * q, (5 - q) / 100.0, 0.0)
            for i, q in enumerate([1, 2, 3, 4])
        ]
        li = spark.createDataFrame(rows, LI_SCHEMA)
        out = {r.pair: r.corr for r in lineitem_correlations(li).collect()}
        assert out["qty_price"] == 1.0
        assert out["qty_disc"] == -1.0
        assert out["price_disc"] == -1.0


class TestEmbeddingMoments:
    def test_moments_and_pca_finish(self, spark):
        from graph500_spark.operators.simsearch import (
            KMEANS_SCALE,
            embedding_moments,
            pca_components,
        )

        # 2-dim toy "embeddings": y = 2x exactly → first PC along
        # (1, 2)/sqrt(5), second eigenvalue ~0
        rows = [(i, [i / 10.0, 2 * i / 10.0], 0) for i in range(-5, 6)]
        embs = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        m = embedding_moments(embs).collect()
        by = {(r.dim_i, r.dim_j): r for r in m}
        assert set(by) == {(0, 0), (0, 1), (1, 1)}
        s = KMEANS_SCALE // 10
        assert by[(0, 0)].n == 11
        assert by[(0, 0)].sum_i == 0                     # symmetric range
        assert by[(0, 0)].sum_ij == 110 * s * s          # Σ i² = 110
        assert by[(0, 1)].sum_ij == 220 * s * s
        assert by[(1, 1)].sum_ij == 440 * s * s

        vals, vecs = pca_components(
            [r.asDict() for r in m], n_components=2
        )
        assert vals[0] > 0 and abs(vals[1]) < 1e-6 * vals[0]
        v = vecs[:, 0]
        assert abs(abs(v[1] / v[0]) - 2.0) < 1e-9        # direction (1,2)


class TestCapPerSource:
    def test_cap_and_determinism(self, spark):
        from graph500_spark.operators.traindata import cap_per_source

        docs = spark.createDataFrame(
            [(i, f"t{i}", "en", f"s{i % 2}", 5) for i in range(20)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        out = cap_per_source(docs, cap=3)
        rows = out.collect()
        per = {}
        for r in rows:
            per.setdefault(r.source, []).append(r.doc_id)
        assert all(len(v) == 3 for v in per.values())
        # deterministic: a repartitioned input keeps the same set
        again = {
            (r.doc_id, r.source, r.rk)
            for r in cap_per_source(docs.repartition(7), cap=3).collect()
        }
        assert again == {(r.doc_id, r.source, r.rk) for r in rows}


class TestEventAnomaliesRobust:
    EV = (
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string"
    )

    def test_mad_threshold(self, spark):
        from graph500_spark.streaming.windows import event_anomalies_robust

        # values 1..9 (median 5, MAD 2) plus an outlier 100:
        # |100-5| = 95 > 3.5·MAD — but note median/MAD shift with the
        # outlier included: median of [1..9, 100] = 5.5, MAD = 2.5,
        # |100-5.5| = 94.5 > 8.75 → flagged; 9 stays (|9-5.5|=3.5 < 8.75)
        rows = [(i, 0, 1, "view", float(i), "") for i in range(1, 10)]
        rows.append((99, 0, 1, "view", 100.0, ""))
        ev = spark.createDataFrame(rows, self.EV)
        out = [r.event_id for r in event_anomalies_robust(ev).collect()]
        assert out == [99]

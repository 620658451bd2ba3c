"""The relational module's 100 TB claim, tested: orders ⋈ lineitem on
orderkey over co-bucketed tables must plan with ZERO shuffle exchange
— the metastore bucketing replaces both sides' hash repartition."""

from __future__ import annotations

import contextlib
import io as _io

import pytest
from pyspark.sql import functions as F

from graph500_spark.sources.io import write_bucketed_table

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestBucketedFactFactJoin:
    def test_orderkey_join_is_exchange_free(self, spark):
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            "l_orderkey", "l_quantity"
        )
        write_bucketed_table(orders, "b_orders", "o_orderkey", 8)
        write_bucketed_table(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem",
            "o_orderkey",
            8,
        )
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        joined = bo.join(bl, "o_orderkey").groupBy("o_orderkey").agg(
            F.sum("l_quantity").alias("q")
        )
        plan = plan_of(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        # and the answer matches the plain-parquet join
        expect = (
            orders.join(
                lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
                "o_orderkey",
            )
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert joined.exceptAll(expect).count() == 0
        assert expect.exceptAll(joined).count() == 0

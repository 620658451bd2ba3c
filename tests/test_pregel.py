"""Tests for the generic Pregel superstep engine and the
label-propagation vertex program built on it."""

from __future__ import annotations

from pyspark.sql import functions as F

from graph500_spark.operators.graph_build import build_clean_edges
from graph500_spark.operators.pregel import label_propagation, pregel


def _clean(spark, pairs):
    return build_clean_edges(
        spark.createDataFrame(pairs, "src: long, dst: long")
    )


class TestLabelPropagation:
    def test_converges_to_component_max(self, spark):
        # two components: {0,1,2} (max 2) and {10,11} (max 11)
        g = [(0, 1), (1, 2), (10, 11)]
        out = label_propagation(spark, _clean(spark, g), n_supersteps=5)
        labels = {r.vertex: r.label for r in out.collect()}
        assert labels == {0: 2, 1: 2, 2: 2, 10: 11, 11: 11}

    def test_partial_rounds_propagate_one_hop_per_step(self, spark):
        # path 0-1-2-3-4: after 1 superstep vertex 0 has only seen
        # vertex 1's initial label
        path = [(i, i + 1) for i in range(4)]
        out = label_propagation(spark, _clean(spark, path), n_supersteps=1)
        labels = {r.vertex: r.label for r in out.collect()}
        assert labels[0] == 1 and labels[3] == 4 and labels[4] == 4

    def test_until_unchanged_stops_at_fixpoint(self, spark):
        g = [(0, 1), (1, 2)]
        edges = _clean(spark, g)
        verts = (
            edges.select(F.col("src").alias("vertex"))
            .distinct()
            .withColumn("label", F.col("vertex"))
        )
        out = pregel(
            spark,
            edges.select("src", "dst"),
            verts,
            lambda e: e.select(
                F.col("dst").alias("vertex"), F.col("label").alias("msg")
            ),
            [F.max("msg").alias("max_msg")],
            lambda old, inbox: old.join(inbox, "vertex", "left").select(
                "vertex",
                F.greatest(
                    "label", F.coalesce("max_msg", F.col("label"))
                ).alias("label"),
            ),
            n_supersteps=50,  # fixpoint exit must fire long before 50
            until_unchanged=True,
        )
        assert {r.vertex: r.label for r in out.collect()} == {
            0: 2,
            1: 2,
            2: 2,
        }

"""transformWithStateInPandas running totals
(streaming/stateful.py): multi-batch drain must converge to the batch
aggregate exactly (integer cents), with intermediate rows showing
monotone growth.

The runtime path needs the protobuf package (absent in this
container), so the streaming tests skip without it; the processor's
fold logic is still unit-tested directly against pandas batches."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graph500_spark.streaming.stateful import (
    RunningTotalsProcessor,
    batch_totals,
    run_running_totals_to_memory,
    tws_available,
)

SF = "/root/testdata/sf0.001"

needs_tws = pytest.mark.skipif(
    not tws_available(),
    reason="transformWithState needs google.protobuf (not in container)",
)


class _FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = v


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state


class TestProcessorLogic:
    """Protocol-independent check of the fold: the processor run by
    hand over pandas batches must produce the exact batch totals."""

    def test_fold_matches_batch_math(self):
        p = RunningTotalsProcessor()
        p.init(_FakeHandle())
        b1 = pd.DataFrame({"user_id": [7, 7], "value": [1.25, 2.50]})
        out1 = list(p.handleInputRows((7,), iter([b1]), None))[0]
        assert out1.iloc[0].to_dict() == {
            "user_id": 7, "n_events": 2, "value_sum_c": 375,
        }
        b2 = pd.DataFrame({"user_id": [7], "value": [0.25]})
        out2 = list(p.handleInputRows((7,), iter([b2]), None))[0]
        assert out2.iloc[0].to_dict() == {
            "user_id": 7, "n_events": 3, "value_sum_c": 400,
        }


@needs_tws
class TestRunningTotals:
    @pytest.fixture(scope="class")
    def drained(self, spark, tmp_path_factory):
        events = spark.read.parquet(f"{SF}/events.parquet")
        src = str(tmp_path_factory.mktemp("tws") / "events_in")
        # 4 files → multiple micro-batches with maxFilesPerTrigger=1
        events.repartition(4).write.parquet(src)
        out = run_running_totals_to_memory(
            spark, src, max_files_per_trigger=1
        )
        return events, out

    def test_final_totals_equal_batch(self, spark, drained):
        events, out = drained
        # last emission per user = lifetime totals
        final = (
            out.withColumn(
                "rn",
                F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["w"])
                    .Window.partitionBy("user_id")
                    .orderBy(F.col("n_events").desc())
                ),
            )
            .filter(F.col("rn") == 1)
            .select("user_id", "n_events", "value_sum_c")
        )
        expect = batch_totals(events)
        assert final.exceptAll(expect).count() == 0
        assert expect.exceptAll(final).count() == 0

    def test_intermediate_rows_monotone(self, drained):
        _, out = drained
        # a user seen in multiple batches emits strictly growing counts
        multi = (
            out.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_emits"),
                F.countDistinct("n_events").alias("n_distinct"),
            )
            .filter(F.col("n_emits") > 1)
        )
        bad = multi.filter(F.col("n_distinct") != F.col("n_emits"))
        assert multi.count() > 0       # the 4-batch drain re-emits users
        assert bad.count() == 0        # every emission grew the count

"""Hive-style partitioned layouts (sources/io.py): round-trip
fidelity, partition-column recovery, and — the point — partition
PRUNING: a filter on the partition column must show up as a
PartitionFilter on the scan, not a post-scan filter."""

from __future__ import annotations

import contextlib
import io as _io

import pytest
from pyspark.sql import functions as F

from graph500_spark.sources.io import (
    read_partitioned,
    write_partitioned_corpus,
    write_partitioned_events,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path_factory.mktemp("part") / "corpus")
    write_partitioned_corpus(docs, path)
    return path


class TestPartitionedCorpus:
    def test_round_trip_rows(self, spark, corpus_path):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        back = read_partitioned(spark, corpus_path)
        assert back.count() == docs.count()
        # partition column recovered; full row fidelity
        a = docs.select("doc_id", "source", "n_chars")
        b = back.select("doc_id", "source", "n_chars")
        assert a.exceptAll(b).count() == 0

    def test_source_filter_is_partition_pruned(self, spark, corpus_path):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        src = docs.select("source").first().source
        q = read_partitioned(spark, corpus_path).filter(
            F.col("source") == src
        )
        plan = plan_of(q)
        # the filter lands in PartitionFilters on the scan node...
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and "source" in pf[0], plan
        # ...and the row count matches the unpartitioned filter
        expected = docs.filter(F.col("source") == src).count()
        assert q.count() == expected


class TestPartitionedEvents:
    def test_day_pruning(self, spark, tmp_path):
        events = spark.read.parquet(f"{SF}/events.parquet")
        path = str(tmp_path / "events")
        write_partitioned_events(events, path)
        back = read_partitioned(spark, path)
        assert back.count() == events.count()
        day = back.select("day").first().day
        q = back.filter(F.col("day") == day)
        plan = plan_of(q)
        pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
        assert pf and "day" in pf[0], plan
        assert q.count() > 0

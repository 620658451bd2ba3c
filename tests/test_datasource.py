"""Python DataSource surface (sources/datasource.py): format
registration, option handling, and bit-identity with the mapInPandas
library path."""

from __future__ import annotations

import pytest

from graph500_spark.sources.datasource import (
    GraphEdgeReader,
    register,
)
from graph500_spark.sources.generator import (
    generate_kronecker_edges,
    generate_random_edges,
)


@pytest.fixture()
def ds(spark):
    register(spark)
    return spark


class TestGraphEdgeDataSource:
    def test_rmat_matches_library_path(self, ds):
        out = ds.read.format("graph500").option("scale", "7").load()
        lib = generate_kronecker_edges(ds, scale=7)
        assert out.count() == (1 << 7) * 16
        assert out.exceptAll(lib).count() == 0
        assert lib.exceptAll(out).count() == 0

    def test_random_weighted_schema_and_values(self, ds):
        out = (
            ds.read.format("graph500")
            .option("scale", "6")
            .option("generator", "random")
            .option("weighted", "true")
            .load()
        )
        assert out.schema.simpleString() == (
            "struct<src:bigint,dst:bigint,weight:int>"
        )
        lib = generate_random_edges(ds, scale=6)
        assert out.select("src", "dst").exceptAll(lib).count() == 0
        w = {r.weight for r in out.select("weight").distinct().collect()}
        assert all(1 <= x <= 255 for x in w)

    def test_partitioning_invariance(self, ds):
        a = (
            ds.read.format("graph500")
            .option("scale", "6")
            .option("num_partitions", "1")
            .load()
        )
        b = (
            ds.read.format("graph500")
            .option("scale", "6")
            .option("num_partitions", "13")
            .load()
        )
        assert b.rdd.getNumPartitions() == 13
        assert a.exceptAll(b).count() == 0

    def test_missing_scale_rejected(self):
        with pytest.raises(ValueError, match="scale"):
            GraphEdgeReader({})

    def test_unknown_generator_rejected(self):
        with pytest.raises(ValueError, match="generator"):
            GraphEdgeReader({"scale": "6", "generator": "zipf"})

"""Spark 4 Python DataSource for the deterministic graph generators:
``spark.read.format("graph500").option("scale", "16").load()``.

The same vectorized kernels as ``sources/generator.py`` (SURVEY.md
S1/S2), exposed through Spark's pluggable source API instead of a
library call — so plain-SQL users, other languages sharing the
session, and tooling that speaks ``spark.read`` get the generator
without importing this package. The mapInPandas path remains the
primary programmatic surface; this is the catalog-facing twin.

Scale shape: identical to the library path — edge ``i`` is a pure
function of ``i`` (O(1) PRNG skip-ahead), partitions are disjoint
index ranges, so output is partitioning-invariant and the source
scales linearly with executors, no coordination. ``read`` yields
Arrow RecordBatches (zero-copy into the JVM) in bounded sub-batches
so executor memory stays flat regardless of partition size.

Options (all strings, Spark option conventions):
  * ``scale``       (required) — 2^scale vertices
  * ``edgefactor``  (default 16) — 2^scale · edgefactor edges
  * ``generator``   ``rmat`` (default) | ``random`` — S1 or S2 kernel
  * ``weighted``    ``true``/``false`` (default false) — spec weight
    stream column (S1 weighted tier)
  * ``max_weight``  (default 255)
  * ``userseed1`` / ``userseed2`` (defaults 2/3 — the spec seeds)
  * ``num_partitions`` (default 32)

Behavioral reference: the same lines generator.py cites
(/root/reference/generator/graph_generator.hpp:651-704, 570-600,
479-506); this module adds no new semantics, only the API surface.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_BATCH_ROWS = 1 << 16


class EdgeRangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class GraphEdgeDataSource(DataSource):
    """``format("graph500")`` — deterministic Kronecker / uniform edge
    stream as a first-class Spark source."""

    @classmethod
    def name(cls) -> str:
        return "graph500"

    def schema(self) -> str:
        if self.options.get("weighted", "false").lower() == "true":
            return "src long, dst long, weight int"
        return "src long, dst long"

    def reader(self, schema: StructType) -> DataSourceReader:
        return GraphEdgeReader(self.options)


class GraphEdgeReader(DataSourceReader):
    def __init__(self, options: dict):
        if "scale" not in options:
            raise ValueError(
                "graph500 source: required option 'scale' is missing"
            )
        self.scale = int(options["scale"])
        self.edgefactor = int(options.get("edgefactor", "16"))
        self.generator = options.get("generator", "rmat")
        if self.generator not in ("rmat", "random"):
            raise ValueError(
                f"graph500 source: unknown generator {self.generator!r}"
                " (expected 'rmat' or 'random')"
            )
        self.weighted = options.get("weighted", "false").lower() == "true"
        self.max_weight = int(options.get("max_weight", "255"))
        self.seed1 = int(options.get("userseed1", "2"))
        self.seed2 = int(options.get("userseed2", "3"))
        self.num_partitions = int(options.get("num_partitions", "32"))
        self.num_edges = (1 << self.scale) * self.edgefactor

    def partitions(self) -> list[EdgeRangePartition]:
        n_parts = max(1, min(self.num_partitions, self.num_edges))
        step = math.ceil(self.num_edges / n_parts)
        return [
            EdgeRangePartition(lo, min(lo + step, self.num_edges))
            for lo in range(0, self.num_edges, step)
        ]

    def read(self, partition: EdgeRangePartition) -> Iterator:
        # Heavy imports live here, on the executor, per the API contract.
        import numpy as np
        import pyarrow as pa

        from graph500_spark.sources.generator import (
            edge_weights_numpy,
            random_edges_numpy,
            rmat_edges_numpy,
        )

        kernel = (
            rmat_edges_numpy if self.generator == "rmat"
            else random_edges_numpy
        )
        for lo in range(partition.start, partition.end, _BATCH_ROWS):
            hi = min(lo + _BATCH_ROWS, partition.end)
            idx = np.arange(lo, hi, dtype=np.int64)
            src, dst = kernel(self.scale, idx, self.seed1, self.seed2)
            cols = [pa.array(src), pa.array(dst)]
            names = ["src", "dst"]
            if self.weighted:
                cols.append(
                    pa.array(
                        edge_weights_numpy(
                            idx, self.max_weight, self.seed1, self.seed2
                        ).astype(np.int32)
                    )
                )
                names.append("weight")
            yield pa.RecordBatch.from_arrays(cols, names=names)


def register(spark) -> None:
    """Make ``format("graph500")`` available on this session."""
    spark.dataSource.register(GraphEdgeDataSource)

"""Deterministic graph generators (SURVEY.md S1/S2/S3).

Spark shape: ``spark.range(0, num_edges)`` (an embarrassingly parallel
id stream, no input data) → ``mapInPandas`` over Arrow batches → the
vectorized NumPy kernel below. Because the PRNG is random-access
(state_i = A^(i·2^64) @ seed), the output is a pure function of the
edge index — identical for any partitioning, any executor count, any
batch size. That is what makes the generator correct on a 1000-executor
cluster without any coordination.

Behavioral reference (semantics only — the implementation is a
vectorized clean-room rewrite):
  * R-MAT kernel: RmatGraphGenerator::make_one_edge /
    generate_4way_bernoulli,
    /root/reference/generator/graph_generator.hpp:651-704
  * uniform-random kernel: RandomGraphGenerator::generateRange,
    graph_generator.hpp:570-600
  * initial edges (binary tree / Hamiltonian cycle):
    graph_generator.hpp:512-542
  * spec2010 parameters A=.57, B=C=.19 via numerators (5700, 1900),
    seeds (2, 3): /root/reference/mpi/benchmark_helper.hpp:308-314,
    /root/reference/mpi/parameters.h:190-191
  * per-edge state skip of edge_index * 2^64:
    graph_generator.hpp:690-692
  * weights in [1, max_weight]: skip(30*2^128 + 46*2^64 + i) + one
    draw, graph_generator.hpp:479-506 (spec semantics; the reference
    build actually stubs weights to 0xBEEF under a debug #if).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph500_spark.functions import prng
from graph500_spark.functions.scramble import scramble, scramble_constants

# spec2010 initiator numerators over denominator 10000: A=.57, B=C=.19
INITIATOR_A_NUMERATOR = 5700
INITIATOR_BC_NUMERATOR = 1900
INITIATOR_DENOMINATOR = 10000
# Rejection threshold for modulo-bias-free draws: 0xFFFFFFFF % 10000
_REJECT_LIMIT = 0xFFFFFFFF % INITIATOR_DENOMINATOR

USERSEED1 = 2
USERSEED2 = 3

_EDGE_STRIDE = 1 << 64  # each edge's PRNG stream starts i*2^64 steps in


def _draw_initiator(states: np.ndarray) -> np.ndarray:
    """One modulo-bias-free draw in [0, 10000) per lane, with the
    reference's rejection loop (val < 0xFFFFFFFF % 10000 → redraw)."""
    val = prng.get_uint(states)
    limit = np.uint64(_REJECT_LIMIT)
    reject = val < limit
    # Rejection probability ~3.4e-6 per draw; the masked loop nearly
    # always runs zero times.
    while reject.any():
        sub = states[:, reject]
        val[reject] = prng.get_uint(sub)
        states[:, reject] = sub
        reject = val < limit
    return val % np.uint64(INITIATOR_DENOMINATOR)


def rmat_edges_numpy(
    scale: int,
    edge_indices: np.ndarray,
    userseed1: int = USERSEED1,
    userseed2: int = USERSEED2,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized R-MAT: generate (src, dst) for a batch of edge indices.

    Per edge: recursive 4-way Bernoulli descent over `scale` levels with
    clip-and-flip for undirectedness, then scramble both endpoints.
    """
    idx = np.asarray(edge_indices, dtype=np.int64)
    seed = prng.make_mrg_seed(userseed1, userseed2)
    states = prng.skip_indexed(seed, _EDGE_STRIDE, idx)

    n = idx.shape[0]
    base_src = np.zeros(n, dtype=np.int64)
    base_tgt = np.zeros(n, dtype=np.int64)
    nverts = np.int64(1) << np.int64(scale)
    bc = INITIATOR_BC_NUMERATOR
    a = INITIATOR_A_NUMERATOR

    half = int(nverts)
    while half > 1:
        half //= 2
        val = _draw_initiator(states)
        # square decode: [0,bc)→1, [bc,2bc)→2, [2bc,2bc+a)→0, else→3,
        # expressed as boolean algebra on the three thresholds instead
        # of nested np.where chains (same values, fewer full-array
        # passes): src_off = square//2 is 1 exactly on squares 2,3;
        # tgt_off = square%2 is 1 exactly on squares 1,3.
        c1 = val < np.uint64(bc)
        c2 = val < np.uint64(2 * bc)
        not_c3 = val >= np.uint64(2 * bc + a)
        src_off = (~c1 & c2) | not_c3
        tgt_off = c1 | not_c3
        # Clip-and-flip: while the two prefixes are equal, keep
        # src<=tgt. src_off>tgt_off happens only on square 2
        # (src_off=1, tgt_off=0), where the flip swaps the two bits.
        flip = (base_src == base_tgt) & src_off & ~tgt_off
        base_src += half * (src_off & ~flip).astype(np.int64)
        base_tgt += half * (tgt_off | flip).astype(np.int64)

    val0, val1 = scramble_constants(userseed1, userseed2)
    return (
        scramble(base_src, scale, val0, val1),
        scramble(base_tgt, scale, val0, val1),
    )


def random_edges_numpy(
    scale: int,
    edge_indices: np.ndarray,
    userseed1: int = USERSEED1,
    userseed2: int = USERSEED2,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized uniform generator (S2): both endpoints uniform in
    [0, 2^scale), then scramble."""
    idx = np.asarray(edge_indices, dtype=np.int64)
    seed = prng.make_mrg_seed(userseed1, userseed2)
    states = prng.skip_indexed(seed, _EDGE_STRIDE, idx)
    mask = np.uint64((1 << scale) - 1)
    v0 = (prng.get_uint(states) & mask).astype(np.int64)
    v1 = (prng.get_uint(states) & mask).astype(np.int64)
    val0, val1 = scramble_constants(userseed1, userseed2)
    return scramble(v0, scale, val0, val1), scramble(v1, scale, val0, val1)


def edge_weights_numpy(
    edge_indices: np.ndarray,
    max_weight: int,
    userseed1: int = USERSEED1,
    userseed2: int = USERSEED2,
) -> np.ndarray:
    """Spec weight stream: weight_i = (uint_i % max_weight) + 1 with
    per-edge skip 30*2^128 + 46*2^64 + i (graph_generator.hpp:479-506)."""
    idx = np.asarray(edge_indices, dtype=np.int64)
    seed = prng.skip(
        prng.make_mrg_seed(userseed1, userseed2),
        30 * (1 << 128) + 46 * (1 << 64),
    )
    states = prng.skip_indexed(seed, 1, idx)
    return (prng.get_uint(states) % np.uint64(max_weight)).astype(
        np.int32
    ) + np.int32(1)


def generate_kronecker_edges(
    spark: SparkSession,
    scale: int,
    edgefactor: int = 16,
    userseed1: int = USERSEED1,
    userseed2: int = USERSEED2,
    num_partitions: int | None = None,
    weighted: bool = False,
    max_weight: int = 255,
) -> DataFrame:
    """S1: deterministic Kronecker (R-MAT) edge list as a DataFrame.

    2^scale vertices, 2^scale * edgefactor edges; may contain self
    loops and duplicates (construction dedups them), undirected
    semantics with one stored orientation — exactly the reference's
    raw edge list.
    """
    num_edges = (1 << scale) * edgefactor
    if num_partitions is None:
        num_partitions = max(
            1, min(spark.sparkContext.defaultParallelism * 4, num_edges // 65536 or 1)
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["id"].to_numpy(dtype=np.int64)
            src, dst = rmat_edges_numpy(scale, idx, userseed1, userseed2)
            out = {"src": src, "dst": dst}
            if weighted:
                out["weight"] = edge_weights_numpy(
                    idx, max_weight, userseed1, userseed2
                )
            yield pd.DataFrame(out)

    schema = "src long, dst long" + (", weight int" if weighted else "")
    return (
        spark.range(0, num_edges, numPartitions=num_partitions)
        .mapInPandas(gen, schema=schema)
    )


def generate_random_edges(
    spark: SparkSession,
    scale: int,
    edgefactor: int = 16,
    userseed1: int = USERSEED1,
    userseed2: int = USERSEED2,
    num_partitions: int | None = None,
) -> DataFrame:
    """S2: uniform-endpoint generator, same scramble."""
    num_edges = (1 << scale) * edgefactor
    if num_partitions is None:
        num_partitions = max(1, spark.sparkContext.defaultParallelism * 2)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["id"].to_numpy(dtype=np.int64)
            src, dst = random_edges_numpy(scale, idx, userseed1, userseed2)
            yield pd.DataFrame({"src": src, "dst": dst})

    return spark.range(0, num_edges, numPartitions=num_partitions).mapInPandas(
        gen, schema="src long, dst long"
    )


def generate_initial_edges(
    spark: SparkSession,
    scale: int,
    kind: str,
    userseed1: int = USERSEED1,
    userseed2: int = USERSEED2,
) -> DataFrame:
    """S3: optional scaffold edges (spec2012 path).

    kind='binary_tree': edge (scramble(i+1), scramble((i+1)/2)) for
    i in [0, 2^scale-1); kind='hamiltonian_cycle': edge
    (scramble(i), scramble((i+1) mod 2^scale)).
    Ref: generateInitialEdge, graph_generator.hpp:512-542.
    """
    nverts = 1 << scale
    if kind == "binary_tree":
        num = nverts - 1
    elif kind == "hamiltonian_cycle":
        num = nverts
    else:
        raise ValueError(f"unknown initial edge kind: {kind}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        val0, val1 = scramble_constants(userseed1, userseed2)
        for pdf in batches:
            idx = pdf["id"].to_numpy(dtype=np.int64)
            if kind == "binary_tree":
                v0, v1 = idx + 1, (idx + 1) // 2
            else:
                v0, v1 = idx, (idx + 1) % nverts
            yield pd.DataFrame(
                {
                    "src": scramble(v0, scale, val0, val1),
                    "dst": scramble(v1, scale, val0, val1),
                }
            )

    return spark.range(0, num).mapInPandas(gen, schema="src long, dst long")

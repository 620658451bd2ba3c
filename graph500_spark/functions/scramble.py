"""Vertex scramble permutation (SURVEY.md S5).

The Graph500 generator applies a cheap pseudo-permutation of
[0, 2^scale) to every generated endpoint instead of a true random
permutation. Behavioral reference:
/root/reference/generator/graph_generator.hpp:405-469
(bitreverse + scramble) and the derivation of the two scramble
constants from the seeded PRNG (graph_generator.hpp:374-387).

All arithmetic is uint64 wrap-around (NumPy uint64 semantics match C).
"""

from __future__ import annotations

import numpy as np

from graph500_spark.functions import prng

_M1 = np.uint64(0x4519840211493211)
_M2 = np.uint64(0x3050852102C843A5)


def bitreverse(x: np.ndarray) -> np.ndarray:
    """Reverse the 64 bits of each element (vectorized).

    Ref: GraphGeneratorBase::bitreverse, graph_generator.hpp:405-451.
    """
    x = x.astype(np.uint64)
    x = (x >> np.uint64(32)) | (x << np.uint64(32))
    m = np.uint64(0x0000FFFF0000FFFF)
    x = ((x >> np.uint64(16)) & m) | ((x & m) << np.uint64(16))
    m = np.uint64(0x00FF00FF00FF00FF)
    x = ((x >> np.uint64(8)) & m) | ((x & m) << np.uint64(8))
    m = np.uint64(0x0F0F0F0F0F0F0F0F)
    x = ((x >> np.uint64(4)) & m) | ((x & m) << np.uint64(4))
    m = np.uint64(0x3333333333333333)
    x = ((x >> np.uint64(2)) & m) | ((x & m) << np.uint64(2))
    m = np.uint64(0x5555555555555555)
    x = ((x >> np.uint64(1)) & m) | ((x & m) << np.uint64(1))
    return x


def scramble_constants(userseed1: int, userseed2: int) -> tuple[int, int]:
    """Derive (val0, val1) exactly as the generator constructor does:
    seed → skip(50*2^128 + 7*2^64) → four uint draws combined as
    v = draw*0xFFFFFFFF + draw (uint64 wrap).

    Ref: graph_generator.hpp:376-387.
    """
    st = prng.skip(
        prng.make_mrg_seed(userseed1, userseed2), 50 * (1 << 128) + 7 * (1 << 64)
    )
    mask = (1 << 64) - 1
    val0 = int(prng.get_uint(st)[0])
    val0 = (val0 * 0xFFFFFFFF) & mask
    val0 = (val0 + int(prng.get_uint(st)[0])) & mask
    val1 = int(prng.get_uint(st)[0])
    val1 = (val1 * 0xFFFFFFFF) & mask
    val1 = (val1 + int(prng.get_uint(st)[0])) & mask
    return val0, val1


def scramble(
    v: np.ndarray, scale: int, val0: int, val1: int
) -> np.ndarray:
    """Apply the pseudo-permutation to a vector of vertex ids.

    Ref: GraphGeneratorBase::scramble, graph_generator.hpp:460-469.
    """
    val0_u, val1_u = np.uint64(val0), np.uint64(val1)
    shift = np.uint64(64 - scale)
    with np.errstate(over="ignore"):
        x = v.astype(np.uint64)
        x = x + val0_u + val1_u
        x = x * (val0_u | _M1)
        x = bitreverse(x) >> shift
        x = x * (val1_u | _M2)
        x = bitreverse(x) >> shift
    return x.astype(np.int64)

"""PRNG/scramble unit tests: skip-ahead correctness, vectorization
consistency, and determinism — SURVEY.md §7.3's highest-precision-risk
component."""

from __future__ import annotations

import numpy as np

from graph500_spark.functions import prng
from graph500_spark.functions.scramble import bitreverse, scramble, scramble_constants


def test_skip_equals_sequential_steps():
    st = prng.make_mrg_seed(2, 3)
    seq = st.copy()
    for _ in range(12345):
        prng.get_uint(seq)
    assert np.array_equal(prng.skip(st, 12345), seq)


def test_skip_indexed_matches_scalar_skip():
    st = prng.make_mrg_seed(2, 3)
    idx = np.array([0, 1, 7, 255, 256, 65536], dtype=np.int64)
    batch = prng.skip_indexed(st, 1 << 64, idx)
    for j, i in enumerate(idx):
        ref = prng.skip(st, (1 << 64) * int(i))
        assert np.array_equal(batch[:, j : j + 1], ref)


def test_uint_range_and_determinism():
    st = prng.make_mrg_seed(2, 3)
    vals = [int(prng.get_uint(st)[0]) for _ in range(100)]
    assert all(0 <= v < prng.MOD for v in vals)
    st2 = prng.make_mrg_seed(2, 3)
    vals2 = [int(prng.get_uint(st2)[0]) for _ in range(100)]
    assert vals == vals2


def test_make_random_numbers_position_offset():
    # stream position p must equal dropping the first p values
    a = prng.make_random_numbers(10, 2, 3, 0)
    b = prng.make_random_numbers(7, 2, 3, 3)
    assert np.allclose(a[3:], b, rtol=0, atol=0)
    assert ((a >= 0) & (a < 1)).all()


def test_bitreverse_involution_and_known_values():
    x = np.array([0, 1, 0x8000000000000000, 0xDEADBEEF], dtype=np.uint64)
    assert np.array_equal(bitreverse(bitreverse(x)), x)
    assert int(bitreverse(np.array([1], dtype=np.uint64))[0]) == 1 << 63


def test_scramble_is_permutation_small_scale():
    scale = 10
    val0, val1 = scramble_constants(2, 3)
    v = np.arange(1 << scale, dtype=np.int64)
    s = scramble(v, scale, val0, val1)
    assert s.min() >= 0 and s.max() < (1 << scale)
    assert len(np.unique(s)) == 1 << scale  # bijective on [0, 2^scale)

"""Property-based tests (hypothesis) for the PRNG and scramble
kernels — pure NumPy, no Spark. These are the correctness backbone of
distributed generation: skip-ahead composition is exactly what lets
every executor compute its slice independently."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from graph500_spark.functions import prng
from graph500_spark.functions.scramble import (
    bitreverse,
    scramble,
    scramble_constants,
)

SEEDS = st.integers(min_value=0, max_value=2**31 - 2)
EXP = st.integers(min_value=0, max_value=2**140)


@given(SEEDS, SEEDS, EXP, EXP)
@settings(max_examples=25, deadline=None)
def test_skip_composes_additively(s1, s2, a, b):
    # state ∘ skip(a+b) == (state ∘ skip(a)) ∘ skip(b): the algebraic
    # fact that makes per-index random access ≡ sequential stepping
    seed = prng.make_mrg_seed(s1, s2)
    lhs = prng.skip(seed.copy(), a + b)
    rhs = prng.skip(prng.skip(seed.copy(), a), b)
    assert np.array_equal(lhs, rhs)


@given(SEEDS, SEEDS, st.integers(min_value=1, max_value=5000))
@settings(max_examples=20, deadline=None)
def test_skip_one_equals_orig_step_stream(s1, s2, pos):
    # skip(n) then draw == draw n+1 times sequentially (last value):
    # the skip matrix advances the SAME recurrence the draw steps
    seed = prng.make_mrg_seed(s1, s2)
    jumped = prng.skip(seed.copy(), pos)
    expect = prng.get_uint(jumped)[0]
    seq = seed.copy()
    for _ in range(pos + 1):
        got = prng.get_uint(seq)[0]
    assert got == expect


@given(
    SEEDS,
    SEEDS,
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=32),
)
@settings(max_examples=25, deadline=None)
def test_skip_indexed_matches_scalar_skip(s1, s2, idx):
    seed = prng.make_mrg_seed(s1, s2)
    batch = prng.skip_indexed(seed, 1 << 64, np.array(idx, dtype=np.int64))
    for j, i in enumerate(idx):
        scalar = prng.skip(seed.copy(), (1 << 64) * i)
        assert np.array_equal(batch[:, j], scalar[:, 0])


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=64))
@settings(max_examples=50, deadline=None)
def test_bitreverse_is_an_involution(vals):
    x = np.array(vals, dtype=np.uint64)
    assert np.array_equal(bitreverse(bitreverse(x)), x)


@given(SEEDS, SEEDS, st.integers(min_value=4, max_value=20))
@settings(max_examples=15, deadline=None)
def test_scramble_is_a_permutation(s1, s2, scale):
    # the scramble must be a bijection on [0, 2^scale): collisions
    # would silently merge vertices of the generated graph
    n = 1 << scale
    val0, val1 = scramble_constants(s1, s2)
    out = scramble(np.arange(n, dtype=np.int64), scale, val0, val1)
    assert out.min() >= 0 and out.max() < n
    assert len(np.unique(out)) == n

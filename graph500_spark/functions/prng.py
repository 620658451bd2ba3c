"""Splittable MRG pseudo-random number generator (SURVEY.md S4).

This is the public Graph500 reference generator's PRNG: the multiple
recursive generator from L'Ecuyer, Blouin & Couture 1993 (table 3,
m = 2^31 - 1, k = 5 — the same generator as in the GNU Scientific
Library), with O(1) random-access skip-ahead. Behavioral reference:
/root/reference/generator/splittable_mrg.c:185-276 and
/root/reference/generator/mod_arith_64bit.h.

Clean-room design notes (deliberately different from the reference):
  * The reference ships a 6207-line precomputed table of byte-indexed
    transition matrices (mrg_transitions.c). We instead compute
    A^exponent at runtime by square-and-multiply over the plain 5x5
    companion matrix mod 2^31-1 (arbitrary-precision Python ints, so
    exponents like 50*2^128 + 7*2^64 are exact). Matrices are memoized;
    per-call cost is ~log2(exponent) 5x5 modular matmuls — microseconds.
  * State is vectorized: a (5, n) uint64 NumPy array holds n independent
    generator states so one call steps every edge's generator at once
    (the Arrow/pandas-UDF-friendly shape). Products of two values
    < 2^31 fit in uint64; we reduce mod m after every multiply-add to
    stay in range.

The recurrence (state z1..z5, m = 2^31 - 1):
    z_new = (107374182 * z1 + 104480 * z5) mod m
    (z1..z5) <- (z_new, z1, z2, z3, z4)
i.e. the companion matrix A = [[x,0,0,0,y],[1,0,0,0,0],[0,1,0,0,0],
[0,0,1,0,0],[0,0,0,1,0]] with x = 107374182, y = 104480.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

MOD = (1 << 31) - 1  # 2^31 - 1, prime
MRG_X = 107374182
MRG_Y = 104480

# Exact float constants used by the reference to map two 31-bit draws to
# a double in [0,1): (2^31-1)^-1 and (2^31-1)^-2
_DBL_C1 = 0.000000000465661287524579692
_DBL_C2 = 0.0000000000000000002168404346990492787

Matrix = tuple[tuple[int, ...], ...]  # 5x5, entries in [0, MOD)

_A: Matrix = (
    (MRG_X, 0, 0, 0, MRG_Y),
    (1, 0, 0, 0, 0),
    (0, 1, 0, 0, 0),
    (0, 0, 1, 0, 0),
    (0, 0, 0, 1, 0),
)

_IDENTITY: Matrix = tuple(
    tuple(1 if i == j else 0 for j in range(5)) for i in range(5)
)


def _mat_mul(m: Matrix, n: Matrix) -> Matrix:
    return tuple(
        tuple(
            sum(m[i][k] * n[k][j] for k in range(5)) % MOD for j in range(5)
        )
        for i in range(5)
    )


@lru_cache(maxsize=4096)
def skip_matrix(exponent: int) -> Matrix:
    """A^exponent mod (2^31-1) by binary exponentiation (memoized)."""
    if exponent == 0:
        return _IDENTITY
    half = skip_matrix(exponent >> 1)
    sq = _mat_mul(half, half)
    return _mat_mul(sq, _A) if exponent & 1 else sq


def make_mrg_seed(userseed1: int, userseed2: int) -> np.ndarray:
    """Spread two 64-bit seeds into the 5-value nonzero state.

    Ref: make_mrg_seed, /root/reference/generator/graph_generator.hpp:327-334.
    Returns shape (5, 1) uint64.
    """
    u1, u2 = userseed1 & (2**64 - 1), userseed2 & (2**64 - 1)
    z = [
        (u1 & 0x3FFFFFFF) + 1,
        ((u1 >> 30) & 0x3FFFFFFF) + 1,
        (u2 & 0x3FFFFFFF) + 1,
        ((u2 >> 30) & 0x3FFFFFFF) + 1,
        ((u2 >> 60) << 4) + (u1 >> 60) + 1,
    ]
    return np.array(z, dtype=np.uint64).reshape(5, 1)


def _fold31(x: np.ndarray) -> np.ndarray:
    """One Mersenne fold: x (mod 2^31-1)-congruent value with 31 fewer
    high bits (x = hi·2^31 + lo ≡ hi + lo). Cheap vectorized ops in
    place of uint64 division — hardware 64-bit modulo costs ~20-40
    cycles per lane and does not vectorize."""
    return (x & np.uint64(MOD)) + (x >> np.uint64(31))


def apply_matrix(
    mat: Matrix, states: np.ndarray, out: np.ndarray | None = None
) -> np.ndarray:
    """(5,5) matrix × (5,n) state batch, all mod 2^31-1.

    Reduction strategy: each product (< 2^62) is folded once to < 2^32,
    the 5-term sum stays < 2^35, and the row total is folded twice plus
    one conditional subtract — full canonical reduction with no uint64
    division (Mersenne-prime fold, exact congruence mod 2^31-1).
    ``out`` (5,n) receives the result without an extra allocation; it
    must not alias ``states``.
    """
    m = np.asarray(mat, dtype=np.uint64)
    if out is None:
        out = np.empty_like(states)
    mod = np.uint64(MOD)
    for i in range(5):
        acc = np.zeros(states.shape[1], dtype=np.uint64)
        for k in range(5):
            if mat[i][k]:
                acc += _fold31(m[i, k] * states[k])
        # acc < 5·2^32 < 2^35 → fold to < 2^31 + 2^4, one subtract
        acc = _fold31(_fold31(acc))
        out[i] = np.where(acc >= mod, acc - mod, acc)
    return out


def skip(states: np.ndarray, exponent: int) -> np.ndarray:
    """Advance every state in the batch by `exponent` steps (O(1) in n).

    Equivalent to the reference's mrg_skip(state, high, mid, low) with
    exponent = high*2^128 + mid*2^64 + low
    (/root/reference/generator/splittable_mrg.c:185-199).
    """
    return apply_matrix(skip_matrix(exponent), states)


def skip_indexed(
    seed: np.ndarray, stride_exponent: int, indices: np.ndarray
) -> np.ndarray:
    """Per-lane skip: lane j gets seed advanced by stride_exponent * indices[j].

    This is the random-access property that makes generation
    embarrassingly parallel: state_i = (A^stride)^i @ seed, computed for
    a whole batch by binary decomposition of the index vector — one
    masked 5x5 matvec per index bit instead of a per-lane loop.
    """
    idx = np.asarray(indices, dtype=np.uint64)
    n = idx.shape[0]
    if n == 0:
        return np.repeat(seed, n, axis=1)
    # Consecutive-run fast path (the generator's actual shape: Arrow
    # batches over spark.range are contiguous index slices). With
    # M = A^stride, lane j holds M^(base+j) @ seed; given the first
    # `filled` lanes, the next `filled` are M^filled applied to them —
    # block doubling computes all n lanes in ~ONE full-width matvec of
    # total work instead of ~bit_length(idx) masked matvecs with
    # gather/scatter copies (measured 67% of R-MAT kernel CPU).
    # Exact: every step is the same 5x5 modular matmul, just batched.
    if n > 1 and int(idx[-1]) - int(idx[0]) == n - 1:
        d = np.diff(idx.astype(np.int64))
        if bool(np.all(d == 1)):
            base = int(idx[0])
            states = np.empty((5, n), dtype=np.uint64)
            states[:, 0:1] = (
                apply_matrix(skip_matrix(stride_exponent * base), seed)
                if base
                else seed
            )
            filled = 1
            while filled < n:
                take = min(filled, n - filled)
                step = skip_matrix(stride_exponent * filled)
                apply_matrix(
                    step,
                    states[:, :take],
                    out=states[:, filled : filled + take],
                )
                filled += take
            return states
    states = np.repeat(seed, n, axis=1)
    max_bits = int(idx.max()).bit_length()
    for bit in range(max_bits):
        mask = ((idx >> np.uint64(bit)) & np.uint64(1)).astype(bool)
        if mask.any():
            step = skip_matrix(stride_exponent * (1 << bit))
            states[:, mask] = apply_matrix(step, states[:, mask])
    return states


def get_uint(states: np.ndarray) -> np.ndarray:
    """One original-matrix step per lane; returns new z1 in [0, 2^31-1).

    Ref: mrg_orig_step / mrg_get_uint_orig,
    /root/reference/generator/splittable_mrg.c:171-181,254-258.
    Mutates `states` in place.
    """
    # x·z1 + y·z5 < 2^58 + 2^48: two Mersenne folds + one conditional
    # subtract give the canonical residue without uint64 division.
    acc = _fold31(
        _fold31(np.uint64(MRG_X) * states[0] + np.uint64(MRG_Y) * states[4])
    )
    new_elt = np.where(acc >= np.uint64(MOD), acc - np.uint64(MOD), acc)
    states[4] = states[3]
    states[3] = states[2]
    states[2] = states[1]
    states[1] = states[0]
    states[0] = new_elt
    return new_elt


def get_double(states: np.ndarray) -> np.ndarray:
    """Two uint draws → double in [0,1), same float combination as the
    reference (mrg_get_double_orig, splittable_mrg.c:261-265)."""
    u1 = get_uint(states).astype(np.float64)
    u2 = get_uint(states).astype(np.float64)
    return u1 * _DBL_C1 + u2 * _DBL_C2


def make_random_numbers(
    nvalues: int, userseed1: int, userseed2: int, position: int
) -> np.ndarray:
    """Reference-compatible random-access double stream.

    Ref: make_random_numbers, graph_generator.hpp:338-354 — seed, skip
    by 2*2^128 + 2*position (each double consumes two uints), then draw.
    """
    st = skip(make_mrg_seed(userseed1, userseed2), 2 * (1 << 128) + 2 * position)
    out = np.empty(nvalues, dtype=np.float64)
    for i in range(nvalues):
        out[i] = get_double(st)[0]
    return out

"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.

Shingling and hashing are JVM Column algebra (md5 intrinsic +
higher-order array expressions); the per-row signature kernels
(minhash mins, simhash bit votes) are Arrow-vectorized pandas_udfs by
default — numpy broadcasts beat interpreted lambda folds ~10× — with
a pure-Column tier behind ``vectorized=False`` that computes
identical values. LSH banding is an explode + hash-shuffle groupBy,
pair verification is an equi-join on bucket keys. Each operator has a
mechanically mirrored DuckDB SQL (the *_SQL constants / builders) for
the oracle gate.

Scale notes (100 TB design point):
  * Exact dedup: one hash shuffle on the text hash — map-side partial
    aggregation applies.
  * MinHash/LSH: signatures are per-row (narrow); candidate generation
    shuffles once on (band, key); verification joins only bucket-mates
    — never all-pairs. Band count / rows-per-band tune the
    recall/cost curve without changing the plan shape.
  * SimHash: per-row signature + join on exact bucket; hamming check
    is bit_count(xor) — JVM intrinsic.
  * n-gram Jaccard is the *verifier* — quadratic, so it only ever runs
    on LSH/blocked candidates (the all-pairs form here blocks on
    `source`, standing in for the block key a real pipeline derives).
  * Embedding near-dup blocks on `label` (≈ a coarse IVF cell).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph500_spark.operators.text import (
    DEFAULT_HASH,
    DUCK_TOKENS,
    HASH_MOD,
    SPARK_TOKENS,
    duck_strhash,
    spark_strhash,
)

SHINGLE_N = 3
K_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = 4
# minhash_near_duplicates takes the distinct-set (sid-level) route
# only when distinct shingle sets number under this fraction of docs:
# the sid path's band-join/verify work shrinks with the SQUARE of the
# replication factor, but its doc↔sid mapping and expansion joins are
# fixed overhead that a mostly-unique corpus never earns back.
SID_COLLAPSE_RATIO = 0.7
# 60-bit fingerprints (matching the 60-bit md5 hash tier): Manku
# blocking at max_hamming=3 gets 4 chunks x 15 bits = 32768 buckets
# per chunk index — real selectivity at corpus scale (the round-1
# 16-bit/4-bit version degenerated toward all-pairs).
SIMHASH_BITS = 60

# Deterministic universal-hash parameters (inlined identically in both
# dialects): h_j(x) = (a_j * (x mod M) + b_j) mod M, M = 2^31-1.
# x is reduced BEFORE the multiply: shingle hashes are 60-bit, so
# a_j * x would overflow int64 in both engines.
MINHASH_A = [(1103515245 * (j + 1)) % HASH_MOD for j in range(K_MINHASH)]
MINHASH_B = [(12345 + 777 * j) % HASH_MOD for j in range(K_MINHASH)]

# ---------------------------------------------------------------------------
# Shingles (token 3-grams) and their hashes
# ---------------------------------------------------------------------------

# guard: sequence(1, n) with n<1 must yield no shingles (Spark's
# sequence(1,0) counts DOWN, so the CASE is load-bearing)


def spark_shingles(n: int) -> str:
    return (
        f"CASE WHEN size({SPARK_TOKENS}) < {n} THEN array()"
        f" ELSE transform(sequence(1, size({SPARK_TOKENS}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({SPARK_TOKENS}, i, {n}))) END"
    )


def duck_shingles(n: int) -> str:
    return (
        f"CASE WHEN len({DUCK_TOKENS}) < {n} THEN []"
        f" ELSE list_transform(generate_series(1, len({DUCK_TOKENS}) - {n - 1}),"
        f" i -> array_to_string({DUCK_TOKENS}[i:i + {n - 1}], ' ')) END"
    )


def spark_shingle_hashes(n: int) -> str:
    return f"array_distinct(transform({spark_shingles(n)}, s -> {spark_strhash('s')}))"


def duck_shingle_hashes(n: int) -> str:
    return f"list_distinct(list_transform({duck_shingles(n)}, s -> {duck_strhash('s')}))"


_SPARK_SHINGLE_HASHES = spark_shingle_hashes(SHINGLE_N)
_DUCK_SHINGLE_HASHES = duck_shingle_hashes(SHINGLE_N)


# Caches created by this module (shingle sets, minhash signatures,
# simhash fingerprints) are TRACKED here. Lifecycle contract: the
# CALLER owns cache release — the returned DataFrames are lazy, so the
# operators cannot unpersist what their consumers haven't evaluated
# yet. A long-lived session processing many distinct corpora should
# call release_caches() between corpora (or spark.catalog.clearCache()
# for a blunt global reset); short-lived jobs can ignore this — blocks
# evict LRU and die with the session.
_TRACKED_CACHES: list[DataFrame] = []


def _track(df: DataFrame) -> DataFrame:
    _TRACKED_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every cache this module has created (see the
    lifecycle note above). Returns the number released."""
    n = len(_TRACKED_CACHES)
    while _TRACKED_CACHES:
        _TRACKED_CACHES.pop().unpersist()
    return n


def shingle_hashes(docs: DataFrame, cached: bool = True) -> DataFrame:
    """[doc_id, shingles: array<long>] — distinct hashed token 3-grams.

    Cached by default: the shingle sets are the shared intermediate of
    the whole dedup family (minhash signatures, LSH verify, n-gram
    Jaccard), and Spark's cache manager dedups the identical plan
    across call sites, so tokenize+shingle+hash runs ONCE per corpus
    no matter how many stages consume it. At 100 TB this is the
    standard LSH persist point (MEMORY_AND_DISK, spills). Cache
    lifecycle is caller-owned — see release_caches()."""
    out = docs.select(
        "doc_id", F.expr(_SPARK_SHINGLE_HASHES).alias("shingles")
    )
    return _track(out.cache()) if cached else out


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(docs: DataFrame) -> DataFrame:
    """Exact-text dedup groups: [text_hash, rep_doc_id, n_copies].
    rep_doc_id = min doc id of the group (the canonical survivor)."""
    return (
        docs.select(
            "doc_id", F.expr(spark_strhash("text")).cast("long").alias("text_hash")
        )
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


EXACT_DUPLICATES_SQL = (
    f"SELECT CAST({duck_strhash('text')} AS BIGINT) AS text_hash,"
    " MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies"
    " FROM documents GROUP BY 1"
)

# ---------------------------------------------------------------------------
# MinHash signatures + LSH banding
# ---------------------------------------------------------------------------


def _spark_minhash_cols() -> list[str]:
    cols = []
    for j in range(K_MINHASH):
        a, b = MINHASH_A[j], MINHASH_B[j]
        cols.append(
            f"coalesce(array_min(transform(shingles,"
            f" x -> ({a}L * (x % {HASH_MOD}) + {b}L) % {HASH_MOD})), 0L)"
        )
    return cols


def _duck_minhash_cols() -> list[str]:
    cols = []
    for j in range(K_MINHASH):
        a, b = MINHASH_A[j], MINHASH_B[j]
        cols.append(
            f"coalesce(list_min(list_transform(shingles,"
            f" x -> ({a} * (x % {HASH_MOD}) + {b}) % {HASH_MOD})), 0)"
        )
    return cols


def _minhash_vec_udf():
    """Arrow-vectorized minhash kernel: all K universal hashes + mins
    in one numpy broadcast per row. EXACTLY the expression tier's
    int64 arithmetic ((a*(x mod M)+b) mod M; products < 2^62, no
    overflow), so the two tiers are value-identical — measured ~10x
    over the interpreted higher-order-function lambdas (7 us per
    element-eval adds up: K x shingles x docs evals)."""
    import numpy as np

    a_col = np.array(MINHASH_A, dtype=np.int64)[:, None]
    b_col = np.array(MINHASH_B, dtype=np.int64)[:, None]
    empty = [0] * K_MINHASH

    @F.pandas_udf("array<long>")
    def mh(shingles: pd.Series) -> pd.Series:
        out = []
        for arr in shingles:
            if arr is None or len(arr) == 0:
                out.append(empty)
            else:
                x = np.asarray(arr, dtype=np.int64) % HASH_MOD
                out.append(
                    ((a_col * x[None, :] + b_col) % HASH_MOD)
                    .min(axis=1)
                    .tolist()
                )
        return pd.Series(out)

    return mh


def minhash_signatures(docs: DataFrame, vectorized: bool = True) -> DataFrame:
    """[doc_id, mh00..mh15] — K=16 minhash values over shingle hashes.

    ``vectorized=True`` (default) computes the K mins in one Arrow
    batch kernel (ExtractPythonUDFs materializes it once as its own
    ArrowEvalPython node — the element_at projections below read the
    attribute, they cannot re-trigger it); ``False`` keeps the pure
    Column-algebra tier (identical values, interpreted per element)."""
    sh = shingle_hashes(docs)
    if vectorized:
        withmh = sh.select(
            "doc_id", _minhash_vec_udf()(F.col("shingles")).alias("mh")
        )
        return withmh.select(
            "doc_id",
            *[
                F.element_at("mh", j + 1).cast("long").alias(f"mh{j:02d}")
                for j in range(K_MINHASH)
            ],
        )
    return sh.select(
        "doc_id",
        *[
            F.expr(e).cast("long").alias(f"mh{j:02d}")
            for j, e in enumerate(_spark_minhash_cols())
        ],
    )


MINHASH_SIGNATURES_SQL = (
    "SELECT doc_id, "
    + ", ".join(
        f"CAST({e} AS BIGINT) AS mh{j:02d}"
        for j, e in enumerate(_duck_minhash_cols())
    )
    + f" FROM (SELECT doc_id, {_DUCK_SHINGLE_HASHES} AS shingles FROM documents)"
)


def _band_key_exprs() -> list[str]:
    """band key = 'mh00_mh01_mh02_mh03' etc — same in both dialects
    via concat over string casts."""
    keys = []
    for b in range(N_BANDS):
        cols = [
            f"CAST(mh{b * ROWS_PER_BAND + r:02d} AS VARCHAR)"
            for r in range(ROWS_PER_BAND)
        ]
        keys.append(" || '_' || ".join(cols))
    return keys


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """[doc_a, doc_b] — pairs sharing at least one full LSH band.
    doc_a < doc_b; distinct across bands."""
    # The SIGNATURES are cached (the natural persist point of a
    # production LSH pipeline): without the cache barrier Catalyst's
    # CollapseProject inlines each mh column into the band-key concat,
    # re-evaluating the full shingle+hash pipeline once per mh (16x —
    # measured 5.5s vs 0.4s at sf0.1). Band keys derived from the
    # cached signatures are cheap attribute concats, so the banded
    # table needs no second cache even though both join sides read it.
    sig = _track(minhash_signatures(docs).cache())
    keys = F.array(
        *[
            F.expr(key.replace("VARCHAR", "STRING"))
            for key in _band_key_exprs()
        ]
    )
    bands = sig.select(
        "doc_id", F.posexplode(keys).alias("band", "key")
    )
    left = bands.select("band", "key", F.col("doc_id").alias("doc_a"))
    right = bands.select("band", "key", F.col("doc_id").alias("doc_b"))
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def lsh_candidate_pairs_sql() -> str:
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, {key} AS key FROM sig"
        for b, key in enumerate(_band_key_exprs())
    )
    return (
        f"WITH sig AS ({MINHASH_SIGNATURES_SQL}),"
        f" bands AS ({band_selects})"
        " SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b"
        " FROM bands a JOIN bands b"
        " ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id"
    )


def minhash_jaccard_calibration(docs: DataFrame) -> DataFrame:
    """[doc_a, doc_b, est_matches, est_jaccard_ppm, exact_jaccard_ppm,
    err_ppm] — per LSH candidate pair, the K=16 signature-match
    Jaccard ESTIMATE next to the exact shingle-set Jaccard: the
    calibration table a dedup pipeline reads to set its LSH
    band/threshold operating point (Broder's estimator: P[min hashes
    match] = J, so matches/K is an unbiased estimate whose error this
    table measures against ground truth on the candidate set).

    Scale shape: candidates come from the banded equi-join (never
    all-pairs); signatures and shingle sets join back by doc key.
    Exact Jaccard on the pair set is the same VERIFIER-tier cost the
    near-dup operator already pays."""
    sig = _track(minhash_signatures(docs).cache())
    cands = lsh_candidate_pairs(docs)
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{j:02d}").alias(f"a{j:02d}") for j in range(K_MINHASH)],
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{j:02d}").alias(f"b{j:02d}") for j in range(K_MINHASH)],
    )
    sh = shingle_hashes(docs)
    sa = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    sb = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    matches = sum(
        F.when(F.col(f"a{j:02d}") == F.col(f"b{j:02d}"), 1).otherwise(0)
        for j in range(K_MINHASH)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    est = (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            matches.cast("long").alias("est_matches"),
            F.round(matches * 1_000_000.0 / K_MINHASH)
            .cast("long")
            .alias("est_jaccard_ppm"),
            F.round(inter * 1_000_000.0 / F.greatest(union, F.lit(1)))
            .cast("long")
            .alias("exact_jaccard_ppm"),
        )
    )
    return est.withColumn(
        "err_ppm",
        F.abs(F.col("est_jaccard_ppm") - F.col("exact_jaccard_ppm")),
    )


def minhash_jaccard_calibration_sql() -> str:
    match_sum = " + ".join(
        f"(CASE WHEN a.mh{j:02d} = b.mh{j:02d} THEN 1 ELSE 0 END)"
        for j in range(K_MINHASH)
    )
    return (
        f"WITH cands AS ({lsh_candidate_pairs_sql()}),"
        f" sig AS ({MINHASH_SIGNATURES_SQL}),"
        f" sh AS (SELECT doc_id, {_DUCK_SHINGLE_HASHES} AS shingles"
        "         FROM documents)"
        " SELECT doc_a, doc_b, est_matches, est_jaccard_ppm,"
        " exact_jaccard_ppm,"
        " abs(est_jaccard_ppm - exact_jaccard_ppm) AS err_ppm FROM ("
        " SELECT c.doc_a, c.doc_b,"
        f" CAST({match_sum} AS BIGINT) AS est_matches,"
        f" CAST(round(({match_sum}) * 1000000.0 / {K_MINHASH})"
        "  AS BIGINT) AS est_jaccard_ppm,"
        " CAST(round(len(list_intersect(sa.shingles, sb.shingles))"
        "  * 1000000.0 / greatest(len(sa.shingles) + len(sb.shingles)"
        "  - len(list_intersect(sa.shingles, sb.shingles)), 1))"
        "  AS BIGINT) AS exact_jaccard_ppm"
        " FROM cands c JOIN sig a ON c.doc_a = a.doc_id"
        " JOIN sig b ON c.doc_b = b.doc_id"
        " JOIN sh sa ON c.doc_a = sa.doc_id"
        " JOIN sh sb ON c.doc_b = sb.doc_id)"
    )


def minhash_near_duplicates(
    docs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """LSH candidates verified by exact Jaccard over distinct shingle
    sets: [doc_a, doc_b, jaccard] with jaccard >= threshold.

    DISTINCT-SET formulation (round 12, guide §2.3 "don't compute
    things you throw away"): banding and Jaccard are pure functions of
    the shingle set, so docs with IDENTICAL shingle arrays (exact
    array equality — no hashing, no collision risk) collapse to one
    representative sid = min(doc_id) before the quadratic work. The
    band self-join and the per-pair array_intersect verify then run
    over distinct sets only, and verified sid pairs expand back to doc
    pairs at the end. On a dup-heavy corpus (the reality dedup exists
    for — and the bench's 20x-replicated shape) this divides the
    band-join fan-out and the verify CPU by the squared replication
    factor; on an all-unique corpus sid == doc_id and the plan is the
    old one plus three metadata-sized joins. Row-for-row identical to
    the per-doc formulation: a same-set pair always shares every band
    key (equal signatures ⇒ equal keys), a cross-set pair bands iff
    its representatives band, and the Jaccard of (a, b) equals the
    Jaccard of their representatives because the arrays are equal.
    Empty shingle sets collapse to one sid whose self-Jaccard is 0
    (round(0 / greatest(0, 1)) — same as the per-doc path) and die at
    the threshold exactly as before.

    ADAPTIVE: the driver reads (n_sets, n_docs) off the rep table it
    needs anyway and only takes the sid route when sets collapse
    meaningfully (< SID_COLLAPSE_RATIO of docs). On a mostly-unique
    corpus sid ≈ doc and the sid path's doc↔sid mapping join and
    expansion joins are pure overhead (measured: +7 s on the 1x
    dup_clusters/split_by_cluster bench rows), so the per-doc
    formulation runs instead — the same driver-known-counts strategy
    discipline as the BFS broadcast guards."""
    sh = shingle_hashes(docs)
    # one table of distinct shingle sets: [shingles, sid, m]. groupBy
    # (partial-agg, skew-safe) rather than a window: a mega-family of
    # identical docs becomes ONE row here, not one giant sorted window
    # partition (guide §2.5 — AQE can split a skewed join, not a
    # skewed window).
    reps = _track(
        sh.groupBy("shingles")
        .agg(
            F.min("doc_id").alias("sid"),
            F.count(F.lit(1)).alias("m"),
        )
        .cache()
    )
    stats = reps.agg(
        F.count(F.lit(1)).alias("n_sets"), F.sum("m").alias("n_docs")
    ).first()
    n_sets, n_docs = int(stats["n_sets"]), int(stats["n_docs"] or 0)
    if n_sets >= SID_COLLAPSE_RATIO * n_docs:
        # per-doc formulation: LSH candidates verified pairwise
        cands = lsh_candidate_pairs(docs)
        a = sh.select(
            F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
        )
        b = sh.select(
            F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
        )
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size("sh_a") + F.size("sh_b") - inter
        return (
            cands.join(a, "doc_a")
            .join(b, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                F.round(inter / F.greatest(union, F.lit(1)), 6).alias(
                    "jaccard"
                ),
            )
            .filter(F.col("jaccard") >= threshold)
        )
    doc2sid = _track(
        sh.join(reps.select("shingles", "sid"), "shingles")
        .select("doc_id", "sid")
        .cache()
    )
    # LSH banding over the distinct sets' signatures (same expressions
    # as minhash_signatures / lsh_candidate_pairs, applied to the rep
    # table) — the self-join fan-out is per distinct set, not per doc
    rep_sigs = reps.select(
        "sid", _minhash_vec_udf()(F.col("shingles")).alias("mh")
    ).select(
        "sid",
        *[
            F.element_at("mh", j + 1).cast("long").alias(f"mh{j:02d}")
            for j in range(K_MINHASH)
        ],
    )
    keys = F.array(
        *[
            F.expr(key.replace("VARCHAR", "STRING"))
            for key in _band_key_exprs()
        ]
    )
    bands = rep_sigs.select("sid", F.posexplode(keys).alias("band", "key"))
    cross = (
        bands.select("band", "key", F.col("sid").alias("sid_a"))
        .join(
            bands.select("band", "key", F.col("sid").alias("sid_b")),
            ["band", "key"],
        )
        .filter(F.col("sid_a") < F.col("sid_b"))
        .select("sid_a", "sid_b")
        .distinct()
    )
    # same-set families (m >= 2): equal signatures always share every
    # band, so every within-family pair is a candidate by construction
    selfp = reps.filter(F.col("m") >= 2).select(
        F.col("sid").alias("sid_a"), F.col("sid").alias("sid_b")
    )
    sid_pairs = cross.unionByName(selfp)
    a = reps.select(
        F.col("sid").alias("sid_a"), F.col("shingles").alias("sh_a")
    )
    b = reps.select(
        F.col("sid").alias("sid_b"), F.col("shingles").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    veri = (
        sid_pairs.join(a, "sid_a")
        .join(b, "sid_b")
        .select(
            "sid_a",
            "sid_b",
            F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # expand verified set pairs back to doc pairs
    ma = doc2sid.select(F.col("sid").alias("sid_a"), F.col("doc_id").alias("da"))
    mb = doc2sid.select(F.col("sid").alias("sid_b"), F.col("doc_id").alias("db"))
    cross_out = (
        veri.filter(F.col("sid_a") != F.col("sid_b"))
        .join(ma, "sid_a")
        .join(mb, "sid_b")
        .select(
            F.least("da", "db").alias("doc_a"),
            F.greatest("da", "db").alias("doc_b"),
            "jaccard",
        )
    )
    self_out = (
        veri.filter(F.col("sid_a") == F.col("sid_b"))
        .join(ma, "sid_a")
        .join(mb.withColumnRenamed("sid_b", "sid_a"), "sid_a")
        .filter(F.col("da") < F.col("db"))
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            "jaccard",
        )
    )
    return cross_out.unionByName(self_out)


def minhash_near_duplicates_sql(threshold: float = 0.5) -> str:
    return (
        f"WITH cands AS ({lsh_candidate_pairs_sql()}),"
        f" sh AS (SELECT doc_id, {_DUCK_SHINGLE_HASHES} AS shingles"
        "         FROM documents)"
        " SELECT doc_a, doc_b, jaccard FROM ("
        " SELECT doc_a, doc_b,"
        " ROUND(len(list_intersect(a.shingles, b.shingles))"
        "  / greatest(len(a.shingles) + len(b.shingles)"
        "     - len(list_intersect(a.shingles, b.shingles)), 1), 6) AS jaccard"
        " FROM cands JOIN sh a ON cands.doc_a = a.doc_id"
        " JOIN sh b ON cands.doc_b = b.doc_id)"
        f" WHERE jaccard >= {threshold}"
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_bits_expr(engine: str) -> str:
    """Simhash over a precomputed token-hash array column ``th`` (with
    multiplicity): bit b is 1 iff sum over tokens of (2*((h>>b)&1) - 1)
    > 0. The array is hashed ONCE per row (the round-1 version inlined
    the hash into every bit term — SIMHASH_BITS rehashes per token)."""
    if engine == "spark":
        bits = [
            f"CASE WHEN aggregate(th, 0L,"
            f" (acc, h) -> acc + 2 * ((h div {1 << b}) % 2) - 1) > 0"
            f" THEN {1 << b}L ELSE 0L END"
            for b in range(SIMHASH_BITS)
        ]
    else:
        bits = [
            f"CASE WHEN list_reduce([CAST(0 AS BIGINT)] || th,"
            f" (acc, h) -> acc + 2 * ((h // {1 << b}) % 2) - 1) > 0"
            f" THEN {1 << b} ELSE 0 END"
            for b in range(SIMHASH_BITS)
        ]
    return " + ".join(bits)


def _simhash_vec_udf():
    """Arrow-vectorized simhash kernel over the (JVM-computed) token
    hash array: one numpy bit-matrix per row instead of SIMHASH_BITS
    interpreted array folds. Bit-exact vs the expression tier: bit b
    set iff sum over tokens of (2*((h>>b)&1) - 1) > 0."""
    import numpy as np

    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
    weights = (np.int64(1) << shifts).astype(np.int64)

    @F.pandas_udf("long")
    def sh(th: pd.Series) -> pd.Series:
        out = np.zeros(len(th), dtype=np.int64)
        for i, arr in enumerate(th):
            if arr is None or len(arr) == 0:
                continue
            x = np.asarray(arr, dtype=np.int64)
            bits = (x[:, None] >> shifts[None, :]) & 1
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = int(weights[votes > 0].sum())
        return pd.Series(out)

    return sh


def simhash(
    docs: DataFrame, fn: str = DEFAULT_HASH, vectorized: bool = True
) -> DataFrame:
    """[doc_id, simhash] — 60-bit simhash of the token stream."""
    th = f"transform({SPARK_TOKENS}, t -> {spark_strhash('t', fn)})"
    with_th = docs.select("doc_id", F.expr(th).alias("th"))
    if vectorized:
        return with_th.select(
            "doc_id", _simhash_vec_udf()(F.col("th")).alias("simhash")
        )
    return with_th.select(
        "doc_id",
        F.expr(_simhash_bits_expr("spark")).cast("long").alias("simhash"),
    )


def simhash_sql(fn: str = DEFAULT_HASH) -> str:
    th = f"list_transform({DUCK_TOKENS}, t -> {duck_strhash('t', fn)})"
    return (
        f"SELECT doc_id, CAST({_simhash_bits_expr('duck')} AS BIGINT) AS simhash"
        f" FROM (SELECT doc_id, {th} AS th FROM documents)"
    )


def simhash_near_duplicates(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """[doc_a, doc_b, hamming] — within-source pairs with simhash
    hamming distance <= max_hamming (source is the blocking key).

    VERIFIER / BASELINE — do NOT run standalone at scale: blocking
    only on `source` is quadratic within a source, and a corpus-scale
    source is billions of docs. The scale path is
    `simhash_near_duplicates_blocked` (Manku 4×15-bit chunk buckets —
    pigeonhole-complete for hamming <= 3, quadratic only within a
    chunk-value bucket); this form exists to label its recall on
    small slices."""
    sh = simhash(docs).join(docs.select("doc_id", "source"), "doc_id")
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sh_a"),
        "source",
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sh_b"),
        "source",
    )
    return (
        a.join(b, "source")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)").cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_near_duplicates_sql(max_hamming: int = 8) -> str:
    return (
        f"WITH sh AS (SELECT doc_id, source, simhash FROM"
        f" (SELECT doc_id, source,"
        f" CAST({_simhash_bits_expr('duck')} AS BIGINT) AS simhash"
        f" FROM (SELECT doc_id, source,"
        f" list_transform({DUCK_TOKENS}, t -> {duck_strhash('t')}) AS th"
        " FROM documents)))"
        " SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        " CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming"
        " FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id"
        f" WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"
    )


def simhash_near_duplicates_blocked(
    docs: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """[doc_a, doc_b, hamming] — GLOBAL near-dup pairs with simhash
    hamming distance <= max_hamming, via Manku/Jain/Sarma (WWW'07)
    chunk blocking: split the fingerprint into max_hamming+1 chunks;
    by pigeonhole, any pair within distance d agrees exactly on at
    least one chunk, so candidates are an equi-join on
    (chunk_index, chunk_value) — never an all-pairs product.

    Scale shape: the chunk table is 4 rows/doc; the candidate join
    shuffles on a 2-column key with 15-bit chunk values (32768 buckets
    per chunk index at SIMHASH_BITS=60), so per-bucket fan-in stays
    bounded at corpus scale; the hamming verify is one bit_count over
    the joined pair. This is the 100 TB path;
    ``simhash_near_duplicates`` (quadratic within a blocking key) is
    the small-block verifier."""
    n_chunks = max_hamming + 1
    assert SIMHASH_BITS % n_chunks == 0, "chunks must tile the fingerprint"
    chunk_bits = SIMHASH_BITS // n_chunks
    sh = _track(simhash(docs).cache())
    chunk_vals = F.array(
        *[
            F.expr(
                f"(simhash div {1 << (i * chunk_bits)}) % {1 << chunk_bits}"
            )
            for i in range(n_chunks)
        ]
    )
    chunks = sh.select(
        "doc_id", F.posexplode(chunk_vals).alias("chunk_idx", "chunk_val")
    )
    a = chunks.select("chunk_idx", "chunk_val", F.col("doc_id").alias("doc_a"))
    b = chunks.select("chunk_idx", "chunk_val", F.col("doc_id").alias("doc_b"))
    cands = (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"))
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", F.expr("bit_count(sh_a ^ sh_b)").cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_near_duplicates_blocked_sql(max_hamming: int = 3) -> str:
    n_chunks = max_hamming + 1
    chunk_bits = SIMHASH_BITS // n_chunks
    chunk_selects = " UNION ALL ".join(
        f"SELECT doc_id, {i} AS chunk_idx,"
        f" (simhash // {1 << (i * chunk_bits)}) % {1 << chunk_bits} AS chunk_val"
        " FROM sh"
        for i in range(n_chunks)
    )
    return (
        f"WITH sh AS (SELECT doc_id,"
        f" CAST({_simhash_bits_expr('duck')} AS BIGINT) AS simhash"
        f" FROM (SELECT doc_id,"
        f" list_transform({DUCK_TOKENS}, t -> {duck_strhash('t')}) AS th"
        " FROM documents)),"
        f" chunks AS ({chunk_selects}),"
        " cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b"
        " FROM chunks a JOIN chunks b"
        " ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val"
        " AND a.doc_id < b.doc_id)"
        " SELECT doc_a, doc_b,"
        " CAST(bit_count(xor(sa.simhash, sb.simhash)) AS INTEGER) AS hamming"
        " FROM cands JOIN sh sa ON sa.doc_id = cands.doc_a"
        " JOIN sh sb ON sb.doc_id = cands.doc_b"
        f" WHERE bit_count(xor(sa.simhash, sb.simhash)) <= {max_hamming}"
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (blocked all-pairs verifier)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.3) -> DataFrame:
    """[doc_a, doc_b, jaccard] — within-source pairwise token-3-gram
    Jaccard >= threshold.

    VERIFIER / BASELINE — do NOT run standalone at scale: quadratic
    within each `source` block by design (exact reference for recall
    labeling on small slices). Scale paths for the same relation:
    `setsim_join_prefix` (exact, PPJoin rarest-token prefix filter)
    or `minhash_near_duplicates` (LSH-bucketed, verified)."""
    sh = shingle_hashes(docs).join(docs.select("doc_id", "source"), "doc_id")
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"), "source"
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"), "source"
    )
    joined = a.join(b, "source").filter(F.col("doc_a") < F.col("doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        joined.select(
            "doc_a",
            "doc_b",
            F.round(inter / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    docs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """[doc_a, doc_b, containment] — ASYMMETRIC shingle containment
    |A n B| / |A| >= threshold, within source blocks: the
    contamination-detection relation Jaccard misses (a short eval
    doc fully CONTAINED in a long train doc scores near-zero Jaccard
    but containment 1.0). Ordered pairs both directions, a != b.

    VERIFIER / BASELINE — do NOT run standalone at scale: same
    quadratic-within-source shape as ngram_jaccard_pairs. At scale,
    generate candidates with `minhash_near_duplicates` /
    `setsim_join_prefix` (or the decontaminate_* 5-gram inverted
    index + Bloom pre-filter) and compute containment only on that
    candidate set."""
    sh = shingle_hashes(docs).join(docs.select("doc_id", "source"), "doc_id")
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"), "source"
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"), "source"
    )
    joined = a.join(b, "source").filter(F.col("doc_a") != F.col("doc_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        joined.select(
            "doc_a",
            "doc_b",
            F.round(
                inter / F.greatest(F.size("sh_a"), F.lit(1)), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def ngram_containment_pairs_sql(threshold: float = 0.5) -> str:
    return (
        f"WITH sh AS (SELECT d.doc_id, d.source,"
        f" {_DUCK_SHINGLE_HASHES} AS shingles FROM documents d)"
        " SELECT doc_a, doc_b, containment FROM ("
        " SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        " ROUND(len(list_intersect(a.shingles, b.shingles))"
        "  / greatest(len(a.shingles), 1), 6) AS containment"
        " FROM sh a JOIN sh b ON a.source = b.source"
        " AND a.doc_id <> b.doc_id)"
        f" WHERE containment >= {threshold}"
    )


def ngram_jaccard_pairs_sql(threshold: float = 0.3) -> str:
    return (
        f"WITH sh AS (SELECT d.doc_id, d.source,"
        f" {_DUCK_SHINGLE_HASHES} AS shingles FROM documents d)"
        " SELECT doc_a, doc_b, jaccard FROM ("
        " SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        " ROUND(len(list_intersect(a.shingles, b.shingles))"
        "  / greatest(len(a.shingles) + len(b.shingles)"
        "     - len(list_intersect(a.shingles, b.shingles)), 1), 6) AS jaccard"
        " FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id)"
        f" WHERE jaccard >= {threshold}"
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup (blocked by label ≈ coarse IVF cell)
# ---------------------------------------------------------------------------

_SPARK_DOT = (
    "aggregate(sequence(1, size(va)), cast(0.0 as double),"
    " (acc, i) -> acc + element_at(va, i) * element_at(vb, i))"
)
_DUCK_DOT = (
    "list_reduce([CAST(0.0 AS DOUBLE)] ||"
    " list_transform(generate_series(1, len(va)), i -> va[i] * vb[i]),"
    " (acc, x) -> acc + x)"
)
_SPARK_NORM = (
    "sqrt(aggregate(sequence(1, size({v})), cast(0.0 as double),"
    " (acc, i) -> acc + element_at({v}, i) * element_at({v}, i)))"
)
_DUCK_NORM = (
    "sqrt(list_reduce([CAST(0.0 AS DOUBLE)] ||"
    " list_transform(generate_series(1, len({v})), i -> {v}[i] * {v}[i]),"
    " (acc, x) -> acc + x))"
)


def embedding_near_duplicates(
    embeddings: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """[vec_a, vec_b, cosine] — within-label pairs with cosine >=
    threshold. Embeddings cast to double before any arithmetic so both
    engines fold in identical precision/order."""
    e = embeddings.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("v"),
    ).withColumn("norm", F.expr(_SPARK_NORM.format(v="v")))
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
        "label",
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
        "label",
    )
    joined = a.join(b, "label").filter(F.col("vec_a") < F.col("vec_b"))
    cos = F.expr(_SPARK_DOT) / (F.col("na") * F.col("nb"))
    return (
        joined.select(
            "vec_a", "vec_b", F.round(cos, 5).cast("double").alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_duplicates_ivf(
    embeddings: DataFrame,
    threshold: float = 0.9,
    centroid_filter: str | None = None,
    dim: int = 64,
) -> DataFrame:
    """[vec_a, vec_b, cosine] — near-dup pairs blocked by LEARNED IVF
    cells (simsearch.py::kmeans_cells) instead of the label column, so
    the path needs no pre-existing block key at scale: the coarse
    quantizer is trained on the corpus itself, candidates form only
    within a cell (equi-join on cell, never all-pairs), and the
    verifier is the same exact cosine as embedding_near_duplicates.
    Recall is bounded by the quantizer (straddling pairs are missed) —
    the standard IVF trade the oracle mirrors exactly."""
    from graph500_spark.operators.simsearch import (
        IVF_CENTROID_FILTER,
        kmeans_cells,
    )

    cells = kmeans_cells(
        embeddings,
        centroid_filter=centroid_filter or IVF_CENTROID_FILTER,
        dim=dim,
    )
    e = (
        embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .join(cells, "vec_id")
        .withColumn("norm", F.expr(_SPARK_NORM.format(v="v")))
    )
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("v").alias("va"),
        F.col("norm").alias("na"),
        "cell",
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
        "cell",
    )
    joined = a.join(b, "cell").filter(F.col("vec_a") < F.col("vec_b"))
    cos = F.expr(_SPARK_DOT) / (F.col("na") * F.col("nb"))
    return joined.select(
        "vec_a", "vec_b", F.round(cos, 5).cast("double").alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def embedding_near_duplicates_ivf_sql(threshold: float = 0.9) -> str:
    from graph500_spark.operators.simsearch import kmeans_cells_sql

    norm = _DUCK_NORM.format(v="v")
    return (
        f"WITH cells AS ({kmeans_cells_sql()}),"
        " e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings),"
        f" en AS (SELECT e.vec_id, cells.cell, v, {norm} AS norm"
        " FROM e JOIN cells USING (vec_id))"
        " SELECT vec_a, vec_b, cosine FROM ("
        " SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,"
        " CAST(ROUND(("
        + _DUCK_DOT.replace("va", "a.v").replace("vb", "b.v")
        + ") / (a.norm * b.norm), 5) AS DOUBLE) AS cosine"
        " FROM en a JOIN en b ON a.cell = b.cell AND a.vec_id < b.vec_id)"
        f" WHERE cosine >= {threshold}"
    )


def embedding_near_duplicates_sql(threshold: float = 0.9) -> str:
    norm = _DUCK_NORM.format(v="v")
    return (
        "WITH e AS (SELECT vec_id, label,"
        " CAST(embedding AS DOUBLE[]) AS v FROM embeddings),"
        f" en AS (SELECT vec_id, label, v, {norm} AS norm FROM e)"
        " SELECT vec_a, vec_b, cosine FROM ("
        " SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,"
        " CAST(ROUND(("
        + _DUCK_DOT.replace("va", "a.v").replace("vb", "b.v")
        + ") / (a.norm * b.norm), 5) AS DOUBLE) AS cosine"
        " FROM en a JOIN en b ON a.label = b.label AND a.vec_id < b.vec_id)"
        f" WHERE cosine >= {threshold}"
    )


# ---------------------------------------------------------------------------
# Cross-document duplicate SPANS — the scalable approximation of
# suffix-array substring dedup ("deduplicating training data" style):
# repeated token n-gram windows across the corpus mark removable
# spans; the canonical (first) occurrence survives. Exact suffix
# sorting needs a global order; the rolling-window hash form is one
# explode + one hash shuffle on the gram key, which scales.
#
# Policy: an occurrence is removable iff its n-gram occurs more than
# once corpus-wide and it is NOT the canonical occurrence (min
# (doc_id, pos) — deterministic). merged_dup_spans then
# interval-unions a document's removable spans (overlap-or-adjacent)
# so downstream text surgery cuts each region once.
#
# Scale notes: the gram-key shuffle is zipf-skewed (boilerplate grams
# are heavy hitters) → AQE skew splitting; the canonical choice is a
# per-gram window (row_number), the merge is a per-doc running-max
# window — both partition-local after their shuffle. The hash is the
# engine-wide 60-bit tier, so a hash collision can at worst merge two
# gram groups (making dedup slightly more aggressive), never lose a
# span.
# ---------------------------------------------------------------------------

DUP_SPAN_N = 5


def duplicate_spans(
    docs: DataFrame, n: int = DUP_SPAN_N, fn: str = DEFAULT_HASH
) -> DataFrame:
    """[doc_id, start_pos, end_pos, gram_hash] — removable occurrences
    of corpus-duplicated token n-grams (1-based token positions,
    inclusive ends); the canonical first occurrence is NOT listed."""
    from pyspark.sql import Window

    grams = docs.select(
        "doc_id",
        F.posexplode(F.expr(spark_shingles(n))).alias("pos0", "gram"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("start_pos"),
        F.expr(spark_strhash("gram", fn)).cast("long").alias("gram_hash"),
    )
    w = Window.partitionBy("gram_hash").orderBy("doc_id", "start_pos")
    ranked = grams.select(
        "doc_id",
        "start_pos",
        "gram_hash",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("gram_hash")
        ).alias("cnt"),
    )
    return (
        ranked.filter((F.col("cnt") > 1) & (F.col("rn") > 1))
        .select(
            "doc_id",
            "start_pos",
            (F.col("start_pos") + (n - 1)).alias("end_pos"),
            "gram_hash",
        )
    )


def duplicate_spans_sql(n: int = DUP_SPAN_N, fn: str = DEFAULT_HASH) -> str:
    return (
        "WITH toks AS (SELECT doc_id,"
        f" {DUCK_TOKENS} AS l FROM documents),"
        " g0 AS (SELECT doc_id, unnest(list_transform("
        f" generate_series(1, greatest(len(l) - {n - 1}, 0)),"
        " i -> {'pos': i,"
        f" 'g': array_to_string(l[i:i + {n - 1}], ' ')}})) AS u FROM toks),"
        " grams AS (SELECT doc_id, u.pos AS start_pos,"
        f" CAST({duck_strhash('u.g', fn)} AS BIGINT) AS gram_hash FROM g0),"
        " ranked AS (SELECT doc_id, start_pos, gram_hash,"
        " ROW_NUMBER() OVER (PARTITION BY gram_hash"
        "  ORDER BY doc_id, start_pos) AS rn,"
        " COUNT(*) OVER (PARTITION BY gram_hash) AS cnt FROM grams)"
        " SELECT doc_id, CAST(start_pos AS BIGINT) AS start_pos,"
        f" CAST(start_pos + {n - 1} AS BIGINT) AS end_pos, gram_hash"
        " FROM ranked WHERE cnt > 1 AND rn > 1"
    )


def merged_dup_spans(docs: DataFrame, n: int = DUP_SPAN_N) -> DataFrame:
    """[doc_id, span_start, span_end, n_spans_merged] — per-document
    interval union (overlap-or-adjacent) of the removable spans."""
    from pyspark.sql import Window

    spans = duplicate_spans(docs, n).select(
        "doc_id", "start_pos", "end_pos"
    )
    w = Window.partitionBy("doc_id").orderBy("start_pos", "end_pos")
    prev_max = F.max("end_pos").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn(
        "new_grp",
        F.when(
            prev_max.isNull() | (F.col("start_pos") > prev_max + 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn(
        "grp",
        F.sum("new_grp").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("doc_id", "grp").agg(
        F.min("start_pos").alias("span_start"),
        F.max("end_pos").alias("span_end"),
        F.count(F.lit(1)).alias("n_spans_merged"),
    ).select("doc_id", "span_start", "span_end", "n_spans_merged")


def merged_dup_spans_sql(n: int = DUP_SPAN_N) -> str:
    return (
        f"WITH spans AS (SELECT doc_id, start_pos, end_pos FROM"
        f" ({duplicate_spans_sql(n)})),"
        " flagged AS (SELECT doc_id, start_pos, end_pos,"
        " CASE WHEN MAX(end_pos) OVER (PARTITION BY doc_id"
        "  ORDER BY start_pos, end_pos"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL"
        "  OR start_pos > MAX(end_pos) OVER (PARTITION BY doc_id"
        "  ORDER BY start_pos, end_pos"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1"
        "  THEN 1 ELSE 0 END AS new_grp FROM spans),"
        " grouped AS (SELECT doc_id, start_pos, end_pos,"
        " SUM(new_grp) OVER (PARTITION BY doc_id"
        "  ORDER BY start_pos, end_pos"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp"
        " FROM flagged)"
        " SELECT doc_id, MIN(start_pos) AS span_start,"
        " MAX(end_pos) AS span_end,"
        " COUNT(*) AS n_spans_merged"
        " FROM grouped GROUP BY doc_id, grp"
    )


# ---------------------------------------------------------------------------
# Normalized exact dedup + bounded-edit-distance near-dup
# ---------------------------------------------------------------------------

# One shared normalization spelling per engine: lowercase, collapse
# every non-alphanumeric run to a single space, trim. Spark's
# regexp_replace is replace-all by default; DuckDB needs the 'g' flag.
SPARK_NORM_TEXT = (
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))"
)
DUCK_NORM_TEXT = (
    "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
)


def normalized_duplicates(docs: DataFrame) -> DataFrame:
    """Normalization-aware exact dedup: groups keyed by the hash of
    case/punctuation/whitespace-normalized text — [norm_hash,
    rep_doc_id, n_copies, n_raw_variants].

    Catches the reformatting-only duplicates exact_duplicates misses
    (same words, different casing or punctuation); n_raw_variants > 1
    marks groups where normalization did the work. Same single
    hash-shuffle + map-side-partial plan as exact_duplicates — the
    normalization is pure Column algebra inside the scan projection,
    so it adds zero shuffles at any scale."""
    return (
        docs.select(
            "doc_id",
            F.expr(spark_strhash(SPARK_NORM_TEXT))
            .cast("long")
            .alias("norm_hash"),
            F.expr(spark_strhash("text")).cast("long").alias("raw_hash"),
        )
        .groupBy("norm_hash")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.countDistinct("raw_hash").cast("long").alias("n_raw_variants"),
        )
    )


NORMALIZED_DUPLICATES_SQL = (
    f"SELECT CAST({duck_strhash(DUCK_NORM_TEXT)} AS BIGINT) AS norm_hash,"
    " MIN(doc_id) AS rep_doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies,"
    f" CAST(COUNT(DISTINCT {duck_strhash('text')}) AS BIGINT)"
    " AS n_raw_variants"
    " FROM documents GROUP BY 1"
)


def levenshtein_near_duplicates(
    docs: DataFrame, max_dist: int = 20, bucket: int = 64
) -> DataFrame:
    """Bounded-edit-distance near-dup pairs: [doc_a, doc_b, dist] for
    same-language pairs with levenshtein(text_a, text_b) <= max_dist,
    doc_a < doc_b.

    Semantics are blocking-free (every qualifying pair is found); the
    blocking is purely physical: qualifying pairs differ in length by
    at most max_dist, so with length-bucket width >= max_dist each
    pair sits in the same or adjacent buckets — the left side emits
    (lang, b-1|b|b+1) keys, the right side its own bucket, and the
    join is a plain equi-join (never all-pairs across the corpus).
    A pair can match on only one key (the right doc contributes its
    bucket once), so no post-join dedup is needed. The |len diff| <=
    max_dist prefilter runs before the O(len²) levenshtein kernel.
    Like ngram_jaccard_pairs this is the within-block quadratic
    verifier tier — at 100 TB it runs on LSH candidates or exact-dup
    survivor groups, not the raw corpus."""
    if bucket < max_dist:
        raise ValueError("bucket width must be >= max_dist for completeness")
    base = docs.select(
        "doc_id",
        "lang",
        "text",
        F.length("text").alias("n_len"),
        (F.length("text") / bucket).cast("long").alias("b"),
    )
    left = base.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang"),
        F.col("text").alias("text_a"),
        F.col("n_len").alias("len_a"),
        F.explode(
            F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)
        ).alias("bk"),
    )
    right = base.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang"),
        F.col("text").alias("text_b"),
        F.col("n_len").alias("len_b"),
        F.col("b").alias("bk"),
    )
    # The threshold form of levenshtein runs the banded O(len·k)
    # dynamic program with early exit (returns -1 above the bound)
    # instead of the full O(len²) table — ~len/k times faster on the
    # dominant non-matching candidates (measured 10.1s → 0.9s on the
    # sf0.1 bench entry).
    return (
        left.join(right, ["lang", "bk"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= max_dist)
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("text_a", "text_b", max_dist)
            .cast("integer")
            .alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )


def levenshtein_near_duplicates_sql(max_dist: int = 20) -> str:
    # The oracle states the blocking-free semantics directly (naive
    # same-lang self-join) — which is exactly why the engine's
    # physical blocking must be complete.
    return (
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        " CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist"
        " FROM documents a JOIN documents b"
        " ON a.lang = b.lang AND a.doc_id < b.doc_id"
        f" AND abs(length(a.text) - length(b.text)) <= {max_dist}"
        f" WHERE levenshtein(a.text, b.text) <= {max_dist}"
    )


# ---------------------------------------------------------------------------
# Exact set-similarity join via prefix filtering (PPJoin-family):
# all document pairs whose SHINGLE-SET Jaccard >= tau — the same
# token-3-gram space the minhash/LSH pipeline approximates, computed
# EXACTLY and without all-pairs work.  This is the deterministic
# recall baseline for minhash_near_duplicates: every pair LSH finds
# must appear here, and pairs here that LSH misses are its false
# negatives (completeness comes from the prefix-filter theorem, not
# from banding luck).
#
# Global token order = (document frequency asc, token asc): prefixes
# are each set's RAREST tokens, so the candidate equi-join key is
# maximally selective by construction (the rarest-first order is the
# entire point of the technique).  Prefix length for Jaccard tau is
# p = |A| - ceil(tau*|A|) + 1: if no intersection token fell in the
# prefix, the intersection would fit in the last ceil(tau*|A|)-1
# positions — fewer than the tau*|A| <= |A∩B| elements J >= tau
# requires.  Both sides' prefixes therefore share a token (the
# standard prefix-filter lemma), so the equi-join on prefix tokens is
# a COMPLETE candidate generator; a length filter
# (1e6*min_size >= tau_ppm*max_size) prunes before verification, and
# verification recomputes the exact integer Jaccard from full sets.
#
# 100 TB shape: one distinct-token shuffle, one document-frequency
# aggregate joined back (broadcast: vocabulary-sized), one window per
# doc for prefix positions, an equi-join on RARE tokens (bounded
# fan-out — a token in a prefix has low df by construction), and one
# pair-keyed count for verification.  Never quadratic in the corpus.
# ---------------------------------------------------------------------------

SETSIM_TAU_PPM = 500_000  # tau = 0.5, the minhash family threshold


def setsim_join_prefix(
    docs: DataFrame, tau_ppm: int = SETSIM_TAU_PPM
) -> DataFrame:
    """[doc_a, doc_b, n_common, union_size, jaccard_ppm] — every pair
    with shingle-set Jaccard >= tau, exact, via prefix filtering."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        F.explode(F.expr(_SPARK_SHINGLE_HASHES)).alias("token"),
    ).distinct()
    dfreq = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    w_doc = Window.partitionBy("doc_id").orderBy(
        F.col("df").asc(), F.col("token").asc()
    )
    w_sz = Window.partitionBy("doc_id")
    ranked = (
        toks.join(dfreq, "token")
        .select(
            "doc_id",
            "token",
            F.row_number().over(w_doc).alias("pos"),
            F.count(F.lit(1)).over(w_sz).alias("sz"),
        )
    )
    # prefix length p = sz - ceil(tau*sz) + 1, ceil via (a+b-1) div b
    prefix = ranked.where(
        F.expr(
            f"pos <= sz - (({tau_ppm} * sz + 999999) div 1000000) + 1"
        )
    )
    # positional filter (PPJoin): a pair needs overlap
    # t = ceil(tau/(1+tau)·(|A|+|B|)); a match on a prefix token at
    # positions (pos_a, pos_b) bounds the remaining overlap by
    # min(|A|−pos_a, |B|−pos_b)+1.  Complete because the EARLIEST
    # common token (which the prefix lemma puts inside both prefixes)
    # has the loosest bound and any true pair passes through it.
    t_den = 1_000_000 + tau_ppm
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "token")
        .where(F.expr("a.doc_id < b.doc_id"))
        .where(
            F.expr(
                "least(a.sz - a.pos, b.sz - b.pos) + 1 >="
                f" ({tau_ppm} * (a.sz + b.sz) + {t_den - 1}) div {t_den}"
            )
        )
        .select(
            F.expr("a.doc_id").alias("doc_a"),
            F.expr("b.doc_id").alias("doc_b"),
            F.expr("a.sz").alias("sz_a"),
            F.expr("b.sz").alias("sz_b"),
        )
        .where(
            F.expr(
                f"1000000 * least(sz_a, sz_b)"
                f" >= {tau_ppm} * greatest(sz_a, sz_b)"
            )
        )
        .distinct()
    )
    inter = (
        cand.join(toks.alias("ta"), F.expr("doc_a = ta.doc_id"))
        .join(
            toks.alias("tb"),
            F.expr("doc_b = tb.doc_id AND ta.token = tb.token"),
        )
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    return (
        inter.where(
            F.expr(
                f"1000000 * n_common >= {tau_ppm} * (sz_a + sz_b - n_common)"
            )
        )
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (F.col("sz_a") + F.col("sz_b") - F.col("n_common")).alias(
                "union_size"
            ),
            F.expr(
                "CAST((1000000 * n_common)"
                " div (sz_a + sz_b - n_common) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


def setsim_join_prefix_sql(tau_ppm: int = SETSIM_TAU_PPM) -> str:
    # The oracle states the blocking-free semantics directly (exact
    # Jaccard over all same-order pairs) — the engine's prefix filter
    # must therefore be COMPLETE, which is exactly what the gate
    # checks (same discipline as levenshtein_near_duplicates).
    return (
        "WITH toks AS (SELECT DISTINCT doc_id, token FROM"
        f" (SELECT doc_id, unnest({_DUCK_SHINGLE_HASHES}) AS token"
        " FROM documents)),"
        " sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz"
        " FROM toks GROUP BY doc_id),"
        " pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        "  CAST(COUNT(*) AS BIGINT) AS n_common"
        "  FROM toks a JOIN toks b ON a.token = b.token"
        "  AND a.doc_id < b.doc_id GROUP BY 1, 2)"
        " SELECT p.doc_a, p.doc_b, p.n_common,"
        " sa.sz + sb.sz - p.n_common AS union_size,"
        " CAST((1000000 * p.n_common)"
        " // (sa.sz + sb.sz - p.n_common) AS BIGINT) AS jaccard_ppm"
        " FROM pairs p JOIN sz sa ON p.doc_a = sa.doc_id"
        " JOIN sz sb ON p.doc_b = sb.doc_id"
        f" WHERE 1000000 * p.n_common"
        f" >= {tau_ppm} * (sa.sz + sb.sz - p.n_common)"
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC) — the storage-level dedup primitive:
# cut each document into variable-size chunks at CONTENT-determined
# positions (a token whose hash lands in the boundary class starts a
# new chunk), so an insertion early in a document shifts only its own
# chunk, not every later boundary — unlike fixed-size blocks. The
# rsync/LBFS/backup-dedup trick applied to corpus text: duplicated
# PASSAGES across documents become identical chunks with identical
# hashes, caught by one hash-keyed count.
# ---------------------------------------------------------------------------

CDC_BOUNDARY_MOD = 64  # expected chunk length in tokens


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """[doc_id, chunk_idx, n_tokens, chunk_hash] — token-level CDC:
    a boundary opens before every token whose 60-bit string hash ≡ 0
    (mod CDC_BOUNDARY_MOD); chunk_hash is the hash of the space-joined
    chunk text.

    Plan: one posexplode over the corpus, per-doc cumulative-boundary
    window (documents are bounded, the window partitions by doc_id —
    the doc_chunks/pack_chunks convention), one (doc, chunk) agg whose
    order-free array_sort reconstruction keeps the chunk text exact.
    Everything is codegen column algebra; the hash is the md5 tier
    shared with the DuckDB oracle."""
    tok = docs.select(
        "doc_id",
        F.posexplode(F.expr(SPARK_TOKENS)).alias("pos", "token"),
    )
    h = spark_strhash("token")
    bounded = tok.select(
        "doc_id",
        "pos",
        "token",
        F.when(
            (F.col("pos") > 0)
            & (F.expr(h) % CDC_BOUNDARY_MOD == 0),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("boundary"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cut = bounded.withColumn(
        "chunk_idx", F.sum("boundary").over(w).cast("long")
    )
    chunks = (
        cut.groupBy("doc_id", "chunk_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "token"))
                    ),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("chunk_text"),
        )
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "n_tokens",
        F.expr(spark_strhash("chunk_text")).cast("long").alias("chunk_hash"),
    )


def cdc_dup_stats(docs: DataFrame) -> DataFrame:
    """[n_chunks, n_distinct_chunks, n_dup_chunks, dup_ratio_ppm] —
    corpus-level chunk-duplication readout over the CDC chunk table:
    n_dup_chunks counts chunk instances whose hash occurs more than
    once (the bytes a chunk store would NOT store twice). One
    chunk-hash-keyed count on top of cdc_chunks."""
    per_hash = cdc_chunks(docs).groupBy("chunk_hash").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return per_hash.agg(
        F.sum("n").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chunks"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_dup_chunks"),
        F.round(
            F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(F.lit(0)))
            * 1_000_000.0
            / F.sum("n")
        )
        .cast("long")
        .alias("dup_ratio_ppm"),
    )


def cdc_doc_pairs(docs: DataFrame, max_group: int = 32) -> DataFrame:
    """[doc_a, doc_b, n_shared_chunks, shared_tokens, dup_frac_a_ppm,
    dup_frac_b_ppm] — WHICH documents share content, at CDC-chunk
    grain: for every doc pair sharing at least one cross-doc
    duplicated chunk hash, the number of shared distinct chunks, their
    total token mass (each shared hash counted once), and that mass as
    a ppm fraction of each document's token count — the serving half
    of ``cdc_dup_stats`` (the chunk-level sibling of
    ``duplicate_spans``: spans says WHERE inside a doc, this says WHO
    with).

    Scale shape: the pair join runs on the (chunk_hash, doc_id)
    DISTINCT table, keyed by chunk_hash, and only hashes whose
    distinct-doc group size is in [2, max_group] participate — the
    same hub-cap discipline as the dup-cluster family. A boilerplate
    chunk shared by G docs would fan out G^2 pairs; the cap bounds
    every hash's contribution at max_group^2 and drops exactly the
    hashes (license headers, navigation chrome) whose pair sets are
    noise, not provenance. Deterministic: the cap is a group-size
    predicate, not a sample."""
    chunks = _track(cdc_chunks(docs).cache())  # read 3x below
    dc = chunks.groupBy("chunk_hash", "doc_id").agg(
        F.max("n_tokens").cast("long").alias("tok")
    )
    keep = (
        dc.groupBy("chunk_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(
            (F.col("n_docs") >= 2) & (F.col("n_docs") <= max_group)
        )
        .select("chunk_hash")
    )
    dcf = _track(dc.join(keep, "chunk_hash").cache())  # both join sides
    a = dcf.select(
        "chunk_hash",
        F.col("doc_id").alias("doc_a"),
        F.col("tok").alias("tok_a"),
    )
    b = dcf.select("chunk_hash", F.col("doc_id").alias("doc_b"))
    pairs = (
        a.join(b, "chunk_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_chunks"),
            F.sum("tok_a").cast("long").alias("shared_tokens"),
        )
    )
    tot = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").cast("long").alias("tot")
    )
    ta = tot.select(F.col("doc_id").alias("doc_a"), F.col("tot").alias("tot_a"))
    tb = tot.select(F.col("doc_id").alias("doc_b"), F.col("tot").alias("tot_b"))
    return (
        pairs.join(ta, "doc_a")
        .join(tb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared_chunks",
            "shared_tokens",
            F.round(F.col("shared_tokens") * 1_000_000.0 / F.col("tot_a"))
            .cast("long")
            .alias("dup_frac_a_ppm"),
            F.round(F.col("shared_tokens") * 1_000_000.0 / F.col("tot_b"))
            .cast("long")
            .alias("dup_frac_b_ppm"),
        )
    )


def _cdc_chunks_sql_body() -> str:
    hb = duck_strhash("token")
    hc = duck_strhash("chunk_text")
    return (
        "tok AS (SELECT doc_id, i - 1 AS pos, toks[i] AS token FROM"
        f" (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),"
        " UNNEST(generate_series(1, len(toks))) AS u(i)),"
        " b AS (SELECT doc_id, pos, token,"
        f" CASE WHEN pos > 0 AND ({hb}) % {CDC_BOUNDARY_MOD} = 0"
        " THEN 1 ELSE 0 END AS boundary FROM tok),"
        " cut AS (SELECT doc_id, pos, token, CAST(SUM(boundary) OVER"
        " (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS chunk_idx"
        " FROM b),"
        " chunks AS (SELECT doc_id, chunk_idx,"
        " CAST(COUNT(*) AS BIGINT) AS n_tokens,"
        " STRING_AGG(token, ' ' ORDER BY pos) AS chunk_text"
        " FROM cut GROUP BY doc_id, chunk_idx),"
        " hashed AS (SELECT doc_id, chunk_idx, n_tokens,"
        f" CAST({hc} AS BIGINT) AS chunk_hash FROM chunks)"
    )


def cdc_chunks_sql() -> str:
    return (
        "WITH "
        + _cdc_chunks_sql_body()
        + " SELECT doc_id, chunk_idx, n_tokens, chunk_hash FROM hashed"
    )


def cdc_doc_pairs_sql(max_group: int = 32) -> str:
    return (
        "WITH "
        + _cdc_chunks_sql_body()
        + ", dc AS (SELECT chunk_hash, doc_id,"
        " CAST(MAX(n_tokens) AS BIGINT) AS tok FROM hashed"
        " GROUP BY chunk_hash, doc_id),"
        " keep AS (SELECT chunk_hash FROM dc GROUP BY chunk_hash"
        f" HAVING COUNT(*) BETWEEN 2 AND {max_group}),"
        " dcf AS (SELECT dc.* FROM dc JOIN keep USING (chunk_hash)),"
        " pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        " CAST(COUNT(*) AS BIGINT) AS n_shared_chunks,"
        " CAST(SUM(a.tok) AS BIGINT) AS shared_tokens"
        " FROM dcf a JOIN dcf b ON a.chunk_hash = b.chunk_hash"
        " AND a.doc_id < b.doc_id GROUP BY doc_a, doc_b),"
        " tot AS (SELECT doc_id, CAST(SUM(n_tokens) AS BIGINT) AS tot"
        " FROM hashed GROUP BY doc_id)"
        " SELECT p.doc_a, p.doc_b, p.n_shared_chunks, p.shared_tokens,"
        " CAST(round(p.shared_tokens * 1000000.0 / ta.tot) AS BIGINT)"
        "  AS dup_frac_a_ppm,"
        " CAST(round(p.shared_tokens * 1000000.0 / tb.tot) AS BIGINT)"
        "  AS dup_frac_b_ppm"
        " FROM pairs p JOIN tot ta ON p.doc_a = ta.doc_id"
        " JOIN tot tb ON p.doc_b = tb.doc_id"
    )


def cdc_dup_stats_sql() -> str:
    return (
        "WITH "
        + _cdc_chunks_sql_body()
        + ", per_hash AS (SELECT chunk_hash, CAST(COUNT(*) AS BIGINT)"
        " AS n FROM hashed GROUP BY chunk_hash)"
        " SELECT CAST(SUM(n) AS BIGINT) AS n_chunks,"
        " CAST(COUNT(*) AS BIGINT) AS n_distinct_chunks,"
        " CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)"
        "  AS n_dup_chunks,"
        " CAST(round(SUM(CASE WHEN n > 1 THEN n ELSE 0 END)"
        "  * 1000000.0 / SUM(n)) AS BIGINT) AS dup_ratio_ppm"
        " FROM per_hash"
    )

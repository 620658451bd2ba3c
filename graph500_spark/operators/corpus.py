"""Composed corpus-cleaning pipeline — the flagship training-data
query: exact dedup → MinHash near-dup removal → language + quality
gating, producing the surviving documents with their annotations.

This is the shape a 100 TB pretraining-data job actually runs: the
cheap hash-based exact dedup first (one shuffle on a 64-bit key), the
LSH near-dup pass only on survivors' band buckets (self-join on band
key, never all-pairs), and per-doc scoring as pure column algebra
fused into the same scan. Every stage is a DataFrame op; nothing
touches the driver.

Drop rule: a document is removed when (a) it is not its exact-text
group's minimum doc_id, or (b) it appears as the LARGER id in any
verified near-duplicate pair (keep-first greedy — deterministic and
engine-independent, the standard large-corpus approximation of
connected-component dedup), or (c) its quality score is below the
threshold, or (d) no language marker matched ('und').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph500_spark.functions.plantrunc import truncate_plan
from graph500_spark.operators import dedup as dd
from graph500_spark.operators import text as tx

MIN_QUALITY = 0.5
NEAR_DUP_JACCARD = 0.5


def corpus_clean(
    docs: DataFrame,
    min_quality: float = MIN_QUALITY,
    jaccard_threshold: float = NEAR_DUP_JACCARD,
) -> DataFrame:
    """[doc_id, lang_pred, quality_score, n_tokens] for documents that
    survive exact dedup, near-dup removal, and the quality/language
    gates."""
    exact_survivors = dd.exact_duplicates(docs).select(
        F.col("rep_doc_id").alias("doc_id")
    )
    near_dropped = (
        dd.minhash_near_duplicates(docs, jaccard_threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    keep = exact_survivors.join(near_dropped, "doc_id", "left_anti")
    # language/quality are pure column algebra (annotate_quality_lang)
    # — ONE projection over the SURVIVING docs instead of two extra
    # full-corpus scans equi-joined back by doc_id (same values, two
    # shuffles and two scans fewer; the survivor semi-join runs first
    # so the expressions are evaluated on survivors only).
    #
    # The truncate_plan barrier is load-bearing (round 12, guide §1.4
    # lesson): without it Catalyst pushes the quality/lang gate BELOW
    # the semi-join, so the expensive annotate expressions evaluate
    # over the FULL corpus instead of the dedup survivors (measured at
    # 20x: the pushed-down filter was ~130 s of task CPU over 100k
    # docs for a 4.7k-doc survivor set — the whole row's remaining
    # cost). The barrier materializes the survivor rows once (the
    # dedup output magnitude) and the projection runs on them only.
    survivors = docs.join(keep, "doc_id", "left_semi").transform(
        truncate_plan
    )
    return (
        tx.annotate_quality_lang(survivors)
        .filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("lang_pred") != "und")
        )
        .select("doc_id", "lang_pred", "quality_score", "n_tokens")
    )


def corpus_clean_sql(
    min_quality: float = MIN_QUALITY,
    jaccard_threshold: float = NEAR_DUP_JACCARD,
) -> str:
    return (
        f"WITH exact_surv AS (SELECT rep_doc_id AS doc_id FROM"
        f" ({dd.EXACT_DUPLICATES_SQL})),"
        f" near_drop AS (SELECT DISTINCT doc_b AS doc_id FROM"
        f" ({dd.minhash_near_duplicates_sql(jaccard_threshold)})),"
        f" lang AS ({tx.LANGUAGE_ID_SQL}),"
        f" qual AS ({tx.TEXT_QUALITY_SQL})"
        " SELECT s.doc_id, lang.lang_pred, qual.quality_score,"
        " qual.n_tokens"
        " FROM exact_surv s"
        " JOIN lang ON lang.doc_id = s.doc_id"
        " JOIN qual ON qual.doc_id = s.doc_id"
        " WHERE s.doc_id NOT IN (SELECT doc_id FROM near_drop)"
        f" AND qual.quality_score >= {min_quality}"
        " AND lang.lang_pred <> 'und'"
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: train docs sharing long n-grams with the
# eval split. The standard pretraining hygiene pass (eval contamination
# detection via n-gram overlap): explode n-gram hashes on both sides,
# equi-join on the hash, count shared grams per (train, eval) pair.
# Scale shape: ONE hash shuffle on the n-gram key (same exchange as any
# inverted-index build); n >= 5 keeps the key selective so the join
# fan-in stays bounded. No all-pairs product anywhere.
# ---------------------------------------------------------------------------

DECON_N = 5  # 5-gram overlap — long enough to be evidence, not chance
EVAL_MOD = 97  # deterministic eval split: doc_id % EVAL_MOD == 0


def decontaminate(
    docs: DataFrame, n: int = DECON_N, eval_mod: int = EVAL_MOD,
    min_shared: int = 1,
) -> DataFrame:
    """[train_doc, eval_doc, n_shared] — training documents that share
    >= min_shared distinct token n-grams with an eval-split document."""
    grams = docs.select(
        "doc_id", F.explode(F.expr(dd.spark_shingle_hashes(n))).alias("g")
    )
    is_eval = F.col("doc_id") % eval_mod == 0
    train = grams.filter(~is_eval).select(
        F.col("doc_id").alias("train_doc"), "g"
    )
    ev = grams.filter(is_eval).select(F.col("doc_id").alias("eval_doc"), "g")
    return (
        train.join(ev, "g")
        .groupBy("train_doc", "eval_doc")
        # per-doc gram hashes are array_distinct'd, so plain COUNT is
        # the distinct-shared-gram count
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate_sql(
    n: int = DECON_N, eval_mod: int = EVAL_MOD, min_shared: int = 1
) -> str:
    return (
        f"WITH grams AS (SELECT doc_id, unnest({dd.duck_shingle_hashes(n)})"
        " AS g FROM documents),"
        f" t AS (SELECT doc_id AS train_doc, g FROM grams"
        f" WHERE doc_id % {eval_mod} <> 0),"
        f" e AS (SELECT doc_id AS eval_doc, g FROM grams"
        f" WHERE doc_id % {eval_mod} = 0)"
        " SELECT train_doc, eval_doc, COUNT(*) AS n_shared"
        " FROM t JOIN e USING (g) GROUP BY 1, 2"
        f" HAVING COUNT(*) >= {min_shared}"
    )


def _bloom_filtered_grams(
    docs: DataFrame, n: int, eval_mod: int, m_bits: int, k_hashes: int
):
    """(train_grams_surviving_bloom, eval_grams) — the pre-filter stage
    of decontaminate_bloom, split out so tests can measure the shuffle
    volume it removes."""
    grams = docs.select(
        "doc_id", F.explode(F.expr(dd.spark_shingle_hashes(n))).alias("g")
    )
    is_eval = F.col("doc_id") % eval_mod == 0
    ev = grams.filter(is_eval).select(F.col("doc_id").alias("eval_doc"), "g")

    # NB: probes hash (g, jL) — the seed must be a LONG literal on both
    # build and probe sides, xxhash64 output depends on input types
    probes = [
        F.expr(f"pmod(xxhash64(g, {j}L), {m_bits})")
        for j in range(k_hashes)
    ]
    words = (
        ev.select(F.explode(F.array(*probes)).alias("bit"))
        .select(
            (F.col("bit") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, cast(bit % 64 as int))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("word"))
        .collect()
    )
    filled = {int(r["w"]): int(r["word"]) for r in words}
    bitmap = [filled.get(i, 0) for i in range(m_bits // 64)]
    bloom = docs.sparkSession.createDataFrame(
        [(bitmap,)], "bloom array<bigint>"
    )
    member = " AND ".join(
        f"((element_at(bloom, cast(pmod(xxhash64(g, {j}L), {m_bits}) / 64"
        f" as int) + 1) >> cast(pmod(xxhash64(g, {j}L), {m_bits}) % 64"
        " as int)) & 1) = 1"
        for j in range(k_hashes)
    )
    train = (
        grams.filter(~is_eval)
        .crossJoin(F.broadcast(bloom))
        .filter(F.expr(member))
        .select(F.col("doc_id").alias("train_doc"), "g")
    )
    return train, ev


def decontaminate_bloom(
    docs: DataFrame, n: int = DECON_N, eval_mod: int = EVAL_MOD,
    min_shared: int = 1, m_bits: int = 1 << 18, k_hashes: int = 4,
) -> DataFrame:
    """decontaminate() with a Bloom-filter pre-filter on the train
    side: build an m-bit Bloom filter over the EVAL split's gram
    hashes (two aggregation jobs to <= m/64 longs), ship it as a
    one-row broadcast, and drop train grams whose k probe bits are
    not all set BEFORE the gram shuffle. Bloom filters have no false
    negatives, so the output is row-identical to decontaminate() —
    same DuckDB oracle — while the shuffle sees only true hits plus
    the fpp tail.

    This is the 100 TB shape for contamination checks: the eval side
    is tiny (benchmarks), the train side is the corpus, and without
    the pre-filter EVERY train gram pays the exchange even though
    ~none of them match. With m=2^18, k=4 the filter is 32 KiB —
    broadcastable at any m that fits an executor. (Spark's own
    runtime-bloom-join optimization targets the same pattern; this
    operator makes the filter explicit, sized, and testable.)

    The k probe positions use xxhash64(g, seed=j) — Spark-side only;
    the oracle never needs to reproduce them because false positives
    are removed by the exact join that follows."""
    train, ev = _bloom_filtered_grams(docs, n, eval_mod, m_bits, k_hashes)
    return (
        train.join(ev, "g")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# ---------------------------------------------------------------------------
# Near-duplicate clusters: connected components over the verified
# near-dup pair graph — the principled alternative to corpus_clean's
# keep-first greedy rule (pairs a~b, b~c collapse into ONE cluster even
# when a~c was never verified). Composes the text pipeline with the
# graph engine's CC operator: the pair list becomes an edge list, the
# delta-iterated min-label loop runs unchanged.
# ---------------------------------------------------------------------------


def dup_clusters(
    spark, docs: DataFrame, jaccard_threshold: float = NEAR_DUP_JACCARD
) -> DataFrame:
    """[doc_id, cluster] for EVERY document: cluster = min doc_id of
    its near-duplicate connected component (singletons cluster with
    themselves)."""
    from graph500_spark.operators.components import connected_components

    pairs = dd.minhash_near_duplicates(docs, jaccard_threshold)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    cc = connected_components(spark, edges)
    return (
        docs.select("doc_id")
        .join(cc.withColumnRenamed("vertex", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", "doc_id").alias("cluster")
        )
    )


def dup_clusters_sql(jaccard_threshold: float = NEAR_DUP_JACCARD) -> str:
    return (
        "WITH RECURSIVE nd AS MATERIALIZED"
        f" ({dd.minhash_near_duplicates_sql(jaccard_threshold)}),"
        " ed AS (SELECT doc_a AS src, doc_b AS dst FROM nd"
        " UNION ALL SELECT doc_b, doc_a FROM nd),"
        " reach(vertex, label) AS ("
        "  SELECT src, src FROM ed"
        "  UNION"
        "  SELECT e.dst, r.label FROM ed e JOIN reach r ON e.src = r.vertex),"
        " cc AS (SELECT vertex, MIN(label) AS component FROM reach"
        " GROUP BY vertex)"
        " SELECT d.doc_id, COALESCE(cc.component, d.doc_id) AS cluster"
        " FROM documents d LEFT JOIN cc ON cc.vertex = d.doc_id"
    )


def decontaminate_fuzzy(
    docs: DataFrame,
    eval_mod: int = EVAL_MOD,
    jaccard_threshold: float = NEAR_DUP_JACCARD,
) -> DataFrame:
    """[train_doc, eval_doc, jaccard] — NEAR-duplicate contamination
    across the train/eval boundary: verified minhash pairs (LSH
    candidates → exact shingle Jaccard >= threshold) where exactly one
    side is in the eval split. Complements decontaminate(): the exact
    5-gram form catches verbatim overlap; this catches whole-document
    near-copies (light edits, boilerplate rewraps) whose individual
    grams may each fall under min_shared. Same banded-LSH scale shape
    — never all-pairs."""
    pairs = dd.minhash_near_duplicates(docs, jaccard_threshold)
    a_eval = F.col("doc_a") % eval_mod == 0
    b_eval = F.col("doc_b") % eval_mod == 0
    return (
        pairs.filter(a_eval != b_eval)
        .select(
            F.when(a_eval, F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("train_doc"),
            F.when(a_eval, F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("eval_doc"),
            "jaccard",
        )
    )


def decontaminate_fuzzy_sql(
    eval_mod: int = EVAL_MOD,
    jaccard_threshold: float = NEAR_DUP_JACCARD,
) -> str:
    return (
        f"WITH nd AS ({dd.minhash_near_duplicates_sql(jaccard_threshold)})"
        " SELECT CASE WHEN doc_a % "
        f"{eval_mod} = 0 THEN doc_b ELSE doc_a END AS train_doc,"
        f" CASE WHEN doc_a % {eval_mod} = 0 THEN doc_a ELSE doc_b END"
        " AS eval_doc, jaccard FROM nd"
        f" WHERE (doc_a % {eval_mod} = 0) <> (doc_b % {eval_mod} = 0)"
    )


def split_by_cluster(
    spark,
    docs: DataFrame,
    test_permille: int = 100,
    jaccard_threshold: float = NEAR_DUP_JACCARD,
) -> DataFrame:
    """[doc_id, cluster, bucket, split] — leakage-safe train/test
    split: the hash-bucket decision is taken on the near-dup CLUSTER
    id (dup_clusters), not the document id, so every near-duplicate
    component lands wholly in one split. Hashing doc ids instead (the
    naive train_test_split) leaks eval content into training whenever
    a near-dup straddles the boundary — the contamination
    decontaminate() then has to detect after the fact. Same
    multiplicative-hash arithmetic as train_test_split, cross-engine
    exact."""
    from graph500_spark.operators.traindata import (
        SPLIT_BUCKETS,
        SPLIT_HASH_K,
        SPLIT_HASH_MOD,
    )

    clusters = dup_clusters(spark, docs, jaccard_threshold)
    bucket = (
        (F.col("cluster") * F.lit(SPLIT_HASH_K)) % F.lit(SPLIT_HASH_MOD)
    ) % F.lit(SPLIT_BUCKETS)
    return clusters.select(
        "doc_id",
        "cluster",
        bucket.alias("bucket"),
        F.when(bucket < F.lit(test_permille), F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def split_by_cluster_sql(
    test_permille: int = 100,
    jaccard_threshold: float = NEAR_DUP_JACCARD,
) -> str:
    from graph500_spark.operators.traindata import (
        SPLIT_BUCKETS,
        SPLIT_HASH_K,
        SPLIT_HASH_MOD,
    )

    bucket = (
        f"(cluster * {SPLIT_HASH_K}) % {SPLIT_HASH_MOD} % {SPLIT_BUCKETS}"
    )
    return (
        f"WITH clus AS ({dup_clusters_sql(jaccard_threshold)})"
        f" SELECT doc_id, cluster, {bucket} AS bucket,"
        f" CASE WHEN {bucket} < {test_permille} THEN 'test'"
        " ELSE 'train' END AS split FROM clus"
    )


# ---------------------------------------------------------------------------
# Dataset mixing: per-source epoch repetition. Pretraining mixtures
# up-weight scarce/high-quality sources by repeating their documents
# an integer number of epochs; the explode(sequence(1, w)) form keeps
# the repetition a narrow per-row op (no shuffle, no driver loop) that
# the writer downstream re-shards.
# ---------------------------------------------------------------------------

# demo weight: sources 'srcN' cycle through 1..3 epochs; any integer
# Column expression works (both engines compute it identically)
MIX_WEIGHT_SPARK = "cast(substr(source, 4) as int) % 3 + 1"
MIX_WEIGHT_DUCK = "CAST(substr(source, 4) AS INT) % 3 + 1"


def corpus_mix(
    docs: DataFrame, weight_expr: str = MIX_WEIGHT_SPARK
) -> DataFrame:
    """[doc_id, source, epoch] — each document repeated weight(source)
    times, epoch = 1..weight. Downstream packing/sharding treats each
    (doc, epoch) copy as an independent row."""
    return docs.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(F.lit(1), F.expr(weight_expr).cast("int"))
        ).alias("epoch"),
    )


def corpus_mix_sql(weight_expr: str = MIX_WEIGHT_DUCK) -> str:
    return (
        "SELECT doc_id, source,"
        f" CAST(unnest(generate_series(1, {weight_expr})) AS INTEGER)"
        " AS epoch FROM documents"
    )


# ---------------------------------------------------------------------------
# Corpus curation report: per-(source, lang) / per-source / global
# document stats in ONE grouped pass via ROLLUP — the dataset-card
# table a curation pipeline publishes. Same idiom as the event-time
# family's hypertable rollup (streaming/windows.py::event_rollup):
# multi-resolution aggregates share a single scan with map-side
# partial aggregation. SUMs are integer-exact; the average is the
# explicit sum/count quotient so both engines round identically.
# ---------------------------------------------------------------------------


def _corpus_rollup_sql(tokens_expr: str, len_fn: str) -> str:
    return (
        f"WITH base AS (SELECT source, lang,"
        f" CAST({len_fn}({tokens_expr}) AS BIGINT) AS n_toks, n_chars"
        " FROM documents)"
        " SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END"
        "  AS source_grp,"
        " CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang_grp,"
        " CAST(COUNT(*) AS BIGINT) AS n_docs,"
        " CAST(SUM(n_toks) AS BIGINT) AS total_tokens,"
        " CAST(ROUND(SUM(n_chars) / CAST(COUNT(*) AS DOUBLE), 5) AS DOUBLE)"
        "  AS avg_chars"
        " FROM base GROUP BY ROLLUP (source, lang)"
    )


def corpus_stats_rollup(docs) -> "DataFrame":
    """[source_grp, lang_grp, n_docs, total_tokens, avg_chars] at
    (source, lang), (source), and global grains in one pass.

    DataFrame-API rollup (no temp view — a library function must not
    mutate the session's view namespace); F.grouping() distinguishes
    the subtotal rows exactly like SQL GROUPING()."""
    base = docs.select(
        "source",
        "lang",
        F.expr(f"CAST(size({tx.SPARK_TOKENS}) AS BIGINT)").alias("n_toks"),
        "n_chars",
    )
    return (
        base.rollup("source", "lang")
        .agg(
            F.grouping("source").alias("gs"),
            F.grouping("lang").alias("gl"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.round(F.sum("n_chars") / F.count(F.lit(1)), 5)
            .cast("double")
            .alias("avg_chars"),
        )
        .select(
            F.when(F.col("gs") == 1, F.lit("ALL"))
            .otherwise(F.col("source"))
            .alias("source_grp"),
            F.when(F.col("gl") == 1, F.lit("ALL"))
            .otherwise(F.col("lang"))
            .alias("lang_grp"),
            "n_docs",
            "total_tokens",
            "avg_chars",
        )
    )


def corpus_stats_rollup_sql() -> str:
    return _corpus_rollup_sql(tx.DUCK_TOKENS, "len")


# ---------------------------------------------------------------------------
# Temperature-scaled mixing — the multilingual/multi-source standard
# (sampling probability ∝ p_i^alpha, alpha<1 upweighting low-resource
# sources): expressed in deterministic EPOCH form, epochs_i ∝
# size_i^(alpha-1) normalized so the LARGEST source runs exactly one
# epoch. Source sizes come from the corpus itself (one tiny groupBy —
# |sources| rows — broadcast back), so the operator needs no external
# weight table. round() lands the float power on an integer epoch
# count, keeping the result value-hash-checkable (the power is a
# deterministic two-operand expression per source, not an aggregation
# order).
# ---------------------------------------------------------------------------

MIX_ALPHA = 0.5


def corpus_mix_temperature(
    docs: DataFrame, alpha: float = MIX_ALPHA, max_epochs: int = 10
) -> DataFrame:
    """[doc_id, source, epoch] with epochs_i = min(max_epochs,
    greatest(1, round((size_i / max_size)^(alpha-1)))) — alpha=1 is
    uniform (one epoch each); smaller alpha upsamples small sources
    harder; max_epochs caps the repetition of tiny sources."""
    sizes = docs.groupBy("source").agg(F.count(F.lit(1)).alias("sz"))
    max_sz = sizes.agg(F.max("sz").alias("max_sz"))
    epochs = sizes.crossJoin(F.broadcast(max_sz)).select(
        "source",
        F.least(
            F.lit(max_epochs),
            F.greatest(
                F.lit(1),
                F.round(
                    F.pow(
                        F.col("sz") / F.col("max_sz"), F.lit(alpha - 1.0)
                    )
                ).cast("int"),
            ),
        ).alias("n_epochs"),
    )
    return docs.join(F.broadcast(epochs), "source").select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), F.col("n_epochs"))).alias("epoch"),
    )


def corpus_mix_temperature_sql(
    alpha: float = MIX_ALPHA, max_epochs: int = 10
) -> str:
    return (
        "WITH sizes AS (SELECT source, COUNT(*) AS sz FROM documents"
        " GROUP BY source),"
        " mx AS (SELECT MAX(sz) AS max_sz FROM sizes),"
        " epochs AS (SELECT source,"
        f" LEAST({max_epochs}, GREATEST(1,"
        f" CAST(round(pow(sz / CAST(max_sz AS DOUBLE), {alpha - 1.0}))"
        " AS INT))) AS n_epochs"
        " FROM sizes CROSS JOIN mx)"
        " SELECT d.doc_id, d.source, CAST(unnest(generate_series(1,"
        " e.n_epochs)) AS INT) AS epoch"
        " FROM documents d JOIN epochs e ON d.source = e.source"
    )


def source_overlap_matrix(docs: DataFrame) -> DataFrame:
    """Cross-source contamination matrix: [source_a, source_b,
    n_shared_texts] — distinct exact-text hashes present in BOTH
    sources, for every source pair (a < b) with overlap.

    The provenance-audit primitive: a hot cell means two suppliers
    ship the same content (double-counted training mass, or one
    scraping the other). Plan: distinct (hash, source) pairs — one
    shuffle — then a self-equi-join on the hash key (bounded fan-out:
    a hash joins only its own sources) and a count keyed by the
    source pair; never a doc×doc product."""
    hs = docs.select(
        F.expr(tx.spark_strhash("text")).cast("long").alias("h"), "source"
    ).distinct()
    a = hs.select("h", F.col("source").alias("source_a"))
    b = hs.select("h", F.col("source").alias("source_b"))
    return (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.countDistinct("h").cast("long").alias("n_shared_texts"))
    )


def source_overlap_matrix_sql() -> str:
    return (
        "WITH hs AS (SELECT DISTINCT"
        f" CAST({tx.duck_strhash('text')} AS BIGINT) AS h, source"
        " FROM documents)"
        " SELECT a.source AS source_a, b.source AS source_b,"
        " CAST(COUNT(DISTINCT a.h) AS BIGINT) AS n_shared_texts"
        " FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source"
        " GROUP BY 1, 2"
    )


def decontaminate_salted(
    docs: DataFrame, n: int = DECON_N, eval_mod: int = EVAL_MOD,
    min_shared: int = 1, n_salt: int = 8,
) -> DataFrame:
    """decontaminate() with the gram-key join pre-salted
    (functions/skew.py::salted_join): identical rows, but the hottest
    gram key's probe rows spread over n_salt reducers instead of one.

    The explicitly-planned alternative to relying on AQE skew-split
    for the known-Zipf gram key — at 100 TB the head gram can carry
    millions of train-side rows while the eval side stays small
    enough to replicate 8×. Same oracle as decontaminate (the salt
    never changes the join result)."""
    from graph500_spark.functions.skew import salted_join

    grams = docs.select(
        "doc_id", F.explode(F.expr(dd.spark_shingle_hashes(n))).alias("g")
    )
    is_eval = F.col("doc_id") % eval_mod == 0
    train = grams.filter(~is_eval).select(
        F.col("doc_id").alias("train_doc"), "g"
    )
    ev = grams.filter(is_eval).select(F.col("doc_id").alias("eval_doc"), "g")
    return (
        salted_join(train, ev, ["g"], n_salt=n_salt)
        .groupBy("train_doc", "eval_doc")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def dedup_rate_by_source(docs: DataFrame) -> DataFrame:
    """Per-source duplication report: [source, n_docs,
    n_distinct_texts, n_dup_docs, dup_rate] — the dataset-card row
    that tells you WHICH supplier ships copies (composes with
    source_overlap_matrix, which tells you who copies whom).

    One grouped agg on the source key; the text hash is computed in
    the scan projection (the exact_duplicates hash tier)."""
    h = F.expr(tx.spark_strhash("text")).cast("long")
    per = (
        docs.select("source", h.alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("h").cast("long").alias("n_distinct_texts"),
        )
    )
    dup = (F.col("n_docs") - F.col("n_distinct_texts")).cast("long")
    return per.select(
        "source",
        "n_docs",
        "n_distinct_texts",
        dup.alias("n_dup_docs"),
        F.round(dup / F.col("n_docs").cast("double"), 6).alias("dup_rate"),
    )


def dedup_rate_by_source_sql() -> str:
    return (
        "WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,"
        f" CAST(COUNT(DISTINCT {tx.duck_strhash('text')}) AS BIGINT)"
        " AS n_distinct_texts"
        " FROM documents GROUP BY source)"
        " SELECT source, n_docs, n_distinct_texts,"
        " CAST(n_docs - n_distinct_texts AS BIGINT) AS n_dup_docs,"
        " ROUND((n_docs - n_distinct_texts) / CAST(n_docs AS DOUBLE), 6)"
        " AS dup_rate FROM per"
    )


# ---------------------------------------------------------------------------
# Ingest-order novelty curve + near-dup cluster representatives
# ---------------------------------------------------------------------------

NOVELTY_BUCKETS = 10


def gram_novelty(
    docs: DataFrame, n: int = DECON_N, buckets: int = NOVELTY_BUCKETS
) -> DataFrame:
    """[bucket, n_grams, n_novel, novel_ppm] — the marginal-value
    curve of a corpus in ingest order: docs are split into `buckets`
    equal doc_id ranges, and each bucket reports how many of its
    distinct token n-grams were never seen in any earlier bucket
    (gram first-occurrence = MIN(doc_id) over the whole corpus).
    A novelty rate that collapses toward 0 in late buckets says new
    data is mostly re-crawl — the curve that decides when collecting
    more of a source stops paying.

    Plan: per-doc distinct gram hashes exploded inside the scan; ONE
    gram-keyed shuffle computes both the per-bucket distinct counts
    and the first-occurrence bucket (MIN over doc ids, then bucket
    arithmetic) — the novel count is a second tiny aggregate over the
    gram table. Bucket width comes from one scalar MAX(doc_id)
    broadcast (the negative_edge_samples pattern). At 100 TB: the
    gram shuffle is the only full-data exchange; everything after is
    per-gram rows."""
    grams = docs.select(
        "doc_id", F.explode(F.expr(dd.spark_shingle_hashes(n))).alias("g")
    )
    mx = docs.agg(F.max("doc_id").alias("m"))
    # integer floor division in BOTH engines (double-division + cast
    # would round in DuckDB but truncate in Spark)
    gb = grams.crossJoin(F.broadcast(mx)).select(
        "g",
        F.expr(f"(doc_id * {buckets}) div (m + 1)")
        .cast("long")
        .alias("bucket"),
    )
    # one (gram) shuffle: per-gram first bucket + the bucket set
    per_gram = gb.groupBy("g").agg(
        F.min("bucket").alias("first_bucket"),
        F.collect_set("bucket").alias("bks"),
    )
    per_bucket = per_gram.select(
        F.explode("bks").alias("bucket"), "first_bucket"
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(
            (F.col("first_bucket") == F.col("bucket")).cast("long")
        ).cast("long").alias("n_novel"),
    )
    return per_bucket.select(
        "bucket",
        "n_grams",
        "n_novel",
        F.expr(
            "(1000000 * n_novel + n_grams div 2) div n_grams"
        ).cast("long").alias("novel_ppm"),
    )


def gram_novelty_sql(
    n: int = DECON_N, buckets: int = NOVELTY_BUCKETS
) -> str:
    return (
        f"WITH grams AS (SELECT doc_id,"
        f" unnest({dd.duck_shingle_hashes(n)}) AS g FROM documents),"
        " mx AS (SELECT MAX(doc_id) AS m FROM documents),"
        " gb AS (SELECT g, CAST((doc_id"
        f" * {buckets}) // (mx.m + 1) AS BIGINT) AS bucket"
        " FROM grams, mx),"
        " per_gram AS (SELECT g, bucket,"
        " MIN(MIN(bucket)) OVER (PARTITION BY g) AS first_bucket"
        " FROM gb GROUP BY g, bucket),"
        " per_bucket AS (SELECT bucket,"
        " CAST(COUNT(*) AS BIGINT) AS n_grams,"
        " CAST(SUM(CASE WHEN first_bucket = bucket THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_novel"
        " FROM per_gram GROUP BY bucket)"
        " SELECT bucket, n_grams, n_novel,"
        " CAST((1000000 * n_novel + n_grams // 2) // n_grams AS BIGINT)"
        " AS novel_ppm FROM per_bucket"
    )


def cluster_representatives(
    spark, docs: DataFrame, jaccard_threshold: float = NEAR_DUP_JACCARD
) -> DataFrame:
    """[cluster, rep_doc_id, n_members] — one canonical document per
    near-duplicate cluster: the longest member (n_chars), ties to the
    smallest doc_id. This is the SERVING side of dup_clusters — the
    op that turns a duplicate-cluster labeling into the deduplicated
    corpus (keep rep_doc_id, drop the rest), keeping the best copy
    instead of an arbitrary one.

    Plan: the dup_clusters labeling (LSH-bounded near-dup pairs + CC
    over the dup-density-bounded subgraph) joined back to doc
    metadata, then ONE cluster-keyed max_by aggregate — no window, no
    sort; the argmax is a (len, -doc_id) struct max with map-side
    partials."""
    cl = dup_clusters(spark, docs, jaccard_threshold)
    m = cl.join(docs.select("doc_id", "n_chars"), "doc_id")
    return (
        m.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max(
                F.struct(
                    F.col("n_chars").alias("len"),
                    (-F.col("doc_id")).alias("neg_id"),
                )
            ).alias("best"),
        )
        .select(
            "cluster",
            (-F.col("best.neg_id")).cast("long").alias("rep_doc_id"),
            "n_members",
        )
    )


def cluster_representatives_sql(
    jaccard_threshold: float = NEAR_DUP_JACCARD,
) -> str:
    return (
        f"WITH cl AS ({dup_clusters_sql(jaccard_threshold)}),"
        " m AS (SELECT cl.cluster, cl.doc_id, d.n_chars"
        " FROM cl JOIN documents d USING (doc_id))"
        " SELECT cluster,"
        " CAST(-(MAX([n_chars, -doc_id])[2]) AS BIGINT)"
        " AS rep_doc_id,"
        " CAST(COUNT(*) AS BIGINT) AS n_members"
        " FROM m GROUP BY cluster"
    )

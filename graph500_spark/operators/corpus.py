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
    lang = tx.language_id(docs).select("doc_id", "lang_pred")
    qual = tx.text_quality(docs).select("doc_id", "n_tokens", "quality_score")
    return (
        exact_survivors.join(near_dropped, "doc_id", "left_anti")
        .join(lang, "doc_id")
        .join(qual, "doc_id")
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

"""Streaming document ingest — incremental corpus cleaning.

Documents arriving as a stream are exact-deduplicated against
everything already accepted, annotated (language, quality), gated, and
appended to a survivors table — the streaming form of
``operators/corpus.py::corpus_clean``'s exact-dedup + gating stages.

Spark shape: ``readStream`` → ``foreachBatch``. Cross-batch dedup
state is the survivors sink itself (an anti-join on ``text_hash``
against the accepted table), NOT Structured Streaming's in-memory
``dropDuplicates`` state: the key space of a 100 TB corpus is
unbounded, while the sink anti-join stays an equi-join Catalyst can
shuffle-partition — and at scale the survivors table is bucketed by
``text_hash`` so each micro-batch probes only matching buckets.

Near-dup (MinHash) removal is deliberately NOT per-batch work: its
cross-batch form is the periodic ``compact_near_dups`` job below — a
MinHash/LSH pass (operators/dedup.py) over the accepted table that
drops the non-canonical side of every verified pair, amortizing the
banding cost over many micro-batches instead of paying it per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from graph500_spark.operators import corpus as corpus_mod
from graph500_spark.operators import text as tx

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def document_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of document parquet files dropped in `path`
    (stand-in for Kafka; the downstream plan is identical).
    ``max_files_per_trigger`` bounds each micro-batch — with
    availableNow this splits a backlog into real sequenced batches
    instead of one catch-all batch."""
    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def _clean_batch(
    batch: DataFrame, accepted: DataFrame | None, min_quality: float
) -> DataFrame:
    hashed = batch.withColumn(
        "text_hash", F.expr(tx.spark_strhash("text")).cast("long")
    )
    # within-batch exact dedup: canonical = min doc_id per text_hash
    canon = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("doc_id"))
    survivors = hashed.join(canon, ["text_hash", "doc_id"])
    # cross-batch exact dedup: the accepted table IS the state
    if accepted is not None:
        survivors = survivors.join(
            accepted.select("text_hash"), "text_hash", "left_anti"
        )
    lang = tx.language_id(survivors).select("doc_id", "lang_pred")
    qual = tx.text_quality(survivors).select(
        "doc_id", "n_tokens", "quality_score"
    )
    return (
        survivors.select("doc_id", "text_hash")
        .join(lang, "doc_id")
        .join(qual, "doc_id")
        .filter(
            (F.col("quality_score") >= min_quality)
            & (F.col("lang_pred") != "und")
        )
        .select(
            "doc_id", "text_hash", "lang_pred", "quality_score", "n_tokens"
        )
    )


def start_corpus_ingest(
    spark: SparkSession,
    source_path: str,
    accepted_out: str,
    checkpoint: str,
    min_quality: float = corpus_mod.MIN_QUALITY,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Run the incremental cleaner. Returns the StreamingQuery; callers
    drive it with availableNow + awaitTermination. Batch appends are
    idempotent at read time via ``read_corpus``'s doc_id guard (a
    transactional table format would make them atomic)."""

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark_s = batch_df.sparkSession
        try:
            accepted = spark_s.read.parquet(accepted_out)
        except Exception:
            accepted = None
        out = _clean_batch(batch_df, accepted, min_quality)
        out.write.mode("append").parquet(accepted_out)

    return (
        document_stream(spark, source_path, max_files_per_trigger)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_corpus(spark: SparkSession, accepted_out: str) -> DataFrame:
    """The accepted corpus as of now (batch-retry guard: keep one row
    per doc_id)."""
    return spark.read.parquet(accepted_out).dropDuplicates(["doc_id"])


def compact_near_dups(
    spark: SparkSession,
    accepted_out: str,
    doc_store: DataFrame,
    jaccard_threshold: float | None = None,
) -> int:
    """The periodic NEAR-DUP compaction pass over the accepted table —
    the cross-batch form of MinHash dedup this module's header
    promises: per-batch ingest handles exact duplicates (sink
    anti-join), and this job periodically removes near-duplicates
    AMONG the accepted survivors, keeping the canonical (min doc_id)
    of each verified pair. Returns the surviving row count.

    ``doc_store`` is the full document store (the sink keeps only
    hashes + annotations, not text — at 100 TB the text lives in the
    corpus store and this job joins it back by doc_id). The rewrite
    materializes before overwriting, same as the ingest degree sink;
    a transactional table format would make it atomic. Library caches
    populated by the dedup pass are released before returning (this
    is a terminal job, not a lazy plan, so the compute is already
    done)."""
    from graph500_spark.operators import dedup as dd

    kwargs = {} if jaccard_threshold is None else {
        "threshold": jaccard_threshold
    }
    accepted = read_corpus(spark, accepted_out)
    texts = doc_store.select("doc_id", "text").join(
        accepted.select("doc_id"), "doc_id"
    )
    dropped = (
        dd.minhash_near_duplicates(texts, **kwargs)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = accepted.join(dropped, "doc_id", "left_anti").cache()
    n = kept.count()
    kept.write.mode("overwrite").parquet(accepted_out)
    kept.unpersist()
    dd.release_caches()
    return n

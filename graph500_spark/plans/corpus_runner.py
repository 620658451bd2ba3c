"""End-to-end training-corpus pipeline with stage-level resume — the
text-side sibling of ``plans/runner.py`` (whose per-root parquet sink
mirrors the reference's checkpoint log, benchmark_helper.hpp:530-604).

Stages, each materialized to its own parquet directory under
``out_dir``:

  1. ``stats``        — dataset-card ROLLUP table (pre-clean).
  2. ``annotations``  — per-doc quality/language/PII/perplexity
                        signals (one pass over the corpus; the scan is
                        shared by Spark's cache only if the caller
                        persists — each signal is a narrow projection
                        so recompute is one scan each).
  3. ``survivors``    — corpus_clean (exact dedup → near-dup removal →
                        quality/language gates).
  4. ``dup_spans``    — merged duplicate spans among survivors
                        (substring-level dedup cut list).
  5. ``split``        — stable train/test assignment for survivors.
  6. ``packed``       — concat-and-chunk packing of the train split.
  7. ``chunks``       — overlapping token chunks of the test split
                        (RAG retrieval-corpus prep).

Resume: a stage whose output directory already has Spark's _SUCCESS
marker is SKIPPED (idempotent reruns — rerunning after a crash redoes
only unfinished stages). Outputs are plain parquet so each stage is
independently queryable; a transactional table format would make the
stage writes atomic as well as idempotent.

Scale: every stage is one of the already-audited operators; the
runner adds no shuffles of its own — it only sequences writes.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph500_spark.operators import corpus as corpus_mod
from graph500_spark.operators import dedup as dedup_mod
from graph500_spark.operators import text as text_mod
from graph500_spark.operators import traindata as traindata_mod


@dataclass
class CorpusPipelineResult:
    out_dir: str
    stages: list[dict] = field(default_factory=list)

    def stage(self, name: str) -> dict:
        return next(s for s in self.stages if s["stage"] == name)


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def run_corpus_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    min_quality: float = corpus_mod.MIN_QUALITY,
    pack_budget: int = 512,
) -> CorpusPipelineResult:
    """Run (or resume) the staged corpus pipeline; returns per-stage
    paths, row counts, and computed/skipped status.

    Independent stages OVERLAP (guide §2.6): Spark happily runs
    several jobs at once inside one application — stages were only
    sequential because this driver called them sequentially, leaving
    most cores idle through every job's barrier/tail. The dependency
    DAG is {stats, annotations, survivors} → {dup_spans, split} →
    {packed, chunks}; each rank's stages are submitted from a small
    thread pool so one stage's stragglers back-fill with the next
    stage's tasks. Stage outputs, the per-stage resume contract
    (_SUCCESS check per stage), and the reported stage ORDER are
    byte-identical to the sequential runner — only the wall-clock
    overlap changes."""
    result = CorpusPipelineResult(out_dir)

    def run_stage(name: str, build) -> tuple[dict, DataFrame]:
        t0 = time.monotonic()
        path = os.path.join(out_dir, name)
        if _done(path):
            df = spark.read.parquet(path)
            status = "skipped"
        else:
            build().write.mode("overwrite").parquet(path)
            df = spark.read.parquet(path)
            status = "computed"
        rec = {
            "stage": name,
            "path": path,
            "rows": df.count(),
            "status": status,
            "seconds": round(time.monotonic() - t0, 3),
        }
        return rec, df

    # Session confs the engine's loop operators scope-and-restore
    # (shuffle width, AQE). Scoping is SESSION-wide, so a pooled stage
    # calling a conf-scoping operator would race its siblings' plans —
    # today no corpus-stage operator scopes confs, and this guard
    # keeps it that way: the rank snapshot must match after every
    # pooled stage, so the first stage that leaks (or visibly flips)
    # a guarded conf fails loudly instead of silently re-planning its
    # neighbours. (A transient scope inside one build can still race;
    # the contract is "no conf scoping under the pool" — enforced by
    # tests/test_corpus_runner.py's pooled-scoping test.)
    _GUARDED_CONFS = (
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled",
    )

    def _conf_snapshot() -> dict[str, str]:
        return {k: spark.conf.get(k) for k in _GUARDED_CONFS}

    def run_rank(stages: list[tuple[str, object]]) -> dict[str, DataFrame]:
        """Run one dependency rank's stages concurrently; record their
        results in the declared (deterministic) order."""
        before = _conf_snapshot()
        with ThreadPoolExecutor(max_workers=len(stages)) as pool:
            futs = [(name, pool.submit(run_stage, name, build))
                    for name, build in stages]
            out: dict[str, DataFrame] = {}
            for name, fut in futs:
                rec, df = fut.result()
                result.stages.append(rec)
                out[name] = df
        after = _conf_snapshot()
        if after != before:
            raise RuntimeError(
                "corpus pipeline rank mutated session confs under the"
                f" thread pool (unsafe with overlapped stages): "
                f"{before} -> {after}"
            )
        return out

    def annotations():
        # quality + language are one codegen projection
        # (annotate_quality_lang) — the old shape computed them as two
        # separate corpus scans equi-joined back by doc_id; pii and
        # the (aggregate-based) perplexity signal still join
        ql = text_mod.annotate_quality_lang(docs).select(
            "doc_id", "n_tokens", "quality_score", "lang_pred"
        )
        pii = text_mod.pii_scrub(docs).drop("redacted")
        ppl = text_mod.unigram_logppl(docs).select(
            "doc_id", "logppl_micro"
        )
        return (
            ql.select("doc_id", "n_tokens", "quality_score", "lang_pred")
            .join(pii, "doc_id")
            .join(ppl, "doc_id", "left")
        )

    rank1 = run_rank([
        ("stats", lambda: corpus_mod.corpus_stats_rollup(docs)),
        ("annotations", annotations),
        ("survivors", lambda: corpus_mod.corpus_clean(docs, min_quality)),
    ])
    survivors = rank1["survivors"]
    surviving_docs = docs.join(
        survivors.select("doc_id"), "doc_id"
    )

    rank2 = run_rank([
        ("dup_spans", lambda: dedup_mod.merged_dup_spans(surviving_docs)),
        ("split", lambda: traindata_mod.train_test_split(surviving_docs)),
    ])
    split = rank2["split"]
    train_ids = split.filter(F.col("split") == "train").select("doc_id")
    # RAG-prep sibling of `packed`: overlapping token chunks of the
    # TEST split (retrieval corpora index held-out text) — same
    # resume/idempotence contract as every other stage.
    test_ids = split.filter(F.col("split") == "test").select("doc_id")
    run_rank([
        ("packed", lambda: traindata_mod.pack_chunks(
            docs.join(train_ids, "doc_id"), budget=pack_budget
        )),
        ("chunks", lambda: traindata_mod.doc_chunks(
            docs.join(test_ids, "doc_id")
        )),
    ])
    # library caches populated along the way (shingle/minhash state in
    # corpus_clean and the span pass) are released: terminal job
    dedup_mod.release_caches()
    return result

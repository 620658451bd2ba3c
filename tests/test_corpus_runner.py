"""Staged corpus pipeline: outputs land, stage results equal their
operators run directly, and reruns resume (completed stages skip)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from graph500_spark.operators import corpus as corpus_mod
from graph500_spark.plans.corpus_runner import run_corpus_pipeline

SF = "/root/testdata/sf0.001"
STAGES = ["stats", "annotations", "survivors", "dup_spans", "split",
          "packed", "chunks"]


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_pipeline_stages_and_resume(spark, tmp_path):
    out = str(tmp_path / "corpus_out")
    docs = _docs(spark)

    r1 = run_corpus_pipeline(spark, docs, out)
    assert [s["stage"] for s in r1.stages] == STAGES
    assert all(s["status"] == "computed" for s in r1.stages)
    assert all(s["rows"] > 0 for s in r1.stages)

    # survivors stage equals the operator run directly
    direct = {
        r.doc_id for r in corpus_mod.corpus_clean(docs).collect()
    }
    landed = {
        r.doc_id
        for r in spark.read.parquet(r1.stage("survivors")["path"]).collect()
    }
    assert landed == direct

    # split covers exactly the survivors
    split = spark.read.parquet(r1.stage("split")["path"])
    assert {r.doc_id for r in split.collect()} == landed

    # full rerun: everything skips, same counts
    r2 = run_corpus_pipeline(spark, docs, out)
    assert all(s["status"] == "skipped" for s in r2.stages)
    assert [s["rows"] for s in r2.stages] == [s["rows"] for s in r1.stages]

    # crash-resume: wipe one intermediate stage; only it recomputes
    shutil.rmtree(r1.stage("dup_spans")["path"])
    r3 = run_corpus_pipeline(spark, docs, out)
    statuses = {s["stage"]: s["status"] for s in r3.stages}
    assert statuses["dup_spans"] == "computed"
    assert all(
        v == "skipped" for k, v in statuses.items() if k != "dup_spans"
    )
    assert r3.stage("dup_spans")["rows"] == r1.stage("dup_spans")["rows"]


def test_packed_stage_covers_train_tokens(spark, tmp_path):
    out = str(tmp_path / "corpus_out2")
    docs = _docs(spark)
    r = run_corpus_pipeline(spark, docs, out)
    packed = spark.read.parquet(r.stage("packed")["path"])
    split = spark.read.parquet(r.stage("split")["path"])
    n_train = split.filter(F.col("split") == "train").count()
    # every packed row belongs to a train doc
    assert packed.select("doc_id").distinct().count() <= n_train
    assert packed.count() > 0


def test_cli_corpus_subcommand(spark, tmp_path, capsys):
    import json

    from graph500_spark.__main__ import main

    out = str(tmp_path / "cli_out")
    rc = main(
        ["corpus", "--docs", f"{SF}/documents.parquet", "--out", out]
    )
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(line)
    assert [s["stage"] for s in res["stages"]] == STAGES
    assert all(s["rows"] > 0 for s in res["stages"])


def test_chunks_stage_covers_test_split(spark, tmp_path):
    out = str(tmp_path / "corpus_out_chunks")
    r = run_corpus_pipeline(spark, _docs(spark), out)
    chunks = spark.read.parquet(r.stage("chunks")["path"])
    split = spark.read.parquet(r.stage("split")["path"])
    test_ids = {x.doc_id for x in split.filter("split = 'test'").collect()}
    chunk_ids = {x.doc_id for x in chunks.collect()}
    # every chunk belongs to a test doc; every non-empty test doc chunks
    assert chunk_ids <= test_ids
    assert chunk_ids

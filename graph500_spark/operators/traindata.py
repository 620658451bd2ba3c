"""Training-set preparation operators: deterministic train/test
split, TF-IDF vocabulary statistics, and concat-and-chunk sequence
packing.

Beyond the graph500 reference surface (first-class engine capability
for the 100 TB training-data use case, like operators/text.py and
operators/dedup.py). All three are pure Column algebra with
mechanically mirrored DuckDB SQL, so they sit in the oracle-checked
tier of the driver contract.

Scale notes:
  * split: a narrow per-row projection on a multiplicative hash of the
    stable doc id — no shuffle, stable under appends (a doc's split
    never changes when the corpus grows), exact expected proportions.
  * tf-idf: one explode + two hash aggregations; the term dimension is
    the shuffle key, which is zipf-skewed — AQE skew splitting handles
    the head terms, and the per-doc top-k window partitions by doc_id
    (never a global sort).
  * packing: the industry-standard pretraining layout (concatenate
    token streams in order, cut every `budget` tokens). A naive
    implementation is a GLOBAL running sum = one partition; here the
    corpus is hash-sharded first and the running sum windows WITHIN
    each shard, so packing parallelizes shard-wise and chunk ids are
    (shard, chunk-in-shard) pairs — the same layout a 1000-executor
    job would write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graph500_spark.operators.text import DUCK_TOKENS, SPARK_TOKENS
from graph500_spark.functions.plantrunc import truncate_plan

# Knuth multiplicative hash on the doc id — identical integer
# arithmetic in both engines (doc_id ⋅ K stays far below 2^63 for any
# realistic id space).
SPLIT_HASH_K = 2654435761
SPLIT_HASH_MOD = 1000000007
SPLIT_BUCKETS = 1000


def train_test_split(docs: DataFrame, test_permille: int = 100) -> DataFrame:
    """[doc_id, bucket, split]: stable hash-bucket split; bucket <
    test_permille (of 1000) ⇒ 'test', else 'train'."""
    bucket = (
        (F.col("doc_id") * F.lit(SPLIT_HASH_K)) % F.lit(SPLIT_HASH_MOD)
    ) % F.lit(SPLIT_BUCKETS)
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        F.when(bucket < F.lit(test_permille), F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def train_test_split_sql(test_permille: int = 100) -> str:
    bucket = (
        f"(doc_id * {SPLIT_HASH_K}) % {SPLIT_HASH_MOD} % {SPLIT_BUCKETS}"
    )
    return (
        f"SELECT doc_id, {bucket} AS bucket,"
        f" CASE WHEN {bucket} < {test_permille} THEN 'test'"
        " ELSE 'train' END AS split FROM documents"
    )


# ---------------------------------------------------------------------------
# Stratified (per-source) downsampling — dataset-mixing's sibling:
# corpus_mix UPsamples sources by integer epoch repetition; this
# DOWNsamples each source at its own rate. The same stable
# multiplicative hash as train_test_split (salted by the stratum so
# the two decisions are independent) makes the sample deterministic,
# append-stable, and exact-rate in expectation per stratum — a narrow
# per-row filter, no shuffle, no state, the 100 TB shape. A real
# pipeline sets rates from token budgets per source/language.
# ---------------------------------------------------------------------------

# per-source keep rates in permille; strata absent from the map use
# DEFAULT_SAMPLE_PERMILLE
SAMPLE_RATES = {"src0": 1000, "src1": 500, "src2": 250}
DEFAULT_SAMPLE_PERMILLE = 125
# stratum salt: a small deterministic hash of the source string so
# (doc_id, source) decisions decorrelate from the train/test split
_SALT = "(ascii(substr(source, 1, 1)) * 131 + length(source))"


def _sample_bucket() -> str:
    # engine-identical integer arithmetic (cf. train_test_split)
    return (
        f"((doc_id + {_SALT}) * {SPLIT_HASH_K})"
        f" % {SPLIT_HASH_MOD} % {SPLIT_BUCKETS}"
    )


def _rate_case(rates: dict[str, int], default: int) -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {p}" for s, p in sorted(rates.items())
    )
    return f"CASE source {whens} ELSE {default} END"


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, int] | None = None,
    default_permille: int = DEFAULT_SAMPLE_PERMILLE,
) -> DataFrame:
    """[doc_id, source, bucket] — the kept subsample: rows whose salted
    hash bucket falls below their stratum's permille rate."""
    rates = SAMPLE_RATES if rates is None else rates
    bucket = F.expr(_sample_bucket())
    rate = F.expr(_rate_case(rates, default_permille))
    return (
        docs.select("doc_id", "source", bucket.alias("bucket"), rate.alias("r"))
        .filter(F.col("bucket") < F.col("r"))
        .select("doc_id", "source", "bucket")
    )


def stratified_sample_sql(
    rates: dict[str, int] | None = None,
    default_permille: int = DEFAULT_SAMPLE_PERMILLE,
) -> str:
    rates = SAMPLE_RATES if rates is None else rates
    return (
        f"SELECT doc_id, source, bucket FROM (SELECT doc_id, source,"
        f" {_sample_bucket()} AS bucket,"
        f" {_rate_case(rates, default_permille)} AS r FROM documents)"
        " WHERE bucket < r"
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage — the first step of tokenizer/vocab induction:
# the top-N corpus tokens by frequency with each token's share and the
# cumulative coverage fraction (what % of all token occurrences a
# vocab of that size captures).
#
# Scale shape: explode → one map-side-combinable hash agg on token
# (zipf-skewed key → AQE skew splitting), then a DISTRIBUTED top-N
# (orderBy().limit() is TakeOrdered: per-partition heaps + one merge —
# never a global sort), and the cumulative window runs over only the N
# returned rows. The naive rank-over-global-window alternative would
# sort the whole vocabulary in one partition.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Naive Bayes language classifier — TRAINED inside the engine (the
# inference-only sibling is model_quality_scores, which broadcasts a
# pre-learned weight table). Training is counting: per-(lang, token)
# add-one-smoothed log-likelihoods from the corpus's own labels;
# prediction is an exploded token join + per-(doc, lang) sum + argmax.
#
# Cross-engine exactness: log-likelihoods are QUANTIZED to integer
# micro-nats (round(ln(p)·10^6) as BIGINT) at train time, so the
# prediction-time sums are exact integers — shuffle order cannot
# change them, and the argmax ties break by language code. (Raw
# double log-sums would be summation-order-dependent — the same
# obstruction kmeans_cells removes by integer quantization.)
#
# Scale shape: training is one explode + two hash aggs (the
# term-frequency plan); the model table is ≤ |V|·|langs| rows — a
# broadcast-joinable dimension exactly like model_quality_scores'
# weight table. Prediction is one explode + broadcast join + one
# map-side-combinable (doc, lang) sum.
# ---------------------------------------------------------------------------

NB_SCALE = 1_000_000


def nb_train(docs: DataFrame) -> DataFrame:
    """[lang, token, ll_q] — add-one-smoothed log P(token|lang) in
    integer micro-nats, trained on the documents' own lang labels."""
    tok = docs.select(
        "lang", F.explode(F.expr(SPARK_TOKENS)).alias("token")
    )
    counts = tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = tok.groupBy("lang").agg(F.count(F.lit(1)).alias("total"))
    vocab = tok.select("token").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    return (
        counts.join(totals, "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "token",
            F.round(
                F.log((F.col("cnt") + 1) / (F.col("total") + F.col("v")))
                * NB_SCALE
            )
            .cast("long")
            .alias("ll_q"),
        )
    )


def nb_train_sql() -> str:
    return (
        "WITH tok AS (SELECT lang, unnest("
        + DUCK_TOKENS
        + ") AS token FROM documents),"
        " counts AS (SELECT lang, token, COUNT(*) AS cnt FROM tok"
        "  GROUP BY lang, token),"
        " totals AS (SELECT lang, COUNT(*) AS total FROM tok GROUP BY lang),"
        " vocab AS (SELECT COUNT(DISTINCT token) AS v FROM tok)"
        " SELECT c.lang, c.token,"
        " CAST(round(ln((c.cnt + 1) / CAST(t.total + vocab.v AS DOUBLE))"
        f" * {NB_SCALE}) AS BIGINT) AS ll_q"
        " FROM counts c JOIN totals t ON c.lang = t.lang CROSS JOIN vocab"
    )


def nb_predict(docs: DataFrame) -> DataFrame:
    """[doc_id, nb_pred, score_q] — argmax language under the
    in-engine-trained NB model (exact integer micro-nat sums; unseen
    (lang, token) pairs take the lang's smoothing floor
    round(ln(1/(total+V))·10^6); ties break by language code).
    Zero-token documents are absent (no evidence)."""
    from pyspark.sql import Window

    model = nb_train(docs)
    tok = docs.select(
        "doc_id", F.explode(F.expr(SPARK_TOKENS)).alias("token")
    )
    ttok = docs.select("lang", F.explode(F.expr(SPARK_TOKENS)).alias("t2"))
    totals = ttok.groupBy("lang").agg(F.count(F.lit(1)).alias("total"))
    vocab = ttok.select("t2").distinct().agg(F.count(F.lit(1)).alias("v"))
    floors = totals.crossJoin(F.broadcast(vocab)).select(
        "lang",
        F.round(F.log(1 / (F.col("total") + F.col("v"))) * NB_SCALE)
        .cast("long")
        .alias("floor_q"),
    )
    # every (token occurrence × lang) gets the trained ll or the floor
    scored = (
        tok.crossJoin(F.broadcast(floors))
        .join(F.broadcast(model), ["lang", "token"], "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("ll_q", "floor_q").alias("llv"),
        )
        .groupBy("doc_id", "lang")
        .agg(F.sum("llv").alias("score_q"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_q").desc(), F.col("lang").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("nb_pred"), "score_q")
    )


def nb_predict_sql() -> str:
    return (
        "WITH tok AS (SELECT lang, unnest("
        + DUCK_TOKENS
        + ") AS token FROM documents),"
        " counts AS (SELECT lang, token, COUNT(*) AS cnt FROM tok"
        "  GROUP BY lang, token),"
        " totals AS (SELECT lang, COUNT(*) AS total FROM tok GROUP BY lang),"
        " vocab AS (SELECT COUNT(DISTINCT token) AS v FROM tok),"
        " model AS (SELECT c.lang, c.token,"
        " CAST(round(ln((c.cnt + 1) / CAST(t.total + vocab.v AS DOUBLE))"
        f" * {NB_SCALE}) AS BIGINT) AS ll_q"
        " FROM counts c JOIN totals t ON c.lang = t.lang CROSS JOIN vocab),"
        " floors AS (SELECT t.lang,"
        " CAST(round(ln(1 / CAST(t.total + vocab.v AS DOUBLE))"
        f" * {NB_SCALE}) AS BIGINT) AS floor_q"
        " FROM totals t CROSS JOIN vocab),"
        " dtok AS (SELECT doc_id, unnest("
        + DUCK_TOKENS
        + ") AS token FROM documents),"
        " scored AS (SELECT d.doc_id, f.lang,"
        " SUM(COALESCE(m.ll_q, f.floor_q)) AS score_q"
        " FROM dtok d CROSS JOIN floors f"
        " LEFT JOIN model m ON m.lang = f.lang AND m.token = d.token"
        " GROUP BY d.doc_id, f.lang),"
        " ranked AS (SELECT doc_id, lang, score_q,"
        " ROW_NUMBER() OVER (PARTITION BY doc_id"
        "  ORDER BY score_q DESC, lang ASC) AS rn FROM scored)"
        " SELECT doc_id, lang AS nb_pred,"
        " CAST(score_q AS BIGINT) AS score_q FROM ranked WHERE rn = 1"
    )


def vocab_coverage(docs: DataFrame, top_n: int = 100) -> DataFrame:
    """[rank, token, cnt, frac, cum_frac] — top-N tokens by corpus
    frequency (ties → lexicographic), with per-token and cumulative
    shares of all token occurrences."""
    cnts = (
        docs.select(F.explode(F.expr(SPARK_TOKENS)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = cnts.agg(F.sum("cnt").alias("total"))
    top = cnts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("rank"),
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("total"), 6)
            .cast("double")
            .alias("frac"),
            F.round(F.sum("cnt").over(wsum) / F.col("total"), 6)
            .cast("double")
            .alias("cum_frac"),
        )
    )


def vocab_coverage_sql(top_n: int = 100) -> str:
    return (
        "WITH tok AS (SELECT unnest("
        + DUCK_TOKENS
        + ") AS token FROM documents),"
        " cnts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),"
        " tot AS (SELECT SUM(cnt) AS total FROM cnts),"
        " top AS (SELECT token, cnt FROM cnts"
        f" ORDER BY cnt DESC, token ASC LIMIT {top_n})"
        " SELECT CAST(ROW_NUMBER() OVER"
        " (ORDER BY cnt DESC, token ASC) AS INTEGER) AS rank,"
        " token, cnt,"
        " CAST(round(cnt / CAST(total AS DOUBLE), 6) AS DOUBLE) AS frac,"
        " CAST(round(SUM(cnt) OVER (ORDER BY cnt DESC, token ASC"
        "  ROWS UNBOUNDED PRECEDING) / CAST(total AS DOUBLE), 6)"
        "  AS DOUBLE) AS cum_frac"
        " FROM top CROSS JOIN tot"
    )


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def _terms(docs: DataFrame) -> DataFrame:
    """[doc_id, term, tf] — lowercased alnum tokens."""
    return (
        docs.select(
            "doc_id",
            F.explode(F.expr(f"transform({SPARK_TOKENS}, t -> lower(t))")).alias(
                "term"
            ),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


_DUCK_TERMS = (
    "SELECT doc_id, term, COUNT(*) AS tf FROM ("
    " SELECT doc_id, lower(unnest({tokens})) AS term FROM documents)"
    " GROUP BY doc_id, term"
).format(tokens=DUCK_TOKENS)


def term_doc_frequency(docs: DataFrame) -> DataFrame:
    """[term, df, idf]: document frequency per term and smoothed
    idf = ln((N+1)/(df+1)) + 1, rounded to 5 (cross-engine float
    convention)."""
    n_docs = docs.count()  # driver-known scalar, like the BFS counts
    terms = _terms(docs)
    return (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "term",
            "df",
            F.round(
                F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
                + 1.0,
                5,
            ).alias("idf"),
        )
    )


def term_doc_frequency_sql() -> str:
    return (
        f"WITH terms AS ({_DUCK_TERMS}),"
        " n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents)"
        " SELECT term, COUNT(*) AS df,"
        " CAST(ROUND(ln(((SELECT n_docs FROM n) + 1.0)"
        " / (COUNT(*) + 1.0)) + 1.0, 5) AS DOUBLE) AS idf"
        " FROM terms GROUP BY term"
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """[doc_id, term, tfidf, rank]: each document's k highest-scoring
    terms, tfidf = tf × idf, deterministic tie-break (score desc, term
    asc)."""
    n_docs = docs.count()
    terms = _terms(docs)
    idf = (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "term",
            (
                F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
                + 1.0
            ).alias("idf_raw"),
        )
    )
    scored = terms.join(idf, "term").select(
        "doc_id",
        "term",
        (F.col("tf") * F.col("idf_raw")).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            F.round("score", 5).alias("tfidf"),
            "rank",
        )
    )


def tfidf_top_terms_sql(k: int = 3) -> str:
    return (
        f"WITH terms AS ({_DUCK_TERMS}),"
        " n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),"
        " idf AS (SELECT term,"
        "  ln(((SELECT n_docs FROM n) + 1.0) / (COUNT(*) + 1.0)) + 1.0"
        "  AS idf_raw FROM terms GROUP BY term),"
        " scored AS (SELECT t.doc_id, t.term, t.tf * i.idf_raw AS score"
        "  FROM terms t JOIN idf i USING (term)),"
        " ranked AS (SELECT doc_id, term, score, ROW_NUMBER() OVER"
        "  (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank"
        "  FROM scored)"
        " SELECT doc_id, term, CAST(ROUND(score, 5) AS DOUBLE) AS tfidf,"
        f" CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# bm25_topk — Okapi BM25 retrieval over the documents table for a
# fixed query set: the classic lexical ranking a training-data
# pipeline uses for decontamination probes, eval-set retrieval, and
# hard-negative mining.
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERIES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("hash_join", ("hash", "join")),
    ("window_sort_merge", ("window", "sort", "merge")),
    ("spark_stream_batch", ("spark", "stream", "batch")),
)


def bm25_topk(
    docs: DataFrame,
    k: int = 10,
    queries: tuple = BM25_QUERIES,
) -> DataFrame:
    """[query_id, doc_id, bm25, rank] — top-k documents per query by
    Okapi BM25 (k1=1.2, b=0.75), idf = ln((N - df + 0.5)/(df + 0.5)
    + 1), deterministic tie-break (score desc, doc_id asc). Score
    rounded to 5 decimals — the cross-engine float convention every
    ln-based entry here uses (tfidf_top_terms).

    Plan shape: one corpus-scale shuffle builds the (doc, term, tf)
    table; doc lengths are a window sum over the SAME doc_id-grouped
    frame; the query-term list and the per-term df/idf table (rows =
    distinct query terms, never the vocabulary) broadcast onto the
    term table. Top-k is a per-query window over candidates that
    matched at least one query term — the corpus never fans out per
    query."""
    n_docs = docs.count()  # driver-known scalar, like the BFS counts
    terms = _terms(docs)
    qterms = F.broadcast(
        terms.sparkSession.createDataFrame(
            [(qid, t) for qid, ts in queries for t in ts],
            "query_id: string, term: string",
        )
    )
    dl = terms.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("dl")
    )
    avgdl = dl.agg(
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl")
    )
    idf = (
        terms.join(qterms.select("term").distinct(), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .select(
            "term",
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
                + 1.0
            ).alias("idf"),
        )
    )
    scored = (
        terms.join(qterms, "term")
        .join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "query_id",
            "doc_id",
            (
                F.col("idf")
                * (F.col("tf") * (BM25_K1 + 1.0))
                / (
                    F.col("tf")
                    + BM25_K1
                    * (
                        1.0
                        - BM25_B
                        + BM25_B * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("part_score"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("part_score").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.round("score", 5).alias("bm25"),
            "rank",
        )
    )


def bm25_topk_sql(k: int = 10) -> str:
    qvals = ", ".join(
        f"('{qid}', '{t}')"
        for qid, ts in BM25_QUERIES
        for t in ts
    )
    return (
        f"WITH terms AS ({_DUCK_TERMS}),"
        f" q(query_id, term) AS (VALUES {qvals}),"
        " n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),"
        " dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl"
        "  FROM terms GROUP BY doc_id),"
        " ad AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),"
        " idf AS (SELECT term,"
        "  ln(((SELECT n_docs FROM n) - COUNT(*) + 0.5)"
        "   / (COUNT(*) + 0.5) + 1.0) AS idf"
        "  FROM terms WHERE term IN (SELECT term FROM q)"
        "  GROUP BY term),"
        " scored AS (SELECT q.query_id, t.doc_id,"
        f"  SUM(i.idf * (t.tf * ({BM25_K1} + 1.0))"
        f"   / (t.tf + {BM25_K1} * (1.0 - {BM25_B}"
        f"    + {BM25_B} * dl.dl / (SELECT avgdl FROM ad)))) AS score"
        "  FROM terms t JOIN q ON t.term = q.term"
        "  JOIN idf i ON t.term = i.term"
        "  JOIN dl ON t.doc_id = dl.doc_id"
        "  GROUP BY q.query_id, t.doc_id),"
        " ranked AS (SELECT query_id, doc_id, score, ROW_NUMBER() OVER"
        "  (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank"
        "  FROM scored)"
        " SELECT query_id, doc_id, CAST(ROUND(score, 5) AS DOUBLE) AS bm25,"
        f" CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# bm25_prf_topk — RM3-style pseudo-relevance feedback: retrieve, mine
# expansion terms from the top feedback documents, re-retrieve with
# the weighted expanded query. The second-stage trick behind query
# expansion in decontamination probes and hard-negative mining.
# ---------------------------------------------------------------------------

PRF_FB_DOCS = 5
PRF_FB_TERMS = 3
PRF_FB_WEIGHT = 0.5


def bm25_prf_topk(
    docs: DataFrame,
    k: int = 10,
    queries: tuple = BM25_QUERIES,
    fb_docs: int = PRF_FB_DOCS,
    fb_terms: int = PRF_FB_TERMS,
    fb_weight: float = PRF_FB_WEIGHT,
) -> DataFrame:
    """[query_id, doc_id, bm25_prf, rank] — BM25 with pseudo-relevance
    feedback (Rocchio/RM3 discipline): take the top ``fb_docs`` BM25
    hits per query, mine the ``fb_terms`` highest-tf non-query terms
    from them (tie-break term asc), and re-score with the expanded
    query — original terms at weight 1, expansion terms at
    ``fb_weight``. Deterministic end to end; scores rounded to 5
    decimals like every ln-based entry.

    Plan shape: stage 1 is bm25_topk's plan; the feedback table
    (|Q| x fb_docs rows) broadcasts onto the corpus term table to mine
    candidates (one (query, term) agg over the feedback docs' terms —
    feedback-sized, not corpus-sized); the expanded query table
    (<= |Q| x (|terms| + fb_terms) rows) broadcasts exactly like the
    original query table, so stage 2 repeats stage 1's single-shuffle
    shape. The corpus is scanned twice (the algorithm's definition),
    never fanned out per query."""
    from graph500_spark.functions.plantrunc import truncate_plan

    n_docs = docs.count()
    # the term table feeds BOTH retrieval stages plus the feedback
    # mining and df passes — materialize it once (Catalyst does not
    # CSE across plan branches), so the corpus is tokenized once, not
    # per consumer
    terms = _terms(docs).transform(truncate_plan)
    qterms = F.broadcast(
        terms.sparkSession.createDataFrame(
            [(qid, t) for qid, ts in queries for t in ts],
            "query_id: string, term: string",
        )
    )
    dl = terms.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("dl")
    ).transform(truncate_plan)
    avgdl = dl.agg((F.sum("dl") / F.count(F.lit(1))).alias("avgdl"))

    def scored_for(qweights):
        """One weighted-BM25 scoring pass over the shared term table
        (qweights: broadcast [query_id, term, wt])."""
        idf = (
            terms.join(qweights.select("term").distinct(), "term")
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .select(
                "term",
                F.log(
                    (F.lit(float(n_docs)) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                ).alias("idf"),
            )
        )
        return (
            terms.join(qweights, "term")
            .join(F.broadcast(idf), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(avgdl))
            .select(
                "query_id",
                "doc_id",
                (
                    F.col("wt")
                    * F.col("idf")
                    * (F.col("tf") * (BM25_K1 + 1.0))
                    / (
                        F.col("tf")
                        + BM25_K1
                        * (
                            1.0
                            - BM25_B
                            + BM25_B * F.col("dl") / F.col("avgdl")
                        )
                    )
                ).alias("part_score"),
            )
            .groupBy("query_id", "doc_id")
            .agg(F.sum("part_score").alias("score"))
        )

    wrank = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    fb = F.broadcast(
        scored_for(
            qterms.select("query_id", "term", F.lit(1.0).alias("wt"))
        )
        .withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= fb_docs)
        .select("query_id", "doc_id")
    )
    cand = (
        terms.join(fb, "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum("tf").cast("long").alias("fb_tf"))
        .join(qterms, ["query_id", "term"], "left_anti")
    )
    wexp = Window.partitionBy("query_id").orderBy(
        F.desc("fb_tf"), F.asc("term")
    )
    exp = (
        cand.withColumn("r", F.row_number().over(wexp))
        .filter(F.col("r") <= fb_terms)
        .select("query_id", "term", F.lit(float(fb_weight)).alias("wt"))
    )
    allq = F.broadcast(
        qterms.select("query_id", "term", F.lit(1.0).alias("wt"))
        .unionByName(exp)
    )
    return (
        scored_for(allq).withColumn("rank", F.row_number().over(wrank))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.round("score", 5).alias("bm25_prf"),
            "rank",
        )
    )


def bm25_prf_topk_sql(
    k: int = 10,
    fb_docs: int = PRF_FB_DOCS,
    fb_terms: int = PRF_FB_TERMS,
    fb_weight: float = PRF_FB_WEIGHT,
) -> str:
    qvals = ", ".join(
        f"('{qid}', '{t}')"
        for qid, ts in BM25_QUERIES
        for t in ts
    )
    return (
        f"WITH terms AS ({_DUCK_TERMS}),"
        f" q(query_id, term) AS (VALUES {qvals}),"
        " n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),"
        " dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl"
        "  FROM terms GROUP BY doc_id),"
        " ad AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),"
        " idf1 AS (SELECT term,"
        "  ln(((SELECT n_docs FROM n) - COUNT(*) + 0.5)"
        "   / (COUNT(*) + 0.5) + 1.0) AS idf"
        "  FROM terms WHERE term IN (SELECT term FROM q)"
        "  GROUP BY term),"
        " scored1 AS (SELECT q.query_id, t.doc_id,"
        f"  SUM(i.idf * (t.tf * ({BM25_K1} + 1.0))"
        f"   / (t.tf + {BM25_K1} * (1.0 - {BM25_B}"
        f"    + {BM25_B} * dl.dl / (SELECT avgdl FROM ad)))) AS score"
        "  FROM terms t JOIN q ON t.term = q.term"
        "  JOIN idf1 i ON t.term = i.term"
        "  JOIN dl ON t.doc_id = dl.doc_id"
        "  GROUP BY q.query_id, t.doc_id),"
        " fb AS (SELECT query_id, doc_id FROM (SELECT query_id, doc_id,"
        "  ROW_NUMBER() OVER (PARTITION BY query_id"
        "   ORDER BY score DESC, doc_id ASC) AS rank FROM scored1)"
        f"  WHERE rank <= {fb_docs}),"
        " cand AS (SELECT fb.query_id, t.term,"
        "  CAST(SUM(t.tf) AS BIGINT) AS fb_tf"
        "  FROM terms t JOIN fb ON t.doc_id = fb.doc_id"
        "  LEFT JOIN q ON q.query_id = fb.query_id AND q.term = t.term"
        "  WHERE q.term IS NULL GROUP BY fb.query_id, t.term),"
        " exp AS (SELECT query_id, term,"
        f" CAST({fb_weight} AS DOUBLE) AS wt FROM"
        "  (SELECT query_id, term, ROW_NUMBER() OVER (PARTITION BY"
        "   query_id ORDER BY fb_tf DESC, term ASC) AS r FROM cand)"
        f"  WHERE r <= {fb_terms}),"
        " allq AS (SELECT query_id, term, CAST(1.0 AS DOUBLE) AS wt"
        "  FROM q UNION ALL SELECT query_id, term, wt FROM exp),"
        " idf2 AS (SELECT term,"
        "  ln(((SELECT n_docs FROM n) - COUNT(*) + 0.5)"
        "   / (COUNT(*) + 0.5) + 1.0) AS idf"
        "  FROM terms WHERE term IN (SELECT term FROM allq)"
        "  GROUP BY term),"
        " scored2 AS (SELECT a.query_id, t.doc_id,"
        f"  SUM(a.wt * i.idf * (t.tf * ({BM25_K1} + 1.0))"
        f"   / (t.tf + {BM25_K1} * (1.0 - {BM25_B}"
        f"    + {BM25_B} * dl.dl / (SELECT avgdl FROM ad)))) AS score"
        "  FROM terms t JOIN allq a ON t.term = a.term"
        "  JOIN idf2 i ON t.term = i.term"
        "  JOIN dl ON t.doc_id = dl.doc_id"
        "  GROUP BY a.query_id, t.doc_id),"
        " ranked AS (SELECT query_id, doc_id, score, ROW_NUMBER() OVER"
        "  (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank"
        "  FROM scored2)"
        " SELECT query_id, doc_id,"
        " CAST(ROUND(score, 5) AS DOUBLE) AS bm25_prf,"
        f" CAST(rank AS INTEGER) AS rank FROM ranked WHERE rank <= {k}"
    )


# ---------------------------------------------------------------------------
# Concat-and-chunk sequence packing
# ---------------------------------------------------------------------------

PACK_SHARDS = 16


def pack_chunks(
    docs: DataFrame, budget: int = 512, n_shards: int = PACK_SHARDS
) -> DataFrame:
    """[doc_id, shard, start_chunk, end_chunk]: the pretraining
    concat-and-chunk layout. Docs are hash-sharded; within a shard the
    token streams are concatenated in doc_id order and cut every
    `budget` tokens; a doc occupies chunks [start_chunk, end_chunk]
    of its shard (end inclusive; docs may span cuts — that is the
    point of the layout). Empty docs (0 tokens) sit at their cut
    position with end = start.

    `n_shards` is the packing parallelism AND part of the output
    contract (chunk ids are per-shard): the default suits test scale;
    a production run sizes it to O(executor count) so each shard's
    window sort fits one task."""
    shard = (
        (F.col("doc_id") * F.lit(SPLIT_HASH_K)) % F.lit(SPLIT_HASH_MOD)
    ) % F.lit(n_shards)
    toks = docs.select(
        "doc_id",
        shard.alias("shard"),
        F.size(F.expr(SPARK_TOKENS)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = toks.withColumn("cum_incl", F.sum("n_tokens").over(w))
    return cum.select(
        "doc_id",
        "shard",
        F.floor((F.col("cum_incl") - F.col("n_tokens")) / F.lit(budget))
        .cast("bigint")
        .alias("start_chunk"),
        F.floor(
            F.greatest(
                F.col("cum_incl") - 1, F.col("cum_incl") - F.col("n_tokens")
            )
            / F.lit(budget)
        )
        .cast("bigint")
        .alias("end_chunk"),
    )


def pack_chunks_sql(budget: int = 512, n_shards: int = PACK_SHARDS) -> str:
    return (
        "WITH toks AS (SELECT doc_id,"
        f" (doc_id * {SPLIT_HASH_K}) % {SPLIT_HASH_MOD} % {n_shards}"
        " AS shard,"
        f" len({DUCK_TOKENS}) AS n_tokens FROM documents),"
        " cum AS (SELECT doc_id, shard, n_tokens,"
        "  SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_incl"
        "  FROM toks)"
        " SELECT doc_id, shard,"
        f" CAST(FLOOR((cum_incl - n_tokens) / {budget}.0) AS BIGINT)"
        " AS start_chunk,"
        " CAST(FLOOR(GREATEST(cum_incl - 1, cum_incl - n_tokens)"
        f" / {budget}.0) AS BIGINT) AS end_chunk"
        " FROM cum"
    )


LENGTH_BATCH = 32  # docs per batch within a length bucket


def length_bucketed_batches(
    docs: DataFrame, batch_size: int = LENGTH_BATCH
) -> DataFrame:
    """[length_bucket, batch, n_docs, max_tokens, sum_tokens,
    waste_ppm] — SFT/inference batch layout with power-of-two length
    bucketing: bucket = floor(log2(n_tokens + 1)) (map-only — a
    global NTILE would serialize 100 TB through one sort partition),
    then fixed-size batches of doc_id order within each bucket. The
    per-batch padding waste (batch_size-padded tokens wasted per
    million) is the quantity bucketing minimizes: batching without
    length grouping pads every sequence to the global batch max.
    Exact integers; log2 is engine-stable (exact at the only values
    adjacent to bucket boundaries, the powers of two)."""
    toks = docs.select(
        "doc_id",
        F.floor(F.log2(F.size(F.expr(SPARK_TOKENS)) + F.lit(1)))
        .cast("bigint")
        .alias("length_bucket"),
        F.size(F.expr(SPARK_TOKENS)).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy("length_bucket").orderBy("doc_id")
    batched = toks.withColumn(
        "batch",
        F.floor((F.row_number().over(w) - 1) / F.lit(batch_size))
        .cast("bigint"),
    )
    agg = batched.groupBy("length_bucket", "batch").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    padded = F.col("n_docs") * F.col("max_tokens")
    return agg.select(
        "length_bucket",
        "batch",
        "n_docs",
        "max_tokens",
        "sum_tokens",
        F.when(padded > 0,
               F.floor((padded - F.col("sum_tokens")) * F.lit(1_000_000)
                       / padded).cast("bigint"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("waste_ppm"),
    )


def length_bucketed_batches_sql(batch_size: int = LENGTH_BATCH) -> str:
    return (
        "WITH toks AS (SELECT doc_id,"
        f" CAST(FLOOR(log2(len({DUCK_TOKENS}) + 1)) AS BIGINT)"
        " AS length_bucket,"
        f" CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_tokens FROM documents),"
        " batched AS (SELECT length_bucket, n_tokens,"
        "  CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY length_bucket"
        f"  ORDER BY doc_id) - 1) / {batch_size}.0) AS BIGINT) AS batch"
        "  FROM toks),"
        " agg AS (SELECT length_bucket, batch, COUNT(*) AS n_docs,"
        "  MAX(n_tokens) AS max_tokens,"
        "  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens"
        "  FROM batched GROUP BY 1, 2)"
        " SELECT length_bucket, batch, CAST(n_docs AS BIGINT) AS n_docs,"
        " max_tokens, sum_tokens,"
        " CASE WHEN n_docs * max_tokens > 0 THEN"
        "  CAST(FLOOR((n_docs * max_tokens - sum_tokens) * 1000000.0"
        "  / (n_docs * max_tokens)) AS BIGINT)"
        "  ELSE CAST(0 AS BIGINT) END AS waste_ppm"
        " FROM agg"
    )


# ---------------------------------------------------------------------------
# Model-based quality scoring: a linear model over term features —
# the inference shape of a fastText-style quality classifier in a
# pretraining pipeline. The per-term weight here is a deterministic
# pure function of the term's 60-bit hash (stand-in for a learned
# weight TABLE, which would broadcast-join into the same plan), so the
# DuckDB oracle reproduces the score exactly. Length-normalized:
# score = Σ tf·w(term) / Σ tf.
# ---------------------------------------------------------------------------


def model_quality_scores(docs: DataFrame) -> DataFrame:
    """[doc_id, model_score_e5] for every document -- the score in
    1e-5 fixed point (tokenless docs score 0). One shuffle on (doc_id, term) for tf, one on doc_id for the
    weighted sum — a real model swaps the weight expression for a
    broadcast weight-table join, same plan otherwise."""
    from graph500_spark.operators.text import spark_strhash

    # Fixed-point THROUGHOUT: non-negative integer weights make the
    # weighted sum exact under any shuffle order, and the final
    # half-up rounding to 5 decimals is integer arithmetic
    # ((200*num + n) div (2*n)) -- no float op ever happens, so the
    # engines cannot disagree even at rounding boundaries (a float
    # formulation lost one doc in 500 to a half-ulp tie).
    w = f"({spark_strhash('term')} % 2001)"
    scored = (
        _terms(docs)
        .withColumn("w", F.expr(w))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("w")).alias("num"),
            F.sum("tf").alias("den"),
        )
        .select(
            "doc_id",
            F.expr("(200 * num + den) div (2 * den)").alias("model_score_e5"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("model_score_e5", F.lit(0))
            .cast("long")
            .alias("model_score_e5"),
        )
    )


def model_quality_scores_sql() -> str:
    from graph500_spark.operators.text import duck_strhash

    w = f"({duck_strhash('term')} % 2001)"
    return (
        f"WITH terms AS ({_DUCK_TERMS}),"
        f" scored AS (SELECT doc_id, (200 * SUM(tf * ({w})) + SUM(tf))"
        "  // (2 * SUM(tf)) AS model_score_e5"
        "  FROM terms GROUP BY doc_id)"
        " SELECT d.doc_id,"
        " CAST(COALESCE(s.model_score_e5, 0) AS BIGINT) AS model_score_e5"
        " FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id"
    )


# ---------------------------------------------------------------------------
# Hashing-trick feature vectors
# ---------------------------------------------------------------------------

FEATURE_DIM = 256


def feature_hashing(docs: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Signed hashing-trick bag-of-tokens features (Weinberger et al.
    2009): [doc_id, feature_idx, feature_val] sparse rows, where
    feature_idx = h(token) mod dim and each occurrence contributes
    sign ±1 from the next hash bit (the unbiased-estimator variant).
    Rows whose signs cancel to 0 are dropped (sparse semantics).

    The fixed-width featurizer for linear/NB models over unbounded
    vocabularies — no vocabulary table to build, broadcast, or keep
    consistent across a 1000-executor job; the hash IS the vocabulary.
    Plan: explode inside the scan projection → one map-side-combinable
    hash shuffle on (doc_id, idx). Uses the engine-wide md5 hash tier
    so the DuckDB oracle reproduces the exact same features."""
    from graph500_spark.operators.text import spark_strhash

    # `div` (integer division) — float `/` would lose exactness above
    # 2^53 on the 60-bit hash values.
    h = spark_strhash("token")
    toks = docs.select(
        "doc_id", F.explode(F.expr(SPARK_TOKENS)).alias("token")
    ).select(
        "doc_id",
        F.expr(f"cast(({h}) % {dim} as int)").alias("feature_idx"),
        F.expr(
            f"cast(case when (({h}) div {dim}) % 2 = 0"
            " then 1 else -1 end as bigint)"
        ).alias("sign"),
    )
    return (
        toks.groupBy("doc_id", "feature_idx")
        .agg(F.sum("sign").cast("long").alias("feature_val"))
        .filter(F.col("feature_val") != 0)
    )


def feature_hashing_sql(dim: int = FEATURE_DIM) -> str:
    from graph500_spark.operators.text import duck_strhash

    h = duck_strhash("token")
    return (
        f"WITH toks AS (SELECT doc_id, unnest({DUCK_TOKENS}) AS token"
        " FROM documents),"
        f" feats AS (SELECT doc_id,"
        f" CAST(({h}) % {dim} AS INTEGER) AS feature_idx,"
        f" CASE WHEN (({h}) // {dim}) % 2 = 0 THEN 1 ELSE -1 END AS sign"
        " FROM toks)"
        " SELECT doc_id, feature_idx,"
        " CAST(SUM(sign) AS BIGINT) AS feature_val"
        " FROM feats GROUP BY 1, 2 HAVING SUM(sign) <> 0"
    )


def pack_efficiency(
    docs: DataFrame, budget: int = 512, n_shards: int = PACK_SHARDS
) -> DataFrame:
    """Packing-layout utilization report over pack_chunks:
    [shard, n_docs, total_tokens, n_chunks, fill_ratio] — how full
    each shard's chunks are (fill_ratio < 1 means tail padding waste;
    the knob-tuning readout for budget / n_shards).

    total_tokens is the exact integer per-shard sum; n_chunks =
    max(end_chunk)+1; fill_ratio = total_tokens / (n_chunks·budget)
    is one deterministic division rounded to 6. Plan: reuses
    pack_chunks' shard window output — one grouped agg on the shard
    key, no additional scan of the text column."""
    chunks = pack_chunks(docs, budget=budget, n_shards=n_shards)
    toks = docs.select(
        "doc_id", F.size(F.expr(SPARK_TOKENS)).cast("long").alias("n_tokens")
    )
    per_shard = (
        chunks.join(toks, "doc_id")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (F.max("end_chunk") + 1).cast("long").alias("n_chunks"),
        )
    )
    return per_shard.select(
        "shard",
        "n_docs",
        "total_tokens",
        "n_chunks",
        F.round(
            F.col("total_tokens")
            / (F.col("n_chunks").cast("double") * budget),
            6,
        ).alias("fill_ratio"),
    )


def pack_efficiency_sql(
    budget: int = 512, n_shards: int = PACK_SHARDS
) -> str:
    return (
        f"WITH chunks AS ({pack_chunks_sql(budget, n_shards)}),"
        f" toks AS (SELECT doc_id, CAST(len({DUCK_TOKENS}) AS BIGINT)"
        " AS n_tokens FROM documents),"
        " per_shard AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,"
        " CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,"
        " CAST(MAX(end_chunk) + 1 AS BIGINT) AS n_chunks"
        " FROM chunks JOIN toks USING (doc_id) GROUP BY shard)"
        " SELECT shard, n_docs, total_tokens, n_chunks,"
        f" ROUND(total_tokens / (CAST(n_chunks AS DOUBLE) * {budget}), 6)"
        " AS fill_ratio FROM per_shard"
    )


# ---------------------------------------------------------------------------
# Sliding token chunks (RAG / context-window preparation)
# ---------------------------------------------------------------------------

CHUNK_SIZE = 64
CHUNK_STRIDE = 48  # size - overlap; overlap = 16


def doc_chunks(
    docs: DataFrame, size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Sliding token-window chunking: [doc_id, chunk_idx,
    start_token, n_chunk_tokens, chunk_text] — chunk i covers tokens
    [i·stride, i·stride + size); starts run while start < n_tokens,
    so trailing chunks may be short. Empty docs produce no chunks.

    The RAG / context-window preparation op (overlap = size − stride
    preserves boundary context). chunk_text is the space-joined token
    slice (token-space chunks: the tokenizer's whitespace
    normalization is part of the contract). Plan: pure Column algebra
    — tokens array built once in the scan projection, chunk axis via
    explode(sequence), slice + array_join per row; no shuffle, no
    UDF; at 100 TB this pipelines into the write stage."""
    if not (0 < stride <= size):
        raise ValueError("need 0 < stride <= size")
    toks = docs.select(
        "doc_id", F.expr(SPARK_TOKENS).alias("ts")
    ).withColumn("n", F.size("ts"))
    nonempty = toks.filter(F.col("n") >= 1)
    idx = nonempty.withColumn(
        "chunk_idx",
        F.explode(
            F.expr(f"sequence(0, cast((n - 1) div {stride} as int))")
        ),
    )
    start = F.col("chunk_idx") * stride
    return idx.select(
        "doc_id",
        F.col("chunk_idx").cast("integer").alias("chunk_idx"),
        start.cast("long").alias("start_token"),
        F.least(F.lit(size), F.col("n") - start)
        .cast("long")
        .alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("ts"), start + 1, F.lit(size)), " "
        ).alias("chunk_text"),
    )


def doc_chunks_sql(size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> str:
    return (
        f"WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS ts,"
        f" len({DUCK_TOKENS}) AS n FROM documents),"
        " idx AS (SELECT doc_id, ts, n,"
        f" unnest(generate_series(0, (n - 1) // {stride})) AS chunk_idx"
        " FROM toks WHERE n >= 1)"
        " SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,"
        f" CAST(chunk_idx * {stride} AS BIGINT) AS start_token,"
        f" CAST(LEAST({size}, n - chunk_idx * {stride}) AS BIGINT)"
        " AS n_chunk_tokens,"
        f" array_to_string(ts[chunk_idx * {stride} + 1 :"
        f" chunk_idx * {stride} + {size}], ' ') AS chunk_text"
        " FROM idx"
    )


QW_SAMPLE_SALT = 7919
QW_SAMPLE_BUCKETS = 100000


def quality_weighted_sample(docs: DataFrame) -> DataFrame:
    """Importance sampling by model quality: keep each doc with
    probability ∝ its model_quality_scores fixed-point score —
    [doc_id, model_score_e5, bucket], kept rows only.

    The standard curation move between hard filtering (lose all
    low-quality mass) and no filtering (keep all noise): low-score
    docs survive at a proportionally lower rate, preserving
    distributional coverage. Pure integer comparison (salted
    multiplicative-hash bucket < score_e5), so the decision is
    deterministic, append-stable, and independent of the train/test
    split and stratified-sample decisions (different salt)."""
    scored = model_quality_scores(docs)
    bucket = (
        ((F.col("doc_id") + QW_SAMPLE_SALT) * SPLIT_HASH_K)
        % SPLIT_HASH_MOD
        % QW_SAMPLE_BUCKETS
    )
    return (
        scored.select(
            "doc_id", "model_score_e5", bucket.alias("bucket")
        )
        .filter(F.col("bucket") < F.col("model_score_e5"))
    )


def quality_weighted_sample_sql() -> str:
    return (
        f"WITH scored AS ({model_quality_scores_sql()})"
        " SELECT doc_id, model_score_e5,"
        f" (doc_id + {QW_SAMPLE_SALT}) * {SPLIT_HASH_K}"
        f" % {SPLIT_HASH_MOD} % {QW_SAMPLE_BUCKETS} AS bucket"
        " FROM scored"
        f" WHERE (doc_id + {QW_SAMPLE_SALT}) * {SPLIT_HASH_K}"
        f" % {SPLIT_HASH_MOD} % {QW_SAMPLE_BUCKETS} < model_score_e5"
    )


TFIDF_SIM_SCALE = 1_000_000


def tfidf_cosine_pairs(
    docs: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Sparse lexical similarity: [doc_a, doc_b, cosine] — TF-IDF
    weighted cosine over within-source doc pairs with cosine >=
    threshold, doc_a < doc_b.

    The bag-of-words sibling of minhash/simhash near-dup detection:
    catches topical/term-overlap similarity that set-based shingles
    miss. Exactness: idf is quantized to integer micro-nats (ONE log
    per term), weights w = tf·idf_q are integers, so dot products and
    squared norms are exact order-free integer sums; the cosine is
    one float expression rounded to 5. Plan: term-keyed self-join
    within the source block (the inverted-index shape — never
    all-pairs across the corpus; at 100 TB block by LSH candidates
    instead), one pair-keyed sum, norms broadcast back."""
    terms = _terms(docs).join(docs.select("doc_id", "source"), "doc_id")
    n_docs = docs.select(F.count(F.lit(1)).alias("n"))
    df_t = terms.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    idf = df_t.crossJoin(F.broadcast(n_docs)).select(
        "term",
        F.round(
            F.log((F.col("n") + 1).cast("double") / (F.col("df") + 1))
            * TFIDF_SIM_SCALE
        )
        .cast("long")
        .alias("idf_q"),
    )
    w = terms.join(F.broadcast(idf), "term").select(
        "doc_id",
        "source",
        "term",
        (F.col("tf") * F.col("idf_q")).cast("long").alias("w"),
    )
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("n2")
    )
    a = w.select(
        F.col("doc_id").alias("doc_a"), "source", "term",
        F.col("w").alias("wa"),
    )
    b = w.select(
        F.col("doc_id").alias("doc_b"), "source", "term",
        F.col("w").alias("wb"),
    )
    dots = (
        a.join(b, ["source", "term"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("long").alias("dot"))
    )
    cos = F.round(
        F.col("dot")
        / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2"))),
        5,
    ).cast("double")
    return (
        dots.join(
            norms.select(F.col("doc_id").alias("doc_a"),
                         F.col("n2").alias("na2")), "doc_a"
        )
        .join(
            norms.select(F.col("doc_id").alias("doc_b"),
                         F.col("n2").alias("nb2")), "doc_b"
        )
        .select("doc_a", "doc_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def tfidf_cosine_pairs_sql(threshold: float = 0.5) -> str:
    return (
        f"WITH terms0 AS ({_DUCK_TERMS}),"
        " terms AS (SELECT t.doc_id, t.term, t.tf, d.source"
        " FROM terms0 t JOIN documents d USING (doc_id)),"
        " nd AS (SELECT COUNT(*) AS n FROM documents),"
        " dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df"
        " FROM terms GROUP BY term),"
        " idf AS (SELECT term,"
        " CAST(round(ln((n + 1) / CAST(df + 1 AS DOUBLE))"
        f" * {TFIDF_SIM_SCALE}) AS BIGINT) AS idf_q"
        " FROM dft CROSS JOIN nd),"
        " w AS (SELECT t.doc_id, t.source, t.term,"
        " CAST(t.tf * i.idf_q AS BIGINT) AS w"
        " FROM terms t JOIN idf i USING (term)),"
        " norms AS (SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2"
        " FROM w GROUP BY doc_id),"
        " dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
        " CAST(SUM(a.w * b.w) AS BIGINT) AS dot"
        " FROM w a JOIN w b ON a.source = b.source AND a.term = b.term"
        " AND a.doc_id < b.doc_id GROUP BY 1, 2)"
        " SELECT doc_a, doc_b,"
        " CAST(ROUND(dot / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(nb.n2)), 5)"
        " AS DOUBLE) AS cosine"
        " FROM dots JOIN norms na ON na.doc_id = dots.doc_a"
        " JOIN norms nb ON nb.doc_id = dots.doc_b"
        f" WHERE ROUND(dot / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(nb.n2)), 5)"
        f" >= {threshold}"
    )


CAP_PER_SOURCE = 50


def cap_per_source(docs: DataFrame, cap: int = CAP_PER_SOURCE) -> DataFrame:
    """Per-source quota enforcement (dataset-curation staple: no
    single crawl may dominate the mix): keep at most ``cap`` docs per
    source, selected DETERMINISTICALLY by the stable split hash with
    doc_id as the total-order tie-break — so the kept set is
    reproducible, append-stable for the survivors, and unbiased by
    ingestion order. Output: [doc_id, source, rk].

    Plan: one window partitioned by source under the (hash, doc_id)
    order — per-source state only; never a global sort. At 100 TB a
    hot source's partition is bounded by AQE skew splitting ahead of
    the window's own source-keyed exchange."""
    h = (
        (F.col("doc_id") + F.lit(QW_SAMPLE_SALT)) * F.lit(SPLIT_HASH_K)
    ) % F.lit(SPLIT_HASH_MOD)
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= cap)
    )


def cap_per_source_sql(cap: int = CAP_PER_SOURCE) -> str:
    h = f"(doc_id + {QW_SAMPLE_SALT}) * {SPLIT_HASH_K} % {SPLIT_HASH_MOD}"
    return (
        "SELECT doc_id, source, rk FROM ("
        " SELECT doc_id, source, CAST(ROW_NUMBER() OVER ("
        f" PARTITION BY source ORDER BY {h}, doc_id) AS BIGINT) AS rk"
        " FROM documents)"
        f" WHERE rk <= {cap}"
    )


# ---------------------------------------------------------------------------
# Curriculum ordering: exact global rank without a global sort
# ---------------------------------------------------------------------------

CURRICULUM_PARTS = 8


def curriculum_order(
    docs: DataFrame, num_parts: int = CURRICULUM_PARTS
) -> DataFrame:
    """[doc_id, model_score_e5, global_rank] — every document's exact
    1-based position in the quality-descending curriculum (score
    desc, doc_id as the deterministic tiebreak).

    The naive formulation — ROW_NUMBER() over an unpartitioned window
    — funnels the whole table through ONE task; at 100 TB that is the
    job. This is the scale-correct two-pass equivalent:

      1. repartitionByRange on the full sort key: each partition holds
         a contiguous, disjoint key range (the same sampling-based
         range exchange a global sort uses — but no merge afterwards);
      2. per-partition ROW_NUMBER (each task ranks only its slice);
      3. partition row-counts → prefix-sum offsets (num_parts rows on
         the driver, the bounded O(parts) budget runner.py uses) —
         global_rank = offset + local_rank.

    Rank correctness does not depend on where the sampled range
    boundaries fall — only on the partitioner's contiguous-disjoint
    guarantee — so the result is exactly ROW_NUMBER() OVER (ORDER BY
    score DESC, doc_id), which is what the DuckDB oracle checks."""
    scores = model_quality_scores(docs)
    ranged = scores.repartitionByRange(
        num_parts,
        F.col("model_score_e5").desc(),
        F.col("doc_id").asc(),
    ).withColumn("part", F.spark_partition_id())
    w = Window.partitionBy("part").orderBy(
        F.col("model_score_e5").desc(), F.col("doc_id").asc()
    )
    local = ranged.withColumn(
        "local_rank", F.row_number().over(w).cast("long")
    ).transform(truncate_plan)
    counts = sorted(
        (r["part"], r["n"])
        for r in local.groupBy("part").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    )
    offsets, acc = {}, 0
    for part, n in counts:
        offsets[part] = acc
        acc += n
    off_df = local.sparkSession.createDataFrame(
        [(p, o) for p, o in offsets.items()], "part: int, offset: long"
    )
    out = (
        local.join(F.broadcast(off_df), "part")
        .select(
            "doc_id",
            "model_score_e5",
            (F.col("offset") + F.col("local_rank")).alias("global_rank"),
        )
    )
    return out


def curriculum_order_sql() -> str:
    return (
        f"WITH scored AS ({model_quality_scores_sql()})"
        " SELECT doc_id, model_score_e5,"
        " CAST(ROW_NUMBER() OVER (ORDER BY model_score_e5 DESC, doc_id)"
        " AS BIGINT) AS global_rank FROM scored"
    )


# ---------------------------------------------------------------------------
# DSIR-style importance weights — data selection for LM pretraining
# (Xie et al. 2023, "Data Selection for Language Models via Importance
# Resampling"): score every document in the raw pool by how much more
# likely its hashed-unigram bag is under the target-domain distribution
# than under the rest-of-pool distribution. Documents with high weights
# are the ones importance resampling keeps.
# ---------------------------------------------------------------------------

DSIR_DIM = 1024
DSIR_SCALE = 1_000_000  # micro-nats per log unit
DSIR_TARGETS = ("src0", "src1")


def dsir_weights(
    docs: DataFrame,
    target_sources: tuple[str, ...] = DSIR_TARGETS,
    dim: int = DSIR_DIM,
) -> DataFrame:
    """[doc_id, n_tokens, dsir_weight_q] — per-document DSIR importance
    weight in integer micro-nats: the sum over token occurrences of
    ln(p_target(bucket)/p_rest(bucket)), with hashed n-gram features
    (unigrams → md5-hash buckets mod ``dim``) and add-1 smoothing on
    both distributions. Zero-token docs are absent (cf. unigram_logppl).

    Exactness: each bucket's log-ratio is quantized ONCE —
    round(ln((c_t+1)(N_r+dim) / ((c_r+1)(N_t+dim))) · 1e6) — the
    numerator/denominator are exact int64 products (headroom to ~3e9
    tokens per side; rescale to per-million counts beyond), so the only
    float op is a single two-operand ln both engines evaluate on the
    same double. Per-doc sums of the quantized values are exact.

    Plan shape: one token explode feeds BOTH distributions via
    conditional aggregation on a single groupBy(bucket) — never two
    scans; totals are a second tiny agg; the ``dim``-row model
    broadcasts back onto the token stream (the 1000-executor shape:
    the model is a broadcast variable, the corpus shuffles once on
    doc_id for the final sum).
    """
    from graph500_spark.operators.text import spark_strhash

    h = spark_strhash("token")
    toks = docs.select(
        "doc_id",
        F.col("source").isin(*target_sources).alias("is_target"),
        F.explode(F.expr(SPARK_TOKENS)).alias("token"),
    ).select(
        "doc_id",
        "is_target",
        F.expr(f"cast(({h}) % {dim} as int)").alias("bucket"),
    )
    per_bucket = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_t"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("c_r"),
    )
    totals = per_bucket.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    model = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log(
                ((F.col("c_t") + 1) * (F.col("n_r") + dim)).cast("double")
                / ((F.col("c_r") + 1) * (F.col("n_t") + dim)).cast("double")
            )
            * DSIR_SCALE
        )
        .cast("long")
        .alias("lr_q"),
    )
    return (
        toks.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lr_q").cast("long").alias("dsir_weight_q"),
        )
    )


def dsir_weights_sql(
    target_sources: tuple[str, ...] = DSIR_TARGETS,
    dim: int = DSIR_DIM,
) -> str:
    from graph500_spark.operators.text import duck_strhash

    h = duck_strhash("token")
    targets = ", ".join(f"'{s}'" for s in target_sources)
    return (
        "WITH toks AS (SELECT doc_id,"
        f" source IN ({targets}) AS is_target,"
        f" CAST(({h}) % {dim} AS INTEGER) AS bucket"
        f" FROM (SELECT doc_id, source, unnest({DUCK_TOKENS}) AS token"
        " FROM documents)),"
        " per_bucket AS (SELECT bucket,"
        " CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS c_t,"
        " CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS c_r"
        " FROM toks GROUP BY bucket),"
        " tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_t,"
        " CAST(SUM(c_r) AS BIGINT) AS n_r FROM per_bucket),"
        " model AS (SELECT bucket,"
        f" CAST(round(ln(CAST((c_t + 1) * (n_r + {dim}) AS DOUBLE)"
        f" / CAST((c_r + 1) * (n_t + {dim}) AS DOUBLE))"
        f" * {DSIR_SCALE}) AS BIGINT) AS lr_q"
        " FROM per_bucket CROSS JOIN tot)"
        " SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,"
        " CAST(SUM(lr_q) AS BIGINT) AS dsir_weight_q"
        " FROM toks JOIN model USING (bucket) GROUP BY doc_id"
    )


# ---------------------------------------------------------------------------
# Population-stability-index drift per source — the distribution-shift
# monitor a continuously-ingesting corpus pipeline runs per batch/source:
# PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) between each source's hashed-token
# distribution (p) and the corpus-wide distribution (q). PSI ≥ 0 always;
# ~0 means the source looks like the corpus, large means drift.
# ---------------------------------------------------------------------------

PSI_DIM = 64


def source_drift_psi(docs: DataFrame, dim: int = PSI_DIM) -> DataFrame:
    """[source, psi_pico] — integer-exact PSI of every source's
    hashed-token-bucket distribution against the whole corpus, in
    pico-units (ppm probability × micro-nat log), ordered by source.

    Exactness: probabilities are round-half-up integer ppm via the
    ``(2·10⁶·num + den) div (2·den)`` trick (no float division); the
    log-ratio is the single quantized ln over a ratio of exact int64
    products (cf. dsir_weights); each PSI term is then an exact int64
    product ≤ ~1.4e13, summed over ``dim`` buckets. Add-1 smoothing
    keeps empty (source, bucket) cells finite; the (source × bucket)
    grid is completed explicitly so absent cells contribute their
    smoothed term identically in both engines.

    Plan shape: one explode → one groupBy(source, bucket) with map-side
    combine; the corpus marginal and per-source totals derive from that
    ≤ |sources|·dim-row table (no rescan); the grid is a broadcast
    product of two tiny aggregates left-joined back. At 100 TB only the
    first aggregation touches the data."""
    from graph500_spark.operators.text import spark_strhash

    h = spark_strhash("token")
    toks = docs.select(
        "source", F.explode(F.expr(SPARK_TOKENS)).alias("token")
    ).select(
        "source", F.expr(f"cast(({h}) % {dim} as int)").alias("bucket")
    )
    cell = toks.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c_sb")
    )
    by_bucket = cell.groupBy("bucket").agg(
        F.sum("c_sb").alias("c_b")
    )
    by_source = cell.groupBy("source").agg(F.sum("c_sb").alias("n_s"))
    total = by_bucket.agg(F.sum("c_b").alias("n"))
    grid = (
        by_source.crossJoin(F.broadcast(by_bucket))
        .join(cell, ["source", "bucket"], "left")
        .select(
            "source",
            "bucket",
            F.coalesce("c_sb", F.lit(0)).alias("c_sb"),
            "c_b",
            "n_s",
        )
        .crossJoin(F.broadcast(total))
    )
    p_ppm = F.expr(
        f"(2000000 * (c_sb + 1) + (n_s + {dim})) div (2 * (n_s + {dim}))"
    )
    q_ppm = F.expr(
        f"(2000000 * (c_b + 1) + (n + {dim})) div (2 * (n + {dim}))"
    )
    lr_q = (
        F.round(
            F.log(
                ((F.col("c_sb") + 1) * (F.col("n") + dim)).cast("double")
                / ((F.col("c_b") + 1) * (F.col("n_s") + dim)).cast("double")
            )
            * DSIR_SCALE
        )
        .cast("long")
    )
    return (
        grid.select(
            "source", ((p_ppm - q_ppm) * lr_q).alias("term")
        )
        .groupBy("source")
        .agg(F.sum("term").cast("long").alias("psi_pico"))
        .orderBy("source")
    )


def source_drift_psi_sql(dim: int = PSI_DIM) -> str:
    from graph500_spark.operators.text import duck_strhash

    h = duck_strhash("token")
    return (
        "WITH toks AS (SELECT source,"
        f" CAST(({h}) % {dim} AS INTEGER) AS bucket"
        f" FROM (SELECT source, unnest({DUCK_TOKENS}) AS token"
        " FROM documents)),"
        " cell AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS c_sb"
        " FROM toks GROUP BY source, bucket),"
        " by_bucket AS (SELECT bucket, CAST(SUM(c_sb) AS BIGINT) AS c_b"
        " FROM cell GROUP BY bucket),"
        " by_source AS (SELECT source, CAST(SUM(c_sb) AS BIGINT) AS n_s"
        " FROM cell GROUP BY source),"
        " tot AS (SELECT CAST(SUM(c_b) AS BIGINT) AS n FROM by_bucket),"
        " grid AS (SELECT s.source, b.bucket,"
        " COALESCE(c.c_sb, 0) AS c_sb, b.c_b, s.n_s, t.n"
        " FROM by_source s CROSS JOIN by_bucket b CROSS JOIN tot t"
        " LEFT JOIN cell c ON c.source = s.source AND c.bucket = b.bucket),"
        " terms AS (SELECT source,"
        f" ((2000000 * (c_sb + 1) + (n_s + {dim})) // (2 * (n_s + {dim}))"
        f" - (2000000 * (c_b + 1) + (n + {dim})) // (2 * (n + {dim})))"
        f" * CAST(round(ln(CAST((c_sb + 1) * (n + {dim}) AS DOUBLE)"
        f" / CAST((c_b + 1) * (n_s + {dim}) AS DOUBLE))"
        f" * {DSIR_SCALE}) AS BIGINT) AS term"
        " FROM grid)"
        " SELECT source, CAST(SUM(term) AS BIGINT) AS psi_pico"
        " FROM terms GROUP BY source ORDER BY source"
    )


def source_top_terms(docs: DataFrame, k: int = 10) -> DataFrame:
    """[source, term, n_occ, ctfidf_micro, rank] — each source's k most
    CHARACTERISTIC terms by class-based TF-IDF (the BERTopic c-TF-IDF
    shape, Grootendorst 2022): treat each source as one class document,
    score = (c_ts / C_s) · ln(1 + C̄ / f_t) with c_ts the term's count
    in the source, C_s the source's token total, C̄ the mean source
    size, f_t the corpus-wide term count. The what-makes-this-source-
    different readout used for corpus curation and mixture debugging —
    complements tfidf_top_terms (per-DOC) and source_drift_psi
    (distributional drift).

    Determinism: the score is ONE double expression per row (a ratio,
    one log, one product — no float accumulation; all inputs exact
    integer counts), rounded to micro-units; ties break (score desc,
    term asc). Plan: one (source, term) count shuffle with map-side
    partials (Zipf skew absorbed there), corpus term totals by a
    second term-keyed agg joined back, totals broadcast; top-k via a
    window PARTITIONED BY source over the per-source vocabulary —
    never a global sort. At 100 TB the only full-data exchange is the
    (source, term) count."""
    tok = docs.select(
        "source", F.explode(F.expr(SPARK_TOKENS)).alias("term")
    )
    # cts feeds THREE branches (source totals, term totals, scoring);
    # materialize so the tokenize+count pass runs once, not three
    # times (Catalyst does not CSE across plan branches)
    cts = (
        tok.groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .transform(truncate_plan)
    )
    src_tot = cts.groupBy("source").agg(
        F.sum("n_occ").cast("long").alias("c_s")
    )
    term_tot = cts.groupBy("term").agg(
        F.sum("n_occ").cast("long").alias("f_t")
    )
    avg_c = src_tot.agg(
        (F.sum("c_s") / F.count(F.lit(1))).alias("c_bar")
    )
    scored = (
        cts.join(F.broadcast(src_tot), "source")
        .join(term_tot, "term")
        .crossJoin(F.broadcast(avg_c))
        .select(
            "source",
            "term",
            "n_occ",
            F.round(
                F.col("n_occ")
                / F.col("c_s")
                * F.log(F.lit(1.0) + F.col("c_bar") / F.col("f_t"))
                * 1_000_000
            )
            .cast("long")
            .alias("ctfidf_micro"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("ctfidf_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def source_top_terms_sql(k: int = 10) -> str:
    return (
        "WITH tok AS (SELECT source,"
        f" unnest({DUCK_TOKENS}) AS term FROM documents),"
        " cts AS (SELECT source, term,"
        " CAST(COUNT(*) AS BIGINT) AS n_occ FROM tok GROUP BY 1, 2),"
        " st AS (SELECT source, CAST(SUM(n_occ) AS BIGINT) AS c_s"
        " FROM cts GROUP BY source),"
        " tt AS (SELECT term, CAST(SUM(n_occ) AS BIGINT) AS f_t"
        " FROM cts GROUP BY term),"
        " ac AS (SELECT SUM(c_s) / COUNT(*) AS c_bar FROM st),"
        " scored AS (SELECT cts.source, cts.term, cts.n_occ,"
        " CAST(round(cts.n_occ / CAST(st.c_s AS DOUBLE)"
        "  * ln(1.0 + ac.c_bar / CAST(tt.f_t AS DOUBLE))"
        "  * 1000000) AS BIGINT) AS ctfidf_micro"
        " FROM cts JOIN st USING (source) JOIN tt USING (term), ac),"
        " ranked AS (SELECT source, term, n_occ, ctfidf_micro,"
        " CAST(ROW_NUMBER() OVER (PARTITION BY source"
        "  ORDER BY ctfidf_micro DESC, term ASC) AS INTEGER) AS rank"
        " FROM scored)"
        " SELECT source, term, n_occ, ctfidf_micro, rank FROM ranked"
        f" WHERE rank <= {k}"
    )


def ks_source_drift(docs: DataFrame) -> DataFrame:
    """[source, n_source, ks_ppm, at_value] — the two-sample
    Kolmogorov-Smirnov distance between each source's document-length
    distribution (n_chars) and the whole corpus: D_s = sup_x
    |F_s(x) − F_all(x)|, the standard drift test a data pipeline runs
    per ingest source (the ECDF-difference sibling of
    source_drift_psi's binned PSI). at_value is the length where the
    sup is attained (ties to the smallest), n_source the source's doc
    count.

    EXACT integer sup: the supremum of an ECDF difference is attained
    at a sample point, and with cum_s, cum_all, n_s, n_all all
    integers, |F_s − F_all| at x orders identically to
    |cum_s(x)·n_all − cum_all(x)·n_s| (the positive denominator
    n_s·n_all is constant per source) — so the argmax is an integer
    comparison with no float rounding anywhere in the selection;
    ks_ppm is ONE rounded double division on the winning row. The
    cross-products are accumulated in DECIMAL(38,0) (HUGEINT in
    DuckDB): cum·n can reach n_s·n_all ≈ 1e19 at corpus scale, past
    int64 — same big-product discipline as graphlets.py.

    Plan: one (source, value) count shuffle compresses the data; the
    per-source ECDF needs cum counts at EVERY corpus-distinct value,
    so the distinct-value table is crossed with the (tiny, broadcast)
    source list and left-joined — |V|·|S| rows, windowed cumsums per
    source and for the corpus over the COMPRESSED value domain; the
    argmax is one more per-source window. At 100 TB: the count
    shuffle is the only full-data exchange; if one source's value
    domain explodes, the standard extension is range-partitioned
    prefix sums (the part_skyline note)."""
    vals = docs.select("source", F.col("n_chars").cast("long").alias("x"))
    sv = vals.groupBy("source", "x").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).transform(truncate_plan)
    return ks_from_counts(sv)


def ks_from_counts(sv: DataFrame) -> DataFrame:
    """The KS core over the COMPRESSED (source, x, c) count table —
    shared by the batch operator above and the streaming drift
    monitor (streaming/drift.py), whose carried state IS this table."""
    corpus = sv.groupBy("x").agg(F.sum("c").cast("long").alias("c_all"))
    n_all_df = sv.agg(F.sum("c").cast("long").alias("n_all"))
    n_s = sv.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    sources = n_s.select("source")
    grid = corpus.crossJoin(F.broadcast(sources)).join(
        sv, ["source", "x"], "left"
    ).select(
        "source",
        "x",
        "c_all",
        F.coalesce("c", F.lit(0)).cast("long").alias("c_s"),
    )
    w_s = (
        Window.partitionBy("source")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = grid.select(
        "source",
        "x",
        F.sum("c_s").over(w_s).cast("long").alias("cum_s"),
        F.sum("c_all").over(w_s).cast("long").alias("cum_all"),
    )
    scored = (
        cum.join(F.broadcast(n_s), "source")
        .crossJoin(F.broadcast(n_all_df))
        .select(
            "source",
            "x",
            "n_s",
            "n_all",
            F.abs(
                F.col("cum_s").cast("decimal(38,0)") * F.col("n_all")
                - F.col("cum_all").cast("decimal(38,0)") * F.col("n_s")
            ).alias("num"),
        )
    )
    w_max = Window.partitionBy("source").orderBy(
        F.desc("num"), F.asc("x")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w_max))
        .filter(F.col("rk") == 1)
        .select(
            "source",
            F.col("n_s").alias("n_source"),
            F.round(
                F.col("num").cast("double")
                / (F.col("n_s").cast("double") * F.col("n_all"))
                * 1_000_000
            )
            .cast("long")
            .alias("ks_ppm"),
            F.col("x").alias("at_value"),
        )
    )


def ks_source_drift_sql() -> str:
    return (
        "WITH sv AS (SELECT source, CAST(n_chars AS BIGINT) AS x,"
        " CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),"
        " corpus AS (SELECT x, CAST(SUM(c) AS BIGINT) AS c_all"
        " FROM sv GROUP BY x),"
        " na AS (SELECT CAST(SUM(c) AS BIGINT) AS n_all FROM sv),"
        " ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_s"
        " FROM sv GROUP BY source),"
        " grid AS (SELECT ns.source, corpus.x, corpus.c_all,"
        " CAST(COALESCE(sv.c, 0) AS BIGINT) AS c_s"
        " FROM corpus CROSS JOIN ns"
        " LEFT JOIN sv ON sv.source = ns.source AND sv.x = corpus.x),"
        " cum AS (SELECT source, x,"
        " CAST(SUM(c_s) OVER (PARTITION BY source ORDER BY x"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS BIGINT) AS cum_s,"
        " CAST(SUM(c_all) OVER (PARTITION BY source ORDER BY x"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS BIGINT) AS cum_all FROM grid),"
        " scored AS (SELECT cum.source, cum.x, ns.n_s, na.n_all,"
        " abs(CAST(cum.cum_s AS HUGEINT) * na.n_all"
        "  - CAST(cum.cum_all AS HUGEINT) * ns.n_s) AS num"
        " FROM cum JOIN ns ON ns.source = cum.source, na),"
        " ranked AS (SELECT source, x, n_s, n_all, num,"
        " ROW_NUMBER() OVER (PARTITION BY source"
        "  ORDER BY num DESC, x ASC) AS rk FROM scored)"
        " SELECT source, n_s AS n_source,"
        " CAST(round(CAST(num AS DOUBLE)"
        "  / (CAST(n_s AS DOUBLE) * n_all) * 1000000) AS BIGINT)"
        " AS ks_ppm,"
        " x AS at_value FROM ranked WHERE rk = 1"
    )


def js_source_divergence(docs: DataFrame) -> DataFrame:
    """[source, c_s, js_ppm] — Jensen-Shannon divergence between each
    source's token distribution and the whole corpus's: JS(P‖Q) =
    ½·KL(P‖M) + ½·KL(Q‖M) with M = (P+Q)/2. Completes the drift
    triad — PSI (binned, source_drift_psi) and KS (ECDF sup,
    ks_source_drift) readouts over doc-level stats; JS is the
    bounded-symmetric divergence over the TOKEN distribution itself,
    the standard corpus-mixture drift score (0 = identical mix,
    ln 2 ≈ 0.693 = disjoint vocabularies).

    Exactness (the tfidf_cosine_pairs convention): with a = c_st,
    A = C_s, b = c_t, B = C all exact integer counts,
    p/m = 2aB/(aB + bA) and q/m = 2bA/(aB + bA), so each term's two
    logarithms take ONE double ratio each; they are quantized to
    integer micro-nats per row (round ·10⁶ — the proven-safe
    granularity for cross-engine libm), then Σ a·L1 and Σ b·L2 are
    exact order-free integer sums in DECIMAL(38,0) (a·L1 can reach
    7e17 per row at corpus scale — the ks_source_drift big-product
    discipline). js_ppm = round(S1/(2A) + S2/(2B)) is one double
    expression on the 1-row-per-source result (the ·10⁶ nat scaling
    and the ppm scaling cancel).

    Plan: ONE (source, term) count shuffle compresses the corpus;
    corpus term totals are a second term-keyed agg of that table; the
    per-source grid (every corpus term × every source, KS-grid shape)
    is vocabulary×|sources| rows — windows-free, two DECIMAL sums per
    source. At 100 TB the only full-data exchange is the count."""
    tok = docs.select(
        "source", F.explode(F.expr(SPARK_TOKENS)).alias("term")
    )
    st = (
        tok.groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("a"))
        .transform(truncate_plan)
    )
    corpus = st.groupBy("term").agg(F.sum("a").cast("long").alias("b"))
    src_tot = st.groupBy("source").agg(
        F.sum("a").cast("long").alias("c_s")
    )
    corpus_tot = st.agg(F.sum("a").cast("long").alias("c_all"))
    grid = (
        corpus.crossJoin(F.broadcast(src_tot))
        .join(st, ["source", "term"], "left")
        .select(
            "source",
            "c_s",
            "b",
            F.coalesce("a", F.lit(0)).cast("long").alias("a"),
        )
        .crossJoin(F.broadcast(corpus_tot))
    )
    # ratio arguments in double (IEEE ops are engine-deterministic;
    # only ln needs the micro-nat quantization)
    ab = F.col("a").cast("double") * F.col("c_all")
    ba = F.col("b").cast("double") * F.col("c_s")
    l1 = F.round(F.log(F.lit(2.0) * ab / (ab + ba)) * 1_000_000).cast(
        "long"
    )
    l2 = F.round(F.log(F.lit(2.0) * ba / (ab + ba)) * 1_000_000).cast(
        "long"
    )
    terms = grid.select(
        "source",
        "c_s",
        "c_all",
        F.when(F.col("a") == 0, F.lit(0))
        .otherwise(F.col("a").cast("decimal(38,0)") * l1)
        .alias("t1"),
        (F.col("b").cast("decimal(38,0)") * l2).alias("t2"),
    )
    agg = terms.groupBy("source", "c_s", "c_all").agg(
        F.sum("t1").alias("s1"), F.sum("t2").alias("s2")
    )
    return agg.select(
        "source",
        "c_s",
        F.round(
            F.col("s1").cast("double") / (2.0 * F.col("c_s"))
            + F.col("s2").cast("double") / (2.0 * F.col("c_all"))
        )
        .cast("long")
        .alias("js_ppm"),
    )


def js_source_divergence_sql() -> str:
    return (
        "WITH tok AS (SELECT source,"
        f" unnest({DUCK_TOKENS}) AS term FROM documents),"
        " st AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS a"
        " FROM tok GROUP BY 1, 2),"
        " corpus AS (SELECT term, CAST(SUM(a) AS BIGINT) AS b"
        " FROM st GROUP BY term),"
        " srct AS (SELECT source, CAST(SUM(a) AS BIGINT) AS c_s"
        " FROM st GROUP BY source),"
        " ct AS (SELECT CAST(SUM(a) AS BIGINT) AS c_all FROM st),"
        " grid AS (SELECT srct.source, srct.c_s, corpus.term,"
        " corpus.b, CAST(COALESCE(st.a, 0) AS BIGINT) AS a, ct.c_all"
        " FROM corpus CROSS JOIN srct CROSS JOIN ct"
        " LEFT JOIN st ON st.source = srct.source"
        "  AND st.term = corpus.term),"
        " terms AS (SELECT source, c_s, c_all,"
        " CASE WHEN a = 0 THEN CAST(0 AS HUGEINT) ELSE"
        " CAST(a AS HUGEINT) * CAST(round(ln(2.0"
        "  * (CAST(a AS DOUBLE) * c_all)"
        "  / (CAST(a AS DOUBLE) * c_all + CAST(b AS DOUBLE) * c_s))"
        "  * 1000000) AS BIGINT) END AS t1,"
        " CAST(b AS HUGEINT) * CAST(round(ln(2.0"
        "  * (CAST(b AS DOUBLE) * c_s)"
        "  / (CAST(a AS DOUBLE) * c_all + CAST(b AS DOUBLE) * c_s))"
        "  * 1000000) AS BIGINT) AS t2 FROM grid),"
        " agg AS (SELECT source, c_s, c_all, SUM(t1) AS s1,"
        " SUM(t2) AS s2 FROM terms GROUP BY 1, 2, 3)"
        " SELECT source, c_s,"
        " CAST(round(CAST(s1 AS DOUBLE) / (2.0 * c_s)"
        "  + CAST(s2 AS DOUBLE) / (2.0 * c_all)) AS BIGINT) AS js_ppm"
        " FROM agg"
    )

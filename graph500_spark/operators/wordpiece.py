"""WordPiece-style greedy subword segmentation — the APPLY side of a
fixed-vocabulary tokenizer (Wu et al. 2016, "Google's Neural Machine
Translation System"; the greedy longest-match-first algorithm of
BERT's WordPiece), expressed Spark-first. Complements operators/bpe.py
(which TRAINS merges): WordPiece here derives a deterministic
frequency vocabulary and segments by longest match, the other classic
subword discipline an LLM data pipeline runs.

Vocabulary (deterministic, corpus-derived): every single character
occurring in the word table, plus the ``extra_tokens`` highest-weight
substrings of length 2..``max_piece_len`` (weight = sum of word
frequency over occurrences; ties broken by token asc). Greedy
longest-match then ALWAYS terminates: each step matches at least the
single-character fallback.

Scale shape (the BPE asymmetry again): everything runs on the
DISTINCT-WORD table (vocabulary-scale), never the corpus — the corpus
is scanned once by ``word_frequencies``. The learned vocabulary is a
few hundred strings, collected once (bounded driver finish, same
budget as BPE's 1-row argmax per merge) and folded into the plan as a
LITERAL array, so the 16-round segmentation loop is pure
whole-stage-codegen column algebra: per round one CASE over
``array_contains`` probes — no joins, no shuffles, no UDFs. Applying
to the corpus afterwards is a broadcast word→pieces lookup.

Words longer than ``max_word_len`` map to [UNK] (WordPiece's
max_input_chars_per_word rule), which also bounds the unroll depth:
a <=16-char word yields <=16 pieces, so 16 rounds reach fixpoint.

The same greedy loop is one SQL statement for the fixed round count —
the unrolled-CTE oracle discipline (see bpe.py docstring): the oracle
carries (pos, n, seg) through 16 chained CTEs, probing the vocabulary
as LIST literals via list_contains.

Reference parity note: the reference engine has no tokenizer surface
(it is a C++ MPI BFS benchmark); this operator extends the engine's
LLM-training-data capabilities alongside BPE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph500_spark.operators.bpe import word_frequencies

UNK = "[UNK]"


def wordpiece_vocab(
    words: DataFrame,
    extra_tokens: int = 200,
    max_piece_len: int = 4,
) -> DataFrame:
    """[token, weight] — single chars (weight = summed char
    occurrences) plus the top ``extra_tokens`` substrings of length
    2..max_piece_len by (weight desc, token asc). One explode +
    token-keyed agg over the distinct-word table, TakeOrdered head."""
    chars = (
        words.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word)),"
                    " i -> substring(word, i, 1))"
                )
            ).alias("token"),
            "wcount",
        )
        .groupBy("token")
        .agg(F.sum("wcount").cast("long").alias("weight"))
    )
    multis = None
    for plen in range(2, max_piece_len + 1):
        part = words.filter(F.length("word") >= plen).select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(word) - {plen} + 1),"
                    f" i -> substring(word, i, {plen}))"
                )
            ).alias("token"),
            "wcount",
        )
        multis = part if multis is None else multis.unionByName(part)
    top = (
        multis.groupBy("token")
        .agg(F.sum("wcount").cast("long").alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("token").asc())
        .limit(extra_tokens)
    )
    return chars.unionByName(top)


def wordpiece_segment(
    spark: SparkSession,
    docs: DataFrame,
    extra_tokens: int = 200,
    max_piece_len: int = 4,
    max_word_len: int = 16,
) -> DataFrame:
    """[word, wcount, n_subwords, seg] — greedy longest-match-first
    segmentation of every distinct corpus word under the derived
    vocabulary; ``seg`` is the space-joined piece sequence, words
    longer than max_word_len become [UNK]."""
    words = word_frequencies(docs)
    vocab_rows = wordpiece_vocab(
        words, extra_tokens=extra_tokens, max_piece_len=max_piece_len
    ).collect()  # bounded: |chars| + extra_tokens rows
    by_len: dict[int, list[str]] = {}
    for r in vocab_rows:
        by_len.setdefault(len(r["token"]), []).append(r["token"])
    # literal arrays folded into the plan: the probe is codegen'd
    # array_contains, no join against a vocab table
    arrs = {
        plen: F.array(*[F.lit(t) for t in sorted(toks)])
        for plen, toks in by_len.items()
        if plen >= 2
    }

    state = words.select(
        "word",
        F.col("wcount").cast("long").alias("wcount"),
        F.length("word").alias("len"),
        F.lit(1).alias("pos"),
        F.lit(0).alias("n"),
        F.lit("").alias("seg"),
    )
    for _ in range(max_word_len):
        step = F.lit(1)
        # build the longest-match CASE inside-out: ascending lengths,
        # so the LONGEST probe becomes the outermost (first-evaluated)
        # branch of the nested when-chain
        for plen in sorted(arrs):
            cand = F.expr(f"substring(word, pos, {plen})")
            ok = (F.col("pos") + plen - 1 <= F.col("len")) & (
                F.array_contains(arrs[plen], cand)
            )
            step = F.when(ok, F.lit(plen)).otherwise(step)
        active = F.col("pos") <= F.col("len")
        piece = F.expr("substring(word, pos, __step__)")
        state = (
            state.withColumn("__step__", step)
            .withColumn(
                "seg",
                F.when(
                    active,
                    F.concat(
                        F.col("seg"),
                        F.when(F.col("n") > 0, F.lit(" ")).otherwise(
                            F.lit("")
                        ),
                        piece,
                    ),
                ).otherwise(F.col("seg")),
            )
            .withColumn(
                "n",
                F.when(active, F.col("n") + 1).otherwise(F.col("n")),
            )
            .withColumn(
                "pos",
                F.when(active, F.col("pos") + F.col("__step__")).otherwise(
                    F.col("pos")
                ),
            )
            .drop("__step__")
        )
    return state.select(
        "word",
        "wcount",
        F.when(F.col("len") > max_word_len, F.lit(1))
        .otherwise(F.col("n"))
        .cast("long")
        .alias("n_subwords"),
        F.when(F.col("len") > max_word_len, F.lit(UNK))
        .otherwise(F.col("seg"))
        .alias("seg"),
    )


def wordpiece_token_counts(
    docs: DataFrame, segmented: DataFrame
) -> DataFrame:
    """[doc_id, n_tokens, n_wp_tokens] — per-document word and
    WordPiece-subword counts under the trained segmentation: the
    corpus APPLY (serving) side the module docstring promises,
    mirroring ``bpe.bpe_token_counts``.

    Apply-side plan: explode the document's words and broadcast-join
    the word→n_subwords lookup (the segmented distinct-word table) —
    the greedy loop is never replayed over the corpus. At 100 TB the
    lookup outgrows broadcast and AQE degrades to a shuffle join on
    the word key; either way the corpus is scanned once."""
    lookup = segmented.select(
        "word", F.col("n_subwords").alias("n_sub")
    )
    doc_words = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"regexp_extract_all(lower(text), '{TOKEN_REGEX}', 0)")
        ).alias("word"),
    )
    return (
        doc_words.join(F.broadcast(lookup), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_sub").cast("long").alias("n_wp_tokens"),
        )
    )


def wordpiece_fertility(segmented: DataFrame) -> DataFrame:
    """[n_words, n_subwords, fertility_micro] — corpus-level mean
    subwords per word under the segmentation (frequency-weighted);
    one agg over the distinct-word table."""
    return segmented.agg(
        F.sum("wcount").cast("long").alias("n_words"),
        F.sum(F.col("wcount") * F.col("n_subwords"))
        .cast("long")
        .alias("n_subwords"),
        F.round(
            F.sum(F.col("wcount") * F.col("n_subwords"))
            * 1_000_000.0
            / F.sum("wcount")
        )
        .cast("long")
        .alias("fertility_micro"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracles (unrolled greedy rounds, vocabulary as LIST literals)
# ---------------------------------------------------------------------------

from graph500_spark.operators.text import TOKEN_REGEX  # noqa: E402

_WORDS_SQL = (
    "SELECT word, CAST(COUNT(*) AS BIGINT) AS wcount FROM"
    f" (SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_REGEX}'))"
    "  AS word FROM documents) GROUP BY word"
)


def _vocab_sql(extra_tokens: int, max_piece_len: int) -> str:
    subs = " UNION ALL ".join(
        "SELECT substring(word, i,"
        f" {plen}) AS token, wcount FROM words,"
        f" UNNEST(generate_series(1, length(word) - {plen} + 1)) AS u(i)"
        f" WHERE length(word) >= {plen}"
        for plen in range(2, max_piece_len + 1)
    )
    return (
        f"words AS ({_WORDS_SQL}),"
        " chars AS (SELECT substring(word, i, 1) AS token,"
        " SUM(wcount) AS weight FROM words,"
        " UNNEST(generate_series(1, length(word))) AS u(i)"
        " GROUP BY token),"
        f" subs AS ({subs}),"
        " top AS (SELECT token, SUM(wcount) AS weight FROM subs"
        " GROUP BY token ORDER BY weight DESC, token ASC"
        f" LIMIT {extra_tokens}),"
        " vocab AS (SELECT token FROM chars UNION SELECT token FROM top),"
        " vline AS (SELECT "
        + ", ".join(
            f"(SELECT list(token ORDER BY token) FROM vocab"
            f" WHERE length(token) = {plen}) AS vl{plen}"
            for plen in range(2, max_piece_len + 1)
        )
        + ")"
    )


def wordpiece_segment_sql(
    extra_tokens: int = 200,
    max_piece_len: int = 4,
    max_word_len: int = 16,
) -> str:
    """One statement: vocabulary CTEs + max_word_len chained greedy
    rounds carrying (pos, n, seg) per distinct word."""
    step_case = "CASE " + " ".join(
        f"WHEN pos + {plen} - 1 <= len AND"
        f" list_contains(vl{plen}, substring(word, pos, {plen}))"
        f" THEN {plen}"
        for plen in range(max_piece_len, 1, -1)
    ) + " ELSE 1 END"
    rounds = []
    prev = "r0"
    for i in range(1, max_word_len + 1):
        cur = f"r{i}"
        rounds.append(
            f"{cur} AS (SELECT word, wcount, len,"
            " CASE WHEN pos <= len THEN pos + step ELSE pos END AS pos,"
            " CASE WHEN pos <= len THEN n + 1 ELSE n END AS n,"
            " CASE WHEN pos <= len THEN seg ||"
            " (CASE WHEN n > 0 THEN ' ' ELSE '' END) ||"
            " substring(word, pos, step) ELSE seg END AS seg"
            f" FROM (SELECT *, {step_case} AS step"
            f" FROM {prev}, vline))"
        )
        prev = cur
    return (
        "WITH "
        + _vocab_sql(extra_tokens, max_piece_len)
        + ", r0 AS (SELECT word, wcount, length(word) AS len,"
        " 1 AS pos, 0 AS n, '' AS seg FROM words), "
        + ", ".join(rounds)
        + " SELECT word, wcount,"
        f" CAST(CASE WHEN len > {max_word_len} THEN 1 ELSE n END"
        "  AS BIGINT) AS n_subwords,"
        f" CASE WHEN len > {max_word_len} THEN '{UNK}' ELSE seg END AS seg"
        f" FROM {prev}"
    )


def wordpiece_token_counts_sql(
    extra_tokens: int = 200,
    max_piece_len: int = 4,
    max_word_len: int = 16,
) -> str:
    """DuckDB mirror of wordpiece_token_counts: the full segmentation
    chain as one MATERIALIZED CTE (it is expensive; never inline),
    joined to the exploded document words."""
    return (
        "WITH seg AS MATERIALIZED ("
        + wordpiece_segment_sql(extra_tokens, max_piece_len, max_word_len)
        + "), dw AS (SELECT doc_id,"
        f" unnest(regexp_extract_all(lower(text), '{TOKEN_REGEX}'))"
        " AS word FROM documents)"
        " SELECT dw.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,"
        " CAST(SUM(seg.n_subwords) AS BIGINT) AS n_wp_tokens"
        " FROM dw JOIN seg USING (word) GROUP BY dw.doc_id"
    )


def wordpiece_fertility_sql(
    extra_tokens: int = 200,
    max_piece_len: int = 4,
    max_word_len: int = 16,
) -> str:
    return (
        "SELECT CAST(SUM(wcount) AS BIGINT) AS n_words,"
        " CAST(SUM(wcount * n_subwords) AS BIGINT) AS n_subwords,"
        " CAST(round(SUM(wcount * n_subwords) * 1000000.0 / SUM(wcount))"
        "  AS BIGINT) AS fertility_micro"
        " FROM ("
        + wordpiece_segment_sql(extra_tokens, max_piece_len, max_word_len)
        + ")"
    )


def wordpiece_vocab_sql(
    extra_tokens: int = 200, max_piece_len: int = 4
) -> str:
    """DuckDB mirror of wordpiece_vocab: [token, weight] — chars plus
    the top substrings (1-char tokens never appear in the substring
    tier, so UNION ALL is duplicate-free)."""
    subs = " UNION ALL ".join(
        "SELECT substring(word, i,"
        f" {plen}) AS token, wcount FROM words,"
        f" UNNEST(generate_series(1, length(word) - {plen} + 1)) AS u(i)"
        f" WHERE length(word) >= {plen}"
        for plen in range(2, max_piece_len + 1)
    )
    return (
        f"WITH words AS ({_WORDS_SQL}),"
        " chars AS (SELECT substring(word, i, 1) AS token,"
        " CAST(SUM(wcount) AS BIGINT) AS weight FROM words,"
        " UNNEST(generate_series(1, length(word))) AS u(i)"
        " GROUP BY token),"
        f" subs AS ({subs}),"
        " top AS (SELECT token, CAST(SUM(wcount) AS BIGINT) AS weight"
        " FROM subs GROUP BY token ORDER BY weight DESC, token ASC"
        f" LIMIT {extra_tokens})"
        " SELECT token, weight FROM chars"
        " UNION ALL SELECT token, weight FROM top"
    )

"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID (stopword heuristic),
document fingerprinting (rolling hash).

These go beyond the graph500 reference surface (which has no string
functions at all — SURVEY.md §2.6); they are first-class engine
operators for the 100 TB data-pipeline use case.

Design for the oracle gate: every operator is pure Column algebra
(JVM-side, whole-stage-codegen'd — no Python UDFs in the hot path),
and each has a mechanically mirrored DuckDB SQL fragment (the *_SQL
constants) using the identical arithmetic so results hash-match.

Scale notes: all operators are narrow per-row projections — no
shuffle, predicate/column pruning reaches the parquet scan, and they
pipeline with any downstream groupBy in one stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_REGEX = "[A-Za-z0-9]+"
HASH_MOD = 2147483647  # 2^31 - 1
HASH_BASE = 131

# ---------------------------------------------------------------------------
# Shared expression fragments — Spark SQL spelling and DuckDB spelling.
# Both compute identical integer/float arithmetic.
#
# String-hash tiers (pluggable; the SAME tier must be used on both
# engines for value-parity):
#   * "md5"  (default): top 60 bits of md5, decoded from the hex digest
#     — a single codegen'd JVM intrinsic per row in Spark and a native
#     function in DuckDB. Oracle-matched AND production-fast; 60 bits
#     so the bigint conversion never overflows in either engine.
#   * "poly": legacy 31-bit rolling polynomial (h = h*131 + char mod
#     2^31-1) — O(len) interpreted lambda per string; kept for
#     backward compatibility with round-1 fixtures. Orders of
#     magnitude slower; do not use in hot paths.
#   * "xxhash64": Spark-only fastest tier (no DuckDB mirror) for
#     pure-production pipelines that don't need the cross-engine gate.
# ---------------------------------------------------------------------------

DEFAULT_HASH = "md5"
HASH_BITS = {"md5": 60, "poly": 31, "xxhash64": 64}

_SPARK_HASH_FNS = {
    "md5": "cast(conv(substr(md5({s}), 1, 15), 16, 10) as bigint)",
    "poly": (
        "aggregate(sequence(1, length({s})), 0L,"
        " (acc, i) -> (acc * {base} + ascii(substr({s}, i, 1))) % {mod})"
    ),
    "xxhash64": "xxhash64({s})",
}
_DUCK_HASH_FNS = {
    "md5": "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)",
    "poly": (
        "list_reduce([CAST(0 AS BIGINT)]"
        " || list_transform(generate_series(1, length({s})),"
        " i -> CAST(ascii(substr({s}, i, 1)) AS BIGINT)),"
        " (acc, x) -> (acc * {base} + x) % {mod})"
    ),
}

# round-1 spellings, kept importable
SPARK_STRHASH = _SPARK_HASH_FNS["poly"]
DUCK_STRHASH = _DUCK_HASH_FNS["poly"]


def spark_strhash(s: str, fn: str = DEFAULT_HASH) -> str:
    return _SPARK_HASH_FNS[fn].format(s=s, base=HASH_BASE, mod=HASH_MOD)


def duck_strhash(s: str, fn: str = DEFAULT_HASH) -> str:
    return _DUCK_HASH_FNS[fn].format(s=s, base=HASH_BASE, mod=HASH_MOD)


SPARK_TOKENS = f"regexp_extract_all(text, '{TOKEN_REGEX}', 0)"
DUCK_TOKENS = f"regexp_extract_all(text, '{TOKEN_REGEX}')"

# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------


def token_count(docs: DataFrame) -> DataFrame:
    """[doc_id, n_tokens, n_chars_calc] — whitespace/alnum tokenization."""
    return docs.select(
        "doc_id",
        F.expr(f"size({SPARK_TOKENS})").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


TOKEN_COUNT_SQL = (
    f"SELECT doc_id, CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_tokens,"
    " CAST(length(text) AS BIGINT) AS n_chars_calc FROM documents"
)

# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

_SPARK_QUALITY_EXPRS = {
    "n_tokens": f"size({SPARK_TOKENS})",
    "alpha_ratio": (
        "round(length(regexp_replace(text, '[^A-Za-z]', ''))"
        " / greatest(length(text), 1), 6)"
    ),
    "digit_ratio": (
        "round(length(regexp_replace(text, '[^0-9]', ''))"
        " / greatest(length(text), 1), 6)"
    ),
    "space_ratio": (
        "round(length(regexp_replace(text, '[^ ]', ''))"
        " / greatest(length(text), 1), 6)"
    ),
    "mean_token_len": (
        f"round(aggregate({SPARK_TOKENS}, 0L, (acc, t) -> acc + length(t))"
        f" / greatest(size({SPARK_TOKENS}), 1), 6)"
    ),
}

_DUCK_QUALITY_EXPRS = {
    "n_tokens": f"len({DUCK_TOKENS})",
    "alpha_ratio": (
        "round(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
        " / greatest(length(text), 1), 6)"
    ),
    "digit_ratio": (
        "round(length(regexp_replace(text, '[^0-9]', '', 'g'))"
        " / greatest(length(text), 1), 6)"
    ),
    "space_ratio": (
        "round(length(regexp_replace(text, '[^ ]', '', 'g'))"
        " / greatest(length(text), 1), 6)"
    ),
    "mean_token_len": (
        f"round(list_reduce([0] || list_transform({DUCK_TOKENS},"
        " t -> length(t)), (acc, x) -> acc + x)"
        f" / greatest(len({DUCK_TOKENS}), 1), 6)"
    ),
}

# quality score: linear combination, clamped to [0,1] — a simple
# length/composition heuristic of the kind used in pretraining filters
_QUALITY_SCORE_SPARK = (
    "round(least(1.0, greatest(0.0,"
    " 0.3 * least(n_tokens / 100.0, 1.0)"
    " + 0.4 * alpha_ratio + 0.2 * space_ratio"
    " + 0.1 * least(mean_token_len / 8.0, 1.0))), 6)"
)


def text_quality(docs: DataFrame) -> DataFrame:
    """[doc_id, n_tokens, alpha_ratio, digit_ratio, space_ratio,
    mean_token_len, quality_score]."""
    out = docs.select(
        "doc_id",
        *[
            F.expr(e).cast("double").alias(n) if n != "n_tokens" else
            F.expr(e).cast("long").alias(n)
            for n, e in _SPARK_QUALITY_EXPRS.items()
        ],
    )
    return out.withColumn(
        "quality_score", F.expr(_QUALITY_SCORE_SPARK).cast("double")
    )


TEXT_QUALITY_SQL = (
    "SELECT doc_id, "
    + ", ".join(
        (
            f"CAST({n} AS BIGINT) AS {n}"
            if n == "n_tokens"
            else f"CAST({n} AS DOUBLE) AS {n}"
        )
        for n in _DUCK_QUALITY_EXPRS
    )
    + f", CAST({_QUALITY_SCORE_SPARK} AS DOUBLE) AS quality_score"
    + " FROM (SELECT doc_id, "
    + ", ".join(f"{e} AS {n}" for n, e in _DUCK_QUALITY_EXPRS.items())
    + " FROM documents)"
)

# ---------------------------------------------------------------------------
# Language identification (stopword-marker heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu"),
    "en": ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on"),
    "es": ("el", "los", "las", "que", "y", "en", "un", "una", "por"),
    "fr": ("le", "les", "et", "est", "pour", "que", "dans", "une", "du"),
}


def _score_exprs(engine: str) -> dict[str, str]:
    out = {}
    for lang, markers in LANG_MARKERS.items():
        lit = "array(" + ", ".join(f"'{m}'" for m in markers) + ")"
        if engine == "spark":
            out[lang] = (
                f"size(filter({SPARK_TOKENS},"
                f" t -> array_contains({lit}, lower(t))))"
            )
        else:
            lit = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
            out[lang] = (
                f"len(list_filter({DUCK_TOKENS},"
                f" t -> list_contains({lit}, lower(t))))"
            )
    return out


# identical CASE in both dialects; alphabetical priority on ties
_LANG_CASE = (
    "CASE WHEN s_de = 0 AND s_en = 0 AND s_es = 0 AND s_fr = 0 THEN 'und'"
    " WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'"
    " WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'"
    " WHEN s_es >= s_fr THEN 'es'"
    " ELSE 'fr' END"
)


def language_id(docs: DataFrame) -> DataFrame:
    """[doc_id, s_de, s_en, s_es, s_fr, lang_pred]."""
    scores = _score_exprs("spark")
    out = docs.select(
        "doc_id",
        *[F.expr(e).cast("long").alias(f"s_{l}") for l, e in scores.items()],
    )
    return out.withColumn("lang_pred", F.expr(_LANG_CASE))


def annotate_quality_lang(docs: DataFrame) -> DataFrame:
    """All input columns + [lang_pred, n_tokens, quality_score] as ONE
    projection — no joins. language_id and text_quality are pure
    Column algebra over ``text``, so pipelines that need both (the
    streaming cleaner's per-batch gate) should widen the row instead
    of computing each as a separate DataFrame and equi-joining back by
    doc_id: that plan shape costs two shuffles per micro-batch for
    values that whole-stage codegen can emit in the scan projection.
    Values are identical to the standalone operators (same exprs)."""
    scores = _score_exprs("spark")
    with_scores = docs.select(
        "*",
        *[F.expr(e).cast("long").alias(f"s_{l}") for l, e in scores.items()],
        *[
            F.expr(e).cast("double").alias(n) if n != "n_tokens" else
            F.expr(e).cast("long").alias(n)
            for n, e in _SPARK_QUALITY_EXPRS.items()
        ],
    )
    return (
        with_scores.withColumn("lang_pred", F.expr(_LANG_CASE))
        .withColumn(
            "quality_score", F.expr(_QUALITY_SCORE_SPARK).cast("double")
        )
        .drop(
            *[f"s_{l}" for l in scores],
            "alpha_ratio", "digit_ratio", "space_ratio", "mean_token_len",
        )
    )


LANGUAGE_ID_SQL = (
    "SELECT doc_id, s_de, s_en, s_es, s_fr, "
    + _LANG_CASE
    + " AS lang_pred FROM (SELECT doc_id, "
    + ", ".join(
        f"CAST({e} AS BIGINT) AS s_{l}" for l, e in _score_exprs("duck").items()
    )
    + " FROM documents)"
)

# ---------------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(docs: DataFrame, fn: str = DEFAULT_HASH) -> DataFrame:
    """[doc_id, fingerprint] — deterministic content hash of the raw
    text (60-bit md5 by default; collisions fine for dedup candidate
    keys). ``fn`` picks the hash tier (see module header)."""
    return docs.select(
        "doc_id",
        F.expr(spark_strhash("text", fn)).cast("long").alias("fingerprint"),
    )


FINGERPRINT_SQL = (
    f"SELECT doc_id, CAST({duck_strhash('text')} AS BIGINT) AS fingerprint"
    " FROM documents"
)


# ---------------------------------------------------------------------------
# Detailed token counting: whitespace tier + BPE-ish tier. The BPE-ish
# pattern approximates GPT-2-style pretokenization WITHOUT lookaheads
# (DuckDB's RE2 has none): letter runs | digit runs | non-alnum
# non-space punctuation runs. Both engines use the identical pattern.
# ---------------------------------------------------------------------------

BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n]+"


def token_count_detailed(docs: DataFrame) -> DataFrame:
    """[doc_id, n_tokens_ws, n_tokens_bpe, n_chars_calc] — whitespace
    split count and BPE-ish pretoken count (letter/digit/punct runs)."""
    ws = (
        "CASE WHEN length(trim(text)) = 0 THEN 0"
        " ELSE size(split(trim(text), '[ \\t\\n]+')) END"
    )
    bpe = f"size(regexp_extract_all(text, '{BPE_REGEX}', 0))"
    return docs.select(
        "doc_id",
        F.expr(ws).cast("long").alias("n_tokens_ws"),
        F.expr(bpe).cast("long").alias("n_tokens_bpe"),
        F.length("text").cast("long").alias("n_chars_calc"),
    )


TOKEN_COUNT_DETAILED_SQL = (
    "SELECT doc_id,"
    " CAST(CASE WHEN length(trim(text)) = 0 THEN 0"
    " ELSE len(regexp_split_to_array(trim(text), '[ \\t\\n]+')) END"
    "  AS BIGINT) AS n_tokens_ws,"
    f" CAST(len(regexp_extract_all(text, '{BPE_REGEX}')) AS BIGINT)"
    "  AS n_tokens_bpe,"
    " CAST(length(text) AS BIGINT) AS n_chars_calc FROM documents"
)


# ---------------------------------------------------------------------------
# Repetition statistics — the Gopher-rules repetition family (token
# form): documents dominated by repeated tokens / n-grams are low
# quality for pretraining and get filtered on these signals.
#
#   * dup_{2,3}gram_frac: fraction of n-gram OCCURRENCES that are
#     repeats of an earlier occurrence within the document. Pure
#     per-row array algebra — size(g) - size(array_distinct(g)) — so
#     it is linear per document, shuffles nothing, and pipelines with
#     the scan (the 100 TB shape).
#   * top_token_frac / top_2gram_frac: fraction of occurrences taken
#     by the single most frequent token / 2-gram. Needs per-key
#     counting, expressed as explode → (doc_id, gram) hash agg →
#     (doc_id) agg — linear in corpus size, two map-side-combinable
#     shuffles, never O(doc_len^2) per row (the lambda-count
#     alternative would be quadratic for long documents).
# ---------------------------------------------------------------------------


def _spark_ngrams(n: int) -> str:
    # non-distinct token n-grams (dedup.spark_shingles without the
    # distinct-hash step)
    return (
        f"CASE WHEN size({SPARK_TOKENS}) < {n} THEN array()"
        f" ELSE transform(sequence(1, size({SPARK_TOKENS}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({SPARK_TOKENS}, i, {n}))) END"
    )


def _duck_ngrams(n: int) -> str:
    return (
        f"CASE WHEN len({DUCK_TOKENS}) < {n} THEN []"
        f" ELSE list_transform(generate_series(1, len({DUCK_TOKENS}) - {n - 1}),"
        f" i -> array_to_string({DUCK_TOKENS}[i:i + {n - 1}], ' ')) END"
    )


def _dup_frac_spark(grams: str) -> str:
    return (
        f"round((size({grams}) - size(array_distinct({grams})))"
        f" / greatest(size({grams}), 1), 6)"
    )


def _dup_frac_duck(grams: str) -> str:
    return (
        f"round((len({grams}) - len(list_distinct({grams})))"
        f" / greatest(len({grams}), 1), 6)"
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """[doc_id, n_tokens, dup_2gram_frac, dup_3gram_frac,
    top_token_frac, top_2gram_frac] — repetition quality signals.
    Zero-token documents get 0.0 everywhere."""
    narrow = docs.select(
        "doc_id",
        F.expr(f"size({SPARK_TOKENS})").cast("long").alias("n_tokens"),
        F.expr(_dup_frac_spark(_spark_ngrams(2)))
        .cast("double")
        .alias("dup_2gram_frac"),
        F.expr(_dup_frac_spark(_spark_ngrams(3)))
        .cast("double")
        .alias("dup_3gram_frac"),
    )

    def top_frac(grams_expr: str, colname: str) -> DataFrame:
        g = docs.select(
            "doc_id", F.explode(F.expr(grams_expr)).alias("gram")
        )
        per_gram = g.groupBy("doc_id", "gram").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return per_gram.groupBy("doc_id").agg(
            F.round(F.max("cnt") / F.sum("cnt"), 6)
            .cast("double")
            .alias(colname)
        )

    out = (
        narrow.join(top_frac(SPARK_TOKENS, "top_token_frac"), "doc_id", "left")
        .join(top_frac(_spark_ngrams(2), "top_2gram_frac"), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "dup_2gram_frac",
            "dup_3gram_frac",
            F.coalesce("top_token_frac", F.lit(0.0)).alias("top_token_frac"),
            F.coalesce("top_2gram_frac", F.lit(0.0)).alias("top_2gram_frac"),
        )
    )
    return out


def repetition_stats_sql() -> str:
    def duck_top(grams: str, cte: str) -> str:
        return (
            f"{cte} AS (SELECT doc_id,"
            " CAST(round(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 6) AS DOUBLE)"
            " AS frac FROM (SELECT doc_id, gram, COUNT(*) AS cnt FROM"
            f" (SELECT doc_id, unnest({grams}) AS gram FROM documents)"
            " GROUP BY doc_id, gram) GROUP BY doc_id)"
        )

    return (
        "WITH narrow AS (SELECT doc_id,"
        f" CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_tokens,"
        f" CAST({_dup_frac_duck(_duck_ngrams(2))} AS DOUBLE)"
        "  AS dup_2gram_frac,"
        f" CAST({_dup_frac_duck(_duck_ngrams(3))} AS DOUBLE)"
        "  AS dup_3gram_frac FROM documents), "
        + duck_top(DUCK_TOKENS, "t1")
        + ", "
        + duck_top(_duck_ngrams(2), "t2")
        + " SELECT n.doc_id, n.n_tokens, n.dup_2gram_frac,"
        " n.dup_3gram_frac,"
        " CAST(COALESCE(t1.frac, 0.0) AS DOUBLE) AS top_token_frac,"
        " CAST(COALESCE(t2.frac, 0.0) AS DOUBLE) AS top_2gram_frac"
        " FROM narrow n LEFT JOIN t1 ON n.doc_id = t1.doc_id"
        " LEFT JOIN t2 ON n.doc_id = t2.doc_id"
    )


# ---------------------------------------------------------------------------
# Pattern scrubbing (PII redaction): counts + redacted text for a
# fixed dictionary of sensitive patterns. Regexes are restricted to
# the dialect intersection (character classes, counted repetition —
# no lookaround, which RE2 lacks), so Spark's Java regex and DuckDB's
# RE2 match identically and the operator sits under the value-hash
# gate. Narrow per-row projection: no shuffle, pipelines with the
# scan; at 100 TB this runs inside the ingest pass.
# ---------------------------------------------------------------------------

SCRUB_PATTERNS: dict[str, str] = {
    # order matters: EMAIL first so its local part is not first eaten
    # by another rule; each replacement is a stable tag
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}",
    "ssn": "[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": "[+]?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
}


def pii_scrub(
    docs: DataFrame, patterns: dict[str, str] | None = None
) -> DataFrame:
    """[doc_id, n_email, n_ssn, n_phone, n_ipv4, ..., redacted] —
    per-pattern match counts and the text with every match replaced
    by its <TAG> (applied in dictionary order)."""
    patterns = SCRUB_PATTERNS if patterns is None else patterns
    cols = ["doc_id"]
    red = "text"
    for name, pat in patterns.items():
        cols.append(
            F.expr(f"size(regexp_extract_all(text, '{pat}', 0))")
            .cast("long")
            .alias(f"n_{name}")
        )
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>')"
    return docs.select(*cols, F.expr(red).alias("redacted"))


def pii_scrub_sql(patterns: dict[str, str] | None = None) -> str:
    patterns = SCRUB_PATTERNS if patterns is None else patterns
    cols = ["doc_id"]
    red = "text"
    for name, pat in patterns.items():
        cols.append(
            f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
            f" AS n_{name}"
        )
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
    return (
        "SELECT " + ", ".join(cols) + f", {red} AS redacted FROM documents"
    )


# ---------------------------------------------------------------------------
# Unigram log-perplexity — the LM-based quality filter's exact
# baseline: score each document by its average negative log-prob per
# token under the corpus's own unigram distribution (a KenLM-style
# filter replaces the unigram model with an n-gram LM; the plan shape
# is identical — model table broadcast-joined into the exploded token
# stream). Log-probs are quantized to integer micro-nats at model
# time (cf. traindata.nb_train), so the per-doc sums are exact and
# the final division is a deterministic two-operand expression.
# High values ⇒ surprising/rare tokens ⇒ candidate for filtering.
# ---------------------------------------------------------------------------

PPL_SCALE = 1_000_000


def unigram_logppl(docs: DataFrame) -> DataFrame:
    """[doc_id, n_tokens, neg_logprob_q, logppl_micro] — exact
    integer micro-nat total and per-token average negative log-prob
    under the corpus unigram model. Zero-token docs are absent."""
    tok = docs.select(
        "doc_id", F.explode(F.expr(SPARK_TOKENS)).alias("token")
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    model = counts.crossJoin(F.broadcast(total)).select(
        "token",
        (-F.round(F.log(F.col("cnt") / F.col("total")) * PPL_SCALE))
        .cast("long")
        .alias("nlp_q"),
    )
    return (
        tok.join(F.broadcast(model), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("nlp_q").alias("neg_logprob_q"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "neg_logprob_q",
            F.round(F.col("neg_logprob_q") / F.col("n_tokens"))
            .cast("long")
            .alias("logppl_micro"),
        )
    )


def unigram_logppl_sql() -> str:
    return (
        "WITH tok AS (SELECT doc_id, unnest("
        + DUCK_TOKENS
        + ") AS token FROM documents),"
        " counts AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),"
        " tot AS (SELECT SUM(cnt) AS total FROM counts),"
        " model AS (SELECT token,"
        f" CAST(-round(ln(cnt / CAST(total AS DOUBLE)) * {PPL_SCALE})"
        " AS BIGINT) AS nlp_q FROM counts CROSS JOIN tot)"
        " SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,"
        " CAST(SUM(nlp_q) AS BIGINT) AS neg_logprob_q,"
        " CAST(round(SUM(nlp_q) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)"
        "  AS logppl_micro"
        " FROM tok JOIN model USING (token) GROUP BY doc_id"
    )


# ---------------------------------------------------------------------------
# Corpus-global heavy hitters
# ---------------------------------------------------------------------------


def heavy_hitter_tokens(docs: DataFrame, k: int = 100) -> DataFrame:
    """Corpus-global frequent tokens: [token, n_occurrences, n_docs],
    ordered by (n_occurrences desc, token asc), top k.

    The vocabulary-pruning / stop-list-mining primitive. Plan: explode
    tokens → one hash shuffle on the token key with map-side partial
    counts (+ partial distinct-doc sets) → distributed TakeOrdered for
    the top-k; nothing is collected until the k-row result. The token
    key is the classic Zipf-skew case — AQE's skew handling plus the
    map-side combine keep the hot keys bounded (each map task emits
    one partial row per distinct token, not per occurrence)."""
    toks = docs.select(
        "doc_id", F.explode(F.expr(SPARK_TOKENS)).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(k)
    )


def heavy_hitter_tokens_sql(k: int = 100) -> str:
    return (
        f"SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences,"
        " CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs"
        f" FROM (SELECT doc_id, unnest({DUCK_TOKENS}) AS token"
        " FROM documents) GROUP BY token"
        f" ORDER BY n_occurrences DESC, token ASC LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# PMI collocations + per-document character entropy
# ---------------------------------------------------------------------------


def pmi_collocations(
    docs: DataFrame, min_count: int = 3, k: int = 100
) -> DataFrame:
    """Top-k token-bigram collocations by pointwise mutual information:
    [x, y, n_xy, pmi_q], ordered by (pmi_q desc, x, y).

    PMI = ln( p(x,y) / (p(x)·p(y)) ) with p(x,y) = c_xy/N_bigrams and
    p(x) = c_x/N_tokens — the phrase-mining / tokenizer-merge-rule
    primitive. pmi_q quantizes to integer micro-nats via ONE log over
    a single double expression per row (no summation of logs, so no
    cross-engine accumulation drift — the unigram_logppl discipline).
    The min_count floor is the standard guard against PMI's
    rare-pair bias. Plan: positional explode inside the scan, one
    (doc, pos) self-join for consecutive pairs, two token-keyed
    count shuffles (Zipf-skewed — AQE + map-side partials), unigram
    counts broadcast back, distributed TakeOrdered."""
    tok = docs.select(
        "doc_id", F.posexplode(F.expr(SPARK_TOKENS)).alias("pos", "token")
    )
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    nt = uni.agg(F.sum("c").alias("n_tokens"))
    a = tok.select("doc_id", "pos", F.col("token").alias("x"))
    b = tok.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("token").alias("y")
    )
    big = (
        a.join(b, ["doc_id", "pos"])
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
        .filter(F.col("n_xy") >= min_count)
    )
    nb = (
        tok.groupBy("doc_id")
        .agg(F.greatest(F.count(F.lit(1)) - 1, F.lit(0)).alias("nb"))
        .agg(F.sum("nb").alias("n_bigrams"))
    )
    scored = (
        big.join(F.broadcast(uni.withColumnRenamed("token", "x")
                             .withColumnRenamed("c", "cx")), "x")
        .join(F.broadcast(uni.withColumnRenamed("token", "y")
                          .withColumnRenamed("c", "cy")), "y")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nb))
    )
    pmi_q = F.round(
        F.log(
            (F.col("n_xy").cast("double") * F.col("n_tokens")
             * F.col("n_tokens"))
            / (F.col("n_bigrams").cast("double") * F.col("cx") * F.col("cy"))
        )
        * PPL_SCALE
    ).cast("long")
    return (
        scored.select("x", "y", "n_xy", pmi_q.alias("pmi_q"))
        .orderBy(F.col("pmi_q").desc(), F.col("x").asc(), F.col("y").asc())
        .limit(k)
    )


def pmi_collocations_sql(min_count: int = 3, k: int = 100) -> str:
    return (
        f"WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS ts FROM documents),"
        " tok AS (SELECT doc_id, unnest(ts) AS token,"
        " unnest(generate_series(1, len(ts))) AS pos FROM toks),"
        " uni AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),"
        " nt AS (SELECT SUM(c) AS n_tokens FROM uni),"
        " big AS (SELECT a.token AS x, b.token AS y,"
        " CAST(COUNT(*) AS BIGINT) AS n_xy"
        " FROM tok a JOIN tok b"
        " ON a.doc_id = b.doc_id AND b.pos = a.pos + 1"
        f" GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}),"
        " nb AS (SELECT SUM(GREATEST(len(ts) - 1, 0)) AS n_bigrams"
        " FROM toks)"
        " SELECT x, y, n_xy,"
        " CAST(round(ln((CAST(n_xy AS DOUBLE) * n_tokens * n_tokens)"
        " / (CAST(n_bigrams AS DOUBLE) * ux.c * uy.c))"
        f" * {PPL_SCALE}) AS BIGINT) AS pmi_q"
        " FROM big JOIN uni ux ON ux.token = big.x"
        " JOIN uni uy ON uy.token = big.y, nt, nb"
        f" ORDER BY pmi_q DESC, x ASC, y ASC LIMIT {k}"
    )


def char_entropy(docs: DataFrame) -> DataFrame:
    """Per-document character-distribution Shannon entropy (nats):
    [doc_id, n_chars_calc, sum_clogc_q, entropy_micro] — the
    gibberish / low-diversity quality signal (near-zero entropy =
    one repeated character; random text ≈ ln(alphabet)).

    H = ln n − (Σ c_i·ln c_i)/n over per-char counts c_i. The inner
    sum is quantized per term to integer micro-nats (Σ c_i·round(10⁶
    ln c_i) — exact, order-free), and the outer expression is one
    deterministic double op — the unigram_logppl discipline applied
    at character granularity. Plan: explode chars inside the scan →
    one (doc, char) count shuffle → one doc-keyed sum; empty docs
    are absent (no characters)."""
    chars = docs.select(
        "doc_id",
        F.explode(F.expr("sequence(1, length(text))")).alias("i"),
        F.col("text"),
    ).select("doc_id", F.expr("substr(text, i, 1)").alias("ch"))
    counts = chars.groupBy("doc_id", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_chars_calc"),
        F.sum(
            F.col("c") * F.round(F.log("c") * PPL_SCALE).cast("long")
        ).cast("long").alias("sum_clogc_q"),
    )
    ent = F.round(
        F.log(F.col("n_chars_calc")) * PPL_SCALE
        - F.col("sum_clogc_q") / F.col("n_chars_calc")
    ).cast("long")
    return per_doc.select(
        "doc_id", "n_chars_calc", "sum_clogc_q",
        ent.alias("entropy_micro"),
    )


def char_entropy_sql() -> str:
    return (
        "WITH chars AS (SELECT doc_id, substr(text, i, 1) AS ch"
        " FROM (SELECT doc_id, text,"
        " unnest(generate_series(1, length(text))) AS i"
        " FROM documents)),"
        " counts AS (SELECT doc_id, ch, COUNT(*) AS c"
        " FROM chars GROUP BY 1, 2),"
        " per_doc AS (SELECT doc_id,"
        " CAST(SUM(c) AS BIGINT) AS n_chars_calc,"
        f" CAST(SUM(c * CAST(round(ln(c) * {PPL_SCALE}) AS BIGINT))"
        " AS BIGINT) AS sum_clogc_q"
        " FROM counts GROUP BY doc_id)"
        " SELECT doc_id, n_chars_calc, sum_clogc_q,"
        f" CAST(round(ln(n_chars_calc) * {PPL_SCALE}"
        " - sum_clogc_q / CAST(n_chars_calc AS DOUBLE)) AS BIGINT)"
        " AS entropy_micro FROM per_doc"
    )


def bigram_logppl(docs: DataFrame) -> DataFrame:
    """[doc_id, n_bigrams, neg_logprob_q, logppl_micro] — per-doc
    average negative log-prob under the corpus BIGRAM model with
    add-one smoothing: p(y|x) = (c_xy + 1) / (c_x + V).

    The strictly-better sibling of unigram_logppl (context-aware
    perplexity filtering — the KenLM-shaped quality gate with the
    same exact integer micro-nat discipline: one log per model row,
    order-free per-doc integer sums). Every doc bigram exists in the
    model by construction (trained on the same corpus), so the join
    never drops rows. Docs with < 2 tokens are absent. Plan: one
    positional self-join for bigrams, two count shuffles, model
    broadcast back onto the bigram stream."""
    tok = docs.select(
        "doc_id", F.posexplode(F.expr(SPARK_TOKENS)).alias("pos", "token")
    )
    uni = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cx"))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    a = tok.select("doc_id", "pos", F.col("token").alias("x"))
    b = tok.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("token").alias("y")
    )
    bigrams = a.join(b, ["doc_id", "pos"])
    counts = bigrams.groupBy("x", "y").agg(
        F.count(F.lit(1)).alias("cxy")
    )
    model = (
        counts.join(F.broadcast(uni.withColumnRenamed("token", "x")), "x")
        .crossJoin(F.broadcast(vocab))
        .select(
            "x",
            "y",
            (-F.round(
                F.log(
                    (F.col("cxy") + 1).cast("double")
                    / (F.col("cx") + F.col("v"))
                )
                * PPL_SCALE
            ))
            .cast("long")
            .alias("nlp_q"),
        )
    )
    return (
        bigrams.join(F.broadcast(model), ["x", "y"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("nlp_q").cast("long").alias("neg_logprob_q"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "neg_logprob_q",
            F.round(F.col("neg_logprob_q") / F.col("n_bigrams"))
            .cast("long")
            .alias("logppl_micro"),
        )
    )


def bigram_logppl_sql() -> str:
    return (
        f"WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS ts FROM documents),"
        " tok AS (SELECT doc_id, unnest(ts) AS token,"
        " unnest(generate_series(1, len(ts))) AS pos FROM toks),"
        " uni AS (SELECT token, COUNT(*) AS cx FROM tok GROUP BY token),"
        " voc AS (SELECT COUNT(*) AS v FROM uni),"
        " big AS (SELECT a.doc_id, a.token AS x, b.token AS y"
        " FROM tok a JOIN tok b"
        " ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),"
        " counts AS (SELECT x, y, COUNT(*) AS cxy FROM big GROUP BY 1, 2),"
        " model AS (SELECT x, y,"
        " CAST(-round(ln((cxy + 1) / CAST(cx + v AS DOUBLE))"
        f" * {PPL_SCALE}) AS BIGINT) AS nlp_q"
        " FROM counts JOIN uni ON uni.token = counts.x CROSS JOIN voc)"
        " SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,"
        " CAST(SUM(m.nlp_q) AS BIGINT) AS neg_logprob_q,"
        " CAST(round(SUM(m.nlp_q) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)"
        " AS logppl_micro"
        " FROM big JOIN model m USING (x, y) GROUP BY doc_id"
    )


def lang_confusion(docs: DataFrame) -> DataFrame:
    """Label-vs-classifier confusion matrix: [lang, lang_pred,
    n_docs] — the labeled `lang` column crossed with language_id's
    marker-heuristic prediction.

    The label-quality audit for a labeled corpus (hot off-diagonal
    cells = mislabeled shards or a weak classifier for that
    language). Plan: the classifier is a pure projection, so the
    whole matrix is one scan + one tiny grouped count."""
    pred = language_id(docs).select("doc_id", "lang_pred")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


LANG_CONFUSION_SQL = (
    f"WITH pred AS ({LANGUAGE_ID_SQL})"
    " SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs"
    " FROM documents d JOIN pred p USING (doc_id)"
    " GROUP BY 1, 2"
)


def type_token_ratio(docs: DataFrame) -> DataFrame:
    """[doc_id, n_tokens, n_types, ttr_micro] — vocabulary richness
    per doc (type-token ratio in integer micro-units; low TTR =
    repetitive text, the lexical-diversity quality signal
    complementing repetition_stats' n-gram view). Pure Column
    algebra: tokens array built once, distinct via array_distinct —
    no shuffle. Zero-token docs are absent."""
    t = docs.select(
        "doc_id", F.expr(SPARK_TOKENS).alias("ts")
    ).withColumn("n_tokens", F.size("ts").cast("long"))
    return (
        t.filter(F.col("n_tokens") >= 1)
        .select(
            "doc_id",
            "n_tokens",
            F.size(F.array_distinct("ts")).cast("long").alias("n_types"),
        )
        .withColumn(
            "ttr_micro",
            F.expr(
                f"(1000000 * n_types + n_tokens div 2) div n_tokens"
            ).cast("long"),
        )
    )


TYPE_TOKEN_RATIO_SQL = (
    f"WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS ts FROM documents),"
    " n AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,"
    " CAST(len(list_distinct(ts)) AS BIGINT) AS n_types FROM t)"
    " SELECT doc_id, n_tokens, n_types,"
    " CAST((1000000 * n_types + n_tokens // 2) // n_tokens AS BIGINT)"
    " AS ttr_micro FROM n WHERE n_tokens >= 1"
)


def hapax_stats(docs: DataFrame) -> DataFrame:
    """One-row corpus vocabulary-frequency profile: [n_types,
    n_hapax, n_dis, hapax_ratio] — types occurring exactly once
    (hapax legomena) and exactly twice; a high hapax share predicts
    tokenizer OOV pressure and noisy long-tail vocab. One token
    count shuffle + one tiny aggregate."""
    tok = docs.select(F.explode(F.expr(SPARK_TOKENS)).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("n_hapax"),
        F.sum((F.col("c") == 2).cast("long")).cast("long").alias("n_dis"),
    ).select(
        "n_types",
        "n_hapax",
        "n_dis",
        F.round(
            F.col("n_hapax") / F.col("n_types").cast("double"), 6
        ).alias("hapax_ratio"),
    )


HAPAX_STATS_SQL = (
    f"WITH tok AS (SELECT unnest({DUCK_TOKENS}) AS token FROM documents),"
    " counts AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token)"
    " SELECT CAST(COUNT(*) AS BIGINT) AS n_types,"
    " CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,"
    " CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis,"
    " ROUND(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)"
    " / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio"
    " FROM counts"
)


def dedup_doc_lines(docs: DataFrame) -> DataFrame:
    """Consecutive-duplicate-line removal — the boilerplate-collapse
    cleaning stage (repeated headers/footers/menu lines): [doc_id,
    clean_text, n_lines, n_removed]. Exact, order-preserving, and
    purely per-row: an index-aware array filter inside one projection
    — no shuffle, no UDF, scales as a map-only stage.

    Spark's two-arg lambda (x, i) uses 0-based indexes; DuckDB's
    mirror is a list comprehension over 1-based range — both keep
    line i iff i is first or line[i] != line[i-1]."""
    lines = F.split(F.col("text"), "\n")
    kept = F.expr(
        "filter(split(text, '\\n'),"
        " (x, i) -> i = 0 OR x != split(text, '\\n')[i-1])"
    )
    return docs.select(
        "doc_id",
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_removed"),
    )


DEDUP_DOC_LINES_SQL = (
    "WITH l AS (SELECT doc_id, string_split(text, chr(10)) AS ls"
    " FROM documents),"
    " k AS (SELECT doc_id, ls,"
    " [ls[i] FOR i IN range(1, len(ls) + 1)"
    " IF i = 1 OR ls[i] <> ls[i-1]] AS kept FROM l)"
    " SELECT doc_id, array_to_string(kept, chr(10)) AS clean_text,"
    " CAST(len(ls) AS BIGINT) AS n_lines,"
    " CAST(len(ls) - len(kept) AS BIGINT) AS n_removed FROM k"
)


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit
# ---------------------------------------------------------------------------


def zipf_slope(docs: DataFrame, top_n: int = 500) -> DataFrame:
    """One-row Zipf's-law fit over the corpus token rank-frequency
    curve: [n_fit, slope, intercept] — the OLS line through
    (ln rank, ln count) for the top_n most frequent tokens. Natural
    text gives slope ≈ −1; a much flatter slope flags synthetic /
    templated corpora, a steeper one flags boilerplate domination —
    the corpus-health sibling of hapax_stats at the head of the
    distribution instead of the tail.

    Determinism discipline: the per-row logs are quantized to integer
    micro-nats (x_q = round(10^6 ln rank), y_q = round(10^6 ln c) —
    one log per row, no float accumulation), the OLS moments are
    exact integer sums (DECIMAL(38,0) for the x·y / x·x products,
    which exceed int64 at 10^6 quantization), and slope/intercept are
    single double expressions at the end, rounded to 6 (the
    embedding_dim_stats convention).

    Plan: one token-count shuffle (map-side partials absorb the Zipf
    skew) → distributed TakeOrdered for the top_n rows (count desc,
    token asc — fully deterministic) → rank via row_number over the
    top_n-row result (the window is over the REDUCED table, never the
    vocabulary) → one tiny aggregate. At 100 TB the only full-data
    exchange is the token count."""
    tok = docs.select(F.explode(F.expr(SPARK_TOKENS)).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(
        F.col("c").desc(), F.col("token").asc()
    ).limit(top_n)
    w = Window.orderBy(F.col("c").desc(), F.col("token").asc())
    xy = top.withColumn("rank", F.row_number().over(w)).select(
        F.round(F.log("rank") * PPL_SCALE).cast("long").alias("x_q"),
        F.round(F.log("c") * PPL_SCALE).cast("long").alias("y_q"),
    )
    agg = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x_q").cast("decimal(38,0)").alias("sx"),
        F.sum("y_q").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x_q").cast("decimal(38,0)") * F.col("y_q")).alias(
            "sxy"
        ),
        F.sum(F.col("x_q").cast("decimal(38,0)") * F.col("x_q")).alias(
            "sxx"
        ),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    slope = num / den
    intercept = (
        F.col("sy").cast("double") / F.col("n")
        - slope * F.col("sx").cast("double") / F.col("n")
    ) / float(PPL_SCALE)
    return agg.select(
        F.col("n").alias("n_fit"),
        F.round(slope, 6).cast("double").alias("slope"),
        F.round(intercept, 6).cast("double").alias("intercept"),
    )


def zipf_slope_sql(top_n: int = 500) -> str:
    return (
        f"WITH tok AS (SELECT unnest({DUCK_TOKENS}) AS token"
        " FROM documents),"
        " counts AS (SELECT token, COUNT(*) AS c FROM tok"
        " GROUP BY token),"
        " top_n AS (SELECT c FROM counts"
        f" ORDER BY c DESC, token ASC LIMIT {top_n}),"
        " xy AS (SELECT"
        " CAST(round(ln(ROW_NUMBER() OVER (ORDER BY c DESC))"
        f" * {PPL_SCALE}) AS BIGINT) AS x_q,"
        f" CAST(round(ln(c) * {PPL_SCALE}) AS BIGINT) AS y_q"
        " FROM top_n),"
        " agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(x_q) AS DECIMAL(38,0)) AS sx,"
        " CAST(SUM(y_q) AS DECIMAL(38,0)) AS sy,"
        " SUM(CAST(x_q AS DECIMAL(38,0)) * y_q) AS sxy,"
        " SUM(CAST(x_q AS DECIMAL(38,0)) * x_q) AS sxx FROM xy)"
        " SELECT n AS n_fit,"
        " ROUND(CAST(n * sxy - sx * sy AS DOUBLE)"
        " / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,"
        " ROUND((CAST(sy AS DOUBLE) / n"
        " - CAST(n * sxy - sx * sy AS DOUBLE)"
        " / CAST(n * sxx - sx * sx AS DOUBLE)"
        f" * CAST(sx AS DOUBLE) / n) / {PPL_SCALE}, 6) AS intercept"
        " FROM agg"
    )


def quality_dup_calibration(docs: DataFrame) -> DataFrame:
    """[decile, n_docs, n_dup_docs, sum_chars, mean_score_micro] — the
    "is my quality score informative?" readout a curation pipeline
    runs before trusting a filter: bucket the corpus into score
    deciles and report, per decile, how many docs have at least one
    exact twin (duplication should concentrate in the LOW deciles if
    the score works) plus size/score summaries.

    Decile assignment is the event_value_ecdf discipline — NO
    single-partition ntile: scores quantize to micro-units, the
    cumulative window runs over the DISTINCT-score table, and
    decile = least(9, 10·cum_below // n) is all-integer, so equal
    scores land in equal deciles in both engines. Plan: one text-hash
    count shuffle for the dup flag (joined back hash-keyed), one
    score-keyed count for the distribution (window over the
    compressed score domain, decile map joined back score-keyed), one
    10-key final agg. Three data exchanges, each on a key the next
    step needs."""
    scored = text_quality(docs).select(
        "doc_id",
        F.round(F.col("quality_score") * 1_000_000)
        .cast("long")
        .alias("score_q"),
    )
    base = scored.join(
        docs.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.expr(spark_strhash("text")).cast("long").alias("h"),
        ),
        "doc_id",
    )
    dup = base.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("n_copies")
    )
    # flagged feeds THREE consumers (the n_total count, the score
    # distribution, the final join) — materialize so the quality-score
    # + dup-flag passes run once (Catalyst does not CSE across plan
    # branches)
    from graph500_spark.functions.plantrunc import truncate_plan

    flagged = base.join(dup, "h").select(
        "doc_id",
        "score_q",
        "n_chars",
        (F.col("n_copies") > 1).cast("int").alias("is_dup"),
    ).transform(truncate_plan)
    dist = flagged.groupBy("score_q").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = (
        Window.orderBy("score_q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_total = flagged.count()  # driver scalar, BFS-count convention
    decs = dist.select(
        "score_q",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("cum_excl"),
    ).select(
        "score_q",
        # all-integer decile (truncating div, mirrors DuckDB //)
        F.expr(f"least(9, (cum_excl * 10) div {n_total})")
        .cast("long")
        .alias("decile"),
    )
    return (
        flagged.join(decs, "score_q")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("is_dup").cast("long").alias("n_dup_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.round(F.sum("score_q") / F.count(F.lit(1)))
            .cast("long")
            .alias("mean_score_micro"),
        )
    )


def quality_dup_calibration_sql() -> str:
    score = (
        "SELECT doc_id, CAST(round(CAST(("
        + _QUALITY_SCORE_SPARK
        + ") AS DOUBLE) * 1000000) AS BIGINT) AS score_q FROM"
        " (SELECT doc_id, "
        + ", ".join(f"{e} AS {n}" for n, e in _DUCK_QUALITY_EXPRS.items())
        + " FROM documents)"
    )
    return (
        f"WITH scored AS ({score}),"
        " base AS (SELECT s.doc_id, s.score_q,"
        " CAST(d.n_chars AS BIGINT) AS n_chars,"
        f" CAST({duck_strhash('d.text')} AS BIGINT) AS h"
        " FROM scored s JOIN documents d USING (doc_id)),"
        " dup AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n_copies"
        " FROM base GROUP BY h),"
        " flagged AS (SELECT doc_id, score_q, n_chars,"
        " CAST(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END AS INTEGER)"
        " AS is_dup FROM base JOIN dup USING (h)),"
        " n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total"
        " FROM flagged),"
        " dist AS (SELECT score_q, CAST(COUNT(*) AS BIGINT) AS cnt"
        " FROM flagged GROUP BY score_q),"
        " decs AS (SELECT score_q,"
        " CAST(LEAST(9, ((SUM(cnt) OVER (ORDER BY score_q"
        "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        "  - cnt) * 10) // (SELECT n_total FROM n)) AS BIGINT)"
        " AS decile FROM dist)"
        " SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,"
        " CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,"
        " CAST(SUM(n_chars) AS BIGINT) AS sum_chars,"
        " CAST(round(SUM(score_q) / CAST(COUNT(*) AS DOUBLE))"
        " AS BIGINT) AS mean_score_micro"
        " FROM flagged JOIN decs USING (score_q) GROUP BY decile"
    )

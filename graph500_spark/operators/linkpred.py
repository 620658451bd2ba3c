"""Link prediction over the clean undirected graph: Adamic-Adar and
common-neighbor scores for vertex pairs — the classic "who should be
connected" primitive (recommendations, knowledge-graph completion,
dedup-cluster stitching).

Adamic-Adar(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z): common neighbors,
inversely weighted by how promiscuous each shared neighbor is.

Exactness: each neighbor's term is quantized ONCE —
round(1e6 / ln(deg)) — a single two-operand double expression both
engines evaluate identically (the unigram_logppl discipline); the
per-pair sum of quantized terms is exact integer. deg ≥ 2 always
holds for a wedge center (it has two distinct neighbors), so ln > 0.

Hub safety (the 100 TB shape): the naive wedge self-join enumerates
every neighbor PAIR of every center — Σ_z deg(z)² rows, so one
10⁶-degree hub is 10¹² wedges.  ``max_center_degree=D`` runs the
quadratic enumeration ONLY over centers with deg ≤ D (volume ≤ D·|E|),
then restores exactness for the top-k with a bounded second phase —
the CERTIFIED pattern shared by `adamic_adar_topk` (weighted,
non-edges) and `common_neighbors_topk_certified` (unweighted, all
pairs):

  1. S_low(u,v): exact partial scores from low-degree centers (one
     capped wedge join + integer agg).
  2. Candidates: the top m = candidate_factor·k pairs by S_low.  Hub
     adjacency is LINEAR (Σ_{hub} deg(hub) ≤ 2|E| rows), so each
     candidate's exact hub contribution is recovered by two equi-joins
     against the broadcast candidate set — never a hub self-join.
  3. Soundness certificate, checked in-engine: any pair OUTSIDE the
     candidate set has true score ≤ c + H₂, where c is the m-th
     partial score (every non-candidate's S_low ≤ c) and H₂ is the
     second-largest per-vertex hub mass H(u) = Σ_{hub z ∈ N(u)}
     term_q(z) (a pair needs BOTH endpoints hub-adjacent, so its hub
     contribution ≤ min(H(u), H(v)) ≤ H₂).  If the k-th exact
     candidate score exceeds that bound, the returned top-k is the
     global exact top-k — same rows, same scores, same hash as the
     uncapped enumeration (and the full-enumeration SQL oracle).
     Otherwise the operator RAISES (never silently approximates);
     the caller widens D or candidate_factor.

With no hubs above D the low phase IS the full enumeration and the
certificate is vacuous (H₂ = 0).  Driver-side state: O(m) candidate
rows + two scalar reads — the BFS-loop bounded-driver discipline.
(`triangles.common_neighbors_topk` keeps its documented APPROXIMATE
cap knob — capped centers silently stop contributing — for callers
that want the cheap census; this module is the exact tier.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph500_spark.functions.plantrunc import truncate_plan
from graph500_spark.functions.sizing import widen_narrow_input

AA_TOPK = 100

_TERM_Q_EXPR = "CAST(round(1000000 / ln(CAST(deg AS DOUBLE))) AS BIGINT)"


def _center_terms(edges: DataFrame, weighted: bool = True) -> DataFrame:
    """[z, deg, term_q] — per-center weight: round(1e6/ln(deg)) for the
    Adamic-Adar score, 1 for plain common-neighbor counts (degree-1
    vertices center no wedge and ln(1)=0, excluded either way)."""
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    term = F.expr(_TERM_Q_EXPR) if weighted else F.lit(1).cast("long")
    return deg.where(F.col("deg") >= 2).select(
        F.col("src").alias("z"),
        F.col("deg"),
        term.alias("term_q"),
    )


def _scored_pairs(edges: DataFrame, terms: DataFrame) -> DataFrame:
    """[u, v, n_common, score_q] for u < v, summed over the given
    center set: ONE self-equi-join of the symmetric edge list on the
    center (u < v kills mirror duplicates), center terms broadcast.

    The wedge join's O(Σ deg²) fan-out stage inherits its task count
    from the edge layout when the other sides broadcast — a narrow
    persisted fixture would run the quadratic compute on a fraction of
    the machine. One linear keyed exchange widens it to full
    parallelism (guide §2.5); wide inputs pass through untouched."""
    edges = widen_narrow_input(edges, "src")
    centers = terms.select("z", "term_q")
    zu = edges.select(F.col("src").alias("z"), F.col("dst").alias("u"))
    zv = edges.select(F.col("src").alias("z"), F.col("dst").alias("v"))
    wedges = (
        zu.join(F.broadcast(centers), "z")
        .join(zv, "z")
        .where(F.col("u") < F.col("v"))
    )
    return wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("term_q").cast("long").alias("score_q"),
    )


def _drop_edges(pairs: DataFrame, edges: DataFrame) -> DataFrame:
    return pairs.join(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v")),
        ["u", "v"],
        "left_anti",
    )


def _topk(pairs: DataFrame, k: int) -> DataFrame:
    return pairs.orderBy(
        F.col("score_q").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(k)


def _certified_wedge_topk(
    edges: DataFrame,
    k: int,
    max_center_degree: int | None,
    candidate_factor: int,
    weighted: bool,
    include_edges: bool,
    op_name: str,
) -> DataFrame:
    """Shared certified exact-top-k engine (module docstring) —
    returns [u, v, n_common, score_q]."""
    terms = _center_terms(edges, weighted=weighted)
    if max_center_degree is None:
        scored = _scored_pairs(edges, terms)
        if not include_edges:
            scored = _drop_edges(scored, edges)
        return _topk(scored, k)

    hubs = terms.where(F.col("deg") > max_center_degree)
    n_hubs = hubs.count()
    low_scored = _scored_pairs(
        edges, terms.where(F.col("deg") <= max_center_degree)
    )
    if not include_edges:
        low_scored = _drop_edges(low_scored, edges)
    if n_hubs == 0:
        return _topk(low_scored, k)

    m = max(candidate_factor * k, k)
    cand = (
        _topk(low_scored, m)
        .withColumnRenamed("n_common", "n_low")
        .withColumnRenamed("score_q", "s_low")
        # ≤ m rows: broadcast side below. truncate_plan (not raw
        # localCheckpoint) per the repo-wide checkpoint convention.
        .transform(truncate_plan)
    )
    # hub adjacency is linear in |E| — never self-joined
    hub_adj = edges.select(
        F.col("dst").alias("vx"), F.col("src").alias("z")
    ).join(F.broadcast(hubs.select("z", "term_q")), "z")
    # exact hub contribution per candidate: z adjacent to BOTH ends
    au = hub_adj.select(F.col("vx").alias("u"), "z", "term_q")
    av = hub_adj.select(F.col("vx").alias("v"), "z")
    hub_part = (
        F.broadcast(cand.select("u", "v"))
        .join(au, "u")
        .join(av, ["v", "z"], "left_semi")
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hub"),
            F.sum("term_q").cast("long").alias("s_hub"),
        )
    )
    exact = (
        cand.join(hub_part, ["u", "v"], "left")
        .select(
            "u",
            "v",
            (F.col("n_low") + F.coalesce(F.col("n_hub"), F.lit(0)))
            .cast("long")
            .alias("n_common"),
            (F.col("s_low") + F.coalesce(F.col("s_hub"), F.lit(0)))
            .cast("long")
            .alias("score_q"),
            F.col("s_low"),
        )
        .transform(truncate_plan)  # ≤ m rows
    )
    # soundness certificate (O(m) driver rows + two scalar reads).
    # Non-candidate pairs: wedge-connected-through-low-centers pairs
    # beyond the top-m (exist only when the candidate list is full,
    # bounded by c = m-th partial score) and pairs whose ONLY common
    # neighbors are hubs (S_low = 0 ≤ c).  Either way true score
    # ≤ c + H₂.
    rows = sorted(
        exact.collect(),
        key=lambda r: (-r["score_q"], r["u"], r["v"]),
    )
    h2_rows = (
        hub_adj.groupBy("vx")
        .agg(F.sum("term_q").cast("long").alias("h"))
        .orderBy(F.col("h").desc())
        .limit(2)
        .collect()
    )
    h2 = h2_rows[1]["h"] if len(h2_rows) > 1 else 0
    if len(rows) < k:
        # fewer certified candidates than requested: a hub-only pair
        # could deserve a slot and we cannot bound it from below
        raise ValueError(
            f"{op_name}: exactness certificate failed "
            f"(only {len(rows)} candidates for k={k} with {n_hubs} "
            "hub centers present); widen max_center_degree or "
            "candidate_factor"
        )
    kth_score = rows[k - 1]["score_q"]
    c = min(r["s_low"] for r in rows) if len(rows) == m else 0
    if not kth_score > c + h2:
        raise ValueError(
            f"{op_name}: exactness certificate failed "
            f"(kth_score={kth_score} <= cutoff {c} + H2 {h2}); "
            "widen max_center_degree or candidate_factor"
        )
    return _topk(exact.select("u", "v", "n_common", "score_q"), k)


def adamic_adar_topk(
    edges: DataFrame,
    k: int = AA_TOPK,
    max_center_degree: int | None = None,
    candidate_factor: int = 8,
) -> DataFrame:
    """[u, v, n_common, aa_score_q] — top-k NON-ADJACENT pairs by
    Adamic-Adar score (micro-units), ties broken by (u, v) asc.
    `edges` must be the clean symmetric edge list [src, dst].

    ``max_center_degree=D`` bounds the wedge join to centers with
    deg ≤ D and restores exact top-k via the certified hub phase (see
    module docstring); raises ValueError when the certificate cannot
    be established — never silently approximates."""
    out = _certified_wedge_topk(
        edges,
        k,
        max_center_degree,
        candidate_factor,
        weighted=True,
        include_edges=False,
        op_name="adamic_adar_topk",
    )
    return out.withColumnRenamed("score_q", "aa_score_q")


def common_neighbors_topk_certified(
    edges: DataFrame,
    k: int = AA_TOPK,
    max_center_degree: int | None = None,
    candidate_factor: int = 8,
) -> DataFrame:
    """[u, v, n_common] — top-k pairs (adjacent included, matching
    `triangles.common_neighbors_topk`) by exact common-neighbor count,
    ties broken by (u, v) asc — the CERTIFIED exact tier of the hub
    cap: unlike the triangles variant's approximate knob, a capped run
    either returns exactly the full-enumeration top-k or raises."""
    out = _certified_wedge_topk(
        edges,
        k,
        max_center_degree,
        candidate_factor,
        weighted=False,
        include_edges=True,
        op_name="common_neighbors_topk_certified",
    )
    # unweighted ⇒ score_q == n_common
    return out.select("u", "v", "n_common")


def adamic_adar_topk_sql(clean_edges_sql: str, k: int = AA_TOPK) -> str:
    """Full-enumeration oracle — valid for the capped engine path too,
    because the certificate guarantees identical top-k rows/scores."""
    return (
        f"WITH edges AS ({clean_edges_sql}),"
        " deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg"
        "  FROM edges GROUP BY src),"
        " terms AS (SELECT src AS z,"
        "  CAST(round(1000000 / ln(CAST(deg AS DOUBLE))) AS BIGINT)"
        "  AS term_q FROM deg WHERE deg >= 2),"
        " wedges AS (SELECT e1.src AS z, e1.dst AS u, e2.dst AS v"
        "  FROM edges e1 JOIN edges e2 ON e1.src = e2.src"
        "  AND e1.dst < e2.dst),"
        " scored AS (SELECT w.u, w.v,"
        "  CAST(COUNT(*) AS BIGINT) AS n_common,"
        "  CAST(SUM(t.term_q) AS BIGINT) AS aa_score_q"
        "  FROM wedges w JOIN terms t ON t.z = w.z GROUP BY w.u, w.v),"
        " non_edges AS (SELECT s.* FROM scored s"
        "  WHERE NOT EXISTS (SELECT 1 FROM edges e"
        "   WHERE e.src = s.u AND e.dst = s.v))"
        " SELECT u, v, n_common, aa_score_q FROM non_edges"
        f" ORDER BY aa_score_q DESC, u ASC, v ASC LIMIT {k}"
    )


def common_neighbors_certified_sql(
    clean_edges_sql: str, k: int = AA_TOPK
) -> str:
    """Full-enumeration oracle for the certified common-neighbor
    top-k (adjacent pairs included)."""
    return (
        f"WITH edges AS ({clean_edges_sql}),"
        " wedges AS (SELECT e1.src AS z, e1.dst AS u, e2.dst AS v"
        "  FROM edges e1 JOIN edges e2 ON e1.src = e2.src"
        "  AND e1.dst < e2.dst"
        "  WHERE e1.src IN (SELECT src FROM edges"
        "   GROUP BY src HAVING COUNT(*) >= 2))"
        " SELECT u, v, CAST(COUNT(*) AS BIGINT) AS n_common"
        " FROM wedges GROUP BY u, v"
        f" ORDER BY n_common DESC, u ASC, v ASC LIMIT {k}"
    )

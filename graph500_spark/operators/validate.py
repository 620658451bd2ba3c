"""BFS-result validation — the reference's 5 spec checks as DataFrame
queries (SURVEY.md §3.3; /root/reference/mpi/validate.hpp:489-802).

Data model: ``pred_df`` is the unpacked predecessor map
``[vertex: long, pred: long|null, depth: int|null]`` — NULL pred/depth
means "unreached" (the reference packs (depth<<48)|parent into one
int64 with -1 / 0xFFFF sentinels, validate.hpp:806-819; we use honest
nullable columns instead).

Each check returns a DataFrame of violation rows (empty == pass);
``validate_bfs`` aggregates them into one summary. These are both
product operators (J3/J4/A5/A6) and the engine's own test oracle,
exactly as in the reference.

Scale notes: every check is 1-2 equi-joins + a filter — shuffle joins
on vertex id that AQE can re-plan; pred_df is usually far smaller than
the edge list, so Catalyst broadcasts it when it fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_value_ranges(pred_df: DataFrame, nglobalverts: int) -> DataFrame:
    """Check 1: every non-null parent id in [0, nglobalverts).

    Ref: check_value_ranges, /root/reference/mpi/validate.hpp:822-839.
    """
    return pred_df.filter(
        F.col("pred").isNotNull()
        & ((F.col("pred") < 0) | (F.col("pred") >= F.lit(nglobalverts)))
    ).select("vertex", "pred", "depth")


def check_root_and_self_parents(pred_df: DataFrame, root: int) -> DataFrame:
    """Check 2: pred[root]==root; no non-root vertex is its own parent.

    Ref: /root/reference/mpi/validate.hpp:530-571.
    """
    bad_root = pred_df.filter(
        (F.col("vertex") == F.lit(root)) & (F.col("pred") != F.col("vertex"))
    )
    self_parent = pred_df.filter(
        (F.col("vertex") != F.lit(root))
        & F.col("pred").isNotNull()
        & (F.col("pred") == F.col("vertex"))
    )
    return bad_root.unionByName(self_parent).select("vertex", "pred", "depth")


def check_depth_consistency(pred_df: DataFrame, root: int) -> DataFrame:
    """Check 3: depth[root]==0; reached ⇔ depth set; depth[v]==depth[pred[v]]+1.

    The parent lookup is the reference's distributed gather J4
    (check_bfs_depth_map_using_predecessors, validate.hpp:920-995)
    re-expressed as a self-join on the pred table.
    """
    null_mismatch = pred_df.filter(
        F.col("pred").isNull() != F.col("depth").isNull()
    ).select("vertex", "pred", "depth", F.lit("null_mismatch").alias("why"))

    bad_root_depth = pred_df.filter(
        (F.col("vertex") == F.lit(root)) & (F.col("depth") != F.lit(0))
    ).select("vertex", "pred", "depth", F.lit("root_depth").alias("why"))

    parent = pred_df.select(
        F.col("vertex").alias("p_vertex"), F.col("depth").alias("p_depth")
    )
    bad_step = (
        pred_df.filter(
            (F.col("vertex") != F.lit(root)) & F.col("pred").isNotNull()
        )
        .join(parent, F.col("pred") == F.col("p_vertex"), "left")
        .filter(
            F.col("p_depth").isNull()  # parent unreached or missing
            | (F.col("depth") != F.col("p_depth") + F.lit(1))
        )
        .select("vertex", "pred", "depth", F.lit("depth_step").alias("why"))
    )
    return null_mismatch.unionByName(bad_root_depth).unionByName(bad_step)


def _edge_with_depths(edges_raw: DataFrame, pred_df: DataFrame) -> DataFrame:
    """J3: annotate every raw edge with both endpoint depths (two joins)."""
    depth = pred_df.select("vertex", "depth")
    src_d = depth.select(
        F.col("vertex").alias("src"), F.col("depth").alias("src_depth")
    )
    dst_d = depth.select(
        F.col("vertex").alias("dst"), F.col("depth").alias("dst_depth")
    )
    return edges_raw.join(src_d, "src", "left").join(dst_d, "dst", "left")


def check_edge_depths(edges_raw: DataFrame, pred_df: DataFrame) -> DataFrame:
    """Check 4: no edge connects a reached and an unreached vertex, and
    endpoint depths differ by at most 1.

    Ref: /root/reference/mpi/validate.hpp:703-721 (error branches).
    """
    e = _edge_with_depths(edges_raw, pred_df)
    return e.filter(
        (F.col("src_depth").isNull() != F.col("dst_depth").isNull())
        | (
            F.col("src_depth").isNotNull()
            & F.col("dst_depth").isNotNull()
            & (F.abs(F.col("src_depth") - F.col("dst_depth")) > 1)
        )
    ).select("src", "dst", "src_depth", "dst_depth")


def edge_visit_count(edges_raw: DataFrame, pred_df: DataFrame) -> DataFrame:
    """A5 (TEPS numerator): count raw input edges — including duplicates
    and self-loops — whose endpoints are both in the BFS tree.

    Ref: edge_visit_count, /root/reference/mpi/validate.hpp:703-721.
    """
    e = _edge_with_depths(edges_raw, pred_df)
    return e.filter(
        F.col("src_depth").isNotNull() & F.col("dst_depth").isNotNull()
    ).agg(F.count(F.lit(1)).alias("edge_visit_count"))


def edge_visit_counts_multi(
    edges_raw: DataFrame, pred_multi: DataFrame
) -> DataFrame:
    """[root, edge_visit_count] — A5 batched over a multi-root pred
    table ``[root, vertex, ...]``: per root, raw input edges
    (including duplicates and self-loops) with both endpoints in that
    root's tree. ONE dataflow instead of n_roots sequential two-join
    jobs — the spec64 harness counted 64 TEPS numerators as 64
    driver-scheduled jobs, and the per-job floor dominates the batch.

    Shape: edges ⋈ reach(src) fans out to at most |E| x n_roots rows
    (exactly the rows the sequential loop scans in total), then one
    (root, dst) semi-join and one root-keyed count with map-side
    partials. Per-root values identical to ``edge_visit_count``.

    Ref: edge_visit_count, /root/reference/mpi/validate.hpp:703-721,
    batched over the runs of mpi/main.cc:129-146.
    """
    reach_src = pred_multi.select("root", F.col("vertex").alias("src"))
    reach_dst = pred_multi.select("root", F.col("vertex").alias("dst"))
    return (
        edges_raw.select("src", "dst")
        .join(reach_src, "src")
        .join(reach_dst, ["root", "dst"], "left_semi")
        .groupBy("root")
        .agg(F.count(F.lit(1)).cast("long").alias("edge_visit_count"))
    )


def check_tree_edges(
    edges_raw: DataFrame, pred_df: DataFrame, root: int
) -> DataFrame:
    """Check 5: every (v, pred[v]) of a reached non-root vertex exists as
    a graph edge (in either orientation of the raw undirected list).

    Ref: pred_valid marking, /root/reference/mpi/validate.hpp:722-792.
    Implemented as a left-anti join against the symmetrized edge set.
    """
    sym = edges_raw.select("src", "dst").unionByName(
        edges_raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    claims = pred_df.filter(
        (F.col("vertex") != F.lit(root)) & F.col("pred").isNotNull()
    ).select("vertex", "pred", "depth")
    return claims.join(
        sym,
        (claims.vertex == sym.src) & (claims.pred == sym.dst),
        "left_anti",
    )


def validate_bfs_multi(
    edges_raw: DataFrame, pred_multi: DataFrame, nglobalverts: int
) -> DataFrame:
    """All five checks batched over a MULTI-ROOT pred table
    ``[root, vertex, pred, depth]`` → [root, check, violations] —
    one dataflow for all roots instead of 5 × n_roots sequential
    passes (the spec64 harness validates 64 trees; per-root looping
    pays the per-query scheduling floor 320 times).

    Semantics are row-for-row identical to ``validate_bfs`` applied
    per root: checks 1-3 and 5 group naturally by the root column
    (the parent lookup of check 3 self-joins on (root, pred)); check
    4 and the reference's "every edge inspected per run" contract
    need every (edge, root) pair, produced by a broadcast crossJoin
    of the root list (n_roots × |E| rows — exactly the work the
    reference does, mpi/main.cc:129-146 validates every root over
    the full edge list). Roots absent from a check's violation set
    report violations = 0 via the final left join against the root
    list (ref driver: validate_bfs_result, validate.hpp:1008-1019).
    """
    roots_df = pred_multi.select("root").distinct()

    v1 = (
        pred_multi.filter(
            F.col("pred").isNotNull()
            & (
                (F.col("pred") < 0)
                | (F.col("pred") >= F.lit(nglobalverts))
            )
        )
        .select("root", F.lit("value_ranges").alias("check"))
    )
    v2 = (
        pred_multi.filter(
            (
                (F.col("vertex") == F.col("root"))
                & (F.col("pred") != F.col("vertex"))
            )
            | (
                (F.col("vertex") != F.col("root"))
                & F.col("pred").isNotNull()
                & (F.col("pred") == F.col("vertex"))
            )
        )
        .select("root", F.lit("root_self_parents").alias("check"))
    )
    parent = pred_multi.select(
        F.col("root").alias("p_root"),
        F.col("vertex").alias("p_vertex"),
        F.col("depth").alias("p_depth"),
    )
    bad_step = (
        pred_multi.filter(
            (F.col("vertex") != F.col("root")) & F.col("pred").isNotNull()
        )
        .join(
            parent,
            (F.col("pred") == F.col("p_vertex"))
            & (F.col("root") == F.col("p_root")),
            "left",
        )
        .filter(
            F.col("p_depth").isNull()
            | (F.col("depth") != F.col("p_depth") + F.lit(1))
        )
        .select("root")
    )
    v3 = (
        pred_multi.filter(
            (F.col("pred").isNull() != F.col("depth").isNull())
            | (
                (F.col("vertex") == F.col("root"))
                & (F.col("depth") != F.lit(0))
            )
        )
        .select("root")
        .unionByName(bad_step)
        .select("root", F.lit("depth_consistency").alias("check"))
    )
    depth = pred_multi.select("root", "vertex", "depth")
    src_d = depth.select(
        "root", F.col("vertex").alias("src"), F.col("depth").alias("src_depth")
    )
    dst_d = depth.select(
        "root", F.col("vertex").alias("dst"), F.col("depth").alias("dst_depth")
    )
    expanded = (
        edges_raw.select("src", "dst")
        .crossJoin(F.broadcast(roots_df))
        .join(src_d, ["root", "src"], "left")
        .join(dst_d, ["root", "dst"], "left")
    )
    v4 = expanded.filter(
        (F.col("src_depth").isNull() != F.col("dst_depth").isNull())
        | (
            F.col("src_depth").isNotNull()
            & F.col("dst_depth").isNotNull()
            & (F.abs(F.col("src_depth") - F.col("dst_depth")) > 1)
        )
    ).select("root", F.lit("edge_depths").alias("check"))
    sym = edges_raw.select("src", "dst").unionByName(
        edges_raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    claims = pred_multi.filter(
        (F.col("vertex") != F.col("root")) & F.col("pred").isNotNull()
    ).select("root", "vertex", "pred")
    v5 = claims.join(
        sym,
        (claims.vertex == sym.src) & (claims.pred == sym.dst),
        "left_anti",
    ).select("root", F.lit("tree_edges").alias("check"))

    violations = (
        v1.unionByName(v2)
        .unionByName(v3)
        .unionByName(v4)
        .unionByName(v5)
        .groupBy("root", "check")
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    checks = roots_df.crossJoin(
        F.broadcast(
            edges_raw.sparkSession.createDataFrame(
                [
                    ("value_ranges",),
                    ("root_self_parents",),
                    ("depth_consistency",),
                    ("edge_depths",),
                    ("tree_edges",),
                ],
                "check string",
            )
        )
    )
    return checks.join(violations, ["root", "check"], "left").select(
        "root",
        "check",
        F.coalesce("violations", F.lit(0)).cast("long").alias("violations"),
    )


def validate_bfs(
    edges_raw: DataFrame, pred_df: DataFrame, root: int, nglobalverts: int
) -> DataFrame:
    """All five checks → [check: string, violations: long] summary.

    Ref driver: validate_bfs_result, /root/reference/mpi/validate.hpp:1008-1019.
    Unlike the reference (which aborts on first failing check), this
    reports every check's violation count as rows — friendlier for a
    relational engine and strictly more informative.
    """
    checks = {
        "value_ranges": check_value_ranges(pred_df, nglobalverts),
        "root_self_parents": check_root_and_self_parents(pred_df, root),
        "depth_consistency": check_depth_consistency(pred_df, root),
        "edge_depths": check_edge_depths(edges_raw, pred_df),
        "tree_edges": check_tree_edges(edges_raw, pred_df, root),
    }
    out = None
    for name, df in checks.items():
        one = df.agg(F.count(F.lit(1)).alias("violations")).select(
            F.lit(name).alias("check"), "violations"
        )
        out = one if out is None else out.unionByName(one)
    return out

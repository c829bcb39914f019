"""Hierarchical (recursive) join operators — SURVEY.md §2.3-J2.

The reference walks a parent→children tree recursively (getChildren
ASpaceObject.java:126-141; collectInstanceRefs :177-196) to gather instances
from published descendants.  Spark has no recursive CTE (pre-4.0 SQL), so
the idiomatic mapping is an **iterative self-join to fixpoint**: each round
extends every known (node, ancestor) path by one parent edge; rounds double
the covered depth is NOT true for this naive form — depth grows by one edge
per round, which is fine for the shallow trees archives have (and the loop
is driver-side control flow over lazily-built plans, checkpointed to keep
lineage bounded).

At 100 TB scale: the edge table is repartitioned by the join key once and
reused; each iteration is one shuffle-free-ish sort-merge join against the
frontier (small), so the pattern scales with total path count, not rounds².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_ancestors(
    edges: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_depth: int = 30,
) -> DataFrame:
    """All (id, ancestor, depth) pairs by iterative self-join to fixpoint.

    ``edges``: one row per node with its DIRECT parent (parent NULL = root).
    Returns every proper ancestor with its distance (depth >= 1).
    The loop stops when a round adds no rows or max_depth is reached.
    """
    direct = (
        edges.filter(F.col(parent_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.col(parent_col).alias("ancestor"),
            F.lit(1).alias("depth"),
        )
    )
    # parent-edge lookup reused every round (cache: it's scanned N-depth times)
    up = direct.select(
        F.col("id").alias("_n"), F.col("ancestor").alias("_p")
    ).cache()

    out = direct
    frontier = direct
    try:
        for _ in range(max_depth):
            nxt = (
                frontier.join(up, frontier["ancestor"] == up["_n"])
                .select("id", F.col("_p").alias("ancestor"), (F.col("depth") + 1).alias("depth"))
            )
            # materialize the frontier: keeps the lazy plan from growing a new
            # join layer per round (lineage blow-up is THE failure mode of
            # iterative DataFrame loops)
            nxt = nxt.localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            out = out.unionByName(nxt)
            frontier = nxt
        else:
            if not frontier.isEmpty():
                # a non-empty frontier after max_depth rounds means a deeper
                # tree than expected OR a cycle; truncating silently would
                # under-count in subtree_aggregate
                raise ValueError(
                    f"hierarchy deeper than max_depth={max_depth} "
                    "(or cyclic edge set); raise max_depth or break the cycle"
                )
        # pin `out` before dropping `up`: the unioned plan still references
        # the cached edges until materialized
        out = out.localCheckpoint(eager=True)
    finally:
        up.unpersist()
    return out


def subtree_aggregate(
    edges: DataFrame,
    values: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    value_col: str = "value",
) -> DataFrame:
    """Roll up each node's subtree sum (own value + all descendants'), the
    collectInstanceRefs pattern: ancestors gather from published descendants.

    Returns (id, subtree_sum).  Composition: transitive_ancestors (descendant
    → ancestor pairs) + self pairs → join values → groupBy ancestor.
    """
    anc = transitive_ancestors(edges, id_col, parent_col).select(
        F.col("id").alias("node"), F.col("ancestor").alias("agg_to")
    )
    self_pairs = edges.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("agg_to")
    )
    pairs = anc.unionByName(self_pairs)
    v = values.select(F.col(id_col).alias("node"), F.col(value_col).alias("v"))
    return (
        pairs.join(v, "node")
        .groupBy(F.col("agg_to").alias("id"))
        .agg(F.sum("v").alias("subtree_sum"))
    )

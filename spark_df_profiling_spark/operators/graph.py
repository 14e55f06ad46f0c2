"""Iterative graph algorithms over edge-list DataFrames.

The missing capability class next to the dedup graph helpers
(:func:`operators.dedup.connected_components` gives components;
this module gives per-node SCORES).  First member: PageRank — the
classic web-corpus authority signal (Page et al. 1999), used in
training-data curation to weight or filter documents by the standing
of their source domain (a domain-link graph is exactly an edge list).

Design notes (Spark-first, 100 TB):
- Everything is DataFrame joins/aggregations — no RDDs, no GraphX
  dependency.  An iteration is ONE edges-by-src hash join with the
  O(#nodes) rank frame plus ONE map-side-combined groupBy(dst); both
  shuffle on node keys, which are near-uniform for real graphs
  (hash-join skew on celebrity in-degree nodes is absorbed by the
  partial aggregation: contributions combine map-side before the
  shuffle).
- The edge frame is joined with out-degrees ONCE up front and
  persisted; iterations never rescan the raw input.
- Iterative lineage is cut per iteration with ``localCheckpoint``
  (the same frozen-frame device as
  ``dedup.sorted_neighborhood_pairs``): without it the plan doubles
  per iteration and the final job replays every join n_iter times.
- Fixed ``n_iter`` (not a convergence test) keeps the pass budget
  replayable and resumable — the same contract as
  ``clustering.kmeans_fit``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src_col: str = "src",
             dst_col: str = "dst", damping: float = 0.85,
             n_iter: int = 10, dedup_edges: bool = True) -> DataFrame:
    """PageRank over a directed edge list — returns ``(node, rank)``
    with ranks summing to 1 over the node set.

    Semantics (the standard uniform-teleport formulation):
    ``rank(v) = (1-d)/N + d * (Σ_{u→v} rank(u)/outdeg(u) + D/N)``
    where ``D`` is the total rank mass sitting on DANGLING nodes
    (no out-edges) — redistributed uniformly so rank stays a
    probability distribution every iteration.  NULL endpoints are
    dropped; with ``dedup_edges`` (default) parallel edges collapse
    so each distinct link carries ``1/outdeg`` — set it False to let
    edge multiplicity weight the split (outdeg then counts
    multiplicity too).

    Determinism: fixed ``n_iter`` and pure arithmetic — the only
    cross-run jitter is double-sum reorder (~1 ulp), absorbed by any
    sane downstream rounding.

    Scale: per iteration one join + one partial-agg groupBy, both
    keyed on nodes; the dangling mass is a one-row aggregate
    crossJoined broadcast (never a driver collect); rank frames are
    localCheckpoint-ed so plan depth stays O(1) in ``n_iter``.  The
    rank frame is O(#nodes) — at web scale far smaller than edges,
    so the per-iteration join broadcasts nothing but stays balanced.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1): {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1: {n_iter}")
    for c in (src_col, dst_col):
        if c not in edges.columns:
            raise ValueError(f"edges missing column: {c!r}")

    e = (edges.select(F.col(src_col).cast("string").alias("src"),
                      F.col(dst_col).cast("string").alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull()))
    if dedup_edges:
        e = e.distinct()

    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint())
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: edge list is empty after "
                         "dropping NULL endpoints")

    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    # (src, dst, inv_deg) — built once, reused every iteration
    contrib_edges = (e.join(deg, "src")
                     .select("src", "dst",
                             (F.lit(1.0) / F.col("__deg"))
                             .alias("__inv"))
                     .localCheckpoint())
    linked_srcs = deg.select(F.col("src").alias("node"))

    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(n_iter):
        # total rank on dangling nodes: one-row frame, broadcast —
        # stays inside the plan, no driver round-trip per iteration
        dangling = (ranks.join(linked_srcs, "node", "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("__dm")))
        contribs = (contrib_edges
                    .join(ranks.withColumnRenamed("node", "src"),
                          "src")
                    .select("dst",
                            (F.col("rank") * F.col("__inv"))
                            .alias("__c"))
                    .groupBy("dst").agg(F.sum("__c").alias("__s")))
        ranks = (nodes
                 .join(contribs.withColumnRenamed("dst", "node"),
                       "node", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("node",
                         (F.lit((1.0 - damping) / n)
                          + F.lit(damping)
                          * (F.coalesce(F.col("__s"), F.lit(0.0))
                             + F.col("__dm") / F.lit(float(n))))
                         .alias("rank"))
                 .localCheckpoint())
    return ranks

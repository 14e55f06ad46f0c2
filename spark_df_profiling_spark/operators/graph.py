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
             n_iter: int = 10, dedup_edges: bool = True,
             weight_col: "str | None" = None) -> DataFrame:
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

    ``weight_col`` makes the split weighted: each edge carries
    ``w / Σw(src)`` of its source's rank instead of ``1/outdeg``
    (link counts, co-occurrence strengths).  NULL or non-positive
    weights drop the edge (a zero-weight link IS no link); integer
    weights are exactly equivalent to duplicating the edge that many
    times under ``dedup_edges=False`` (pytest-pinned).
    ``dedup_edges`` is ignored when weights are given — aggregate
    parallel edges into one weighted edge upstream.

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

    e = _edge_frame(edges, src_col, dst_col, dedup_edges, weight_col)

    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint())
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank: edge list is empty after "
                         "dropping NULL endpoints")
    # uniform teleport: t = 1/N at every node
    tele = nodes.select("node", F.lit(1.0 / n).alias("__t"))
    return _personalized_iterations(e, tele, damping, n_iter)


def _edge_frame(edges: DataFrame, src_col: str, dst_col: str,
                dedup_edges: bool,
                weight_col: "str | None") -> DataFrame:
    """Normalized (src, dst[, __w]) edge frame: string endpoints,
    NULL endpoints dropped; with ``weight_col``, NULL/non-positive
    weights drop the edge and parallel-edge handling is the
    caller's business (dedup_edges is ignored)."""
    if weight_col is not None:
        if weight_col not in edges.columns:
            raise ValueError(f"edges missing column: {weight_col!r}")
        return (edges.select(
            F.col(src_col).cast("string").alias("src"),
            F.col(dst_col).cast("string").alias("dst"),
            F.col(weight_col).cast("double").alias("__w"))
            .where(F.col("src").isNotNull()
                   & F.col("dst").isNotNull()
                   & (F.col("__w") > 0)))
    e = (edges.select(F.col(src_col).cast("string").alias("src"),
                      F.col(dst_col).cast("string").alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull()))
    return e.distinct() if dedup_edges else e


def _personalized_iterations(e: DataFrame, tele: DataFrame,
                             damping: float, n_iter: int) -> DataFrame:
    """Shared power-iteration core: ``tele`` is the teleport
    distribution ``(node, __t)`` over ALL nodes (Σ __t = 1 — uniform
    for :func:`pagerank`, seed-concentrated for :func:`trustrank`).
    Per-node update:
    ``rank(v) = (1-d)·t(v) + d·(Σ_{u→v} rank(u)/outdeg(u) + D·t(v))``
    — dangling mass D re-enters BY the teleport distribution, the
    standard personalized formulation (uniform t reduces exactly to
    classic PageRank).  The teleport weight rides the rank frame as a
    column, so iterations stay one join + one groupBy."""
    wexpr = F.col("__w") if "__w" in e.columns else F.lit(1.0)
    deg = e.groupBy("src").agg(F.sum(wexpr).alias("__deg"))
    # (src, dst, inv_deg) — built once, reused every iteration;
    # weighted edges carry w/Σw(src) instead of 1/outdeg
    contrib_edges = (e.join(deg, "src")
                     .select("src", "dst",
                             (wexpr / F.col("__deg"))
                             .alias("__inv"))
                     .localCheckpoint())
    linked_srcs = deg.select(F.col("src").alias("node"))

    ranks = tele.select("node", "__t",
                        F.col("__t").alias("rank")).localCheckpoint()
    for _ in range(n_iter):
        # total rank on dangling nodes: one-row frame, broadcast —
        # stays inside the plan, no driver round-trip per iteration
        dangling = (ranks.join(linked_srcs, "node", "left_anti")
                    .agg(F.coalesce(F.sum("rank"), F.lit(0.0))
                         .alias("__dm")))
        contribs = (contrib_edges
                    .join(ranks.select(
                        F.col("node").alias("src"), "rank"), "src")
                    .select("dst",
                            (F.col("rank") * F.col("__inv"))
                            .alias("__c"))
                    .groupBy("dst").agg(F.sum("__c").alias("__s")))
        ranks = (ranks.select("node", "__t")
                 .join(contribs.withColumnRenamed("dst", "node"),
                       "node", "left")
                 .crossJoin(F.broadcast(dangling))
                 .select("node", "__t",
                         (F.lit(1.0 - damping) * F.col("__t")
                          + F.lit(damping)
                          * (F.coalesce(F.col("__s"), F.lit(0.0))
                             + F.col("__dm") * F.col("__t")))
                         .alias("rank"))
                 .localCheckpoint())
    return ranks.select("node", "rank")


def trustrank(edges: DataFrame, seeds: DataFrame,
              src_col: str = "src", dst_col: str = "dst",
              seed_col: "str | None" = None, damping: float = 0.85,
              n_iter: int = 10, dedup_edges: bool = True,
              weight_col: "str | None" = None) -> DataFrame:
    """TrustRank (Gyöngyi et al. 2004): personalized PageRank with
    teleportation restricted to a trusted SEED set — trust flows out
    along links, so nodes reachable only from spam-land score ~0
    while classic PageRank would still pay them the uniform teleport
    floor.  The web-corpus curation signal for seed-anchored domain
    quality: seeds = a hand-vetted allowlist, scores = crawl
    prioritization / quality weighting.

    ``seeds`` is a one-column frame (``seed_col`` or its only
    column); seeds are matched against the graph's node set by string
    value — seeds not present in the graph are ignored (raises if
    NONE survive: an all-miss seed list is a wiring bug, not an
    empty answer).  Teleport (and dangling re-entry) is uniform over
    the surviving seeds.  Ranks still sum to 1; a node's score is
    its stationary share of trust.  Same determinism/scale contract
    as :func:`pagerank` — the teleport weight travels as a column on
    the rank frame, so per-iteration cost is identical.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1): {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1: {n_iter}")
    for c in (src_col, dst_col):
        if c not in edges.columns:
            raise ValueError(f"edges missing column: {c!r}")
    sc = seed_col or seeds.columns[0]
    if sc not in seeds.columns:
        raise ValueError(f"seeds missing column: {sc!r}")

    e = _edge_frame(edges, src_col, dst_col, dedup_edges, weight_col)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint())
    seed_nodes = (seeds.select(F.col(sc).cast("string").alias("node"))
                  .where(F.col("node").isNotNull()).distinct()
                  .join(nodes, "node", "left_semi")
                  .localCheckpoint())
    k = seed_nodes.count()
    if k == 0:
        raise ValueError("trustrank: no seed matches any graph node")
    tele = (nodes.join(seed_nodes.withColumn("__t", F.lit(1.0 / k)),
                       "node", "left")
            .select("node",
                    F.coalesce(F.col("__t"), F.lit(0.0)).alias("__t")))
    return _personalized_iterations(e, tele, damping, n_iter)


def degree_stats(edges: DataFrame, src_col: str = "src",
                 dst_col: str = "dst",
                 dedup_edges: bool = True) -> DataFrame:
    """Per-node degree profile — ``(node, out_deg, in_deg)`` with 0
    (not NULL) for the missing direction — the first look at any link
    graph before running :func:`pagerank`/:func:`trustrank` on it:
    dangling share, hub concentration, degree skew (feed the columns
    to ``frequency.skew_report``/``num_stats`` for the distribution).
    NULL endpoints dropped; ``dedup_edges`` as in :func:`pagerank`.

    Scale: two map-side-combined groupBys + one full-outer join, all
    node-keyed; output is O(#nodes).
    """
    for c in (src_col, dst_col):
        if c not in edges.columns:
            raise ValueError(f"edges missing column: {c!r}")
    e = (edges.select(F.col(src_col).cast("string").alias("src"),
                      F.col(dst_col).cast("string").alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull()))
    if dedup_edges:
        e = e.distinct()
    outd = (e.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("out_deg")))
    ind = (e.groupBy(F.col("dst").alias("node"))
           .agg(F.count(F.lit(1)).alias("in_deg")))
    return (outd.join(ind, "node", "full_outer")
            .select("node",
                    F.coalesce(F.col("out_deg"), F.lit(0))
                    .alias("out_deg"),
                    F.coalesce(F.col("in_deg"), F.lit(0))
                    .alias("in_deg")))

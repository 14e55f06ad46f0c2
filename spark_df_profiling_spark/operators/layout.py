"""Data-layout operators: Z-order clustering for multi-column skipping.

Parquet scans prune row groups by min/max statistics.  Sorting by ONE
column makes that column's ranges tight and every other column's ranges
useless; interleaving the bits of several columns' ranks (a Z-order /
Morton curve) makes EVERY participating column's ranges moderately
tight — the standard lakehouse `OPTIMIZE ZORDER BY` trade, built here
from plain expressions:

1. each column is rank-bucketed into ``2^bits`` equal-frequency tiers
   (quantile cuts as literals — the same distributed-ntile pattern as
   :func:`operators.sampling.score_buckets`, so no global sort of the
   raw values);
2. the tier ids' bits are interleaved into one integer key with
   ``shiftleft``/``&``/``|`` (codegen'd, engine-portable);
3. ``zorder_write`` range-repartitions + sorts by that key and writes —
   a total shuffle, but the one-off cost of laying data out is the
   point of the operation.

``skipping_stats`` audits the result: per output partition, each
column's (min, max) span as a fraction of the global span — the number
that predicts how much a ``col BETWEEN`` predicate can skip.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tier_tree(s: Column, cuts: Sequence[float],
              lo: int = 0, hi: int | None = None) -> Column:
    """``#{cuts strictly below s}`` as a binary-search ``when()`` tree
    — log2(len(cuts)) comparisons per row with the cut VALUES baked at
    the nodes.  A linear filter/sum over the cut array costs
    len(cuts) evaluations per row (44s per 6M-row pass at 255 cuts),
    and an ``element_at`` binary search over a literal array is slower
    still (codegen re-materializes the array per probe).  The
    predicate ``s > cuts[i]`` is monotone in i even with duplicate
    cuts, so the search lands on the exact linear count.  NULL input
    propagates NULL (every comparison is NULL → the otherwise branch
    bottoms out at ``lo``; callers that need NULL-out must guard, as
    :func:`zorder_key` and ``sampling.score_buckets`` do)."""
    if hi is None:
        hi = len(cuts)
    if lo == hi:
        return F.lit(lo)
    k = (lo + hi) // 2
    return (F.when(s > F.lit(float(cuts[k])), tier_tree(s, cuts, k + 1, hi))
            .otherwise(tier_tree(s, cuts, lo, k)))


def interleave_bits(tiers: Sequence[Column], bits: int) -> Column:
    """Morton-interleave the low ``bits`` of each tier id: output bit
    ``k * n_cols + i`` = bit ``k`` of ``tiers[i]``.  Pure integer
    shifts/masks — identical in every engine."""
    n = len(tiers)
    if n * bits > 63:
        # bit 63 is the sign — interleaving into it would make high
        # keys sort NEGATIVE and scramble the curve order
        raise ValueError(
            f"interleave_bits: {n} columns x {bits} bits = {n * bits} "
            f"key bits > 63 (long sign bit); lower bits or drop columns")
    out = F.lit(0).cast("long")
    for k in range(bits):
        for i, t in enumerate(tiers):
            bit = F.shiftright(t.cast("long"), k).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, k * n + i))
    return out


def zorder_key(df: DataFrame, cols: Sequence[str], bits: int = 8,
               exact: bool = True, accuracy: int = 10_000) -> DataFrame:
    """Input plus ``zkey`` — the Z-order clustering key over ``cols``.

    Each column is bucketed into ``2^bits`` equal-frequency tiers by
    its own quantile cuts (computed in ONE aggregate job, riding as
    literals — rank-based, so skewed/heavy-tailed columns still spread
    across tiers), then the tier bits interleave.  NULLs tier as 0
    (they cluster together at the curve's origin — min/max stats
    ignore nulls anyway).

    ``exact=False`` switches the cut computation to percentile_approx
    for 100 TB inputs (same switch, same reasoning as
    ``score_buckets``).
    """
    if not cols or len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (one column: "
                         "just sort by it)")
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in [1, 16]: {bits}")
    if len(cols) * bits > 63:
        # fail BEFORE the cut-computation job: interleave_bits would
        # reject this anyway, but only after an exact-percentile
        # aggregate with 2^bits-1 probs per column has run (measured:
        # 4 cols x bits=16 on lineitem = a 27-minute job for an error)
        raise ValueError(
            f"interleave_bits: {len(cols)} columns x {bits} bits = "
            f"{len(cols) * bits} key bits > 63 (long sign bit); "
            f"lower bits or drop columns")
    n_tiers = 1 << bits
    fn = "percentile" if exact else "percentile_approx"
    extra = "" if exact else f", {int(accuracy)}"
    probs = [i / n_tiers for i in range(1, n_tiers)]
    plist = ", ".join(repr(p) for p in probs)
    cut_row = df.agg(*[
        F.expr(f"{fn}(CAST(`{c}` AS DOUBLE), array({plist}){extra})")
        .alias(f"__cuts_{c}") for c in cols]).collect()[0]
    tiers = []
    for c in cols:
        cuts = [float(x) for x in (cut_row[f"__cuts_{c}"] or [])]
        s = F.col(c).cast("double")
        t = tier_tree(s, cuts)
        tiers.append(F.when(s.isNotNull(), t).otherwise(F.lit(0)))
    return df.withColumn("zkey", interleave_bits(tiers, bits))


def zorder_write(df: DataFrame, path: str, cols: Sequence[str],
                 num_files: int = 32, bits: int = 8,
                 exact: bool = True) -> None:
    """Write ``df`` Z-ordered by ``cols``: range-partition on ``zkey``
    into ``num_files`` output partitions, sort within each, drop the
    key, write parquet.  One total shuffle — the layout investment that
    every subsequent selective scan amortizes."""
    keyed = zorder_key(df, cols, bits=bits, exact=exact)
    (keyed.repartitionByRange(num_files, F.col("zkey"))
     .sortWithinPartitions("zkey")
     .drop("zkey")
     .write.mode("overwrite").parquet(path))


def skipping_stats(spark, path: str, cols: Sequence[str]) -> DataFrame:
    """Audit a written layout: per parquet file, each column's
    (max-min) span as a fraction of the global span — mean over files
    is the expected fraction of files a uniformly-placed point
    predicate must READ (lower = better skipping).  One metadata-light
    scan using ``input_file_name`` grouping."""
    df = spark.read.parquet(path)
    per_file = (df.withColumn("__f", F.input_file_name())
                .groupBy("__f")
                .agg(*[x for c in cols for x in
                       (F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                        F.max(F.col(c).cast("double")).alias(f"mx_{c}"))]))
    glob = df.agg(*[x for c in cols for x in
                    (F.min(F.col(c).cast("double")).alias(f"gmn_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"gmx_{c}"))])
    j = per_file.crossJoin(F.broadcast(glob))
    spans = []
    for c in cols:
        width = F.col(f"gmx_{c}") - F.col(f"gmn_{c}")
        spans.append(F.avg(
            (F.col(f"mx_{c}") - F.col(f"mn_{c}"))
            / F.nullif(width, F.lit(0.0))).alias(f"avg_span_{c}"))
    return j.agg(F.count(F.lit(1)).alias("n_files"), *spans)


def partition_advisor(df: DataFrame, candidate_cols: Sequence[str],
                      row_bytes: float = 100.0,
                      target_file_mb: float = 512.0) -> DataFrame:
    """Evaluate candidate partition columns BEFORE a 100 TB write —
    one row per candidate: ``n_partitions``, ``min_rows``/``p50_rows``
    /``max_rows`` per partition, ``skew`` (max/mean), ``est_mb_max``
    (largest partition at ``row_bytes``/row), and the two failure
    flags every layout review asks about: ``smallfile_risk``
    (median partition under 1/8 of ``target_file_mb`` — the
    many-tiny-files regime that drowns the driver in metadata) and
    ``skew_risk`` (max over 8× mean — one reducer/file doing the
    table's work).  NULL partition values form their own partition
    (Hive ``__HIVE_DEFAULT_PARTITION__`` semantics).

    Plan: one map-side-combined groupBy per candidate (counts only),
    each reduced to O(1) stats — the shuffles carry #groups rows; no
    data is written to find out the layout would have been wrong.
    """
    if not candidate_cols:
        raise ValueError("candidate_cols must be non-empty")
    if row_bytes <= 0 or target_file_mb <= 0:
        raise ValueError(
            f"row_bytes and target_file_mb must be > 0: "
            f"{row_bytes}, {target_file_mb}")
    outs = []
    for c in candidate_cols:
        sizes = (df.groupBy(F.col(c).alias("__p"))
                 .agg(F.count(F.lit(1)).alias("__n")))
        stats = sizes.agg(
            F.count(F.lit(1)).cast("long").alias("n_partitions"),
            F.min("__n").cast("long").alias("min_rows"),
            F.expr("CAST(percentile(__n, 0.5) AS DOUBLE)")
            .alias("p50_rows"),
            F.max("__n").cast("long").alias("max_rows"),
            F.avg("__n").alias("__mean"))
        outs.append(stats.select(
            F.lit(c).alias("candidate"),
            "n_partitions", "min_rows", "p50_rows", "max_rows",
            (F.col("max_rows") / F.col("__mean")).alias("skew"),
            (F.col("max_rows") * F.lit(float(row_bytes))
             / F.lit(1024.0 * 1024.0)).alias("est_mb_max"),
            (F.col("p50_rows") * F.lit(float(row_bytes))
             < F.lit(target_file_mb * 1024 * 1024 / 8.0))
            .alias("smallfile_risk"),
            (F.col("max_rows") > F.lit(8.0) * F.col("__mean"))
            .alias("skew_risk")))
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u


def compaction_plan(files: DataFrame, id_col: str, bytes_col: str,
                    target_bytes: int,
                    partition_cols: "Sequence[str] | None" = None
                    ) -> DataFrame:
    """Small-file compaction plan: assign each input file to a rewrite
    bin of ~``target_bytes`` — the operational answer to the small-file
    problem a 100 TB table accretes from streaming/incremental writes
    (every file < a few hundred MB costs a task + open/footer overhead
    per scan; :func:`partition_advisor` predicts the problem, this
    plans the fix).  Input is any ``(id, bytes)`` frame — e.g.
    :func:`~spark_df_profiling_spark.sources.file_row_stats` output.

    Assignment is GREEDY-SEQUENTIAL over the deterministic order
    (bytes DESC, id ASC) within each partition group: running total of
    preceding bytes, ``bin = floor(prefix / target_bytes)`` — every
    bin's payload lands in ``(target − max_member, target + member)``,
    the classical next-fit bound, and the whole plan is ONE window
    prefix sum per partition group (no driver loop over the file list,
    no UDF — a 10M-file manifest plans in one shuffle).  Files already
    ≥ ``target_bytes`` are passed through with ``bin`` NULL and
    ``oversize`` true: rewriting them buys nothing.  Output one row
    per file: partition cols + ``(id, bytes, bin, oversize)``; derive
    bin manifests with a plain groupBy on (partition, bin).

    Deterministic and engine-portable (ties broken by id), so DuckDB
    replays the identical assignment.
    """
    from pyspark.sql import Window

    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1: {target_bytes}")
    pcols = list(partition_cols or [])
    for c in [id_col, bytes_col, *pcols]:
        if c not in files.columns:
            raise ValueError(f"missing column: {c!r}")
    b = F.col(bytes_col).cast("long")
    base = (files.where(F.col(id_col).isNotNull() & b.isNotNull())
            .select(*pcols, F.col(id_col), b.alias(bytes_col)))
    small = base.where(b < target_bytes)
    w = (Window.partitionBy(*pcols)
         .orderBy(F.desc(bytes_col), F.asc(id_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    planned = small.select(
        *pcols, id_col, bytes_col,
        F.floor(F.coalesce(F.sum(bytes_col).over(w), F.lit(0))
                / F.lit(int(target_bytes))).cast("long").alias("bin"),
        F.lit(False).alias("oversize"))
    passthrough = base.where(b >= target_bytes).select(
        *pcols, id_col, bytes_col,
        F.lit(None).cast("long").alias("bin"),
        F.lit(True).alias("oversize"))
    return planned.unionByName(passthrough)

"""Numeric-distribution diagnostics: IQR outlier fences and Benford's
first-digit law.

Profiler-grade extensions (the reference's SURVEY §2.3 stack stops at
moments/quantiles/histograms; real data audits also want "how many
points sit outside the whiskers" and "do these amounts look organic"):

* :func:`outlier_stats` — Tukey fences (Q1 - k·IQR, Q3 + k·IQR) and the
  row counts outside them, the numbers behind every box plot;
* :func:`benford_stats` — observed first-significant-digit distribution
  vs Benford's law P(d) = log10(1 + 1/d), with chi-square and
  mean-absolute-deviation distances.  Naturally-occurring multi-scale
  quantities (prices, populations, file sizes) follow it; fabricated or
  truncated data usually doesn't — a classic forensic screen.

Both are two-pass / one-pass aggregate plans with NO row-scale
shuffles; every expression is a built-in JVM function, so the identical
arithmetic replays in DuckDB for the oracle.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def outlier_stats(df: DataFrame, cols: Sequence[str],
                  k: float = 1.5, exact: bool = True,
                  accuracy: int = 10_000) -> DataFrame:
    """Tukey-fence outlier counts per numeric column.

    Returns one row per column: ``(column, q1, q3, iqr, lo_fence,
    hi_fence, n_below, n_above, n_outliers, p_outliers)`` with the
    standard fences ``q1 - k*iqr`` / ``q3 + k*iqr`` (k=1.5 — box-plot
    whiskers; k=3 for "far out").

    Plan: pass 1 is ONE shuffle-free aggregate computing Q1/Q3 for
    every column; the 1-row fence frame then rides into pass 2 as a
    broadcast cross join, and pass 2 is again one aggregate over the
    table.  Two scans, zero row shuffles, any number of columns.

    ``exact=True`` uses interpolated ``percentile`` — oracle-parity
    semantics, but its aggregation buffer holds EVERY value of the
    column (10× rehearsal: 71s for 3 columns over 6M rows; at 100 TB it
    would OOM an executor).  Set ``exact=False`` for the scale path:
    ``percentile_approx`` (KLL-style sketch, bounded state,
    ``accuracy=10_000`` → quantile rank error ≤ 0.01%) — the fences
    move by at most the sketch error, which is noise next to a k·IQR
    whisker.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if k < 0:
        raise ValueError(f"k must be >= 0: {k}")
    fn = "percentile" if exact else "percentile_approx"
    extra = "" if exact else f", {int(accuracy)}"
    aggs = []
    for c in cols:
        aggs.append(F.expr(
            f"{fn}(CAST(`{c}` AS DOUBLE), 0.25{extra})")
            .alias(f"__q1_{c}"))
        aggs.append(F.expr(
            f"{fn}(CAST(`{c}` AS DOUBLE), 0.75{extra})")
            .alias(f"__q3_{c}"))
    fences = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(fences))
    aggs2 = []
    for c in cols:
        cc = F.col(c).cast("double")
        iqr = F.col(f"__q3_{c}") - F.col(f"__q1_{c}")
        lo = F.col(f"__q1_{c}") - F.lit(float(k)) * iqr
        hi = F.col(f"__q3_{c}") + F.lit(float(k)) * iqr
        aggs2.append(F.sum(F.when(cc < lo, 1).otherwise(0))
                     .cast("long").alias(f"__nb_{c}"))
        aggs2.append(F.sum(F.when(cc > hi, 1).otherwise(0))
                     .cast("long").alias(f"__na_{c}"))
        aggs2.append(F.count(cc).alias(f"__n_{c}"))
        aggs2.append(F.first(F.col(f"__q1_{c}")).alias(f"__fq1_{c}"))
        aggs2.append(F.first(F.col(f"__q3_{c}")).alias(f"__fq3_{c}"))
    counts = joined.agg(*aggs2)
    stack_args = ", ".join(
        f"'{c}', __fq1_{c}, __fq3_{c}, __nb_{c}, __na_{c}, __n_{c}"
        for c in cols)
    out = counts.select(F.expr(
        f"stack({len(cols)}, {stack_args}) "
        "as (column, q1, q3, n_below, n_above, n_rows)"))
    iqr = F.col("q3") - F.col("q1")
    return out.select(
        "column", "q1", "q3", iqr.alias("iqr"),
        (F.col("q1") - F.lit(float(k)) * iqr).alias("lo_fence"),
        (F.col("q3") + F.lit(float(k)) * iqr).alias("hi_fence"),
        "n_below", "n_above",
        (F.col("n_below") + F.col("n_above")).alias("n_outliers"),
        ((F.col("n_below") + F.col("n_above")).cast("double")
         / F.nullif(F.col("n_rows"), F.lit(0))).alias("p_outliers"))


#: Benford's law: P(first significant digit = d) = log10(1 + 1/d)
BENFORD_P = {d: math.log10(1 + 1 / d) for d in range(1, 10)}


def first_digit(col) -> F.Column:
    """First significant digit of a nonzero numeric (NULL for 0/NULL):
    ``floor(|x| / 10^floor(log10 |x|))`` — pure arithmetic, no string
    formatting.

    libm's log10 may land an ulp either side of an exact integer at
    power-of-ten boundaries (log10(100) = 1.9999... or 2.0 depending on
    the implementation), which would shift the magnitude by one and
    yield 10 or 0 instead of the true digit — so the quotient is
    RE-NORMALIZED into [1, 10) before flooring.  After that correction
    every IEEE engine produces the identical digit regardless of which
    side its log10 landed on (the oracle replays the same guard).

    The scale is built by PARSING the literal ``'1e<mag>'``, never via
    ``pow``: float parsing and division are correctly-rounded IEEE ops
    (bit-identical across engines), while ``pow`` is only ulp-accurate
    for non-representable powers (negative magnitudes: 10^-2 etc.) and
    the engines genuinely disagree by an ulp — enough to flip
    ``floor(d0)`` when d0 sits exactly on an integer (same divergence
    class as the r15 sig() decimal-tie bug; see oracle.sig)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    a = F.abs(c)
    mag = F.floor(F.log10(a))
    scale = F.concat(F.lit("1e"),
                     mag.cast("long").cast("string")).cast("double")
    d0 = a / scale
    return (F.when(a > 0,
                   F.when(d0 >= 10, F.floor(d0 / 10))
                   .when(d0 < 1, F.floor(d0 * 10))
                   .otherwise(F.floor(d0)))
            .cast("int"))


def benford_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """First-significant-digit distribution vs Benford's law.

    Returns one row per (column, digit 1-9): ``(column, digit, cnt,
    p_obs, p_benford)`` plus per-column distances repeated on each row:
    ``chi2`` (Pearson statistic over the 9 cells) and ``mad`` (mean
    absolute deviation of proportions — the Nigrini screen; < 0.006 is
    "close conformity", > 0.015 "nonconformity").  Digits with zero
    occurrences still get a row (cnt=0), so the shape is fixed at
    ``9 * len(cols)`` rows.

    Plan: one stack-explode scan → groupBy (column, digit) with
    map-side partial aggregation (at most ``9 * len(cols)`` groups
    reach the shuffle) → a broadcast join against the 9-row Benford
    literal table → a window over the tiny group set for the
    distances.  Nothing row-scale moves.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    stack_args = ", ".join(f"'{c}', CAST(`{c}` AS DOUBLE)" for c in cols)
    stacked = df.select(F.expr(
        f"stack({len(cols)}, {stack_args}) as (column, v)"))
    digits = (stacked.select("column", first_digit(F.col("v"))
                             .alias("digit"))
              .where(F.col("digit").isNotNull())
              .groupBy("column", "digit")
              .agg(F.count(F.lit(1)).alias("cnt")))
    spark = df.sparkSession
    bench = spark.createDataFrame(
        [(d, BENFORD_P[d]) for d in range(1, 10)],
        "digit int, p_benford double")
    # the column list is KNOWN — building it as a literal frame avoids
    # a full second scan + distinct over the stacked token stream
    cols_df = spark.createDataFrame([(c,) for c in cols], "column string")
    full = cols_df.crossJoin(F.broadcast(bench))
    from pyspark.sql import Window
    w = Window.partitionBy("column")
    out = (full.join(digits, ["column", "digit"], "left")
           .withColumn("cnt", F.coalesce("cnt", F.lit(0)).cast("long"))
           .withColumn("n", F.sum("cnt").over(w))
           .withColumn("p_obs", F.col("cnt").cast("double")
                       / F.nullif(F.col("n"), F.lit(0)))
           .withColumn(
               "chi2",
               # n = 0 (all-null / all-zero column) would divide by
               # zero in every cell — and ANSI raises on that even
               # inside an un-taken when() branch, because the window
               # sum evaluates eagerly.  nullif makes the cells NULL,
               # so the column reports chi2 = NULL: "no digits" is
               # absence of evidence, not infinite nonconformity.
               F.sum((F.col("cnt").cast("double")
                      - F.col("n") * F.col("p_benford"))
                     * (F.col("cnt").cast("double")
                        - F.col("n") * F.col("p_benford"))
                     / F.nullif(F.col("n") * F.col("p_benford"),
                                F.lit(0.0))).over(w))
           .withColumn(
               "mad",
               F.avg(F.abs(F.col("p_obs") - F.col("p_benford"))).over(w)))
    return out.select("column", "digit", "cnt", "p_obs", "p_benford",
                      "chi2", "mad")


def robust_outlier_stats(df: DataFrame, cols: Sequence[str],
                         z: float = 3.5, exact: bool = True,
                         accuracy: int = 10_000) -> DataFrame:
    """Median/MAD robust outliers — the heavy-tail-safe complement to
    :func:`outlier_stats` (IQR fences assume the bulk is well-behaved;
    the modified z-score ``0.6745·|x−median|/MAD_median`` stays honest
    when up to half the data is junk; |z| > 3.5 is the classic
    Iglewicz-Hoaglin cut).

    Returns one row per column: ``(column, median, madm, lo_cut,
    hi_cut, n_below, n_above, n_outliers, n_rows)`` where
    ``madm`` = median absolute deviation from the median and the cuts
    are ``median ± z·MAD/0.6745``.  Columns whose MAD is 0 (>=50%
    constant) report NULL cuts and 0 outliers — every non-median value
    would otherwise be "infinitely" outlying, which is a constancy
    fact, not an outlier fact.

    Plan: THREE aggregate passes (median → MAD of deviations → count),
    each shuffle-free with O(#cols) driver state between them (the
    median must be known before deviations can be computed — inherent
    to the statistic).  ``exact=False`` switches both quantile passes
    to percentile_approx for 100 TB inputs.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if z <= 0:
        raise ValueError(f"z must be > 0: {z}")
    fn = "percentile" if exact else "percentile_approx"
    extra = "" if exact else f", {int(accuracy)}"
    med = df.agg(*[
        F.expr(f"{fn}(CAST(`{c}` AS DOUBLE), 0.5{extra})")
        .alias(f"__m_{c}") for c in cols])
    j1 = df.crossJoin(F.broadcast(med))
    madm = j1.agg(*[
        F.expr(f"{fn}(abs(CAST(`{c}` AS DOUBLE) - `__m_{c}`), "
               f"0.5{extra})").alias(f"__d_{c}") for c in cols]
        + [F.first(f"__m_{c}").alias(f"__fm_{c}") for c in cols])
    j2 = df.crossJoin(F.broadcast(madm))
    aggs = []
    for c in cols:
        cc = F.col(c).cast("double")
        half_width = F.lit(float(z)) * F.col(f"__d_{c}") / F.lit(0.6745)
        lo = F.col(f"__fm_{c}") - half_width
        hi = F.col(f"__fm_{c}") + half_width
        ok = F.col(f"__d_{c}") > 0
        aggs += [
            F.sum(F.when(ok & (cc < lo), 1).otherwise(0)).cast("long")
            .alias(f"__nb_{c}"),
            F.sum(F.when(ok & (cc > hi), 1).otherwise(0)).cast("long")
            .alias(f"__na_{c}"),
            F.count(cc).alias(f"__n_{c}"),
            F.first(F.col(f"__fm_{c}")).alias(f"__rm_{c}"),
            F.first(F.col(f"__d_{c}")).alias(f"__rd_{c}"),
            F.first(F.when(ok, lo)).alias(f"__lo_{c}"),
            F.first(F.when(ok, hi)).alias(f"__hi_{c}"),
        ]
    counts = j2.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __rm_{c}, __rd_{c}, __lo_{c}, __hi_{c}, "
        f"__nb_{c}, __na_{c}, __n_{c}" for c in cols)
    out = counts.select(F.expr(
        f"stack({len(cols)}, {stack_args}) as (column, median, madm, "
        "lo_cut, hi_cut, n_below, n_above, n_rows)"))
    return out.select(
        "column", "median", "madm", "lo_cut", "hi_cut",
        "n_below", "n_above",
        (F.col("n_below") + F.col("n_above")).alias("n_outliers"),
        "n_rows")


def winsorize(df: DataFrame, cols: Sequence[str],
              lower: float = 0.01, upper: float = 0.99,
              exact: bool = True, accuracy: int = 10_000,
              suffix: str = "_w") -> DataFrame:
    """Winsorize (quantile-clip) numeric columns: values below the
    ``lower`` quantile are raised to it, values above the ``upper``
    quantile lowered to it — the standard tail-taming transform before
    training on heavy-tailed features (price, latency, token counts),
    where ``outlier_stats`` DIAGNOSES the tails and this FIXES them.

    Appends ``<col><suffix>`` (double) next to each input column.
    NULLs stay NULL and NaN stays NaN (both explicitly guarded — Spark
    ``greatest``/``least`` IGNORE null operands and sort NaN above
    every double, so either would otherwise silently land on a cut);
    NaN is also excluded from the cut computation so one NaN can't
    drag the upper cut to NaN.  ±Inf clips onto the cuts like any
    finite value, but ±Inf values still PARTICIPATE in cut
    interpolation (so an upper cut can itself be +Inf — filter
    non-finite values upstream if that matters).  An all-NULL column
    has NULL cuts and passes through unchanged.

    Plan: ONE aggregate computes both cuts for every column
    (shuffle-free, map-side partial), the 1-row cut frame broadcasts
    back over the table (the ``outlier_stats`` fence idiom), and the
    clip itself is ``least``/``greatest`` inside whole-stage codegen —
    no second shuffle, no window, no UDF.  ``exact=True`` is
    oracle-parity interpolated ``percentile`` (unbounded buffer: fine
    to millions of rows per executor); ``exact=False`` is the 100 TB
    path via ``percentile_approx`` (bounded sketch, rank error ≤
    1/accuracy).
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if not (0.0 <= lower < upper <= 1.0):
        raise ValueError(f"need 0 <= lower < upper <= 1: {lower}, {upper}")
    fn = "percentile" if exact else "percentile_approx"
    extra = "" if exact else f", {int(accuracy)}"
    aggs = []
    for c in cols:
        # NaN sorts above +Inf in Spark's ordering, so a single NaN in
        # the column would drag the upper cut to NaN and disable
        # clipping entirely — exclude NaN from the CUT computation
        # (percentile ignores NULL); NaN rows themselves pass through
        clean = (f"CASE WHEN isnan(CAST(`{c}` AS DOUBLE)) THEN NULL "
                 f"ELSE CAST(`{c}` AS DOUBLE) END")
        aggs.append(F.expr(f"{fn}({clean}, {lower!r}{extra})")
                    .alias(f"__lo_{c}"))
        aggs.append(F.expr(f"{fn}({clean}, {upper!r}{extra})")
                    .alias(f"__hi_{c}"))
    cuts = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(cuts))
    for c in cols:
        cc = F.col(c).cast("double")
        clipped = F.least(F.greatest(cc, F.col(f"__lo_{c}")),
                          F.col(f"__hi_{c}"))
        # two explicit guards: greatest/least IGNORE null operands, so
        # an unguarded NULL value would silently become the lower cut;
        # NaN sorts greater than any double, so least(NaN, hi) would
        # clip NaN to the upper cut — both stay as they came in
        out = out.withColumn(
            c + suffix,
            F.when(cc.isNull() | F.isnan(cc), cc).otherwise(clipped))
    return out.drop(*[f"__lo_{c}" for c in cols],
                    *[f"__hi_{c}" for c in cols])


def percentile_rank(df: DataFrame, col: str,
                    out_col: str = "pct_rank",
                    exact: bool = True,
                    num_buckets: "int | None" = None) -> DataFrame:
    """Empirical-CDF rank per row: ``count(values <= v) / n`` over the
    non-NULL population of ``col`` (SQL ``cume_dist`` semantics, so
    every member of a tie block gets the block's TOP rank).  The
    score-calibration primitive: quality/LM scores from different
    models become comparable once mapped onto [1/n, 1].  NULLs rank
    NULL; NaN participates and ranks highest (NaN sorts greater than
    any double in both Spark and DuckDB — documented, not hidden).

    ``exact=True`` is the oracle-parity path and NEVER uses a global
    single-partition window: distinct values collapse to (value,
    count) in one map-side-combined groupBy, the distinct frame is
    range-repartitioned + localCheckpoint (the frozen-boundary
    protocol from ks_2samp/gini — sampled boundaries drift across
    re-executions otherwise), per-partition totals prefix-sum on the
    DRIVER (O(#partitions) scalars), an in-partition running sum
    turns (value, count) into (value, cum), and rows join back on the
    value — a hash join where a 50%-hot value is one lookup per row,
    never an expansion.

    ``exact=False`` is the 100 TB path: one ``percentile_approx``
    aggregate produces ``num_buckets`` (default 1000) edge literals
    and the rank is the fraction of edges ≤ v — a pure row expression
    (no shuffle, no join) with resolution 1/num_buckets.  The edge
    fold is an INTERPRETED higher-order function, so num_buckets is
    also the per-row comparison count: measured at 6M rows, k=100
    runs 6.5s vs 14.6s at k=1000 — and exact mode with few distinct
    values beat k=1000 outright (6.3s).  Choose approx for CONTINUOUS
    columns (exact's distinct frame is corpus-sized there: 12.1s and
    driver-heap pressure at 6M all-distinct) with k at the resolution
    you need, not higher.
    """
    if col not in df.columns:
        raise ValueError(f"column not in DataFrame: {col!r}")
    v = F.col(col).cast("double")
    if not exact:
        k = int(num_buckets or 1000)
        if k < 2:
            raise ValueError(f"num_buckets must be >= 2: {k}")
        qs = [i / k for i in range(1, k)]
        row = df.agg(F.percentile_approx(
            v, qs, 10000).alias("__e")).collect()[0]
        edges = row["__e"]
        if edges is None or all(e is None for e in edges):
            raise ValueError(
                f"percentile_rank: no non-NULL values in {col!r}")
        lits = F.array(*[F.lit(float(e)) for e in edges])
        frac = (F.aggregate(
            lits, F.lit(0),
            lambda acc, e: acc + F.when(v >= e, 1).otherwise(0))
            + F.lit(1)) / F.lit(float(k))
        return df.withColumn(
            out_col, F.when(v.isNull(), F.lit(None).cast("double"))
            .otherwise(frac))
    from pyspark.sql import Window
    spark = df.sparkSession
    n_bk = int(num_buckets
               or spark.conf.get("spark.sql.shuffle.partitions", "32"))
    counts = (df.select(v.alias("__v")).where(F.col("__v").isNotNull())
              .groupBy("__v").agg(F.count(F.lit(1)).alias("__c")))
    ranged = (counts.repartitionByRange(n_bk, F.col("__v"))
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint(eager=True))
    totals = {r["__pid"]: r["__t"] for r in
              ranged.groupBy("__pid").agg(F.sum("__c").alias("__t"))
              .collect()}
    if not totals:
        raise ValueError(
            f"percentile_rank: no non-NULL values in {col!r}")
    prefix, acc = [], 0
    for pid in sorted(totals):
        prefix.append((pid, acc))
        acc += totals[pid]
    n = float(acc)
    pref_df = spark.createDataFrame(prefix, "__pid int, __p long")
    w = Window.partitionBy("__pid").orderBy("__v")
    cum = (ranged.join(F.broadcast(pref_df), "__pid")
           .select("__v", ((F.sum("__c").over(w) + F.col("__p"))
                           .cast("double") / F.lit(n)).alias(out_col)))
    return df.join(cum, v.eqNullSafe(F.col("__v")), "left").drop("__v")

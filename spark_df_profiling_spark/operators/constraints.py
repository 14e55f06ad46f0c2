"""Data-quality constraint checks (dbt-test / Deequ-style).

The assertions a pipeline runs before publishing a table: null checks,
key uniqueness, accepted value domains, numeric ranges, and referential
integrity — each reported as a violation COUNT (0 = pass), so the same
suite doubles as a monitoring metric feed.

Plan shapes:

* all same-table column checks collapse into ONE aggregate over ONE
  scan (:func:`column_checks` builds a sum(when) tower per check —
  adding a check is free);
* :func:`fk_orphans` is a left_anti join; the parent side reduces to
  DISTINCT keys first, so a dimension parent broadcasts and the fact
  child never shuffles (the 100 TB case: orders→customer).  Big-big
  FK checks (lineitem→orders at full scale) fall back to a shuffled
  anti join on the key — one shuffle, the minimum possible.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCHEMA = "check string, table string, n_violations long"


def not_null(col: str) -> "tuple[str, Column]":
    """Violations = rows where ``col`` IS NULL."""
    return (f"not_null:{col}",
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)))


def unique(col: str) -> "tuple[str, Column]":
    """Violations = surplus duplicate rows among non-null values
    (``count - count_distinct``; 0 iff every non-null value is unique).
    """
    return (f"unique:{col}", F.count(col) - F.count_distinct(F.col(col)))


def accepted_values(col: str, values: Sequence) -> "tuple[str, Column]":
    """Violations = non-null rows outside the accepted domain."""
    return (f"accepted_values:{col}",
            F.sum(F.when(F.col(col).isNotNull()
                         & ~F.col(col).isin(*values), 1).otherwise(0)))


def in_range(col: str, lo, hi) -> "tuple[str, Column]":
    """Violations = non-null rows outside [lo, hi]."""
    return (f"in_range:{col}",
            F.sum(F.when(F.col(col).isNotNull()
                         & ((F.col(col) < lo) | (F.col(col) > hi)), 1)
                  .otherwise(0)))


def column_checks(df: DataFrame, table: str,
                  checks: "Sequence[tuple[str, Column]]") -> DataFrame:
    """Run every column check in ONE aggregate pass over ``df``.

    ``checks`` come from :func:`not_null` / :func:`unique` /
    :func:`accepted_values` / :func:`in_range` (or any (name,
    aggregate-Column) pair).  Returns ``(check, table, n_violations)``.
    """
    if not checks:
        raise ValueError("checks must be non-empty")
    names = [n for n, _ in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {names}")
    one = df.agg(*[
        F.coalesce(expr.cast("long"), F.lit(0).cast("long"))
        .alias(f"__c{i}") for i, (_, expr) in enumerate(checks)])
    stack_args = ", ".join(
        f"'{name}', __c{i}" for i, (name, _) in enumerate(checks))
    return (one.select(F.expr(
        f"stack({len(checks)}, {stack_args}) as (check, n_violations)"))
        .select("check", F.lit(table).alias("table"), "n_violations"))


def fk_orphans(child: DataFrame, child_key: str,
               parent: DataFrame, parent_key: str,
               child_table: str = "child",
               broadcast_parent: bool = True) -> DataFrame:
    """Referential integrity: child rows whose non-null key has no
    parent.  Returns one ``(check, table, n_violations)`` row.

    The parent reduces to DISTINCT keys before the anti join, so a
    dimension-sized parent broadcasts and the child side never
    shuffles; ``broadcast_parent=False`` keeps the shuffled anti join
    for big-big pairs.
    """
    keys = parent.select(F.col(parent_key).alias("__pk")).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = (child.select(F.col(child_key).alias("__ck"))
               .where(F.col("__ck").isNotNull())
               .join(keys, F.col("__ck") == F.col("__pk"), "left_anti"))
    n = orphans.agg(F.count(F.lit(1)).cast("long").alias("n")) \
        .collect()[0]["n"]
    spark = child.sparkSession
    return spark.createDataFrame(
        [(f"fk:{child_key}->{parent_key}", child_table, n)], _SCHEMA)


def check_suite(*parts: DataFrame) -> DataFrame:
    """Union check results and add a ``passed`` flag — the publishable
    data-quality report (`where(~passed)` gates the pipeline)."""
    if not parts:
        raise ValueError("need at least one check result")
    from functools import reduce
    out = reduce(lambda a, b: a.unionByName(b), parts)
    return out.withColumn("passed", F.col("n_violations") == 0)


def not_null_rows(col: str) -> "tuple[str, Column]":
    """Row-level predicate twin of :func:`not_null`."""
    return f"not_null:{col}", F.col(col).isNull()


def accepted_values_rows(col: str, values: Sequence
                         ) -> "tuple[str, Column]":
    """Row-level predicate twin of :func:`accepted_values`."""
    return (f"accepted_values:{col}",
            F.col(col).isNotNull() & ~F.col(col).isin(list(values)))


def in_range_rows(col: str, lo, hi) -> "tuple[str, Column]":
    """Row-level predicate twin of :func:`in_range`."""
    c = F.col(col)
    return (f"in_range:{col}",
            c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))))


def violation_examples(df: DataFrame,
                       checks: "Sequence[tuple[str, Column]]",
                       id_col: str, k: int = 3,
                       seed: int = 0) -> DataFrame:
    """Deterministic EXAMPLE rows for failing checks — the half of a
    data-quality report :func:`column_checks` can't give (it counts;
    debugging needs to see actual offenders).  ``checks`` are
    (name, row-predicate) pairs — :func:`not_null_rows` /
    :func:`accepted_values_rows` / :func:`in_range_rows`, or any
    boolean Column.  Returns up to ``k`` rows per failing check:
    ``(check, <id_col>)``, chosen by md5 rank on the id — the SAME
    examples every run/engine (a flapping exemplar set makes alert
    diffs useless), and a check with zero violations simply yields no
    rows.

    Plan: ONE scan builds a compact array of fired check names per
    row, explodes only the violations (clean rows carry an empty
    array and vanish pre-shuffle), then
    :func:`~spark_df_profiling_spark.operators.sampling.sample_exact_k`
    ranks per check.  A check with millions of violations sorts them
    in one task (the sample_exact_k bound) — pre-thin with
    ``sample_hash`` at a few × k/violation-count first when checks
    are expected to fail at scale; membership stays deterministic.
    """
    if not checks:
        raise ValueError("violation_examples requires >= 1 check")
    if id_col not in df.columns:
        raise ValueError(f"missing column: {id_col!r}")
    from spark_df_profiling_spark.operators.sampling import (
        sample_exact_k)
    arr = F.array_compact(F.array(*[
        F.when(pred, F.lit(name)) for name, pred in checks]))
    viol = (df.select(F.col(id_col), arr.alias("__cks"))
            .where(F.size("__cks") > 0)
            .select(id_col, F.explode("__cks").alias("check")))
    return (sample_exact_k(viol, "check", k, id_col, seed=seed)
            .select("check", id_col))


def k_anonymity(df: DataFrame, quasi_cols: Sequence[str],
                k: int = 5) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over a quasi-identifier
    combination — the re-identification screen run before a dataset
    leaves the pipeline: every row whose quasi-identifier tuple is
    shared by fewer than ``k`` rows is re-identifiable down to that
    class.  ONE row: ``(n, n_classes, min_class_size, k_threshold,
    rows_below_k, classes_below_k, p_rows_below_k, is_k_anonymous)``.
    NULL is a VALUE here (NULL ZIP is as linkable as any other; the
    groupBy's null-safe grouping is exactly right).

    Scale: one map-side-combined groupBy on the quasi-identifier
    tuple + one aggregate of the class-size frame — the same
    two-level shape as :func:`~spark_df_profiling_spark.operators.
    frequency.column_entropy`; nothing row-sized after the first
    shuffle.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k must be >= 2: {k}")
    for c in quasi_cols:
        if c not in df.columns:
            raise ValueError(f"missing column: {c!r}")
    classes = (df.groupBy(*quasi_cols)
               .agg(F.count(F.lit(1)).cast("long").alias("__cs")))
    below = F.col("__cs") < k
    return classes.agg(
        F.coalesce(F.sum("__cs"), F.lit(0)).cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("__cs").cast("long").alias("min_class_size"),
        F.lit(k).cast("long").alias("k_threshold"),
        F.coalesce(F.sum(F.when(below, F.col("__cs"))), F.lit(0))
        .cast("long").alias("rows_below_k"),
        F.coalesce(F.sum(F.when(below, 1)), F.lit(0)).cast("long")
        .alias("classes_below_k"),
    ).select(
        "*",
        F.when(F.col("n") > 0,
               F.col("rows_below_k") / F.col("n").cast("double"))
        .alias("p_rows_below_k"),
        (F.col("rows_below_k") == 0).alias("is_k_anonymous"))


def l_diversity(df: DataFrame, quasi_cols: Sequence[str],
                sensitive_col: str, l: int = 2) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007) — the
    attribute-disclosure companion to :func:`k_anonymity`: a class
    can be k-anonymous yet leak its sensitive value outright when
    every member shares it.  Counts DISTINCT sensitive values per
    quasi-identifier class; one row: ``(n, n_classes, min_diversity,
    l_threshold, classes_below_l, rows_below_l, p_rows_below_l,
    is_l_diverse)``.  NULL sensitive values are excluded from the
    diversity count (an unknown value discloses nothing); classes
    whose sensitive column is ALL NULL count 0 distinct and fail.

    Scale: one (quasi, sensitive) distinct-collapse groupBy, one
    class-level reduce of that frame, one scalar aggregate — every
    shuffle carries cell- or class-sized rows.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l < 2:
        raise ValueError(f"l must be >= 2: {l}")
    for c in list(quasi_cols) + [sensitive_col]:
        if c not in df.columns:
            raise ValueError(f"missing column: {c!r}")
    cells = (df.groupBy(*quasi_cols)
             .agg(F.count(F.lit(1)).cast("long").alias("__cs"),
                  F.count_distinct(F.col(sensitive_col))
                  .cast("long").alias("__ld")))
    below = F.col("__ld") < l
    return cells.agg(
        F.coalesce(F.sum("__cs"), F.lit(0)).cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("__ld").cast("long").alias("min_diversity"),
        F.lit(l).cast("long").alias("l_threshold"),
        F.coalesce(F.sum(F.when(below, 1)), F.lit(0)).cast("long")
        .alias("classes_below_l"),
        F.coalesce(F.sum(F.when(below, F.col("__cs"))), F.lit(0))
        .cast("long").alias("rows_below_l"),
    ).select(
        "*",
        F.when(F.col("n") > 0,
               F.col("rows_below_l") / F.col("n").cast("double"))
        .alias("p_rows_below_l"),
        (F.col("classes_below_l") == 0).alias("is_l_diverse"))


def dp_release(df: DataFrame, col: str, lower: float, upper: float,
               epsilon: float = 1.0, seed: int = 0) -> DataFrame:
    """Seeded-Laplace differentially-private release of a column's
    (count, sum, mean) — the publish step after the
    :func:`k_anonymity` / :func:`l_diversity` screens when aggregate
    statistics must ship outside the enclave: values clip to
    ``[lower, upper]`` (clipping bounds the sensitivity — the part of
    DP that actually touches the data), the ``epsilon`` budget splits
    evenly between the count (sensitivity 1) and the clipped sum
    (sensitivity ``max(|lower|, |upper|)``), and Laplace noise comes
    from the repo's md5-uniform arithmetic via the inverse CDF —
    REPRODUCIBLE releases: re-running the same release yields the
    same numbers, so a re-query cannot be averaged away and spends no
    extra budget.  The standard caveat, stated not hidden: the DP
    guarantee holds only while seed+hash stay secret from the
    adversary (a seeded mechanism is pseudo-random; rotate the seed
    per release like any key).  One row: ``(n_dp, sum_dp, mean_dp,
    epsilon, lower, upper)`` — TRUE values never leave the operator;
    ``mean_dp = sum_dp / n_dp`` is the standard post-processed ratio
    (NULL when ``n_dp ≤ 0``).  NULL values are excluded (they carry
    no clipped mass; releasing the null count is a second
    ``dp_release`` on an is-null indicator).

    Scale: ONE map-side-combined aggregate (count + clipped sum);
    the two noise draws are driver scalars from md5 literals —
    engine-portable, so an oracle replays the release bit-for-bit.
    """
    if col not in df.columns:
        raise ValueError(f"missing column: {col!r}")
    if not epsilon > 0:
        raise ValueError(f"epsilon must be > 0: {epsilon}")
    lower, upper = float(lower), float(upper)
    if not lower < upper:
        raise ValueError(
            f"need lower < upper: ({lower}, {upper})")
    v = F.col(col).cast("double")
    clipped = F.least(F.greatest(v, F.lit(lower)), F.lit(upper))
    row = (df.where(v.isNotNull())
           .agg(F.count(F.lit(1)).cast("long").alias("__n"),
                F.sum(clipped).alias("__s"))
           .collect()[0])
    n_true = row["__n"] or 0
    s_true = row["__s"] if row["__s"] is not None else 0.0

    import hashlib
    import math

    def _lap(tag: str, scale: float) -> float:
        # md5-uniform in (0, 1), bounded away from the endpoints by
        # the 1e6 grain (the hash_bucket arithmetic), then the
        # inverse-CDF transform — identical in any engine with md5
        h = hashlib.md5(f"{seed}:dp:{tag}".encode()).hexdigest()
        u = (int(h[:15], 16) % 1_000_000 + 0.5) / 1_000_000.0
        return (-scale * math.copysign(1.0, u - 0.5)
                * math.log(1.0 - 2.0 * abs(u - 0.5)))

    b_n = 2.0 / epsilon
    b_s = 2.0 * max(abs(lower), abs(upper)) / epsilon
    n_dp = n_true + _lap("count", b_n)
    sum_dp = s_true + _lap("sum", b_s)
    mean_dp = sum_dp / n_dp if n_dp > 0 else None
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("n_dp", T.DoubleType()),
        T.StructField("sum_dp", T.DoubleType()),
        T.StructField("mean_dp", T.DoubleType()),
        T.StructField("epsilon", T.DoubleType()),
        T.StructField("lower", T.DoubleType()),
        T.StructField("upper", T.DoubleType())])
    return df.sparkSession.createDataFrame(
        [(float(n_dp), float(sum_dp),
          float(mean_dp) if mean_dp is not None else None,
          float(epsilon), lower, upper)], schema)

"""Profile diff: compare two profiling snapshots column by column.

The report-level counterpart of :mod:`operators.drift` (PSI/KS compare
raw DATA; this compares two already-computed PROFILE frames — e.g.
yesterday's stored profile vs today's, or the stored partial-merge
state finalized at two points in time).  Because the inputs are
O(#columns) rows, the whole comparison is driver-light arithmetic on
tiny frames — the expensive part (profiling) already happened, and at
100 TB that is exactly why you diff profiles instead of re-scanning
both corpora.

Flags raised per column:

* ``added`` / ``removed``   — schema drift;
* ``type_changed``          — dtype or type_class changed;
* ``null_rate``             — |Δ p_missing| above threshold;
* ``mean_shift``            — |mean_b − mean_a| above ``z`` reference
                              standard deviations (scale-free);
* ``std_ratio``             — std grew/shrank beyond a factor;
* ``distinct_ratio``        — distinct-count ratio beyond a factor;
* ``ok``                    — none of the above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_diff(prof_a: DataFrame, prof_b: DataFrame,
                 max_null_delta: float = 0.01,
                 max_mean_z: float = 3.0,
                 max_std_ratio: float = 2.0,
                 max_distinct_ratio: float = 2.0) -> DataFrame:
    """Column-by-column diff of two :func:`profile` outputs.

    Returns one row per column present in either profile:
    ``(column, status, dtype_a, dtype_b, n_a, n_b, p_missing_a,
    p_missing_b, null_delta, mean_a, mean_b, mean_z, std_ratio,
    distinct_ratio, flags)`` — ``status`` is added/removed/changed/ok
    and ``flags`` the comma-joined list of every rule that fired.

    Plan: a full outer join of two #columns-row frames + pure column
    arithmetic.  Nothing here touches the underlying data.
    """
    keep = ["column", "dtype", "type_class", "n", "p_missing",
            "distinct_count", "mean", "std"]
    a = prof_a.select(*keep).alias("a")
    b = prof_b.select(*keep).alias("b")
    j = a.join(b, F.col("a.column") == F.col("b.column"), "full")

    col_name = F.coalesce(F.col("a.column"), F.col("b.column"))
    added = F.col("a.column").isNull()
    removed = F.col("b.column").isNull()
    type_changed = (~added & ~removed
                    & ((F.col("a.dtype") != F.col("b.dtype"))
                       | (F.col("a.type_class") != F.col("b.type_class"))))
    null_delta = F.col("b.p_missing") - F.col("a.p_missing")
    null_flag = F.abs(null_delta) > max_null_delta
    mean_z = F.when(
        F.col("a.std") > 0,
        (F.col("b.mean") - F.col("a.mean")) / F.col("a.std"))
    mean_flag = F.abs(mean_z) > max_mean_z
    std_ratio = F.when(F.col("a.std") > 0,
                       F.col("b.std") / F.col("a.std"))
    std_flag = ((std_ratio > max_std_ratio)
                | (std_ratio < 1.0 / max_std_ratio))
    distinct_ratio = F.when(
        F.col("a.distinct_count") > 0,
        F.col("b.distinct_count").cast("double")
        / F.col("a.distinct_count"))
    distinct_flag = ((distinct_ratio > max_distinct_ratio)
                     | (distinct_ratio < 1.0 / max_distinct_ratio))

    flags = F.concat_ws(",", *[
        F.when(cond, F.lit(name))
        for name, cond in [("type_changed", type_changed),
                           ("null_rate", null_flag),
                           ("mean_shift", mean_flag),
                           ("std_ratio", std_flag),
                           ("distinct_ratio", distinct_flag)]])
    status = (F.when(added, "added")
              .when(removed, "removed")
              .when(flags != "", "changed")
              .otherwise("ok"))
    return j.select(
        col_name.alias("column"), status.alias("status"),
        F.col("a.dtype").alias("dtype_a"), F.col("b.dtype").alias("dtype_b"),
        F.col("a.n").alias("n_a"), F.col("b.n").alias("n_b"),
        F.col("a.p_missing").alias("p_missing_a"),
        F.col("b.p_missing").alias("p_missing_b"),
        null_delta.alias("null_delta"),
        F.col("a.mean").alias("mean_a"), F.col("b.mean").alias("mean_b"),
        mean_z.alias("mean_z"), std_ratio.alias("std_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        flags.alias("flags"))

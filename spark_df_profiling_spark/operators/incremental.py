"""Incremental / mergeable profiles — profile once per partition, merge
states forever.

The 100 TB workflow this enables: a daily pipeline profiles only the new
day's partition (one scan of the new data), appends the resulting
*partial state* (a tiny DataFrame, one row per column) to a state store,
and finalizes corpus-level statistics from the states alone — history is
never rescanned.  The reference has no equivalent (it recomputes over
the whole input every time).

Mergeability per statistic:

* ``n / count / sum / n_zeros / n_infinite`` — plain additive;
* ``min / max`` — idempotent combine;
* ``mean / variance`` — (count, mean, M2) triples merged with Chan's
  parallel algorithm, folded JVM-side with the ``aggregate`` higher-order
  function (numerically stable, unlike naive sum-of-squares);
* ``distinct`` — Apache DataSketches HLL sketches (``hll_sketch_agg``),
  merged with ``hll_union_agg``; binary states survive a parquet
  round-trip, so the state store is just a parquet table;
* quantiles/histograms are NOT mergeable from these states (KLL state is
  not exposed by Spark SQL) — ``finalize`` returns the mergeable surface
  and callers needing quantiles run :func:`operators.profile.profile`
  over the window they care about.

Plan shape: ``partial_profile`` is ONE job over the partition (the same
shuffle-free partial-agg shape as the main profile pass 1);
``merge_partials``/``finalize`` run on #partials × #columns rows — state,
not data.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_df_profiling_spark import schema as S

_NUMERIC = (S.NUM_INT, S.NUM_FLOAT)

#: columns of the partial-state frame (one row per profiled column)
STATE_COLUMNS = ("column", "type_class", "n", "count", "sum",
                 "mean", "m2", "min_num", "max_num", "n_zeros",
                 "n_infinite", "hll")


def _state_struct(name: str, cls: str,
                  num_view: Optional[Column]) -> Column:
    """Mergeable per-column state as one struct aggregate.

    ``num_view`` is the double-valued view of the column when one exists
    (numeric cast, or epoch seconds for date/timestamp — built by
    :func:`partial_profile`, which knows the dtype); None for
    categorical columns.
    """
    c = F.col(name)
    n = F.count(F.lit(1)).cast("long")
    cnt = F.count(c).cast("long")
    if num_view is not None:
        d = num_view
        mean = F.coalesce(F.avg(d), F.lit(0.0))
        # M2 = var_samp * (count - 1); var_samp is NULL for count < 2
        m2 = F.coalesce(F.var_samp(d) * (F.count(d) - 1).cast("double"),
                        F.lit(0.0))
        sm = F.coalesce(F.sum(d), F.lit(0.0))
        mn, mx = F.min(d), F.max(d)
        zeros = F.sum(F.when(d == 0, 1).otherwise(0)).cast("long")
        inf = F.sum(F.when(d.isin(float("inf"), float("-inf")), 1)
                    .otherwise(0)).cast("long")
    else:
        zero = F.lit(0).cast("long")
        mean, m2, sm = F.lit(0.0), F.lit(0.0), F.lit(0.0)
        mn = F.min(F.lit(None).cast("double"))
        mx = F.max(F.lit(None).cast("double"))
        zeros, inf = F.sum(zero), F.sum(zero)
    # HLL supports integral/string/binary inputs — cast through string
    # (exact for ints/strings; doubles collapse only on equal repr)
    hll = F.hll_sketch_agg(c.cast("string"))
    return F.struct(
        n.alias("n"), cnt.alias("count"), sm.alias("sum"),
        mean.alias("mean"), m2.alias("m2"),
        mn.alias("min_num"), mx.alias("max_num"),
        zeros.alias("n_zeros"), inf.alias("n_infinite"),
        hll.alias("hll"))


def partial_profile(df: DataFrame,
                    cols: Optional[Sequence[str]] = None) -> DataFrame:
    """One-scan mergeable state for each column: one output row per
    column, schema :data:`STATE_COLUMNS`.  Persist with plain
    ``df.write.parquet`` (the HLL sketch is a binary column)."""
    from spark_df_profiling_spark.plans.wide_agg import _epoch_sql

    names = list(cols) if cols else df.columns
    classes = {f.name: S.dtype_class(f.dataType)
               for f in df.schema.fields if f.name in names}

    def num_view(c: str) -> Optional[Column]:
        if classes[c] in _NUMERIC:
            return F.col(c).cast("double")
        if classes[c] == S.DATE:
            # epoch seconds (dtype-adaptive: date / LTZ / NTZ) so date
            # min/max merge as plain doubles
            return F.expr(_epoch_sql(df, c))
        return None

    aggs = [_state_struct(c, classes[c], num_view(c)).alias(f"__s{i}")
            for i, c in enumerate(names)]
    one = df.agg(*aggs)
    stacked = one.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.lit(classes[c]).alias("type_class"),
                 F.col(f"__s{i}").alias("s"))
        for i, c in enumerate(names)])).alias("e"))
    return stacked.select("e.column", "e.type_class", "e.s.*")


def merge_partials(*parts: DataFrame) -> DataFrame:
    """Merge any number of partial-state frames into one (same schema).

    Additive stats sum; min/max combine; (count, mean, M2) triples fold
    with Chan's parallel formula inside an ``aggregate`` HOF (the list
    being folded has one element per PARTIAL, not per row — O(#partials)
    per column); HLL sketches union.  Deterministic given the same set
    of partials (the fold is order-sensitive only at the ulp level).
    """
    if not parts:
        raise ValueError("need at least one partial")
    allp = reduce(lambda a, b: a.unionByName(b), parts)
    triples = F.aggregate(
        F.collect_list(F.struct("count", "mean", "m2")),
        F.struct(F.lit(0).cast("long").alias("count"),
                 F.lit(0.0).alias("mean"), F.lit(0.0).alias("m2")),
        lambda acc, x: F.struct(
            (acc["count"] + x["count"]).alias("count"),
            F.when(acc["count"] + x["count"] == 0, F.lit(0.0))
            .otherwise((acc["count"] * acc["mean"]
                        + x["count"] * x["mean"])
                       / (acc["count"] + x["count"])).alias("mean"),
            F.when(acc["count"] + x["count"] == 0, F.lit(0.0))
            .otherwise(acc["m2"] + x["m2"]
                       + F.pow(x["mean"] - acc["mean"], 2)
                       * acc["count"] * x["count"]
                       / (acc["count"] + x["count"])).alias("m2")))
    return (allp.groupBy("column", "type_class")
            .agg(F.sum("n").alias("n"),
                 F.sum("count").alias("count"),
                 F.sum("sum").alias("sum"),
                 triples.alias("__t"),
                 F.min("min_num").alias("min_num"),
                 F.max("max_num").alias("max_num"),
                 F.sum("n_zeros").alias("n_zeros"),
                 F.sum("n_infinite").alias("n_infinite"),
                 F.hll_union_agg("hll").alias("hll"))
            .select("column", "type_class", "n", "count", "sum",
                    F.col("__t.mean").alias("mean"),
                    F.col("__t.m2").alias("m2"),
                    "min_num", "max_num", "n_zeros", "n_infinite", "hll"))


def finalize(partials: DataFrame) -> DataFrame:
    """Derive final statistics from (merged) state: one row per column
    with n, count, n_missing/p_missing, mean, std (sample), min/max,
    zeros/infinite counts, and the HLL distinct estimate."""
    cnt = F.col("count")
    numeric = F.col("type_class").isin(*_NUMERIC)
    return partials.select(
        "column", "type_class", "n", "count",
        (F.col("n") - cnt).alias("n_missing"),
        F.when(F.col("n") > 0, (F.col("n") - cnt) / F.col("n"))
        .otherwise(F.lit(None)).alias("p_missing"),
        F.when(numeric & (cnt > 0), F.col("mean"))
        .otherwise(F.lit(None)).alias("mean"),
        F.when(numeric & (cnt > 1), F.sqrt(F.col("m2") / (cnt - 1)))
        .otherwise(F.lit(None)).alias("std"),
        F.when(numeric & (cnt > 0), F.col("sum"))
        .otherwise(F.lit(None)).alias("sum"),
        "min_num", "max_num", "n_zeros", "n_infinite",
        F.hll_sketch_estimate("hll").cast("long")
        .alias("distinct_estimate"))

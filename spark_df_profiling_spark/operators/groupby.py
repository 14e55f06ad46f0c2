"""Grouped profiling: per-group column statistics (public operator).

Not in the reference (it profiles whole tables only); this is the grouped
variant every data-quality pipeline ends up needing ("stats per tenant /
per day / per source").  One shuffle on the group keys; Catalyst gives
partial (map-side) aggregation for every expression, so skewed groups
only pay at the final-merge stage for their own key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                  T.FloatType, T.DoubleType, T.DecimalType)


def grouped_profile(df: DataFrame, keys: list[str],
                    num_cols: list[str] | None = None) -> DataFrame:
    """Per-group numeric profile: one output row per group, columns
    ``{col}__{stat}`` for stat in count/n_missing/mean/std/min/max/sum.

    ``num_cols`` defaults to every numeric column not used as a key.
    """
    if not keys:
        raise ValueError("grouped_profile requires at least one key")
    if num_cols is None:
        num_cols = [f.name for f in df.schema.fields
                    if isinstance(f.dataType, _NUMERIC_TYPES)
                    and f.name not in keys]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num_cols:
        cd = df[c].cast("double")
        aggs.extend([
            F.count(df[c]).alias(f"{c}__count"),
            (F.count(F.lit(1)) - F.count(df[c])).alias(f"{c}__n_missing"),
            F.mean(cd).alias(f"{c}__mean"),
            F.stddev_samp(cd).alias(f"{c}__std"),
            F.min(cd).alias(f"{c}__min"),
            F.max(cd).alias(f"{c}__max"),
            F.sum(cd).alias(f"{c}__sum"),
        ])
    return df.groupBy(*keys).agg(*aggs)


def salted_agg(df: DataFrame, key: str, agg_col: str,
               n_salts: int = 32) -> DataFrame:
    """Skew-resistant count+sum per key: two-stage aggregation.

    Stage 1 aggregates on (key, random-ish salt) — a hot key's rows fan
    out over ``n_salts`` reducers instead of one; stage 2 merges the
    per-salt partials (at most ``n_salts`` rows per key).  Use when a
    single group holds a scale-breaking share of rows and AQE's skew
    handling doesn't apply (it only splits join partitions).
    Returns (key, cnt, sum_value).
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()),
                  F.lit(n_salts)).alias("__salt")
    partial = (df.select(F.col(key), F.col(agg_col), salt)
               .groupBy(key, "__salt")
               .agg(F.count(F.lit(1)).alias("__c"),
                    F.sum(F.col(agg_col).cast("double")).alias("__s")))
    return (partial.groupBy(key)
            .agg(F.sum("__c").alias("cnt"),
                 F.sum("__s").alias("sum_value")))

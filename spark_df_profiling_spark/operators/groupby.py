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

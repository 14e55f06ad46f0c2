"""Source connectors: load the test tables / arbitrary formats.

The reference takes a ready-made DataFrame (no source layer of its own);
these helpers standardize how the engine reads inputs.  All readers go
through ``spark.read`` so Catalyst's pushdown/pruning applies (filters and
column selections reach the parquet scan — verify with
``df.explain('formatted')``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, name: str,
               sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one test table (parquet)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession,
             sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def read_any(spark: SparkSession, path: str, fmt: str | None = None,
             **options) -> DataFrame:
    """Generic reader: parquet/csv/json/orc by extension or explicit fmt."""
    if fmt is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt = {"pq": "parquet"}.get(ext, ext) or "parquet"
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    return reader.options(**options).format(fmt).load(path)


def write_profile(profile_df: DataFrame, path: str,
                  mode: str = "overwrite") -> None:
    """Persist a profile DataFrame as parquet (the engine's native sink)."""
    profile_df.write.mode(mode).parquet(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite",
                      max_records_per_file: int | None = None,
                      sort_by: list[str] | None = None) -> None:
    """Partition-pruned sink: one directory level per partition column.

    The 100 TB layout decision: downstream queries filtering on
    ``partition_cols`` (date, source, lang...) prune whole directories
    at planning time instead of scanning.  Choose LOW-cardinality
    columns — a high-cardinality partition column creates millions of
    tiny files (the classic small-files failure).
    ``max_records_per_file`` caps file size for post-shuffle skew.

    ``sort_by`` clusters rows within each output task before writing, so
    parquet row-group min/max stats become selective on those columns —
    point/range filters then skip whole row groups at scan time (the
    data-skipping layer BELOW directory pruning; pick the columns the
    hot queries filter on, e.g. a timestamp or id).
    """
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.partitionBy(*partition_cols).parquet(path)


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                   num_buckets: int = 64, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed sink (saveAsTable — bucketing needs catalog metadata).

    Pre-shuffles rows into ``num_buckets`` stable hash buckets on
    ``bucket_cols``; two tables bucketed the same way join WITHOUT a
    shuffle (Exchange disappears from the plan), which is how repeated
    big-big joins amortize their shuffle at scale.  ``sort_cols`` also
    pre-sorts within buckets (sort-merge join skips its sort).
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)

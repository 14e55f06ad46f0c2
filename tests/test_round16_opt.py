"""Round-16 optimization internals: row-group-aware small-input
predicate (scan_parallelism) gating the fine-chunk band and the
small-scan fan-out."""

import pytest
from pyspark.sql import functions as F


def _write_multi_rowgroup(spark, path: str, n_groups: int) -> None:
    """Write a local parquet whose footer shows ``n_groups`` row groups."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    n = 50_000
    tbl = pa.table({"id": pa.array(range(n), type=pa.int64()),
                    "pad": pa.array([f"{i:064x}" for i in range(n)])})
    pq.write_table(tbl, path, row_group_size=n // n_groups)


def test_scan_parallelism_counts_row_groups(spark, tmp_path):
    from spark_df_profiling_spark.sources import scan_parallelism
    # non-file frame: unknowable -> None (callers must keep remedies OFF)
    assert scan_parallelism(spark.range(10)) is None
    # single-row-group file -> 1
    p1 = str(tmp_path / "one.parquet")
    spark.range(1000).coalesce(1).write.mode("overwrite").parquet(p1)
    assert scan_parallelism(spark.read.parquet(p1)) == 1
    # many-row-group file -> footer count, no Spark job needed
    p2 = str(tmp_path / "many.parquet")
    _write_multi_rowgroup(spark, p2, n_groups=64)
    got = scan_parallelism(spark.read.parquet(p2))
    assert got is not None and got >= 64
    # probe_cap exceeded -> None (that many files parallelize by count)
    assert scan_parallelism(spark.read.parquet(p2), probe_cap=0) is None


def test_small_scan_inert_when_row_groups_suffice(spark, tmp_path):
    """An in-band (by bytes) file whose row groups already reach core
    count must NOT be repartitioned: the scan parallelizes on its own,
    so the shuffle would be pure cost (the many-core-cluster trap from
    ADVICE r15)."""
    from spark_df_profiling_spark.sources import (
        input_bytes, parallelize_small_scan, scan_parallelism)
    cores = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "manyrg.parquet")
    _write_multi_rowgroup(spark, p, n_groups=64)
    df = spark.read.parquet(p)
    assert scan_parallelism(df) >= cores
    b = input_bytes(df)
    assert b >= (64 << 10), f"fixture too small to exercise band: {b}"
    # in the byte band, but row groups >= cores -> returned unchanged
    assert parallelize_small_scan(df) is df
    # control: a single-row-group file of similar size IS repartitioned
    p1 = str(tmp_path / "onerg.parquet")
    spark.range(200_000).select(
        F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
    ).coalesce(1).write.mode("overwrite").parquet(p1)
    one = spark.read.parquet(p1)
    assert parallelize_small_scan(one).rdd.getNumPartitions() == cores


def test_describe_small_input_band_gates_on_row_groups(spark, tmp_path):
    """describe()'s fine-chunk band uses the same footer bound: a
    many-row-group input in the byte band profiles with the AT-SCALE
    chunk caps (values identical either way — pinned separately by
    test_chunking_is_value_preserving)."""
    from spark_df_profiling_spark.sources import scan_parallelism
    cores = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "gate.parquet")
    _write_multi_rowgroup(spark, p, n_groups=64)
    df = spark.read.parquet(p)
    rg = scan_parallelism(df)
    # the describe() predicate: band AND rg is not None AND rg < cores
    assert not (rg is not None and rg < cores), \
        "many-row-group file must fail the small_input predicate"

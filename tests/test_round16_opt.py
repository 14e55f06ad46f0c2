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


def test_first_digit_pow_free(spark):
    """Benford first_digit builds its scale by parsing '1e<mag>' (never
    pow): negative magnitudes like 10^-2 are not exactly representable
    and Java/libm pow land an ulp apart, which can flip floor(d0) on an
    exact-integer quotient (same class as the r15 sig() tie bug)."""
    from spark_df_profiling_spark.operators.outliers import first_digit
    vals = [0.02, 0.07, 0.001, 100.0, 999.99, 123.456, 1.0, 9.999,
            0.999999, -250.0, 0.0, None]
    want = [2, 7, 1, 1, 9, 1, 1, 9, 9, 2, None, None]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [r.d for r in
           df.select(first_digit(F.col("v")).alias("d")).collect()]
    assert got == want


def test_correlation_matrix_backtick_names(spark):
    """Declarative correlation path must survive caller-supplied column
    names containing backticks/spaces (ADVICE r15): names are renamed
    positionally before any SQL interpolation."""
    from spark_df_profiling_spark.operators.correlation import (
        correlation_matrix)
    rows = [(float(i), float(2 * i + 1), float(10 - i)) for i in range(20)]
    df = spark.createDataFrame(rows, ["plain", "x", "y"]) \
        .withColumnRenamed("x", "a`b").withColumnRenamed("y", "c d")
    out = correlation_matrix(df, ["plain", "a`b", "c d"])
    assert out[("plain", "a`b")] == pytest.approx(1.0)
    assert out[("plain", "c d")] == pytest.approx(-1.0)
    assert out[("a`b", "c d")] == pytest.approx(-1.0)


def test_minhash_persist_release_handle(spark):
    """minhash_candidates exposes the persisted feature frame so callers
    can release the cache after materializing (ADVICE r15: it otherwise
    lives until session end)."""
    from spark_df_profiling_spark.operators.dedup import minhash_candidates
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog number %d" % (i % 3))
         for i in range(30)], ["doc_id", "text"])
    out = minhash_candidates(docs, "text", "doc_id",
                             jaccard_max_distance=0.5)
    out.count()  # materialize
    feats = getattr(out, "_minhash_features", None)
    assert feats is not None and feats.is_cached
    feats.unpersist()
    assert not feats.is_cached
    # opt-out path carries no handle
    out2 = minhash_candidates(docs, "text", "doc_id",
                              jaccard_max_distance=0.5,
                              persist_features=False)
    assert getattr(out2, "_minhash_features", None) is None

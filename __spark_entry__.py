"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship profile of sf0.001 lineitem (smoke check).
``queries()``/``oracle_sql()`` — per-operator correctness pairs vs DuckDB,
run by the driver at sf0.01 (row-count + schema + value-hash compare).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full profile of sf0.001 lineitem → one row per column."""
    from spark_df_profiling_spark import profile
    from spark_df_profiling_spark.config import EXACT_CONFIG

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    return profile(df, EXACT_CONFIG)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from spark_df_profiling_spark.oracle import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry."""
    from spark_df_profiling_spark.oracle import ORACLE_SQL

    return dict(ORACLE_SQL)

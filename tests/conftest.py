import tempfile

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        # saveAsTable (bucketed-sink tests) needs a warehouse; keep it
        # out of the repo tree (static conf — must be set at creation)
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp())
        .config("spark.sql.adaptive.enabled", "true")
        # events.parquet is TIMESTAMP(NANOS); without this every read of
        # it throws PARQUET_TYPE_ILLEGAL.  Set here (not in individual
        # test files) so single-file pytest runs don't depend on another
        # file having set it first on the shared session.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .appName("spark-df-profiling-tests")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")

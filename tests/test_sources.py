"""Source/sink connectors: format round-trips + profile sink."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark import profile
from spark_df_profiling_spark.sources import (
    load_all, load_table, read_any, write_profile)


def test_load_table_and_all(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    assert li.count() == 6000
    tables = load_all(spark, sf_dir)
    assert set(tables) >= {"region", "nation", "customer", "lineitem",
                           "documents", "embeddings"}


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_format_roundtrip(spark, lineitem, fmt, tmp_path):
    src = lineitem.select("l_orderkey", "l_quantity", "l_returnflag") \
        .limit(100)
    path = os.path.join(str(tmp_path), f"rt.{fmt}")
    src.write.format(fmt).option("header", "true").save(path)
    back = read_any(spark, path, fmt=fmt)
    assert back.count() == 100
    # values survive (csv/json go through text, so compare after cast)
    a = src.agg(F.sum("l_orderkey"), F.sum("l_quantity")).collect()[0]
    b = back.select(
        F.col("l_orderkey").cast("long"),
        F.col("l_quantity").cast("double")) \
        .agg(F.sum("l_orderkey"), F.sum("l_quantity")).collect()[0]
    assert a[0] == b[0]
    assert a[1] == pytest.approx(b[1])


def test_profile_any_format(spark, lineitem, tmp_path):
    path = os.path.join(str(tmp_path), "li.csv")
    lineitem.limit(200).write.option("header", "true").csv(path)
    df = read_any(spark, path, fmt="csv")
    prof = profile(df)
    rows = {r["column"]: r for r in prof.collect()}
    # csv inferSchema keeps numerics numeric
    assert rows["l_extendedprice"]["type_class"] == "NUM"
    assert rows["l_returnflag"]["type_class"] == "CAT"


def test_write_profile_sink(spark, lineitem, tmp_path):
    prof = profile(lineitem)
    out = os.path.join(str(tmp_path), "profile_out")
    write_profile(prof, out)
    back = spark.read.parquet(out)
    assert back.count() == 11
    assert set(back.columns) == set(prof.columns)
    # histogram/freq nested structures survive the parquet round-trip
    r = {x["column"]: x for x in back.collect()}
    assert r["l_extendedprice"]["histogram"] is not None
    assert r["l_returnflag"]["freq"] is not None

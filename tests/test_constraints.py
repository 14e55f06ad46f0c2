"""Data-quality constraint checks (dbt-test / Deequ-style)."""

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators import constraints as C


@pytest.fixture(scope="module")
def messy(spark):
    return spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (2, "zz", None), (None, "a", 1.0)],
        "id long, cat string, x double")


def test_column_checks_one_pass(spark, messy):
    out = {r["check"]: r["n_violations"]
           for r in C.column_checks(messy, "messy", [
               C.not_null("id"),
               C.unique("id"),
               C.accepted_values("cat", ["a", "b"]),
               C.in_range("x", 0.0, 10.0),
           ]).collect()}
    assert out["not_null:id"] == 1          # the NULL id row
    assert out["unique:id"] == 1            # one surplus duplicate of 2
    assert out["accepted_values:cat"] == 1  # 'zz'
    assert out["in_range:x"] == 1           # 50.0 (NULL x not counted)


def test_column_checks_empty_df_zeroes(spark):
    empty = spark.createDataFrame([], "id long, x double")
    out = {r["check"]: r["n_violations"]
           for r in C.column_checks(empty, "t", [
               C.not_null("id"), C.in_range("x", 0, 1)]).collect()}
    assert out == {"not_null:id": 0, "in_range:x": 0}


def test_fk_orphans_and_suite(spark, messy):
    parent = spark.createDataFrame([(1,), (2,)], "pid long")
    fk = C.fk_orphans(messy, "id", parent, "pid", child_table="messy")
    row = fk.collect()[0]
    assert row["n_violations"] == 0  # NULL child keys are not orphans
    parent2 = spark.createDataFrame([(1,)], "pid long")
    fk2 = C.fk_orphans(messy, "id", parent2, "pid", child_table="messy")
    assert fk2.collect()[0]["n_violations"] == 2  # both id=2 rows
    suite = C.check_suite(
        fk2, C.column_checks(messy, "messy", [C.not_null("cat")]))
    got = {r["check"]: r["passed"] for r in suite.collect()}
    assert got["fk:id->pid"] is False
    assert got["not_null:cat"] is True


def test_checks_validate_inputs(spark, messy):
    with pytest.raises(ValueError, match="non-empty"):
        C.column_checks(messy, "t", [])
    with pytest.raises(ValueError, match="duplicate"):
        C.column_checks(messy, "t", [C.not_null("id"), C.not_null("id")])
    with pytest.raises(ValueError, match="at least one"):
        C.check_suite()

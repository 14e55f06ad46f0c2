"""Drop-in compatibility with the reference package surface.

A user of julioasotodv/spark-df-profiling v1.1.13 switches to this repo
by changing nothing: ``import spark_df_profiling`` keeps working.
"""

import pandas as pd
import pytest


def test_reference_import_and_report(lineitem, tmp_path):
    import spark_df_profiling

    report = spark_df_profiling.ProfileReport(
        lineitem, bins=10, sample=5, corr_reject=0.9)
    desc = report.get_description()
    assert set(desc) == {"table", "variables", "freq"}

    variables = desc["variables"]
    assert isinstance(variables, pd.DataFrame)
    assert set(variables.index) == set(lineitem.columns)
    # reference stat names, including the percent-style quantile labels
    for col in ("type", "count", "distinct_count", "mean", "std", "min",
                "max", "5%", "25%", "50%", "75%", "95%", "mad", "cv",
                "n_zeros", "top", "freq", "correlation"):
        assert col in variables.columns, col
    assert variables.loc["l_extendedprice", "type"] == "NUM"
    assert variables.loc["l_returnflag", "type"] == "CAT"
    assert variables.loc["l_shipdate", "type"] == "DATE"
    assert variables.loc["l_extendedprice", "count"] == 6000

    freq = desc["freq"]
    assert isinstance(freq["l_returnflag"], pd.Series)
    assert freq["l_returnflag"].sum() == 6000

    table = desc["table"]
    assert table["n"] == 6000
    assert table["nvar"] == 11
    assert table["NUM"] == 8

    assert report.get_rejected_variables(0.9) == []

    out = tmp_path / "ref_report.html"
    report.to_file(str(out))
    assert out.stat().st_size > 1000
    assert "Overview" in report.rendered_html()
    assert report._repr_html_()


def test_reference_base_describe(lineitem):
    from spark_df_profiling import base

    stats = base.describe(lineitem, bins=10, corr_reject=0.9)
    assert stats["variables"].loc["l_quantity", "type"] == "NUM"
    html = base.to_html(None, stats)
    assert "Overview" in html
    with pytest.raises(TypeError):
        base.to_html(None, {"wrong": 1})


def test_reference_error_contract(spark):
    from spark_df_profiling import base

    with pytest.raises(TypeError):
        base.describe("not a dataframe")
    with pytest.raises(ValueError):
        base.describe(spark.createDataFrame([], "a int"))

"""Report alerts, remaining FIXTURES.md Part B quirks, salted agg."""

import math

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark import ProfileReport, describe
from spark_df_profiling_spark.config import EXACT_CONFIG
from spark_df_profiling_spark.report import alerts_for, render_html


def test_skewness_alert_threshold(spark):
    # FIXTURES B.2 q_skew intent: heavy tail, skewness >> 20 -> alert.
    # (B.2's exp(12u) log-uniform only reaches skew ~2.9; a sparse-spike
    # distribution delivers the >20 regime deterministically.)
    n = 10000
    data = [(1e6 if i % 1000 == 0 else 1.0,) for i in range(n)]
    df = spark.createDataFrame(data, "q_skew double")
    res = describe(df, EXACT_CONFIG)
    row = res.variables.collect()[0].asDict(recursive=True)
    assert row["skewness"] > 20
    assert any("skewed" in a for a in alerts_for(row))


def test_zeros_alert_and_missing_alert(spark):
    data = [(0.0 if i % 5 < 3 else float(i),
             None if i % 10 < 3 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(data, "q_zeros60 double, q_null30 double")
    res = describe(df, EXACT_CONFIG)
    rows = {r["column"]: r.asDict(recursive=True)
            for r in res.variables.collect()}
    assert any("zeros" in a for a in alerts_for(rows["q_zeros60"]))
    assert any("missing" in a for a in alerts_for(rows["q_null30"]))


def test_high_cardinality_alert(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet") \
        if False else None
    # events needs nanos conf; build a high-card CAT column instead
    df = spark.createDataFrame(
        [(f"v{i % 80}",) for i in range(800)], "hc string")
    res = describe(df, EXACT_CONFIG)
    row = res.variables.collect()[0].asDict(recursive=True)
    assert row["type_class"] == "CAT"
    assert any("cardinality" in a for a in alerts_for(row))


def test_corr_alert_message(spark):
    data = [(float(i), 2.0 * i + 0.001 * ((i * 7) % 13)) for i in range(500)]
    df = spark.createDataFrame(data, "cx double, cy double")
    res = describe(df, EXACT_CONFIG)
    rows = {r["column"]: r.asDict(recursive=True)
            for r in res.variables.collect()}
    msgs = alerts_for(rows["cy"])
    assert any("correlated with cx" in a for a in msgs)


def test_render_html_contains_sections(spark, lineitem):
    rep = ProfileReport(lineitem.limit(500))
    html = rep.rendered_html()
    for frag in ("Overview", "Variables", "Sample", "l_extendedprice",
                 "l_shipdate", "<table"):
        assert frag in html
    assert rep._repr_html_() in html or "Overview" in rep._repr_html_()


def test_bigint_edge_sums(spark):
    # FIXTURES B.2 q_bigint_edge: int64 extremes; engine sums in double
    # (Spark 4 ANSI would raise on bigint overflow)
    lo, hi = -(2**63), 2**63 - 1
    data = [(lo + i,) for i in range(10)] + [(hi - i,) for i in range(10)]
    df = spark.createDataFrame(data, "q_bigint_edge bigint")
    res = describe(df, EXACT_CONFIG)
    row = res.variables.collect()[0]
    assert row["min_num"] == pytest.approx(float(lo), rel=1e-12)
    assert row["max_num"] == pytest.approx(float(hi), rel=1e-12)
    # sums run in DOUBLE (exact int64 sum would overflow and, under
    # Spark 4 ANSI, raise) — so the expectation is the double-domain sum,
    # where the ±i offsets vanish below resolution at 9.2e18
    assert row["sum_value"] == pytest.approx(
        sum(float(v) for (v,) in data), abs=1e4)


def test_salted_agg_matches_plain(spark, lineitem):
    from spark_df_profiling_spark.operators.groupby import salted_agg
    got = {r["l_returnflag"]: (r["cnt"], r["sum_value"])
           for r in salted_agg(lineitem, "l_returnflag",
                               "l_extendedprice").collect()}
    want = {r["l_returnflag"]: (r["cnt"], r["s"])
            for r in lineitem.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum(F.col("l_extendedprice").cast("double")).alias("s"))
            .collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-9)


def test_templated_report_layout_markers(spark, lineitem):
    # reference template-registry parity: section/classes from the
    # jinja2 templates must appear in the rendered document
    rep = ProfileReport(lineitem.limit(500))
    h = rep.rendered_html()
    for frag in ("Dataset info", "Variables types", "df-profiling-report",
                 "freq-table", "mini-hist", "stats-table", "variablerow",
                 "5-th percentile", "sample-table", 'id="overview"',
                 'id="variables"', 'id="sample"'):
        assert frag in h, f"missing layout marker: {frag}"


def test_freq_table_other_and_missing_buckets(spark):
    # C3/C4: >10 distinct values -> "Other values (k)" row; nulls ->
    # "(Missing)" row — both in the rendered freq table
    import re
    data = [(f"v{i % 25}" if i % 7 else None,) for i in range(700)]
    df = spark.createDataFrame(data, "hc string")
    h = ProfileReport(df).html()
    # distinct_count is HLL-approximate by default, so the bucket's
    # "(k)" label can wobble around 15 — assert the row exists
    assert re.search(r"Other values \(1[2-9]\)", h)
    assert "(Missing)" in h


def test_report_fallback_renderer(spark, lineitem, monkeypatch):
    # without jinja2 the string-builder fallback must produce the same
    # sections (import-gated dependency, reference treats jinja2 as hard)
    from spark_df_profiling_spark.report import templates as TPL
    monkeypatch.setattr(TPL, "_ENV", None)
    rep = ProfileReport(lineitem.limit(200))
    h = rep.rendered_html()
    for frag in ("Overview", "Variables", "Sample", "l_extendedprice"):
        assert frag in h


# --- data-URI PNG mini-histograms (reference base.py::mini_histogram) ------

def test_png_hist_is_valid_and_deterministic():
    import base64
    import struct
    import zlib

    from spark_df_profiling_spark.report.png_hist import (
        png_data_uri, render_png)

    counts = [0, 3, 10, 7, 1]
    png = render_png(counts, height=60, bar_width=14, gap=2)
    assert png.startswith(b"\x89PNG\r\n\x1a\n")
    # IHDR: width = 5*14 + 4*2, height = 60, 8-bit RGBA
    w, h, depth, ctype = struct.unpack(">IIBB", png[16:26])
    assert (w, h, depth, ctype) == (5 * 14 + 4 * 2, 60, 8, 6)
    # decode scanlines (filter 0) and probe pixels
    idat_start = png.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", png[idat_start - 8:idat_start - 4])[0]
    raw = zlib.decompress(png[idat_start:idat_start + idat_len])
    stride = 1 + 4 * w

    def px(x, y):
        o = y * stride + 1 + 4 * x
        return tuple(raw[o:o + 4])

    bar = (0x33, 0x7A, 0xB7, 0xFF)
    assert px(7, 59) == (0, 0, 0, 0)        # zero-count bin: empty column
    assert px(16 + 7, 59) == bar            # bin with count 3: bottom on
    assert px(2 * 16 + 7, 0) == bar        # peak bin reaches the top row
    assert px(16 + 7, 0) == (0, 0, 0, 0)    # short bar: top row off
    assert render_png(counts) == png        # deterministic
    uri = png_data_uri(counts)
    assert uri.startswith("data:image/png;base64,")
    assert base64.b64decode(uri.split(",", 1)[1]) == png
    with pytest.raises(ValueError):
        render_png([])
    with pytest.raises(ValueError):
        render_png([3, -1])


def test_report_embeds_png_histogram(spark, lineitem):
    from spark_df_profiling_spark import ProfileReport
    html = ProfileReport(lineitem.limit(500)).rendered_html()
    assert "data:image/png;base64," in html

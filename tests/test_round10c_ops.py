"""Round-10 session-3 operators: Fellegi-Sunter linkage scoring."""
from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.dedup import (
    field_u_probs, linkage_score_pairs)


@pytest.fixture(scope="module")
def fs_records(spark):
    # lang: 3x a, 2x b, 1 null  -> u over non-null = (9+4)/25
    # city: 2x x, 2x y, 2x z    -> u = 12/36 = 1/3
    rows = [(1, "a", "x"), (2, "a", "x"), (3, "a", "y"),
            (4, "b", "y"), (5, "b", "z"), (6, None, "z")]
    return spark.createDataFrame(rows, "id long, lang string, city string")


@pytest.fixture(scope="module")
def fs_pairs(spark):
    rows = [(1, 2), (1, 4), (2, 6), (3, 4)]
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_field_u_probs(fs_records):
    u = field_u_probs(fs_records, ["lang", "city"])
    assert u["lang"] == pytest.approx(13 / 25)
    assert u["city"] == pytest.approx(1 / 3)


def test_linkage_scores_match_closed_form(fs_records, fs_pairs):
    out = linkage_score_pairs(fs_records, fs_pairs, "id",
                              ["lang", "city"], m=0.9)
    rows = {(r.id_a, r.id_b): r for r in out.collect()}
    u_lang, u_city = 13 / 25, 1 / 3
    wa_l, wd_l = math.log2(0.9 / u_lang), math.log2(0.1 / (1 - u_lang))
    wa_c, wd_c = math.log2(0.9 / u_city), math.log2(0.1 / (1 - u_city))
    # (1,2): lang agree, city agree
    assert rows[(1, 2)].fs_score == pytest.approx(wa_l + wa_c)
    assert (rows[(1, 2)].agree_lang, rows[(1, 2)].agree_city) == (1, 1)
    # (1,4): lang differ, city differ
    assert rows[(1, 4)].fs_score == pytest.approx(wd_l + wd_c)
    assert (rows[(1, 4)].agree_lang, rows[(1, 4)].agree_city) == (0, 0)
    # (2,6): lang null on one side -> neutral 0; city differ
    assert rows[(2, 6)].fs_score == pytest.approx(wd_c)
    assert rows[(2, 6)].agree_lang is None
    # (3,4): lang differ, city agree
    assert rows[(3, 4)].fs_score == pytest.approx(wd_l + wa_c)


def test_linkage_explicit_u_and_validation(fs_records, fs_pairs):
    out = linkage_score_pairs(fs_records, fs_pairs, "id", ["lang"],
                              m=0.8, u={"lang": 0.25})
    r12 = {(r.id_a, r.id_b): r.fs_score for r in out.collect()}[(1, 2)]
    assert r12 == pytest.approx(math.log2(0.8 / 0.25))
    with pytest.raises(ValueError):
        linkage_score_pairs(fs_records, fs_pairs, "id", [], m=0.9)
    with pytest.raises(ValueError):
        linkage_score_pairs(fs_records, fs_pairs, "id", ["lang"], m=1.5)
    with pytest.raises(ValueError):
        linkage_score_pairs(fs_records, fs_pairs, "id", ["lang"],
                            m=0.9, u={"lang": 0.0})
    with pytest.raises(ValueError):
        linkage_score_pairs(fs_records, fs_pairs, "id", ["nope"], m=0.9)


def test_linkage_u_estimation_is_lazy_frame_scale(fs_records, fs_pairs):
    # u estimation collects O(#fields) scalars; the scored frame itself
    # stays unevaluated until an action
    out = linkage_score_pairs(fs_records, fs_pairs, "id",
                              ["lang", "city"])
    assert set(out.columns) == {"id_a", "id_b", "agree_lang",
                                "agree_city", "fs_score"}


def test_linkage_all_null_field_rejected(spark, fs_pairs):
    rec = spark.createDataFrame(
        [(1, None), (2, None), (4, None), (3, None), (6, None)],
        "id long, lang string")
    with pytest.raises(ValueError):
        linkage_score_pairs(rec, fs_pairs, "id", ["lang"])


# ---------------------------------------- SNM frozen-boundary regression
from spark_df_profiling_spark.operators.dedup import (
    sorted_neighborhood_pairs)


def test_snm_exact_pair_count_at_scale(spark):
    # r10 rehearsal regression: repartitionByRange re-samples its
    # boundaries per execution, so the driver offset map built from the
    # counts job went stale for the pairing job — global ranks collided
    # and the pair count drifted ~5% off (and differed run to run).
    # With the localCheckpoint freeze the count is EXACTLY 3n-6 for
    # window=3 (rank r pairs with r+1..r+3, truncated at the end), even
    # with a 50%-tie sort key spread over many range partitions.
    n = 50_000
    df = (spark.range(n)
          .select(F.col("id").alias("doc_id"),
                  F.when(F.col("id") % 2 == 0, F.lit("hot"))
                  .otherwise((F.col("id") % 997).cast("string"))
                  .alias("k")))
    out = sorted_neighborhood_pairs(df, "doc_id", "k", window=3,
                                    n_partitions=32)
    assert out.count() == 3 * n - 6
    # and the output is identical across two separate actions
    assert out.count() == 3 * n - 6


def test_snm_global_ranks_unique_at_scale(spark):
    # distinct (id_a, dist=1) successors == n-1 rows exactly iff the
    # global rank is a permutation (duplicated ranks create fan-out)
    n = 20_000
    df = (spark.range(n)
          .select(F.col("id").alias("doc_id"),
                  (F.col("id") % 13).cast("string").alias("k")))
    d1 = (sorted_neighborhood_pairs(df, "doc_id", "k", window=1,
                                    n_partitions=16))
    assert d1.count() == n - 1
    assert d1.select("id_a").distinct().count() == n - 1

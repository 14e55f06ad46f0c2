"""Sequence packing: distributed prefix-sum shard assignment."""

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.packing import (
    pack_offsets, shard_summary)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text",
                    F.size(F.split("text", " ")).alias("ntok")))


def test_offsets_match_driver_reference(spark, docs):
    rows = docs.select("doc_id", "ntok").collect()
    acc, want = 0, {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        want[r["doc_id"]] = acc
        acc += r["ntok"]
    got = {r["doc_id"]: (r["start_offset"], r["end_offset"], r["shard_id"])
           for r in pack_offsets(docs, "ntok", "doc_id", 512).collect()}
    assert len(got) == len(want)
    for did, start in want.items():
        s, e, sh = got[did]
        assert s == start
        assert sh == start // 512


def test_offsets_invariant_to_bucket_count(spark, docs):
    a = {r["doc_id"]: r["start_offset"]
         for r in pack_offsets(docs, "ntok", "doc_id", 512,
                               num_buckets=1).collect()}
    b = {r["doc_id"]: r["start_offset"]
         for r in pack_offsets(docs, "ntok", "doc_id", 512,
                               num_buckets=7).collect()}
    c = {r["doc_id"]: r["start_offset"]
         for r in pack_offsets(docs, "ntok", "doc_id", 512,
                               num_buckets=64).collect()}
    assert a == b == c  # shard layout is a pure function of the order


def test_shard_summary_covers_stream_contiguously(spark, docs):
    summ = shard_summary(docs, "ntok", "doc_id", 2048).collect()
    assert summ[0]["first_offset"] == 0
    total = docs.agg(F.sum("ntok")).collect()[0][0]
    assert summ[-1]["last_offset"] == total
    # every doc starts in the shard covering its offset: first_offset of
    # shard s is >= s*2048 and < (s+1)*2048
    for r in summ:
        assert r["shard_id"] * 2048 <= r["first_offset"]
        assert r["first_offset"] < (r["shard_id"] + 1) * 2048
    assert sum(r["n_docs"] for r in summ) == docs.count()


def test_offsets_stable_across_reexecution(spark, docs):
    # The plan behind pack_offsets is executed once for the per-partition
    # totals collect and once per caller action.  repartitionByRange
    # samples its boundaries, so without the localCheckpoint the two
    # executions could disagree on partition assignment and corrupt the
    # prefix map.  A nondeterministic upstream (sample without a fixed
    # per-partition order) plus two separate collects of the SAME result
    # DataFrame must agree exactly.
    wobbly = docs.sample(fraction=0.9, seed=7)
    out = pack_offsets(wobbly, "ntok", "doc_id", 512)
    first = {r["doc_id"]: (r["start_offset"], r["end_offset"], r["shard_id"])
             for r in out.collect()}
    second = {r["doc_id"]: (r["start_offset"], r["end_offset"], r["shard_id"])
              for r in out.collect()}
    assert first == second
    # and a fresh invocation over the same input reproduces it too
    again = {r["doc_id"]: (r["start_offset"], r["end_offset"], r["shard_id"])
             for r in pack_offsets(wobbly, "ntok", "doc_id", 512).collect()}
    assert first == again


def test_pack_null_order_raises(spark):
    df = spark.createDataFrame(
        [(1, 10), (None, 5)], "oid int, ntok int")
    with pytest.raises(Exception, match="concatenation order"):
        pack_offsets(df, "ntok", "oid", 100).collect()
    with pytest.raises(ValueError, match="context_len"):
        pack_offsets(df, "ntok", "oid", 0)

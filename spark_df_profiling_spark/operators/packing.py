"""Sequence packing: assign documents to training shards by token budget.

The pretraining data layout step: documents are concatenated in a
deterministic global order and the token stream is chunked into
fixed-size context windows; a document's shard is decided by its START
OFFSET in the concatenated stream (documents may straddle a boundary —
exactly what GPT-style packing does to the token stream).  Computing the
start offset is an exact global prefix sum, which is where naive Spark
goes wrong: ``Window.orderBy(...)`` without ``partitionBy`` collapses
the whole table into ONE task ("No Partition Defined for Window" — the
single-partition bottleneck that cannot survive 100 TB).

Scale design — the textbook distributed scan, three cheap steps:

1. ``repartitionByRange(order_col)`` + in-partition sort: ranges are
   assigned to partitions in sorted order, so partition ids follow the
   global order;
2. per-partition token totals (one tiny aggregate, O(#partitions) rows)
   are prefix-summed on the DRIVER — state, not data — and broadcast
   back;
3. the in-partition running sum (window partitioned by partition id —
   parallel) plus the partition's prefix offset is the exact global
   cumulative sum.

The result depends only on ``order_col`` order, not on where the range
boundaries happen to fall, so retries/AQE re-plans cannot change shard
assignment (same determinism contract as ``operators/sampling.py``).
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(df: DataFrame, tokens_col: Union[str, Column],
                 order_col: str, context_len: int,
                 num_buckets: Optional[int] = None) -> DataFrame:
    """Global start/end offsets + shard id for each document.

    Returns the input columns plus ``start_offset`` (tokens before this
    document in the concatenated stream), ``end_offset`` and
    ``shard_id`` (= ``start_offset div context_len``).  ``order_col``
    must be unique and non-null (it defines the concatenation order);
    NULL-order rows raise.  ``tokens_col`` may be a column name or an
    expression (e.g. :func:`operators.text.n_tokens_bpe`).
    """
    if context_len < 1:
        raise ValueError(f"context_len must be >= 1: {context_len}")
    spark = df.sparkSession
    toks = (F.col(tokens_col) if isinstance(tokens_col, str)
            else tokens_col).cast("long")
    n = int(num_buckets
            or spark.conf.get("spark.sql.shuffle.partitions", "32"))

    null_guard = F.when(
        F.col(order_col).isNull(),
        F.raise_error(F.lit(
            f"pack_offsets: NULL in order column {order_col!r} — the "
            f"concatenation order must be total"))).otherwise(
        F.col(order_col))
    ranged = (df.withColumn(order_col, null_guard)
              .withColumn("__tk", toks)
              .repartitionByRange(n, F.col(order_col))
              .withColumn("__pid", F.spark_partition_id()))
    # ``ranged`` feeds TWO actions (the totals collect below and the
    # caller's final job).  repartitionByRange picks its boundaries by
    # SAMPLING, which Spark documents as potentially different across
    # re-executions — if the second job drew new boundaries, rows would
    # move between ``__pid``s and the driver-built prefix map would be
    # silently stale.  localCheckpoint materializes the partitions once
    # so both actions read the SAME frozen ``__pid`` assignment (and the
    # second pass skips the re-shuffle); block loss fails loudly instead
    # of recomputing with fresh boundaries, matching the repo's
    # loud-failure philosophy.
    ranged = ranged.localCheckpoint(eager=True)

    # per-partition totals -> driver prefix sum (O(#partitions) rows)
    totals = {r["__pid"]: r["__t"] for r in
              ranged.groupBy("__pid").agg(F.sum("__tk").alias("__t"))
              .collect()}
    prefix, acc = [], 0
    for pid in sorted(totals):
        prefix.append((pid, acc))
        acc += totals[pid] or 0
    pref_df = spark.createDataFrame(
        prefix or [(0, 0)], "__pid int, __pref long")

    w = Window.partitionBy("__pid").orderBy(order_col)
    out = (ranged.join(F.broadcast(pref_df), "__pid")
           .withColumn("start_offset",
                       F.sum("__tk").over(w) - F.col("__tk")
                       + F.col("__pref"))
           .withColumn("end_offset", F.col("start_offset") + F.col("__tk"))
           .withColumn("shard_id",
                       F.floor(F.col("start_offset")
                               / F.lit(context_len)).cast("long")))
    return out.drop("__pid", "__pref", "__tk")


def shard_summary(df: DataFrame, tokens_col: Union[str, Column],
                  order_col: str, context_len: int,
                  num_buckets: Optional[int] = None) -> DataFrame:
    """Per-shard audit of a packing: docs starting in each shard, their
    token total, and offset range — the post-packing sanity check a
    pipeline runs before writing shards."""
    packed = pack_offsets(df, tokens_col, order_col, context_len,
                          num_buckets)
    return (packed.groupBy("shard_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.sum("end_offset") - F.sum("start_offset"))
                 .alias("total_tokens"),
                 F.min("start_offset").alias("first_offset"),
                 F.max("end_offset").alias("last_offset"))
            .orderBy("shard_id"))

"""SparkSession builder with the engine's scale-tuned defaults.

One place for the conf story this repo's operators assume, so pipelines
don't re-derive it.  Everything here is standard OSS Spark conf:

* AQE on (runtime coalescing + skew-join splitting) — the safety net
  for every groupBy/join in the operators;
* shuffle partitions sized by cluster parallelism, not the 200 default
  (AQE coalesces down, so err high at scale);
* Arrow enabled for the few mapInPandas paths (multimodal, stateful
  streaming) with a bounded per-batch row count;
* ANSI mode stays ON (Spark 4 default) — the operators are written to
  be ANSI-safe (double sums, guarded divisions) rather than relying on
  silent overflow.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_session(app_name: str = "spark-df-profiling",
                  master: str | None = None,
                  shuffle_partitions: int | None = None,
                  arrow_batch_rows: int = 5_000,
                  extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Tuned session: AQE + skew handling + Arrow batching.

    ``shuffle_partitions`` defaults to 2x the default parallelism
    (cores on local; executor slots on a cluster) — enough tasks to
    keep partitions under executor memory at large inputs, while AQE
    coalesces the surplus for small stages.
    """
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    b = (b
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                 str(arrow_batch_rows))
         .config("spark.sql.parquet.filterPushdown", "true")
         # runtime join pruning: inject a bloom filter built from the
         # filtered small side into the big side's scan (big-big joins
         # where one side is selectively filtered — the 100 TB case
         # static pushdown can't see).  Explicit because deployments
         # still on 3.x defaults have it off.
         .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
         .config("spark.sql.optimizer.runtime.bloomFilter."
                 "creationSideThreshold", "100MB")
         .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    if shuffle_partitions is None:
        shuffle_partitions = 2 * spark.sparkContext.defaultParallelism
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark

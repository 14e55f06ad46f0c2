"""Time-series joins the reference lacks: as-of join and range join.

North-star extensions (SURVEY §2.9): the reference has no joins at all
(`SURVEY.md §2.9 "joins: none"`), but a 100 TB event pipeline needs the
two classic time joins that plain equi-join can't express:

* **as-of join** — for each left row, the latest right row with
  ``right.ts <= left.ts`` in the same key group (trades/quotes,
  click-attribution).  A naive implementation is a range self-join
  (quadratic in events-per-key); ours is union + one window pass:
  a single shuffle on the key, linear work per partition — the plan a
  sort-merge as-of join would produce natively.
* **range join** — match points to (possibly overlapping) intervals.
  Pure inequality predicates force BroadcastNestedLoopJoin (every point
  × every interval).  ``range_join_buckets`` converts it to an
  *equi-join* on a bucket id: intervals explode into the fixed-width
  buckets they overlap, points hash to exactly one bucket, then an
  ordinary (broadcast-able) hash join + residual filter.  Work is
  O(points + intervals × span/width) instead of O(points × intervals).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame,
              on: Union[str, Sequence[str]],
              left_ts: str = "ts", right_ts: Optional[str] = None,
              direction: str = "backward",
              tolerance: Optional[int] = None,
              right_prefix: str = "r_") -> DataFrame:
    """As-of join: latest (backward) / earliest (forward) right row per key.

    Semantics match DuckDB/pandas ``ASOF JOIN``: backward keeps, for each
    left row, the right row with the greatest ``right_ts <= left_ts``
    (ties on the timestamp include the right row); forward the smallest
    ``right_ts >= left_ts``.  Unmatched left rows keep NULL right fields
    (left-outer).  ``tolerance`` (same units as the ts columns) nulls out
    matches further away than the given gap.

    Scale design: both sides are unioned with a side marker and windowed
    once — ONE shuffle on ``on`` + in-partition sort, no range-join blowup
    when a key has many rows on both sides.  Right payload travels as a
    single struct so ``last(ignorenulls)`` picks whole rows atomically
    (per-column lasts would blend different right rows when payload
    fields are legitimately NULL).

    The ts columns keep their native type (no double cast — int64
    epoch-nanos exceed double's 2^53 exact range); ``tolerance`` needs a
    numeric ts column (convert timestamps to epoch first).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    out_cols = [right_prefix + c for c in payload]
    clash = set(out_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_prefix collides with left columns: {clash}")

    rstruct = F.struct(F.col(right_ts).alias("__rts"),
                       *[F.col(c) for c in payload])
    l2 = left.select(*[F.col(c) for c in left.columns],
                     F.col(left_ts).alias("__ts"),
                     F.lit(1).alias("__side"),
                     F.lit(None).cast(
                         right.select(rstruct).schema[0].dataType
                         .simpleString()).alias("__r"))
    r2 = right.select(*[F.col(k) for k in keys],
                      *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
                        for c in left.columns if c not in keys],
                      F.col(right_ts).alias("__ts"),
                      F.lit(0).alias("__side"),
                      rstruct.alias("__r")).select(*l2.columns)

    # at equal ts the right row must sort first so the left row sees it
    # (ASOF's >= / <= is inclusive) — side 0 < 1 handles both directions
    order = ([F.asc("__ts"), F.asc("__side")] if direction == "backward"
             else [F.desc("__ts"), F.asc("__side")])
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (l2.unionByName(r2)
               .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
               .where(F.col("__side") == 1))
    if tolerance is not None:
        gap = (F.col("__ts") - F.col("__m.__rts") if direction == "backward"
               else F.col("__m.__rts") - F.col("__ts"))
        matched = matched.withColumn(
            "__m", F.when(gap <= F.lit(tolerance), F.col("__m")))
    return matched.select(
        *[F.col(c) for c in left.columns],
        F.col("__m.__rts").alias(right_prefix + right_ts),
        *[F.col(f"__m.{c}").alias(right_prefix + c) for c in payload])


def range_join_buckets(points: DataFrame, intervals: DataFrame,
                       point_col: str, start_col: str, end_col: str,
                       bucket_width: float,
                       broadcast_intervals: bool = True) -> DataFrame:
    """Inner range join: point ∈ [start, end) — as a bucketed equi-join.

    Each interval explodes into every fixed-width bucket it overlaps;
    each point maps to exactly one bucket; matching becomes a hash join
    on the bucket id plus a residual filter — instead of the
    BroadcastNestedLoopJoin Spark plans for a bare inequality join.
    Pick ``bucket_width`` ≈ the typical interval length: wider wastes
    the residual filter, narrower multiplies the interval explosion.
    Overlapping intervals are fine (a point matches each one it falls
    in, exactly once, since the point lives in a single bucket).
    """
    p = points.withColumn(
        "__bkt", F.floor(F.col(point_col).cast("double") / bucket_width))
    iv = intervals.withColumn("__bkt", F.explode(F.sequence(
        F.floor(F.col(start_col).cast("double") / bucket_width),
        # end is exclusive: the bucket containing `end` still overlaps
        # [start, end) unless end sits exactly on the bucket edge
        F.floor((F.col(end_col).cast("double") - 1e-9) / bucket_width))))
    if broadcast_intervals:
        iv = F.broadcast(iv)
    return (p.join(iv, "__bkt")
            .where((F.col(point_col) >= F.col(start_col))
                   & (F.col(point_col) < F.col(end_col)))
            .drop("__bkt"))

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
              right_prefix: str = "r_",
              time_bucket: Optional[float] = None) -> DataFrame:
    """As-of join: latest (backward) / earliest (forward) right row per key.

    Semantics match DuckDB/pandas ``ASOF JOIN``: backward keeps, for each
    left row, the right row with the greatest ``right_ts <= left_ts``
    (ties on the timestamp include the right row); forward the smallest
    ``right_ts >= left_ts``.  Unmatched left rows keep NULL right fields
    (left-outer).  ``tolerance`` (same units as the ts columns) nulls out
    matches further away than the given gap.  NULL timestamps never
    match (DuckDB/pandas behavior): right rows with NULL ts are dropped,
    left rows with NULL ts come back unmatched.

    Scale design: both sides are unioned with a side marker and windowed
    once — ONE shuffle on ``on`` + in-partition sort, no range-join blowup
    when a key has many rows on both sides.  Right payload travels as a
    single struct so ``last(ignorenulls)`` picks whole rows atomically
    (per-column lasts would blend different right rows when payload
    fields are legitimately NULL).

    ``time_bucket`` is the skew escape: a bare ``partitionBy(keys)``
    funnels a power-law key's entire history through one task.  When set
    (numeric ts columns only), rows are windowed per ``(key, coarse time
    bucket)`` instead, and a per-bucket carry table (one row per key ×
    bucket, cumulatively propagated) provides the cross-bucket match, so
    no task ever sees more than one hot-key bucket.  Same results,
    bounded partitions.

    The ts columns keep their native type (no double cast — int64
    epoch-nanos exceed double's 2^53 exact range); ``tolerance`` and
    ``time_bucket`` need a numeric ts column (convert timestamps to
    epoch first).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if time_bucket is not None and not time_bucket > 0:
        # 0 would divide-to-Infinity, negative inverts bucket order —
        # both produce silently wrong join output
        raise ValueError(f"time_bucket must be > 0: {time_bucket}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    out_cols = [right_prefix + c for c in payload]
    clash = set(out_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_prefix collides with left columns: {clash}")

    # NULL right timestamps must never become a match (they'd sort NULLS
    # FIRST under asc and shadow "no predecessor" with a real payload)
    right = right.where(F.col(right_ts).isNotNull())

    rstruct = F.struct(F.col(right_ts).alias("__rts"),
                       *[F.col(c) for c in payload])
    rtype = right.select(rstruct).schema[0].dataType
    l2 = left.select(*[F.col(c) for c in left.columns],
                     F.col(left_ts).alias("__ts"),
                     F.lit(1).alias("__side"),
                     F.lit(None).cast(rtype).alias("__r"))
    # DataType objects passed straight to cast (no simpleString round-trip
    # — DDL-unparseable column names would break it), fields from
    # left.schema so duplicate names don't collapse as they would in a dict
    r2 = right.select(*[F.col(k) for k in keys],
                      *[F.lit(None).cast(f.dataType).alias(f.name)
                        for f in left.schema.fields if f.name not in keys],
                      F.col(right_ts).alias("__ts"),
                      F.lit(0).alias("__side"),
                      rstruct.alias("__r")).select(*l2.columns)
    both = l2.unionByName(r2)

    # at equal ts the right row must sort first so the left row sees it
    # (ASOF's >= / <= is inclusive) — side 0 < 1 handles both directions.
    # carry rows (side -1, skew path) sort before everything in a bucket.
    backward = direction == "backward"
    if time_bucket is None:
        order = ([F.asc("__ts"), F.asc("__side")] if backward
                 else [F.desc("__ts"), F.asc("__side")])
        w = (Window.partitionBy(*keys).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        matched = (both
                   .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
                   .where(F.col("__side") == 1))
    else:
        ts_type = both.schema["__ts"].dataType.typeName()
        int_ts = (ts_type in ("long", "integer", "short", "byte")
                  and float(time_bucket).is_integer())
        if int_ts:
            # exact integer floor-division: int64 epoch-nanos exceed
            # double's 2^53 exact range, so the double path can
            # mis-bucket large timestamps.  `div` truncates toward
            # zero; aligning the numerator down to a bucket multiple
            # first makes it a true floor for negative ts too.
            tb = int(time_bucket)
            mod = f"(((__ts % {tb}) + {tb}) % {tb})"
            bkt = F.expr(f"(__ts - {mod}) div {tb}")
        else:
            bkt = F.floor(F.col("__ts").cast("double")
                          / F.lit(float(time_bucket)))
        both = both.withColumn("__bkt", bkt)
        # per-(key,bucket) best right row — the struct sorts by __rts first,
        # so max/min over it picks the latest/earliest right row atomically
        agg = (F.max("__r") if backward else F.min("__r")).alias("__lastr")
        per_bucket = (both.where(F.col("__side") == 0)
                      .groupBy(*keys, "__bkt").agg(agg))
        # cumulative carry: for each bucket either side touches, the best
        # right row from all STRICTLY earlier (backward) / later (forward)
        # buckets.  One row per (key, bucket) — tiny even for a hot key.
        all_buckets = both.select(*keys, "__bkt").distinct()
        corder = F.asc("__bkt") if backward else F.desc("__bkt")
        cw = (Window.partitionBy(*keys).orderBy(corder)
              .rowsBetween(Window.unboundedPreceding, -1))
        carries = (all_buckets
                   .join(per_bucket, [*keys, "__bkt"], "left")
                   .withColumn("__r", F.last("__lastr", ignorenulls=True)
                               .over(cw))
                   .where(F.col("__r").isNotNull())
                   .select(*keys, "__bkt",
                           *[F.lit(None).cast(f.dataType).alias(f.name)
                             for f in left.schema.fields
                             if f.name not in keys],
                           # carry sorts before any real row in its bucket:
                           # backward asc → ts = bucket start, side -1;
                           # forward desc → ts = bucket end, side -1
                           # (integer multiply on the int path — an
                           # inexact bkt*width above 2^53 could sort the
                           # carry AFTER real rows and drop its match)
                           ((F.col("__bkt") * F.lit(int(time_bucket))
                             + F.lit(0 if backward else int(time_bucket)))
                            if int_ts else
                            (F.col("__bkt").cast("double")
                             * F.lit(float(time_bucket))
                             + (F.lit(0.0) if backward
                                else F.lit(float(time_bucket)))))
                           .cast(both.schema["__ts"].dataType).alias("__ts"),
                           F.lit(-1).alias("__side"),
                           F.col("__r")).select(*both.columns))
        order = ([F.asc("__ts"), F.asc("__side")] if backward
                 else [F.desc("__ts"), F.asc("__side")])
        w = (Window.partitionBy(*keys, "__bkt").orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        matched = (both.unionByName(carries)
                   .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
                   .where(F.col("__side") == 1)
                   .drop("__bkt"))
    # a left row with NULL ts has no predecessor/successor by definition
    matched = matched.withColumn(
        "__m", F.when(F.col("__ts").isNotNull(), F.col("__m")))
    if tolerance is not None:
        gap = (F.col("__ts") - F.col("__m.__rts") if backward
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
    Degenerate intervals (``end <= start``) are dropped up front — they
    can match nothing, and an inverted ``sequence()`` would otherwise
    run DESCENDING and explode spurious buckets.
    """
    p = points.withColumn(
        "__bkt", F.floor(F.col(point_col).cast("double") / bucket_width))
    lo = F.floor(F.col(start_col).cast("double") / bucket_width)
    # end is exclusive: the bucket containing `end` still overlaps
    # [start, end) unless end sits exactly on the bucket edge.  Exact
    # edge test, not an epsilon — an epsilon is magnitude-dependent (a
    # no-op above ~4e6, e.g. epoch-micros data).
    e = F.col(end_col).cast("double")
    ebkt = F.floor(e / bucket_width)
    hi = F.when(e == ebkt * F.lit(float(bucket_width)), ebkt - 1) \
         .otherwise(ebkt)
    iv = (intervals
          .where(F.col(end_col) > F.col(start_col))
          .withColumn("__bkt", F.explode(
              F.sequence(lo, F.greatest(lo, hi)))))
    if broadcast_intervals:
        iv = F.broadcast(iv)
    return (p.join(iv, "__bkt")
            .where((F.col(point_col) >= F.col(start_col))
                   & (F.col(point_col) < F.col(end_col)))
            .drop("__bkt"))


def join_key_stats(left: DataFrame, right: DataFrame,
                   left_key: str, right_key: str | None = None
                   ) -> DataFrame:
    """Join-key health report — run this BEFORE a big join to predict
    whether it will explode, skew, or silently drop rows.

    Returns ONE row: ``(left_rows, right_rows, left_distinct,
    right_distinct, left_null_keys, right_null_keys, left_matched_rows,
    right_matched_rows, left_orphan_rows, right_orphan_rows,
    est_join_rows, max_left_fanout, max_right_fanout)``.

    * ``est_join_rows = Σ_k cnt_l(k)·cnt_r(k)`` is the EXACT inner-join
      output size — if it's 100× the inputs, the join is a disguised
      cross product and needs rethinking before it runs;
    * ``max_*_fanout`` is the hottest key's multiplicity on each side —
      the skew number AQE's skew-join splitting will have to absorb;
    * orphan counts quantify referential leakage in both directions
      (rows an inner join silently drops).

    Plan: one groupBy per side on the key (the same shuffle the real
    join would do, but reduced to count rows immediately — map-side
    partial agg collapses each key to one row per task), then a
    full-outer join of the two DISTINCT-KEY-sized count tables and one
    global aggregate.  NULL keys never join; they are counted
    separately and excluded from the key tables.

    ``est_join_rows`` is an exact BIGINT; under ANSI mode a join whose
    true output exceeds 2^63 rows raises on overflow instead of
    wrapping — which is itself the answer the report exists to give
    (that join must not run).
    """
    rk = right_key or left_key
    lc = (left.groupBy(F.col(left_key).alias("__k"))
          .agg(F.count(F.lit(1)).alias("__cl")))
    rc = (right.groupBy(F.col(rk).alias("__k"))
          .agg(F.count(F.lit(1)).alias("__cr")))
    lnull = lc.where(F.col("__k").isNull())
    rnull = rc.where(F.col("__k").isNull())
    merged = (lc.where(F.col("__k").isNotNull())
              .join(rc.where(F.col("__k").isNotNull()), "__k", "full"))
    core = merged.agg(
        F.sum("__cl").cast("long").alias("left_rows_nn"),
        F.sum("__cr").cast("long").alias("right_rows_nn"),
        F.count("__cl").cast("long").alias("left_distinct"),
        F.count("__cr").cast("long").alias("right_distinct"),
        F.sum(F.when(F.col("__cr").isNotNull(), F.col("__cl")))
        .cast("long").alias("left_matched_rows"),
        F.sum(F.when(F.col("__cl").isNotNull(), F.col("__cr")))
        .cast("long").alias("right_matched_rows"),
        F.sum(F.col("__cl") * F.col("__cr")).cast("long")
        .alias("est_join_rows"),
        F.max("__cl").cast("long").alias("max_left_fanout"),
        F.max("__cr").cast("long").alias("max_right_fanout"))
    ln = lnull.agg(F.coalesce(F.sum("__cl"), F.lit(0)).cast("long")
                   .alias("left_null_keys"))
    rn = rnull.agg(F.coalesce(F.sum("__cr"), F.lit(0)).cast("long")
                   .alias("right_null_keys"))
    out = core.crossJoin(F.broadcast(ln)).crossJoin(F.broadcast(rn))
    z = F.lit(0).cast("long")
    return out.select(
        (F.coalesce("left_rows_nn", z)
         + F.col("left_null_keys")).alias("left_rows"),
        (F.coalesce("right_rows_nn", z)
         + F.col("right_null_keys")).alias("right_rows"),
        F.coalesce("left_distinct", z).alias("left_distinct"),
        F.coalesce("right_distinct", z).alias("right_distinct"),
        "left_null_keys", "right_null_keys",
        F.coalesce("left_matched_rows", z).alias("left_matched_rows"),
        F.coalesce("right_matched_rows", z).alias("right_matched_rows"),
        (F.coalesce("left_rows_nn", z)
         - F.coalesce("left_matched_rows", z)
         + F.col("left_null_keys")).alias("left_orphan_rows"),
        (F.coalesce("right_rows_nn", z)
         - F.coalesce("right_matched_rows", z)
         + F.col("right_null_keys")).alias("right_orphan_rows"),
        F.coalesce("est_join_rows", z).alias("est_join_rows"),
        F.coalesce("max_left_fanout", z).alias("max_left_fanout"),
        F.coalesce("max_right_fanout", z).alias("max_right_fanout"))


def salted_join(big: DataFrame, small: DataFrame,
                on: Union[str, Sequence[str]],
                n_salts: int = 16, how: str = "inner",
                salt_on: Optional[Sequence[str]] = None) -> DataFrame:
    """Skew-defeating shuffle join: spread each hot key of ``big``
    across ``n_salts`` reducer tasks by joining on ``(key, salt)``,
    with the ``small`` side replicated once per salt value.

    The standard cure when ONE key holds a reducer-drowning share of
    the big side (``frequency.skew_report`` tells you exactly when:
    max_share_ppm x n_salts tasks' worth of one key) and the small
    side is too big — or the optimizer too constrained — to broadcast.
    AQE's skew-join split handles sort-merge cases adaptively; this
    operator is the DETERMINISTIC version for when the split must be
    guaranteed (AQE disabled, bucketed tables, or a streaming-batch
    plan where AQE cannot re-plan).  Results are bit-identical to the
    plain join for ``inner`` and ``left`` — every salt copy of a small
    row meets exactly the big rows assigned that salt.

    ``salt_on`` — columns of ``big`` whose hash assigns the salt
    (default: ALL columns).  Rows identical across ``salt_on`` land on
    the same salt, so pass columns that vary within the hot key (an
    id, a timestamp) for a real spread.

    Cost: ``small`` is shuffled x n_salts (its shuffle volume, not the
    big side's, scales with n_salts) — size n_salts to the fan-out the
    skew report demands, not higher.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1: {n_salts}")
    keys = [on] if isinstance(on, str) else list(on)
    salt_src = list(salt_on) if salt_on else list(big.columns)
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]),
                         F.lit(n_salts)).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int")
                                      for i in range(n_salts)])))
    return b.join(s, keys + ["__salt"], how).drop("__salt")


def merge_intervals(df: DataFrame, key_cols: "str | Sequence[str]",
                    start_col: str, end_col: str,
                    min_gap: float = 0) -> DataFrame:
    """Flatten overlapping (or near-adjacent) intervals per key into
    maximal disjoint spans — the classic interval-union: ad-spend
    windows, outage/on-call coverage, genome ranges, session stitches.

    Two intervals in the same key group merge when the later one starts
    at or before ``previous span end + min_gap`` (``min_gap=0`` merges
    touching intervals; with timestamp columns keep ``min_gap=0`` or
    cast to epoch first — the gap arithmetic needs a numeric type).

    Output: one row per merged span — key columns, ``span_start``,
    ``span_end``, ``n_merged`` (input intervals absorbed).  Rows with a
    NULL key, start, or end are dropped (an unbounded interval has no
    well-defined union; filter/impute upstream if they matter).
    Degenerate inputs (``end < start``) are clamped to points at
    ``start`` (``end = greatest(start, end)``) rather than raising —
    real event feeds contain clock skew, and a point still counts
    toward the span that covers it.

    Plan — the 100 TB shape: ONE shuffle on the key (window
    partitioning), two in-partition window passes (running max of
    ``end`` over preceding rows → new-span flag → running sum = span
    id), then a groupBy on (key, span id) that AQE satisfies without a
    second exchange since the grouping keys extend the window
    partitioning.  Never a global sort; never a driver collect.  Skewed
    keys (one key holding millions of intervals) serialize within one
    task — the same bound as any per-key ordered computation; split
    such keys upstream by coarse time range if needed.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if min_gap < 0:
        raise ValueError(
            f"min_gap must be >= 0: {min_gap} (a negative gap would "
            f"silently require overlap-by-at-least, a different "
            f"operator)")
    s, e = F.col(start_col), F.col(end_col)
    base = (df
            .where(s.isNotNull() & e.isNotNull())
            .dropna(subset=keys)
            .select(*keys, s.alias("__s"),
                    F.greatest(s, e).alias("__e")))
    w_prev = (Window.partitionBy(*keys).orderBy("__s", "__e")
              .rowsBetween(Window.unboundedPreceding, -1))
    w_run = (Window.partitionBy(*keys).orderBy("__s", "__e")
             .rowsBetween(Window.unboundedPreceding, 0))
    prev_end = F.max("__e").over(w_prev)
    if min_gap:
        opens = F.col("__s") > prev_end + F.lit(min_gap)
    else:
        opens = F.col("__s") > prev_end
    flagged = base.withColumn(
        "__new", F.when(prev_end.isNull() | opens, 1).otherwise(0))
    spans = flagged.withColumn("__span", F.sum("__new").over(w_run))
    return (spans.groupBy(*keys, "__span")
            .agg(F.min("__s").alias("span_start"),
                 F.max("__e").alias("span_end"),
                 F.count(F.lit(1)).alias("n_merged"))
            .drop("__span"))


def bloom_filtered_join(fact: DataFrame, dim: DataFrame,
                        fact_key: str, dim_key: "str | None" = None,
                        how: str = "inner",
                        m_bits: int = 1 << 20, k: int = 5,
                        state: "DataFrame | None" = None) -> DataFrame:
    """Shuffle-reduction join: drop fact rows whose key DEFINITELY
    has no dim partner (Bloom filter over the dim keys) BEFORE the
    join shuffle, then run the ordinary equi-join on the survivors.
    Bloom filters have no false negatives, so the result is
    bit-identical to the plain join — false positives only cost
    their own (wasted) shuffle, bounded by the fpp.

    The explicit, cross-run variant of Spark's runtime bloom-filter
    pushdown (``spark.sql.optimizer.runtime.bloomFilter.enabled``,
    which only fires under AQE with selective build sides it can
    prove): pass ``state`` — a persisted
    :func:`operators.dedup.bloom_state` over the dim keys, built once
    and merged day-2 like every sketch state in this repo — and the
    dim side isn't even scanned for filter construction.  When the
    dim fits the broadcast threshold a broadcast join already avoids
    the fact shuffle; this operator is for the regime where the dim
    is too big to broadcast but its KEY SET still prunes most of the
    fact (the ~KB Bloom state broadcasts where the dim cannot).

    ``how`` must be ``inner`` or ``left_semi`` — outer joins must
    keep non-matching fact rows, so pre-filtering would corrupt them
    (raises).  ``m_bits``/``k`` must match ``state`` when given.

    Scale: state build = one dim-key scan collapsing to <= m_bits/64
    rows (always broadcastable); the fact side pays one k-position
    md5 probe per DISTINCT key plus the (now smaller) join shuffle.
    """
    from spark_df_profiling_spark.operators.dedup import (
        bloom_might_contain, bloom_state)
    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            f"bloom_filtered_join: how must be inner/left_semi "
            f"(outer joins need the unmatched fact rows the filter "
            f"drops): {how!r}")
    dk = dim_key or fact_key
    if fact_key not in fact.columns:
        raise ValueError(f"fact missing column: {fact_key!r}")
    if dk not in dim.columns:
        raise ValueError(f"dim missing column: {dk!r}")
    if state is None:
        state = bloom_state(dim.select(dk), cols=[dk],
                            m_bits=m_bits, k=k)
    filtered = (bloom_might_contain(fact, state, cols=[fact_key],
                                    m_bits=m_bits, k=k,
                                    out_col="__bf_mc")
                .where(F.col("__bf_mc")).drop("__bf_mc"))
    if how == "inner":
        if dk == fact_key:
            return filtered.join(dim, on=fact_key, how="inner")
        # Frame-qualified refs: dim may also carry a column named
        # fact_key, which would make a bare F.col(fact_key) ambiguous.
        return filtered.join(dim, filtered[fact_key] == dim[dk],
                             "inner")
    return (filtered.join(dim.select(F.col(dk).alias(fact_key)),
                          on=fact_key, how="left_semi")
            .select(*fact.columns))  # on= reorders; restore fact order


def temporal_join(fact: DataFrame, dim: DataFrame,
                  fact_key: str, ts_col: str,
                  dim_key: "str | None" = None,
                  valid_from: str = "valid_from",
                  valid_to: str = "valid_to",
                  how: str = "left") -> DataFrame:
    """Point-in-time dimension lookup: join each fact row to the dim
    VERSION that was valid at the fact's timestamp —
    ``valid_from <= ts < valid_to`` with NULL ``valid_to`` = the open
    (current) version.  The query-side complement of
    :func:`operators.cdc.scd2_merge`: scd2_merge maintains the
    type-2 history, this consumes it ("which address did the customer
    have when the order shipped").

    ``ts_col`` and the validity bounds share one numeric timeline
    (epoch seconds/micros — the ``decayed_stats`` contract).  ``how``
    ∈ left (facts with no valid version keep NULL dim columns — e.g.
    a fact before the key's first version) / inner.  Dim columns keep
    their names; overlapping names (other than the key) raise — alias
    upstream.

    Scale: executes as an ordinary HASH equi-join on the key with the
    interval predicate as a residual filter — the fan-out before
    filtering is the key's version count (SCD2 dims: a handful), so
    this is strictly cheaper than a general range join; broadcast the
    dim when it fits.  With a well-formed SCD2 history (disjoint
    intervals per key — scd2_merge guarantees it) each fact matches
    at most one version; overlapping hand-built intervals would
    duplicate facts, which is the join's honest answer, not a bug.
    """
    dk = dim_key or fact_key
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left/inner: {how!r}")
    for c, frame, name in ((fact_key, fact, "fact"),
                           (ts_col, fact, "fact")):
        if c not in frame.columns:
            raise ValueError(f"{name} missing column: {c!r}")
    for c in (dk, valid_from, valid_to):
        if c not in dim.columns:
            raise ValueError(f"dim missing column: {c!r}")
    clash = (set(fact.columns) & set(dim.columns)) - {fact_key}
    if clash:
        raise ValueError(
            f"temporal_join: overlapping non-key columns "
            f"{sorted(clash)} — alias them upstream")
    t = fact[ts_col].cast("double")
    cond = ((fact[fact_key] == dim[dk])
            & (dim[valid_from].cast("double") <= t)
            & (dim[valid_to].cast("double").isNull()
               | (t < dim[valid_to].cast("double"))))
    out = fact.join(dim, cond, how)
    if dk == fact_key and dk in dim.columns:
        # both sides carry the key name; keep the fact's copy only
        out = out.drop(dim[dk])
    return out

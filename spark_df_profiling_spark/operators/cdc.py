"""Change-data-capture compaction and slowly-changing-dimension
history — the day-2 ingestion half of a training-data pipeline: a
crawler/exporter emits an append-only changelog (key, version,
attributes), and downstream wants either the LATEST state per key
(:func:`latest_snapshot`) or the full validity-interval history of
every attribute change (:func:`scd2_merge`, Kimball type-2).

The reference (julioasotodv/spark-df-profiling, ~900 LoC, profiling
only) has no mutation/versioning operators; these extend the engine
the way a 100 TB corpus is actually maintained — recrawls and
re-exports arrive as new versions of existing keys, and both the
"current corpus" view and the "what changed when" audit must be
derivable without rescanning history.

Scale design notes are per-function; the shared principles: one hash
shuffle on the entity key per operator, map-side-combined aggregates,
loud ``raise_error`` guards on contract violations (duplicate
versions, out-of-order updates) instead of silent corruption.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(x: "str | list[str]", what: str) -> list:
    out = [x] if isinstance(x, str) else list(x)
    if not out:
        raise ValueError(f"{what} must be non-empty")
    return out


def latest_snapshot(df: DataFrame, key_cols: "str | list[str]",
                    version_cols: "str | list[str]",
                    payload_cols: "list[str] | None" = None,
                    strict: bool = True) -> DataFrame:
    """Changelog compaction: ONE row per key — the row with the
    highest ``version_cols`` (compared lexicographically).  The
    materialize-the-current-corpus step over an append-only (key,
    version, payload) changelog.

    ``payload_cols`` defaults to every column that is neither key nor
    version.  With ``strict=True`` (default) a key holding two rows
    with the SAME version raises at execution time — "latest" is
    undefined there and silently picking one corrupts the snapshot;
    ``strict=False`` skips that check (and the distinct-count pass it
    costs) and breaks exact-version ties by the payload's struct
    ordering, which requires orderable payload types.

    Scale: ONE map-side-combined groupBy on the key — ``max_by`` keeps
    a single (version, payload) struct per key per upstream task, so a
    hot key arrives at the reducer as #tasks partials, not #rows.  No
    window, no join, no sort.  Output rows = #keys.
    """
    keys = _cols(key_cols, "key_cols")
    vers = _cols(version_cols, "version_cols")
    pay = (list(payload_cols) if payload_cols is not None
           else [c for c in df.columns if c not in keys + vers])
    for c in keys + vers + pay:
        if c not in df.columns:
            raise ValueError(f"column not in DataFrame: {c!r}")
    overlap = set(keys) & set(vers)
    if overlap:
        raise ValueError(f"key/version overlap: {sorted(overlap)}")
    carried = F.struct(*[F.col(c) for c in vers + pay])
    order = F.struct(*[F.col(c) for c in vers],
                     *[F.col(c) for c in pay])
    aggs = [F.max_by(carried, order).alias("__top"),
            F.count(F.lit(1)).alias("__n")]
    if strict:
        aggs.append(F.count_distinct(
            F.struct(*[F.col(c) for c in vers])).alias("__nv"))
    g = df.groupBy(*[F.col(c) for c in keys]).agg(*aggs)
    if strict:
        guard = F.when(
            F.col("__nv") != F.col("__n"),
            F.raise_error(F.concat(
                F.lit("latest_snapshot: duplicate version for key ("),
                F.concat_ws(",", *[F.col(c).cast("string")
                                   for c in keys]),
                F.lit(") — 'latest' is undefined; add a tiebreak "
                      "column to version_cols or pass strict=False"))))
        g = g.withColumn("__top", F.coalesce(guard.cast(
            g.schema["__top"].dataType), F.col("__top")))
    return g.select(*keys,
                    *[F.col(f"__top.{c}").alias(c) for c in vers + pay])


def scd2_merge(history: DataFrame, updates: DataFrame,
               key_cols: "str | list[str]",
               attr_cols: "str | list[str]",
               ts_col: str = "ts",
               valid_from_col: str = "valid_from",
               valid_to_col: str = "valid_to") -> DataFrame:
    """Apply an update batch to a type-2 slowly-changing dimension:
    every attribute CHANGE opens a new validity interval and closes
    the previous one (Kimball SCD2).  Handles multi-version batches —
    a key may change several times within one batch and each change
    becomes its own history row; consecutive updates with identical
    attributes collapse (no spurious versions).

    ``history`` carries ``key_cols + attr_cols + valid_from +
    valid_to`` (``valid_to`` NULL = the open/current row; closed rows
    pass through untouched).  ``updates`` carries ``key_cols +
    attr_cols + ts_col`` — ``ts_col`` is any orderable version
    (timestamp, sequence number).  Output: the merged history with an
    ``is_current`` flag (exactly one true row per live key).

    Loud-failure contract (all raise at execution time, never corrupt
    silently): a NULL ``ts_col``; two rows of one key sharing a
    version (order between them is undefined); an update at or before
    the open row's ``valid_from`` (out-of-order/backfill — rewriting
    closed intervals needs an explicit rebuild, not a merge).

    Scale: the apply is ONE hash shuffle on the key — open rows union
    the batch, then a single window pass (partitionBy key, orderBy
    version) computes the guards, the consecutive-change collapse
    (lag on the attr struct, null-safe), and the interval chain
    (lead); the post-collapse lead window reuses the same exchange
    and sort.  Closed history streams through unshuffled.  A hot key
    serializes in one task — the documented ordered-per-key bound
    shared with sessionize/rolling_stats.
    """
    keys = _cols(key_cols, "key_cols")
    attrs = _cols(attr_cols, "attr_cols")
    for c in keys + attrs + [ts_col]:
        if c not in updates.columns:
            raise ValueError(f"updates missing column: {c!r}")
    for c in keys + attrs + [valid_from_col, valid_to_col]:
        if c not in history.columns:
            raise ValueError(f"history missing column: {c!r}")
    closed = (history.where(F.col(valid_to_col).isNotNull())
              .select(*keys, *attrs,
                      F.col(valid_from_col), F.col(valid_to_col),
                      F.lit(False).alias("is_current")))
    base = (history.where(F.col(valid_to_col).isNull())
            .select(*keys, *attrs,
                    F.col(valid_from_col).alias("__ts"),
                    F.lit(1).alias("__base")))
    ups = updates.select(*keys, *attrs,
                         F.col(ts_col).alias("__ts"),
                         F.lit(0).alias("__base"))
    u = base.unionByName(ups)
    wk = Window.partitionBy(*keys).orderBy("__ts", "__base")
    lag_ts = F.lag("__ts").over(wk)
    key_str = F.concat_ws(",", *[F.col(c).cast("string") for c in keys])
    # all three contract guards ride the ONE window lag; the guarded
    # expression replaces __ts downstream so Catalyst cannot prune it
    guarded = (
        F.when(F.col("__ts").isNull(),
               F.raise_error(F.concat(
                   F.lit("scd2_merge: NULL version for key ("),
                   key_str, F.lit(")"))))
        .when(lag_ts.eqNullSafe(F.col("__ts")),
              F.raise_error(F.concat(
                  F.lit("scd2_merge: duplicate version for key ("),
                  key_str,
                  F.lit(") — change order is undefined"))))
        .when((F.col("__base") == 1) & lag_ts.isNotNull(),
              F.raise_error(F.concat(
                  F.lit("scd2_merge: update at or before the open "
                        "row's valid_from for key ("), key_str,
                  F.lit(") — out-of-order merge; rebuild instead"))))
        .otherwise(F.col("__ts")))
    astr = F.struct(*[F.col(c) for c in attrs])
    changed = (u.withColumn("__gts", guarded)
               .withColumn("__prev", F.lag(astr).over(wk))
               .where(F.col("__prev").isNull()
                      | ~F.col("__prev").eqNullSafe(astr)))
    lead_ts = F.lead("__gts").over(wk)
    fresh = changed.select(
        *keys, *attrs,
        F.col("__gts").alias(valid_from_col),
        lead_ts.alias(valid_to_col),
        lead_ts.isNull().alias("is_current"))
    return closed.unionByName(fresh)

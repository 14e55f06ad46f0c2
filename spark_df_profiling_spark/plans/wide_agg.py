"""Wide-agg plan: every per-column statistic in ONE Spark job.

The reference (``base.py::describe``, public v1.1.13) issues ~10-12 Spark
jobs *per column* (separate agg / percentile / mad / zeros / histogram /
distinct / count actions — SURVEY.md §2.3).  Here all pass-1 statistics for
*all* columns are flattened into a single ``df.agg(*exprs)``: Catalyst plans
it as one 2-phase HashAggregate (partial map-side + final), so the input is
scanned exactly once regardless of column count.

Scale notes (100 TB):
* Expression lists are chunked at ``cfg.max_agg_exprs`` to stay clear of
  whole-stage-codegen's 64KB method / constant-pool limits — each chunk is
  an independent single-pass job (SURVEY §4 "our one real physical-design
  risk").
* Distinct counts default to ``approx_count_distinct`` (HLL++): exact
  multi-column countDistinct forces an Expand-based plan whose row
  multiplication is catastrophic at scale.  The oracle/test path flips
  ``cfg.exact_distinct``.
* Numeric sums are computed in DOUBLE: Spark 4 runs ANSI mode by default,
  where bigint sum overflow raises — at 100 TB an int64 sum overflow is not
  hypothetical.
* Aggregation state for percentile/percentile_approx routes to
  ObjectHashAggregate automatically; everything else stays codegen'd.
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_df_profiling_spark import schema as S
from spark_df_profiling_spark.config import ProfileConfig


def _key(i: int, stat: str) -> str:
    return f"c{i}__{stat}"


def build_pass1_exprs(df: DataFrame, classes: list[str],
                      cfg: ProfileConfig) -> list[Column]:
    """Expression list for pass 1 (no prior results needed).

    Covers SURVEY §2 kernels T1, U1-U5, N1-N6, N11, C-prep, D1, G1.
    """
    exprs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, (field, cls) in enumerate(zip(df.schema.fields, classes)):
        c = df[field.name]
        exprs.append(F.count(c).alias(_key(i, "count")))
        if cfg.exact_distinct:
            exprs.append(F.count_distinct(c).alias(_key(i, "distinct")))
        else:
            exprs.append(
                F.approx_count_distinct(c, cfg.distinct_rsd)
                .alias(_key(i, "distinct")))
        # NOTE: no first()/min()/max() over STRING columns here — a single
        # string-buffered aggregate disqualifies HashAggregateExec (string
        # buffers are immutable in UnsafeRow) and demotes the ENTIRE wide
        # agg to interpreted SortAggregate, losing whole-stage codegen for
        # every expression.  The CONST value (G1) comes from the frequency
        # pass instead (a CONST column's top value is its value).

        if S.is_numeric(cls):
            cd = c.cast("double")
            exprs.extend([
                F.mean(cd).alias(_key(i, "mean")),
                F.min(c).cast("double").alias(_key(i, "min")),
                F.max(c).cast("double").alias(_key(i, "max")),
                F.var_samp(cd).alias(_key(i, "variance")),
                F.stddev_samp(cd).alias(_key(i, "std")),
                F.skewness(cd).alias(_key(i, "skewness")),
                F.kurtosis(cd).alias(_key(i, "kurtosis")),
                F.sum(cd).alias(_key(i, "sum")),
                F.sum(F.when(c == 0, 1).otherwise(0)).alias(_key(i, "zeros")),
            ])
            if cls == S.NUM_FLOAT:
                exprs.append(
                    F.sum(F.when(cd.isin(float("inf"), float("-inf")), 1)
                          .otherwise(0)).alias(_key(i, "inf")))
                exprs.append(
                    F.sum(F.when(F.isnan(cd), 1).otherwise(0))
                    .alias(_key(i, "nan")))
            # NOTE: quantiles deliberately live in pass 2 — a single
            # percentile/percentile_approx expression demotes the WHOLE
            # aggregate from HashAggregate(codegen) to ObjectHashAggregate
            # (interpreted), slowing every other expression ~2x.  Keeping
            # pass 1 sketch-free keeps it inside whole-stage codegen.
        elif cls == S.DATE:
            exprs.append(F.min(c).alias(_key(i, "min_date")))
            exprs.append(F.max(c).alias(_key(i, "max_date")))
        elif cls in (S.ARRAY, S.MAP):
            exprs.extend([
                F.avg(F.size(c)).alias(_key(i, "mean_size")),
                F.min(F.size(c)).cast("long").alias(_key(i, "min_size")),
                F.max(F.size(c)).cast("long").alias(_key(i, "max_size")),
            ])
    return exprs


def build_pass2_exprs(df: DataFrame, classes: list[str], pass1: dict[str, Any],
                      cfg: ProfileConfig) -> list[Column]:
    """Pass-2 expressions: quantiles (N6), MAD (N10), histograms (N12).

    MAD is the reference's *mean* absolute deviation around the mean
    (``base.py::describe>>describe_integer_1d``), an inherently two-pass
    statistic.  Histogram bins are equal-width on [min, max] with the last
    bin right-closed, matching ``base.py::describe>>create_hist_data``.
    Quantile sketches sit here (not pass 1) so the ObjectHashAggregate
    they force is paid once, on this smaller expression set.
    """
    exprs: list[Column] = []
    for i, (field, cls) in enumerate(zip(df.schema.fields, classes)):
        if cls == S.DATE and cfg.compute_histograms:
            # D3 extension (reference has no date histogram): equal-width
            # bins over epoch seconds, edges from pass-1 min/max.
            mn_d = pass1.get(_key(i, "min_date"))
            mx_d = pass1.get(_key(i, "max_date"))
            mn_e = _to_epoch(mn_d)
            mx_e = _to_epoch(mx_d)
            if mn_e is not None and mx_e is not None and mx_e > mn_e:
                ep = _epoch_expr(df, field.name)
                width = (mx_e - mn_e) / cfg.bins
                for b in range(cfg.bins):
                    left = mn_e + width * b
                    if b == cfg.bins - 1:
                        cond = (ep >= F.lit(left)) & (ep <= F.lit(mx_e))
                    else:
                        right = mn_e + width * (b + 1)
                        cond = (ep >= F.lit(left)) & (ep < F.lit(right))
                    exprs.append(F.sum(F.when(cond, 1).otherwise(0))
                                 .alias(_key(i, f"hist{b}")))
            continue
        if not S.is_numeric(cls):
            continue
        cnt = pass1.get(_key(i, "count")) or 0
        mean = pass1.get(_key(i, "mean"))
        mn = pass1.get(_key(i, "min"))
        mx = pass1.get(_key(i, "max"))
        c = df[field.name].cast("double")
        if cnt > 0:
            qs = ", ".join(repr(q) for q in cfg.quantiles)
            col_sql = f"CAST(`{field.name}` AS DOUBLE)"
            if cfg.exact_quantiles:
                q_expr = F.expr(f"percentile({col_sql}, array({qs}))")
            else:
                q_expr = F.expr(
                    f"percentile_approx({col_sql}, array({qs}), "
                    f"{cfg.quantile_accuracy})")
            exprs.append(q_expr.alias(_key(i, "quantiles")))
        if cfg.compute_mad and cnt > 0 and mean is not None \
                and math.isfinite(mean):
            exprs.append(F.avg(F.abs(c - F.lit(mean)))
                         .alias(_key(i, "mad")))
        if cfg.compute_histograms and cnt > 0 and mn is not None \
                and mx is not None and math.isfinite(mn) and math.isfinite(mx) \
                and mx > mn:
            width = (mx - mn) / cfg.bins
            for b in range(cfg.bins):
                left = mn + width * b
                if b == cfg.bins - 1:
                    cond = (c >= F.lit(left)) & (c <= F.lit(mx)) \
                        & ~F.isnan(c)
                else:
                    right = mn + width * (b + 1)
                    cond = (c >= F.lit(left)) & (c < F.lit(right)) \
                        & ~F.isnan(c)
                exprs.append(F.sum(F.when(cond, 1).otherwise(0))
                             .alias(_key(i, f"hist{b}")))
    return exprs


def _expr_class(e: Column) -> str:
    """Classify an aggregate expression by its buffer/exec impact.

    * ``sketch``  — HLL++ (``approx_count_distinct``): ~52 LONG buffer
      slots per column.  A dozen of these pushes the aggregate past
      ``spark.sql.codegen.maxFields``, silently demoting EVERY expression
      in the same physical agg to interpreted execution (measured 6-8x
      slowdown of the whole pass).  Isolated in their own chunk they are
      cheap (one register update per row).
    * ``object`` — percentile/percentile_approx: TypedImperativeAggregate,
      forces ObjectHashAggregateExec (no whole-stage codegen) for the
      entire chunk, so they must never share a chunk with declarative
      aggregates.
    * ``light``  — everything else (count/min/max/moments/corr/when-sums):
      2-6 fixed-width buffer slots each, stays inside HashAggregateExec
      whole-stage codegen when chunked below the maxFields budget.
    """
    s = e._jc.toString()
    if "approx_count_distinct" in s or "hyperloglog" in s \
            or "count(DISTINCT" in s:
        # exact count_distinct also isolated: it plans via Expand (one
        # duplicated row-stream per DISTINCT column) — grouping the
        # distincts together caps the Expand multiplication to the
        # distinct-only chunk instead of inflating the whole wide agg.
        return "sketch"
    if "percentile" in s:
        return "object"
    return "light"


# Budgeted chunk sizes (buffer-slot aware, see _expr_class):
# light: worst case ~6 slots/expr (corr) -> 64 exprs ~= 384 slots, safely
# under the codegen.maxFields=500 we set; sketch/object: execution is
# per-row cheap / already interpreted, cap only to bound planning time.
_CHUNK_CAP = {"light": 64, "sketch": 48, "object": 32}


def run_chunked_agg(df: DataFrame, exprs: list[Column],
                    cfg: ProfileConfig) -> dict[str, Any]:
    """Execute a wide agg, chunked by buffer class, chunks run CONCURRENTLY.

    Grouping rules (measured on 600k-row lineitem, local[32]):
    * declarative aggs mixed with HLL sketches lose whole-stage codegen
      (buffer > codegen.maxFields) — 9.3s; split into two chunks — 1.2s.
    * percentile sketches demote a chunk to ObjectHashAggregateExec; they
      get their own chunk so histograms/MAD stay codegen'd.

    Each chunk is one Spark job (one scan).  Chunks are submitted from a
    small thread pool: Spark schedules concurrent jobs natively, so on a
    multi-core driver the scans overlap; on a real cluster each chunk's
    tasks also fan out across executors.  Returns merged {alias: value}.
    """
    out: dict[str, Any] = {}
    if not exprs:
        return out
    groups: dict[str, list[Column]] = {"light": [], "sketch": [], "object": []}
    for e in exprs:
        groups[_expr_class(e)].append(e)
    chunks: list[list[Column]] = []
    for klass, es in groups.items():
        step = max(1, min(cfg.max_agg_exprs, _CHUNK_CAP[klass]))
        for start in range(0, len(es), step):
            chunks.append(es[start:start + step])
    if len(chunks) == 1:
        return df.agg(*chunks[0]).collect()[0].asDict()
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(8, len(chunks))) as pool:
        for row in pool.map(lambda ch: df.agg(*ch).collect()[0], chunks):
            out.update(row.asDict())
    return out


def stat_key(i: int, stat: str) -> str:
    """Public accessor for the alias scheme (used by the orchestrator)."""
    return _key(i, stat)


def _to_epoch(v: Any) -> float | None:
    """Driver-side datetime/date -> epoch seconds (UTC-naive)."""
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=_dt.timezone.utc).timestamp()
    if isinstance(v, _dt.date):
        return float(
            _dt.datetime(v.year, v.month, v.day,
                         tzinfo=_dt.timezone.utc).timestamp())
    return None


def _epoch_expr(df: DataFrame, col: str) -> Column:
    """Epoch-seconds expression for LTZ/NTZ timestamp or date columns."""
    dt = dict(df.dtypes)[col]
    if dt.startswith("timestamp_ntz"):
        return F.expr(
            f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
            f"`{col}`)").cast("double")
    if dt == "date":
        return (F.unix_date(F.col(col)).cast("double") * 86400.0)
    return F.unix_seconds(F.col(col)).cast("double")


def date_range_seconds(mn: Any, mx: Any) -> float | None:
    """Driver-side D2: range of a date/timestamp column in seconds."""
    if mn is None or mx is None:
        return None
    if isinstance(mn, _dt.datetime) and isinstance(mx, _dt.datetime):
        return (mx - mn).total_seconds()
    if isinstance(mn, _dt.date) and isinstance(mx, _dt.date):
        return float((mx - mn).days * 86400)
    return None

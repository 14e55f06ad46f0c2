"""Equal-width histogram operator (SURVEY §2.3 N12).

The reference builds a chained ``when()`` CASE expression per column and runs
``groupBy('bin_id').count()`` plus a pandas reindex
(``base.py::describe>>create_hist_data``).  Standalone plan here:

    job 1: min/max (wide agg, tiny result)
    job 2: bin-index groupBy  — bin = least(floor((x-min)*bins/(max-min)),
                                            bins-1)

The min/max row is broadcast-joined (a 1-row dimension — never a shuffle).
Inside ``profile()`` histograms instead ride the pass-2 wide agg as
``sum(when(...))`` towers, which avoids the groupBy shuffle entirely; this
module is the composable single-column operator and the DuckDB-oracle
formulation (same arithmetic expression evaluates bit-identically in both
engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram(df: DataFrame, col: str, bins: int = 10) -> DataFrame:
    """Return (bin bigint, cnt bigint) for non-null finite values.

    Empty bins are absent from the output (consistent with a GROUP BY
    oracle); the last bin is right-closed.
    """
    c = df[col].cast("double")
    mm = F.broadcast(df.agg(F.min(c).alias("__mn"), F.max(c).alias("__mx")))
    joined = df.select(c.alias("__x")).crossJoin(mm)
    bin_expr = F.least(
        F.floor((F.col("__x") - F.col("__mn")) * float(bins)
                / (F.col("__mx") - F.col("__mn"))),
        F.lit(bins - 1).cast("long"),
    )
    return (joined
            .where(F.col("__x").isNotNull() & ~F.isnan(F.col("__x"))
                   & (F.col("__mx") > F.col("__mn")))
            .select(bin_expr.alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("bin"))


def histogram_sql(table: str, col: str, bins: int = 10) -> str:
    """DuckDB oracle with the identical arithmetic expression."""
    return f"""
WITH s AS (SELECT min(CAST({col} AS DOUBLE)) AS mn,
                  max(CAST({col} AS DOUBLE)) AS mx FROM {table})
SELECT CAST(LEAST(FLOOR((CAST({col} AS DOUBLE) - mn) * {bins}.0 / (mx - mn)),
                  {bins - 1}) AS BIGINT) AS bin,
       count(*) AS cnt
FROM {table}, s
WHERE {col} IS NOT NULL AND mx > mn
GROUP BY 1
ORDER BY 1
"""

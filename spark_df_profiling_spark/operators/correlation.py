"""Pearson correlation matrix + CORR rejection (SURVEY §2.7 R1/R2).

The reference computes the matrix with one ``df.corr(x, y)`` driver call per
pair — O(k^2) Spark jobs (``base.py::describe>>corr_matrix``).  Here the full
matrix is ONE job via ``pyspark.ml.stat.Correlation`` over an assembled
vector column.

Reference semantics preserved exactly:
* listwise deletion — ``na.drop(how="any")`` across ALL numeric columns
  before correlating (one null column shrinks every pairwise sample);
* greedy lower-triangle rejection in column order: for column x, if any
  *earlier surviving* column y has corr(x, y) >= threshold (SIGNED — an
  anti-correlated pair is NOT rejected), x is replaced by
  ``('CORR', y, rho)``;
* ``get_rejected_variables(threshold)`` filters on the recorded rho.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlation_exprs(df: DataFrame, num_cols: list[str]) -> list[str]:
    """Pearson matrix as pass-1 aggregate SQL expressions (zero extra jobs).

    Pearson corr is a declarative aggregate, so the k·(k-1)/2
    upper-triangle correlations ride the same single-pass wide agg as
    every other statistic — where the reference spends O(k^2) separate
    Spark jobs (``base.py::describe>>corr_matrix``), this costs zero
    extra passes.  SQL-string form for the same reason as
    ``build_pass1_exprs`` (py4j round-trip elimination); Catalyst dedups
    the repeated stddev/covar aggregate children, so the textual
    repetition costs nothing physically.

    Listwise deletion (reference semantics: ``na.drop(how='any')`` across
    ALL numeric columns) is emulated by null-masking each operand with
    "every numeric column non-null", which Catalyst folds into the same
    scan.
    """
    allnn = " AND ".join(
        f"({f'`{c}`'} IS NOT NULL AND NOT isnan(CAST(`{c}` AS DOUBLE)))"
        for c in num_cols)
    out: list[str] = []
    for i, x in enumerate(num_cols):
        for j in range(i + 1, len(num_cols)):
            y = num_cols[j]
            mx = f"CASE WHEN {allnn} THEN CAST(`{x}` AS DOUBLE) END"
            my = f"CASE WHEN {allnn} THEN CAST(`{y}` AS DOUBLE) END"
            # NOT corr(): under ANSI mode (Spark 4 default) corr RAISES
            # DIVIDE_BY_ZERO when either side has zero variance (e.g. a
            # column constant after masking).  covar/stddev with a
            # CASE-guard short-circuits the division instead, yielding
            # NULL — which greedy_rejection already treats as "no corr".
            denom = f"(stddev_samp({mx}) * stddev_samp({my}))"
            out.append(
                f"CASE WHEN {denom} > 0 THEN "
                f"covar_samp({mx}, {my}) / {denom} END "
                f"AS `__corr_{i}_{j}`")
    return out


def decode_correlation_row(row: dict, num_cols: list[str]
                           ) -> dict[tuple[str, str], float]:
    """Turn the pass-1 result row back into a symmetric {pair: rho} dict."""
    out: dict[tuple[str, str], float] = {}
    for i, x in enumerate(num_cols):
        out[(x, x)] = 1.0
        for j in range(i + 1, len(num_cols)):
            y = num_cols[j]
            v = row.get(f"__corr_{i}_{j}")
            rho = float(v) if v is not None else float("nan")
            out[(x, y)] = rho
            out[(y, x)] = rho
    return out


def correlation_matrix(df: DataFrame,
                       num_cols: list[str]) -> dict[tuple[str, str], float]:
    """Full Pearson matrix over num_cols in one Spark job.

    Returns {(col_x, col_y): rho}.  Empty dict when fewer than 2 columns
    or no complete rows survive listwise deletion.
    """
    if len(num_cols) < 2:
        return {}
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Correlation

    clean = df.select(
        *[df[c].cast("double").alias(c) for c in num_cols]).na.drop("any")
    assembler = VectorAssembler(inputCols=num_cols, outputCol="__features")
    vec = assembler.transform(clean).select("__features")
    try:
        mat = Correlation.corr(vec, "__features", "pearson").head()[0]
    except Exception:
        return {}
    arr = mat.toArray()
    out: dict[tuple[str, str], float] = {}
    for i, x in enumerate(num_cols):
        for j, y in enumerate(num_cols):
            v = float(arr[i][j])
            out[(x, y)] = v if not math.isnan(v) else float("nan")
    return out


def pairwise_correlations(df: DataFrame,
                          num_cols: list[str]) -> dict[tuple[str, str], float]:
    """Fallback path: ``df.stat.corr`` per pair (reference behavior).

    O(k^2) jobs — only sensible for k <= 3 or when pyspark.ml is
    unavailable.  NOTE: semantics differ from :func:`correlation_matrix`
    on null placement — ``df.stat.corr`` drops nulls pairwise, the matrix
    path listwise; the reference uses listwise (na.drop over all NUM cols).
    """
    clean = df.select(
        *[df[c].cast("double").alias(c) for c in num_cols]).na.drop("any")
    out: dict[tuple[str, str], float] = {}
    for i, x in enumerate(num_cols):
        for j, y in enumerate(num_cols):
            if j < i:
                out[(x, y)] = out[(y, x)]
            elif j == i:
                out[(x, y)] = 1.0
            else:
                out[(x, y)] = clean.stat.corr(x, y)
    return out


def greedy_rejection(num_cols: list[str],
                     corr: dict[tuple[str, str], float],
                     threshold: float) -> dict[str, tuple[str, float]]:
    """Reference's greedy lower-triangle CORR rejection.

    Iterates columns in order; x is rejected by the first earlier SURVIVING
    column y with corr(x, y) >= threshold.  Returns
    {rejected_col: (kept_col, rho)}.
    """
    rejected: dict[str, tuple[str, float]] = {}
    survivors: list[str] = []
    for x in num_cols:
        hit = None
        for y in survivors:
            rho = corr.get((x, y))
            if rho is not None and not math.isnan(rho) and rho >= threshold:
                hit = (y, rho)
                break
        if hit is None:
            survivors.append(x)
        else:
            rejected[x] = hit
    return rejected

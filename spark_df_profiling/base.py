"""Reference-compatible ``base`` module (``base.py`` in v1.1.13).

Power users of the reference call ``spark_df_profiling.base.describe(df)``
directly for the raw statistics dict (SURVEY.md §3 EP3); this module
preserves that entry point on top of the Spark-native engine.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


def describe(df: DataFrame, bins: int = 10, corr_reject: float = 0.9,
             **kwargs: Any) -> dict[str, Any]:
    """Reference signature: ``base.py::describe(df, bins, corr_reject)``.

    Returns the ``{'table', 'variables', 'freq'}`` dict (pandas on the
    driver, like the reference) computed by the single-pass engine.
    Raises TypeError for non-DataFrame input and ValueError for an empty
    DataFrame — the reference's contract.
    """
    from spark_df_profiling import _to_reference_description
    from spark_df_profiling_spark import ProfileConfig
    from spark_df_profiling_spark.operators.profile import (
        describe as _describe)

    cfg = ProfileConfig(bins=bins, corr_reject=corr_reject)
    return _to_reference_description(_describe(df, cfg))


def to_html(sample_df, stats: dict[str, Any]) -> str:
    """Minimal ``base.py::to_html`` parity: validates the stats dict keys
    and renders the HTML body (presentation only)."""
    if not isinstance(stats, dict) or \
            not {"table", "variables", "freq"} <= set(stats):
        raise TypeError(
            "stats must be the dict returned by describe() "
            "with keys {'table', 'variables', 'freq'}")
    import html as _html

    parts = ["<h1>Overview</h1><table>"]
    for k, v in stats["table"].items():
        parts.append(f"<tr><td>{_html.escape(str(k))}</td>"
                     f"<td>{_html.escape(str(v))}</td></tr>")
    parts.append("</table><h1>Variables</h1>")
    parts.append(stats["variables"].to_html())
    return "\n".join(parts)

"""Report layer: ``ProfileReport`` facade (reference ``__init__.py`` parity).

Presentation only — every statistic is computed by
``operators.profile.describe``; this module renders the result.  The three
output surfaces mirror the reference (``__init__.py::ProfileReport``):

* ``to_file(path)``     — standalone HTML file
* ``rendered_html()``   — wrapped HTML string (Databricks ``displayHTML``)
* ``_repr_html_``       — inline Jupyter rendering

The reference renders matplotlib PNG histograms driver-side; here histograms
are *data* (bin arrays in the profile DataFrame) rendered as inline SVG/CSS
bars — no matplotlib dependency, nothing scale-dependent on the driver.
"""

from __future__ import annotations

import html as _html
from typing import Any

from pyspark.sql import DataFrame

from spark_df_profiling_spark.config import DEFAULT_CONFIG, ProfileConfig

# Reference alert thresholds (formatters.py / to_html, SURVEY §2.8 P1)
SKEWNESS_CUTOFF = 20.0
HIGH_CARDINALITY_CUTOFF = 50
P_ZEROS_CUTOFF = 0.5


class ProfileReport:
    """API-compatible facade over :func:`describe`.

    >>> report = ProfileReport(df, bins=10, sample=5, corr_reject=0.9)
    >>> report.get_description()
    >>> report.get_rejected_variables(threshold=0.9)
    >>> report.to_file("out.html")
    """

    def __init__(self, df: DataFrame, bins: int = 10, sample: int = 5,
                 corr_reject: float | None = 0.9,
                 config: ProfileConfig | None = None):
        from spark_df_profiling_spark.operators.profile import describe
        cfg = config or ProfileConfig(bins=bins, sample=sample,
                                      corr_reject=corr_reject)
        self.config = cfg
        self.description = describe(df, cfg)
        self._html: str | None = None

    # -- machine-readable surface (EP3) ----------------------------------
    def get_description(self):
        return self.description

    def get_rejected_variables(self, threshold: float = 0.9) -> list[str]:
        return self.description.get_rejected_variables(threshold)

    # -- presentation surfaces (EP2) -------------------------------------
    def html(self) -> str:
        if self._html is None:
            self._html = render_html(self.description)
        return self._html

    def rendered_html(self) -> str:
        return _wrap(self.html())

    def to_file(self, outputfile: str) -> None:
        with open(outputfile, "w", encoding="utf-8") as fh:
            fh.write(self.rendered_html())

    def _repr_html_(self) -> str:
        return self.html()


def alerts_for(row: dict[str, Any]) -> list[str]:
    """Reference alert messages (templates.py::messages thresholds)."""
    out = []
    cls = row.get("type_class")
    if cls == "CONST":
        out.append("is constant and should be ignored")
    if cls == "CORR":
        out.append(
            f"is highly correlated with {row.get('corr_with')} "
            f"(ρ = {row.get('corr_value'):.5f}) and should be ignored")
    if (row.get("p_missing") or 0) > 0:
        out.append(f"has {row['n_missing']} missing values "
                   f"({100 * row['p_missing']:.1f}%)")
    if (row.get("p_zeros") or 0) > P_ZEROS_CUTOFF:
        out.append(f"has {row['n_zeros']} zeros "
                   f"({100 * row['p_zeros']:.1f}%)")
    if (row.get("skewness") or 0) > SKEWNESS_CUTOFF:
        out.append("is highly skewed")
    if cls == "CAT" and (row.get("distinct_count") or 0) \
            > HIGH_CARDINALITY_CUTOFF:
        out.append(f"has a high cardinality: {row['distinct_count']} "
                   "distinct values")
    return out


def _bar(pct: float) -> str:
    return (f'<div style="background:#337ab7;height:10px;'
            f'width:{max(0.0, min(100.0, pct)):.1f}%"></div>')


def _fmt(v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, float):
        return f"{v:.5g}"
    return _html.escape(str(v))


def render_html(desc) -> str:
    """Assemble the overview / variables / sample sections (SURVEY §2.8)."""
    rows = [r.asDict(recursive=True) for r in desc.variables.collect()]
    t = desc.table
    parts = ["<h1>Overview</h1><table class='stats'>"]
    parts.append(f"<tr><td>Number of variables</td><td>{t['nvar']}</td></tr>")
    parts.append(f"<tr><td>Number of observations</td><td>{t['n']}</td></tr>")
    parts.append("<tr><td>Total missing (%)</td>"
                 f"<td>{100 * t['total_missing']:.1f}%</td></tr>")
    for cls, cnt in sorted(t["types"].items()):
        parts.append(f"<tr><td>{cls}</td><td>{cnt}</td></tr>")
    parts.append("</table>")

    parts.append("<h1>Variables</h1>")
    for r in rows:
        parts.append(f"<h2>{_html.escape(r['column'])} "
                     f"<small>{r['type_class']} ({r['dtype']})</small></h2>")
        for a in alerts_for(r):
            parts.append(f"<p class='alert'>{_html.escape(r['column'])} "
                         f"{_html.escape(a)}</p>")
        parts.append("<table class='stats'>")
        for key in ("count", "n_missing", "p_missing", "distinct_count",
                    "mean", "std", "min_num", "q05", "q25", "q50", "q75",
                    "q95", "max_num", "mad", "cv", "sum_value",
                    "min_date", "max_date", "first_value"):
            if r.get(key) is not None:
                parts.append(f"<tr><td>{key}</td><td>{_fmt(r[key])}</td></tr>")
        parts.append("</table>")
        if r.get("freq"):
            n = r["n"] or 1
            parts.append("<table class='freq'>")
            for item in r["freq"][:10]:
                pct = 100.0 * item["cnt"] / n
                parts.append(
                    f"<tr><td>{_fmt(item['value'])}</td>"
                    f"<td>{item['cnt']}</td><td>{_bar(pct)}</td></tr>")
            parts.append("</table>")
        if r.get("histogram"):
            total = sum(b["cnt"] for b in r["histogram"]) or 1
            bars = "".join(
                f'<div title="[{b["bin_left"]:.4g}, {b["bin_right"]:.4g}): '
                f'{b["cnt"]}" style="display:inline-block;width:18px;'
                f'background:#337ab7;vertical-align:bottom;'
                f'height:{60.0 * b["cnt"] / total:.0f}px"></div>'
                for b in r["histogram"])
            parts.append(f"<div class='hist'>{bars}</div>")

    parts.append("<h1>Sample</h1>")
    sample_rows = desc.sample.collect()
    if sample_rows:
        cols = sample_rows[0].__fields__
        parts.append("<table class='sample'><tr>" +
                     "".join(f"<th>{_html.escape(c)}</th>" for c in cols) +
                     "</tr>")
        for sr in sample_rows:
            parts.append("<tr>" + "".join(
                f"<td>{_fmt(v)}</td>" for v in sr) + "</tr>")
        parts.append("</table>")
    return "\n".join(parts)


def _wrap(content: str) -> str:
    return ("<!doctype html><html><head><meta charset='utf-8'>"
            "<style>body{font-family:sans-serif;margin:2em}"
            "table.stats td{padding:2px 8px;border-bottom:1px solid #eee}"
            ".alert{color:#a94442;background:#f2dede;padding:4px}"
            "table.sample th,table.sample td{padding:2px 6px;"
            "border:1px solid #ddd}</style></head><body>"
            f"{content}</body></html>")

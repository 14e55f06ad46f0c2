"""Report layer: ``ProfileReport`` facade (reference ``__init__.py`` parity).

Presentation only — every statistic is computed by
``operators.profile.describe``; this module renders the result.  The three
output surfaces mirror the reference (``__init__.py::ProfileReport``):

* ``to_file(path)``     — standalone HTML file
* ``rendered_html()``   — wrapped HTML string (Databricks ``displayHTML``)
* ``_repr_html_``       — inline Jupyter rendering

The reference renders matplotlib PNG histograms driver-side; here histograms
are *data* (bin arrays in the profile DataFrame) rendered as inline CSS bars
PLUS a reference-parity ``data:image/png;base64`` mini-histogram written by
``report/png_hist.py`` (stdlib-only PNG encoder — no matplotlib dependency,
nothing scale-dependent on the driver).

Rendering is template-driven when jinja2 is importable (reference
``templates.py`` ≈L5-15 + ``templates/*.html`` parity — same template
names and section structure; see ``report/templates.py``), with a
dependency-free string-builder fallback producing the same sections.
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
    """Reference alert messages (templates.py::messages thresholds);
    the message strings live in ``report.templates.MESSAGES``."""
    from spark_df_profiling_spark.report.templates import MESSAGES
    out = []
    cls = row.get("type_class")
    if cls == "CONST":
        out.append(MESSAGES["CONST"])
    if cls == "CORR":
        out.append(MESSAGES["CORR"].format(
            corr_with=row.get("corr_with"),
            corr_value=row.get("corr_value")))
    if (row.get("p_missing") or 0) > 0:
        out.append(MESSAGES["missing"].format(
            n_missing=row["n_missing"],
            p_missing_pct=100 * row["p_missing"]))
    if (row.get("p_zeros") or 0) > P_ZEROS_CUTOFF:
        out.append(MESSAGES["zeros"].format(
            n_zeros=row["n_zeros"], p_zeros_pct=100 * row["p_zeros"]))
    if (row.get("skewness") or 0) > SKEWNESS_CUTOFF:
        out.append(MESSAGES["skewed"].format(skewness=row["skewness"]))
    if cls == "CAT" and (row.get("distinct_count") or 0) \
            > HIGH_CARDINALITY_CUTOFF:
        out.append(MESSAGES["cardinality"].format(
            distinct_count=row["distinct_count"]))
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


def _row_context(r: dict[str, Any]) -> dict[str, Any]:
    """Per-variable template context: alerts + precomputed freq rows
    (incl. the reference's "Other values" / "(Missing)" buckets, C3-C4)
    + histogram bars scaled to the tallest bin."""
    n = r.get("n") or 1
    raw = r.get("freq") or []
    freq = []
    for item in raw[:10]:
        pct = 100.0 * item["cnt"] / n
        freq.append({"value": item["value"], "cnt": item["cnt"],
                     "pct": f"{pct:.1f}", "width": f"{min(100.0, pct):.1f}"})
    shown = sum(item["cnt"] for item in raw[:10])
    other = (r.get("count") or 0) - shown
    n_other_distinct = (r.get("distinct_count") or 0) - len(raw[:10])
    if other > 0 and n_other_distinct > 0:
        pct = 100.0 * other / n
        freq.append({"value": f"Other values ({n_other_distinct})",
                     "cnt": other, "pct": f"{pct:.1f}",
                     "width": f"{min(100.0, pct):.1f}"})
    if (r.get("n_missing") or 0) > 0:
        pct = 100.0 * r["n_missing"] / n
        freq.append({"value": "(Missing)", "cnt": r["n_missing"],
                     "pct": f"{pct:.1f}", "width": f"{min(100.0, pct):.1f}"})
    hist = []
    hb = r.get("histogram") or []
    hist_png = None
    if hb:
        peak = max(x["cnt"] for x in hb) or 1
        for b in hb:
            hist.append({
                "title": f"[{b['bin_left']:.4g}, {b['bin_right']:.4g}): "
                         f"{b['cnt']}",
                "height": int(round(60.0 * b["cnt"] / peak))})
        # reference-parity data-URI PNG (matplotlib-free, deterministic)
        from spark_df_profiling_spark.report.png_hist import png_data_uri
        hist_png = png_data_uri([b["cnt"] for b in hb])
    return {"r": r, "alerts": alerts_for(r), "freq": freq,
            "mini_freq": freq[:3], "hist": hist, "hist_png": hist_png}


def _render_templated(desc) -> str:
    """Jinja2 path: reference template registry, row dispatch by type."""
    from spark_df_profiling_spark.report import templates as TPL
    # O(#columns) collect by design — the variables frame has one row per
    # profiled column, never per data row.  At 10k+ columns the HTML
    # itself is the bottleneck, not this collect.
    rows = [r.asDict(recursive=True) for r in desc.variables.collect()]
    t = desc.table
    warnings = [(r["column"], a) for r in rows for a in alerts_for(r)]
    parts = [TPL.template("overview").render(
        table=t, types=sorted(t["types"].items()), warnings=warnings)]
    parts.append('<div class="section" id="variables">')
    parts.append("<h1>Variables</h1>")
    for r in rows:
        name = TPL.ROW_TEMPLATES.get(r["type_class"], "row_obj")
        parts.append(TPL.template(name).render(**_row_context(r)))
    parts.append("</div>")
    sample_rows = desc.sample.collect()
    parts.append(TPL.template("sample").render(
        columns=sample_rows[0].__fields__ if sample_rows else [],
        rows=[list(sr) for sr in sample_rows]))
    from markupsafe import Markup
    return TPL.template("wrapper").render(content=Markup("\n".join(parts)))


def render_html(desc) -> str:
    """Assemble the overview / variables / sample sections (SURVEY §2.8).

    Uses the reference-parity Jinja2 templates when jinja2 is importable,
    else the dependency-free builder below (same sections)."""
    from spark_df_profiling_spark.report import templates as TPL
    if TPL.available():
        return _render_templated(desc)
    return _render_basic(desc)


def _render_basic(desc) -> str:
    """String-builder fallback (no jinja2): same three sections."""
    # O(#columns) collect by design — see _render_templated
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
            from spark_df_profiling_spark.report.png_hist import (
                png_data_uri)
            parts.append(
                f'<img class="mini-hist-png" alt="histogram" '
                f'src="{png_data_uri([b["cnt"] for b in r["histogram"]])}">')

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
    from spark_df_profiling_spark.report import templates as TPL
    if TPL.available():
        from markupsafe import Markup
        return TPL.template("base").render(content=Markup(content))
    return ("<!doctype html><html><head><meta charset='utf-8'>"
            "<style>body{font-family:sans-serif;margin:2em}"
            "table.stats td{padding:2px 8px;border-bottom:1px solid #eee}"
            ".alert{color:#a94442;background:#f2dede;padding:4px}"
            "table.sample th,table.sample td{padding:2px 6px;"
            "border:1px solid #ddd}</style></head><body>"
            f"{content}</body></html>")

"""Jinja2 template registry — reference ``templates.py`` parity.

The reference (spark-df-profiling v1.1.13 ``templates.py`` ≈L5-15) builds
a Jinja2 environment over ``templates/*.html`` and exposes a name→template
registry plus the alert-message strings; this module mirrors that layout
with the same template names (base / wrapper / overview / sample /
row_num / row_cat / row_date / row_unique / row_const / row_corr /
freq_table / mini_freq_table) so a report diff lines up section by
section.  One extension: ``row_obj`` renders complex-typed columns
(arrays/structs/maps/binary), which the reference refused outright
(``base.py`` raises ``NotImplementedError`` — including the famous
"stuct" typo — on complex types).

jinja2 is an optional dependency exactly as matplotlib was for the
reference: when it's absent the report layer falls back to the built-in
string renderer (same sections, plainer markup) instead of failing.
"""

from __future__ import annotations

import os
from typing import Any, Optional

try:
    from jinja2 import Environment, FileSystemLoader

    _ENV: Optional[Any] = Environment(
        loader=FileSystemLoader(
            os.path.join(os.path.dirname(__file__), "templates")),
        autoescape=True,
        trim_blocks=True,
        lstrip_blocks=True)
except ImportError:  # pragma: no cover - jinja2 is present in CI image
    _ENV = None

#: template-name registry (reference ``templates.py::templates``)
TEMPLATE_NAMES = (
    "base", "wrapper", "overview", "sample",
    "row_num", "row_cat", "row_date", "row_unique", "row_const",
    "row_corr", "row_obj", "freq_table", "mini_freq_table",
)

#: type_class → row template (reference ``base.py::to_html`` row dispatch)
ROW_TEMPLATES = {
    "NUM": "row_num",
    "CAT": "row_cat",
    "DATE": "row_date",
    "UNIQUE": "row_unique",
    "CONST": "row_const",
    "CORR": "row_corr",
    "BOOL": "row_cat",
    "OBJ": "row_obj",
}

#: alert-message formats (reference ``templates.py::messages``)
MESSAGES = {
    "CONST": "is constant and should be ignored",
    "CORR": "is highly correlated with {corr_with} (ρ = {corr_value:.5f}) "
            "and should be ignored",
    "missing": "has {n_missing} missing values ({p_missing_pct:.1f}%)",
    "zeros": "has {n_zeros} zeros ({p_zeros_pct:.1f}%)",
    "skewed": "is highly skewed (γ1 = {skewness:.5g})",
    "cardinality": "has a high cardinality: {distinct_count} distinct "
                   "values",
}


def available() -> bool:
    return _ENV is not None


def template(name: str):
    """Fetch a template by registry name (``.html`` implied)."""
    if _ENV is None:
        raise RuntimeError("jinja2 is not installed")
    if name not in TEMPLATE_NAMES:
        raise KeyError(f"unknown template: {name}")
    return _ENV.get_template(f"{name}.html")


def fmt_value(v: Any) -> str:
    """Scalar formatter (reference ``formatters.py`` value rules)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        return f"{v:.5g}"
    return str(v)


def fmt_pct(v: Any) -> str:
    return "" if v is None else f"{100.0 * v:.1f}%"


def fmt_bytes(n: Any) -> str:
    """Human-readable byte size (reference overview 'Total size in
    memory' row; the reference hardcodes 0 B — we report real bytes)."""
    if n is None:
        return "unknown"
    v = float(n)
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if v < 1024 or unit == "TiB":
            return f"{v:.1f} {unit}"
        v /= 1024
    return f"{v:.1f} TiB"


if _ENV is not None:
    _ENV.filters["fmt"] = fmt_value
    _ENV.filters["pct"] = fmt_pct
    _ENV.filters["bytes"] = fmt_bytes

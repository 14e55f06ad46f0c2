"""spark_df_profiling_spark — a PySpark-native data-profiling / analytics engine.

A from-scratch re-implementation of the capability surface of the public
``julioasotodv/spark-df-profiling`` library (v1.1.13, see SURVEY.md), designed
Spark-first for 100 TB scale:

* ONE wide ``df.agg(...)`` pass computes every per-column statistic
  (vs the reference's ~12 Spark jobs per column — ``base.py::describe``),
* a second pass computes the stats that need pass-1 results (MAD, histograms),
* the full Pearson correlation matrix is ONE job via ``pyspark.ml.stat``
  (vs the reference's O(k^2) ``df.corr`` jobs — ``base.py::describe>>corr_matrix``),
* all categorical top-k frequency tables are computed in ONE stacked
  shuffle (vs one cached groupBy per column —
  ``base.py::describe>>describe_categorical_1d``).

The profile result is a *DataFrame* (one row per input column), not
driver-side pandas — that is what makes the design hold at cluster scale.

Public API (mirrors the reference's ``__init__.py::ProfileReport``):

>>> from spark_df_profiling_spark import ProfileReport, profile, describe
>>> report = ProfileReport(df)
>>> report.get_description()          # machine-readable stats
>>> report.get_rejected_variables()   # CORR-rejected columns
>>> report.to_file("report.html")     # HTML rendering
"""

from spark_df_profiling_spark.config import ProfileConfig
from spark_df_profiling_spark.operators.profile import describe, profile
from spark_df_profiling_spark.report import ProfileReport

__version__ = "0.1.0"

__all__ = [
    "ProfileConfig",
    "ProfileReport",
    "describe",
    "profile",
    "__version__",
]

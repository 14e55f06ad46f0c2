"""Physical-plan helpers: wide-agg expression builders and chunked execution."""

from spark_df_profiling_spark.plans.wide_agg import (
    build_pass1_exprs,
    build_pass2_exprs,
    run_chunked_agg,
)

__all__ = ["build_pass1_exprs", "build_pass2_exprs", "run_chunked_agg"]

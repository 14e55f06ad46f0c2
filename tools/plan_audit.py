"""Plan-shape audit over every declared slot query.

For each __spark_entry__.queries() entry (at sf0.01 by default): build
the DataFrame, capture explain("formatted"), and summarize the physical
operators that matter at 100 TB — Exchange count, join strategies,
nested-loop joins, Python-boundary nodes, non-broadcast cartesians,
global (unpartitioned) windows and sorts.  One line per slot; exit 1 if
any red-flag column is non-zero.

Usage: python tools/plan_audit.py [sf_dir] [slot,slot,...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .appName("plan-audit").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from spark_df_profiling_spark.oracle import SPARK_QUERIES

    red_total = 0
    print(f"{'slot':34} {'Exch':>4} {'BHJ':>3} {'SMJ':>3} {'SHJ':>3} "
          f"{'BNLJ':>4} {'CART':>4} {'Py':>3} {'gWin':>4}")
    for name, fn in SPARK_QUERIES.items():
        if ONLY and name not in ONLY:
            continue
        try:
            df = fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:
            print(f"{name:34} BUILD FAILED: {exc}")
            red_total += 1
            continue
        # per-node detail headers "(n) OperatorName" — exactly one per
        # physical operator (the tree section indents nodes with ":"/"+-"
        # art that is annoying to parse)
        ops = re.findall(r"^\((\d+)\) ([A-Za-z][A-Za-z ]*)$", plan, re.M)
        ops = [o[1].strip() for o in ops]
        joined = "\n".join(ops)
        n = lambda pat: len(re.findall(pat, joined, re.M))  # noqa: E731
        exch = n(r"^Exchange$|^Exchange ")
        bhj = n(r"BroadcastHashJoin")
        smj = n(r"SortMergeJoin")
        shj = n(r"ShuffledHashJoin")
        bnlj = n(r"BroadcastNestedLoopJoin")
        cart = n(r"CartesianProduct")
        py = n(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas")
        # global window/sort: Window or Sort directly above a
        # SinglePartition exchange — approximate via detail text
        gwin = len(re.findall(
            r"Arguments: SinglePartition", plan)) if (
            "Window" in joined) else 0
        flags = []
        if cart:
            flags.append("CARTESIAN")
        if py:
            flags.append("PYTHON-BOUNDARY")
        red_total += len(flags)
        print(f"{name:34} {exch:>4} {bhj:>3} {smj:>3} {shj:>3} "
              f"{bnlj:>4} {cart:>4} {py:>3} {gwin:>4}"
              + ("  << " + ",".join(flags) if flags else ""))
    spark.stop()
    sys.exit(1 if red_total else 0)


if __name__ == "__main__":
    main()

"""Plan-shape audit over every declared slot query — now a DRIFT GATE.

For each __spark_entry__.queries() entry (at sf0.01 by default): build
the DataFrame, capture explain("formatted"), and summarize the physical
operators that matter at 100 TB — Exchange count, join strategies,
nested-loop joins, Python-boundary nodes, non-broadcast cartesians,
global (unpartitioned) windows and sorts.  One line per slot.

Gate semantics (r16): when ``plans/audit_baseline.tsv`` exists (it is
committed), every slot is compared against it and the exit code is 1 on
DRIFT — a new CartesianProduct, a new Python-boundary node, a higher
Exchange count, or a join-strategy downgrade (BHJ lost to SMJ/SHJ).
This lets deliberate shapes (multimodal_meta's bounded Arrow sniffers)
stay green while catching regressions.  Without a baseline the old
absolute rule applies (exit 1 on any cartesian / Python boundary).

Usage: python tools/plan_audit.py [sf_dir] [slot,slot,...]
       python tools/plan_audit.py --write-baseline [sf_dir]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_args = [a for a in sys.argv[1:] if a != "--write-baseline"]
WRITE_BASELINE = "--write-baseline" in sys.argv[1:]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1].split(",")) if len(_args) > 1 else None
BASELINE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "audit_baseline.tsv")
_COLS = ("exch", "bhj", "smj", "shj", "bnlj", "cart", "py", "gwin")


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
    metrics: dict[str, dict[str, int]] = {}
    base = None if WRITE_BASELINE else _load_baseline()
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
        metrics[name] = dict(zip(_COLS, (exch, bhj, smj, shj, bnlj,
                                         cart, py, gwin)))
        flags = []
        if base is not None:
            b = base.get(name)
            if b is None:
                flags.append("NEW-SLOT(rebaseline)")
            else:
                if cart > b["cart"]:
                    flags.append("NEW-CARTESIAN")
                if py > b["py"]:
                    flags.append("NEW-PY-BOUNDARY")
                if exch > b["exch"]:
                    flags.append(f"EXCH {b['exch']}->{exch}")
                if bhj < b["bhj"] and (smj > b["smj"] or shj > b["shj"]):
                    flags.append("BHJ-DOWNGRADE")
        else:
            if cart:
                flags.append("CARTESIAN")
            if py:
                flags.append("PYTHON-BOUNDARY")
        red_total += len(flags)
        print(f"{name:34} {exch:>4} {bhj:>3} {smj:>3} {shj:>3} "
              f"{bnlj:>4} {cart:>4} {py:>3} {gwin:>4}"
              + ("  << " + ",".join(flags) if flags else ""))
    spark.stop()
    if WRITE_BASELINE:
        with open(BASELINE, "w") as fh:
            fh.write("slot\t" + "\t".join(_COLS) + "\n")
            for nm in sorted(metrics):
                fh.write(nm + "\t" + "\t".join(
                    str(metrics[nm][c]) for c in _COLS) + "\n")
        print(f"baseline written: {BASELINE} ({len(metrics)} slots)")
        sys.exit(0)
    sys.exit(1 if red_total else 0)


def _load_baseline() -> dict | None:
    if not os.path.exists(BASELINE):
        return None
    out: dict[str, dict[str, int]] = {}
    with open(BASELINE) as fh:
        header = fh.readline()
        assert header.split() == ["slot", *_COLS], "baseline header drift"
        for line in fh:
            parts = line.split()
            out[parts[0]] = dict(zip(_COLS, map(int, parts[1:])))
    return out


if __name__ == "__main__":
    main()

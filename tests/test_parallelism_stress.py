"""Varied-parallelism oracle stress (VERDICT r10 item 4).

A handful of oracle slots grade FLOAT accumulations pinned to 5
significant digits (``hash_sampling_suite``'s dsir log-weight sums and
wsample Efraimidis–Spirakis keys; the _psig moment columns of the
profile slots).  Float addition is not associative, so a value whose
true sum lands exactly on a 5-sig-digit rounding boundary could render
differently under a different partitioning — green locally, red in the
driver (or vice versa), with nothing to attribute it to.

This stress runs the float-graded slots in TWO fresh subprocesses —
local[2] / 2 shuffle partitions and local[32] / 200 shuffle partitions,
the widest spread the box supports — and asserts the canonical
(order-insensitive, type-sensitive stringified) outputs are identical.
A boundary flip becomes a loud local failure naming the slot, instead
of a driver mystery.

Subprocesses because one JVM allows one SparkContext: the session-scoped
``spark`` fixture cannot re-master mid-run.

Wall-clock (r16): the two runners launch at MODULE IMPORT — i.e. during
pytest collection, ~20 minutes before this test runs in a full-suite
pass — and the test only joins them and compares.  The suite's slowest
test (283s serial in the r16 durations run) thus overlaps the rest of
the suite instead of extending it.  Output goes to FILES, not pipes: a
pipe nobody drains until join time can fill and deadlock the runner.
"""

import atexit
import json
import os
import subprocess
import sys
import tempfile

import pytest

# Slots whose grading includes rounded float accumulations.  Keep the
# list tight — each slot runs twice in fresh JVMs.
FLOAT_GRADED = [
    "hash_sampling_suite",   # dsir lw_s log-weight sum, wsample es_key
    "num_stats",             # skew/kurtosis/var moment sums at _psig
    "text_stats_by_lang",    # avg_* quality/readability means
    "stateful_user_totals",  # r11 ewma:/ewmadj: final values at _psig
    "knn_bruteforce",        # r11 kclass total_sim at _psig + election
    "embedding_array_stats",  # dim/edrift per-dim means/stds at _psig
    "corr_matrix",           # r12 kripp alpha (per-item ratio sums),
                             # theil/kappa/catassoc at _psig
    "token_count_bpe",       # r13 fold host: zipf slope / tfidf
                             # scores at _psig ride 'vocab:' rows
                             # (r12 bpair/bmerge rows are integers)
]

RUNNER = r"""
import json, sys
sys.path.insert(0, "/root/repo")
master, shuffle, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
slots = sys.argv[4].split(",")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(master)
         .config("spark.sql.shuffle.partitions", shuffle)
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "6g")
         .appName(f"par-stress-{master}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, "/root/repo/tools")
from check_oracle import pandas_rows, norm_cell
import __spark_entry__ as E
qs = E.queries()
out = {}
def run_slot(slot):
    cols, rows = pandas_rows(qs[slot](spark, "/root/testdata/sf0.001")
                             .toPandas())
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return slot, sorted(
        [norm_cell(r[i]) for i in order] for r in rows)
# Spark handles concurrent jobs natively; a small pool overlaps the
# slots' driver-side planning with each other's cluster work instead
# of serializing eight heavyweight composites
from concurrent.futures import ThreadPoolExecutor
with ThreadPoolExecutor(max_workers=4) as pool:
    for slot, val in pool.map(run_slot, slots):
        out[slot] = val
with open(out_path, "w") as f:
    json.dump(out, f)
spark.stop()
"""

# ---- module-import launch (pytest collection time) ----------------------
_DIR = tempfile.mkdtemp(prefix="par-stress-")
_PROCS: dict[str, tuple] = {}
for _master, _shuffle in (("local[2]", "2"), ("local[32]", "200")):
    _out = os.path.join(_DIR, f"par_{_shuffle}.json")
    _log = open(os.path.join(_DIR, f"par_{_shuffle}.log"), "w")
    _PROCS[_master] = (subprocess.Popen(
        [sys.executable, "-c", RUNNER, _master, _shuffle, _out,
         ",".join(FLOAT_GRADED)],
        stdout=_log, stderr=subprocess.STDOUT), _out, _log)


@atexit.register
def _reap_runners():
    """Don't leak JVMs when the suite exits before the test runs
    (-x on an earlier failure, -k deselection, --collect-only)."""
    for proc, _, log in _PROCS.values():
        if proc.poll() is None:
            proc.kill()
            proc.wait()
        log.close()


def test_float_graded_slots_stable_across_parallelism():
    results = {}
    for master, (proc, out, log) in _PROCS.items():
        try:
            proc.wait(timeout=900)
        except subprocess.TimeoutExpired:
            proc.kill()
            raise
        log.flush()
        tail = open(log.name).read()[-3000:]
        assert proc.returncode == 0, f"{master} runner failed:\n{tail}"
        results[master] = json.loads(open(out).read())
    a, b = results["local[2]"], results["local[32]"]
    for slot in FLOAT_GRADED:
        assert a[slot] == b[slot], (
            f"{slot}: output differs between local[2] and local[32] — "
            f"a float-graded value sits on a rounding boundary; widen "
            f"that value's grading grain (first diff: "
            f"{next((x, y) for x, y in zip(a[slot], b[slot]) if x != y)})")

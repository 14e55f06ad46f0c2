"""Oracle-slot hygiene (VERDICT r8 item 5): the driver's 50-slot cap is
full, so related kernels share slots via tag columns (part / mode /
src_col / method, or key prefixes).  A future edit that adds or renames
a tag on the Spark side but not in the DuckDB SQL would silently grade
the new rows against nothing (row-count mismatch at best, a hash pass
on stale semantics at worst).  This test runs every tagged slot at
sf0.001 and asserts each tag value present in the Spark frame appears
as a quoted literal in the registered oracle SQL."""

import re

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark import oracle

# slot -> tag column whose distinct values must all appear as '<tag>'
# literals in the oracle SQL
TAGGED = {
    "corr_matrix": "col_x",   # column names + catassoc/fd/key tags
    "histogram_bins": "src_col",
    "freq_topk": "part",
    "freq_other_bucket": "part",
    "date_minmax": "part",
    "token_count_bpe": "part",
    "dedup_exact_docs": "part",
    "knn_bruteforce": "part",
    "embedding_neardup_exact": "part",
    "multimodal_meta": "part",
    "minhash_native_pairs": "part",
    "ann_recall_gates": "method",
    "multidim_agg_counts": "mode",
    "asof_click_attribution": "part",
    "embedding_array_stats": "part",
    "hash_sampling_suite": "part",   # r13: + folded 'mix:' mixture rows
    "streaming_psi_events": "metric",  # r13: + folded 'bat:' drift rows
    # token_count_bpe (tag 'part', listed above) also hosts the folded
    # 'vocab:'-prefixed rows since r13 — same tag column, no new entry.
}

# slot -> column whose 'prefix:' headers (text before the first colon,
# when followed by more text) must appear in the oracle SQL
PREFIXED = {
    "stateful_user_totals": "key",
    "universal_documents": "column_name",
    "sliding_window_events": "key",
}

SF = "/root/testdata/sf0.001"


def _tag_failures(spark, slot):
    """Missing-tag report for one TAGGED slot ([] = clean)."""
    sql = oracle.ORACLE_SQL[slot]
    df = oracle.SPARK_QUERIES[slot](spark, SF)
    tags = [r[0] for r in
            df.select(TAGGED[slot]).distinct().collect()]
    if not tags:
        return [f"{slot}: no tag values at sf0.001?"]

    def graded(t):
        if f"'{t}'" in sql:
            return True
        # composite tags ('split:train') may be built in SQL as
        # 'split:' || <expr> — the prefix literal is the graded anchor
        return ":" in t and f"'{t.split(':', 1)[0]}:" in sql

    missing = [t for t in tags if not graded(t)]
    if missing:
        return [f"{slot}: Spark emits tag(s) {missing} with no quoted "
                f"literal in the oracle SQL — the DuckDB side no "
                f"longer grades them"]
    return []


def _prefix_failures(spark, slot):
    """Missing-prefix report for one PREFIXED slot ([] = clean)."""
    sql = oracle.ORACLE_SQL[slot]
    df = oracle.SPARK_QUERIES[slot](spark, SF)
    col = PREFIXED[slot]
    keys = [r[0] for r in df.select(col).distinct().collect()]
    prefixes = sorted({m.group(1) for k in keys
                       for m in [re.match(r"^([A-Za-z_][A-Za-z0-9_]*):.", k)]
                       if m})
    if not prefixes:
        return [f"{slot}: no prefixed keys at sf0.001?"]
    missing = [p for p in prefixes if f"'{p}:" not in sql]
    if missing:
        return [f"{slot}: Spark emits key prefix(es) {missing} with no "
                f"'{missing[0]}:' literal in the oracle SQL"]
    return []


def test_every_spark_tag_and_prefix_is_in_oracle_sql(spark):
    """All TAGGED + PREFIXED slots in ONE test, evaluated from a small
    thread pool: the slots are heavyweight grading composites
    (ann_recall_gates alone ran 115s serially) and Spark schedules
    concurrent jobs natively, so pooling cuts this family ~3-4x while
    keeping the assertions identical (failures are aggregated with the
    same per-slot messages the parametrized version raised)."""
    from concurrent.futures import ThreadPoolExecutor
    from pyspark import inheritable_thread_target
    work = ([(s, _tag_failures) for s in sorted(TAGGED)]
            + [(s, _prefix_failures) for s in sorted(PREFIXED)])
    with ThreadPoolExecutor(max_workers=6) as pool:
        reports = list(pool.map(
            inheritable_thread_target(
                lambda sf: sf[1](spark, sf[0])), work))
    failures = [line for rep in reports for line in rep]
    assert not failures, "\n".join(failures)


def test_no_oracle_query_emits_hugeint_or_decimal():
    """VERDICT r10 item 1/2: DuckDB ``sum(BIGINT)`` returns HUGEINT and
    UNION ALL promotes the whole column; the driver's hasher reads DuckDB
    results through pandas, where HUGEINT (and DECIMAL) degrade to
    float64 and render ``N.0`` against Spark's ``N`` — rows/schema pass,
    hash fails (the exact r10 freq_topk / hash_sampling_suite regression).
    Guard: type-check every registered oracle query (``.types`` plans
    without executing, so this is seconds over all 50)."""
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    bad = {}
    for name, sql in oracle.ORACLE_SQL.items():
        rel = con.sql(sql)
        offenders = [f"{c}:{t}" for c, t in zip(rel.columns, rel.types)
                     if "HUGEINT" in str(t) or "DECIMAL" in str(t)]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        f"oracle queries emit pandas-unsafe column types (wrap the "
        f"aggregate in CAST(... AS BIGINT)): {bad}")


def test_registry_sides_agree():
    """Every queries() entry either has oracle SQL or is a documented
    rows-only slot; no SQL is registered for a nonexistent query."""
    orphans = set(oracle.ORACLE_SQL) - set(oracle.SPARK_QUERIES)
    assert not orphans, f"oracle SQL without a Spark query: {orphans}"

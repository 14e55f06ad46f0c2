"""Canary: the driver regenerates /root/testdata between rounds; if a
table's physical schema drifts from what the oracle queries assume, fail
HERE with a loud message instead of breaking N queries mysteriously
(round 4 lost 7 oracle queries to an unnoticed events.ts dtype change).

EXPECTED pins the schema the CURRENT green oracle suite runs against
(Spark simpleString dtypes).  A set per column lists every encoding the
adapters are known to handle — events.ts is the one with history.
"""

import pytest

EXPECTED = {
    "lineitem": {"l_orderkey": {"bigint"}, "l_partkey": {"bigint"},
                 "l_suppkey": {"bigint"}, "l_linenumber": {"int"},
                 "l_quantity": {"double"}, "l_extendedprice": {"double"},
                 "l_discount": {"double"}, "l_tax": {"double"},
                 "l_returnflag": {"string"}, "l_linestatus": {"string"},
                 "l_shipdate": {"timestamp_ntz", "date"}},
    "orders": {"o_orderkey": {"bigint"}, "o_custkey": {"bigint"},
               "o_orderstatus": {"string"}, "o_totalprice": {"double"},
               "o_orderdate": {"timestamp_ntz", "date"},
               "o_orderpriority": {"string"}},
    "customer": {"c_custkey": {"bigint"}, "c_name": {"string"},
                 "c_nationkey": {"int"}, "c_acctbal": {"double"},
                 "c_mktsegment": {"string"}},
    "nation": {"n_nationkey": {"int"}, "n_name": {"string"},
               "n_regionkey": {"int"}},
    "region": {"r_regionkey": {"int"}, "r_name": {"string"}},
    "supplier": {"s_suppkey": {"bigint"}, "s_name": {"string"},
                 "s_nationkey": {"int"}, "s_acctbal": {"double"}},
    "part": {"p_partkey": {"bigint"}, "p_name": {"string"},
             "p_brand": {"string"}, "p_type": {"string"},
             "p_size": {"int"}, "p_retailprice": {"double"}},
    "events": {"event_id": {"bigint"},
               # TIMESTAMP(NANOS)->bigint (legacy conf) or
               # timestamp[us]->ntz; sources.with_event_time adapts
               "ts": {"bigint", "timestamp", "timestamp_ntz"},
               "user_id": {"bigint"}, "event_type": {"string"},
               "value": {"double"}, "props": {"string"}},
    "documents": {"doc_id": {"bigint"}, "text": {"string"},
                  "lang": {"string"}, "source": {"string"},
                  "n_chars": {"bigint"}},
    "embeddings": {"vec_id": {"bigint"},
                   "embedding": {"array<float>", "array<double>"},
                   "label": {"int", "bigint"}},
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_driver_table_schema_matches_oracle_assumptions(spark, sf_dir,
                                                        table):
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    dtypes = dict(df.dtypes)
    problems = []
    for col, allowed in EXPECTED[table].items():
        if col not in dtypes:
            problems.append(f"column {col!r} MISSING (have {sorted(dtypes)})")
        elif dtypes[col] not in allowed:
            problems.append(
                f"column {col!r} is {dtypes[col]!r}, oracle queries assume "
                f"one of {sorted(allowed)}")
    extra = sorted(set(dtypes) - set(EXPECTED[table]))
    if extra:
        problems.append(f"NEW columns {extra} not covered by the profile "
                        f"oracle queries")
    assert not problems, (
        f"DRIVER DATA DRIFT in {table}.parquet — update the oracle "
        f"adapters (and this canary):\n  " + "\n  ".join(problems))


def test_events_user_ts_unique_for_acf_ordering(spark, sf_dir):
    """The stateful_user_totals 'acf:' fold orders each user's events by
    ts alone; a (user_id, ts) collision would make the lag-1 pairing
    engine-dependent.  Unique today at every SF — fail loudly on drift
    (remedy: extend the autocorr oracle ordering with a tiebreaker)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F
    n, nd = ev.agg(
        F.count(F.lit(1)),
        F.count_distinct("user_id", "ts")).collect()[0]
    assert n == nd, "events (user_id, ts) no longer unique"


def test_documents_doc_id_space_is_contiguous(spark, sf_dir):
    """VERDICT r10 item 3: the lsplit/rep oracle replay
    (oracle.py hash_sampling_suite / dedup slots) collapses the planted
    doc_id -> doc_id+1 decade chains to the CLOSED FORM
    ``(doc_id // 10) * 10`` — valid only while the doc_id space is
    gap-free from its minimum.  A driver testdata regeneration with id
    gaps would split decades into several true components and fail the
    slot mysteriously while the operator stays correct.  Make that
    failure loud and attributed here instead."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    from pyspark.sql import functions as F
    n, lo, hi, nd = docs.agg(
        F.count(F.lit(1)), F.min("doc_id"), F.max("doc_id"),
        F.count_distinct("doc_id")).collect()[0]
    assert n == nd, "documents doc_id no longer unique"
    assert n == hi - lo + 1, (
        f"documents doc_id space has GAPS (count={n}, min={lo}, max={hi})"
        " — the lsplit/rep closed-form oracle replay is now wrong; "
        "switch it to a recursive-CTE component replay (semdedup "
        "precedent) before trusting hash_sampling_suite")

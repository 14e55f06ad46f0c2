"""Round-12 continuation operators: Poisson-bootstrap uncertainty,
gains/lift curves, BPE pair counting, Krippendorff's alpha.

Each operator is pinned against a pure-Python reference on constructed
fixtures (the oracle slots grade the same kernels against DuckDB on the
driver tables; these tests cover branches driver data can't reach).
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from spark_df_profiling_spark.operators.sampling import (
    POISSON1_CUTS, bootstrap_ci, bootstrap_replicates)


def _bucket(key: str, seed: int = 0) -> int:
    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:15],
               16) % 1_000_000


def _w(bucket: int) -> int:
    for i, c in enumerate(POISSON1_CUTS):
        if bucket < c:
            return i
    return 9


@pytest.fixture(scope="module")
def boot_df(spark):
    rows = [(i, "g%d" % (i % 3), (i * 37) % 101 + 1)
            for i in range(300)]
    return spark.createDataFrame(rows, "id long, g string, v long")


class TestBootstrapReplicates:
    def test_matches_python_md5_reference(self, spark, boot_df):
        out = bootstrap_replicates(boot_df, "v", "id", n_boot=5,
                                   group_col="g",
                                   hash_fn="md5").collect()
        ref = {}
        for i in range(300):
            g, v = "g%d" % (i % 3), (i * 37) % 101 + 1
            for b in range(5):
                w = _w(_bucket(f"{i}#{b}"))
                s, n = ref.get((g, b), (0, 0))
                ref[(g, b)] = (s + w * v, n + w)
        assert len(out) == 15
        for r in out:
            s, n = ref[(r.g, r.b)]
            assert (int(r.sum_wv), r.n_eff) == (s, n)
            assert r.boot_mean == pytest.approx(s / n)

    def test_xxhash_path_weights_are_poissonish(self, spark, boot_df):
        # xxhash64 path: not engine-portable, but n_eff must center on
        # the row count (E[w] = 1.000006)
        out = bootstrap_replicates(boot_df, "v", "id", n_boot=20,
                                   hash_fn="xxhash64").collect()
        assert len(out) == 20
        mean_neff = sum(r.n_eff for r in out) / 20
        assert 300 * 0.85 < mean_neff < 300 * 1.15

    def test_null_ids_and_values_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 10), (None, 20), (2, None), (3, 30)],
            "id long, v long")
        out = bootstrap_replicates(df, "v", "id", n_boot=3,
                                   hash_fn="md5").collect()
        # every replicate resamples only ids {1, 3}: n_eff <= 2*9
        assert all(r.n_eff <= 18 for r in out)
        ws = {i: _w(_bucket(f"{i}#0")) for i in (1, 3)}
        r0 = [r for r in out if r.b == 0][0]
        assert r0.n_eff == ws[1] + ws[3]
        assert int(r0.sum_wv) == ws[1] * 10 + ws[3] * 30

    def test_n_boot_bounds(self, boot_df):
        with pytest.raises(ValueError):
            bootstrap_replicates(boot_df, "v", "id", n_boot=1)
        with pytest.raises(ValueError):
            bootstrap_replicates(boot_df, "v", "id", n_boot=201)
        with pytest.raises(ValueError):
            bootstrap_replicates(boot_df, "v", "id", hash_fn="sha9")

    def test_single_scan_single_exchange(self, spark, boot_df):
        # the 100 TB contract: ONE scan, map-side combine, one exchange
        # keyed by the group — never a row explosion by replicate
        plan = (bootstrap_replicates(boot_df, "v", "id", n_boot=41,
                                     group_col="g")
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1
        assert plan.count("Scan") == 1


class TestBootstrapCI:
    def test_ci_matches_python_percentile(self, spark, boot_df):
        out = {r.g: r for r in
               bootstrap_ci(boot_df, "v", "id", n_boot=41,
                            level=0.95, group_col="g",
                            hash_fn="md5").collect()}
        for gi in range(3):
            g = "g%d" % gi
            vals = [((i * 37) % 101 + 1, i) for i in range(300)
                    if i % 3 == gi]
            ms = []
            for b in range(41):
                s = n = 0
                for v, i in vals:
                    w = _w(_bucket(f"{i}#{b}"))
                    s += w * v
                    n += w
                ms.append(s / n)
            ms.sort()
            r = out[g]
            assert r.n == len(vals)
            assert r.mean == pytest.approx(
                sum(v for v, _ in vals) / len(vals))
            assert r.n_boot == 41
            # h = 40*0.025 = 1.0 exactly -> pure element picks
            assert r.ci_lo == pytest.approx(ms[1], abs=1e-12)
            assert r.ci_hi == pytest.approx(ms[39], abs=1e-12)
            mbar = sum(ms) / 41
            se = math.sqrt(sum((x - mbar) ** 2 for x in ms) / 40)
            assert r.boot_se == pytest.approx(se, rel=1e-9)
            assert r.ci_lo < r.mean < r.ci_hi

    def test_interpolation_between_elements(self, spark, boot_df):
        # n_boot=10, level=0.9 -> h = 9*0.05 = 0.45: real interpolation
        r = bootstrap_ci(boot_df, "v", "id", n_boot=10, level=0.9,
                         hash_fn="md5").collect()[0]
        ms = []
        for b in range(10):
            s = n = 0
            for i in range(300):
                w = _w(_bucket(f"{i}#{b}"))
                s += w * ((i * 37) % 101 + 1)
                n += w
            ms.append(s / n)
        ms.sort()
        assert r.ci_lo == pytest.approx(
            ms[0] + (ms[1] - ms[0]) * 0.45, abs=1e-12)
        assert r.ci_hi == pytest.approx(
            ms[8] + (ms[9] - ms[8]) * 0.55, abs=1e-12)

    def test_level_bounds(self, boot_df):
        with pytest.raises(ValueError):
            bootstrap_ci(boot_df, "v", "id", level=1.0)
        with pytest.raises(ValueError):
            bootstrap_ci(boot_df, "v", "id", level=0.0)

    def test_tiny_group_empty_replicates_excluded(self, spark):
        # a 1-row group: some replicates draw it empty (w=0, p~0.37);
        # they must be excluded, not folded in as NULL/0 means
        df = spark.createDataFrame(
            [(i, "big", 10) for i in range(50)] + [(999, "one", 7)],
            "id long, g string, v long")
        out = {r.g: r for r in
               bootstrap_ci(df, "v", "id", n_boot=41, group_col="g",
                            hash_fn="md5").collect()}
        one = out["one"]
        drawn = sum(1 for b in range(41)
                    if _w(_bucket(f"999#{b}")) > 0)
        assert one.n_boot == drawn
        # every surviving replicate mean of a 1-row group is exactly v
        assert one.ci_lo == one.ci_hi == 7.0
        assert one.boot_se == pytest.approx(0.0, abs=1e-12)


class TestMixturePlanBudgetCoversAll:
    def test_single_source_budget_equals_cap(self, spark):
        # r12 regression (hypothesis find): one source, budget == cap
        # -> the last sorted row saturates with no λ_k; the water
        # level must be +inf (target = cap), not -inf
        from spark_df_profiling_spark.operators.sampling import (
            mixture_plan)
        df = spark.createDataFrame([("s0", 1, 1.0)],
                                   "source string, n_tokens long, "
                                   "weight double")
        r = mixture_plan(df, 1.0, max_epochs=1.0).collect()[0]
        assert r.target_tokens == 1.0
        assert r.epochs == 1.0
        assert r.saturated
        assert r.budget_unmet == 0.0

    def test_budget_exceeds_every_cap(self, spark):
        from spark_df_profiling_spark.operators.sampling import (
            mixture_plan)
        df = spark.createDataFrame(
            [("a", 100, 1.0), ("b", 50, 3.0)],
            "source string, n_tokens long, weight double")
        out = {r.source: r for r in
               mixture_plan(df, 1000.0, max_epochs=2.0).collect()}
        assert out["a"].target_tokens == 200.0
        assert out["b"].target_tokens == 100.0
        assert all(r.saturated for r in out.values())
        assert out["a"].budget_unmet == pytest.approx(700.0)


class TestGainsCurve:
    @staticmethod
    def _py_gains(vals, n_buckets):
        from collections import defaultdict
        agg = defaultdict(lambda: [0, 0])
        for s, y in vals:
            agg[s][0] += 1
            agg[s][1] += y
        n_all = len(vals)
        n_pos = sum(y for _, y in vals)
        groups = sorted(agg.items(), key=lambda kv: -kv[0])
        out = {}
        for k in range(1, n_buckets + 1):
            depth = -(-n_all * k // n_buckets)
            ac = ap = 0
            for s, (c, p) in groups:
                if ac < depth <= ac + c:
                    cum = ap + (depth - ac) * p / c
                    out[k] = (depth, cum, cum / n_pos,
                              cum * n_all / (depth * n_pos))
                    break
                ac += c
                ap += p
        return out

    @pytest.fixture(scope="class")
    def scored(self, spark):
        # 13 distinct scores over 1000 rows: every bucket boundary
        # lands INSIDE a tie group, exercising the proportional split
        rows = [(i, "g%d" % (i % 2), float((i * 7) % 13),
                 1 if (i * 11) % 100 < ((i * 7) % 13) * 7 else 0)
                for i in range(1000)]
        return spark.createDataFrame(rows,
                                     "id long, g string, s double, "
                                     "y int")

    def test_matches_python_reference_grouped(self, spark, scored):
        from spark_df_profiling_spark.operators.evaluation import (
            gains_curve)
        got = gains_curve(scored, "y", "s", n_buckets=10,
                          group_col="g").collect()
        assert len(got) == 20
        for gname in ("g0", "g1"):
            vals = [(float((i * 7) % 13),
                     1 if (i * 11) % 100 < ((i * 7) % 13) * 7 else 0)
                    for i in range(1000) if i % 2 == int(gname[1])]
            ref = self._py_gains(vals, 10)
            for r in (x for x in got if x.g == gname):
                d, cum, gn, lf = ref[r.bucket]
                assert r.depth == d
                assert r.cum_pos == pytest.approx(cum, abs=1e-9)
                assert r.gain == pytest.approx(gn, abs=1e-12)
                assert r.lift == pytest.approx(lf, abs=1e-12)

    def test_keyless_endpoints(self, spark, scored):
        from spark_df_profiling_spark.operators.evaluation import (
            gains_curve)
        by_k = {r.bucket: r for r in
                gains_curve(scored, "y", "s", 10).collect()}
        assert by_k[10].depth == 1000
        assert by_k[10].gain == 1.0
        assert by_k[10].lift == pytest.approx(1.0, abs=1e-12)
        assert by_k[1].lift > 1.5  # the scorer is informative on top

    def test_no_positives_yields_nulls(self, spark, scored):
        from spark_df_profiling_spark.operators.evaluation import (
            gains_curve)
        zero = scored.withColumn("y", F.lit(0))
        out = gains_curve(zero, "y", "s", 5).collect()
        assert len(out) == 5
        assert all(r.gain is None and r.lift is None for r in out)

    def test_small_n_buckets_exceed_rows(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            gains_curve)
        df = spark.createDataFrame(
            [(1, 3.0, 1), (2, 2.0, 0), (3, 1.0, 1)],
            "id long, s double, y int")
        out = {r.bucket: r for r in
               gains_curve(df, "y", "s", 10).collect()}
        # depth = ceil(3k/10): never 0, last = 3
        assert out[1].depth == 1 and out[10].depth == 3
        assert out[1].cum_pos == 1.0       # top score is a positive
        assert out[10].gain == 1.0

    def test_bounds(self, spark, scored):
        from spark_df_profiling_spark.operators.evaluation import (
            gains_curve)
        with pytest.raises(ValueError):
            gains_curve(scored, "y", "s", 0)
        with pytest.raises(ValueError):
            gains_curve(scored, "y", "s", 1001)

    def test_bucket_join_broadcasts_under_aqe(self, spark, scored):
        """r13: the bucket frame lost its unconditional broadcast
        hint (unbounded at extreme group cardinality — VERDICT r12
        #3); for the common small-#groups case AQE must still pick a
        broadcast join at runtime from the localCheckpoint-ed stats,
        so assert on the FINAL adaptive plan after execution."""
        from spark_df_profiling_spark.operators.evaluation import (
            gains_curve)
        out = gains_curve(scored, "y", "s", 10, group_col="g")
        out.collect()
        plan = (out._jdf.queryExecution().executedPlan().toString())
        assert "isFinalPlan=true" in plan
        assert "BroadcastHashJoin" in plan


class TestBPE:
    TEXTS = ["the cat sat on the mat", "the rat ate the cheese",
             "that hat is flat", "aaa banana bandana", "aaaa aaaaaa"]

    @staticmethod
    def _py_train(texts, n, min_count=2):
        from collections import Counter
        hist = Counter(w for t in texts for w in t.split(" ") if w)
        seqs = [([ch for ch in w], c) for w, c in hist.items()]
        merges = []
        for r in range(1, n + 1):
            pc = Counter()
            for syms, cnt in seqs:
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += cnt
            if not pc:
                break
            (a, b), cnt = min(
                pc.items(),
                key=lambda kv: (-kv[1],
                                kv[0][0] + "\x1f" + kv[0][1]))
            if cnt < min_count:
                break
            merges.append((r, a, b, a + b, cnt))
            new = []
            for syms, c in seqs:
                out = []
                for x in syms:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                new.append((out, c))
            seqs = new
        return merges

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        return spark.createDataFrame([(t,) for t in self.TEXTS],
                                     "text string")

    def test_train_matches_python(self, spark, corpus):
        from spark_df_profiling_spark.operators.text import bpe_train
        ref = self._py_train(self.TEXTS, 10)
        got = bpe_train(corpus, "text", n_merges=10)
        assert got == ref
        # the overlap cases are IN the fixture: 'aaaa'/'aaaaaa' force
        # left-to-right non-overlapping ('aa','aa') merges, and
        # banana/bandana force whole-symbol (not substring) matching
        assert ("a", "a") in {(a, b) for _, a, b, _, _ in got}

    def test_pair_counts_match_python(self, spark, corpus):
        from collections import Counter

        from spark_df_profiling_spark.operators.text import (
            bpe_pair_counts)
        hist = Counter(w for t in self.TEXTS for w in t.split(" ")
                       if w)
        pc = Counter()
        for w, c in hist.items():
            for i in range(len(w) - 1):
                pc[(w[i], w[i + 1])] += c
        top = sorted(pc.items(),
                     key=lambda kv: (-kv[1],
                                     kv[0][0] + "\x1f" + kv[0][1]))[:8]
        got = sorted(bpe_pair_counts(corpus, "text", k=8).collect(),
                     key=lambda r: r.rank)
        assert [((r.sym_a, r.sym_b), r.cnt) for r in got] == top

    def test_min_pair_count_stops_early(self, spark):
        from spark_df_profiling_spark.operators.text import bpe_train
        df = spark.createDataFrame([("ab cd",)], "text string")
        # every pair appears once: below min_pair_count=2 -> no merges
        assert bpe_train(df, "text", n_merges=5) == []
        got = bpe_train(df, "text", n_merges=5, min_pair_count=1)
        assert len(got) > 0

    def test_max_word_types_cap_is_deterministic(self, spark, corpus):
        from spark_df_profiling_spark.operators.text import (
            _bpe_word_hist)
        capped = _bpe_word_hist(corpus, "text", 3).collect()
        # top-3 word types by (cnt desc, word asc): 'the' (4) first
        words = {r.word for r in capped}
        assert len(words) == 3 and "the" in words

    def test_bounds(self, corpus):
        from spark_df_profiling_spark.operators.text import (
            bpe_pair_counts, bpe_train)
        with pytest.raises(ValueError):
            bpe_train(corpus, "text", n_merges=0)
        with pytest.raises(ValueError):
            bpe_train(corpus, "text", min_pair_count=0)
        with pytest.raises(ValueError):
            bpe_pair_counts(corpus, "text", k=0)


class TestKrippendorffAlpha:
    DATA = {1: [1, 1, 1], 2: [2, 2, 2], 3: [3, 3, 3, 3],
            4: [3, 3, 3, 3], 5: [2, 2, 2, 2], 6: [1, 2, 3, 4],
            7: [4, 4, 4, 4], 8: [1, 1, 2, 1], 9: [2, 2, 2, 2],
            10: [5, 5, 5], 11: [1, 1, 1], 12: [3, 3, 3],
            13: [3]}  # single rating -> excluded (not pairable)

    @staticmethod
    def _py_alpha(data, metric):
        from collections import Counter
        pair = {i: vs for i, vs in data.items() if len(vs) >= 2}
        n = sum(len(vs) for vs in pair.values())
        do_sum = 0.0
        for vs in pair.values():
            m = len(vs)
            c = Counter(vs)
            if metric == "nominal":
                num = m * m - sum(k * k for k in c.values())
            else:
                s1, s2 = sum(vs), sum(x * x for x in vs)
                num = 2 * (m * s2 - s1 * s1)
            do_sum += num / (m - 1)
        do = do_sum / n
        allv = [v for vs in pair.values() for v in vs]
        cc = Counter(allv)
        if metric == "nominal":
            de = (n * n - sum(k * k for k in cc.values())) \
                / (n * (n - 1))
        else:
            s1, s2 = sum(allv), sum(x * x for x in allv)
            de = 2 * (n * s2 - s1 * s1) / (n * (n - 1))
        return 1 - do / de, do, de, n

    @pytest.fixture(scope="class")
    def ratings(self, spark):
        rows = [(i, v) for i, vs in self.DATA.items() for v in vs]
        return spark.createDataFrame(rows, "item int, v int")

    @pytest.mark.parametrize("metric", ["nominal", "interval"])
    def test_matches_python_reference(self, spark, ratings, metric):
        from spark_df_profiling_spark.operators.correlation import (
            krippendorff_alpha)
        r = krippendorff_alpha(ratings, "item", "v",
                               metric).collect()[0]
        pa, pdo, pde, pn = self._py_alpha(self.DATA, metric)
        assert r.n_items == 12          # item 13 excluded
        assert r.n_ratings == pn
        assert r.min_raters == 2 or r.min_raters == 3
        assert r.d_o == pytest.approx(pdo, rel=1e-12)
        assert r.d_e == pytest.approx(pde, rel=1e-12)
        assert r.alpha == pytest.approx(pa, rel=1e-12)

    def test_perfect_agreement_with_variation(self, spark):
        # distinct values across items but unanimous within each:
        # d_o = 0, d_e > 0 -> alpha = 1 exactly
        from spark_df_profiling_spark.operators.correlation import (
            krippendorff_alpha)
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (2, "b"), (2, "b")],
            "item int, v string")
        r = krippendorff_alpha(df, "item", "v").collect()[0]
        assert r.d_o == 0.0 and r.alpha == 1.0

    def test_constant_ratings_alpha_null(self, spark):
        from spark_df_profiling_spark.operators.correlation import (
            krippendorff_alpha)
        df = spark.createDataFrame(
            [(1, 5), (1, 5), (2, 5), (2, 5)], "item int, v int")
        r = krippendorff_alpha(df, "item", "v").collect()[0]
        assert r.d_e == 0.0 and r.alpha is None

    def test_systematic_disagreement_negative(self, spark):
        from spark_df_profiling_spark.operators.correlation import (
            krippendorff_alpha)
        df = spark.createDataFrame(
            [(i, v) for i in range(10) for v in ("x", "y")],
            "item int, v string")
        r = krippendorff_alpha(df, "item", "v").collect()[0]
        # every item maximally split -> worse than chance
        assert r.alpha < 0

    def test_metric_validation(self, spark, ratings):
        from spark_df_profiling_spark.operators.correlation import (
            krippendorff_alpha)
        with pytest.raises(ValueError):
            krippendorff_alpha(ratings, "item", "v", "ratio")


class TestStatefulDistinctSample:
    def test_availablenow_equals_batch_twin(self, spark, sf_dir):
        from spark_df_profiling_spark.operators.sampling import (
            sample_exact_k)
        from spark_df_profiling_spark.streaming import (
            events_stream, run_stream_to_memory,
            stateful_distinct_sample)
        stream = events_stream(spark, sf_dir)
        out = stateful_distinct_sample(
            stream.select("user_id", "event_id"),
            "user_id", "event_id", k=5, seed=0)
        run_stream_to_memory(out, "t_ssmp_out", output_mode="update")
        got = {(r.key, r.sample_id) for r in
               spark.table("t_ssmp_out").collect()
               if r.key is not None}
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        batch = {(r.user_id, r.event_id) for r in
                 sample_exact_k(ev.select("user_id", "event_id"),
                                "user_id", 5, "event_id", seed=0)
                 .where("user_id is not null").collect()}
        assert got == batch and len(got) > 0

    def test_rank_follows_md5_priority(self, spark, sf_dir):
        import hashlib
        rows = spark.table("t_ssmp_out").collect()
        by_user = {}
        for r in rows:
            if r.key is not None:
                by_user.setdefault(r.key, []).append(r)
        u, urows = sorted(by_user.items())[0]
        urows.sort(key=lambda r: r.rank)
        for r in urows:
            b = int(hashlib.md5(f"{r.sample_id}:0".encode())
                    .hexdigest()[:15], 16) % 1_000_000
            assert r.bucket == b
        assert [tuple(x) for x in
                sorted((r.bucket, r.sample_id) for r in urows)] \
            == [(r.bucket, r.sample_id) for r in urows]

    def test_order_independence_and_dedup(self, spark, tmp_path):
        # the SET of ids determines the sample: two multi-batch runs
        # over the same ids in different arrival orders, with
        # duplicates, end in the identical state
        import hashlib

        from spark_df_profiling_spark.streaming import (
            run_stream_to_memory, stateful_distinct_sample)

        def run(name, batches):
            src = tmp_path / name
            for i, ids in enumerate(batches):
                spark.createDataFrame(
                    [(1, x) for x in ids],
                    "user_id long, event_id long").coalesce(1) \
                    .write.parquet(str(src / f"b{i}"))
            stream = (spark.readStream
                      .schema("user_id long, event_id long")
                      .option("maxFilesPerTrigger", "1")
                      .parquet(str(src) + "/*"))
            out = stateful_distinct_sample(stream, "user_id",
                                           "event_id", k=7, seed=0)
            run_stream_to_memory(out, f"t_{name}",
                                 output_mode="update")
            rows = spark.table(f"t_{name}").collect()
            last_n = max(r.n_events for r in rows)
            return {(r.rank, r.sample_id) for r in rows
                    if r.n_events == last_n}

        ids = list(range(100))
        sa = run("ordA", [ids[:60], ids[40:] + ids[:10]])  # dups
        sb = run("ordB", [list(reversed(ids))])
        assert sa == sb and len(sb) == 7
        # and the state really is min-7 by md5 priority over the set
        want = sorted(
            ids, key=lambda i: (int(hashlib.md5(f"{i}:0".encode())
                                    .hexdigest()[:15], 16) % 1_000_000,
                                i))[:7]
        assert [i for _, i in sorted(sb)] == want

    def test_k_bounds_and_typing(self, spark, sf_dir):
        from spark_df_profiling_spark.streaming import (
            events_stream, stateful_distinct_sample)
        stream = events_stream(spark, sf_dir)
        with pytest.raises(ValueError):
            stateful_distinct_sample(stream, "user_id", "event_id",
                                     k=0)
        with pytest.raises(TypeError):
            stateful_distinct_sample(
                stream.select("user_id",
                              F.col("value").alias("event_id")),
                "user_id", "event_id", k=5)


class TestConformal:
    @pytest.fixture(scope="class")
    def cal(self, spark):
        rows = [(i, "g%d" % (i % 2), float((i * 13) % 97))
                for i in range(500)]
        return spark.createDataFrame(rows, "id long, g string, "
                                           "s double")

    def test_threshold_is_kth_order_statistic(self, spark, cal):
        import math

        from spark_df_profiling_spark.operators.evaluation import (
            conformal_threshold)
        out = {r.g: r for r in
               conformal_threshold(cal, "s", 0.1, "g").collect()}
        for gi in range(2):
            vals = sorted(float((i * 13) % 97) for i in range(500)
                          if i % 2 == gi)
            n = len(vals)
            k = math.ceil((n + 1) * 0.9)
            r = out["g%d" % gi]
            assert (r.n, r.k, r.threshold, r.feasible) == \
                (n, k, vals[k - 1], True)

    def test_tie_block_containing_rank(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            conformal_threshold)
        df = spark.createDataFrame(
            [(i, float(i % 5)) for i in range(1000)],
            "id long, s double")
        r = conformal_threshold(df, "s", 0.25).collect()[0]
        # k = ceil(1001*0.75) = 751 -> falls inside the 4th tie block
        assert (r.k, r.threshold) == (751, 3.0)

    def test_infeasible_small_calibration(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            conformal_threshold)
        df = spark.createDataFrame([(1, 1.0), (2, 2.0)],
                                   "id long, s double")
        r = conformal_threshold(df, "s", 0.1).collect()[0]
        assert (r.feasible, r.threshold, r.k) == (False, None, 3)

    def test_coverage_exact_integers(self, spark, cal):
        from spark_df_profiling_spark.operators.evaluation import (
            conformal_coverage, conformal_threshold)
        thr = conformal_threshold(cal, "s", 0.1, "g")
        tcol = {r.g: r.threshold for r in thr.collect()}
        test = spark.createDataFrame(
            [(i, "g%d" % (i % 2), float((i * 29 + 7) % 97))
             for i in range(400)], "id long, g string, s double")
        out = {r.g: r for r in
               conformal_coverage(test, thr, "s", "g").collect()}
        for gi in range(2):
            g = "g%d" % gi
            pyc = sum(1 for i in range(400) if i % 2 == gi
                      and float((i * 29 + 7) % 97) <= tcol[g])
            r = out[g]
            assert r.n_covered == pyc
            assert r.coverage == pytest.approx(pyc / r.n_test)
            assert r.coverage >= 0.85   # ~1 - alpha up to noise

    def test_alpha_bounds(self, cal):
        from spark_df_profiling_spark.operators.evaluation import (
            conformal_threshold)
        with pytest.raises(ValueError):
            conformal_threshold(cal, "s", 0.0)
        with pytest.raises(ValueError):
            conformal_threshold(cal, "s", 1.0)


class TestStreamingPSI:
    def test_availablenow_matches_python_replay(self, spark, sf_dir):
        import collections
        import math

        from spark_df_profiling_spark.operators.drift import (
            EPS, psi_reference)
        from spark_df_profiling_spark.sources import with_event_time
        from spark_df_profiling_spark.streaming import (
            events_stream, run_stream_to_memory, streaming_psi)
        ev = with_event_time(
            spark.read.parquet(f"{sf_dir}/events.parquet"))
        ref = psi_reference(ev, "value", bins=10)
        mn, mx, fracs = ref
        out = streaming_psi(events_stream(spark, sf_dir), "ts_ts",
                            "value", ref, window="1 day",
                            watermark="1 hour")
        run_stream_to_memory(out, "t_spsi_out",
                             output_mode="complete")
        got = {int(r.window_start.timestamp()): r
               for r in spark.table("t_spsi_out").collect()}
        assert len(got) > 1
        rows = ev.select("ts_ts", "value") \
                 .where("value is not null").collect()
        width = (mx - mn) / 10
        wins = collections.defaultdict(lambda: [0] * 10)
        for r in rows:
            ws = int(r.ts_ts.timestamp() // 86400) * 86400
            b = min(max(int(math.floor((r.value - mn) / width)), 0), 9)
            wins[ws][b] += 1
        for ws, cnts in wins.items():
            n = sum(cnts)
            psi = 0.0
            for b in range(10):
                p = max(fracs[b], EPS)
                q = max(cnts[b] / n, EPS)
                psi += (p - q) * math.log(p / q)
            r = got[ws]
            assert r.n == n
            assert r.psi == pytest.approx(psi, abs=1e-12)
            assert 0.0 <= r.jsd <= math.log(2) + 1e-12

    def test_planted_drift_scores_high(self, spark, tmp_path):
        # reference uniform on [0, 100); a drifted day concentrated in
        # [90, 100) must light up, a same-distribution day must not
        import datetime

        from spark_df_profiling_spark.operators.drift import (
            psi_reference)
        from spark_df_profiling_spark.streaming import (
            run_stream_to_memory, streaming_psi)
        base = datetime.datetime(2026, 1, 1)
        ref_rows = [(base, float(i % 100)) for i in range(2000)]
        ref_df = spark.createDataFrame(ref_rows,
                                       "ts timestamp, value double")
        ref = psi_reference(ref_df, "value", bins=10)
        day2 = base + datetime.timedelta(days=1)
        data = ([(base, float(i % 100)) for i in range(1000)]
                + [(day2, 90.0 + (i % 10)) for i in range(1000)])
        src = tmp_path / "spsi_src"
        spark.createDataFrame(data, "ts timestamp, value double") \
            .coalesce(1).write.parquet(str(src))
        stream = (spark.readStream
                  .schema("ts timestamp, value double")
                  .parquet(str(src)))
        out = streaming_psi(stream, "ts", "value", ref,
                            window="1 day", watermark="1 hour")
        run_stream_to_memory(out, "t_spsi_drift",
                             output_mode="complete")
        rows = sorted(spark.table("t_spsi_drift").collect(),
                      key=lambda r: r.window_start)
        assert len(rows) == 2
        calm, drifted = rows
        assert calm.psi < 0.05           # same distribution
        assert drifted.psi > 1.0         # mass collapsed to one bin
        assert drifted.jsd > calm.jsd

    def test_reference_validation(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            psi_reference)
        from spark_df_profiling_spark.streaming import streaming_psi
        df = spark.createDataFrame(
            [(None,)], "value double")
        with pytest.raises(ValueError):
            psi_reference(df, "value")
        with pytest.raises(ValueError):
            streaming_psi(df, "ts", "value", (0.0, 1.0, [1.0]))


class TestKrippendorffOrdinal:
    def test_matches_pairwise_reference(self, spark):
        # brute-force pairwise delta^2 over rank midpoints vs the
        # telescoped interval-on-midpoints closed form
        from collections import Counter

        from spark_df_profiling_spark.operators.correlation import (
            krippendorff_alpha)
        data = TestKrippendorffAlpha.DATA
        rows = [(i, v) for i, vs in data.items() for v in vs]
        df = spark.createDataFrame(rows, "item int, v int")
        r = krippendorff_alpha(df, "item", "v", "ordinal").collect()[0]
        pair = {i: vs for i, vs in data.items() if len(vs) >= 2}
        allv = [v for vs in pair.values() for v in vs]
        n = len(allv)
        cc = Counter(allv)
        rk, cum = {}, 0
        for g in sorted(cc):
            cum += cc[g]
            rk[g] = cum - cc[g] / 2
        do_sum = 0.0
        for vs in pair.values():
            m = len(vs)
            s = sum((rk[vs[a]] - rk[vs[b]]) ** 2
                    for a in range(m) for b in range(m) if a != b)
            do_sum += s / (m - 1)
        do = do_sum / n
        de = sum(cc[c] * cc[k] * (rk[c] - rk[k]) ** 2
                 for c in cc for k in cc) / (n * (n - 1))
        assert r.d_o == pytest.approx(do, rel=1e-12)
        assert r.d_e == pytest.approx(de, rel=1e-12)
        assert r.alpha == pytest.approx(1 - do / de, rel=1e-12)
        # half-integer midpoints: 4x the numerator is an exact integer
        assert r.sum_disagree_num * 4 == pytest.approx(
            round(r.sum_disagree_num * 4), abs=1e-9)

    def test_ordinal_vs_nominal_on_near_miss(self, spark):
        # raters disagree by ONE adjacent grade on every item: ordinal
        # must forgive (alpha near/above 0), nominal punishes hard
        from spark_df_profiling_spark.operators.correlation import (
            krippendorff_alpha)
        rows = []
        for i in range(60):
            g = i % 5
            rows += [(i, g), (i, min(g + 1, 5))]
        df = spark.createDataFrame(rows, "item int, v int")
        rn = krippendorff_alpha(df, "item", "v", "nominal") \
            .collect()[0]
        ro = krippendorff_alpha(df, "item", "v", "ordinal") \
            .collect()[0]
        assert ro.alpha > rn.alpha

    def test_ordinal_scale_invariance(self, spark):
        # ordinal depends only on the ORDER of values: relabeling
        # {1,2,3} -> {10, 200, 3000} must not change alpha
        from spark_df_profiling_spark.operators.correlation import (
            krippendorff_alpha)
        rows = [(i, (i * 7 + j) % 3 + 1) for i in range(40)
                for j in range(3)]
        a = spark.createDataFrame(rows, "item int, v int")
        remap = {1: 10, 2: 200, 3: 3000}
        b = spark.createDataFrame([(i, remap[v]) for i, v in rows],
                                  "item int, v int")
        ra = krippendorff_alpha(a, "item", "v", "ordinal").collect()[0]
        rb = krippendorff_alpha(b, "item", "v", "ordinal").collect()[0]
        assert ra.alpha == pytest.approx(rb.alpha, rel=1e-12)
        # interval distances, by contrast, see the stretch (alpha
        # itself is a ratio of quadratic forms and can coincide on
        # symmetric fixtures, but the disagreement mass must blow up)
        ia = krippendorff_alpha(a, "item", "v",
                                "interval").collect()[0]
        ib = krippendorff_alpha(b, "item", "v",
                                "interval").collect()[0]
        assert ib.sum_disagree_num > ia.sum_disagree_num * 1000


class TestSilhouetteSimplified:
    def test_matches_python_reference(self, spark):
        import math

        from spark_df_profiling_spark.operators.clustering import (
            silhouette_simplified)
        cents = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]]
        pts = [(i, [float((i * 7) % 5) - 2 + cents[i % 3][0],
                    float((i * 3) % 5) - 2 + cents[i % 3][1]])
               for i in range(120)]
        df = spark.createDataFrame(pts, "id long, embedding array<double>")
        out = {r.cluster: r for r in
               silhouette_simplified(df, cents).collect()}
        ref = {}
        for _, v in pts:
            ds = sorted(math.dist(v, c) for c in cents)
            a, b = ds[0], ds[1]
            cl = min(range(3),
                     key=lambda j: (math.dist(v, cents[j]) ** 2, j))
            s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
            n, ss, sa, sb = ref.get(cl, (0, 0.0, 0.0, 0.0))
            ref[cl] = (n + 1, ss + s, sa + a, sb + b)
        for cl, (n, ss, sa, sb) in ref.items():
            r = out[cl]
            assert r.n == n
            assert r.mean_silhouette == pytest.approx(ss / n,
                                                      rel=1e-9)
            assert r.mean_a == pytest.approx(sa / n, rel=1e-9)
            assert r.mean_b == pytest.approx(sb / n, rel=1e-9)
        # well-separated planted clusters score high
        assert all(r.mean_silhouette > 0.5 for r in out.values())

    def test_boundary_and_duplicate_centroids(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            silhouette_simplified)
        df = spark.createDataFrame(
            [(1, [5.0]), (2, [0.0]), (3, [10.0])],
            "id long, embedding array<double>")
        out = silhouette_simplified(df, [[0.0], [10.0]]).collect()
        by_c = {r.cluster: r for r in out}
        # the midpoint scores 0 (a == b) and lands in cluster 0 (tie)
        assert by_c[0].n == 2
        # duplicate centroids: everything equidistant -> s = 0
        dup = silhouette_simplified(df, [[0.0], [0.0]]).collect()
        assert all(r.mean_silhouette == 0.0 for r in dup
                   if r.cluster == 0)

    def test_needs_two_centroids(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            silhouette_simplified)
        df = spark.createDataFrame([(1, [0.0])],
                                   "id long, embedding array<double>")
        with pytest.raises(ValueError):
            silhouette_simplified(df, [[0.0]])


class TestClusterQuality:
    def test_matches_python_reference(self, spark):
        import math
        from collections import Counter

        from spark_df_profiling_spark.operators.clustering import (
            cluster_quality)
        cents = [[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]]
        pts = [(i, [float((i * 7) % 5) - 2 + cents[i % 3][0],
                    float((i * 3) % 5) - 2 + cents[i % 3][1]])
               for i in range(120)]
        df = spark.createDataFrame(pts,
                                   "id long, embedding array<double>")
        r = cluster_quality(df, cents).collect()[0]
        assign, d2s = [], []
        for _, v in pts:
            ds = [sum((a - b) ** 2 for a, b in zip(v, c))
                  for c in cents]
            m = min(ds)
            assign.append(ds.index(m))
            d2s.append(m)
        n, k = len(pts), 3
        within = sum(d2s)
        mean = [sum(v[i] for _, v in pts) / n for i in range(2)]
        cnt = Counter(assign)
        between = sum(cnt[j] * sum((cents[j][i] - mean[i]) ** 2
                                   for i in range(2)) for j in cnt)
        ch = (between / (k - 1)) / (within / (n - k))
        sg = {j: sum(math.sqrt(d2s[t]) for t in range(n)
                     if assign[t] == j) / cnt[j] for j in cnt}
        db = sum(max((sg[a] + sg[b])
                     / math.dist(cents[a], cents[b])
                     for b in cnt if b != a) for a in cnt) / len(cnt)
        assert (r.k_clusters, r.n) == (k, n)
        assert r.within_ss == pytest.approx(within, rel=1e-12)
        assert r.between_ss == pytest.approx(between, rel=1e-12)
        assert r.calinski_harabasz == pytest.approx(ch, rel=1e-12)
        assert r.davies_bouldin == pytest.approx(db, rel=1e-12)

    def test_degenerate_cases(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            cluster_quality)
        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [1.0, 1.0])],
            "id long, embedding array<double>")
        # k = 1: CH and DB undefined
        r1 = cluster_quality(df, [[0.5, 0.5]]).collect()[0]
        assert r1.calinski_harabasz is None
        assert r1.davies_bouldin is None
        # empty input raises
        with pytest.raises(ValueError):
            cluster_quality(df.where("id > 99"), [[0.0, 0.0]])
        with pytest.raises(ValueError):
            cluster_quality(df, [])

    def test_better_fit_scores_better(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            cluster_quality)
        pts = [(i, [0.0 + (i % 3) * 0.1]) for i in range(30)] + \
              [(100 + i, [50.0 + (i % 3) * 0.1]) for i in range(30)]
        df = spark.createDataFrame(pts,
                                   "id long, embedding array<double>")
        good = cluster_quality(df, [[0.1], [50.1]]).collect()[0]
        bad = cluster_quality(df, [[20.0], [30.0]]).collect()[0]
        assert good.calinski_harabasz > bad.calinski_harabasz
        assert good.davies_bouldin < bad.davies_bouldin


class TestRBO:
    @staticmethod
    def _py_rbo(A, B, k, p):
        s = 0.0
        for d in range(1, k + 1):
            s += (1 - p) * p ** (d - 1) \
                * len(set(A[:d]) & set(B[:d])) / d
        return s

    def test_matches_python_reference(self, spark):
        import random

        from spark_df_profiling_spark.operators.evaluation import (
            rbo_overlap)
        rng = random.Random(3)
        rows_a, rows_b, ref = [], [], {}
        for q in range(30):
            docs = [f"d{i}" for i in range(20)]
            A = rng.sample(docs, 10)
            B = rng.sample(docs, rng.choice([10, 6]))  # uneven too
            rows_a += [(q, d, r) for r, d in enumerate(A, 1)]
            rows_b += [(q, d, r) for r, d in enumerate(B, 1)]
            ref[q] = (self._py_rbo(A, B, 10, 0.9),
                      len(set(A) & set(B)))
        rows_a.append((99, "x", 1))     # one-sided query
        ref[99] = (self._py_rbo(["x"], [], 10, 0.9), 0)
        da = spark.createDataFrame(
            rows_a, "query_id long, neighbor_id string, rank int")
        db = spark.createDataFrame(
            rows_b, "query_id long, neighbor_id string, rank int")
        out = {r.query_id: r for r in
               rbo_overlap(da, db, k=10, p=0.9).collect()}
        assert len(out) == 31
        for q, (pr, pov) in ref.items():
            assert out[q].rbo == pytest.approx(pr, abs=1e-12)
            assert out[q].overlap_k == pov

    def test_identical_and_disjoint(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            rbo_overlap)
        a = spark.createDataFrame(
            [(1, "a", 1), (1, "b", 2)],
            "query_id long, neighbor_id string, rank int")
        r = rbo_overlap(a, a, k=2, p=0.5).collect()[0]
        # identical truncated lists: sum (1-p)p^(d-1) = 1 - p^k
        assert r.rbo == pytest.approx(1 - 0.5 ** 2, abs=1e-12)
        b = spark.createDataFrame(
            [(1, "z", 1), (1, "w", 2)],
            "query_id long, neighbor_id string, rank int")
        r2 = rbo_overlap(a, b, k=2, p=0.5).collect()[0]
        assert r2.rbo == 0.0 and r2.overlap_k == 0

    def test_top_weighting(self, spark):
        # agreeing at rank 1 beats agreeing at rank k
        from spark_df_profiling_spark.operators.evaluation import (
            rbo_overlap)
        a = spark.createDataFrame(
            [(1, d, r) for r, d in enumerate("abcde", 1)],
            "query_id long, neighbor_id string, rank int")
        top = spark.createDataFrame(
            [(1, d, r) for r, d in enumerate("avwxy", 1)],
            "query_id long, neighbor_id string, rank int")
        tail = spark.createDataFrame(
            [(1, d, r) for r, d in enumerate("vwxye", 1)],
            "query_id long, neighbor_id string, rank int")
        rt = rbo_overlap(a, top, k=5).collect()[0]
        rl = rbo_overlap(a, tail, k=5).collect()[0]
        assert rt.rbo > rl.rbo

    def test_bounds(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            rbo_overlap)
        df = spark.createDataFrame(
            [(1, "a", 1)], "query_id long, neighbor_id string, "
                           "rank int")
        with pytest.raises(ValueError):
            rbo_overlap(df, df, k=0)
        with pytest.raises(ValueError):
            rbo_overlap(df, df, p=1.0)


class TestPrivacyAudits:
    @pytest.fixture(scope="class")
    def people(self, spark):
        # (zip, age_band) quasi-identifiers; 'disease' sensitive.
        # class (z1, a1): 6 rows, diverse; (z2, a2): 2 rows, all the
        # SAME sensitive value; (z3, a3): 1 row (unique -> below k)
        rows = ([("z1", "a1", f"d{i % 3}") for i in range(6)]
                + [("z2", "a2", "dX"), ("z2", "a2", "dX")]
                + [("z3", "a3", None)])
        return spark.createDataFrame(rows, "zip string, age string, "
                                           "disease string")

    def test_k_anonymity_counts(self, spark, people):
        from spark_df_profiling_spark.operators.constraints import (
            k_anonymity)
        r = k_anonymity(people, ["zip", "age"], k=5).collect()[0]
        assert (r.n, r.n_classes, r.min_class_size) == (9, 3, 1)
        assert (r.rows_below_k, r.classes_below_k) == (3, 2)
        assert r.p_rows_below_k == pytest.approx(3 / 9)
        assert not r.is_k_anonymous
        ok = k_anonymity(people, ["zip", "age"], k=2).collect()[0]
        assert ok.rows_below_k == 1 and not ok.is_k_anonymous

    def test_l_diversity_counts(self, spark, people):
        from spark_df_profiling_spark.operators.constraints import (
            l_diversity)
        r = l_diversity(people, ["zip", "age"], "disease",
                        l=2).collect()[0]
        # z1 class: 3 distinct; z2: 1 distinct (homogeneous leak);
        # z3: all-NULL sensitive -> 0 distinct, fails
        assert (r.n, r.n_classes, r.min_diversity) == (9, 3, 0)
        assert (r.classes_below_l, r.rows_below_l) == (2, 3)
        assert not r.is_l_diverse

    def test_null_quasi_is_a_value(self, spark):
        from spark_df_profiling_spark.operators.constraints import (
            k_anonymity)
        df = spark.createDataFrame(
            [(None, "x"), (None, "x"), ("a", "x")],
            "zip string, age string")
        r = k_anonymity(df, ["zip", "age"], k=2).collect()[0]
        # the two NULL-zip rows form one class of size 2
        assert (r.n_classes, r.rows_below_k) == (2, 1)

    def test_validation(self, spark, people):
        from spark_df_profiling_spark.operators.constraints import (
            k_anonymity, l_diversity)
        with pytest.raises(ValueError):
            k_anonymity(people, [], k=5)
        with pytest.raises(ValueError):
            k_anonymity(people, ["zip"], k=1)
        with pytest.raises(ValueError):
            l_diversity(people, ["zip"], "disease", l=1)
        with pytest.raises(ValueError):
            l_diversity(people, ["nope"], "disease")


class TestBootstrapRatioCI:
    def test_matches_python_reference(self, spark):
        rows = [(i, "g%d" % (i % 2), (i * 13) % 7, (i * 13) % 7 + 5)
                for i in range(400)]
        df = spark.createDataFrame(rows,
                                   "id long, g string, num long, "
                                   "den long")
        from spark_df_profiling_spark.operators.sampling import (
            bootstrap_ratio_ci)
        out = {r.g: r for r in
               bootstrap_ratio_ci(df, "num", "den", "id", n_boot=41,
                                  group_col="g",
                                  hash_fn="md5").collect()}
        for gi in range(2):
            vals = [(n, d, i) for i, g, n, d in rows
                    if g == "g%d" % gi]
            ms = []
            for b in range(41):
                sn = sd = 0
                for n, d, i in vals:
                    w = _w(_bucket(f"{i}#{b}"))
                    sn += w * n
                    sd += w * d
                if sd > 0:
                    ms.append(sn / sd)
            ms.sort()
            r = out["g%d" % gi]
            assert r.n == len(vals)
            assert r.ratio == pytest.approx(
                sum(n for n, _, _ in vals)
                / sum(d for _, d, _ in vals), abs=1e-12)
            assert r.ci_lo == pytest.approx(ms[1], abs=1e-12)
            assert r.ci_hi == pytest.approx(ms[39], abs=1e-12)
            mb = sum(ms) / len(ms)
            se = math.sqrt(sum((x - mb) ** 2 for x in ms)
                           / (len(ms) - 1))
            assert r.boot_se == pytest.approx(se, rel=1e-9)

    def test_constant_denominator_equals_mean_ci(self, spark,
                                                 boot_df):
        # den == 1 per row: the ratio IS the mean; CIs must coincide
        from spark_df_profiling_spark.operators.sampling import (
            bootstrap_ci, bootstrap_ratio_ci)
        ones = boot_df.withColumn("one", F.lit(1))
        rc = bootstrap_ratio_ci(ones, "v", "one", "id", n_boot=21,
                                hash_fn="md5").collect()[0]
        mc = bootstrap_ci(boot_df, "v", "id", n_boot=21,
                          hash_fn="md5").collect()[0]
        assert rc.ratio == pytest.approx(mc.mean, abs=1e-12)
        assert rc.ci_lo == pytest.approx(mc.ci_lo, abs=1e-12)
        assert rc.ci_hi == pytest.approx(mc.ci_hi, abs=1e-12)

    def test_zero_denominator_replicates_excluded(self, spark):
        from spark_df_profiling_spark.operators.sampling import (
            bootstrap_ratio_ci)
        # den = 0 everywhere: no valid replicate, NULL everything
        df = spark.createDataFrame([(i, 5, 0) for i in range(20)],
                                   "id long, num long, den long")
        r = bootstrap_ratio_ci(df, "num", "den", "id",
                               n_boot=5).collect()[0]
        assert r.ratio is None and r.ci_lo is None
        assert r.n_boot == 0


class TestExperimentation:
    @pytest.fixture(scope="class")
    def exp_df(self, spark):
        # y = x + 2 for treat, x for ctrl, + deterministic residue;
        # x imbalanced across arms -> raw diff is confounded, CUPED
        # recovers the true +2
        rows = []
        for i in range(1000):
            arm = "treat" if i % 2 else "ctrl"
            x = float((i * 7) % 50)
            y = x + (2.0 if arm == "treat" else 0.0) \
                + float((i * 13) % 5)
            rows.append((i, arm, y, x))
        return spark.createDataFrame(rows, "id long, arm string, "
                                           "y double, x double")

    def test_welch_and_cuped_match_python(self, spark, exp_df):
        import statistics

        from spark_df_profiling_spark.operators.evaluation import (
            ab_test_report)
        rows = [(r.id, r.arm, r.y, r.x) for r in exp_df.collect()]
        r = ab_test_report(exp_df, "arm", "y", "x").collect()[0]
        ctrl = [(y, x) for _, a, y, x in rows if a == "ctrl"]
        trt = [(y, x) for _, a, y, x in rows if a == "treat"]
        eff = statistics.fmean(y for y, _ in trt) \
            - statistics.fmean(y for y, _ in ctrl)
        va = statistics.variance([y for y, _ in ctrl])
        vb = statistics.variance([y for y, _ in trt])
        se = math.sqrt(va / len(ctrl) + vb / len(trt))
        assert (r.arm_a, r.arm_b) == ("ctrl", "treat")
        assert r.effect == pytest.approx(eff, abs=1e-9)
        assert r.se == pytest.approx(se, abs=1e-9)
        assert r.welch_z == pytest.approx(eff / se, abs=1e-9)
        # CUPED: the confounded raw +3 collapses to the true +2 with
        # a much smaller se
        assert r.effect_cuped == pytest.approx(2.0, abs=0.15)
        assert r.se_cuped < r.se * 0.6
        assert r.welch_z_cuped > r.welch_z

    def test_without_covariate(self, spark, exp_df):
        from spark_df_profiling_spark.operators.evaluation import (
            ab_test_report)
        r = ab_test_report(exp_df, "arm", "y").collect()[0]
        assert "theta" not in r.asDict()
        assert r.effect == pytest.approx(3.0, abs=0.2)

    def test_not_two_arms_raises(self, spark, exp_df):
        from spark_df_profiling_spark.operators.evaluation import (
            ab_test_report, covariate_balance)
        three = exp_df.withColumn(
            "arm", F.when(F.col("id") % 3 == 0, "c")
            .otherwise(F.col("arm")))
        with pytest.raises(ValueError):
            ab_test_report(three, "arm", "y")
        with pytest.raises(ValueError):
            covariate_balance(three, "arm", ["x"])

    def test_covariate_balance_matches_python(self, spark, exp_df):
        import statistics

        from spark_df_profiling_spark.operators.evaluation import (
            covariate_balance)
        rows = [(r.arm, r.y, r.x) for r in exp_df.collect()]
        out = {r.column: r for r in
               covariate_balance(exp_df, "arm",
                                 ["x", "y"]).collect()}
        for ci, c in enumerate(("x", "y")):
            pa = [row[2 - ci] if c == "x" else row[1]
                  for row in rows if row[0] == "ctrl"]
            pb = [row[2 - ci] if c == "x" else row[1]
                  for row in rows if row[0] == "treat"]
            smd = (statistics.fmean(pb) - statistics.fmean(pa)) \
                / math.sqrt((statistics.variance(pa)
                             + statistics.variance(pb)) / 2)
            assert out[c].smd == pytest.approx(smd, abs=1e-9)
        # constant covariate -> NULL smd
        const = exp_df.withColumn("k1", F.lit(5.0))
        r = {x.column: x for x in
             covariate_balance(const, "arm", ["k1"]).collect()}
        assert r["k1"].smd is None and r["k1"].flagged is None


class TestInclusionCoefficients:
    def test_containment_fractions(self, spark):
        from spark_df_profiling_spark.operators.correlation import (
            inclusion_coefficients)
        child = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (3, "c"), (None, "d")],
            "k int, s string")
        parent = spark.createDataFrame(
            [(1,), (2,), (9,)], "pk int")
        out = {(r.child_col, r.parent_col): r for r in
               inclusion_coefficients(
                   child, parent,
                   [("k", "pk"), ("s", "pk")]).collect()}
        r = out[("k", "pk")]
        # distinct non-null child ks: {1,2,3}; contained: {1,2}
        assert (r.n_child_distinct, r.n_contained) == (3, 2)
        assert r.coefficient == pytest.approx(2 / 3)
        assert not r.is_inclusion
        # strings vs ints: zero overlap, honest 0 not an error
        assert out[("s", "pk")].n_contained == 0

    def test_true_fk_detected(self, spark, sf_dir):
        from spark_df_profiling_spark.operators.correlation import (
            inclusion_coefficients)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        od = spark.read.parquet(f"{sf_dir}/orders.parquet")
        out = {r.child_col: r for r in inclusion_coefficients(
            li, od, [("l_orderkey", "o_orderkey"),
                     ("l_quantity", "o_custkey")]).collect()}
        assert out["l_orderkey"].is_inclusion
        assert out["l_orderkey"].coefficient == 1.0
        assert not out["l_quantity"].is_inclusion

    def test_distinct_not_table_sized(self, spark):
        # duplicates in the child collapse before the join
        from spark_df_profiling_spark.operators.correlation import (
            inclusion_coefficients)
        child = spark.createDataFrame([(7,)] * 100, "k int")
        parent = spark.createDataFrame([(7,)], "pk int")
        r = inclusion_coefficients(child, parent,
                                   [("k", "pk")]).collect()[0]
        assert (r.n_child_distinct, r.n_contained) == (1, 1)
        assert r.is_inclusion

    def test_validation(self, spark):
        from spark_df_profiling_spark.operators.correlation import (
            inclusion_coefficients)
        df = spark.createDataFrame([(1,)], "k int")
        with pytest.raises(ValueError):
            inclusion_coefficients(df, df, [])
        with pytest.raises(ValueError):
            inclusion_coefficients(df, df, [("nope", "k")])


class TestMineNegatives:
    @pytest.fixture(scope="class")
    def emb(self, spark, sf_dir):
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def test_hard_are_top_nongold_and_random_deterministic(
            self, spark, emb):
        from spark_df_profiling_spark.operators.similarity import (
            knn_bruteforce, mine_negatives)
        qs = emb.where(F.col("vec_id") < 5)
        gold = qs.select(F.col("vec_id").alias("query_id"),
                        F.col("vec_id").alias("doc_id"))
        out = mine_negatives(emb, qs, gold, k_hard=3, k_random=4,
                             seed=0, random_pool=50).collect()
        hard = [r for r in out if r.kind == "hard"]
        rand = [r for r in out if r.kind == "random"]
        assert len(hard) == 15 and len(rand) == 20
        assert all(r.doc_id != r.query_id for r in out)  # no gold
        assert len({(r.query_id, r.doc_id) for r in out}) == len(out)
        knn = knn_bruteforce(emb, qs, k=4).collect()
        for q in range(5):
            expect = [r.neighbor_id for r in sorted(
                (x for x in knn
                 if x.query_id == q and x.neighbor_id != q),
                key=lambda x: (-x.sim, x.neighbor_id))][:3]
            got = [r.doc_id for r in sorted(
                (x for x in hard if x.query_id == q),
                key=lambda x: x.rank)]
            assert got == expect
        # random picks: exact md5 replay (pool rank, then per-query
        # priority, hard picks excluded)
        pool = sorted(
            (_bucket(str(i)), i) for i in
            [r.vec_id for r in
             emb.select("vec_id").distinct().collect()])[:50]
        pool_ids = [i for _, i in pool]
        q0_hard = {r.doc_id for r in hard if r.query_id == 0}
        cands = [i for i in pool_ids
                 if i != 0 and i not in q0_hard]
        cands.sort(key=lambda i: (_bucket(f"0#{i}"), i))
        got_r = [r.doc_id for r in sorted(
            (x for x in rand if x.query_id == 0),
            key=lambda x: x.rank)]
        assert got_r == cands[:4]
        assert all(r.sim is None for r in rand)

    def test_multi_gold_and_hard_only(self, spark, emb):
        from spark_df_profiling_spark.operators.similarity import (
            mine_negatives)
        qs = emb.where(F.col("vec_id") < 3)
        # two gold docs per query: self and self+1
        gold = qs.selectExpr("vec_id as query_id",
                             "vec_id as doc_id") \
            .unionByName(qs.selectExpr("vec_id as query_id",
                                       "vec_id + 1 as doc_id"))
        out = mine_negatives(emb, qs, gold, k_hard=2, k_random=0,
                             seed=0).collect()
        assert len(out) == 6
        banned = {(q, q) for q in range(3)} \
            | {(q, q + 1) for q in range(3)}
        assert all((r.query_id, r.doc_id) not in banned for r in out)

    def test_validation(self, spark, emb):
        from spark_df_profiling_spark.operators.similarity import (
            mine_negatives)
        qs = emb.where(F.col("vec_id") < 2)
        gold = qs.selectExpr("vec_id as query_id",
                             "vec_id as doc_id")
        with pytest.raises(ValueError):
            mine_negatives(emb, qs, gold, k_hard=0, k_random=0)
        with pytest.raises(ValueError):
            mine_negatives(emb, qs, gold, random_pool=0)
        with pytest.raises(ValueError):
            mine_negatives(emb, qs, gold.withColumnRenamed(
                "doc_id", "x"))


class TestOperatingPoints:
    @pytest.fixture(scope="class")
    def scored2(self, spark):
        rows = [(float((i * 7) % 100),
                 1 if (i * 11) % 100 < ((i * 7) % 100) * 0.8 else 0)
                for i in range(2000)]
        return spark.createDataFrame(rows, "s double, y int")

    @staticmethod
    def _sweep(rows):
        from collections import defaultdict
        agg = defaultdict(lambda: [0, 0])
        for s, y in rows:
            agg[s][0] += 1
            agg[s][1] += y
        n_all = len(rows)
        n_pos = sum(y for _, y in rows)
        pts, bc, bp = [], 0, 0
        for s in sorted(agg):
            c, p = agg[s]
            tp = n_pos - bp
            pred = n_all - bc
            pts.append((s, tp, pred - tp,
                        tp / pred if pred else None,
                        tp / n_pos if n_pos else None))
            bc += c
            bp += p
        return pts

    def test_matches_sweep_reference(self, spark, scored2):
        from spark_df_profiling_spark.operators.evaluation import (
            operating_points)
        rows = [(r.s, r.y) for r in scored2.collect()]
        pts = self._sweep(rows)

        def f1(p, r):
            if p is None or r is None or p + r == 0:
                return None
            return 2 * p * r / (p + r)

        out = {r.objective: r for r in operating_points(
            scored2, "y", "s", min_precision=0.9,
            min_recall=0.8).collect()}
        bf = max((f1(p, r), s) for s, _, _, p, r in pts
                 if f1(p, r) is not None)
        r1 = out["max_fbeta"]
        assert (r1.fbeta, r1.threshold) == \
            (pytest.approx(bf[0], abs=1e-12), bf[1])
        br = max((r, s) for s, _, _, p, r in pts
                 if p is not None and p >= 0.9)
        r2 = out["recall_at_precision"]
        assert (r2.recall, r2.threshold) == \
            (pytest.approx(br[0], abs=1e-12), br[1])
        assert r2.precision >= 0.9
        bp2 = max((p, s) for s, _, _, p, r in pts
                  if r is not None and r >= 0.8)
        r3 = out["precision_at_recall"]
        assert (r3.precision, r3.threshold) == \
            (pytest.approx(bp2[0], abs=1e-12), bp2[1])

    def test_beta_shifts_the_point(self, spark, scored2):
        from spark_df_profiling_spark.operators.evaluation import (
            operating_points)
        p_heavy = operating_points(scored2, "y", "s",
                                   beta=0.25).collect()[0]
        r_heavy = operating_points(scored2, "y", "s",
                                   beta=4.0).collect()[0]
        # precision-weighted beta picks a stricter threshold
        assert p_heavy.threshold >= r_heavy.threshold
        assert p_heavy.precision >= r_heavy.precision

    def test_infeasible_floor_emits_no_row(self, spark):
        from spark_df_profiling_spark.operators.evaluation import (
            operating_points)
        # every score has a negative above it -> precision 1.0 only
        # reachable if some prefix is pure; construct an impure top
        df = spark.createDataFrame(
            [(3.0, 0), (2.0, 1), (1.0, 0)], "s double, y int")
        out = operating_points(df, "y", "s",
                               min_precision=1.0).collect()
        assert {r.objective for r in out} == {"max_fbeta"}

    def test_validation(self, spark, scored2):
        from spark_df_profiling_spark.operators.evaluation import (
            operating_points)
        with pytest.raises(ValueError):
            operating_points(scored2, "y", "s", beta=0)
        with pytest.raises(ValueError):
            operating_points(scored2, "y", "s", min_precision=1.5)


class TestReviewR12cFixes:
    def test_poisson_weight_null_bucket_is_null(self, spark):
        from spark_df_profiling_spark.operators.sampling import (
            hash_bucket, poisson_weight)
        df = spark.createDataFrame([(1,), (None,)], "id long")
        out = df.select(
            poisson_weight(hash_bucket(F.col("id"))).alias("w")) \
            .collect()
        ws = [r.w for r in out]
        assert None in ws                  # NULL id -> NULL weight
        assert any(w is not None for w in ws)

    def test_mine_negatives_custom_columns(self, spark, sf_dir):
        from pyspark.sql import functions as FF

        from spark_df_profiling_spark.operators.similarity import (
            mine_negatives)
        emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .select(FF.col("vec_id").alias("doc_key"),
                       FF.col("embedding").alias("vec")))
        qs = emb.where(FF.col("doc_key") < 3)
        gold = qs.select(FF.col("doc_key").alias("query_id"),
                         FF.col("doc_key").alias("doc_id"))
        out = mine_negatives(emb, qs, gold, k_hard=2, k_random=2,
                             id_col="doc_key", emb_col="vec")
        rows = out.collect()
        assert len(rows) == 12
        assert all(r.doc_id != r.query_id for r in rows)

    def test_inclusion_all_null_child_still_emits_row(self, spark):
        from spark_df_profiling_spark.operators.correlation import (
            inclusion_coefficients)
        child = spark.createDataFrame(
            [(None, 1), (None, 2)], "dead int, live int")
        parent = spark.createDataFrame([(1,)], "pk int")
        out = {r.child_col: r for r in inclusion_coefficients(
            child, parent, [("dead", "pk"), ("live", "pk")])
            .collect()}
        assert len(out) == 2               # audited-and-vacuous row
        r = out["dead"]
        assert (r.n_child_distinct, r.n_contained) == (0, 0)
        assert r.coefficient is None and r.is_inclusion is None

    def test_cluster_quality_dim_mismatch_raises(self, spark):
        from spark_df_profiling_spark.operators.clustering import (
            cluster_quality)
        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "id long, embedding array<double>")
        with pytest.raises(ValueError, match="dimension"):
            cluster_quality(df, [[0.0, 0.0, 0.0, 0.0]])

    def test_stateful_sample_null_keys_dropped(self, spark,
                                               tmp_path):
        from spark_df_profiling_spark.streaming import (
            run_stream_to_memory, stateful_distinct_sample)
        src = tmp_path / "nullkey"
        spark.createDataFrame(
            [(None, 1), (None, 2), (7, 3)],
            "user_id long, event_id long").coalesce(1) \
            .write.parquet(str(src))
        stream = (spark.readStream
                  .schema("user_id long, event_id long")
                  .parquet(str(src)))
        out = stateful_distinct_sample(stream, "user_id",
                                       "event_id", k=5)
        run_stream_to_memory(out, "t_nullkey", output_mode="update")
        rows = spark.table("t_nullkey").collect()
        assert {r.key for r in rows} == {7}

    def test_cuped_sample_moments(self, spark):
        # two tiny arms: se_cuped from SAMPLE moments must match a
        # python replay using variance/covariance with n-1
        import statistics

        from spark_df_profiling_spark.operators.evaluation import (
            ab_test_report)
        rows = [(i, "a" if i < 6 else "b",
                 float(i % 4) + (1.0 if i >= 6 else 0.0),
                 float(i % 4)) for i in range(12)]
        df = spark.createDataFrame(rows, "id long, arm string, "
                                         "y double, x double")
        r = ab_test_report(df, "arm", "y", "x").collect()[0]

        def samp_cov(p):
            my = statistics.fmean(v[0] for v in p)
            mx = statistics.fmean(v[1] for v in p)
            return sum((y - my) * (x - mx) for y, x in p) \
                / (len(p) - 1)
        a = [(y, x) for _, g, y, x in rows if g == "a"]
        b = [(y, x) for _, g, y, x in rows if g == "b"]
        nt = len(a) + len(b) - 2
        cxy = (samp_cov(a) * (len(a) - 1)
               + samp_cov(b) * (len(b) - 1)) / nt
        vx = (statistics.variance([x for _, x in a]) * (len(a) - 1)
              + statistics.variance([x for _, x in b])
              * (len(b) - 1)) / nt
        theta = cxy / vx

        def adj(p):
            vy = statistics.variance([y for y, _ in p])
            vxx = statistics.variance([x for _, x in p])
            return max(vy - 2 * theta * samp_cov(p)
                       + theta * theta * vxx, 0.0)
        se_c = math.sqrt(adj(a) / len(a) + adj(b) / len(b))
        assert r.theta == pytest.approx(theta, abs=1e-9)
        assert r.se_cuped == pytest.approx(se_c, abs=1e-9)


class TestStreamingPSICategorical:
    def test_matches_python_replay_with_other_bucket(self, spark,
                                                     sf_dir):
        import collections

        from spark_df_profiling_spark.operators.drift import (
            EPS, categorical_psi_reference)
        from spark_df_profiling_spark.sources import with_event_time
        from spark_df_profiling_spark.streaming import (
            events_stream, run_stream_to_memory,
            streaming_psi_categorical)
        ev = with_event_time(
            spark.read.parquet(f"{sf_dir}/events.parquet"))
        ref = categorical_psi_reference(ev, "event_type",
                                        max_categories=3)
        assert ref[-1][0] == "__other__" and ref[-1][1] > 0
        assert sum(f for _, f in ref) == pytest.approx(1.0)
        out = streaming_psi_categorical(
            events_stream(spark, sf_dir), "ts_ts", "event_type",
            ref, window="1 day", watermark="1 hour")
        run_stream_to_memory(out, "t_scpsi", output_mode="complete")
        got = {int(r.window_start.timestamp()): r
               for r in spark.table("t_scpsi").collect()}
        assert len(got) > 1
        cats = [v for v, _ in ref[:-1]]
        fracs = [f for _, f in ref]
        rows = ev.select("ts_ts", "event_type") \
                 .where("event_type is not null").collect()
        wins = collections.defaultdict(lambda: [0] * len(fracs))
        for r in rows:
            ws = int(r.ts_ts.timestamp() // 86400) * 86400
            b = (cats.index(r.event_type)
                 if r.event_type in cats else len(fracs) - 1)
            wins[ws][b] += 1
        for ws, cnts in wins.items():
            n = sum(cnts)
            psi = sum((max(fracs[b], EPS) - max(cnts[b] / n, EPS))
                      * math.log(max(fracs[b], EPS)
                                 / max(cnts[b] / n, EPS))
                      for b in range(len(fracs)))
            assert got[ws].n == n
            assert got[ws].psi == pytest.approx(psi, abs=1e-12)

    def test_unseen_category_scores_as_drift(self, spark, tmp_path):
        import datetime

        from spark_df_profiling_spark.operators.drift import (
            categorical_psi_reference)
        from spark_df_profiling_spark.streaming import (
            run_stream_to_memory, streaming_psi_categorical)
        base = datetime.datetime(2026, 2, 1)
        ref_df = spark.createDataFrame(
            [(base, ["a", "b"][i % 2]) for i in range(100)],
            "ts timestamp, v string")
        ref = categorical_psi_reference(ref_df, "v",
                                        max_categories=5)
        day2 = base + datetime.timedelta(days=1)
        data = ([(base, ["a", "b"][i % 2]) for i in range(100)]
                + [(day2, "NEVER_SEEN") for _ in range(100)])
        src = tmp_path / "scpsi_src"
        spark.createDataFrame(data, "ts timestamp, v string") \
            .coalesce(1).write.parquet(str(src))
        stream = (spark.readStream.schema("ts timestamp, v string")
                  .parquet(str(src)))
        out = streaming_psi_categorical(stream, "ts", "v", ref,
                                        window="1 day",
                                        watermark="1 hour")
        run_stream_to_memory(out, "t_scpsi_drift",
                             output_mode="complete")
        rows = sorted(spark.table("t_scpsi_drift").collect(),
                      key=lambda r: r.window_start)
        calm, drifted = rows
        assert calm.psi < 0.01
        assert drifted.psi > 2.0   # all mass fell into __other__

    def test_reference_contract(self, spark):
        from spark_df_profiling_spark.operators.drift import (
            categorical_psi_reference)
        from spark_df_profiling_spark.streaming import (
            streaming_psi_categorical)
        df = spark.createDataFrame([(None,)], "v string")
        with pytest.raises(ValueError):
            categorical_psi_reference(df, "v")
        with pytest.raises(ValueError):
            streaming_psi_categorical(df, "ts", "v", [("a", 1.0)])

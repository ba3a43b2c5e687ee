"""Training-prep operators: FIM transform, length-bucketed batching,
code-vs-prose flags, quality-aware cluster keeper."""

import pytest
from pyspark.sql import functions as F

from hadoop_distributed_dynamic_file_system_spark.operators import curation, textanalysis


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        .cache()
    )


class TestFimSplit:
    def test_reassembly_recovers_original(self, docs):
        """prefix + middle + suffix must be a permutation-free
        reassembly of the original text for every applied row."""
        out = curation.fim_split(docs, "doc_id", "text", rate=1.0)
        joined = out.join(docs, "doc_id")
        rebuilt = joined.select(
            "doc_id",
            "text",
            F.concat(
                F.regexp_extract(
                    "fim_text", r"<\|fim_pre\|>(.*?)<\|fim_suf\|>", 1
                ),
                F.regexp_extract(
                    "fim_text", r"<\|fim_mid\|>(.*)$", 1
                ),
                F.regexp_extract(
                    "fim_text", r"<\|fim_suf\|>(.*?)<\|fim_mid\|>", 1
                ),
            ).alias("rebuilt"),
        )
        # regex (.*?) does not cross newlines with default flags; use
        # rows whose text is newline-free for the regex-based check
        flat = rebuilt.filter(~F.col("text").contains("\n"))
        bad = flat.filter(F.col("rebuilt") != F.col("text")).count()
        assert bad == 0 and flat.count() > 0

    def test_cut_points_bounded_and_ordered(self, docs):
        out = curation.fim_split(docs, "doc_id", "text", rate=1.0)
        j = out.join(docs, "doc_id")
        bad = j.filter(
            (F.col("cut1") < 0)
            | (F.col("cut2") < F.col("cut1"))
            | (F.col("cut2") > F.length("text"))
        ).count()
        assert bad == 0

    def test_gate_rate_and_passthrough(self, docs):
        out = curation.fim_split(docs, "doc_id", "text", rate=0.5, seed=42)
        n = out.count()
        applied = out.filter(F.col("fim_applied") == 1).count()
        assert 0.3 * n < applied < 0.7 * n
        untouched = (
            out.filter(F.col("fim_applied") == 0)
            .join(docs, "doc_id")
            .filter(F.col("fim_text") != F.col("text"))
            .count()
        )
        assert untouched == 0

    def test_deterministic_across_runs(self, docs):
        a = curation.fim_split(docs, "doc_id", "text", rate=0.5).collect()
        b = curation.fim_split(docs, "doc_id", "text", rate=0.5).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        c = curation.fim_split(docs, "doc_id", "text", rate=0.5, seed=7)
        diff = (
            curation.fim_split(docs, "doc_id", "text", rate=0.5)
            .alias("x")
            .join(c.alias("y"), "doc_id")
            .filter(F.col("x.fim_applied") != F.col("y.fim_applied"))
            .count()
        )
        assert diff > 0  # a different seed is a different permutation


class TestLengthBucketedBatches:
    def test_matches_windowed_model(self, docs):
        out = curation.length_bucketed_batches(
            docs, "doc_id", "text", batch_size=8, boundaries=(32, 64, 128, 256)
        ).collect()
        got = {r["doc_id"]: (r["bucket"], r["batch_id"], r["pos_in_batch"]) for r in out}
        rows = docs.select(
            "doc_id",
            F.size(
                F.filter(F.split("text", r"\s+"), lambda w: w != F.lit(""))
            ).alias("n"),
        ).collect()
        import collections

        by_bucket = collections.defaultdict(list)
        for r in rows:
            b = sum(r["n"] >= x for x in (32, 64, 128, 256))
            by_bucket[b].append((r["n"], r["doc_id"]))
        for b, members in by_bucket.items():
            for pos, (_, did) in enumerate(sorted(members)):
                assert got[did] == (b, pos // 8, pos % 8), did

    def test_batches_are_full_except_tail(self, docs):
        out = curation.length_bucketed_batches(docs, "doc_id", "text", batch_size=8)
        sizes = (
            out.groupBy("bucket", "batch_id")
            .agg(F.count("*").alias("n"), F.max("batch_id").alias("b"))
            .collect()
        )
        import collections

        per_bucket_max = collections.defaultdict(int)
        for r in sizes:
            per_bucket_max[r["bucket"]] = max(per_bucket_max[r["bucket"]], r["batch_id"])
        for r in sizes:
            assert r["n"] <= 8
            if r["batch_id"] < per_bucket_max[r["bucket"]]:
                assert r["n"] == 8  # only the tail batch may be short


class TestCodeProseFlags:
    def test_obvious_code_and_prose(self, spark):
        df = spark.createDataFrame(
            [
                (1, "def f(x):\n    return x + 1\n    # comment\n    pass"),
                (2, "int main() { int x = 0; x++; return x; }"),
                (3, "The quick brown fox jumps over the lazy dog. "
                    "It was a bright cold day in April."),
            ],
            "id INT, text STRING",
        )
        out = {r["id"]: r for r in textanalysis.code_prose_flags(df, "id", "text").collect()}
        assert out[1]["is_code"] == 1  # indent-dominated
        assert out[2]["is_code"] == 1  # punctuation-dominated
        assert out[3]["is_code"] == 0
        assert out[2]["semi_count"] == 3 and out[2]["brace_count"] == 2

    def test_zero_shuffle_plan(self, docs):
        plan = textanalysis.code_prose_flags(
            docs, "doc_id", "text"
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestBestOfCluster:
    def test_argmax_with_tiebreak(self, spark):
        df = spark.createDataFrame(
            [
                ("c1", 10, 101),
                ("c1", 30, 102),
                ("c1", 30, 103),  # tie on quality -> min id wins
                ("c2", 5, 201),
            ],
            "cluster STRING, q INT, id INT",
        )
        out = {
            r["cluster"]: r
            for r in curation.best_of_cluster(df, "cluster", "q", "id").collect()
        }
        assert out["c1"]["keeper"] == 102 and out["c1"]["keeper_quality"] == 30
        assert out["c1"]["n_members"] == 3
        assert out["c2"]["keeper"] == 201 and out["c2"]["n_members"] == 1


class TestMojibake:
    def test_repair_inverts_double_decode(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import textnorm as TN

        # 'café touché' damaged by the classic UTF-8-read-as-Latin-1
        # (Latin-1-range chars only: CP1252-specific damage like 'â€¦'
        # is detectable but not invertible with JVM charsets)
        damaged = "cafÃ© touchÃ©"
        df = spark.createDataFrame([(1, damaged), (2, "plain ascii")],
                                   "id INT, text STRING")
        out = {r["id"]: r for r in TN.mojibake_repaired(df, "id", "text").collect()}
        assert out[1]["repaired"] == 1 and out[1]["text"] == "café touché"
        assert out[1]["n_mojibake"] >= 2
        assert out[2]["repaired"] == 0 and out[2]["text"] == "plain ascii"

    def test_ascii_transcode_is_identity(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import textnorm as TN

        df = spark.createDataFrame([(1, "pure ascii 123 {};")], "id INT, t STRING")
        got = df.select(TN.repair_mojibake(F.col("t")).alias("v")).first()["v"]
        assert got == "pure ascii 123 {};"


class TestSnapshotDiff:
    def test_status_matrix(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import curation as C

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "id INT, t STRING"
        )
        new = spark.createDataFrame(
            [(1, "a"), (2, "B2"), (6, "z")], "id INT, t STRING"
        )
        got = {r["id"]: r["status"]
               for r in C.snapshot_diff(old, new, "id", "t").collect()}
        assert got == {1: "SAME", 2: "CHANGED", 3: "REMOVED", 6: "ADDED"}


class TestMoments:
    def test_matches_numpy_and_shard_invariance(self, docs):
        import numpy as np
        from hadoop_distributed_dynamic_file_system_spark.operators import textanalysis as TA

        base = docs.select(
            F.lit("s").alias("g"),
            F.col("doc_id"),
            F.length("text").alias("x"),
        )
        merged4 = TA.merge_moments(
            TA.moment_shards(base.withColumn("sh", F.col("doc_id") % 4),
                             "g", "sh", "x"), "g").first()
        merged7 = TA.merge_moments(
            TA.moment_shards(base.withColumn("sh", F.col("doc_id") % 7),
                             "g", "sh", "x"), "g").first()
        xs = np.array([r["x"] for r in base.select("x").collect()], dtype=np.float64)
        assert merged4["n"] == len(xs)
        assert abs(merged4["mean"] - xs.mean()) < 1e-4
        assert abs(merged4["variance"] - xs.var()) < 1e-2
        assert abs(merged4["stddev"] - xs.std()) < 1e-4
        # merge order/shape cannot matter: integer sums are exact
        assert (merged4["mean"], merged4["variance"], merged4["stddev"]) == (
            merged7["mean"], merged7["variance"], merged7["stddev"])

    def test_huge_values_do_not_overflow_the_square(self, spark):
        """|x| > ~3.04e9 overflows a BIGINT x*x before any cast runs
        (ADVICE r6) — the square must be computed in decimal. 5e18 is
        near the long limit; its square ~2.5e37 fits decimal(38,0)."""
        from hadoop_distributed_dynamic_file_system_spark.operators import textanalysis as TA

        big = 5_000_000_000_000_000_000  # 5e18
        df = spark.createDataFrame(
            [("g", 0, big), ("g", 1, big)], ["g", "sh", "x"]
        )
        out = TA.merge_moments(
            TA.moment_shards(df, "g", "sh", "x"), "g").first()
        assert out["n"] == 2 and out["variance"] == 0.0
        assert abs(out["mean"] - float(big)) / big < 1e-9
        # welch path shares the decimal-square fix
        drift = TA.welch_t_drift(df, df, "g", "x").first()
        assert drift["n_old"] == 2 and drift["mean_old"] is not None


class TestSchemaEvolution:
    def test_merge_schema_read_unifies_parts(self, spark, tmp_path):
        path = str(tmp_path / "evolve")
        spark.createDataFrame([(1, "en")], "id INT, lang STRING") \
            .write.mode("overwrite").parquet(path)
        spark.createDataFrame([(2, "de", 5)], "id INT, lang STRING, n INT") \
            .write.mode("append").parquet(path)
        back = spark.read.option("mergeSchema", "true").parquet(path)
        rows = {r["id"]: r for r in back.collect()}
        assert set(back.columns) == {"id", "lang", "n"}
        assert rows[1]["n"] is None and rows[2]["n"] == 5


class TestIncrementalRecompute:
    def test_same_rows_carry_stale_values(self, spark):
        # the sharpest proof derive was SKIPPED for SAME rows: plant a
        # deliberately WRONG old-derived value and require it to survive
        from hadoop_distributed_dynamic_file_system_spark.operators import curation as C

        old = spark.createDataFrame(
            [(1, "alpha"), (2, "beta"), (3, "gone")], "id INT, t STRING"
        )
        new = spark.createDataFrame(
            [(1, "alpha"), (2, "edited"), (4, "fresh")], "id INT, t STRING"
        )

        def derive(df):
            return df.select("id", F.length("t").alias("n"))

        stale = spark.createDataFrame(
            [(1, 999), (2, 4), (3, 4)], "id INT, n INT"
        )
        out = {r["id"]: r for r in C.incremental_recompute(
            old, new, stale, "id", "t", derive).collect()}
        assert set(out) == {1, 2, 4}          # REMOVED id=3 dropped
        assert out[1]["n"] == 999 and out[1]["recomputed"] == 0  # carried
        assert out[2]["n"] == 6 and out[2]["recomputed"] == 1    # CHANGED
        assert out[4]["n"] == 5 and out[4]["recomputed"] == 1    # ADDED


class TestHistogramQuantiles:
    def test_shard_shape_invariance_and_bound(self, docs):
        from hadoop_distributed_dynamic_file_system_spark.operators import sketches as SK

        base = docs.select(
            F.lit("g").alias("g"), "doc_id", F.length("text").alias("x")
        )
        q4 = SK.histogram_quantiles(
            SK.histogram_shards(base.withColumn("sh", F.col("doc_id") % 4),
                                "g", "sh", "x"), "g").first()
        q7 = SK.histogram_quantiles(
            SK.histogram_shards(base.withColumn("sh", F.col("doc_id") % 7),
                                "g", "sh", "x"), "g").first()
        # additive merge: shard shape cannot matter
        assert (q4["p50_est"], q4["p90_est"], q4["p99_est"]) == (
            q7["p50_est"], q7["p90_est"], q7["p99_est"])
        # upper-edge estimate brackets the exact quantile within one bucket
        xs = sorted(r["x"] for r in base.select("x").collect())
        for q, est in ((50, q4["p50_est"]), (90, q4["p90_est"])):
            exact = xs[min(len(xs) - 1, (len(xs) * q) // 100)]
            assert exact <= est <= exact + 16 + 16  # <= one bucket + edge


class TestGroupedAuc:
    def test_matches_rank_sum_with_ties(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import classifier as CL

        # hand case with ties: pos scores [3,2,2], neg scores [1,2]
        rows = [("g", 1, 3), ("g", 1, 2), ("g", 1, 2), ("g", 0, 1), ("g", 0, 2)]
        df = spark.createDataFrame(rows, "g STRING, y INT, s INT")
        got = CL.grouped_auc(df, "g", "y", "s").first()
        # pairs: (3>1),(3>2) + (2>1),(2=2: .5) x2 -> (2 + 1.5*2)/6 = 5/6
        assert got["n_pos"] == 3 and got["n_neg"] == 2
        assert abs(got["auc"] - 5.0 / 6.0) < 1e-6

    def test_perfect_and_inverted(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import classifier as CL

        perfect = spark.createDataFrame(
            [("g", 1, 10), ("g", 1, 9), ("g", 0, 1), ("g", 0, 2)],
            "g STRING, y INT, s INT")
        inverted = spark.createDataFrame(
            [("g", 0, 10), ("g", 0, 9), ("g", 1, 1), ("g", 1, 2)],
            "g STRING, y INT, s INT")
        assert CL.grouped_auc(perfect, "g", "y", "s").first()["auc"] == 1.0
        assert CL.grouped_auc(inverted, "g", "y", "s").first()["auc"] == 0.0


class TestPsiDrift:
    def test_identical_snapshots_score_zero(self, docs):
        from hadoop_distributed_dynamic_file_system_spark.operators import sketches as SK

        d = docs.select(F.lit("g").alias("g"), F.length("text").alias("v"))
        r = SK.psi_drift(d, d, "g", "v").first()
        assert r["psi"] == 0.0
        assert r["mass_old_only"] == 0.0 and r["mass_new_only"] == 0.0
        assert r["n_old"] == r["n_new"]

    def test_planted_shift_is_flagged(self, docs):
        from hadoop_distributed_dynamic_file_system_spark.operators import sketches as SK

        old = docs.select(F.lit("g").alias("g"), F.length("text").alias("v"))
        new = docs.select(
            F.lit("g").alias("g"), (F.length("text") + 200).alias("v")
        )
        r = SK.psi_drift(old, new, "g", "v").first()
        # a 200-char shift moves most mass to disjoint buckets: the
        # one-sided masses carry the signal the PSI sum excludes
        assert r["mass_old_only"] + r["mass_new_only"] > 1.0 or r["psi"] > 0.25


class TestWelchTDrift:
    def test_matches_scipy_free_reference(self, spark):
        import math
        from hadoop_distributed_dynamic_file_system_spark.operators import (
            textanalysis as TA,
        )

        a = [10, 12, 14, 16, 18, 20]
        b = [13, 15, 17, 19, 21, 23, 25]
        old = spark.createDataFrame([("g", v) for v in a], ["g", "v"])
        new = spark.createDataFrame([("g", v) for v in b], ["g", "v"])
        got = TA.welch_t_drift(old, new, "g", "v").first()

        def mv(xs):
            n = len(xs); m = sum(xs) / n
            return n, m, sum((x - m) ** 2 for x in xs) / (n - 1)

        na, ma, va = mv(a); nb, mb, vb = mv(b)
        want = (mb - ma) / math.sqrt(va / na + vb / nb)
        assert got["n_old"] == na and got["n_new"] == nb
        assert abs(got["t_stat"] - want) < 1e-6

    def test_no_shift_is_zero(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import (
            textanalysis as TA,
        )

        d = spark.createDataFrame([("g", v) for v in (5, 7, 9, 11)], ["g", "v"])
        assert TA.welch_t_drift(d, d, "g", "v").first()["t_stat"] == 0.0


class TestReviewR6Hardening:
    """Edge cases the r6 review found latent-crashing under ANSI mode:
    every one must degrade per row/group, never abort the job."""

    def test_auc_one_class_group_is_null(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import classifier as CL

        d = spark.createDataFrame([("g", 1, 5), ("g", 1, 7)], ["g", "y", "s"])
        assert CL.grouped_auc(d, "g", "y", "s").first()["auc"] is None

    def test_psi_one_sided_group_does_not_crash(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import sketches as SK

        old = spark.createDataFrame([("a", 10)], ["g", "v"])
        new = spark.createDataFrame([("a", 10), ("b", 99)], ["g", "v"])
        rows = {r["g"]: r for r in SK.psi_drift(old, new, "g", "v").collect()}
        assert rows["b"]["n_old"] == 0 and rows["b"]["mass_new_only"] == 1.0

    def test_welch_degenerate_groups_are_null(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import textanalysis as TA

        o = spark.createDataFrame(
            [("n1", 5), ("const", 5), ("const", 5), ("oldonly", 1),
             ("oldonly", 3)], ["g", "v"])
        n = spark.createDataFrame(
            [("n1", 9), ("const", 5), ("const", 5), ("newonly", 7),
             ("newonly", 8)], ["g", "v"])
        out = {r["g"]: r for r in TA.welch_t_drift(o, n, "g", "v").collect()}
        # n=1, zero-variance, and one-sided groups all present, all NULL t
        assert set(out) == {"n1", "const", "oldonly", "newonly"}
        assert all(out[g]["t_stat"] is None for g in out)
        assert out["newonly"]["n_old"] == 0

    def test_snapshot_diff_null_content(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import curation as C

        o = spark.createDataFrame([(1, "x"), (2, None)], "id INT, t STRING")
        n = spark.createDataFrame([(1, None), (2, None)], "id INT, t STRING")
        got = {r["id"]: r["status"]
               for r in C.snapshot_diff(o, n, "id", "t").collect()}
        assert got == {1: "CHANGED", 2: "SAME"}  # never ADDED/REMOVED

    def test_histogram_width_travels_with_shards(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import sketches as SK

        base = spark.createDataFrame(
            [("g", i) for i in range(200)], ["g", "v"]
        ).withColumn("sh", F.col("v") % 3)
        sh = SK.histogram_shards(base, "g", "sh", "v", bucket_width=64)
        # no width re-supplied: read from the shards themselves
        assert SK.histogram_quantiles(sh, "g").first()["p50_est"] == 128

    def test_histogram_width_mismatch_nulls_quantiles(self, spark):
        """Shards built with different bucket_widths describe
        incompatible grids: merging them must NULL the quantile
        columns instead of silently rescaling under max(width)
        (ADVICE r6). Counts still merge — n stays real."""
        from hadoop_distributed_dynamic_file_system_spark.operators import sketches as SK

        base = spark.createDataFrame(
            [("g", i) for i in range(200)] + [("ok", i) for i in range(200)],
            ["g", "v"],
        ).withColumn("sh", F.col("v") % 2)
        sh64 = SK.histogram_shards(
            base.filter("sh = 0"), "g", "sh", "v", bucket_width=64)
        sh32 = SK.histogram_shards(
            base.filter("sh = 1"), "g", "sh", "v", bucket_width=32)
        mixed = sh64.unionByName(sh32)
        got = {r["g"]: r for r in SK.histogram_quantiles(mixed, "g").collect()}
        for g in ("g", "ok"):
            assert got[g]["n"] == 200
            assert got[g]["p50_est"] is None and got[g]["p99_est"] is None
        # consistent widths keep working through the same merge path
        clean = SK.histogram_quantiles(
            SK.histogram_shards(base, "g", "sh", "v", bucket_width=64), "g"
        ).first()
        assert clean["p50_est"] == 128

    def test_mojibake_cp1252_and_lookalikes_pass_through(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import textnorm as TN

        df = spark.createDataFrame(
            [(1, "broken â€¦ ellipsis"), (2, "NÃO genuine portuguese"),
             (3, "euro € text"), (4, "cafÃ© touchÃ©")],
            "id INT, text STRING")
        out = {r["id"]: r for r in TN.mojibake_repaired(df, "id", "text").collect()}
        assert out[1]["repaired"] == 0 and "â€¦" in out[1]["text"]  # no crash
        assert out[2]["repaired"] == 0 and out[2]["text"].startswith("NÃO")
        assert out[3]["repaired"] == 0
        assert out[4]["repaired"] == 1 and out[4]["text"] == "café touché"

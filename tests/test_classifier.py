"""Hashed-feature linear quality classifier (operators/classifier.py)
+ the NB-weight / split helpers it composes with."""

from pyspark.sql import functions as F

from hadoop_distributed_dynamic_file_system_spark.operators import (
    classifier as cl,
    curation,
    webquality as wq,
)


def _corpus(spark):
    rows = []
    for i in range(40):
        rows.append((i, "spark shuffle partition broadcast executor " * 3, 1))
    for i in range(40, 80):
        rows.append((i, "cat dog fish bird mouse lizard " * 3, 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


class TestLogregTraining:
    def test_separable_corpus_reaches_full_accuracy(self, spark):
        df = _corpus(spark)
        feats = cl.hashed_tf(df, "doc_id", "text", buckets=256)
        w = cl.fit_logreg(feats, labels=df, id_col="doc_id",
                          label_col="label", buckets=256, iters=15, lr=2.0)
        scored = cl.predict(feats, "doc_id", w).join(
            df.select("doc_id", "label"), "doc_id"
        )
        acc = scored.select(
            F.avg(((F.col("score") > 0.5).cast("int") == F.col("label")).cast("int"))
        ).collect()[0][0]
        assert acc == 1.0

    def test_training_is_deterministic(self, spark):
        df = _corpus(spark)
        feats = cl.hashed_tf(df, "doc_id", "text", buckets=64)
        kw = dict(labels=df, id_col="doc_id", label_col="label",
                  buckets=64, iters=5, lr=1.0)
        w1 = {r.b: r.w for r in cl.fit_logreg(feats, **kw).collect()}
        w2 = {r.b: r.w for r in cl.fit_logreg(feats, **kw).collect()}
        assert w1 == w2

    def test_hashed_tf_normalizes_to_unit_sum(self, spark):
        df = _corpus(spark).limit(3)
        sums = (
            cl.hashed_tf(df, "doc_id", "text", buckets=128)
            .groupBy("doc_id")
            .agg(F.round(F.sum("tf"), 9).alias("s"))
            .collect()
        )
        assert all(abs(r.s - 1.0) < 1e-9 for r in sums)

    def test_predict_missing_bucket_contributes_zero(self, spark):
        feats = spark.createDataFrame(
            [(1, 5, 1.0), (1, 99, 1.0)], "doc_id long, b long, tf double"
        )
        weights = spark.createDataFrame([(5, 2.0)], "b long, w double")
        r = cl.predict(feats, "doc_id", weights).collect()[0]
        import math

        assert abs(r.score - 1 / (1 + math.exp(-2.0))) < 1e-12


class TestNbWeightsScoring:
    def test_nb_weights_separate_target_source(self, spark):
        df = _corpus(spark)
        target = df.filter("label = 1").select("text")
        wt = wq.dsir_bucket_weights(df.select("doc_id", "text"), "text", target,
                                    buckets=256)
        scores = cl.quality_classifier_scores(
            df.select("doc_id", "text"), "doc_id", "text", wt, buckets=256
        ).join(df.select("doc_id", "label"), "doc_id")
        means = {
            r.label: r.m
            for r in scores.groupBy("label").agg(F.avg("score").alias("m")).collect()
        }
        assert means[1] > 0.5 > means[0]


class TestSplitByCluster:
    def test_cluster_members_share_split(self, spark):
        df = spark.createDataFrame(
            [(i, i % 7) for i in range(70)], "doc_id long, cluster long"
        )
        out = curation.split_by_cluster(df, "doc_id", "cluster")
        straddlers = (
            out.groupBy("cluster")
            .agg(F.countDistinct("split").alias("n"))
            .filter("n > 1")
            .count()
        )
        assert straddlers == 0

    def test_shares_roughly_respected(self, spark):
        df = spark.createDataFrame(
            [(i, i) for i in range(1000)], "doc_id long, cluster long"
        )
        counts = {
            r.split: r.c
            for r in curation.split_by_cluster(df, "doc_id", "cluster")
            .groupBy("split")
            .agg(F.count("*").alias("c"))
            .collect()
        }
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > 700  # ~800 expected
        assert 40 < counts["val"] < 200 and 40 < counts["test"] < 200

    def test_assignment_is_deterministic_and_id_independent(self, spark):
        # same cluster key under different doc ids -> same split
        a = spark.createDataFrame([(1, 42)], "doc_id long, cluster long")
        b = spark.createDataFrame([(999, 42)], "doc_id long, cluster long")
        sa = curation.split_by_cluster(a, "doc_id", "cluster").collect()[0].split
        sb = curation.split_by_cluster(b, "doc_id", "cluster").collect()[0].split
        assert sa == sb


class TestBigramLM:
    def test_repetitive_doc_scores_higher(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import (
            textanalysis as ta,
        )

        df = spark.createDataFrame(
            [(1, "a b a b a b a b"), (2, "q w e r t y u i")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in
               ta.bigram_lm_scores(df, "doc_id", "text").collect()}
        assert out[1].avg_logprob > out[2].avg_logprob
        assert out[1].n_bigrams == 7

    def test_single_word_docs_absent(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import (
            textanalysis as ta,
        )

        df = spark.createDataFrame(
            [(1, "solo"), (2, "two words")], "doc_id long, text string"
        )
        ids = {r.doc_id for r in ta.bigram_lm_scores(df, "doc_id", "text").collect()}
        assert ids == {2}

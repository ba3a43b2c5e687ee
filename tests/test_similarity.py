"""Similarity-search operators: k-means fitting + IVF with learned
centroids, brute-force recall."""

import os

import pytest
from pyspark.sql import functions as F

from hadoop_distributed_dynamic_file_system_spark.operators import similarity


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


class TestKMeans:
    def test_fit_is_deterministic_and_separates(self, spark, embeddings):
        cents1 = similarity.kmeans_fit(embeddings, k=4, iterations=2)
        cents2 = similarity.kmeans_fit(embeddings, k=4, iterations=2)
        r1 = sorted((r.centroid_id, tuple(round(x, 9) for x in r.embedding))
                    for r in cents1.collect())
        r2 = sorted((r.centroid_id, tuple(round(x, 9) for x in r.embedding))
                    for r in cents2.collect())
        assert r1 == r2
        assert len(r1) == 4
        # every vector lands in some cluster; clusters are non-trivial
        assigned = similarity.assign_to_centroids(
            embeddings, cents1.select(F.col("centroid_id"), F.col("embedding"))
        )
        sizes = {r.centroid_id: r.n for r in
                 assigned.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()}
        assert sum(sizes.values()) == embeddings.count()
        assert len(sizes) >= 2  # data spreads over multiple clusters

    def test_ivf_with_learned_centroids_recall(self, spark, embeddings):
        cents = similarity.kmeans_fit(embeddings, k=4, iterations=2)
        qs = embeddings.filter(F.col("vec_id") < 3)
        exact = similarity.brute_force_topk(embeddings, qs, k=5)
        approx = similarity.ivf_topk(embeddings, qs, cents, k=5, nprobe=2)
        e = {(r.query_id, r.vec_id) for r in exact.collect()}
        a = {(r.query_id, r.vec_id) for r in approx.collect()}
        # IVF probing half the space should still recover most of top-5
        assert len(a & e) / len(e) >= 0.5


class TestIvfIndex:
    def test_indexed_matches_unindexed_and_skips_routing(self, spark, embeddings):
        import shutil

        cents = similarity.kmeans_fit(embeddings, k=4, iterations=2)
        cents = cents.persist()
        cents.count()  # freeze centroids: both paths must see identical values
        table = "ivf_index_test"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(os.path.join("spark-warehouse", table), ignore_errors=True)
        try:
            similarity.build_ivf_index(embeddings, cents, table, num_buckets=4)
            qs = embeddings.filter(F.col("vec_id") < 3)
            direct = similarity.ivf_topk(embeddings, qs, cents, k=5, nprobe=2)
            indexed = similarity.ivf_topk_indexed(spark, table, qs, cents, k=5, nprobe=2)
            d = sorted((r.query_id, r.vec_id, r.score, r.rk) for r in direct.collect())
            i = sorted((r.query_id, r.vec_id, r.score, r.rk) for r in indexed.collect())
            assert d == i and len(d) > 0
            # the indexed plan reads the bucketed table and drops the
            # per-vector routing Window the direct path pays every query
            direct_plan = direct._jdf.queryExecution().optimizedPlan().toString()
            indexed_plan = indexed._jdf.queryExecution().optimizedPlan().toString()
            assert table in indexed_plan
            assert indexed_plan.count("Window") < direct_plan.count("Window")
        finally:
            cents.unpersist()
            spark.sql(f"DROP TABLE IF EXISTS {table}")

"""TeraGen/TeraSort-shaped generation + SortValidator invariants
(reference: examples/terasort/*, src/test/.../mapred/SortValidator.java:
order + record-stats multiset equality)."""

from pyspark.sql import functions as F

from hadoop_distributed_dynamic_file_system_spark import datagen
from hadoop_distributed_dynamic_file_system_spark.operators import sort, transforms


class TestDatagen:
    def test_teragen_deterministic_across_parallelism(self, spark):
        a = datagen.teragen(spark, 500, parts=2).orderBy("id").collect()
        b = datagen.teragen(spark, 500, parts=8).orderBy("id").collect()
        assert a == b
        keys = {r.key10 for r in a}
        assert len(keys) == 500  # sha2 prefix: no collisions at this n
        assert all(len(r.payload) == 90 for r in a[:10])

    def test_random_text_shape(self, spark):
        df = datagen.random_text(spark, 100, words_per_line=5)
        rows = df.collect()
        assert len(rows) == 100
        assert all(len(r.line.split(" ")) == 5 for r in rows[:10])
        # deterministic
        again = datagen.random_text(spark, 100, words_per_line=5).collect()
        assert sorted(r.line for r in rows) == sorted(r.line for r in again)


class TestSortValidator:
    def test_valid_sort_passes(self, spark):
        data = datagen.teragen(spark, 2000, parts=8)
        out = sort.total_order_sort(data, "key10")
        v = datagen.validate_sort(data, out, ["key10"])
        assert v.ok and v.input_count == v.output_count == 2000

    def test_unsorted_output_fails_order(self, spark):
        data = datagen.teragen(spark, 1000, parts=4)
        shuffled = data.repartition(4)  # round-robin: order destroyed
        v = datagen.validate_sort(data, shuffled, ["key10"])
        assert not v.ordered and v.multiset_equal

    def test_corrupted_output_fails_multiset(self, spark):
        data = datagen.teragen(spark, 1000, parts=4)
        corrupted = sort.total_order_sort(
            data.withColumn(
                "payload",
                F.when(F.col("id") == 17, F.lit("CORRUPT")).otherwise(F.col("payload")),
            ),
            "key10",
        )
        v = datagen.validate_sort(data, corrupted, ["key10"])
        assert v.ordered and not v.multiset_equal and not v.ok

    def test_dropped_record_fails(self, spark):
        data = datagen.teragen(spark, 1000, parts=4)
        dropped = sort.total_order_sort(data.filter(F.col("id") != 3), "key10")
        v = datagen.validate_sort(data, dropped, ["key10"])
        assert not v.multiset_equal
        assert v.input_count == 1000 and v.output_count == 999

    def test_pi_estimate_converges_and_is_deterministic(self, spark):
        import math

        est1 = datagen.pi_estimate(spark, 40_000, parts=4)
        est2 = datagen.pi_estimate(spark, 40_000, parts=8)
        assert est1 == est2  # Halton: same points at any parallelism
        assert abs(est1 - math.pi) < 0.01

    def test_sample_partition_bounds_balance(self, spark):
        df = spark.range(0, 10000).selectExpr("id AS v")
        bounds = sort.sample_partition_bounds(df, "v", 4, rel_error=0.001)
        assert len(bounds) == 3
        # quartile split points of 0..9999, within the sketch error
        for got, want in zip(bounds, [2500, 5000, 7500]):
            assert abs(got - want) <= 100

    def test_wordcount_over_random_text(self, spark):
        # RandomTextWriter → WordCount: totals must equal n*words
        df = datagen.random_text(spark, 200, words_per_line=8)
        wc = transforms.word_count(df, "line")
        total = wc.agg(F.sum("cnt")).collect()[0][0]
        assert total == 200 * 8

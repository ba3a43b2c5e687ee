"""host_boilerplate_removal + mergeable BM25 stats unit behavior."""

from pyspark.sql import functions as F

from hadoop_distributed_dynamic_file_system_spark.operators import (
    textanalysis,
    webquality,
)


class TestHostBoilerplate:
    def _corpus(self, spark):
        rows = []
        # host A: 6 docs sharing a nav line (support 6/6 > 0.3)
        for i in range(6):
            rows.append((i, "a.com", f"nav bar\nbody {i} unique\nend {i}"))
        # host B: 2 docs sharing a line — below min_docs, untouched
        for i in range(2):
            rows.append((10 + i, "b.com", f"nav bar\nbody b{i}"))
        return spark.createDataFrame(rows, ["doc_id", "host", "text"])

    def test_template_removed_only_on_big_hosts(self, spark):
        out = webquality.host_boilerplate_removal(
            self._corpus(spark), "doc_id", "text", "host",
            frac=0.3, min_docs=5,
        ).collect()
        by_id = {r.doc_id: r for r in out}
        for i in range(6):  # host A: nav stripped, body kept in order
            r = by_id[i]
            assert r.n_boiler == 1 and r.n_lines == 3
            assert r.cleaned == f"body {i} unique\nend {i}"
        for i in (10, 11):  # host B: below min_docs -> untouched
            r = by_id[i]
            assert r.n_boiler == 0
            assert r.cleaned == f"nav bar\nbody b{i - 10}"

    def test_within_doc_repeat_counts_support_once(self, spark):
        # the repeated line appears TWICE in one doc of 6; per-doc
        # support is distinct docs (1/6 = 0.17 < 0.3) so it survives
        rows = [(0, "a.com", "dup\ndup\nx0")] + [
            (i, "a.com", f"x{i}\ny{i}") for i in range(1, 6)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "host", "text"])
        out = webquality.host_boilerplate_removal(
            df, "doc_id", "text", "host", frac=0.3, min_docs=5
        ).collect()
        r = {x.doc_id: x for x in out}[0]
        assert r.n_boiler == 0 and r.cleaned == "dup\ndup\nx0"

    def test_all_boiler_doc_comes_back_empty(self, spark):
        rows = [(i, "a.com", "same line") for i in range(6)]
        df = spark.createDataFrame(rows, ["doc_id", "host", "text"])
        out = webquality.host_boilerplate_removal(
            df, "doc_id", "text", "host", frac=0.3, min_docs=5
        ).collect()
        assert all(r.n_kept == 0 and r.cleaned == "" for r in out)

    def test_no_python_in_plan(self, spark):
        plan = (
            webquality.host_boilerplate_removal(
                self._corpus(spark), "doc_id", "text", "host"
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for node in ("BatchEvalPython", "MapInPandas", "ArrowEvalPython"):
            assert node not in plan


class TestMergeableBm25Stats:
    def test_merge_of_disjoint_shards_equals_full_scan(self, spark):
        rows = [(i, f"w{i % 3} common tok{i}") for i in range(20)]
        d = spark.createDataFrame(rows, ["doc_id", "text"])
        parts = [
            textanalysis.bm25_corpus_stats(
                d.filter(F.col("doc_id") % 3 == r), "doc_id", "text"
            )
            for r in range(3)
        ]
        m_terms, m_totals = textanalysis.merge_bm25_stats(parts)
        f_terms, f_totals = textanalysis.bm25_corpus_stats(
            d, "doc_id", "text"
        )
        got = {r.term: r.df for r in m_terms.collect()}
        want = {r.term: r.df for r in f_terms.collect()}
        assert got == want
        assert m_totals.first().asDict() == f_totals.first().asDict()

    def test_df_counts_distinct_docs_not_occurrences(self, spark):
        d = spark.createDataFrame(
            [(0, "a a a"), (1, "a b")], ["doc_id", "text"]
        )
        terms, totals = textanalysis.bm25_corpus_stats(d, "doc_id", "text")
        got = {r.term: r.df for r in terms.collect()}
        assert got == {"a": 2, "b": 1}
        t = totals.first()
        assert t.n_docs == 2 and t.sum_dl == 5


class TestStreamingBoilerplateGate:
    def test_stream_equals_batch_removal(self, spark, tmp_path):
        from hadoop_distributed_dynamic_file_system_spark.streaming import (
            events as ev,
        )

        rows = [
            (i, "a.com", f"nav bar\nbody {i}\nend {i}") for i in range(6)
        ] + [(10 + i, "b.com", f"nav bar\nbody b{i}") for i in range(2)]
        corpus = spark.createDataFrame(rows, ["doc_id", "host", "text"])
        index = webquality.host_boilerplate_index(
            corpus, "doc_id", "text", "host", frac=0.3, min_docs=5
        )
        batch_out = webquality.host_boilerplate_removal(
            corpus, "doc_id", "text", "host", frac=0.3, min_docs=5
        )

        src = tmp_path / "boiler_pages_in"
        corpus.coalesce(1).write.mode("append").parquet(str(src))
        stream = ev.read_parquet_dir_stream(
            spark, str(src), "doc_id long, host string, text string"
        )
        got = {
            (r.doc_id, r.host, r.n_lines, r.n_kept, r.n_boiler, r.cleaned)
            for r in ev.run_to_memory(
                ev.streaming_boilerplate_gate(stream, index),
                "boiler_gate_out",
            ).collect()
        }
        want = {
            (r.doc_id, r.host, r.n_lines, r.n_kept, r.n_boiler, r.cleaned)
            for r in batch_out.collect()
        }
        assert got == want and len(got) == 8
        # the big host's nav line is gone, the small host's is kept
        by_id = {t[0]: t for t in got}
        assert by_id[0][5] == "body 0\nend 0"
        assert by_id[10][5] == "nav bar\nbody b0"

    def test_unknown_host_passes_through(self, spark, tmp_path):
        from hadoop_distributed_dynamic_file_system_spark.streaming import (
            events as ev,
        )

        corpus = spark.createDataFrame(
            [(i, "a.com", "nav\nx") for i in range(6)],
            ["doc_id", "host", "text"],
        )
        index = webquality.host_boilerplate_index(
            corpus, "doc_id", "text", "host", frac=0.3, min_docs=5
        )
        fresh = spark.createDataFrame(
            [(99, "never-seen.com", "nav\nx")], ["doc_id", "host", "text"]
        )
        src = tmp_path / "boiler_fresh_in"
        fresh.coalesce(1).write.mode("append").parquet(str(src))
        stream = ev.read_parquet_dir_stream(
            spark, str(src), "doc_id long, host string, text string"
        )
        out = ev.run_to_memory(
            ev.streaming_boilerplate_gate(stream, index), "boiler_fresh_out"
        ).first()
        assert out.n_boiler == 0 and out.cleaned == "nav\nx"


class TestNegativeSamples:
    def test_no_self_pairs_and_reproducible(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import (
            curation,
        )

        d = spark.createDataFrame([(i,) for i in range(30)], ["doc_id"])
        out1 = curation.negative_samples(d, "doc_id", k=3).collect()
        out2 = curation.negative_samples(d, "doc_id", k=3).collect()
        assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
        assert len(out1) == 90  # 30 docs x 3 negatives, none dropped
        for r in out1:
            assert r.neg_id != r.doc_id  # wrap-shift kills self-pairs

    def test_seed_changes_samples(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import (
            curation,
        )

        d = spark.createDataFrame([(i,) for i in range(30)], ["doc_id"])
        a = {tuple(r) for r in curation.negative_samples(
            d, "doc_id", k=3, seed=1).collect()}
        b = {tuple(r) for r in curation.negative_samples(
            d, "doc_id", k=3, seed=2).collect()}
        assert a != b

    def test_single_row_corpus_empty(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import (
            curation,
        )

        d = spark.createDataFrame([(1,)], ["doc_id"])
        assert curation.negative_samples(d, "doc_id").count() == 0


class TestGroupedNegativeSamples:
    def test_negatives_stay_in_group_no_self(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import (
            curation,
        )

        rows = [(i, "g" + str(i % 3)) for i in range(30)] + [(99, "solo")]
        d = spark.createDataFrame(rows, ["doc_id", "grp"])
        out = curation.grouped_negative_samples(
            d, "doc_id", "grp", k=3
        ).collect()
        grp_of = dict(rows)
        assert len(out) == 90  # 30 grouped docs x 3; solo draws none
        for r in out:
            assert r.neg_id != r.doc_id
            assert grp_of[r.neg_id] == r.grp  # in-group only

    def test_two_member_group_always_picks_the_other(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.operators import (
            curation,
        )

        d = spark.createDataFrame([(1, "g"), (2, "g")], ["doc_id", "grp"])
        out = curation.grouped_negative_samples(
            d, "doc_id", "grp", k=2
        ).collect()
        assert len(out) == 4
        for r in out:
            assert r.neg_id == (2 if r.doc_id == 1 else 1)

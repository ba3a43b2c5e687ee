"""Maintenance actor (operators/maintenance.py) — the DAEMON leg.

Pins the round-10 contract: a tick compacts EXACTLY when the census
recommends it, dry-run reports without acting, probes see identical
survivors before and after a fired tick, a fired tick is idempotent
(the next one reads 'healthy'), and the fleet sweep survives a sick
index instead of dying on it."""

import shutil

import pytest
from pyspark.sql import functions as F

from hadoop_distributed_dynamic_file_system_spark.operators import (
    dedup,
    maintenance,
    similarity,
    skew,
    tombstones,
)


def _drop(spark, t):
    for x in (t, t + "__tombstones", t + "__compact_tmp",
              t + "__tombstones__swap"):
        spark.sql(f"DROP TABLE IF EXISTS {x}")
        shutil.rmtree(f"spark-warehouse/{x}", ignore_errors=True)


CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the bank"),
    (2, "an entirely different sentence about distributed systems today"),
]
BATCH = [
    (101, "quick brown fox jumps over the lazy dog near the bank"),
    (102, "entirely different sentence about distributed systems today"),
    (999, "totally novel content with no shingle overlap whatsoever"),
]


class TestMaintainBandIndex:
    def _freeze(self, spark, t):
        _drop(spark, t)
        corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
        dedup.freeze_band_index_attributed(
            corpus, "doc_id", "text", t, num_buckets=8
        )
        return corpus

    def _survivors(self, spark, t):
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        return {
            r.doc_id
            for r in dedup.incremental_near_dedup_attributed(
                spark, batch, t, "doc_id", "text"
            ).collect()
        }

    def test_tick_fires_exactly_when_recommended(self, spark):
        t = "t_maint_band"
        self._freeze(spark, t)
        try:
            # healthy index: tick is a no-op census
            r0 = maintenance.maintain_index(spark, t, "band")
            assert r0["action"] == "healthy"
            assert r0["dead_rows"] == 0 and r0["recommend_compact"] is False
            assert not spark.catalog.tableExists(t + "__tombstones")

            # retract doc 1 (~half the rows dead >= default 0.2)
            dedup.retract_from_band_index(
                spark, t, spark.createDataFrame([(1,)], "doc_id long"),
                "doc_id",
            )
            before = self._survivors(spark, t)

            # threshold is honored: above the actual fraction -> no fire
            r1 = maintenance.maintain_index(
                spark, t, "band", compact_threshold=0.9
            )
            assert r1["action"] == "healthy"
            assert spark.catalog.tableExists(t + "__tombstones")

            # dry-run: decision reported, nothing acted on
            r2 = maintenance.maintain_index(spark, t, "band", dry_run=True)
            assert r2["action"] == "would_compact"
            assert r2["recommend_compact"] is True and r2["dead_rows"] > 0
            assert spark.catalog.tableExists(t + "__tombstones")

            # real tick: compaction fires, tombstones fold away
            r3 = maintenance.maintain_index(spark, t, "band")
            assert r3["action"] == "compacted"
            assert not spark.catalog.tableExists(t + "__tombstones")
            # probe-equivalence across the fired tick
            assert self._survivors(spark, t) == before == {101, 999}
            # the fold kept only live rows and the bucketed layout
            assert spark.table(t).filter(F.col("doc_id") == 1).count() == 0
            assert skew.bucket_spec(spark, t) == (["bk"], 8)

            # idempotent: next tick reads the folded index as healthy
            r4 = maintenance.maintain_index(spark, t, "band")
            assert r4["action"] == "healthy" and r4["dead_rows"] == 0
            # decision records are self-describing for fleet logs
            assert (r3["table"], r3["modality"], r3["id_col"]) == (
                t, "band", "doc_id"
            )
        finally:
            _drop(spark, t)
            spark.catalog.clearCache()

    def test_fragmentation_signal_fires_without_dead_rows(self, spark):
        # append_bucketed fragmentation is the SECOND signal: each
        # extend adds a file to every bucket its new keys touch, so
        # after two extends some bucket holds >= 2 files; with
        # max_files_per_bucket=2 the tick must fire (reason
        # 'fragmentation', zero dead rows) and the fold must restore
        # one file per bucket so the next tick is healthy.
        t = "t_maint_frag"
        self._freeze(spark, t)
        try:
            for k, text in (
                (10, "completely novel words appear here today friends"),
                (11, "yet more unrelated vocabulary arrives in batch two"),
            ):
                dedup.extend_band_index_attributed(
                    spark,
                    spark.createDataFrame(
                        [(k, text)], "doc_id long, text string"
                    ),
                    t, "doc_id", "text",
                )
            fc = skew.bucket_file_census(spark, t)
            assert fc["n_buckets"] == 8
            assert fc["max_files_per_bucket"] >= 2

            # default threshold (8) not reached -> healthy
            r0 = maintenance.maintain_index(spark, t, "band")
            assert (r0["action"], r0["reason"]) == ("healthy", None)
            assert r0["files_max_per_bucket"] == fc["max_files_per_bucket"]

            before = self._survivors(spark, t)
            r1 = maintenance.maintain_index(
                spark, t, "band", max_files_per_bucket=2
            )
            assert (r1["action"], r1["reason"]) == (
                "compacted", "fragmentation"
            )
            assert r1["dead_rows"] == 0
            assert skew.bucket_file_census(spark, t)[
                "max_files_per_bucket"
            ] == 1
            assert self._survivors(spark, t) == before
            r2 = maintenance.maintain_index(
                spark, t, "band", max_files_per_bucket=2
            )
            assert (r2["action"], r2["reason"]) == ("healthy", None)
        finally:
            _drop(spark, t)
            spark.catalog.clearCache()

    def test_dead_rows_win_the_reason_label(self, spark):
        # both signals fired: the fold is the same, the label names
        # the dead rows (the operator's follow-up differs)
        t = "t_maint_both"
        self._freeze(spark, t)
        try:
            dedup.retract_from_band_index(
                spark, t, spark.createDataFrame([(1,)], "doc_id long"),
                "doc_id",
            )
            r = maintenance.maintain_index(
                spark, t, "band", max_files_per_bucket=1
            )
            assert (r["action"], r["reason"]) == ("compacted", "dead_rows")
            # disabling the file census drops its record fields
            r2 = maintenance.maintain_index(
                spark, t, "band", max_files_per_bucket=None
            )
            assert r2["action"] == "healthy"
            assert "files_total" not in r2
        finally:
            _drop(spark, t)
            spark.catalog.clearCache()

    def test_unknown_modality_raises(self, spark):
        with pytest.raises(ValueError, match="modality"):
            maintenance.maintain_index(spark, "whatever", "bogus")

    def test_tick_self_heals_half_swap(self, spark):
        # a fold that crashed between compact_bucketed's DROP and
        # RENAME leaves the data in __compact_tmp and the index
        # unservable; the NEXT tick must complete the rename before
        # its census (recorded), then tick normally — re-running the
        # daemon IS the recovery path.
        t = "t_maint_crash"
        self._freeze(spark, t)
        try:
            before = self._survivors(spark, t)
            # simulate the crash state: staged tmp present, table gone
            cols, nb = skew.bucket_spec(spark, t)
            spark.sql(f"DROP TABLE IF EXISTS {t}__compact_tmp")
            skew.write_bucketed(
                spark.table(t), f"{t}__compact_tmp", cols, num_buckets=nb
            )
            spark.sql(f"DROP TABLE {t}")
            assert not spark.catalog.tableExists(t)

            rec = maintenance.maintain_index(spark, t, "band")
            assert rec.get("recovered_half_swap") is True
            assert rec["action"] == "healthy"  # clean index post-heal
            assert spark.catalog.tableExists(t)
            assert not spark.catalog.tableExists(t + "__compact_tmp")
            assert skew.bucket_spec(spark, t) == (cols, nb)
            assert self._survivors(spark, t) == before
            # a normal tick carries no recovery field
            assert "recovered_half_swap" not in maintenance.maintain_index(
                spark, t, "band"
            )
        finally:
            _drop(spark, t)
            spark.catalog.clearCache()

    def test_sweep_survives_sick_index(self, spark):
        # fleet sweep: an unattributed index errors (its guard applies
        # to the daemon path too) without aborting the healthy ticks
        # after it.
        t_ok, t_bad = "t_maint_ok", "t_maint_bad"
        self._freeze(spark, t_ok)
        _drop(spark, t_bad)
        corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
        dedup.freeze_band_index_bucketed(
            corpus, "doc_id", "text", t_bad, num_buckets=8
        )  # key-only: not retractable, census must refuse
        try:
            dedup.retract_from_band_index(
                spark, t_ok,
                spark.createDataFrame([(1,)], "doc_id long"), "doc_id",
            )
            recs = maintenance.maintain_indexes(
                spark,
                [
                    {"table_name": t_bad, "modality": "band"},
                    {"table_name": t_ok, "modality": "band"},
                ],
            )
            assert [r["action"] for r in recs] == ["error", "compacted"]
            assert "attribution" in recs[0]["error"]
            assert not spark.catalog.tableExists(t_ok + "__tombstones")
        finally:
            _drop(spark, t_ok)
            _drop(spark, t_bad)
            spark.catalog.clearCache()


class TestMaintainIvfIndex:
    def test_tick_compacts_served_ivf(self, spark):
        t = "t_maint_ivf"
        _drop(spark, t)
        vecs = spark.createDataFrame(
            [(i, [float(i % 4), float((i * 7) % 5), 1.0]) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        cents = similarity.kmeans_fit(vecs, k=2, iterations=2)
        cents = cents.persist()
        cents.count()
        try:
            similarity.build_ivf_index(vecs, cents, t, num_buckets=4)
            similarity.retract_from_ivf_index(
                spark, t,
                spark.createDataFrame(
                    [(i,) for i in range(0, 20, 2)], "vec_id long"
                ),
            )
            qs = vecs.filter(F.col("vec_id") < 2)
            before = sorted(
                (r.query_id, r.vec_id, r.score, r.rk)
                for r in similarity.ivf_topk_indexed(
                    spark, t, qs, cents, k=3, nprobe=2
                ).collect()
            )
            rec = maintenance.maintain_index(spark, t, "ivf")
            assert rec["action"] == "compacted"
            assert rec["id_col"] == "vec_id"  # modality default applied
            assert not spark.catalog.tableExists(t + "__tombstones")
            after = sorted(
                (r.query_id, r.vec_id, r.score, r.rk)
                for r in similarity.ivf_topk_indexed(
                    spark, t, qs, cents, k=3, nprobe=2
                ).collect()
            )
            assert before == after and len(after) > 0
            assert maintenance.maintain_index(spark, t, "ivf")["action"] == (
                "healthy"
            )
        finally:
            cents.unpersist()
            _drop(spark, t)
            spark.catalog.clearCache()


class TestTombstoneHalfSwapHeal:
    """A tombstone rewrite (clear_for resurrection, generational
    retire) stages `<tomb>__swap`, DROPs the live table, then RENAMEs.
    A crash between the last two steps makes the tombstone set
    apparently ABSENT — and absence is load-bearing: live() keys its
    anti-join and health() its dead-row census on catalog existence,
    so without repair every retracted id silently resurfaces and the
    daemon reads the index healthy forever. tombstones._heal_swap at
    every entry point turns the next touch into the recovery."""

    def _freeze_retract(self, spark, t):
        _drop(spark, t)
        corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
        dedup.freeze_band_index_attributed(
            corpus, "doc_id", "text", t, num_buckets=8
        )
        dedup.retract_from_band_index(
            spark, t, spark.createDataFrame([(1,)], "doc_id long"), "doc_id"
        )

    def _crash_swap(self, spark, tomb):
        # replicate a rewrite's steps up to the crash point: staged
        # copy written, live table dropped, rename never ran
        tmp = f"{tomb}__swap"
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        staged = spark.table(tomb)
        staged.write.saveAsTable(tmp)
        spark.sql(f"DROP TABLE {tomb}")

    def _survivors(self, spark, t):
        batch = spark.createDataFrame(BATCH, "doc_id long, text string")
        return {
            r.doc_id
            for r in dedup.incremental_near_dedup_attributed(
                spark, batch, t, "doc_id", "text"
            ).collect()
        }

    def test_probe_heals_and_keeps_filtering(self, spark):
        t = "t_tomb_heal_probe"
        self._freeze_retract(spark, t)
        tomb = t + "__tombstones"
        try:
            # doc 1 retracted -> its near-dup 101 survives the gate
            assert self._survivors(spark, t) == {101, 999}
            self._crash_swap(spark, tomb)
            assert not spark.catalog.tableExists(tomb)
            # the next probe heals the half-swap and still filters —
            # no silent resurrection of doc 1's gating
            assert self._survivors(spark, t) == {101, 999}
            assert spark.catalog.tableExists(tomb)
            assert not spark.catalog.tableExists(f"{tomb}__swap")
        finally:
            _drop(spark, t)
            spark.catalog.clearCache()

    def test_daemon_census_heals_and_fires(self, spark):
        t = "t_tomb_heal_census"
        self._freeze_retract(spark, t)
        tomb = t + "__tombstones"
        try:
            self._crash_swap(spark, tomb)
            # without the heal the census would read dead_rows=0 and
            # the daemon would never repair; with it, the tick sees
            # the retraction and fires the fold
            rec = maintenance.maintain_index(spark, t, "band")
            assert (rec["action"], rec["reason"]) == (
                "compacted", "dead_rows"
            )
            # the repair is surfaced in the decision record, the same
            # fleet-log visibility as recovered_half_swap
            assert rec.get("healed_tombstone_swap") is True
            assert self._survivors(spark, t) == {101, 999}
        finally:
            _drop(spark, t)
            spark.catalog.clearCache()

    def test_crashed_tomb_migration_rerun_preserves_content(self, spark):
        import shutil

        t = "t_tomb_heal_migr"
        self._freeze_retract(spark, t)
        tomb = t + "__tombstones"
        root = None
        try:
            skew.enable_generational(spark, t)
            # simulate tombstones.enable_generational crashing between
            # its DROP and RENAME: staged external copy at the gen-A
            # tombstone directory, live tombstone table dropped
            root = tombstones._base_generational_root(spark, t)
            loc = root + skew._GEN_SUFFIXES[0]
            tmp = f"{tomb}__swap"
            spark.sql(f"DROP TABLE IF EXISTS {tmp}")
            skew._delete_dir(spark, loc)
            spark.table(tomb).write.option("path", loc).saveAsTable(tmp)
            spark.sql(f"DROP TABLE {tomb}")
            # re-running the migration IS the recovery: heal first,
            # then the already-generational side is left alone — the
            # retraction content survives (no silent arm-empty)
            tombstones.enable_generational(spark, t, "doc_id")
            assert skew.generational_location(spark, tomb).endswith(
                "__genA"
            )
            assert spark.table(tomb).count() == 1
            assert self._survivors(spark, t) == {101, 999}
        finally:
            _drop(spark, t)
            for suf in ("__genA", "__genB", "__tombstones__genA",
                        "__tombstones__genB"):
                shutil.rmtree(
                    f"spark-warehouse/{t}{suf}", ignore_errors=True
                )
            spark.catalog.clearCache()

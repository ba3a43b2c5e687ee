"""Tombstone-table mechanics shared by every retractable frozen index
(text band index, media band index, IVF inverted lists).

The day-2 DELETE leg must cost retraction-sized work, not corpus-sized
work: a frozen bucketed index at 100 TB cannot be rewritten per
takedown. So deletes accumulate in a small side table
`<index>__tombstones` (one id column), probes subtract it as a
broadcast LEFT ANTI on the id — partitioning of the frozen scan is
preserved, so bucketed sort-merge probes stay Exchange-free — and a
scheduled compaction folds the tombstones into the base with ONE
staged rewrite (skew.compact_bucketed's swap discipline).

Reference analog: deletion there is `FsShell -rm` + the NameNode
re-replicating around the hole (src/hdfs/.../FSNamesystem.java) —
metadata-cheap delete now, physical cleanup deferred; this module is
the same trade for index state.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def tombstone_table(table_name: str) -> str:
    return f"{table_name}__tombstones"


# ------------------------------------------------- generational layout
# When the BASE index is in skew's generational layout (zero-downtime
# compaction), the tombstone table must follow it: the fold used to
# DROP the tombstone table, and deleting its files is exactly what
# killed live gates (the measured FAILED_READ came from the stale
# tombstone listing first). Generational tombstones ping-pong between
# `<base_root>__tombstones__gen{A,B}` with catalog-only swaps, so a
# retirement (post-fold empty set) or a clear_for rewrite never
# deletes files a running gate still lists; the retired directory is
# reclaimed at the NEXT swap. Tombstone relations are
# retraction-sized, so the 2x retention is bytes-trivial.


def _base_generational_root(spark: SparkSession, table_name: str) -> str | None:
    """`<base-location-minus-suffix>__tombstones` when the BASE index
    is generational, else None."""
    from . import skew

    loc = skew.generational_location(spark, table_name)
    if loc is None:
        return None
    return loc[: -len(skew._GEN_SUFFIXES[0])] + "__tombstones"


def _create_generational(
    spark: SparkSession, table_name: str, df: DataFrame
) -> None:
    """First write of a generational tombstone table (gen A). The
    target directory is cleared first: an orphaned dir from a dropped
    predecessor would otherwise be ADOPTED by the external create,
    resurrecting stale tombstones."""
    from . import skew

    root = _base_generational_root(spark, table_name)
    tomb = tombstone_table(table_name)
    loc = root + skew._GEN_SUFFIXES[0]
    skew._delete_dir(spark, loc)
    df.write.option("path", loc).saveAsTable(tomb)


def _generational_swap_small(
    spark: SparkSession, table: str, new_df: DataFrame
) -> None:
    """Catalog-only rewrite of a small generational side table: stage
    `new_df` into the other generation directory (reclaiming it), then
    DROP external + RENAME — the current generation's files survive
    for plans already reading them."""
    from . import skew

    loc = skew.generational_location(spark, table)
    next_loc = skew._next_generation(loc)
    tmp = f"{table}__swap"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    skew._delete_dir(spark, next_loc)
    new_df.write.option("path", next_loc).saveAsTable(tmp)
    spark.sql(f"DROP TABLE {table}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")


def _heal_swap(spark: SparkSession, table: str) -> bool:
    """Complete a crashed tombstone rewrite's half-swap. clear_for and
    _generational_swap_small stage the new set as `<table>__swap`,
    DROP the live table, then RENAME; a crash between the last two
    leaves the staged table orphaned and the tombstone set apparently
    ABSENT — and absence is load-bearing: live() keys its anti-join
    and health() its dead-row census on catalog existence, so every
    retracted id would silently resurface to probes and the daemon
    would read the index healthy forever. Every tombstone entry point
    (read or write) calls this first, so the next touch completes the
    rename instead — the same the-retry-IS-the-recovery idiom as the
    base index's `__compact_tmp` self-heal (skew.compact_bucketed /
    the daemon's `recovered_half_swap`). Returns True when a repair
    ran (maintain_index surfaces it in its decision record as
    `healed_tombstone_swap`)."""
    tmp = f"{table}__swap"
    if spark.catalog.tableExists(tmp) and not spark.catalog.tableExists(
        table
    ):
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {table}")
        # same per-repair visibility as the daemon's recovered_half_swap
        logger.warning(
            "healed crashed tombstone half-swap: %s -> %s", tmp, table
        )
        return True
    return False


def add(
    spark: SparkSession,
    table_name: str,
    retract_ids: DataFrame,
    id_col: str,
) -> None:
    """Record ids as retracted from `table_name`. Idempotent — replaying
    a retraction feed appends nothing new."""
    from . import skew

    tomb = tombstone_table(table_name)
    _heal_swap(spark, tomb)
    ids = retract_ids.select(id_col).distinct()
    if spark.catalog.tableExists(tomb):
        ids = ids.join(spark.table(tomb), id_col, "left_anti")
        ids.write.mode("append").saveAsTable(tomb)
    elif _base_generational_root(spark, table_name) is not None:
        _create_generational(spark, table_name, ids)
    else:
        # a tombstone dir can outlive the in-memory catalog across
        # sessions (same pathology skew.write_bucketed handles)
        skew._remove_orphan_table_dir(spark, tomb)
        ids.write.saveAsTable(tomb)


def live(spark: SparkSession, table_name: str, id_col: str) -> DataFrame:
    """The frozen table minus its tombstones — what every probe must
    see. Tombstones are retraction-sized, so they ride as a broadcast
    LEFT ANTI: no Exchange is added on the frozen scan and its bucketed
    layout stays usable by sort-merge probes."""
    base = spark.table(table_name)
    tomb = tombstone_table(table_name)
    _heal_swap(spark, tomb)
    if spark.catalog.tableExists(tomb):
        base = base.join(
            F.broadcast(spark.table(tomb)), id_col, "left_anti"
        )
    return base


def clear_for(
    spark: SparkSession,
    table_name: str,
    ids: DataFrame,
    id_col: str,
) -> None:
    """Remove specific ids from the tombstone set (resurrection on
    re-add). The tombstone table rewrites — retraction-sized, never
    corpus-sized — through a swap table (overwrite-from-own-scan is
    rejected by Spark)."""
    from . import skew

    tomb = tombstone_table(table_name)
    _heal_swap(spark, tomb)
    if not spark.catalog.tableExists(tomb):
        return
    remaining = spark.table(tomb).join(
        ids.select(id_col).distinct(), id_col, "left_anti"
    )
    if skew.generational_location(spark, tomb) is not None:
        _generational_swap_small(spark, tomb, remaining)
        return
    tmp = f"{tomb}__swap"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    skew._remove_orphan_table_dir(spark, tmp)
    remaining.write.saveAsTable(tmp)
    spark.sql(f"DROP TABLE IF EXISTS {tomb}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {tomb}")


def drop(spark: SparkSession, table_name: str) -> None:
    """Forget all tombstones of `table_name` — called when a compaction
    folds them into the base, or when a re-freeze starts a new index
    generation (stale tombstones must not suppress the new corpus).
    Also drops an orphaned half-swap staging table: its content is
    exactly what is being forgotten."""
    tomb = tombstone_table(table_name)
    spark.sql(f"DROP TABLE IF EXISTS {tomb}")
    spark.sql(f"DROP TABLE IF EXISTS {tomb}__swap")


def compact(
    spark: SparkSession,
    table_name: str,
    id_col: str,
    sort_cols: list[str] | None = None,
) -> None:
    """Fold tombstones into the base: one staged bucketed rewrite of
    the LIVE rows (skew.compact_bucketed's swap — re-running after a
    mid-swap crash completes the rename), then the tombstone table
    drops. Probes see identical rows before and after; a crash between
    swap and drop is harmless (re-applying tombstones to a base that
    already excludes them anti-joins to nothing)."""
    from . import skew

    _heal_swap(spark, tombstone_table(table_name))
    skew.compact_bucketed(
        spark, table_name, sort_cols=sort_cols,
        transform=lambda df: _subtract(spark, df, table_name, id_col),
    )
    tomb = tombstone_table(table_name)
    if spark.catalog.tableExists(tomb) and (
        skew.generational_location(spark, tomb) is not None
    ):
        # generational: retire to an EMPTY set catalog-only — the old
        # tombstone files survive for live gates (whose stale base
        # listing is the RETIRED pre-fold generation, so the stale
        # tombstones are exactly the correct companion), and the
        # armed-empty anti-join keeps the retraction pickup contract
        # for the running stream.
        _generational_swap_small(
            spark, tomb, spark.table(tomb).limit(0)
        )
    else:
        drop(spark, table_name)


def _subtract(spark, df: DataFrame, table_name: str, id_col: str) -> DataFrame:
    tomb = tombstone_table(table_name)
    if spark.catalog.tableExists(tomb):
        df = df.join(F.broadcast(spark.table(tomb)), id_col, "left_anti")
    return df


def enable_generational(
    spark: SparkSession, table_name: str, id_col: str
) -> None:
    """One-time migration of a RETRACTABLE frozen index (any modality
    — text/media bands, IVF lists) into the zero-downtime-compaction
    layout: the base moves via skew.enable_generational, the tombstone
    table follows into its own ping-pong directories, and the (empty,
    if new) tombstone side is armed (ensure) so gates started after
    the migration carry the anti-join. Run in a quiescent window —
    this is the LAST fold-shaped rewrite that breaks live consumers;
    every maintenance tick after it swaps catalog-only."""
    from . import skew

    skew.enable_generational(spark, table_name)
    tomb = tombstone_table(table_name)
    _heal_swap(spark, tomb)
    if spark.catalog.tableExists(tomb) and (
        skew.generational_location(spark, tomb) is None
    ):
        root = _base_generational_root(spark, table_name)
        loc = root + skew._GEN_SUFFIXES[0]
        tmp = f"{tomb}__swap"
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        skew._delete_dir(spark, loc)
        spark.table(tomb).write.option("path", loc).saveAsTable(tmp)
        spark.sql(f"DROP TABLE {tomb}")  # managed: old files deleted
        spark.sql(f"ALTER TABLE {tmp} RENAME TO {tomb}")
    ensure(spark, table_name, id_col)


def ensure(spark: SparkSession, table_name: str, id_col: str) -> None:
    """Create an EMPTY tombstone table for `table_name` if none exists
    — arming retraction pickup for long-running consumers.

    Why this matters for streaming: `live()` decides whether the
    anti-join is in the plan by catalog existence AT PLAN TIME, and a
    streaming gate plans its static side once at `start()`. If the
    first retraction happens after the stream started, the running
    query's plan has no anti-join to feed and the retraction is
    invisible until restart. Calling ensure() before `start()` puts
    the (empty) anti-join in the plan; each micro-batch then re-reads
    the side table, so later `add()` calls take effect on the very
    next batch — the same live-pickup contract as index appends
    (extend_band_index_bucketed). Batch probes never need this: they
    plan per call.

    The empty table inherits `id_col`'s type from the base table, so
    a later add() appends with an identical schema."""
    tomb = tombstone_table(table_name)
    _heal_swap(spark, tomb)
    if spark.catalog.tableExists(tomb):
        return
    from . import skew

    empty = spark.table(table_name).select(id_col).limit(0)
    if _base_generational_root(spark, table_name) is not None:
        _create_generational(spark, table_name, empty)
        return
    skew._remove_orphan_table_dir(spark, tomb)
    empty.write.saveAsTable(tomb)


def health(
    spark: SparkSession,
    table_name: str,
    id_col: str,
    key_cols: list[str],
    compact_threshold: float = 0.2,
) -> DataFrame:
    """One-row health census of a retractable frozen index — the
    MONITOR leg of the day-2 lifecycle, shared by every index modality
    (text bands key_cols=["bk"], media bands ["mbk", "mcode"], IVF
    inverted lists ["centroid_id"]). An ops pipeline runs it on a
    cadence to decide WHEN to pay the corpus-sized compaction rewrite,
    the way lsh_bucket_stats decides whether a candidate join is
    affordable BEFORE paying it.

    Columns (all scalars, one row):
      index_rows     total rows in the frozen base
      dead_rows      rows owned by a tombstoned id — anti-join work
                     every probe repays until a compact folds it away
      live_rows      index_rows - dead_rows
      dead_frac      dead_rows / index_rows (NULL on an empty index)
      live_docs      distinct live ids still gating / served
      retracted_docs tombstone-table size — the broadcast every probe
                     plan carries
      live_keys      distinct key_cols groups still live (occupied
                     bands / perceptual codes / IVF cells)
      max_key_docs   largest live group (skew probe: a boilerplate-
                     degenerate band or a hot IVF cell shows up first)
      recommend_compact  dead_frac >= compact_threshold — the cadence
                     signal for the modality's compact_* call

    Scale shape: two scans of the frozen base (row census + live key
    census — bucketed layout intact; the tombstone join broadcasts,
    adding no Exchange). The per-key grouped count rides the existing
    bucketing when key_cols lead with the bucket column (adjacent
    partial/final HashAggregates, zero Exchange — plan above the
    frozen scan stays shuffle-free), the only data-sized shuffle is
    the distinct-live-id rewrite (doc-count-sized), and the three
    1-row aggregates join by broadcast. A single-pass rollup would
    trade the second scan for an index-sized distinct shuffle — worse
    at 100 TB, where scans are cheaper than shuffles; caching the
    flagged relation instead LOSES the bucketed partitioning through
    the InMemoryRelation and re-acquires that same shuffle (measured
    r12 — the zero-bk-Exchange pin failed), so the two-scan shape
    stands.

    Reference parity: the ops-visibility analog of fsck + `dfs -count`
    (src/hdfs/org/apache/hadoop/hdfs/server/namenode/NamenodeFsck.java,
    src/core/org/apache/hadoop/fs/FsShell.java count) — surface the
    dead weight a deletion left behind so the operator knows when to
    reclaim it, instead of discovering it as probe-time cost."""
    base = spark.table(table_name)
    tomb_name = tombstone_table(table_name)
    _heal_swap(spark, tomb_name)
    if spark.catalog.tableExists(tomb_name):
        tomb = spark.table(tomb_name)
    else:
        tomb = base.select(id_col).limit(0)
    flagged = base.join(
        F.broadcast(tomb.select(F.col(id_col).alias("_tid"))),
        F.col(id_col) == F.col("_tid"),
        "left",
    ).select(
        *key_cols, id_col, F.col("_tid").isNotNull().alias("dead")
    )
    # NOT persisted across the two aggregates, deliberately (measured
    # r12): an InMemoryRelation of `flagged` loses the bucketed scan's
    # HashPartitioning(bk) (the cached plan reports unknown
    # partitioning under AQE), so the live-key census re-acquires an
    # index-sized Exchange hashpartitioning(bk…) — the exact shuffle
    # the two-scan shape exists to avoid at 100 TB, and the
    # zero-bk-Exchange pin in test_scale_types failed the moment the
    # cache went in. Two bucketed scans + broadcast flag joins stay
    # the cheaper trade.
    row_stats = flagged.agg(
        F.count("*").alias("index_rows"),
        F.coalesce(
            F.sum(F.col("dead").cast("long")), F.lit(0).cast("long")
        ).alias("dead_rows"),
        F.count_distinct(
            F.when(~F.col("dead"), F.col(id_col))
        ).alias("live_docs"),
    )
    key_stats = (
        flagged.filter(~F.col("dead"))
        .groupBy(*key_cols)
        .agg(F.count("*").alias("_kn"))
        .agg(
            F.count("*").alias("live_keys"),
            F.coalesce(
                F.max("_kn"), F.lit(0).cast("long")
            ).alias("max_key_docs"),
        )
    )
    retr = tomb.agg(F.count("*").alias("retracted_docs"))
    frac = F.try_divide(
        F.col("dead_rows").cast("double"), F.col("index_rows").cast("double")
    )
    return (
        row_stats.join(F.broadcast(key_stats))
        .join(F.broadcast(retr))
        .select(
            "index_rows",
            "dead_rows",
            (F.col("index_rows") - F.col("dead_rows")).alias("live_rows"),
            F.round(frac, 6).alias("dead_frac"),
            "live_docs",
            "retracted_docs",
            "live_keys",
            "max_key_docs",
            F.coalesce(
                frac >= F.lit(float(compact_threshold)), F.lit(False)
            ).alias("recommend_compact"),
        )
    )

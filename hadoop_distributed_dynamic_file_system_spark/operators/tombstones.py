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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tombstone_table(table_name: str) -> str:
    return f"{table_name}__tombstones"


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
    ids = retract_ids.select(id_col).distinct()
    if spark.catalog.tableExists(tomb):
        ids = ids.join(spark.table(tomb), id_col, "left_anti")
        ids.write.mode("append").saveAsTable(tomb)
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
    if not spark.catalog.tableExists(tomb):
        return
    remaining = spark.table(tomb).join(
        ids.select(id_col).distinct(), id_col, "left_anti"
    )
    tmp = f"{tomb}__swap"
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    skew._remove_orphan_table_dir(spark, tmp)
    remaining.write.saveAsTable(tmp)
    spark.sql(f"DROP TABLE IF EXISTS {tomb}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {tomb}")


def drop(spark: SparkSession, table_name: str) -> None:
    """Forget all tombstones of `table_name` — called when a compaction
    folds them into the base, or when a re-freeze starts a new index
    generation (stale tombstones must not suppress the new corpus)."""
    spark.sql(f"DROP TABLE IF EXISTS {tombstone_table(table_name)}")


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

    skew.compact_bucketed(
        spark, table_name, sort_cols=sort_cols,
        transform=lambda df: _subtract(spark, df, table_name, id_col),
    )
    drop(spark, table_name)


def _subtract(spark, df: DataFrame, table_name: str, id_col: str) -> DataFrame:
    tomb = tombstone_table(table_name)
    if spark.catalog.tableExists(tomb):
        df = df.join(F.broadcast(spark.table(tomb)), id_col, "left_anti")
    return df


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
    if spark.catalog.tableExists(tomb):
        return
    from . import skew

    skew._remove_orphan_table_dir(spark, tomb)
    spark.table(table_name).select(id_col).limit(0).write.saveAsTable(tomb)

"""Maintenance actor over retractable frozen indexes — the DAEMON leg
of the day-2 lifecycle.

Round 9 gave every index modality a MONITOR (the one-row
tombstones.health census with its `recommend_compact` cadence signal)
and a corpus-sized compaction to retire dead rows. What was still
missing is the thing that makes the reference fork novel: its
DynamicReplicationMonitor is a *daemon* that reads its own policy
signal and ACTS on it (FSNamesystem.java:4389-4560 computes the
EWMA heat and the monitor thread promotes/demotes replication by
itself; FSDirectory.java:1365-1373 wires the policy into the
namespace) — the operator never re-replicates by hand. This module is
that actor for index state: read the census, and when the signal
fires, pay the fold.

`maintain_index` is ONE maintenance tick for one index;
`maintain_indexes` sweeps a fleet of them — the loop body a scheduler
(cron / Airflow / a Structured Streaming foreachBatch hook) runs on
whatever cadence the ingest pipeline's quiet window allows. The tick
itself is census-priced (two bucketed scans + broadcast 1-row joins,
see tombstones.health) unless it decides to compact, which is the
whole point: the expensive rewrite happens exactly when the policy
says it pays for itself, never on a blind schedule.

Scale shape: the only driver-side materialization is the ONE-row
census collect — bounded by construction. The compaction it may
trigger is skew.compact_bucketed's staged swap (crash-safe: re-running
the tick IS the recovery path). Live-gate contract, MEASURED (round
11, pinned by tests/test_streaming.py
test_live_gate_across_fired_maintenance_tick): a streaming gate
already probing the table holds its analyzed plan's resolved
relations, so after a fired fold its next micro-batch fails LOUDLY
(FAILED_READ_FILE on the swapped files terminates the query — never a
silent empty-index pass-through; an explicit refreshTable cannot
reach the running plan either), and a restart from the same
checkpoint replays the failed batch against the folded index with
exactly-once output — the gates are stateless, so restart IS the
recovery. Operationally: schedule ticks in the ingest quiet window,
or treat a fired tick ('action' == 'compacted' in the decision
record) as the signal to restart the affected gates — OR migrate the
index once with tombstones.enable_generational, after which folds
swap generations catalog-only and a live gate keeps running through
a fired tick (zero downtime; pre-fold semantics until its next
restart; one-generation retention, so restart before the SECOND
fold — pinned by test_live_gate_survives_generational_tick).
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import SparkSession

logger = logging.getLogger(__name__)


def _band_health(spark, table, id_col, thr):
    from . import dedup

    return dedup.band_index_health(spark, table, id_col, compact_threshold=thr)


def _band_compact(spark, table, id_col):
    from . import dedup

    dedup.compact_band_index_attributed(spark, table, id_col)


def _media_health(spark, table, id_col, thr):
    from . import multimodal

    return multimodal.media_index_health(
        spark, table, id_col, compact_threshold=thr
    )


def _media_compact(spark, table, id_col):
    from . import multimodal

    multimodal.compact_media_index_attributed(spark, table, id_col)


def _ivf_health(spark, table, id_col, thr):
    from . import similarity

    return similarity.ivf_index_health(
        spark, table, id_col, compact_threshold=thr
    )


def _ivf_compact(spark, table, id_col):
    from . import similarity

    similarity.compact_ivf_index(spark, table, id_col)


# modality -> (health_fn, compact_fn, default id column). Routed
# through the modality entry points — not tombstones.health directly —
# so their guards (attribution required for band/media retractability)
# apply to the daemon path exactly as they do to a hand-run census.
MODALITIES: dict[str, tuple[Any, Any, str]] = {
    "band": (_band_health, _band_compact, "doc_id"),
    "media": (_media_health, _media_compact, "doc_id"),
    "ivf": (_ivf_health, _ivf_compact, "vec_id"),
}


def maintain_index(
    spark: SparkSession,
    table_name: str,
    modality: str = "band",
    id_col: str | None = None,
    compact_threshold: float = 0.2,
    max_files_per_bucket: int | None = 8,
    dry_run: bool = False,
) -> dict:
    """One maintenance tick: census the index, and if either signal
    fires, run the modality's compaction (unless `dry_run`, which
    reports the decision without acting — the pre-flight an operator
    runs before granting the daemon a fleet). Two independent signals,
    mirroring the two ways a frozen index decays:

      dead rows      tombstones outstanding — the health census's
                     `recommend_compact` (dead_frac >= compact_
                     threshold); every probe repays the anti-join
                     until the fold retires it
      fragmentation  append_bucketed adds up to one file per touched
                     bucket per batch (skew.bucket_file_census);
                     past `max_files_per_bucket` (default 8 — about
                     eight appends since the last fold) listing/open
                     cost says fold now. Pass None to disable (e.g.
                     non-local warehouses, where the file census
                     cannot look). The modality compact folds
                     tombstones AND restores one file per bucket in
                     the same staged rewrite, so one action serves
                     both signals.

    Returns the decision record — every census scalar, the file-census
    fields (files_total / files_max_per_bucket, when measured), plus:
      action   'compacted'      a signal fired and the fold ran
               'would_compact'  a signal fired, dry_run held the fold
               'healthy'        both signals quiet
      reason   'dead_rows' | 'fragmentation' | None — which signal
               fired (dead rows win the label when both do: the fold
               is the same, the operator's follow-up differs)
    and echoes table/modality/thresholds so a fleet sweep's records
    are self-describing. One log line per decision (the daemon's
    audit trail, same role as the reference monitor's allocation log).

    The census is collected BEFORE acting, so the record shows the
    state that justified the decision, not the post-fold state; a
    retraction landing between census and fold is simply picked up by
    the next tick. Idempotent: a fired tick drops the tombstones and
    rewrites to one file per bucket, so the next tick reads both
    signals quiet and reports 'healthy'.

    Crash-safe both ways: a fold that dies mid-rewrite leaves the
    original table untouched (the staged write happens first), and a
    fold that dies between compact_bucketed's DROP and RENAME (the
    half-swap: data intact in `<t>__compact_tmp`, index unservable)
    is detected and completed by the NEXT tick before its census —
    recorded as `recovered_half_swap: True` — so re-running the
    daemon IS the recovery path, no operator intervention."""
    if modality not in MODALITIES:
        raise ValueError(
            f"unknown index modality {modality!r} — one of "
            f"{sorted(MODALITIES)}"
        )
    health_fn, compact_fn, default_id = MODALITIES[modality]
    if id_col is None:
        id_col = default_id
    # Crash recovery is the DAEMON's job, not the operator's: a
    # previous fold that died between compact_bucketed's DROP and
    # RENAME leaves the data intact in `<t>__compact_tmp` and the
    # index unservable. The tick detects the half-swap and completes
    # the rename BEFORE censusing (compact_bucketed's documented
    # recovery branch), records it, and proceeds with the normal
    # tick — so a fleet sweep heals a crashed index instead of
    # recording it as an error forever.
    recovered = False
    from . import skew as _skew

    if spark.catalog.tableExists(
        f"{table_name}__compact_tmp"
    ) and not spark.catalog.tableExists(table_name):
        _skew.compact_bucketed(spark, table_name)  # completes the rename
        recovered = True
        logger.warning(
            "maintain_index %s: completed a crashed compaction's "
            "half-swap (renamed __compact_tmp into place) before the "
            "census",
            table_name,
        )
    # The tombstone side has its own (SILENT-failure) crash window: a
    # rewrite that died between its DROP and RENAME makes the set
    # apparently absent, which would read as dead_rows=0 — healthy
    # forever. Heal it here so the repair lands in THIS record, not
    # only in tombstones' entry-point guards (which would fix it one
    # call later anyway — this is record visibility, not correctness).
    from . import tombstones as _tombstones

    healed_tomb = _tombstones._heal_swap(
        spark, _tombstones.tombstone_table(table_name)
    )
    census = health_fn(spark, table_name, id_col, compact_threshold)
    row = census.collect()[0]  # one row by construction — bounded
    record = {
        "table": table_name,
        "modality": modality,
        "id_col": id_col,
        "compact_threshold": float(compact_threshold),
        "max_files_per_bucket": max_files_per_bucket,
        **row.asDict(),
    }
    if recovered:
        record["recovered_half_swap"] = True
    if healed_tomb:
        record["healed_tombstone_swap"] = True
    fire_frag = False
    if max_files_per_bucket is not None:
        from . import skew

        fc = skew.bucket_file_census(spark, table_name)
        record["files_total"] = fc["n_files"]
        record["files_max_per_bucket"] = fc["max_files_per_bucket"]
        fire_frag = fc["max_files_per_bucket"] >= max_files_per_bucket
    if row["recommend_compact"]:
        record["reason"] = "dead_rows"
    elif fire_frag:
        record["reason"] = "fragmentation"
    else:
        record["reason"] = None
    if record["reason"] is not None:
        if dry_run:
            record["action"] = "would_compact"
        else:
            compact_fn(spark, table_name, id_col)
            record["action"] = "compacted"
    else:
        record["action"] = "healthy"
    logger.info(
        "maintain_index %s (%s): dead_frac=%s dead_rows=%s "
        "retracted_docs=%s files_max_per_bucket=%s -> %s (%s)",
        table_name,
        modality,
        record["dead_frac"],
        record["dead_rows"],
        record["retracted_docs"],
        record.get("files_max_per_bucket"),
        record["action"],
        record["reason"],
    )
    return record


def maintain_indexes(
    spark: SparkSession,
    specs: list[dict],
    dry_run: bool = False,
) -> list[dict]:
    """Fleet sweep: one maintenance tick per spec, in order. Each spec
    is maintain_index kwargs (`table_name` required; `modality`,
    `id_col`, `compact_threshold` optional). A spec that raises (e.g.
    an unattributed media index) is recorded as action='error' with
    the message instead of aborting the sweep — a daemon that dies on
    the first sick index never reaches the healthy ones."""
    records = []
    for spec in specs:
        try:
            records.append(maintain_index(spark, dry_run=dry_run, **spec))
        except Exception as exc:  # noqa: BLE001 — sweep must survive
            logger.warning(
                "maintain_index %s failed: %s", spec.get("table_name"), exc
            )
            records.append(
                {
                    "table": spec.get("table_name"),
                    "modality": spec.get("modality", "band"),
                    "action": "error",
                    "error": str(exc),
                }
            )
    return records

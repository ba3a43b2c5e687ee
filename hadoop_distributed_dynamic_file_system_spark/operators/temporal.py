"""Temporal joins: as-of join and bucketed point-in-interval join.

The reference's join toolbox stops at equality keys (the join
expression language, src/mapred/org/apache/hadoop/mapred/join/
Parser.java, and the reduce-side data_join contrib,
src/contrib/data_join/src/java/org/apache/hadoop/contrib/utils/join/
DataJoinReducerBase.java:122 — both group by an exact key). Time-series
workloads need two inequality shapes on top of that:

- **as-of join**: for each left row, the single most recent right row
  at-or-before (backward) / at-or-after (forward) its timestamp, per
  key. The classic kdb/pandas `merge_asof` semantics; DuckDB spells it
  ``ASOF JOIN`` (the oracle for our tests).
- **interval join**: all (point, interval) pairs with
  start <= point <= end — a pure inequality join that a naive engine
  executes as a cartesian product.

Both are implemented as compositions of exchange + window / equi-join,
never a nested-loop:

Design notes for 100 TB:
- asof_join is ONE shuffle (union both sides, hash-partition by key)
  and a per-key sorted window scan — the same cost as the reduce-side
  tagged join it generalizes. No per-left-row probe, no range
  self-join blowup. Per-key history is processed sequentially in one
  task, which is the right trade until a single key's history exceeds
  a task (then pre-split by coarse time and stitch boundaries).
- interval_join turns the inequality into an equi-join on a coarse
  time bucket: intervals are exploded to the buckets they span
  (replication = ceil(span / bucket_width), bounded and chosen by the
  caller), points map to exactly one bucket, and the true range
  predicate runs as a residual filter on the equi-matches. Shuffle
  keys are fixed-width longs; a point matches an interval in exactly
  one bucket (its own), so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_MATCH_TS = "__asof_match_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    direction: str = "backward",
    tolerance=None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Most-recent-match join (DuckDB ``ASOF JOIN`` / pandas
    ``merge_asof`` semantics): every left row picks AT MOST ONE right
    row — the latest one with ``right_ts <= left_ts`` (backward, the
    default) or the earliest with ``right_ts >= left_ts`` (forward),
    among rows sharing the equality key(s) ``on``.

    Implementation: tag-and-union both sides, hash-partition by key,
    and carry the right side's columns forward with
    ``last(col, ignorenulls=True)`` over a running window ordered by
    timestamp. Equal timestamps order the right row first, so a match
    at exactly ``left_ts`` is visible (inclusive bound, same as
    DuckDB). ``right_tiebreak`` orders equal-timestamp right rows so
    duplicates resolve deterministically (the greatest tiebreak wins);
    without it, make the right side unique per (key, ts) or accept
    engine-dependent picks.

    ``tolerance`` (a Column-compatible literal in the units of the ts
    columns' difference via ``-``) drops matches farther than the
    bound. ``how="left"`` keeps unmatched left rows with nulls;
    ``how="inner"`` drops them.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")

    left_cols = [c for c in left.columns]
    payload = [c for c in left_cols if c not in keys and c != left_ts]
    right_vals = [c for c in right.columns if c not in keys and c != right_ts]
    clash = set(right_vals) & set(left_cols)
    if clash:
        raise ValueError(f"right value columns collide with left: {sorted(clash)}")

    # Tag-and-union: one schema. The right row's payload travels as a
    # SINGLE struct, so a right row whose value column is legitimately
    # NULL still contributes an atomic (non-null) match — filling each
    # column independently with last(ignorenulls) would stitch values
    # from different right rows together.
    rtypes = dict(right.dtypes)
    pack_type = ", ".join(
        [f"`{c}`: {rtypes[c]}" for c in right_vals] + [f"ts: {rtypes[right_ts]}"]
    )
    lu = left.select(
        *[F.col(c) for c in keys],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast("long").alias("__tiebreak"),
        *[F.col(c) for c in payload],
        F.lit(None).cast(f"struct<{pack_type}>").alias("__rpack"),
    )
    tb = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.lit(0).cast("long")
    )
    ru = right.select(
        *[F.col(c) for c in keys],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        tb.alias("__tiebreak"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in payload],
        F.struct(
            *[F.col(c) for c in right_vals], F.col(right_ts).alias("ts")
        ).alias("__rpack"),
    )
    u = lu.unionByName(ru)

    ts_order = F.col(_TS).asc() if direction == "backward" else F.col(_TS).desc()
    # Right rows (side=0) sort before left at equal ts -> inclusive
    # bound; among equal-ts right rows the greatest tiebreak is LAST
    # in window order, so last(ignorenulls) picks it.
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col(_SIDE).asc(), F.col("__tiebreak").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        u.select(
            *[F.col(c) for c in keys],
            F.col(_TS),
            F.col(_SIDE),
            *[F.col(c) for c in payload],
            F.last(F.col("__rpack"), ignorenulls=True).over(w).alias("__rpack"),
        )
        .filter(F.col(_SIDE) == 1)
    )
    match_ts = F.col("__rpack")["ts"]
    if tolerance is not None:
        dist = (
            (F.col(_TS) - match_ts)
            if direction == "backward"
            else (match_ts - F.col(_TS))
        )
        in_tol = match_ts.isNotNull() & (dist <= tolerance)
        out = out.select(
            *[F.col(c) for c in keys],
            F.col(_TS),
            *[F.col(c) for c in payload],
            F.when(in_tol, F.col("__rpack")).alias("__rpack"),
        )
    if how == "inner":
        out = out.filter(match_ts.isNotNull())
    return out.select(
        *[F.col(c) for c in keys],
        F.col(_TS).alias(left_ts),
        *[F.col(c) for c in payload],
        *[F.col("__rpack")[c].alias(c) for c in right_vals],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """All (point, interval) pairs with start <= point <= end, as an
    equi-join on a coarse bucket instead of a nested-loop inequality
    join.

    ``point_col``/``start_col``/``end_col`` must be numeric (cast
    timestamps to epoch units first — keeps the bucketing engine-
    portable). ``bucket_width`` should be near the median interval
    span: replication of each interval row is ceil(span/width)+1, and
    a finer width trades replication for residual-filter selectivity.

    A point falls in exactly one bucket, so every qualifying pair is
    produced exactly once — no dedup stage.
    """
    b = int(bucket_width)
    if b <= 0:
        raise ValueError("bucket_width must be positive")
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b).cast("long"),
                F.floor(F.col(end_col) / b).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__bkt", F.floor(F.col(point_col) / b).cast("long"))
    cond = (
        (pt["__bkt"] == iv["__bkt"])
        & (pt[point_col] >= iv[start_col])
        & (pt[point_col] <= iv[end_col])
    )
    return pt.join(iv, cond).drop("__bkt")


def resample_locf(
    obs: DataFrame,
    key: str,
    ts_col: str,
    start: int,
    end: int,
    step: int,
    grid_col: str = "grid_ts",
) -> DataFrame:
    """Regular-grid resampling with last-observation-carried-forward:
    for every key and every grid instant in [start, end] (numeric ts
    units, step-spaced), attach the most recent observation at-or-
    before the instant (null before the first one).

    Composition, not a new engine primitive: grid = distinct keys ×
    exploded sequence (no shuffle beyond the distinct), then one
    backward as-of join. Grid size is keys × points — choose the step
    so that product stays sane; the as-of join cost is one shuffle of
    grid+obs on the key either way.
    """
    grid = (
        obs.select(key)
        .distinct()
        .withColumn(
            grid_col,
            F.explode(F.sequence(F.lit(start), F.lit(end), F.lit(step))),
        )
    )
    return asof_join(
        grid, obs, on=key, left_ts=grid_col, right_ts=ts_col, how="left"
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Time-weighted average over irregular samples (the hypertable
    rollup classic): per (key, time bucket), each sample's value is
    weighted by how long it HELD — the gap to the next sample in the
    bucket, last sample weighted to the bucket's last observed instant
    (zero weight). A plain avg() over-counts bursts of rapid samples;
    TWA is burst-invariant, which is why metrics stores roll up with
    it.

    One shuffle: window lead() partitioned by (key, bucket) orders each
    group's samples in its task; the grouped aggregate reuses the same
    partitioning. Buckets with a single sample fall back to that
    sample's value (no elapsed time to weight by)."""
    b = F.window(F.col(ts_col), bucket)["start"].alias("bucket_start")
    w = Window.partitionBy(*key_cols, "bucket_start").orderBy(ts_col)
    # timestampdiff, not unix_micros: the latter rejects TIMESTAMP_NTZ
    # (and a cast through LTZ would drag the session timezone in)
    sampled = (
        df.select(*key_cols, ts_col, value_col, b)
        .withColumn("__nxt", F.lead(ts_col).over(w))
        .withColumn(
            "__hold",
            F.coalesce(
                F.expr(
                    f"timestampdiff(MICROSECOND, {ts_col}, __nxt)"
                ).cast("double"),
                F.lit(0.0),
            ),
        )
    )
    return sampled.groupBy(*key_cols, "bucket_start").agg(
        F.round(
            F.when(
                F.sum("__hold") > 0,
                F.sum(F.col(value_col) * F.col("__hold")) / F.sum("__hold"),
            ).otherwise(F.avg(value_col)),
            6,
        ).alias("twa"),
        F.count("*").alias("n_samples"),
    )


def scd2_intervals(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Collapse a change log into SCD type-2 validity intervals — the
    warehouse-standard history shape (one row per (key, state) with
    [valid_from, valid_to) and an is_current flag) built from an
    append-only stream of observed states.

    Semantics:
    - rows are ordered per key by `ts_col`;
    - consecutive rows whose `attr_cols` are ALL unchanged (null-safe
      comparison) collapse into one interval — re-observing the same
      state extends the current interval instead of splitting it;
    - `valid_to` is the next CHANGED row's timestamp, null for the
      open (current) interval; intervals are half-open [from, to).

    Plan: one hash shuffle on the key + two per-key window passes
    (lag to detect change, lead over the surviving change rows to
    close intervals) — the same single-shuffle discipline as
    asof_join; no self-join, no per-row probes. At 100 TB per-key
    history is processed sequentially inside one task (same caveat and
    same pre-split remedy as asof_join for pathological keys).

    Reference parity: this is the relational form of what the
    reference's log-processing examples rebuild imperatively per key
    group in a reducer (the Logalyzer / data_join per-key iteration,
    src/contrib/data_join/.../DataJoinReducerBase.java:122).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col)
    state = F.struct(*[F.col(c) for c in attr_cols])
    # lag(struct(...)) is null exactly on the first row per key (a
    # struct literal is never itself null, so attr nulls can't fake
    # it); eqNullSafe handles nulls INSIDE the state
    prev = F.lag(state).over(w)
    marked = changes.withColumn(
        "__chg", prev.isNull() | ~state.eqNullSafe(prev)
    )
    firsts = marked.filter(F.col("__chg")).drop("__chg")
    w2 = Window.partitionBy(key_col).orderBy(ts_col)
    return firsts.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())

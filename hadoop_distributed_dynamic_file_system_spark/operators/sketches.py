"""Approximate-aggregate sketches with explicit accuracy contracts.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are often the
single most expensive aggregates in a workload (a full shuffle of the
distinct keys / a full sort). Spark ships mergeable one-pass sketches —
HyperLogLog++ (`approx_count_distinct`) and Greenwald-Khanna quantile
summaries (`percentile_approx`) — whose partial states combine
associatively, so they aggregate map-side and shuffle O(sketch) bytes
per group instead of O(rows).

An approximate answer is only usable with a stated bound, so the
operators here return the sketch estimate TOGETHER with a checkable
accuracy predicate; the oracle-checked queries assert the predicate,
which makes "the sketch is within its documented error" itself a
regression-tested property. (The reference has no sketch aggregates —
its aggregate library, src/mapred/org/apache/hadoop/mapred/lib/
aggregate/UniqValueCount.java:67, caps exact distinct-sets at a size
limit instead; this module is the scale-path replacement.)

Determinism notes (what makes these hash-comparable at all):
- HLL++ registers are a commutative max over per-value hashes —
  partitioning- and order-independent, so the estimate is stable for
  fixed data (only the predicate is compared anyway);
- percentile_approx's GK merge is NOT order-canonical across engines,
  so its contract is rank-based: the estimate must land between two
  exact bracketing quantiles, a predicate both engines agree on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    rsd: float = 0.02,
    tolerance: float = 0.10,
) -> DataFrame:
    """Per-group HLL++ distinct estimate next to the exact count, with
    `within_bounds` = |estimate - exact| <= tolerance * exact.
    `tolerance` should be several multiples of `rsd` (the estimator's
    one-sigma relative error). The exact count is computed here for the
    contract check; a production call sites drops it and keeps only
    the sketch — that is the entire point of the operator."""
    return (
        df.groupBy(*group_cols)
        .agg(
            F.countDistinct(value_col).alias("exact_distinct"),
            F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct"),
        )
        .select(
            *group_cols,
            "exact_distinct",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                <= F.lit(tolerance) * F.col("exact_distinct")
            ).alias("within_bounds"),
        )
    )


def quantile_sketch_bracketed(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    prob: float = 0.5,
    bracket: float = 0.05,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group approximate quantile with a rank-based contract: the
    estimate must lie within the exact [prob-bracket, prob+bracket]
    quantile values (inclusive). The GK summary guarantees rank error
    <= n/accuracy, so any bracket wider than that always holds."""
    lo, hi = max(prob - bracket, 0.0), min(prob + bracket, 1.0)
    return (
        df.groupBy(*group_cols)
        .agg(
            F.percentile_approx(value_col, prob, accuracy).alias("approx_q"),
            F.expr(f"percentile({value_col}, {lo})").alias("q_lo"),
            F.expr(f"percentile({value_col}, {hi})").alias("q_hi"),
        )
        .select(
            *group_cols,
            (
                (F.col("approx_q") >= F.col("q_lo"))
                & (F.col("approx_q") <= F.col("q_hi"))
            ).alias("in_bracket"),
        )
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch as a (row, bucket, cnt) relation: depth
    independent md5-salted hash rows, each folding every key into one
    of `width` buckets. The sketch aggregates map-side (a plain
    groupBy), carries depth·width counters per group regardless of
    cardinality, and two sketches MERGE by summing matching cells —
    the property that lets 1000 executors each sketch their shard and
    a reducer add the grids (same contract as the HLL registers above).

    The hash is md5-hex arithmetic (first 8 hex digits mod width) —
    engine-portable, so the DuckDB oracle reproduces the exact grid,
    making a sketch IMPLEMENTATION bug (not just its estimates)
    hash-detectable. Spark's built-in count_min_sketch() function
    returns an opaque binary for one engine only; this relation form
    trades compactness for checkability and mergeability in SQL.

    NULL keys are dropped, not counted: Spark's concat_ws skips a NULL
    argument (hashing just the row salt) while SQL's `||` nulls the
    whole expression, so the two engines would bucket NULLs
    differently. A null key has no meaningful frequency anyway —
    filtering is the only portable semantics."""
    rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r")
    keyed = (
        df.select(F.col(key_col).cast("string").alias("__k"))
        .filter(F.col("__k").isNotNull())
        .select("__k", rows)
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("r"), F.col("__k"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % width
    )
    return (
        keyed.select("r", bucket.alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, width: int = 256
) -> DataFrame:
    """Point estimates from a count-min grid: for each probe key,
    min over rows of the key's bucket counter — an upper bound on the
    true count (collisions only inflate). Join traffic is
    |keys|·depth rows against the fixed-size grid. NULL probe keys are
    dropped, mirroring count_min_sketch's null handling."""
    k = (
        keys.select(F.col(key_col).cast("string").alias("__k"))
        .filter(F.col("__k").isNotNull())
        .distinct()
    )
    probes = k.crossJoin(
        sketch.select("r").distinct()
    ).select(
        "__k",
        "r",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col("r"), F.col("__k"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % width
        ).alias("bucket"),
    )
    return (
        probes.join(sketch, ["r", "bucket"], "left")
        .groupBy("__k")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
        .select(F.col("__k").alias(key_col), "est")
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Approximate heavy hitters: keys whose count-min estimate clears
    `threshold`. No false negatives (the estimate upper-bounds the true
    count); false positives only from bucket collisions, shrinking with
    width. At scale the sketch is built in one map-side pass and only
    the DISTINCT key set — not the raw rows — is re-scored against the
    fixed-size grid."""
    sketch = count_min_sketch(df, key_col, depth=depth, width=width)
    keys = df.select(key_col).distinct()
    est = cm_estimate(sketch, keys, key_col, width=width)
    return est.filter(F.col("est") >= threshold)

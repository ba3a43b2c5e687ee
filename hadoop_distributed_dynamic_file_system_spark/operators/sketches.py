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


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values sketch per group: the k smallest xxhash64
    values of the group's DISTINCT keys (Bar-Yossef et al. '02 /
    Beyer et al. SIGMOD'07 — the theta-sketch family's simplest
    member). DETERMINISTIC for fixed data (unlike HLL's estimate it
    IS a set of concrete hashes), order- and partitioning-independent,
    and mergeable: union two sketches = k smallest of the union — so
    per-partition/per-day sketches roll up without touching raw data.

    Plan: distinct (the one data-sized shuffle) → per-group window
    rank → keep rk ≤ k. Output: (group, h, rk). At 100 TB each group's
    state is k longs — the cross-source overlap matrix below moves
    |groups|·k·8 bytes, not documents.

    Hash = integer value of the first 15 md5 hex digits (60 uniform
    bits) — the engine-portable hash family every sampling operator
    here shares (DuckDB has no xxhash64, so md5-prefix is what keeps
    the sketch itself oracle-replayable; swap in xxhash64 for pure
    speed when cross-engine checkability isn't needed)."""
    from pyspark.sql import Window

    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    hashed = (
        # NULL keys are not set members: md5(NULL) is NULL, and NULLs
        # sort first under the ascending rank — an unfiltered NULL
        # would burn sketch slot 1 on a NULL hash that max(h) ignores
        # but n_sketch counts, skewing the estimate (ADVICE r6).
        df.filter(F.col(key_col).isNotNull())
        .select(F.col(group_col).alias("g"), F.col(key_col))
        .distinct()
        .select("g", h.alias("h"))
        .distinct()  # two keys may hash equal; KMV is over hash VALUES
    )
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    return (
        hashed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(F.col("g").alias(group_col), "h", "rk")
    )


def kmv_pairwise_overlap(
    sketch: DataFrame,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Estimated Jaccard overlap between every pair of groups from
    their KMV sketches — the cross-source duplication matrix a mixing
    plan consults BEFORE paying a full inter-source dedup pass.

    Estimator (Beyer et al.): for groups A, B let U = the k smallest
    hashes of sketch(A) ∪ sketch(B); Ĵ = |U ∩ A ∩ B| / |U|. Exact when
    a group has < k distinct keys (the sketch IS the set), unbiased
    with sd ≈ J(1-J)/√k otherwise, and deterministic for fixed data —
    which is what makes it oracle-checkable.

    Plan: groups × groups (a |groups|²-row relation — tiny) driving
    equi-joins against the k-row-per-group sketch; every relation in
    sight is broadcast-sized."""
    from pyspark.sql import Window

    s = sketch.select(F.col(group_col).alias("g"), "h")
    ga = s.select(F.col("g").alias("ga")).distinct()
    gb = s.select(F.col("g").alias("gb")).distinct()
    pairs = ga.join(gb, F.col("ga") < F.col("gb"))
    u = (
        pairs.join(s.select(F.col("g").alias("ga"), "h"), "ga")
        .select("ga", "gb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            pairs.join(s.select(F.col("g").alias("gb"), "h"), "gb")
            .select("ga", "gb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ga", "gb").orderBy(F.asc("h"))
    uk = u.withColumn("urk", F.row_number().over(w)).filter(F.col("urk") <= k)
    return uk.groupBy("ga", "gb").agg(
        F.count("*").cast("long").alias("union_k"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("both_k"),
        F.round(
            F.sum(F.col("in_a") * F.col("in_b")) / F.count("*"), 6
        ).alias("est_jaccard"),
    )


KMV_DOMAIN = 16 ** 15  # md5-prefix hash space: 15 hex digits = 2^60


def kmv_merge(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Union-merge per-group KMV sketches into ONE global sketch: the
    k smallest distinct hashes across all groups — the mergeability
    that makes KMV an incremental-maintenance sketch (per-day /
    per-shard sketches roll up without revisiting raw data; at 100 TB
    the merge input is |groups|·k longs). TakeOrdered(k), never a
    global sort."""
    return sketch.select("h").distinct().orderBy(F.asc("h")).limit(k)


def kmv_distinct_estimate(
    merged: DataFrame, k: int, domain: int = KMV_DOMAIN
) -> DataFrame:
    """Distinct-count estimate from a merged KMV sketch (Bar-Yossef
    et al.): with fewer than k hashes the sketch IS the distinct set
    (exact count); at capacity, n̂ = (k-1)·D/h_(k) where h_(k) is the
    k-th minimum of a hash space of size D. Deterministic for fixed
    data — one multiply + one divide in doubles, identical in any
    IEEE engine — so the estimate itself is oracle-checkable, and its
    documented error (sd ≈ n/√(k-2)) is assertable as a predicate."""
    agg = merged.agg(
        F.count("*").cast("long").alias("n_sketch"),
        F.max("h").alias("_hk"),
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(float(domain)) / F.col("_hk"), 3)
    )
    return agg.select("n_sketch", est.alias("est_distinct"))


# ------------------------------------------------- mergeable histogram
def histogram_shards(
    df: DataFrame,
    group_col: str,
    shard_col: str,
    value_col: str,
    bucket_width: int = 16,
) -> DataFrame:
    """Per-(group, shard) equi-width histogram — the mergeable
    quantile accumulator each ingestion shard keeps alongside its
    moment shards (see textanalysis.moment_shards): bucket =
    floor(value / width), one count per occupied bucket. Counts are
    additive, so shards merge by pure summation in any order/shape —
    unlike GK/t-digest summaries, the merged state is EXACTLY the
    histogram of the union, and the only approximation is the fixed
    bucketing itself (error <= one bucket width, stated up front).

    The width TRAVELS WITH the shards as a column (review-r6 finding:
    a reader re-supplying a different width would silently rescale
    every quantile estimate 4x with no error); histogram_quantiles
    reads it from the data instead of trusting a second parameter.
    The bucketing expression is the shared _bucket_expr.

    Output: (group, shard, bucket, c, bucket_width)."""
    return df.groupBy(
        group_col, shard_col, _bucket_expr(value_col, bucket_width)
    ).agg(F.count("*").cast("long").alias("c")).withColumn(
        "bucket_width", F.lit(bucket_width).cast("long")
    )


def _bucket_expr(value_col: str, bucket_width: int):
    """THE equi-width bucket expression every histogram producer
    shares (histogram_shards, value_histogram) — same
    shared-expression rule as classifier.word_bucket."""
    return (
        F.floor(F.col(value_col).cast("double") / F.lit(bucket_width))
        .cast("long")
        .alias("bucket")
    )


def histogram_quantiles(
    shards: DataFrame,
    group_col: str,
    quantiles: tuple[int, ...] = (50, 90, 99),
) -> DataFrame:
    """Merge histogram shards (summation on (group, bucket)) and read
    off upper-bound quantile estimates: q-th percentile = the upper
    edge of the first bucket whose cumulative count reaches q% of n
    (integer cross-multiplication — no float rank arithmetic to
    disagree across engines). Estimate error is bounded by one bucket
    width, deterministically — the width is read from the shards' own
    bucket_width column, never re-supplied.

    The post-merge relation is model-sized (groups x occupied
    buckets), so the cumulative window scans a bounded relation — the
    data-sized pass is only the additive groupBy.

    Width consistency is ASSERTED, not assumed: shards accidentally
    built with different bucket_widths describe incompatible grids,
    and silently merging them under max(width) would rescale every
    estimate (ADVICE r6 — the exact failure the width-travels-with-
    shards design exists to prevent). A group whose shards disagree
    on width gets NULL quantile columns (n stays real — the counts
    merge fine; only the value axis is meaningless).

    Output: (group, n, p<q>_est ...)."""
    from pyspark.sql import Window

    merged = shards.groupBy(group_col, "bucket").agg(
        F.sum("c").cast("long").alias("c"),
        F.max("bucket_width").alias("_bw"),
        F.countDistinct("bucket_width").alias("_nbw"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = merged.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy(group_col))
    )
    # width disagreement within a bucket (_nbw > 1) or across buckets
    # (distinct _bw values > 1) → the group's grid is inconsistent
    bad_width = (F.max("_nbw") > 1) | (F.countDistinct("_bw") > 1)
    aggs = [F.max("n").cast("long").alias("n")]
    for q in quantiles:
        est = (
            (
                F.min(
                    F.when(
                        F.col("cum") * 100 >= F.lit(q) * F.col("n"),
                        F.col("bucket"),
                    )
                )
                + 1
            )
            * F.max("_bw")
        ).cast("long")
        aggs.append(
            F.when(bad_width, F.lit(None).cast("long"))
            .otherwise(est)
            .alias(f"p{q}_est")
        )
    return cum.groupBy(group_col).agg(*aggs)


def psi_drift(
    old_df: DataFrame,
    new_df: DataFrame,
    group_col: str,
    value_col: str,
    bucket_width: int = 16,
) -> DataFrame:
    """Population Stability Index between two snapshots of a value
    distribution, per group — the standard drift gate an ingestion
    pipeline runs on a recrawl BEFORE retraining on it: bucket both
    sides with the same equi-width rule (the mergeable histogram's
    bucketing), then PSI = Σ_b (p_new - p_old)·ln(p_new / p_old) over
    buckets populated on BOTH sides, with the excluded one-sided
    probability mass reported alongside (the honest alternative to
    epsilon-smoothing, which would make the score depend on an
    arbitrary constant). Rule of thumb: <0.1 stable, >0.25 shifted.

    Everything after the two data-sized histogram groupBys runs on
    the bounded (group, bucket) relation. Output: (group, n_old,
    n_new, n_common_buckets, psi, mass_old_only, mass_new_only) —
    floats rounded 6dp."""
    ho = value_histogram(
        old_df, group_col, value_col, bucket_width
    ).withColumnRenamed("c", "c_old")
    hn = value_histogram(
        new_df, group_col, value_col, bucket_width
    ).withColumnRenamed("c", "c_new")
    return psi_from_histograms(ho, hn, group_col)


def value_histogram(
    df: DataFrame, group_col: str, value_col: str, bucket_width: int = 16
) -> DataFrame:
    """The shared equi-width bucketing both PSI sides (and the
    streaming drift monitor) must use: (group, bucket, c). Scoring a
    live histogram against a baseline built with a different width
    silently measures the wrong thing — same shared-expression rule
    as classifier.word_bucket."""
    return df.groupBy(
        group_col, _bucket_expr(value_col, bucket_width)
    ).agg(F.count("*").cast("long").alias("c"))


def psi_from_histograms(
    ho: DataFrame, hn: DataFrame, group_col: str
) -> DataFrame:
    """PSI scoring on two pre-built histograms (columns (group,
    bucket, c_old) / (group, bucket, c_new)) — the bounded-relation
    half of psi_drift, shared by the batch gate and the streaming
    monitor (streaming.events.streaming_value_histogram feeds its
    complete-mode output here each cadence)."""
    j = ho.join(hn, [group_col, "bucket"], "full_outer").fillna(
        0, subset=["c_old", "c_new"]
    )
    w = j.groupBy(group_col).agg(
        F.sum("c_old").cast("long").alias("n_old"),
        F.sum("c_new").cast("long").alias("n_new"),
    )
    j = j.join(w, group_col)
    # try_divide: a group present in only one histogram has n=0 on the
    # other side; its share must read NULL->excluded, not raise an
    # ANSI DIVIDE_BY_ZERO that kills the drift gate exactly when the
    # change is largest (review-r6 finding). The 0-count rows of such
    # a group only feed the one-sided-mass branches, and codegen CSE
    # may evaluate a shared division eagerly outside its CaseWhen.
    po = F.try_divide(F.col("c_old").cast("double"), F.col("n_old"))
    pn = F.try_divide(F.col("c_new").cast("double"), F.col("n_new"))
    both = (F.col("c_old") > 0) & (F.col("c_new") > 0)
    term = F.when(both, (pn - po) * F.log(pn / po)).otherwise(F.lit(0.0))
    return j.groupBy(group_col).agg(
        F.max("n_old").alias("n_old"),
        F.max("n_new").alias("n_new"),
        F.sum(both.cast("int")).cast("long").alias("n_common_buckets"),
        F.round(F.sum(term), 6).alias("psi"),
        F.round(
            F.sum(F.when(F.col("c_new") == 0, po).otherwise(0.0)), 6
        ).alias("mass_old_only"),
        F.round(
            F.sum(F.when(F.col("c_old") == 0, pn).otherwise(0.0)), 6
        ).alias("mass_new_only"),
    )

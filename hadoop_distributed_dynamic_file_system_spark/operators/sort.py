"""Sort family: total-order sort, secondary sort, Unix-sort key specs.

Reference surfaces:
- TotalOrderPartitioner + InputSampler (src/mapred/org/apache/hadoop/
  mapred/lib/TotalOrderPartitioner.java:85,135-162; InputSampler.java:101+)
  → Spark's RangePartitioner inside `orderBy` samples automatically;
  `repartition_by_range` exposes the partition-only form.
- Secondary sort (examples/SecondarySort.java:57,140-152,230-231;
  JobConf.setOutputValueGroupingComparator JobConf.java:676) → window
  functions or repartition+sortWithinPartitions.
- KeyFieldBasedComparator / KeyFieldHelper (src/mapred/org/apache/
  hadoop/mapred/lib/KeyFieldBasedComparator.java:35,57-94) — Unix
  `sort -k` style specs: ``-k f1[.c1][opts][,f2[.c2][opts]]`` with
  ``n`` (numeric) and ``r`` (reverse) options; fields are 1-indexed.

Scale notes: `orderBy` is a range-shuffle + per-partition sort — the
same sampled-split-points strategy as TotalOrderPartitioner but
automatic; survives 100 TB as long as key distribution isn't
pathological (AQE handles moderate skew).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..cache import tracked_persist


# ---------------------------------------------------------------- total order
def total_order_sort(df: DataFrame, *cols: Column | str, ascending: bool = True) -> DataFrame:
    """Globally ordered output (TotalOrderPartitioner analog).

    Spark samples the key distribution and range-partitions before the
    per-partition sort — exactly the InputSampler + trie-partitioner
    design, built in.

    String-key order parity: the reference's Text.Comparator is memcmp
    over UTF-8 bytes (io/Text.java). Spark's default UTF8_BINARY
    collation is the SAME order — UTF8String compares stored UTF-8
    bytes, not UTF-16 code units — including on supplementary-plane
    characters (pinned by test_byte_order_sort_matches_utf8_memcmp).
    Only a non-default session collation would diverge.
    """
    if ascending:
        return df.orderBy(*cols)
    return df.orderBy(*[F.desc(c) if isinstance(c, str) else c.desc() for c in cols])


def repartition_by_range(df: DataFrame, num_partitions: int, *cols: str) -> DataFrame:
    """Partition-only form: ranged placement without intra-partition sort."""
    return df.repartitionByRange(num_partitions, *cols)


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Total-order rank WITHOUT a global window (the scale-safe form of
    ``row_number() OVER (ORDER BY ...)``, which funnels every row
    through one task).

    TotalOrderPartitioner semantics in the artifact itself (ref
    src/mapred/org/apache/hadoop/mapred/lib/TotalOrderPartitioner.java:
    85,135-162 — sampled split points, ranged partitions, in-partition
    sort, partition index = rank prefix):

    1. ``repartitionByRange`` on the sort key — Spark samples bounds
       (the InputSampler analog) and range-shuffles once.
    2. ``sortWithinPartitions`` — per-partition sort, no merge needed.
    3. Per-partition row index from ``monotonically_increasing_id``'s
       low 33 bits (assigned in emission order AFTER the sort; the
       expression is nondeterministic so Catalyst will not reorder it
       across the Sort).
    4. A count-per-partition job (driver gets num_partitions longs =
       metadata) → cumulative offsets → broadcast join.

    One range shuffle over the data total; rank = offset + index + 1.
    ``order_cols`` must be a total order (include a tie-break key) or
    ranks at partition boundaries are nondeterministic.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    out_cols = list(df.columns)
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.spark_partition_id())
    )
    ranged = tracked_persist(ranged)  # freeze the layout: count job + output job must agree
    sizes = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(sizes):
        offsets.append((pid, acc))
        acc += sizes[pid]
    off = F.broadcast(spark.createDataFrame(offsets, "_pid INT, _off BIGINT"))
    idx_in_part = F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
    return (
        ranged.join(off, "_pid")
        .withColumn(rank_col, (F.col("_off") + idx_in_part + 1).cast("int"))
        .select(*out_cols, rank_col)
    )


def byte_order_key(col: Column | str) -> Column:
    """Explicit UTF-8 byte sort key (BinaryType = unsigned memcmp) for
    a string column — guarantees the reference's Text.Comparator order
    (io/Text.java) regardless of session collation settings. With the
    default UTF8_BINARY collation this is redundant: Spark already
    compares stored UTF-8 bytes."""
    c = F.col(col) if isinstance(col, str) else col
    return F.encode(c, "utf-8")


# ------------------------------------------------------------- secondary sort
def secondary_sort(
    df: DataFrame, group_cols: list[str], order_cols: list[str], rank_col: str = "rn"
) -> DataFrame:
    """Partition by natural key, order by the value part, expose rank.

    The window formulation keeps grouping and ordering declarative; for
    pure emission order without a rank column use
    `df.repartition(*group_cols).sortWithinPartitions(*group_cols, *order_cols)`
    which is one shuffle and no window state.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w))


def secondary_sort_emit(df: DataFrame, group_cols: list[str], order_cols: list[str]) -> DataFrame:
    """The reference's emission shape: grouped, value-sorted stream."""
    return df.repartition(*[F.col(c) for c in group_cols]).sortWithinPartitions(
        *group_cols, *order_cols
    )


# --------------------------------------------------------- key-field sort spec
@dataclass(frozen=True)
class KeySpec:
    field1: int  # 1-indexed
    char1: int  # 1-indexed char offset within field1
    field2: int | None  # inclusive end field; None = to end of line
    numeric: bool
    reverse: bool


_KEYSPEC_RE = re.compile(
    r"^(?P<f1>\d+)(?:\.(?P<c1>\d+))?(?P<o1>[nr]*)"
    r"(?:,(?P<f2>\d+)(?:\.(?P<c2>\d+))?(?P<o2>[nr]*))?$"
)


def parse_key_spec(spec: str) -> list[KeySpec]:
    """Parse ``-k2,2n -k3r`` (or without ``-k``) into KeySpecs."""
    out: list[KeySpec] = []
    for token in spec.replace("-k", " ").split():
        m = _KEYSPEC_RE.match(token)
        if not m:
            raise ValueError(f"bad key spec {token!r}")
        opts = (m.group("o1") or "") + (m.group("o2") or "")
        out.append(
            KeySpec(
                field1=int(m.group("f1")),
                char1=int(m.group("c1") or 1),
                field2=int(m.group("f2")) if m.group("f2") else None,
                numeric="n" in opts,
                reverse="r" in opts,
            )
        )
    return out


def key_spec_sort_columns(line_col: str, spec: str, sep: str = " ") -> list[Column]:
    """Compile a `sort -k` spec into orderBy expressions over a line column."""
    fields = F.split(F.col(line_col), re.escape(sep), -1)
    cols: list[Column] = []
    for ks in parse_key_spec(spec):
        if ks.field2 is None:
            length = F.greatest(F.size(fields) - F.lit(ks.field1 - 1), F.lit(0))
            part = F.array_join(F.slice(fields, ks.field1, length), sep)
        else:
            part = F.array_join(
                F.slice(fields, ks.field1, ks.field2 - ks.field1 + 1), sep
            )
        if ks.char1 > 1:
            part = F.substring(part, ks.char1, 2**30)
        expr: Column = part
        if ks.numeric:
            # Unix sort -n: leading numeric prefix, non-numeric → 0
            expr = F.regexp_extract(part, r"^\s*(-?\d+\.?\d*)", 1).try_cast("double")
            expr = F.coalesce(expr, F.lit(0.0))
        cols.append(expr.desc() if ks.reverse else expr.asc())
    return cols


def sort_by_key_spec(df: DataFrame, line_col: str, spec: str, sep: str = " ") -> DataFrame:
    """KeyFieldBasedComparator analog: total sort of lines by `-k` spec."""
    return df.orderBy(*key_spec_sort_columns(line_col, spec, sep))


def key_field_partition(df: DataFrame, line_col: str, num_partitions: int,
                        field1: int, field2: int | None = None, sep: str = " ") -> DataFrame:
    """KeyFieldBasedPartitioner analog (KeyFieldBasedPartitioner.java:33):
    hash-partition on a subset of key fields."""
    fields = F.split(F.col(line_col), re.escape(sep), -1)
    end = field2 if field2 is not None else field1
    part = F.array_join(F.slice(fields, field1, end - field1 + 1), sep)
    return df.repartition(num_partitions, part)


def sample_partition_bounds(
    df: DataFrame, col: str, num_partitions: int, rel_error: float = 0.01
) -> list:
    """InputSampler analog (mapred/lib/InputSampler.java:314 +
    TotalOrderPartitioner's _partition.lst): the n-1 split points that
    would balance `num_partitions` ranges, from an approximate-quantile
    sketch (one pass, driver gets only the bounds). Spark's orderBy
    already does this internally; exposed for explicit layout control
    (repartitionByRange + persist-by-range, pre-splitting sinks)."""
    if num_partitions < 2:
        return []
    qs = [i / num_partitions for i in range(1, num_partitions)]
    return df.approxQuantile(col, qs, rel_error)


# ------------------------------------------------------------------ top-k
def top_k(df: DataFrame, k: int, *order: Column) -> DataFrame:
    """Global top-k without a total sort: Catalyst plans orderBy+limit as
    TakeOrderedAndProject (per-partition heap + driver merge) — O(k)
    memory per partition, no full shuffle. Safe at 100 TB."""
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame, group_cols: list[str], k: int, order: list[Column], rank_col: str = "rk"
) -> DataFrame:
    """Top-k per group via ranked window; one shuffle on the group key."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )

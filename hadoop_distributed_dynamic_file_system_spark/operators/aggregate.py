"""Aggregation family: the ValueAggregator descriptor DSL + ValueHistogram.

Reference surface (all re-expressed as Catalyst aggregates — partial/map-side
combine is automatic, the analog of the reference's Combiner):

- 8-function aggregator registry + "function:id" descriptor strings
  (reference: src/mapred/org/apache/hadoop/mapred/lib/aggregate/
  ValueAggregatorBaseDescriptor.java:33-47,85-110; job assembly
  ValueAggregatorJob.java:81-110)
- LongValueSum / DoubleValueSum (LongValueSum.java, DoubleValueSum.java)
- LongValueMax / LongValueMin / StringValueMax / StringValueMin
- UniqValueCount with optional maxNumItems bound
  (UniqValueCount.java:30-67 — the count saturates at the bound)
- ValueHistogram: report over per-item counts = numItems, min, median,
  max, mean, stddev (ValueHistogram.java:76-134,168). Median here is the
  exact continuous percentile (deviation: the reference picks the middle
  array element; interpolated median is used so the DuckDB oracle and
  Spark agree bit-for-bit on even-sized groups).

Descriptor syntax accepted here: ``Function:alias:column_expr``, e.g.
``LongValueSum:sum_qty:l_quantity``. A bare ``Function:alias`` aggregates
the column named ``alias``. UniqValueCount takes an optional bound:
``UniqValueCount~100:alias:col``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AGGREGATOR_FUNCTIONS = (
    "LongValueSum",
    "LongValueMax",
    "LongValueMin",
    "StringValueMax",
    "StringValueMin",
    "DoubleValueSum",
    "UniqValueCount",
    "ValueHistogram",
)


@dataclass(frozen=True)
class Descriptor:
    func: str
    alias: str
    expr: str
    bound: int | None = None  # UniqValueCount maxNumItems


def parse_descriptor(spec: str) -> Descriptor:
    """Parse ``Function[~bound]:alias[:column_expr]``."""
    parts = spec.split(":", 2)
    if len(parts) < 2:
        raise ValueError(f"descriptor needs at least Function:alias — got {spec!r}")
    func_part, alias = parts[0], parts[1]
    expr = parts[2] if len(parts) == 3 else alias
    bound = None
    if "~" in func_part:
        func_part, bound_s = func_part.split("~", 1)
        bound = int(bound_s)
    if func_part not in AGGREGATOR_FUNCTIONS:
        raise ValueError(
            f"unknown aggregator {func_part!r}; expected one of {AGGREGATOR_FUNCTIONS}"
        )
    return Descriptor(func=func_part, alias=alias, expr=expr, bound=bound)


def build_agg_columns(descriptors: list[str | Descriptor]) -> list[Column]:
    """Compile descriptor strings into aliased aggregate Columns."""
    cols: list[Column] = []
    for d in descriptors:
        if isinstance(d, str):
            d = parse_descriptor(d)
        v = F.expr(d.expr)
        if d.func == "LongValueSum":
            cols.append(F.sum(v.cast("long")).alias(d.alias))
        elif d.func == "DoubleValueSum":
            cols.append(F.sum(v.cast("double")).alias(d.alias))
        elif d.func == "LongValueMax":
            cols.append(F.max(v.cast("long")).alias(d.alias))
        elif d.func == "LongValueMin":
            cols.append(F.min(v.cast("long")).alias(d.alias))
        elif d.func == "StringValueMax":
            cols.append(F.max(v.cast("string")).alias(d.alias))
        elif d.func == "StringValueMin":
            cols.append(F.min(v.cast("string")).alias(d.alias))
        elif d.func == "UniqValueCount":
            c = F.count_distinct(v)
            if d.bound is not None:
                c = F.least(c, F.lit(d.bound))
            cols.append(c.alias(d.alias))
        elif d.func == "ValueHistogram":
            raise ValueError(
                "ValueHistogram needs a second grouping level — use histogram_report()"
            )
        else:  # pragma: no cover
            raise AssertionError(d.func)
    return cols


def aggregate(df: DataFrame, group_cols: list[str], descriptors: list[str]) -> DataFrame:
    """The ValueAggregatorJob analog: one groupBy with a descriptor list.

    Catalyst plans this as partial aggregation (map-side combine) +
    final aggregation after a single shuffle on `group_cols` — identical
    shuffle structure to the reference's combiner+reducer, but columnar
    and codegen'd. Scales with key cardinality, not row count.
    """
    return df.groupBy(*group_cols).agg(*build_agg_columns(descriptors))


def histogram_report(
    df: DataFrame, group_cols: list[str], value_col: str, prefix: str = "hist"
) -> DataFrame:
    """ValueHistogram (ValueHistogram.java:76-134): per group, build the
    histogram of `value_col` items, then report stats over the item
    counts.

    Two-level aggregation = two shuffles, but the first shrinks data to
    (group, item) cardinality and both benefit from partial aggregation;
    at 100 TB this is the only exact formulation that doesn't collect a
    per-group map into one task.
    """
    counts = df.groupBy(*group_cols, F.col(value_col).alias("__item")).agg(
        F.count("*").alias("__n")
    )
    return counts.groupBy(*group_cols).agg(
        F.count("*").alias(f"{prefix}_num_items"),
        F.min("__n").alias(f"{prefix}_min"),
        F.expr("percentile(__n, 0.5)").alias(f"{prefix}_median"),
        F.max("__n").alias(f"{prefix}_max"),
        F.avg("__n").alias(f"{prefix}_mean"),
        F.stddev_pop("__n").alias(f"{prefix}_stddev"),
    )


def histogram_detail(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """The detailed (item, count) list of ValueHistogram.java:168."""
    return df.groupBy(*group_cols, F.col(value_col).alias("item")).agg(
        F.count("*").alias("item_count")
    )

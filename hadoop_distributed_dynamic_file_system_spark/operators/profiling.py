"""Single-pass column profiling: the ANALYZE TABLE / data-quality
sweep a pipeline runs before trusting a new drop of data.

The reference's nearest analog is per-job Counters
(src/mapred/org/apache/hadoop/mapred/Counters.java) — scalar tallies
accumulated while another job runs. This generalizes that idea to a
first-class operator: per-column null counts, distinct counts, and
min/max, computed in ONE scan.

Scale notes: all metrics for all columns fold into a single aggregate
row (Catalyst plans one partial+final agg; the multiple DISTINCT
aggregates share one Expand), then one `stack()` pivots the row into
per-column records — no per-column scans, which is what the naive
UNION-ALL spelling (the DuckDB oracle) does N times. For very wide
tables swap count_distinct for approx_count_distinct — the shape is
unchanged and the sketch makes the Expand unnecessary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile `cols` (default: all) into one row per column:
    (column_name, null_cnt, n_distinct, min_val, max_val) with min/max
    rendered as strings so the output schema is column-type-agnostic.
    """
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mx_{c}"))
    row = df.agg(*aggs)
    parts = []
    for c in cols:
        parts.append(
            f"'{c}', __rows - __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}"
        )
    stacked = row.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) AS "
            "(column_name, null_cnt, n_distinct, min_val, max_val)"
        )
    )
    return stacked

"""Storage-layout clustering: Z-order (Morton) interleaving for
multi-dimensional data skipping.

The reference's layout tools are one-dimensional: MapFile keeps one
sorted key (src/core/org/apache/hadoop/io/MapFile.java:40) and
TotalOrderPartitioner range-partitions one key
(src/mapred/org/apache/hadoop/mapred/lib/TotalOrderPartitioner.java:85).
Sorting by ONE column gives min/max pruning on that column and nothing
on any other; interleaving the bits of several columns into one Morton
code and range-clustering on THAT bounds every participating column
within each file — so predicates on ANY of the dimensions skip files
/ row groups via ordinary parquet min/max stats.

Scale notes:
- the z-value is pure integer arithmetic (shift/mask/sum) inside
  whole-stage codegen — no UDF, no extra pass;
- clustering is one repartitionByRange + sortWithinPartitions on the
  code (a single range shuffle, same cost as a total-order sort on one
  column, but it buys pruning on N columns);
- pruning uses the stats parquet already writes; nothing custom at
  read time — Spark's scan does the skipping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bits: int = 8) -> Column:
    """Morton code: interleave the low `bits` bits of each column
    (column i contributes bit b to output position b*len(cols)+i).
    Callers bucket-normalize each dimension into [0, 2^bits) first —
    the code is only as balanced as its inputs."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_value needs at least one column")
    terms = []
    for i, c in enumerate(cols):
        c = c.cast("long")
        for b in range(bits):
            terms.append(
                (F.shiftright(c, b).bitwiseAND(F.lit(1)))
                * F.lit(1 << (b * n + i))
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_sql(col_exprs: list[str], bits: int = 8) -> str:
    """The identical Morton code as engine-portable SQL text (DuckDB
    oracle twin of `zorder_value`)."""
    n = len(col_exprs)
    terms = []
    for i, ce in enumerate(col_exprs):
        for b in range(bits):
            terms.append(f"((({ce}) >> {b}) & 1) * {1 << (b * n + i)}")
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame,
    cols: list[Column],
    path: str,
    num_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet clustered by the Morton code of `cols`:
    range-partition into `num_files` z-ranges, sort within each, keep
    the code as a stats column (`zval`) so range predicates on it also
    prune directly."""
    with_z = df.withColumn("zval", zorder_value(cols, bits=bits))
    (
        with_z.repartitionByRange(num_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode(mode)
        .parquet(path)
    )

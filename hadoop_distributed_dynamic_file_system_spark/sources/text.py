"""Text-family sources (SURVEY §2.1).

Reference → Spark mapping:
- TextInputFormat + LineRecordReader (mapred/TextInputFormat.java):
  `spark.read.text`; byte-offset keys available on request (synthetic —
  Spark doesn't surface byte offsets; a stable per-line id serves the
  same join/debug purpose the offset served).
- KeyValueTextInputFormat (mapred/KeyValueTextInputFormat.java): split
  each line at the FIRST separator.
- NLineInputFormat (mapred/lib/NLineInputFormat.java): a partitioning
  knob — expose as target rows-per-partition repartition.
- StreamInputFormat + StreamXmlRecordReader (contrib/streaming):
  records delimited by begin/end patterns.
- MultipleInputs + DelegatingInputFormat (mapred/lib/MultipleInputs.
  java:43-65): per-path readers unioned with a source tag.
- EmptyInputFormat (test/.../EmptyInputFormat.java): empty frame.
- CombineFileInputFormat (mapred/lib/CombineFileInputFormat.java):
  small-file packing — built into Spark via files.maxPartitionBytes /
  openCostInBytes; `small_file_packing` scopes them to a job.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.transforms import parse_kv_line


def read_text_lines(spark: SparkSession, path: str, with_offsets: bool = False) -> DataFrame:
    """TextInputFormat: one row per line, column `line` (+ synthetic
    monotonically-increasing `offset` if requested)."""
    df = spark.read.text(path).withColumnRenamed("value", "line")
    if with_offsets:
        df = df.withColumn("offset", F.monotonically_increasing_id())
    return df


def read_kv_text(
    spark: SparkSession, path: str, sep: str = "\t"
) -> DataFrame:
    """KeyValueTextInputFormat: (key, value) split at first separator;
    a line without the separator is all key, empty value."""
    return parse_kv_line(read_text_lines(spark, path), "line", sep)


def n_line_partitions(df: DataFrame, lines_per_partition: int) -> DataFrame:
    """NLineInputFormat analog: size partitions to ~N rows each (a
    parallelism knob for expensive per-record work)."""
    n = max(1, df.count() // max(1, lines_per_partition))
    return df.repartition(n)


def read_delimited_records(
    spark: SparkSession, path: str, begin: str, end: str
) -> DataFrame:
    """StreamXmlRecordReader analog: extract begin...end spans as
    records from whole files. For files too large for wholetext, use a
    custom line-merge (not needed for the parity surface)."""
    whole = spark.read.text(path, wholetext=True)
    pattern = F.lit(f"(?s){begin}.*?{end}")
    return whole.select(
        F.explode(F.regexp_extract_all(F.col("value"), pattern, F.lit(0))).alias("record")
    )


def multiple_inputs(
    spark: SparkSession,
    readers: dict[str, Callable[[SparkSession], DataFrame]],
    tag_col: str = "source",
) -> DataFrame:
    """MultipleInputs: heterogeneous per-path readers → tagged union.
    Missing columns across sources become NULLs (TupleWritable absent
    slots)."""
    parts = []
    for tag, reader in readers.items():
        parts.append(reader(spark).withColumn(tag_col, F.lit(tag)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def empty_input(spark: SparkSession, schema: str) -> DataFrame:
    """EmptyInputFormat: an empty frame with a declared schema."""
    return spark.createDataFrame([], schema)


@contextmanager
def small_file_packing(
    spark: SparkSession,
    max_partition_bytes: int = 128 * 1024 * 1024,
    open_cost_bytes: int = 4 * 1024 * 1024,
) -> Iterator[None]:
    """CombineFileInputFormat analog: pack many small files into few
    read partitions by sizing the per-file open cost. Spark plans file
    scans at ACTION time from session conf (per-read options are
    ignored by the FilePartition planner), so the packing must scope
    the actions — run the reads and the downstream job inside the
    `with` block; prior values are restored on exit. Mirrors Hadoop,
    where CombineFileInputFormat was likewise job-level config."""
    keys = {
        "spark.sql.files.maxPartitionBytes": str(max_partition_bytes),
        "spark.sql.files.openCostInBytes": str(open_cost_bytes),
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def packed_read(
    spark: SparkSession,
    path: str,
    fmt: str = "text",
    max_partition_bytes: int = 128 * 1024 * 1024,
    open_cost_bytes: int = 4 * 1024 * 1024,
) -> DataFrame:
    """Convenience wrapper: a lazy read whose actions should run inside
    `small_file_packing` with the same sizes — otherwise the scan plans
    with whatever conf is current when the action fires."""
    with small_file_packing(spark, max_partition_bytes, open_cost_bytes):
        return spark.read.format(fmt).load(path)

"""JDBC source/sink (DBInputFormat / DBOutputFormat analogs).

Reference: mapred/lib/db/DBInputFormat.java:82-114 builds per-split
``SELECT f1,f2 FROM t WHERE cond ORDER BY k LIMIT len OFFSET start``
queries; DBOutputFormat.java:107-113 batches INSERTs. Spark's JDBC
source does the same partitioned-read with (partitionColumn,
lowerBound, upperBound, numPartitions) — predicates push into each
partition query — and `df.write.jdbc` batches inserts.

Tested against the embedded Derby that ships with Spark (jdbc:derby:
URLs, auto-loaded driver) — see tests/test_infra.py::TestJdbc; any
other driver is a classpath + `driver` option at deploy time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """DBInputFormat: partitioned JDBC scan. Always set the partition
    bounds for big tables — a single-partition JDBC read is the
    classic driver-bottleneck mistake at scale."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 1000,
    **options: str,
) -> None:
    """DBOutputFormat: batched INSERTs per partition."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()

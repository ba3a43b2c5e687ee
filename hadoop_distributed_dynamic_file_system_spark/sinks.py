"""Sinks (SURVEY §2.2): text out, routed multi-output, null sink,
getmerge, small-file compaction.

Reference → Spark mapping:
- TextOutputFormat (mapred/TextOutputFormat.java:40,117): key<sep>value
  lines, separator from `mapred.textoutputformat.separator`.
- MultipleOutputs (mapred/lib/MultipleOutputs.java): named side outputs
  from one pass → cache + filtered writes.
- MultipleOutputFormat (mapred/lib/MultipleOutputFormat.java): route
  records to files named by a key → `partitionBy`.
- NullOutputFormat (mapred/lib/NullOutputFormat.java): execute for
  side effects, discard output.
- FsShell -getmerge (core/fs/FsShell.java): concatenate part files.
- HadoopArchives (tools/HadoopArchives.java): pack many small files
  into one indexed container → a (path, content) parquet table.
- FileOutputCommitter: Spark's commit protocol, free.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_text(df: DataFrame, path: str, sep: str = "\t", mode: str = "overwrite") -> None:
    """TextOutputFormat: one `col1<sep>col2...` line per row."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
    df.select(F.concat_ws(sep, *cols).alias("value")).write.mode(mode).text(path)


def multiple_outputs(
    df: DataFrame,
    outputs: dict[str, tuple[Callable[[DataFrame], DataFrame], str]],
    base_path: str,
    fmt: str = "parquet",
) -> None:
    """MultipleOutputs: several named outputs from one computed pass.

    `outputs` maps name → (transform, subdir). The source is cached so
    the expensive upstream plan runs once, like the reference's
    single-pass side outputs."""
    df.persist()
    try:
        for name, (transform, subdir) in outputs.items():
            out = transform(df)
            out.write.mode("overwrite").format(fmt).save(os.path.join(base_path, subdir))
    finally:
        df.unpersist()


def write_partitioned_by_key(
    df: DataFrame, path: str, route_col: str, fmt: str = "parquet", mode: str = "overwrite"
) -> None:
    """MultipleOutputFormat: route each record to a directory named by
    the routing key. Low-cardinality keys only (every distinct value
    is a directory — same constraint the reference had with files)."""
    df.write.mode(mode).format(fmt).partitionBy(route_col).save(path)


def null_sink(df: DataFrame) -> int:
    """NullOutputFormat: run the plan for side effects/validation."""
    return df.count()


def getmerge(spark: SparkSession, src_dir: str, dst_file: str, newline: bool = False) -> None:
    """FsShell -getmerge: concatenate part files into one local file,
    in partition order."""
    parts = sorted(glob.glob(os.path.join(src_dir, "part-*")))
    with open(dst_file, "wb") as out:
        for p in parts:
            with open(p, "rb") as f:
                data = f.read()
                out.write(data)
                if newline and data and not data.endswith(b"\n"):
                    out.write(b"\n")


def compact_small_files(
    spark: SparkSession, src_glob: str, dst_path: str, mode: str = "overwrite"
) -> DataFrame:
    """HadoopArchives analog: many small files → one parquet table
    (path, mod_time, length, content). Filenames survive (the har
    index analog); downstream reads are one columnar scan instead of
    N opens. Uses Spark's binaryFile source — distributed, streams
    file contents off the driver."""
    files = spark.read.format("binaryFile").load(src_glob)
    packed = files.select(
        F.col("path"),
        F.col("modificationTime").alias("mod_time"),
        F.col("length"),
        F.col("content"),
    )
    packed.write.mode(mode).parquet(dst_path)
    return spark.read.parquet(dst_path)


def extract_archive(spark: SparkSession, archive_path: str, dst_dir: str) -> int:
    """HadoopArchives inverse (har extract): unpack a
    `compact_small_files` parquet archive back into individual files
    under `dst_dir`, preserving the tail of each stored path below the
    archive members' common directory. Extraction happens on the
    executors (foreachPartition) — content bytes never funnel through
    the driver. Targets a filesystem path visible to the executors
    (local mount / NFS / fuse); for object stores, swap the `open` for
    the store's client inside the same partition loop. Returns the
    member count."""
    files = spark.read.parquet(archive_path).select("path", "content")
    lo, hi = files.agg(F.min("path"), F.max("path")).first()
    if lo is None:
        return 0
    common = os.path.commonprefix([lo, hi])
    prefix_len = common.rfind("/") + 1  # cut at a directory boundary

    def _write(rows) -> None:
        for r in rows:
            rel = r.path[prefix_len:].lstrip("/")
            out = os.path.join(dst_dir, rel)
            os.makedirs(os.path.dirname(out) or dst_dir, exist_ok=True)
            with open(out, "wb") as f:
                f.write(bytes(r.content))

    files.foreachPartition(_write)
    return files.count()

"""Hadoop Streaming parity: run external executables as operators.

Reference: contrib/streaming — PipeMapper/PipeReducer spawn the user
command (PipeMapRed.java:166), feed ``key<sep>value\\n`` lines to stdin
(:635), and split each stdout line back into key/value at the N-th
separator (:342-355; configs `stream.map.output.field.separator`,
`stream.num.map.output.key.fields`). A line with fewer separators than
N keeps the whole line as key with an empty value.

Spark-first: `rdd.pipe` does the process management; this wrapper
reproduces the separator/key-fields contract and returns DataFrames.
Each task pipes its partition through one process instance — same
process model as the reference (one exec per task), so it scales with
partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _to_lines(df: DataFrame, sep: str) -> "RDD[str]":  # noqa: F821
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in df.columns]
    lines = df.select(F.concat_ws(sep, *cols).alias("line"))
    return lines.rdd.map(lambda r: r.line)


def split_output_line(line: str, sep: str, num_key_fields: int) -> tuple[str, str]:
    """PipeMapRed.java:342-355 semantics: split at the N-th separator;
    too few separators → whole line is the key, value empty."""
    parts = line.split(sep)
    if len(parts) <= num_key_fields:
        return line, ""
    return sep.join(parts[:num_key_fields]), sep.join(parts[num_key_fields:])


def pipe(
    df: DataFrame,
    command: str,
    sep: str = "\t",
    num_key_fields: int = 1,
    env: dict[str, str] | None = None,
    check_code: bool = False,
) -> DataFrame:
    """PipeMapper analog: DataFrame → lines → external command → (key, value).

    `command` is run once per partition; stdin gets one
    ``col1<sep>col2<sep>...`` line per row; stdout lines are split at
    the `num_key_fields`-th separator. `check_code=True` fails the task
    on a non-zero exit (the reference's PipeMapRed failure contract);
    default False matches `rdd.pipe`.
    """
    spark = df.sparkSession
    piped = _to_lines(df, sep).pipe(command, env=env or {}, checkCode=check_code)
    nkf = num_key_fields
    kv = piped.map(lambda line: split_output_line(line, sep, nkf))
    return spark.createDataFrame(kv, schema="key string, value string")


def ship_and_pipe(
    df: DataFrame,
    command: str,
    files: list[str],
    sep: str = "\t",
    num_key_fields: int = 1,
    env: dict[str, str] | None = None,
    check_code: bool = True,
) -> DataFrame:
    """Hadoop Streaming ``-file`` analog (StreamJob.java packageJobJar):
    ship local scripts to every task and run them as the pipe command.

    `files` are distributed via SparkContext.addFile; `command` refers
    to them by BASENAME. Resolution to the task-local copy happens
    INSIDE the task (SparkFiles.get in the python worker) — each
    executor resolves against its own download root, so the same code
    is correct on a real cluster, not just local mode. Streams stdin
    from a writer thread (the PipedRDD pattern) so partitions larger
    than the pipe buffer can't deadlock."""
    import os as _os

    spark = df.sparkSession
    for f in files:
        spark.sparkContext.addFile(f)
    shipped = {_os.path.basename(f) for f in files}
    nkf = num_key_fields
    extra_env = dict(env or {})

    def run_partition(it):
        import os
        import shlex
        import subprocess
        import threading

        from pyspark import SparkFiles

        argv = []
        for tok in shlex.split(command):
            if tok in shipped:
                local = SparkFiles.get(tok)
                try:  # addFile doesn't promise the executable bit
                    os.chmod(local, 0o755)
                except OSError:
                    pass
                argv.append(local)
            else:
                argv.append(tok)
        proc = subprocess.Popen(
            argv,
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            env={**os.environ, **extra_env},
            text=True,
        )

        def feed() -> None:
            try:
                for line in it:
                    proc.stdin.write(line + "\n")
            finally:
                proc.stdin.close()

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        for out_line in proc.stdout:
            yield out_line.rstrip("\n")
        t.join()
        rc = proc.wait()
        if check_code and rc != 0:
            raise RuntimeError(f"pipe command {argv[0]} exited {rc}")

    piped = _to_lines(df, sep).mapPartitions(run_partition)
    kv = piped.map(lambda line: split_output_line(line, sep, nkf))
    return spark.createDataFrame(kv, schema="key string, value string")


def pipe_reduce(
    df: DataFrame,
    command: str,
    key_cols: list[str],
    sep: str = "\t",
    num_key_fields: int = 1,
    env: dict[str, str] | None = None,
) -> DataFrame:
    """PipeReducer analog: repartition by key + sort within partitions
    so the external reducer sees each key's records contiguously (the
    reference's sorted-reduce contract), then pipe."""
    grouped = df.repartition(*[F.col(c) for c in key_cols]).sortWithinPartitions(*key_cols)
    return pipe(grouped, command, sep=sep, num_key_fields=num_key_fields, env=env)


def pipe_aggregate(
    df: DataFrame,
    mapper_command: str,
    descriptors: list[str],
    group_col: str = "key",
    sep: str = "\t",
) -> DataFrame:
    """StreamAggregate shape: external mapper emits descriptor-tagged
    KV lines, the aggregate DSL reduces them (ValueAggregatorJob over
    streaming, contrib/streaming + mapred/lib/aggregate)."""
    from .operators.aggregate import aggregate

    mapped = pipe(df, mapper_command, sep=sep)
    return aggregate(mapped, [group_col], descriptors)

"""Deterministic data synthesis + sort validation.

Reference surfaces:
- TeraGen (examples/terasort/TeraGen.java:60,259): deterministic
  100-byte records — 10-byte key from a seeded PRNG, 90-byte payload.
- RandomWriter / RandomTextWriter (examples/RandomWriter.java,
  RandomTextWriter.java): bulk synthetic KV / word-sequence data.
- SortValidator (src/test/.../mapred/SortValidator.java:54-182): sort
  output is valid iff (a) records are globally ordered and (b) the
  input/output record-stats triples (bytes, count, xor-ish checksum)
  match — order-insensitive multiset equality.
- TeraValidate (examples/terasort/TeraValidate.java): same two
  invariants for TeraSort.

Spark-first: generation is `spark.range` + hash synthesis — pure
column expressions, fully parallel, and (unlike F.rand) independent of
partitioning: record i has the same content at any parallelism, like
TeraGen's row-seeded PRNG. Validation never collects data: per-
partition invariants reduce to one row per partition (mapPartitions),
the driver only compares partition boundaries.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_WORDS = [
    "apple", "banana", "cherry", "date", "elder", "fig", "grape",
    "honey", "iris", "jasmine", "kiwi", "lemon", "mango", "nectar",
    "olive", "peach", "quince", "rasp", "straw", "tamarind",
]


def teragen(spark: SparkSession, n: int, parts: int = 32) -> DataFrame:
    """TeraGen analog: n deterministic records (key10, payload).

    Key = first 10 hex chars of sha2(row id) — uniformly distributed,
    byte-comparable, reproducible at any partitioning."""
    base = spark.range(0, n, 1, parts)
    key = F.substring(F.sha2(F.col("id").cast("string"), 256), 1, 10)
    payload = F.rpad(F.concat(F.lit("row-"), F.col("id").cast("string")), 90, "x")
    return base.select(key.alias("key10"), payload.alias("payload"), F.col("id"))


def random_text(spark: SparkSession, n_lines: int, words_per_line: int = 10,
                parts: int = 32) -> DataFrame:
    """RandomTextWriter analog: n_lines of pseudo-random word sequences,
    deterministic per line id (hash-indexed vocabulary, not F.rand)."""
    base = spark.range(0, n_lines, 1, parts)
    words = [
        F.element_at(
            F.array(*[F.lit(w) for w in _WORDS]),
            ((F.xxhash64(F.col("id"), F.lit(i)) % len(_WORDS) + len(_WORDS)) % len(_WORDS) + 1)
            .cast("int"),
        )
        for i in range(words_per_line)
    ]
    return base.select(F.concat_ws(" ", *words).alias("line"), F.col("id"))


def pi_estimate(spark: SparkSession, n_samples: int, parts: int = 32) -> float:
    """PiEstimator analog (examples/PiEstimator.java, 353 LoC): Monte
    Carlo π from the 2,3-Halton low-discrepancy sequence — the same
    deterministic point set as the reference, so the estimate is exact
    for a given n at any parallelism.

    Spark shape: range → mapInPandas (vectorized numpy Halton, no
    per-point Python) → one count-style agg."""
    import numpy as np
    import pandas as pd

    def halton_hits(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy() + 1  # Halton index is 1-based
            xy = []
            for base in (2, 3):
                i = idx.astype(np.float64) * 0  # accum
                f = np.ones_like(idx, dtype=np.float64)
                rem = idx.copy()
                while rem.max() > 0:
                    f = f / base
                    i = i + f * (rem % base)
                    rem = rem // base
                xy.append(i)
            x, y = xy[0] - 0.5, xy[1] - 0.5
            inside = (x * x + y * y <= 0.25).sum()
            yield pd.DataFrame({"hits": [int(inside)], "n": [len(idx)]})

    totals = (
        spark.range(0, n_samples, 1, parts)
        .mapInPandas(halton_hits, schema="hits long, n long")
        .groupBy()
        .sum("hits", "n")
        .collect()[0]
    )
    return 4.0 * totals[0] / totals[1]


# ------------------------------------------------------------------ validator
@dataclass
class SortValidation:
    ordered: bool
    multiset_equal: bool
    input_count: int
    output_count: int

    @property
    def ok(self) -> bool:
        return self.ordered and self.multiset_equal


def _record_stats(df: DataFrame, cols: list[str]):
    """RecordStatsChecker analog (SortValidator.java:93-97): order-
    insensitive (count, bytes, checksum) triple, computed distributed."""
    line = F.concat_ws("\x01", *[F.col(c).cast("string") for c in cols])
    return df.agg(
        F.count("*").alias("n"),
        F.sum(F.length(line)).alias("bytes"),
        # xor-fold of record hashes: commutative, like the reference's
        # xor checksum — any reordering-preserving copy matches
        F.expr(f"bit_xor(xxhash64({', '.join(cols)}))").alias("checksum"),
    ).collect()[0]


def validate_sort(
    input_df: DataFrame, output_df: DataFrame, key_cols: list[str]
) -> SortValidation:
    """SortValidator: output is a permutation of input AND globally
    ordered by key_cols (partition-local order + ordered partition
    boundaries — never collects records to the driver)."""
    all_cols = input_df.columns

    def partition_summary(idx, rows):
        first = last = None
        sorted_ok = True
        n = 0
        prev = None
        for r in rows:
            k = tuple(r[c] for c in key_cols)
            if first is None:
                first = k
            if prev is not None and k < prev:
                sorted_ok = False
            prev = k
            last = k
            n += 1
        yield (idx, first, last, sorted_ok, n)

    summaries = sorted(
        output_df.rdd.mapPartitionsWithIndex(partition_summary).collect()
    )
    ordered = True
    prev_last = None
    for _idx, first, last, sorted_ok, n in summaries:
        if n == 0:
            continue
        if not sorted_ok:
            ordered = False
        if prev_last is not None and first < prev_last:
            ordered = False
        prev_last = last

    s_in = _record_stats(input_df, all_cols)
    s_out = _record_stats(output_df.select(*all_cols), all_cols)
    multiset_equal = tuple(s_in) == tuple(s_out)
    return SortValidation(
        ordered=ordered,
        multiset_equal=multiset_equal,
        input_count=s_in.n,
        output_count=s_out.n,
    )

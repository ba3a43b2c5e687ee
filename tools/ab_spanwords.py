"""Interleaved A/B: remove_duplicated_spans with the words relation
persisted (current code) vs the prior unpersisted form (three regex
splits of every doc). Same session, alternating reps.

Usage: python tools/ab_spanwords.py [--reps N] q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from hadoop_distributed_dynamic_file_system_spark.session import get_spark  # noqa: E402
from hadoop_distributed_dynamic_file_system_spark import cache  # noqa: E402
from hadoop_distributed_dynamic_file_system_spark import queries as q  # noqa: E402
from hadoop_distributed_dynamic_file_system_spark import queries_llm  # noqa: E402,F401
from hadoop_distributed_dynamic_file_system_spark.operators import dedup  # noqa: E402

_NEW = dedup.remove_duplicated_spans


def _old(df: DataFrame, id_col: str, text_col: str, n: int = 5) -> DataFrame:
    """Pre-r12 form: words unpersisted (three splits per doc)."""
    words = df.select(
        F.col(id_col), F.split(F.col(text_col), r"\s+").alias("_w")
    )
    occ = words.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_w") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("_w") - (n - 1)),
                    lambda i: F.struct(
                        i.alias("_start"),
                        F.xxhash64(
                            F.concat_ws(
                                " ",
                                *[
                                    F.element_at(F.col("_w"), i + j)
                                    for j in range(n)
                                ],
                            )
                        ).alias("_g"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<_start:int,_g:bigint>>")
            )
        ).alias("_o"),
    ).select(
        F.col(id_col), F.col("_o._start").alias("_start"),
        F.col("_o._g").alias("_g"),
    )
    winners = occ.groupBy("_g").agg(
        F.count("*").alias("_cnt"),
        F.min(
            F.struct(F.col(id_col).alias("_d"), F.col("_start").alias("_s"))
        ).alias("_first"),
    )
    losers = occ.join(winners.filter(F.col("_cnt") >= 2), "_g").filter(
        ~(
            (F.col(id_col) == F.col("_first._d"))
            & (F.col("_start") == F.col("_first._s"))
        )
    )
    covered = losers.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.col("_start"), F.col("_start") + (n - 1))
        ).alias("_pos"),
    ).distinct()
    positions = words.select(
        F.col(id_col), F.posexplode("_w").alias("_pos0", "_word")
    ).select(F.col(id_col), (F.col("_pos0") + 1).alias("_pos"), "_word")
    kept = positions.join(covered, [id_col, "_pos"], "left_anti")
    per_doc = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_word"))),
                lambda s: s.getField("_word"),
            ),
            " ",
        ).alias("cleaned"),
    )
    totals = words.select(
        F.col(id_col), F.size("_w").cast("long").alias("n_words")
    )
    return totals.join(per_doc, id_col, "left").select(
        id_col,
        "n_words",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("cleaned", F.lit("")).alias("cleaned"),
    )


def main() -> None:
    argv = sys.argv[1:]
    reps = 4
    names: list[str] = []
    while argv:
        a = argv.pop(0)
        if a == "--reps":
            reps = int(argv.pop(0))
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_spanwords")

    def run(name: str, new: bool, sf: str) -> float:
        dedup.remove_duplicated_spans = _NEW if new else _old
        try:
            t0 = time.time()
            q.QUERIES[name](spark, sf).write.mode("overwrite").format(
                "noop"
            ).save()
            return time.time() - t0
        finally:
            dedup.remove_duplicated_spans = _NEW
            cache.release_all()

    for name in names:
        for new in (True, False):  # warm both shapes
            run(name, new, "/root/testdata/sf0.001")
        a_reps, b_reps = [], []
        for _ in range(reps):
            a_reps.append(run(name, True, sf_dir))
            b_reps.append(run(name, False, sf_dir))
        print(f"{name:30s} persisted   min={min(a_reps):7.3f} "
              f"reps={[round(x, 2) for x in a_reps]}")
        print(f"{name:30s} unpersisted min={min(b_reps):7.3f} "
              f"reps={[round(x, 2) for x in b_reps]}")
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()

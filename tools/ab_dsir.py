"""Interleaved A/B: fused single-pass DSIR model build (target_flag)
vs the two-pass form, same session, alternating reps. Variant OFF
monkeypatches dsir_bucket_weights/dsir_importance so a target_flag
call is rewritten to the two-pass target= call.

Usage: python tools/ab_dsir.py [--reps N] q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hadoop_distributed_dynamic_file_system_spark.session import get_spark  # noqa: E402
from hadoop_distributed_dynamic_file_system_spark import cache  # noqa: E402
from hadoop_distributed_dynamic_file_system_spark import queries as q  # noqa: E402
from hadoop_distributed_dynamic_file_system_spark import queries_llm  # noqa: E402,F401
from hadoop_distributed_dynamic_file_system_spark.operators import webquality as wq  # noqa: E402

_ORIG_W = wq.dsir_bucket_weights
_ORIG_I = wq.dsir_importance


def _twopass_w(df, text_col, target=None, text_col_target=None,
               buckets=1024, target_flag=None):
    if target_flag is not None:
        target = df.filter(target_flag).select(text_col)
        df = df.select(text_col)
        target_flag = None
    return _ORIG_W(df, text_col, target, text_col_target, buckets)


def _twopass_i(df, id_col, text_col, target=None, text_col_target=None,
               buckets=1024, target_flag=None):
    if target_flag is not None:
        target = df.filter(target_flag).select(id_col, text_col)
        df = df.select(id_col, text_col)
        target_flag = None
    return _ORIG_I(df, id_col, text_col, target, text_col_target, buckets)


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
    spark = get_spark("ab_dsir")

    def run(name: str, fused: bool) -> float:
        wq.dsir_bucket_weights = _ORIG_W if fused else _twopass_w
        wq.dsir_importance = _ORIG_I if fused else _twopass_i
        try:
            t0 = time.time()
            q.QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            return time.time() - t0
        finally:
            wq.dsir_bucket_weights = _ORIG_W
            wq.dsir_importance = _ORIG_I
            cache.release_all()

    for name in names:
        for fused in (True, False):  # warm both shapes
            try:
                run_sf = sf_dir
                sf_dir_small = "/root/testdata/sf0.001"
                wq.dsir_bucket_weights = _ORIG_W if fused else _twopass_w
                wq.dsir_importance = _ORIG_I if fused else _twopass_i
                q.QUERIES[name](spark, sf_dir_small).write.mode(
                    "overwrite"
                ).format("noop").save()
            finally:
                wq.dsir_bucket_weights = _ORIG_W
                wq.dsir_importance = _ORIG_I
                cache.release_all()
        a_reps, b_reps = [], []
        for _ in range(reps):
            a_reps.append(run(name, True))
            b_reps.append(run(name, False))
        print(f"{name:35s} fused   min={min(a_reps):7.3f} "
              f"reps={[round(x, 2) for x in a_reps]}")
        print(f"{name:35s} twopass min={min(b_reps):7.3f} "
              f"reps={[round(x, 2) for x in b_reps]}")
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()

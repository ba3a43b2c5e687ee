"""Interleaved A/B probe: spread_for_compute ON vs OFF (monkeypatched
to identity) for the attributed-freeze-bearing queries — settles the
r11 driver's index_maintenance/dedup_attribution regression flag with
the only measurement this throttling sandbox respects: same-session,
alternating reps, min-of-N per variant.

Usage: python tools/ab_spread.py [--reps N] q1 q2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_distributed_dynamic_file_system_spark.session import get_spark  # noqa: E402
from hadoop_distributed_dynamic_file_system_spark import cache  # noqa: E402
from hadoop_distributed_dynamic_file_system_spark import queries as q  # noqa: E402
from hadoop_distributed_dynamic_file_system_spark import queries_llm  # noqa: E402,F401
from hadoop_distributed_dynamic_file_system_spark.operators import transforms  # noqa: E402


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
    spark = get_spark("ab_spread")
    orig = transforms.spread_for_compute

    def run(name: str, spread_on: bool) -> float:
        transforms.spread_for_compute = orig if spread_on else (lambda df: df)
        try:
            t0 = time.time()
            q.QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            return time.time() - t0
        finally:
            transforms.spread_for_compute = orig
            cache.release_all()

    for name in names:
        # warm both shapes once at the small SF
        for on in (True, False):
            transforms.spread_for_compute = orig if on else (lambda df: df)
            try:
                q.QUERIES[name](spark, "/root/testdata/sf0.001").write.mode(
                    "overwrite"
                ).format("noop").save()
            finally:
                transforms.spread_for_compute = orig
                cache.release_all()
        a_reps, b_reps = [], []
        for _ in range(reps):
            a_reps.append(run(name, True))
            b_reps.append(run(name, False))
        print(
            f"{name:40s} spreadON  min={min(a_reps):7.3f} "
            f"reps={[round(x, 2) for x in a_reps]}"
        )
        print(
            f"{name:40s} spreadOFF min={min(b_reps):7.3f} "
            f"reps={[round(x, 2) for x in b_reps]}"
        )
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()

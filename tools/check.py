"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry and its oracle_sql() twin on
the same sf dir, compares row count, sorted column names, and values
(exact for ints/strings/timestamps, tiny-tolerance report for floats so
we can see whether rounding discipline held).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from hadoop_distributed_dynamic_file_system_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_cell(v):
    """Type-tagged canonical form.

    The driver's value-hash is type-sensitive (Arrow-level): DuckDB
    sum(BIGINT) -> HUGEINT surfaces as Decimal while Spark emits int64,
    and a bare str(v) would canonicalize both to the same text — the
    exact class of mismatch round 1 shipped four times. Tag every cell
    with a type prefix so Decimal(42) != int 42 here too.
    """
    if v is None:
        return "∅"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return f"i:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        # driver-unknown float canon; we demand near-exactness and report diffs
        return f"f:{v:.9g}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (bytes, bytearray)):  # Spark binary -> bytearray, DuckDB -> bytes
        return f"b:{bytes(v).hex()}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return f"{type(v).__name__}:{v}"


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon_cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def compare(name, spark_df, duck_rows, duck_cols):
    s_cols = [c.lower() for c in spark_df.columns]
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [c.lower() for c in duck_cols]
    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(duck_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duck={len(duck_rows)}")
    sc, s_canon = canon_rows(s_cols, s_rows)
    dc, d_canon = canon_rows(d_cols, duck_rows)
    if s_canon != d_canon:
        sset, dset = set(s_canon), set(d_canon)
        only_s = list(sset - dset)[:3]
        only_d = list(dset - sset)[:3]
        problems.append(f"values differ; cols={sc}")
        for r in only_s:
            problems.append(f"  spark-only: {r}")
        for r in only_d:
            problems.append(f"  duck-only : {r}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_skip = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                cnt = df.count()
                print(f"  ~ {name}: rows-only check, {cnt} rows ({time.time()-t0:.1f}s)")
                n_skip += 1
                continue
            rel = con.execute(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
            problems = compare(name, df, duck_rows, duck_cols)
            if problems:
                n_fail += 1
                print(f"  ✗ {name} ({time.time()-t0:.1f}s)")
                for p in problems:
                    print(f"      {p}")
            else:
                n_pass += 1
                print(f"  ✓ {name}: {len(duck_rows)} rows ({time.time()-t0:.1f}s)")
        except Exception:
            n_fail += 1
            print(f"  ✗ {name}: EXCEPTION")
            traceback.print_exc(limit=5)
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

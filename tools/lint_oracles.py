"""One-shot oracle-type lint.

Rejects any oracle_sql() entry whose output schema (per DuckDB
DESCRIBE) contains a HUGEINT or DECIMAL column. Those almost always
come from an uncast integer `sum(...)` / `count(...)` composite —
DuckDB widens integer sums to HUGEINT, which surfaces as
decimal128(38,0) at the Arrow layer the driver hashes, while the
Spark twin emits int64. This is the exact class that shipped as the
round-4 `bpe_pair_counts` red cell. Fix is always the same:
`CAST(... AS BIGINT)` (or `AS DOUBLE` for float composites).

Usage: python tools/lint_oracles.py [sf_dir]
Exit 1 if any oracle is flagged.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# HUGEINT/DECIMAL: uncast integer composites (the r4 bpe_pair_counts
# class). LIST/STRUCT/MAP: non-scalar output the driver's pandas
# sort_values→factorize hash path cannot canonicalize (the r5
# jl_projection/int8_quantized_embeddings class — "unhashable type:
# 'list'"). Both classes pass the local value comparison and fail only
# at the driver, which is why they are linted statically here.
SUSPECT_TYPES = ("HUGEINT", "DECIMAL", "[]", "STRUCT", "MAP(", "LIST")


def lint(sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    flagged = 0
    for name, sql in entrymod.oracle_sql().items():
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"  ✗ {name}: DESCRIBE failed: {e}")
            flagged += 1
            continue
        bad = [(c, t) for c, t, *_ in desc if any(s in t.upper() for s in SUSPECT_TYPES)]
        if bad:
            flagged += 1
            print(f"  ✗ {name}: suspect oracle output type(s):")
            for c, t in bad:
                print(f"      {c}: {t} — add CAST(... AS BIGINT/DOUBLE) in the projection")
    if flagged:
        print(f"\n{flagged} oracle(s) flagged")
        return 1
    print(f"all {len(entrymod.oracle_sql())} oracles clean")
    return 0


if __name__ == "__main__":
    sys.exit(lint(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))

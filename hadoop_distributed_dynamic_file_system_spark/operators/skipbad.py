"""SkipBadRecords analog: run crashable user record-code, quarantine the
records that crash it instead of failing the job.

Reference: src/mapred/org/apache/hadoop/mapred/SkipBadRecords.java:51 —
in skip mode the framework re-runs a failing task while narrowing the
range of records around the crash (SortedRanges.java tracks the ranges;
setAttemptsToStartSkipping / setMapperMaxSkipRecords tune it) and
writes skipped records under ``_logs/skip`` for inspection.

Spark re-expression: Spark's task retry is all-or-nothing, so instead
of cross-attempt range state the narrowing happens inside one pass.
``map_with_skip`` applies the user's batch function to whole Arrow
batches (the fast path — one Python call per ~10k rows); when a batch
raises, it bisects the batch to isolate the crashing record(s) — the
same auto-narrowing idea, O(bad · log batch) extra calls instead of
task re-runs. Good rows come out transformed; bad rows come out as a
JSON quarantine column, the ``_logs/skip`` analog.

The user function must be row-decomposable (a map contract: output rows
for a sub-batch are the concatenation of output rows per record) —
identical to the reference's assumption that a record's processing is
independent of its neighbours.
"""

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist

BAD_COL = "_bad_record"


def _row_json(row) -> str:
    d = {}
    for k, v in row.items():
        if hasattr(v, "item"):  # numpy scalar → python scalar
            v = v.item()
        d[k] = v
    return json.dumps(d, sort_keys=True, default=str)


def map_with_skip(df: DataFrame, fn, out_schema: str) -> DataFrame:
    """Apply ``fn: pd.DataFrame -> pd.DataFrame`` per Arrow batch,
    bisecting any batch that raises to isolate crashing records.

    Returns a DataFrame with ``out_schema``'s columns plus ``_bad_record``
    (string): null for transformed rows; for quarantined rows the output
    columns are null and ``_bad_record`` holds the input row as JSON.
    Split with :func:`split_skipped`.
    """
    import pandas as pd

    out_fields = [f.strip().split()[0] for f in out_schema.split(",")]
    full_schema = out_schema + f", {BAD_COL} string"

    def apply(pdf):
        """Return (good_outputs, bad_row_jsons) for one sub-batch."""
        try:
            return [fn(pdf)], []
        except Exception:
            if len(pdf) <= 1:
                return [], [_row_json(pdf.iloc[0]) for _ in range(len(pdf))]
            mid = len(pdf) // 2
            g1, b1 = apply(pdf.iloc[:mid])
            g2, b2 = apply(pdf.iloc[mid:])
            return g1 + g2, b1 + b2

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            goods, bads = apply(pdf)
            parts = []
            for g in goods:
                if len(g) == 0:
                    continue
                g = g.copy()
                g[BAD_COL] = None
                parts.append(g[out_fields + [BAD_COL]])
            if bads:
                quarantine = pd.DataFrame({f: [None] * len(bads) for f in out_fields})
                quarantine[BAD_COL] = bads
                parts.append(quarantine)
            if parts:
                yield pd.concat(parts, ignore_index=True)

    return df.mapInPandas(run, schema=full_schema)


def split_skipped(mapped: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) from a :func:`map_with_skip` result.

    Persists the mapped frame so the user function runs once, not once
    per branch (the map may be expensive and is not re-run to split).
    Caller owns the cache (``spark.catalog.clearCache()`` when done).
    """
    mapped = tracked_persist(mapped, eager=False)  # lazy: first consumer fills the cache
    clean = mapped.filter(F.col(BAD_COL).isNull()).drop(BAD_COL)
    quarantine = mapped.filter(F.col(BAD_COL).isNotNull()).select(BAD_COL)
    return clean, quarantine


def run_map_with_quarantine(
    df: DataFrame, fn, out_schema: str, bad_records_path: str | None = None
) -> DataFrame:
    """One-call form: transformed rows back, crashed rows written to
    ``bad_records_path`` as JSON text (the ``_logs/skip`` analog) when a
    path is given, silently dropped (reference's counters-only mode)
    otherwise."""
    clean, quarantine = split_skipped(map_with_skip(df, fn, out_schema))
    if bad_records_path is not None:
        quarantine.withColumnRenamed(BAD_COL, "value").write.mode("overwrite").text(
            bad_records_path
        )
    return clean

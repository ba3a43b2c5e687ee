"""Session cache hygiene for internal operator persists.

Several operators persist an intermediate frame because the plan they
return references it from more than one branch (LSH self-joins, the
global_rank offset join, TF-IDF's tf reused by df and tfidf). The
persist cannot be released inside the operator — the returned
DataFrame is lazy and the consuming action hasn't run yet — so a
long-lived engine session would otherwise accumulate executor storage
until eviction pressure taxes every later query (the round-2 bench
measured a uniform ~2× inflation from exactly this).

`tracked_persist` is the library-wide pattern: persist + register.
After the consuming action completes, the caller (bench.py between
entries, tools/check.py between queries, any long-lived host process
between requests) calls `release_all()` and every internal persist is
unpersisted. Frames the *user* cached on purpose are untouched —
unlike `spark.catalog.clearCache()`, release only covers the engine's
own intermediates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, eager: bool = True) -> DataFrame:
    """Persist `df`, register it for later release, return it.

    eager=True also runs a count() so the cache is filled before any
    self-join races both sides against an empty cache (each side would
    recompute the full upstream pipeline — see dedup.lsh_candidate_pairs).
    """
    df = df.persist()
    if eager:
        df.count()
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked frame; returns how many were released.

    Safe to call at any time: frames whose consuming action already ran
    simply free their storage; frames still referenced by an un-acted
    plan recompute if re-used (callers release *between* queries, so in
    practice nothing recomputes).
    """
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def tracked_count() -> int:
    return len(_TRACKED)

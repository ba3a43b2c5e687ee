"""run_job: the map/combine/reduce-shaped compatibility facade.

Reference lifecycle (SURVEY §3.1): a JobConf names mapper, combiner,
partitioner, sort/group comparators, reducer, input and output. The
user-visible contract is `JobSpec(input, mapper, combiner, partitioner,
comparators, reducer, output)`; everything else (split planning,
shuffle, spills, merge — JobClient.java:747+, MapTask.java:696+,
ReduceTask.java:380+) is engine machinery Spark replaces outright.

Here a job is declarative: the mapper is a DataFrame→DataFrame
transform (1→N via explode / mapInPandas covers the Mapper contract),
the reduce phase is groupBy().agg() or applyInPandas for arbitrary
Java-Reducer-like logic, and the combiner is Catalyst's partial
aggregation — automatic, no user code. Counters ride on df.observe.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class JobSpec:
    """The JobConf analog — only the semantic fields survive."""

    mapper: Callable[[DataFrame], DataFrame] | None = None
    key_cols: list[str] = field(default_factory=list)
    # reducer as aggregate expressions (the LongSumReducer family) ...
    agg_exprs: list[Column] = field(default_factory=list)
    # ... or as a grouped-map function (the arbitrary-Java-Reducer case)
    reduce_fn: Callable | None = None
    reduce_schema: str | None = None
    # secondary sort: value ordering within each key group
    sort_within: list[str] = field(default_factory=list)
    num_partitions: int | None = None
    counters: dict[str, Column] = field(default_factory=dict)
    # populated by run_job when counters are declared; read values with
    # spec.counter_values() after an action (Counters.findCounter analog)
    _observation: object = field(default=None, repr=False, compare=False)

    def counter_values(self) -> dict:
        """Counter totals after the job's action ran (blocking get,
        like Counters after job completion)."""
        if self._observation is None:
            return {}
        return dict(self._observation.get)


def run_job(df: DataFrame, spec: JobSpec) -> DataFrame:
    """Execute a JobSpec as one DataFrame plan.

    Map-only jobs (no key_cols): mapper output is the result — the
    reference's numReduces=0 case. With key_cols: shuffle on the keys
    and apply the reducer; `sort_within` reproduces
    setOutputValueGroupingComparator ordering for reduce_fn.
    """
    out = spec.mapper(df) if spec.mapper else df
    if spec.counters:
        from pyspark.sql import Observation

        spec._observation = Observation()
        out = out.observe(
            spec._observation, *[c.alias(n) for n, c in spec.counters.items()]
        )
    if not spec.key_cols:
        return out

    if spec.reduce_fn is not None:
        if spec.sort_within:
            # applyInPandas receives each group whole; pre-sorting
            # within partitions gives the reducer sorted values, the
            # reference's sorted-iterator contract
            out = out.repartition(*[F.col(c) for c in spec.key_cols]).sortWithinPartitions(
                *spec.key_cols, *spec.sort_within
            )
        return out.groupBy(*spec.key_cols).applyInPandas(
            spec.reduce_fn, schema=spec.reduce_schema
        )
    if not spec.agg_exprs:
        raise ValueError("reduce phase needs agg_exprs or reduce_fn")
    return out.groupBy(*spec.key_cols).agg(*spec.agg_exprs)

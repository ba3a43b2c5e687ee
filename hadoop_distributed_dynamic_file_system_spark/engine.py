"""Engine facade: session + catalog + hot-set manager wired together.

The reference's user experience: point the client at a filesystem,
every `open` updates access heat in the NameNode and the
DynamicReplicationMonitor adjusts replication behind the scenes
(FSNamesystem.getBlockLocations → FSDirectory.unprotectedSetTimes →
allocateReplication; SURVEY §3.4). The Engine mirrors that: every
`table()` access updates the catalog EWMA and gives the hot-set
manager its promotion/demotion hook — queries just use DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog
from .hotset import HotSetManager
from .session import get_spark


class Engine:
    def __init__(
        self,
        data_dir: str | None = None,
        spark: SparkSession | None = None,
        hot_set: bool = True,
        **session_kwargs,
    ) -> None:
        self.spark = spark or get_spark(**session_kwargs)
        self.catalog = Catalog(self.spark)
        self.hotset = HotSetManager(self.catalog) if hot_set else None
        if data_dir:
            self.catalog.register_dir(data_dir, as_views=True)

    # -- the getBlockLocations-shaped access path ----------------------
    def table(self, name: str) -> DataFrame:
        """Read a registered table; updates access EWMA and runs the
        hot-set promotion/demotion pass (the reference's per-open
        dynamic-replication hook)."""
        df = self.catalog.table(name)
        if self.hotset is not None:
            self.hotset.on_access(name)
        return df

    def sql(self, query: str) -> DataFrame:
        """SQL over the registered views."""
        return self.spark.sql(query)

    def register(self, name: str, path: str) -> None:
        self.catalog.register_path(name, path)
        self.catalog.table(name, track_access=False).createOrReplaceTempView(name)

    def heat_report(self) -> list[dict]:
        """Per-table access heat + current cache level (the
        allocationLog analog, NameNode.java:126)."""
        out = []
        for name in self.catalog.names():
            e = self.catalog.entry(name)
            out.append(
                {
                    "table": name,
                    "accesses": e.access_count,
                    "ewma_ms": e.access_time_ewma_ms,
                    "level": (self.hotset.level_of.get(name, 0) if self.hotset else 0),
                    "cached_as": e.cache_level,
                }
            )
        return sorted(out, key=lambda r: -r["ewma_ms"])

    def stop(self) -> None:
        self.spark.stop()

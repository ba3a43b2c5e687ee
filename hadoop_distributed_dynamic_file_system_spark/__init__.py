"""PySpark-native analytics engine with the query / data-processing
capabilities of the reference (Hadoop 0.20.2 "DynamicReplication" fork).

The reference is a MapReduce dataflow engine + HDFS fork; this package
re-expresses its operator inventory (SURVEY.md §2) Spark-first:
DataFrame/SQL plans optimized by Catalyst, with small Python compilers
for the reference's four DSLs (join expressions, key-field sort specs,
field-selection specs, aggregate descriptors), an `rdd.pipe` wrapper for
Hadoop-Streaming parity, file utilities, and a hot-set cache manager
mirroring the fork's dynamic-replication policy.

Layout:
  session     SparkSession factory tuned for the target cluster
  catalog     table catalog + access-EWMA tracking (FSNamesystem analog)
  operators/  aggregation, joins, sort, field transforms, sampling,
              dedup, similarity, text analysis, multimodal
  sources/    text / kv-text / sequencefile / jdbc / multi-input readers
  sinks       text out, multi-output routing, compaction, getmerge
  plans/      run_job facade (map/combine/reduce shape) + JobControl DAG
  streaming/  Structured Streaming surface over the events table
  pipe        Hadoop-Streaming `rdd.pipe` wrapper (separator semantics)
  fileops     FsShell / DistCp / DistCh analogs
  hotset      dynamic-replication analog (promote/demote persist levels)
"""

__version__ = "0.1.0"

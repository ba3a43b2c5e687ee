"""Connected components over a candidate-pair graph — the final stage
of the near-dedup funnel.

LSH produces PAIRS (a~b), but dedup must drop transitive CLUSTERS
(a~b, b~c => {a,b,c} is one document): the canonical-per-cluster choice
needs the component, not the pair list. The reference has no analog —
its dedup story stops at hash-bucket sampling
(src/mapred/org/apache/hadoop/mapred/SequenceFileInputFilter.java:198);
this is the operation a corpus pipeline runs between "candidate pairs"
and "kept documents".

Algorithm: iterative min-label propagation with pointer jumping
(label(v) <- min over neighbors, then label(v) <- label(label(v))),
the DataFrame rendering of the map-reduce CC family (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14 — the
small-star/large-star ancestor). Pointer jumping halves the distance
to each component's minimum every round, so convergence is
O(log diameter) iterations rather than O(diameter).

Design notes for 100 TB:
- every iteration is two equi-joins + one groupBy, all keyed on node
  ids — no broadcast of anything proportional to the graph;
- labels are localCheckpoint'ed each round: the lineage is truncated,
  so round N's plan does not re-analyze rounds 1..N-1 (at cluster
  scale swap for checkpoint() on a reliable dir — same call site);
- dedup graphs are overwhelmingly tiny clusters (near-dup groups of
  2-10 docs), so the loop exits after 2-3 rounds; the log-bound is the
  insurance against pathological chains, not the common case;
- the driver-side loop only ever sees ONE scalar per round (the
  changed-row count that decides convergence) — the data never leaves
  the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
) -> DataFrame:
    """Components of the undirected graph given by `edges`: returns
    (node, component) for every node that appears in an edge, where
    component = the minimum node id reachable from it. Deterministic —
    min-reachable-id is a pure graph property, so the result is
    engine- and partitioning-independent.
    """
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .filter(F.col("s") != F.col("d"))
        .distinct()
    )
    e = e.persist()
    # seed comp = min(node, min direct neighbor): one grouped
    # aggregation on the symmetrized edges (no join) does what the
    # first propagation round would — the loop starts a hop ahead,
    # which for the dominant 2-node near-dup clusters means it only
    # runs the confirming round
    labels = (
        e.groupBy("s")
        .agg(F.min("d").alias("_m"))
        .select(F.col("s").alias("node"), F.least("s", "_m").alias("comp"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nb_min = (
            e.join(labels, e.d == labels.node)
            .groupBy("s")
            .agg(F.min("comp").alias("nb_comp"))
        )
        stepped = (
            labels.join(nb_min, labels.node == nb_min.s, "left")
            .select(
                "node",
                F.col("comp").alias("prev"),
                F.least("comp", F.coalesce("nb_comp", "comp")).alias("comp"),
            )
        )
        # pointer jumping: follow the label one hop (comp <- comp's comp)
        hop = labels.select(
            F.col("node").alias("h_node"), F.col("comp").alias("h_comp")
        )
        jumped = (
            stepped.join(hop, stepped.comp == hop.h_node, "left")
            .select(
                "node",
                "prev",
                F.least("comp", F.coalesce("h_comp", "comp")).alias("comp"),
            )
            # lazy: the changed-count action below materializes the
            # checkpoint, so each round is ONE job, not two
            .localCheckpoint(eager=False)
        )
        changed = jumped.filter(F.col("comp") != F.col("prev")).count()
        labels = jumped.select("node", "comp")
        if changed == 0:
            break
    e.unpersist()
    return labels


def component_sizes(components: DataFrame) -> DataFrame:
    """Cluster-size histogram of a (node, comp) assignment."""
    return components.groupBy("comp").agg(F.count("*").alias("n_members"))

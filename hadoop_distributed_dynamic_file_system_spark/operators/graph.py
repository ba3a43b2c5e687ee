"""Connected components over a candidate-pair graph — the final stage
of the near-dedup funnel.

LSH produces PAIRS (a~b), but dedup must drop transitive CLUSTERS
(a~b, b~c => {a,b,c} is one document): the canonical-per-cluster choice
needs the component, not the pair list. The reference has no analog —
its dedup story stops at hash-bucket sampling
(src/mapred/org/apache/hadoop/mapred/SequenceFileInputFilter.java:198);
this is the operation a corpus pipeline runs between "candidate pairs"
and "kept documents".

Algorithm: CONTRACT-THEN-ITERATE, the DataFrame rendering of the
map-reduce CC family (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14 — the small-star/large-star ancestor):

1. SEED: comp(v) = min(v, min direct neighbor) — one grouped
   aggregation over the symmetrized edges, no join.
2. CONTRACT: quotient the graph by seed label. Each seed-label class
   S_c = {v: comp(v)=c} lies inside ONE true component (every member
   of S_c is c itself or a direct neighbor of c), so merging the class
   into a single quotient node preserves components exactly. The
   contracted edge set is the DISTINCT bad-label pairs
   {(comp(s), comp(d)) : edge (s,d), comp(s) != comp(d)} — for
   near-dup graphs this collapses both the dominant shapes: millions
   of 2-node/star clusters vanish entirely (no bad edges), and DENSE
   clusters (the multi-signal union graph: avg degree >100) collapse
   to a handful of quotient nodes, so their intra-cluster edges are
   touched exactly twice (seed + contract) instead of every round.
3. SOLVE the contracted graph:
   a. if it fits comfortably on the driver (<= driver_max_edges,
      default 1M quotient edges ~ tens of MB), collect it and run
      union-find with min-id representatives — exact, instant, and
      safe: the quotient size is bounded by the number of unsettled
      cluster adjacencies, not by the corpus;
   b. otherwise, min-label propagation with pointer jumping
      (label(v) <- min over neighbors, then label(v) <- label(label(v)))
      on the contracted graph. Pointer jumping halves the distance to
      each component's minimum every round → O(log diameter) rounds,
      each over a graph orders of magnitude smaller than the input.
4. MAP BACK: node's final component = quotient label of its seed
   label (left broadcast join + coalesce; labels untouched by
   contraction are already final).

Why the quotient minimum is the true component minimum: the true min
node m of a component satisfies comp(m) = m (no smaller neighbor
exists), so m survives contraction as a quotient node and the
quotient loop's min-reachable-label equals the component's min node.

Design notes for 100 TB:
- every pass is equi-joins + a groupBy, all keyed on node/label ids —
  no broadcast of anything proportional to the graph;
- the contracted edge build is ONE job (seed labels feed two equi-joins
  over the edge list; the persist fills on the same action that counts
  it), so contraction never costs more than the single full-graph
  round it replaces;
- quotient labels are localCheckpoint'ed each round: the lineage is
  truncated, so round N's plan does not re-analyze rounds 1..N-1 (at
  cluster scale swap for checkpoint() on a reliable dir — same site);
- the driver-side loop only ever sees ONE scalar per round (the
  changed-row count that decides convergence) — the data never leaves
  the executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import cache


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
    driver_max_edges: int = 1_000_000,
    dedup_edges: bool = True,
) -> DataFrame:
    """Components of the undirected graph given by `edges`: returns
    (node, component) for every node that appears in an edge, where
    component = the minimum node id reachable from it. Deterministic —
    min-reachable-id is a pure graph property, so the result is
    engine- and partitioning-independent.

    `driver_max_edges` caps the quotient size solved centrally
    (union-find on collected quotient edges); set 0 to force the
    distributed loop (the property tests exercise both paths).

    `dedup_edges=False` skips the symmetrized edge list's
    self-loop filter + distinct — a full extra shuffle of the edge
    relation at any scale. The RESULT is identical either way (every
    stage here is min/exists-style and multigraph-tolerant; the
    quotient still dedups itself before the solve); the knob exists
    because the dedup pays off only when the input actually carries
    duplicates. Callers that feed oriented candidate pairs (id_a <
    id_b, already distinct — every LSH/SimHash pair producer here)
    should pass False: their symmetrized union is provably
    duplicate- and loop-free."""
    sym = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).unionByName(
        edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    )
    if dedup_edges:
        sym = sym.filter(F.col("s") != F.col("d")).distinct()
    e = cache.tracked_persist(sym, eager=False)
    # seed comp = min(node, min direct neighbor). The eager
    # localCheckpoint action fills e's persist as a side effect —
    # without it the SEED, then BOTH contract joins, would each re-run
    # the whole upstream candidate-pair funnel (measured 295s -> 100s
    # on the x16 union-graph stress shape; at 100 TB the funnel is the
    # dominant cost, so an unpersisted e triples the job).
    labels = (
        e.groupBy("s")
        .agg(F.min("d").alias("_m"))
        .select(F.col("s").alias("node"), F.least("s", "_m").alias("comp"))
        .localCheckpoint()
    )

    # contract: distinct seed-label pairs across edges whose endpoints
    # disagree — the quotient graph the loop runs on. Lazy persist; the
    # n_q count is the ONE job that materializes it.
    lab_s = labels.select(
        F.col("node").alias("s_n"), F.col("comp").alias("comp_s")
    )
    lab_d = labels.select(
        F.col("node").alias("d_n"), F.col("comp").alias("comp_d")
    )
    qe = cache.tracked_persist(
        e.join(lab_s, e.s == lab_s.s_n)
        .join(lab_d, e.d == lab_d.d_n)
        .filter(F.col("comp_s") != F.col("comp_d"))
        .select(F.col("comp_s").alias("s"), F.col("comp_d").alias("d"))
        .distinct(),
        eager=False,
    )
    n_q = qe.count()
    if n_q == 0:
        # every cluster was a star around its minimum — seed is exact
        return labels

    if n_q <= driver_max_edges:
        # quotient fits on the driver: union-find with min-id roots.
        # This is the common case at any scale — the quotient carries
        # one edge per unsettled CLUSTER adjacency, not per row.
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        qpdf = qe.toPandas()  # Arrow transfer: 2 cols × n_q, tens of MB
        for a, b in zip(qpdf["s"].tolist(), qpdf["d"].tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                # attach the larger root under the smaller: the root
                # of every tree is the set's minimum label
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        spark = edges.sparkSession
        comp_type = labels.schema["comp"].dataType
        from pyspark.sql.types import StructField, StructType

        qmap = spark.createDataFrame(
            [(x, find(x)) for x in list(parent)],
            StructType(
                [
                    StructField("q_n", comp_type),
                    StructField("q_comp", comp_type),
                ]
            ),
        )
        return labels.join(
            F.broadcast(qmap), labels.comp == qmap.q_n, "left"
        ).select("node", F.coalesce("q_comp", "comp").alias("comp"))

    # iterate on the contracted graph (symmetric by construction: e is
    # symmetric, so every (c1,c2) appears with its mirror)
    qlab = (
        qe.groupBy("s")
        .agg(F.min("d").alias("_m"))
        .select(F.col("s").alias("node"), F.least("s", "_m").alias("comp"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nb_min = (
            qe.join(qlab, qe.d == qlab.node)
            .groupBy("s")
            .agg(F.min("comp").alias("nb_comp"))
        )
        stepped = (
            qlab.join(nb_min, qlab.node == nb_min.s, "left")
            .select(
                "node",
                F.col("comp").alias("prev"),
                F.least("comp", F.coalesce("nb_comp", "comp")).alias("comp"),
            )
        )
        # pointer jumping: follow the label one hop (comp <- comp's comp)
        hop = qlab.select(
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
        qlab = jumped.select("node", "comp")
        if changed == 0:
            break

    # map back: final comp = quotient label of the seed label; labels
    # whose class never touched a bad edge are absent from the quotient
    # and stay as seeded
    qmap = qlab.select(
        F.col("node").alias("q_n"), F.col("comp").alias("q_comp")
    )
    return labels.join(qmap, labels.comp == qmap.q_n, "left").select(
        "node", F.coalesce("q_comp", "comp").alias("comp")
    )


def component_sizes(components: DataFrame) -> DataFrame:
    """Cluster-size histogram of a (node, comp) assignment."""
    return components.groupBy("comp").agg(F.count("*").alias("n_members"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    weight: str | None = None,
    tol: float | None = None,
) -> DataFrame:
    """Power-iteration PageRank over an edge list — link-graph
    authority scoring, the crawl-curation signal (prioritize documents
    from well-linked hosts) next to the content-quality family.

    rank_{t+1}(v) = (1-d)/N + d·(Σ_{u→v} rank_t(u)/outdeg(u)
                              + dangling_mass_t/N)

    Dangling nodes (no out-edges) redistribute their mass uniformly —
    the standard stochastic-matrix completion, so Σ rank = 1 is
    preserved every round. Parallel edges count multiply (multigraph
    semantics); pass a distinct()'d edge list for simple-graph ranks.

    Scale shape (same discipline as connected_components above):
    - per round: one equi-join of the (src,dst,outdeg) relation with
      the current rank vector, one groupBy(dst) sum, one left join
      back onto the node set — all keyed on node ids, nothing
      graph-sized is broadcast or collected;
    - the edge⋈degree relation and node set are built once and
      persisted; each round re-reads the materialized relation;
    - dangling mass rides a broadcast 1-row aggregate (no collect);
    - rank lineage is truncated per round with a LAZY localCheckpoint
      (plan truncation is immediate, materialization rides the next
      consuming job — no per-round barrier; swap for checkpoint() on a
      reliable dir at cluster scale);
    - the only driver-side values are N and the dangling-set
      existence, both from ONE setup job.

    `weight` names an edge-weight column: contributions become
    rank·w/Σ_out w (weighted out-mass normalization; unweighted is the
    w=1 special case). `tol` switches to convergence stopping: after
    each round the L1 delta Σ|rank_t − rank_{t−1}| is aggregated (one
    extra scalar job per round, same one-scalar discipline as CC's
    changed-count) and the loop exits early when it drops below tol;
    `iterations` then acts as the hard cap.

    (Per-round localCheckpoint is deliberate even for short loops: an
    A/B without it let the un-truncated rank lineage defeat join-size
    estimation — Catalyst planned the per-round edge⋈rank join from
    plan-default statistics and one profiled rep blew up 13x. The
    barrier is cheaper than the mis-planned join.)
    """
    w_expr = (
        F.col(weight).cast("double") if weight is not None else F.lit(1.0)
    )
    # Weights must be NONNEGATIVE (they are flow multiplicities; a
    # negative weight has no rank-mass meaning). Edges with w <= 0 are
    # dropped before degree computation: a zero-weight edge carries
    # zero mass, so the drop is exact — and crucially a node whose
    # out-edges ALL have w = 0 then lands in the dangling set instead
    # of producing 0.0/0.0 = NULL contributions that sum() silently
    # swallows while the node escapes the dangling anti-join (the
    # ADVICE-r5 mass-leak: sum(rank) = 1 would break). NULL weights
    # (cast failures) are dropped by the same predicate.
    e = cache.tracked_persist(
        edges.select(
            F.col(src).alias("src"),
            F.col(dst).alias("dst"),
            w_expr.alias("w"),
        ).filter(F.col("w") > 0)
    )
    deg = e.groupBy("src").agg(F.sum("w").alias("outdeg"))
    # lazy persists: the count()/first-consumer action below fills each
    # cache, so no separate eager-count job is paid per relation (e
    # stays eager — it feeds two union branches inside ONE job, which
    # would race a lazy cache and recompute the upstream edge build)
    nodes = cache.tracked_persist(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct(),
        eager=False,
    )
    # ONE setup job answers both driver-side scalars — node count and
    # whether a dangling node exists — and fills the nodes cache as its
    # side effect (the old shape paid a second count job for the
    # dangling probe). The dangling SET is fixed across rounds (only
    # its mass changes), so when it is empty — every symmetrized graph
    # — the term drops from the loop entirely.
    setup = (
        nodes.join(
            deg.select(F.col("src").alias("node"), F.lit(1).alias("_o")),
            "node",
            "left",
        )
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.when(F.col("_o").isNull(), 1).otherwise(0)).alias("_nd"),
        )
        .first()
    )
    n = setup["_n"]
    if n == 0:
        # empty edge set -> empty rank relation, not a ZeroDivisionError
        # (same tolerance convention as the zero-word/zero-char text ops)
        return nodes.select("node", F.lit(0.0).alias("rank"))
    has_dangling = (setup["_nd"] or 0) > 0
    # EAGER: with the per-round checkpoints lazy (below), every round's
    # edge-side shuffle stage of the SAME final job is independent of
    # the previous round's output — a lazy ed cache would race its own
    # fill across rounds and recompute the e⋈deg join per round.
    ed = cache.tracked_persist(e.join(deg, "src"))
    dang_nodes = (
        cache.tracked_persist(
            nodes.join(
                deg.select(F.col("src").alias("node")), "node", "left_anti"
            ),
            eager=False,
        )
        if has_dangling
        else None
    )
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iterations):
        prev = ranks
        mass = (
            ed.join(ranks, F.col("src") == F.col("node"))
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("outdeg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        new_mass = F.coalesce(F.col("in_mass"), F.lit(0.0))
        it = nodes.join(mass, "node", "left")
        if has_dangling:
            # no broadcast hint: the dangling set is O(sink nodes) and
            # can be graph-sized for crawl graphs — AQE picks the
            # strategy from the persisted relation's actual size
            dang = ranks.join(dang_nodes, "node").agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
            )
            it = it.join(F.broadcast(dang))
            new_mass = new_mass + F.col("dmass") / n
        # lazy per-round checkpoint: the logical plan is truncated to a
        # LogicalRDD IMMEDIATELY (so round N+1's join is planned from
        # the same truncated statistics as the old eager form — the
        # 13x misplan A/B pinned in the docstring stays defeated), but
        # materialization happens inside the first consuming job, so
        # the rounds pipeline into ONE action instead of paying one
        # barrier job each (the connected_components loop's pattern).
        ranks = it.select(
            "node",
            (F.lit(base) + F.lit(damping) * new_mass).alias("rank"),
        ).localCheckpoint(eager=False)
        if tol is not None:
            delta = (
                ranks.join(
                    prev.select("node", F.col("rank").alias("_prev")), "node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("_prev"))).alias("d"))
                .first()[0]
            )
            if delta is not None and delta < tol:
                break
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over an edge list —
    the companion link signal to PageRank: authority(v) grows with
    in-links FROM good hubs, hub(u) with out-links TO good
    authorities. One full iteration is

        auth'(v) = Σ_{u→v} hub(u),    then L1-normalize,
        hub'(u)  = Σ_{u→v} auth'(v),  then L1-normalize

    (L1 rather than L2 so the fixpoint is a distribution like the
    PageRank vector and the oracle arithmetic stays a plain
    sum-divide).

    Scale shape — same discipline as pagerank above: the edge relation
    is persisted once; each half-step is one equi-join with the
    current score vector plus one grouped sum; normalization rides a
    broadcast 1-row aggregate; lineage is truncated per round with
    localCheckpoint. Nothing graph-sized is collected or broadcast.
    Parallel edges count multiply (multigraph semantics), matching
    pagerank.

    Reference parity: no analog — the reference's graph processing is
    one-shot MapReduce joins; iterative link analysis is new
    capability, same family as pagerank (reference's closest shape:
    chained jobs via JobControl, src/mapred/org/apache/hadoop/mapred/
    jobcontrol/JobControl.java).
    """
    e = cache.tracked_persist(
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    )
    # lazy: the n count below is the first consumer and fills the
    # cache (e stays eager — its two union branches race inside the
    # count job otherwise), same shape as pagerank's setup
    nodes = cache.tracked_persist(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct(),
        eager=False,
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0.0).alias("authority"), F.lit(0.0).alias("hub")
        )
    hub = nodes.select("node", F.lit(1.0 / n).alias("hub"))

    def _l1_normalize(df: DataFrame, col: str) -> DataFrame:
        total = df.agg(F.sum(col).alias("_t"))
        return df.join(F.broadcast(total)).select(
            "node", (F.col(col) / F.col("_t")).alias(col)
        )

    auth = None
    for _ in range(iterations):
        raw_auth = (
            e.join(hub, F.col("src") == F.col("node"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("authority"))
        )
        auth = _l1_normalize(
            nodes.join(raw_auth, "node", "left").select(
                "node",
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            ),
            "authority",
        ).localCheckpoint(eager=False)
        raw_hub = (
            e.join(auth, F.col("dst") == F.col("node"))
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("hub"))
        )
        hub = _l1_normalize(
            nodes.join(raw_hub, "node", "left").select(
                "node", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        ).localCheckpoint(eager=False)
    return nodes.join(auth, "node").join(hub, "node").select(
        "node", "authority", "hub"
    )

"""Corpus-curation operators for training-data pipelines: data-mixing
stratified sampling, incremental dedup against a frozen corpus, PII
redaction, and benchmark-contamination detection.

The reference offers only uniform hash sampling (MD5Filter,
src/mapred/org/apache/hadoop/mapred/SequenceFileInputFilter.java:198);
these extend the same deterministic-hash idea to the operations a
large-scale LLM data pipeline runs before training. All are pure
Catalyst expression pipelines — no Python in the data path.

Design notes for 100 TB:
- stratified_sample is a scan-local filter (no shuffle): the keep/drop
  decision is a pure function of (id, stratum), so it composes with
  predicate pushdown and never materializes a stratum count;
- incremental_dedup anti-joins on a 16-byte md5 key; the frozen-corpus
  hash set is the small side (broadcast when it fits, shuffle-hash
  otherwise) and the incoming batch is never re-shuffled twice;
- redact_pii is per-row regexp work inside whole-stage codegen;
- contamination joins the exploded training shingle stream against the
  (tiny) benchmark shingle set — benchmark suites are MBs, so this is
  a broadcast semi-join against a 100 TB explode, the cheap direction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import exploded_shingles
from .sampling import md5_bucket

# 6 hex digits => 2^24 buckets; plenty of resolution for mixture rates
# while keeping the bucket integer exact in a double (oracle division).
_RES_DIGITS = 6
_RES = 16 ** _RES_DIGITS


def uniform_unit(key: Column) -> Column:
    """Deterministic uniform in [0, 1) from md5(key): same value in any
    engine that can md5 — the seedless analog of rand(seed) that is
    reproducible across engines, retries, and partitionings (Spark's
    rand() is seed+partition dependent, so a task retry or AQE re-plan
    resamples; this never does)."""
    return md5_bucket(key, _RES_DIGITS) / F.lit(float(_RES))


def stratified_sample(
    df: DataFrame, stratum_col: str, rates: dict[str, float], id_col: str
) -> DataFrame:
    """Data-mixing sampler: keep each row of stratum s with probability
    rates[s] (deterministic in the row id). Strata absent from `rates`
    are dropped — the common "mixture spec" contract where the spec
    enumerates the sources that participate.

    One pass, no shuffle, no per-stratum count: the decision is
    hash(id) < rate, evaluated scan-side.
    """
    u = uniform_unit(F.col(id_col))
    rate = None
    for s, r in rates.items():
        cond = F.col(stratum_col) == s
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = rate.otherwise(F.lit(0.0)) if rate is not None else F.lit(0.0)
    return df.filter(u < rate)


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    content_cols: list[str],
    *,
    hash_col: str = "content_hash",
    corpus_is_hashed: bool = False,
) -> DataFrame:
    """Keep only batch rows whose content does not already exist in a
    frozen corpus — the day-2 shape of exact dedup: yesterday's corpus
    is immutable, today's crawl must be deduped against it without
    re-scanning it as documents.

    `corpus` is either raw documents (hashed here) or, at scale, a
    persisted hash table (corpus_is_hashed=True) so the frozen side is
    16-byte keys only. The anti-join shuffles md5 keys, never text.
    """
    key = F.md5(F.concat_ws("", *[F.col(c) for c in content_cols]))
    hashed_batch = batch.withColumn(hash_col, key)
    if corpus_is_hashed:
        seen = corpus.select(F.col(hash_col).alias("_seen_hash"))
    else:
        seen = corpus.select(key.alias("_seen_hash")).distinct()
    return hashed_batch.join(
        seen, hashed_batch[hash_col] == seen["_seen_hash"], "left_anti"
    )


# Engine-portable PII patterns (Java regex and RE2 agree on these):
# no backreferences, no lookarounds, explicit character classes.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def redact_pii(
    df: DataFrame, text_col: str, *, out_col: str = "redacted"
) -> DataFrame:
    """Replace emails / phone numbers / IPv4 literals with typed tokens
    ("<EMAIL>", …) and count replacements per kind. Pure regexp
    expressions — codegen'd, scan-parallel, no UDF. Order matters:
    emails are redacted before ipv4 so "user@1.2.3.4"-style hosts don't
    get double-counted; counts are taken on the pre-redaction text."""
    out = df
    redacted = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat)))
        redacted = F.regexp_replace(redacted, pat, f"<{kind.upper()}>")
    return out.withColumn(out_col, redacted)


def contamination_check(
    train: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark-contamination scan: training docs sharing >= min_overlap
    distinct word n-grams with any benchmark doc, with the overlap size.

    Plan shape: benchmark shingles (small — eval suites are MBs) are
    distinct-ed and broadcast; the training side explodes to (id, sh)
    and inner-joins — count(distinct sh) per doc is then a partial-agg
    groupBy on doc id. The corpus itself is never shuffled, only its
    matching shingles.
    """
    bench_sh = (
        exploded_shingles(benchmark, id_col, text_col, n=n)
        .select(F.col("sh").alias("_bench_sh"))
        .distinct()
    )
    train_sh = exploded_shingles(train, id_col, text_col, n=n).distinct()
    return (
        train_sh.join(
            F.broadcast(bench_sh), train_sh["sh"] == bench_sh["_bench_sh"]
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_ngrams"))
        .filter(F.col("n_shared_ngrams") >= min_overlap)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_shards: int,
) -> DataFrame:
    """Sequence packing for training batches: assign each document to a
    (shard, seq_id) training sequence so that sequences are filled
    greedily up to `budget` tokens.

    Contiguous start-offset packing: within a shard (deterministic
    md5-hash of the id), documents are laid out in id order and a
    document belongs to the sequence its FIRST token lands in —
    seq_id = (cumulative_tokens - own_tokens) / budget. A document that
    straddles a boundary overflows its sequence by < one document,
    which is the standard trade against splitting documents.

    Scale: ONE shuffle (hash-partition by shard); each shard's
    running total is a window scan. num_shards is the parallelism
    knob — at 100 TB pick shards so a shard's documents fit a task
    (e.g. 2^16); packing quality is unaffected since every shard
    packs independently.
    """
    if budget <= 0 or num_shards <= 0:
        raise ValueError("budget and num_shards must be positive")
    from pyspark.sql import Window

    shard = (md5_bucket(F.col(id_col), _RES_DIGITS) % num_shards).alias("shard")
    with_shard = df.withColumn("shard", shard)
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return with_shard.withColumn(
        "seq_id",
        F.floor((cum - F.col(token_col)) / F.lit(float(budget))).cast("long"),
    )


def reservoir_sample(
    df: DataFrame, group_col: str, id_col: str, k: int
) -> DataFrame:
    """Deterministic k-per-group sample: keep the k rows whose md5(id)
    sorts lowest within the group (id tiebreak). Statistically a
    uniform without-replacement sample (md5 is a uniform permutation
    of ids), but — unlike a true reservoir — reproducible across
    engines, retries, and partitionings, which is what a curation
    pipeline actually needs from "random".

    Scale: one hash-partition on the group key; the per-group sort is
    window row_number, fine while groups fit a task (strata do); for
    monster groups switch to an approximate threshold on the hash
    (keep hash < k/n quantile) to avoid the per-group sort entirely.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def temperature_mix(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    alpha: float,
    target_fraction: float,
) -> DataFrame:
    """Temperature-based mixture sampling (multilingual-training
    style): stratum s is sampled at a rate proportional to n_s^alpha —
    alpha=1 preserves the natural mix, alpha→0 flattens toward uniform
    across strata — scaled so the expected kept fraction of the whole
    corpus is `target_fraction`. Rates are clamped to 1 (a stratum
    cannot contribute more than it has).

    Two passes, both cheap: one partial-agg count per stratum (rows =
    #strata, broadcast back), then the same scan-local deterministic
    hash(id) < rate filter stratified_sample uses — reproducible
    across engines, retries, and partitionings. Rates are rounded 9dp
    so both engines compare the identical constant against the 2^-24
    hash grid.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("__n"))
    total = counts.agg(F.sum("__n").alias("__total"))
    weighted = counts.join(F.broadcast(total)).select(
        stratum_col,
        "__n",
        "__total",
        F.pow(F.col("__n").cast("double"), F.lit(alpha)).alias("__w"),
    )
    wsum = weighted.agg(F.sum("__w").alias("__wsum"))
    rates = weighted.join(F.broadcast(wsum)).select(
        stratum_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(target_fraction) * F.col("__total") * F.col("__w")
                / (F.col("__wsum") * F.col("__n")),
            ),
            9,
        ).alias("__rate"),
    )
    u = uniform_unit(F.col(id_col))
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(u < F.col("__rate"))
        .drop("__rate")
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.01,
    hi: float = 0.99,
) -> DataFrame:
    """Per-group outlier clipping: values outside the group's
    [lo, hi] exact quantiles are clamped to the bound, and the row is
    tagged with which side (if any) was clipped. The numeric-hygiene
    step before any scale-sensitive downstream statistic.

    One agg pass computes both bounds per group (tiny result,
    broadcast back); the clip itself is scan-local. Exact percentile
    keeps the oracle parity; at 100 TB swap in
    approx_percentile — same shape, sketch-sized partials.
    """
    bounds = df.groupBy(group_col).agg(
        F.round(F.expr(f"percentile({value_col}, {lo})"), 6).alias("__lo"),
        F.round(F.expr(f"percentile({value_col}, {hi})"), 6).alias("__hi"),
    )
    clipped = (
        F.when(F.col(value_col) < F.col("__lo"), F.col("__lo"))
        .when(F.col(value_col) > F.col("__hi"), F.col("__hi"))
        .otherwise(F.col(value_col))
    )
    side = (
        F.when(F.col(value_col) < F.col("__lo"), F.lit(-1))
        .when(F.col(value_col) > F.col("__hi"), F.lit(1))
        .otherwise(F.lit(0))
    )
    return (
        df.join(F.broadcast(bounds), group_col)
        .withColumn("clipped_value", clipped)
        .withColumn("clip_side", side)
        .drop("__lo", "__hi")
    )


def assign_folds(df: DataFrame, id_col: str, k: int) -> DataFrame:
    """Deterministic k-fold assignment: fold = md5_bucket(id) % k.
    Scan-local (no shuffle, no state); the same id lands in the same
    fold in any engine, on any cluster, after any retry — which is the
    property a train/eval split must have to be auditable."""
    return df.withColumn(
        "fold", (md5_bucket(F.col(id_col), _RES_DIGITS) % k).cast("long")
    )


def split_by_cluster(
    df: DataFrame,
    id_col: str,
    cluster_col: str,
    splits: tuple[tuple[str, int], ...] = (("train", 8), ("val", 1), ("test", 1)),
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is decided by
    a deterministic md5 bucket of the CLUSTER key, not the document id,
    so every member of a near-duplicate cluster lands in the same
    split — the property that keeps eval honest (a doc-level split
    leaks a training doc's near-copy into test; splitting by dedup
    component cannot). `splits` are (name, weight) integer shares.

    Scan-local projection over an already-clustered frame (compose
    with exact_dedup's content key or connected_components' root) —
    no shuffle, retry-stable, engine-portable (md5 arithmetic only,
    same convention as assign_folds/uniform_unit)."""
    total = sum(w for _, w in splits)
    bucket = md5_bucket(F.col(cluster_col).cast("string"), _RES_DIGITS) % total
    expr = None
    acc = 0
    for name, w in splits:
        acc += w
        cond_val = F.lit(name)
        expr = (
            F.when(bucket < acc, cond_val)
            if expr is None
            else expr.when(bucket < acc, cond_val)
        )
    return df.select(
        F.col(id_col), F.col(cluster_col), expr.alias("split")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 42,
    pos_col: str = "shuffle_pos",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    stable pseudo-random position (1..N) by ranking on
    md5(id || ':' || seed) — the "shuffle the corpus once, same order
    on every rerun/resume" step a training pipeline takes before
    sharding examples. A different seed is a different permutation;
    the same seed is byte-identical across runs and engines (md5 is
    the repo's portable hash).

    Scale shape: delegates to sort.global_rank — ONE range shuffle on
    the hash key, per-partition sort, broadcast offsets; never a
    single-task global window. The hash key is uniform by
    construction, so range partitions are balanced regardless of id
    skew (the reason to rank the hash, not the id)."""
    from .sort import global_rank

    key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    )
    out = global_rank(
        df.withColumn("_shufkey", key),
        [F.col("_shufkey"), F.col(id_col)],
        rank_col=pos_col,
    )
    return out.drop("_shufkey")


def mixing_plan(
    token_counts: DataFrame,
    source_col: str,
    tokens_col: str,
    alpha: float = 0.5,
    budget_tokens: int | None = None,
) -> DataFrame:
    """The data-recipe calculation: given per-source token counts,
    compute the temperature-α target mixture and the per-source
    repeat factor (epochs) needed to fill a token budget — the
    planning step BEFORE temperature_mix executes a sampling pass
    (GPT-3/PaLM-style mixtures publish exactly this table).

    Per source s: natural_frac = n_s/Σn; target_frac = n_s^α / Σ n^α;
    repeat_factor = target_frac·budget / n_s (>1 means the source is
    epoch-repeated, <1 subsampled). budget defaults to Σn (reshuffle
    the same volume).

    Determinism: the per-source weight n^α is lifted to exact integer
    micro-units (round(n^α·1e6) as int64) BEFORE the normalizing sum,
    so Σw is an exact integer and every frac is one deterministic
    IEEE division — a double Σ of 20 sources would round differently
    per summation order (the web_curation mean_score discipline), and
    the micro-round also absorbs any last-ulp pow() divergence between
    engines (α=0.5 additionally uses sqrt, which is IEEE-exact).
    Input is the per-source rollup relation (|sources| rows): this is
    driver-free column arithmetic on a broadcast-sized relation,
    whatever the corpus size behind the counts."""
    n = F.col(tokens_col).cast("double")
    w = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(alpha))
    t = token_counts.select(
        F.col(source_col), F.col(tokens_col).cast("long").alias("tokens"),
        F.round(w * 1000000.0, 0).cast("long").alias("__w"),
    )
    tot = t.agg(
        F.sum("tokens").alias("__total"), F.sum("__w").alias("__wsum")
    )
    budget = (
        F.lit(float(budget_tokens))
        if budget_tokens is not None
        else F.col("__total").cast("double")
    )
    return t.join(F.broadcast(tot)).select(
        source_col,
        "tokens",
        F.round(F.col("tokens") / F.col("__total"), 6).alias("natural_frac"),
        F.round(F.col("__w") / F.col("__wsum"), 6).alias("target_frac"),
        F.round(
            (F.col("__w") / F.col("__wsum")) * budget / F.col("tokens"), 6
        ).alias("repeat_factor"),
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    row draws `k` pseudo-random OTHER rows as negatives, reproducible
    across reruns/engines (md5 is the repo's portable hash — the same
    property deterministic_shuffle relies on).

    Construction: rows get a dense index 1..N (scale-safe
    global_rank, one range shuffle); negative j of a row is the row at
    index md5(id:seed:j) mod N (+1 collision-shift when it lands on
    the anchor itself, wrapping — never a self-pair). The negatives
    then resolve by an equi-join on the index.

    Scale shape: one range shuffle for the index, one k-way generator
    explode (bounded), one equi-join on an 8-byte index key. At 100 TB
    the join is the only corpus-sized exchange and it is uniform by
    construction (hash indexes). Output: (id, neg_rank, neg_id).
    """
    from .sort import global_rank

    idx = global_rank(
        df.select(F.col(id_col)), [F.col(id_col)], rank_col="_idx"
    )
    n_rows = idx.count()
    if n_rows < 2:
        return idx.select(
            F.col(id_col),
            F.lit(None).cast("int").alias("neg_rank"),
            F.lit(None).alias("neg_id"),
        ).limit(0)
    anchors = idx.select(
        F.col(id_col), F.col("_idx").alias("_own"),
        F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)])).alias(
            "neg_rank"
        ),
    )
    raw = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(f":{seed}:"),
                        F.col("neg_rank").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % n_rows
        + 1
    )
    # collision shift: an index equal to the anchor's own moves one
    # slot forward (wrapping) — identical arithmetic in the oracle
    tgt = F.when(raw == F.col("_own"), raw % n_rows + 1).otherwise(raw)
    want = anchors.select(
        F.col(id_col), "neg_rank", tgt.alias("_tgt")
    )
    others = idx.select(
        F.col("_idx").alias("_tgt"), F.col(id_col).alias("neg_id")
    )
    return want.join(others, "_tgt").select(id_col, "neg_rank", "neg_id")


def grouped_negative_samples(
    df: DataFrame,
    id_col: str,
    group_col: str,
    k: int = 4,
    seed: int = 7,
) -> DataFrame:
    """HARD negative sampling: negatives drawn from the anchor's OWN
    group (same registrable domain / topic cluster / source) — the
    in-domain negatives retrieval training wants, where random
    negatives are too easy. Same determinism contract as
    negative_samples (md5-indexed, reproducible across engines and
    resumes), but the index is per-group: negative j is the group row
    at offset 1 + (md5(id:seed:j) mod (n_g − 1)) AFTER the anchor,
    wrapping — an offset in [1, n_g−1] can never land on the anchor,
    so no collision shift is needed. Rows in singleton groups draw no
    negatives (no valid candidate).

    Scale shape: the per-group index is a window PARTITIONED by group
    (hash-partitioned rank, no global window; domain skew is bounded
    by the group sizes themselves), and negatives resolve by one
    equi-join on (group, idx). Output: (id, group, neg_rank, neg_id).
    """
    from pyspark.sql import Window

    wcnt = Window.partitionBy(group_col)
    idx = df.select(
        F.col(id_col),
        F.col(group_col).alias("_grp"),
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(
                F.md5(
                    F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
                ),
                id_col,
            )
        ).alias("_idx"),
        F.count("*").over(wcnt).alias("_ng"),
    )
    anchors = idx.filter(F.col("_ng") > 1).select(
        F.col(id_col), "_grp", "_idx", "_ng",
        F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)])).alias(
            "neg_rank"
        ),
    )
    off = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(f":{seed}:"),
                        F.col("neg_rank").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        % (F.col("_ng") - 1)
        + 1
    )
    tgt = (F.col("_idx") - 1 + off) % F.col("_ng") + 1
    want = anchors.select(
        F.col(id_col), "_grp", "neg_rank", tgt.alias("_tgt")
    )
    others = idx.select(
        F.col("_grp"), F.col("_idx").alias("_tgt"),
        F.col(id_col).alias("neg_id"),
    )
    return want.join(others, ["_grp", "_tgt"]).select(
        id_col, F.col("_grp").alias(group_col), "neg_rank", "neg_id"
    )


def fim_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rate: float = 0.5,
    seed: int = 42,
    pre_tok: str = "<|fim_pre|>",
    suf_tok: str = "<|fim_suf|>",
    mid_tok: str = "<|fim_mid|>",
) -> DataFrame:
    """Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    Training of Language Models to Fill in the Middle"): for a
    hash-chosen `rate` fraction of documents, pick two deterministic
    uniform cut points, split the text into prefix/middle/suffix, and
    re-emit in PSM order — prefix, SUFFIX, middle — with sentinel
    tokens, so an autoregressive LM learns infilling. The remaining
    documents pass through unchanged (the paper's joint objective).

    Everything is a pure function of (id, seed): the gate and both cut
    points come from uniform_unit over salted md5 keys, so a rerun,
    task retry, or different engine produces byte-identical output —
    the property a resumable 100 TB preprocessing job needs. Pure
    scan-local column expressions, zero shuffle.

    Output: (id, fim_applied, cut1, cut2, fim_text).
    """
    ln = F.length(F.col(text_col))
    u_gate = uniform_unit(
        F.concat(F.col(id_col).cast("string"), F.lit(f":fimg:{seed}"))
    )
    u1 = uniform_unit(
        F.concat(F.col(id_col).cast("string"), F.lit(f":fim1:{seed}"))
    )
    u2 = uniform_unit(
        F.concat(F.col(id_col).cast("string"), F.lit(f":fim2:{seed}"))
    )
    p1 = F.floor(F.least(u1, u2) * ln).cast("int")
    p2 = F.floor(F.greatest(u1, u2) * ln).cast("int")
    applied = (u_gate < F.lit(float(rate))).cast("int")
    prefix = F.col(text_col).substr(F.lit(1), p1)
    middle = F.col(text_col).substr(p1 + 1, p2 - p1)
    suffix = F.col(text_col).substr(p2 + 1, ln)
    fim = F.concat(
        F.lit(pre_tok), prefix, F.lit(suf_tok), suffix, F.lit(mid_tok), middle
    )
    return df.select(
        F.col(id_col),
        applied.alias("fim_applied"),
        F.when(applied == 1, p1).otherwise(F.lit(0)).alias("cut1"),
        F.when(applied == 1, p2).otherwise(F.lit(0)).alias("cut2"),
        F.when(applied == 1, fim).otherwise(F.col(text_col)).alias("fim_text"),
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    text_col: str,
    batch_size: int = 8,
    boundaries: tuple[int, ...] = (32, 64, 128, 256),
) -> DataFrame:
    """Length-bucketed batch assignment: group documents of similar
    token length into training batches so per-batch padding waste is
    bounded (the dynamic-batching / bucketed-batching idiom every
    sequence-training loader implements — here computed once, ahead of
    time, as data).

    bucket(b) = number of boundaries <= n_tokens; within a bucket,
    documents are ordered by (n_tokens, id) and chopped into
    consecutive batches of `batch_size`.

    Scale shape: the per-bucket ordering is NOT a per-bucket window
    (len(boundaries)+1 partitions would funnel the corpus through a
    handful of tasks). Instead ONE scale-safe global_rank over
    (bucket, n_tokens, id) — a balanced range shuffle — then the
    per-bucket offset is recovered by subtracting the bucket's min
    rank, a broadcast join against a |buckets|-row aggregate.

    Output: (id, n_tokens, bucket, batch_id, pos_in_batch).
    """
    from .sort import global_rank

    words = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda w: w != F.lit("")
    )
    n_tokens = F.size(words).alias("n_tokens")
    bucket = sum(
        (F.col("n_tokens") >= F.lit(b)).cast("int") for b in boundaries
    ).alias("bucket")
    t = df.select(F.col(id_col), n_tokens).select(
        id_col, "n_tokens", bucket
    )
    ranked = global_rank(
        t, [F.col("bucket"), F.col("n_tokens"), F.col(id_col)],
        rank_col="_grank",
    )
    from ..cache import tracked_persist
    # lazy: the broadcast(base) build below is the first consumer and
    # references ranked exactly once — it fills the cache before the
    # main stage's join side reads it (no sibling race; the old eager
    # count was one extra pass over the ranked relation)
    ranked = tracked_persist(ranked, eager=False)
    base = ranked.groupBy("bucket").agg(F.min("_grank").alias("_bmin"))
    pos0 = F.col("_grank") - F.col("_bmin")
    return ranked.join(F.broadcast(base), "bucket").select(
        id_col,
        "n_tokens",
        "bucket",
        F.floor(pos0 / F.lit(batch_size)).cast("int").alias("batch_id"),
        (pos0 % F.lit(batch_size)).cast("int").alias("pos_in_batch"),
    )


def best_of_cluster(
    df: DataFrame,
    cluster_col: str,
    quality_col: str,
    id_col: str,
) -> DataFrame:
    """Quality-aware cluster representative selection: instead of the
    keep-first-occurrence rule every dedup stage here defaults to
    (min id), keep the HIGHEST-QUALITY member of each duplicate
    cluster — the policy real curation pipelines prefer when a quality
    signal exists (drop the boilerplate-ridden copy, keep the clean
    one). Tie-break on min id for determinism.

    Scale shape: one hash shuffle on cluster_col; the per-cluster
    window is safe because duplicate clusters are small (bounded by
    copy count, not corpus size) and cluster-key cardinality is high.

    Output: (cluster, keeper, keeper_quality, n_members).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(cluster_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        df.select(
            F.col(cluster_col),
            F.col(quality_col),
            F.col(id_col),
            F.row_number().over(w).alias("_rn"),
            F.count("*").over(Window.partitionBy(cluster_col)).alias(
                "n_members"
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            F.col(cluster_col).alias("cluster"),
            F.col(id_col).alias("keeper"),
            F.col(quality_col).alias("keeper_quality"),
            "n_members",
        )
    )


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    id_col: str,
    content_col: str,
) -> DataFrame:
    """Corpus snapshot diff — the ops query behind every incremental
    recrawl/reprocess decision: full-outer join two snapshots on the
    document key and classify each id as ADDED (new only), REMOVED
    (old only), CHANGED (both, content hash differs), or SAME. The
    16-byte md5 content key travels through the shuffle instead of
    the document bodies, so the diff of a 100 TB corpus moves
    O(ids + hashes), not O(text).

    Output: (id, status)."""
    # coalesce before hashing: md5(NULL) is NULL, which would
    # misclassify a both-sides row as ADDED/REMOVED and make
    # incremental_recompute silently drop it (review-r6 finding).
    # NULL and '' content therefore compare equal — documented.
    o = old_df.select(
        F.col(id_col),
        F.md5(F.coalesce(F.col(content_col), F.lit(""))).alias("_oh"),
    )
    n = new_df.select(
        F.col(id_col),
        F.md5(F.coalesce(F.col(content_col), F.lit(""))).alias("_nh"),
    )
    j = o.join(n, id_col, "full_outer")
    return j.select(
        F.col(id_col),
        F.when(F.col("_oh").isNull(), F.lit("ADDED"))
        .when(F.col("_nh").isNull(), F.lit("REMOVED"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("CHANGED"))
        .otherwise(F.lit("SAME"))
        .alias("status"),
    )


def incremental_recompute(
    old_df: DataFrame,
    new_df: DataFrame,
    old_derived: DataFrame,
    id_col: str,
    content_col: str,
    derive,
) -> DataFrame:
    """Diff-driven incremental recomputation — the ops pattern that
    makes a 100 TB derived table maintainable: `derive` (a
    DataFrame -> DataFrame metric over (id, content)) is re-run ONLY
    for documents the snapshot diff classifies ADDED or CHANGED;
    SAME rows carry their previously computed `old_derived` values
    forward untouched; REMOVED rows drop out. On a recrawl that
    touches 1% of the corpus, 99% of the derive cost (the expensive
    part — quality models, chunking, fingerprints) is skipped, and
    the result is provably identical to a full recompute (the
    oracle-checked contract of `incremental_recompute` in
    queries_llm).

    Output: old_derived's columns + `recomputed` (int 1 where derive
    actually ran). The diff itself moves only 16-byte content hashes
    (see snapshot_diff)."""
    from ..cache import tracked_persist

    # persist the (id, status) diff: it feeds BOTH branches below, and
    # without the persist each branch re-executes the full-outer md5
    # join — two extra full scans of both corpora, the exact cost this
    # function exists to avoid (review-r6 finding). Released by the
    # caller via cache.release_all().
    diff = tracked_persist(
        snapshot_diff(old_df, new_df, id_col, content_col)
    )
    changed_ids = diff.filter(F.col("status").isin("ADDED", "CHANGED"))
    same_ids = diff.filter(F.col("status") == "SAME")
    fresh = derive(
        new_df.join(changed_ids.select(id_col), id_col, "left_semi")
    ).withColumn("recomputed", F.lit(1))
    carried = old_derived.join(
        same_ids.select(id_col), id_col, "left_semi"
    ).withColumn("recomputed", F.lit(0))
    return carried.unionByName(fresh)

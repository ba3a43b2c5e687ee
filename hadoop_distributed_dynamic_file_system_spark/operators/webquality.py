"""Web-corpus quality heuristics for LLM training-data curation:
Gopher quality rules, Gopher repetition statistics, C4-style line
filters, corpus-level line dedup, and DSIR-style importance weights.

Public sources these implement (papers only — no code consulted):
- Rae et al. 2021, "Scaling Language Models: ... Gopher", Appendix A
  (quality and repetition filter definitions);
- Raffel et al. 2020, "Exploring the Limits of Transfer Learning"
  (C4's line-level cleaning: short lines, boilerplate lines, global
  line dedup);
- Xie et al. 2023, "Data Selection for Language Models via Importance
  Resampling" (DSIR: hashed-n-gram importance weights
  log p_target - log p_background).

Reference parity: the reference engine's text pipeline stops at
grep/tokenize (src/examples/.../Grep.java,
src/contrib/index/.../mapred/*); these operators are the ⊕ additive
LLM-curation family built on the same scan→explode→agg plan shapes.

Scale notes (100 TB):
- every operator is one or two shuffles over token- or line-sized
  relations, linear in corpus size; no pairwise stage anywhere;
- per-doc metrics (gopher_quality, repetition stats) are pure
  projections + higher-order array functions — zero shuffle, stay in
  whole-stage codegen, pushdown-friendly;
- line_dedup_global shuffles 8-byte xxhash64 line keys (never line
  text) — same key-width discipline as the LSH/ngram joins;
- dsir_importance's model side (bucket count tables) is
  vocabulary-bucket sized (constant B rows) and broadcast to the
  corpus scan; the corpus is scanned once, shuffled once per count
  table build, once for the doc score groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's "must contain >= 2 of" stop-word list (Rae et al. App. A).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _words_of(text: Column) -> Column:
    """Lowered ASCII-whitespace tokens — same rule as textanalysis._words."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def _lines_of(text: Column) -> Column:
    return F.split(text, "\n")


def gopher_quality(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    keep_doc_cols: bool = False,
) -> DataFrame:
    """Per-document Gopher quality metrics + rule flags + overall pass.

    `keep_doc_cols=True` returns the ORIGINAL columns alongside the
    metrics instead of the narrow (id, metrics) projection — a caller
    gating a corpus can then FILTER in the same single pass instead of
    joining the metric relation back onto the corpus (one scan + one
    join fewer; the metrics stay a pure projection either way).

    Metrics/thresholds per Rae et al. 2021 Appendix A: word count in
    [min_words, max_words]; mean word length in [3, 10]; symbol-to-word
    ratio ('#' or '...') < 0.1; < 90% of lines bullet-started; < 30%
    of lines ellipsis-ended; >= 80% of words contain an alphabetic
    character; >= 2 distinct Gopher stop words present.

    Pure projection — no shuffle; all metrics are higher-order array
    functions over one tokenization, so the whole operator is a single
    codegen stage over the scan."""
    words = _words_of(F.col(text_col))
    lines = _lines_of(F.col(text_col))
    d = df.withColumn("_w", words).withColumn("_l", lines)
    n_words = F.size("_w")
    # try_divide everywhere n_words is the denominator: an empty or
    # whitespace-only document has ZERO words, and under ANSI mode a
    # plain `/` raises DIVIDE_BY_ZERO mid-scan — the metrics become
    # NULL and `passes` coalesces to false instead
    mean_wl = F.try_divide(
        F.aggregate("_w", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)),
        n_words,
    )
    n_hash = (
        F.length(text_col) - F.length(F.regexp_replace(text_col, r"#", ""))
    )
    n_ellipsis = F.floor(
        (
            F.length(text_col)
            - F.length(F.regexp_replace(text_col, r"\.\.\.", ""))
        )
        / 3
    )
    symbol_ratio = F.try_divide(n_hash + n_ellipsis, n_words)
    alpha_frac = F.try_divide(
        F.size(F.filter("_w", lambda w: w.rlike("[a-z]"))), n_words
    )
    bullet_frac = F.size(
        F.filter("_l", lambda l: F.trim(l).rlike(r"^[-*•]"))
    ) / F.size("_l")
    ellipsis_frac = F.size(
        F.filter("_l", lambda l: l.rlike(r"(\.\.\.|…)$"))
    ) / F.size("_l")
    stop_hits = sum(
        F.array_contains("_w", s).cast("int") for s in GOPHER_STOPWORDS
    )
    out = (
        d.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len", F.round(mean_wl, 6))
        .withColumn("symbol_ratio", F.round(symbol_ratio, 6))
        .withColumn("alpha_frac", F.round(alpha_frac, 6))
        .withColumn("bullet_frac", F.round(bullet_frac, 6))
        .withColumn("ellipsis_frac", F.round(ellipsis_frac, 6))
        .withColumn("stop_hits", stop_hits.cast("long"))
    )
    passes = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(3, 10)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("bullet_frac") < 0.9)
        & (F.col("ellipsis_frac") < 0.3)
        & (F.col("alpha_frac") > 0.8)
        & (F.col("stop_hits") >= 2)
    )
    out = out.withColumn("passes", F.coalesce(passes, F.lit(False)))
    if keep_doc_cols:
        return out.drop("_w", "_l")
    return out.select(
        id_col,
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_frac",
        "bullet_frac",
        "ellipsis_frac",
        "stop_hits",
        "passes",
    )


def duplicate_line_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Within-document duplicate-line statistics (Gopher repetition
    rules): fraction of line OCCURRENCES beyond the first of their
    content (dup_line_frac) and the char-weighted same
    (dup_line_char_frac). Gopher drops docs with dup_line_frac > 0.30
    or dup_line_char_frac > 0.20.

    Plan: posexplode lines, groupBy (doc, line) for counts, groupBy
    doc for the two fractions — two shuffles on (doc_id, line) keys,
    linear in total lines."""
    lines = (
        df.select(F.col(id_col), F.explode(_lines_of(F.col(text_col))).alias("_line"))
        .groupBy(id_col, "_line")
        .agg(F.count("*").alias("_cnt"))
    )
    return lines.groupBy(id_col).agg(
        F.sum("_cnt").cast("long").alias("n_lines"),
        F.round(
            (F.sum("_cnt") - F.count("*")) / F.sum("_cnt"), 6
        ).alias("dup_line_frac"),
        # try_divide: a document whose every line is empty has zero
        # line characters — NULL char-fraction, not an ANSI crash
        F.round(
            F.try_divide(
                F.sum((F.col("_cnt") - 1) * F.length("_line")),
                F.sum(F.col("_cnt") * F.length("_line")),
            ),
            6,
        ).alias("dup_line_char_frac"),
    )


def top_ngram_char_fraction(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-document fraction of characters covered by the single most
    frequent word n-gram (Gopher repetition rule: e.g. top-2-gram
    char fraction > 0.20 drops the doc). Coverage is occurrence-
    weighted: freq * len(gram) / len(doc) — the standard Gopher
    statistic. Ties break on the lexicographically smallest gram.

    Plan: explode n-grams, count per (doc, gram), per-doc argmax via
    max_by — two shuffles keyed by doc (+gram), linear in tokens."""
    from .dedup import exploded_shingles

    grams = (
        exploded_shingles(df, id_col, text_col, n=n)
        .groupBy(id_col, "sh")
        .agg(F.count("*").alias("_cnt"))
    )
    doc_len = df.select(F.col(id_col), F.length(text_col).alias("_len"))
    # argmax on count with tie -> lexicographically SMALLEST gram:
    # max_by with a (cnt, sh) struct orderer would break ties to the
    # LARGEST sh, so use the window-free double agg instead — max cnt
    # per doc, then min sh among grams at that count. Both aggs are
    # doc-keyed; the join is on the (already doc-partitioned) key.
    mx = grams.groupBy(id_col).agg(F.max("_cnt").alias("_mx"))
    top = (
        grams.join(mx, id_col)
        .filter(F.col("_cnt") == F.col("_mx"))
        .groupBy(id_col, "_mx")
        .agg(F.min("sh").alias("top_gram"))
    )
    return (
        top.join(doc_len, id_col)
        .select(
            F.col(id_col),
            "top_gram",
            F.round(
                F.col("_mx") * F.length("top_gram") / F.col("_len"), 6
            ).alias("top_char_frac"),
        )
    )


def dup_ngram_char_fraction(
    df: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """Per-document fraction of characters in REPEATED word n-grams
    (Gopher rule family for n=5..10). Occurrence-weighted
    approximation: chars of occurrences beyond the first of each gram
    / chars of all occurrences — Gopher's exact statistic de-overlaps
    character spans (suffix-array machinery); this one-pass fold is
    the standard filter-stage approximation and is monotone in the
    same signal.

    Two shuffles on (doc, gram) then doc — linear in tokens."""
    from .dedup import exploded_shingles

    grams = (
        exploded_shingles(df, id_col, text_col, n=n)
        .groupBy(id_col, "sh")
        .agg(F.count("*").alias("_cnt"))
    )
    return grams.groupBy(id_col).agg(
        F.round(
            F.sum((F.col("_cnt") - 1) * F.length("sh"))
            / F.sum(F.col("_cnt") * F.length("sh")),
            6,
        ).alias("dup_char_frac")
    )


def c4_line_filters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words_per_line: int = 5,
    badwords: tuple[str, ...] = ("javascript",),
    require_terminal_punct: bool = False,
) -> DataFrame:
    """C4-style per-line cleaning (Raffel et al. 2020): drop lines
    shorter than `min_words_per_line` words, lines containing any
    `badwords` substring, and (optionally) lines not ending in
    terminal punctuation. Returns (id, n_lines, n_kept, cleaned) with
    kept lines re-joined in order.

    Zero shuffle: the line filter is a higher-order array `filter`
    over the split — order-preserving, no explode, whole operator is
    one codegen projection over the scan."""
    lines = _lines_of(F.col(text_col))

    def keep(line: Column) -> Column:
        n_words = F.size(F.filter(F.split(line, r"\s+"), lambda w: w != ""))
        cond = n_words >= min_words_per_line
        for bw in badwords:
            cond = cond & ~F.contains(F.lower(line), F.lit(bw))
        if require_terminal_punct:
            cond = cond & line.rlike(r'[.!?"]\s*$')
        return cond

    kept = F.filter(lines, keep)
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, "\n").alias("cleaned"),
    )


def line_dedup_global(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-level line dedup (the C4 "three-sentence span" rule in
    its line form): every distinct line is kept only at its FIRST
    occurrence in (doc, position) order; later occurrences anywhere in
    the corpus are removed. Returns (id, n_lines, n_kept, cleaned);
    docs whose every line was seen earlier come back with cleaned=''.

    Plan: posexplode lines → global min_by over an 8-byte xxhash64
    line key (line TEXT never shuffles in the winner-election agg) →
    self-join occurrences to winners on (key, doc, pos) → per-doc
    ordered re-assembly via sort_array(collect_list(struct(pos,
    line))). Three shuffles, all keyed by hash or doc id — linear in
    total lines, no pairwise stage; 64-bit key collisions would drop a
    colliding line (P ≈ n²/2⁶⁵ — the standing hashed-key trade)."""
    occ = df.select(
        F.col(id_col),
        F.posexplode(_lines_of(F.col(text_col))).alias("_pos", "_line"),
    ).withColumn("_k", F.xxhash64("_line"))
    winners = occ.groupBy("_k").agg(
        F.min(F.struct(F.col(id_col).alias("_d"), F.col("_pos").alias("_p"))).alias(
            "_first"
        )
    )
    kept = occ.join(winners, "_k").filter(
        (F.col(id_col) == F.col("_first._d")) & (F.col("_pos") == F.col("_first._p"))
    )
    per_doc = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_line")))
                ),
                lambda s: s.getField("_line"),
            ),
            "\n",
        ).alias("cleaned"),
    )
    totals = df.select(
        F.col(id_col), F.size(_lines_of(F.col(text_col))).cast("long").alias("n_lines")
    )
    return totals.join(per_doc, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("cleaned", F.lit("")).alias("cleaned"),
    )


def dsir_bucket_weights(
    df: DataFrame,
    text_col: str,
    target: DataFrame | None = None,
    text_col_target: str | None = None,
    buckets: int = 1024,
    target_flag: Column | None = None,
) -> DataFrame:
    """(b, w) naive-Bayes weight relation: per hashed-unigram-bucket
    log-likelihood ratio ln p_target(b) - ln p_raw(b) (add-one
    smoothed), one row per bucket OBSERVED IN `df` — which covers
    every bucket any `df` document can activate, so a scorer that
    left-joins this relation never needs a fallback for raw-corpus
    docs. This is the model `classifier.quality_classifier_scores`
    consumes directly (NB-weighted linear scoring ≈ the fasttext
    quality-classifier stage without a gradient step).

    Two input forms: `target` as a separate DataFrame (two corpus
    passes — target counts, raw counts), or, when the target is a
    SUBSET of `df` selectable by a boolean column expression,
    `target_flag` (ONE corpus pass: both count columns ride the same
    explode+groupBy, guide §1.2-1). The fused form is exact: a bucket
    unseen in the target carries tc = 0 and ln((0+1)/(tt+B)) is
    bit-identical to the two-pass form's coalesce floor
    ln(1/(tt+B))."""

    def bucket(w: Column) -> Column:
        return F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("long") % buckets

    from ..cache import tracked_persist

    if (target is None) == (target_flag is None):
        raise ValueError(
            "dsir_bucket_weights: pass exactly one of target / target_flag"
        )

    if target_flag is not None:
        # fused single pass: the raw and target bucket counts come out
        # of ONE explode+groupBy (the flag rides each token row as a
        # 0/1; NULL flags count as non-target, matching a filter).
        # Persisted: the relation feeds its two total aggregates AND
        # the weight projection, and is <= `buckets` rows.
        stats = tracked_persist(
            df.select(
                F.explode(_words_of(F.col(text_col))).alias("_w"),
                F.when(target_flag, 1).otherwise(0).alias("_t"),
            )
            .select(bucket(F.col("_w")).alias("b"), "_t")
            .groupBy("b")
            .agg(
                F.count("*").alias("_rc"),
                F.sum("_t").alias("_tc"),
            )
        )
        tt = stats.agg(F.sum("_tc").alias("_tt"))
        rt = stats.agg(F.sum("_rc").alias("_tr"))
        return (
            stats.crossJoin(F.broadcast(tt))
            .crossJoin(F.broadcast(rt))
            .select(
                "b",
                (
                    F.log((F.col("_tc") + 1) / (F.col("_tt") + buckets))
                    - F.log((F.col("_rc") + 1) / (F.col("_tr") + buckets))
                ).alias("w"),
            )
        )

    tcol = text_col_target or text_col

    def counts(src: DataFrame, col: str) -> DataFrame:
        return (
            src.select(F.explode(_words_of(F.col(col))).alias("_w"))
            .select(bucket(F.col("_w")).alias("b"))
            .groupBy("b")
            .agg(F.count("*").alias("_c"))
        )

    # each count relation feeds its total aggregate AND the weight
    # join — unpersisted, every corpus explode+groupBy ran TWICE
    # (four corpus passes per model build instead of two; the same
    # fix dsir_importance already carries). The relations are
    # <= `buckets` rows, so the cache is constant-sized at any scale.
    tb = tracked_persist(counts(target, tcol))
    rb = tracked_persist(counts(df, text_col))
    tt = tb.agg(F.sum("_c").alias("_tt"))
    rt = rb.agg(F.sum("_c").alias("_tr"))
    return (
        rb.withColumnRenamed("_c", "_rc")
        .join(F.broadcast(tb.withColumnRenamed("_c", "_tc")), "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select(
            "b",
            (
                F.coalesce(
                    F.log((F.col("_tc") + 1) / (F.col("_tt") + buckets)),
                    F.log(1.0 / (F.col("_tt") + buckets)),
                )
                - F.log((F.col("_rc") + 1) / (F.col("_tr") + buckets))
            ).alias("w"),
        )
    )


def dsir_importance(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame | None = None,
    text_col_target: str | None = None,
    buckets: int = 1024,
    target_flag: Column | None = None,
) -> DataFrame:
    """DSIR importance weight per document (Xie et al. 2023): score =
    Σ_tokens [ln p_target(b(w)) - ln p_raw(b(w))] over hashed unigram
    buckets with add-one smoothing, where p_raw is the model of `df`
    itself. Positive scores read "more target-like"; importance
    resampling keeps docs with probability ∝ exp(score).

    The bucket hash is md5-based (first 4 hex digits mod `buckets`) so
    the SQL oracle reproduces it digit-for-digit; at 100 TB swap for
    xxhash64 & (buckets-1) — the model side is a constant-`buckets`-row
    relation either way, broadcast to the scoring scan. The corpus
    pays EXACTLY one explode+groupBy per model build and one for the
    score: the bucket-count relations persist (B rows) and the token
    totals derive from them — an earlier form re-exploded the corpora
    for the totals, five corpus passes instead of three."""
    from ..cache import tracked_persist

    tcol = text_col_target or text_col

    def bucket(w: Column) -> Column:
        return F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("long") % buckets

    if (target is None) == (target_flag is None):
        raise ValueError(
            "dsir_importance: pass exactly one of target / target_flag"
        )

    if target_flag is not None:
        # fused single-pass model build (same move as
        # dsir_bucket_weights' target_flag form): when the target is a
        # flaggable SUBSET of `df`, both bucket-count columns ride one
        # explode+groupBy — TWO corpus passes total (model + score)
        # instead of three. Exact: an unseen-target bucket carries
        # tc = 0 and ln((0+1)/(tt+B)) equals the two-pass coalesce
        # floor ln(1/(tt+B)) bit for bit.
        stats = tracked_persist(
            df.select(
                F.explode(_words_of(F.col(text_col))).alias("_w"),
                F.when(target_flag, 1).otherwise(0).alias("_t"),
            )
            .select(bucket(F.col("_w")).alias("_b"), "_t")
            .groupBy("_b")
            .agg(F.count("*").alias("_rc"), F.sum("_t").alias("_tc"))
        )
        tot_t = stats.agg(F.sum("_tc").alias("_tt"))
        tot_r = stats.agg(F.sum("_rc").alias("_tr"))
        occ = df.select(
            F.col(id_col), F.explode(_words_of(F.col(text_col))).alias("_w")
        ).select(F.col(id_col), bucket(F.col("_w")).alias("_b"))
        scored = (
            occ.join(F.broadcast(stats), "_b")  # every occ bucket is in stats
            .crossJoin(F.broadcast(tot_t))
            .crossJoin(F.broadcast(tot_r))
            .select(
                F.col(id_col),
                (
                    F.log((F.col("_tc") + 1) / (F.col("_tt") + buckets))
                    - F.log((F.col("_rc") + 1) / (F.col("_tr") + buckets))
                ).alias("_llr"),
            )
        )
        return scored.groupBy(id_col).agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(F.avg("_llr"), 6).alias("avg_llr"),
        )

    def counts(src: DataFrame, col: str) -> DataFrame:
        return tracked_persist(
            src.select(F.explode(_words_of(F.col(col))).alias("_w"))
            .select(bucket(F.col("_w")).alias("_b"))
            .groupBy("_b")
            .agg(F.count("*").alias("_c"))
        )

    cnt_t = counts(target, tcol)
    cnt_r = counts(df, text_col)

    def model(cnt: DataFrame, lp_name: str) -> DataFrame:
        total = cnt.agg(F.sum("_c").alias("_tot"))
        return cnt.crossJoin(F.broadcast(total)).select(
            "_b",
            F.log((F.col("_c") + 1) / (F.col("_tot") + buckets)).alias(lp_name),
        )

    lp_t = model(cnt_t, "_lp_t")
    lp_r = model(cnt_r, "_lp_r")
    # unseen buckets in either model fall back to the smoothing floor
    # ln(1/(tot+B)), realized via left joins + coalesce with the floor
    # computed from the (broadcast) token totals — both totals are
    # aggregates of the persisted count relations, not corpus rescans
    occ = df.select(
        F.col(id_col), F.explode(_words_of(F.col(text_col))).alias("_w")
    ).select(F.col(id_col), bucket(F.col("_w")).alias("_b"))
    tot_t = cnt_t.agg(F.sum("_c").alias("_tt"))
    tot_r = cnt_r.agg(F.sum("_c").alias("_tr"))
    scored = (
        occ.join(F.broadcast(lp_t), "_b", "left")
        .join(F.broadcast(lp_r), "_b", "left")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            F.col(id_col),
            (
                F.coalesce("_lp_t", F.log(1.0 / (F.col("_tt") + buckets)))
                - F.coalesce("_lp_r", F.log(1.0 / (F.col("_tr") + buckets)))
            ).alias("_llr"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.avg("_llr"), 6).alias("avg_llr"),
    )


def host_boilerplate_removal(
    df: DataFrame,
    id_col: str,
    text_col: str,
    host_col: str,
    *,
    frac: float = 0.3,
    min_docs: int = 5,
) -> DataFrame:
    """Host-level boilerplate strip (CCNet §3 / trafilatura idea at
    corpus scale): a line is template chrome — nav bars, cookie
    banners, footers — when it recurs across MORE than `frac` of a
    host's documents (hosts with fewer than `min_docs` docs are left
    untouched: no denominator, no signal). Boilerplate lines are
    removed from every document of that host; organic lines keep
    their order. Returns (id, host, n_lines, n_kept, n_boiler,
    cleaned).

    Plan: lines posexplode once; the per-host line-support relation
    groups on (host, xxhash64(line)) — 8-byte keys plus the host
    string, never line text; host doc counts broadcast (one row per
    host); the boilerplate verdict joins back on the same hashed key.
    Linear in total lines at any corpus size — the relation that
    could blow up (distinct lines per host) is bounded by the data
    itself and only its KEYS shuffle. Reference parity: per-record
    Mapper cleanup (src/examples Grep idiom) has no corpus-global
    analog — this is genuinely new capability the reference lacks.
    """
    occ = df.select(
        F.col(id_col),
        F.col(host_col).alias("_host"),
        F.posexplode(_lines_of(F.col(text_col))).alias("_pos", "_line"),
    ).withColumn("_k", F.xxhash64("_line"))
    boiler = host_boilerplate_index(
        df, id_col, text_col, host_col, frac=frac, min_docs=min_docs
    ).select("_host", "_k", F.lit(True).alias("_boiler"))
    kept = occ.join(boiler, ["_host", "_k"], "left").filter(
        F.col("_boiler").isNull()
    )
    per_doc = kept.groupBy(id_col).agg(
        F.first("_host").alias("_h2"),
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_pos"), F.col("_line")))
                ),
                lambda s: s.getField("_line"),
            ),
            "\n",
        ).alias("cleaned"),
    )
    totals = df.select(
        F.col(id_col),
        F.col(host_col).alias("host"),
        F.size(_lines_of(F.col(text_col))).cast("long").alias("n_lines"),
    )
    return totals.join(per_doc, id_col, "left").select(
        id_col,
        "host",
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
        .cast("long")
        .alias("n_boiler"),
        F.coalesce("cleaned", F.lit("")).alias("cleaned"),
    )


def host_boilerplate_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    host_col: str,
    *,
    frac: float = 0.3,
    min_docs: int = 5,
) -> DataFrame:
    """The frozen boilerplate-line index: (_host, _k) rows for every
    line whose per-host document support exceeds `frac` on hosts with
    >= min_docs docs — the relation host_boilerplate_removal elects
    and the streaming gate (streaming/events.streaming_boilerplate_
    gate) consumes as a STATIC side. Persist this at index-build time;
    it is |template lines|-sized, tiny next to the corpus."""
    occ = df.select(
        F.col(id_col),
        F.col(host_col).alias("_host"),
        F.explode(_lines_of(F.col(text_col))).alias("_line"),
    ).withColumn("_k", F.xxhash64("_line"))
    host_docs = df.groupBy(F.col(host_col).alias("_host")).agg(
        F.countDistinct(id_col).alias("_hdocs")
    )
    support = occ.groupBy("_host", "_k").agg(
        F.countDistinct(id_col).alias("_support")
    )
    return (
        support.join(F.broadcast(host_docs), "_host")
        .filter(
            (F.col("_hdocs") >= min_docs)
            & (F.col("_support") > F.lit(frac) * F.col("_hdocs"))
        )
        .select("_host", "_k")
    )

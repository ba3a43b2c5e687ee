"""Text analysis for training-data curation: language-ID, quality
scoring, token counting, document fingerprinting.

Additive over the reference (its only text kernels are regex match and
whitespace tokenize, mapred/lib/RegexMapper.java / TokenCountMapper.java
— these operators compose them into curation primitives). Everything
is built-in expressions: at 100 TB these run embarrassingly parallel
inside whole-stage codegen with zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist

# Tiny per-language stopword sets for the n-gram/stopword heuristic.
# Deliberately small + deterministic (the oracle replicates them).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "en"],
}
LANGS = sorted(STOPWORDS)  # deterministic argmax order


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")


def _with_words(df: DataFrame, text_col: str) -> DataFrame:
    """Tokenize ONCE behind a projection boundary. Derived columns then
    reference the bound `_words` attribute; inlining the split into
    every consumer re-tokenizes per reference (CollapseProject won't
    inline a non-cheap alias used more than once — that boundary is the
    optimization)."""
    return df.withColumn("_words", _words(F.col(text_col)))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio (Column form; for data paths use
    detect_language_df, which tokenizes once)."""
    words = _words(text)

    def in_set(sw):
        # closure factory — a default-arg lambda would become arity-2
        # and PySpark would bind the array index to the second param
        return lambda w: F.array_contains(sw, w)

    out = {}
    for lang in LANGS:
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        hits = F.size(F.filter(words, in_set(sw)))
        out[lang] = hits / F.greatest(F.size(words), F.lit(1))
    return out


def detect_language(text: Column) -> Column:
    """Argmax language by stopword ratio; 'und' (undetermined) when no
    stopword hits at all. Ties break by language-name order."""
    scores = lang_scores(text)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang in LANGS:  # later languages must BEAT (not tie) earlier ones
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def detect_language_df(
    df: DataFrame, text_col: str, out_col: str = "lang_pred"
) -> DataFrame:
    """DataFrame form of detect_language with two projection barriers:
    words computed once, per-language scores computed once each — the
    Column form nests each score expression into the argmax when-chain
    (and the chain into itself), duplicating work exponentially in the
    language count."""
    words_df = _with_words(df, text_col)
    w = F.col("_words")
    score_cols = {}
    for lang in LANGS:
        sw = F.array(*[F.lit(x) for x in STOPWORDS[lang]])
        hits = F.size(F.filter(w, (lambda s: lambda x: F.array_contains(s, x))(sw)))
        score_cols[f"_s_{lang}"] = hits / F.greatest(F.size(w), F.lit(1))
    scored = words_df.withColumns(score_cols)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang in LANGS:
        s = F.col(f"_s_{lang}")  # attribute ref — cheap to repeat
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return scored.withColumn(out_col, best_lang).drop("_words", *score_cols)


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Heuristic quality features: length, word stats, punct/stopword
    ratios — the usual pre-training filter signals. Tokenizes once
    behind a projection boundary (see _with_words)."""
    text = F.col(text_col)
    words = F.col("_words")
    n_words = F.size(words)
    n_chars = F.length(text)
    en_sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    sw_hits = F.size(F.filter(words, lambda w: F.array_contains(en_sw, w)))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    mean_wlen = F.round(
        F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
        / F.greatest(n_words, F.lit(1)).cast("double"),
        6,
    )
    return _with_words(df, text_col).withColumns(
        {
            "n_chars": n_chars.cast("bigint"),
            "n_words": n_words.cast("bigint"),
            "mean_word_len": mean_wlen,
            "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)).cast("double"), 6),
            "stopword_ratio": F.round(sw_hits / F.greatest(n_words, F.lit(1)).cast("double"), 6),
        }
    ).drop("_words")


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Composite 0..1 quality score from the features (monotone,
    deterministic; thresholds are curation knobs, not learned)."""
    feat = quality_features(df, text_col)
    score = (
        F.when(F.col("n_words") >= 5, 0.25).otherwise(0.0)
        + F.when((F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12), 0.25).otherwise(0.0)
        + F.when(F.col("punct_ratio") <= 0.2, 0.25).otherwise(0.0)
        + F.when(F.col("stopword_ratio") >= 0.05, 0.25).otherwise(0.0)
    )
    return feat.withColumn("quality", F.round(score, 2))


def token_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace token count + BPE-ish subword count (letter runs,
    digit runs, single punctuation — the GPT-2 pre-tokenizer shape)."""
    text = F.col(text_col)
    ws = F.size(_words(text))
    bpe = F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), F.lit(0)))
    return df.withColumns(
        {"ws_tokens": ws.cast("bigint"), "bpe_tokens": bpe.cast("bigint")}
    )


def fingerprint(df: DataFrame, text_col: str, out_col: str = "fingerprint") -> DataFrame:
    """Normalized-content fingerprint: lowercase, collapse whitespace,
    md5. (The reference's digest kernel is io/MD5Hash.java.)"""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.md5(norm))


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_tokens: int = 128,
    overlap: int = 16,
    lowercase: bool = True,
) -> DataFrame:
    """Sliding-window token chunking — the context-window prep step of
    a training/RAG pipeline (split each document into chunks of at most
    `max_tokens` whitespace tokens, consecutive chunks sharing
    `overlap` tokens). Pure column expressions: tokenize once behind
    the projection boundary, generate chunk starts with `sequence`
    (0, stride, 2·stride … < n_tokens), posexplode, slice the bound
    token array — no Python, no shuffle, chunking is scan-local and
    the output is ~(1 + overlap/stride)× the input in tokens. Zero-
    token documents emit no chunks.

    `lowercase=True` (default) tokenizes with the module's `_words`
    rule — lower + ASCII-whitespace split — so chunk_text is CASE-
    FOLDED, consistent with every other operator in this family and
    with the DuckDB oracles; pass lowercase=False to preserve the
    original casing (same split, no fold) when chunks must remain
    verbatim text. Reference parity: the fixed-size record
    re-blocking idea of NLineInputFormat
    (src/mapred/.../lib/NLineInputFormat.java) applied at token
    granularity."""
    if not 0 <= overlap < max_tokens:
        raise ValueError(f"need 0 <= overlap({overlap}) < max_tokens({max_tokens})")
    stride = max_tokens - overlap
    if lowercase:
        bound = _with_words(df, text_col)
    else:
        bound = df.withColumn(
            "_words",
            F.filter(
                F.split(F.col(text_col), r"\s+"), lambda w: w != ""
            ),
        )
    n = F.size("_words")
    starts = F.sequence(F.lit(0), n - 1, F.lit(stride))
    exploded = bound.filter(n > 0).select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "_start"),
        F.col("_words"),
    )
    chunk = F.slice(F.col("_words"), F.col("_start") + 1, max_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.col("_start").cast("bigint").alias("start_token"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query
    terms — the lexical-retrieval scorer (decontamination lookups, RAG
    candidate generation) the reference delegated to Lucene
    (src/contrib/index). idf is the Robertson–Spärck Jones '+1' form
    (ln(1 + (N − df + ½)/(df + ½)), always positive — Lucene's
    convention); score(d) = Σ_t idf·tf·(k1+1)/(tf + k1·(1 − b +
    b·dl/avgdl)).

    Scale shape: the query-term filter lands BEFORE the tf groupBy, so
    the only shuffled rows are postings of the |Q| query terms — at
    100 TB the shuffle is proportional to the hit set, not the corpus;
    corpus stats (N, avgdl) and the |Q|-row df table ride broadcasts.
    Scores are rounded 6dp (per-doc sums are ≤|Q| terms, far inside
    the rounding unit)."""
    bound = _with_words(df, text_col)
    stats = bound.agg(
        F.count("*").alias("__n"),
        F.avg(F.size("_words")).alias("__avgdl"),
    )
    # tf feeds BOTH the df count and the scoring join — deliberately
    # WITHOUT a persist. A/B-measured (round 11, sf0.1): no-persist
    # 0.78-0.91 s, lazy tracked_persist 1.11-1.28 s, eager 1.25-1.4 s
    # — the duplicate explode+filter subtree is a cheap scan of the
    # (post-pushdown) corpus, while any cache pays InMemoryRelation
    # materialization (+ a count job when eager) on the hot path.
    # This is NOT the lsh_candidate_pairs situation (a wide self-join
    # whose unpersisted sides re-run a 4-stage funnel); don't "fix"
    # it into one. At true 100 TB corpus scale, drop the third scan
    # by maintaining (N, avgdl) incrementally (moment_stats) rather
    # than by caching postings.
    tf = (
        bound.select(
            F.col(id_col),
            F.size("_words").alias("dl"),
            F.explode("_words").alias("term"),
        )
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
    )
    return (
        tf.join(F.broadcast(dfc), "term")
        .join(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(idf * tf_part), 6).alias("bm25"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
    )


def term_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, term, tf) from whitespace tokens — the shared base of the
    tf-idf and inverted-index builders. One explode + one groupBy."""
    return (
        _with_words(df, text_col)
        .select(F.col(id_col), F.explode("_words").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Top-k characteristic terms per document by tf-idf
    (tf * ln(N/df)). The Spark-first rendering of what the reference
    delegated to Lucene index scoring (SURVEY §2: contrib/index is a
    declared non-target; the similarity/text family is the analog).

    Shuffles: explode->tf groups on (doc, term); df groups on term;
    the tf⋈df join reuses the term partitioning; top-k per doc is a
    window partitioned by doc. The only broadcast is the 1-row corpus
    count. Scores are rounded 6dp BEFORE ranking so the cut is stable
    under float noise, with the term string as tiebreak."""
    from pyspark.sql import Window

    if tf is None:
        tf = tracked_persist(term_frequencies(df, id_col, text_col))
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = df.agg(F.count("*").alias("__n"))
    scored = (
        tf.join(dfc, "term")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(id_col, "term", "tfidf")
    )


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    tf: DataFrame | None = None,
) -> DataFrame:
    """term -> (doc_freq, sorted posting list) for terms appearing in
    at least min_df documents. Postings are emitted as a comma-joined
    sorted string — deterministic and engine-portable. At 100 TB a
    posting LIST per row stops being a cell and becomes a layout:
    write term-bucketed parquet (partitionBy on a term hash) instead;
    the aggregation shape below (group on term, collect doc ids) is
    unchanged."""
    if tf is None:
        tf = term_frequencies(df, id_col, text_col)
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").alias("doc_freq"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.col(id_col))),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings"),
        )
        .filter(F.col("doc_freq") >= min_df)
    )


def repetition_ratio(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Intra-document repetition: 1 − distinct/total word n-gram
    shingles per doc — the duplicated-n-gram quality filter from
    published LLM data-curation pipelines (high ratio = boilerplate or
    looping text; curation drops docs above a threshold). Additive —
    the reference's text tooling stops at grep/wordcount.

    Pure column pipeline: one shingle explode, one groupBy(doc) with
    count + count-distinct — the shuffle carries (doc, shingle) rows
    once, and the per-doc agg combines map-side. Docs with fewer than
    n words produce no shingles and are excluded (no signal)."""
    from .dedup import exploded_shingles

    sh = exploded_shingles(df, id_col, text_col, n)
    return sh.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.countDistinct("sh").alias("n_distinct"),
        F.round(
            1 - F.countDistinct("sh").cast("double") / F.count("*"), 6
        ).alias("repetition_ratio"),
    )


def text_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_df: int = 2,
) -> dict:
    """Composed text-index build: tokenize ONCE, derive tf-idf top
    terms and the inverted index from the same persisted (doc, term,
    tf) frame — composing the two standalone builders would tokenize
    and shuffle the corpus twice. Returns {"tf", "tfidf", "inverted"};
    the shared tf is tracked, so the session's release hooks reclaim
    it after the consuming actions."""
    tf = tracked_persist(term_frequencies(df, id_col, text_col))
    return {
        "tf": tf,
        "tfidf": tfidf_top_terms(df, id_col, text_col, k=k, tf=tf),
        "inverted": inverted_index(df, id_col, text_col, min_df=min_df, tf=tf),
    }


def write_index_shards(
    index: DataFrame, out_dir: str, n_shards: int, policy: str = "hash"
) -> int:
    """Sharded write of an inverted index (ref contrib/index/.../
    HashingDistributionPolicy.java, RoundRobinDistributionPolicy.java:
    the reference chose a Lucene shard per document by hash or by
    rotation; here the postings table lands in `n_shards` parquet
    partition dirs chosen per TERM).

    policy='hash': shard = xxhash64(term) mod n — term lookups prune
    to exactly one shard (see `lookup_term`). policy='roundrobin':
    shard = global term rank mod n — perfectly even shard sizes, but a
    lookup must consult every shard (the same tradeoff the reference's
    two policies embody). The rank comes from the scale-safe
    global_rank (range shuffle + prefix sums), not a single-task
    window. Returns the shard count actually written."""
    if policy == "hash":
        sharded = index.withColumn(
            "shard", F.pmod(F.xxhash64("term"), F.lit(n_shards))
        )
    elif policy == "roundrobin":
        from .sort import global_rank

        ranked = global_rank(index, ["term"], rank_col="_r")
        sharded = ranked.withColumn(
            "shard", (F.col("_r") - 1) % n_shards
        ).drop("_r")
    else:
        raise ValueError(f"unknown distribution policy: {policy}")
    sharded.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    return n_shards


def lookup_term(
    spark, out_dir: str, term: str, n_shards: int
) -> DataFrame:
    """Shard-pruned term probe against a hash-policy shard layout: the
    term's shard is computed with the same JVM xxhash64 the writer
    used, and ONLY that partition directory is read — 1/n of the index,
    the point of the hash policy. (Round-robin layouts have no pruning
    rule; filter the full read instead.)"""
    shard = (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(term)), F.lit(n_shards)).alias("s"))
        .first()["s"]
    )
    import os

    return spark.read.parquet(os.path.join(out_dir, f"shard={shard}")).filter(
        F.col("term") == term
    )


# ------------------------------------------------------------- winnowing
def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 "Winnowing: Local Algorithms for Document
    Fingerprinting"): hash every word k-gram, slide a window of `w`
    consecutive gram hashes, keep the minimum hash of each window.
    Guarantee: two documents sharing a word run of length >= k+w-1
    share at least one fingerprint, while only ~2/(w+1) of the grams
    are kept — the sparse, alignment-robust signature MOSS-style
    overlap detection is built on.

    Returns the distinct (id, fp) fingerprint set. The whole selection
    is a narrow per-row array pipeline (tokenize -> shingle -> md5 ->
    windowed min via transform/slice) inside whole-stage codegen; the
    only shuffle is the final distinct on (id, 32-byte fp). Documents
    with fewer than w grams contribute the min over what they have
    (one clamped window); documents with no k-gram contribute nothing.

    Additive over the reference (its digest kernel stops at whole-file
    MD5, io/MD5Hash.java); this is the sub-document form."""
    from .dedup import _shingles_of

    # Each derived array goes behind its own projection boundary:
    # _shingles_of reads the BOUND words array k times per gram and
    # the window mins read the bound hash array w times per window —
    # inlined, every read would re-run the whole upstream expression
    # (tokenize per element_at: the O(words²) trap exploded_shingles
    # documents; measured 68 s -> 3 s at sf0.01 for this operator).
    from .transforms import spread_for_compute

    bound = (
        spread_for_compute(df)
        .withColumn("_words", _words(F.col(text_col)))
        .withColumn(
            "_hs",
            F.transform(_shingles_of(F.col("_words"), k), lambda g: F.md5(g)),
        )
    )
    starts = F.when(
        F.size("_hs") >= 1,
        F.sequence(F.lit(1), F.greatest(F.size("_hs") - (w - 1), F.lit(1))),
    ).otherwise(F.array().cast("array<int>"))
    fps = F.transform(
        starts, lambda i: F.array_min(F.slice(F.col("_hs"), i, w))
    )
    return (
        bound.select(F.col(id_col), F.explode(fps).alias("fp"))
        .distinct()
    )


def winnow_overlap(
    fps: DataFrame,
    id_col: str,
    max_df: int = 20,
    min_common: int = 2,
) -> DataFrame:
    """Document-pair overlap from winnowed fingerprints: pairs sharing
    >= `min_common` fingerprints, with the shared count — the
    plagiarism/mirror-detection join.

    Scale shape: fingerprints carried by more than `max_df` documents
    (boilerplate phrases) are dropped BEFORE the self-join — the same
    hot-key guard as the LSH band join; without it one viral phrase
    would cartesian its whole bucket. What remains equi-joins on the
    32-byte fp key; no all-pairs stage ever runs."""
    # the fingerprint pipeline feeds the frequency pass, the probe,
    # and BOTH self-join sides — persisted, or it evaluates 4x
    fps = tracked_persist(fps)
    freq = fps.groupBy("fp").agg(
        F.countDistinct(id_col).alias("_ndocs")
    )
    keep = freq.filter(
        (F.col("_ndocs") >= 2) & (F.col("_ndocs") <= max_df)
    ).select("fp")
    rare = fps.join(keep, "fp")
    a = rare.select(F.col("fp"), F.col(id_col).alias("id_a"))
    b = rare.select(F.col("fp"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("fp").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


# ----------------------------------------------------------- unigram LM
def unigram_lm_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Corpus-trained unigram language-model score per document — the
    CCNet/KenLM-style quality signal reduced to its SQL-expressible
    core: p(w) = (count(w)+1) / (N+V) with add-one smoothing over the
    corpus' own token stream, doc score = mean log-probability of its
    tokens. Boilerplate/common-word documents score high (close to 0),
    gibberish and rare-token soup scores low — the filter direction
    CCNet uses perplexity for.

    Plan: one explode -> token counts (shuffle on term), corpus totals
    as a 1-row broadcast, token->count equi-join (shuffle on term,
    partial-agg'd), then groupBy doc. At 100 TB the counts relation is
    vocabulary-sized (Zipf: far smaller than the corpus) and the join
    key is the token itself — no driver-side model object, unlike a
    real KenLM scorer, so the 'model' is just another DataFrame."""
    toks = _with_words(df, text_col).select(
        F.col(id_col), F.explode("_words").alias("_w")
    )
    # counts feeds both the totals aggregate and the scoring join;
    # unpersisted, the full explode+shuffle would run twice. It is
    # vocabulary-sized (Zipf), so the cache is cheap at any corpus
    # scale — the token STREAM (toks) is deliberately NOT persisted
    # (corpus-sized; its two consumers are plain rescans).
    counts = tracked_persist(toks.groupBy("_w").agg(F.count("*").alias("_c")))
    totals = counts.agg(
        F.sum("_c").alias("_n"), F.count("*").alias("_v")
    )
    return (
        toks.join(counts, "_w")
        .join(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log((F.col("_c") + 1.0) / (F.col("_n") + F.col("_v")))),
                6,
            ).alias("avg_logprob"),
        )
    )


def bigram_lm_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean bigram log-probability under an add-one-
    smoothed bigram LM trained on the corpus itself — one conditioning
    order up from `unigram_lm_scores`, the same role CCNet's KenLM
    plays with five. p(cur|prev) = (c(prev,cur)+1) / (c(prev)+V) with
    c(prev) the bigram-context count and V the corpus unigram
    vocabulary size.

    Both model relations (bigram counts, context counts) are
    observed-bigram-sized — bounded by corpus tokens and Zipf-shrunk,
    never |V|² — and persist so the model build runs once; the scoring
    join shuffles one 8-byte xxhash64 pair key (bigram text never
    shuffles). Docs with fewer than two words have no bigrams and are
    absent from the result (same convention as the n-gram operators).
    """
    bound = _with_words(df, text_col)
    pairs = F.when(
        F.size("_words") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_words") - 1),
            lambda i: F.struct(
                F.element_at(F.col("_words"), i).alias("prev"),
                F.element_at(F.col("_words"), i + F.lit(1)).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    bg = bound.select(F.col(id_col), F.explode(pairs).alias("_p")).select(
        F.col(id_col),
        F.xxhash64("_p.prev", "_p.cur").alias("_bk"),
        F.xxhash64("_p.prev").alias("_ck"),
    )
    # ONE corpus-sized model pass: counting (bigram, context) pairs
    # together lets the context counts derive from the (vocabulary-
    # sized) bigram relation instead of re-exploding the corpus — the
    # unpersisted bg stream is otherwise scanned once per consumer
    # (bgc + ctx + scoring = 3 corpus explodes; this form pays 2, the
    # same budget as unigram_lm_scores).
    bgk = tracked_persist(
        bg.groupBy("_bk", "_ck").agg(F.count("*").alias("_bc"))
    )
    bgc = bgk.select("_bk", "_bc")
    ctx = bgk.groupBy("_ck").agg(F.sum("_bc").alias("_cc"))
    vocab = (
        _with_words(df, text_col)
        .select(F.explode("_words").alias("_w"))
        .agg(F.countDistinct("_w").alias("_v"))
    )
    return (
        bg.join(bgc, "_bk")
        .join(ctx, "_ck")
        .join(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log((F.col("_bc") + 1.0) / (F.col("_cc") + F.col("_v")))
                ),
                6,
            ).alias("avg_logprob"),
        )
    )


def kn_bigram_lm_scores(
    df: DataFrame, id_col: str, text_col: str, discount: float = 0.75
) -> DataFrame:
    """Interpolated Kneser–Ney bigram score per document — the
    smoothing family real LM-quality pipelines use (Kneser & Ney '95;
    KenLM's default), one step past `bigram_lm_scores`' add-one:

        P(cur|prev) = max(c(prev,cur) − D, 0)/c(prev)
                    + D·N1+(prev,·)/c(prev) · N1+(·,cur)/N1+(··)

    where the N1+ are distinct-bigram-TYPE (continuation) counts —
    the "how many contexts has this word followed" statistic that
    makes KN rank versatile words above merely frequent ones.

    All four model relations (bigram types with counts, context
    totals + forward fan-out, continuation counts, the type total)
    derive from ONE persisted bigram-type relation, so the model
    build costs the same two corpus passes as bigram_lm_scores; the
    scoring joins move only 8-byte xxhash64 keys. Scoring the corpus
    against its own model keeps every scored count ≥ 1, so the
    probability is strictly positive (≥ (1−D)/c(prev)) and the max()'s
    zero branch is unreachable — it documents the full KN form for
    held-out scoring; the unit tests verify the interpolated
    probabilities normalize to 1 over the continuation vocabulary."""
    bound = _with_words(df, text_col)
    pairs = F.when(
        F.size("_words") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_words") - 1),
            lambda i: F.struct(
                F.element_at(F.col("_words"), i).alias("prev"),
                F.element_at(F.col("_words"), i + F.lit(1)).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    bg = bound.select(F.col(id_col), F.explode(pairs).alias("_p")).select(
        F.col(id_col),
        F.xxhash64("_p.prev", "_p.cur").alias("_bk"),
        F.xxhash64("_p.prev").alias("_ck"),
        F.xxhash64("_p.cur").alias("_sk"),
    )
    bgk = tracked_persist(
        bg.groupBy("_bk", "_ck", "_sk").agg(F.count("*").alias("_bc"))
    )
    ctx = bgk.groupBy("_ck").agg(
        F.sum("_bc").alias("_cc"), F.count("*").alias("_nfwd")
    )
    cont = bgk.groupBy("_sk").agg(F.count("*").alias("_nbwd"))
    tot = bgk.agg(F.count("*").alias("_t"))
    d = float(discount)
    p = F.greatest(F.col("_bc") - d, F.lit(0.0)) / F.col("_cc") + (
        d * F.col("_nfwd") / F.col("_cc")
    ) * (F.col("_nbwd") / F.col("_t"))
    return (
        bg.join(bgk.select("_bk", "_bc"), "_bk")
        .join(ctx, "_ck")
        .join(cont, "_sk")
        .join(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg(F.log(p)), 6).alias("avg_logprob"),
        )
    )


def lm_quality_buckets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """CCNet-style quality bucketing: split the corpus into head /
    middle / tail terciles of the unigram LM score (CCNet §4.3 does
    exactly this with KenLM perplexity per language; head = most
    in-distribution). Downstream mixes sample by bucket — head-heavy
    for quality, tail-heavy for diversity audits.

    The cut points are ONE tiny aggregate (two exact percentiles,
    rounded 6dp like winsorize) broadcast back over the scored corpus;
    the scored relation is persisted so the cut pass and the assign
    pass share one computation. At 100 TB swap percentile ->
    approx_percentile: same plan shape, sketch-sized partials."""
    # lazy: the broadcast(cuts) build is the first consumer and
    # references scores exactly once — it fills the cache before the
    # assign pass's scan reads it (no sibling race; the old eager
    # count was one extra pass over the scored relation)
    scores = tracked_persist(
        unigram_lm_scores(df, id_col, text_col), eager=False
    )
    cuts = scores.agg(
        F.round(F.expr("percentile(avg_logprob, cast(1.0/3 as double))"), 6).alias("__c1"),
        F.round(F.expr("percentile(avg_logprob, cast(2.0/3 as double))"), 6).alias("__c2"),
    )
    bucket = (
        F.when(F.col("avg_logprob") < F.col("__c1"), "tail")
        .when(F.col("avg_logprob") < F.col("__c2"), "middle")
        .otherwise("head")
    )
    return (
        scores.join(F.broadcast(cuts))
        .withColumn("bucket", bucket)
        .drop("__c1", "__c2")
    )


def bpe_pair_counts(df: DataFrame, text_col: str, k: int = 30) -> DataFrame:
    """Top-k adjacent character-pair frequencies over the word-frequency
    table — the inner statistic of ONE BPE merge iteration (Sennrich et
    al. 2016: count symbol pairs weighted by word frequency, merge the
    argmax, repeat). A tokenizer-training pipeline runs this fold
    repeatedly; expressed here as the Spark relation it is, so the 100
    TB corpus pass happens once into a vocabulary-sized word-frequency
    table and each iteration's pair count runs over THAT, never the
    corpus.

    Plan: explode words -> (word, freq) groupBy [the corpus-sized
    shuffle, paid once], then per-word adjacent pairs via a bound
    transform, freq-weighted groupBy on the (tiny) pair space, global
    top-k with deterministic tie-break (TakeOrderedAndProject, no full
    sort)."""
    wf = (
        _with_words(df, text_col)
        .select(F.explode("_words").alias("_w"))
        .groupBy("_w")
        .agg(F.count("*").alias("_freq"))
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("_w") - 1),
        lambda i: F.col("_w").substr(i, F.lit(2)),
    )
    exploded = wf.filter(F.length("_w") >= 2).select(
        "_freq", F.explode(pairs).alias("pair")
    )
    return (
        exploded.groupBy("pair")
        .agg(F.sum("_freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(k)
    )


def char_entropy_scores(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Shannon entropy (nats) of each document's character
    distribution — the cheap repetitiveness signal (degenerate
    keyboard-mash and single-char spam score near 0, natural text
    sits around 3) that complements the n-gram repetition family
    without training anything.

    entropy = −Σ_c (n_c/L)·ln(n_c/L) over the doc's own chars.

    Plan: split-to-chars once (split on the empty pattern — one O(L)
    pass; the earlier sequence+substr form re-scanned the prefix per
    index, O(L²) per doc, and showed 7.9× on the 10× SCALING step),
    explode, groupBy (doc, char) with map-side partial agg, then a
    per-doc fold — linear in characters. The DuckDB oracle keeps its
    range+substr form; both enumerate code points (BMP — astral chars
    would split per code UNIT here, an edge the testdata never
    exercises and substr shared anyway). Zero-length documents have
    no chars and are absent (n-gram family convention)."""
    counts = (
        df.filter(F.length(F.col(text_col)) > 0)
        .select(
            F.col(id_col),
            F.length(F.col(text_col)).alias("_len"),
            F.explode(F.split(F.col(text_col), "")).alias("_c"),
        )
        .groupBy(id_col, "_len", "_c")
        .agg(F.count("*").alias("_n"))
    )
    p = F.col("_n") / F.col("_len").cast("double")
    return counts.groupBy(id_col).agg(
        F.max("_len").cast("bigint").alias("n_chars"),
        F.round(-F.sum(p * F.log(p)), 6).alias("char_entropy"),
    )


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the lowered token stream — the ONE corpus-
    sized pass tokenizer training needs; everything after runs on this
    vocabulary-sized relation."""
    return (
        _with_words(df, text_col)
        .select(F.explode("_words").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def oov_rate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_size: int = 20,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus' own
    top-`vocab_size` words (frequency DESC, word ASC tie-break) — the
    tokenizer-coverage diagnostic a pipeline runs before committing to
    a vocabulary: documents dense in OOV tokens either carry rare
    content worth keeping or junk worth dropping, and this is the
    signal that separates the review queue.

    Plan: the vocabulary is TakeOrdered over the word-frequency
    relation (top-k, never a global sort), broadcast to the token
    stream for a left-anti count; totals come from the bound token
    array — no corpus-sized shuffle beyond the word-frequency pass.
    Zero-token documents are absent (n-gram family convention)."""
    vocab = (
        word_frequencies(df, text_col)
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(vocab_size)
        .select("word")
    )
    bound = _with_words(df, text_col).filter(F.size("_words") > 0)
    totals = bound.select(
        F.col(id_col), F.size("_words").cast("bigint").alias("n_tokens")
    )
    oov = (
        bound.select(F.col(id_col), F.explode("_words").alias("word"))
        .join(F.broadcast(vocab), "word", "left_anti")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_oov"))
    )
    return (
        totals.join(oov, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("bigint").alias("n_oov"),
            F.round(
                F.coalesce(F.col("n_oov"), F.lit(0))
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("oov_rate"),
        )
    )


def bpe_learn(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    max_vocab_rows: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Learn BPE merges (Sennrich et al. 2016) with the cluster doing
    the only corpus-scale work: ONE distributed pass builds the
    word-frequency relation; the merge loop then runs driver-side over
    that vocabulary (bounded by `max_vocab_rows` — Zipf makes the
    vocabulary millions of rows at 100 TB, not billions; the guard
    raises rather than silently truncating, because a truncated vocab
    learns different merges).

    Returns the ordered merge list [(left, right), ...] — the model
    artifact `bpe_encode` applies. Deterministic: ties on pair count
    break lexicographically."""
    # persist BEFORE the guard count: wf is the corpus-scale
    # aggregation, and without the materialization the guard's
    # limit().count() and the collect() below each run the full pass —
    # the "ONE distributed pass" contract would silently become two
    wf = tracked_persist(word_frequencies(df, text_col))
    n = wf.limit(max_vocab_rows + 1).count()
    if n > max_vocab_rows:
        raise ValueError(
            f"vocabulary exceeds max_vocab_rows={max_vocab_rows}; "
            "raise the bound (the merge loop is O(vocab) per merge)"
        )
    vocab = {
        tuple(r["word"]): r["freq"] for r in wf.collect() if len(r["word"]) > 0
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + freq
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
        # deterministic argmax: count desc, then LEXICOGRAPHICALLY
        # LARGEST pair (max over (count, pair)); any fixed rule works,
        # it just must match bpe_encode's training assumption
        (a, b), _cnt = best
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple, int] = {}
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def bpe_learn_distributed(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
) -> list[tuple[str, str]]:
    """Learn BPE merges with EVERY per-merge step on the cluster — the
    at-scale twin of `bpe_learn`. The driver loop there is bounded and
    honest, but each merge iteration is O(vocab) pure Python; here the
    vocabulary stays a DataFrame (syms array<string>, freq) and each
    iteration is two vocabulary-sized Spark jobs:

      1. pair statistic: explode adjacent symbol pairs weighted by word
         freq, groupBy, take the argmax — ONE row to the driver per
         iteration (same discipline as connected-components' one
         scalar per round);
      2. merge application: a vectorized `aggregate` fold over each
         word's symbol array replaces left-to-right non-overlapping
         (a,b) runs — provably equivalent to the greedy scan because a
         merged token a||b can never string-equal `a` (b is nonempty),
         so the fold never chains onto its own output; then a groupBy
         re-folds words whose symbol sequences collapsed.

    Lineage is truncated per iteration with localCheckpoint (the CC
    discipline) so the plan doesn't grow with n_merges. Deterministic:
    ties break count DESC then lexicographically largest (a, b) —
    byte-identical merge lists to bpe_learn (pinned by test).

    Pitfalls encoded here: Spark `sequence(1, size-1)` on a 1-symbol
    word yields DESCENDING [1, 0], not empty — guarded; ANSI mode
    makes element_at(-1) on an empty array raise — try_element_at."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    vocab = (
        word_frequencies(df, text_col)
        .filter(F.length("word") > 0)
        .select(chars.alias("syms"), "freq")
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_structs = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda j: F.struct(
                    F.element_at(F.col("syms"), j).alias("a"),
                    F.element_at(F.col("syms"), j + F.lit(1)).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        best = (
            vocab.select("freq", F.explode(pair_structs).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.desc("a"), F.desc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        merged = a + b
        fold = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
                & (s == F.lit(b)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(merged)),
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        new_vocab = (
            vocab.select(fold.alias("syms"), "freq")
            .groupBy("syms")
            .agg(F.sum("freq").alias("freq"))
        ).localCheckpoint()
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    return merges


def _merge_fold(toks: Column, a: str, b: str) -> Column:
    """Apply ONE BPE merge (a,b) to a token array with the vectorized
    left-to-right non-overlapping fold (see bpe_learn_distributed for
    the equivalence argument: a||b can never string-equal `a`, so the
    fold never chains onto its own output)."""
    merged = a + b
    return F.aggregate(
        toks,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1)) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_encode_joined(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    checkpoint_every: int = 8,
) -> DataFrame:
    """Fully RELATIONAL BPE encode — the SQL-expressible twin of the
    Arrow-batched `bpe_encode`: the merge ranks are applied to the
    (vocabulary-sized) distinct-word relation as a chain of vectorized
    array folds, and the corpus then just equi-joins each word
    occurrence to its encoded form and reassembles per document in
    word order. Token-identical to `bpe_encode` (pinned by test); the
    behavioral difference is only that zero-word documents are absent
    here (standard n-gram-operator convention) instead of [].

    At 100 TB this shape is strictly better than the per-row memo:
    the O(n_merges x word-length) encode work runs once per DISTINCT
    word (Zipf: vocabulary << corpus), the encoded vocab broadcasts,
    and the corpus pass is one explode + broadcast join + groupBy —
    all JVM-side, no Python anywhere. Expression depth is bounded by
    localCheckpoint every `checkpoint_every` merges."""
    bound = _with_words(df, text_col)
    occ = bound.select(
        F.col(id_col), F.posexplode("_words").alias("_pos", "_w")
    )
    enc = bpe_encoded_vocab(occ, merges, checkpoint_every)
    return (
        occ.join(F.broadcast(enc), "_w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("_pos"), F.col("_toks")))
                    ),
                    lambda s: s.getField("_toks"),
                )
            ).alias("bpe_tokens_arr")
        )
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens_arr",
) -> DataFrame:
    """Apply learned BPE merges to every document — the 100 TB encode
    pass. The merge table is a driver-side list (KBs) captured in an
    Arrow-batched mapInPandas closure: iterative longest-match merging
    is genuinely outside Catalyst's expression language, so this is
    one of the declared Python boundaries (multimodal decode being the
    other). Ranks are applied lowest-first per word, mirroring
    bpe_learn's greedy order."""
    import re
    import pandas as pd
    from collections.abc import Iterator

    # Tokenize with the SAME rule as the Spark-side _words the merges
    # were learned from: lower + split on Java \s = ASCII whitespace
    # only. Python's str.split() splits on UNICODE whitespace (NBSP,
    # ideographic space, ...), which would segment NBSP-bearing text
    # differently at encode time than in the training statistics.
    ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")

    rank = {pair: i for i, pair in enumerate(merges)}
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<string>"

    def encode_word(word: str) -> list[str]:
        syms = list(word)
        while len(syms) >= 2:
            best_i, best_r = -1, None
            for i, pair in enumerate(zip(syms, syms[1:])):
                r = rank.get(pair)
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in it:
            toks = []
            for text in pdf[text_col]:
                words = [w for w in ascii_ws.split((text or "").lower()) if w]
                out = []
                for w in words:
                    if w not in cache:
                        cache[w] = encode_word(w)
                    out.extend(cache[w])
                toks.append(out)
            pdf = pdf.copy()
            pdf[out_col] = toks
            yield pdf

    return df.mapInPandas(batches, schema=schema)


def zipf_fit(
    df: DataFrame,
    text_col: str,
    top_n: int = 100,
) -> DataFrame:
    """Least-squares fit of the corpus' Zipf curve: slope/intercept of
    ln(freq) ~ ln(rank) over the top-`top_n` words (frequency DESC,
    word ASC tie-break). A natural corpus sits near slope -1; a
    template-y or deduplication-damaged corpus flattens, boilerplate
    steepens — the one-row "is this corpus linguistically normal"
    diagnostic a curation run publishes next to its volume counts.

    Determinism contract: ln(rank) and ln(freq) are rounded to 6dp and
    lifted to exact integer micro-units; every aggregate the normal
    equations need (Σx, Σy, Σxy, Σx²) is then an exact int64 sum, so
    slope/intercept are bit-identical across engines regardless of
    summation order (the same micro-unit discipline as
    web_curation's mean_score). Magnitudes: |x|,|y| ≤ ln(freq)·1e6;
    Σxy over `top_n` ≤ ~1e17 at 100 TB scale — inside int64.

    Plan shape: one corpus tokenize + groupBy (the word_frequencies
    pass), TakeOrdered(top_n) — never a global sort — then a
    `top_n`-row window + single-row aggregate. Scale cost = the
    frequency pass; everything after is constant-size.
    """
    from pyspark.sql import Window

    freq = word_frequencies(df, text_col)
    top = freq.orderBy(F.desc("freq"), F.asc("word")).limit(top_n)
    w = Window.orderBy(F.desc("freq"), F.asc("word"))
    # micro-unit lift: round(ln·1e6) to an exact integer double, THEN
    # cast — a bare double→long cast TRUNCATES in Spark but ROUNDS in
    # DuckDB (the decile_histogram lesson), so the rounding must be
    # explicit and shared by the oracle
    ranked = top.select(
        F.row_number().over(w).alias("rank"), "freq"
    ).select(
        F.round(F.log(F.col("rank").cast("double")) * 1000000.0, 0)
        .cast("long")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")) * 1000000.0, 0)
        .cast("long")
        .alias("y"),
    )
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    # slope in micro-unit space equals slope in real space (the 1e6
    # factors cancel); intercept needs one 1e-6 rescale
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    )
    intercept = (
        (F.col("sy") - slope * F.col("sx")) / F.col("n") / F.lit(1000000.0)
    )
    return agg.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
    )


def bm25_multi_query(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 against MANY queries in one plan: `queries` is a
    (query_id, term) relation (one row per distinct query term).
    Output: (query_id, `id_col`, bm25, n_terms_hit) for every
    (query, doc) pair sharing at least one term.

    Same scoring math as bm25_scores (RSJ '+1' idf from the GLOBAL
    per-term document frequency — df does not depend on the query, so
    the df relation is computed once and shared by all queries).

    Scale shape: docs explode to postings and are immediately
    semi-joined against the broadcast distinct-term set, so the tf
    shuffle is proportional to the union of all queries' hit sets —
    the multi-query analog of bm25_scores' query-term filter; corpus
    stats and the per-term df ride broadcasts, and the final
    (query_id, doc) aggregation shuffles only scored postings."""
    qt = queries.select("query_id", F.col("term")).distinct()
    terms = qt.select("term").distinct()
    bound = _with_words(docs, text_col)
    stats = bound.agg(
        F.count("*").alias("__n"),
        F.avg(F.size("_words")).alias("__avgdl"),
    )
    tf = (
        bound.select(
            F.col(id_col),
            F.size("_words").alias("dl"),
            F.explode("_words").alias("term"),
        )
        .join(F.broadcast(terms), "term", "left_semi")
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    tf = tracked_persist(tf)  # feeds df AND the per-query scoring join
    dfc = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("__n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
    )
    return (
        tf.join(F.broadcast(dfc), "term")
        .join(F.broadcast(stats))
        .join(F.broadcast(qt), "term")
        .groupBy("query_id", id_col)
        .agg(
            F.round(F.sum(idf * tf_part), 6).alias("bm25"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
    )


def bm25_corpus_stats(
    df: DataFrame, id_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Mergeable BM25 corpus statistics: the (term, df) relation plus
    the (n_docs, sum_dl) scalar — everything idf/avgdl need, and both
    PURELY ADDITIVE across disjoint corpus shards. A 100 TB index
    maintains these per ingestion batch and merges by summation; no
    historical rescan, ever (same maintenance algebra as the KMV and
    count-min sketch families, but exact — df/N/sum_dl are linear
    functionals of the corpus).

    Reference parity: contrib/index's IndexUpdater merges Lucene
    shard indexes (src/contrib/index/.../lucene/ShardWriter.java);
    this is the relational form of the same update."""
    bound = _with_words(df, text_col)
    term_df = (
        bound.select(
            F.col(id_col), F.explode(F.array_distinct("_words")).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    totals = bound.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size("_words")).cast("long").alias("sum_dl"),
    )
    return term_df, totals


def merge_bm25_stats(
    parts: list[tuple[DataFrame, DataFrame]]
) -> tuple[DataFrame, DataFrame]:
    """Merge per-shard BM25 stats by summation (df is additive across
    DISJOINT shards — the same document must not appear in two)."""
    term_df = parts[0][0]
    totals = parts[0][1]
    for t, s in parts[1:]:
        term_df = term_df.unionByName(t)
        totals = totals.unionByName(s)
    merged_terms = term_df.groupBy("term").agg(
        F.sum("df").cast("long").alias("df")
    )
    merged_totals = totals.agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_dl").cast("long").alias("sum_dl"),
    )
    return merged_terms, merged_totals


def code_prose_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    punct_threshold: float = 0.01,
    indent_threshold: float = 0.3,
) -> DataFrame:
    """Code-vs-prose heuristic flags: the routing signal a mixed web +
    code corpus needs before language-specific pipelines (code goes to
    the near-dedup-by-alpha-renaming path, prose to the LM-quality
    path). Three cheap, engine-portable surface signals:

      semi_count   — ';' occurrences
      brace_count  — '{' + '}' occurrences
      indent_frac  — fraction of lines starting with a tab or 4 spaces

    is_code = punct_density > punct_threshold OR
              indent_frac  > indent_threshold
    with punct_density = (semi+brace)/chars.

    All length/replace arithmetic — scan-local whole-stage-codegen
    projections, zero shuffle, trivially identical in any SQL engine.
    Real classifiers (e.g. fastText) would ride the classifier.py
    hashed-logreg path; this is the deterministic bootstrap tier.
    """
    t = F.col(text_col)
    chars = F.length(t)
    semi = chars - F.length(F.replace(t, F.lit(";"), F.lit("")))
    brace = (chars - F.length(F.replace(t, F.lit("{"), F.lit("")))) + (
        chars - F.length(F.replace(t, F.lit("}"), F.lit("")))
    )
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    indented = F.size(
        F.filter(lines, lambda l: l.rlike(r"^(\t|    )"))
    )
    indent_frac = F.round(
        indented.cast("double") / F.greatest(n_lines, F.lit(1)).cast("double"),
        6,
    )
    punct_density = F.round(
        (semi + brace).cast("double")
        / F.greatest(chars, F.lit(1)).cast("double"),
        6,
    )
    return df.select(
        F.col(id_col),
        chars.alias("chars"),
        semi.cast("int").alias("semi_count"),
        brace.cast("int").alias("brace_count"),
        n_lines.cast("int").alias("n_lines"),
        indent_frac.alias("indent_frac"),
        punct_density.alias("punct_density"),
        (
            (punct_density > F.lit(punct_threshold))
            | (indent_frac > F.lit(indent_threshold))
        )
        .cast("int")
        .alias("is_code"),
    )


def moment_shards(
    df: DataFrame, group_col: str, shard_col: str, value_col: str
) -> DataFrame:
    """Per-(group, shard) sufficient statistics (n, Σx, Σx²) for mean
    and variance — the mergeable-accumulator form every distributed
    ingestion keeps per shard so corpus-wide stats never re-scan data
    (the same summation-merge contract as merge_bm25_stats). Integer
    inputs keep the sums exact; the merge is pure addition. The sums
    accumulate in DECIMAL(38,0) (exact to 1e38): Σx² in bigint
    overflows at ~1e9 rows per group for x~1e5 — inside the 100 TB
    design point — and ANSI mode turns that into a job-killing
    ARITHMETIC_OVERFLOW (review-r6 finding). The per-row square is
    computed in decimal too (decimal(19,0) × decimal(19,0), max
    ~8.5e37 < decimal(38,0)): a bigint x*x overflows at |x| > ~3.04e9
    before the cast ever runs (ADVICE r6)."""
    x = F.col(value_col).cast("long")
    xd = x.cast("decimal(19,0)")
    return df.groupBy(group_col, shard_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x.cast("decimal(38,0)")).alias("s1"),
        F.sum((xd * xd).cast("decimal(38,0)")).alias("s2"),
    )


def merge_moments(shards: DataFrame, group_col: str) -> DataFrame:
    """Merge per-shard moment shards to per-group mean / population
    variance / stddev. The sums are exact integers, so the final
    divisions are single deterministic IEEE operations — no
    summation-order sensitivity (the mixing_plan micro-unit
    discipline).

    Output: (group, n, mean, variance, stddev) — mean/var/std
    rounded 6dp."""
    merged = shards.groupBy(group_col).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
    )
    # var = s2/n - mean^2, all DOUBLE ops on the exact decimal sums:
    # s1*s1 in integer space would overflow (ANSI: job-killing error
    # at corpus scale); each division/multiply here is a single
    # deterministic IEEE op on exact inputs. try_divide: an empty
    # group cannot arise from groupBy, but shard relations built
    # elsewhere may carry n=0 rows — degrade to NULL, never raise.
    nn = F.col("n").cast("double")
    mean = F.try_divide(F.col("s1").cast("double"), nn)
    var = F.try_divide(F.col("s2").cast("double"), nn) - mean * mean
    return merged.select(
        group_col,
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(var, 6).alias("variance"),
        F.round(F.sqrt(var), 6).alias("stddev"),
    )


def bpe_encoded_vocab(
    occ: DataFrame, merges: list[tuple[str, str]], checkpoint_every: int = 8
) -> DataFrame:
    """Encode the DISTINCT words of `occ` (any frame with a `_w`
    column) through the merge chain — the vocabulary-sized relation
    both the relational encode and the fertility report broadcast.
    Factored out of bpe_encode_joined so every consumer applies the
    identical fold (same left-to-right non-overlapping rule, same
    localCheckpoint cadence). tracked_persist'ed: callers broadcast it
    into one or more joins; release via cache.release_all()."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length("_w")),
        lambda i: F.col("_w").substr(i, F.lit(1)),
    )
    enc = occ.select("_w").distinct().select("_w", chars.alias("_toks"))
    for i, (a, b) in enumerate(merges):
        enc = enc.select("_w", _merge_fold(F.col("_toks"), a, b).alias("_toks"))
        if (i + 1) % checkpoint_every == 0:
            enc = enc.localCheckpoint()
    return tracked_persist(enc)


def bpe_fertility(
    df: DataFrame,
    group_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    checkpoint_every: int = 8,
) -> DataFrame:
    """Tokenizer fertility report per group (typically language):
    tokens-per-word and chars-per-token under a learned merge table —
    the number a multilingual data plan needs before token budgets
    mean anything (a language at 3x fertility burns 3x budget per
    word; cf. the mixing_plan token-budget contract). Same cost shape
    as the relational encode: the fold runs once per DISTINCT word,
    the corpus pass is explode + broadcast join + one groupBy.

    Output: (group, n_words, n_tokens, n_chars, tokens_per_word,
    chars_per_token) — ratios rounded 6dp."""
    bound = _with_words(df, text_col)
    occ = bound.select(F.col(group_col), F.explode("_words").alias("_w"))
    enc = bpe_encoded_vocab(occ, merges, checkpoint_every)
    agg = (
        occ.join(F.broadcast(enc), "_w")
        .groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum(F.size("_toks")).cast("long").alias("n_tokens"),
            F.sum(F.length("_w")).cast("long").alias("n_chars"),
        )
    )
    return agg.select(
        group_col,
        "n_words",
        "n_tokens",
        "n_chars",
        F.round(F.col("n_tokens").cast("double") / F.col("n_words"), 6)
        .alias("tokens_per_word"),
        F.round(F.col("n_chars").cast("double") / F.col("n_tokens"), 6)
        .alias("chars_per_token"),
    )


def welch_t_drift(
    old_df: DataFrame,
    new_df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Mean-shift drift test between two snapshots, per group: Welch's
    t statistic from the exact integer sufficient stats (n, Σx, Σx²)
    each side's moment shards already maintain — the parametric
    companion to the distributional PSI gate (sketches.psi_drift):
    PSI sees shape changes at fixed mean, the t statistic sees small
    mean shifts PSI's bucketing absorbs. Sample variance (n-1); both
    divisions/sqrt are single IEEE ops on exact integer sums, so the
    statistic is partitioning- and merge-order-independent.

    Output: (group, n_old, n_new, mean_old, mean_new, t_stat) —
    floats rounded 6dp. Degenerate groups degrade to NULL instead of
    raising under ANSI mode (review-r6 finding): n < 2 on either side
    (the n-1 division), zero variance on both sides (se = 0), and
    groups present in only one snapshot (full-outer join; n = 0 on
    the missing side, means NULL) all yield t_stat NULL — a drift
    REPORT must degrade per group, never abort the job."""
    def stats(df, suffix):
        x = F.col(value_col).cast("long")
        # s2 in DECIMAL(38,0): Σx² in bigint overflows at ~1e9 docs
        # per group for x~1e5 — inside the design point — and ANSI
        # turns that into a job-killing ARITHMETIC_OVERFLOW. The
        # per-row square is decimal(19,0)² so |x| > ~3.04e9 cannot
        # overflow the multiply itself either (ADVICE r6).
        xd = x.cast("decimal(19,0)")
        return df.groupBy(group_col).agg(
            F.count("*").cast("long").alias(f"n{suffix}"),
            F.sum(x.cast("decimal(38,0)")).alias(f"s1{suffix}"),
            F.sum((xd * xd).cast("decimal(38,0)")).alias(f"s2{suffix}"),
        )

    j = stats(old_df, "_o").join(
        stats(new_df, "_n"), group_col, "full_outer"
    ).fillna(0, subset=["n_o", "n_n"])

    def mean_var(n, s1, s2):
        nn = F.col(n).cast("double")
        m = F.try_divide(F.col(s1).cast("double"), nn)
        # sample variance: (Σx² - n·mean²) / (n-1)
        v = F.try_divide(
            F.col(s2).cast("double") - nn * m * m, nn - 1
        )
        return m, v

    mo, vo = mean_var("n_o", "s1_o", "s2_o")
    mn, vn = mean_var("n_n", "s1_n", "s2_n")
    se = F.sqrt(
        F.try_divide(vo, F.col("n_o")) + F.try_divide(vn, F.col("n_n"))
    )
    return j.select(
        group_col,
        F.col("n_o").alias("n_old"),
        F.col("n_n").alias("n_new"),
        F.round(mo, 6).alias("mean_old"),
        F.round(mn, 6).alias("mean_new"),
        F.round(
            F.when(se > 0, F.try_divide(mn - mo, se)), 6
        ).alias("t_stat"),
    )

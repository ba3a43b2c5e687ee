"""Scale-stress evidence beyond the shipped SFs: run the heaviest plan
shapes on locally synthesized inputs ~10-20x sf0.1 and report per-row
cost next to the sf0.1 number. Flat per-row cost (or better, as fixed
overhead amortizes) is the local-mode evidence that the plan's cost is
data-bound, not structure-bound — the property that survives the jump
to a real cluster. Writes STRESS.md. Regenerate: `python tools/stress.py`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from hadoop_distributed_dynamic_file_system_spark import cache, datagen
    from hadoop_distributed_dynamic_file_system_spark.operators import (
        dedup, graph, sort as sort_ops,
    )
    from hadoop_distributed_dynamic_file_system_spark.session import get_spark

    spark = get_spark("stress", master="local[32]")
    sf_docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    rows = []

    def bench(name, n_rows, fn, warm_fn=None, reps=2):
        # min-of-reps, same discipline as bench.py/tools/scaling.py:
        # single shots swing 2-3x (GC, scheduling, cold JIT) and a
        # round-6 single-shot table showed +-80% on unchanged shapes
        if warm_fn is not None:
            warm_fn()
            cache.release_all()
        dt = float("inf")
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = min(dt, time.time() - t0)
            cache.release_all()
        rows.append((name, n_rows, dt, 1e6 * dt / n_rows))
        print(f"{name}: {n_rows:,} rows in {dt:.1f}s "
              f"({1e6 * dt / n_rows:.2f} us/row)")

    # total-order sort: 2M (sf0.1 bench shape) then 20M (10x)
    for n in (2_000_000, 20_000_000):
        bench(
            f"total_order_sort_{n // 1_000_000}m", n,
            lambda n=n: noop(sort_ops.total_order_sort(
                datagen.teragen(spark, n), "key10")),
            warm_fn=lambda: noop(sort_ops.total_order_sort(
                datagen.teragen(spark, 10_000), "key10")),
        )

    # MinHash->LSH over the documents corpus amplified 2x and 16x
    # (each copy k drops the first k words: near-dups, unique ids)
    def amplified(copies):
        parts = [
            sf_docs.select(
                (F.col("doc_id") + 100_000 * k).alias("doc_id"),
                F.regexp_replace(
                    "text", r"^(\S+\s+){%d}" % k, ""
                ).alias("text") if k else F.col("text"),
            )
            for k in range(copies)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    base = sf_docs.count()
    for copies in (2, 16):
        corpus = amplified(copies)
        bench(
            f"minhash_lsh_x{copies}", base * copies,
            lambda c=corpus: noop(dedup.lsh_candidate_pairs(
                dedup.minhash_signatures(c, "doc_id", "text", num_hashes=8),
                "doc_id", num_hashes=8, bands=4)),
        )

    # connected components over the x16 candidate graph
    corpus16 = amplified(16)
    pairs16 = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(corpus16, "doc_id", "text", num_hashes=8),
        "doc_id", num_hashes=8, bands=4)
    bench(
        "dedup_components_x16", base * 16,
        lambda: noop(graph.connected_components(pairs16, "id_a", "id_b")),
    )

    # union-graph CC (the multi_signal_components shape): MinHash-LSH
    # pairs UNION SimHash near-pairs over the x16 corpus — the dense
    # high-degree graph whose pre-contraction loop showed 9-18s
    # variance at sf0.1; contract-then-solve should keep it flat
    # NOTE: 16-bit SimHash over 80k near-identical synthetic docs is
    # DEGENERATE — hamming<=3 genuinely holds for ~117M pairs (avg
    # degree ~1.5k), so this row is edge-bound: read it per EDGE
    # (n_rows below is the edge count), not per document. It pins two
    # properties: CC's persist of the symmetrized edge set (without it
    # the whole candidate funnel re-executes 3x: 296s -> ~209s), and
    # contract-then-solve surviving a dense pathological graph.
    fps16 = dedup.simhash(corpus16, "doc_id", "text", bits=16)
    sh_pairs16 = dedup.simhash_near_pairs(
        fps16, "doc_id", max_hamming=3, band_shift=8, rotations=2, bits=16)
    union16 = pairs16.select("id_a", "id_b").unionByName(
        sh_pairs16.select("id_a", "id_b")).distinct()
    n_edges = union16.persist().count()
    bench(
        "union_graph_components_x16_dense", n_edges,
        lambda: noop(graph.connected_components(union16, "id_a", "id_b")),
    )
    union16.unpersist()

    # temporal family at 1x and 10x events: as-of attribution is the
    # heaviest temporal shape (union + partitioned window); amplify by
    # replicating users with offset ids so per-key cardinality is
    # constant and the growth is pure data volume
    from hadoop_distributed_dynamic_file_system_spark import queries as q

    ev = q._events(spark, "/root/testdata/sf0.1")
    n_ev = ev.count()

    def amplified_events(copies):
        if copies == 1:
            return ev
        parts = [
            ev.withColumn("user_id", F.col("user_id") + 1_000_000 * k)
            for k in range(copies)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    from hadoop_distributed_dynamic_file_system_spark.operators import temporal

    for copies in (1, 10):
        e10 = amplified_events(copies)
        purchases = e10.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
        )
        clicks = e10.filter(F.col("event_type") == "click").select(
            "user_id", F.col("ts").alias("c_ts")
        )
        bench(
            f"asof_join_events_x{copies}", n_ev * copies,
            lambda p=purchases, c=clicks: noop(
                temporal.asof_join(p, c, "user_id", "p_ts", "c_ts")
            ),
        )

    # span-level substring dedup on the amplified corpus (2x and 16x):
    # the round-5 heavy shape — gram-key winner election + coverage
    # anti-join + ordered reassembly; flat us/row pins that the
    # four-shuffle chain is data-bound
    for copies in (2, 16):
        corpus = amplified(copies)
        bench(
            f"span_dedup_x{copies}", base * copies,
            lambda c=corpus: noop(dedup.remove_duplicated_spans(
                c, "doc_id", "text", n=5)),
        )

    # distributed BPE learn at 1x and ~10x vocabulary: each word gets a
    # per-doc salt suffix so distinct-word count grows ~10x while the
    # corpus pass stays comparable — pins that the per-merge cost is
    # vocabulary-bound (DataFrame fold), not structure-bound like the
    # driver loop it replaces
    from hadoop_distributed_dynamic_file_system_spark.operators import (
        textanalysis as ta,
    )

    def salted(mult):
        if mult == 1:
            return sf_docs
        salt = F.concat(F.lit("_"), (F.col("doc_id") % mult).cast("string"))
        return sf_docs.select(
            "doc_id",
            F.concat_ws(
                " ",
                F.transform(
                    F.split(F.lower("text"), r"\s+"),
                    lambda w: F.concat(w, salt),
                ),
            ).alias("text"),
        )

    for mult in (1, 10):
        corpus = salted(mult)
        n_vocab = ta.word_frequencies(corpus, "text").count()
        bench(
            f"bpe_learn_dist_vocab_x{mult}", n_vocab,
            lambda c=corpus: ta.bpe_learn_distributed(c, "text", n_merges=10),
        )

    # crawl-to-chunks flagship at 1x and 16x documents: the gzip-member
    # ingest path (compress fixture + inflate + NFC + dedup + chunk);
    # flat-or-falling us/doc on the 16x step pins the pipeline as
    # decompression/scan-bound with its one 16-byte-key shuffle
    from hadoop_distributed_dynamic_file_system_spark.queries_llm import (
        crawl_to_chunks,
    )

    # explode-based amplifier for LARGE copy counts: one generator row
    # per (doc, k) instead of a copies-way unionByName (whose analysis
    # cost grows with the branch count); k%20 leading words dropped so
    # copies are near-duplicates with unique ids; `source` carried for
    # the curation report
    def amplified_big(copies):
        return sf_docs.select(
            "doc_id", "text", "source",
            F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("_k"),
        ).select(
            (F.col("doc_id") + 100_000 * F.col("_k")).alias("doc_id"),
            F.expr(
                "regexp_replace(text, concat('^(\\\\S+\\\\s+){', _k % 20, '}'), '')"
            ).alias("text"),
            "source",
        )

    # flagship 1: crawl-to-chunks at 1x, 16x, and the sf1-equivalent
    # 100x (>= 100x the sf0.01 oracle corpus — VERDICT-r5 ask #5: the
    # next 10x claim measured, not extrapolated)
    for copies in (1, 16, 100):
        corpus = amplified_big(copies).select("doc_id", "text")
        bench(
            f"crawl_to_chunks_x{copies}", base * copies,
            lambda c=corpus: noop(crawl_to_chunks(c)),
        )

    # flagship 2: the web-curation pipeline (gate -> exact dedup ->
    # span dedup -> classifier -> split -> report) over the amplified
    # near-dup corpus; DSIR weights train on the un-amplified
    # originals (the production shape: model relation is fixed while
    # the scored corpus grows)
    from hadoop_distributed_dynamic_file_system_spark.queries_llm import (
        web_curation,
    )

    for copies in (2, 16, 100):
        corpus = amplified_big(copies)
        bench(
            f"web_curation_x{copies}", base * copies,
            lambda c=corpus: noop(web_curation(c, sf_docs)),
        )

    # multi-query BM25 at 3 and 200 queries (ROADMAP r6: the bench
    # row carries 3 queries; this pins that the postings-semi-join
    # shape scales in the QUERY dimension — per-query cost should
    # fall as the fixed corpus passes amortize over more queries)
    from hadoop_distributed_dynamic_file_system_spark.operators import (
        textanalysis as ta2,
    )

    for nq in (3, 200):
        qterms = sf_docs.filter(F.col("doc_id") < nq).select(
            F.col("doc_id").alias("query_id"),
            F.explode(
                F.array_distinct(
                    F.slice(
                        F.filter(
                            F.split(F.lower("text"), r"\s+"), lambda w: w != ""
                        ),
                        1,
                        4,
                    )
                )
            ).alias("term"),
        )
        bench(
            f"bm25_multi_query_q{nq}", nq,
            lambda q=qterms: noop(
                ta2.bm25_multi_query(sf_docs, q, "doc_id", "text")
            ),
        )

    # PageRank on synthetic graphs at 1M and 10M edges (3 iterations,
    # avg out-degree 10, no dangling by construction): falling us/edge
    # on the 10x step pins the loop as edge-bound — the per-iteration
    # fixed overhead (localCheckpoint + scheduling) amortizes and the
    # joins/groupBy grow with the edge list only
    def pr_edges(m):
        n = m // 10
        return spark.range(m).select(
            (F.col("id") % n).alias("src"),
            ((F.col("id") * 2654435761) % n).alias("dst"),
        )

    for m in (1_000_000, 10_000_000):
        edges = pr_edges(m)
        bench(
            f"pagerank_edges_{m // 1_000_000}m", m,
            lambda e=edges: noop(graph.pagerank(e, iterations=3)),
        )

    # host-level boilerplate removal at 1x/16x: per-host line support
    # on (host, xxhash64(line)) keys — us/doc must stay flat as hosts
    # grow 16x deeper (the support relation grows with distinct lines,
    # the verdict join stays keyed)
    from hadoop_distributed_dynamic_file_system_spark.operators import (
        webquality as wq2,
    )

    def hosted_lined(copies):
        m = (F.col("doc_id") % 50).cast("string")
        return amplified_big(copies).select(
            "doc_id",
            F.concat(F.lit("site"), m, F.lit(".example.com")).alias("host"),
            F.concat(
                F.lit("nav home about site"), m, F.lit("\n"),
                F.regexp_replace(
                    "text", r"((?:\S+\s+){7}\S+)\s+", "$1\n"
                ),
                F.lit("\ncopyright site"), m,
            ).alias("text"),
        )

    for copies in (1, 16):
        corpus = hosted_lined(copies)
        bench(
            f"host_boilerplate_x{copies}", base * copies,
            lambda c=corpus: noop(wq2.host_boilerplate_removal(
                c, "doc_id", "text", "host", frac=0.3, min_docs=5)),
        )

    # HTML text extraction at 1x/100x: a pure regexp-chain projection
    # must scale linearly with zero shuffle — this is the scan-bound
    # floor every crawl-ingest stage sits on
    from hadoop_distributed_dynamic_file_system_spark.operators import (
        webtext as wt2,
    )

    for copies in (1, 100):
        corpus = amplified_big(copies)
        html = F.concat(
            F.lit("<html><head><script>var x=1;</script></head><body><p>"),
            F.col("text"),
            F.lit('</p><a href="http://h1.example.com/p">n</a></body></html>'),
        )
        bench(
            f"html_text_extract_x{copies}", base * copies,
            lambda c=corpus, h=html: noop(
                c.select("doc_id", wt2.strip_html(h).alias("t"))
            ),
        )

    # web-graph flagship at 1x/16x: extraction + edge groupBy scale
    # with pages; the rank rounds scale with HOSTS (fixed here), so
    # us/page must fall as the fixed iteration overhead amortizes
    from hadoop_distributed_dynamic_file_system_spark.operators import (
        graph as graph2,
        webtext as wt3,
    )

    def web_graph_report(pages):
        gated = pages.select(
            "host",
            F.size(F.split(wt3.strip_html(F.col("html")), " "))
            .cast("long").alias("n_words"),
        )
        edges = (
            pages.select(
                F.col("host").alias("src"),
                F.explode(wt3.extract_links(F.col("html"))).alias("u"),
            )
            .select("src", wt3.host_of("u").alias("dst"))
            .filter(F.col("dst") != "")
            .groupBy("src", "dst")
            .agg(F.count("*").cast("double").alias("w"))
        )
        ranks = graph2.pagerank(edges, iterations=3, weight="w")
        rep = gated.groupBy("host").agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("total_words"),
        )
        return rep.join(ranks, rep["host"] == ranks["node"]).select(
            "host", "n_docs", "total_words", F.round("rank", 6).alias("rank")
        )

    # 100x is the sf1-equivalent step (round-6 ask: the flagship's
    # next-10x claim measured, like crawl_to_chunks/web_curation)
    for copies in (1, 16, 100):
        m = (F.col("doc_id") % 50).cast("string")
        html = F.concat(
            F.lit('<p>'), F.col("text"),
            F.lit('</p><a href="http://h'),
            (F.col("doc_id") % 7).cast("string"),
            F.lit('.example.com/p">n</a><a href="http://site'),
            ((F.col("doc_id") * 2) % 50).cast("string"),
            F.lit('.example.com/x">peer</a>'),
        )
        corpus = amplified_big(copies).select(
            F.concat(F.lit("site"), m, F.lit(".example.com")).alias("host"),
            html.alias("html"),
        )
        bench(
            f"web_graph_x{copies}", base * copies,
            lambda c=corpus: noop(web_graph_report(c)),
        )

    # length-bucketed batch assignment: ONE scale-safe global_rank
    # (range shuffle + broadcast offsets) over (bucket, n_tokens, id);
    # falling us/doc at 100x pins the batcher as shuffle-bound, not
    # window-bound (a per-bucket window would be 5 tasks at any scale)
    from hadoop_distributed_dynamic_file_system_spark.operators import (
        curation as cur2,
    )

    for copies in (1, 100):
        corpus = amplified_big(copies).select("doc_id", "text")
        bench(
            f"length_batches_x{copies}", base * copies,
            lambda c=corpus: noop(
                cur2.length_bucketed_batches(c, "doc_id", "text")
            ),
        )

    # Degenerate LSH bucket (VERDICT r6 ask #2): n byte-identical
    # boilerplate docs collapse into ONE band bucket per band, so the
    # unguarded candidate join emits ~n²/2 pairs — ~1.25B at 50k
    # copies, the classic crawl-data LSH failure. max_bucket_size
    # drops the hot bucket (logged) and the run completes with
    # bounded output. The unguarded contrast runs at 5k copies
    # (~12.5M pairs — already 3 orders of magnitude past any honest
    # candidate set) so the suite's wall stays sane; the guarded row
    # runs the full 50k.
    boiler = ("click here to accept our cookie policy and subscribe "
              "to the newsletter for daily updates and offers today")

    def degenerate(n_copies):
        uniq = sf_docs.select("doc_id", "text").limit(1000)
        dup = spark.range(n_copies).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.lit(boiler).alias("text"),
        )
        return dup.unionByName(uniq)

    def lsh_pairs(corpus, guard):
        sigs = dedup.minhash_signatures(
            corpus, "doc_id", "text", num_hashes=8)
        return dedup.lsh_candidate_pairs(
            sigs, "doc_id", num_hashes=8, bands=4,
            max_bucket_size=guard)

    bench("lsh_degenerate_unguarded_5k", 5_000,
          lambda: noop(lsh_pairs(degenerate(5_000), None)), reps=1)
    bench("lsh_degenerate_guarded_50k", 50_000,
          lambda: noop(lsh_pairs(degenerate(50_000), 1_000)), reps=1)

    # Same adversarial shape through the pairwise-shingle path: every
    # boilerplate shingle has document frequency = n_copies, so the
    # intersection equi-join is quadratic in n_copies unguarded. The
    # max_doc_freq ceiling drops those shingles from the universe
    # (logged) and the 25k-copy corpus completes.
    def jaccard(corpus, cap):
        return dedup.ngram_jaccard_pairs(
            corpus, corpus, "doc_id", "text",
            threshold=0.99, max_doc_freq=cap)

    bench("ngram_df_unguarded_2k", 2_000,
          lambda: noop(jaccard(degenerate(2_000), None)), reps=1)
    bench("ngram_df_guarded_25k", 25_000,
          lambda: noop(jaccard(degenerate(25_000), 1_000)), reps=1)

    # Disjoint-band hamming join (round 7's full-recall 64-bit
    # near-pair machinery) at 200k and 2M synthetic codes: 4-member
    # clusters within hamming 2 of an xxhash64 center, so true pairs
    # grow linearly (6 per cluster) like a real near-dup corpus. At
    # 2M codes the 16-bit bands saturate (500k cluster centers into
    # 65536 values per band -> cross-cluster candidate collisions) —
    # that cost is REAL and inherent to multi-index hashing past
    # 2^band_bits codes; the honest scale lever is fewer/wider bands
    # (smaller radius) or longer codes, both documented on
    # banded_hamming_pairs.
    def hamming_codes(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            (
                F.xxhash64((F.col("id") / 4).cast("long"))
                .bitwiseXOR(F.pmod("id", F.lit(4)))
            ).alias("code"),
        )

    for n in (200_000, 2_000_000):
        codes = hamming_codes(n)
        bench(
            f"banded_hamming_{n // 1000}k", n,
            lambda c=codes: noop(dedup.banded_hamming_pairs(
                c, "doc_id", "code", max_hamming=3,
                max_bucket_size=100_000)),
        )

    # The 100x step (VERDICT r7 ask #7): 20M codes. Radius 3 keeps
    # 4x16-bit bands, and 20M >> 2^16 values/band means every band
    # bucket averages ~300 members — candidate generation goes
    # quadratic BY DESIGN of multi-index hashing past 2^band_bits
    # codes, not by a skew accident; that configuration is simply past
    # its design point. The documented lever is the radius/band trade,
    # so the 20M row runs the radius-1 configuration (2 disjoint
    # 32-bit bands, 20M << 2^32 -> near-unique buckets) that a 100 TB
    # image-dedup pass deploys after exact dedup, with a same-config
    # 2M row as the honest 10x comparison point.
    for n in (2_000_000, 20_000_000):
        codes = hamming_codes(n)
        bench(
            f"banded_hamming_r1_{n // 1000}k", n,
            lambda c=codes: noop(dedup.banded_hamming_pairs(
                c, "doc_id", "code", max_hamming=1, n_bands=2,
                max_bucket_size=100_000)),
        )

    # Frozen-index incremental dedup (round 8): freeze a 16x / 100x
    # all-distinct corpus' band index ONCE, then price a 1x arriving
    # batch's probe both ways — broadcast per band
    # (streaming_near_dedup's form, assumes the index fits executor
    # memory) and bucketed sort-merge (incremental_near_dedup_bucketed
    # — survives an index too big to broadcast; zero Exchange on the
    # frozen side, plan-pinned in tests/test_scale_types.py).
    # Freeze/stage cost is charged to NEITHER row: paid once per
    # corpus freeze, amortized over every later batch. Both forms
    # scan the whole index per probe, so both grow with index size
    # and are near-tied locally; what the bucketed form removes is
    # the per-batch re-shuffle and the executor-memory ceiling.
    from hadoop_distributed_dynamic_file_system_spark.streaming import (
        events as ev_mod,
    )

    def distinct_corpus(copies):
        # every TOKEN carries the copy salt, so every shingle — and
        # therefore every minhash band key — is distinct per copy and
        # the frozen index genuinely grows ~linearly with `copies`
        # (amplified()'s near-dups share band keys, which would hold
        # the index size flat and prove nothing about broadcast cost)
        parts = [
            sf_docs.select(
                (F.col("doc_id") + 100_000 * k).alias("doc_id"),
                F.regexp_replace(
                    "text", r"(\S+)", rf"s{k}$1"
                ).alias("text"),
            )
            for k in range(copies)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    for copies in (16, 100):
        frozen_corpus = distinct_corpus(copies)
        idx_path = f"/tmp/stress_frozen_idx_{copies}.parquet"
        dedup.lsh_band_index(frozen_corpus, "doc_id", "text").write.mode(
            "overwrite"
        ).parquet(idx_path)
        cache.release_all()
        idx = spark.read.parquet(idx_path)
        spark.sql("DROP TABLE IF EXISTS stress_frozen_bk")
        dedup.freeze_band_index_bucketed(
            frozen_corpus, "doc_id", "text", "stress_frozen_bk"
        )
        cache.release_all()
        bench(
            f"frozen_probe_broadcast_1x_vs_{copies}x", base,
            # explicit since round 10: "auto" became the gate default,
            # and this row prices the FORCED-broadcast strategy
            lambda i=idx: noop(ev_mod.streaming_near_dedup(
                sf_docs, i, index_mode="broadcast")),
        )
        bench(
            f"frozen_probe_bucketed_1x_vs_{copies}x", base,
            lambda: noop(dedup.incremental_near_dedup_bucketed(
                spark, sf_docs, "stress_frozen_bk", "doc_id", "text")),
        )
        if copies == 100:
            # Amortization check for the narrative's claim: a 16x
            # batch against the same 100x index should cost far less
            # than 16x the 1x probe if the per-probe index scan
            # dominates (it is paid once per BATCH, not per doc)
            batch16 = distinct_corpus(16)
            bench(
                "frozen_probe_bucketed_16x_vs_100x", base * 16,
                lambda b=batch16: noop(dedup.incremental_near_dedup_bucketed(
                    spark, b, "stress_frozen_bk", "doc_id", "text")),
            )
            # Round-10: the streaming AUTO mode priced at the scale a
            # broadcast cannot serve — REAL micro-batch runs of
            # streaming_near_dedup (index_mode="auto", the new
            # default) against the 100x BUCKETED frozen index with
            # the broadcast threshold disabled (standing in for the
            # statistics size-gate that disables it naturally once
            # the index passes the threshold), swept over micro-batch
            # granularity: the same 1x corpus arrives as 1, 4, or 16
            # triggers (maxFilesPerTrigger over a 16-file source).
            # Each micro-batch pays the per-batch plan + frozen-scan
            # join setup once, so the sweep prices exactly the
            # per-micro-batch overhead an ingest pipeline trades
            # against latency. The broadcast row above
            # (frozen_probe_broadcast_1x_vs_100x) is the 1-batch
            # forced-broadcast twin for comparison.
            import shutil as _sh

            stream_src = "/tmp/stress_stream_src"
            _sh.rmtree(stream_src, ignore_errors=True)
            sf_docs.select("doc_id", "text").repartition(16).write.parquet(
                stream_src
            )
            doc_schema = (
                spark.read.parquet(stream_src).schema
            )

            def stream_auto(mb, name):
                stream = ev_mod.read_parquet_dir_stream(
                    spark, stream_src, doc_schema,
                    max_files_per_trigger=mb,
                )
                ev_mod.run_to_memory(
                    ev_mod.streaming_near_dedup(
                        stream, spark.table("stress_frozen_bk")
                    ),
                    name,
                )

            prev_bc_s = spark.conf.get(
                "spark.sql.autoBroadcastJoinThreshold"
            )
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                for mb, n_b in ((16, 1), (4, 4), (1, 16)):
                    bench(
                        f"stream_auto_1x_vs_100x_{n_b}batches", base,
                        lambda mb=mb, n_b=n_b: stream_auto(
                            mb, f"stress_auto_{n_b}"
                        ),
                    )
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", prev_bc_s
                )
                _sh.rmtree(stream_src, ignore_errors=True)
            # Day-2 index growth (round 9): EXTEND the 100x index
            # with a 1x batch of genuinely-new keys (append — the
            # anti-join scans the frozen side Exchange-free, the
            # write is batch-sized, one file per touched bucket) vs
            # RE-FREEZING the whole 101x corpus (the corpus-sized
            # rewrite the append exists to avoid). reps=1 for the
            # extend: a second rep would find all keys frozen and
            # time an empty append.
            new_batch = sf_docs.select(
                (F.col("doc_id") + 100_000 * 500).alias("doc_id"),
                F.regexp_replace(
                    "text", r"(\S+)", r"s500\1"
                ).alias("text"),
            )
            bench(
                "extend_append_1x_into_100x", base,
                lambda: dedup.extend_band_index_bucketed(
                    spark, new_batch, "stress_frozen_bk",
                    "doc_id", "text"),
                reps=1,
            )
            spark.sql("DROP TABLE IF EXISTS stress_refreeze_bk")
            bench(
                "refreeze_whole_101x_corpus", base * 101,
                lambda: dedup.freeze_band_index_bucketed(
                    distinct_corpus(101), "doc_id", "text",
                    "stress_refreeze_bk"),
                reps=1,
            )
            spark.sql("DROP TABLE IF EXISTS stress_refreeze_bk")
            # Day-2 retraction (round 9): price the DELETE leg against
            # the same 100x corpus. The attributed freeze is the cost
            # of retractability (per-(bk,id) rows instead of distinct
            # bk); the retract itself must be TOMBSTONE-sized (a 10%
            # id list write, nowhere near the corpus); the tombstoned
            # probe shows the per-batch overhead of the broadcast
            # anti-join; compaction is the one corpus-sized fold that
            # retires it. reps=1 on the mutating steps (a second
            # retract appends nothing and would time an empty write).
            spark.sql("DROP TABLE IF EXISTS stress_frozen_attr")
            spark.sql(
                "DROP TABLE IF EXISTS stress_frozen_attr__tombstones"
            )
            corpus100 = distinct_corpus(100)
            bench(
                "freeze_attributed_100x", base * 100,
                lambda: dedup.freeze_band_index_attributed(
                    corpus100, "doc_id", "text", "stress_frozen_attr"),
                reps=1,
            )
            bench(
                "attr_probe_clean_1x_vs_100x", base,
                lambda: noop(dedup.incremental_near_dedup_attributed(
                    spark, sf_docs, "stress_frozen_attr",
                    "doc_id", "text")),
            )
            retract_ids = corpus100.select("doc_id").filter(
                F.col("doc_id") % 10 == 0
            )
            bench(
                "retract_10pct_of_100x", base * 10,
                lambda: dedup.retract_from_band_index(
                    spark, "stress_frozen_attr", retract_ids,
                    "doc_id"),
                reps=1,
            )
            bench(
                "attr_probe_tombstoned_1x_vs_100x", base,
                lambda: noop(dedup.incremental_near_dedup_attributed(
                    spark, sf_docs, "stress_frozen_attr",
                    "doc_id", "text")),
            )
            # the MONITOR leg priced on the state it exists for (10%
            # tombstoned): the cadence call must stay far below the
            # compaction it schedules
            bench(
                "health_census_100x_tombstoned", base * 100,
                lambda: noop(dedup.band_index_health(
                    spark, "stress_frozen_attr", "doc_id")),
            )
            bench(
                "compact_fold_10pct_of_100x", base * 100,
                lambda: dedup.compact_band_index_attributed(
                    spark, "stress_frozen_attr", "doc_id"),
                reps=1,
            )
            bench(
                "attr_probe_compacted_1x_vs_90x", base,
                lambda: noop(dedup.incremental_near_dedup_attributed(
                    spark, sf_docs, "stress_frozen_attr",
                    "doc_id", "text")),
            )
            # The ACTOR's fragmentation path at scale (round 11, r10
            # VERDICT ask #7): 32 append waves pile ~32 files onto
            # every touched bucket of the compacted 90x index — the
            # HadoopArchives small-file pathology, measured rather
            # than assumed. Priced: the appends themselves, the FILE
            # census (the actor's new signal — a driver-side Hadoop
            # listing), the full non-firing tick (row census + file
            # census), the probe TAX the fragmentation levies per
            # batch (vs the compacted probe row above), the FIRED
            # fold that repairs it, and the probe after repair.
            from hadoop_distributed_dynamic_file_system_spark.operators import (  # noqa: E501
                maintenance,
                skew as skew_ops,
            )

            wave_docs = sf_docs.select("doc_id", "text").filter(
                F.col("doc_id") % 4 == 0
            )
            n_waves = 32
            wave_rows = wave_docs.count()

            def frag_waves():
                for w in range(n_waves):
                    dedup.extend_band_index_attributed(
                        spark,
                        wave_docs.select(
                            (F.col("doc_id") + 100_000 * (600 + w)).alias(
                                "doc_id"
                            ),
                            F.regexp_replace(
                                "text", r"(\S+)", rf"w{w}\1"
                            ).alias("text"),
                        ),
                        "stress_frozen_attr", "doc_id", "text",
                    )

            bench(
                f"frag_append_{n_waves}waves_into_90x",
                n_waves * wave_rows, frag_waves, reps=1,
            )
            fc = skew_ops.bucket_file_census(spark, "stress_frozen_attr")
            bench(
                "frag_file_census_90x_fragmented", fc["n_files"],
                lambda: skew_ops.bucket_file_census(
                    spark, "stress_frozen_attr"),
            )
            def frag_tick(threshold, want_action):
                rec = maintenance.maintain_index(
                    spark, "stress_frozen_attr", "band",
                    max_files_per_bucket=threshold,
                )
                # a tick that decided differently than the row's label
                # would silently misprice the family on a regen
                assert rec["action"] == want_action, rec
                return rec

            bench(
                "frag_tick_not_fired_90x", base * 90,
                lambda: frag_tick(
                    max(2 * fc["max_files_per_bucket"], 64), "healthy"
                ),
            )
            bench(
                "frag_probe_fragmented_1x_vs_90x", base,
                lambda: noop(dedup.incremental_near_dedup_attributed(
                    spark, sf_docs, "stress_frozen_attr",
                    "doc_id", "text")),
            )
            bench(
                "frag_tick_fired_fold_90x", base * 90,
                lambda: frag_tick(8, "compacted"),
                reps=1,
            )
            bench(
                "frag_probe_refolded_1x_vs_90x", base,
                lambda: noop(dedup.incremental_near_dedup_attributed(
                    spark, sf_docs, "stress_frozen_attr",
                    "doc_id", "text")),
            )
            # Zero-downtime layout priced on the same 90x index
            # (round 11): the one-time generational migration is a
            # corpus-sized staged rewrite (≈ one fold), and the
            # catalog-only GENERATIONAL fold must cost the same wall
            # as the legacy fold above — the layout buys live-gate
            # survival with bytes (2x retention), not time. The tick
            # is forced through maintain_index so a pricing regen
            # also re-proves the daemon drives the generational swap.
            from hadoop_distributed_dynamic_file_system_spark.operators import (  # noqa: E501
                tombstones as tombstones_ops,
            )

            bench(
                "gen_migrate_90x", base * 90,
                lambda: tombstones_ops.enable_generational(
                    spark, "stress_frozen_attr", "doc_id"),
                reps=1,
            )
            dedup.extend_band_index_attributed(
                spark,
                sf_docs.select(
                    (F.col("doc_id") + 100_000 * 700).alias("doc_id"),
                    F.regexp_replace(
                        "text", r"(\S+)", r"g\1"
                    ).alias("text"),
                ),
                "stress_frozen_attr", "doc_id", "text",
            )
            bench(
                "gen_fold_90x_catalog_only_swap", base * 90,
                lambda: frag_tick(1, "compacted"),
                reps=1,
            )
            bench(
                "gen_probe_after_rollover_1x_vs_90x", base,
                lambda: noop(dedup.incremental_near_dedup_attributed(
                    spark, sf_docs, "stress_frozen_attr",
                    "doc_id", "text")),
            )
            spark.sql("DROP TABLE IF EXISTS stress_frozen_attr")
            spark.sql(
                "DROP TABLE IF EXISTS stress_frozen_attr__tombstones"
            )
            import shutil as _sh2

            for _suf in ("__genA", "__genB",
                         "__tombstones__genA", "__tombstones__genB"):
                _sh2.rmtree(
                    f"spark-warehouse/stress_frozen_attr{_suf}",
                    ignore_errors=True,
                )
        spark.sql("DROP TABLE IF EXISTS stress_frozen_bk")

    # Skew join at a NASTIER ratio than sf0.1's mild skew (VERDICT r6
    # ask #8): 99% of 10M fact rows collapse onto one key, dim is
    # non-broadcastable (threshold -1). Same three strategies as
    # bench.py's skew study; at cluster scale AQE's default 256 MB
    # threshold handles this without tuning, salting remains for
    # skew-under-aggregation where AQE can't re-plan. Reference
    # analog: the hand-partitioner idiom,
    # mapred/lib/KeyFieldBasedPartitioner.java:33.
    from hadoop_distributed_dynamic_file_system_spark.operators import skew

    n_skew = 10_000_000
    fact = spark.range(n_skew).select(
        F.when(F.pmod("id", F.lit(100)) < 99, F.lit(0))
        .otherwise(F.pmod("id", F.lit(1000)))
        .cast("long").alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    skew_confs = {
        "spark.sql.adaptive.skewJoin.enabled": "false",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    }
    saved = {k: spark.conf.get(k) for k in skew_confs}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for k, v in skew_confs.items():
            spark.conf.set(k, v)
        bench("skew99_join_plain_10m", n_skew,
              lambda: noop(fact.join(dim, on="k")))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        bench("skew99_join_aqe_10m", n_skew,
              lambda: noop(fact.join(dim, on="k")))
        bench("skew99_join_salted_10m", n_skew,
              lambda: noop(skew.salted_join(fact, dim, ["k"], salt=64)))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)

    out = [
        "# STRESS — plan shapes at 10-20x the benchmark scale (local[32])",
        "",
        "Per-row cost should stay flat (or fall, as fixed overhead",
        "amortizes) when rows grow 10x; growth here would mean a",
        "structure-bound plan that won't survive a cluster. Regenerate:",
        "`python tools/stress.py`.",
        "",
        "`union_graph_components_x16_dense` rows = EDGES (117M pairs is",
        "the true hamming<=3 relation of 16-bit SimHash over 80k",
        "near-identical docs — a deliberately degenerate dense graph);",
        "the row pins CC's edge-set persist (without it the candidate",
        "funnel re-executes 3x) and contract-then-solve on high degree.",
        "In-suite it also carries a ~1.6x session-position tax (it runs",
        "6th, after four min-of-2 heavy shapes fill executor storage):",
        "a 3-rep ISOLATED probe measures 54.8-64.1 s = 0.47-0.55",
        "us/edge (round-6 probe, fresh session) — read trend, not the",
        "absolute, for this row.",
        "",
        "`asof_join_events_x{1,10}` amplifies users with offset ids so",
        "per-key cardinality is constant; falling us/row on 10x events",
        "pins the as-of shape (union + partitioned window) as data-bound.",
        "",
        "`bpe_learn_dist_vocab_x{1,10}` rows = distinct VOCABULARY",
        "words (10 merge iterations each, all cluster-side); flat-or-",
        "falling us/word on the 10x vocabulary is the evidence the",
        "per-merge fold is vocabulary-bound, not driver-bound.",
        "",
        "`crawl_to_chunks_x{1,16,100}` rows = DOCUMENTS through the",
        "whole flagship ingest (gzip-member compress fixture + inflate",
        "+ NFC + dedup + chunk); falling us/doc through the 100x",
        "(sf1-equivalent) step pins it as decompression/scan-bound",
        "around its one 16-byte-key shuffle.",
        "",
        "`web_curation_x{2,16,100}` rows = DOCUMENTS through the",
        "curation flagship (Gopher gate -> exact dedup -> span dedup",
        "-> DSIR-weighted classifier -> split -> report); the DSIR",
        "model trains on the un-amplified originals (fixed model,",
        "growing corpus — the production shape). Flat-or-falling",
        "us/doc at 100x (>= sf1-equivalent) is the measured basis for",
        "the next 10x claim.",
        "",
        "`bm25_multi_query_q{3,200}` rows = QUERIES against the full",
        "sf0.1 corpus; falling us/query at 66x queries pins the",
        "postings-semi-join shape as amortizing its fixed corpus",
        "passes across the query relation.",
        "",
        "`pagerank_edges_{1,10}m` rows = EDGES (synthetic, avg",
        "out-degree 10, 3 power iterations); falling us/edge on the",
        "10x step pins the rank loop as edge-bound — per-iteration",
        "fixed overhead amortizes, joins grow with the edge list only.",
        "",
        "`web_graph_x{1,16,100}` rows = PAGES through the web-graph",
        "flagship (HTML link extraction -> host aggregation -> 3-round",
        "weighted PageRank -> host report); falling us/page through",
        "the sf1-equivalent 100x step pins the composite as",
        "extraction-bound around its bounded host-graph rank loop.",
        "",
        "`length_batches_x{1,100}` rows = DOCUMENTS through",
        "length-bucketed batch assignment (ONE scale-safe global_rank",
        "+ broadcast per-bucket offsets); falling us/doc at 100x pins",
        "the batcher as range-shuffle-bound, not window-bound.",
        "",
        "`lsh_degenerate_{unguarded_5k,guarded_50k}` rows = DOCUMENTS,",
        "all byte-identical boilerplate collapsing into ONE band bucket",
        "per band (VERDICT r6 ask #2's adversarial shape; reference",
        "test analog: the skew fixtures of mapred/join/",
        "TestDatamerge.java:77-160). Unguarded at just 5k copies the",
        "candidate join already emits ~12.5M pairs x 4 bands; at 50k it",
        "would be ~1.25B and is not runnable in this suite. With",
        "max_bucket_size=1000 the 50k-copy corpus COMPLETES in ~2.4s",
        "with bounded output and a logged drop — the guard converts a",
        "quadratic blow-up into a census + anti-join.",
        "",
        "`ngram_df_{unguarded_2k,guarded_25k}`: the same adversarial",
        "corpus through the pairwise-shingle Jaccard path, where every",
        "boilerplate shingle's document frequency equals the copy",
        "count and the intersection equi-join is quadratic unguarded.",
        "The max_doc_freq ceiling removes those shingles from the",
        "shingle universe (numerator AND denominators, logged) and",
        "the 12.5x-bigger corpus completes in bounded time.",
        "",
        "`banded_hamming_{200,2000}k` rows = 64-bit CODES through the",
        "full-recall disjoint-band hamming join (round 7; clustered",
        "synthetic codes, ~2k per cluster at 2M so buckets are",
        "realistic). Flat-or-falling us/code on the 10x step pins the",
        "join as band-bucket-bound, with the max_bucket_size guard",
        "armed.",
        "",
        "`banded_hamming_r1_{2000,20000}k`: the 100x step. Radius 3's",
        "4x16-bit banding is past its design point at 20M codes (20M",
        ">> 2^16 values/band -> ~300-member buckets -> quadratic",
        "candidates, inherent to multi-index hashing past 2^band_bits",
        "codes) — the honest lever is the radius/band trade, so these",
        "rows run radius 1 over 2 disjoint 32-bit bands (20M << 2^32,",
        "near-unique buckets), the configuration a 100 TB image-dedup",
        "pass deploys after exact dedup, with the same-config 2M row",
        "as the 10x comparison.",
        "",
        "`frozen_probe_{broadcast,bucketed}_1x_vs_{16,100}x` rows = a",
        "1x (5k-doc) arriving batch probed against the FROZEN band",
        "index of a 16x / 100x all-distinct corpus (every token",
        "salted per copy so the index genuinely grows; freeze/stage",
        "cost charged to neither row — paid once per corpus freeze).",
        "Broadcast is the streaming_near_dedup form (per-band",
        "broadcast; index must fit executor memory); bucketed is",
        "incremental_near_dedup_bucketed (sort-merge semi against the",
        "bucketed table, ZERO Exchange on the frozen side —",
        "plan-pinned; the per-bucket Sort remains, Spark does not",
        "consume sortBy metadata). Honest reading: BOTH forms scan",
        "the whole index per probe, so both grow with index size and",
        "the two are near-tied at local scale — what the bucketed",
        "form removes is the per-batch index re-SHUFFLE and the",
        "executor-memory ceiling, which is why past broadcastable",
        "size only the bucketed form exists at all. The",
        "`frozen_probe_bucketed_16x_vs_100x` row measures the",
        "amortization: the index-scan cost is paid once per BATCH,",
        "not per doc, so a 16x batch costs far less than 16x the 1x",
        "probe (read it per row — the us/row column divides by the",
        "batch size).",
        "",
        "`stream_auto_1x_vs_100x_{1,4,16}batches` (round 10) prices",
        "the streaming gates' new DEFAULT mode (index_mode=\"auto\")",
        "at the scale a broadcast cannot serve: REAL micro-batch runs",
        "against the 100x BUCKETED frozen index (broadcast threshold",
        "disabled, standing in for the statistics size-gate), the",
        "same 1x corpus arriving as 1, 4, or 16 triggers. Every",
        "micro-batch pays one frozen-index scan + per-batch plan",
        "setup (~1.1-1.7 s here) regardless of how few docs it",
        "carries, so wall grows ~linearly in trigger COUNT, not data:",
        "4 triggers cost ~2.6x the single-batch run and 16 triggers",
        "~7x. The micro-batch sweet spot is therefore the LARGEST",
        "batch the latency budget tolerates — size triggers so the",
        "per-batch index-scan floor is amortized over enough",
        "documents (here >= a 4-file trigger; a per-file trigger",
        "pays the floor per ~300 docs). At equal granularity the",
        "auto mode is TIED with `frozen_probe_broadcast_1x_vs_100x`",
        "(the forced-broadcast twin, feasible at local scale only):",
        "what auto removes is the executor-memory ceiling and the",
        "per-batch broadcast build, not scan work.",
        "",
        "`extend_append_1x_into_100x` vs `refreeze_whole_101x_corpus`",
        "(round 9) prices the day-2 index-growth choice: appending a",
        "1x batch's new band keys costs about ONE probe (the",
        "anti-join's scan of the frozen side dominates; the write is",
        "batch-sized, one file per touched bucket) while refreezing",
        "the whole 101x corpus re-pays signature + shuffle + write",
        "for every frozen doc — ~8.5x the wall here, and that gap",
        "widens linearly with corpus size (refreeze is O(corpus),",
        "append is O(batch + index scan)). compact_bucketed exists",
        "for the resulting per-bucket file growth, off the ingest",
        "path.",
        "",
        "`freeze_attributed_100x` / `attr_probe_*` /",
        "`retract_10pct_of_100x` / `compact_fold_10pct_of_100x`",
        "(round 9) price the day-2 DELETE leg. The attributed freeze",
        "is the cost of retractability (per-(bk,id) rows instead of",
        "distinct keys — more index rows, same shuffle count).",
        "Retracting 10% of the corpus costs a tombstone-sized id",
        "write, NOT a corpus rewrite (compare its wall to the",
        "refreeze row); the tombstoned probe vs the clean probe",
        "isolates the broadcast-anti-join overhead each batch pays",
        "while tombstones are outstanding; the compact row is the",
        "one corpus-sized fold that retires them (≈ a layout rewrite,",
        "NO signature recompute — cheaper than refreeze), after",
        "which the probe returns to clean cost over the 10%-smaller",
        "index. Read the attr rows AGAINST EACH OTHER, not against the",
        "mid-suite unattributed rows: the stanza runs dead-last and",
        "carries the documented late-session tax (~2x on small probes —",
        "the same shape priced 8 entries earlier reads ~2.4s), so the",
        "meaningful readings are tombstoned/clean (~1.1x: the anti-join",
        "is near-free) and compact wall vs refreeze wall (layout rewrite",
        "vs signature recompute).",
        "",
        "`health_census_100x_tombstoned` prices the MONITOR leg on the",
        "state it exists for (10% of the 100x index tombstoned): two",
        "layout-preserving scans of the frozen base (row census + live-key",
        "census, the latter riding the bk bucketing), so the cadence call",
        "that SCHEDULES compaction costs about one probe — far below the",
        "corpus-sized fold it decides on. Normalized per index row (n = the 100x index's source docs).",
        "",
        "`frag_*` (round 11) prices the ACTOR's fragmentation path on",
        "the compacted 90x attributed index: 32 append waves pile ~32",
        "files onto every touched bucket (rows = appended docs), then",
        "the family isolates each cost the maintain_index policy",
        "trades: `frag_file_census_90x_fragmented` (the new signal — a",
        "driver-side Hadoop FS recursive listing, rows = files) and",
        "`frag_tick_not_fired_90x` (row census + file census, the",
        "cadence call) must stay probe-cheap;",
        "`frag_probe_fragmented_1x_vs_90x` vs",
        "`attr_probe_compacted_1x_vs_90x` is the per-batch TAX",
        "fragmentation levies (listing + open of ~32x more files under",
        "the same bucketed scan); `frag_tick_fired_fold_90x` is the",
        "corpus-sized repair; `frag_probe_refolded_1x_vs_90x` shows",
        "the tax retired. Sweet-spot arithmetic for",
        "max_files_per_bucket: fire when accumulated per-batch tax",
        "exceeds the fold's amortized cost — (files_per_bucket x",
        "per-batch listing tax x batches until next fold) >= fold",
        "wall; with the measured numbers the default threshold 8",
        "(i.e., fold roughly every 8 append waves) keeps the probe tax",
        "within noise of the compacted probe while paying the fold",
        "~8x less often than the waves arrive (each wave adds at most",
        "one file per touched bucket). Measured round 11: census+tick",
        "2.0 s ~= one probe; fragmented probe 2.9 s vs 2.5 s compacted",
        "(the tax); fired fold 2.5 s ~= tick + the 0.8 s fold; refolded",
        "probe back to 2.6 s.",
        "",
        "`gen_*` (round 11) prices the ZERO-DOWNTIME generational",
        "layout on the same index: `gen_migrate_90x` is the one-time",
        "corpus-sized staged rewrite into the external ping-pong",
        "directories (~ one fold — the LAST rewrite that requires a",
        "quiescent window), and `gen_fold_90x_catalog_only_swap` is a",
        "maintain_index-driven fold in the generational layout — it",
        "must cost the same wall as the legacy `frag_tick_fired_fold`",
        "row (the layout buys live-gate survival with 2x retention",
        "bytes, not time; the swap itself is two catalog ops).",
        "",
        "`skew99_join_{plain,aqe,salted}_10m` rows = FACT rows, 99% on",
        "one key, dim non-broadcastable (threshold -1). Salted wins",
        "(~3.5x vs plain); AQE skew-split is statistically TIED with",
        "plain at this local scale (4.5 vs 3.8 s one run, 3.9 vs 4.0",
        "the next) — its split/coalesce scheduling costs about what",
        "one 9.9M-row partition saves on 32 local threads. Honest",
        "ordering here: salted <= {plain ~ AQE}.",
        "On a real cluster the fat partition is hundreds of GB and",
        "AQE's default 256 MB threshold splits it profitably without",
        "tuning; salting remains the tool for skew-under-aggregation",
        "where AQE cannot re-plan (reference analog: the hand-",
        "partitioner idiom, mapred/lib/KeyFieldBasedPartitioner.java:33).",
        "",
        "| shape | rows | wall s | us/row |",
        "|---|---|---|---|",
    ]
    for name, n, dt, us in rows:
        out.append(f"| {name} | {n:,} | {dt:.1f} | {us:.2f} |")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "STRESS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print("STRESS.md written")
    spark.stop()


if __name__ == "__main__":
    main()

"""URL/HTML crawl-record transforms (operators/webtext.py): edge cases
the oracle-checked queries don't exercise, plus plan-shape pins."""

import pytest
from pyspark.sql import functions as F

from hadoop_distributed_dynamic_file_system_spark.operators import webtext as W
from hadoop_distributed_dynamic_file_system_spark import queries_llm as qllm


def _one(spark, col, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(col.alias("v")).first().v


class TestNormalizeUrl:
    @pytest.mark.parametrize(
        "raw,want",
        [
            # case + default port + fragment
            ("HTTP://Ex.COM:80/A/b?Q=1#f", "http://ex.com/A/b?Q=1"),
            ("https://ex.com:443/x", "https://ex.com/x"),
            # NON-default port survives
            ("http://ex.com:8080/x", "http://ex.com:8080/x"),
            # :443 on http is NOT the default — survives
            ("http://ex.com:443/x", "http://ex.com:443/x"),
            # empty path -> '/', lone '?' dropped
            ("HTTPS://EX.com", "https://ex.com/"),
            ("http://ex.com?", "http://ex.com/"),
            # path bytes (case, escapes) preserved
            ("http://ex.com/%2Fa%41?x=Y", "http://ex.com/%2Fa%41?x=Y"),
        ],
    )
    def test_cases(self, spark, raw, want):
        assert _one(spark, W.normalize_url("u"), u=raw) == want

    def test_sql_twin_matches(self, spark):
        import duckdb

        urls = [
            "HTTP://Ex.COM:80/A/b?Q=1#f", "https://ex.com:443/x",
            "http://ex.com:8080/x", "HTTPS://EX.com", "http://ex.com?",
        ]
        got_spark = [
            _one(spark, W.normalize_url("u"), u=u) for u in urls
        ]
        con = duckdb.connect()
        got_duck = [
            con.execute(
                f"SELECT {W.normalize_url_sql('u')} FROM (SELECT ? AS u)",
                [u],
            ).fetchone()[0]
            for u in urls
        ]
        assert got_spark == got_duck


class TestRegistrableDomain:
    @pytest.mark.parametrize(
        "host,want",
        [
            ("a.b.Example.COM", "example.com"),
            ("news.example.co.uk", "example.co.uk"),
            ("example.co.uk", "example.co.uk"),  # bare eTLD+1
            ("deep.sub.example.co.jp", "example.co.jp"),
            ("example.net", "example.net"),
            ("localhost", "localhost"),  # dot-less fallback
        ],
    )
    def test_cases(self, spark, host, want):
        assert _one(spark, W.registrable_domain("h"), h=host) == want

    def test_bare_multilabel_suffix_keeps_two(self, spark):
        # 'example.co.uk' itself: endswith('.co.uk') is True only with
        # the leading dot, so the bare registrable domain is already
        # eTLD+1 and must NOT truncate to 'co.uk'
        assert (
            _one(spark, W.registrable_domain("h"), h="example.co.uk")
            == "example.co.uk"
        )


class TestStripHtml:
    def test_script_content_never_leaks(self, spark):
        h = '<p>a</p><script>SECRET="x < y > z"</script><p>b</p>'
        assert _one(spark, W.strip_html("h"), h=h) == "a b"

    def test_multiline_blocks_and_comments(self, spark):
        h = "<style>\n.c{}\n</style><!-- line1\nline2 -->ok"
        assert _one(spark, W.strip_html("h"), h=h) == "ok"

    def test_entities_decode_after_tags(self, spark):
        # a literal &lt;b&gt; must NOT resurrect a tag and get stripped
        h = "<p>&lt;b&gt; &amp;amp; &quot;q&#39;</p>"
        assert _one(spark, W.strip_html("h"), h=h) == "<b> &amp; \"q'"

    def test_case_insensitive_script(self, spark):
        h = "<SCRIPT a=b>x</ScRiPt>keep"
        assert _one(spark, W.strip_html("h"), h=h) == "keep"


class TestLinks:
    def test_relative_links_have_empty_host(self, spark):
        hosts = _one(
            spark,
            F.transform(W.extract_links("h"), lambda u: W.host_of(u)),
            h='<a href="/rel">r</a><a HREF="FTP://X.com/f">f</a>',
        )
        assert hosts == ["", "x.com"]

    def test_port_excluded_from_host(self, spark):
        assert _one(spark, W.host_of("u"), u="http://Ex.com:8080/p") == "ex.com"


class TestPlans:
    def test_webtext_queries_are_pure_codegen(self, spark, sf_dir):
        # the whole family must stay JVM-side: no Python eval nodes,
        # no shuffle in the per-record extraction query
        for name in ("html_text_extract", "url_normalized_dedup",
                     "registrable_domains", "html_host_links",
                     "jsonl_roundtrip"):
            plan = qllm.QUERIES[name](
                spark, sf_dir
            )._jdf.queryExecution().executedPlan().toString()
            for node in ("BatchEvalPython", "MapInPandas", "ArrowEvalPython"):
                assert node not in plan, f"{name} has {node}"
        scan_only = qllm.QUERIES["html_text_extract"](spark, sf_dir)
        plan = scan_only._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # per-record transform: no shuffle


class TestStreamingCrawlExtract:
    def test_stream_matches_batch_composition(self, spark, tmp_path):
        from hadoop_distributed_dynamic_file_system_spark.streaming import (
            events as ev,
        )

        batch = spark.createDataFrame(
            [
                (1, '<p>a b</p><script>x</script>'
                    '<a href="http://H1.ex.com/p">l</a>'),
                (2, '<h1>T&amp;c</h1><a href="/rel">r</a>'
                    '<a href="https://b.ex.com:443/q">m</a>'),
                (3, ""),
            ],
            "doc_id long, html string",
        )
        src = tmp_path / "crawl_pages_in"
        batch.coalesce(1).write.mode("append").parquet(str(src))
        stream = ev.read_parquet_dir_stream(
            spark, str(src), "doc_id long, html string"
        )
        out = ev.run_to_memory(
            ev.streaming_crawl_extract(stream), "crawl_extract_out"
        )
        got = {
            (r.doc_id, r.text, r.n_words, tuple(r.link_hosts))
            for r in out.collect()
        }
        twin = ev.streaming_crawl_extract(batch)  # same code path on batch
        want = {
            (r.doc_id, r.text, r.n_words, tuple(r.link_hosts))
            for r in twin.collect()
        }
        assert got == want and len(got) == 3
        by_id = {t[0]: t for t in got}
        assert by_id[1][1] == "a b l" and by_id[1][3] == ("h1.ex.com",)
        assert by_id[2][3] == ("b.ex.com",)  # relative link dropped


class TestRegistrableDomainPsl:
    def _psl(self, spark):
        rows = [("com",), ("uk",), ("co.uk",), ("io",), ("github.io",)]
        return spark.createDataFrame(rows, ["suffix"])

    def test_cases(self, spark):
        hosts = [
            (0, "pages.h1.GitHub.IO", "h1.github.io"),   # private suffix
            (1, "news.example.co.uk", "example.co.uk"),  # multi-label
            (2, "a.b.example.com", "example.com"),
            (3, "github.io", None),            # host IS a public suffix
            (4, "x.y.internal", "y.internal"),  # default '*' rule
            (5, "internal", None),              # single unknown label
        ]
        df = spark.createDataFrame(
            [(i, h) for i, h, _ in hosts], ["doc_id", "host"]
        )
        out = {
            r.doc_id: r.domain
            for r in W.registrable_domain_psl(
                df, "doc_id", "host", self._psl(spark)
            ).collect()
        }
        for i, _, want in hosts:
            assert out[i] == want, (i, out[i], want)

    def test_longest_suffix_wins(self, spark):
        # github.io must beat io even though both match
        df = spark.createDataFrame([(0, "a.b.github.io")], ["doc_id", "host"])
        out = W.registrable_domain_psl(
            df, "doc_id", "host", self._psl(spark)
        ).first()
        assert out.domain == "b.github.io"

    def test_psl_side_broadcasts(self, spark):
        df = spark.createDataFrame([(0, "a.example.com")], ["doc_id", "host"])
        plan = (
            W.registrable_domain_psl(df, "doc_id", "host", self._psl(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestRobots:
    def test_star_group_only(self, spark):
        robots = ("User-agent: bot\nDisallow: /all/\n\n"
                  "User-agent: *\nDisallow: /p/\nAllow: /pub/\n\n"
                  "User-agent: other\nDisallow: /x/")
        got = _one(spark, W.robots_disallow_prefixes("r"), r=robots)
        assert got == ["/p/"]  # not /all/ or /x/; Allow lines ignored

    def test_empty_disallow_means_allow_all(self, spark):
        robots = "User-agent: *\nDisallow:\n"
        assert _one(spark, W.robots_disallow_prefixes("r"), r=robots) == []

    def test_no_star_group(self, spark):
        robots = "User-agent: bot\nDisallow: /all/"
        assert _one(spark, W.robots_disallow_prefixes("r"), r=robots) == []

    def test_url_allowed(self, spark):
        df = spark.createDataFrame(
            [("/private/x", ["/private/", "/tmp/"]),
             ("/public/x", ["/private/"]),
             ("/x", [])],
            "p string, pre array<string>",
        )
        got = [
            r.v for r in df.select(
                W.url_allowed("p", F.col("pre")).alias("v")
            ).collect()
        ]
        assert got == [False, True, True]


class TestRobotsRep:
    ROBOTS = ("User-agent: bot\nDisallow: /\n\n"
              "User-agent: *\n"
              "Allow: /pub*.html$\n"
              "Disallow: /pub\n"
              "Disallow: /*.cgi$\n"
              "Allow: /")

    def _gate(self, spark, cases, robots=None):
        rows = [(i, p, robots or self.ROBOTS) for i, p in enumerate(cases)]
        df = spark.createDataFrame(rows, "doc_id INT, path STRING, robots STRING")
        out = W.robots_rep_allowed(df, "doc_id", "path", "robots").collect()
        return {r["path"]: r["allowed"] for r in out}

    def test_precedence_matrix(self, spark):
        got = self._gate(spark, [
            "/pub12.html",     # Allow /pub*.html$ (11) beats Disallow /pub (4)
            "/pub.html",       # '*' matches empty -> same Allow wins
            "/pub/idx",        # Disallow /pub beats Allow / (1)
            "/x.cgi",          # anchored wildcard Disallow
            "/x.cgi?q=1",      # query string escapes the '$' anchor -> Allow /
            "/home",           # catch-all Allow
        ])
        assert got == {
            "/pub12.html": 1, "/pub.html": 1, "/pub/idx": 0,
            "/x.cgi": 0, "/x.cgi?q=1": 1, "/home": 1,
        }

    def test_allow_wins_equal_length_tie(self, spark):
        robots = "User-agent: *\nAllow: /dir/\nDisallow: /dir/"
        got = self._gate(spark, ["/dir/x"], robots=robots)
        assert got["/dir/x"] == 1

    def test_no_matching_rule_is_allowed(self, spark):
        robots = "User-agent: *\nDisallow: /private"
        got = self._gate(spark, ["/open/x"], robots=robots)
        assert got["/open/x"] == 1

    def test_other_groups_do_not_leak(self, spark):
        robots = "User-agent: bot\nDisallow: /\n\nUser-agent: *\nAllow: /"
        got = self._gate(spark, ["/anything"], robots=robots)
        assert got["/anything"] == 1

    def test_like_metachars_in_pattern_are_literal(self, spark):
        # '%' and '_' in a robots pattern are literal characters, not
        # LIKE wildcards — the escape translation must neutralize them
        robots = "User-agent: *\nDisallow: /a%b\nDisallow: /c_d"
        got = self._gate(spark, ["/a%b/x", "/aXb/x", "/c_d", "/cXd"],
                         robots=robots)
        assert got == {"/a%b/x": 0, "/aXb/x": 1, "/c_d": 0, "/cXd": 1}

    def test_rules_parse_shape(self, spark):
        got = _one(spark, W.robots_rep_rules("r"), r=self.ROBOTS)
        assert [(r["allow"], r["pattern"]) for r in got] == [
            (1, "/pub*.html$"), (1, "/"), (0, "/pub"), (0, "/*.cgi$"),
        ]

    def test_crlf_and_case_insensitive_fields(self, spark):
        # RFC 9309: field names are case-insensitive, whitespace
        # around ':' is insignificant, and CRLF line endings are the
        # common server form. A CRLF-served, case-varied robots.txt
        # must yield the SAME rules as the canonical LF form — the
        # old LF-only exact-case grammar parsed zero rules and failed
        # OPEN (ADVICE r6).
        crlf = self.ROBOTS.replace("\n", "\r\n").replace(
            "User-agent: *", "USER-AGENT :\t*"
        ).replace("Disallow: /pub\r", "disallow:/pub\r")
        got = _one(spark, W.robots_rep_rules("r"), r=crlf)
        assert [(r["allow"], r["pattern"]) for r in got] == [
            (1, "/pub*.html$"), (1, "/"), (0, "/pub"), (0, "/*.cgi$"),
        ]
        # prefix tier: same normalization
        prefixes = _one(
            spark,
            W.robots_disallow_prefixes("r"),
            r="User-Agent:*\r\nDISALLOW: /private\r\nDisallow:\t/tmp/\r\n",
        )
        assert prefixes == ["/private", "/tmp/"]
        # gate parity through the full evaluator
        got = self._gate(spark, ["/pub12.html", "/pub/idx"], robots=crlf)
        assert got == {"/pub12.html": 1, "/pub/idx": 0}

    def test_crlf_duckdb_twin_parity(self, spark):
        import duckdb

        crlf = ("user-agent : *\r\nDisallow: /private\r\n"
                "ALLOW: /private/ok\r\n\r\nUser-agent: bot\r\nDisallow: /\r\n")
        con = duckdb.connect()
        con.execute("CREATE TABLE t AS SELECT ? AS r", [crlf])
        duck = con.execute(
            f"SELECT {W.robots_disallow_prefixes_sql('r')} AS p FROM t"
        ).fetchone()[0]
        spark_side = _one(spark, W.robots_disallow_prefixes("r"), r=crlf)
        assert duck == spark_side == ["/private"]

"""Unit tests for the four reference DSL parsers (SURVEY §4.3) —
semantic cases modeled on the reference's own parser tests
(TestKeyFieldHelper, TestFieldSelection, Parser.java grammar)."""

import pytest

from hadoop_distributed_dynamic_file_system_spark.operators.aggregate import (
    Descriptor,
    parse_descriptor,
)
from hadoop_distributed_dynamic_file_system_spark.operators.fieldsel import (
    FieldRange,
    parse_field_spec,
    parse_field_spec_list,
)
from hadoop_distributed_dynamic_file_system_spark.operators.joins import (
    parse_join_expr,
)
from hadoop_distributed_dynamic_file_system_spark.operators.sort import parse_key_spec


class TestFieldSpec:
    def test_survey_example(self):
        key, value = parse_field_spec("0-2:3,4,5-")
        assert key == [FieldRange(0, 2)]
        assert value == [FieldRange(3, 3), FieldRange(4, 4), FieldRange(5, None)]

    def test_single_and_ranges(self):
        assert parse_field_spec_list("7") == [FieldRange(7, 7)]
        assert parse_field_spec_list("1-3,5") == [FieldRange(1, 3), FieldRange(5, 5)]
        assert parse_field_spec_list("-2") == [FieldRange(0, 2)]  # open start
        assert parse_field_spec_list("4-") == [FieldRange(4, None)]

    def test_key_only(self):
        key, value = parse_field_spec("0,1")
        assert key == [FieldRange(0, 0), FieldRange(1, 1)]
        assert value == []


class TestKeySpec:
    def test_basic(self):
        (ks,) = parse_key_spec("-k2,2")
        assert (ks.field1, ks.field2, ks.numeric, ks.reverse) == (2, 2, False, False)

    def test_numeric_reverse(self):
        (ks,) = parse_key_spec("-k2,2nr")
        assert ks.numeric and ks.reverse

    def test_multi_spec_and_char_offset(self):
        a, b = parse_key_spec("-k2.3,4n -k1r")
        assert (a.field1, a.char1, a.field2, a.numeric) == (2, 3, 4, True)
        assert (b.field1, b.field2, b.reverse) == (1, None, True)

    def test_no_dash_k(self):
        (ks,) = parse_key_spec("3n")
        assert ks.field1 == 3 and ks.numeric

    def test_bad_spec(self):
        with pytest.raises(ValueError):
            parse_key_spec("-kx")


class TestJoinExpr:
    def test_nested(self):
        node = parse_join_expr('inner(tbl(fmt,"a"),outer(b,c))')
        assert node.op == "inner"
        assert node.children[0].op == "tbl" and node.children[0].ident == "a"
        assert node.children[1].op == "outer"
        assert [c.ident for c in node.children[1].children] == ["b", "c"]

    def test_override(self):
        node = parse_join_expr("override(a,b,c)")
        assert node.op == "override" and len(node.children) == 3

    def test_arity_error(self):
        with pytest.raises(ValueError):
            parse_join_expr("inner(a)")

    def test_trailing_garbage(self):
        with pytest.raises(ValueError):
            parse_join_expr("inner(a,b))")


class TestDescriptor:
    def test_full(self):
        d = parse_descriptor("LongValueSum:sum_qty:l_quantity")
        assert d == Descriptor("LongValueSum", "sum_qty", "l_quantity", None)

    def test_bare_alias_is_expr(self):
        d = parse_descriptor("DoubleValueSum:price")
        assert d.expr == "price"

    def test_bounded_uniq(self):
        d = parse_descriptor("UniqValueCount~100:u:k")
        assert d.bound == 100

    def test_unknown_function(self):
        with pytest.raises(ValueError):
            parse_descriptor("MedianValue:x:y")


class TestWarcSource:
    def _blob(self, spark):
        from pyspark.sql import functions as F

        rec = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: https://a.example.com/x/y?q=1\r\n"
            "Content-Length: 5\r\n\r\nhello\r\n\r\n"
            "WARC/1.0\r\nWARC-Type: request\r\n"
            "WARC-Target-URI: https://a.example.com/x/y\r\n"
            "Content-Length: 0\r\n\r\n\r\n\r\n"
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: http://ads.example.com/z\r\n"
            "Content-Length: 2\r\n\r\nad\r\n\r\n"
        )
        return spark.createDataFrame([(1, rec)], "doc_id long, blob string")

    def test_explode_and_parse(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.sources import warc
        from pyspark.sql import functions as F

        recs = warc.explode_warc_records(self._blob(spark), "doc_id", "blob")
        parsed = recs.select(
            "record_idx", warc.parse_warc_record(F.col("record")).alias("r")
        ).select("record_idx", "r.*").orderBy("record_idx").collect()
        assert [r.warc_type for r in parsed] == ["response", "request", "response"]
        assert parsed[0].target_uri == "https://a.example.com/x/y?q=1"
        assert parsed[0].content_length == 5 and parsed[0].body == "hello"
        assert parsed[2].body == "ad"

    def test_http_response_body_survives_embedded_blank_line(self, spark):
        """ADVICE-r5 medium: a real WARC response payload is HTTP
        headers + CRLFCRLF + HTML — the old blank-line regex kept only
        the HTTP header block. Content-Length slicing must keep the
        whole payload, and a body that *mentions* WARC/1.0 on its own
        line must not split the record stream."""
        from pyspark.sql import functions as F

        from hadoop_distributed_dynamic_file_system_spark.sources import warc

        http_body = (
            "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            "<html>about the\r\nWARC/1.0\r\nformat</html>"
        )
        rec = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: https://a.example.com/w\r\n"
            f"Content-Length: {len(http_body)}\r\n\r\n{http_body}\r\n\r\n"
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: https://b.example.com/v\r\n"
            "Content-Length: 4\r\n\r\nnext\r\n\r\n"
        )
        df = spark.createDataFrame([(1, rec)], "doc_id long, blob string")
        out = (
            warc.explode_warc_records(df, "doc_id", "blob")
            .select(
                "record_idx",
                warc.parse_warc_record(F.col("record")).alias("r"),
            )
            .select("record_idx", "r.*")
            .orderBy("record_idx")
            .collect()
        )
        assert len(out) == 2, "WARC/1.0 inside a body must not split"
        assert out[0].body == http_body
        assert out[1].body == "next"

    def test_missing_content_length_falls_back_to_blank_line(self, spark):
        from pyspark.sql import functions as F

        from hadoop_distributed_dynamic_file_system_spark.sources import warc

        rec = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: https://a.example.com/x\r\n\r\nhello\r\n\r\n"
        )
        df = spark.createDataFrame([(1, rec)], "doc_id long, blob string")
        r = (
            warc.explode_warc_records(df, "doc_id", "blob")
            .select(warc.parse_warc_record(F.col("record")).alias("r"))
            .select("r.*")
            .collect()[0]
        )
        assert r.content_length is None and r.body == "hello"

    def test_oversized_content_length_degrades_not_raises(self, spark):
        """Content-Length > 2^31-1 is legal WARC; a hard int cast
        raises CAST_OVERFLOW under ANSI and kills the ingest job
        (ADVICE r6). The record must degrade to the blank-line slice
        like a length-less one."""
        from pyspark.sql import functions as F

        from hadoop_distributed_dynamic_file_system_spark.sources import warc

        rec = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: https://a.example.com/big\r\n"
            "Content-Length: 3000000000\r\n\r\nbody-bytes\r\n\r\n"
        )
        df = spark.createDataFrame([(1, rec)], "doc_id long, blob string")
        r = (
            warc.explode_warc_records(df, "doc_id", "blob")
            .select(warc.parse_warc_record(F.col("record")).alias("r"))
            .select("r.*")
            .collect()[0]
        )
        assert r.content_length == 3_000_000_000  # long survives
        assert r.body == "body-bytes"  # blank-line fallback, no raise

    def test_url_helpers(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.sources import warc
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("https://h.example.com/a/b/c?q=2#f",)], "url string"
        )
        r = df.select(
            warc.url_host(F.col("url")).alias("h"),
            warc.strip_query(F.col("url")).alias("s"),
            warc.path_depth(F.col("url")).alias("d"),
        ).collect()[0]
        assert r.h == "h.example.com"
        assert r.s == "https://h.example.com/a/b/c"
        assert r.d == 3

    def test_gzip_member_split_pure(self):
        from hadoop_distributed_dynamic_file_system_spark.sources import warc

        a, b = b"alpha record", b"beta " * 100
        blob = warc.gzip_member(a) + warc.gzip_member(b)
        assert warc.split_gzip_members(blob) == [a, b]
        # deterministic writer (no wall-clock mtime in the header)
        assert warc.gzip_member(a) == warc.gzip_member(a)
        # tolerant paths: empty, non-gzip, truncated tail keeps prefix
        assert warc.split_gzip_members(b"") == []
        assert warc.split_gzip_members(b"not gzip") == []
        assert warc.split_gzip_members(
            warc.gzip_member(a) + warc.gzip_member(b)[:-4]
        ) == [a]
        assert warc.split_gzip_members(None) == []

    def test_explode_gzip_member_records(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.sources import warc
        from pyspark.sql import functions as F

        rec0 = (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: https://a.example.com/x\r\n"
            "Content-Length: 5\r\n\r\nhello\r\n\r\n"
        )
        rec1 = (
            "WARC/1.0\r\nWARC-Type: request\r\n"
            "WARC-Target-URI: https://a.example.com/x\r\n"
            "Content-Length: 0\r\n\r\n\r\n\r\n"
        )
        blob = warc.gzip_member(rec0.encode()) + warc.gzip_member(rec1.encode())
        df = spark.createDataFrame([(7, blob)], "doc_id long, blob binary")
        out = (
            warc.explode_gzip_member_records(df, "doc_id", "blob")
            .select(
                "doc_id", "member_idx",
                warc.parse_warc_record(F.col("record")).alias("r"),
            )
            .select("doc_id", "member_idx", "r.*")
            .orderBy("member_idx")
            .collect()
        )
        assert [(r.doc_id, r.member_idx, r.warc_type) for r in out] == [
            (7, 0, "response"), (7, 1, "request"),
        ]
        assert out[0].body == "hello" and out[0].content_length == 5

    def test_url_filter_blocks_hosts_and_depth(self, spark):
        from hadoop_distributed_dynamic_file_system_spark.sources import warc

        df = spark.createDataFrame(
            [
                (1, "https://ok.example.com/a"),
                (2, "https://ads.example.com/a"),
                (3, "https://ok.example.com/a/b/c/d/e"),
            ],
            "doc_id long, url string",
        )
        kept = {
            r.doc_id
            for r in warc.url_filter(
                df, "url", blocked_host_re=r"^ads\.", max_path_depth=3
            ).collect()
        }
        assert kept == {1}


class TestCsvWireFormat:
    def test_rfc4180_roundtrip_with_embedded_specials(self, spark, tmp_path):
        # delimiter, doubled quote, and an embedded newline in one cell
        rows = [
            (1, 'plain'),
            (2, 'a,b "quoted"\nsecond line'),
            (3, 'trailing quote "'),
        ]
        df = spark.createDataFrame(rows, "id INT, t STRING")
        path = str(tmp_path / "csv")
        (df.write.mode("overwrite").option("header", "true")
           .option("quoteAll", "true").option("escape", '"').csv(path))
        back = (spark.read.schema("id INT, t STRING")
                .option("header", "true").option("multiLine", "true")
                .option("escape", '"').csv(path))
        got = {r["id"]: r["t"] for r in back.collect()}
        assert got == dict(rows)  # lossless, record boundaries intact

"""Regression tests for the local correctness gate itself.

Round 4 shipped a driver-red cell (`bpe_pair_counts`) because
tools/check.py fetched DuckDB results via fetchall(), which collapses
HUGEINT (Arrow decimal128) to plain Python int — so the local gate
passed what the driver's Arrow-level hash failed. These tests pin the
fixed behavior: the checker must FAIL on the pre-fix oracle shape
(uncast integer sum) and pass on the cast form.
"""

import duckdb
import pytest

from tools.check import arrow_type_class, compare, spark_type_class
from tools.lint_oracles import SUSPECT_TYPES


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


class TestArrowTypeGate:
    def test_uncast_sum_flagged_as_decimal_vs_int(self, spark, duck):
        """The exact r4 failure: DuckDB sum(BIGINT) -> HUGEINT ->
        decimal128 at the Arrow layer, Spark emits int64. fetchall()
        would hide this; the Arrow fetch must not."""
        sdf = spark.createDataFrame([("ab", 10)], "pair string, cnt long")
        tbl = duck.execute(
            "SELECT 'ab' AS pair, sum(x) AS cnt FROM (SELECT CAST(10 AS BIGINT) x) GROUP BY 1"
        ).fetch_arrow_table()
        problems = compare("prefix_bpe_shape", sdf, tbl)
        assert problems, "checker must flag uncast integer sum (decimal vs int)"
        assert any("type[cnt]" in p and "decimal" in p for p in problems)

    def test_cast_sum_passes(self, spark, duck):
        sdf = spark.createDataFrame([("ab", 10)], "pair string, cnt long")
        tbl = duck.execute(
            "SELECT 'ab' AS pair, CAST(sum(x) AS BIGINT) AS cnt"
            " FROM (SELECT CAST(10 AS BIGINT) x) GROUP BY 1"
        ).fetch_arrow_table()
        assert compare("cast_ok", sdf, tbl) == []

    def test_value_mismatch_still_caught(self, spark, duck):
        sdf = spark.createDataFrame([("ab", 11)], "pair string, cnt long")
        tbl = duck.execute(
            "SELECT 'ab' AS pair, CAST(10 AS BIGINT) AS cnt"
        ).fetch_arrow_table()
        assert any("values differ" in p for p in compare("val", sdf, tbl))

    def test_type_class_maps_agree_on_common_types(self, spark, duck):
        sdf = spark.createDataFrame(
            [(1, 1.5, "x", True)], "a long, b double, c string, d boolean"
        )
        tbl = duck.execute(
            "SELECT CAST(1 AS BIGINT) a, CAST(1.5 AS DOUBLE) b, 'x' c, true d"
        ).fetch_arrow_table()
        assert compare("types", sdf, tbl) == []
        for f, at in zip(sdf.schema.fields, tbl.schema):
            assert spark_type_class(f.dataType) == arrow_type_class(at.type)


class TestOracleLint:
    def test_lint_flags_prefix_oracle(self, duck):
        """The pre-fix bpe_pair_counts projection must be flagged."""
        desc = duck.execute(
            "DESCRIBE SELECT sum(x) AS cnt FROM (SELECT CAST(1 AS BIGINT) x)"
        ).fetchall()
        assert any(
            any(s in t.upper() for s in SUSPECT_TYPES) for _, t, *_ in desc
        ), "DESCRIBE of an uncast BIGINT sum must show HUGEINT"

    def test_all_registered_oracles_clean(self):
        from tools.lint_oracles import lint

        assert lint("/root/testdata/sf0.001") == 0

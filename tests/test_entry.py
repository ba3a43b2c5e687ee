"""Driver-contract integrity: the _PRIORITY window must reference only
registered queries (a typo'd name would silently slide a different
query into the driver's 50-slot oracle window), and every registered
query must have an oracle twin unless deliberately rows-only."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_priority_names_are_all_registered():
    import __spark_entry__ as e
    from hadoop_distributed_dynamic_file_system_spark import queries as q
    from hadoop_distributed_dynamic_file_system_spark import queries_llm  # noqa: F401

    missing = [n for n in e._PRIORITY if n not in q.QUERIES]
    assert not missing, f"_PRIORITY names not in QUERIES registry: {missing}"


def test_priority_has_no_duplicates():
    import __spark_entry__ as e

    dupes = {n for n in e._PRIORITY if e._PRIORITY.count(n) > 1}
    assert not dupes, f"duplicate _PRIORITY entries: {dupes}"


def test_window_entries_all_have_oracles():
    import __spark_entry__ as e

    qs = list(e.queries())[:50]
    oracles = e.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    assert not missing, f"window queries without oracle SQL: {missing}"

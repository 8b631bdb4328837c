"""Every registered query with an oracle must hash-match DuckDB at
sf0.001 (the driver repeats this at sf0.01). Rows-only queries are
checked for executability + non-degenerate schema."""

from __future__ import annotations

import pytest

from kpipe_spark.queries import all_queries
from tests.conftest import SF_DIR, compare_with_oracle

_QUERIES = all_queries()
_WITH_ORACLE = sorted(n for n, q in _QUERIES.items() if q.oracle)
_ROWS_ONLY = sorted(n for n, q in _QUERIES.items() if not q.oracle)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, oracle_con, name):
    q = _QUERIES[name]
    df = q.build(spark, SF_DIR)
    compare_with_oracle(df, oracle_con, q.oracle)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_query_runs(spark, name):
    q = _QUERIES[name]
    df = q.build(spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # driver contract: every queries() key with an oracle_sql entry
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 20

"""Driver-contract smoke: entry() runs and the query/oracle registries
stay consistent (every oracle key is a query key; names are unique)."""

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mod():
    return importlib.import_module("__spark_entry__")


def test_entry_runs_and_has_stable_schema(spark):
    df = _mod().entry(spark)
    cols = set(df.columns)
    assert {"object_key", "chunk_count", "mapped_bytes", "shared_chunks"} == cols
    rows = df.limit(5).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r.chunk_count >= 1 and r.mapped_bytes > 0


def test_registry_consistency():
    m = _mod()
    qs = m.queries()
    oracles = m.oracle_sql()
    assert len(qs) >= 50
    # every oracle belongs to a registered query
    assert set(oracles) <= set(qs)
    # rows-only entries are the documented non-SQL-expressible minority
    rows_only = set(qs) - set(oracles)
    assert len(rows_only) <= len(qs) // 4
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip().upper().startswith(("SELECT", "WITH")), name

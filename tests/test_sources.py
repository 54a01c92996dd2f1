"""Reader normalization contract over the REAL driver testdata.

Round-1 regression: the driver's parquet stores timestamps with
isAdjustedToUTC=false, which Spark 4's default inference reads as
TIMESTAMP_NTZ — a type that rejects ``unix_micros`` and crashed two
queries (and the whole bench) in round 1. These tests read the actual
testdata path, not locally-built fixtures, so a type drift in the
driver's files is caught here first.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from watsondedupe_spark.sources import read_table

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def test_no_ntz_timestamps_any_table(spark, sf_dir):
    for name in TABLES:
        if not os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            continue
        dtypes = dict(read_table(spark, sf_dir, name).dtypes)
        ntz = [c for c, t in dtypes.items() if t == "timestamp_ntz"]
        assert not ntz, f"{name}: NTZ columns leaked through read_table: {ntz}"


def test_events_ts_supports_epoch_arithmetic(spark, sf_dir):
    # the exact expression that crashed round 1 (relational_ext.py:445,510)
    row = (
        read_table(spark, sf_dir, "events")
        .select(F.unix_micros("ts").alias("us"))
        .agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
        .collect()[0]
    )
    assert row.lo is not None and row.hi >= row.lo


def test_read_table_normalizes_even_with_ntz_inference_on(spark, sf_dir):
    """The grading driver supplies its OWN session (no session.py config),
    so the cast inside read_table must cover NTZ inference being on."""
    key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    old = spark.conf.get(key)
    spark.conf.set(key, "true")
    try:
        raw_t = dict(spark.read.parquet(os.path.join(sf_dir, "events.parquet")).dtypes)["ts"]
        norm_t = dict(read_table(spark, sf_dir, "events").dtypes)["ts"]
    finally:
        spark.conf.set(key, old)
    assert raw_t == "timestamp_ntz", "testdata no longer NTZ — update _NANO/NTZ handling"
    assert norm_t == "timestamp"


def test_ntz_cast_matches_duckdb_epoch(spark, sf_dir):
    """Value-level pin: unix_micros over the cast column equals DuckDB's
    epoch_us over the same file (both treat the naive stamps as UTC)."""
    duckdb = pytest.importorskip("duckdb")
    path = os.path.join(sf_dir, "events.parquet")
    spark_sum = (
        read_table(spark, sf_dir, "events").agg(F.sum(F.unix_micros("ts"))).collect()[0][0]
    )
    duck_sum = duckdb.sql(f"SELECT SUM(epoch_us(ts)) FROM '{path}'").fetchone()[0]
    assert spark_sum == duck_sum


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC write/read roundtrip over real testdata plus pushdown proof:
    the key filter must reach the ORC scan as a search argument."""
    from watsondedupe_spark.sources import read_orc, write_orc

    src = read_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(src, path)
    back = read_orc(spark, path)
    assert back.schema == src.schema
    assert sorted(r.n_nationkey for r in back.collect()) == sorted(
        r.n_nationkey for r in src.collect()
    )
    plan = (
        back.filter(F.col("n_nationkey") == 3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "n_nationkey" in plan and "PushedFilters" in plan

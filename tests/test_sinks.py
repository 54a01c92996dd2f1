"""Sink layouts must deliver their read-side promises: partition pruning
for partitioned writes, shuffle-free joins for bucketed writes, prefix
pruning for the chunk store."""

import pytest
from pyspark.sql import functions as F

from watsondedupe_spark import plans as P
from watsondedupe_spark import sinks as S
from watsondedupe_spark.sources import read_table


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_prio")
    orders = read_table(spark, sf_dir, "orders")
    S.write_partitioned(orders, out, ["o_orderpriority"])

    df = spark.read.parquet(out).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = P.physical_plan(df)
    # the partition predicate must show up as a PartitionFilter, not a
    # post-scan Filter over all rows
    assert "PartitionFilters" in plan and "o_orderpriority" in plan.split("PartitionFilters")[1].split("]")[0]
    got = df.count()
    want = orders.filter(F.col("o_orderpriority") == "1-URGENT").count()
    assert got == want > 0


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Two tables bucketed on the join key with equal bucket counts join
    with zero Exchange operators — the co-located join that makes the
    fact-to-fact join survivable at 100 TB."""
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    S.write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"])
    S.write_bucketed(lineitem, "b_lineitem", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"])
    try:
        joined = (
            spark.table("b_lineitem")
            .join(
                spark.table("b_orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .select("l_orderkey", "o_orderdate", "l_quantity")
        )
        # AQE wraps the plan; the join itself must read bucketed scans
        # with no shuffle on either side
        assert P.shuffle_count(joined) == 0
        assert joined.count() == lineitem.count()

        # control: the same join over plain (unbucketed) parquet shuffles
        plain = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
            "l_orderkey", "o_orderdate", "l_quantity"
        )
        assert P.shuffle_count(plain) > 0 or P.uses_broadcast_join(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_chunk_store_layout_prunes_by_prefix(spark, tmp_path):
    from watsondedupe_spark.chunking import ChunkSettings, chunk_objects

    out = str(tmp_path / "cs")
    df = spark.createDataFrame(
        [(f"o{i}", bytearray(bytes([i]) * 50000)) for i in range(4)],
        "object_key string, data binary",
    )
    rows = chunk_objects(df, ChunkSettings(2048, 16384, 128, 2)).select(
        "chunk_key", F.col("chunk_data").alias("data")
    )
    S.write_chunk_store_layout(rows, out)

    one_key = rows.limit(1).collect()[0].chunk_key
    store = S.read_chunk_store_layout(spark, out)
    hit = store.filter(
        (F.col("key_prefix") == one_key[:2]) & (F.col("chunk_key") == one_key)
    )
    plan = P.physical_plan(hit)
    assert "PartitionFilters" in plan and "key_prefix" in plan.split("PartitionFilters")[1].split("]")[0]
    assert hit.count() >= 1
    assert bytes(hit.collect()[0].data) == bytes(
        [r for r in rows.collect() if r.chunk_key == one_key][0].data
    )


def test_jsonl_and_csv_sources_roundtrip_documents(spark, sf_dir, tmp_path):
    """The declared-schema jsonl/csv readers must reproduce the parquet
    rows exactly (no inference drift on ids or lengths)."""
    from watsondedupe_spark.sources import read_csv, read_jsonl, read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    want = {(r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in docs.collect()}
    schema = "doc_id long, text string, lang string, source string, n_chars long"

    jl = str(tmp_path / "docs_jsonl")
    docs.write.json(jl)
    got_j = {
        (r.doc_id, r.text, r.lang, r.source, r.n_chars)
        for r in read_jsonl(spark, jl, schema).collect()
    }
    assert got_j == want

    cs = str(tmp_path / "docs_csv")
    # quote/escape defaults round-trip embedded commas; header mode on
    docs.write.option("header", "true").csv(cs)
    got_c = {
        (r.doc_id, r.text, r.lang, r.source, r.n_chars)
        for r in read_csv(spark, cs, schema).collect()
    }
    assert got_c == want


# ---------------------------------------------------------------------------
# custom Python Data Source (blobgen)
# ---------------------------------------------------------------------------


def test_blobgen_datasource_deterministic_and_partitioned(spark):
    from watsondedupe_spark.sources.blobgen import BlobGenDataSource

    spark.dataSource.register(BlobGenDataSource)
    df = (
        spark.read.format("blobgen")
        .option("n", 100)
        .option("parts", 8)
        .option("blob_bytes", 512)
        .load()
    )
    assert df.rdd.getNumPartitions() == 8
    rows = {r.id: (bytes(r.payload), r.is_dup) for r in df.collect()}
    assert len(rows) == 100
    assert all(len(p) == 512 for p, _ in rows.values())
    # planted duplicates: every 10th object repeats payload 0
    assert rows[10][0] == rows[0][0] and rows[10][1]
    assert rows[11][0] != rows[0][0] and not rows[11][1]
    # reproducible across reads
    again = {r.id: bytes(r.payload) for r in
             spark.read.format("blobgen").option("n", 100).option("parts", 4)
             .option("blob_bytes", 512).load().collect()}
    assert {i: p for i, (p, _) in rows.items()} == again


def test_blobgen_feeds_the_dedupe_engine(spark, tmp_path):
    from watsondedupe_spark.engine import DedupeEngine
    from watsondedupe_spark.sources.blobgen import BlobGenDataSource
    from pyspark.sql import functions as F

    spark.dataSource.register(BlobGenDataSource)
    objs = (
        spark.read.format("blobgen")
        .option("n", 40)
        .option("parts", 4)
        .option("blob_bytes", 6000)
        .option("dup_every", 4)
        .load()
        .select(F.col("object_key"), F.col("payload").alias("data"))
    )
    eng = DedupeEngine.create(spark, str(tmp_path / "blob_idx"))
    assert eng.write_batch(objs) == 40
    s = eng.stats()
    # 9 planted duplicates of payload 0 => physical < logical
    assert s.logical_bytes == 40 * 6000
    assert s.physical_bytes < s.logical_bytes
    assert eng.get("blob/00000004") == eng.get("blob/00000000")

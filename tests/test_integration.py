"""End-to-end narrative: the whole engine lifecycle in one story.

Custom connector -> batch dedupe ingest -> point/ranged reads ->
second batch -> snapshot time travel + incremental views -> optimize
-> cascading delete with GC — the sequence a real deployment runs,
asserted against ground truth the connector plants.
"""

import pytest
from pyspark.sql import functions as F

from watsondedupe_spark.engine import DedupeEngine
from watsondedupe_spark.sources.blobgen import BlobGenDataSource


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    spark.dataSource.register(BlobGenDataSource)
    root = str(tmp_path_factory.mktemp("lake") / "idx")
    eng = DedupeEngine.create(spark, root)

    def batch(start, n, dup_every=5):
        return (
            spark.read.format("blobgen")
            .option("n", start + n)
            .option("parts", 4)
            .option("blob_bytes", 6000)
            .option("dup_every", dup_every)
            .load()
            .filter(F.col("id") >= start)
            .select("object_key", F.col("payload").alias("data"))
        )

    return eng, batch


def test_full_lifecycle(spark, lake):
    eng, batch = lake

    # -- batch 1: 30 objects, every 5th repeats payload 0 ------------------
    assert eng.write_batch(batch(0, 30)) == 30
    s1 = eng.stats()
    assert s1.object_count == 30
    assert s1.logical_bytes == 30 * 6000
    assert s1.physical_bytes < s1.logical_bytes  # planted dups deduplicated
    assert eng.get("blob/00000005") == eng.get("blob/00000000")

    v_chunks = eng.store.current_version("chunks")
    v_objects = eng.store.current_version("objects")

    # -- batch 2: 20 more --------------------------------------------------
    assert eng.write_batch(batch(30, 20)) == 20
    assert eng.stats().object_count == 50

    # time travel: the old snapshot still answers with batch-1 state
    old_chunks = eng.store.read_version("chunks", v_chunks)
    assert old_chunks.count() < eng.chunks.count()

    # incremental views: exactly batch 2's objects, nothing re-listed
    inc = eng.objects_added_since(v_objects)
    assert inc.count() == 20
    assert inc.agg(F.min("object_key")).collect()[0][0] == "blob/00000030"
    new_chunk_keys = {r.chunk_key for r in eng.chunks_added_since(v_chunks).collect()}
    old_keys = {r.chunk_key for r in old_chunks.collect()}
    assert new_chunk_keys.isdisjoint(old_keys)

    # -- optimize: folds parts, changes no answers -------------------------
    before = eng.get("blob/00000037")
    versions = eng.optimize()
    assert set(versions) == {"objects", "object_map", "chunks", "chunk_store"}
    assert len(eng.store._state("object_map")["parts"]) == 1
    assert eng.get("blob/00000037") == before

    # -- delete with GC: unique chunks leave, shared chunks stay -----------
    doomed = [f"blob/{i:08d}" for i in range(30, 50)]
    gc_keys = eng.delete_batch(doomed)
    assert eng.stats().object_count == 30
    assert not eng.exists("blob/00000031")
    # every GC'd payload is gone from the store; all survivors readable
    remaining = {r.chunk_key for r in eng.chunk_store.select("chunk_key").collect()}
    assert remaining.isdisjoint(set(gc_keys))
    assert eng.get("blob/00000029")  # spot-check reassembly still works
    # refcount invariant holds after the whole story
    refsum = eng.chunks.agg(F.sum("ref_count")).collect()[0][0]
    assert refsum == eng.object_map.count()

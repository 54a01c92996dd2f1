"""Manifest-of-parts store: time travel, retention, and GC safety."""

import pytest

from watsondedupe_spark.store import IndexStore


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "cast(id as string) as object_key",
        "cast(id as long) as id",
        "cast(id as long) as original_length",
        "cast(id as long) as comp_length",
        "cast(1 as long) as chunk_count",
        "timestamp'2024-01-01' as created_utc",
    ).select("id", "object_key", "original_length", "comp_length", "chunk_count", "created_utc")


def test_time_travel_reads_each_version(spark, tmp_path):
    st = IndexStore(spark, str(tmp_path))
    st.commit("objects", _df(spark, 0, 10))      # v1: 10 rows
    st.append("objects", _df(spark, 10, 15))     # v2: 15 rows
    st.append("objects", _df(spark, 15, 17))     # v3: 17 rows
    assert st.read("objects").count() == 17
    assert st.read_version("objects", 1).count() == 10
    assert st.read_version("objects", 2).count() == 15
    assert st.read_version("objects", 3).count() == 17
    assert st.versions("objects") == [1, 2, 3]


def test_retention_expires_old_versions(spark, tmp_path):
    st = IndexStore(spark, str(tmp_path))
    st.retain_versions = 3
    for i in range(6):
        st.append("objects", _df(spark, i * 2, i * 2 + 2))
    vs = st.versions("objects")
    assert vs == [3, 4, 5, 6]  # floor = 6 - 3
    with pytest.raises(ValueError):
        st.read_version("objects", 2)
    # retained versions still resolve to live parts
    assert st.read_version("objects", 3).count() == 6


def test_commit_gc_preserves_time_travel_parts(spark, tmp_path):
    st = IndexStore(spark, str(tmp_path))
    st.commit("objects", _df(spark, 0, 5))       # v1
    st.commit("objects", _df(spark, 0, 8))       # v2 (retires v1's part
    # from CURRENT state, but v1 manifest is retained -> part survives)
    assert st.read("objects").count() == 8
    assert st.read_version("objects", 1).count() == 5


def test_compaction_keeps_current_snapshot(spark, tmp_path):
    st = IndexStore(spark, str(tmp_path))
    st.max_parts = 3
    for i in range(5):
        st.append("objects", _df(spark, i * 3, i * 3 + 3))
    assert st.read("objects").count() == 15
    state = st._state("objects")
    assert len(state["parts"]) <= st.max_parts


def test_manifest_meta_carries_forward_and_replaces(spark, tmp_path):
    from watsondedupe_spark.store import IndexStore

    store = IndexStore(spark, str(tmp_path / "meta_store"))
    df = spark.createDataFrame([(1,)], "x long")
    assert store.table_meta("t") == {}
    store.commit("t", df, meta={"max_id": 7})
    assert store.table_meta("t") == {"max_id": 7}
    # meta=None carries forward across append, commit, and the
    # append-triggered compaction fold
    store.append("t", df)
    assert store.table_meta("t") == {"max_id": 7}
    store.commit("t", df)
    assert store.table_meta("t") == {"max_id": 7}
    store.append("t", df, meta={"max_id": 9})
    assert store.table_meta("t") == {"max_id": 9}
    for _ in range(IndexStore.max_parts + 1):
        store.append("t", df)
    assert store.table_meta("t") == {"max_id": 9}

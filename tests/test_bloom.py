"""Per-part Bloom sidecars (watsondedupe_spark.bloom + store wiring).

The sidecar's one hard invariant is NO FALSE NEGATIVES: a part
containing a probed key must never be pruned. Everything else (false
positives, absent sidecars) only widens the scan. The module tests pin
the invariant and the determinism that carries it (build and probe
share one per-value hash derivation); the store tests (both backends)
pin that every part-creating path writes a sidecar and that point
reads actually skip parts the spans cannot skip — the hash-keyed chunk
tables of store.HASH_KEYED.
"""

import base64
import hashlib
import os

import pytest

from watsondedupe_spark import bloom
from watsondedupe_spark.store import IndexStore, SqliteIndexStore


def _chunk_key(seed: str) -> str:
    """A urlsafe-b64 SHA-256 key exactly as keys.py produces them."""
    return (
        base64.urlsafe_b64encode(hashlib.sha256(seed.encode()).digest())
        .rstrip(b"=")
        .decode()
    )


# -- module-level -----------------------------------------------------------


def test_no_false_negatives_fast_and_fallback_paths():
    # fast path: 43-char b64 keys; fallback: arbitrary user strings;
    # mixed in ONE part so the per-value path choice is exercised
    keys = [_chunk_key(f"c{i}") for i in range(500)] + [
        "plain-key",
        "user/nested/key-0001",
        "x" * 200,
        "ünïcode-ключ-鍵",
        "A" * 43,  # 43 chars, valid alphabet, but not a real hash — still fast path
        "!" * 43,  # 43 chars, NON-alphabet byte -> per-value fallback
    ]
    parsed = bloom.parse(bloom.build(keys))
    for k in keys:
        assert bloom.might_contain_any(parsed, *bloom.hash_pairs([k])), k


def test_probe_set_mixing_kinds_matches_single_probes():
    keys = [_chunk_key(f"c{i}") for i in range(100)]
    parsed = bloom.parse(bloom.build(keys))
    # a probe SET mixing present fast-path keys with absent fallback
    # keys must still hit (any-semantics) — per-value hashing keeps the
    # present keys' hashes identical to their build-time hashes
    probe = ["not-there-1", keys[7], "not-there-2"]
    assert bloom.might_contain_any(parsed, *bloom.hash_pairs(probe))


def test_false_positive_rate_is_small():
    parsed = bloom.parse(bloom.build([_chunk_key(f"c{i}") for i in range(5000)]))
    fp = sum(
        bloom.might_contain_any(parsed, *bloom.hash_pairs([_chunk_key(f"a{i}")]))
        for i in range(5000)
    )
    assert fp < 25  # ~16 bits/key, k=8 -> expected ~6e-4; allow 10x slack


def test_empty_part_prunes_every_probe():
    parsed = bloom.parse(bloom.build([]))
    assert not bloom.might_contain_any(parsed, *bloom.hash_pairs([_chunk_key("z")]))


def test_build_is_deterministic():
    keys = [_chunk_key(f"c{i}") for i in range(64)] + ["user-key"]
    assert bloom.build(keys) == bloom.build(keys)


def test_arrow_path_is_byte_identical_to_list_path():
    """The zero-copy arrow build must produce the SAME sidecar as the
    list build for every array shape — otherwise a sidecar built by one
    path could false-negative a probe hashed by the other."""
    import pyarrow as pa

    pure = [_chunk_key(f"c{i}") for i in range(1000)]
    cases = [
        (pure, pa.array(pure)),  # plain string
        (pure, pa.array(pure, type=pa.large_string())),  # 64-bit offsets
        (pure[37:537], pa.array(pure)[37:537]),  # sliced (nonzero offset)
        (pure + ["user-key", "!" * 43], pa.array(pure + ["user-key", "!" * 43])),
        (pure[:10], pa.chunked_array([pa.array(pure[:5]), pa.array(pure[5:10])])),
    ]
    for vals, arr in cases:
        assert bloom.build(vals) == bloom.build_arrow(arr)


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        bloom.parse(b"not a sidecar")
    raw = bloom.build([_chunk_key("a")])
    with pytest.raises(ValueError):
        bloom.parse(raw[:-1])  # truncated bitmap


# -- store wiring (both backends) -------------------------------------------


@pytest.fixture(params=["file", "sqlite"])
def store_cls(request):
    return IndexStore if request.param == "file" else SqliteIndexStore


def _chunk_df(spark, seeds):
    rows = [(_chunk_key(s), s.encode()) for s in seeds]
    return spark.createDataFrame(rows, "chunk_key string, data binary")


def test_every_part_path_writes_a_sidecar(spark, tmp_path, store_cls):
    st = store_cls(spark, str(tmp_path))
    st.commit("chunk_store", _chunk_df(spark, [f"a{i}" for i in range(10)]))
    st.append("chunk_store", _chunk_df(spark, [f"b{i}" for i in range(10)]))
    staged = st.stage_part(
        "chunk_store", _chunk_df(spark, [f"c{i}" for i in range(10)]), 3
    )
    st.attach_part("chunk_store", staged)
    state = st._state("chunk_store")
    assert len(state["parts"]) == 3
    for p in state["parts"]:
        assert os.path.exists(os.path.join(p, "_BLOOM.chunk_key")), p
    # incremental compaction of two parts -> the folded part has one too
    st.compact_parts("chunk_store", state["parts"][:2])
    state = st._state("chunk_store")
    assert len(state["parts"]) == 2
    for p in state["parts"]:
        assert os.path.exists(os.path.join(p, "_BLOOM.chunk_key")), p
    # rows survived the rewrites intact
    assert st.read("chunk_store").count() == 30


def test_read_point_bloom_prunes_hash_keyed_parts(spark, tmp_path, store_cls):
    """The round-12 claim itself: span pruning can never skip a part of
    a hash-keyed table (uniform keys span the keyspace), but the bloom
    skips every part that lacks the probe key."""
    st = store_cls(spark, str(tmp_path))
    batches = [[f"{b}x{i}" for i in range(20)] for b in range(3)]
    st.commit("chunk_store", _chunk_df(spark, batches[0]))
    st.append("chunk_store", _chunk_df(spark, batches[1]))
    st.append("chunk_store", _chunk_df(spark, batches[2]))
    state = st._state("chunk_store")
    assert len(state["parts"]) == 3
    # a key from batch 1 prunes to exactly that part
    probe = _chunk_key(batches[1][5])
    kept = st._bloom_prune("chunk_store", "chunk_key", state["parts"], [probe])
    assert kept == [state["parts"][1]]
    got = (
        st.read_point("chunk_store", "chunk_key", [probe])
        .filter(f"chunk_key = '{probe}'")
        .collect()
    )
    assert len(got) == 1 and bytes(got[0].data) == batches[1][5].encode()
    # an absent key prunes ALL parts -> empty typed frame, no scan planned
    absent = _chunk_key("never-written")
    assert st._bloom_prune("chunk_store", "chunk_key", state["parts"], [absent]) == []
    assert st.read_point("chunk_store", "chunk_key", [absent]).count() == 0


def test_missing_sidecar_is_never_pruned(spark, tmp_path, store_cls):
    st = store_cls(spark, str(tmp_path))
    st.commit("chunk_store", _chunk_df(spark, ["a"]))
    st.append("chunk_store", _chunk_df(spark, ["b"]))
    state = st._state("chunk_store")
    os.remove(os.path.join(state["parts"][0], "_BLOOM.chunk_key"))
    st._bloom_cache.clear()
    absent = _chunk_key("zzz")
    kept = st._bloom_prune("chunk_store", "chunk_key", state["parts"], [absent])
    assert kept == [state["parts"][0]]  # sidecar-less part always scanned
    # and a corrupt sidecar behaves the same
    with open(os.path.join(state["parts"][1], "_BLOOM.chunk_key"), "wb") as f:
        f.write(b"garbage")
    st._bloom_cache.clear()
    kept = st._bloom_prune("chunk_store", "chunk_key", state["parts"], [absent])
    assert kept == state["parts"]


def test_all_present_keys_keep_their_part(spark, tmp_path, store_cls):
    """No-false-negative invariant through the store path: every key
    written to a part must keep that part in the pruned list."""
    st = store_cls(spark, str(tmp_path))
    seeds = [f"k{i}" for i in range(200)]
    st.commit("chunk_store", _chunk_df(spark, seeds))
    state = st._state("chunk_store")
    for s in seeds:
        kept = st._bloom_prune(
            "chunk_store", "chunk_key", state["parts"], [_chunk_key(s)]
        )
        assert kept == state["parts"], s

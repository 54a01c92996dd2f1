"""Per-part Bloom-filter sidecars for manifest-level data skipping.

Min/max span stats (``store.SKIP_STATS_COLS``) prune parts well for
range-clustered keys but are useless for uniform hash keys: every
non-trivial part of ``chunks``/``chunk_store`` spans essentially the
whole urlsafe-b64 SHA-256 keyspace, so a point probe must plan a scan
over every live part (``store.HASH_KEYED`` documents exactly this).
The per-part Bloom sidecar closes that gap the same way Iceberg puffin
blobs / parquet file-level bloom filters do, one level higher: at
part-write time the driver reads back ONLY the key column (a columnar
single-column read of the part it just wrote) and records a bitmap in
``{part}/_BLOOM.{col}`` (the ``_`` prefix keeps Spark's file listing
and pyarrow's dataset discovery from treating it as data). Point reads
then test their probe keys against each part's bitmap and drop parts
that definitely lack every probe — BEFORE Spark plans a scan.

At 100 TB this is the difference between "a ``get()`` payload fetch
plans a scan over every live payload part" and "it opens the 1-2 parts
that can actually contain the object's chunks"; a negative ``exists()``
becomes a manifest-plus-sidecar check that plans no scan at all — the
b-tree-miss fast path of the reference's PK index
(src/DedupeLibrary/Database/SqliteProvider.cs:258-270), re-expressed as
file skipping.

Correctness posture: the sidecar is an optimization, never a gate. A
part without a readable sidecar is always scanned, a false positive
only widens the scan, and the hash derivation is deterministic per
VALUE and shared verbatim by build and probe, so false negatives are
impossible by construction.

Hashing: chunk keys are urlsafe-b64 SHA-256 (``keys.py:28``) — the key
characters ARE uniform entropy, so the two double-hashing bases come
from vectorized polynomials over the 6-bit symbol values of the two
disjoint halves of the key (no per-key Python hashing in the common
path). Values that are not 43-byte urlsafe-b64 (object keys are
arbitrary user strings) fall back to BLAKE2b per value; the fast/slow
choice is made per value, so mixed probe sets stay consistent with
mixed builds.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"WBLM1"
_HEADER = struct.Struct("<BQQ")  # k, m (bits), n (keys)

#: sizing: ~16 bits/key with k=8 probes -> false-positive rate ~6e-4
BITS_PER_KEY = 16
K = 8
#: bitmap cap (bits): 16 MiB of bitmap; parts beyond ~8M keys keep a
#: correct filter with a gracefully degrading FP rate
MAX_BITS = 1 << 27

#: full-period odd multiplier (2^64 / phi) for the polynomial hashes
_MULT = 0x9E3779B97F4A7C15

# 6-bit symbol values for the urlsafe-b64 alphabet; 255 marks a byte
# outside the alphabet (forces the BLAKE2b fallback for that value)
_LUT = np.full(256, 255, dtype=np.uint8)
for _i, _ch in enumerate(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_"
):
    _LUT[ord(_ch)] = _i

# per-position multiplier powers for the two key halves (mod 2^64)
_POW1 = np.array([pow(_MULT, i, 1 << 64) for i in range(21)], dtype=np.uint64)
_POW2 = np.array([pow(_MULT, i, 1 << 64) for i in range(22)], dtype=np.uint64)


def hash_pairs(values: list) -> "tuple[np.ndarray, np.ndarray]":
    """Two uint64 double-hashing bases per value.

    Deterministic per value (NOT per batch): a 43-byte urlsafe-b64
    value always takes the vectorized polynomial path, anything else
    always takes BLAKE2b — so a probe set mixing both kinds tests
    consistently against a part built from either.
    """
    n = len(values)
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    enc: list[bytes] = []
    fast: list[int] = []
    slow: list[int] = []
    for i, v in enumerate(values):
        b = v.encode("utf-8", "surrogatepass")
        enc.append(b)
        (fast if len(b) == 43 else slow).append(i)
    if fast:
        mat = np.frombuffer(b"".join(enc[i] for i in fast), dtype=np.uint8)
        mat = mat.reshape(-1, 43)
        fa = np.asarray(fast)
        # column-wise accumulation, deliberately allocation-lean: the
        # obvious (n, 21)-matrix form materializes ~170 bytes/key of
        # uint64 temporaries, and big numpy temps go back to the OS on
        # free — on lazily-backed VMs every call then re-faults hundreds
        # of MB at disk speed (measured 20s+ for a 3M-key part where the
        # warm-page cost is 0.2s). Per-column temps stay ~8 bytes/key.
        # uint64 arithmetic wraps mod 2^64 — exactly the ring we want.
        f1 = np.zeros(len(fa), dtype=np.uint64)
        f2 = np.zeros(len(fa), dtype=np.uint64)
        bad = np.zeros(len(fa), dtype=bool)
        for i in range(43):
            s = _LUT[mat[:, i]]
            bad |= s == 255
            if i < 21:
                f1 += s.astype(np.uint64) * _POW1[i]
            else:
                f2 += s.astype(np.uint64) * _POW2[i - 21]
        h1[fa] = f1
        h2[fa] = f2
        # 43-byte values containing non-alphabet bytes: fallback path
        slow.extend(int(i) for i in fa[bad])
    for i in slow:
        d = hashlib.blake2b(enc[i], digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little")
    # odd step => the k probes hit k distinct positions mod a power of two
    h2 |= np.uint64(1)
    return h1, h2


def _hash_pairs_arrow(arr):
    """Zero-copy fast path for :func:`hash_pairs` over a pyarrow string
    array: when EVERY value is exactly 43 utf-8 bytes (the chunk-key
    shape), hash straight off the arrow value buffer — no to_pylist, no
    per-value Python encode. Returns None when the array doesn't fit
    the shape (caller falls back to the list path). Values with
    non-alphabet bytes still get their per-value BLAKE2b, exactly as
    the list path would. Identical output to ``hash_pairs(
    arr.to_pylist())`` by construction: arrow stores utf-8 bytes, and
    43 ascii alphabet bytes encode to themselves."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count or len(arr) == 0:
        return None
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:
        return None
    bufs = arr.buffers()
    offsets = np.frombuffer(
        bufs[1], dtype=off_dtype, count=len(arr) + 1 + arr.offset
    )[arr.offset :]
    if offsets[-1] - offsets[0] != 43 * len(arr):
        return None
    widths = np.diff(offsets)
    if not (widths == 43).all():
        return None
    mat = np.frombuffer(bufs[2], dtype=np.uint8)[
        offsets[0] : offsets[-1]
    ].reshape(-1, 43)
    n = len(arr)
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    bad = np.zeros(n, dtype=bool)
    for i in range(43):
        s = _LUT[mat[:, i]]
        bad |= s == 255
        if i < 21:
            h1 += s.astype(np.uint64) * _POW1[i]
        else:
            h2 += s.astype(np.uint64) * _POW2[i - 21]
    if bad.any():
        for i in np.flatnonzero(bad):
            d = hashlib.blake2b(
                arr[int(i)].as_py().encode("utf-8", "surrogatepass"),
                digest_size=16,
            ).digest()
            h1[i] = int.from_bytes(d[:8], "little")
            h2[i] = int.from_bytes(d[8:], "little")
    h2 |= np.uint64(1)
    return h1, h2


def build_arrow(arr) -> bytes:
    """:func:`build` from a pyarrow string column (nulls dropped by the
    caller) — rides the zero-copy hash path when the values fit the
    43-byte chunk-key shape, else falls back to the list path."""
    hashed = _hash_pairs_arrow(arr)
    if hashed is None:
        return build(arr.to_pylist())
    return _build_from_hashes(len(arr), *hashed)


def _probe_bits(h1, h2, i: int, m: int):
    """(byte index, bit mask) arrays for probe round ``i``."""
    pos = (h1 + np.uint64(i) * h2) & np.uint64(m - 1)
    return (pos >> np.uint64(3)).astype(np.int64), (
        np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
    )


def build(values: list) -> bytes:
    """Serialized sidecar for one part's key column (nulls excluded by
    the caller; a null key never equals a probe value, so pruning a
    part on its non-null keys alone is exact)."""
    if not values:
        return _build_from_hashes(0, None, None)
    return _build_from_hashes(len(values), *hash_pairs(values))


def _build_from_hashes(n: int, h1, h2) -> bytes:
    m = 64
    while m < n * BITS_PER_KEY and m < MAX_BITS:
        m <<= 1
    if n:
        # vectorized bit set: boolean scatter (duplicate indices are
        # fine for assignment) + packbits — orders of magnitude faster
        # than a scattered read-modify-write per probe
        bits = np.zeros(m, dtype=bool)
        mask = np.uint64(m - 1)
        for i in range(K):
            bits[(h1 + np.uint64(i) * h2) & mask] = True
        buf = np.packbits(bits, bitorder="little")
    else:
        buf = np.zeros(m >> 3, dtype=np.uint8)
    return _MAGIC + _HEADER.pack(K, m, n) + buf.tobytes()


def parse(raw: bytes) -> "tuple[int, int, np.ndarray]":
    """``(k, m, bitmap)`` from sidecar bytes; raises on any malformed
    input (callers treat that as "no sidecar — never prune")."""
    if not raw.startswith(_MAGIC):
        raise ValueError("bad bloom sidecar magic")
    k, m, _n = _HEADER.unpack_from(raw, len(_MAGIC))
    buf = np.frombuffer(raw, dtype=np.uint8, offset=len(_MAGIC) + _HEADER.size)
    if not k or m & (m - 1) or m < 8 or len(buf) != m >> 3:
        raise ValueError("bad bloom sidecar geometry")
    return k, m, buf


def might_contain_any(parsed, h1, h2) -> bool:
    """True when the part MAY contain at least one of the hashed probe
    values (false positives possible, false negatives impossible)."""
    k, m, buf = parsed
    ok = np.ones(len(h1), dtype=bool)
    for i in range(k):
        idx, bit = _probe_bits(h1, h2, i, m)
        ok &= (buf[idx] & bit) != 0
        if not ok.any():
            return False
    return True
